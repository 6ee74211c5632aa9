"""Batch-index delete/upsert + incremental compaction.

The pinned invariant: delete (or upsert) + compact serves IDENTICAL query
results to a fresh build over the edited corpus — WAND top-k
rank-identical, term dictionary equal, corpus stats equal — while the
incremental path re-encodes only the affected terms and the publish is an
atomic meta.json swap (old readers keep a valid view).
"""

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine
from elasticsearch_analysis_combo_spark.plans.index_build import (
    InvertedIndex,
    build_index,
)
from elasticsearch_analysis_combo_spark.plans.maintenance import (
    compact,
    delete_docs,
    upsert_docs,
)
from elasticsearch_analysis_combo_spark.query.wand import wand_topk

CFG = ComboConfig(["whitespace"])
QUERIES = [(0, "the quick"), (1, "lazy dog"), (2, "fox"), (3, "the")]


def _corpus(seed=3, n=60):
    rng = random.Random(seed)
    vocab = ["the", "quick", "fox", "jumps", "over", "lazy", "dog", "a", "b"]
    rows = []
    for i in range(n):
        words = [vocab[rng.randrange(len(vocab))]
                 for _ in range(rng.randint(3, 20))]
        rows.append((i * 104729 + 7, " ".join(words)))
    return rows


def _build(spark, rows, d):
    df = spark.createDataFrame(rows, "doc_id long, content string")
    return build_index(spark, df, CFG, str(d), salt_shards=4, block_size=8)


def _topk(spark, idx, k=10):
    out = wand_topk(spark, idx, QUERIES, CFG, k=k)
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in out.collect()
    )


def _term_df_rows(idx):
    return sorted(
        (r["term"], r["df"], r["cf"]) for r in idx.term_df().collect()
    )


@pytest.mark.parametrize("incremental", [True, False])
def test_delete_compact_equals_fresh_build(spark, tmp_path, incremental):
    rows = _corpus()
    idx = _build(spark, rows, tmp_path / "live")
    # delete 1/4 of the docs, including heavy 'the' carriers (hot term)
    dead = [doc_id for i, (doc_id, _) in enumerate(rows) if i % 4 == 0]
    delete_docs(spark, idx.index_dir, dead)
    new_idx = compact(spark, idx.index_dir, incremental=incremental)

    kept = [r for r in rows if r[0] not in set(dead)]
    fresh = _build(spark, kept, tmp_path / "fresh")

    assert new_idx.meta.n_docs == fresh.meta.n_docs == len(kept)
    assert abs(new_idx.meta.avgdl - fresh.meta.avgdl) < 1e-12
    assert _term_df_rows(new_idx) == _term_df_rows(fresh)
    assert _topk(spark, new_idx) == _topk(spark, fresh)


def test_upsert_and_delete_compact(spark, tmp_path):
    rows = _corpus(seed=5)
    idx = _build(spark, rows, tmp_path / "live")
    # replace two docs, add one brand-new doc, delete one
    replaced = [
        (rows[1][0], "quick quick brown fox"),
        (rows[2][0], "entirely new content words"),
    ]
    added = [(999_999_001, "the lazy dog sleeps")]
    dead = [rows[3][0]]
    ups = spark.createDataFrame(replaced + added, "doc_id long, content string")
    upsert_docs(spark, idx.index_dir, ups)
    delete_docs(spark, idx.index_dir, dead)
    new_idx = compact(spark, idx.index_dir)

    edited = {d: c for d, c in rows if d != dead[0]}
    for d, c in replaced + added:
        edited[d] = c
    fresh = _build(spark, list(edited.items()), tmp_path / "fresh")

    assert new_idx.meta.n_docs == fresh.meta.n_docs
    assert _term_df_rows(new_idx) == _term_df_rows(fresh)
    assert _topk(spark, new_idx) == _topk(spark, fresh)
    # the brand-new doc is findable
    hits = wand_topk(spark, new_idx, [(0, "sleeps")], CFG, k=5).collect()
    assert [r["doc_id"] for r in hits] == [999_999_001]


def test_compact_noop_without_pending(spark, tmp_path):
    rows = _corpus(seed=9, n=20)
    idx = _build(spark, rows, tmp_path / "live")
    before = _topk(spark, idx)
    out = compact(spark, idx.index_dir)
    assert _topk(spark, out) == before


def test_publish_keeps_old_reader_view(spark, tmp_path):
    """Atomicity: a reader holding the pre-compact InvertedIndex keeps a
    readable, consistent posting path after the publish (versioned dirs —
    no rmtree window)."""
    rows = _corpus(seed=11, n=30)
    idx = _build(spark, rows, tmp_path / "live")
    old_reader = InvertedIndex(spark, idx.index_dir)
    n_before = old_reader.postings().count()
    delete_docs(spark, idx.index_dir, [rows[0][0], rows[1][0]])
    new_idx = compact(spark, idx.index_dir)
    # old reader: same generation it opened, still fully readable
    assert old_reader.postings().count() == n_before
    # new reader sees the compacted generation
    assert new_idx.meta.n_docs == len(rows) - 2
    assert InvertedIndex(spark, idx.index_dir).meta.n_docs == len(rows) - 2


def test_second_compact_gcs_oldest_generation(spark, tmp_path):
    import os

    rows = _corpus(seed=13, n=24)
    idx = _build(spark, rows, tmp_path / "live")
    delete_docs(spark, idx.index_dir, [rows[0][0]])
    compact(spark, idx.index_dir)
    delete_docs(spark, idx.index_dir, [rows[1][0]])
    compact(spark, idx.index_dir)
    gens = [e for e in os.listdir(idx.index_dir)
            if e.startswith("postings-") and
            os.path.isdir(os.path.join(idx.index_dir, e))]
    # newest + immediately-previous kept, older GC'd
    assert len(gens) <= 2
    final = InvertedIndex(spark, idx.index_dir)
    assert final.meta.n_docs == len(rows) - 2


def test_engine_auto_routes_partitioned(spark, tmp_path, monkeypatch):
    """search()/phrase() route to the range-partitioned evaluators once
    n_docs crosses PARTITIONED_THRESHOLD, with identical results."""
    rows = _corpus(seed=17, n=40)
    df = spark.createDataFrame(rows, "doc_id long, content string")
    eng = ComboSearchEngine(
        spark, CFG, str(tmp_path / "eng"), salt_shards=4, block_size=8
    )
    eng.index(df, content_col="content")

    import elasticsearch_analysis_combo_spark.query.wand as wand_mod

    calls = {"partitioned": 0}
    orig = wand_mod.wand_topk_partitioned

    def spy(*a, **kw):
        calls["partitioned"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(wand_mod, "wand_topk_partitioned", spy)

    monkeypatch.setattr(ComboSearchEngine, "PARTITIONED_THRESHOLD", 10**9)
    small = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in eng.search("the quick", k=5).collect()
    )
    assert calls["partitioned"] == 0

    monkeypatch.setattr(ComboSearchEngine, "PARTITIONED_THRESHOLD", 1)
    large = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in eng.search("the quick", k=5).collect()
    )
    assert calls["partitioned"] == 1
    assert small == large
    # phrase routing: both paths agree as well
    p_small = {(r["query_id"], r["doc_id"]): r["n_matches"]
               for r in eng.phrase("the quick", partitioned=False).collect()}
    p_auto = {(r["query_id"], r["doc_id"]): r["n_matches"]
              for r in eng.phrase("the quick").collect()}
    assert p_auto == p_small


def test_engine_maintenance_facade(spark, tmp_path):
    """delete/upsert/compact through the ComboSearchEngine facade: the
    engine re-attaches to the new generation and serves the edited corpus."""
    rows = _corpus(seed=23, n=30)
    df = spark.createDataFrame(rows, "doc_id long, content string")
    eng = ComboSearchEngine(
        spark, CFG, str(tmp_path / "idx"), salt_shards=4, block_size=8
    )
    eng.index(df, content_col="content")
    victim = rows[0][0]
    eng.delete([victim])
    eng.upsert(spark.createDataFrame(
        [(777_000_001, "sphinx of black quartz")], "doc_id long, content string"
    ))
    idx = eng.compact()
    assert idx.meta.n_docs == len(rows)  # -1 deleted, +1 added
    hits = [r["doc_id"] for r in eng.search("sphinx quartz", k=3).collect()]
    assert hits == [777_000_001]
    assert victim not in [
        r["doc_id"] for r in eng.search("the", k=30, partitioned=False).collect()
    ]


def test_delete_after_upsert_wins(spark, tmp_path):
    """The LAST staged operation per doc wins: upsert then delete really
    deletes; delete then upsert resurrects with the new content."""
    rows = _corpus(seed=31, n=20)
    idx = _build(spark, rows, tmp_path / "live")
    x, y = rows[0][0], rows[1][0]
    # x: upsert THEN delete -> gone
    upsert_docs(spark, idx.index_dir, spark.createDataFrame(
        [(x, "replacement words")], "doc_id long, content string"))
    delete_docs(spark, idx.index_dir, [x])
    # y: delete THEN upsert -> resurrected with new content
    delete_docs(spark, idx.index_dir, [y])
    upsert_docs(spark, idx.index_dir, spark.createDataFrame(
        [(y, "resurrected unique words")], "doc_id long, content string"))
    new_idx = compact(spark, idx.index_dir)

    edited = {d: c for d, c in rows if d != x}
    edited[y] = "resurrected unique words"
    fresh = _build(spark, list(edited.items()), tmp_path / "fresh")
    assert new_idx.meta.n_docs == fresh.meta.n_docs == len(rows) - 1
    assert _term_df_rows(new_idx) == _term_df_rows(fresh)
    hits = wand_topk(spark, new_idx, [(0, "resurrected")], CFG, k=5).collect()
    assert [r["doc_id"] for r in hits] == [y]
    gone = wand_topk(spark, new_idx, [(0, "replacement")], CFG, k=5).collect()
    assert gone == []


def test_upsert_to_empty_content_blanks_doc(spark, tmp_path):
    """Replacing a doc with content that analyzes to zero tokens removes
    its old rows (not a silent no-op)."""
    rows = _corpus(seed=37, n=15)
    idx = _build(spark, rows, tmp_path / "live")
    x = rows[0][0]
    upsert_docs(spark, idx.index_dir, spark.createDataFrame(
        [(x, "")], "doc_id long, content string"))
    new_idx = compact(spark, idx.index_dir)
    fresh = _build(spark, [r for r in rows if r[0] != x], tmp_path / "fresh")
    # the blanked doc contributes no terms and no doc stats
    assert _term_df_rows(new_idx) == _term_df_rows(fresh)
    assert new_idx.meta.n_docs == len(rows) - 1
    assert x not in [
        r["doc_id"] for r in wand_topk(spark, new_idx, QUERIES, CFG, k=50).collect()
    ]


def test_publish_keep_previous_two_generations(spark, tmp_path):
    """keep_previous=N really protects N generations back (meta history
    ledger), not just the immediately-previous one."""
    import os

    from elasticsearch_analysis_combo_spark.plans.index_build import (
        IndexMeta,
        publish_tables,
        _config_dict,
    )

    rows = _corpus(seed=41, n=10)
    idx = _build(spark, rows, tmp_path / "live")
    meta = idx.meta
    post = idx.postings()
    for _ in range(3):
        publish_tables(
            spark, idx.index_dir, {"postings": post},
            IndexMeta(**{**meta.__dict__}), keep_previous=2,
        )
        meta = IndexMeta.load(idx.index_dir)
    gens = [e for e in os.listdir(idx.index_dir)
            if e.startswith("postings-")
            and os.path.isdir(os.path.join(idx.index_dir, e))]
    # 3 published generations, keep_previous=2 -> all 3 still on disk
    assert len(gens) == 3
    # a 4th publish GCs the oldest
    publish_tables(
        spark, idx.index_dir, {"postings": post},
        IndexMeta(**{**meta.__dict__}), keep_previous=2,
    )
    gens = [e for e in os.listdir(idx.index_dir)
            if e.startswith("postings-")
            and os.path.isdir(os.path.join(idx.index_dir, e))]
    assert len(gens) == 3
