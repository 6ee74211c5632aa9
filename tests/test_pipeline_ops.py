"""Corpus curation chain + sequence packing (operators/pipeline.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.pipeline import (
    curate_corpus,
    pack_sequences,
)


def _u60(seed, key):
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    en = ("the quick brown fox jumps over the lazy dog and it is "
          "a fine day for that in the field of tests")
    de = "der hund ist nicht ein fisch und das ist gut so für alle"
    rows = [
        (0, en, "src0"),
        (1, en, "src0"),          # exact duplicate of 0
        (2, de, "src1"),
        (3, "x 1 2 3 4 5 6 7 8 9", "src1"),   # digit junk, low quality
        (4, en + " extra tail words here", "src2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).cache()


def test_curate_language_and_quality_filters(spark, docs):
    out = curate_corpus(
        docs, languages=["en"], min_quality=0.5, dedup=False
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert 2 not in ids          # German dropped
    assert 3 not in ids          # junk dropped
    assert {0, 1, 4} <= ids      # English survivors keep lang + score cols
    assert all(r["lang"] == "en" and r["quality_score"] >= 0.5 for r in out)


def test_curate_exact_dedup_keeps_hash_smallest(spark, docs):
    from elasticsearch_analysis_combo_spark.operators.pipeline import (
        DEDUP_SEED_SALT,
    )

    out = curate_corpus(docs, dedup=True, seed=9).collect()
    ids = {r["doc_id"] for r in out}
    # docs 0 and 1 share text: exactly one survives, the hash-smallest
    # under the SALTED dedup-ordering seed (independent of sampling)
    assert len(ids & {0, 1}) == 1
    expect = min((0, 1), key=lambda i: (_u60(9 + DEDUP_SEED_SALT, i), i))
    assert expect in ids
    assert {2, 3, 4} <= ids


def test_curate_sampling_stage(spark, docs):
    out = curate_corpus(
        docs, dedup=False, sample_fractions={"src0": 1.0},
        default_fraction=0.0,
    ).collect()
    assert {r["source"] for r in out} == {"src0"}


def test_pack_sequences_offsets_and_bins(spark):
    rows = [(i, 30) for i in range(10)] + [(100, 250)]  # one over-budget doc
    df = spark.createDataFrame(rows, "doc_id long, tokens int")
    out = pack_sequences(
        df, "tokens", budget=100, n_buckets=2, seed=3
    ).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for b, rs in by_bucket.items():
        rs = sorted(rs, key=lambda r: r["start_offset"])
        # offsets are a contiguous cumsum inside the bucket
        cum = 0
        for r in rs:
            assert r["start_offset"] == cum
            cum += r["tokens"]
            # bin = floor(start / budget), seq_id banded by bucket
            assert r["seq_id"] == b * (1 << 32) + r["start_offset"] // 100
        # replay the bucket's hash order in python
        ids = [r["doc_id"] for r in rs]
        assert ids == sorted(ids, key=lambda i: (_u60(3, i), i))
    # determinism under repartition
    out2 = pack_sequences(
        df.repartition(7), "tokens", budget=100, n_buckets=2, seed=3
    ).collect()
    assert {(r["doc_id"], r["seq_id"]) for r in out} == {
        (r["doc_id"], r["seq_id"]) for r in out2
    }
    with pytest.raises(ValueError):
        pack_sequences(df, "tokens", budget=0)


def test_find_contaminated_and_decontaminate(spark):
    from elasticsearch_analysis_combo_spark.operators.dedup import (
        decontaminate,
        find_contaminated,
    )

    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "completely unrelated content about spark plans"),
            (2, "prefix words then the quick brown fox appears here"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "the quick brown fox")], "doc_id long, text string"
    )
    pairs = find_contaminated(train, evals, k=4).collect()
    got = {(r["doc_id"], r["eval_id"]): r["n_overlaps"] for r in pairs}
    # the eval text's single 4-gram appears in docs 0 and 2, not 1
    assert set(got) == {(0, 100), (2, 100)}
    assert all(v >= 1 for v in got.values())
    # min_overlaps above the max kills all pairs
    assert (
        find_contaminated(train, evals, k=4, min_overlaps=5).count() == 0
    )
    clean = decontaminate(train, evals, k=4)
    assert {r["doc_id"] for r in clean.collect()} == {1}
