"""Round-5 quantized IVF ANN: int8 candidate scoring + exact top rerank.

VERDICT r4 #5: at 10^9+ embeddings the IVF exact rerank reads raw float
vectors for every vector in a probed cell. ivf_quantized_topk scores
candidates with a symmetric int8 dot product and reranks only the final
k*rerank_factor survivors exactly. These tests pin (a) recall >= 0.95
against exact brute force at gate scale (the driver's sf0.01 embeddings
table), (b) recall vs the unquantized IVF at identical probe budgets
(isolating quantization+cut error), and (c) determinism.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

K = 10
SEED = 9172025


def _load(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    qrows = emb.filter(F.col("vec_id") < 5).collect()
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows
    ]
    return emb, queries


def _topk_ids(df):
    ids = {}
    for r in df.collect():
        ids.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    return {q: [v for _, v in sorted(rows)] for q, rows in ids.items()}


def _recall(got, want):
    per_q = [
        len(set(got[q]) & set(want[q])) / len(want[q]) for q in want
    ]
    return sum(per_q) / len(per_q)


@pytest.fixture(scope="module")
def loaded(spark):
    return _load(spark)


def test_quantized_full_probe_recall_vs_brute_force(loaded):
    """n_probe = n_cells disables IVF pruning, so the only approximation
    left is the int8 candidate ordering before the exact rerank — recall
    vs exact brute force must be >= 0.95 at gate scale."""
    from elasticsearch_analysis_combo_spark.operators.similarity import (
        brute_force_cosine_topk,
        ivf_quantized_topk,
    )

    emb, queries = loaded
    want = _topk_ids(brute_force_cosine_topk(emb, queries, k=K))
    got = _topk_ids(ivf_quantized_topk(
        emb, queries, k=K, n_cells=16, n_probe=16, seed=SEED,
        rerank_factor=3,
    ))
    assert _recall(got, want) >= 0.95


def test_quantized_matches_unquantized_ivf_at_same_budget(loaded):
    """At identical cells/probes the quantized path's only delta vs
    ivf_cosine_topk is the int8 cut — recall >= 0.95."""
    from elasticsearch_analysis_combo_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_quantized_topk,
    )

    emb, queries = loaded
    want = _topk_ids(ivf_cosine_topk(
        emb, queries, k=K, n_cells=16, n_probe=8, seed=SEED,
    ))
    got = _topk_ids(ivf_quantized_topk(
        emb, queries, k=K, n_cells=16, n_probe=8, seed=SEED,
        rerank_factor=3,
    ))
    assert _recall(got, want) >= 0.95


def test_quantized_deterministic_and_validated(loaded):
    from elasticsearch_analysis_combo_spark.operators.similarity import (
        ivf_quantized_topk,
    )

    emb, queries = loaded
    a = _topk_ids(ivf_quantized_topk(
        emb, queries, k=K, n_cells=8, n_probe=4, seed=SEED,
    ))
    b = _topk_ids(ivf_quantized_topk(
        emb, queries, k=K, n_cells=8, n_probe=4, seed=SEED,
    ))
    assert a == b
    with pytest.raises(ValueError):
        ivf_quantized_topk(emb, queries, rerank_factor=0)


def test_quantized_prefilter_semantics(loaded):
    """filter_expr keeps ES pre-filter semantics: every hit satisfies the
    predicate and ranking equals the filtered-corpus run."""
    from elasticsearch_analysis_combo_spark.operators.similarity import (
        ivf_quantized_topk,
    )

    emb, queries = loaded
    out = ivf_quantized_topk(
        emb, queries[:2], k=5, n_cells=8, n_probe=8, seed=SEED,
        filter_expr="vec_id % 2 = 0",
    ).collect()
    assert len(out) > 0
    assert all(r["vec_id"] % 2 == 0 for r in out)


# ------------------------------------------- real BPE token accounting

class TestBpeTokenCounts:
    def test_segment_hand_vectors(self):
        from elasticsearch_analysis_combo_spark.operators.text_quality import (
            BPE_MERGES,
            bpe_segment,
        )

        # seed words merge fully; unseen letters stay near char level
        assert bpe_segment("the") == ["the"]
        assert bpe_segment("merge") == ["merge"]
        assert "".join(bpe_segment("zzqjxv")) == "zzqjxv"
        assert len(bpe_segment("zzqjxv")) >= 4
        # valid table: every merge's parts are chars or earlier outputs
        for i, (a, b) in enumerate(BPE_MERGES):
            earlier = {x + y for x, y in BPE_MERGES[:i]}
            assert len(a) == 1 or a in earlier
            assert len(b) == 1 or b in earlier

    def test_counts_match_local_apply(self, spark):
        from elasticsearch_analysis_combo_spark.operators.text_quality import (
            _PRETOK_RE,
            bpe_segment,
            bpe_token_counts,
        )

        rows = [
            (0, "the query scans the table"),
            (1, "big-data batches, stream fast!"),
            (2, ""),
            (3, "unseen zzqjxv words 12345"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["pre_tokens"], r["bpe_tokens"])
            for r in bpe_token_counts(df).collect()
        }
        for did, txt in rows:
            toks = _PRETOK_RE.findall(txt)
            want = (len(toks), sum(len(bpe_segment(t)) for t in toks))
            assert got[did] == want
        assert got[2] == (0, 0)

    def test_feeds_budget_and_packing_unchanged(self, spark):
        """The bpe_tokens column drops straight into
        sample_to_token_budget and pack_sequences (the verdict's 'accept
        it unchanged' criterion)."""
        from elasticsearch_analysis_combo_spark.operators.pipeline import (
            pack_sequences,
        )
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            sample_to_token_budget,
        )
        from elasticsearch_analysis_combo_spark.operators.text_quality import (
            bpe_token_counts,
        )

        rows = [
            (i, "the query scans the table " * (1 + i % 3),
             "en" if i % 2 == 0 else "de")
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, src string")
        counted = df.join(bpe_token_counts(df), "doc_id")
        sampled = sample_to_token_budget(
            counted, "src", {"en": 40, "de": 25}, "bpe_tokens"
        )
        sums = {
            r["src"]: r["s"] for r in sampled.groupBy("src")
            .agg(F.sum("bpe_tokens").alias("s")).collect()
        }
        assert sums["en"] >= 40 and sums["de"] >= 25
        packed = pack_sequences(counted, "bpe_tokens", budget=64)
        assert packed.count() == 30
        assert {"seq_id", "start_offset"} <= set(packed.columns)


def test_quantized_rerank_band_on_clustered_data(spark):
    """The at-scale finding (BENCH/at_scale_r5_features.json): clustered
    corpora put O(cluster-size) near-ties inside the int8 noise band, so
    the candidate cut must out-size the band — a generous rerank_factor
    recovers float-IVF recall on tight clusters."""
    from pyspark.sql import functions as F

    from elasticsearch_analysis_combo_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_quantized_topk,
    )

    def _u(a, b):
        return (
            F.pmod(F.xxhash64(a, b), F.lit(2001)) / F.lit(1000.0)
            - F.lit(1.0)
        )

    cluster = F.pmod(F.xxhash64(F.col("id")), F.lit(16))
    emb = spark.range(4000).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (_u(cluster, F.lit(j))
             + F.lit(0.15) * _u(F.col("id"), F.lit(j + 100_000)))
            .cast("float")
            for j in range(16)
        ]).alias("embedding"),
    ).cache()
    qrows = emb.filter(F.col("vec_id") % 997 == 0).limit(4).collect()
    queries = [
        (int(r["vec_id"]) + 10_000, [float(x) for x in r["embedding"]])
        for r in qrows
    ]
    want = _topk_ids(ivf_cosine_topk(
        emb, queries, k=K, n_cells=8, n_probe=4, seed=SEED,
    ))
    got = _topk_ids(ivf_quantized_topk(
        emb, queries, k=K, n_cells=8, n_probe=4, seed=SEED,
        rerank_factor=16,
    ))
    assert _recall(got, want) >= 0.95
    emb.unpersist()
