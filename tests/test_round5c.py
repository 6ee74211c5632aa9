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
