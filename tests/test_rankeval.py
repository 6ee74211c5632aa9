"""ES _rank_eval hand vectors."""

import math

import pytest


@pytest.fixture(scope="module")
def frames(spark):
    hits = spark.createDataFrame(
        [(0, 1, 20), (0, 2, 10), (0, 3, 40),
         (1, 1, 50), (1, 2, 51)],
        "query_id int, rank int, doc_id long",
    )
    ratings = spark.createDataFrame(
        [(0, 10, 3), (0, 20, 0), (0, 30, 1),
         (1, 60, 2),
         (2, 70, 1)],
        "query_id int, doc_id long, rating int",
    )
    return hits, ratings


def test_hand_vector(spark, frames):
    from elasticsearch_analysis_combo_spark.query.rankeval import rank_eval

    hits, ratings = frames
    out = {r["query_id"]: r for r in rank_eval(hits, ratings, k=3).collect()}

    q0 = out[0]
    # top-3 = [20(r0), 10(r3), 40(unrated)] -> 1 relevant of 3 retrieved
    assert q0["precision_at_k"] == pytest.approx(1 / 3)
    # 2 relevant in ratings (10, 30), 1 retrieved
    assert q0["recall_at_k"] == pytest.approx(0.5)
    assert q0["mrr"] == pytest.approx(0.5)  # first relevant at rank 2
    dcg = (2**3 - 1) / math.log2(3)
    idcg = (2**3 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert q0["dcg"] == pytest.approx(dcg)
    assert q0["ndcg"] == pytest.approx(dcg / idcg)

    # q1 retrieved nothing relevant (its only rated doc 60 not in hits)
    q1 = out[1]
    assert q1["precision_at_k"] == 0.0
    assert q1["recall_at_k"] == 0.0
    assert q1["mrr"] == 0.0
    assert q1["ndcg"] == 0.0

    # q2 rated but retrieved NOTHING at all -> present, all zero
    q2 = out[2]
    assert q2["precision_at_k"] == 0.0 and q2["ndcg"] == 0.0


def test_k_cut_and_threshold(spark, frames):
    from elasticsearch_analysis_combo_spark.query.rankeval import rank_eval

    hits, ratings = frames
    # k=1 sees only doc 20 (rating 0) for q0
    out = {r["query_id"]: r for r in rank_eval(hits, ratings, k=1).collect()}
    assert out[0]["precision_at_k"] == 0.0
    # raising the relevance threshold to 2 makes doc 30 (rating 1)
    # non-relevant: total_rel = 1, retrieved rel = 1 (doc 10 at rank 2)
    out = {
        r["query_id"]: r
        for r in rank_eval(
            hits, ratings, k=3, relevant_rating_threshold=2
        ).collect()
    }
    assert out[0]["recall_at_k"] == pytest.approx(1.0)
