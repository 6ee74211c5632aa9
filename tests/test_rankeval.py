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


def test_err_hand_vector(spark):
    from elasticsearch_analysis_combo_spark.query.rankeval import rank_eval

    hits = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)],
        "query_id int, rank int, doc_id long",
    )
    ratings = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 1), (0, 3, 0)],
        "query_id int, doc_id long, rating int",
    )
    out = rank_eval(hits, ratings, k=3, maximum_relevance=2).collect()[0]
    # R = (2^rel - 1) / 2^2 -> [3/4, 1/4, 0]
    # ERR = 3/4 + (1/2)(1/4)(1 - 3/4) + 0
    assert out["err"] == pytest.approx(3 / 4 + 0.25 * 0.25 / 2)
    # per-query max derivation (maximum_relevance=None) gives the same
    # here (max rating is 2)
    out2 = rank_eval(hits, ratings, k=3).collect()[0]
    assert out2["err"] == pytest.approx(out["err"])


def test_err_max_grade_truncates(spark):
    from elasticsearch_analysis_combo_spark.query.rankeval import rank_eval

    # a max-grade doc at rank 1 (R=1) zeroes every later contribution
    hits = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id int, rank int, doc_id long"
    )
    ratings = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1)], "query_id int, doc_id long, rating int"
    )
    out = rank_eval(hits, ratings, k=2, maximum_relevance=0).collect()[0]
    # max_rel=0 -> _maxr == 0 -> all R forced to 0 (guard, no div by 1?)
    assert out["err"] == 0.0
    out1 = rank_eval(hits, ratings, k=2, maximum_relevance=1).collect()[0]
    # R = [1/2, 1/2]: ERR = 1/2 + (1/2)(1/2)(1/2) = 0.625
    assert out1["err"] == pytest.approx(0.625)
    # R1 == 1 case: rating 1 with max_rel... use ratings (2,1) grades
    # zero-guard path: a rating ABOVE the declared max (ES rejects
    # this input; we zero every rank after the R>=1 row) — rank-1
    # R = (2^2-1)/2^1 = 1.5, so rank 2 contributes exactly 0
    out2 = rank_eval(
        hits,
        spark.createDataFrame(
            [(0, 1, 2), (0, 2, 1)], "query_id int, doc_id long, rating int"
        ),
        k=2,
        maximum_relevance=1,
    ).collect()[0]
    assert out2["err"] == pytest.approx(1.5)  # rank-1 term only
