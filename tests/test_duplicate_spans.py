"""duplicate_spans / remove_duplicate_spans — ExactSubstr dedup (Lee et
al. 2022) in rolling-window form: repeated >=window-token passages are
flagged at every non-canonical site and can be cut out, keeping exactly
one copy corpus-wide."""

import pytest

from elasticsearch_analysis_combo_spark.operators.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


PASSAGE = "alpha beta gamma delta epsilon"  # 5 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [
        # doc 0: canonical copy of the passage (lowest (doc, pos))
        (0, PASSAGE + " tail0 tail1"),
        # doc 1: same passage mid-doc -> flagged there
        (1, "head0 head1 " + PASSAGE + " tail2"),
        # doc 2: passage twice -> both copies flagged (doc 0 is canonical)
        (2, PASSAGE + " mid " + PASSAGE),
        # doc 3: unrelated
        (3, "zeta eta theta iota kappa lambda"),
    ])


def test_spans_flag_non_canonical_sites(corpus):
    out = duplicate_spans(corpus, window=5).orderBy("doc_id", "span_start")
    rows = [(r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in out.collect()]
    # doc 1: passage at tokens 2..6; doc 2: tokens 0..4 and 6..10
    assert rows == [(1, 2, 6, 1), (2, 0, 4, 1), (2, 6, 10, 1)]


def test_canonical_copy_survives_removal(corpus):
    sp = duplicate_spans(corpus, window=5)
    clean = {r.doc_id: r.text
             for r in remove_duplicate_spans(corpus, sp).collect()}
    assert clean[0] == PASSAGE + " tail0 tail1"          # untouched
    assert clean[1] == "head0 head1 tail2"               # passage cut
    assert clean[2] == "mid"                             # both copies cut
    assert clean[3] == "zeta eta theta iota kappa lambda"


def test_overlapping_windows_merge_to_one_span(spark):
    # 8-token repeat with window=5 -> 4 overlapping windows, ONE span
    long_pass = "a b c d e f g h"
    d = _docs(spark, [
        (0, long_pass + " x y"),
        (1, "p q " + long_pass),
    ])
    out = duplicate_spans(d, window=5).collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in out] == [(1, 2, 9, 4)]


def test_within_doc_repeat_is_flagged(spark):
    d = _docs(spark, [(7, PASSAGE + " sep " + PASSAGE)])
    out = duplicate_spans(d, window=5).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in out] == [
        (7, 6, 10)
    ]


def test_short_docs_never_flagged(spark):
    d = _docs(spark, [(0, "a b c"), (1, "a b c")])
    assert duplicate_spans(d, window=5).count() == 0
    # but exact 3-token windows do flag at window=3
    out = duplicate_spans(d, window=3).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in out] == [
        (1, 0, 2)
    ]


def test_portable_md5_mode_matches_rolling_default(corpus):
    # the O(n) rolling-hash path and the md5 window-string oracle path
    # must flag identical spans
    a = duplicate_spans(corpus, window=5, portable=False)
    b = duplicate_spans(corpus, window=5, portable=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rolling_hash_no_false_positives_on_near_miss(spark):
    # windows differing in ONE token must not collide
    d = _docs(spark, [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),
        (2, "alpha beta GAMMA delta epsilon"),
    ])
    assert duplicate_spans(d, window=5).count() == 0
    # token order matters (polynomial hash is position-weighted)
    d2 = _docs(spark, [(0, "a b c d e"), (1, "e d c b a")])
    assert duplicate_spans(d2, window=5).count() == 0


def test_fully_covered_doc_becomes_empty(spark):
    d = _docs(spark, [(0, PASSAGE), (1, PASSAGE)])
    sp = duplicate_spans(d, window=5)
    clean = {r.doc_id: r.text for r in remove_duplicate_spans(d, sp).collect()}
    assert clean == {0: PASSAGE, 1: ""}
