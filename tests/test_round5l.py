"""Round-5l: ES 8 _terms_enum — dictionary prefix walk with
search_after paging, case-insensitive prefix fold, ordered-limit cut."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dict_df(spark):
    rows = [
        ("alpha", 3), ("alphabet", 1), ("Alpine", 2), ("beta", 5),
        ("betray", 1), ("gamma", 4), ("ALPHA2", 1),
    ]
    return spark.createDataFrame(rows, "term string, df long")


def _walk(df):
    return [(r["term"], r["doc_count"]) for r in df.collect()]


def test_terms_enum_prefix_walk(dict_df):
    from elasticsearch_analysis_combo_spark.query.suggest import terms_enum

    assert _walk(terms_enum(dict_df, "alp")) == [
        ("alpha", 3), ("alphabet", 1),
    ]
    # size cuts the ascending walk, not an arbitrary subset
    assert _walk(terms_enum(dict_df, "alp", size=1)) == [("alpha", 3)]
    # empty string = full dictionary walk (ASCII caps sort first)
    assert _walk(terms_enum(dict_df, "", size=3)) == [
        ("ALPHA2", 1), ("Alpine", 2), ("alpha", 3),
    ]


def test_terms_enum_case_insensitive(dict_df):
    from elasticsearch_analysis_combo_spark.query.suggest import terms_enum

    # prefix folds, returned terms keep their indexed form (ES)
    assert _walk(terms_enum(dict_df, "ALP", case_insensitive=True)) == [
        ("ALPHA2", 1), ("Alpine", 2), ("alpha", 3), ("alphabet", 1),
    ]
    assert _walk(terms_enum(dict_df, "ALP")) == [("ALPHA2", 1)]


def test_terms_enum_search_after_pages(dict_df):
    from elasticsearch_analysis_combo_spark.query.suggest import terms_enum

    full = _walk(terms_enum(dict_df, "", size=100))
    pages, after = [], None
    while True:
        page = _walk(terms_enum(dict_df, "", size=3, search_after=after))
        if not page:
            break
        pages.extend(page)
        after = page[-1][0]
        if len(page) < 3:
            break
    assert pages == full


def test_terms_enum_validation(dict_df):
    from elasticsearch_analysis_combo_spark.query.suggest import terms_enum

    with pytest.raises(ValueError, match="size"):
        terms_enum(dict_df, "a", size=0)


def test_engine_terms_enum(spark, tmp_path):
    from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
    from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine
    from elasticsearch_analysis_combo_spark.sources.corpus import (
        generate_corpus,
        ingest,
    )

    corpus = ingest(generate_corpus(spark, 40))
    cfg = ComboConfig(["whitespace", "identifier"], deduplication=True)
    eng = ComboSearchEngine(spark, cfg, str(tmp_path / "idx"), salt_shards=2)
    eng.index(corpus)
    vocab = {
        r["term"]: r["df"]
        for r in eng.idx.term_df().collect()
    }
    prefix = sorted(t for t in vocab if t.startswith("de"))[:5]
    got = _walk(eng.terms_enum("de", size=5))
    assert [t for t, _ in got] == prefix
    for t, dc in got:
        assert dc == vocab[t]
