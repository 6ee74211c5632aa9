"""Spark-side analysis tests: the pandas-UDF surfaces produce the same
tokens as the pure-Python core, and term-stats aggregation is correct."""

import pytest

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
    term_stats,
)
from elasticsearch_analysis_combo_spark.analysis.udfs import analyze, build_term_stats

CFG = ComboConfig(["whitespace", "standard", "keyword"], deduplication=True)


@pytest.fixture(scope="module")
def tiny_df(spark):
    rows = [
        (0, "just a little test 0", "en"),
        (1, "getFooBar snake_case_id returns the fooBar", "java"),
        (2, "Ein schöner Tag in Köln", "de"),
        (3, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string, lang string")


def test_analyze_matches_core(spark, tiny_df):
    out = analyze(tiny_df, CFG).select("doc_id", "tokens").collect()
    got = {r["doc_id"]: [(t["term"], t["start"], t["end"], t["pos"], t["pos_inc"]) for t in r["tokens"]] for r in out}
    for doc_id, content in [(0, "just a little test 0"),
                            (1, "getFooBar snake_case_id returns the fooBar"),
                            (2, "Ein schöner Tag in Köln"), (3, "")]:
        toks = analyze_text(content, CFG)
        from elasticsearch_analysis_combo_spark.analysis.combo import to_pos_increments
        exp = [(t.term, t.start, t.end, t.pos, inc) for t, inc in zip(toks, to_pos_increments(toks))]
        assert got[doc_id] == exp


def test_lang_dispatch(spark, tiny_df):
    cfg = ComboConfig(["lang"])
    out = analyze(tiny_df, cfg, lang_col="lang").collect()
    got = {r["doc_id"]: [t["term"] for t in r["tokens"]] for r in out}
    # java doc -> identifier analyzer splits camelCase/snake_case
    assert got[1][:3] == ["get", "foo", "bar"]
    # de doc -> standard (default) keeps words, lowercased
    assert "schöner" in got[2]


def test_build_term_stats(spark, tiny_df):
    import numpy as np

    from elasticsearch_analysis_combo_spark.operators.codec import (
        decode_positions_flat,
    )

    stats = build_term_stats(tiny_df, CFG, content_col="content").collect()
    by_doc = {}
    for r in stats:
        poss = decode_positions_flat(
            bytes(r["pos_data"]), np.array([r["tf"]], dtype=np.int64)
        ).tolist()
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = (r["tf"], poss, r["dl"])
    exp_stats, exp_dl = term_stats(analyze_text("just a little test 0", CFG))
    assert {t: (tf, ps) for t, (tf, ps) in exp_stats.items()} == {
        t: (tf, ps) for t, (tf, ps, _) in by_doc[0].items()
    }
    assert all(dl == exp_dl for _, _, dl in by_doc[0].values())
    assert 3 not in by_doc  # empty doc -> no rows
