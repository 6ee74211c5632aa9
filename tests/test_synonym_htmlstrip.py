"""Synonym filter (same-position stacking) and html_strip char filter."""

import pytest

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    make_html_strip_tokenizer,
    make_synonym_tokenizer,
    resolve_analyzer,
    strip_html,
)


def test_synonym_same_position_stacking():
    syn = make_synonym_tokenizer("whitespace", {"fast": ["quick", "rapid"]})
    toks = syn("a fast car")
    got = [(t.term, t.pos, t.start, t.end, t.type) for t in toks]
    assert got == [
        ("a", 1, 0, 1, "word"),
        ("fast", 2, 2, 6, "word"),
        ("quick", 2, 2, 6, "SYNONYM"),
        ("rapid", 2, 2, 6, "SYNONYM"),
        ("car", 3, 7, 10, "word"),
    ]


def test_synonym_matches_lowercase_by_default():
    syn = make_synonym_tokenizer("whitespace", {"fast": ["quick"]})
    assert [t.term for t in syn("FAST")] == ["FAST", "quick"]
    exact = make_synonym_tokenizer(
        "whitespace", {"fast": ["quick"]}, match_lowercase=False
    )
    assert [t.term for t in exact("FAST")] == ["FAST"]


def test_synonym_in_combo_with_dedup():
    """A synonym identical to a same-position token from another analyzer
    dedupes (keep-first), exactly the reference's same-position rule."""
    syn = make_synonym_tokenizer("whitespace", {"fast": ["fast", "quick"]})
    toks = analyze_text("fast", ComboConfig([syn], deduplication=True))
    assert [t.term for t in toks] == ["fast", "quick"]


def test_html_strip_offsets_point_into_markup():
    hs = make_html_strip_tokenizer("whitespace")
    text = "<p>hello <b>big</b> world</p>"
    toks = hs(text)
    assert [(t.term, text[t.start:t.end]) for t in toks] == [
        ("hello", "hello"), ("big", "big"), ("world", "world"),
    ]
    assert strip_html("<br/>x") == "     x"


def test_html_strip_quoted_attrs_and_comments():
    """A '>' inside a quoted attribute value or a comment must not
    terminate the tag (leaves markup fragments as bogus tokens)."""
    t1 = '<a href="x>y">link</a>'
    assert strip_html(t1).split() == ["link"]
    t2 = "<!-- a > b -->note"
    assert strip_html(t2).split() == ["note"]
    t3 = "<img alt='w > h'/>pic"
    assert strip_html(t3).split() == ["pic"]
    # offsets still index the original markup
    hs = make_html_strip_tokenizer("whitespace")
    tok = hs(t1)[0]
    assert t1[tok.start:tok.end] == "link"


def test_synonym_change_under_same_name_changes_fingerprint():
    """Re-creating a named synonym analyzer with DIFFERENT settings must
    change the config digest index builds fingerprint on — else a rebuild
    silently resumes stale checkpoints."""
    from elasticsearch_analysis_combo_spark.plans.index_build import (
        _config_dict,
    )

    a = make_synonym_tokenizer("whitespace", {"fast": ["quick"]}, name="fpx")
    d1 = _config_dict(ComboConfig([a]))
    b = make_synonym_tokenizer("whitespace", {"fast": ["rapid"]}, name="fpx")
    d2 = _config_dict(ComboConfig([b]))
    assert d1["sub_analyzers"] == d2["sub_analyzers"] == ["fpx"]
    assert d1["analyzer_digests"] != d2["analyzer_digests"]
    # unchanged settings -> same digest (checkpoint resume keeps working)
    c = make_synonym_tokenizer("whitespace", {"fast": ["quick"]}, name="fpx")
    assert _config_dict(ComboConfig([c]))["analyzer_digests"] == d1[
        "analyzer_digests"
    ]


def test_resolve_unknown_analyzer_raises():
    with pytest.raises(KeyError, match="unknown analyzer"):
        resolve_analyzer("nope_does_not_exist")


def test_synonym_index_end_to_end(spark, tmp_path):
    """Named synonym analyzer through the full engine: the index stores
    synonym postings, a query for the synonym finds the original doc, and
    meta records the stable registered name (not a callable repr)."""
    import json
    import os

    from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine

    syn = make_synonym_tokenizer(
        "whitespace", {"fast": ["quick"]}, name="test_syn_e2e"
    )
    rows = [(0, "fast car"), (1, "slow truck")]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    eng = ComboSearchEngine(
        spark, ComboConfig([syn]), str(tmp_path / "idx"), salt_shards=2
    )
    eng.index(corpus)
    # the synonym term retrieves the doc that only contains the original
    hits = eng.search("quick", k=5, partitioned=False).collect()
    assert [r["doc_id"] for r in hits] == [0]
    meta = json.load(open(os.path.join(str(tmp_path / "idx"), "meta.json")))
    assert meta["config"]["sub_analyzers"] == ["test_syn_e2e"]
