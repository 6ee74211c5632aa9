"""Ports of every golden vector in the reference test suite.

Sources (FIXTURES.md §3):
  TestComboAnalyzer.java:42-147, TestComboTokenStream.java:106-212,
  TestIntegration.java:82-87, README.md:97-154.

Order contract: exact under the total key (pos, start, end, analyzer_idx);
the single heap-tie case (integration english vector, pos-3 group) is
asserted order-insensitively per SURVEY.md §2 determinism note.
"""

import pytest

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
    to_pos_increments,
)
from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    make_replay_tokenizer,
)


def run(text, cfg, lang=None):
    toks = analyze_text(text, cfg, lang)
    return (
        [t.term for t in toks],
        [t.start for t in toks],
        [t.end for t in toks],
        to_pos_increments(toks),
    )


@pytest.mark.parametrize("i", range(3))
def test_single_analyzer(i):
    # TestComboAnalyzer.java:42-51
    terms, starts, ends, incs = run(f"just a little test {i}", ComboConfig(["whitespace"]))
    assert terms == ["just", "a", "little", "test", str(i)]
    assert starts == [0, 5, 7, 14, 19]
    assert ends == [4, 6, 13, 18, 20]
    assert incs == [1, 1, 1, 1, 1]


@pytest.mark.parametrize("i", range(3))
def test_multiple_analyzers(i):
    # TestComboAnalyzer.java:53-66
    text = f"just a little test {i}"
    terms, starts, ends, incs = run(text, ComboConfig(["whitespace", "standard", "keyword"]))
    assert terms == ["just", "just", text, "a", "little", "little", "test", "test", str(i), str(i)]
    assert starts == [0, 0, 0, 5, 7, 7, 14, 14, 19, 19]
    assert ends == [4, 4, 20, 6, 13, 13, 18, 18, 20, 20]
    assert incs == [1, 0, 0, 1, 1, 0, 1, 0, 1, 0]


@pytest.mark.parametrize("i", range(3))
def test_multiple_analyzers_deduplication(i):
    # TestComboAnalyzer.java:69-82
    text = f"just a little test {i}"
    cfg = ComboConfig(["whitespace", "standard", "keyword"], deduplication=True)
    terms, starts, ends, incs = run(text, cfg)
    assert terms == ["just", text, "a", "little", "test", str(i)]
    assert starts == [0, 0, 5, 7, 14, 19]
    assert ends == [4, 20, 6, 13, 18, 20]
    assert incs == [1, 0, 1, 1, 1, 1]


@pytest.mark.parametrize("i", range(3))
def test_three_times_same_analyzer(i):
    # TestComboAnalyzer.java:85-98 — repeating an analyzer is legal; the
    # reference needs caching for this (ComboAnalyzer.java:233-249), we don't.
    text = f"just a little test {i}"
    terms, starts, ends, incs = run(text, ComboConfig(["whitespace"] * 3))
    assert terms == [w for w in ["just", "a", "little", "test", str(i)] for _ in range(3)]
    assert incs == [1, 0, 0] * 5


@pytest.mark.parametrize("i", range(3))
def test_cascade_combo(i):
    # TestComboAnalyzer.java:101-116 (also covers :119-135 — caching variant
    # is semantically identical here)
    text = f"just a little test {i}"
    inner = ComboConfig(["whitespace", "keyword"])
    terms, starts, ends, incs = run(text, ComboConfig([inner, "standard", "keyword"]))
    assert terms == ["just", "just", text, text, "a", "little", "little", "test", "test", str(i), str(i)]
    assert starts == [0, 0, 0, 0, 5, 7, 7, 14, 14, 19, 19]
    assert ends == [4, 4, 20, 20, 6, 13, 13, 18, 18, 20, 20]
    assert incs == [1, 0, 0, 0, 1, 1, 0, 1, 0, 1, 0]


REPLAY_AB = dict(terms=["ab", "cd", "ef"], starts=[0, 3, 5], ends=[2, 4, 6], pos_incs=[1, 1, 1])
REPLAY_BDF = dict(terms=["B", "D", "F"], starts=[1, 4, 6], ends=[2, 4, 6], pos_incs=[1, 1, 1])
REPLAY_AF = dict(
    terms=["A", "B", "C", "D", "E", "F"],
    starts=[0, 1, 3, 4, 5, 6],
    ends=[1, 2, 3, 4, 5, 6],
    pos_incs=[1, 0, 1, 0, 1, 0],
)


def test_single_token_stream():
    # TestComboTokenStream.java:106-120
    r = make_replay_tokenizer(**REPLAY_AB)
    terms, starts, ends, incs = run("", ComboConfig([r]))
    assert (terms, starts, ends, incs) == (["ab", "cd", "ef"], [0, 3, 5], [2, 4, 6], [1, 1, 1])


@pytest.mark.parametrize("reverse", [False, True])
def test_double_token_stream(reverse):
    # TestComboTokenStream.java:122-159 (both argument orders)
    subs = [make_replay_tokenizer(**REPLAY_AB), make_replay_tokenizer(**REPLAY_BDF)]
    if reverse:
        subs.reverse()
    terms, starts, ends, incs = run("", ComboConfig(subs))
    assert terms == ["ab", "B", "cd", "D", "ef", "F"]
    assert starts == [0, 1, 3, 4, 5, 6]
    assert ends == [2, 2, 4, 4, 6, 6]
    assert incs == [1, 0, 1, 0, 1, 0]


@pytest.mark.parametrize("reverse", [False, True])
def test_double_token_stream_multiple_at_same_position(reverse):
    # TestComboTokenStream.java:162-212, KEEP_STREAM_IF_SAME_POSITION=false
    # branch (the compiled-in setting, ComboTokenStream.java:42)
    subs = [make_replay_tokenizer(**REPLAY_AB), make_replay_tokenizer(**REPLAY_AF)]
    if reverse:
        subs.reverse()
    terms, starts, ends, incs = run("", ComboConfig(subs))
    assert terms == ["A", "ab", "B", "C", "cd", "D", "E", "ef", "F"]
    assert starts == [0, 0, 1, 3, 3, 4, 5, 5, 6]
    assert ends == [1, 2, 2, 3, 4, 4, 5, 6, 6]
    assert incs == [1, 0, 0, 1, 0, 0, 1, 0, 0]


def test_integration_english():
    # TestIntegration.java:82-87: [whitespace, english, keyword] over
    # "just a little test" — order-insensitive within the pos-3 heap-tie
    # group {littl, little} (SURVEY.md §2 determinism note).
    toks = analyze_text("just a little test", ComboConfig(["whitespace", "english", "keyword"]))
    got = [(t.term, t.pos) for t in toks]
    assert sorted(got) == sorted(
        [("just", 1), ("just", 1), ("just a little test", 1), ("a", 2),
         ("littl", 3), ("little", 3), ("test", 4), ("test", 4)]
    )
    # positions must be exactly the reference's {1,1,1,2,3,3,4,4}
    assert [p for _, p in got] == [1, 1, 1, 2, 3, 3, 4, 4]


def test_german_folding():
    # README.md:97-154: standard + german-folding combo indexes original and
    # folded forms at the same positions; dedup removes pure-ASCII doubles.
    cfg = ComboConfig(["lowercase", "german_fold"], deduplication=True)
    toks = analyze_text("Ein schöner Tag in Köln", cfg)
    got = [(t.term, t.pos) for t in toks]
    assert ("schöner", 2) in got and ("schoner", 2) in got
    assert ("köln", 5) in got and ("koln", 5) in got
    assert got.count(("ein", 1)) == 1  # folded double deduplicated


def test_german2_umlaut_expansion():
    # README.md:92-96: snowball German2 EXPANDS umlauts (ä->ae, ö->oe,
    # ü->ue) rather than stripping to the bare vowel; ß folds to ss.
    # Same combo shape as the README example: originals + expanded forms
    # merged per position.
    cfg = ComboConfig(["lowercase", "german2_fold"], deduplication=True)
    toks = analyze_text("Ein schöner Tag in Köln", cfg)
    got = [(t.term, t.pos) for t in toks]
    assert ("schöner", 2) in got and ("schoener", 2) in got
    assert ("köln", 5) in got and ("koeln", 5) in got
    assert ("schoner", 2) not in got  # NOT the NFKD strip
    assert got.count(("ein", 1)) == 1
    # ß and the three umlauts, uppercase included
    from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
        german2_fold_text,
    )
    assert german2_fold_text("größe") == "groesse"
    assert german2_fold_text("über") == "ueber"
    assert german2_fold_text("Äpfel".lower()) == "aepfel"
    # non-German accents still de-accent like the ICU fold
    assert german2_fold_text("café") == "cafe"


def test_identifier_split():
    # FIXTURES.md §3 case 10 (engine extension, north_star code-awareness)
    toks = analyze_text("getFooBar snake_case_id", ComboConfig(["identifier"]))
    assert [(t.term, t.pos) for t in toks] == [
        ("get", 1), ("foo", 2), ("bar", 3), ("snake", 4), ("case", 5), ("id", 6)
    ]
    assert [(t.start, t.end) for t in toks] == [
        (0, 3), (3, 6), (6, 9), (10, 15), (16, 20), (21, 23)
    ]


def test_missing_sub_analyzers_raises():
    # ComboAnalyzerWrapper.java:74-76
    with pytest.raises(ValueError):
        ComboConfig([])


def test_unknown_sub_analyzer_skipped():
    # ComboAnalyzerWrapper.java:78-85: warn + skip, not fail
    cfg = ComboConfig(["whitespace", "no_such_analyzer"])
    terms, *_ = run("just a test", cfg)
    assert terms == ["just", "a", "test"]


def test_dedup_idempotent_and_merge_is_multiset_union():
    # property tests per SURVEY.md §5
    cfg = ComboConfig(["whitespace", "standard"])
    toks = analyze_text("the quick brown fox the fox", cfg)
    ws = analyze_text("the quick brown fox the fox", ComboConfig(["whitespace"]))
    st = analyze_text("the quick brown fox the fox", ComboConfig(["standard"]))
    assert sorted((t.term, t.pos) for t in toks) == sorted(
        [(t.term, t.pos) for t in ws] + [(t.term, t.pos) for t in st]
    )
    cfg_d = ComboConfig(["whitespace", "standard"], deduplication=True)
    toks_d = analyze_text("the quick brown fox the fox", cfg_d)
    seen = [(t.pos, t.term) for t in toks_d]
    assert len(seen) == len(set(seen))
    # positions monotone non-decreasing
    assert all(a.pos <= b.pos for a, b in zip(toks_d, toks_d[1:]))
