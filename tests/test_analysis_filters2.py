"""Golden vectors for the round-4j analysis additions: word_delimiter,
elision, apostrophe, decimal_digit, mapping char filter, fingerprint
analyzer, keyword_marker/stemmer_override english variant.

Vectors come from the public ES token-filter docs examples (the reference
plugin composes arbitrary ES analyzers, reference
ComboAnalyzerWrapper.java:78-85, so the named-analyzer surface is the
parity target)."""

from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    FRENCH_ELISION_ARTICLES,
    make_apostrophe_tokenizer,
    make_decimal_digit_tokenizer,
    make_elision_tokenizer,
    make_english_tokenizer,
    make_fingerprint_analyzer,
    make_mapping_char_filter_tokenizer,
    make_word_delimiter_tokenizer,
    resolve_analyzer,
    word_delimiter_parts,
)


def terms(toks):
    return [t.term for t in toks]


class TestWordDelimiter:
    def test_es_docs_example(self):
        # ES word_delimiter docs example, default flags
        wd = make_word_delimiter_tokenizer("whitespace")
        out = wd("Neil's Super-Duper-XL500--42+AutoCoder")
        assert terms(out) == [
            "Neil", "Super", "Duper", "XL", "500", "42", "Auto", "Coder",
        ]
        # positions re-accumulated Lucene-style: one step per sub-word
        assert [t.pos for t in out] == [1, 2, 3, 4, 5, 6, 7, 8]

    def test_offsets_index_original_text(self):
        wd = make_word_delimiter_tokenizer("whitespace")
        text = "PowerShot SD500"
        out = wd(text)
        assert [(t.term, text[t.start:t.end]) for t in out] == [
            ("Power", "Power"), ("Shot", "Shot"),
            ("SD", "SD"), ("500", "500"),
        ]

    def test_acronym_boundary(self):
        assert word_delimiter_parts("XMLHttpRequest") == [
            "XML", "Http", "Request"
        ]

    def test_flags_off(self):
        assert word_delimiter_parts(
            "PowerShot500", split_on_case_change=False
        ) == ["PowerShot", "500"]
        assert word_delimiter_parts(
            "PowerShot500", split_on_numerics=False
        ) == ["Power", "Shot500"]
        assert word_delimiter_parts(
            "Neil's", stem_english_possessive=False
        ) == ["Neil", "s"]

    def test_preserve_original_stacks_same_position(self):
        wd = make_word_delimiter_tokenizer(
            "whitespace", preserve_original=True
        )
        out = wd("Wi-Fi ok")
        assert [(t.term, t.pos) for t in out] == [
            ("Wi", 1), ("Fi", 2), ("Wi-Fi", 1), ("ok", 3),
        ]

    def test_base_position_gaps_survive(self):
        # standard base drops stopwords leaving gaps; the first sub-word
        # keeps the base increment
        wd = make_word_delimiter_tokenizer("standard")
        out = wd("the wi-fi router")
        assert [(t.term, t.pos) for t in out] == [
            ("wi", 2), ("fi", 3), ("router", 4),
        ]

    def test_all_punct_token_emits_nothing(self):
        wd = make_word_delimiter_tokenizer("whitespace")
        assert terms(wd("a -- b")) == ["a", "b"]

    def test_registry_default(self):
        assert terms(resolve_analyzer("word_delimiter")("XL500")) == [
            "XL", "500"
        ]


class TestElision:
    def test_es_docs_example(self):
        el = make_elision_tokenizer("whitespace")
        assert terms(el("j'examine près du wharf")) == [
            "examine", "près", "du", "wharf",
        ]

    def test_case_insensitive_by_default(self):
        el = make_elision_tokenizer("whitespace")
        assert terms(el("L'avion")) == ["avion"]

    def test_articles_case_sensitive(self):
        el = make_elision_tokenizer(
            "whitespace", articles={"l"}, articles_case=True
        )
        assert terms(el("L'avion l'eau")) == ["L'avion", "eau"]

    def test_non_article_apostrophe_kept(self):
        el = make_elision_tokenizer("whitespace")
        assert terms(el("o'clock")) == ["o'clock"]
        assert "o" not in FRENCH_ELISION_ARTICLES

    def test_typographic_apostrophe(self):
        el = make_elision_tokenizer("whitespace")
        assert terms(el("l’avion")) == ["avion"]


class TestApostrophe:
    def test_es_docs_example(self):
        ap = make_apostrophe_tokenizer("whitespace")
        assert terms(ap("Istanbul'a veya Istanbul'dan")) == [
            "Istanbul", "veya", "Istanbul",
        ]

    def test_leading_apostrophe_drops_token(self):
        ap = make_apostrophe_tokenizer("whitespace")
        assert terms(ap("'tis fine")) == ["fine"]


class TestDecimalDigit:
    def test_arabic_indic(self):
        dd = make_decimal_digit_tokenizer("whitespace")
        assert terms(dd("١٢٣ ok")) == ["123", "ok"]

    def test_mixed_scripts_and_ascii_passthrough(self):
        dd = make_decimal_digit_tokenizer("whitespace")
        # Devanagari ३ and fullwidth ５
        assert terms(dd("v३ x５ 42")) == ["v3", "x5", "42"]


class TestMappingCharFilter:
    def test_longest_match_wins(self):
        mp = make_mapping_char_filter_tokenizer(
            "whitespace", {":)": "happy", ":": "colon"}
        )
        assert terms(mp("a :) b")) == ["a", "happy", "b"]

    def test_equal_length_mapping_keeps_offsets(self):
        mp = make_mapping_char_filter_tokenizer("whitespace", {"&": "+"})
        text = "a & b"
        out = mp(text)
        assert [(t.term, t.start, t.end) for t in out] == [
            ("a", 0, 1), ("+", 2, 3), ("b", 4, 5),
        ]


class TestFingerprint:
    def test_es_docs_example(self):
        fp = make_fingerprint_analyzer()
        out = fp("Yes yes, Gödel said this sentence is consistent and.")
        assert terms(out) == [
            "and consistent godel is said sentence this yes"
        ]
        assert out[0].pos == 1

    def test_max_output_size_discards(self):
        fp = make_fingerprint_analyzer(max_output_size=10)
        assert fp("alpha beta gamma delta") == []

    def test_stopwords(self):
        fp = make_fingerprint_analyzer(stopwords=frozenset({"the", "a"}))
        assert terms(fp("the quick a fox")) == ["fox quick"]

    def test_empty_input(self):
        assert make_fingerprint_analyzer()("") == []
        assert make_fingerprint_analyzer()("...") == []


class TestEnglishCustom:
    def test_keyword_marker_protects(self):
        en = make_english_tokenizer(protected={"running"})
        assert terms(en("running runs")) == ["running", "run"]

    def test_stemmer_override_wins_and_is_final(self):
        en = make_english_tokenizer(overrides={"mice": "mouse"})
        # override applies INSTEAD of Porter (porter would leave "mice")
        assert terms(en("mice running")) == ["mouse", "run"]

    def test_plain_matches_builtin_english(self):
        base = resolve_analyzer("english")
        custom = make_english_tokenizer()
        text = "just a little test of the engine's stemming"
        assert custom(text) == base(text)


class TestKeywordRepeat:
    def test_original_and_stem_stack_same_position(self):
        from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
            make_keyword_repeat_tokenizer,
        )
        kr = make_keyword_repeat_tokenizer("lowercase")
        out = kr("running tests run")
        assert [(t.term, t.pos, t.type) for t in out] == [
            ("running", 1, "word"), ("run", 1, "stem"),
            ("tests", 2, "word"), ("test", 2, "stem"),
            ("run", 3, "word"),   # stem == surface -> no duplicate
        ]
        # offsets of the stem copy mirror the original token
        assert (out[1].start, out[1].end) == (out[0].start, out[0].end)

    def test_combo_merge_dedups_identical_pairs(self):
        # keyword_repeat + a second plain analyzer through the combo
        # merge: same-position dedup keeps the first emission only
        from elasticsearch_analysis_combo_spark.analysis.combo import (
            ComboConfig, analyze_text,
        )
        cfg = ComboConfig(
            ["keyword_repeat", "lowercase"], deduplication=True
        )
        terms = [(t.term, t.pos) for t in analyze_text("Caches", cfg)]
        assert terms == [("caches", 1), ("cach", 1)]
