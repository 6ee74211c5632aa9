"""Golden vectors for the round-4k analysis additions: letter,
char_group, path_hierarchy, uax_url_email tokenizers; limit, trim,
uppercase, common_grams, pattern_capture, phonetic(soundex) filters.

Vectors come from the public ES tokenizer/token-filter docs examples
(the reference plugin composes arbitrary ES analyzers, reference
ComboAnalyzerWrapper.java:78-85, so the named-analyzer surface is the
parity target)."""

from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    letter_tokenizer,
    make_char_group_tokenizer,
    make_common_grams_tokenizer,
    make_limit_tokenizer,
    make_path_hierarchy_tokenizer,
    make_pattern_capture_tokenizer,
    make_phonetic_tokenizer,
    make_trim_tokenizer,
    make_uppercase_tokenizer,
    resolve_analyzer,
    soundex,
    uax_url_email_tokenizer,
)


def terms(toks):
    return [t.term for t in toks]


class TestLetter:
    def test_es_docs_example(self):
        # ES letter tokenizer docs example — case preserved
        out = letter_tokenizer(
            "The 2 QUICK Brown-Foxes jumped over the lazy dog's bone."
        )
        assert terms(out) == [
            "The", "QUICK", "Brown", "Foxes", "jumped", "over", "the",
            "lazy", "dog", "s", "bone",
        ]

    def test_offsets(self):
        text = "a-b"
        out = letter_tokenizer(text)
        assert [(t.start, t.end) for t in out] == [(0, 1), (2, 3)]


class TestCharGroup:
    def test_es_docs_example(self):
        # ES char_group docs: tokenize_on_chars [whitespace, -, \n]
        cg = make_char_group_tokenizer(["whitespace", "-", "\n"])
        out = cg("The QUICK brown-fox")
        assert terms(out) == ["The", "QUICK", "brown", "fox"]

    def test_class_specials(self):
        cg = make_char_group_tokenizer(["digit", "punctuation"])
        assert terms(cg("ab1cd,ef")) == ["ab", "cd", "ef"]

    def test_max_token_length_splits(self):
        cg = make_char_group_tokenizer(["whitespace"], max_token_length=3)
        out = cg("abcdefg hi")
        assert terms(out) == ["abc", "def", "g", "hi"]
        assert [t.pos for t in out] == [1, 2, 3, 4]
        # offsets still index the original text
        assert [(t.start, t.end) for t in out] == [
            (0, 3), (3, 6), (6, 7), (8, 10),
        ]


class TestPathHierarchy:
    def test_es_docs_forward(self):
        ph = make_path_hierarchy_tokenizer("/")
        out = ph("/one/two/three")
        assert terms(out) == ["/one", "/one/two", "/one/two/three"]
        # all stacked at one position (posInc 1, 0, 0 in Lucene)
        assert [t.pos for t in out] == [1, 1, 1]
        assert [(t.start, t.end) for t in out] == [
            (0, 4), (0, 8), (0, 14),
        ]

    def test_es_docs_reverse(self):
        ph = make_path_hierarchy_tokenizer("/", reverse=True)
        assert terms(ph("one/two/three")) == [
            "one/two/three", "two/three", "three",
        ]

    def test_skip_and_replacement(self):
        ph = make_path_hierarchy_tokenizer("/", replacement="-", skip=1)
        assert terms(ph("/one/two/three")) == [
            "-one-two", "-one-two-three",
        ]

    def test_no_delimiter(self):
        ph = make_path_hierarchy_tokenizer("/")
        assert terms(ph("plain")) == ["plain"]


class TestUaxUrlEmail:
    def test_es_docs_example(self):
        out = uax_url_email_tokenizer(
            "Email me at john.smith@global-international.com"
        )
        assert terms(out) == [
            "email", "me", "at", "john.smith@global-international.com",
        ]
        assert out[-1].type == "<EMAIL>"

    def test_url_survives(self):
        out = uax_url_email_tokenizer(
            "see https://Example.com/a_b?x=1#frag now"
        )
        assert terms(out) == [
            "see", "https://example.com/a_b?x=1#frag", "now",
        ]
        assert out[1].type == "<URL>"

    def test_positions_sequential(self):
        out = uax_url_email_tokenizer("a b@c.de f")
        assert [t.pos for t in out] == [1, 2, 3]


class TestLimitTrimUppercase:
    def test_limit(self):
        lt = make_limit_tokenizer("whitespace", max_token_count=2)
        assert terms(lt("one two three four")) == ["one", "two"]

    def test_trim(self):
        tr = make_trim_tokenizer("keyword")
        out = tr("  padded value  ")
        assert terms(out) == ["padded value"]
        # offsets unchanged (Lucene TrimFilter)
        assert (out[0].start, out[0].end) == (0, 16)

    def test_uppercase(self):
        up = make_uppercase_tokenizer("whitespace")
        assert terms(up("the Quick")) == ["THE", "QUICK"]


class TestCommonGrams:
    def test_es_docs_example(self):
        # ES common_grams docs: common_words [is, the]
        cg = make_common_grams_tokenizer(
            "lowercase", {"is", "the"}
        )
        out = cg("the quick fox is brown")
        assert terms(out) == [
            "the", "the_quick", "quick", "fox", "fox_is", "is",
            "is_brown", "brown",
        ]
        # bigrams stack at the FIRST member's position
        assert [(t.term, t.pos) for t in out] == [
            ("the", 1), ("the_quick", 1), ("quick", 2), ("fox", 3),
            ("fox_is", 3), ("is", 4), ("is_brown", 4), ("brown", 5),
        ]
        gram = [t for t in out if t.type == "gram"]
        assert len(gram) == 3

    def test_query_mode_drops_common_unigrams(self):
        cg = make_common_grams_tokenizer(
            "lowercase", {"the"}, query_mode=True
        )
        assert terms(cg("the quick fox")) == [
            "the_quick", "quick", "fox",
        ]

    def test_ignore_case(self):
        cg = make_common_grams_tokenizer(
            "whitespace", {"the"}, ignore_case=True
        )
        assert "The_quick" in terms(cg("The quick"))


class TestPatternCapture:
    def test_es_docs_email_example(self):
        # ES pattern_capture docs: splitting an email into parts
        pc = make_pattern_capture_tokenizer(
            "lowercase",
            [r"([^@]+)", r"(\p{L}+)".replace(r"\p{L}", "[a-z]"),
             r"(\d+)", r"@(.+)"],
        )
        out = pc("john-smith_123@foo-bar.com")
        got = terms(out)
        assert got[0] == "john-smith_123@foo-bar.com"  # preserved
        for expect in ["john-smith_123", "john", "smith", "123",
                       "foo-bar.com"]:
            assert expect in got
        # all captures stack at the original's position with its offsets
        assert {t.pos for t in out} == {1}
        assert {(t.start, t.end) for t in out} == {(0, 26)}

    def test_no_preserve(self):
        pc = make_pattern_capture_tokenizer(
            "whitespace", [r"(\d+)"], preserve_original=False
        )
        assert terms(pc("abc123def456")) == ["123", "456"]


class TestSoundex:
    def test_census_vectors(self):
        # the canonical American Soundex examples (census rules)
        assert soundex("Robert") == "R163"
        assert soundex("Rupert") == "R163"
        assert soundex("Ashcraft") == "A261"  # H transparent
        assert soundex("Ashcroft") == "A261"
        assert soundex("Tymczak") == "T522"  # cz collapse, vowel split
        assert soundex("Pfister") == "P236"  # Pf same code at head
        assert soundex("Honeyman") == "H555"

    def test_short_and_empty(self):
        assert soundex("Lee") == "L000"
        assert soundex("42") == ""

    def test_filter_replace_and_inject(self):
        ph = make_phonetic_tokenizer("whitespace")
        assert terms(ph("Robert Rupert")) == ["R163", "R163"]
        inj = make_phonetic_tokenizer("whitespace", replace=False)
        out = inj("Robert")
        assert terms(out) == ["Robert", "R163"]
        assert [t.pos for t in out] == [1, 1]
        # non-letter terms pass through
        assert terms(ph("42")) == ["42"]


class TestRegistry:
    def test_defaults_registered(self):
        for name in ["letter", "uax_url_email", "char_group",
                     "path_hierarchy", "path_hierarchy_rev",
                     "common_grams", "phonetic"]:
            assert resolve_analyzer(name) is not None
