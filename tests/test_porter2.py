"""Porter2 golden vectors — every example embedded in the public
Snowball 'english' specification text, plus the exceptional forms."""

import pytest

from elasticsearch_analysis_combo_spark.analysis.porter2 import porter2_stem


SPEC_EXAMPLES = [
    # step 1a examples
    ("ties", "tie"), ("cries", "cri"),
    ("gas", "gas"), ("this", "this"), ("gaps", "gap"), ("kiwis", "kiwi"),
    # step 1b examples
    ("agreed", "agre"),        # eed -> ee (then step 5 drops e)
    ("feed", "feed"),          # eed not in R1
    ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"),  # at -> ate, step 5 drops e (R2? no: R1)
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"),
    ("hoping", "hope"),
    # step 1c
    ("cry", "cri"), ("by", "by"), ("say", "say"),
]

EXCEPTIONAL = [
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"), ("lying", "lie"),
    ("tying", "tie"), ("idly", "idl"), ("gently", "gentl"),
    ("ugly", "ugli"), ("early", "earli"), ("only", "onli"),
    ("singly", "singl"), ("sky", "sky"), ("news", "news"),
    ("atlas", "atlas"), ("cosmos", "cosmos"), ("bias", "bias"),
    ("andes", "andes"),
    # post-1a invariants
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"),
    ("proceed", "proceed"), ("exceed", "exceed"), ("succeed", "succeed"),
]

SUFFIX_CHAINS = [
    # step 2/3/4 combinations
    ("nationality", "nation"),        # aliti->al, (step3/4) al dropped
    ("rationalization", "ration"),    # ization->ize ... al->'' ...
    ("sensational", "sensat"),        # ational->ate, e dropped
    ("conditional", "condit"),        # tional->tion, ion dropped (R2, t)
    ("effectiveness", "effect"),      # iveness->ive, ive dropped in R2
    ("dependencies", "depend"),       # ies->i, enci->ence, ence dropped
    ("hopefully", "hope"),            # fulli->ful, ful dropped
    ("generously", "generous"),       # R1 override: gener- prefix
    # commun- R1 override, but 'ism' starts before R2 -> kept
    ("communism", "communism"),
    ("adjustment", "adjust"),
    ("adoption", "adopt"),
    ("formalize", "formal"),
    ("electrical", "electr"),
    ("authenticate", "authent"),
]


@pytest.mark.parametrize("word,want", SPEC_EXAMPLES)
def test_spec_examples(word, want):
    assert porter2_stem(word) == want


@pytest.mark.parametrize("word,want", EXCEPTIONAL)
def test_exceptional_forms(word, want):
    assert porter2_stem(word) == want


@pytest.mark.parametrize("word,want", SUFFIX_CHAINS)
def test_suffix_chains(word, want):
    assert porter2_stem(word) == want


def test_short_and_case():
    assert porter2_stem("a") == "a"
    assert porter2_stem("ab") == "ab"
    assert porter2_stem("Generously") == "generous"


def test_consonant_y_preserved():
    # word-initial y acts as a consonant; 'li' after r deletes (step 2)
    assert porter2_stem("yearly") == "year"
    assert porter2_stem("enjoying") == "enjoy"
    assert porter2_stem("ying") == "ying"  # initial Y is not a vowel


def test_english_snowball_analyzer_registered():
    from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
        make_english_tokenizer,
        resolve_analyzer,
    )

    tok = resolve_analyzer("english_snowball")
    assert [t.term for t in tok("The dependencies are failing")] == [
        "depend", "fail",
    ]
    # keyword_marker / stemmer_override still compose over porter2
    custom = make_english_tokenizer(
        protected={"dependencies"}, overrides={"failing": "flunk"},
        stemmer="english",
    )
    assert [t.term for t in custom("The dependencies are failing")] == [
        "dependencies", "flunk",
    ]
    import pytest as _pt
    with _pt.raises(ValueError):
        make_english_tokenizer(stemmer="klingon")
