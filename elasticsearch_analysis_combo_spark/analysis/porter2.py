"""Porter2 (Snowball "english") stemmer — the stemmer ES's default
``english`` analyzer and ``"stemmer": "english"`` token filter actually
run (the original Porter algorithm, in :mod:`porter`, is ES's
``porter`` / Lucene PorterStemFilter). Implemented from the public
Snowball specification; the test vectors are the examples embedded in
that specification text.

Differences from Porter1 that matter in practice: the exceptional-form
list (skis/dying/news/...), the ``li``-deletion rule, y->i only past
the first letter, and the R1 override for gener-/commun-/arsen-.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

_STEP2 = [  # longest-match order; (suffix, replacement, condition)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _mark_ys(word: str) -> str:
    # consonant-y marking: initial y and y after a vowel act as consonants
    out = []
    prev_vowel = False
    for i, c in enumerate(word):
        if c == "y" and (i == 0 or prev_vowel):
            out.append("Y")
            prev_vowel = False
        else:
            out.append(c)
            prev_vowel = c in _VOWELS
    return "".join(out)


def _r1_start(word: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            return len(pre)
    for i in range(1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return len(word)


def _r2_start(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    # (a) vowel + non-vowel(not w/x/Y) preceded by a non-vowel, or
    # (b) the whole word is vowel + non-vowel
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        return (
            word[-1] not in _VOWELS and word[-1] not in "wxY"
            and word[-2] in _VOWELS and word[-3] not in _VOWELS
        )
    return False


def porter2_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.lower()
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]
    if word.startswith("'"):
        word = word[1:]
    word = _mark_ys(word)
    r1 = _r1_start(word)
    r2 = _r2_start(word, r1)

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= r2

    def has_vowel(part: str) -> bool:
        return any(c in _VOWELS for c in part)

    # step 0: possessives
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("ie" if len(word) <= 4 else "i")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and has_vowel(word[:-2]):
        word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if in_r1(suf):
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if has_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and _r1_start(
                        word
                    ) == len(word):
                        word += "e"
                break

    # step 1c: y -> i after a non-vowel that isn't the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    r1 = _r1_start(word)
    r2 = _r2_start(word, r1)

    # step 2
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if suf == "ative":
                if in_r2(suf):
                    word = word[: -len(suf)]
            elif in_r1(suf):
                word = word[: -len(suf)] + rep
            break

    # step 4
    r1 = _r1_start(word)
    r2 = _r2_start(word, r1)
    for suf in _STEP4:
        if word.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    r1 = _r1_start(word)
    r2 = _r2_start(word, r1)
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1
            and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(
        word
    ) > 1 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")
