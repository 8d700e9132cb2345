"""Snowball English stemmer ("Porter2"), pure Python.

Re-implements the published Snowball English algorithm
(https://snowballstem.org/algorithms/english/stemmer.html) that Tantivy's
``Stemmer::new(Language::English)`` delegates to via the rust-stemmers crate
(reference: /root/reference/src/tokenizer.rs:35-45 with the language table at
/root/reference/src/helpers.rs:18-40).

No third-party stemmer package is available in this environment, so the
algorithm is implemented from the public specification. It is a pure function
so it can run both inside vectorized pandas UDFs (executor side, with a
per-batch memo cache) and on the driver for query-string analysis.
"""

from __future__ import annotations

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = set("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS2 = {
    "inning",
    "outing",
    "canning",
    "herring",
    "earring",
    "proceed",
    "exceed",
    "succeed",
}

_STEP2_SUFFIXES = [
    # (suffix, replacement) — longest-match-first ordering
    ("ization", "ize"),
    ("ational", "ate"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),  # special: -> og if preceded by l
    ("li", None),  # special: delete if preceded by valid li-ending
]

_STEP3_SUFFIXES = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", None),  # special: delete if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
]

_STEP4_SUFFIXES = [
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",  # special: only if preceded by s or t
    "al",
    "er",
    "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _compute_r1(word: str) -> int:
    """Index where R1 starts (the region after the first non-vowel
    following a vowel), with the gener-/commun-/arsen- special cases."""
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    for i in range(1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _compute_r_from(word: str, start: int) -> int:
    for i in range(start + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable."""
    n = len(word)
    if n == 2:
        # vowel at the beginning of the word followed by a non-vowel
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        # non-vowel, vowel, non-vowel(not w/x/Y) at the end
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def _contains_vowel(segment: str) -> bool:
    return any(c in VOWELS for c in segment)


def stem(word: str) -> str:
    """Stem one already-lowercased word (the tokenizer lowercases first,
    mirroring the LowerCaser→Stemmer filter order in tokenizer.rs:39-42)."""
    if len(word) <= 2:
        return word

    # Remove a leading apostrophe, normalize curly apostrophes.
    word = word.replace("’", "'")
    if word.startswith("'"):
        word = word[1:]
        if len(word) <= 2:
            return word

    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y: y at start or after a vowel → Y.
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1 = _compute_r1(word)
    r2 = _compute_r_from(word, r1) if r1 < len(word) else len(word)

    def in_r1(suffix_len: int) -> bool:
        return len(word) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(word) - suffix_len >= r2

    # Step 0: strip longest of ', 's, 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    if word.endswith("eedly"):
        if in_r1(5):
            word = word[:-3]
    elif word.endswith("eed"):
        if in_r1(3):
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and r1 >= len(word):
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel that is not word-initial
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (longest matching suffix, condition: in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ogi":
                    if len(word) > 3 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (in R1; ative needs R2)
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ative":
                    if in_r2(5):
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (in R2; ion needs s/t before)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if in_r2(len(suf)):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if in_r2(1) or (in_r1(1) and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l"):
        if in_r2(1) and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
