"""Snowball Danish stemmer, pure Python.

Re-implements the published Snowball Danish algorithm
(https://snowballstem.org/algorithms/danish/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Danish)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouyæåø")

# longest-match-first suffix list for step 1a
_STEP1_SUFFIXES = sorted(
    (
        "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
        "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
        "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
        "ers", "ets", "erets", "et", "eret",
    ),
    key=len,
    reverse=True,
)

_VALID_S_ENDING = set("abcdfghjklmnoprtvyzå")

_STEP2_SUFFIXES = ("gd", "dt", "gt", "kt")

_STEP3_SUFFIXES = sorted(("ig", "lig", "elig", "els"), key=len, reverse=True)


def _r1(word: str) -> int:
    """Standard R1, adjusted so at least 3 letters precede it."""
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r1 = i + 1
            break
    return max(r1, 3)


def _ends_in_r1(word: str, suffix: str, r1: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= r1


def _step2(word: str, r1: int) -> str:
    for suf in _STEP2_SUFFIXES:
        if _ends_in_r1(word, suf, r1):
            return word[:-1]
    return word


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _r1(word)

    # step 1a: delete the longest matching suffix in R1
    for suf in _STEP1_SUFFIXES:
        if _ends_in_r1(word, suf, r1):
            word = word[: -len(suf)]
            break
    else:
        # step 1b: s, if in R1 and preceded by a valid s-ending (the
        # preceding letter need not be in R1)
        if (
            _ends_in_r1(word, "s", r1)
            and len(word) >= 2
            and word[-2] in _VALID_S_ENDING
        ):
            word = word[:-1]

    # step 2: gd dt gt kt in R1 → delete the last letter
    word = _step2(word, r1)

    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    if _ends_in_r1(word, "løst", r1):
        word = word[:-1]
    else:
        for suf in _STEP3_SUFFIXES:
            if _ends_in_r1(word, suf, r1):
                word = word[: -len(suf)]
                word = _step2(word, r1)
                break

    # step 4 (undouble): final double consonant in R1 → remove one. The
    # compiled algorithm matches an explicit among() of ASCII consonant
    # pairs — 'y' and out-of-alphabet letters (öö/şş/çç in mixed-language
    # web tokens) do NOT undouble (oracle-verified: 'katöö', 'katyy' keep
    # their doubles; 'katbb'..'katzz' drop one).
    if (
        len(word) >= 2
        and word[-1] == word[-2]
        and word[-1] in "bcdfghjklmnpqrstvwxz"
        and len(word) - 1 >= r1
    ):
        word = word[:-1]
    return word
