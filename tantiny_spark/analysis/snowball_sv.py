"""Snowball Swedish stemmer, pure Python.

Re-implements the published Snowball Swedish algorithm
(https://snowballstem.org/algorithms/swedish/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Swedish)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouyäåö")

_STEP1_DELETE = sorted(
    (
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
        "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
        "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
        "ast",
    ),
    key=len,
    reverse=True,
)

_VALID_S_ENDING = set("bcdfghjklmnoprtvy")

_STEP2_SUFFIXES = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def _r1(word: str) -> int:
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r1 = i + 1
            break
    return max(r1, 3)


def _ends_in_r1(word: str, suffix: str, r1: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= r1


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _r1(word)

    # step 1: longest among the delete list ∪ {s with valid s-ending}
    for suf in _STEP1_DELETE:
        if _ends_in_r1(word, suf, r1):
            word = word[: -len(suf)]
            break
    else:
        if (
            _ends_in_r1(word, "s", r1)
            and len(word) >= 2
            and word[-2] in _VALID_S_ENDING
        ):
            word = word[:-1]

    # step 2: dd gd nn dt gt kt tt in R1 → delete last letter
    for suf in _STEP2_SUFFIXES:
        if _ends_in_r1(word, suf, r1):
            word = word[:-1]
            break

    # step 3
    if _ends_in_r1(word, "fullt", r1):
        word = word[:-1]
    elif _ends_in_r1(word, "löst", r1):
        word = word[:-1]
    else:
        for suf in ("lig", "ig", "els"):
            if _ends_in_r1(word, suf, r1):
                word = word[: -len(suf)]
                break
    return word
