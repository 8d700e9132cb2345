"""Snowball Norwegian stemmer, pure Python.

Re-implements the published Snowball Norwegian algorithm
(https://snowballstem.org/algorithms/norwegian/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Norwegian)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouyæåø")

_STEP1_DELETE = sorted(
    (
        "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
        "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
        "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
    ),
    key=len,
    reverse=True,
)

# s-ending valid when preceded by one of these, or by k not preceded by a vowel
_VALID_S_ENDING = set("bcdfghjlmnoprtvyz")

_STEP3_DELETE = sorted(
    ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov", "slov",
     "hetslov"),
    key=len,
    reverse=True,
)


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

    # step 1: longest among delete-list ∪ {ert→er, erte→er} ∪ {s}
    candidates = [(s, "del") for s in _STEP1_DELETE]
    candidates += [("erte", "er"), ("ert", "er"), ("s", "s")]
    candidates.sort(key=lambda c: len(c[0]), reverse=True)
    for suf, action in candidates:
        if not _ends_in_r1(word, suf, r1):
            continue
        if action == "del":
            word = word[: -len(suf)]
            break
        if action == "er":
            word = word[: -len(suf)] + "er"
            break
        # s: preceded by a valid s-ending, or by k not preceded by a vowel
        prev = word[-2] if len(word) >= 2 else ""
        prev2 = word[-3] if len(word) >= 3 else ""
        if prev in _VALID_S_ENDING or (prev == "k" and prev2 not in VOWELS):
            word = word[:-1]
            break

    # step 2: dt or vt in R1 → delete last letter
    for suf in ("dt", "vt"):
        if _ends_in_r1(word, suf, r1):
            word = word[:-1]
            break

    # step 3: delete the longest matching d-suffix in R1
    for suf in _STEP3_DELETE:
        if _ends_in_r1(word, suf, r1):
            word = word[: -len(suf)]
            break
    return word
