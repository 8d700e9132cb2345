"""Snowball German stemmer, pure Python.

Re-implements the published Snowball German algorithm
(https://snowballstem.org/algorithms/german/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::German)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouyäöü")

_VALID_S_ENDING = set("bdfghklmnrt")
_VALID_ST_ENDING = set("bdfghklmnt")  # s-endings minus r


def _prelude(word: str) -> str:
    """ß→ss; u and y between vowels are marked uppercase (consonant role)."""
    word = word.replace("ß", "ss")
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in ("u", "y") and chars[i - 1] in VOWELS and chars[i + 1] in VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


def _regions(word: str) -> tuple[int, int]:
    # marked U/Y (prelude) are uppercase and so NOT in VOWELS — they count
    # as consonants here, which is the whole point of the marking
    lowered = [(c in VOWELS) for c in word]
    r1 = len(word)
    for i in range(1, len(word)):
        if not lowered[i] and lowered[i - 1]:
            r1 = i + 1
            break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not lowered[i] and lowered[i - 1]:
            r2 = i + 1
            break
    # R1 is adjusted so that the region before it has at least 3 letters
    return max(r1, 3), r2


def _in_r(word: str, suffix: str, r: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= r


def stem(word: str) -> str:
    # no early length guard: the postlude (ß→ss, umlaut fold) applies to
    # every word, however short; regions are empty so no suffix matches
    word = _prelude(word)
    r1, r2 = _regions(word)

    # step 1: longest among (a) em ern er, (b) e en es, (c) s (valid s-ending)
    for suf in ("ern", "em", "er"):
        if _in_r(word, suf, r1):
            if suf == "em" and word[: -2].endswith("syst"):
                continue  # spec: em not preceded by syst
            word = word[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if _in_r(word, suf, r1):
                word = word[: -len(suf)]
                # (spec) if the deleted group-(b) ending was preceded by niss,
                # delete the final s: verhältnisse → verhältnis
                if word.endswith("niss"):
                    word = word[:-1]
                break
        else:
            if (
                _in_r(word, "s", r1)
                and len(word) >= 2
                and word[-2] in _VALID_S_ENDING
            ):
                word = word[:-1]

    # step 2: longest among (a) en er est, (b) st (valid st-ending, with at
    # least 3 letters before it)
    for suf in ("est", "en", "er"):
        if _in_r(word, suf, r1):
            word = word[: -len(suf)]
            break
    else:
        if (
            _in_r(word, "st", r1)
            and len(word) >= 6  # 3-letter minimum before the st-ending letter
            and word[-3] in _VALID_ST_ENDING
        ):
            word = word[:-2]

    # step 3: d-suffixes
    if _in_r(word, "end", r2) or _in_r(word, "ung", r2):
        word = word[:-3]
        if _in_r(word, "ig", r2) and not word.endswith("eig"):
            word = word[:-2]
    elif (
        (_in_r(word, "ig", r2) and not word.endswith("eig"))
        or (_in_r(word, "ik", r2) and not word.endswith("eik"))
        or (_in_r(word, "isch", r2) and not word.endswith("eisch"))
    ):
        word = word[:-4] if word.endswith("isch") else word[:-2]
    elif _in_r(word, "lich", r2) or _in_r(word, "heit", r2):
        word = word[:-4]
        for pre in ("er", "en"):
            if _in_r(word, pre, r1):
                word = word[:-2]
                break
    elif _in_r(word, "keit", r2):
        word = word[:-4]
        if _in_r(word, "lich", r2):
            word = word[:-4]
        elif _in_r(word, "ig", r2):
            word = word[:-2]

    # postlude: unmark U/Y, fold umlauts
    out = []
    for c in word:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)
