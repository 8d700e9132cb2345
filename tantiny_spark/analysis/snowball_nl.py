"""Snowball Dutch stemmer, pure Python.

Re-implements the published Snowball Dutch algorithm
(https://snowballstem.org/algorithms/dutch/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Dutch)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouyè")

_FOLD = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(word: str) -> str:
    """Fold umlauts/acutes; mark initial y, y after a vowel, and i between
    vowels as consonants (uppercase)."""
    word = word.translate(_FOLD)
    chars = list(word)
    n = len(chars)

    def is_v(i):
        return chars[i] in VOWELS

    for i in range(n):
        if chars[i] == "y" and (i == 0 or is_v(i - 1)):
            chars[i] = "Y"
        elif chars[i] == "i" and 0 < i < n - 1 and is_v(i - 1) and is_v(i + 1):
            chars[i] = "I"
    return "".join(chars)


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 as BYTE positions. The compiled Snowball stemmer's cursor is a
    UTF-8 byte offset, and Dutch's minimum-region rule is the literal
    ``$p1 < 3  $p1 = 3`` — three BYTES, not three letters. For native Dutch
    words (pure ASCII after the prelude fold) bytes == letters, but
    out-of-alphabet multibyte characters (mixed-language web tokens) shift
    the region start: 'eås' has p1 = 3 bytes = after 'eå', so the final 's'
    IS in R1 and strips — verified against the compiled oracle."""

    def is_v(i):
        return word[i] in VOWELS

    n = len(word)
    # cumulative UTF-8 byte offset of each char position 0..n
    off = [0] * (n + 1)
    for i, ch in enumerate(word):
        off[i + 1] = off[i] + len(ch.encode("utf-8"))

    r1 = n
    for i in range(1, n):
        if not is_v(i) and is_v(i - 1):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not is_v(i) and is_v(i - 1):
            r2 = i + 1
            break
    return max(off[r1], 3), off[r2]


def _in_r(word: str, suffix: str, r_bytes: int) -> bool:
    if not word.endswith(suffix):
        return False
    start = word[: len(word) - len(suffix)]
    return len(start.encode("utf-8")) >= r_bytes


def _undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def _valid_en(base: str) -> bool:
    """Non-vowel before en/ene, and the base may not end in gem."""
    return (
        len(base) > 0
        and base[-1] not in VOWELS
        and not base.endswith("gem")
    )


def stem(word: str) -> str:
    if len(word) <= 2:
        return word.translate(_FOLD)
    word = _prelude(word)
    r1, r2 = _regions(word)

    # --- step 1 ---------------------------------------------------------------
    if _in_r(word, "heden", r1):
        word = word[:-5] + "heid"
    else:
        done = False
        for suf in ("ene", "en"):
            if _in_r(word, suf, r1) and _valid_en(word[: -len(suf)]):
                word = _undouble(word[: -len(suf)])
                done = True
                break
        if not done:
            for suf in ("se", "s"):
                if (
                    _in_r(word, suf, r1)
                    and len(word) > len(suf)
                    and word[-len(suf) - 1] not in VOWELS
                    and word[-len(suf) - 1] != "j"
                ):
                    word = word[: -len(suf)]
                    break

    # --- step 2: delete e if in R1 and preceded by a non-vowel ---------------
    e_found = False
    if _in_r(word, "e", r1) and len(word) >= 2 and word[-2] not in VOWELS:
        word = _undouble(word[:-1])
        e_found = True

    # --- step 3a: heid --------------------------------------------------------
    if _in_r(word, "heid", r2) and not word[:-4].endswith("c"):
        word = word[:-4]
        if _in_r(word, "en", r1) and _valid_en(word[:-2]):
            word = _undouble(word[:-2])

    # --- step 3b: d-suffixes ---------------------------------------------------
    if _in_r(word, "end", r2) or _in_r(word, "ing", r2):
        word = word[:-3]
        if _in_r(word, "ig", r2) and not word[:-2].endswith("e"):
            word = word[:-2]
        else:
            word = _undouble(word)
    elif _in_r(word, "ig", r2) and not word[:-2].endswith("e"):
        word = word[:-2]
    elif _in_r(word, "lijk", r2):
        word = word[:-4]
        # repeat step 2
        if _in_r(word, "e", r1) and len(word) >= 2 and word[-2] not in VOWELS:
            word = _undouble(word[:-1])
    elif _in_r(word, "baar", r2):
        word = word[:-4]
    elif _in_r(word, "bar", r2) and e_found:
        word = word[:-3]

    # --- step 4: undouble vowel ------------------------------------------------
    # word ends C V V D with C,D non-vowels, D != I, VV in {aa,ee,oo,uu}
    if (
        len(word) >= 4
        and word[-1] not in VOWELS
        and word[-1] != "I"
        and word[-2] == word[-3]
        and word[-2] in "aeou"
        and word[-4] not in VOWELS
    ):
        word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")
