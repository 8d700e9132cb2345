"""Snowball Finnish stemmer, pure Python.

Re-implements the published Snowball Finnish algorithm
(https://snowballstem.org/algorithms/finnish/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Finnish)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouyäö")
_LONG_VOWELS = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_RESTRICTED_VOWELS = set("aeiouäö")  # for Vi checks (no y)


def _regions(word: str) -> tuple[int, int]:
    def is_v(i):
        return word[i] in VOWELS

    r1 = len(word)
    for i in range(1, len(word)):
        if not is_v(i) and is_v(i - 1):
            r1 = i + 1
            break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not is_v(i) and is_v(i - 1):
            r2 = i + 1
            break
    return r1, r2


def _in_r(word: str, suffix: str, r: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= r


_STEP1_PARTICLES = sorted(
    ("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä"),
    key=len, reverse=True,
)

_STEP3_SIMPLE = sorted(
    ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
     "lle", "na", "nä", "ksi", "ine"),
    key=len, reverse=True,
)

# illative -hVn: only these six — no 'hun'/'hyn', so u/y-stem forms fall
# through to the bare 'n' rule (protects verbs like 'puhun'; oracle-verified)
_HXN = {
    "han": "a", "hen": "e", "hin": "i", "hon": "o",
    "hän": "ä", "hön": "ö",
}


def stem(word: str) -> str:
    # no early length guard: the final consonant undoubling is not region-
    # limited and applies to words of any length ('bb' → 'b')
    r1, r2 = _regions(word)

    # --- step 1: particles etc ----------------------------------------------
    matched = None
    for suf in _STEP1_PARTICLES:
        if _in_r(word, suf, r1):
            matched = suf
            break
    if matched is not None:
        prev = word[-len(matched) - 1] if len(word) > len(matched) else ""
        if prev in ("n", "t") or prev in VOWELS:
            word = word[: -len(matched)]
    elif _in_r(word, "sti", r2):
        word = word[:-3]

    # --- step 2: possessives --------------------------------------------------
    if _in_r(word, "si", r1) and not word[:-2].endswith("k"):
        word = word[:-2]
    elif _in_r(word, "ni", r1):
        word = word[:-2]
        if word.endswith("kse"):
            word = word[:-3] + "ksi"
    elif (
        _in_r(word, "nsa", r1) or _in_r(word, "nsä", r1)
        or _in_r(word, "mme", r1) or _in_r(word, "nne", r1)
    ):
        word = word[:-3]
    elif _in_r(word, "an", r1) and word[:-2].endswith(
        ("ta", "ssa", "sta", "lla", "lta", "na")
    ):
        word = word[:-2]
    elif _in_r(word, "än", r1) and word[:-2].endswith(
        ("tä", "ssä", "stä", "llä", "ltä", "nä")
    ):
        word = word[:-2]
    elif _in_r(word, "en", r1) and word[:-2].endswith(("lle", "ine")):
        word = word[:-2]

    # --- step 3: cases ----------------------------------------------------------
    # conditions are part of MATCHING here: a longer suffix whose side
    # condition fails falls through to shorter alternatives (verified against
    # the compiled oracle: 'kaliden' strips 'n', not nothing), unlike the
    # commit-on-longest amongs elsewhere
    step3_removed = False
    _step3_all = sorted(
        [(s, "hxn") for s in _HXN]
        + [("siin", "vi"), ("tten", "vi"), ("den", "vi")]
        + [("seen", "lv")]
        + [("tta", "e"), ("ttä", "e")]
        + [(s, "del") for s in _STEP3_SIMPLE]
        + [("a", "cv"), ("ä", "cv"), ("n", "n")],
        key=lambda x: len(x[0]),
        reverse=True,
    )
    for suf, kind in _step3_all:
        if not _in_r(word, suf, r1):
            continue
        base = word[: -len(suf)]
        if kind == "hxn":
            if base.endswith(_HXN[suf]):
                word, step3_removed = base, True
            break  # hVn commits on string match: condition failure removes
            # nothing and does NOT fall through to 'n' (oracle-verified)
        elif kind == "vi":
            if (
                len(base) >= 2
                and base[-1] == "i"
                and base[-2] in _RESTRICTED_VOWELS
            ):
                word, step3_removed = base, True
        elif kind == "lv":
            if base[-2:] in _LONG_VOWELS:
                word, step3_removed = base, True
        elif kind == "e":
            if base.endswith("e"):
                word, step3_removed = base, True
            # COMMIT either way: 'tta'/'ttä' carry a switch-style condition
            # (result code in the compiled among), so failure means the
            # whole case-ending step does nothing — it must NOT fall back
            # to 'ta'/'tä' ('yttta' → tidy-only → 'ytt', oracle-verified);
            # only the FUNCTION-condition entries (siin/tten/den/seen)
            # retry their substring chain (→ 'n', the 'kaliden' case)
            break
        elif kind == "del":
            word, step3_removed = base, True
        elif kind == "cv":
            # the 'consonant' leg is the explicit ASCII grouping (same as
            # tidy): 'dqxeçqâöa' keeps its final a in the compiled oracle
            # because 'â' is not a grouping member
            if (
                len(base) >= 2
                and base[-1] in VOWELS
                and base[-2] in set("bcdfghjklmnpqrstvwxz")
            ):
                word, step3_removed = base, True
        elif kind == "n":
            word = base
            if word[-2:] in _LONG_VOWELS or word.endswith("ie"):
                word = word[:-1]
            step3_removed = True
        if step3_removed:
            break  # else: condition failed — try the next shorter suffix

    # --- step 4: other endings (comparatives etc), in R2 -----------------------
    for suf in ("impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä"):
        if _in_r(word, suf, r2):
            word = word[: -len(suf)]
            break
    else:
        for suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
            if _in_r(word, suf, r2) and not word[: -len(suf)].endswith("po"):
                word = word[: -len(suf)]
                break

    # --- step 5: plurals ---------------------------------------------------------
    if step3_removed:
        if _in_r(word, "i", r1) or _in_r(word, "j", r1):
            word = word[:-1]
    else:
        if _in_r(word, "t", r1) and len(word) >= 2 and word[-2] in VOWELS:
            word = word[:-1]
            # after removing t: delete final mma (not preceded by po) or imma in R2
            if _in_r(word, "imma", r2):
                word = word[:-4]
            elif _in_r(word, "mma", r2) and not word[:-3].endswith("po"):
                word = word[:-3]

    # --- step 6: tidy --------------------------------------------------------------
    # the consonant tests here are an explicit ASCII grouping, NOT
    # "anything that isn't a vowel": the compiled oracle keeps 'abçe',
    # 'abğe', 'ab9e', 'katajéé', 'katajçç' unchanged (ç/ğ/digits are
    # neither vowels nor grouping members), while 'abce'→'abc' and
    # 'katajbb'→'katajb' strip — mixed-language web tokens hit this class
    _C = set("bcdfghjklmnpqrstvwxz")
    r1, r2 = _regions(word)
    if _in_r(word, word[-2:], r1) and word[-2:] in _LONG_VOWELS:
        word = word[:-1]
    # setlimit-to-R1 semantics: the consonant BEFORE the deleted vowel is
    # part of the pattern, so it too must lie inside R1 (len-2 >= r1)
    if (
        len(word) >= 2
        and word[-1] in set("aäei")
        and word[-2] in _C
        and len(word) - 2 >= r1
    ):
        word = word[:-1]
    if _in_r(word, "oj", r1) or _in_r(word, "uj", r1):
        word = word[:-1]
    if _in_r(word, "jo", r1):
        word = word[:-1]
    # undouble: final double grouping-consonant followed by zero or more vowels
    i = len(word) - 1
    while i >= 0 and word[i] in VOWELS:
        i -= 1
    if i >= 1 and word[i] in _C and word[i - 1] == word[i]:
        word = word[:i] + word[i + 1 :]
    return word
