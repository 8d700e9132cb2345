"""Snowball French stemmer, pure Python.

Re-implements the published Snowball French algorithm
(https://snowballstem.org/algorithms/french/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::French)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).

Control flow follows the Snowball source: ``(standard_suffix or
i_verb_suffix or verb_suffix) and try(Y→i or ç→c), or residual_suffix``,
then always un_double and un_accent. The amment/emment/ment(s) rules inside
standard_suffix delete but "fail" through to the verb steps, exactly like
the ``fail`` commands in french.sbl.
"""

from __future__ import annotations

VOWELS = set("aeiouyâàëéêèïîôûù")


def _prelude(word: str) -> str:
    """Diaeresis vowels are re-spelled with an H marker (ë→He, ï→Hi) so the
    algorithm sees a consonant + plain vowel — the 'e' of 'He' then takes the
    ordinary e-deletions and a dangling H is dropped in the postlude. Then
    mark u/i between vowels, y next to a vowel, and u after q as consonants
    (uppercase). The marking pass runs FIRST, with ë/ï still counting as
    vowels (the left-to-right scan of the published prelude sees an
    unconverted ë/ï to its right as a vowel, and a converted one to its left
    as plain e/i — also a vowel), then the He/Hi re-spelling applies."""
    chars = list(word)
    i = 0
    while i < len(chars):
        c = chars[i]
        nxt = chars[i + 1] if i + 1 < len(chars) else ""
        after = chars[i + 2] if i + 2 < len(chars) else ""
        # the ë/ï re-spelling fires as soon as the cursor reaches the char
        # (before vowel-anchored marking — decisive for word-INITIAL ë/ï,
        # oracle-verified; provably equivalent mid-word)
        # cursor lands ON the inserted vowel, which may then anchor the
        # marking of the following char ('ëui' → 'HeUi', oracle-verified)
        if c == "ë":
            chars[i : i + 1] = ["H", "e"]
            i += 1
            continue
        if c == "ï":
            chars[i : i + 1] = ["H", "i"]
            i += 1
            continue
        # a vowel at the cursor marks the char AFTER it — u/i (only when a
        # vowel follows them) or y (unconditionally); the cursor then jumps
        # past the marked char, so that char is never re-examined
        if c in VOWELS and (
            (nxt in ("u", "i") and after in VOWELS) or nxt == "y"
        ):
            chars[i + 1] = nxt.upper() if nxt != "y" else "Y"
            i += 2
            continue
        if c == "y" and nxt in VOWELS:
            chars[i] = "Y"
            i += 1
            continue
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
            i += 1
            continue
        i += 1
    return "".join(chars)


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)

    def is_v(i):
        return word[i] in VOWELS

    # RV: two initial vowels (or par/col/tap) → after the third letter; else
    # after the first vowel not at the start
    rv = n
    if n >= 3 and ((is_v(0) and is_v(1)) or word[:3] in ("par", "col", "tap")):
        rv = 3
    else:
        for i in range(1, n):
            if is_v(i):
                rv = i + 1
                break
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
    return rv, r1, r2


def _in_r(word: str, suffix: str, r: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= r


_STEP2A = sorted(
    ("îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
     "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
     "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
     "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
     "issions", "issons", "it"),
    key=len, reverse=True,
)

_STEP2B_DELETE_RV = sorted(
    ("é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
     "erais", "erait", "eras", "erez", "eriez", "erions", "erons", "eront",
     "ez", "iez"),
    key=len, reverse=True,
)
_STEP2B_E_GROUP = sorted(
    ("âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
     "antes", "ants", "as", "asse", "assent", "asses", "assiez", "assions"),
    key=len, reverse=True,
)


def _standard_suffix(word: str, rv: int, r1: int, r2: int) -> tuple[str, bool, bool]:
    """Step 1. Returns (word, succeeded, fail_through): fail_through means a
    ment-family rule fired — the word may have changed but the verb steps
    still run (the ``fail`` in french.sbl)."""
    best = None

    def consider(suf, action):
        nonlocal best
        if best is None or len(suf) > best[0]:
            best = (len(suf), suf, action)

    for suf in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                "iqUes", "ismes", "ables", "istes"):
        if _in_r(word, suf, r2):
            consider(suf, "del")
    for suf in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations"):
        if _in_r(word, suf, r2):
            consider(suf, "ator")
    for suf in ("logie", "logies"):
        if _in_r(word, suf, r2):
            consider(suf, "log")
    for suf in ("usion", "ution", "usions", "utions"):
        if _in_r(word, suf, r2):
            consider(suf, "u")
    for suf in ("ence", "ences"):
        if _in_r(word, suf, r2):
            consider(suf, "ent")
    for suf in ("ement", "ements"):
        if _in_r(word, suf, rv):
            consider(suf, "ement")
    for suf in ("ité", "ités"):
        if _in_r(word, suf, r2):
            consider(suf, "ite")
    for suf in ("if", "ive", "ifs", "ives"):
        if _in_r(word, suf, r2):
            consider(suf, "if")
    if word.endswith("eaux"):
        consider("eaux", "eaux")
    if _in_r(word, "aux", r1):
        consider("aux", "aux")
    for suf in ("euses", "euse"):
        if _in_r(word, suf, r2):
            consider(suf, "euse_r2")
        elif _in_r(word, suf, r1):
            consider(suf, "euse_r1")
    for suf in ("issements", "issement"):
        if (
            _in_r(word, suf, r1)
            and len(word) > len(suf)
            and word[-len(suf) - 1] not in VOWELS
        ):
            consider(suf, "del")
    if _in_r(word, "amment", rv):
        consider("amment", "ant_fail")
    if _in_r(word, "emment", rv):
        consider("emment", "ent_fail")
    for suf in ("ments", "ment"):
        if (
            word.endswith(suf)
            and len(word) - len(suf) - 1 >= rv
            and word[-len(suf) - 1] in VOWELS
        ):
            consider(suf, "ment_fail")

    if best is None:
        return word, False, False
    _, suf, action = best
    if action == "del":
        return word[: -len(suf)], True, False
    if action == "ator":
        word = word[: -len(suf)]
        if word.endswith("ic"):
            if _in_r(word, "ic", r2):
                word = word[:-2]
            else:
                word = word[:-2] + "iqU"
        return word, True, False
    if action == "log":
        return word[: -len(suf)] + "log", True, False
    if action == "u":
        return word[: -len(suf)] + "u", True, False
    if action == "ent":
        return word[: -len(suf)] + "ent", True, False
    if action == "ement":
        word = word[: -len(suf)]
        if _in_r(word, "iv", r2):
            word = word[:-2]
            if _in_r(word, "at", r2):
                word = word[:-2]
        elif word.endswith("eus"):
            if _in_r(word, "eus", r2):
                word = word[:-3]
            elif _in_r(word, "eus", r1):
                word = word[:-1] + "x"
        elif _in_r(word, "abl", r2) or _in_r(word, "iqU", r2):
            word = word[:-3]
        elif _in_r(word, "ièr", rv) or _in_r(word, "Ièr", rv):
            word = word[:-3] + "i"
        return word, True, False
    if action == "ite":
        word = word[: -len(suf)]
        if word.endswith("abil"):
            if _in_r(word, "abil", r2):
                word = word[:-4]
            else:
                word = word[:-4] + "abl"
        elif word.endswith("ic"):
            if _in_r(word, "ic", r2):
                word = word[:-2]
            else:
                word = word[:-2] + "iqU"
        elif _in_r(word, "iv", r2):
            word = word[:-2]
        return word, True, False
    if action == "if":
        word = word[: -len(suf)]
        if _in_r(word, "at", r2):
            word = word[:-2]
            if word.endswith("ic"):
                if _in_r(word, "ic", r2):
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
        return word, True, False
    if action == "eaux":
        return word[:-1], True, False
    if action == "aux":
        return word[:-2] + "l", True, False
    if action == "euse_r2":
        return word[: -len(suf)], True, False
    if action == "euse_r1":
        return word[: -len(suf)] + "eux", True, False
    if action == "ant_fail":
        return word[:-6] + "ant", False, True
    if action == "ent_fail":
        return word[:-6] + "ent", False, True
    if action == "ment_fail":
        return word[: -len(suf)], False, True
    return word, False, False


def stem(word: str) -> str:
    # no early length guard: the residual-s rule is region-free and applies
    # to words of any length ('cs' → 'c', oracle-verified)
    word = _prelude(word)
    rv, r1, r2 = _regions(word)

    word, succeeded, fail_through = _standard_suffix(word, rv, r1, r2)

    if not succeeded:
        # step 2a: verb suffixes beginning i — in RV, preceded by a
        # non-vowel itself in RV; the H diaeresis marker does NOT qualify
        # (protects ï/ë re-spellings from verb stripping, oracle-verified)
        done2 = False
        for suf in _STEP2A:
            if (
                _in_r(word, suf, rv)
                and len(word) - len(suf) - 1 >= rv
                and word[-len(suf) - 1] not in VOWELS
                and word[-len(suf) - 1] != "H"
            ):
                word = word[: -len(suf)]
                done2 = True
                break
        if not done2:
            # step 2b: other verb suffixes
            best2 = None
            if _in_r(word, "ions", r2):
                best2 = (4, "ions", "del")
            for suf in _STEP2B_DELETE_RV:
                if _in_r(word, suf, rv) and (best2 is None or len(suf) > best2[0]):
                    best2 = (len(suf), suf, "del")
            for suf in _STEP2B_E_GROUP:
                if _in_r(word, suf, rv) and (best2 is None or len(suf) > best2[0]):
                    best2 = (len(suf), suf, "e_group")
            if best2 is not None:
                _, suf, act = best2
                word = word[: -len(suf)]
                done2 = True
                if act == "e_group" and word.endswith("e") and len(word) - 1 >= rv:
                    word = word[:-1]
        succeeded = done2

    if succeeded:
        # step 3: Y→i or ç→c at the end
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4: residual suffix (runs even after a fail-through ment rule)
        if word.endswith("s") and len(word) >= 2 and (
            word[-2] not in set("aiouès")
            or word[-3:-1] == "Hi"  # a marked ï does not protect the s
        ):
            word = word[:-1]
        # among within RV, longest first
        if (
            _in_r(word, "ion", r2)
            and len(word) - 3 >= rv
            and len(word) >= 4
            and word[-4] in ("s", "t")
            and len(word) - 4 >= rv
        ):
            word = word[:-3]
        else:
            for suf in ("Ière", "ière", "Ier", "ier"):
                if _in_r(word, suf, rv):
                    word = word[: -len(suf)] + "i"
                    break
            else:
                if _in_r(word, "e", rv):
                    word = word[:-1]

    # step 5: un_double (always)
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(suf):
            word = word[:-1]
            break

    # step 6: un_accent (always): é/è followed only by non-vowels → e
    i = len(word) - 1
    n_nonv = 0
    while i >= 0 and word[i] not in VOWELS:
        n_nonv += 1
        i -= 1
    if n_nonv >= 1 and i >= 0 and word[i] in ("é", "è"):
        word = word[:i] + "e" + word[i + 1 :]

    # postlude: restore surviving diaeresis pairs, drop a dangling H marker
    word = word.replace("Hi", "ï").replace("He", "ë").replace("H", "")
    return word.replace("I", "i").replace("U", "u").replace("Y", "y")
