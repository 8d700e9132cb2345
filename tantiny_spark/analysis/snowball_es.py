"""Snowball Spanish stemmer, pure Python.

Re-implements the published Snowball Spanish algorithm
(https://snowballstem.org/algorithms/spanish/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Spanish)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouáéíóúü")

_ACCENT_FOLD = str.maketrans("áéíóú", "aeiou")


def _regions(word: str) -> tuple[int, int, int]:
    """(rv, r1, r2) per the Spanish spec."""
    n = len(word)

    def is_v(i):
        return word[i] in VOWELS

    rv = n
    if n >= 2:
        if not is_v(1):
            # next vowel after position 1
            for i in range(2, n):
                if is_v(i):
                    rv = i + 1
                    break
        elif is_v(0) and is_v(1):
            # next consonant
            for i in range(2, n):
                if not is_v(i):
                    rv = i + 1
                    break
        else:
            rv = 3
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


_PRONOUNS = sorted(
    ("me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"),
    key=len, reverse=True,
)
_PRON_PRE_A = sorted(("iéndo", "ándo", "ár", "ér", "ír"), key=len, reverse=True)
_PRON_PRE_B = sorted(("ando", "iendo", "ar", "er", "ir"), key=len, reverse=True)
_PRON_FOLD = {"iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er", "ír": "ir"}

_STEP1_DELETE_R2 = sorted(
    ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos", "able",
     "ables", "ible", "ibles", "ista", "istas", "oso", "osa", "osos", "osas",
     "amiento", "amientos", "imiento", "imientos"),
    key=len, reverse=True,
)
_STEP1_ADOR = sorted(
    ("adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
     "antes", "ancia", "ancias"),
    key=len, reverse=True,
)
_STEP2A = sorted(
    ("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
     "yais", "yamos"),
    key=len, reverse=True,
)
_STEP2B_GU = sorted(("en", "es", "éis", "emos"), key=len, reverse=True)
_STEP2B = sorted(
    ("arían", "arías", "arán", "arás", "aríais", "aría", "aréis", "aríamos",
     "aremos", "ará", "aré", "erían", "erías", "erán", "erás", "eríais",
     "ería", "eréis", "eríamos", "eremos", "erá", "eré", "irían", "irías",
     "irán", "irás", "iríais", "iría", "iréis", "iríamos", "iremos", "irá",
     "iré", "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
     "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran", "ieran",
     "asen", "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo", "ió",
     "ar", "er", "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
     "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
     "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
     "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos", "ásemos"),
    key=len, reverse=True,
)
_STEP3_DELETE = ("os", "a", "o", "á", "í", "ó")


def stem(word: str) -> str:
    if len(word) <= 2:
        return word.translate(_ACCENT_FOLD)
    rv, r1, r2 = _regions(word)

    # step 0: attached pronoun — longest pronoun, then the preceding verb
    # suffix must lie in RV: (a) accented forms → delete pronoun + un-accent,
    # (b) plain forms → delete pronoun, (c) yendo preceded by u (the u need
    # not be in RV) → delete pronoun. No backtracking to shorter pronouns.
    for pron in _PRONOUNS:
        if not word.endswith(pron):
            continue
        base = word[: -len(pron)]
        done = False
        for pre in _PRON_PRE_A:
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                word = base[: -len(pre)] + _PRON_FOLD[pre]
                done = True
                break
        if not done:
            for pre in _PRON_PRE_B:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    word = base
                    done = True
                    break
        if (
            not done
            and base.endswith("yendo")
            and len(base) - 5 >= rv
            and base[:-5].endswith("u")
        ):
            word = base
        break

    rv, r1, r2 = _regions(word)
    step1_done = False

    # step 1: standard suffix removal
    matched_len = 0
    action = None
    for suf in _STEP1_DELETE_R2:
        if _in_r(word, suf, r2) and len(suf) > matched_len:
            matched_len, action = len(suf), ("del", suf)
    for suf in _STEP1_ADOR:
        if _in_r(word, suf, r2) and len(suf) > matched_len:
            matched_len, action = len(suf), ("ador", suf)
    for suf, act in (
        ("logía", "log"), ("logías", "log"),
        ("ución", "u"), ("uciones", "u"),
        ("encia", "ente"), ("encias", "ente"),
    ):
        if _in_r(word, suf, r2) and len(suf) > matched_len:
            matched_len, action = len(suf), ("repl", (suf, act))
    if _in_r(word, "amente", r1) and len("amente") > matched_len:
        matched_len, action = 6, ("amente", "amente")
    if _in_r(word, "mente", r2) and len("mente") > matched_len:
        matched_len, action = 5, ("mente", "mente")
    for suf in ("idades", "idad"):
        if _in_r(word, suf, r2) and len(suf) > matched_len:
            matched_len, action = len(suf), ("idad", suf)
    for suf in ("ivas", "ivos", "iva", "ivo"):
        if _in_r(word, suf, r2) and len(suf) > matched_len:
            matched_len, action = len(suf), ("iv", suf)

    if action is not None:
        kind = action[0]
        step1_done = True
        if kind == "del":
            word = word[: -len(action[1])]
        elif kind == "ador":
            word = word[: -len(action[1])]
            if _in_r(word, "ic", r2):
                word = word[:-2]
        elif kind == "repl":
            suf, rep = action[1]
            word = word[: -len(suf)] + rep
        elif kind == "amente":
            word = word[:-6]
            if _in_r(word, "iv", r2):
                word = word[:-2]
                if _in_r(word, "at", r2):
                    word = word[:-2]
            else:
                for pre in ("os", "ic", "ad"):
                    if _in_r(word, pre, r2):
                        word = word[:-2]
                        break
        elif kind == "mente":
            word = word[:-5]
            for pre in ("ante", "able", "ible"):
                if _in_r(word, pre, r2):
                    word = word[: -len(pre)]
                    break
        elif kind == "idad":
            word = word[: -len(action[1])]
            for pre in ("abil", "ic", "iv"):
                if _in_r(word, pre, r2):
                    word = word[: -len(pre)]
                    break
        elif kind == "iv":
            word = word[: -len(action[1])]
            if _in_r(word, "at", r2):
                word = word[:-2]

    # step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    if not step1_done:
        for suf in _STEP2A:
            if _in_r(word, suf, rv) and word[: -len(suf)].endswith("u"):
                word = word[: -len(suf)]
                step1_done = True
                break

        # step 2b: other verb suffixes
        if not step1_done:
            best = None
            for suf in _STEP2B_GU:
                if _in_r(word, suf, rv) and (best is None or len(suf) > len(best[0])):
                    best = (suf, "gu")
            for suf in _STEP2B:
                if _in_r(word, suf, rv) and (best is None or len(suf) > len(best[0])):
                    best = (suf, "del")
            if best is not None:
                suf, act = best
                word = word[: -len(suf)]
                if act == "gu" and word.endswith("gu"):
                    word = word[:-1]

    # step 3: residual suffix
    for suf in _STEP3_DELETE:
        if _in_r(word, suf, rv):
            word = word[: -len(suf)]
            break
    else:
        for suf in ("é", "e"):
            if _in_r(word, suf, rv):
                word = word[: -len(suf)]
                # if preceded by gu with the u in RV, delete the u
                if word.endswith("gu") and len(word) - 1 >= rv:
                    word = word[:-1]
                break

    return word.translate(_ACCENT_FOLD)
