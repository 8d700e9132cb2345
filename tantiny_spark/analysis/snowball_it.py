"""Snowball Italian stemmer, pure Python.

Re-implements the published Snowball Italian algorithm
(https://snowballstem.org/algorithms/italian/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Italian)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
"""

from __future__ import annotations

VOWELS = set("aeiouàèìòù")

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")


def _prelude(word: str) -> str:
    """Acute → grave accents; u after q, and u/i between vowels, are marked
    uppercase (consonant role)."""
    word = word.translate(_ACUTE_TO_GRAVE)
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            chars[i] in ("u", "i")
            and chars[i - 1] in VOWELS
            and i + 1 < len(chars)
            and chars[i + 1] in VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)

    def is_v(i):
        return word[i] in VOWELS  # marked U/I are consonants

    rv = n
    if n >= 2:
        if not is_v(1):
            for i in range(2, n):
                if is_v(i):
                    rv = i + 1
                    break
        elif is_v(0) and is_v(1):
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
    ("ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
     "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
     "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo", "tene",
     "cela", "cele", "celi", "celo", "cene", "vela", "vele", "veli", "velo",
     "vene"),
    key=len, reverse=True,
)

_STEP1_DELETE_R2 = sorted(
    ("anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
     "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
     "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente", "atrice",
     "atrici", "ante", "anti"),
    key=len, reverse=True,
)

_STEP2_VERB = sorted(
    ("ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
     "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano", "avate",
     "avi", "avo", "erà", "erai", "eranno", "ere", "erebbe", "erebbero",
     "erei", "eremmo", "eremo", "ereste", "eresti", "erete", "erò",
     "erono", "essero", "ete", "eva", "evamo", "evano", "evate", "evi",
     "evo", "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
     "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
     "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
     "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano", "ivate",
     "ivi", "ivo", "ono", "uta", "ute", "uti", "uto",
     # apocopated infinitives (parlar, finir) — in the published among
     "ar", "ir"),
    key=len, reverse=True,
)


def stem(word: str) -> str:
    if len(word) <= 2:
        return word.translate(_ACUTE_TO_GRAVE)
    word = _prelude(word)
    rv, r1, r2 = _regions(word)

    # --- step 0: attached pronoun -------------------------------------------
    for pron in _PRONOUNS:
        if not word.endswith(pron):
            continue
        base = word[: -len(pron)]
        for pre in ("ando", "endo"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                word = base
                break
        else:
            for pre in ("ar", "er", "ir"):
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    word = base + "e"
                    break
        break

    step1_done = False
    before = word

    # --- step 1: standard suffix removal ------------------------------------
    best = None

    def consider(suf, action):
        nonlocal best
        if best is None or len(suf) > best[0]:
            best = (len(suf), suf, action)

    for suf in _STEP1_DELETE_R2:
        if _in_r(word, suf, r2):
            consider(suf, "del")
    for suf in ("azione", "azioni", "atore", "atori"):
        if _in_r(word, suf, r2):
            consider(suf, "azion")
    for suf in ("logia", "logie"):
        if _in_r(word, suf, r2):
            consider(suf, "log")
    for suf in ("uzione", "uzioni", "usione", "usioni"):
        if _in_r(word, suf, r2):
            consider(suf, "u")
    for suf in ("enza", "enze"):
        if _in_r(word, suf, r2):
            consider(suf, "ente")
    if _in_r(word, "amente", r1):
        consider("amente", "amente")
    for suf in ("amento", "amenti", "imento", "imenti"):
        if _in_r(word, suf, rv):
            consider(suf, "del")
    if _in_r(word, "ità", r2):
        consider("ità", "ita")
    for suf in ("ivo", "ivi", "iva", "ive"):
        if _in_r(word, suf, r2):
            consider(suf, "iv")

    if best is not None:
        _, suf, action = best
        if action == "del":
            word = word[: -len(suf)]
        elif action == "azion":
            word = word[: -len(suf)]
            if _in_r(word, "ic", r2):
                word = word[:-2]
        elif action == "log":
            word = word[: -len(suf)] + "log"
        elif action == "u":
            word = word[: -len(suf)] + "u"
        elif action == "ente":
            word = word[: -len(suf)] + "ente"
        elif action == "amente":
            word = word[:-6]
            if _in_r(word, "iv", r2):
                word = word[:-2]
                if _in_r(word, "at", r2):
                    word = word[:-2]
            else:
                for pre in ("os", "ic", "abil"):
                    if _in_r(word, pre, r2):
                        word = word[: -len(pre)]
                        break
        elif action == "ita":
            word = word[: -len(suf)]
            for pre in ("abil", "ic", "iv"):
                if _in_r(word, pre, r2):
                    word = word[: -len(pre)]
                    break
        elif action == "iv":
            word = word[: -len(suf)]
            if _in_r(word, "at", r2):
                word = word[:-2]
                if _in_r(word, "ic", r2):
                    word = word[:-2]
        step1_done = word != before

    # --- step 2: verb suffixes (only if step 1 removed nothing) -------------
    if not step1_done:
        for suf in _STEP2_VERB:
            if _in_r(word, suf, rv):
                word = word[: -len(suf)]
                break

    # --- step 3a: final vowel (a e i o à è ì ò) in RV, then a preceding i ---
    for suf in ("a", "e", "i", "o", "à", "è", "ì", "ò"):
        if _in_r(word, suf, rv):
            word = word[:-1]
            if _in_r(word, "i", rv):
                word = word[:-1]
            break

    # --- step 3b: ch → c, gh → g (in RV) -------------------------------------
    for suf, rep in (("ch", "c"), ("gh", "g")):
        if _in_r(word, suf, rv):
            word = word[: -len(suf)] + rep
            break

    return word.replace("I", "i").replace("U", "u")
