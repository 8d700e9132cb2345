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
     "emmo", "enda", "ende", "endi", "endo",
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
    # among COMMIT semantics: the longest suffix matching BY STRING wins;
    # if its region condition then fails, step 1 removes NOTHING — there is
    # no fallback to a shorter suffix ('zumbratrice' keeps 'atrice' when it
    # falls outside R2; the old fallback wrongly stripped 'ice').
    cands = (
        [(suf, "del", r2) for suf in _STEP1_DELETE_R2]
        + [(suf, "azion", r2) for suf in ("azione", "azioni", "atore", "atori")]
        + [(suf, "log", r2) for suf in ("logia", "logie")]
        + [(suf, "u", r2) for suf in ("uzione", "uzioni", "usione", "usioni")]
        + [(suf, "ente", r2) for suf in ("enza", "enze")]
        + [("amente", "amente", r1)]
        + [(suf, "del", rv) for suf in ("amento", "amenti", "imento", "imenti")]
        + [("ità", "ita", r2)]
        + [(suf, "iv", r2) for suf in ("ivo", "ivi", "iva", "ive")]
    )
    best = None
    for suf, action, region in cands:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, action, region)

    if best is not None and len(word) - len(best[0]) >= best[2]:
        suf, action, _region = best
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
