"""Snowball Romanian stemmer, pure Python.

Re-implements the published Snowball Romanian algorithm
(https://snowballstem.org/algorithms/romanian/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Romanian)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).

The algorithm (as compiled into rust-stemmers 1.x / Tantivy 0.16 and
PostgreSQL's dict_snowball) is written over the legacy cedilla forms ş/ţ
with NO folding of the modern comma-below spellings ș/ț — comma-form text
passes through the cedilla suffix tables unmatched, exactly as in the
reference engine. (Snowball 3.0, 2024, later added comma folding; the
reference predates it.) Verified byte-exact against the compiled Snowball
oracle (scripts/snowball_oracle.py).
"""

from __future__ import annotations

VOWELS = set("aăâeiîou")



def _prelude(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i in range(1, n - 1):
        if chars[i] in ("u", "i") and chars[i - 1] in VOWELS and chars[i + 1] in VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)

    def is_v(i):
        return word[i] in VOWELS

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


# step 0: plural removal — (suffix, replacement, condition)
_STEP0 = sorted(
    [
        ("ul", "", None), ("ului", "", None),
        ("aua", "a", None),
        ("ea", "e", None), ("ele", "e", None), ("elor", "e", None),
        # NOTE: no bare 'ia' entry — the published step 0 replaces only
        # ii/iua/iei/iile/iilor/ilor with 'i'; a '-Cia' word instead loses
        # just its final 'a' to the vowel-suffix step ('nabia' → 'nabi',
        # oracle-verified; an extra 'ia'→'i' rule here cascaded into
        # deleting the new 'i' too)
        ("ii", "i", None), ("iua", "i", None), ("iei", "i", None),
        ("iile", "i", None), ("iilor", "i", None), ("ilor", "i", None),
        ("ile", "i", "not_ab"),
        ("atei", "at", None),
        ("aţie", "aţi", None), ("aţia", "aţi", None),
    ],
    key=lambda x: len(x[0]), reverse=True,
)

# step 1: combining suffixes, applied repeatedly (suffix → replacement)
_STEP1 = sorted(
    [(s, "abil") for s in ("abilitate", "abilitati", "abilităi", "abilităţi")]
    + [("ibilitate", "ibil")]
    + [(s, "iv") for s in ("ivitate", "ivitati", "ivităi", "ivităţi")]
    + [(s, "ic") for s in (
        "icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
        "iciv", "iciva", "icive", "icivi", "icivă",
        "ical", "icala", "icale", "icali", "icală")]
    + [(s, "at") for s in (
        "ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
        "atoare", "ator", "atori", "ătoare", "ător", "ători")]
    + [(s, "it") for s in (
        "itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
        "itoare", "itor", "itori")],
    key=lambda x: len(x[0]), reverse=True,
)

# step 2: standard suffixes in R2
_STEP2_DELETE = sorted(
    ("at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
     "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică",
     "abil", "abila", "abile", "abili", "abilă",
     "ibil", "ibila", "ibile", "ibili", "ibilă",
     "oasa", "oasă", "oase", "os", "osi", "oşi",
     "ant", "anta", "ante", "anti", "antă", "ator", "atori",
     "itate", "itati", "ităi", "ităţi",
     "iv", "iva", "ive", "ivi", "ivă"),
    key=len, reverse=True,
)
_STEP2_IST = ("işti", "isme", "ista", "iste", "isti", "istă", "ism", "ist")

# step 3: verb suffixes in RV
_STEP3_COND = sorted(  # delete if preceded (in RV) by a consonant or u
    ("ia", "ea",  # imperfect/gerund-adjacent endings: conditional entries
     # that also SHADOW shorter unconditional ones via longest-match —
     # 'bruaeaţi' matches 'eaţi' (cond, vowel-preceded → fail → nothing),
     # never the unconditional 'aţi' (verb among extracted from the
     # compiled object, result code 1 = conditional / 2 = unconditional)
     "eaţi", "iaţi",
     "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
     "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc", "ăşti",
     "ăşte", "am", "ai", "au", "eam", "eai", "eau", "iam", "iai", "iau",
     "ui", "aşi", "arăm", "arăţi", "ară", "uşi", "urăm", "urăţi", "ură",
     "işi", "irăm", "irăţi", "iră", "âi", "âşi", "ârăm", "ârăţi", "âră",
     "asem", "aseşi", "ase", "aserăm", "aserăţi", "aseră",
     "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
     "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
     "usem", "useşi", "use", "userăm", "userăţi", "useră"),
    key=len, reverse=True,
)
_STEP3_UNCOND = sorted(
    ("ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi",
     "seşi", "serăm", "serăţi", "seră", "sei", "se",
     "sesem", "seseşi", "sese", "seserăm", "seserăţi", "seseră"),
    key=len, reverse=True,
)


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    word = _prelude(word)
    rv, r1, r2 = _regions(word)

    # --- step 0: plurals (among COMMIT: longest by string, then R1+cond) ------
    for suf, rep, cond in _STEP0:
        if word.endswith(suf):
            if _in_r(word, suf, r1) and not (
                cond == "not_ab" and word[: -len(suf)].endswith("ab")
            ):
                word = word[: -len(suf)] + rep
            break

    # --- step 1: combining suffixes (repeat; each pass commits on the
    # longest STRING match — if its R1 check fails nothing shorter is tried)
    changed_any = False
    while True:
        best1 = None
        for suf, rep in _STEP1:
            if word.endswith(suf) and (best1 is None or len(suf) > len(best1[0])):
                best1 = (suf, rep)
        if best1 is None or not _in_r(word, best1[0], r1):
            break
        word = word[: -len(best1[0])] + best1[1]
        changed_any = True

    # --- step 2: standard suffixes (commit-on-longest; a longest match
    # whose R2/ţ condition fails removes NOTHING — 'aicitate' keeps itself
    # rather than falling back to 'ate', oracle-verified) -----------------------
    step2_done = False
    best = None
    for suf in _STEP2_DELETE:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, "del")
    for suf in ("iune", "iuni"):
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, "tiune")
    for suf in _STEP2_IST:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, "ist")
    if best is not None and _in_r(word, best[0], r2):
        suf, act = best
        if act == "del":
            word = word[: -len(suf)]
            step2_done = True
        elif act == "tiune":
            if word[: -len(suf)].endswith("ţ"):
                word = word[: -len(suf) - 1] + "t"
                step2_done = True
        else:
            word = word[: -len(suf)] + "ist"
            step2_done = True

    # --- step 3: verb suffixes (only if steps 1 and 2 removed nothing) ----------
    if not changed_any and not step2_done:
        best3 = None
        for suf in _STEP3_COND:
            if _in_r(word, suf, rv) and (best3 is None or len(suf) > len(best3[0])):
                best3 = (suf, "cond")
        for suf in _STEP3_UNCOND:
            if _in_r(word, suf, rv) and (best3 is None or len(suf) > len(best3[0])):
                best3 = (suf, "uncond")
        if best3 is not None:
            suf, act = best3
            base = word[: -len(suf)]
            if act == "uncond":
                word = base
            else:
                # preceded in RV by a consonant or u
                if len(base) - 1 >= rv and (
                    base[-1:] == "u" or (base[-1:] and base[-1] not in VOWELS)
                ):
                    word = base

    # --- step 4: final vowel ------------------------------------------------------
    # among semantics: the longest matching suffix commits; if it falls
    # outside RV nothing is removed (no fallback to a shorter suffix —
    # verified against the compiled oracle: '-ie' crossing the RV boundary
    # keeps the word intact)
    for suf in ("ie", "a", "e", "i", "ă"):
        if word.endswith(suf):
            if _in_r(word, suf, rv):
                word = word[: -len(suf)]
            break

    return word.replace("I", "i").replace("U", "u")
