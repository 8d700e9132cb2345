"""Snowball Portuguese stemmer, pure Python.

Re-implements the published Snowball Portuguese algorithm
(https://snowballstem.org/algorithms/portuguese/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Portuguese)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).

Prelude/postlude: ã and õ are re-marked as a~ / o~ internally (they behave
as vowels but must survive suffix matching), exactly like the spec. Unlike
Spanish, Portuguese does NOT fold accents at the end.
"""

from __future__ import annotations

VOWELS = set("aeiouáéíóúâêô")


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


_STEP1_DELETE_R2 = sorted(
    ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
     "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento",
     "amentos", "imento", "imentos", "adora", "ador", "aça~o", "adoras",
     "adores", "aço~es", "ante", "antes", "ância"),
    key=len, reverse=True,
)

_STEP2_VERB = sorted(
    ("ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá", "era",
     "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
     "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
     "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem", "essem",
     "issem", "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o",
     "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias", "arias",
     "erias", "irias", "arás", "aras", "erás", "eras", "irás", "avas", "es",
     "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses", "esses",
     "isses", "astes", "estes", "istes", "is", "ais", "eis", "íeis",
     "aríeis", "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis",
     "íreis", "ireis", "ásseis", "ésseis", "ísseis", "áveis", "ados",
     "idos", "ámos", "amos", "íamos", "aríamos", "eríamos", "iríamos",
     "áramos", "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
     "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
     "irmos", "eu", "iu", "ou", "ira", "iras"),
    key=len, reverse=True,
)


def stem(word: str) -> str:
    if len(word) <= 2:
        # regions are empty so no suffix can match, but the unconditional
        # residual-form ç→c rewrite still applies (no length guard upstream)
        return word[:-1] + "c" if word.endswith("ç") else word
    # prelude: nasalised vowels are marked so they count as vowel + mark
    word = word.replace("ã", "a~").replace("õ", "o~")
    rv, r1, r2 = _regions(word)

    original = word
    step1_done = False

    # --- step 1: standard suffix removal ------------------------------------
    best = None  # (suffix_len, action, payload)

    def consider(suf, action, payload=None):
        nonlocal best
        if best is None or len(suf) > best[0]:
            best = (len(suf), action, (suf, payload))

    for suf in _STEP1_DELETE_R2:
        if _in_r(word, suf, r2):
            consider(suf, "del")
    for suf, rep in (("logia", "log"), ("logias", "log")):
        if _in_r(word, suf, r2):
            consider(suf, "repl", rep)
    for suf, rep in (("uça~o", "u"), ("uço~es", "u")):
        if _in_r(word, suf, r2):
            consider(suf, "repl", rep)
    for suf, rep in (("ência", "ente"), ("ências", "ente")):
        if _in_r(word, suf, r2):
            consider(suf, "repl", rep)
    if _in_r(word, "amente", r1):
        consider("amente", "amente")
    if _in_r(word, "mente", r2):
        consider("mente", "mente")
    for suf in ("idades", "idade"):
        if _in_r(word, suf, r2):
            consider(suf, "idad")
    for suf in ("ivas", "ivos", "iva", "ivo"):
        if _in_r(word, suf, r2):
            consider(suf, "iv")
    for suf, rep in (("iras", "ir"), ("ira", "ir")):
        # replace with ir if in RV and preceded by e
        if _in_r(word, suf, rv) and word[: -len(suf)].endswith("e"):
            consider(suf, "repl_rv_ir", rep)

    if best is not None:
        _, action, (suf, payload) = best
        step1_done = True
        if action == "del":
            word = word[: -len(suf)]
        elif action == "repl":
            word = word[: -len(suf)] + payload
        elif action == "repl_rv_ir":
            word = word[: -len(suf)] + payload
        elif action == "amente":
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
        elif action == "mente":
            word = word[:-5]
            for pre in ("ante", "avel", "ível"):
                if _in_r(word, pre, r2):
                    word = word[: -len(pre)]
                    break
        elif action == "idad":
            word = word[: -len(suf)]
            for pre in ("abil", "ic", "iv"):
                if _in_r(word, pre, r2):
                    word = word[: -len(pre)]
                    break
        elif action == "iv":
            word = word[: -len(suf)]
            if _in_r(word, "at", r2):
                word = word[:-2]
        if word == original:
            step1_done = False

    # --- step 2: verb suffixes (only if step 1 removed nothing) -------------
    step2_done = False
    if not step1_done:
        for suf in _STEP2_VERB:
            if _in_r(word, suf, rv):
                word = word[: -len(suf)]
                step2_done = True
                break

    # --- step 3: if steps 1/2 altered the word, delete final i after c ------
    if (step1_done or step2_done) and _in_r(word, "i", rv) and word[:-1].endswith("c"):
        word = word[:-1]

    # --- step 4: residual suffix (only if steps 1 and 2 did nothing) --------
    if not step1_done and not step2_done:
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if _in_r(word, suf, rv):
                word = word[: -len(suf)]
                break

    # --- step 5: residual form ----------------------------------------------
    for suf in ("e", "é", "ê"):
        if _in_r(word, suf, rv):
            word = word[: -len(suf)]
            # preceded by gu (with the u in RV) → delete the u; same for ci
            if (word.endswith("gu") or word.endswith("ci")) and len(word) - 1 >= rv:
                word = word[:-1]
            break
    else:
        if word.endswith("ç"):
            word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")
