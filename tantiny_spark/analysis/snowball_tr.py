"""Snowball Turkish stemmer, pure Python.

Re-implements the published Snowball Turkish algorithm (Evren Kapusuz
Çilden; https://snowballstem.org/algorithms/turkish/stemmer.html), the
algorithm behind Tantivy's ``Stemmer::new(Language::Turkish)`` via
rust-stemmers (reference language table: /root/reference/src/helpers.rs:
18-40). Suffix inventories cross-checked against the compiled Snowball
tables and verified byte-exact against the compiled oracle
(scripts/snowball_oracle.py).

Structure: two suffix-stripping passes (nominal verb suffixes, then noun
suffixes when stemming may continue), each built from ``mark_*`` matchers
that enforce vowel harmony and the optional y/n/s/U connective letters,
followed by a postlude (final-consonant devoicing b/c/d/ğ → p/ç/t/k and
harmonic-vowel append to stems ending d/g). Words with fewer than two
vowels are left untouched.
"""

from __future__ import annotations

VOWELS = set("aeıioöuü")

# vowel harmony: a suffix vowel (left column) may only follow one of the
# vowels in its row
_HARMONY = {
    "a": set("aıou"),
    "e": set("eiöü"),
    "ı": set("aı"),
    "i": set("ei"),
    "o": set("ou"),
    "ö": set("öü"),
    "u": set("ou"),
    "ü": set("öü"),
}


def _check_harmony(word: str, end: int) -> bool:
    """check_vowel_harmony on word[:end]: locate the rightmost vowel (the
    suffix's), then scan further LEFT for any occurrence of a vowel from its
    harmony set — a goto on the set, NOT an adjacent-vowel comparison
    (oracle-verified: 'taoçdı' strips 'dı' because an 'a' exists anywhere
    left, while 'tordı' keeps it)."""
    i = end - 1
    while i >= 0 and word[i] not in VOWELS:
        i -= 1
    if i < 0:
        return False
    allowed = _HARMONY[word[i]]
    j = i - 1
    while j >= 0:
        if word[j] in allowed:
            return True
        j -= 1
    return False


def _opt_letter(word: str, end: int, letters: str, before_vowel: bool) -> int | None:
    """Optional connective consonant (y/n/s) or optional U vowel, decoded
    from the compiled helpers: when the letter is PRESENT it is consumed and
    the char immediately before it must be a vowel (consonant connectives)
    or a non-vowel (U); when ABSENT, the test instead skips ONE char and
    requires the char before that to be a vowel (y/n/s) / non-vowel (U) —
    and if the skipped char happens to BE the optional letter, the whole
    mark fails (no re-reading it as a stem character)."""
    if end > 0 and word[end - 1] in letters:
        prev = word[end - 2] if end >= 2 else ""
        ok = (prev in VOWELS) if before_vowel else (prev not in VOWELS and prev != "")
        if ok:
            return end - 1
        return None
    # letter absent: skip one char, the char before it must be of the
    # matching class (both chars must exist)
    if end < 2:
        return None
    prev2 = word[end - 2]
    if before_vowel:
        return end if prev2 in VOWELS else None
    return end if prev2 not in VOWELS else None


_U = "ıiuü"


def _mk(suffixes, harmony=True, opt=None):
    """Build a matcher: returns the matched start index in ``word`` (i.e.
    strip word[idx:]) or None. ``opt``: one of 'y', 'n', 's', 'U' — the
    optional connective tried after (i.e. to the left of) the suffix body."""
    sufs = sorted(suffixes, key=len, reverse=True)

    def mark(word: str, end: int | None = None) -> int | None:
        e = len(word) if end is None else end
        if harmony and not _check_harmony(word, e):
            return None
        for s in sufs:
            if word.endswith(s, 0, e):
                ns = e - len(s)
                if opt is None:
                    return ns
                if opt == "U":
                    r = _opt_letter(word, ns, _U, before_vowel=False)
                else:
                    r = _opt_letter(word, ns, opt, before_vowel=True)
                if r is not None:
                    return r
        return None

    return mark


# --- nominal verb suffix marks ---------------------------------------------
mark_ymUs = _mk(["mış", "miş", "muş", "müş"], opt="y")
mark_yDU = _mk(
    [d + v + p for d in "dt" for v in _U for p in ["", "m", "n", "k"]],
    opt="y",
)
mark_ysA = _mk(["sa", "se", "sam", "sem", "san", "sen", "sak", "sek"],
               harmony=False, opt="y")
mark_yken = _mk(["ken"], harmony=False, opt="y")
mark_cAsInA = _mk(["casına", "cesine"], harmony=False)
mark_sUnUz = _mk(["sınız", "siniz", "sunuz", "sünüz"])
mark_lAr = _mk(["lar", "ler"])
mark_yUm = _mk(["ım", "im", "um", "üm"], opt="y")
mark_sUn = _mk(["sın", "sin", "sun", "sün"])
mark_yUz = _mk(["ız", "iz", "uz", "üz"], opt="y")
mark_nUz = _mk(["nız", "niz", "nuz", "nüz"])
mark_DUr = _mk([d + v + "r" for d in "dt" for v in _U])

# --- noun suffix marks -------------------------------------------------------
# possessives carry no vowel-harmony check: the optional-U structure rule
# (U present after consonant / absent after vowel) is the only gate
mark_possessives = _mk(["m", "n", "mız", "miz", "muz", "müz",
                        "nız", "niz", "nuz", "nüz"], harmony=False, opt="U")
mark_sU = _mk(list(_U), opt="s")
mark_lArI = _mk(["ları", "leri"], harmony=False)
mark_yU = _mk(list(_U), opt="y")
mark_nU = _mk(["nı", "ni", "nu", "nü"])
# genitive -(n)Un: the among holds the bare Un forms, the leading n is
# an optional connective (compiled table 0xc2c80 + optional-n helper)
mark_nUn = _mk(["ın", "in", "un", "ün"], opt="n")
mark_yA = _mk(["a", "e"], opt="y")
mark_nA = _mk(["na", "ne"])
mark_DA = _mk(["da", "de", "ta", "te"])
mark_ndA = _mk(["nda", "nde"])
mark_DAn = _mk(["dan", "den", "tan", "ten"])
mark_ndAn = _mk(["ndan", "nden"])
mark_ylA = _mk(["la", "le"], opt="y")
mark_ki = _mk(["ki"], harmony=False)
mark_ncA = _mk(["ca", "ce"], opt="n")


def _cut(word: str, idx: int | None) -> str | None:
    return word[:idx] if idx is not None else None


def _stem_nominal_verb_suffixes(word: str) -> tuple[str, bool]:
    """Returns (word, continue_stemming_noun_suffixes)."""
    # A1: -(y)mUş / -(y)DU / -(y)sA / -(y)ken
    for m in (mark_ymUs, mark_yDU, mark_ysA, mark_yken):
        w = _cut(word, m(word))
        if w is not None:
            return w, True
    # A2: -cAsInA preceded by optional personal, then required -(y)mUş
    w = _cut(word, mark_cAsInA(word))
    if w is not None:
        w2 = w
        for m in (mark_sUnUz, mark_lAr, mark_yUm, mark_sUn, mark_yUz):
            c = _cut(w, m(w))
            if c is not None:
                w2 = c
                break
        w3 = _cut(w2, mark_ymUs(w2))
        if w3 is not None:
            return w3, True
    # A3: -lAr, then optionally -DUr/-(y)DU/-(y)sA/-(y)mUş; stop noun pass
    w = _cut(word, mark_lAr(word))
    if w is not None:
        for m in (mark_DUr, mark_yDU, mark_ysA, mark_ymUs):
            c = _cut(w, m(w))
            if c is not None:
                w = c
                break
        return w, False
    # A4: -nUz followed (leftward) by required -(y)DU or -(y)sA
    w = _cut(word, mark_nUz(word))
    if w is not None:
        for m in (mark_yDU, mark_ysA):
            c = _cut(w, m(w))
            if c is not None:
                return c, True
    # A5: personal endings, then optional -(y)mUş
    for m in (mark_sUnUz, mark_yUz, mark_sUn, mark_yUm):
        w = _cut(word, m(word))
        if w is not None:
            c = _cut(w, mark_ymUs(w))
            if c is not None:
                w = c
            return w, True
    # A6: -DUr deleted, then the (personal + -(y)mUş) pair only strips when
    # BOTH match (a failed ymUş restores the cursor to just after the DUr
    # deletion; the noun pass then sees the personal ending again)
    w = _cut(word, mark_DUr(word))
    if w is not None:
        w2 = w
        for m in (mark_sUnUz, mark_lAr, mark_yUm, mark_sUn, mark_yUz):
            c = _cut(w, m(w))
            if c is not None:
                w2 = c
                break
        w3 = _cut(w2, mark_ymUs(w2))
        if w3 is not None:
            return w3, True
        return w, True
    return word, True


def _chain_before_ki(word: str) -> str | None:
    """stem_suffix_chain_before_ki: strips what may precede an already
    removed 'ki' (attached -DA/-nUn/-ndA plus further possessives/plurals),
    recursively."""
    w = _cut(word, mark_ki(word))
    if w is None:
        return None
    # -DA
    c = _cut(w, mark_DA(w))
    if c is not None:
        out = c
        c2 = _cut(c, mark_lAr(c))
        if c2 is not None:
            out = c2
            deeper = _chain_before_ki(c2)
            if deeper is not None:
                out = deeper
        else:
            c2 = _cut(c, mark_possessives(c))
            if c2 is not None:
                out = c2
                c3 = _cut(c2, mark_lAr(c2))
                if c3 is not None:
                    deeper = _chain_before_ki(c3)
                    out = deeper if deeper is not None else c3
        return out
    # -nUn
    c = _cut(w, mark_nUn(w))
    if c is not None:
        out = c
        c2 = _cut(c, mark_lArI(c))
        if c2 is not None:
            return c2
        c2 = _cut(c, mark_possessives(c)) or _cut(c, mark_sU(c))
        if c2 is not None:
            out = c2
            c3 = _cut(c2, mark_lAr(c2))
            if c3 is not None:
                deeper = _chain_before_ki(c3)
                out = deeper if deeper is not None else c3
            return out
        deeper = _chain_before_ki(c)
        return deeper if deeper is not None else out
    # -ndA
    c = _cut(w, mark_ndA(w))
    if c is not None:
        c2 = _cut(c, mark_lArI(c))
        if c2 is not None:
            return c2
        c2 = _cut(c, mark_sU(c))
        if c2 is not None:
            out = c2
            c3 = _cut(c2, mark_lAr(c2))
            if c3 is not None:
                deeper = _chain_before_ki(c3)
                out = deeper if deeper is not None else c3
            return out
        deeper = _chain_before_ki(c)
        if deeper is not None:
            return deeper
    return None


def _stem_noun_suffixes(word: str) -> str:
    """Branch order and continuations transcribed from the compiled
    routine's control flow (annotated disassembly of turkish stem):
    lAr > ncA > (ndA|nA) > (ndAn|nU) > DAn > nUn > ylA > lArI > ki-chain >
    (DA|yU|yA) > (possessives|sU|lAr). Deletions persist as side effects;
    a branch whose required sub-match fails falls through to the next with
    the original word."""

    def lar_chain(w: str) -> str:
        """try([mark_lAr] delete try(ki-chain)) — lAr deletion persists."""
        c = _cut(w, mark_lAr(w))
        if c is None:
            return w
        deeper = _chain_before_ki(c)
        return deeper if deeper is not None else c

    # N1: -lAr (reachable when the verb pass stripped something else), then
    # optionally the ki-chain
    w = _cut(word, mark_lAr(word))
    if w is not None:
        deeper = _chain_before_ki(w)
        return deeper if deeper is not None else w
    # N2: -ncA
    w = _cut(word, mark_ncA(word))
    if w is not None:
        c = _cut(w, mark_lArI(w))
        if c is not None:
            return c
        c = _cut(w, mark_possessives(w)) or _cut(w, mark_sU(w))
        if c is not None:
            return lar_chain(c)
        c = _cut(w, mark_lAr(w))
        if c is not None:
            deeper = _chain_before_ki(c)
            return deeper if deeper is not None else c
        return w
    # N3: -(n)dA / -nA: kept unless a deeper suffix also matches
    for m in (mark_ndA, mark_nA):
        idx = m(word)
        if idx is not None:
            w = word[:idx]
            c = _cut(w, mark_lArI(w))
            if c is not None:
                return c
            c = _cut(w, mark_sU(w))
            if c is not None:
                return lar_chain(c)
            deeper = _chain_before_ki(w)
            if deeper is not None:
                # the head -(n)dA/-nA was marked but never deleted, and the
                # ki-chain's deletions happen BEFORE it: the suffix survives
                # ('vcıdndakinde' → 'vcıdn' + 'nde')
                return deeper + word[idx:]
    # N4: -ndAn / -nU: kept unless a deeper suffix also matches
    for m in (mark_ndAn, mark_nU):
        idx = m(word)
        if idx is not None:
            w = word[:idx]
            c = _cut(w, mark_sU(w))
            if c is not None:
                return lar_chain(c)
            c = _cut(w, mark_lArI(w))
            if c is not None:
                return c
    # N5: -DAn
    w = _cut(word, mark_DAn(word))
    if w is not None:
        c = _cut(w, mark_possessives(w))
        if c is not None:
            return lar_chain(c)
        c = _cut(w, mark_lAr(w))
        if c is not None:
            deeper = _chain_before_ki(c)
            return deeper if deeper is not None else c
        deeper = _chain_before_ki(w)
        return deeper if deeper is not None else w
    # N6/N7: -(n)Un / -(y)lA share one continuation
    for m in (mark_nUn, mark_ylA):
        w = _cut(word, m(word))
        if w is not None:
            c = _cut(w, mark_lAr(w))
            if c is not None:
                deeper = _chain_before_ki(c)
                if deeper is not None:
                    return deeper
                w = c  # lAr deletion persists; continue matching deeper
            c = _cut(w, mark_possessives(w)) or _cut(w, mark_sU(w))
            if c is not None:
                return lar_chain(c)
            deeper = _chain_before_ki(w)
            return deeper if deeper is not None else w
    # N8: -lArI
    w = _cut(word, mark_lArI(word))
    if w is not None:
        return w
    # N9: bare ki-chain
    deeper = _chain_before_ki(word)
    if deeper is not None:
        return deeper
    # N10: -DA / -(y)U / -(y)A
    for m in (mark_DA, mark_yU, mark_yA):
        w = _cut(word, m(word))
        if w is not None:
            c = _cut(w, mark_possessives(w))
            if c is not None:
                return lar_chain(c)
            c = _cut(w, mark_lAr(w))
            if c is not None:
                deeper = _chain_before_ki(c)
                return deeper if deeper is not None else c
            return w
    # N11: possessives / -sU / -lAr
    w = _cut(word, mark_possessives(word)) or _cut(word, mark_sU(word))
    if w is not None:
        return lar_chain(w)
    w = _cut(word, mark_lAr(word))
    if w is not None:
        deeper = _chain_before_ki(w)
        return deeper if deeper is not None else w
    return word


_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def _last_vowel_u(word: str) -> str | None:
    for ch in reversed(word):
        if ch in VOWELS:
            if ch in "aı":
                return "ı"
            if ch in "ei":
                return "i"
            if ch in "ou":
                return "u"
            return "ü"
    return None  # vowelless stem: no vowel to copy, no append


def stem(word: str) -> str:
    # only words of more than one syllable are stemmed
    if sum(1 for c in word if c in VOWELS) <= 1:
        return word
    word, cont = _stem_nominal_verb_suffixes(word)
    if cont:
        word = _stem_noun_suffixes(word)
    else:
        # the -lAr branch unsets the continuation flag, which fails the
        # backwards block as a whole — the postlude never runs (deletions
        # persist as side effects)
        return word
    # reserved words skip the whole postlude (they would otherwise grow a
    # harmonic vowel: 'adım' → 'ad', not 'adı')
    if word in ("ad", "soyad"):
        return word
    # postlude: append harmonic U to stems ending d/g, then devoice the
    # final consonant
    if word and word[-1] in ("d", "g"):
        u = _last_vowel_u(word)
        if u is not None:
            word = word + u
    if word and word[-1] in _DEVOICE:
        word = word[:-1] + _DEVOICE[word[-1]]
    return word
