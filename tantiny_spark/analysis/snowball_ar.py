"""Snowball Arabic stemmer, pure Python.

Re-implements the published Snowball Arabic algorithm
(https://snowballstem.org/algorithms/arabic/stemmer.html — Chelli's
algorithm, the stemmer behind Tantivy's ``Stemmer::new(Language::Arabic)``
via rust-stemmers; reference language table
/root/reference/src/helpers.rs:18-40), verified byte-exact against the
compiled Snowball oracle linked by PostgreSQL/DuckDB
(scripts/snowball_native.py, sweeps in scripts/arabic_dev.py).

Shape: pre-normalization (strip tashkeel/tatweel, fold Farsi kaf/yeh),
an article check that classifies the word (noun/verb/defined), verb then
noun suffix strippers with per-suffix minimum lengths (alef-maqsura
fold as the fallback), prefix steps that SHARE A CURSOR (doubled hamza,
conjunctions, articles, verbal prefixes — each picks up where the
previous left off, which is why أآفتح loses its ف but آفتح keeps it),
and post-normalization of hamza carriers (final -> bare hamza, medial ->
the plain carrier letter).
"""

from __future__ import annotations

# tashkeel (U+064B..U+0652) and tatweel (U+0640)
_STRIP = set("ًٌٍَُِّّْـ")
# NOTE: the compiled algorithm does NOT fold Farsi kaf/yeh (ک/ی) to their
# Arabic forms — they pass through untouched while surrounding affixes
# still strip ('کتابهم' → 'کتاب', oracle-verified); an earlier fold here
# diverged on every Farsi-letter token.


def _normalize_pre(w: str) -> str:
    return "".join(c for c in w if c not in _STRIP)


def _normalize_post(w: str) -> str:
    if w and w[-1] in "أإآ":
        w = w[:-1] + "ء"
    elif w and w[-1] in "ؤئ":
        w = w[:-1] + "ء"
    out = []
    for c in w:
        if c in "أإآ":
            out.append("ا")
        elif c == "ؤ":
            out.append("و")
        elif c == "ئ":
            out.append("ي")
        else:
            out.append(c)
    return "".join(out)


def _among_suffix(w: str, table) -> str | None:
    """table: [(suffix, min_len)], longest match wins; None if no fire."""
    best = None
    for s, ml in table:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, ml)
    if best is not None and len(w) >= best[1]:
        return w[: -len(best[0])]
    return None


_VERB_S1 = [("ه", 4), ("ك", 4),
            ("ني", 5), ("نا", 5), ("ها", 5), ("هم", 5), ("هن", 5),
            ("كم", 5), ("كن", 5),
            ("هما", 6), ("كما", 6), ("كمو", 6)]
_VERB_S2A = [("ت", 4), ("ا", 4), ("ن", 4), ("ي", 4),
             ("نا", 5), ("تا", 5), ("تن", 5), ("ان", 6), ("ون", 6),
             ("ين", 6), ("تما", 6)]
_VERB_S2B = [("وا", 5), ("تم", 5)]
_VERB_S2C = [("و", 4), ("تمو", 6)]
_NOUN_S1A = [("ي", 4), ("ك", 4), ("ه", 4),
             ("نا", 5), ("كم", 5), ("ها", 5), ("هن", 5), ("هم", 5),
             ("كما", 6), ("هما", 6)]


def _noun_step2a(w):
    return w[:-1] if w and w[-1] in "اوي" and len(w) > 4 else None


def _noun_step2b(w):
    return w[:-2] if w.endswith("ات") and len(w) >= 5 else None


def _noun_step2c1(w):
    return w[:-1] if w.endswith("ت") and len(w) >= 4 else None


def stem(word: str) -> str:
    is_noun = True
    is_verb = True
    is_defined = False
    w = word

    # Checks1: classify by article
    if (w.startswith("بال") or w.startswith("كال")) and len(w) > 4:
        is_noun, is_verb, is_defined = True, False, True
    elif (w.startswith("ال") or w.startswith("لل")) and len(w) > 3:
        is_noun, is_verb, is_defined = True, False, True

    w = _normalize_pre(w)

    # ---- suffixes -------------------------------------------------------
    handled = False
    if is_verb:
        m = _among_suffix(w, _VERB_S1)
        if m is not None:
            while m is not None:  # object pronouns strip repeatedly
                w = m
                m = _among_suffix(w, _VERB_S1)
            m2 = _among_suffix(w, _VERB_S2A)
            if m2 is None:
                m2 = _among_suffix(w, _VERB_S2C)
            if m2 is not None:
                w = m2
            handled = True
        else:
            m = _among_suffix(w, _VERB_S2B)
            if m is None:
                m = _among_suffix(w, _VERB_S2A)
            if m is not None:
                w = m
                handled = True
    if not handled and is_noun:
        m = _among_suffix(w, [("ة", 4)])  # Step2c2
        if m is not None:
            w = m
        else:
            matched = False
            if not is_defined:
                m = _among_suffix(w, _NOUN_S1A)
                if m is not None:
                    w = m
                    m2 = _noun_step2a(w) or _noun_step2b(w) or _noun_step2c1(w)
                    if m2 is not None:
                        w = m2
                    matched = True
            if not matched and w.endswith("ن") and len(w) > 5:  # Step1b
                w = w[:-1]
                m2 = _noun_step2a(w) or _noun_step2b(w) or _noun_step2c1(w)
                if m2 is not None:
                    w = m2
                matched = True
            if not matched and not is_defined:
                m2 = _noun_step2a(w)
                if m2 is not None:
                    w = m2
                    matched = True
            if not matched:
                m2 = _noun_step2b(w)
                if m2 is not None:
                    w = m2
                    matched = True
        # Step3: the noun pipeline "succeeds" only via a final -i delete;
        # otherwise the alef-maqsura fallback still gets its chance
        if w.endswith("ي") and len(w) >= 3:
            w = w[:-1]
            handled = True
    if not handled and w.endswith("ى"):
        w = w[:-1] + "ي"

    # ---- prefixes (steps share one cursor; length guards count the
    # ---- remaining region after the cursor) -----------------------------
    c = 0
    # Step1: doubled hamza
    if len(w) > 3:
        for two, rep in (("أأ", "أ"), ("أآ", "آ"), ("أؤ", "أ"),
                         ("أا", "ا"), ("أإ", "إ")):
            if w.startswith(two, c):
                w = w[:c] + rep + w[c + 2:]
                c += 1
                break
    # Step2: conjunctions ف/و (not before alef)
    if (
        not w.startswith(("فا", "وا"), c)
        and c < len(w)
        and w[c] in "فو"
        and len(w) > 3
    ):
        w = w[:c] + w[c + 1:]
    # Step3: articles, then noun/verb prefixes
    stepped = False
    if len(w) > 4 and (w.startswith("ال", c) or w.startswith("لل", c)):
        w = w[:c] + w[c + 2:]
        stepped = True
    if not stepped and is_noun:
        if len(w) > 5 and (
            w.startswith("بال", c) or w.startswith("كال", c)
        ):
            w = w[:c] + w[c + 3:]
            stepped = True
        elif len(w) > 3 and w.startswith("بب", c):
            w = w[:c] + "ب" + w[c + 2:]
            stepped = True
        elif len(w) > 3 and w.startswith("كك", c):
            w = w[:c] + "ك" + w[c + 2:]
            stepped = True
        elif (
            len(w) > 3
            and w.startswith("ب", c)
            and not w.startswith("با", c)
        ):
            w = w[:c] + w[c + 1:]
            stepped = True
    if not stepped and is_verb:
        if len(w) > 4:
            for two, rep in (("سي", "ي"), ("ست", "ت"), ("سن", "ن"),
                             ("سأ", "أ")):
                if w.startswith(two, c):
                    w = w[:c] + rep + w[c + 2:]
                    stepped = True
                    break
        if not stepped and len(w) > 4 and w[c:c + 3] in (
            "يست", "نست", "تست"
        ):
            w = w[:c] + "است" + w[c + 3:]

    return _normalize_post(w)
