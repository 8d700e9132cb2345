"""Snowball Tamil stemmer, pure Python.

Re-implements the Snowball Tamil algorithm (the affix-stripping stemmer
behind Tantivy's ``Stemmer::new(Language::Tamil)`` via rust-stemmers;
reference language table /root/reference/src/helpers.rs:18-40).

Reverse-engineered against the compiled-Snowball oracle that PostgreSQL /
DuckDB link (scripts/snowball_native.py): rule inventory decoded from the
annotated control-flow dump (scripts/extracted/tamil_flow.txt +
tamil_notes.md), then driven to byte-exactness on large random
suffix-dense sweeps (scripts/tamil_dev.py).

Structure (all indices are Unicode codepoints):

* ``_fix_ending_once`` — or-chain of ending cleanups (nasal clusters,
  hard-consonant clusters, ng->m, bare வ/ய/னு, stray viramas); applied
  once at entry and to fixpoint after matching steps.
* entry: one fix application, then a global ``len > 4`` gate.
* pipeline steps, each gated on the CURRENT length ``> 4`` (plural:
  ``> 3``): question prefix, pronoun prefix (strip + va-start fix, no
  ending fix), question suffix -aa/-oo/-ee, -um, common word endings,
  vetrumai (case) suffixes — these four run ``fix_endings``
  unconditionally at step end — then plural (no fix; the hard-consonant
  ுங்கள் branch is terminal), command -pi/-vi (no fix), and a repeated
  tense loop: per pass min-length, match, then fix.
* ``found_a_match`` threads through: set by matching steps, it arms the
  guarded single-consonant deletions in the tense loop; each loop pass
  overwrites it with that pass's match outcome.
* cross-step state (decoded against the compiled oracle, round 2):
  a -um match flips the vetrumai 'ிற்'→virama / 'மேற்'→delete variants;
  the bare -ா common branch TERMINATES the suffix pipeline (skips
  vetrumai, plural, command — tense still runs) and chains participles;
  every vetrumai match takes the pre-fix 'ின்' continuation; regular
  tense matches chain exactly ONE participle stem ('கிற'/'கின்ற'/
  'ாநின்ற', ± virama), replace-with-virama rules chain only the plain
  family, and further stacked participles are re-stripped only by the
  >4-gated repeat loop (round-3 fix: the ungated recursive chain
  over-stripped stacked-participle words; now byte-exact on a 295k-word
  stacked-participle sweep plus the original suffix-dense sweeps).
"""

from __future__ import annotations

VIRAMA = "்"
SIGNS8 = "ாிீுூெேை"  # vowel signs that absorb a following virama
C6 = "கசடதபற"  # vallinam (hard) consonants
C10 = "கசதவநபமயஙஞ"  # consonants forming question/pronoun prefixes
VOWELS12 = "அஆஇஈஉஊஎஏஐஒஓஔ"
# Tamil-proper consonants: the compiled oracle's cluster-rule grouping
# EXCLUDES the Grantha letters (ஜ ஶ ஷ ஸ ஹ) — 'எசஈ்ஸ்' keeps its ஸ்
# while the same shape with க..வ strips (probe-verified per letter)
CONSONANTS = set("கஙசஞடணதநனபமயரறலளழவ")
SINGLES = "னபகதய"  # single-consonant tense deletions (வ is a fix rule)


def _fix_ending_once(w: str, vet: bool = False) -> str | None:
    """One application of the fix_ending or-chain; None = no rule fired."""
    if len(w) <= 3:
        return None
    for s in ("ந்த்", "ந்த", "ந்"):
        if w.endswith(s):
            return w[: -len(s)]
    if w.endswith("ய்") and w[-3] in "ிீை":
        return w[:-2]
    if w.endswith("ட்ப்") or w.endswith("ட்க்"):
        return w[:-4] + "ள்"
    if w.endswith("ன்ற்") or w.endswith("ற்க்"):
        return w[:-4] + "ல்"
    if w.endswith("ட்ட்"):
        return w[:-4] + "டு"
    if w.endswith("ுக்க்"):
        return w[:-5] + VIRAMA
    if w.endswith("ுக்"):
        return w[:-3] + VIRAMA
    if w.endswith("்்"):
        return w[:-1]
    if vet and w.endswith("த்த்") and (len(w) < 5 or w[-5] not in "ை்"):
        # vetrumai-armed: -ththu cluster becomes -m
        return w[:-4] + "ம்"
    if w[-1] == VIRAMA and w[-3] == VIRAMA and w[-2] in CONSONANTS:
        # cluster C' ் C ் — both hard -> drop both pairs, else last pair
        if len(w) >= 4 and w[-4] in C6 and w[-2] in C6:
            return w[:-4]
        return w[:-2]
    if w.endswith("ைங்"):
        return w[:-2]
    if w.endswith("ங்"):
        return w[:-2] + "ம்"
    if w[-1] == VIRAMA and w[-2] in C6:
        return w[:-2]
    if w.endswith("வ்"):
        return w[:-2]
    if w.endswith("னு") and w[-3] not in SIGNS8:
        return w[:-2]
    if w[-1] in "யவ":
        return w[:-1]
    if w[-1] == VIRAMA and w[-2] in SIGNS8:
        return w[:-1]
    return None


def _fix_endings(w: str, vet: bool = False) -> str:
    while True:
        nxt = _fix_ending_once(w, vet)
        if nxt is None:
            return w
        w = nxt


def _fix_va_start(w: str) -> str:
    for a, b in (("வோ", "ஓ"), ("வொ", "ஒ"), ("வு", "உ"), ("வூ", "ஊ")):
        if w.startswith(a):
            return b + w[2:]
    return w


_COMMON_TO_VIRAMA = (
    "ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகிய", "ாகி", "ென்று", "ுள்ள",
    "ுடைய", "ுடை", "ெனும்", "ென",
)
_COMMON_DELETE = tuple(
    sorted(
        # NOT 'கொண்டிர்': it is a TENSE suffix only — as a common ending it
        # would expose the stem to the vetrumai step ('அபில்கொண்டிர்' would
        # over-strip to 'அப்'; the oracle keeps 'அபில்')
        ("படிதான", "பட்டது", "ெல்லாம்", "பட்டண", "பட்டு",
         "விட்டு", "பட்ட", "தான", "படி", "பற்றி", "விடு", "படு"),
        key=len,
        reverse=True,
    )
)


def _match_common(w: str) -> str | None:
    for s in _COMMON_TO_VIRAMA:
        if w.endswith(s):
            return w[: -len(s)] + VIRAMA
    if w.endswith("ல்ல") and w[-4] not in SIGNS8:
        return w[:-3] + VIRAMA
    for s in _COMMON_DELETE:
        if w.endswith(s):
            return w[: -len(s)]
    if w.endswith("ா"):
        return w[:-1] + VIRAMA
    return None


_VETRUMAI_TO_VIRAMA = (
    "ொடு", "ோடு", "ில்", "ின்று", "ிருந்து", "விட", "ிடம்", "ால்",
    "ுடை", "ாமல்", "ுள்",
)
_VETRUMAI_DELETE = ("கண்", "முன்", "மேல்", "கீழ்", "பின்")
# suffixes whose match arms the "-min -> -m" continuation (vet_del)
_VETRUMAI_ARMING = ("கண்", "முன்", "மேல்", "கீழ்", "து", "னை", "விட")


def _match_vetrumai(
    w: str, um: bool = False, common: bool = False
) -> tuple[str, bool] | None:
    if w.endswith("னை"):
        return w[:-2], True
    if w.endswith("ை") and (w[-2] not in C6 or (len(w) >= 3 and w[-3] == VIRAMA)):
        return w[:-1] + VIRAMA, False
    for s in _VETRUMAI_TO_VIRAMA:
        if w.endswith(s):
            if s == "ிடம்" and not (
                len(w) >= 7
                or (len(w) == 6 and not common and w[-5] in CONSONANTS)
            ):
                # the 6-cp consonant exception is disabled once a common
                # word-ending already matched ('ஐசிடம்ுடை' keeps 'ிடம்')
                continue
            return w[: -len(s)] + VIRAMA, s in _VETRUMAI_ARMING
    if w.endswith("ிற்"):
        # after a -um match the rule yields virama instead of 'ி'
        return w[:-3] + (VIRAMA if um else "ி"), False
    if w.endswith("ின்") and not (len(w) >= 4 and w[-4] == "ம"):
        return w[:-3] + VIRAMA, False
    if w.endswith("ல்") and w[-3] not in SIGNS8:
        return w[:-2] + VIRAMA, False
    for s in _VETRUMAI_DELETE:
        if w.endswith(s):
            return w[: -len(s)], s in _VETRUMAI_ARMING
    if w.endswith("மேற்"):
        # after a -um match the suffix deletes instead of becoming 'ம்'
        return (w[:-4], False) if um else (w[:-4] + "ம்", False)
    if w.endswith("து") and w[-3] not in SIGNS8:
        return w[:-2], True
    if w.endswith("ீ"):
        return w[:-1] + "ி", False
    return None


_TENSE_DELETE = (
    "கொண்டிர்", "படு",
    "மின்", "னன்", "னான்", "னாள்", "னார்", "மார்",
    "னள்", "வள்", "னர்", "வர்", "பன்", "பள்", "பர்",
    "ிற்று", "பம்", "னம்", "தும்", "றும்", "கும்",
    "னென்", "னை", "வை",
    "கின்ற்", "ாநின்ற்", "கிற்",
    "கின்ற", "ாநின்ற", "கிற",
)
_TENSE_TO_VIRAMA = (
    "டும்",
    "ான்", "ாள்", "ார்", "ேன்", "ாம்", "ெம்", "ேம்", "ோம்",
    "ாய்", "னிர்", "ீர்", "ீயர்",
)


# participle stems, virama-terminated and plain. Matching a REGULAR tense
# suffix (delete / 'கு' / single-consonant) chains ONE suffix from BOTH
# families off the remaining stem, empty allowed ('டகிறக'→'ட',
# 'கிற்கு'→''); the replace-with-virama rules ('ான்' family and the armed
# 'ா') chain one from the PLAIN family ('கிறான்'→'' but 'கிற்ான்'→'கி');
# matching a participle itself does not chain at all — further stacked
# participles are re-stripped only by the repeat loop under its >4 length
# gate ('ஞகிறகின்ற'→'ஞகிற', 'இகிறகிறான்'→'இகிற', 'அகின்ற்கின்ற்கு'→'அகில்')
_CHAIN_FAMILY = ("ாநின்ற்", "கின்ற்", "கிற்", "ாநின்ற", "கின்ற", "கிற")
_CHAIN_FAMILY_PLAIN = ("ாநின்ற", "கின்ற", "கிற")


def _chain(stem_: str, family: tuple = _CHAIN_FAMILY) -> str:
    # Strips exactly ONE participle stem — further participles are
    # re-stripped only by the repeat tense loop under its >4 length gate
    # (oracle: 'இகிறகிறான்' → 'இகிற', 'அகின்ற்கின்ற்கு' → 'அகில்' — the
    # round-2 ungated recursion over-stripped stacked participles).
    for s in family:
        if stem_.endswith(s):
            return stem_[: -len(s)]
    return stem_


def _match_tense(w: str, found: bool, vet: bool = False, singles: bool = True) -> str | None:
    for s in _TENSE_DELETE:
        if w.endswith(s):
            if s in _CHAIN_FAMILY:
                # a participle match does not re-chain; the repeat loop
                # re-strips further participles under its >4 length gate
                return w[: -len(s)]
            return _chain(w[: -len(s)])
    if w.endswith("வன்") and not (len(w) >= 4 and w[-4] in VOWELS12):
        return _chain(w[:-3])
    if w.endswith("து") and w[-3] not in SIGNS8:
        return w[:-2]
    for s in _TENSE_TO_VIRAMA:
        if w.endswith(s):
            if s == "ான்" and len(w) >= 4 and w[-4] == "ச":
                continue
            # delete; a plain participle stem chains off too, else restore ்
            stem_ = w[: -len(s)]
            chained = _chain(stem_, _CHAIN_FAMILY_PLAIN)
            if chained is not stem_:
                return chained
            return stem_ + VIRAMA
    if found and w.endswith("ா"):
        stem_ = w[:-1]
        chained = _chain(stem_, _CHAIN_FAMILY_PLAIN)
        if chained is not stem_:
            return chained
        return stem_ + VIRAMA
    if w.endswith("கு") and len(w) >= 3 and w[-3] == VIRAMA:
        return _chain(w[:-2])
    if singles and w[-1] in SINGLES:
        return _chain(w[:-1])
    return None


def stem(word: str) -> str:
    w = word
    fixed = _fix_ending_once(w)
    if fixed is not None:
        w = fixed
    if len(w) <= 4:
        return w
    found = False

    # question prefix: எ + C10 + virama (strip + va-fix, no ending fix)
    if w[0] == "எ" and w[1] in C10 and w[2] == VIRAMA:
        w = _fix_va_start(w[3:])
        found = True
    # pronoun prefix: அ/இ/உ + C10 + virama
    if len(w) >= 3 and w[0] in "அஇஉ" and w[1] in C10 and w[2] == VIRAMA:
        w = _fix_va_start(w[3:])
        found = True
    # question suffixes -aa/-oo/-ee; one fix application runs regardless
    if len(w) > 4:
        if w[-1] in "ாோே":
            w = w[:-1] + VIRAMA
            found = True
        w = _fix_endings(w)
    # -um (does not arm the tense ா rule; single fix application); a match
    # flips the வேற்றுமை 'ிற்'/'மேற்' branches to their post-um variants
    um_matched = False
    if len(w) > 4 and w.endswith("ும்"):
        w = w[:-3] + VIRAMA
        um_matched = True
        f = _fix_ending_once(w)
        if f is not None:
            w = f
    # common word endings (a bare final -aa match also skips vetrumai)
    # a bare final -aa common match TERMINATES the suffix pipeline: it
    # skips vetrumai AND plural AND command (the tense loop still runs) —
    # probed: 'கயோகள்தாசும்' keeps 'கள்', 'கயோபிதாசும்' keeps 'பி',
    # while 'கயோனான்தாசும்' still tense-strips 'னான்'
    skip_rest = False
    common_matched = False
    if len(w) > 4:
        m = _match_common(w)
        if m is not None:
            skip_rest = w.endswith("ா") and m == w[:-1] + VIRAMA
            w = m
            if skip_rest:
                # the bare-ா branch chains participles off the new stem
                # ('தைறகிறாோ' → 'தைற'); the fix below then sees the result
                w = _chain(w)
            found = True
            common_matched = True
            w = _fix_endings(w)
    # vetrumai urupukal (case suffixes); a match arms the vet flag
    vet = 0
    if len(w) > 4 and not skip_rest:
        m = _match_vetrumai(w, um_matched, common_matched)
        if m is not None:
            w, arming = m
            found = True
            vet = 2 if arming else 1
            # -in continuation applies to the PRE-fix word after ANY
            # vetrumai match: a stem that already ended in virama yields
            # 'ின்்' here, which does NOT match (the '்்' collapse happens
            # in fix_endings below). No >4 gate — a 4-cp stem takes it too.
            if len(w) > 3 and w.endswith("ின்"):
                w = w[:-3] + VIRAMA
                if vet == 2:
                    vet = 1
            w = _fix_endings(w, bool(vet))
    # plural suffixes (no fix here; no extra length gate)
    if len(w) > 2 and not skip_rest:
        if (
            w.endswith("ுங்கள்")
            and (len(w) == 6 or (len(w) >= 7 and (w[-7] not in C6 or len(w) >= 8)))
        ):
            if len(w) >= 7 and w[-7] in C6:
                # hard-consonant branch is terminal: -> 'um', done
                return w[:-6] + "ும்"
            w = w[:-6] + VIRAMA
            found = True
        elif w.endswith("ற்கள்"):
            w = w[:-5] + "ல்"
            found = True
        elif w.endswith("ட்கள்"):
            w = w[:-5] + "ள்"
            found = True
        elif w.endswith("கள்"):
            w = w[:-3]
            found = True
    # command suffixes (no fix)
    if len(w) > 4 and not skip_rest and (w.endswith("பி") or w.endswith("வி")):
        w = w[:-2]
        found = True
    # tense loop: per-pass min length, match (ா armed by `found`),
    # then one fix application; exit after the first matchless pass
    while True:
        if len(w) <= 4:
            break
        m = _match_tense(w, found, vet)
        matched = m is not None
        if matched:
            w = m
            found = True
        w = _fix_endings(w, bool(vet))
        if vet == 2:
            vet = 1  # the armed -in rule only applies to the first pass
        if not matched:
            break
    return w
