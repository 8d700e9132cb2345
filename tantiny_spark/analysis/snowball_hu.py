"""Snowball Hungarian stemmer, pure Python.

Re-implements the published Snowball Hungarian algorithm
(https://snowballstem.org/algorithms/hungarian/stemmer.html), the algorithm
behind Tantivy's ``Stemmer::new(Language::Hungarian)`` via rust-stemmers
(reference language table: /root/reference/src/helpers.rs:18-40).
Suffix inventories cross-checked against the compiled Snowball tables and
verified byte-exact against the compiled oracle
(scripts/snowball_oracle.py).

Control flow: nine steps run in sequence (each a ``do``), every among with
COMMIT semantics — the longest matching suffix string is selected first and
if it falls outside R1 the whole step is a no-op (no fallback to a shorter
suffix).
"""

from __future__ import annotations

VOWELS = set("aáeéiíoóöőuúüű")

# consonant digraphs recognized when locating the R1 boundary (note: 'dzs'
# but no bare 'dz', per the compiled tables)
# mark_regions digraphs are the PLAIN list only (published spec: cs dz
# dzs gy ly ny sz ty zs) — the doubled forms (ccs/zzs/...) belong to the
# undouble among, NOT here; including them shifted R1 right and blocked
# e.g. the -stül strip on 'ezzstülra' (oracle-verified)
_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

_DOUBLES = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
            "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
            "vv", "zz", "zzs")


def _r1(word: str) -> int:
    n = len(word)
    if not word:
        return 0
    if word[0] in VOWELS:
        # after the first consonant (or digraph) in the word
        for i in range(1, n):
            if word[i] not in VOWELS:
                for d in _DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if word[i] in VOWELS:
            return i + 1
    return n


def _commit(word: str, r1: int, entries) -> str:
    """among with commit semantics: entries are (suffix, replacement) pairs
    pre-sorted longest-first; the longest suffix whose STRING matches is
    selected, then the R1 condition decides delete-or-nothing."""
    for suf, rep in entries:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                return word[: -len(suf)] + rep
            return word
    return word


def _sortd(pairs):
    return sorted(pairs, key=lambda x: len(x[0]), reverse=True)


_CASE = _sortd(
    [(s, "") for s in (
        "hoz", "hez", "höz", "nak", "nek", "val", "vel", "tól", "től",
        "ról", "ről", "ból", "ből", "ban", "ben", "nál", "nél", "ba", "be",
        "ra", "re", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
        "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként",
        "ként", "en", "on", "an", "ön", "n", "t")]
)
_CASE_SPECIAL = _sortd([("ánként", "a"), ("án", "a"), ("én", "e")])
_CASE_OTHER = _sortd(
    [("astul", ""), ("estül", ""), ("ástul", "a"), ("éstül", "e"),
     ("stul", ""), ("stül", "")]
)
_OWNED = _sortd(
    [("é", ""), ("ké", ""), ("aké", ""), ("eké", ""), ("oké", ""),
     ("öké", ""), ("áké", "a"), ("éké", "e"), ("éé", "e"),
     ("éi", ""), ("áéi", "a"), ("ééi", "e")]
)
_SING_OWNER = _sortd(
    [("a", ""), ("á", "a"), ("e", ""), ("é", "e"), ("o", ""),
     ("ja", ""), ("je", ""),
     ("d", ""), ("ad", ""), ("ed", ""), ("od", ""), ("öd", ""),
     ("ád", "a"), ("éd", "e"),
     ("m", ""), ("am", ""), ("em", ""), ("om", ""), ("ám", "a"), ("ém", "e"),
     ("nk", ""), ("unk", ""), ("ünk", ""), ("ánk", "a"), ("énk", "e"),
     ("uk", ""), ("ük", ""), ("juk", ""), ("jük", ""),
     ("ájuk", "a"), ("éjük", "e")]
)
_PLUR_OWNER = _sortd(
    [("im", ""), ("aim", ""), ("eim", ""), ("jaim", ""), ("jeim", ""),
     ("áim", "a"), ("éim", "e"),
     # no bare 'itok' (asymmetric with 'itek'), per the compiled tables
     ("aitok", ""), ("jaitok", ""), ("áitok", "a"),
     ("itek", ""), ("eitek", ""), ("jeitek", ""), ("éitek", "e"),
     ("ink", ""), ("aink", ""), ("eink", ""), ("jaink", ""), ("jeink", ""),
     ("áink", "a"), ("éink", "e"),
     ("ik", ""), ("aik", ""), ("eik", ""), ("jaik", ""), ("jeik", ""),
     ("áik", "a"), ("éik", "e"),
     ("i", ""), ("ai", ""), ("ei", ""), ("jai", ""), ("jei", ""),
     ("ái", "a"), ("éi", "e"),
     ("id", ""), ("aid", ""), ("eid", ""), ("jaid", ""), ("jeid", ""),
     ("áid", "a"), ("éid", "e")]
)
_PLURAL = _sortd(
    [("ák", "a"), ("ék", "e"), ("ök", ""), ("ok", ""), ("ek", ""),
     ("ak", ""), ("k", "")]
)


def _ends_double(word: str) -> str | None:
    for d in sorted(_DOUBLES, key=len, reverse=True):
        if word.endswith(d):
            return d
    return None


def _undouble(word: str) -> str:
    """Drop the first character of a trailing double consonant: zzs → zs,
    bb → b."""
    d = _ends_double(word)
    if d is None:
        return word
    return word[: -len(d)] + d[1:]


def _v_ending(word: str, r1: int) -> str:
    if word.endswith("á") and len(word) - 1 >= r1:
        return word[:-1] + "a"
    if word.endswith("é") and len(word) - 1 >= r1:
        return word[:-1] + "e"
    return word


def stem(word: str) -> str:
    r1 = _r1(word)

    # 1. instrumental/translative 'al'/'el' after a double consonant
    for suf in ("al", "el"):
        if word.endswith(suf):
            if len(word) - 2 >= r1:
                base = word[:-2]
                if _ends_double(base):
                    word = _undouble(base)
            break

    # 2. case endings, then final á/é restored to a/e
    before = word
    word = _commit(word, r1, _CASE)
    if word != before:
        word = _v_ending(word, r1)

    # 3. special case endings with replacement
    word = _commit(word, r1, _CASE_SPECIAL)

    # 4. -stul family (mostly shadowed by case 'ul'/'ül', kept for parity)
    word = _commit(word, r1, _CASE_OTHER)

    # 5. factive 'á'/'é' after a double consonant
    for suf in ("á", "é"):
        if word.endswith(suf):
            if len(word) - 1 >= r1:
                base = word[:-1]
                if _ends_double(base):
                    word = _undouble(base)
            break

    # 6-9. owned / singular owner / plural owner / plural
    word = _commit(word, r1, _OWNED)
    word = _commit(word, r1, _SING_OWNER)
    word = _commit(word, r1, _PLUR_OWNER)
    word = _commit(word, r1, _PLURAL)
    return word
