"""Snowball Russian stemmer, pure Python.

Re-implements the published Snowball Russian algorithm
(https://snowballstem.org/algorithms/russian/stemmer.html), which is what
Tantivy's ``Stemmer::new(Language::Russian)`` runs (reference language table:
/root/reference/src/helpers.rs:18-40; golden fixture:
/root/reference/spec/tantiny/tokenizer_spec.rb:32-39).
"""

from __future__ import annotations

VOWELS = set("аеиоуыэюя")

_PERFECTIVE_GERUND_1 = ("вшись", "вши", "в")  # must be preceded by а or я
_PERFECTIVE_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")  # preceded by а or я
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_REFLEXIVE = ("ся", "сь")
_VERB_1 = (  # preceded by а or я
    "ете", "йте", "ешь", "нно",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н",
)
_VERB_2 = (
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено",
    "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю",
)
_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем",
    "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_DERIVATIONAL = ("ость", "ост")
_SUPERLATIVE = ("ейше", "ейш")


def _regions(word: str) -> tuple[int, int]:
    """Return (rv, r2) start offsets for the word."""
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _drop_group1(word: str, rv: int, suffixes: tuple[str, ...]) -> str | None:
    """Remove a group-1 suffix (must be preceded by а/я, the а/я stays)."""
    for suf in suffixes:
        if word.endswith(suf) and len(word) - len(suf) - 1 >= 0:
            prev = word[len(word) - len(suf) - 1]
            if prev in "ая" and len(word) - len(suf) >= rv + 1:
                # the preceding а/я must itself be inside RV
                return word[: -len(suf)]
    return None


def _drop(word: str, rv: int, suffixes: tuple[str, ...]) -> str | None:
    for suf in suffixes:
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            return word[: -len(suf)]
    return None


def stem(word: str) -> str:
    """Stem one lowercased Russian word."""
    word = word.replace("ё", "е")
    rv, r2 = _regions(word)
    if rv >= len(word):
        return word

    # Step 1: perfective gerund, else (reflexive then adjectival|verb|noun)
    w = _drop_group1(word, rv, _PERFECTIVE_GERUND_1)
    if w is None:
        w = _drop(word, rv, _PERFECTIVE_GERUND_2)
    if w is not None:
        word = w
    else:
        w = _drop(word, rv, _REFLEXIVE)
        if w is not None:
            word = w
        w = _drop(word, rv, _ADJECTIVE)
        if w is not None:
            word = w
            # optionally a participle ending before the adjective ending
            w = _drop_group1(word, rv, _PARTICIPLE_1)
            if w is None:
                w = _drop(word, rv, _PARTICIPLE_2)
            if w is not None:
                word = w
        else:
            w = _drop_group1(word, rv, _VERB_1)
            if w is None:
                w = _drop(word, rv, _VERB_2)
            if w is not None:
                word = w
            else:
                w = _drop(word, rv, _NOUN)
                if w is not None:
                    word = w

    # Step 2: trailing и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # Step 3: derivational ending in R2
    for suf in _DERIVATIONAL:
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: -len(suf)]
            break

    # Step 4: undouble нн / superlative / trailing ь
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        w = _drop(word, rv, _SUPERLATIVE)
        if w is not None:
            word = w
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]

    return word
