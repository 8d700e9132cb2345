"""Suffix-weighted stemmer stress sweep vs the compiled oracle (dev-time).

Random words rarely land on suffix-table boundaries — the Romanian '-ia'
bug survived two rounds of random sweeps because a spurious rule and a
later step compensated except exactly at the RV boundary. This harness
harvests every module-level string literal from the implementation under
test (its own suffix tables) and generates words as short-stem + suffix
(+ optional second suffix), concentrating the distribution on rule
boundaries and rule interactions.

Usage: python scripts/suffix_stress.py [lang ...]   (default: all)

Known residual (documented, not chased): the compiled GREEK stemmer
exhibits stale-slice artifacts on ~2-in-40k nonsense words ('γιανε' →
'γαναν', 'αγαμειζαμε' → 'αγαμεαγαμ' — the replacement region from a
failed earlier step leaks into a later <- command; verified identical in
the independent PostgreSQL build, and no among table contains these
outputs). Emulating the cursor state machine for these would add
complexity with no real-text benefit; every real suffix family matches.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from scripts.snowball_native import NativeStemmer  # noqa: E402
from tantiny_spark.analysis import tokenizers  # noqa: E402

NAMES = {
    "ar": "arabic", "da": "danish", "de": "german", "el": "greek",
    "en": "english", "es": "spanish", "fi": "finnish", "fr": "french",
    "hu": "hungarian", "it": "italian", "nl": "dutch", "no": "norwegian",
    "pt": "portuguese", "ro": "romanian", "ru": "russian", "sv": "swedish",
    "ta": "tamil", "tr": "turkish",
}
MODULES = {
    code: (f"porter2" if code == "en" else f"snowball_{code}")
    for code in NAMES
}
ALPHA = {
    "ru": "абвгдежзийклмнопрстуфхцчшщъыьэюя",
    "el": "αβγδεζηθικλμνξοπρστυφχψως",
    "ar": "ابتثجحخدذرزسشصضطظعغفقكلمنهوي",
    "ta": "அஆஇஈஉஎஏகஙசஞடணதநனபமயரறலளழவ",
}
SIGNS = {
    "ta": "்ாிீுெே",
    "ar": "ًَُِّْ",
}


def harvest_suffixes(mod) -> list[str]:
    """All short string literals reachable from module-level containers —
    the implementation's own suffix/ending tables."""
    out: set[str] = set()

    def walk(obj, depth=0):
        if depth > 3:
            return
        if isinstance(obj, str):
            if 0 < len(obj) <= 10 and not obj.isascii() or (
                obj.isalpha() and len(obj) <= 10
            ):
                out.add(obj)
        elif isinstance(obj, (list, tuple, set, frozenset)):
            for x in obj:
                walk(x, depth + 1)
        elif isinstance(obj, dict):
            for k, v in obj.items():
                walk(k, depth + 1)
                walk(v, depth + 1)

    for name in dir(mod):
        if name.startswith("__"):
            continue
        try:
            walk(getattr(mod, name))
        except Exception:
            pass
    return sorted(out)


def run(code: str, n: int = 40000, seed: int = 20260817) -> int:
    import importlib

    mod = importlib.import_module(f"tantiny_spark.analysis.{MODULES[code]}")
    sufs = harvest_suffixes(mod)
    alpha = ALPHA.get(code, "abcdefghijklmnoprstuvyz") + SIGNS.get(code, "")
    ours = tokenizers._STEMMERS[code]
    native = NativeStemmer(NAMES[code])
    rng = random.Random(seed)
    words = set()
    for _ in range(n):
        stem_len = rng.choice([0, 1, 1, 2, 2, 3, 3, 4, 5, 6])
        w = "".join(rng.choice(alpha) for _ in range(stem_len))
        w += rng.choice(sufs)
        if rng.random() < 0.5:
            w += rng.choice(sufs)
        if rng.random() < 0.15:
            w += rng.choice(alpha)
        words.add(w)
    bad = [
        (w, native.stem(w), ours(w))
        for w in sorted(words)
        if ours(w) != native.stem(w)
    ]
    print(f"{code}: {len(bad)}/{len(words)} mismatches "
          f"({len(sufs)} harvested suffixes)")
    for w, nat, o in bad[:8]:
        print(f"  {w!r}: native={nat!r} ours={o!r}")
    return len(bad)


def main() -> None:
    codes = sys.argv[1:] or sorted(NAMES)
    total = 0
    for code in codes:
        total += run(code)
    print("TOTAL mismatches:", total)
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
