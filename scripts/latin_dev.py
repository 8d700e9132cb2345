"""Generic stemmer dev harness for Latin-script languages (dev-time only).

Diffs a tantiny_spark stemmer against the compiled Snowball oracle on a
MIXED alphabet that includes letters outside the language's native set
(ş ı ğ ñ ã õ å æ ø ê è é ...): real web text routes mixed-language tokens
through every stemmer, so parity must hold beyond the happy alphabet.
Groups mismatches by trailing bigram to point at the wrong rule.

Usage:
    python scripts/latin_dev.py <code> <native_name> [n] [--show N]
    python scripts/latin_dev.py nl dutch 40000
    python scripts/latin_dev.py da danish --probe 'öö' 'bb'
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from scripts.snowball_native import NativeStemmer  # noqa: E402
from tantiny_spark.analysis import tokenizers  # noqa: E402

MIXED = "abcdefghijklmnopqrstuvwxyzäöüéèêëàâçñãõåæøışğ"


def main() -> None:
    code, name = sys.argv[1], sys.argv[2]
    args = [a for a in sys.argv[3:] if not a.startswith("--")]
    n = int(args[0]) if args else 40000
    show = 20
    if "--show" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show") + 1])

    ours = tokenizers._STEMMERS[code]
    native = NativeStemmer(name)

    if "--probe" in sys.argv:
        for w in sys.argv[sys.argv.index("--probe") + 1:]:
            print(f"{w!r}: native={native.stem(w)!r} ours={ours(w)!r}")
        return

    rng = random.Random(77)
    words = set()
    for _ in range(n):
        ln = rng.randint(2, 14)
        w = "".join(rng.choice(MIXED) for _ in range(ln))
        words.add(w)
        if rng.random() < 0.3:  # doubled finals stress the undouble rules
            words.add(w + w[-1])

    mism = []
    for w in sorted(words):
        o, nat = ours(w), native.stem(w)
        if o != nat:
            mism.append((w, nat, o))
    print(f"{len(mism)}/{len(words)} mismatches")
    from collections import Counter

    print("trailing bigrams:", Counter(w[-2:] for w, _, _ in mism).most_common(12))
    for w, nat, o in mism[:show]:
        print(f"  {w!r}: native={nat!r} ours={o!r}")


if __name__ == "__main__":
    main()
