"""Arabic stemmer development harness (development-time only).

Diff-tests tantiny_spark.analysis.snowball_ar against the compiled
Snowball oracle (scripts/snowball_native.py) on a deterministic
affix-dense corpus; groups mismatches for iteration.

Usage: python scripts/arabic_dev.py [n_words] [--show N] [--probe w ...]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from scripts.snowball_native import NativeStemmer  # noqa: E402

LETTERS = "ابتثجحخدذرزسشصضطظعغفقكلمنهويءآأؤإئةى"
ROOTS = ["كتب", "درس", "علم", "قرا", "سال", "شفي", "قول", "اكل", "شرب",
         "ذهب", "جلس", "فتح", "نصر", "ضرب", "حسب", "خرج", "دخل", "عمل",
         "قرأ", "سأل", "رئس", "ؤمن", "أمن", "مدرس", "معلم", "مستشف"]
PREFIXES = ["", "", "", "ال", "بال", "كال", "لل", "و", "ف", "وال", "فال",
            "س", "سي", "ست", "سن", "سأ", "ي", "ت", "ن", "أ", "است", "يست",
            "نست", "تست", "ب", "ك", "بب", "كك", "أأ", "أآ", "فب", "وب",
            "وا", "فا", "لي", "لن", "لت", "لل"]
SUFFIXES = ["", "", "ة", "ات", "ون", "ين", "ان", "ها", "هم", "هن", "كم",
            "كن", "ني", "نا", "ي", "ك", "ه", "هما", "كما", "كمو", "تم",
            "تمو", "وا", "تا", "تن", "ت", "ن", "ا", "ى", "تما", "و",
            "يات", "هات", "تين", "تان"]
DIACRITICS = "ًٌٍَُِّْـ"


def make_word(rng):
    r = rng.random()
    if r < 0.55:
        base = rng.choice(ROOTS)
    else:
        base = "".join(rng.choice(LETTERS) for _ in range(rng.randint(1, 5)))
    w = rng.choice(PREFIXES) + base + rng.choice(SUFFIXES)
    if rng.random() < 0.3:
        w += rng.choice(SUFFIXES)
    if rng.random() < 0.15:
        pos = rng.randrange(len(w) + 1)
        w = w[:pos] + rng.choice(DIACRITICS) + w[pos:]
    return w


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 20000
    show = 30
    if "--show" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show") + 1])

    from tantiny_spark.analysis import snowball_ar

    native = NativeStemmer("arabic")

    if "--probe" in sys.argv:
        for w in sys.argv[sys.argv.index("--probe") + 1:]:
            print(f"{w!r}: native={native.stem(w)!r} ours={snowball_ar.stem(w)!r}")
        return

    rng = random.Random(42)
    words = {make_word(rng) for _ in range(n)}
    mism = []
    for w in sorted(words):
        try:
            ours = snowball_ar.stem(w)
        except Exception as e:  # noqa: BLE001
            ours = f"<ERR {e}>"
        nat = native.stem(w)
        if ours != nat:
            mism.append((w, nat, ours))
    print(f"{len(mism)}/{len(words)} mismatches")
    from collections import Counter
    print("lead bigrams:", Counter(w[:2] for w, _, _ in mism).most_common(10))
    print("tail bigrams:", Counter(w[-2:] for w, _, _ in mism).most_common(10))
    for w, nat, ours in mism[:show]:
        print(f"  {w!r}: native={nat!r} ours={ours!r}")


if __name__ == "__main__":
    main()
