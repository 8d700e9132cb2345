"""Tamil stemmer development harness (development-time only).

Diff-tests tantiny_spark.analysis.snowball_ta against the compiled
Snowball oracle (scripts/snowball_native.py) on a deterministic
suffix-dense corpus, and groups mismatches by trailing pattern so each
iteration points at the rule that is wrong.

Usage:
    python scripts/tamil_dev.py [n_words] [--show N] [--probe word ...]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from scripts.snowball_native import NativeStemmer  # noqa: E402

CONSONANTS = "கஙசஞடணதநனபமயரறலளழவ"
VOWELS = "அஆஇஈஉஊஎஏஐஒஓஔ"
SIGNS = "ாிீுூெேைொோௌ"
VIRAMA = "்"

SUFFIXES = [
    # plural
    "கள்", "ங்கள்", "ுங்கள்", "ற்கள்", "ட்கள்",
    # question / um
    "ோ", "ே", "ா", "ும்",
    # common word endings
    "ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகிய", "ாகி", "ென்று", "ுள்ள",
    "ுடைய", "ுடை", "ெனும்", "ல்ல", "ென",
    "படிதான்", "பட்டது", "ெல்லாம்", "கொண்டிருந்து", "பட்டண", "பட்டு",
    "விட்டு", "பட்ட", "தான்", "படி", "பற்றி", "விடு", "படு",
    # vetrumai
    "ிலிருந்து", "ிருந்து", "ின்று", "ாமல்", "ோடு", "ொடு", "ால்", "ுள்",
    "ில்", "ின்", "விட", "ை", "ிற்", "கண்", "முன்", "மேல்", "மேற்", "கீழ்",
    "பின்", "ினை", "னை", "க்கு", "ல்",
    # tense
    "மின்", "னன்", "னான்", "னாள்", "னார்", "வன்", "னள்", "வள்", "னர்",
    "வர்", "பன்", "பள்", "பர்", "ிற்று", "பம்", "னம்", "தும்", "றும்",
    "கும்", "டும்", "னென்", "வை", "கிற", "கின்ற", "ாநின்ற", "து",
    "ன", "ப", "க", "த", "ய", "வ",
    "ான்", "ாள்", "ார்", "ேன்", "ாம்", "ெம்", "ேம்", "ோம்", "ாய்",
    "னிர்", "ீர்", "ீயர்", "ீ", "கு", "ச்சு",
    # command
    "பி", "வி",
    # fix_ending food
    "ந்த்", "ந்த", "ந்", "ய்", "ட்ப்", "ட்க்", "ன்ற்", "ற்க்", "ட்ட்",
    "த்த்", "ுக்", "ுக்க்", "்", "ங்", "ைங்", "வ்", "னு", "ம்",
]

PREFIXES = ["", "", "", "எக்", "எச்", "எத்", "எவ்", "அக்", "இத்", "உவ்",
            "அவ", "இது", "வோ", "வு"]


def syllable(rng):
    c = rng.choice(CONSONANTS)
    r = rng.random()
    if r < 0.45:
        return c + rng.choice(SIGNS)
    if r < 0.65:
        return c + VIRAMA
    if r < 0.9:
        return c
    return rng.choice(VOWELS)


def make_word(rng):
    n = rng.randint(1, 4)
    base = rng.choice(PREFIXES) + "".join(syllable(rng) for _ in range(n))
    nsuf = rng.choice([0, 1, 1, 1, 2, 2, 3])
    for _ in range(nsuf):
        base += rng.choice(SUFFIXES)
    return base


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 20000
    show = 30
    if "--show" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show") + 1])

    from tantiny_spark.analysis import snowball_ta

    native = NativeStemmer("tamil")

    if "--probe" in sys.argv:
        for w in sys.argv[sys.argv.index("--probe") + 1:]:
            print(f"{w!r}: native={native.stem(w)!r} ours={snowball_ta.stem(w)!r}")
        return

    rng = random.Random(42)
    words = {make_word(rng) for _ in range(n)}
    if "--stacked" in sys.argv:
        # stacked-participle class: 1-4 syllable stem + 2-3 participle
        # stems + an optional tense/common/vetrumai suffix (the _chain
        # recursion-gate regression class from round-2 ADVICE)
        parts = ["கிற", "கின்ற", "ாநின்ற", "கிற்", "கின்ற்", "ாநின்ற்"]
        tails = ["", "ான்", "ாள்", "னர்", "னான்", "து", "ும்", "கள்",
                 "ா", "கு", "க", "ை", "ின்", "ோ", "டும்", "ீர்"]
        for _ in range(n):
            base = "".join(syllable(rng) for _ in range(rng.randint(1, 4)))
            base += "".join(rng.choice(parts)
                            for _ in range(rng.randint(2, 3)))
            words.add(base + rng.choice(tails))
    # also every raw suffix attached to a few fixed stems
    for stem_base in ("படகட", "நிலைய", "மரப", "அறிவுக", "ததத", "நநந",
                      "கூட்டத்", "வணக்", "புத்தகங்"):
        for s in SUFFIXES:
            words.add(stem_base + s)
            words.add(stem_base + s + "கள்")

    mism = []
    for w in sorted(words):
        try:
            ours = snowball_ta.stem(w)
        except Exception as e:  # noqa: BLE001
            ours = f"<ERR {e}>"
        nat = native.stem(w)
        if ours != nat:
            mism.append((w, nat, ours))

    print(f"{len(mism)}/{len(words)} mismatches")
    # group by native-side removed suffix pattern (last 4 chars of input)
    from collections import Counter
    c = Counter(w[-3:] for w, _, _ in mism)
    print("top trailing trigrams of mismatching inputs:", c.most_common(15))
    for w, nat, ours in mism[:show]:
        print(f"  {w!r}: native={nat!r} ours={ours!r}")


if __name__ == "__main__":
    main()
