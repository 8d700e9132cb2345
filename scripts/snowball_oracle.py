"""Offline Snowball parity harness (development-time only).

This sandbox has no network, but PostgreSQL 15 ships the compiled Snowball
stemmer family (`dict_snowball.so` — the same published algorithms Tantivy
runs via rust-stemmers, /root/reference/src/tokenizer.rs:35-45). During
development we run a scratch postgres cluster and diff our pure-Python
re-implementations against `ts_lexize('sb_<language>', word)` over large
generated vocabularies; the golden pairs pinned in tests/test_stemmers.py
were cross-checked this way. The harness degrades to a skip when no cluster
is reachable (CI / the driver's environment), so nothing at test time
depends on postgres.

Usage:
    python scripts/snowball_oracle.py <lang> [n_words]
prints mismatching (word, ours, snowball) triples (up to 40) and a summary.
"""

from __future__ import annotations

import random
import subprocess
import sys
import unicodedata

PG_LANG = {
    "ar": "arabic", "da": "danish", "nl": "dutch", "en": "english",
    "fi": "finnish", "fr": "french", "de": "german", "el": "greek",
    "hu": "hungarian", "it": "italian", "no": "norwegian", "pt": "portuguese",
    "ro": "romanian", "ru": "russian", "es": "spanish", "sv": "swedish",
    "ta": "tamil", "tr": "turkish",
}

# per-language alphabet + common suffix fragments: random stems with
# suffix-dense tails exercise every rule branch far better than natural text
ALPHABETS = {
    "da": "abcdefghijklmnopqrstuvxyzæøå",
    "nl": "abcdefghijklmnopqrstuvwxyzé",
    "en": "abcdefghijklmnopqrstuvwxyz'",
    "fi": "abcdefghijklmnopqrstuvyäö",
    "fr": "abcdefghijklmnopqrstuvwxyzâàçëéêèïîôûù",
    "de": "abcdefghijklmnopqrstuvwxyzäöüß",
    "it": "abcdefghijklmnopqrstuvwxyzàèéìòóù",
    "no": "abcdefghijklmnopqrstuvwxyzæøå",
    "pt": "abcdefghijklmnopqrstuvwxyzáâãàçéêíóôõú",
    "ro": "abcdefghijklmnopqrstuvwxyzăâîșşțţ",
    "ru": "абвгдежзийклмнопрстуфхцчшщъыьэюяё",
    "es": "abcdefghijklmnopqrstuvwxyzáéíóúüñ",
    "sv": "abcdefghijklmnopqrstuvwxyzäöå",
    "tr": "abcçdefgğhıijklmnoöprsştuüvyz",
    "hu": "aábcdeéfghiíjklmnoóöőprstuúüűvwxyz",
    "el": "αβγδεζηθικλμνξοπρστυφχψωάέήίόύώϊϋΐΰς",
    "ar": "ءآأؤإئابةتثجحخدذرزسشصضطظعغفقكلمنهوىيًٌٍَُِّْٱ",
    "ta": "அஆஇஈஉஊஎஏஐஒஓஔகஙசஞடணதநபமயரலவழளறனஜஷஸஹ"
         "ாிீுூெேைொோௌ்",
}

SUFFIX_POOLS = {
    "tr": ["lar", "ler", "ları", "leri", "ım", "im", "um", "üm", "sın", "sin",
           "ız", "iz", "sınız", "siniz", "nız", "niz", "dır", "dir", "dur",
           "dür", "tır", "tir", "casına", "cesine", "dı", "di", "du", "dü",
           "tı", "ti", "tu", "tü", "sa", "se", "mış", "miş", "muş", "müş",
           "ken", "ydı", "ydi", "ysa", "yse", "ymış", "yken", "ca", "ce",
           "ınca", "ince", "ımız", "imiz", "ın", "in", "ınız", "iniz", "sı",
           "si", "su", "sü", "yı", "yi", "yu", "yü", "nı", "ni", "nın", "nin",
           "nun", "nün", "ya", "ye", "na", "ne", "da", "de", "ta", "te",
           "nda", "nde", "dan", "den", "tan", "ten", "ndan", "nden", "yla",
           "yle", "la", "le", "ki", "ü", "ı", "i", "u", "m", "n", "k", "yor"],
    "hu": ["ok", "ek", "ak", "nak", "nek", "val", "vel", "tól", "től", "ról",
           "ről", "ban", "ben", "ba", "be", "ra", "re", "nál", "nél", "ig",
           "at", "et", "ot", "öt", "ért", "képp", "képpen", "kor", "hoz",
           "hez", "höz", "vá", "vé", "onként", "enként", "anként", "ként",
           "en", "on", "an", "ön", "n", "t", "án", "én", "ástul", "éstül",
           "stul", "stül", "á", "é", "ó", "ő", "a", "e", "i", "ánk", "énk",
           "unk", "ünk", "uk", "ük", "juk", "jük", "ja", "je", "nk", "m",
           "om", "em", "am", "od", "ed", "ad", "öd", "d", "jaim", "jeim",
           "aim", "eim", "im", "jaid", "jeid", "aid", "eid", "id", "jai",
           "jei", "ai", "ei", "itek", "jaitok", "jeitek", "aitok", "eitek",
           "jaik", "jeik", "aik", "eik", "ik", "k"],
    "el": ["ς", "εσ", "ες", "ων", "ου", "α", "ο", "ε", "η", "ι", "ιο", "ια",
           "ιου", "ιων", "ικος", "ικη", "ικο", "ικα", "ικων", "με", "σαι",
           "ται", "ομαστε", "εστε", "ονται", "ομουν", "οσουν", "οταν",
           "ουμε", "ετε", "ουν", "αμε", "ατε", "αν", "ηκα", "ηκες", "ηκε",
           "θηκα", "θηκες", "θηκε", "μενος", "μενη", "μενο", "οντας",
           "ωντας", "ισμα", "ισματα", "ιζω", "ιζεις", "ισω", "εια", "ειο",
           "τερος", "τερη", "τατο", "τατος", "ακι", "ακια", "ιτσα", "ιτσες",
           "αγα", "αγες", "αγε", "ησα", "ησες", "ησε", "ουσα", "ουσες"],
    "ar": ["ال", "وال", "بال", "كال", "فال", "لل", "و", "ف", "ب", "ك", "ل",
           "ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي", "نا",
           "كم", "هم", "هن", "كن", "ا", "وا", "ما", "تما", "تم", "تن", "ت",
           "ن", "سي", "ست", "سن", "سا", "لت", "لن", "لي"],
    "ta": ["கள்", "ங்கள்", "ர்கள்", "உம்", "ும்", "ா", "ே", "ோ", "ஆ", "ஏ", "ஓ",
           "இல்", "இன்", "ை", "ொடு", "ோடு", "ிடம்", "ால்", "ுடன்", "ாமல்",
           "க்கு", "ிலிருந்து", "வும்", "யும்", "ிருந்து", "ிருக்கின்ற",
           "ிருந்த", "கின்ற", "கிற", "ப்பட்ட", "ப்படுகிற", "வை", "ேன்",
           "ான்", "ாள்", "ார்", "ோம்", "ீர்", "து", "ந்த", "ட்ட", "ிய"],
}


def pg_stem(lang: str, words: list[str]) -> list[str]:
    """Batch-stem through the postgres snowball oracle; order-preserving."""
    payload = "\n".join(words) + "\n"
    with open("/tmp/pg/words.txt", "w", encoding="utf-8") as f:
        f.write(payload)
    sql = (
        "SET client_encoding TO 'UTF8';"
        "CREATE TEMP TABLE w(i serial, word text);"
        "\\copy w(word) from '/tmp/pg/words.txt'\n"
        f"\\copy (SELECT coalesce((ts_lexize('sb_{PG_LANG[lang]}', word))[1], '') FROM w ORDER BY i) to '/tmp/pg/stems.txt'\n"
    )
    with open("/tmp/pg/cmd.sql", "w", encoding="utf-8") as f:
        f.write(sql)
    r = subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c",
         "cd /tmp && psql -h /tmp/pg -d oracle -q -f /tmp/pg/cmd.sql"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(f"psql failed: {r.stderr[-500:]}")
    with open("/tmp/pg/stems.txt", encoding="utf-8") as f:
        out = f.read().splitlines()
    if len(out) != len(words):
        raise RuntimeError(f"row count mismatch {len(out)} vs {len(words)}")
    return out


def gen_vocab(lang: str, n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    alpha = ALPHABETS[lang]
    pool = SUFFIX_POOLS.get(lang, [])
    out = []
    for _ in range(n):
        stem_len = rng.randint(1, 9)
        w = "".join(rng.choice(alpha) for _ in range(stem_len))
        for _ in range(rng.randint(0, 3)):
            if pool and rng.random() < 0.85:
                w += rng.choice(pool)
            else:
                w += "".join(rng.choice(alpha) for _ in range(rng.randint(1, 3)))
        w = unicodedata.normalize("NFC", w)
        if w:
            out.append(w)
    return sorted(set(out))


def main():
    lang = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    from tantiny_spark.analysis.tokenizers import _STEMMERS

    ours_fn = _STEMMERS[lang]
    vocab = gen_vocab(lang, n)
    oracle = pg_stem(lang, vocab)
    bad = [(w, ours_fn(w), o) for w, o in zip(vocab, oracle) if ours_fn(w) != o]
    print(f"{lang}: {len(bad)}/{len(vocab)} mismatches")
    for w, mine, ora in bad[:40]:
        print(f"  {w!r}: ours={mine!r} snowball={ora!r}")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
