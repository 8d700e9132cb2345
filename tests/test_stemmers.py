"""Golden tests for the Snowball stemmer family.

Each implementation re-derives the published Snowball algorithm
(snowballstem.org) — the same algorithms Tantivy runs via rust-stemmers
(/root/reference/src/tokenizer.rs:35-45, language table at
/root/reference/src/helpers.rs:18-40). Goldens are hand-traced through the
published specs (no stemmer package exists in this container to copy from);
sample-vocabulary pairs are used where known.
"""

from __future__ import annotations

import pytest

from tantiny_spark.analysis import tokenizers
from tantiny_spark.analysis import (
    snowball_da, snowball_de, snowball_es, snowball_fi, snowball_fr,
    snowball_it, snowball_nl, snowball_no, snowball_pt, snowball_ro,
    snowball_sv,
)

GOLDENS = {
    "da": {
        "indtagelse": "indtag",
        "underretninger": "underretning",
        "klatrede": "klatred",
        "bestemmelse": "bestem",  # -e, -els, undouble mm
        "afgørelse": "afgør",
        "kommunikation": "kommunikation",
        "klogeste": "klogest",
        "hundene": "hund",
        "venlig": "ven",
        "venligst": "ven",
        "billigst": "bil",  # igst → ig → lig removal, undouble ll
    },
    "no": {
        "billettene": "billett",
        "naturlig": "natur",
        "hemmelighetene": "hemm",  # hetene, then step-3 elig
        "landet": "land",
        "gudene": "gud",
        "bakkene": "bakk",
        "returnerte": "returner",  # erte → er
    },
    "sv": {
        "jaktkarlarne": "jaktkarl",
        "klokaste": "klok",
        "flickorna": "flick",
        "bohuslän": "bohuslän",
        "sprickorna": "sprick",
        "trovärdighet": "trovärd",  # het, then step-3 ig
        "stadens": "stad",
        "verkligheten": "verk",  # heten, then step-3 lig
    },
    "de": {
        "aufeinander": "aufeinand",
        "häuser": "haus",
        "kategorien": "kategori",
        "aufgabe": "aufgab",
        "ängstlichkeit": "angstlich",
        "verhältnisse": "verhaltnis",  # group-(b) en + niss → single s
        "freundliches": "freundlich",
        "wunderbaren": "wunderbar",
        "arbeitende": "arbeit",
        "schönheit": "schonheit",
        "bedeutungen": "bedeut",
        "abenteuerlichen": "abenteu",  # lich in R2, then er in R1
    },
    "es": {
        "caminando": "camin",
        "canciones": "cancion",
        "trabajando": "trabaj",
        "fácilmente": "facil",
        "niñas": "niñ",
        "corriendo": "corr",
        "comiéndolo": "com",  # attached pronoun + accent fold
        "importancia": "import",
        "nacionalidad": "nacional",
        "felicidades": "felic",
        "lógica": "logic",
        "rápidamente": "rapid",
        "tecnología": "tecnolog",
        "comunicación": "comun",
        "torniquete": "torniquet",
    },
    "pt": {
        "quilométricas": "quilométr",  # pt keeps accents
        "brasileiro": "brasileir",
        "aprendendo": "aprend",
        "cantando": "cant",
        "lindamente": "lind",
        "felicidade": "felic",
        "nacionalidade": "nacional",
        "comunicação": "comunic",
        "tecnologia": "tecnolog",
        "meninas": "menin",
        "grandes": "grand",
    },
    "it": {
        "abbandonata": "abbandon",
        "abbandonerà": "abbandon",
        "pronunciare": "pronunc",
        "cantando": "cant",
        "portarci": "port",  # attached pronoun, ar → are, then verb suffix
        "nazionalità": "nazional",
        "comunicazione": "comun",
        "tecnologia": "tecnolog",
        "ragazzo": "ragazz",
        "ragazzi": "ragazz",
        "mangiato": "mang",
        "lentamente": "lent",
        "meraviglioso": "meravigl",
        "banchi": "banc",  # ch → c after vowel removal
    },
    "fr": {
        "continuellement": "continuel",  # ement + un_double ell
        "majestueusement": "majestu",
        "amoureusement": "amour",
        "donnerait": "don",  # verb suffix + un_double onn
        "communication": "commun",  # ation, then ic in R2
        "nationalité": "national",
        "traditionnellement": "traditionnel",
        "chevaux": "cheval",  # aux → al
        "châteaux": "château",  # eaux → eau
        "finissions": "fin",
        "heureuse": "heureux",  # euse → eux in R1
        "logiquement": "logiqu",
        "protégé": "proteg",  # un_accent
        "mangeait": "mang",
    },
    "fi": {
        "taloissa": "talo",
        "talossa": "talo",
        "taloja": "talo",
        "kaupungissa": "kaupung",
        "kaupunki": "kaupunk",  # step-6(b) cX tidy
        "kirjansa": "kirj",  # nsa possessive, then step-6(b)
        "edellytyksillä": "edellytyks",
        "suurimman": "suurim",  # n case, step-6(b), undouble mm
        "puun": "puun",  # R1 empty: untouched
    },
    "ro": {
        "abilitate": "abil",
        "contabilitate": "contabil",
        "românii": "român",
        "copilului": "copil",
        "lucrează": "lucr",
        "mergeau": "merg",
        "orașul": "oraș",  # comma-below passes through untouched (the
        # algorithm's cedilla suffix tables simply don't see ș/ț — matching
        # the compiled Snowball behind the reference engine, which predates
        # Snowball 3.0's cedilla folding)
        "activitate": "activ",  # step-1 ivitate → iv
        "cartea": "cart",  # ea → e, then step-4 final vowel
        "frumoasă": "frumoas",
    },
    "nl": {
        "lichamelijk": "licham",
        "lichamelijke": "licham",
        "opening": "open",
        "ogenblikkelijke": "ogenblik",  # undouble kk
        "bedden": "bed",
        "boeken": "boek",
        "appels": "appel",
        "politieagenten": "politieagent",
        "mogelijkheden": "mogelijk",  # heden → heid, then heid deleted
        "vriendelijkheid": "vriendelijk",
        "kleurigere": "kleuriger",
    },
}

_MODULES = {
    "da": snowball_da, "no": snowball_no, "sv": snowball_sv,
    "de": snowball_de, "es": snowball_es, "pt": snowball_pt,
    "it": snowball_it, "fr": snowball_fr, "nl": snowball_nl,
    "fi": snowball_fi, "ro": snowball_ro,
}


@pytest.mark.parametrize("lang", sorted(GOLDENS))
def test_goldens(lang):
    mod = _MODULES[lang]
    for word, expected in GOLDENS[lang].items():
        assert mod.stem(word) == expected, f"{lang}: {word}"


@pytest.mark.parametrize("lang", sorted(_MODULES))
def test_short_words_unchanged_modulo_folding(lang):
    # words of length ≤ 2 never lose letters (only character folding applies)
    for w in ("a", "de", "is", "zo"):
        out = _MODULES[lang].stem(w)
        assert len(out) == len(w)


@pytest.mark.parametrize("lang", sorted(_MODULES))
def test_stemmer_never_crashes_on_edge_inputs(lang):
    for w in ("", "x", "éé", "aaaa", "ssss", "y" * 50, "qu'", "123", "ß"):
        _MODULES[lang].stem(w)  # must not raise


def test_tokenizer_registry_routes_all_implemented_languages():
    text = "Nationalität"
    tok = tokenizers.Tokenizer.new("stemmer", language="de")
    assert tok.terms(text) == ["nationalitat"]
    for lang in ("da", "no", "sv", "de", "es", "pt", "it", "fr", "nl", "fi",
                 "ro", "en", "ru", "hu", "tr", "el", "ta", "ar"):
        tokenizers.Tokenizer.new("stemmer", language=lang).terms("test")


def test_all_reference_languages_implemented():
    for lang in tokenizers.SUPPORTED_LANGUAGES:
        tok = tokenizers.Tokenizer.new("stemmer", language=lang)
        tok.terms("test")


def test_arabic_goldens():
    """Hand-checked Arabic pairs — cross-verified against the compiled
    Snowball oracle (articles, pronouns, verb affixes, hamza folding)."""
    from tantiny_spark.analysis import snowball_ar

    for word, expected in {
        "الكتاب": "كتاب",       # definite article
        "بالكتاب": "كتاب",      # b+article
        "يكتبون": "يكتب",       # verb plural
        "مدرسة": "مدرس",        # ta marbuta
        "قالوا": "قال",          # verb -uu
        "فقال": "قال",           # conjunction f-
        "سيكتب": "يكتب",        # future s-
        "يستكتبون": "استكتب",   # yst -> ast
        "مستشفى": "مستشفي",     # alef maqsura
        "سؤال": "سوال",          # hamza carrier folding
        "قرأ": "قرء",            # final hamza
    }.items():
        assert snowball_ar.stem(word) == expected, word


def test_tamil_goldens():
    """Hand-checked Tamil pairs — cross-verified against the compiled
    Snowball oracle (plural/case/tense suffix chains, fix_endings)."""
    from tantiny_spark.analysis import snowball_ta

    for word, expected in {
        "புத்தகங்கள்": "புத்தகம்",   # plural -kal, ng->m fix
        "மரங்களில்": "மரங்",        # case -il, then plural
        "அவர்கள்": "அவர்",          # plural after -r
        "படித்தான்": "படி",          # tense -aan + fix
        "மக்களுக்கு": "மக்கள்",      # dative -ukku
        "பேசுகிறேன்": "பேசு",        # present participle chain
    }.items():
        assert snowball_ta.stem(word) == expected, word


def test_stemming_is_deterministic_and_pure():
    for lang, mod in _MODULES.items():
        for w in GOLDENS.get(lang, {}):
            assert mod.stem(w) == mod.stem(w)


def test_oracle_goldens():
    """3,900 (word, stem) pairs per-language, generated once against the
    compiled Snowball oracle (PostgreSQL dict_snowball — the same published
    algorithms rust-stemmers compiles for Tantivy) and pinned as fixture
    data. See scripts/snowball_oracle.py for the generation harness; every
    implemented language was verified byte-exact on 50k+ random
    suffix-dense words before pinning."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "snowball_goldens.json")
    with open(path, encoding="utf-8") as f:
        goldens = json.load(f)
    for lang, pairs in goldens.items():
        fn = tokenizers._STEMMERS[lang]
        bad = [(w, fn(w), s) for w, s in pairs.items() if fn(w) != s]
        assert not bad, f"{lang}: {bad[:5]}"


def test_turkish_goldens():
    """Hand-checked Turkish pairs (suffix chains, vowel harmony, devoicing,
    reserved words) — cross-verified against the compiled Snowball oracle."""
    from tantiny_spark.analysis import snowball_tr

    for word, expected in {
        "kitapları": "kitap",
        "evimden": "ev",
        "arabalarında": "araba",
        "gözlerimde": "göz",
        "çocuklarımmış": "çocuk",
        "okuldaki": "okul",
        "okuldakiler": "okuldaki",  # verb -lAr stops noun stemming
        "güneşin": "güneş",
        "evlerinizden": "ev",
        "arabayla": "araba",
        "kitabı": "kitap",  # final devoicing b → p
        "ağaçtan": "ağaç",
        "evdekilerin": "ev",
        "geliyormuş": "geliyor",
        "adım": "ad",  # reserved word: no harmonic vowel appended
        "tek": "tek",  # single syllable: untouched
    }.items():
        assert snowball_tr.stem(word) == expected, word


def test_hungarian_goldens():
    """Hand-checked Hungarian pairs — cross-verified against the compiled
    Snowball oracle."""
    from tantiny_spark.analysis import snowball_hu

    for word, expected in {
        "babakocsik": "babakocs",
        "házzal": "ház",  # instrumental assimilation + undouble
        "vízzel": "víz",
        "fákkal": "fák",
        "babától": "bab",  # case + v_ending + owner 'a'
        "gyerekkel": "gyer",
        "kővé": "kő",
        "babánként": "bab",
    }.items():
        assert snowball_hu.stem(word) == expected, word


def test_greek_goldens():
    """Hand-checked Greek pairs (accent folding, irregulars, verb suffix
    restores) — cross-verified against the compiled Snowball oracle."""
    from tantiny_spark.analysis import snowball_el

    for word, expected in {
        "υπολογιστές": "υπολογ",
        "ΥΠΟΛΟΓΙΣΤΕΣ": "υπολογ",  # uppercase input folds
        "παιδιού": "παιδ",
        "τραγούδια": "τραγουδ",
        "άνθρωπος": "ανθρωπ",
        "ανθρώπους": "ανθρωπ",
        "θάλασσες": "θαλασσ",
        "καθεστωτος": "καθεστ",  # irregular (step 1)
        "γεγονοτων": "γεγον",
        "δανειζεις": "δανει",  # S1 exception restores ι
        "γεμιζεις": "γεμ",
        "ας": "ασ",  # short word: only character folding
    }.items():
        assert snowball_el.stem(word) == expected, word
