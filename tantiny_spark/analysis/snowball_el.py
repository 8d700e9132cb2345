"""Snowball Greek stemmer, pure Python.

Re-implements the published Snowball Greek algorithm
(https://snowballstem.org/algorithms/greek/stemmer.html — Ntais' algorithm
with Saroukos' extensions), the algorithm behind Tantivy's
``Stemmer::new(Language::Greek)`` via rust-stemmers (reference language
table: /root/reference/src/helpers.rs:18-40). Suffix and exception tables
are taken verbatim from the compiled Snowball among tables and the
implementation is verified byte-exact against the compiled oracle
(scripts/snowball_oracle.py / snowball_native.py).

Structure: a lowercasing/de-accenting prelude, an irregular-word step, ten
verb-suffix steps S1-S10 (delete + conditional restore of a shorter ending
when the remaining stem is a known exception), noun/adjective steps 2a-2d,
3-4, participle steps 5a-5m, the big ending sweep (step 6, gated on no
earlier step having fired), and the comparative/superlative step 7.
"""

from __future__ import annotations

VOWELS = set("αεηιουω")

# tolower + de-accent + final-sigma folding (quirk preserved from the
# compiled table: lowercase accented iota with diaeresis maps to eta)
_NORM = str.maketrans({
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ", "ώ": "ω",
    "ϊ": "η", "ΐ": "η", "ϋ": "υ", "ΰ": "υ", "ς": "σ",
    "Α": "α", "Β": "β", "Γ": "γ", "Δ": "δ", "Ε": "ε", "Ζ": "ζ", "Η": "η",
    "Θ": "θ", "Ι": "ι", "Κ": "κ", "Λ": "λ", "Μ": "μ", "Ν": "ν", "Ξ": "ξ",
    "Ο": "ο", "Π": "π", "Ρ": "ρ", "Σ": "σ", "Τ": "τ", "Υ": "υ", "Φ": "φ",
    "Χ": "χ", "Ψ": "ψ", "Ω": "ω",
    "Ά": "α", "Έ": "ε", "Ή": "η", "Ί": "ι", "Ό": "ο", "Ύ": "υ", "Ώ": "ω",
    "Ϊ": "ι", "Ϋ": "υ",
})


def _suf(word, table):
    for s in table:
        if word.endswith(s):
            return s
    return None


def _eq(word, table):
    return word in table


def _ends(word, table):
    return any(word.endswith(s) for s in table)


# --- tables (extracted from the compiled among data) -------------------------
EXC1 = {}
for _rep, _words in [
    ('φα', ('φαγιου', 'φαγιων', 'φαγια')),
    ('σκα', ('σκαγιου', 'σκαγιων', 'σκαγια')),
    ('ολο', ('ολογιου', 'ολογιων', 'ολογια')),
    ('σο', ('σογιου', 'σογιων', 'σογια')),
    ('τατο', ('τατογιου', 'τατογιων', 'τατογια')),
    ('κρε', ('κρεατοσ', 'κρεατων', 'κρεατα', 'κρεασ')),
    ('περ', ('περατοσ', 'περατων', 'περατα', 'περατη', 'περασ')),
    ('τερ', ('τερατοσ', 'τερατων', 'τερατα', 'τερασ')),
    ('φω', ('φωτοσ', 'φωτων', 'φωτα', 'φωσ')),
    ('καθεστ', ('καθεστωτοσ', 'καθεστωτων', 'καθεστωτα', 'καθεστωσ')),
    ('γεγον', ('γεγονοτοσ', 'γεγονοτων', 'γεγονοτα', 'γεγονοσ')),
]:
    for _w in _words:
        EXC1[_w] = _rep
EXC1_KEYS = tuple(sorted(EXC1, key=len, reverse=True))

S1_SUF = ('ιζουμε', 'ιζουνε', 'ιζαμε', 'ιζανε', 'ιζατε', 'ιζεισ', 'ιζετε', 'ιζουν', 'ιζαν', 'ιζει', 'ιζεσ', 'ιζα', 'ιζε', 'ιζω')
S1_I = ('συναθρο', 'αναμπα', 'ξαναπα', 'περιπα', 'αθρο', 'δανε', 'εμπα', 'επα', 'πα')
S1_IZ = ('πιπερορ', 'βαθυρι', 'βολβορ', 'γλυκορ', 'γλυκυρ', 'αμπαρ', 'πολυρ', 'βαρκ', 'κορν', 'μαρκ', 'αρρ', 'γκρ', 'ιμπ', 'λου', 'μαρ', 'μπρ', 'πρ', 'β', 'λ', 'μ', 'π', 'ρ')
S2_SUF = ('ωθηκαμε', 'ωθηκανε', 'ωθηκατε', 'ωθηκαν', 'ωθηκεσ', 'ωθηκα', 'ωθηκε')
S2_EXC = ('αλ', 'βι', 'εν', 'ζω', 'λι', 'υψ', 'σ', 'χ')
S3_SUF = ('ισαμε', 'ισανε', 'ισατε', 'ισαν', 'ισεσ', 'ισα', 'ισε')
S3_I = ('συναθρο', 'χαρτοπα', 'αναμπα', 'απεκλε', 'αποκλε', 'εξαρχα', 'εσωκλε', 'μετεπε', 'ξαναπα', 'περιπα', 'αθρο', 'δανε', 'εκλε', 'εμπα', 'επα', 'επε', 'εσε', 'κλε', 'πε')
S3_IS = ('γιγαντοαφ', 'δημοκρατ', 'πουκαμ', 'γκε', 'κομ', 'λαρ', 'ολο', 'αν', 'αφ', 'γε', 'γκ', 'μ', 'π')
S4_SUF = ('ισουμε', 'ισουνε', 'ισεισ', 'ισετε', 'ισουν', 'ισει', 'ισω')
S4_EXC = ('συναθρο', 'χαρτοπα', 'αναμπα', 'απεκλε', 'αποκλε', 'εξαρχα', 'εσωκλε', 'μετεπε', 'ξαναπα', 'περιπα', 'αθρο', 'δανε', 'εκλε', 'εμπα', 'επα', 'επε', 'εσε', 'κλε', 'πε')
S5_SUF = ('ιστουσ', 'ιστεσ', 'ιστησ', 'ιστοι', 'ιστοσ', 'ιστου', 'ιστων', 'ιστα', 'ιστε', 'ιστη', 'ιστο')
S5_I = ('συναθρο', 'εσωκλε', 'δανε', 'ασε', 'κλε', 'πλε', 'σε')
S5_IST = ('ακτ', 'αορ', 'ασχ', 'ατα', 'αχν', 'αχτ', 'γεμ', 'γυρ', 'εμπ', 'ευπ', 'εχθ', 'ηφα', 'καθ', 'κακ', 'κυλ', 'λυγ', 'μακ', 'μεγ', 'ταχ', 'φιλ', 'χωρ', 'απ', 'αρ', 'ηδ', 'κτ', 'σκ', 'σχ', 'υψ', 'φα', 'χρ', 'χτ', 'μ', 'π')
S6_SUF = ('ισμουσ', 'ισμοι', 'ισμοσ', 'ισμου', 'ισμων', 'ισμο')
S6_ISM = ('αντιδανε', 'μικροσε', 'αποκλε', 'μετασε', 'εγκλε', 'δανε', 'σε')
S6_IK = ('αλεξανδριν', 'αγνωστικ', 'βυζαντιν', 'εκλεκτικ', 'γνωστικ', 'θεατριν', 'σκεπτικ', 'ατομικ', 'εθνικ', 'τοπικ')
S7_SUF = ('ουδακια', 'αρακια', 'ουδακι', 'αρακι')
S7_EXC = ('σ', 'χ')
S8_SUF = ('αρακια', 'αρακι', 'ιτσασ', 'ιτσεσ', 'ιτσων', 'ακια', 'ιτσα', 'ακι')
S8_AK = ('τσεχοσλοβ', 'κατραπ', 'ναγκασ', 'αλισφ', 'καπακ', 'μουστ', 'αμβρ', 'ανθρ', 'βαμβ', 'καιμ', 'κλιμ', 'λαβρ', 'λουλ', 'σλοβ', 'σπαν', 'φαρμ', 'κον', 'κορ', 'μαλ', 'μερ', 'σοκ', 'φυλ', 'βρ', 'πλ', 'ρυ', 'σκ', 'σφ', 'τζ', 'κ', 'ρ', 'σ', 'φ', 'χ')
S8_ITS = ('ηγουμεν', 'μακρυν', 'τριπολ', 'πατερ', 'γιαν', 'καρδ', 'βαλ', 'νυφ', 'τοσ', 'γλ', 'β', 'ζ', 'π')
S9_SUF = ('ιδιων', 'ιδια', 'ιδιο')
S9_EXC = ('αιφν', 'ολο', 'ψαλ', 'ιρ')
S10_SUF = ('ισκοσ', 'ισκου', 'ισκε', 'ισκο')
S10_EXC = ('φραγκ', 'οβελ', 'λυκ', 'μην', 'ιβ', 'δ', 'ρ')
ST2A_SUF = ('αδεσ', 'αδων')
ST2A_NOT = ('γιαγι', 'μπαμπ', 'νταντ', 'πατερ', 'πεθερ', 'θει', 'κυρ', 'μαμ', 'μαν', 'οκ')
ST2B_SUF = ('εδεσ', 'εδων')
ST2B_EXC = ('κρασπ', 'γηπ', 'δαπ', 'εμπ', 'μιλ', 'ιπ', 'οπ', 'υπ')
ST2C_SUF = ('ουδεσ', 'ουδων')
ST2C_EXC = ('καλιακ', 'πεταλ', 'λουλ', 'πλεξ', 'τραγ', 'αρκ', 'βελ', 'λιχ', 'σκ', 'σπ', 'φε', 'φλ', 'φρ', 'χν', 'σ')
ST2D_SUF = ('εων', 'εωσ')
ST2D_EXC = ('γαλ', 'παρ', 'ελ', 'ιδ', 'δ', 'θ', 'ν', 'π')
ST3_SUF = ('ιου', 'ιων', 'ια')
ST4_SUF = ('ικου', 'ικων', 'ικα', 'ικο')
ST4_EXC = ('αμμοχαλ', 'μπαγιατ', 'ποστελν', 'συνομηλ', 'καλλιν', 'πικαντ', 'πλιατσ', 'πρωτοδ', 'αντιδ', 'καταδ', 'συναδ', 'φιλον', 'φυλοδ', 'αμαν', 'ανηθ', 'βρωμ', 'εξωδ', 'καλπ', 'μουλ', 'μπαν', 'μπολ', 'μποσ', 'πετσ', 'πιτσ', 'σερτ', 'τσαμ', 'υποδ', 'γερ', 'ενδ', 'νιτ', 'ξικ', 'φυσ', 'χασ', 'αδ', 'αλ', 'ηθ')
ST5A_LONG = ('ηθηκαμε', 'ουσαμε', 'αγαμε', 'ηκαμε', 'ησαμε')
ST5A_EXC = ('αποστ', 'αναπ', 'αποθ', 'αποκ', 'βουβ', 'πικρ', 'ξεθ', 'ουλ', 'πεθ', 'ποτ', 'σιχ', 'χ')
ST5B_LONG = ('ιουντανε', 'ηθηκανε', 'ιοντανε', 'ουντανε', 'ιοτανε', 'οντανε', 'ουσανε', 'αγανε', 'ηκανε', 'ησανε', 'οτανε')
ST5B_TRTS = ('τρ', 'τσ')
ST5B_EXC = ('καπνοβιομηχ', 'μεγλοβιομηχ', 'μικροβιομηχ', 'χαμηλοδαπ', 'αμερικαν', 'μουσουλμ', 'ξηροκλιβ', 'ολιγοδαμ', 'σαρακατσ', 'φωτοστεφ', 'βαθυγαλ', 'δραδουμ', 'καλπουζ', 'καταγαλ', 'κοιλαρφ', 'πενταρφ', 'πολυδαπ', 'πολυμηχ', 'τσαρλατ', 'ψηλοταβ', 'ατσιγγ', 'βιομηχ', 'βραχυκ', 'καστελ', 'κορμορ', 'λουθηρ', 'μωαμεθ', 'ολογαλ', 'περιτρ', 'πορτολ', 'πουριτ', 'υπερηφ', 'υποκοπ', 'ψυχοπλ', 'αθιγγ', 'ανοργ', 'βετερ', 'βουλκ', 'βραχμ', 'ενοργ', 'λαοπλ', 'μαιντ', 'πελεκ', 'περηφ', 'πολισ', 'σουλτ', 'τσιγγ', 'αδαπ', 'αμηχ', 'ανικ', 'απηγ', 'απιθ', 'βασκ', 'διατ', 'διαφ', 'διπλ', 'ζωντ', 'καστ', 'κλιβ', 'νταβ', 'πλατ', 'στεγ', 'στεφ', 'τραγ', 'τσαγ', 'τσοπ', 'βασ', 'γαλ', 'γερ', 'δεκ', 'θυσ', 'κοπ', 'λιβ', 'λιχ', 'μελ', 'ορφ', 'ουλ', 'ουρ', 'πιθ', 'σιγ', 'ταβ', 'τετ', 'αγ', 'ερ', 'ικ', 'πλ', 'σπ', 'γ', 'θ', 'μ', 'ν', 'π', 'σ', 'φ', 'χ')
ST5C_ENDS = ('υπερθ', 'διαθ', 'συνδ', 'συνθ', 'ωφελ', 'αιν', 'αιρ', 'αρκ', 'βαρ', 'βολ', 'εκθ', 'ενδ', 'ενθ', 'ευθ', 'ευρ', 'καθ', 'νετ', 'πον', 'πυρ', 'ραθ', 'ροθ', 'ρον', 'συν', 'ταθ', 'τιθ', 'φορ', 'χωρ', 'βρ', 'οδ', 'σθ', 'σχ')
ST5C_EXC = ('παρακαλ', 'βαρον', 'αβαρ', 'εναρ', 'θαρρ', 'μπορ', 'σερπ', 'σκελ', 'συρφ', 'αβρ', 'απλ', 'βεν', 'κοπ', 'νιφ', 'ντρ', 'παγ', 'τοκ', 'αδ', 'αθ', 'αν', 'εμ', 'σκ', 'δ', 'θ', 'υ')
ST5D_SUF = ('οντασ', 'ωντασ')
ST5F_IEST = ('αμεταμφ', 'ακαταπ', 'ασυμπ', 'συμπ', 'απ', 'π')
ST5G_EQ = ('παρακαταθ', 'προσθ', 'διαθ', 'συνθ', 'θ')
ST5G_LONG = ('ηθηκεσ', 'ηθηκα', 'ηθηκε')
ST5G_SUF = ('ηκεσ', 'ηκα', 'ηκε')
ST5G_ENDS = ('σκουλ', 'ναρθ', 'σκωλ', 'πιθ', 'οθ', 'σφ')
ST5F_EST = ('παρακαλ', 'εκτελ', 'νισ', 'προ', 'αλ', 'αρ', 'ζ', 'μ', 'ξ')
ST5H_SUF = ('ουσεσ', 'ουσα', 'ουσε')
ST5H_ENDS = ('μαντιλ', 'πανταχ', 'κυματ', 'ποδαρ', 'βλεπ', 'μαλλ', 'πρωτ', 'φρυδ', 'λαχ', 'ληγ', 'φαγ', 'ομ')
ST5H_EXC = ('δευτερευ', 'ενδιαφερ', 'καθαρευ', 'υποτειν', 'δεσποζ', 'λαμπιδ', 'φαρμακ', 'αναρρ', 'εκλιπ', 'μεσαζ', 'ανηκ', 'βρομ', 'αγκ', 'αιθ', 'λεχ', 'μεδ', 'πατ', 'πλε', 'τσα', 'χαδ', 'αμ', 'δε', 'λ', 'μ', 'ρ')
ST5I_SUF = ('αγεσ', 'αγα', 'αγε')
ST5I_EXC = ('κροκαλοπ', 'προσωποπ', 'σιδηροπ', 'αιμοστ', 'αμαλλι', 'δερβεν', 'δροσοπ', 'αβαστ', 'ανυστ', 'αρτιπ', 'ασπαρ', 'νομοτ', 'ουλαμ', 'πολυφ', 'προστ', 'αδηφ', 'αειπ', 'αμαλ', 'ανυπ', 'απερ', 'αποτ', 'αχαρ', 'διατ', 'επιτ', 'νεοπ', 'ολοπ', 'ομοτ', 'παμφ', 'συμπ', 'συντ', 'υποτ', 'ασπ', 'ναυ', 'ξεφ', 'ουρ', 'χαρ', 'αφ', 'εν', 'τρ', 'λ', 'μ', 'π', 'ρ', 'τ')
ST5I_NOT = ('στραβομουτσ', 'κακομουτσ', 'εξων', 'σπι', 'ν', 'ρ')
ST5I_ENDS = ('χορτ', 'σμην', 'λοχ', 'πελ', 'ρπ', 'πρ', 'φρ', 'σφ', 'οφ', 'λλ')
ST5I_BLOCK = ('ναυλοχ', 'ψοφ')
ST5J_SUF = ('ησου', 'ησα', 'ησε')
ST5J_EXC = ('δωδεκαν', 'μεγαλον', 'ερημον', 'χερσον', 'επταν', 'ν')
ST5K_EXC = ('κοινοχρ', 'παλιμψ', 'αειμν', 'δυσχρ', 'ευχρ', 'απλ', 'ασβ', 'αχρ', 'σβ', 'χρ')
ST5L_SUF = ('ηθουνε', 'ησουνε', 'ουνε')
ST5L_EXC = ('στραβομουτσ', 'κακομουτσ', 'εξων', 'σπι', 'ν', 'ρ')
ST5M_SUF = ('ηθουμε', 'ησουμε', 'ουμε')
ST5M_EXC = ('αλλοσουσ', 'παρασουσ', 'ωριοπλ', 'ασουσ', 'αζ', 'φ', 'χ')
ST6_MA = ('ματοσ', 'ματων', 'ματα')
ST6_SUF = ('ιοντουσαν', 'ιομασταν', 'ιοσασταν', 'ιουμαστε', 'οντουσαν', 'ηθηκατε', 'ιεμαστε', 'ιεσαστε', 'ιομουνα', 'ιοσαστε', 'ιοσουνα', 'ιουνται', 'ιουνταν', 'ομασταν', 'οσασταν', 'ουμαστε', 'ηθειτε', 'ηθηκαν', 'ιομουν', 'ιονταν', 'ιοσουν', 'ομουνα', 'οσαστε', 'οσουνα', 'ουνται', 'ουνταν', 'ουσατε', 'αγατε', 'ηθεισ', 'ηθουν', 'ηκατε', 'ησατε', 'ησουν', 'ιεμαι', 'ιεσαι', 'ιεται', 'ιοταν', 'ιουμα', 'ομουν', 'ονται', 'ονταν', 'οσουν', 'ουμαι', 'ουσαν', 'αγαν', 'αμαι', 'ασαι', 'αται', 'ειτε', 'εσαι', 'εται', 'ηδεσ', 'ηδων', 'ηθει', 'ηκαν', 'ησαν', 'ησει', 'ησεσ', 'ομαι', 'οταν', 'αει', 'εισ', 'ηθω', 'ησω', 'ουν', 'ουσ', 'αν', 'ασ', 'αω', 'ει', 'εσ', 'ησ', 'οι', 'οσ', 'ου', 'υσ', 'ων', 'α', 'ε', 'η', 'ι', 'ο', 'υ', 'ω')
ST7_SUF = ('εστατ', 'εστερ', 'οτατ', 'οτερ', 'υτατ', 'υτερ', 'ωτατ', 'ωτερ')


def stem(word: str) -> str:
    word = word.translate(_NORM)
    if len(word) < 3:
        return word
    test1 = True

    # --- step 1: irregular nouns -------------------------------------------
    for s in EXC1_KEYS:
        if word.endswith(s):
            word = word[: -len(s)] + EXC1[s]
            test1 = False
            break

    # --- verb steps S1-S10: delete, then restore a short ending when the
    # remaining stem is a known exception (equality match) ------------------
    s = _suf(word, S1_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S1_I):
            word += "ι"
        elif _eq(word, S1_IZ):
            word += "ιζ"
    s = _suf(word, S2_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S2_EXC):
            word += "ων"
    s = _suf(word, S3_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S3_I):
            word += "ι"
        elif _eq(word, S3_IS):
            word += "ισ"
    s = _suf(word, S4_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S4_EXC):
            word += "ι"
    s = _suf(word, S5_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S5_I):
            word += "ι"
        elif _eq(word, S5_IST):
            word += "ιστ"
    s = _suf(word, S6_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S6_ISM):
            word += "ισμ"
        else:
            e = _suf(word, S6_IK)
            if e:
                word = word[:-2]  # strip the trailing ικ/ιν of the exception
    s = _suf(word, S7_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S7_EXC):
            word += "αρακ"
    s = _suf(word, S8_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S8_AK):
            word += "ακ"
        elif _eq(word, S8_ITS):
            word += "ιτσ"
        elif word.endswith("κορ"):
            word += "ιτσ"
    s = _suf(word, S9_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        # equality exceptions PLUS an ends-with pair (ε / παιχν) — the
        # compiled object carries a second among ['ε','παιχν'] for this
        # rule: 'φειδιο' → 'φειδ', 'ξπαιχνιδια' → 'ξπαιχνιδ', while
        # 'κολοιδιο' (ends-with ολο but not equal) stays 'κολο'
        if _eq(word, S9_EXC) or _ends(word, ("ε", "παιχν")):
            word += "ιδ"
    s = _suf(word, S10_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, S10_EXC):
            word += "ισκ"

    # --- noun steps 2a-2d ---------------------------------------------------
    s = _suf(word, ST2A_SUF)
    if s:
        word = word[: -len(s)]
        if not _ends(word, ST2A_NOT):
            word += "αδ"
    s = _suf(word, ST2B_SUF)
    if s:
        word = word[: -len(s)]
        if _ends(word, ST2B_EXC):
            word += "εδ"
    s = _suf(word, ST2C_SUF)
    if s:
        word = word[: -len(s)]
        if _ends(word, ST2C_EXC):
            word += "ουδ"
    s = _suf(word, ST2D_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST2D_EXC):
            word += "ε"

    # --- steps 3-4 -----------------------------------------------------------
    s = _suf(word, ST3_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if word[-1:] in VOWELS:
            word += "ι"
    s = _suf(word, ST4_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if word[-1:] in VOWELS or _eq(word, ST4_EXC):
            word += "ικ"

    # --- participle steps 5a-5m ---------------------------------------------
    if word == "αγαμε":
        word = "αγαμ"
    s = _suf(word, ST5A_LONG)
    if s:
        word = word[: -len(s)]
        test1 = False
    if word.endswith("αμε"):
        word = word[:-3]
        test1 = False
        if _eq(word, ST5A_EXC):
            word += "αμ"
    s = _suf(word, ST5B_LONG)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST5B_TRTS):
            word += "αγαν"
    if word.endswith("ανε"):
        word = word[:-3]
        test1 = False
        if word[-1:] in set("αεηιοω") or _eq(word, ST5B_EXC):
            word += "αν"
    if word.endswith("ησετε"):
        word = word[:-5]
        test1 = False
    if word.endswith("ετε"):
        word = word[:-3]
        test1 = False
        # two stacked restores (decoded from the compiled code): a final
        # v2 vowel (no υ) appends 'ετ' and leaves the cursor BEFORE the
        # vowel; the atlimit exception then REPLACES that vowel with a
        # second 'ετ' ('δηετε' → 'δετετ'); for consonant-final stems the
        # ends-with list or the atlimit list appends a single 'ετ'
        if word[-1:] in set("αεηιοω"):
            base = word[:-1]
            if _eq(base, ST5C_EXC):
                word = base + "ετετ"
            else:
                word = word + "ετ"
        elif _ends(word, ST5C_ENDS) or _eq(word, ST5C_EXC):
            word += "ετ"
    s = _suf(word, ST5D_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if word == "αρχ":
            word += "οντ"
        elif word.endswith("κρε"):
            word += "ωντ"
    s = _suf(word, ("ιομαστε", "ομαστε"))
    if s:
        word = word[: -len(s)]
        test1 = False
        if word == "ον":
            word += "ομαστ"
    if word.endswith("ιεστε"):
        word = word[:-5]
        test1 = False
        if _eq(word, ST5F_IEST):
            word += "ιεστ"
    if word.endswith("εστε"):
        word = word[:-4]
        test1 = False
        if _eq(word, ST5F_EST):
            word += "ιεστ"
    s = _suf(word, ST5G_LONG)
    if s:
        word = word[: -len(s)]
        test1 = False
    s = _suf(word, ST5G_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST5G_EQ) or _ends(word, ST5G_ENDS):
            word += "ηκ"
    s = _suf(word, ST5H_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST5H_EXC) or _ends(word, ST5H_ENDS):
            word += "ουσ"
    s = _suf(word, ST5J_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST5J_EXC):
            word += "ησ"
    s = _suf(word, ST5I_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        # +αγ when the stem equals a 44-entry exception, ends with one of a
        # 10-entry list (unless it ends with the two blocker stems), or
        # equals κολλ
        if _eq(word, ST5I_EXC) or word.endswith("κολλ"):
            word += "αγ"
        elif _ends(word, ST5I_ENDS) and not _ends(word, ST5I_BLOCK):
            word += "αγ"
    if word.endswith("ηστε"):
        word = word[:-4]
        test1 = False
        if _eq(word, ST5K_EXC):
            word += "ηστ"
    s = _suf(word, ST5L_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST5L_EXC):
            word += "ουν"
    s = _suf(word, ST5M_SUF)
    if s:
        word = word[: -len(s)]
        test1 = False
        if _eq(word, ST5M_EXC):
            word += "ουμ"

    # --- step 6 + step 7 ------------------------------------------------------
    s = _suf(word, ST6_MA)
    if s:
        word = word[: -len(s)] + "μα"
    if test1:
        s = _suf(word, ST6_SUF)
        if s:
            word = word[: -len(s)]
    s = _suf(word, ST7_SUF)
    if s:
        word = word[: -len(s)]
    return word
