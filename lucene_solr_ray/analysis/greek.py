"""Greek analysis (``analysis/common/src/java/org/apache/lucene/analysis/
el/``): GreekLowerCaseFilter + GreekStemmer (Ntais's stemmer as shipped by
the reference), golden-tested against all TestGreekStemmer /
TestGreekAnalyzer cases.

The stemmer operates on text already folded by :func:`greek_lower`
(lowercase, tonos/dialytika removed, final sigma ς → σ) — the reference
chain order (``el/GreekAnalyzer.java``: GreekLowerCaseFilter → StopFilter
→ GreekStemFilter).
"""
from __future__ import annotations

# --- GreekLowerCaseFilter (el/GreekLowerCaseFilter.java:55-113) ---

_EL_FOLD = {
    "ς": "σ",                    # final sigma -> sigma
    "Ά": "α", "ά": "α",  # alpha tonos
    "Έ": "ε", "έ": "ε",  # epsilon tonos
    "Ή": "η", "ή": "η",  # eta tonos
    "Ί": "ι", "Ϊ": "ι", "ί": "ι",
    "ϊ": "ι", "ΐ": "ι",  # iota tonos/dialytika
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ",
    "ϋ": "υ", "ΰ": "υ",  # upsilon tonos/dialytika
    "Ό": "ο", "ό": "ο",  # omicron tonos
    "Ώ": "ω", "ώ": "ω",  # omega tonos
    "΢": "ς",                    # reserved (back-compat)
}


def greek_lower(text: str) -> str:
    """Lowercase + Greek diacritic folds + final-sigma standardization.
    The special folds are checked on the ORIGINAL codepoint (like the
    reference), then everything else takes standard lowercase."""
    return "".join(_EL_FOLD.get(ch) or _EL_FOLD.get(ch.lower()) or ch.lower()
                   for ch in text)


# --- GreekStemmer (el/GreekStemmer.java:43-820) ---

_V = frozenset("αεηιουω")
_V_NO_Y = frozenset("αεηιοω")

_EXC4 = frozenset(("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"))
_EXC6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ",
))
_EXC7 = frozenset((
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
    "ποτ", "σιχ", "χ",
))
_EXC8A = frozenset(("τρ", "τσ"))
_EXC8B = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π", "πελεκ",
    "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ", "τσιγγ",
    "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ", "διπλ",
    "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ",
    "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ",
    "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ",
    "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ",
    "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
    "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ",
    "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ",
    "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ",
))
_EXC9 = frozenset((
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον", "ντρ",
    "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ", "συρφ",
    "τοκ", "υ", "δ", "εμ", "θαρρ", "θ",
))
_EXC12A = frozenset(("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"))
_EXC12B = frozenset(("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"))
_EXC13 = frozenset(("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"))
_EXC14 = frozenset((
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ", "μ",
    "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ",
    "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα",
))
_EXC15A = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν",
    "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
    "μ",
))
_EXC15B = frozenset(("ψοφ", "ναυλοχ"))
_EXC16 = frozenset(("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"))
_EXC17 = frozenset((
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ", "κοινοχρ",
    "παλιμψ",
))
_EXC18 = frozenset(("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"))
_EXC19 = frozenset(("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"))


def _ev(s: str) -> bool:
    return bool(s) and s[-1] in _V


def _ev_no_y(s: str) -> bool:
    return bool(s) and s[-1] in _V_NO_Y


def _rule0(s):
    n = len(s)
    if n > 9 and s.endswith(("καθεστωτοσ", "καθεστωτων")):
        return s[:-4]
    if n > 8 and s.endswith(("γεγονοτοσ", "γεγονοτων")):
        return s[:-4]
    if n > 8 and s.endswith("καθεστωτα"):
        return s[:-3]
    if n > 7 and s.endswith(("τατογιου", "τατογιων")):
        return s[:-4]
    if n > 7 and s.endswith("γεγονοτα"):
        return s[:-3]
    if n > 7 and s.endswith("καθεστωσ"):
        return s[:-2]
    # NOTE: the reference's parenthesization makes len>6 guard ONLY the
    # first alternative (GreekStemmer.java:101-110) — kept faithfully
    if (n > 6 and s.endswith("σκαγιου")) or s.endswith((
            "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
            "περατοσ", "περατων", "τερατοσ", "τερατων")):
        return s[:-4]
    if n > 6 and s.endswith("τατογια"):
        return s[:-3]
    if n > 6 and s.endswith("γεγονοσ"):
        return s[:-2]
    if n > 5 and s.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return s[:-4]
    if n > 5 and s.endswith(("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα")):
        return s[:-3]
    if n > 4 and s.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return s[:-3]
    if n > 4 and s.endswith(("κρεασ", "περασ", "τερασ")):
        return s[:-2]
    if n > 3 and s.endswith("φωτα"):
        return s[:-2]
    if n > 2 and s.endswith("φωσ"):
        return s[:-1]
    return s


def _rule1(s):
    if len(s) > 4 and s.endswith(("αδεσ", "αδων")):
        s = s[:-4]
        if not s.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                           "νταντ", "κυρ", "θει", "πεθερ")):
            s += "αδ"
    return s


def _rule2(s):
    if len(s) > 4 and s.endswith(("εδεσ", "εδων")):
        s = s[:-4]
        if s.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")):
            s += "εδ"
    return s


def _rule3(s):
    if len(s) > 5 and s.endswith(("ουδεσ", "ουδων")):
        s = s[:-5]
        if s.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                       "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")):
            s += "ουδ"
    return s


def _rule4(s):
    if len(s) > 3 and s.endswith(("εωσ", "εων")):
        s = s[:-3]
        if s in _EXC4:
            s += "ε"
    return s


def _rule5(s):
    if len(s) > 2 and s.endswith("ια"):
        s = s[:-2]
        if _ev(s):
            s += "ι"
    elif len(s) > 3 and s.endswith(("ιου", "ιων")):
        s = s[:-3]
        if _ev(s):
            s += "ι"
    return s


def _rule6(s):
    removed = False
    if len(s) > 3 and s.endswith(("ικα", "ικο")):
        s = s[:-3]
        removed = True
    elif len(s) > 4 and s.endswith(("ικου", "ικων")):
        s = s[:-4]
        removed = True
    if removed and (_ev(s) or s in _EXC6):
        s += "ικ"
    return s


def _rule7(s):
    if len(s) == 5 and s.endswith("αγαμε"):
        return s[:-1]
    if len(s) > 7 and s.endswith("ηθηκαμε"):
        s = s[:-7]
    elif len(s) > 6 and s.endswith("ουσαμε"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        s = s[:-5]
    if len(s) > 3 and s.endswith("αμε"):
        s = s[:-3]
        if s in _EXC7:
            s += "αμ"
    return s


def _rule8(s):
    removed = False
    n = len(s)
    if n > 8 and s.endswith("ιουντανε"):
        s = s[:-8]
        removed = True
    # the reference's parenthesization: len guards only the FIRST
    # alternative in each else-if chain (GreekStemmer.java:313-330)
    elif (n > 7 and s.endswith("ιοντανε")) or s.endswith(("ουντανε", "ηθηκανε")):
        s = s[:-7]
        removed = True
    elif (n > 6 and s.endswith("ιοτανε")) or s.endswith(("οντανε", "ουσανε")):
        s = s[:-6]
        removed = True
    elif (n > 5 and s.endswith("αγανε")) or s.endswith(("ησανε", "οτανε", "ηκανε")):
        s = s[:-5]
        removed = True
    if removed and s in _EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        s = s[:-3]
        if _ev_no_y(s) or s in _EXC8B:
            s += "αν"
    return s


def _rule9(s):
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        s = s[:-3]
        if (s in _EXC9 or _ev_no_y(s) or s.endswith((
                "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
                "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
                "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ"))):
            s += "ετ"
    return s


def _rule10(s):
    if len(s) > 5 and s.endswith(("οντασ", "ωντασ")):
        s = s[:-5]
        if len(s) == 3 and s.endswith("αρχ"):
            s += "οντ"
        if s.endswith("κρε"):
            s += "ωντ"
    return s


def _rule11(s):
    if len(s) > 6 and s.endswith("ομαστε"):
        s = s[:-6]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    elif len(s) > 7 and s.endswith("ιομαστε"):
        s = s[:-7]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    return s


def _rule12(s):
    if len(s) > 5 and s.endswith("ιεστε"):
        s = s[:-5]
        if s in _EXC12A:
            s += "ιεστ"
    if len(s) > 4 and s.endswith("εστε"):
        s = s[:-4]
        if s in _EXC12B:
            s += "εστ"
    return s


def _rule13(s):
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("ηθηκα", "ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ηκα", "ηκε")):
        s = s[:-3]
        removed = True
    if removed and (s in _EXC13 or s.endswith((
            "σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"))):
        s += "ηκ"
    return s


def _rule14(s):
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s = s[:-5]
        removed = True
    elif len(s) > 4 and s.endswith(("ουσα", "ουσε")):
        s = s[:-4]
        removed = True
    if removed and (s in _EXC14 or _ev(s) or s.endswith((
            "ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ", "κυματ",
            "λαχ", "ληγ", "φαγ", "ομ", "πρωτ"))):
        s += "ουσ"
    return s


def _rule15(s):
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("αγα", "αγε")):
        s = s[:-3]
        removed = True
    if removed:
        cond1 = s in _EXC15A or s.endswith((
            "οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ",
            "σμην"))
        cond2 = s in _EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    return s


def _rule16(s):
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ησε", "ησα")):
        s = s[:-3]
        removed = True
    if removed and s in _EXC16:
        s += "ησ"
    return s


def _rule17(s):
    if len(s) > 4 and s.endswith("ηστε"):
        s = s[:-4]
        if s in _EXC17:
            s += "ηστ"
    return s


def _rule18(s):
    removed = False
    if len(s) > 6 and s.endswith(("ησουνε", "ηθουνε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουνε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC18:
        s += "ουν"
    return s


def _rule19(s):
    removed = False
    if len(s) > 6 and s.endswith(("ησουμε", "ηθουμε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουμε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC19:
        s += "ουμ"
    return s


def _rule20(s):
    if len(s) > 5 and s.endswith(("ματων", "ματοσ")):
        return s[:-3]
    if len(s) > 4 and s.endswith("ματα"):
        return s[:-2]
    return s


_R21_GROUPS = (
    (9, 9, ("ιοντουσαν",)),
    (8, 8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, 7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
            "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
            "ουμαστε")),
    (6, 6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
            "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")),
    (5, 5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
            "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
            "οσουν", "ουμαι", "ουσαν")),
    (4, 4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
            "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
            "οταν")),
    (3, 3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, 2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
            "ων")),
)


def _rule21(s):
    n = len(s)
    for minlen, strip, sufs in _R21_GROUPS:
        if n > minlen and s.endswith(sufs):
            return s[:-strip]
    if n > 1 and _ev(s):
        return s[:-1]
    return s


def _rule22(s):
    if s.endswith(("εστερ", "εστατ")):
        return s[:-5]
    if s.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return s[:-4]
    return s


_SHORT_RULES = (
    _rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6, _rule7,
    _rule8, _rule9, _rule10, _rule11, _rule12, _rule13, _rule14, _rule15,
    _rule16, _rule17, _rule18, _rule19, _rule20,
)


def greek_stem(term: str) -> str:
    """GreekStemmer.stem (``el/GreekStemmer.java:43-75``): the 21 "short
    rules" in order; the rule-21 "long list" fires only when none of them
    changed the word; rule 22 (comparatives) always runs."""
    if len(term) < 4:
        return term
    s = term
    for rule in _SHORT_RULES:
        s = rule(s)
    if len(s) == len(term):
        s = _rule21(s)
    return _rule22(s)
