"""Greek analysis: Greek-specific lowercase + the Ntais Greek stemmer.

Reference chain (GreekAnalyzer.java:114-121): StandardTokenizer →
GreekLowerCaseFilter (final sigma → σ, tonos/dialytika folds) →
Stop(el/stopwords.txt, '#') → GreekStemFilter.

greek_stem re-derives GreekStemmer.java:35-817 ("Development of a Stemmer
for the Greek Language", Georgios Ntais): 21 ordered suffix rules plus a
comparative rule, each with exception word-prefix sets and restore logic.
Java's &&/|| precedence quirks (e.g. rule0's σκαγιου group, rule8's length
guards) are preserved verbatim — the compiled reference is the parity
target. Fuzz-verified byte-identical via tools/stemmer_oracle.py
(30k words, 0 mismatches).

The stemmer mirrors the Java buffer+length model: `len` can shrink AND
grow back over the ORIGINAL buffer (suffix restores), with occasional
in-place overwrites.
"""

from __future__ import annotations

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")


def _ew(s: list[str], ln: int, suf: str) -> bool:
    if len(suf) > ln:
        return False
    return "".join(s[ln - len(suf): ln]) == suf


def _pre(s: list[str], ln: int, words: frozenset[str]) -> bool:
    """CharArraySet.contains(s, 0, len) — whole current word in the set."""
    return "".join(s[:ln]) in words


_EXC4 = frozenset("θ δ ελ γαλ ν π ιδ παρ".split())
_EXC6 = frozenset(
    "αλ αδ ενδ αμαν αμμοχαλ ηθ ανηθ αντιδ φυσ βρωμ γερ εξωδ καλπ καλλιν "
    "καταδ μουλ μπαν μπαγιατ μπολ μποσ νιτ ξικ συνομηλ πετσ πιτσ πικαντ "
    "πλιατσ ποστελν πρωτοδ σερτ συναδ τσαμ υποδ φιλον φυλοδ χασ".split())
_EXC7 = frozenset("αναπ αποθ αποκ αποστ βουβ ξεθ ουλ πεθ πικρ ποτ σιχ χ"
                  .split())
_EXC8A = frozenset("τρ τσ".split())
_EXC8B = frozenset(
    "βετερ βουλκ βραχμ γ δραδουμ θ καλπουζ καστελ κορμορ λαοπλ μωαμεθ μ "
    "μουσουλμ ν ουλ π πελεκ πλ πολισ πορτολ σαρακατσ σουλτ τσαρλατ ορφ "
    "τσιγγ τσοπ φωτοστεφ χ ψυχοπλ αγ γαλ γερ δεκ διπλ αμερικαν ουρ πιθ "
    "πουριτ σ ζωντ ικ καστ κοπ λιχ λουθηρ μαιντ μελ σιγ σπ στεγ τραγ τσαγ "
    "φ ερ αδαπ αθιγγ αμηχ ανικ ανοργ απηγ απιθ ατσιγγ βασ βασκ βαθυγαλ "
    "βιομηχ βραχυκ διατ διαφ ενοργ θυσ καπνοβιομηχ καταγαλ κλιβ κοιλαρφ "
    "λιβ μεγλοβιομηχ μικροβιομηχ νταβ ξηροκλιβ ολιγοδαμ ολογαλ πενταρφ "
    "περηφ περιτρ πλατ πολυδαπ πολυμηχ στεφ ταβ τετ υπερηφ υποκοπ "
    "χαμηλοδαπ ψηλοταβ".split())
_EXC9 = frozenset(
    "αβαρ βεν εναρ αβρ αδ αθ αν απλ βαρον ντρ σκ κοπ μπορ νιφ παγ παρακαλ "
    "σερπ σκελ συρφ τοκ υ δ εμ θαρρ θ".split())
_EXC12A = frozenset("π απ συμπ ασυμπ ακαταπ αμεταμφ".split())
_EXC12B = frozenset("αλ αρ εκτελ ζ μ ξ παρακαλ προ νισ".split())
_EXC13 = frozenset("διαθ θ παρακαταθ προσθ συνθ".split())
_EXC14 = frozenset(
    "φαρμακ χαδ αγκ αναρρ βρομ εκλιπ λαμπιδ λεχ μ πατ ρ λ μεδ μεσαζ "
    "υποτειν αμ αιθ ανηκ δεσποζ ενδιαφερ δε δευτερευ καθαρευ πλε τσα"
    .split())
_EXC15A = frozenset(
    "αβαστ πολυφ αδηφ παμφ ρ ασπ αφ αμαλ αμαλλι ανυστ απερ ασπαρ αχαρ "
    "δερβεν δροσοπ ξεφ νεοπ νομοτ ολοπ ομοτ προστ προσωποπ συμπ συντ τ "
    "υποτ χαρ αειπ αιμοστ ανυπ αποτ αρτιπ διατ εν επιτ κροκαλοπ σιδηροπ "
    "λ ναυ ουλαμ ουρ π τρ μ".split())
_EXC15B = frozenset("ψοφ ναυλοχ".split())
_EXC16 = frozenset("ν χερσον δωδεκαν ερημον μεγαλον επταν".split())
_EXC17 = frozenset(
    "ασβ σβ αχρ χρ απλ αειμν δυσχρ ευχρ κοινοχρ παλιμψ".split())
_EXC18 = frozenset("ν ρ σπι στραβομουτσ κακομουτσ εξων".split())
_EXC19 = frozenset("παρασουσ φ χ ωριοπλ αζ αλλοσουσ ασουσ".split())

# GreekLowerCaseFilter.java:67-125
_EL_FOLD = {
    0x03C2: "σ",
    0x0386: "α", 0x03AC: "α",
    0x0388: "ε", 0x03AD: "ε",
    0x0389: "η", 0x03AE: "η",
    0x038A: "ι", 0x03AA: "ι", 0x03AF: "ι", 0x03CA: "ι", 0x0390: "ι",
    0x038E: "υ", 0x03AB: "υ", 0x03CD: "υ", 0x03CB: "υ", 0x03B0: "υ",
    0x038C: "ο", 0x03CC: "ο",
    0x038F: "ω", 0x03CE: "ω",
    0x03A2: "ς",
}


def greek_lower(token: str) -> str:
    from .analyzer import _java_lower

    out = []
    for ch in token:
        rep = _EL_FOLD.get(ord(ch))
        out.append(rep if rep is not None else _java_lower(ch))
    return "".join(out)


def greek_stem(word: str) -> str:  # noqa: C901 — mirrors the 22-rule Java
    if len(word) < 4:
        return word
    s = list(word)
    ln = len(s)
    orig = ln
    ew = _ew
    pre = _pre

    # rule0 (:69-139) — Java precedence preserved on the σκαγιου group
    if ln > 9 and (ew(s, ln, "καθεστωτοσ") or ew(s, ln, "καθεστωτων")):
        ln -= 4
    elif ln > 8 and (ew(s, ln, "γεγονοτοσ") or ew(s, ln, "γεγονοτων")):
        ln -= 4
    elif ln > 8 and ew(s, ln, "καθεστωτα"):
        ln -= 3
    elif ln > 7 and (ew(s, ln, "τατογιου") or ew(s, ln, "τατογιων")):
        ln -= 4
    elif ln > 7 and ew(s, ln, "γεγονοτα"):
        ln -= 3
    elif ln > 7 and ew(s, ln, "καθεστωσ"):
        ln -= 2
    elif ((ln > 6 and ew(s, ln, "σκαγιου"))
          or ew(s, ln, "σκαγιων") or ew(s, ln, "ολογιου")
          or ew(s, ln, "ολογιων") or ew(s, ln, "κρεατοσ")
          or ew(s, ln, "κρεατων") or ew(s, ln, "περατοσ")
          or ew(s, ln, "περατων") or ew(s, ln, "τερατοσ")
          or ew(s, ln, "τερατων")):
        ln -= 4
    elif ln > 6 and ew(s, ln, "τατογια"):
        ln -= 3
    elif ln > 6 and ew(s, ln, "γεγονοσ"):
        ln -= 2
    elif ln > 5 and (ew(s, ln, "φαγιου") or ew(s, ln, "φαγιων")
                     or ew(s, ln, "σογιου") or ew(s, ln, "σογιων")):
        ln -= 4
    elif ln > 5 and (ew(s, ln, "σκαγια") or ew(s, ln, "ολογια")
                     or ew(s, ln, "κρεατα") or ew(s, ln, "περατα")
                     or ew(s, ln, "τερατα")):
        ln -= 3
    elif ln > 4 and (ew(s, ln, "φαγια") or ew(s, ln, "σογια")
                     or ew(s, ln, "φωτοσ") or ew(s, ln, "φωτων")):
        ln -= 3
    elif ln > 4 and (ew(s, ln, "κρεασ") or ew(s, ln, "περασ")
                     or ew(s, ln, "τερασ")):
        ln -= 2
    elif ln > 3 and ew(s, ln, "φωτα"):
        ln -= 2
    elif ln > 2 and ew(s, ln, "φωσ"):
        ln -= 1

    # rule1 (:142-157)
    if ln > 4 and (ew(s, ln, "αδεσ") or ew(s, ln, "αδων")):
        ln -= 4
        if not (ew(s, ln, "οκ") or ew(s, ln, "μαμ") or ew(s, ln, "μαν")
                or ew(s, ln, "μπαμπ") or ew(s, ln, "πατερ")
                or ew(s, ln, "γιαγι") or ew(s, ln, "νταντ")
                or ew(s, ln, "κυρ") or ew(s, ln, "θει")
                or ew(s, ln, "πεθερ")):
            ln += 2

    # rule2 (:160-174)
    if ln > 4 and (ew(s, ln, "εδεσ") or ew(s, ln, "εδων")):
        ln -= 4
        if (ew(s, ln, "οπ") or ew(s, ln, "ιπ") or ew(s, ln, "εμπ")
                or ew(s, ln, "υπ") or ew(s, ln, "γηπ") or ew(s, ln, "δαπ")
                or ew(s, ln, "κρασπ") or ew(s, ln, "μιλ")):
            ln += 2

    # rule3 (:177-197)
    if ln > 5 and (ew(s, ln, "ουδεσ") or ew(s, ln, "ουδων")):
        ln -= 5
        if (ew(s, ln, "αρκ") or ew(s, ln, "καλιακ") or ew(s, ln, "πεταλ")
                or ew(s, ln, "λιχ") or ew(s, ln, "πλεξ") or ew(s, ln, "σκ")
                or ew(s, ln, "σ") or ew(s, ln, "φλ") or ew(s, ln, "φρ")
                or ew(s, ln, "βελ") or ew(s, ln, "λουλ") or ew(s, ln, "χν")
                or ew(s, ln, "σπ") or ew(s, ln, "τραγ") or ew(s, ln, "φε")):
            ln += 3

    # rule4 (:204-211)
    if ln > 3 and (ew(s, ln, "εωσ") or ew(s, ln, "εων")):
        ln -= 3
        if pre(s, ln, _EXC4):
            ln += 1

    # rule5 (:214-224)
    if ln > 2 and ew(s, ln, "ια"):
        ln -= 2
        if ln and s[ln - 1] in _VOWELS:
            ln += 1
    elif ln > 3 and (ew(s, ln, "ιου") or ew(s, ln, "ιων")):
        ln -= 3
        if ln and s[ln - 1] in _VOWELS:
            ln += 1

    # rule6 (:234-248)
    removed = False
    if ln > 3 and (ew(s, ln, "ικα") or ew(s, ln, "ικο")):
        ln -= 3
        removed = True
    elif ln > 4 and (ew(s, ln, "ικου") or ew(s, ln, "ικων")):
        ln -= 4
        removed = True
    if removed and ((ln and s[ln - 1] in _VOWELS) or pre(s, ln, _EXC6)):
        ln += 2

    # rule7 (:255-274)
    if ln == 5 and ew(s, ln, "αγαμε"):
        ln -= 1
    else:
        if ln > 7 and ew(s, ln, "ηθηκαμε"):
            ln -= 7
        elif ln > 6 and ew(s, ln, "ουσαμε"):
            ln -= 6
        elif ln > 5 and (ew(s, ln, "αγαμε") or ew(s, ln, "ησαμε")
                         or ew(s, ln, "ηκαμε")):
            ln -= 5
        if ln > 3 and ew(s, ln, "αμε"):
            ln -= 3
            if pre(s, ln, _EXC7):
                ln += 2

    # rule8 (:292-330) — Java precedence preserved on the length guards
    removed = False
    if ln > 8 and ew(s, ln, "ιουντανε"):
        ln -= 8
        removed = True
    elif ((ln > 7 and ew(s, ln, "ιοντανε")) or ew(s, ln, "ουντανε")
          or ew(s, ln, "ηθηκανε")):
        ln -= 7
        removed = True
    elif ((ln > 6 and ew(s, ln, "ιοτανε")) or ew(s, ln, "οντανε")
          or ew(s, ln, "ουσανε")):
        ln -= 6
        removed = True
    elif ((ln > 5 and ew(s, ln, "αγανε")) or ew(s, ln, "ησανε")
          or ew(s, ln, "οτανε") or ew(s, ln, "ηκανε")):
        ln -= 5
        removed = True
    if removed and pre(s, ln, _EXC8A):
        ln += 4
        s[ln - 4: ln] = ["α", "γ", "α", "ν"]
    if ln > 3 and ew(s, ln, "ανε"):
        ln -= 3
        if (ln and s[ln - 1] in _VOWELS_NO_Y) or pre(s, ln, _EXC8B):
            ln += 2

    # rule9 (:338-390)
    if ln > 5 and ew(s, ln, "ησετε"):
        ln -= 5
    if ln > 3 and ew(s, ln, "ετε"):
        ln -= 3
        if (pre(s, ln, _EXC9) or (ln and s[ln - 1] in _VOWELS_NO_Y)
                or ew(s, ln, "οδ") or ew(s, ln, "αιρ") or ew(s, ln, "φορ")
                or ew(s, ln, "ταθ") or ew(s, ln, "διαθ") or ew(s, ln, "σχ")
                or ew(s, ln, "ενδ") or ew(s, ln, "ευρ") or ew(s, ln, "τιθ")
                or ew(s, ln, "υπερθ") or ew(s, ln, "ραθ")
                or ew(s, ln, "ενθ") or ew(s, ln, "ροθ") or ew(s, ln, "σθ")
                or ew(s, ln, "πυρ") or ew(s, ln, "αιν")
                or ew(s, ln, "συνδ") or ew(s, ln, "συν")
                or ew(s, ln, "συνθ") or ew(s, ln, "χωρ")
                or ew(s, ln, "πον") or ew(s, ln, "βρ") or ew(s, ln, "καθ")
                or ew(s, ln, "ευθ") or ew(s, ln, "εκθ") or ew(s, ln, "νετ")
                or ew(s, ln, "ρον") or ew(s, ln, "αρκ") or ew(s, ln, "βαρ")
                or ew(s, ln, "βολ") or ew(s, ln, "ωφελ")):
            ln += 2

    # rule10 (:392-407)
    if ln > 5 and (ew(s, ln, "οντασ") or ew(s, ln, "ωντασ")):
        ln -= 5
        if ln == 3 and ew(s, ln, "αρχ"):
            ln += 3
            s[ln - 3] = "ο"
        if ew(s, ln, "κρε"):
            ln += 3
            s[ln - 3] = "ω"

    # rule11 (:410-427)
    if ln > 6 and ew(s, ln, "ομαστε"):
        ln -= 6
        if ln == 2 and ew(s, ln, "ον"):
            ln += 5
    elif ln > 7 and ew(s, ln, "ιομαστε"):
        ln -= 7
        if ln == 2 and ew(s, ln, "ον"):
            ln += 5
            s[ln - 5: ln] = ["ο", "μ", "α", "σ", "τ"]

    # rule12 (:437-450)
    if ln > 5 and ew(s, ln, "ιεστε"):
        ln -= 5
        if pre(s, ln, _EXC12A):
            ln += 4
    if ln > 4 and ew(s, ln, "εστε"):
        ln -= 4
        if pre(s, ln, _EXC12B):
            ln += 3

    # rule13 (:457-484)
    if ln > 6 and ew(s, ln, "ηθηκεσ"):
        ln -= 6
    elif ln > 5 and (ew(s, ln, "ηθηκα") or ew(s, ln, "ηθηκε")):
        ln -= 5
    removed = False
    if ln > 4 and ew(s, ln, "ηκεσ"):
        ln -= 4
        removed = True
    elif ln > 3 and (ew(s, ln, "ηκα") or ew(s, ln, "ηκε")):
        ln -= 3
        removed = True
    if removed and (pre(s, ln, _EXC13) or ew(s, ln, "σκωλ")
                    or ew(s, ln, "σκουλ") or ew(s, ln, "ναρθ")
                    or ew(s, ln, "σφ") or ew(s, ln, "οθ")
                    or ew(s, ln, "πιθ")):
        ln += 2

    # rule14 (:493-521)
    removed = False
    if ln > 5 and ew(s, ln, "ουσεσ"):
        ln -= 5
        removed = True
    elif ln > 4 and (ew(s, ln, "ουσα") or ew(s, ln, "ουσε")):
        ln -= 4
        removed = True
    if removed and (pre(s, ln, _EXC14)
                    or (ln and s[ln - 1] in _VOWELS)
                    or ew(s, ln, "ποδαρ") or ew(s, ln, "βλεπ")
                    or ew(s, ln, "πανταχ") or ew(s, ln, "φρυδ")
                    or ew(s, ln, "μαντιλ") or ew(s, ln, "μαλλ")
                    or ew(s, ln, "κυματ") or ew(s, ln, "λαχ")
                    or ew(s, ln, "ληγ") or ew(s, ln, "φαγ")
                    or ew(s, ln, "ομ") or ew(s, ln, "πρωτ")):
        ln += 3

    # rule15 (:537-567)
    removed = False
    if ln > 4 and ew(s, ln, "αγεσ"):
        ln -= 4
        removed = True
    elif ln > 3 and (ew(s, ln, "αγα") or ew(s, ln, "αγε")):
        ln -= 3
        removed = True
    if removed:
        cond1 = (pre(s, ln, _EXC15A) or ew(s, ln, "οφ")
                 or ew(s, ln, "πελ") or ew(s, ln, "χορτ")
                 or ew(s, ln, "λλ") or ew(s, ln, "σφ") or ew(s, ln, "ρπ")
                 or ew(s, ln, "φρ") or ew(s, ln, "πρ") or ew(s, ln, "λοχ")
                 or ew(s, ln, "σμην"))
        cond2 = pre(s, ln, _EXC15B) or ew(s, ln, "κολλ")
        if cond1 and not cond2:
            ln += 2

    # rule16 (:574-587)
    removed = False
    if ln > 4 and ew(s, ln, "ησου"):
        ln -= 4
        removed = True
    elif ln > 3 and (ew(s, ln, "ησε") or ew(s, ln, "ησα")):
        ln -= 3
        removed = True
    if removed and pre(s, ln, _EXC16):
        ln += 2

    # rule17 (:594-601)
    if ln > 4 and ew(s, ln, "ηστε"):
        ln -= 4
        if pre(s, ln, _EXC17):
            ln += 3

    # rule18 (:608-625)
    removed = False
    if ln > 6 and (ew(s, ln, "ησουνε") or ew(s, ln, "ηθουνε")):
        ln -= 6
        removed = True
    elif ln > 4 and ew(s, ln, "ουνε"):
        ln -= 4
        removed = True
    if removed and pre(s, ln, _EXC18):
        ln += 3
        s[ln - 3: ln] = ["ο", "υ", "ν"]

    # rule19 (:632-649)
    removed = False
    if ln > 6 and (ew(s, ln, "ησουμε") or ew(s, ln, "ηθουμε")):
        ln -= 6
        removed = True
    elif ln > 4 and ew(s, ln, "ουμε"):
        ln -= 4
        removed = True
    if removed and pre(s, ln, _EXC19):
        ln += 3
        s[ln - 3: ln] = ["ο", "υ", "μ"]

    # rule20 (:652-658)
    if ln > 5 and (ew(s, ln, "ματων") or ew(s, ln, "ματοσ")):
        ln -= 3
    elif ln > 4 and ew(s, ln, "ματα"):
        ln -= 2

    # rule21 (:660-755) only when nothing above fired
    if ln == orig:
        ln = _rule21(s, ln)

    # rule22 (:758-771)
    if ew(s, ln, "εστερ") or ew(s, ln, "εστατ"):
        ln -= 5
    elif (ew(s, ln, "οτερ") or ew(s, ln, "οτατ") or ew(s, ln, "υτερ")
          or ew(s, ln, "υτατ") or ew(s, ln, "ωτερ") or ew(s, ln, "ωτατ")):
        ln -= 4

    return "".join(s[:ln])


_R21 = [
    (9, ["ιοντουσαν"]),
    (8, ["ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν"]),
    (7, ["ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
         "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
         "ουμαστε"]),
    (6, ["ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
         "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε"]),
    (5, ["αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
         "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
         "οσουν", "ουμαι", "ουσαν"]),
    (4, ["αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
         "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
         "οταν"]),
    (3, ["αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"]),
    (2, ["αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
         "ων"]),
]


def _rule21(s: list[str], ln: int) -> int:
    for size, sufs in _R21:
        if ln > size:
            for suf in sufs:
                if _ew(s, ln, suf):
                    return ln - size
    if ln > 1 and s[ln - 1] in _VOWELS:
        return ln - 1
    return ln
