"""Italian Snowball stemmer — SnowballPorterFilterFactory
language="Italian" (the default ItalianAnalyzer uses ItalianLightStemmer).

Re-derived from the published snowball algorithm; tables read as data from
the generated ItalianStemmer.java:19-170. Byte-identical on the
TestSnowballVocabData italian vocabulary and 30k-word compiled-oracle fuzz.
"""

from __future__ import annotations

from .snowball import next_region, sort_table, spanish_rv

_V = frozenset("aeiouàèìòù")
_AEIO = frozenset("aeioàèìò")
_ACCENT = str.maketrans("áéíóú", "àèìòù")

_PRONOUNS = sort_table([(s, 0) for s in (
    "la cela gliela mela tela vela le cele gliele mele tele vele ne cene "
    "gliene mene sene tene vene ci li celi glieli meli teli veli gli mi "
    "si ti vi lo celo glielo melo telo velo").split()])
_PRON_PRE = sort_table([("ando", 1), ("endo", 1), ("ar", 2), ("er", 2),
                        ("ir", 2)])
_STD = sort_table([
    ("ica", 1), ("logia", 3), ("osa", 1), ("ista", 1), ("iva", 9),
    ("anza", 1), ("enza", 5), ("ice", 1), ("atrice", 1), ("iche", 1),
    ("logie", 3), ("abile", 1), ("ibile", 1), ("usione", 4),
    ("azione", 2), ("uzione", 4), ("atore", 2), ("ose", 1), ("ante", 1),
    ("mente", 1), ("amente", 7), ("iste", 1), ("ive", 9), ("anze", 1),
    ("enze", 5), ("ici", 1), ("atrici", 1), ("ichi", 1), ("abili", 1),
    ("ibili", 1), ("ismi", 1), ("usioni", 4), ("azioni", 2),
    ("uzioni", 4), ("atori", 2), ("osi", 1), ("anti", 1), ("amenti", 6),
    ("imenti", 6), ("isti", 1), ("ivi", 9), ("ico", 1), ("ismo", 1),
    ("oso", 1), ("amento", 6), ("imento", 6), ("ivo", 9), ("ità", 8),
    ("istà", 1), ("istè", 1), ("istì", 1),
])
_VERB = sort_table([(s, 1) for s in (
    "isca enda ata ita uta ava eva iva erebbe irebbe isce ende are ere "
    "ire asse ate avate evate ivate ete erete irete ite ereste ireste "
    "ute erai irai isci endi erei irei assi ati iti eresti iresti uti "
    "avi evi ivi isco ando endo Yamo iamo avamo evamo ivamo eremo iremo "
    "assimo ammo emmo eremmo iremmo immo ano iscano avano evano ivano "
    "eranno iranno ono iscono arono erono irono erebbero irebbero "
    "assero essero issero ato ito uto avo evo ivo ar ir erà irà erò "
    "irò").split()])


def italian_snowball_stem(word: str) -> str:
    # prelude: acute → grave, qu → qU, then u/i between vowels → U/I
    s = word.translate(_ACCENT).replace("qu", "qU")
    w = list(s)
    for j in range(1, len(w) - 1):
        if w[j - 1] in _V and w[j + 1] in _V:
            if w[j] == "u":
                w[j] = "U"
            elif w[j] == "i":
                w[j] = "I"
    s = "".join(w)

    pv = spanish_rv(s, _V)
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def rv(pos):
        return pos >= pv

    def r2(pos):
        return pos >= p2

    # attached_pronoun: delete the pronoun after ando/endo, replace it
    # with 'e' after ar/er/ir (RV at the verb-ending start)
    for pron, _ in _PRONOUNS:
        if s.endswith(pron):
            rest = s[: -len(pron)]
            for suf, cls in _PRON_PRE:
                if rest.endswith(suf) and rv(len(rest) - len(suf)):
                    s = rest if cls == 1 else rest + "e"
                    break
            break

    def standard_suffix() -> bool:
        nonlocal s
        for suf, cls in _STD:
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if cls == 6:
                if not rv(st):
                    return False
                s = s[:st]
            elif cls == 7:
                if not st >= p1:
                    return False
                s = s[:st]
                for suf2, sub in (("iv", 1), ("ic", 0), ("abil", 0),
                                  ("os", 0)):
                    if s.endswith(suf2) and r2(len(s) - len(suf2)):
                        s = s[: -len(suf2)]
                        if sub and s.endswith("at") and r2(len(s) - 2):
                            s = s[:-2]
                        break
            elif not r2(st):
                return False
            elif cls == 3:
                s = s[:st] + "log"
            elif cls == 4:
                s = s[:st] + "u"
            elif cls == 5:
                s = s[:st] + "ente"
            else:
                s = s[:st]
                if cls == 2:
                    if s.endswith("ic") and r2(len(s) - 2):
                        s = s[:-2]
                elif cls == 8:
                    for suf2 in ("abil", "ic", "iv"):
                        if s.endswith(suf2) and r2(len(s) - len(suf2)):
                            s = s[: -len(suf2)]
                            break
                elif cls == 9:
                    if s.endswith("at") and r2(len(s) - 2):
                        s = s[:-2]
                        if s.endswith("ic") and r2(len(s) - 2):
                            s = s[:-2]
            return True
        return False

    if not standard_suffix():
        # verb_suffix: setlimit RV
        for suf, _ in _VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                s = s[: -len(suf)]
                break

    # vowel_suffix: final a/e/i/o (+graves) in RV, then a trailing i in RV
    if s and s[-1] in _AEIO and rv(len(s) - 1):
        s = s[:-1]
        if s.endswith("i") and rv(len(s) - 1):
            s = s[:-1]
    # final h after c/g — the RV check sits at the c/g position
    if len(s) >= 2 and s[-1] == "h" and s[-2] in ("c", "g") \
            and rv(len(s) - 2):
        s = s[:-1]

    return s.translate({ord("I"): "i", ord("U"): "u"})
