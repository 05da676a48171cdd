"""Portuguese Snowball stemmer — SnowballPorterFilterFactory
language="Portuguese" (the default PortugueseAnalyzer uses
PortugueseLightStemmer).

Re-derived from the published snowball algorithm; tables read as data from
the generated PortugueseStemmer.java:19-235 (the nasal vowels ã/õ are
rewritten to the two-char markers a~/o~ in the prelude, matching the
published definition). Byte-identical on the TestSnowballVocabData
portuguese vocabulary and 30k-word compiled-oracle fuzz.
"""

from __future__ import annotations

from .snowball import next_region, sort_table, spanish_rv

_V = frozenset("aeiouáâéêíóôú")

_STD = sort_table([
    ("ica", 1), ("ância", 1), ("ência", 4), ("ira", 9), ("adora", 1),
    ("osa", 1), ("ista", 1), ("iva", 8), ("eza", 1), ("logía", 2),
    ("idade", 7), ("ante", 1), ("mente", 6), ("amente", 5), ("ável", 1),
    ("ível", 1), ("ución", 3), ("ico", 1), ("ismo", 1), ("oso", 1),
    ("amento", 1), ("imento", 1), ("ivo", 8), ("aça~o", 1), ("ador", 1),
    ("icas", 1), ("ências", 4), ("iras", 9), ("adoras", 1), ("osas", 1),
    ("istas", 1), ("ivas", 8), ("ezas", 1), ("logías", 2),
    ("idades", 7), ("uciones", 3), ("adores", 1), ("antes", 1),
    ("aço~es", 1), ("icos", 1), ("ismos", 1), ("osos", 1),
    ("amentos", 1), ("imentos", 1), ("ivos", 8),
])
_VERB = sort_table([(s, 1) for s in (
    "ada ida ia aria eria iria ara era ira ava asse esse isse aste este "
    "iste ei arei erei irei am iam ariam eriam iriam aram eram iram "
    "avam em arem erem irem assem essem issem ado ido ando endo indo "
    "ara~o era~o ira~o ar er ir as adas idas ias arias erias irias aras "
    "eras iras avas es ardes erdes irdes ares eres ires asses esses "
    "isses astes estes istes is ais eis areis ereis ireis áreis éreis "
    "íreis ásseis ésseis ísseis áveis íeis aríeis eríeis iríeis ados "
    "idos amos áramos éramos íramos ávamos íamos aríamos eríamos "
    "iríamos emos aremos eremos iremos ássemos êssemos íssemos imos "
    "armos ermos irmos ámos arás erás irás eu iu ou ará erá irá").split()])
_RESIDUAL = ("os", "a", "i", "o", "á", "í", "ó")


def portuguese_snowball_stem(word: str) -> str:
    # prelude: nasal vowels → two-char markers
    s = word.replace("ã", "a~").replace("õ", "o~")

    pv = spanish_rv(s, _V)
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def rv(pos):
        return pos >= pv

    def r2(pos):
        return pos >= p2

    def standard_suffix() -> bool:
        nonlocal s
        for suf, cls in _STD:
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if cls == 5:
                if not st >= p1:
                    return False
                s = s[:st]
                for suf2, sub in (("iv", 1), ("ic", 0), ("ad", 0),
                                  ("os", 0)):
                    if s.endswith(suf2) and r2(len(s) - 2):
                        s = s[:-2]
                        if sub and s.endswith("at") and r2(len(s) - 2):
                            s = s[:-2]
                        break
            elif cls == 9:
                if not (rv(st) and st >= 1 and s[st - 1] == "e"):
                    return False
                s = s[:st] + "ir"
            elif not r2(st):
                return False
            elif cls == 2:
                s = s[:st] + "log"
            elif cls == 3:
                s = s[:st] + "u"
            elif cls == 4:
                s = s[:st] + "ente"
            else:
                s = s[:st]
                if cls == 6:
                    for suf2 in ("ante", "avel", "ível"):
                        if s.endswith(suf2) and r2(len(s) - 4):
                            s = s[:-4]
                            break
                elif cls == 7:
                    for suf2 in ("abil", "ic", "iv"):
                        if s.endswith(suf2) and r2(len(s) - len(suf2)):
                            s = s[: -len(suf2)]
                            break
                elif cls == 8:
                    if s.endswith("at") and r2(len(s) - 2):
                        s = s[:-2]
            return True
        return False

    def verb_suffix() -> bool:
        nonlocal s
        for suf, _ in _VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                s = s[: -len(suf)]
                return True
        return False

    if standard_suffix() or verb_suffix():
        # trailing i after c, i inside RV
        if s.endswith("ci") and rv(len(s) - 1):
            s = s[:-1]
    else:
        for suf in _RESIDUAL:
            if s.endswith(suf) and rv(len(s) - len(suf)):
                s = s[: -len(suf)]
                break

    # residual_form: final e/é/ê in RV (+ gu/ci undouble), ç → c
    if s.endswith(("e", "é", "ê")):
        st = len(s) - 1
        if rv(st):
            s = s[:st]
            if s.endswith("gu") and rv(len(s) - 1):
                s = s[:-1]
            elif s.endswith("ci") and rv(len(s) - 1):
                s = s[:-1]
    elif s.endswith("ç"):
        s = s[:-1] + "c"

    return s.replace("a~", "ã").replace("o~", "õ")
