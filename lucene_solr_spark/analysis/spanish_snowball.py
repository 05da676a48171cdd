"""Spanish Snowball stemmer — the SnowballPorterFilterFactory
language="Spanish" stemmer (the default SpanishAnalyzer uses
SpanishLightStemmer, analysis/lang.py).

Re-derived from the published snowball algorithm; tables read as data from
the generated SpanishStemmer.java:19-160. Byte-identical on the
TestSnowballVocabData spanish vocabulary and 30k-word compiled-oracle fuzz.
"""

from __future__ import annotations

from .snowball import next_region, sort_table, spanish_rv

_V = frozenset("aeiouáéíóúü")
_POSTLUDE = str.maketrans("áéíóú", "aeiou")

_PRONOUNS = sort_table([(s, 0) for s in (
    "la sela le me se lo selo las selas les los selos nos").split()])
_PRON_PRE = sort_table([
    ("ando", 6), ("iendo", 6), ("yendo", 7), ("ándo", 2), ("iéndo", 1),
    ("ar", 6), ("er", 6), ("ir", 6), ("ár", 3), ("ér", 4), ("ír", 5),
])
_PRON_REP = {1: "iendo", 2: "ando", 3: "ar", 4: "er", 5: "ir"}
_STD = sort_table([
    ("ica", 1), ("ancia", 2), ("encia", 5), ("adora", 2), ("osa", 1),
    ("ista", 1), ("iva", 9), ("anza", 1), ("logía", 3), ("idad", 8),
    ("able", 1), ("ible", 1), ("ante", 2), ("mente", 7), ("amente", 6),
    ("ación", 2), ("ución", 4), ("ico", 1), ("ismo", 1), ("oso", 1),
    ("amiento", 1), ("imiento", 1), ("ivo", 9), ("ador", 2), ("icas", 1),
    ("ancias", 2), ("encias", 5), ("adoras", 2), ("osas", 1),
    ("istas", 1), ("ivas", 9), ("anzas", 1), ("logías", 3),
    ("idades", 8), ("ables", 1), ("ibles", 1), ("aciones", 2),
    ("uciones", 4), ("adores", 2), ("antes", 2), ("icos", 1),
    ("ismos", 1), ("osos", 1), ("amientos", 1), ("imientos", 1),
    ("ivos", 9),
])
_Y_VERB = sort_table([(s, 0) for s in (
    "ya ye yan yen yeron yendo yo yas yes yais yamos yó").split()])
_VERB = sort_table(
    [(s, 2) for s in (
        "aba ada ida ara iera ía aría ería iría ad ed id ase iese aste "
        "iste an aban aran ieran ían arían erían irían asen iesen aron "
        "ieron arán erán irán ado ido ando iendo ar er ir as abas adas "
        "idas aras ieras ías arías erías irías ases ieses abais arais "
        "ierais íais aríais eríais iríais aseis ieseis asteis isteis áis "
        "aréis eréis iréis ados idos amos ábamos áramos iéramos íamos "
        "aríamos eríamos iríamos aremos eremos iremos ásemos iésemos "
        "imos arás erás irás ís ará erá irá aré eré iré ió").split()]
    + [("en", 1), ("es", 1), ("éis", 1), ("emos", 1)]
)
_RESIDUAL = sort_table([("a", 1), ("o", 1), ("os", 1), ("á", 1),
                        ("í", 1), ("ó", 1), ("e", 2), ("é", 2)])


def spanish_snowball_stem(word: str) -> str:
    s = word
    pv = spanish_rv(s, _V)
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def rv(pos):
        return pos >= pv

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    # attached_pronoun (:66-90): pronoun + verb form; accented forms lose
    # the accent along with the pronoun, unaccented forms lose the pronoun
    for pron, _ in _PRONOUNS:
        if s.endswith(pron):
            rest = s[: -len(pron)]
            for suf, cls in _PRON_PRE:
                if rest.endswith(suf):
                    st = len(rest) - len(suf)
                    if rv(st):
                        if cls in _PRON_REP:
                            s = rest[:st] + _PRON_REP[cls]
                        elif cls == 6:
                            s = rest
                        elif st >= 1 and rest[st - 1] == "u":
                            s = rest
                    break
            break

    # do( standard_suffix OR y_verb_suffix OR verb_suffix )
    def standard_suffix() -> bool:
        nonlocal s
        for suf, cls in _STD:
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if cls == 6:
                if not r1(st):
                    return False
            elif not r2(st):
                return False
            if cls == 3:
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
                elif cls == 6:
                    if s.endswith("iv") and r2(len(s) - 2):
                        s = s[:-2]
                        if s.endswith("at") and r2(len(s) - 2):
                            s = s[:-2]
                    else:
                        for suf2 in ("os", "ic", "ad"):
                            if s.endswith(suf2) and r2(len(s) - 2):
                                s = s[:-2]
                                break
                elif cls == 7:
                    for suf2 in ("ante", "able", "ible"):
                        if s.endswith(suf2) and r2(len(s) - 4):
                            s = s[:-4]
                            break
                elif cls == 8:
                    for suf2 in ("abil", "ic", "iv"):
                        if s.endswith(suf2) and r2(len(s) - len(suf2)):
                            s = s[: -len(suf2)]
                            break
                elif cls == 9:
                    if s.endswith("at") and r2(len(s) - 2):
                        s = s[:-2]
            return True
        return False

    def y_verb_suffix() -> bool:
        nonlocal s
        for suf, _ in _Y_VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                st = len(s) - len(suf)
                if st >= 1 and s[st - 1] == "u":
                    s = s[:st]
                    return True
                return False
        return False

    def verb_suffix() -> bool:
        nonlocal s
        for suf, cls in _VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                st = len(s) - len(suf)
                if cls == 1 and st >= 2 and s[st - 1] == "u" \
                        and s[st - 2] == "g":
                    st -= 1  # gu + en/es/éis/emos loses the u too
                s = s[:st]
                return True
        return False

    if not standard_suffix():
        if not y_verb_suffix():
            verb_suffix()

    # residual_suffix (:204-212)
    for suf, cls in _RESIDUAL:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if rv(st):
                s = s[:st]
                if cls == 2 and s.endswith("gu") and rv(len(s) - 1):
                    s = s[:-1]
            break

    return s.translate(_POSTLUDE)
