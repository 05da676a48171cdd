"""French Snowball stemmer — SnowballPorterFilterFactory
language="French" (the default FrenchAnalyzer uses FrenchLightStemmer).

Re-derived from the published snowball algorithm; tables read as data from
the generated FrenchStemmer.java:19-235. Byte-identical on the
TestSnowballVocabData french vocabulary and 30k-word compiled-oracle fuzz.

Notable mechanics mirrored exactly: amment/emment/ment endings REWRITE
(ant/ent/delete) and then FAIL the standard_suffix rule, so the verb
suffix rules continue over the rewritten word; the un-marking postlude
restores I/U/Y.
"""

from __future__ import annotations

from .snowball import next_region, sort_table

_V = frozenset("aeiouyàâèéêëîïôùû")
_KEEP_WITH_S = frozenset("aiosuè")

_STD = sort_table([
    ("iqUe", 1), ("atrice", 2), ("ance", 1), ("ence", 5), ("logie", 3),
    ("able", 1), ("isme", 1), ("euse", 11), ("iste", 1), ("ive", 8),
    ("if", 8), ("usion", 4), ("ation", 2), ("ution", 4), ("ateur", 2),
    ("iqUes", 1), ("atrices", 2), ("ances", 1), ("ences", 5),
    ("logies", 3), ("ables", 1), ("ismes", 1), ("euses", 11),
    ("istes", 1), ("ives", 8), ("ifs", 8), ("usions", 4),
    ("ations", 2), ("utions", 4), ("ateurs", 2), ("ments", 15),
    ("ements", 6), ("issements", 12), ("ités", 7), ("ment", 15),
    ("ement", 6), ("issement", 12), ("amment", 13), ("emment", 14),
    ("aux", 10), ("eaux", 9), ("eux", 1), ("ité", 7),
])
_I_VERB = sort_table([(s, 1) for s in (
    "ira ie isse issante i irai ir iras ies îmes isses issantes îtes is "
    "irais issais irions issions irons issons issants it irait issait "
    "issant iraIent issaIent irent issent iront ît iriez issiez irez "
    "issez").split()])
_VERB = sort_table(
    [("ions", 1)]
    + [(s, 2) for s in (
        "era ée erai er eras ées erais erions erons és erait eraIent "
        "èrent eront ez iez eriez erez é").split()]
    + [(s, 3) for s in (
        "a asse ante ai as âmes asses antes âtes ais assions ants ait "
        "ant aIent assent ât assiez").split()]
)
_RESIDUAL = sort_table([
    ("e", 3), ("Ière", 2), ("ière", 2), ("ion", 1), ("Ier", 2),
    ("ier", 2), ("ë", 4),
])
_UN_DOUBLE = ("eill", "ell", "enn", "onn", "ett")


def french_snowball_stem(word: str) -> str:
    # prelude: u/i between vowels → U/I, y next to a vowel → Y, qu → qU
    w = list(word)
    n = len(w)
    j = 0
    while j < n:
        c = w[j]
        nxt = w[j + 1] if j + 1 < n else None
        if c in _V and nxt is not None:
            if nxt == "u" and j + 2 < n and w[j + 2] in _V:
                w[j + 1] = "U"
                continue
            if nxt == "i" and j + 2 < n and w[j + 2] in _V:
                w[j + 1] = "I"
                continue
            if nxt == "y":
                w[j + 1] = "Y"
                continue
        if c == "y" and nxt is not None and nxt in _V:
            w[j] = "Y"
            continue
        if c == "q" and nxt == "u":
            w[j + 1] = "U"
            continue
        j += 1
    s = "".join(w)

    # regions: pV = 3 after vowel-vowel or col/par/tap, else after the
    # first vowel past position 0
    n = len(s)
    pv = n
    if n >= 3 and s[0] in _V and s[1] in _V:
        pv = 3
    elif s.startswith(("col", "par", "tap")):
        pv = 3
    else:
        i = 1
        while i < n and s[i] not in _V:
            i += 1
        if i < n:
            pv = i + 1
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def rv(pos):
        return pos >= pv

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    def standard_suffix() -> bool:
        nonlocal s
        for suf, cls in _STD:
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if cls == 1:
                if not r2(st):
                    return False
                s = s[:st]
            elif cls == 2:
                if not r2(st):
                    return False
                s = s[:st]
                if s.endswith("ic"):
                    if r2(len(s) - 2):
                        s = s[:-2]
                    else:
                        s = s[:-2] + "iqU"
            elif cls == 3:
                if not r2(st):
                    return False
                s = s[:st] + "log"
            elif cls == 4:
                if not r2(st):
                    return False
                s = s[:st] + "u"
            elif cls == 5:
                if not r2(st):
                    return False
                s = s[:st] + "ent"
            elif cls == 6:
                if not rv(st):
                    return False
                s = s[:st]
                if s.endswith("iv") and r2(len(s) - 2):
                    s = s[:-2]
                    if s.endswith("at") and r2(len(s) - 2):
                        s = s[:-2]
                elif s.endswith("eus"):
                    if r2(len(s) - 3):
                        s = s[:-3]
                    elif r1(len(s) - 3):
                        s = s[:-3] + "eux"
                elif s.endswith(("abl", "iqU")) and r2(len(s) - 3):
                    s = s[:-3]
                elif s.endswith(("Ièr", "ièr")) and rv(len(s) - 3):
                    s = s[:-3] + "i"
            elif cls == 7:
                if not r2(st):
                    return False
                s = s[:st]
                if s.endswith("abil"):
                    if r2(len(s) - 4):
                        s = s[:-4]
                    else:
                        s = s[:-4] + "abl"
                elif s.endswith("ic"):
                    if r2(len(s) - 2):
                        s = s[:-2]
                    else:
                        s = s[:-2] + "iqU"
                elif s.endswith("iv") and r2(len(s) - 2):
                    s = s[:-2]
            elif cls == 8:
                if not r2(st):
                    return False
                s = s[:st]
                if s.endswith("at") and r2(len(s) - 2):
                    s = s[:-2]
                    if s.endswith("ic"):
                        if r2(len(s) - 2):
                            s = s[:-2]
                        else:
                            s = s[:-2] + "iqU"
            elif cls == 9:
                s = s[:st] + "eau"
            elif cls == 10:
                if not r1(st):
                    return False
                s = s[:st] + "al"
            elif cls == 11:
                if r2(st):
                    s = s[:st]
                elif r1(st):
                    s = s[:st] + "eux"
                else:
                    return False
            elif cls == 12:
                if not (r1(st) and st >= 1 and s[st - 1] not in _V):
                    return False
                s = s[:st]
            elif cls == 13:
                if not rv(st):
                    return False
                s = s[:st] + "ant"
                return False  # fail → verb rules continue
            elif cls == 14:
                if not rv(st):
                    return False
                s = s[:st] + "ent"
                return False
            else:  # 15: ment(s) after a vowel — RV tested AT the vowel
                if not (st >= 1 and s[st - 1] in _V and rv(st - 1)):
                    return False
                s = s[:st]
                return False
            return True
        return False

    def i_verb_suffix() -> bool:
        nonlocal s
        for suf, _ in _I_VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                st = len(s) - len(suf)
                # the preceding non-vowel must also sit inside RV
                if st - 1 >= pv and s[st - 1] not in _V:
                    s = s[:st]
                    return True
                return False
        return False

    def verb_suffix() -> bool:
        nonlocal s
        for suf, cls in _VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                st = len(s) - len(suf)
                if cls == 1:
                    if not r2(st):
                        return False
                    s = s[:st]
                elif cls == 2:
                    s = s[:st]
                else:
                    s = s[:st]
                    if s.endswith("e") and len(s) - 1 >= pv:
                        s = s[:-1]
                return True
        return False

    if standard_suffix() or i_verb_suffix() or verb_suffix():
        # try: final Y → i, or final ç → c
        if s.endswith("Y"):
            s = s[:-1] + "i"
        elif s.endswith("ç"):
            s = s[:-1] + "c"
    else:
        # residual_suffix: leading s-strip, then RV-limited endings
        if s.endswith("s") and len(s) >= 2 \
                and s[-2] not in _KEEP_WITH_S:
            s = s[:-1]
        for suf, cls in _RESIDUAL:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                st = len(s) - len(suf)
                if cls == 1:
                    if r2(st) and st - 1 >= pv \
                            and s[st - 1] in ("s", "t"):
                        s = s[:st]
                elif cls == 2:
                    s = s[:st] + "i"
                elif cls == 3:
                    s = s[:st]
                elif st >= 2 and s[st - 2: st] == "gu":
                    s = s[:st]
                break

    # un_double: ell/eill/enn/onn/ett → drop the last char
    if s.endswith(_UN_DOUBLE):
        s = s[:-1]

    # un_accent: é/è before 1+ trailing non-vowels → e
    i = len(s)
    while i > 0 and s[i - 1] not in _V:
        i -= 1
    if i < len(s) and i >= 1 and s[i - 1] in ("é", "è"):
        s = s[: i - 1] + "e" + s[i:]

    return s.translate({ord("I"): "i", ord("U"): "u", ord("Y"): "y"})
