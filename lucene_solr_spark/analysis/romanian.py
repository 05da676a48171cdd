"""Romanian Snowball stemmer.

Reference chain (RomanianAnalyzer.java:126-132): StandardTokenizer →
LowerCase → Stop(ro/stopwords.txt, '#') → SnowballFilter(RomanianStemmer).
Re-derived from the published snowball algorithm
(snowballstem.org/algorithms/romanian/stemmer.html); suffix tables read as
data from the generated RomanianStemmer.java:19-263 (the 4.4 tables use the
cedilla forms ş U+015F / ţ U+0163). Verified byte-identical on the
TestSnowballVocabData.zip romanian vocabulary and 30k-word oracle fuzz.

Shape: prelude (u/i between vowels → U/I, consonant markers), Spanish-style
RV + R1/R2, step_0 plural removal (R1), repeated combo_suffix (R1) +
standard_suffix (R2) with a removed-flag, verb_suffix (RV) only when no
standard suffix was removed, vowel_suffix (RV), postlude (U/I → u/i).
"""

from __future__ import annotations

from .snowball import next_region, sort_table

_V = frozenset("aeiouâîă")

_STEP0 = sort_table([
    ("ea", 3), ("aţia", 7), ("aua", 2), ("iua", 4), ("aţie", 7),
    ("ele", 3), ("ile", 5), ("iile", 4), ("iei", 4), ("atei", 6),
    ("ii", 4), ("ului", 1), ("ul", 1), ("elor", 3), ("ilor", 4),
    ("iilor", 4),
])
_COMBO = sort_table([
    ("icala", 4), ("iciva", 4), ("ativa", 5), ("itiva", 6), ("icale", 4),
    ("aţiune", 5), ("iţiune", 6), ("atoare", 5), ("itoare", 6),
    ("ătoare", 5), ("icitate", 4), ("abilitate", 1), ("ibilitate", 2),
    ("ivitate", 3), ("icive", 4), ("ative", 5), ("itive", 6), ("icali", 4),
    ("atori", 5), ("icatori", 4), ("itori", 6), ("ători", 5),
    ("icitati", 4), ("abilitati", 1), ("ivitati", 3), ("icivi", 4),
    ("ativi", 5), ("itivi", 6), ("icităi", 4), ("abilităi", 1),
    ("ivităi", 3), ("icităţi", 4), ("abilităţi", 1), ("ivităţi", 3),
    ("ical", 4), ("ator", 5), ("icator", 4), ("itor", 6), ("ător", 5),
    ("iciv", 4), ("ativ", 5), ("itiv", 6), ("icală", 4), ("icivă", 4),
    ("ativă", 5), ("itivă", 6),
])
_COMBO_REPL = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at", 6: "it"}
_STANDARD = sort_table([
    ("ica", 1), ("abila", 1), ("ibila", 1), ("oasa", 1), ("ata", 1),
    ("ita", 1), ("anta", 1), ("ista", 3), ("uta", 1), ("iva", 1),
    ("ic", 1), ("ice", 1), ("abile", 1), ("ibile", 1), ("isme", 3),
    ("iune", 2), ("oase", 1), ("ate", 1), ("itate", 1), ("ite", 1),
    ("ante", 1), ("iste", 3), ("ute", 1), ("ive", 1), ("ici", 1),
    ("abili", 1), ("ibili", 1), ("iuni", 2), ("atori", 1), ("osi", 1),
    ("ati", 1), ("itati", 1), ("iti", 1), ("anti", 1), ("isti", 3),
    ("uti", 1), ("işti", 3), ("ivi", 1), ("ităi", 1), ("oşi", 1),
    ("ităţi", 1), ("abil", 1), ("ibil", 1), ("ism", 3), ("ator", 1),
    ("os", 1), ("at", 1), ("it", 1), ("ant", 1), ("ist", 3), ("ut", 1),
    ("iv", 1), ("ică", 1), ("abilă", 1), ("ibilă", 1), ("oasă", 1),
    ("ată", 1), ("ită", 1), ("antă", 1), ("istă", 3), ("ută", 1),
    ("ivă", 1),
])
_VERB = sort_table([
    ("ea", 1), ("ia", 1), ("esc", 1), ("ăsc", 1), ("ind", 1), ("ând", 1),
    ("are", 1), ("ere", 1), ("ire", 1), ("âre", 1), ("se", 2), ("ase", 1),
    ("sese", 2), ("ise", 1), ("use", 1), ("âse", 1), ("eşte", 1),
    ("ăşte", 1), ("eze", 1), ("ai", 1), ("eai", 1), ("iai", 1),
    ("sei", 2), ("eşti", 1), ("ăşti", 1), ("ui", 1), ("ezi", 1),
    ("âi", 1), ("aşi", 1), ("seşi", 2), ("aseşi", 1), ("seseşi", 2),
    ("iseşi", 1), ("useşi", 1), ("âseşi", 1), ("işi", 1), ("uşi", 1),
    ("âşi", 1), ("aţi", 2), ("eaţi", 1), ("iaţi", 1), ("eţi", 2),
    ("iţi", 2), ("âţi", 2), ("arăţi", 1), ("serăţi", 2), ("aserăţi", 1),
    ("seserăţi", 2), ("iserăţi", 1), ("userăţi", 1), ("âserăţi", 1),
    ("irăţi", 1), ("urăţi", 1), ("ârăţi", 1), ("am", 1), ("eam", 1),
    ("iam", 1), ("em", 2), ("asem", 1), ("sesem", 2), ("isem", 1),
    ("usem", 1), ("âsem", 1), ("im", 2), ("âm", 2), ("ăm", 2),
    ("arăm", 1), ("serăm", 2), ("aserăm", 1), ("seserăm", 2),
    ("iserăm", 1), ("userăm", 1), ("âserăm", 1), ("irăm", 1),
    ("urăm", 1), ("ârăm", 1), ("au", 1), ("eau", 1), ("iau", 1),
    ("indu", 1), ("ându", 1), ("ez", 1), ("ească", 1), ("ară", 1),
    ("seră", 2), ("aseră", 1), ("seseră", 2), ("iseră", 1), ("useră", 1),
    ("âseră", 1), ("iră", 1), ("ură", 1), ("ârăm", 1), ("âră", 1),
    ("ează", 1),
])
_VOWEL_SUF = sort_table([("a", 1), ("e", 1), ("ie", 1), ("i", 1), ("ă", 1)])


def _mark_rv(s: str) -> int:
    """Spanish-family RV (RomanianStemmer.java:361-480)."""
    n = len(s)
    if n < 2:
        return n
    if s[0] in _V:
        if s[1] not in _V:
            i = 2
            while i < n and s[i] not in _V:
                i += 1
            return n if i >= n else i + 1  # after next vowel
        i = 2
        while i < n and s[i] in _V:
            i += 1
        return n if i >= n else i + 1      # after next non-vowel
    if s[1] not in _V:
        i = 2
        while i < n and s[i] not in _V:
            i += 1
        return n if i >= n else i + 1      # after next vowel
    return 3 if n > 2 else n               # consonant-vowel → after 3rd


def romanian_stem(word: str) -> str:
    # prelude (:278-334): u/i between vowels act as consonants
    w = list(word)
    n = len(w)
    for j in range(1, n - 1):
        if w[j - 1] in _V and w[j + 1] in _V:
            if w[j] == "u":
                w[j] = "U"
            elif w[j] == "i":
                w[j] = "I"
    s = "".join(w)

    pv = _mark_rv(s)
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def lsuf(table):
        """Longest match, UNRESTRICTED — the region test runs after among
        selection ([substring] ... call R1/R2/RV), so a region failure
        kills the rule instead of falling back to a shorter suffix."""
        for suf, cls in table:
            if s.endswith(suf):
                return suf, cls
        return None

    # step_0 (:631-699): suffix start must satisfy R1 after selection
    m = lsuf(_STEP0)
    if m is not None and len(s) - len(m[0]) >= p1:
        suf, cls = m
        st = len(s) - len(suf)
        if cls == 1:
            s = s[:st]
        elif cls == 2:
            s = s[:st] + "a"
        elif cls == 3:
            s = s[:st] + "e"
        elif cls == 4:
            s = s[:st] + "i"
        elif cls == 5:
            if s[st - 2: st] != "ab":
                s = s[:st] + "i"
        elif cls == 6:
            s = s[:st] + "at"
        elif cls == 7:
            s = s[:st] + "aţi"

    # standard_suffix (:767-831): repeat combo, then a_3 in R2
    removed = False
    while True:
        m = lsuf(_COMBO)
        if m is None or len(s) - len(m[0]) < p1:
            break
        suf, cls = m
        s = s[: len(s) - len(suf)] + _COMBO_REPL[cls]
        removed = True
    m = lsuf(_STANDARD)
    if m is not None and len(s) - len(m[0]) >= p2:
        suf, cls = m
        st = len(s) - len(suf)
        if cls == 1:
            s = s[:st]
            removed = True
        elif cls == 2:
            if st >= 1 and s[st - 1] == "ţ":
                s = s[: st - 1] + "t"
                removed = True
        else:  # 3
            s = s[:st] + "ist"
            removed = True

    # verb_suffix (:835-893) only when no standard suffix was removed;
    # suffix AND its gating char live inside RV (setlimit tomark pV)
    if not removed:
        for suf, cls in _VERB:
            st = len(s) - len(suf)
            if st < pv or not s.endswith(suf):
                continue
            if cls == 2:
                s = s[:st]
            elif st - 1 >= pv and (s[st - 1] not in _V or s[st - 1] == "u"):
                s = s[:st]
            break

    # vowel_suffix (:900-925): final a/e/ie/i/ă, RV-checked after selection
    m = lsuf(_VOWEL_SUF)
    if m is not None and len(s) - len(m[0]) >= pv:
        s = s[: len(s) - len(m[0])]

    # postlude (:557-589)
    return s.translate({ord("I"): "i", ord("U"): "u"})
