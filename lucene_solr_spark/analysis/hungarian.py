"""Hungarian Snowball stemmer.

Reference chain (HungarianAnalyzer.java:123-129): StandardTokenizer →
LowerCase → Stop(hungarian_stop.txt) → SnowballFilter(HungarianStemmer).
Re-derived from the published snowball algorithm
(snowballstem.org/algorithms/hungarian/stemmer.html); tables read as data
from the generated HungarianStemmer.java:19-243. NOTE: the 4.4 generated
tables carry the old-encoding artifacts õ (U+00F5) / û (U+00FB) where
modern Hungarian writes ő/ű — kept verbatim for byte parity with the
reference. Verified byte-identical on the TestSnowballVocabData.zip
hungarian vocabulary and 30k-word oracle fuzz.

Every rule: unrestricted longest suffix match, R1 check at the suffix
start (failure kills the rule — no shorter-suffix fallback), then a
delete / <-'a' / <-'e' action; instrum and factive additionally require a
doubled consonant before the suffix and undouble it afterwards.
"""

from __future__ import annotations

from .snowball import sort_table

_V = frozenset("aeiouáéíóõöúûü")
_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")  # a_0
_DOUBLES = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs", "bb", "cc",
            "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
            "ss", "tt", "vv", "zz")  # a_2
_CASE = sort_table([(s, 1) for s in (
    "ba ra be re ig nak nek val vel ul nál nél ból ról tól bõl rõl tõl ül "
    "n an ban en ben képpen on ön képp kor t at et ként anként enként "
    "onként ot ért öt hez hoz höz vá vé").split()])
_CASE_SPECIAL = sort_table([("án", "a"), ("én", "e"), ("ánként", "a")])
_CASE_OTHER = sort_table([("astul", ""), ("estül", ""), ("stul", ""),
                          ("stül", ""), ("ástul", "a"), ("éstül", "e")])
_OWNED = sort_table([
    ("aké", ""), ("eké", ""), ("oké", ""), ("öké", ""), ("éké", "e"),
    ("áké", "a"), ("ké", ""), ("ééi", "e"), ("áéi", "a"), ("éi", ""),
    ("éé", "e"), ("é", ""),
])
_SING_OWNER = sort_table([
    ("unk", ""), ("ünk", ""), ("ánk", "a"), ("énk", "e"), ("nk", ""),
    ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""), ("uk", ""),
    ("ük", ""), ("am", ""), ("em", ""), ("om", ""), ("ám", "a"),
    ("ém", "e"), ("m", ""), ("ad", ""), ("ed", ""), ("od", ""),
    ("öd", ""), ("ád", "a"), ("éd", "e"), ("d", ""), ("ja", ""),
    ("je", ""), ("a", ""), ("e", ""), ("o", ""), ("á", "a"), ("é", "e"),
])
_PLUR_OWNER = sort_table([
    ("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"), ("aim", ""),
    ("eim", ""), ("im", ""), ("jaid", ""), ("jeid", ""), ("áid", "a"),
    ("éid", "e"), ("aid", ""), ("eid", ""), ("id", ""), ("jai", ""),
    ("jei", ""), ("ái", "a"), ("éi", "e"), ("ai", ""), ("ei", ""),
    ("i", ""), ("jaink", ""), ("jeink", ""), ("áink", "a"), ("éink", "e"),
    ("aink", ""), ("eink", ""), ("ink", ""), ("jaitok", ""),
    ("jeitek", ""), ("áitok", "a"), ("éitek", "e"), ("aitok", ""),
    ("eitek", ""), ("itek", ""), ("jaik", ""), ("jeik", ""), ("áik", "a"),
    ("éik", "e"), ("aik", ""), ("eik", ""), ("ik", ""),
])
_PLURAL = sort_table([("ák", "a"), ("ék", "e"), ("ök", ""), ("ok", ""),
                      ("ek", ""), ("ak", ""), ("k", "")])


def _mark_r1(s: str) -> int:
    """HungarianStemmer.java:246-327: word starts with a vowel → after the
    first non-vowel (consuming a whole consonant digraph); starts with a
    non-vowel → after the first vowel."""
    n = len(s)
    if n == 0:
        return 0
    if s[0] in _V:
        i = 1
        while i < n and s[i] in _V:
            i += 1
        if i >= n:
            return n
        for d in _DIGRAPHS:
            if s.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 1
    while i < n and s[i] not in _V:
        i += 1
    return n if i >= n else i + 1


def _ends_double(s: str) -> bool:
    return s.endswith(_DOUBLES)


def _undouble(s: str) -> str:
    """drop the second-to-last char (HungarianStemmer.java:388-411):
    ll → l, ccs → cs, ssz → sz."""
    return s[:-2] + s[-1] if len(s) >= 2 else s


def hungarian_stem(word: str) -> str:
    s = word
    p1 = _mark_r1(s)

    def longest(table):
        for suf, rep in table:
            if s.endswith(suf):
                return suf, rep
        return None

    # instrum (:414-459): al/el in R1 after a doubled consonant
    for suf in ("al", "el"):
        if s.endswith(suf) and len(s) - 2 >= p1 and _ends_double(s[:-2]):
            s = _undouble(s[:-2])
            break

    # case (:462-485): big case-ending list → delete, then á/é → a/e
    m = longest(_CASE)
    if m is not None and len(s) - len(m[0]) >= p1:
        s = s[: -len(m[0])]
        if s.endswith("á") and len(s) - 1 >= p1:
            s = s[:-1] + "a"
        elif s.endswith("é") and len(s) - 1 >= p1:
            s = s[:-1] + "e"

    # case_special (:488-525) / case_other (:528-570)
    m = longest(_CASE_SPECIAL)
    if m is not None and len(s) - len(m[0]) >= p1:
        s = s[: -len(m[0])] + m[1]
    m = longest(_CASE_OTHER)
    if m is not None and len(s) - len(m[0]) >= p1:
        s = s[: -len(m[0])] + m[1]

    # factive (:573-618): á/é in R1 after a doubled consonant
    for suf in ("á", "é"):
        if s.endswith(suf) and len(s) - 1 >= p1 and _ends_double(s[:-1]):
            s = _undouble(s[:-1])
            break

    # owned / sing_owner / plur_owner / plural (:621-1040)
    for table in (_OWNED, _SING_OWNER, _PLUR_OWNER, _PLURAL):
        m = longest(table)
        if m is not None and len(s) - len(m[0]) >= p1:
            s = s[: -len(m[0])] + m[1]

    return s
