"""Russian Snowball stemmer + analyzer chain.

Reference chain (RussianAnalyzer.java:152-163, matchVersion >= 3.1):
StandardTokenizer → LowerCase → Stop(russian_stop.txt) →
SnowballFilter(org.tartarus.snowball.ext.RussianStemmer).

The stemmer is a re-derivation of Dr. Martin Porter's PUBLISHED Russian
snowball algorithm (snowballstem.org/algorithms/russian/stemmer.html) — the
reference ships machine-generated code from the same definition
(RussianStemmer.java, 747 generated lines). Like the generated code, no
ё→е normalization is applied (the published algorithm assumes the input
text already writes е for ё; ё acts as a consonant if present).

Algorithm summary (all matching inside RV = the region after the first
vowel; longest match wins within each class; "group-1" endings additionally
require the char BEFORE the ending to be а or я, which stays):

  step 1: PERFECTIVE GERUND → delete and done with step 1; else delete
          REFLEXIVE (ся/сь) if present, then ADJECTIVAL (adjective ending,
          then optionally a participle), else VERB, else NOUN.
  step 2: delete a final и.
  step 3: delete DERIVATIONAL (ость/ост) when inside R2.
  step 4: нн → н; else SUPERLATIVE (ейше/ейш) deleted then нн → н;
          else delete a final ь.
"""

from __future__ import annotations

_VOWELS = frozenset("аеиоуыэюя")

# ending classes, each sorted longest-first at build time.
# group-1 entries (require preceding а/я) are flagged True.
_PERFECTIVE_GERUND = [
    ("в", True), ("вши", True), ("вшись", True),
    ("ив", False), ("ивши", False), ("ившись", False),
    ("ыв", False), ("ывши", False), ("ывшись", False),
]
_ADJECTIVE = [
    (s, False)
    for s in (
        "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их ых "
        "ую юю ая яя ою ею"
    ).split()
]
_PARTICIPLE = [
    ("ем", True), ("нн", True), ("вш", True), ("ющ", True), ("щ", True),
    ("ивш", False), ("ывш", False), ("ующ", False),
]
_VERB = [
    (s, True)
    for s in "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно".split()
] + [
    (s, False)
    for s in (
        "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло "
        "ено ят ует уют ит ыт ены ить ыть ишь ую ю"
    ).split()
]
_NOUN = [
    (s, False)
    for s in (
        "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием ем "
        "ам ом о у ах иях ях ы ь ию ью ю ия ья я"
    ).split()
]
_SUPERLATIVE = [("ейш", False), ("ейше", False)]
_DERIVATIONAL = [("ост", False), ("ость", False)]

for _cls in (_PERFECTIVE_GERUND, _ADJECTIVE, _PARTICIPLE, _VERB, _NOUN,
             _SUPERLATIVE, _DERIVATIONAL):
    _cls.sort(key=lambda p: -len(p[0]))


def _regions(word: str) -> tuple[int, int]:
    """(rv, r2) start offsets per the snowball definitions: RV begins after
    the first vowel; R1 after the first non-vowel that follows a vowel; R2
    is R1 applied again."""
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            rv = i + 1
            break

    def _r(after: int) -> int:
        for i in range(after, n - 1):
            if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
                return i + 2
        return n

    r1 = _r(0)
    r2 = _r(r1)
    return rv, r2


def _strip(word: str, rv: int, endings) -> str | None:
    """Longest matching ending whose whole match (incl. the group-1 а/я
    context char) lies in RV; returns the stripped word or None."""
    for suf, need_ay in endings:
        if not word.endswith(suf):
            continue
        cut = len(word) - len(suf)
        if need_ay:
            if cut == 0 or word[cut - 1] not in "ая":
                continue
            if cut - 1 < rv:  # context char must be in RV too
                continue
        elif cut < rv:
            continue
        return word[:cut]
    return None


def russian_stem(word: str) -> str:
    """Snowball Russian stem of a lowercased token (non-Cyrillic tokens
    pass through untouched, like SnowballFilter over a mixed stream)."""
    rv, r2 = _regions(word)
    if rv >= len(word):
        return word
    head, body = word[:rv], word[rv:]

    # --- step 1 (everything below operates on the RV suffix) -------------
    def strip_rv(w: str, endings) -> str | None:
        # w = full word; matching must stay inside RV
        return _strip(w, rv, endings)

    w = word
    s = strip_rv(w, _PERFECTIVE_GERUND)
    if s is not None:
        w = s
    else:
        s = strip_rv(w, [("ся", False), ("сь", False)])
        if s is not None:
            w = s
        s = strip_rv(w, _ADJECTIVE)
        if s is not None:
            w = s
            s = strip_rv(w, _PARTICIPLE)
            if s is not None:
                w = s
        else:
            s = strip_rv(w, _VERB)
            if s is not None:
                w = s
            else:
                s = strip_rv(w, _NOUN)
                if s is not None:
                    w = s

    # --- step 2: final и ---------------------------------------------------
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # --- step 3: derivational, must lie in R2 ------------------------------
    for suf, _ in _DERIVATIONAL:
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: len(w) - len(suf)]
            break

    # --- step 4 -------------------------------------------------------------
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        s = _strip(w, rv, _SUPERLATIVE)
        if s is not None:
            w = s
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w
