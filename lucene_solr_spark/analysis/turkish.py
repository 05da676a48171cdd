"""Turkish analysis: Turkish-specific lowercase + the Çilden Snowball
stemmer.

Reference chain (TurkishAnalyzer.java:125-131): StandardTokenizer →
TurkishLowerCaseFilter (dotted/dotless i, combining-dot-above handling) →
Stop(tr/stopwords.txt, '#') → SnowballFilter(TurkishStemmer).

turkish_stem re-derives the generated TurkishStemmer.java:19-3150 with a
tiny backward-cursor engine mirroring the snowball runtime: vowel-harmony
checks, the optional n/s/y consonant and U vowel markers, the nominal-verb
and noun suffix cascades with the recursive ki-chain, and the postlude
(reserved words, final-consonant devoicing undone, U appended after d/g).
SnowballFilter ignores stem()'s boolean — the buffer state at whatever
point the pipeline stopped IS the output (SnowballFilter.java:90-99).
Fuzz-verified byte-identical via tools/stemmer_oracle.py and the
TestSnowballVocabData.zip turkish vocabulary.
"""

from __future__ import annotations

_VOWEL = frozenset("aeiouöüı")
_U = frozenset("iuüı")
_V1 = frozenset("aouı")   # after a
_V2 = frozenset("eiöü")   # after e
_V3 = frozenset("aı")     # after ı
_V4 = frozenset("ei")     # after i
_V5 = frozenset("ou")     # after o/u
_V6 = frozenset("öü")     # after ö/ü
_HARMONY_GROUP = {"a": _V1, "e": _V2, "ı": _V3, "i": _V4,
                  "o": _V5, "ö": _V6, "u": _V5, "ü": _V6}

_POSSESSIVES = ("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız",
                "m", "n")  # a_0, longest-first
_LARI = ("leri", "ları")
_NU = ("ni", "nu", "nü", "nı")
_NUN = ("in", "un", "ün", "ın")
_YA = ("a", "e")
_NA = ("na", "ne")
_DA = ("da", "ta", "de", "te")
_NDA = ("nda", "nde")
_DAN = ("dan", "tan", "den", "ten")
_NDAN = ("ndan", "nden")
_YLA = ("la", "le")
_NCA = ("ca", "ce")
_YUM = ("im", "um", "üm", "ım")
_SUN = ("sin", "sun", "sün", "sın")
_YUZ = ("iz", "uz", "üz", "ız")
_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
_LAR = ("lar", "ler")
_NUZ = ("niz", "nuz", "nüz", "nız")
_DUR = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_CASINA = ("casına", "cesine")
_YDU = ("dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
        "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
        "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
        "di", "ti", "du", "tu", "dü", "tü", "dı", "tı")
_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_YMUS = ("miş", "muş", "müş", "mış")


class _T:
    __slots__ = ("s", "c", "lb")

    def __init__(self, word: str):
        self.s = word
        self.c = len(word)
        self.lb = 0

    # --- backward primitives ------------------------------------------------
    def eq_b(self, lit: str) -> bool:
        n = len(lit)
        if self.c - self.lb >= n and self.s[self.c - n: self.c] == lit:
            self.c -= n
            return True
        return False

    def among_b(self, lits: tuple[str, ...]) -> bool:
        for lit in lits:
            if self.eq_b(lit):
                return True
        return False

    def delete_to(self, ket: int) -> None:
        """slice_del of s[self.c : ket] (bra = cursor)."""
        self.s = self.s[: self.c] + self.s[ket:]

    # snowball saves cursor positions as DISTANCE FROM THE END
    # (v = limit - cursor), so a restore after a deletion lands at the
    # same distance from the new, shorter end.
    def save(self) -> int:
        return len(self.s) - self.c

    def restore(self, v: int) -> None:
        self.c = len(self.s) - v


def _harmony(t: _T) -> bool:
    """check_vowel_harmony (TurkishStemmer.java r_check_vowel_harmony):
    test-wrapped — cursor restored."""
    c0 = t.save()
    try:
        i = t.c
        while i > t.lb and t.s[i - 1] not in _VOWEL:
            i -= 1
        if i <= t.lb:
            return False
        group = _HARMONY_GROUP[t.s[i - 1]]
        i -= 1
        while i > t.lb and t.s[i - 1] not in group:
            i -= 1
        return i > t.lb
    finally:
        t.restore(c0)


def _opt_cons(t: _T, ch: str) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant: consume the optional
    consonant when present-and-valid; fail when present-and-invalid."""
    if t.c - t.lb >= 1 and t.s[t.c - 1] == ch:
        if t.c - t.lb >= 2 and t.s[t.c - 2] in _VOWEL:
            t.c -= 1
            return True
        return False
    return t.c - t.lb >= 2 and t.s[t.c - 2] in _VOWEL


def _opt_u(t: _T) -> bool:
    """mark_suffix_with_optional_U_vowel."""
    if t.c - t.lb >= 1 and t.s[t.c - 1] in _U:
        if t.c - t.lb >= 2 and t.s[t.c - 2] not in _VOWEL:
            t.c -= 1
            return True
        return False
    return t.c - t.lb >= 2 and t.s[t.c - 2] not in _VOWEL


# --- mark_* routines: True = matched (cursor consumed), False = restored ----

def _attempt(t: _T, fn) -> bool:
    v = t.save()
    if fn(t):
        return True
    t.restore(v)
    return False


def _mk_possessives(t):
    return t.among_b(_POSSESSIVES) and _opt_u(t)


def _mk_sU(t):
    if not _harmony(t):
        return False
    if t.c - t.lb >= 1 and t.s[t.c - 1] in _U:
        t.c -= 1
        return _opt_cons(t, "s")
    return False


def _mk_lArI(t):
    return t.among_b(_LARI)


def _mk_yU(t):
    if not _harmony(t):
        return False
    if t.c - t.lb >= 1 and t.s[t.c - 1] in _U:
        t.c -= 1
        return _opt_cons(t, "y")
    return False


def _mk_nU(t):
    return _harmony(t) and t.among_b(_NU)


def _mk_nUn(t):
    return _harmony(t) and t.among_b(_NUN) and _opt_cons(t, "n")


def _mk_yA(t):
    return _harmony(t) and t.among_b(_YA) and _opt_cons(t, "y")


def _mk_nA(t):
    return _harmony(t) and t.among_b(_NA)


def _mk_DA(t):
    return _harmony(t) and t.among_b(_DA)


def _mk_ndA(t):
    return _harmony(t) and t.among_b(_NDA)


def _mk_DAn(t):
    return _harmony(t) and t.among_b(_DAN)


def _mk_ndAn(t):
    return _harmony(t) and t.among_b(_NDAN)


def _mk_ylA(t):
    return _harmony(t) and t.among_b(_YLA) and _opt_cons(t, "y")


def _mk_ki(t):
    return t.eq_b("ki")


def _mk_ncA(t):
    return _harmony(t) and t.among_b(_NCA) and _opt_cons(t, "n")


def _mk_yUm(t):
    return _harmony(t) and t.among_b(_YUM) and _opt_cons(t, "y")


def _mk_sUn(t):
    return _harmony(t) and t.among_b(_SUN)


def _mk_yUz(t):
    return _harmony(t) and t.among_b(_YUZ) and _opt_cons(t, "y")


def _mk_sUnUz(t):
    return t.among_b(_SUNUZ)


def _mk_lAr(t):
    return _harmony(t) and t.among_b(_LAR)


def _mk_nUz(t):
    return _harmony(t) and t.among_b(_NUZ)


def _mk_DUr(t):
    return _harmony(t) and t.among_b(_DUR)


def _mk_cAsInA(t):
    return t.among_b(_CASINA)


def _mk_yDU(t):
    return _harmony(t) and t.among_b(_YDU) and _opt_cons(t, "y")


def _mk_ysA(t):
    return t.among_b(_YSA) and _opt_cons(t, "y")


def _mk_ymUs(t):
    return _harmony(t) and t.among_b(_YMUS) and _opt_cons(t, "y")


def _mk_yken(t):
    return t.eq_b("ken") and _opt_cons(t, "y")


def _or(t: _T, *fns) -> bool:
    for fn in fns:
        if _attempt(t, fn):
            return True
    return False


def _stem_nominal_verb_suffixes(t: _T) -> tuple[bool, bool]:
    """returns (matched, continue_stemming_noun_suffixes)."""
    ket = t.c
    cont = True
    c0 = t.save()

    # branch 1: ymUs_ / yDU / ysA / yken
    if _or(t, _mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken):
        t.delete_to(ket)
        return True, cont
    t.restore(c0)

    # branch 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|ymUs_)? wait: cAsInA then
    # optional-or chain then ymUs_
    def b2(t):
        if not _attempt(t, _mk_cAsInA):
            return False
        _or(t, _mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz)
        return _attempt(t, _mk_ymUs)
    if _attempt(t, b2):
        t.delete_to(ket)
        return True, cont
    t.restore(c0)

    # branch 3: lAr ] delete try([ (DUr|yDU|ysA|ymUs_)) unset-continue
    if _attempt(t, _mk_lAr):
        t.delete_to(ket)
        ket2 = t.c
        c1 = t.save()
        if _or(t, _mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs):
            t.delete_to(ket2)
        else:
            t.restore(c1)
        cont = False
        t.delete_to(t.c)  # final ] delete is a no-op span here
        return True, cont
    t.restore(c0)

    # branch 4: nUz (yDU|ysA)
    def b4(t):
        return _attempt(t, _mk_nUz) and _or(t, _mk_yDU, _mk_ysA)
    if _attempt(t, b4):
        t.delete_to(ket)
        return True, cont
    t.restore(c0)

    # branch 5: (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_)
    if _or(t, _mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm):
        t.delete_to(ket)
        ket2 = t.c
        c1 = t.save()
        if _attempt(t, _mk_ymUs):
            t.delete_to(ket2)
        else:
            t.restore(c1)
        return True, cont
    t.restore(c0)

    # branch 6: DUr ] delete try([ ((sUnUz|lAr|yUm|sUn|yUz)? ymUs_))
    if _attempt(t, _mk_DUr):
        t.delete_to(ket)
        ket2 = t.c
        c1 = t.save()

        def b6try(t):
            _or(t, _mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz)
            return _attempt(t, _mk_ymUs)
        if _attempt(t, b6try):
            t.delete_to(ket2)
        else:
            t.restore(c1)
        return True, cont

    t.restore(c0)
    return False, cont


def _chain_ki(t: _T) -> bool:
    """stem_suffix_chain_before_ki (recursive)."""
    ket = t.c
    if not _attempt(t, _mk_ki):
        return False

    c0 = t.save()
    # branch A: DA
    if _attempt(t, _mk_DA):
        t.delete_to(ket)
        # try:
        cket = t.c
        c1 = t.save()

        def try_a(t):
            # (lAr ] delete try(chain)) or (possessives ] delete
            #   try([ lAr ] delete chain))
            ca = t.save()
            if _attempt(t, _mk_lAr):
                t.delete_to(cket)
                c2 = t.save()
                if not _chain_ki(t):
                    t.restore(c2)
                return True
            t.restore(ca)
            if _attempt(t, _mk_possessives):
                t.delete_to(cket)
                k2 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k2)
                    if not _chain_ki(t):
                        t.restore(c2)
                        # restore deletions? snowball cursor-only restore;
                        # the slice already happened — but lAr's slice has
                        # modified s; mirror generated: restore cursor only
                else:
                    t.restore(c2)
                return True
            return False
        if not _attempt(t, try_a):
            t.restore(c1)
        return True
    t.restore(c0)

    # branch B: nUn
    if _attempt(t, _mk_nUn):
        t.delete_to(ket)
        cket = t.c
        c1 = t.save()

        def try_b(t):
            ca = t.save()
            if _attempt(t, _mk_lArI):
                t.delete_to(cket)
                return True
            t.restore(ca)
            # ([ (possessives|sU) ] delete try([ lAr ] delete chain))
            k2 = t.c
            if _or(t, _mk_possessives, _mk_sU):
                t.delete_to(k2)
                k3 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k3)
                    if not _chain_ki(t):
                        t.restore(c2)
                else:
                    t.restore(c2)
                return True
            t.restore(ca)
            return _chain_ki(t)
        if not _attempt(t, try_b):
            t.restore(c1)
        return True
    t.restore(c0)

    # branch C: ndA
    if _attempt(t, _mk_ndA):
        def c_body(t):
            ca = t.save()
            if _attempt(t, _mk_lArI):
                t.delete_to(ket)
                return True
            t.restore(ca)
            if _attempt(t, _mk_sU):
                t.delete_to(ket)
                k2 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k2)
                    if not _chain_ki(t):
                        t.restore(c2)
                else:
                    t.restore(c2)
                return True
            t.restore(ca)
            return _chain_ki(t)
        return c_body(t)
    t.restore(c0)
    return False


def _stem_noun_suffixes(t: _T) -> bool:
    c0 = t.save()

    # 1: [ lAr ] delete try(chain_ki)
    ket = t.c
    if _attempt(t, _mk_lAr):
        t.delete_to(ket)
        c1 = t.save()
        if not _chain_ki(t):
            t.restore(c1)
        return True
    t.restore(c0)

    # 2: [ ncA ] delete try( lArI-del | ([(poss|sU)] del try([lAr] del
    #    chain)) | ([lAr] del chain) )
    if _attempt(t, _mk_ncA):
        t.delete_to(ket)
        c1 = t.save()

        def t2(t):
            k2 = t.c
            ca = t.save()
            if _attempt(t, _mk_lArI):
                t.delete_to(k2)
                return True
            t.restore(ca)
            if _or(t, _mk_possessives, _mk_sU):
                t.delete_to(k2)
                k3 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k3)
                    if not _chain_ki(t):
                        t.restore(c2)
                else:
                    t.restore(c2)
                return True
            t.restore(ca)
            if _attempt(t, _mk_lAr):
                t.delete_to(k2)
                if _chain_ki(t):
                    return True
                return False  # restore handled by _attempt
            return False
        if not _attempt(t, t2):
            t.restore(c1)
        return True
    t.restore(c0)

    # 3: [ (ndA|nA) ( lArI-del | (sU del try([lAr] del chain)) | chain )
    if _or(t, _mk_ndA, _mk_nA):
        def t3(t):
            ca = t.save()
            if _attempt(t, _mk_lArI):
                t.delete_to(ket)
                return True
            t.restore(ca)
            if _attempt(t, _mk_sU):
                t.delete_to(ket)
                k2 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k2)
                    if not _chain_ki(t):
                        t.restore(c2)
                else:
                    t.restore(c2)
                return True
            t.restore(ca)
            return _chain_ki(t)
        if t3(t):
            return True
    t.restore(c0)

    # 4: [ (ndAn|nU) ( (sU del try([lAr] del chain)) | lArI-del )
    if _or(t, _mk_ndAn, _mk_nU):
        def t4(t):
            ca = t.save()
            if _attempt(t, _mk_sU):
                t.delete_to(ket)
                k2 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k2)
                    if not _chain_ki(t):
                        t.restore(c2)
                else:
                    t.restore(c2)
                return True
            t.restore(ca)
            if _attempt(t, _mk_lArI):
                t.delete_to(ket)
                return True
            return False
        if t4(t):
            return True
    t.restore(c0)

    # 5: [ DAn ] delete try([ (poss del try([lAr] del chain))
    #    | (lAr ] del try(chain)) | chain )
    if _attempt(t, _mk_DAn):
        t.delete_to(ket)
        c1 = t.save()

        def t5(t):
            k2 = t.c
            ca = t.save()
            if _attempt(t, _mk_possessives):
                t.delete_to(k2)
                k3 = t.c
                c2 = t.save()
                if _attempt(t, _mk_lAr):
                    t.delete_to(k3)
                    if not _chain_ki(t):
                        t.restore(c2)
                else:
                    t.restore(c2)
                return True
            t.restore(ca)
            if _attempt(t, _mk_lAr):
                t.delete_to(k2)
                c2 = t.save()
                if not _chain_ki(t):
                    t.restore(c2)
                return True
            t.restore(ca)
            return _chain_ki(t)
        if not _attempt(t, t5):
            t.restore(c1)
        return True
    t.restore(c0)

    # 6: [ (nUn|ylA) ] delete try( ([lAr] del chain-required)
    #    | ([(poss|sU)] del try([lAr] del chain)) | chain )
    if _or(t, _mk_nUn, _mk_ylA):
        t.delete_to(ket)
        c1 = t.save()

        def t6(t):
            ca = t.save()

            def t6a(t):
                k2 = t.c
                if _attempt(t, _mk_lAr):
                    t.delete_to(k2)
                    return _chain_ki(t)
                return False
            if _attempt(t, t6a):
                return True
            t.restore(ca)

            def t6b(t):
                k2 = t.c
                if _or(t, _mk_possessives, _mk_sU):
                    t.delete_to(k2)
                    k3 = t.c
                    c2 = t.save()
                    if _attempt(t, _mk_lAr):
                        t.delete_to(k3)
                        if not _chain_ki(t):
                            t.restore(c2)
                    else:
                        t.restore(c2)
                    return True
                return False
            if _attempt(t, t6b):
                return True
            t.restore(ca)
            return _chain_ki(t)
        if not _attempt(t, t6):
            t.restore(c1)
        return True
    t.restore(c0)

    # 7: [ lArI ] delete
    if _attempt(t, _mk_lArI):
        t.delete_to(ket)
        return True
    t.restore(c0)

    # 8: chain_ki
    if _chain_ki(t):
        return True
    t.restore(c0)

    # 9: [ (DA|yU|yA) ] delete try([ ((poss ] del try([ lAr)) | lAr)
    #    ] delete [ chain-required )
    if _or(t, _mk_DA, _mk_yU, _mk_yA):
        t.delete_to(ket)
        c1 = t.save()

        def t9(t):
            k2 = t.c
            ca = t.save()
            if _attempt(t, _mk_possessives):
                t.delete_to(k2)
                k3 = t.c          # '[' inside the inner try
                c2 = t.save()
                if not _attempt(t, _mk_lAr):
                    t.restore(c2)
                # '] delete' with ket = k3: removes the lAr span (no-op
                # when lAr did not match)
                t.delete_to(k3)
            else:
                t.restore(ca)
                if not _attempt(t, _mk_lAr):
                    return False
                t.delete_to(k2)
            return _chain_ki(t)
        if not _attempt(t, t9):
            t.restore(c1)
        return True
    t.restore(c0)

    # 10: [ (poss|sU) ] delete try([ lAr ] delete chain)
    if _or(t, _mk_possessives, _mk_sU):
        t.delete_to(ket)
        k2 = t.c
        c1 = t.save()
        if _attempt(t, _mk_lAr):
            t.delete_to(k2)
            if not _chain_ki(t):
                t.restore(c1)
        else:
            t.restore(c1)
        return True
    t.restore(c0)
    return False


def _post_process_last_consonants(t: _T) -> bool:
    m = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if t.c > t.lb and t.s[t.c - 1] in m:
        t.s = t.s[: t.c - 1] + m[t.s[t.c - 1]] + t.s[t.c:]
        return True
    return False


def _append_u(t: _T) -> bool:
    s = t.s
    if not (s and s[-1] in ("d", "g")):
        return False
    # nearest vowel scanning back from the end
    i = len(s)
    while i > 0 and s[i - 1] not in _VOWEL:
        i -= 1
    if i <= 0:
        return False
    v = s[i - 1]
    if v in ("a", "ı"):
        t.s = s + "ı"
    elif v in ("e", "i"):
        t.s = s + "i"
    elif v in ("o", "u"):
        t.s = s + "u"
    else:  # ö/ü
        t.s = s + "ü"
    return True


def turkish_stem(word: str) -> str:
    # more_than_one_syllable_word: at least two vowels
    if sum(1 for ch in word if ch in _VOWEL) <= 1:
        return word

    t = _T(word)
    matched, cont = _stem_nominal_verb_suffixes(t)
    if not cont:
        return t.s
    t.c = len(t.s)
    _stem_noun_suffixes(t)

    # postlude
    if t.s == "ad" or t.s == "soyad":  # is_reserved_word (exact matches)
        return t.s
    t.c = len(t.s)
    t.lb = 0
    _append_u(t)
    t.c = len(t.s)
    _post_process_last_consonants(t)
    return t.s


# --- TurkishLowerCaseFilter (TurkishLowerCaseFilter.java:53-110) -------------

_COMBINING_DOT = "̇"


def turkish_lower(token: str) -> str:
    """İ→i, I→ı (unless followed by combining dot above → i), combining
    dots after I removed; the iOrAfter state tracks I + trailing
    non-spacing marks."""
    import unicodedata

    from .analyzer import _java_lower

    out: list[str] = []
    i_or_after = False
    for ch in token:
        i_or_after = ch == "I" or (
            i_or_after and unicodedata.category(ch) == "Mn")
        if i_or_after:
            if ch == _COMBINING_DOT:
                continue
            if ch == "I":
                out.append("__I__")  # resolved below via lookahead marker
                continue
        out.append(_java_lower(ch))
    # resolve I: small i when a combining dot above follows (through other
    # NSMs), else dotless ı — do a second pass over the ORIGINAL token
    if "__I__" not in out:
        return "".join(out)
    res: list[str] = []
    src = list(token)
    oi = 0
    for piece in out:
        if piece != "__I__":
            res.append(piece)
            continue
        # find this I's position in the source
        while src[oi] != "I":
            oi += 1
        j = oi + 1
        dotted = False
        while j < len(src) and unicodedata.category(src[j]) == "Mn":
            if src[j] == _COMBINING_DOT:
                dotted = True
                break
            j += 1
        res.append("i" if dotted else "ı")
        oi += 1
    return "".join(res)
