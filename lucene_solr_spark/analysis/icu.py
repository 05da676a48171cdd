"""ICU module: ICUFoldingFilter + ICUNormalizer2Filter equivalents.

Reference: lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUFoldingFilter.java:64 (a Normalizer2 in COMPOSE mode over custom
"utr30" data — UTR#30 character foldings + NFKC_CaseFold, built by ICU's
gennorm2 from the 8 source files in lucene/analysis/icu/src/data/utr30/,
see build.xml:61-83) and ICUNormalizer2Filter.java:47 (per-token
normalize with a quick-check fast path; factory modes nfc/nfkc/nfkc_cf,
compose or decompose — ICUNormalizer2FilterFactory.java:55).

This is NOT a port of ICU: it is a from-scratch Normalizer2 engine over
the same public gennorm2 *source text* the reference compiles to
utr30.nrm (extracted to utr30_data.py by tools/extract_utr30.py). The
engine implements the Unicode canonical algorithms (UAX#15): recursive
mapping closure for decomposition, Canonical Ordering by combining class,
and the Canonical Composition Algorithm (D117) restricted to the data's
round-trip pairs, plus algorithmic Hangul composition (L+V -> LV,
LV+T -> LVT; public arithmetic from UAX#15 §3.12).

gennorm2 multi-file semantics: later files override earlier ones per
codepoint. The reference's nfc.txt was pre-processed (its round-trips
through diacritics converted to tagged one-way mappings) so folded
accents never recompose; the stock "nfc"/"nfkc"/"nfkc_cf" modes restore
those tagged lines to round-trips, which reconstructs the unmodified
Unicode 6.1 data (validated against Python's unicodedata in
tests/test_icu.py under the normalization-stability policy).

Execution model: normalization is per-token Python, which is fine here
because the build path applies analysis per DISTINCT surface form per
Arrow batch (the factorized inverter, analysis/english.py design), not
per posting; `fold_series` is the Arrow-batch surface.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

# Hangul algorithmic composition constants (UAX#15 §3.12, public arithmetic)
_SBASE, _LBASE, _VBASE, _TBASE = 0xAC00, 0x1100, 0x1161, 0x11A7
_LCOUNT, _VCOUNT, _TCOUNT = 19, 21, 28
_NCOUNT = _VCOUNT * _TCOUNT  # 588
_SCOUNT = _LCOUNT * _NCOUNT  # 11172


class Normalizer2:
    """Compose-mode Unicode normalizer over gennorm2-style custom data.

    ``mappings`` maps cp -> (target str, is_twoway). A two-way mapping's
    target is exactly two codepoints and contributes a composition pair;
    one-way targets may be any length including empty (removal).
    """

    def __init__(self, ccc: Dict[int, int],
                 mappings: Dict[int, Tuple[str, bool]]):
        self._ccc = ccc
        self._map = mappings
        self._pairs: Dict[Tuple[int, int], int] = {}
        for cp, (target, twoway) in mappings.items():
            if twoway:
                if len(target) != 2:
                    raise ValueError(
                        f"round-trip mapping for U+{cp:04X} must be 2 cps")
                self._pairs[(ord(target[0]), ord(target[1]))] = cp
        self._decomp_cache: Dict[int, str] = {}
        self._safe_cache: Dict[int, bool] = {}
        self._pair_seconds = {b for (_, b) in self._pairs}

    # -- decomposition: recursive closure of the mapping ------------------

    def _decomp(self, cp: int) -> str:
        cached = self._decomp_cache.get(cp)
        if cached is not None:
            return cached
        entry = self._map.get(cp)
        if entry is None:
            if _SBASE <= cp < _SBASE + _SCOUNT:  # algorithmic Hangul (NFD)
                sindex = cp - _SBASE
                out = (chr(_LBASE + sindex // _NCOUNT)
                       + chr(_VBASE + (sindex % _NCOUNT) // _TCOUNT))
                if sindex % _TCOUNT:
                    out += chr(_TBASE + sindex % _TCOUNT)
            else:
                out = chr(cp)
        else:
            # cycle guard: mark in-progress; gennorm2 data is acyclic
            self._decomp_cache[cp] = chr(cp)
            out = "".join(self._decomp(ord(c)) for c in entry[0])
        self._decomp_cache[cp] = out
        return out

    # -- composition pair lookup (data pairs + algorithmic Hangul) --------

    def _pair(self, a: int, b: int) -> Optional[int]:
        p = self._pairs.get((a, b))
        if p is not None:
            return p
        if _LBASE <= a < _LBASE + _LCOUNT and _VBASE <= b < _VBASE + _VCOUNT:
            return (_SBASE
                    + ((a - _LBASE) * _VCOUNT + (b - _VBASE)) * _TCOUNT)
        if (_SBASE <= a < _SBASE + _SCOUNT
                and (a - _SBASE) % _TCOUNT == 0
                and _TBASE < b < _TBASE + _TCOUNT):
            return a + (b - _TBASE)
        return None

    # -- fast path: every cp inert and unable to compose rightward --------

    def _is_safe(self, cp: int) -> bool:
        cached = self._safe_cache.get(cp)
        if cached is None:
            cached = (cp not in self._map
                      and self._ccc.get(cp, 0) == 0
                      and cp not in self._pair_seconds
                      and not (_VBASE <= cp < _VBASE + _VCOUNT)
                      and not (_TBASE < cp < _TBASE + _TCOUNT))
            self._safe_cache[cp] = cached
        return cached
    # NOTE a safe cp may still be a pair FIRST (e.g. Hangul L) — that is
    # fine: composition only fires when the SECOND char is unsafe, which
    # already takes the slow path.

    # -- public API --------------------------------------------------------

    def normalize(self, s: str) -> str:
        safe = self._is_safe
        if all(safe(ord(c)) for c in s):
            return s
        decomposed = self._reorder(
            [ord(c) for ch in s for c in self._decomp(ord(ch))])
        return "".join(map(chr, self._compose(decomposed)))

    def decompose(self, s: str) -> str:
        """Decompose mode (NFD analog): closure + canonical ordering."""
        return "".join(map(chr, self._reorder(
            [ord(c) for ch in s for c in self._decomp(ord(ch))])))

    def _reorder(self, cps):
        # Canonical Ordering Algorithm: stable sort runs of ccc>0 by ccc
        ccc = self._ccc
        i, n = 0, len(cps)
        while i < n:
            if ccc.get(cps[i], 0) != 0:
                j = i
                while j < n and ccc.get(cps[j], 0) != 0:
                    j += 1
                if j - i > 1:
                    cps[i:j] = sorted(cps[i:j], key=lambda c: ccc.get(c, 0))
                i = j
            else:
                i += 1
        return cps

    def _compose(self, cps):
        # Canonical Composition Algorithm (UAX#15 D117): compose C with the
        # last starter L when C is not blocked (adjacent, or the char before
        # C has strictly smaller ccc).
        ccc = self._ccc
        out = []
        last_starter = -1
        for c in cps:
            cc = ccc.get(c, 0)
            if last_starter >= 0 and (
                    len(out) - 1 == last_starter
                    or ccc.get(out[-1], 0) < cc):
                p = self._pair(out[last_starter], c)
                if p is not None:
                    out[last_starter] = p
                    continue
            out.append(c)
            if cc == 0:
                last_starter = len(out) - 1
        return out


# -- data-layer merge ------------------------------------------------------

_NORMALIZERS: Dict[str, Normalizer2] = {}

_MODE_LAYERS = {
    "nfc": (["nfc"], True),
    "nfkc": (["nfc", "nfkc"], True),
    "nfkc_cf": (["nfc", "nfkc", "nfkc_cf"], True),
    "utr30": (None, False),  # all files, as shipped (tagged stay one-way)
}


def get_normalizer(name: str = "nfkc_cf") -> Normalizer2:
    """Build (and cache) a normalizer by factory name.

    nfc / nfkc / nfkc_cf reconstruct the stock Unicode 6.1 normalizers
    (ICUNormalizer2FilterFactory's `name` values); "utr30" is
    ICUFoldingFilter's folding normalizer.
    """
    norm = _NORMALIZERS.get(name)
    if norm is not None:
        return norm
    try:
        layer_names, restore_tagged = _MODE_LAYERS[name]
    except KeyError:
        raise ValueError(
            f"unknown normalizer {name!r}; one of {sorted(_MODE_LAYERS)}")
    from .utr30_data import DATA
    if layer_names is None:
        layer_names = DATA["file_order"]
    tagged = set(DATA["nfc_tagged"]) if restore_tagged else set()
    mappings: Dict[int, Tuple[str, bool]] = {}
    for layer in layer_names:
        tables = DATA["layers"][layer]
        for hx, target in tables["oneway"].items():
            twoway = restore_tagged and layer == "nfc" and hx in tagged
            mappings[int(hx, 16)] = (target, twoway)
        for hx, target in tables["twoway"].items():
            mappings[int(hx, 16)] = (target, True)
    ccc = {int(hx, 16): c for hx, c in DATA["ccc"].items()}
    norm = Normalizer2(ccc, mappings)
    _NORMALIZERS[name] = norm
    return norm


# -- filter surfaces -------------------------------------------------------

def fold(text: str) -> str:
    """ICUFoldingFilter: UTR#30 folding + NFKC_CaseFold of one token."""
    return get_normalizer("utr30").normalize(text)


def normalize_token(text: str, name: str = "nfkc_cf",
                    mode: str = "compose") -> str:
    """ICUNormalizer2Filter on one token (factory modes nfc/nfkc/nfkc_cf,
    compose|decompose — ICUNormalizer2FilterFactory.java:55)."""
    norm = get_normalizer(name)
    return norm.normalize(text) if mode == "compose" else norm.decompose(text)


def fold_series(series, name: str = "utr30"):
    """Arrow-batch surface: fold a pandas Series of strings (the
    per-distinct-surface-form hook of the factorized inverter)."""
    norm = get_normalizer(name)
    return series.map(lambda t: norm.normalize(t) if t is not None else None)


def fold_token_list(tokens, name: str = "utr30"):
    """Fold a token list, dropping tokens folded to empty (a token whose
    every cp is removed, e.g. a bare diacritic, produces no term —
    matches the reference filter emitting an empty term only for an
    empty input term)."""
    norm = get_normalizer(name)
    return [norm.normalize(t) for t in tokens]
