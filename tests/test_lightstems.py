"""Factory-only light/minimal stemmers vs the reference's own fixtures —
byte-identical on every pair (279k+ words across eight zips + the four
Norwegian tsv files)."""

from __future__ import annotations

import pathlib
import zipfile

import pytest

from lucene_solr_spark.analysis.lightstems import (
    BOKMAAL,
    NYNORSK,
    english_minimal_stem,
    finnish_light_stem,
    french_minimal_stem,
    galician_minimal_stem,
    german_minimal_stem,
    hungarian_light_stem,
    norwegian_light_stem,
    norwegian_minimal_stem,
    portuguese_minimal_stem,
    portuguese_rslp_stem,
    russian_light_stem,
    swedish_light_stem,
)

BASE = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis")

ZIPS = {
    "sv/svlighttestdata.zip": (swedish_light_stem, 30_000),
    "fi/filighttestdata.zip": (finnish_light_stem, 49_000),
    "hu/hulighttestdata.zip": (hungarian_light_stem, 29_000),
    "ru/rulighttestdata.zip": (russian_light_stem, 49_000),
    "de/deminimaltestdata.zip": (german_minimal_stem, 35_000),
    "fr/frminimaltestdata.zip": (french_minimal_stem, 20_000),
    "pt/ptminimaltestdata.zip": (portuguese_minimal_stem, 32_000),
    "pt/ptrslptestdata.zip": (portuguese_rslp_stem, 32_000),
}


@pytest.mark.parametrize("zp", sorted(ZIPS))
def test_vocabulary(zp):
    fn, min_n = ZIPS[zp]
    z = zipfile.ZipFile(BASE / zp)
    data = z.read(z.namelist()[0]).decode("utf-8")
    n = 0
    bad = []
    for line in data.splitlines():
        if not line.strip():
            continue
        w, want = line.split("\t")
        n += 1
        if fn(w) != want:
            bad.append((w, want, fn(w)))
    assert n >= min_n and bad == [], bad[:5]


@pytest.mark.parametrize("fname,flags,minimal", [
    ("nb_light.txt", BOKMAAL, False), ("nn_light.txt", NYNORSK, False),
    ("nb_minimal.txt", BOKMAAL, True), ("nn_minimal.txt", NYNORSK, True),
])
def test_norwegian_variants(fname, flags, minimal):
    fn = norwegian_minimal_stem if minimal else norwegian_light_stem
    bad = []
    for line in (BASE / "no" / fname).read_text(
            encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        w, want = line.split("\t")
        if fn(w, flags) != want:
            bad.append((w, want, fn(w, flags)))
    assert bad == []


def test_english_minimal():
    # TestEnglishMinimalStemFilter.java:44-52 (Harman S-stemmer)
    cases = [("queries", "query"), ("phrases", "phrase"),
             ("corpus", "corpus"), ("stress", "stress"),
             ("kings", "king"), ("panels", "panel"),
             ("aerodynamics", "aerodynamic"), ("congress", "congress"),
             ("serious", "serious")]
    for w, want in cases:
        assert english_minimal_stem(w) == want, w


def test_galician_minimal():
    # TestGalicianMinimalStemFilter.java: plural-only reduction
    assert galician_minimal_stem("elefantes") == "elefante"
    assert galician_minimal_stem("elefante") == "elefante"
    assert galician_minimal_stem("kalóres") == "kalór"
    assert galician_minimal_stem("E") == "E"


def test_kstem_vocabulary():
    """kstemTestData.zip — all 12,130 pairs byte-identical (the data
    TestKStemmer.testVocabulary asserts)."""
    from lucene_solr_spark.analysis.kstem import kstem

    z = zipfile.ZipFile(BASE / "en/kstemTestData.zip")
    data = z.read("kstem_examples.txt").decode("utf-8")
    n = 0
    bad = []
    for line in data.splitlines():
        if not line.strip():
            continue
        w, want = line.split("\t")
        n += 1
        if kstem(w) != want:
            bad.append((w, want, kstem(w)))
    assert n > 12_000 and bad == [], bad[:5]


def test_kstem_basics():
    from lucene_solr_spark.analysis.kstem import kstem

    # dictionary-driven conflations (TestKStemmer.java style)
    assert kstem("bricks") == "brick"
    assert kstem("flying") == "flying"  # head word in the lexicon
    assert kstem("abolishing") == "abolish"
    assert kstem("abatement") == "abate"
    assert kstem("italians") == "italy"       # countryNationality table
    assert kstem("aging") == "age"            # directConflations table
    assert kstem("aides") == "aide"           # exception word protected
    assert kstem("aided") == "aid"
    assert kstem("AIDS") == "AIDS"            # non-lowercase untouched
