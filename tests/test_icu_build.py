"""tokenizer='icu' e2e: ICUTokenizer script-run segmentation in the build.

Chain: ICUTokenizer (Khmer/Lao/Myanmar RBBI syllable grammars + Hebrew
quote tailorings + UAX#29 default, analysis/icu_segmentation.py) → lower
→ stop, with the query side mirrored by icu_analyze. Reference:
lucene/analysis/icu/.../segmentation/ICUTokenizer.java:103-221 and
DefaultICUTokenizerConfig's per-script break-iterator dispatch."""

import pytest

# ICUTokenizer splits these no-space strings into syllables; the plain
# StandardAnalyzer would index each as one giant run-on token.
KHMER = "ភាសាខ្មែរ"  # segments as ភា សា ខ្មែ រ (រ starts a new syllable)
LAO = "ສະບາຍດີ"  # segments as ສະ ບາຍ ດີ


@pytest.fixture(scope="module")
def icu_seg_index(spark, tmp_path_factory):  # noqa: F811
    from lucene_solr_spark.index.build import build_index

    rows = [
        ("u1", f"khmer sample {KHMER} here", "km"),
        ("u2", f"lao sample {LAO} text", "lo"),
        ("u3", 'קו"ח של המועמד', "he"),  # gershayim acronym keeps its quote
        ("u4", "the plain english document", "en"),
        ("u5", f"{KHMER} appears twice {KHMER}", "km"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    out = str(tmp_path_factory.mktemp("icu_seg_idx"))
    return build_index(spark, pages, out, tokenizer="icu")


def test_syllables_indexed_not_runon(spark, icu_seg_index):  # noqa: F811
    terms = {
        r["term"]: r["ttf"]
        for r in spark.read.parquet(icu_seg_index.terms).collect()
    }
    # the run-on strings are NOT terms; their syllables are
    assert KHMER not in terms and LAO not in terms
    assert terms["ខ្មែ"] == 3  # u1 + u5×2
    assert terms["ភា"] == 3 and terms["សា"] == 3 and terms["រ"] == 3
    assert terms["ສະ"] == 1 and terms["ບາຍ"] == 1 and terms["ດີ"] == 1
    # Hebrew gershayim acronym keeps its quote as one token (Hebrew.rbbi
    # MidLetter tailoring); stopword filtering still applied to english
    assert 'קו"ח' in terms
    assert "the" not in terms and "plain" in terms


def test_query_side_twin_and_search(spark, icu_seg_index):  # noqa: F811
    from lucene_solr_spark.query.executor import Searcher

    s = Searcher(spark, icu_seg_index)
    # query text analyzed under the index's recorded chain
    assert s.analyze_query(KHMER) == ["ភា", "សា", "ខ្មែ", "រ"]
    assert s.analyze_query('קו"ח') == ['קו"ח']
    hits = s.search("ខ្មែ", k=10).collect()
    urls = {
        r["url"]
        for r in spark.read.parquet(icu_seg_index.docs)
        .where(f"doc_id in ({','.join(str(h['doc_id']) for h in hits)})")
        .collect()
    }
    assert urls == {"u1", "u5"}
    # u5 has tf 2 → ranks first
    top_url = (
        spark.read.parquet(icu_seg_index.docs)
        .where(f"doc_id = {hits[0]['doc_id']}")
        .collect()[0]["url"]
    )
    assert top_url == "u5"


def test_phrase_positions_over_syllables(spark, icu_seg_index):  # noqa: F811
    """Syllables consume consecutive positions → phrase works across the
    segmentation (the analyzed phrase ភា សា ខ្មែ រ matches u1/u5)."""
    from lucene_solr_spark.query.executor import Searcher

    s = Searcher(spark, icu_seg_index)
    hits = s.phrase_search(["ភា", "សា", "ខ្មែ", "រ"], k=10).collect()
    urls = {
        r["url"]
        for r in spark.read.parquet(icu_seg_index.docs)
        .where(f"doc_id in ({','.join(str(h['doc_id']) for h in hits)})")
        .collect()
    }
    assert urls == {"u1", "u5"}
