"""Thai analysis: ThaiAnalyzer chain + the JDK break-iterator port.

Reference: ThaiAnalyzer.java:101-110 (StandardTokenizer -> LowerCase ->
ThaiWordFilter -> Stop(th/stopwords.txt)), ThaiWordFilter.java:44-121,
TestThaiAnalyzer.java fixtures. The breaker itself is fuzz-verified 0-diff
vs the live JDK (tools/thai_probe.py, 30k lines per round — a small live
sample runs here when a JDK is present).
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from lucene_solr_spark.analysis.thai import (
    STOP_TH,
    thai_analyze,
    thai_breaker_segments,
    thai_placeholder_tokens,
    thai_token_stream,
)


def test_reference_offsets_fixture():
    # TestThaiAnalyzer.testOffsets (empty stop set -> raw segmentation)
    assert thai_breaker_segments("การที่ได้ต้องแสดงว่างานดี") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]


def test_reference_stopwords_fixture():
    # TestThaiAnalyzer.testStopWords: terms + position increments 5,2,1
    out = thai_analyze("การที่ได้ต้องแสดงว่างานดี")
    assert [t for _, t in out] == ["แสดง", "งาน", "ดี"]
    positions = [p for p, _ in out]
    incs = [positions[0] + 1] + [
        b - a for a, b in zip(positions, positions[1:])]
    assert incs == [5, 2, 1]


def test_reference_token_type_fixture():
    # TestThaiAnalyzer.testTokenType: Thai digits come through as one token
    assert thai_token_stream("การที่ได้ต้องแสดงว่างานดี ๑๒๓") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี", "๑๒๓"]


def test_reference_mixed_script_fixture():
    # TestThaiAnalyzer.testPositionIncrements: Thai adjacent to Latin with
    # no whitespace still splits at the script boundary (SOUTHEAST_ASIAN
    # runs are their own tokens in the reference's StandardTokenizer)
    assert thai_token_stream("การที่ได้ต้องthe แสดงว่างานดี") == [
        "การ", "ที่", "ได้", "ต้อง", "the", "แสดง", "ว่า", "งาน", "ดี"]


def test_reference_analyzer30_shape():
    # TestThaiAnalyzer.testAnalyzer30 body text under the modern grammar
    assert thai_token_stream("ประโยคว่า") == ["ประโยค", "ว่า"]
    assert thai_token_stream("บริษัทชื่อ") == ["บริษัท", "ชื่อ"]


def test_breaker_probe_goldens():
    # shapes pinned against the live JDK breaker (tools/thai_probe.py)
    cases = {
        # backtracking: ครัช fails as one word -> ค | รัช
        "ครัช": ["ค", "รัช"],
        "กกกก": ["กก", "กก"],
        "สวัสดีครับผม": ["สวัสดี", "ครับ", "ผม"],
        # unknown-run lumping: ก is a word, the rest fails -> one lump
        "กขฃคฅฆง": ["ก", "ขฃคฅฆง"],
        # ฮ is itself a dictionary word between two words
        "การฮที่": ["การ", "ฮ", "ที่"],
        # paiyannoi: กรุงเทพฯ and ฯลฯ are dictionary words
        "กรุงเทพฯ": ["กรุงเทพฯ"],
        "ต้องฯลฯ": ["ต้อง", "ฯลฯ"],
        "ฯพณฯ": ["ฯ", "พ", "ณ", "ฯ"],
        # maiyamok is segmented alone
        "ชาๆชา": ["ชา", "ๆ", "ชา"],
        # non-dictionary chars terminate division for the rest of the range
        "ฃ็ฬเเศฆ": ["ฃ็ฬเเศฆ"],
        "ซตผ": ["ซตผ"],
        "แแก": ["แแก"],
    }
    for text, want in cases.items():
        assert thai_breaker_segments(text) == want, text


def test_stop_set_and_placeholders():
    assert "ไว้" in STOP_TH and len(STOP_TH) == 115
    toks = thai_placeholder_tokens("การที่ได้ต้อง the แสดงว่างานดี")
    # "the" is NOT in the Thai stop set (reference default set is Thai-only)
    assert toks == ["", "", "", "", "the", "แสดง", "", "งาน", "ดี"]


def test_lang_dispatch_routes_th():
    from lucene_solr_spark.analysis.lang import (
        SUPPORTED_LANGS,
        _analyzed_placeholder_tokens,
        lang_analyze,
    )

    assert "th" in SUPPORTED_LANGS
    assert lang_analyze("การที่ได้ต้องแสดงว่างานดี", "th") == [
        (4, "แสดง"), (6, "งาน"), (7, "ดี")]
    assert _analyzed_placeholder_tokens("แสดงว่างานดี", "th") == [
        "แสดง", "", "งาน", "ดี"]


def test_lang_index_e2e_thai(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u0", "การที่ได้ต้องแสดงว่างานดี", "th"),
        ("u1", "the quick แสดง fox", "en"),
        ("u2", "สวัสดีครับผม", "th"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    paths = build_index(
        spark, df, str(tmp_path / "idx"), tokenizer="lang", chunk_span=16
    )
    s = Searcher(spark, paths)
    by_url = {
        r.doc_id: r.url
        for r in spark.read.parquet(paths.docs)
        .select("doc_id", "url").collect()
    }

    def urls(term):
        return sorted(by_url[r.doc_id] for r in s.match_docs([term]).collect())

    # Thai doc segmented into dictionary words; en doc keeps the raw token
    assert urls("แสดง") == ["u0", "u1"]
    assert urls("ครับ") == ["u2"]
    # Thai stopword dropped from the th doc
    assert urls("ที่") == []
    # en chain stopped "the"; th chain would have kept it
    assert urls("the") == []


@pytest.mark.skipif(shutil.which("java") is None, reason="needs a JDK")
def test_live_jdk_fuzz_sample():
    """300-line live fuzz vs the real JDK breaker (the per-round 30k run
    lives in tools/thai_probe.py; this is the in-suite regression guard)."""
    import os
    import random
    import sys

    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    if not os.path.exists(os.path.join(tools, "ThaiSegPipe.class")):
        proc = subprocess.run(
            ["javac", "-encoding", "UTF-8", "ThaiSegPipe.java"], cwd=tools)
        if proc.returncode != 0:
            pytest.skip("cannot compile oracle pipe")
    sys.path.insert(0, tools)
    from thai_probe import gen_line, oracle_segments

    from lucene_solr_spark.analysis.thaidata import WORDS

    rng = random.Random(20260819)
    lines = [gen_line(rng, WORDS) for _ in range(300)]
    oracle = oracle_segments(lines)
    for line, want in zip(lines, oracle):
        assert thai_breaker_segments(line) == want, repr(line)
