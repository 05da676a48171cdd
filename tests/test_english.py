"""English analysis chain: possessive filter + Porter stemmer.

Golden vectors are the examples from Martin Porter's 1980 paper ("An
algorithm for suffix stripping", Program 14(3)), adjusted where the
reference implements the two published departures (PorterStemmer.java:
bli→ble, logi→log). Chain-order tests assert the EnglishAnalyzer.java:95-116
ordering: possessive strip BEFORE stop, stem AFTER stop.
"""

import os

import pytest

from lucene_solr_spark.analysis.english import (
    english_analyze,
    porter_stem,
    strip_possessive,
)

# (input, stem) pairs from the Porter paper's step-by-step examples
PORTER_GOLDENS = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    # step 1b (+ cleanup)
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    # step 2
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5a/5b
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # multi-step words
    ("generalizations", "gener"),
    ("oscillators", "oscil"),
    ("running", "run"),
    ("argument", "argument"),
    # ≤2-char words returned unchanged (PorterStemmer.java:484)
    ("a", "a"),
    ("is", "is"),
]


@pytest.mark.parametrize("word,stem", PORTER_GOLDENS)
def test_porter_goldens(word, stem):
    assert porter_stem(word) == stem


def test_porter_departures():
    # tartarus-updated variant: (m>0) bli→ble, (m>0) logi→log
    assert porter_stem("bli") == "bli"  # m==0 → no rule
    assert porter_stem("possibli") == "possibl"
    assert porter_stem("analogi") == "analog"


def test_possessive_strip():
    assert strip_possessive("o'brien's") == "o'brien"
    assert strip_possessive("dog's") == "dog"
    assert strip_possessive("dogs'") == "dogs'"  # bare trailing ' untouched
    assert strip_possessive("it’s") == "it"
    assert strip_possessive("x＇s") == "x"
    assert strip_possessive("boss") == "boss"


def test_chain_order_possessive_before_stop():
    # "it's" → possessive-strip → "it" → stopword: no term, position consumed
    assert english_analyze("it's raining") == [(1, "rain")]


def test_chain_order_stem_after_stop():
    # "this" is a stopword and must be removed BEFORE stemming could alter it;
    # stopwords consume positions (StopFilter enablePositionIncrements)
    out = english_analyze("this running dog")
    assert out == [(1, "run"), (2, "dog")]


def test_analyze_matches_variants():
    assert english_analyze("connection connections connective connected") == [
        (0, "connect"),
        (1, "connect"),
        (2, "connect"),
        (3, "connect"),
    ]


def test_engine_english_index(spark, tmp_path):
    """End-to-end: tokenizer='english' index matches morphological variants,
    merges same-doc variants into one posting (tf sums, positions ascend),
    and the query side analyzes with the same chain."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u1", "running runs ran the runner's race", 1),
        ("u2", "a singer sings songs", 2),
        ("u3", "generalizations about oscillators", 3),
        ("u4", "it's raining on the racing track", 4),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts int")
    paths = build_index(
        spark, pages, str(tmp_path / "idx"), ts_col="warc_ts", tokenizer="english"
    )
    s = Searcher(spark, paths)

    # "running" and "runs" both stem to "run": doc u1 has tf=2 at positions
    # 0 and 1 ("ran" stems to "ran", not "run" — no vowel in stem for 1b)
    hits = s.search("running", k=10).collect()
    urls = {
        r.url for r in s.fetch_docs(s.search("runs", k=10), key_col="url").collect()
    }
    assert urls == {"u1"}
    assert len(hits) == 1

    # posting-level check: tf=2, ascending positions for the merged stem
    post = s.postings.where(s.postings.term == "run").select("tfs", "pos_flat").collect()
    assert len(post) == 1
    assert list(post[0].tfs) == [2]
    assert list(post[0].pos_flat) == [0, 1]

    # query-side chain: "sing" does NOT match "singer"/"sings" docs unless
    # the stems align; "singing" → "sing", "sings" → "sing"
    urls = {
        r.url for r in s.fetch_docs(s.search("singing", k=10), key_col="url").collect()
    }
    assert urls == {"u2"}

    # possessive at index time: "runner's" indexed as stem of "runner"
    urls = {
        r.url for r in s.fetch_docs(s.search("runner", k=10), key_col="url").collect()
    }
    assert urls == {"u1"}

    urls = {
        r.url
        for r in s.fetch_docs(s.search("oscillator", k=10), key_col="url").collect()
    }
    assert urls == {"u3"}

    # norms: doc length counts post-stop tokens (stemming doesn't change it)
    dl = {r.url: r.dl for r in s.docs.select("url", "dl").collect()}
    assert dl["u1"] == 5  # "the" stopped: running runs ran runner's race
    assert dl["u4"] == 3  # it's→it, on, the stopped: raining racing track


def test_porter_full_vocabulary():
    """The reference's complete porterTestData.zip fixture (the data
    TestPorterStemFilter asserts) — byte-identical on all 23,531 words."""
    import zipfile

    from lucene_solr_spark.analysis.english import porter_stem

    z = zipfile.ZipFile(
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/en/porterTestData.zip")
    voc = z.read("voc.txt").decode("utf-8").splitlines()
    out = z.read("output.txt").decode("utf-8").splitlines()
    assert len(voc) == len(out) > 23_000
    bad = [(v, o) for v, o in zip(voc, out) if porter_stem(v) != o]
    assert bad == []
