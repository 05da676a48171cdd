"""Phonetic filters vs the published golden codes.

Soundex goldens are the US National Archives canonical examples (the same
set commons-codec's SoundexTest pins); RefinedSoundex goldens are the
commons-codec RefinedSoundexTest sentence.
"""

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.phonetic import (
    refined_soundex_code,
    refined_soundex_filter,
    soundex_code,
    soundex_filter,
)

SOUNDEX_GOLDEN = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",  # HW rule: s,c separated by h collapse
    "Ashcroft": "A261",
    "Tymczak": "T522",  # c,z adjacent collapse; a separates z,k
    "Pfister": "P236",  # p,f same code collapse into the first symbol
    "Honeyman": "H555",
    "Whitman": "W355",  # leading W retained as the letter
    "Testing": "T235",
    "The": "T000",
    "A": "A000",
    "123": "",  # letterless -> empty code
}

REFINED_GOLDEN = {
    "testing": "T6036084",
    "TESTING": "T6036084",
    "The": "T60",
    "quick": "Q503",
    "brown": "B1908",
    "fox": "F205",
    "jumped": "J408106",
    "over": "O0209",
    "lazy": "L7050",
    "dogs": "D6043",
}


def _codes(spark, fn, words):
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    rows = df.select("w", fn(F.col("w")).alias("c")).collect()
    return {r["w"]: r["c"] for r in rows}


def test_soundex_goldens(spark):
    got = _codes(spark, soundex_code, list(SOUNDEX_GOLDEN))
    assert got == SOUNDEX_GOLDEN


def test_refined_soundex_goldens(spark):
    got = _codes(spark, refined_soundex_code, list(REFINED_GOLDEN))
    assert got == REFINED_GOLDEN


def test_inject_and_replace_modes(spark):
    df = spark.createDataFrame(
        [(["robert", "x1", "123"],)], ["toks"]
    )
    inj = df.select(soundex_filter(F.col("toks")).alias("t")).first()["t"]
    # letterless token keeps only the original; others get code appended
    assert inj == ["robert", "R163", "x1", "X000", "123"]
    rep = df.select(
        refined_soundex_filter(F.col("toks"), inject=False).alias("t")
    ).first()["t"]
    assert rep[0] == "R901096"  # r,o,b,e,r,t -> 9,0,1,0,9,6
    assert rep[2] == "123"  # letterless keeps original in replace mode


def test_codegen_only_plan(spark):
    df = spark.createDataFrame([(["abc"],)], ["toks"])
    plan = df.select(
        soundex_filter(F.col("toks")).alias("t")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
