"""Per-language analysis chains (analysis/lang.py) vs the reference.

Three layers:
1. The light stemmers against the reference's OWN vocabulary goldens —
   the 151k word→stem pairs shipped in {de,fr,es,it,pt}lighttestdata.zip
   (the exact data TestGermanLightStemFilter.testVocabulary etc. assert).
2. Full chain goldens lifted from the reference analyzer tests
   (TestGermanAnalyzer.java, TestFrenchAnalyzer.java, TestItalianAnalyzer.java,
   TestSpanishAnalyzer.java, TestPortugueseAnalyzer.java,
   TestGermanNormalizationFilter.java).
3. End-to-end: a mixed-language corpus through build_index(tokenizer='lang')
   — per-language stemmed matching, positions preserved across stopwords.
"""

from __future__ import annotations

import zipfile

import pytest

from lucene_solr_spark.analysis.lang import (
    analyze_token,
    elide,
    FR_ARTICLES,
    IT_ARTICLES,
    french_light_stem,
    german_light_stem,
    german_normalize,
    italian_light_stem,
    lang_analyze,
    portuguese_light_stem,
    spanish_light_stem,
)

REF_TESTS = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

VOCAB_ZIPS = {
    "de": ("de/delighttestdata.zip", "delight.txt", german_light_stem),
    "fr": ("fr/frlighttestdata.zip", "frlight.txt", french_light_stem),
    "es": ("es/eslighttestdata.zip", "eslight.txt", spanish_light_stem),
    "it": ("it/itlighttestdata.zip", "itlight.txt", italian_light_stem),
    "pt": ("pt/ptlighttestdata.zip", "ptlight.txt", portuguese_light_stem),
}


@pytest.mark.parametrize("lang", sorted(VOCAB_ZIPS))
def test_light_stemmer_vocabulary(lang):
    """Byte-identical to the reference on its full vocabulary fixture."""
    zp, txt, stem = VOCAB_ZIPS[lang]
    data = zipfile.ZipFile(f"{REF_TESTS}/{zp}").read(txt).decode("utf-8")
    n = bad = 0
    for line in data.splitlines():
        if not line.strip():
            continue
        word, want = line.split("\t")
        n += 1
        if stem(word) != want:
            bad += 1
    assert n > 20_000
    assert bad == 0


def test_german_normalization():
    # TestGermanNormalizationFilter.java:47-62
    assert german_normalize("schaltflächen") == "schaltflachen"
    assert german_normalize("schaltflaechen") == "schaltflachen"
    assert german_normalize("dauer") == "dauer"
    assert german_normalize("weißbier") == "weissbier"


def terms(text, lang):
    return [t for _, t in lang_analyze(text, lang)]


def test_german_analyzer_chain():
    # TestGermanAnalyzer.java:33-35,59-60
    assert terms("Tisch", "de") == ["tisch"]
    assert terms("Tische", "de") == ["tisch"]
    assert terms("Tischen", "de") == ["tisch"]
    assert terms("Schaltflächen", "de") == ["schaltflach"]
    assert terms("Schaltflaechen", "de") == ["schaltflach"]
    # stopwords consume positions
    out = lang_analyze("der Tisch und die Tische", "de")
    assert out == [(1, "tisch"), (4, "tisch")]


def test_french_analyzer_chain():
    # TestFrenchAnalyzer.java:40-115,242,253,272
    assert terms("chien chat cheval", "fr") == ["chien", "chat", "cheval"]
    assert terms("chien CHAT CHEVAL", "fr") == ["chien", "chat", "cheval"]
    assert terms("chien++", "fr") == ["chien"]
    assert terms('mot "entreguillemet"', "fr") == ["mot", "entreguilemet"]
    assert terms("Jean-François", "fr") == ["jean", "francoi"]
    assert terms("le la chien les aux chat du des à cheval", "fr") == [
        "chien", "chat", "cheval"
    ]
    assert terms("lances chismes habitable chiste éléments captifs", "fr") == [
        "lanc", "chism", "habitabl", "chist", "element", "captif"
    ]
    assert terms("finissions souffrirent rugissante", "fr") == [
        "finision", "soufrirent", "rugisant"
    ]
    assert terms("C3PO aujourd'hui oeuf ïâöûàä anticonstitutionnellement Java++", "fr") == [
        "c3po", "aujourd'hui", "oeuf", "ïaöuaä", "anticonstitutionel", "java"
    ]
    assert terms("33Bis 1940-1945 1940:1945 (---i+++)*", "fr") == [
        "33bi", "1940", "1945", "1940", "1945", "i"
    ]
    assert terms("voir l'embrouille", "fr") == ["voir", "embrouil"]
    # stopwords are case-insensitive post-3.1 (TestFrenchAnalyzer.java:259-262)
    assert terms("Votre", "fr") == []
    assert terms("sécuritaires", "fr") == ["securitair"]
    assert terms("securitaires", "fr") == ["securitair"]


def test_italian_analyzer_chain():
    # TestItalianAnalyzer.java:40-43,63-64
    assert terms("abbandonata", "it") == ["abbandonat"]
    assert terms("abbandonati", "it") == ["abbandonat"]
    assert terms("dallo", "it") == []
    assert terms("dell'Italia", "it") == ["ital"]
    assert terms("l'Italiano", "it") == ["italian"]


def test_spanish_analyzer_chain():
    # TestSpanishAnalyzer.java:37-40
    assert terms("chicana", "es") == ["chican"]
    assert terms("chicano", "es") == ["chican"]
    assert terms("los", "es") == []


def test_portuguese_analyzer_chain():
    # TestPortugueseAnalyzer.java:37-40
    assert terms("quilométricas", "pt") == ["quilometric"]
    assert terms("quilométricos", "pt") == ["quilometric"]
    assert terms("não", "pt") == []


def test_english_and_fallback_chains():
    # en routes through the EnglishAnalyzer chain; unknown lang = standard
    assert terms("the running dogs", "en") == ["run", "dog"]
    assert terms("the running dogs", None) == ["running", "dogs"]
    assert terms("the running dogs", "xx") == ["running", "dogs"]


def test_elision():
    assert elide("l'avion", FR_ARTICLES) == "avion"
    assert elide("qu'il", FR_ARTICLES) == "il"
    assert elide("aujourd'hui", FR_ARTICLES) == "aujourd'hui"
    assert elide("dell'italia", IT_ARTICLES) == "italia"
    # U+2019 right single quote works too
    assert elide("l’avion", FR_ARTICLES) == "avion"


def test_analyze_token_drops():
    assert analyze_token("der", "de") == ""
    assert analyze_token("x" * 256, "de") == ""
    assert analyze_token("Tische", "de") == "tisch"


def test_lang_index_e2e(spark, tmp_path):
    """Mixed-language corpus through build_index(tokenizer='lang'): each
    language's morphology matches under ITS chain, stopwords consume
    positions (phrase semantics), BM25 stats per the post-stop lengths."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u1", "de", "Die Tische sind groß und die Schaltflächen klein"),
        ("u2", "de", "Ein Tisch steht im Raum"),
        ("u3", "fr", "Les chevaux et le cheval mangent l'avoine"),
        ("u4", "fr", "Jean-François regarde les éléments captifs"),
        ("u5", "es", "Los chicanos viven en la ciudad"),
        ("u6", "en", "The running dogs are chasing cats"),
        ("u7", "it", "dell'Italia e l'Italiano"),
        ("u8", "pt", "não há botões quilométricos"),
    ]
    pages = spark.createDataFrame(rows, "url string, lang string, text string")
    out = str(tmp_path / "langidx")
    build_index(spark, pages, out, tokenizer="lang", positions=True)
    s = Searcher(spark, out)
    # docIDs are global url rank: u1→0 … u8→7
    def docs(df):
        return {int(r.doc_id) for r in df.collect()}

    # German: "Tische"/"Tisch" both stem to "tisch" → u1, u2
    s.query_lang = "de"
    assert docs(s.search("Tische", k=10)) == {0, 1}
    # umlaut and ae-digraph spellings normalize together
    assert docs(s.search("Schaltflaechen", k=10)) == {0}
    assert docs(s.search("Schaltflächen", k=10)) == {0}

    # French: chevaux → cheval (both surface forms in u3)
    s.query_lang = "fr"
    assert docs(s.search("chevaux", k=10)) == {2}
    # elided l'avoine indexed under the stem of "avoine"
    assert docs(s.search("avoine", k=10)) == {2}

    # Spanish: chicana/chicanos share the light stem
    s.query_lang = "es"
    assert docs(s.search("chicana", k=10)) == {4}

    # Italian elision + stem
    s.query_lang = "it"
    assert docs(s.search("Italia", k=10)) == {6}

    # Portuguese stem + stopword
    s.query_lang = "pt"
    assert docs(s.search("quilométricas", k=10)) == {7}
    assert docs(s.search("não", k=10)) == set()

    # English chain still porter-stems under lang dispatch
    s.query_lang = "en"
    assert docs(s.search("run", k=10)) == {5}

    # positions: German stopwords consume positions. u1 analyzed positions:
    # Die(0,stop) Tische(1) sind(2,stop) groß(3) und(4,stop) die(5,stop)
    # Schaltflächen(6) klein(7) → "Schaltflächen klein" adjacent = match,
    # "Tische groß" (stopword gap between) = NO exact-phrase match.
    s.query_lang = "de"
    assert docs(s.phrase_search("Schaltflächen klein", k=10)) == {0}
    assert docs(s.phrase_search("Tische groß", k=10)) == set()
    # ...but slop=2 bridges the consumed stopword slot
    assert docs(s.phrase_search("Tische groß", k=10, slop=2)) == {0}


def test_russian_snowball_goldens():
    """615 (word, stem) pairs generated from the reference's OWN
    machine-generated RussianStemmer.java compiled with javac
    (tests/data/russian_stem_goldens.tsv) — plus a 30k-word fuzz run at
    build time showed 0 mismatches."""
    from lucene_solr_spark.analysis.russian import russian_stem

    n = bad = 0
    with open("tests/data/russian_stem_goldens.tsv", encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            w, want = line.rstrip("\n").split("\t")
            n += 1
            if russian_stem(w) != want:
                bad += 1
    assert n >= 600 and bad == 0


def test_russian_analyzer_chain():
    # TestRussianAnalyzer.java:51-56 (post-3.1 chain with snowball stops)
    assert terms(
        "Вместе с тем о силе электромагнитной энергии имели представление еще",
        "ru",
    ) == ["вмест", "сил", "электромагнитн", "энерг", "имел", "представлен"]
    assert terms("Но знание это хранилось в тайне", "ru") == [
        "знан", "эт", "хран", "тайн"
    ]
    # digits untouched (TestRussianAnalyzer.java:37)
    assert terms("text 1000", "ru") == ["text", "1000"]


def test_arabic_analyzer_chain():
    # TestArabicAnalyzer.java:42-55
    assert terms("كبير", "ar") == ["كبير"]
    assert terms("كبيرة", "ar") == ["كبير"]        # feminine marker
    assert terms("مشروب", "ar") == ["مشروب"]
    assert terms("مشروبات", "ar") == ["مشروب"]     # plural -at
    assert terms("أمريكيين", "ar") == ["امريك"]    # plural -in
    assert terms("امريكي", "ar") == ["امريك"]      # singular, bare alif
    assert terms("كتاب", "ar") == ["كتاب"]
    assert terms("الكتاب", "ar") == ["كتاب"]       # definite article
    assert terms("ما ملكت أيمانكم", "ar") == ["ملكت", "ايمانكم"]
    assert terms("الذين ملكت أيمانكم", "ar") == ["ملكت", "ايمانكم"]


def test_cjk_analyzer_chain():
    # TestCJKAnalyzer.java:45-131
    assert terms("一二三四五六七八九十", "zh") == [
        "一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"
    ]
    assert terms("一 二三四 五六七八九 十", "zh") == [
        "一", "二三", "三四", "五六", "六七", "七八", "八九", "十"
    ]
    assert terms("abc defgh ijklmn opqrstu vwxy z", "zh") == [
        "abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"
    ]
    assert terms("あい", "ja") == ["あい"]
    assert terms("あいtest", "ja") == ["あい", "test"]
    assert terms("testあい    ", "ja") == ["test", "あい"]
    assert terms("あいうえおabcかきくけこ", "ja") == [
        "あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"
    ]
    assert terms("あいうえおabんcかきくけ こ", "ja") == [
        "あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき", "きく", "くけ", "こ"
    ]
    # stopword dropped post-bigram, consuming a position
    out = lang_analyze("the 一二", "zh")
    assert out == [(1, "一二")]


def test_cjk_width_folding():
    from lucene_solr_spark.analysis.cjk import cjk_width_fold

    assert cjk_width_fold("ＡＢＣ") == "ABC"          # fullwidth ASCII
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"       # halfwidth kana
    assert cjk_width_fold("ｶﾞｷﾞ") == "ガギ"           # dakuten combining
    assert cjk_width_fold("ﾊﾟ") == "パ"               # handakuten
