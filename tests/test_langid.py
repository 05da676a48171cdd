"""LanguageIdentifierUpdateProcessor parity tests, ported from
solr/contrib/langid/src/test/.../LanguageIdentifierUpdateProcessorFactoryTestCase.java
(testLangIdGlobal fixture paragraphs for languages in the detector registry,
testMapFieldName, testMapLangcode, testPreExisting,
testDefaultFallbackEmptyString, testFallback, testResolveLanguage)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.langid import (
    detect_language, get_mapped_field, langid_transform,
)

# testLangIdGlobal fixtures (the subset whose language is in the detector
# registry; be/eo/sk/sl/uk have no in-repo stop lists → not claimed)
GLOBAL_FIXTURES = [
    ("no", "Lucene er et fri/åpen kildekode programvarebibliotek for informasjonsgjenfinning, opprinnelig utviklet i programmeringsspråket Java av Doug Cutting. Lucene støttes av Apache Software Foundation og utgis under Apache-lisensen."),
    ("en", "Apache Lucene is a free/open source information retrieval software library, originally created in Java by Doug Cutting. It is supported by the Apache Software Foundation and is released under the Apache Software License."),
    ("sv", "Apache Maven är ett verktyg utvecklat av Apache Software Foundation och används inom systemutveckling av datorprogram i programspråket Java. Maven används för att automatiskt paketera (bygga) programfilerna till en distribuerbar enhet. Maven används inom samma område som Apache Ant men dess byggfiler är deklarativa till skillnad ifrån Ants skriptbaserade."),
    ("es", "El español, como las otras lenguas romances, es una continuación moderna del latín hablado (denominado latín vulgar), desde el siglo III, que tras el desmembramiento del Imperio romano fue divergiendo de las otras variantes del latín que se hablaban en las distintas provincias del antiguo Imperio, dando lugar mediante una lenta evolución a las distintas lenguas romances. Debido a su propagación por América, el español es, con diferencia, la lengua romance que ha logrado mayor difusión."),
    ("th", "อันเนอลีส มารี อันเนอ ฟรังค์ หรือมักรู้จักในภาษาไทยว่า แอนน์ แฟรงค์ เป็นเด็กหญิงชาวยิว เกิดที่เมืองแฟรงก์เฟิร์ต ประเทศเยอรมนี เธอมีชื่อเสียงโด่งดังในฐานะผู้เขียนบันทึกประจำวัน"),
    ("ru", "The Apache Lucene — это свободная библиотека для высокоскоростного полнотекстового поиска, написанная на Java. Может быть использована для поиска в интернете и других областях компьютерной лингвистики (аналитическая философия)."),
    ("de", "Lucene ist ein Freie-Software-Projekt der Apache Software Foundation, das eine Suchsoftware erstellt. Durch die hohe Leistungsfähigkeit und Skalierbarkeit können die Lucene-Werkzeuge für beliebige Projektgrößen und Anforderungen eingesetzt werden. So setzt beispielsweise Wikipedia Lucene für die Volltextsuche ein."),
    ("fr", "Lucene est un moteur de recherche libre écrit en Java qui permet d'indexer et de rechercher du texte. C'est un projet open source de la fondation Apache mis à disposition sous licence Apache. Il est également disponible pour les langages Ruby, Perl, C++, PHP."),
    ("nl", "Lucene is een gratis open source, tekst gebaseerde information retrieval API van origine geschreven in Java door Doug Cutting. Het wordt ondersteund door de Apache Software Foundation en is vrijgegeven onder de Apache Software Licentie."),
    ("it", "Lucene è una API gratuita ed open source per il reperimento di informazioni inizialmente implementata in Java da Doug Cutting. È supportata dall'Apache Software Foundation ed è resa disponibile con l'Apache License."),
    ("pt", "Apache Lucene, ou simplesmente Lucene, é um software de busca e uma API de indexação de documentos, escrito na linguagem de programação Java. É um software de código aberto da Apache Software Foundation licenciado através da licença Apache."),
    ("ca", "El català posseeix dos estàndards principals: el regulat per l'Institut d'Estudis Catalans, o estàndard general, que pren com a base l'ortografia establerta per Pompeu Fabra amb els trets gramaticals i ortogràfics característics del català central."),
    ("gl", "A cifra de falantes medrou axiña durante as décadas seguintes, nun principio no Imperio ruso e na Europa oriental, logo na Europa occidental, América, China e no Xapón. Nos primeiros anos do movemento, os esperantistas mantiñan contacto por correspondencia, pero en 1905 o primeiro Congreso Universal de Esperanto levouse a cabo na cidade francesa de Boulogne-sur-Mer."),
    ("ro", "La momentul destrămării Uniunii Sovietice și a înlăturării regimului comunist instalat în România (1989), țara a inițiat o serie de reforme economice și politice. După un deceniu de probleme economice, România a introdus noi reforme economice de ordin general (precum cota unică de impozitare, în 2005) și a aderat la Uniunea Europeană la 1 ianuarie 2007."),
]


def _detect(spark, text):
    row = spark.range(1).select(
        detect_language(F.lit(text)).alias("d")
    ).collect()[0]
    return None if row["d"] is None else (row["d"]["lang"], row["d"]["certainty"])


def test_lang_id_global(spark):
    df = spark.createDataFrame(
        [(lang, text) for lang, text in GLOBAL_FIXTURES], "expected string, subject string"
    )
    out = langid_transform(
        df, fl=["subject"], lang_field="language_s", fallback="un"
    )
    rows = out.collect()
    got = {r["expected"]: r["language_s"] for r in rows}
    for lang, _ in GLOBAL_FIXTURES:
        assert got[lang] == lang, f"{lang} detected as {got[lang]}"


def test_lang_id_too_short_falls_back(spark):
    # the "5un" fixture: name=a subject=b — detector abstains, fallback wins
    df = spark.createDataFrame([("a", "b")], "name string, subject string")
    out = langid_transform(
        df, fl=["name", "subject"], lang_field="language_s", fallback="un"
    )
    assert out.collect()[0]["language_s"] == "un"


def test_map_field_name():
    # testMapFieldName (enforceSchema=false)
    assert get_mapped_field("test", "no") == "test_no"
    assert get_mapped_field("test", "en") == "test_en"
    lcmap = {"jp": "s", "zh": "cjk", "ko": "cjk"}
    assert get_mapped_field("test", "jp", map_lcmap=lcmap) == "test_s"
    assert get_mapped_field("test", "zh", map_lcmap=lcmap) == "test_cjk"
    assert get_mapped_field("test", "ko", map_lcmap=lcmap) == "test_cjk"
    # enforceSchema=true catches illegal field → None
    assert get_mapped_field("inputfield", "sv", schema_fields={"other"}) is None
    # custom pattern/replace, still with enforceSchema
    assert get_mapped_field(
        "text_title_field", "no",
        map_pattern=r"text_(.*?)_field", map_replace="$1_{lang}_s",
        schema_fields={"title_no_s"},
    ) == "title_no_s"
    assert get_mapped_field(
        "text_body_field", "sv",
        map_pattern=r"text_(.*?)_field", map_replace="$1_{lang}_s",
        schema_fields={"body_sv_s"},
    ) == "body_sv_s"


def test_map_langcode(spark):
    # testMapLangcode: lcmap zh_cn:zh zh_tw:zh applied in resolveLanguage —
    # exercised through the pre-existing langField path (certainty 1.0)
    df = spark.createDataFrame(
        [("one", "zh_cn"), ("two", "zh_tw"), ("three", "no")],
        "text string, language string",
    )
    out = langid_transform(
        df, fl=["text"], lang_field="language", langs_field="languages",
        lcmap={"zh_cn": "zh", "zh_tw": "zh"},
    )
    got = {r["text"]: r for r in out.collect()}
    # field keeps the original value (the "not overwriting" branch)…
    assert got["one"]["language"] == "zh_cn"
    # …while docLang (langsField) carries the normalized code
    assert got["one"]["languages"] == ["zh"]
    assert got["two"]["languages"] == ["zh"]
    assert got["three"]["languages"] == ["no"]


def test_pre_existing(spark):
    en_text = GLOBAL_FIXTURES[1][1]
    df = spark.createDataFrame(
        [(en_text, None), (en_text, "no")], "text string, language string"
    )
    out = langid_transform(
        df, fl=["text"], lang_field="language", langs_field="languages",
        map_enable=True, map_keep_orig=True,
    )
    rows = sorted(out.collect(), key=lambda r: r["language"])
    detected, pre = rows[0], rows[1]
    assert detected["language"] == "en" and detected["languages"] == ["en"]
    assert detected["text_en"] == en_text and detected["text_no"] is None
    assert pre["language"] == "no" and pre["languages"] == ["no"]
    assert pre["text_no"] == en_text and pre["text_en"] is None


def test_default_fallback_empty_string(spark):
    df = spark.createDataFrame([("dokument",)], "text string")
    out = langid_transform(df, fl=["text"], lang_field="language")
    assert out.collect()[0]["language"] == ""


def test_fallback_fields(spark):
    # noop column absent → skipped; fb column present → wins over fbVal
    df = spark.createDataFrame([("zz", "fbField"), ("zz", None)],
                               "text string, fb string")
    out = langid_transform(
        df, fl=["text"], lang_field="language",
        fallback_fields=["noop", "fb"], fallback="fbVal",
    )
    got = sorted(r["language"] for r in out.collect())
    assert got == ["fbField", "fbVal"]


def test_threshold_and_whitelist(spark):
    en_text = GLOBAL_FIXTURES[1][1]
    df = spark.createDataFrame([(en_text,)], "text string")
    # whitelist without en → fallback
    out = langid_transform(
        df, fl=["text"], lang_field="language",
        whitelist={"de", "fr"}, fallback="other",
    )
    assert out.collect()[0]["language"] == "other"
    # absurd threshold → fallback
    out2 = langid_transform(
        df, fl=["text"], lang_field="language",
        threshold=1.01, fallback="other",
    )
    assert out2.collect()[0]["language"] == "other"


def test_map_individual(spark):
    en_text = GLOBAL_FIXTURES[1][1]
    de_text = GLOBAL_FIXTURES[6][1]
    df = spark.createDataFrame([(en_text, de_text)], "a string, b string")
    out = langid_transform(
        df, fl=["a", "b"], lang_field="language", langs_field="languages",
        map_enable=True, map_individual=True, map_langs=["en", "de"],
    )
    row = out.collect()[0]
    # doc-global language over the a+b concat: either constituent can win
    # the stop-hit argmax; the per-field mapping below is the contract
    assert row["language"] in ("en", "de")
    assert row["a_en"] == en_text and row["b_de"] == de_text
    assert row["a_de"] is None and row["b_en"] is None
    assert set(row["languages"]) == {"en", "de"}
    assert "a" not in out.columns and "b" not in out.columns  # keepOrig=False


def test_enforce_schema_raises(spark):
    df = spark.createDataFrame([("text",)], "a string")
    with pytest.raises(ValueError, match="invalid output field mapping"):
        langid_transform(
            df, fl=["a"], map_enable=True, map_langs=["en"],
            schema_fields={"not_a_en"},
        )


def test_langid_feeds_lang_dispatch_build(spark, tmp_path):
    """The full multilingual pipeline: langid populates the lang column
    that build_index(tokenizer='lang') dispatches on — the Solr
    langid-UpdateProcessor-before-analysis chain, end to end."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u1", GLOBAL_FIXTURES[1][1]),   # en
        ("u2", GLOBAL_FIXTURES[6][1]),   # de
        ("u3", GLOBAL_FIXTURES[7][1]),   # fr
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    tagged = langid_transform(pages, fl=["text"], lang_field="lang", fallback="en")
    assert {r["lang"] for r in tagged.collect()} == {"en", "de", "fr"}
    idx = build_index(spark, tagged, str(tmp_path / "idx"), tokenizer="lang")
    s = Searcher(spark, idx)
    # German query stems under the de chain and must hit the de doc
    s.query_lang = "de"
    hits = s.search("Skalierbarkeit", k=3).collect()
    urls = {
        r["url"]
        for r in spark.read.parquet(idx.docs)
        .where(f"doc_id in ({','.join(str(h['doc_id']) for h in hits)})")
        .collect()
    }
    assert urls == {"u2"}


def test_plan_is_jvm_only(spark):
    """The whole processor — detection, resolution, mapping — is column
    expressions: one codegen'd map stage, no Python eval, no shuffle."""
    df = spark.createDataFrame([("x", "y")], "text string, fb string")
    out = langid_transform(
        df, fl=["text"], lang_field="language", langs_field="languages",
        fallback_fields=["fb"], fallback="un",
        map_enable=True, map_langs=["en", "de"], map_keep_orig=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_script_languages(spark):
    cases = [
        ("el", "Γράφεται σε συνεργασία από εθελοντές με το λογισμικό wiki, κάτι που σημαίνει ότι άρθρα μπορεί να προστεθούν"),
        ("he", "ויקיפדיה היא אנציקלופדיה חופשית שכל אחד יכול לערוך את התכנים שלה בכל עת"),
        ("ar", "ويكيبيديا مشروع متعدد اللغات لإنشاء موسوعة حرة ودقيقة ومتكاملة يستطيع الجميع المساهمة في تحريرها"),
        ("fa", "ویکی‌پدیا یک دانشنامهٔ اینترنتی با محتوای آزاد است که با همکاری افراد داوطلب نوشته می‌شود و هر کسی می‌تواند آن را ویرایش کند"),
        ("ko", "위키백과는 누구나 자유롭게 쓸 수 있는 다언어판 인터넷 백과사전입니다"),
        ("ja", "ウィキペディアは誰でも編集できるフリー百科事典です みんなで作る百科事典"),
        ("zh", "维基百科是一个自由内容的网络百科全书 任何人都可以编辑其中的条目"),
        ("hi", "विकिपीडिया एक मुक्त ज्ञानकोश है जिसे कोई भी संपादित कर सकता है"),
        ("bg", "Уикипедия е свободна енциклопедия която всеки може да редактира по всяко време и на всяко място"),
    ]
    df = spark.createDataFrame(cases, "expected string, text string")
    out = langid_transform(df, fl=["text"], lang_field="lang", fallback="un")
    for r in out.collect():
        assert r["lang"] == r["expected"], f"{r['expected']} → {r['lang']}"
