"""tokenizer='icu_folding' e2e: build + query through the factorized hook.

Chain: Standard (JVM codegen) → lower → stop → ICUFoldingFilter applied
once per DISTINCT surface form inside the inverter (the english.py
factorized design), query side mirrored by icu_folding_analyze."""

import pytest


@pytest.fixture(scope="module")
def icu_index(spark, tmp_path_factory):  # noqa: F811
    from lucene_solr_spark.index.build import build_index

    rows = [
        # accents in three spellings of the same word + Greek + digits
        ("u1", "Résumé RESUME résumé writing", "en"),
        ("u2", "ΜΆΪΟΣ μαιοσ spring month", "el"),
        ("u3", "plain resume text and the stopword", "en"),
        ("u4", "৭০৬ native digits and ʰ alone", "bn"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    out = str(tmp_path_factory.mktemp("icu_idx"))
    return build_index(spark, pages, out, tokenizer="icu_folding")


def test_folded_surfaces_merge(spark, icu_index):  # noqa: F811
    terms = {
        r["term"]: r["ttf"]
        for r in spark.read.parquet(icu_index.terms).collect()
    }
    # all three spellings of résumé + the plain one fold to one term
    assert terms["resume"] == 4
    assert "résumé" not in terms and "resume" in terms
    # Greek uppercase-with-diacritics folds onto the folded lowercase form
    assert terms["μαιοσ"] == 2
    # native digits fold to ASCII
    assert terms["706"] == 1
    # the bare modifier letter folded away entirely — no empty term
    assert "" not in terms
    assert "ʰ" not in terms


def test_query_side_twin(spark, icu_index):  # noqa: F811
    from lucene_solr_spark.query.executor import Searcher

    s = Searcher(spark, icu_index)
    assert s.analyze_query("RÉSUMÉ") == ["resume"]
    # stop filter applies to the unfolded lowercase form
    assert s.analyze_query("the Résumé") == ["resume"]
    hits = s.search("Résumé", k=10).collect()
    assert len(hits) == 2  # u1 (tf 3) and u3 (tf 1)
    doc_urls = {
        r["url"]
        for r in spark.read.parquet(icu_index.docs)
        .where(f"doc_id in ({','.join(str(h['doc_id']) for h in hits)})")
        .collect()
    }
    assert doc_urls == {"u1", "u3"}


def test_norms_count_folded_away_tokens(spark, icu_index):  # noqa: F811
    # u4: "৭০৬ native digits and ʰ alone" → post-stop tokens ৭০৬ native
    # digits ʰ alone = 5 ("and" stopped); ʰ folds away but keeps its norm
    # slot, like a token any downstream filter blanks
    import numpy as np

    from lucene_solr_spark.index.norms import decode_norm_doclen

    post = spark.read.parquet(icu_index.postings)
    row = post.where("term = '706'").collect()[0]
    dl = int(decode_norm_doclen(np.array([row["norm_bytes"][0]]))[0])
    assert dl >= 5
