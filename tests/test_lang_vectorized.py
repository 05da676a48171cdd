"""Vectorized multilingual build path (round-5): JVM raw tokenization +
per-distinct-(lang, surface) chain application must be output-identical to
the Arrow placeholder reference path (`_analyzed_placeholder_tokens`), which
is itself byte-verified against the reference's compiled analyzers.

Covers: the Java-regex/Python-regex tokenizer twin-ship, the factorized
finalize_token_batch kernel (mixed-language and single-language batches,
CJK passthrough), inverter equivalence (terms, tfs, positions), and the
doc-length column."""

from __future__ import annotations

import random
import unicodedata

import numpy as np
import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.analysis.analyzer import _PY_TOKEN_RE
from lucene_solr_spark.analysis.lang import (
    RAW_TOKEN_REGEX_JAVA,
    _analyzed_placeholder_tokens,
    _sanitize_langs,
    finalize_token_batch,
    lang_doc_length_col,
    raw_lang_token_array,
)

MULTI = [
    ("l'avion d'été the vector Größe", "fr"),
    ("der Tisch und die Tische laufen Linien line", "de"),
    ("las niñas bonitas y los árboles", "es"),
    ("meninas bonitas e tranquilamente", "pt"),
    ("бегущий человек и собаки", "ru"),
    ("kitapları ve ağaçlar İstanbul IŞIK", "tr"),
    ("Τα μαθήματα και ο μαθητής ΣΟΦΟΣ", "el"),
    ("an scoil agus na bhfear t-athair", "ga"),
    ("the quick brown foxes are running dogs'", "en"),
    ("日本語のテキスト カタカナ 漢字 mixed latin", "ja"),
    ("中文文档 one two", "zh"),
    ("some unknown language text the and tokens", "xx"),
    ("", "de"),
    ("नमस्ते दुनिया लड़के", "hi"),
    ("1,000 u.s.a 3.14 o'brien " + "y" * 300, "en"),
]


def test_java_regex_matches_python_tokenizer(spark):
    random.seed(7)
    pool = []
    for cp in (
        list(range(0x20, 0x250))
        + list(range(0x300, 0x700))
        + list(range(0x900, 0xA00))
        + list(range(0x3000, 0x3100))
        + list(range(0x4E00, 0x4E40))
        + list(range(0xFF00, 0xFF60))
        + [0x2019]
    ):
        ch = chr(cp)
        if unicodedata.category(ch) != "Cc":
            pool.append(ch)
    strings = [t for t, _ in MULTI] + [
        "".join(random.choice(pool) for _ in range(random.randint(0, 40)))
        for _ in range(500)
    ]
    sdf = spark.createDataFrame([(s,) for s in strings], "text string")
    got = sdf.select(
        "text",
        F.regexp_extract_all(F.col("text"), F.lit(RAW_TOKEN_REGEX_JAVA), 0).alias("jvm"),
    ).collect()
    for r in got:
        py = [m.group(0) for m in _PY_TOKEN_RE.finditer(r.text or "")]
        assert py == list(r.jvm), f"tokenizer twin diverged on {r.text!r}"


def test_finalize_token_batch_equals_reference_path():
    # mixed-language flat batch vs the per-token reference chain
    flat_terms, flat_langs, want = [], [], []
    for text, lang in MULTI:
        ref = _analyzed_placeholder_tokens(text, lang)
        toks = (
            ref
            if lang in ("zh", "ja", "ko")
            else [m.group(0) for m in _PY_TOKEN_RE.finditer(text)]
        )
        assert len(toks) == len(ref)
        flat_terms.extend(toks)
        flat_langs.extend([lang] * len(toks))
        want.extend(ref)
    got = finalize_token_batch(
        np.asarray(flat_terms, dtype=object), _sanitize_langs(flat_langs)
    )
    assert list(got) == want


def test_finalize_single_language_fast_path():
    text = "der Tisch und die Tische laufen Linien line"
    ref = _analyzed_placeholder_tokens(text, "de")
    toks = np.asarray(
        [m.group(0) for m in _PY_TOKEN_RE.finditer(text)], dtype=object
    )
    got = finalize_token_batch(toks, _sanitize_langs(["de"] * len(toks)))
    assert list(got) == ref
    # None lang → standard fallback chain
    got2 = finalize_token_batch(toks, _sanitize_langs([None] * len(toks)))
    ref2 = _analyzed_placeholder_tokens(text, None)
    assert list(got2) == ref2


def test_invert_tokens_lang_equals_placeholder_path(spark):
    from lucene_solr_spark.index.build import _invert_batch, invert_tokens

    df = spark.createDataFrame(
        [(i, t, lg) for i, (t, lg) in enumerate(MULTI)],
        "doc_id long, text string, lang string",
    )
    got = (
        invert_tokens(df, "text", positions=True, tokenizer="lang")
        .orderBy("doc_id", "term")
        .collect()
    )
    # reference: placeholder arrays through the prefiltered kernel
    ref_rows = _invert_batch(
        np.arange(len(MULTI), dtype=np.int64),
        [_analyzed_placeholder_tokens(t, lg) for t, lg in MULTI],
        positions=True,
        prefiltered=True,
    ).sort_values(["doc_id", "term"])
    assert len(got) == len(ref_rows)
    for r, (_, e) in zip(got, ref_rows.iterrows()):
        assert (r.doc_id, r.term, r.tf) == (e.doc_id, e.term, e.tf)
        assert list(r.positions) == list(e.positions)


def test_lang_doc_length_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t, lg) for i, (t, lg) in enumerate(MULTI)],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: r.dl
        for r in df.select(
            "doc_id",
            lang_doc_length_col(F.col("text"), F.col("lang")).alias("dl"),
        ).collect()
    }
    for i, (t, lg) in enumerate(MULTI):
        want = sum(1 for tok in _analyzed_placeholder_tokens(t, lg) if tok)
        assert got[i] == want, (i, t, lg)


def test_build_e2e_lang_dispatch(spark, tmp_path):
    """Full build with tokenizer='lang': chain-specific probe terms land in
    the right documents (the engine_lang_dispatch gate shape, in-repo)."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u0", "die Linien und line Tische", "de"),
        ("u1", "the vector line is here", "en"),
        ("u2", "le vector et l'avion", "fr"),
        ("u3", "日本語 テキスト line", "ja"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    paths = build_index(
        spark, df, str(tmp_path / "idx"), tokenizer="lang", chunk_span=16
    )
    s = Searcher(spark, paths)
    by_url = {
        r.doc_id: r.url
        for r in spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    }

    def urls(term):
        return sorted(
            by_url[r.doc_id] for r in s.match_docs([term]).collect()
        )

    assert urls("lin") == ["u0"]  # german_light_stem('line'/'linien')
    assert urls("vecto") == ["u2"]  # french norm strips final r
    assert urls("the") == []  # en chain stops it; no other doc has it
    # en porter keeps 'line'; the CJK chain indexes embedded latin verbatim
    assert urls("line") == ["u1", "u3"]
    assert urls("テキ") == ["u3"]  # katakana bigram via the CJK path
