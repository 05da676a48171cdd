"""lucene/classification module parity: SimpleNaiveBayesClassifier and
KNearestNeighborClassifier vs independent numpy oracles implementing the
reference formulas directly (SimpleNaiveBayesClassifier.java:103-167,
KNearestNeighborClassifier.java:60-93)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import standard_tokenize
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query import classify as CL
from lucene_solr_spark.query.executor import Searcher

# small 3-class corpus; texts avoid stopwords so token counts are obvious
CORPUS = [
    ("u00", "spark shuffle executor partition spark", "tech"),
    ("u01", "spark catalyst plan codegen", "tech"),
    ("u02", "executor shuffle spill memory", "tech"),
    ("u03", "pasta basil tomato oven", "food"),
    ("u04", "tomato soup basil garlic pasta", "food"),
    ("u05", "goal striker penalty referee", "sport"),
    ("u06", "referee goal keeper corner", "sport"),
    ("u07", "spark oven goal", None),  # null class: ignored in training
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    src = spark.createDataFrame(
        [(u, t) for u, t, _ in CORPUS], "url string, text string"
    )
    labeled = spark.createDataFrame(
        [(u, c) for u, _, c in CORPUS], "url string, cls string"
    )
    paths = build_index(spark, src, str(tmp_path_factory.mktemp("clidx")))
    searcher = Searcher(spark, paths)
    model = CL.train_naive_bayes(searcher, labeled, "cls")
    return searcher, labeled, model


def _oracle_nb(text: str):
    """Reference math verbatim: priors/likelihood products in float64
    (SimpleNaiveBayesClassifier.java:103-146), stats computed from CORPUS."""
    labeled = [(u, t, c) for u, t, c in CORPUS if c is not None]
    toks_by_doc = {u: [t for _, t in standard_tokenize(txt)] for u, txt, _ in CORPUS}
    docs_with_class = len(labeled)
    classes = sorted({c for _, _, c in labeled})
    # sumDocFreq over the WHOLE index (incl. the unlabeled doc) / docCount
    vocab_doc_pairs = sum(len(set(toks)) for toks in toks_by_doc.values())
    n_docs_text = sum(1 for toks in toks_by_doc.values() if toks)
    avg_unique = vocab_doc_pairs / n_docs_text
    q_toks = [t for _, t in standard_tokenize(text)]
    best, best_cls = -1.0, None
    for c in classes:
        docs_c = [u for u, _, cc in labeled if cc == c]
        prior = len(docs_c) / docs_with_class
        den = avg_unique * len(docs_c) + docs_with_class
        lik = 1.0
        for w in q_toks:
            hits = sum(1 for u in docs_c if w in set(toks_by_doc[u]))
            lik *= (hits + 1) / den
        val = prior * lik
        if val > best:  # strictly greater: first (asc) class wins ties
            best, best_cls = val, c
    return best_cls, best


def test_nb_model_stats(setup):
    searcher, labeled, model = setup
    assert model.docs_with_class == 7
    # avg unique terms per doc over the text field (8 docs, incl. unlabeled)
    exp_pairs = sum(
        len({t for _, t in standard_tokenize(txt)}) for _, txt, _ in CORPUS
    )
    assert model.avg_unique_terms == pytest.approx(exp_pairs / 8.0)
    cls = model.classes.set_index("cls")
    assert cls.loc["tech", "n_docs"] == 3
    assert cls.loc["food", "prior"] == pytest.approx(2 / 7)
    # hits(text:spark AND class:tech) = 2 docs
    wc = model.word_class.where(
        (F.col("term") == "spark") & (F.col("cls") == "tech")
    ).collect()
    assert wc and wc[0]["n_docs_with_word"] == 2


@pytest.mark.parametrize(
    "text",
    [
        "spark shuffle memory",
        "basil tomato",
        "goal referee spark",
        "unknownword",
        "spark goal",  # cross-class evidence
    ],
)
def test_nb_assign_matches_reference_math(setup, spark, text):
    searcher, labeled, model = setup
    exp_cls, exp_val = _oracle_nb(text)
    inputs = spark.createDataFrame([(1, text)], "id long, text string")
    got = CL.classify_naive_bayes(model, inputs).collect()[0]
    assert got["assigned_class"] == exp_cls
    assert math.exp(got["log_score"]) == pytest.approx(exp_val, rel=1e-9)


def test_nb_batch_and_empty_input(setup, spark):
    searcher, labeled, model = setup
    inputs = spark.createDataFrame(
        [(1, "pasta garlic"), (2, "executor codegen"), (3, "")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in CL.classify_naive_bayes(model, inputs).collect()}
    assert rows[1]["assigned_class"] == _oracle_nb("pasta garlic")[0]
    assert rows[2]["assigned_class"] == _oracle_nb("executor codegen")[0]
    # empty input: argmax of prior alone = tech (3/7), exactly ln(prior)
    assert rows[3]["assigned_class"] == "tech"
    assert rows[3]["log_score"] == pytest.approx(math.log(3 / 7))


def test_knn_classify(setup):
    searcher, labeled, model = setup
    # neighbours of a clearly-tech text: min_term_freq=1 because the input
    # is short (reference default 2 would drop every single-occurrence term)
    cls, score = CL.knn_classify(
        searcher,
        labeled,
        "cls",
        "spark shuffle executor",
        k=3,
        min_doc_freq=1,
        min_term_freq=1,
    )
    assert cls == "tech"
    assert score == pytest.approx(1.0)  # all 3 neighbours are tech


def test_knn_null_class_neighbours_skipped(setup):
    searcher, labeled, model = setup
    # "oven goal" pulls u07 (null class) into the neighbour set; it must not
    # vote (KNearestNeighborClassifier.java:73-75)
    cls, score = CL.knn_classify(
        searcher,
        labeled,
        "cls",
        "oven goal",
        k=4,
        min_doc_freq=1,
        min_term_freq=1,
    )
    assert cls in ("food", "sport")
    assert 0 < score <= 1.0
