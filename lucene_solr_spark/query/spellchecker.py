"""Classic n-gram SpellChecker (lucene/suggest/spell/SpellChecker.java) —
the engine behind Solr's IndexBasedSpellChecker and FileBasedSpellChecker
(AbstractLuceneSpellChecker subclasses; the repo's DirectSpellChecker
covers the dictionary-free Levenshtein-automaton family).

Reference mechanics reproduced:
- gram sizes by word length — getMin/getMax (SpellChecker.java:555-573):
  len>5 → 3..4, len==5 → 2..3, else 1..2;
- candidate retrieval = SHOULD sum over gramN terms with startN boosted
  2.0 and endN 1.0 (:342-366, bStart/bEnd :93-95), top 10·numSug
  candidates by that gram score (:369);
- rerank by LevensteinDistance similarity = 1 − ed/max(len_a, len_b)
  (LevensteinDistance.java:107), accuracy floor 0.5 (:115);
- SuggestWordScoreComparator order: score, then freq, then string
  (SuggestWordScoreComparator.java:35-53);
- suggest modes (:319-345): WHEN_NOT_IN_INDEX returns the word itself if
  present; MORE_POPULAR keeps only candidates with freq above the
  word's; candidates absent from the backing field are dropped when a
  freq source exists.

Spark shape: the gram "auxiliary index" is a DataFrame (key, gram, word,
freq) built once from the dictionary with column expressions; a
suggestion is one broadcast join of the query's few (key, gram, boost)
rows against it, a groupBy(word) sum, and a JVM levenshtein rerank over
≤10·numSug rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

F_WORD = "word"
B_START = 2.0
B_END = 1.0
DEFAULT_ACCURACY = 0.5


def _get_min(l: int) -> int:
    return 3 if l > 5 else (2 if l == 5 else 1)


def _get_max(l: int) -> int:
    return 4 if l > 5 else (3 if l == 5 else 2)


def _grams(text: str, ng: int) -> list[str]:
    return [text[i : i + ng] for i in range(len(text) - ng + 1)]


class NGramSpellChecker:
    """words_df: (word[, freq]) — the dictionary. freq present → the
    IndexBasedSpellChecker shape (e.g. the engine's terms table with
    df as freq); absent → FileBasedSpellChecker (SUGGEST_ALWAYS world,
    SpellChecker.java:324-327)."""

    def __init__(
        self,
        spark: SparkSession,
        words_df: DataFrame,
        word_col: str = "word",
        freq_col: str | None = None,
        accuracy: float = DEFAULT_ACCURACY,
    ):
        self.spark = spark
        self.accuracy = accuracy
        self.has_freq = freq_col is not None
        w = F.col(word_col).alias(F_WORD)
        freq = (F.col(freq_col) if freq_col else F.lit(0)).cast("long").alias("freq")
        base = words_df.select(w, freq).where(F.length(F_WORD) > 0).distinct()
        frames = []
        for ng in range(1, 5):
            ln = F.length(F_WORD)
            # words whose length puts `ng` in [getMin, getMax]
            lo = F.when(ln > 5, 3).when(ln == 5, 2).otherwise(1)
            hi = F.when(ln > 5, 4).when(ln == 5, 3).otherwise(2)
            sub = base.where((F.lit(ng) >= lo) & (F.lit(ng) <= hi) & (ln >= ng))
            grams = F.transform(
                F.sequence(F.lit(1), ln - ng + 1),
                lambda i: F.substring(F.col(F_WORD), i, ng),
            )
            frames.append(
                sub.select(
                    F.explode(grams).alias("gram"), F_WORD, "freq"
                ).withColumn("key", F.lit(f"gram{ng}"))
            )
            frames.append(
                sub.select(
                    F.substring(F.col(F_WORD), 1, ng).alias("gram"), F_WORD, "freq"
                ).withColumn("key", F.lit(f"start{ng}"))
            )
            frames.append(
                sub.select(
                    F.substring(F.col(F_WORD), ln - ng + 1, ng).alias("gram"),
                    F_WORD, "freq",
                ).withColumn("key", F.lit(f"end{ng}"))
            )
        df = frames[0]
        for f_ in frames[1:]:
            df = df.unionByName(f_)
        # the auxiliary spell index: persist like SpellChecker's sidecar dir
        self.grams = df.persist()
        self.words = base.persist()

    def word_freq(self, word: str) -> int:
        if not self.has_freq:
            return 0
        r = (
            self.words.where(F.col(F_WORD) == word)
            .limit(1).select("freq").collect()
        )
        return int(r[0]["freq"]) if r else 0

    def suggest_similar(
        self,
        word: str,
        num_sug: int = 5,
        suggest_mode: str = "when_not_in_index",
        accuracy: float | None = None,
        distance: str = "levenshtein",
    ) -> list[str]:
        """`distance` mirrors setStringDistance (SpellChecker.java:239-247;
        the reference test cycles Levenstein/JaroWinkler/NGram distances):
        'levenshtein' (default), 'jarowinkler', 'ngram' — the same
        implementations backing the strdist() function query."""
        accuracy = self.accuracy if accuracy is None else accuracy
        if not self.has_freq:
            suggest_mode = "always"
        goal_freq = 0
        if suggest_mode in ("when_not_in_index", "more_popular"):
            freq = self.word_freq(word)
            if suggest_mode == "when_not_in_index" and freq > 0:
                return [word]
            if suggest_mode == "more_popular":
                goal_freq = freq

        # the query's (key, gram, boost) rows — formed driver-side like
        # the reference forms its BooleanQuery
        rows = []
        l = len(word)
        for ng in range(_get_min(l), _get_max(l) + 1):
            g = _grams(word, ng)
            if not g:
                continue
            rows.append((f"start{ng}", g[0], B_START))
            rows.append((f"end{ng}", g[-1], B_END))
            for gr in g:
                rows.append((f"gram{ng}", gr, 1.0))
        if not rows:
            return []
        q = self.spark.createDataFrame(rows, "key string, gram string, boost double")
        cand = (
            self.grams.join(F.broadcast(q), ["key", "gram"])
            .groupBy(F_WORD, "freq")
            .agg(F.sum("boost").alias("gscore"))
            .orderBy(F.desc("gscore"), F_WORD)
            .limit(10 * num_sug)  # maxHits (:369)
        )
        if distance == "levenshtein":
            sim = F.lit(1.0) - F.levenshtein(F.lit(word), F.col(F_WORD)).cast(
                "double"
            ) / F.greatest(F.length(F_WORD), F.lit(l)).cast("double")
        elif distance == "jarowinkler":
            from ..functions.valuesources import strdist_jaro_winkler

            sim = strdist_jaro_winkler(F.lit(word), F.col(F_WORD))
        elif distance == "ngram":
            from ..functions.valuesources import strdist_ngram

            sim = strdist_ngram(F.lit(word), F.col(F_WORD))
        else:
            raise ValueError(f"unknown distance '{distance}'")
        out = (
            cand.where(F.col(F_WORD) != word)
            .withColumn("score", sim)
            .where(F.col("score") >= accuracy)
        )
        if self.has_freq:
            out = out.where(F.col("freq") >= 1)
            if suggest_mode == "more_popular":
                out = out.where(F.col("freq") > goal_freq)
        rows = (
            out.orderBy(F.desc("score"), F.desc("freq"), F.desc(F_WORD))
            .limit(num_sug)
            .collect()
        )
        return [r[F_WORD] for r in rows]


def file_dictionary(spark: SparkSession, words) -> DataFrame:
    """PlainTextDictionary: one word per line (or an iterable of words)."""
    if isinstance(words, str):
        with open(words) as fh:
            words = [w.strip() for w in fh if w.strip()]
    return spark.createDataFrame([(w,) for w in words], "word string")


def index_spellchecker(searcher, min_freq: int = 1) -> NGramSpellChecker:
    """IndexBasedSpellChecker over the engine's term dictionary (the
    HighFrequencyDictionary idea: only terms with df ≥ min_freq enter)."""
    terms = searcher.terms.where(F.col("df") >= min_freq)
    return NGramSpellChecker(
        searcher.spark, terms, word_col="term", freq_col="df"
    )
