"""End-to-end training-data curation: the pipeline a 100 TB web corpus runs
BEFORE anything is indexed or trained on.

Composes the repo's pipeline operators into the canonical CC-style flow
(each stage is the operator already gated/tested on its own):

  raw pages
    → language filter        (textstats.lang_id — stopword-ratio heuristic)
    → quality filter         (textstats.quality_scores — Gopher/C4-style
                              token-count / token-length / stop-ratio cuts)
    → exact dedup            (dedup.exact_dedup — md5 hash-groupBy,
                              lowest-key survivor)
    → near-dup groups        (dedup.minhash_signatures → minhash_lsh_pairs
                              → connected_components: MinHash-LSH candidate
                              pairs closed into duplicate groups)
    → canonical survivors    (keep one doc per group: the min key)

Every stage is a Catalyst plan over the corpus (joins/aggregations — no
driver-side materialization of anything corpus-sized); the whole flow is
shaped as filter-early (the cheap JVM-expression predicates prune before
the shuffle-bearing dedup stages see a row). The output frame feeds
`index.build.build_index` directly, and `jobs/curate_job.py` is the
spark-submit entrypoint.

Per-stage counts ride as Observations where possible — one action at the
end, not one count() per stage (the driver-barrier discipline from the
index build).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textstats


@dataclass
class CurationReport:
    n_input: int
    n_after_lang: int
    n_after_quality: int
    n_after_exact: int
    n_after_neardup: int

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def curate_corpus(
    pages: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    lang: str | None = "en",
    min_tokens: int = 5,
    max_tokens: int | None = None,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    min_stop_ratio: float | None = None,
    near_dup: bool = True,
) -> tuple[DataFrame, CurationReport]:
    """Returns (curated pages frame, per-stage counts). The returned frame
    has the input schema (survivors only) — feed it to build_index.

    Counting note: the per-stage counts exist for the report; production
    runs can pass the frame on without materializing them (the plan is
    lazy). They are computed here with distinct jobs because the stages
    are join-separated (an Observation can only ride a stage that runs).
    """
    n_input = pages.count()

    df = pages
    if lang is not None:
        lids = textstats.lang_id(df, text_col=text_col, key_col=key_col, cast_key=False)
        df = df.join(
            lids.where(F.col("pred_lang") == lang).select(key_col), key_col, "left_semi"
        )
    n_after_lang = df.count()

    q = textstats.quality_scores(df, text_col=text_col, key_col=key_col, cast_key=False)
    cond = (F.col("n_tokens") >= min_tokens) & (
        F.col("mean_token_len").between(min_mean_token_len, max_mean_token_len)
    )
    if max_tokens is not None:
        cond = cond & (F.col("n_tokens") <= max_tokens)
    if min_stop_ratio is not None:
        cond = cond & (F.col("stop_ratio") >= min_stop_ratio)
    df = df.join(q.where(cond).select(key_col), key_col, "left_semi")
    n_after_quality = df.count()

    # exact dedup: one survivor per identical text (lowest key)
    survivors = dedup.exact_dedup(df, text_col=text_col, key_col=key_col).select(
        key_col
    )
    df = df.join(survivors, key_col, "left_semi")
    n_after_exact = df.count()

    n_after_neardup = n_after_exact
    if near_dup:
        sigs = dedup.minhash_signatures(df, text_col=text_col, key_col=key_col)
        pairs = dedup.minhash_lsh_pairs(sigs, key_col=key_col)
        groups = dedup.dedup_groups(df, pairs, key_col=key_col)
        df = df.join(
            groups.where(~F.col("is_duplicate")).select(key_col), key_col, "left_semi"
        )
        n_after_neardup = df.count()

    report = CurationReport(
        n_input=n_input,
        n_after_lang=n_after_lang,
        n_after_quality=n_after_quality,
        n_after_exact=n_after_exact,
        n_after_neardup=n_after_neardup,
    )
    return df, report
