"""Inverted-index build: pages → docs / terms / postings / lineage.

Spark-first re-expression of the Lucene write path, structured EXACTLY like
Lucene's own two-level design (DocumentsWriterPerThread → segment merge):

  read → dedup(url, keep latest warc_ts) → deterministic docIDs (global url
  rank, parquet-staged) → ONE map pass per partition that tokenizes (JVM
  regex), inverts per doc (DocInverterPerField.java:92-172), computes norms
  inline (BM25Similarity.java:95-97) and packs PARTIAL posting rows per
  (term, seg, chunk) over the partition's doc range (the DWPT in-RAM
  segment, TermsHashPerField.java:141-165 / Lucene41PostingsWriter.java:
  240-266) → one shuffle of those COMPACT partial rows keyed
  (term, seg, chunk) → applyInPandas sort-merge of partials
  (TermsConsumer.java:86-171) → parquet segments + lineage rows; the term
  dictionary (term, termID, df, ttf) is derived from the written postings.

Why partial-pack-then-merge instead of explode → groupBy(term, doc):
the exploded row stream is ~vocabulary-independent 10^11 rows at CC scale;
JVM object aggregation state for collect_list OOMs executors, and shuffling
one row per (doc, term) pays Arrow/row overhead on ~50x more rows than the
partial posting rows (one per term × input-partition × chunk). Map-side
partial packing is precisely Lucene's DWPT architecture.

Scale design (the part that must survive 100 TB):

- **Skew**: head terms have posting lists with millions of docs. The pack
  key is (term, chunk_id) with chunk_id = doc_id // chunk_span — a
  deterministic salt that bounds every merged posting row to chunk_span
  docs (no OOM on the 'the'-shaped term) while preserving global docID
  order across chunks, exactly like Lucene's 128-doc blocks writ large.
- **One wide shuffle** of compact pre-packed rows; everything before it is
  map-only over the staged, range-partitioned corpus.
- **Norms denormalized into posting rows** (the per-segment .nvd analog):
  query scoring is scan → kernel → one groupBy(doc) — no join.
- **Block metadata every 128 docs** (Lucene41PostingsFormat block size):
  last_doc for skip/conjunction, block max(tf)/max(norm_byte) for lossless
  block-max WAND bounds.
- **Lineage**: one row per segment with doc ranges, counts and byte sizes;
  builds resume from the lineage table (UpdateLog.java:71-258 semantics).

Postings are physically keyed by the term string (parquet dictionary
encoding + row-group pruning on the sorted term column); the `terms` table
still carries dense termIDs (global term rank) for the dictionary API.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    doc_length_col,
    doc_length_col_for,
    token_array,
    token_array_for,
)
from .docids import assign_dense_ids
from .norms import encode_norm

BLOCK_SIZE = 128  # Lucene41PostingsFormat.BLOCK_SIZE (:384)
# dictionary impact metadata (the Lucene 8+ per-block impacts idea, hoisted
# into the term dictionary): top-K impact pairs per term, and per-superchunk
# score upper bounds capped at MAX_SC_ENTRIES entries per term so a head
# term's sketch stays ≤ ~12 KB even at 10^12 docs (15M chunks coarsen to
# 1024 superchunks)
IMPACT_K = 32
MAX_SC_ENTRIES = 1024
DEFAULT_CHUNK_SPAN = 1 << 16  # max docs per merged posting row (skew bound):
# a head term present in every doc of a chunk yields a ~1-2 MB row — safely
# under executor task memory at any concurrency.

POSTINGS_SCHEMA = (
    "term string, seg_id int, chunk_id long, first_doc long, df_chunk int, "
    "doc_gaps array<int>, tfs array<int>, norm_bytes array<int>, "
    "skip_last_doc array<long>, block_max_tf array<int>, block_max_nb array<int>, "
    "pos_flat array<int>, "
    # per-row impact metadata, computed where the arrays are already in
    # memory (pack/recombine) so the dictionary job never re-reads the fat
    # array columns: ttf_row = Σ tfs; ub = max block score ratio (valid
    # chunk upper bound); imp_* = the row's top-IMPACT_K (tf, norm, doc)
    # pairs under (ratio desc, doc asc), imp_nr = each kept pair's NEGATED
    # float64 ratio so the dictionary cascade can re-select in pure JVM
    # (array_sort on struct(nr, doc, …) = the same total order). Rows
    # packed without global stats (NRT appends, delete rewrites) carry
    # ub=0/empty imps — those paths invalidate the dictionary sketches
    # anyway (stats.json impact_meta).
    "ttf_row long, ub double, imp_nr array<double>, imp_tfs array<long>, "
    "imp_nbs array<long>, imp_docs array<long>"
)


def _impact_select(cache64: np.ndarray, tfa, nba, doca):
    """Top-IMPACT_K pairs under the TOTAL order (score ratio desc, doc asc).

    A total order makes the per-chunk → per-superchunk → per-term selection
    a closure: any pair in the global top-K under this order is in the
    top-K of every subset containing it, so the cascaded kept set is
    exactly the global top-K — including which doc wins a ratio tie (the
    smallest docID, matching TopScoreDocCollector's tie-break after the
    monotone float32 w· rounding at query time)."""
    tfa = np.asarray(tfa, dtype=np.int64)
    nba = np.asarray(nba, dtype=np.int64)
    doca = np.asarray(doca, dtype=np.int64)
    r = tfa.astype(np.float64) / (tfa + cache64[nba])
    order = np.lexsort((doca, -r))[:IMPACT_K]
    return tfa[order], nba[order], doca[order], -r[order]


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


def _pack_rows(
    term,
    seg_id: int,
    chunk_id: int,
    docs: np.ndarray,
    tfs: np.ndarray,
    nbs: np.ndarray,
    pos_lists,
    cache64: np.ndarray | None = None,
) -> dict:
    """Pack one already-doc-sorted (term, seg, chunk) slice → posting-row
    dict, numpy-only (Lucene41PostingsWriter semantics: docID deltas
    :240-246, 128-doc block metadata :256-266). With cache64 (the float64
    norm cache from global stats) the row also carries its impact metadata
    (ub + top-K pairs) so the dictionary build never re-reads the arrays."""
    gaps = np.empty_like(docs)
    gaps[0] = 0
    gaps[1:] = np.diff(docs)
    n = len(docs)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    ends = np.minimum((np.arange(nblocks) + 1) * BLOCK_SIZE, n) - 1
    if pos_lists is not None:
        pos_flat = (
            np.concatenate([np.asarray(p, dtype=np.int32) for p in pos_lists])
            if n
            else np.array([], dtype=np.int32)
        )
    else:
        pos_flat = None
    block_max_tf = np.array(
        [tfs[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max() for i in range(nblocks)],
        dtype=np.int32,
    )
    block_max_nb = np.array(
        [nbs[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max() for i in range(nblocks)],
        dtype=np.int32,
    )
    if cache64 is not None:
        bmtf = block_max_tf.astype(np.float64)
        ub = float(np.max(bmtf / (bmtf + cache64[block_max_nb])))
        ktf, knb, kdoc, knr = _impact_select(cache64, tfs, nbs, docs)
        imp_tfs, imp_nbs, imp_docs, imp_nr = (
            ktf.tolist(), knb.tolist(), kdoc.tolist(), knr.tolist()
        )
    else:
        ub, imp_tfs, imp_nbs, imp_docs, imp_nr = 0.0, [], [], [], []
    return {
        "term": term,
        "seg_id": int(seg_id),
        "chunk_id": int(chunk_id),
        "first_doc": int(docs[0]),
        "df_chunk": n,
        "doc_gaps": gaps.astype(np.int32),
        "tfs": tfs.astype(np.int32),
        "norm_bytes": nbs.astype(np.int32),
        "skip_last_doc": docs[ends],
        "block_max_tf": block_max_tf,
        "block_max_nb": block_max_nb,
        "pos_flat": pos_flat,
        "ttf_row": int(np.asarray(tfs, dtype=np.int64).sum()),
        "ub": ub,
        "imp_nr": imp_nr,
        "imp_tfs": imp_tfs,
        "imp_nbs": imp_nbs,
        "imp_docs": imp_docs,
    }


def _invert_flat(
    doc_ids: np.ndarray,
    token_lists,
    stem: bool = False,
    prefiltered: bool = False,
    langs=None,
    fold_icu: bool = False,
):
    """Common inversion front half: batch of (doc_id, tokens[]) →
    per-(doc, term) group arrays (g_doc, terms-uniques, g_code, tf,
    positions, dl_of_group_doc), with pre-stop positions and post-stop
    filtering. Returns None for an effectively empty batch.

    stem=True runs the Porter stemmer over the factorized vocabulary —
    i.e. AFTER the stop filter, matching the EnglishAnalyzer chain order
    (PorterStemFilter follows StopFilter, EnglishAnalyzer.java:95-116), and
    once per distinct surface form instead of once per token.

    prefiltered=True: the token arrays already went through a full analysis
    chain upstream with dropped tokens kept as "" placeholders — only the
    placeholders are filtered here (they still consume positions,
    StopFilter's enablePositionIncrements semantics).

    langs (tokenizer='lang'): per-row language tags; tokens arrive RAW from
    the JVM regexp (or already-final from the CJK bigram transform) and the
    per-language chain runs HERE, once per distinct (lang, surface) via
    lang.finalize_token_batch — tokens the chain drops become "" after
    their positions are assigned, so stopwords consume positions exactly
    like the placeholder path."""
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    total = int(lens.sum())
    if total == 0:
        return None
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if len(t)])
    flat_docs = np.repeat(np.asarray(doc_ids, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)

    if langs is not None:
        from ..analysis.lang import _sanitize_langs, finalize_token_batch

        flat_terms = finalize_token_batch(
            flat_terms, np.repeat(_sanitize_langs(langs), lens)
        )
        keep = flat_terms != ""
    elif prefiltered:
        keep = np.fromiter((len(t) > 0 for t in flat_terms), dtype=bool, count=total)
    else:
        stop = ENGLISH_STOP_WORDS
        keep = np.fromiter(
            (t not in stop and len(t) <= MAX_TOKEN_LENGTH for t in flat_terms),
            dtype=bool,
            count=total,
        )
    flat_terms, flat_docs, flat_pos = flat_terms[keep], flat_docs[keep], flat_pos[keep]
    if len(flat_terms) == 0:
        return None

    codes, uniques = pd.factorize(flat_terms, sort=False)
    if stem:
        from ..analysis.english import stem_tokens

        # distinct surface forms can merge under stemming ("run"/"running");
        # remap codes through the stemmed vocabulary and let the stable
        # group sort below coalesce the merged (doc, term) groups — tf sums
        # and positions stay ascending because pre-sort order is positional
        scodes, suniques = pd.factorize(
            np.asarray(stem_tokens(np.asarray(uniques, dtype=object)), dtype=object),
            sort=False,
        )
        codes = scodes[codes]
        uniques = np.asarray(suniques, dtype=object)
    if fold_icu:
        # ICUFoldingFilter post-stop, once per DISTINCT surface form
        # (the factorized-inverter hook, same shape as the stem path) —
        # surfaces merged by folding ("Résumé"/"RESUME") coalesce below
        from ..analysis.icu import get_normalizer

        _fold = get_normalizer("utr30").normalize
        fcodes, funiques = pd.factorize(
            np.asarray([_fold(u) for u in uniques], dtype=object), sort=False
        )
        codes = fcodes[codes]
        uniques = np.asarray(funiques, dtype=object)
    order = np.lexsort((codes, flat_docs))  # stable → positions stay ascending
    d, c, p = flat_docs[order], codes[order], flat_pos[order]
    change = np.flatnonzero((np.diff(d) != 0) | (np.diff(c) != 0))
    bounds = np.concatenate(([0], change + 1, [len(d)]))
    g_doc = d[bounds[:-1]]
    g_code = c[bounds[:-1]]
    tf = np.diff(bounds).astype(np.int64)
    g_pos = np.split(p.astype(np.int32), bounds[1:-1])

    # post-stop doc length (DocInverterPerField.java:172) → norm byte
    # (BM25Similarity.java:95-97), computed inline — no docs-table join
    doc_codes, doc_uniq = pd.factorize(g_doc, sort=False)
    dl = np.bincount(doc_codes, weights=tf).astype(np.int64)
    g_nb = encode_norm(dl)[doc_codes].astype(np.int64)
    if fold_icu and "" in uniques:
        # a token folded away entirely (e.g. a bare modifier letter "ʰ")
        # produces no term, but still counted in the norm above (it WAS a
        # post-stop token, like a stopword position)
        live = np.flatnonzero(uniques[g_code] != "")
        g_doc, g_code, tf, g_nb = (
            g_doc[live], g_code[live], tf[live], g_nb[live])
        g_pos = [g_pos[i] for i in live]
        if len(g_doc) == 0:
            return None
    return g_doc, uniques, g_code, tf, g_pos, g_nb


def _invert_batch(
    doc_ids: np.ndarray,
    token_lists,
    positions: bool,
    stem: bool = False,
    prefiltered: bool = False,
    langs=None,
    fold_icu: bool = False,
) -> pd.DataFrame:
    """(doc_id, tokens[]) batch → rows (doc_id, term, tf[, positions])."""
    empty = {"doc_id": np.array([], dtype=np.int64), "term": [], "tf": np.array([], dtype=np.int32)}
    if positions:
        empty["positions"] = []
    inv = _invert_flat(
        doc_ids, token_lists, stem=stem, prefiltered=prefiltered, langs=langs,
        fold_icu=fold_icu,
    )
    if inv is None:
        return pd.DataFrame(empty)
    g_doc, uniques, g_code, tf, g_pos, _ = inv
    out = {"doc_id": g_doc, "term": uniques[g_code], "tf": tf.astype(np.int32)}
    if positions:
        out["positions"] = g_pos
    return pd.DataFrame(out)


def _toks_col(text_col: str, tokenizer: str, lang_col: str = "lang"):
    """Pre-inverter token-array column for the chosen tokenizer.
    tokenizer='lang' emits RAW JVM-regexp tokens (CJK rows: final bigram
    placeholders) — the per-language chain runs inside the inverter, once
    per distinct (lang, surface) (analysis/lang.py)."""
    if tokenizer == "lang":
        from ..analysis.lang import raw_lang_token_array

        return raw_lang_token_array(F.col(text_col), F.col(lang_col))
    if tokenizer == "lang-fidelity":
        # reference path: the whole chain per token inside the Arrow UDF —
        # kept for A/B measurement and as an escape hatch; ~an order of
        # magnitude more Python CPU than tokenizer='lang' on the 3
        # codegen-able stages (tokenize/lower/stop)
        from ..analysis.lang import lang_token_array

        return lang_token_array(F.col(text_col), F.col(lang_col))
    return token_array_for(F.col(text_col), tokenizer)


def invert_tokens(
    with_ids: DataFrame,
    text_col: str,
    positions: bool,
    tokenizer: str = "jvm",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, text) → (doc_id, term, tf[, positions]) via the chosen
    tokenizer + the Arrow inversion kernel (used by the NRT micro-batch
    path)."""
    schema = "doc_id long, term string, tf int" + (
        ", positions array<int>" if positions else ""
    )
    stem = tokenizer == "english"
    fold_icu = tokenizer == "icu_folding"
    lang_mode = tokenizer == "lang"
    prefiltered = tokenizer in ("lang-fidelity", "preanalyzed")

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _invert_batch(
                pdf["doc_id"].values,
                pdf["toks"].values,
                positions,
                stem=stem,
                prefiltered=prefiltered,
                langs=pdf["lang"].values if lang_mode else None,
                fold_icu=fold_icu,
            )

    cols = [
        "doc_id",
        F.coalesce(
            _toks_col(text_col, tokenizer, lang_col),
            F.array().cast("array<string>"),
        ).alias("toks"),
    ]
    if lang_mode:
        cols.append(F.col(lang_col).alias("lang"))
    return with_ids.select(*cols).mapInPandas(kernel, schema=schema)


def invert_and_pack_partials(
    with_ids: DataFrame,
    text_col: str,
    seg_span: int,
    chunk_span: int,
    positions: bool,
    tokenizer: str = "jvm",
    lang_col: str = "lang",
) -> DataFrame:
    """The DWPT pass: per Arrow batch, tokenize (JVM upstream) + invert +
    norm + pack PARTIAL posting rows per (term, seg, chunk) over the batch's
    docs. Output rows follow POSTINGS_SCHEMA (term string key)."""

    stem = tokenizer == "english"
    fold_icu = tokenizer == "icu_folding"
    lang_mode = tokenizer == "lang"
    prefiltered = tokenizer in ("lang-fidelity", "preanalyzed")

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            inv = _invert_flat(
                pdf["doc_id"].values,
                pdf["toks"].values,
                stem=stem,
                prefiltered=prefiltered,
                langs=pdf["lang"].values if lang_mode else None,
                fold_icu=fold_icu,
            )
            if inv is None:
                continue
            g_doc, uniques, g_code, tf, g_pos, g_nb = inv
            seg = g_doc // seg_span
            chunk = g_doc // chunk_span
            # arrange by (term, doc) → contiguous partial posting slices
            ord2 = np.lexsort((g_doc, g_code))
            c2, s2, k2, d2 = g_code[ord2], seg[ord2], chunk[ord2], g_doc[ord2]
            tf2, nb2 = tf[ord2], g_nb[ord2]
            pos2 = [g_pos[i] for i in ord2] if positions else None
            change = np.flatnonzero(
                (np.diff(c2) != 0) | (np.diff(s2) != 0) | (np.diff(k2) != 0)
            )
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(c2)]))
            rows = []
            for s, e in zip(starts, ends):
                rows.append(
                    _pack_rows(
                        uniques[c2[s]],
                        int(s2[s]),
                        int(k2[s]),
                        d2[s:e],
                        tf2[s:e],
                        nb2[s:e],
                        pos2[s:e] if positions else None,
                    )
                )
            yield pd.DataFrame(rows)

    cols = [
        "doc_id",
        F.coalesce(
            _toks_col(text_col, tokenizer, lang_col),
            F.array().cast("array<string>"),
        ).alias("toks"),
    ]
    if lang_mode:
        cols.append(F.col(lang_col).alias("lang"))
    return with_ids.select(*cols).mapInPandas(kernel, schema=POSTINGS_SCHEMA)


def make_recombiner(cache64: np.ndarray | None):
    """Build the (term[, seg], chunk)-group sort-merge kernel. With cache64
    the merged row also carries its impact metadata (computed here, where
    the merged arrays are already in memory — the dictionary job then reads
    ONLY the small impact columns, never the fat posting arrays)."""

    def recombine(pdf: pd.DataFrame) -> pd.DataFrame:
        docs_parts, tf_parts, nb_parts, pos_parts = [], [], [], []
        for r in pdf.itertuples(index=False):
            gaps = np.asarray(r.doc_gaps, dtype=np.int64)
            docs_parts.append(gaps.cumsum() + r.first_doc)
            tf_parts.append(np.asarray(r.tfs, dtype=np.int64))
            nb_parts.append(np.asarray(r.norm_bytes, dtype=np.int32))
            pos_parts.append(r.pos_flat)

        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        nbs = np.concatenate(nb_parts)
        order = np.argsort(docs, kind="stable")
        has_pos = all(p is not None for p in pos_parts)
        if has_pos:
            # split each part's flat positions back per doc, reorder, re-flatten
            per_doc_pos: list[np.ndarray] = []
            for part_tf, part_pos in zip(tf_parts, pos_parts):
                cuts = np.cumsum(part_tf)[:-1]
                per_doc_pos.extend(np.split(np.asarray(part_pos, dtype=np.int32), cuts))
            pos_flat = (
                np.concatenate([per_doc_pos[i] for i in order])
                if len(per_doc_pos)
                else np.array([], dtype=np.int32)
            )
        else:
            pos_flat = None
        docs, tfs, nbs = docs[order], tfs[order], nbs[order]
        row = _pack_rows(
            pdf["term"].iloc[0],
            int(pdf["seg_id"].iloc[0]),
            int(pdf["chunk_id"].iloc[0]),
            docs,
            tfs,
            nbs,
            None,
            cache64=cache64,
        )
        row["pos_flat"] = pos_flat
        return pd.DataFrame({k: [v] for k, v in row.items()})

    return recombine


def make_stream_recombiner(cache64: np.ndarray | None):
    """Streaming recombine kernel for mapInPandas over term-sorted
    partitions — the scale-robust replacement for groupBy.applyInPandas in
    the build's step 5.

    Why: a web-scale vocabulary makes MOST (term, chunk) groups singletons
    (one partial row — the term appeared in one input split), and
    applyInPandas pays a per-GROUP pandas materialization (~0.5-1 ms). At
    10^8+ distinct terms that overhead IS the build. This kernel detects
    group boundaries VECTORIZED inside each Arrow batch (the
    pack_sorted_partitions discipline: groups straddling batches carry
    over), passes singleton groups through UNCHANGED — a partial row is
    already a packed posting row; only its impact metadata (ub, imp_*,
    computable from its own arrays) is filled in — and runs the real
    sort-merge only for the few multi-row groups (head terms split across
    input partitions / chunk-straddling segments).

    Requires input sorted by (term, chunk_id) within each partition, with
    all rows of a (term, chunk) group in one partition (repartition by
    term guarantees it)."""
    merge_group = make_recombiner(cache64)

    def _fill_impacts(row_dict: dict) -> dict:
        if cache64 is None:
            return row_dict
        gaps = np.asarray(row_dict["doc_gaps"], dtype=np.int64)
        docs = gaps.cumsum() + row_dict["first_doc"]
        tfs = np.asarray(row_dict["tfs"], dtype=np.int64)
        nbs = np.asarray(row_dict["norm_bytes"], dtype=np.int64)
        bmtf = np.asarray(row_dict["block_max_tf"], dtype=np.float64)
        bmnb = np.asarray(row_dict["block_max_nb"], dtype=np.int64)
        row_dict["ub"] = float(np.max(bmtf / (bmtf + cache64[bmnb])))
        ktf, knb, kdoc, knr = _impact_select(cache64, tfs, nbs, docs)
        row_dict["imp_tfs"] = ktf.tolist()
        row_dict["imp_nbs"] = knb.tolist()
        row_dict["imp_docs"] = kdoc.tolist()
        row_dict["imp_nr"] = knr.tolist()
        return row_dict

    cols = [f.strip().split(" ")[0] for f in POSTINGS_SCHEMA.split(",")]

    def kernel(batches):
        carry: pd.DataFrame | None = None

        def process(pdf: pd.DataFrame, upto: int):
            """Rows [0:upto) hold only COMPLETE groups."""
            terms = pdf["term"].values[:upto]
            chunks = pdf["chunk_id"].values[:upto]
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (np.diff(chunks) != 0)
            )
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [upto]))
            single = (ends - starts) == 1
            out_rows: list[dict] = []
            # singletons: pass-through + impact fill, no pandas per group
            if single.any():
                idxs = starts[single]
                recs = pdf.iloc[:upto].iloc[idxs].to_dict("records")
                out_rows.extend(_fill_impacts(r) for r in recs)
            # real merges
            for s, e in zip(starts[~single], ends[~single]):
                merged = merge_group(pdf.iloc[s:e])
                out_rows.append({k: merged[k].iloc[0] for k in merged.columns})
            out = pd.DataFrame(out_rows)
            return out[[c for c in cols if c in out.columns]]

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            # the final (term, chunk) group may continue in the next batch
            last_t = pdf["term"].iloc[n - 1]
            last_c = pdf["chunk_id"].iloc[n - 1]
            keep_mask = (pdf["term"].values == last_t) & (
                pdf["chunk_id"].values == last_c
            )
            # keep_mask is a suffix run (sorted input): cut = start of the
            # last group = one past the last row NOT in it
            cut = int(np.flatnonzero(~keep_mask)[-1]) + 1 if not keep_mask.all() else 0
            carry = pdf.iloc[cut:].copy()
            if cut:
                yield process(pdf, cut)
        if carry is not None and len(carry):
            yield process(carry, len(carry))

    return kernel


def pack_sorted_partitions(enriched: DataFrame, positions: bool) -> DataFrame:
    """Pack (doc_id, term, tf, norm_byte[, positions]) rows into posting
    rows via repartition-on-key + sortWithinPartitions + mapInPandas (used
    by the NRT micro-batch path, where batches are small). Group boundaries
    found vectorized; groups straddling Arrow batches are carried over."""
    cols = ["term", "seg_id", "chunk_id", "doc_id", "tf", "norm_byte"] + (
        ["positions"] if positions else []
    )

    def kernel(batches):
        carry: pd.DataFrame | None = None

        def pack_block(pdf: pd.DataFrame, upto: int) -> pd.DataFrame:
            rows = []
            tid = pdf["term"].values[:upto]
            cid = pdf["chunk_id"].values[:upto]
            sid = pdf["seg_id"].values[:upto]
            docs = pdf["doc_id"].values[:upto].astype(np.int64)
            tfs = pdf["tf"].values[:upto]
            nbs = pdf["norm_byte"].values[:upto]
            poss = pdf["positions"].values[:upto] if positions else None
            change = np.flatnonzero(
                (tid[1:] != tid[:-1]) | (np.diff(cid) != 0) | (np.diff(sid) != 0)
            )
            starts = np.concatenate(([0], change + 1))
            ends_ = np.concatenate((change + 1, [upto]))
            for s, e in zip(starts, ends_):
                rows.append(
                    _pack_rows(
                        tid[s],
                        int(sid[s]),
                        int(cid[s]),
                        docs[s:e],
                        tfs[s:e],
                        nbs[s:e],
                        poss[s:e] if positions else None,
                    )
                )
            return pd.DataFrame(rows)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            tid = pdf["term"].values
            cid = pdf["chunk_id"].values
            sid_ = pdf["seg_id"].values
            last_mask = (tid == tid[-1]) & (cid == cid[-1]) & (sid_ == sid_[-1])
            cut = len(pdf) - int(
                last_mask[::-1].argmin() if not last_mask.all() else len(pdf)
            )
            if cut > 0:
                out = pack_block(pdf, cut)
                if len(out):
                    yield out
            carry = pdf.iloc[cut:].reset_index(drop=True)
        if carry is not None and len(carry):
            yield pack_block(carry, len(carry))

    return (
        enriched.select(*cols)
        .repartition(F.col("term"), F.col("chunk_id"))
        .sortWithinPartitions("term", "seg_id", "chunk_id", "doc_id")
        .mapInPandas(kernel, schema=POSTINGS_SCHEMA)
    )


def _norm_byte_udf():
    @F.pandas_udf("int")
    def enc(dl: pd.Series) -> pd.Series:
        return pd.Series(encode_norm(dl.values).astype(np.int32))

    return enc


def terms_ttf_col() -> F.Column:
    """Σ tfs of a posting row as a JVM expression (no Python)."""
    return F.aggregate(
        F.col("tfs"), F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )


def _doc_length_dispatch(text_col: str, tokenizer: str, lang_col: str):
    """Post-stop doc length column for non-jvm tokenizers."""
    if tokenizer == "lang":
        from ..analysis.lang import lang_doc_length_col

        return lang_doc_length_col(F.col(text_col), F.col(lang_col))
    if tokenizer == "lang-fidelity":
        from ..analysis.lang import lang_doc_length_col_fidelity

        return lang_doc_length_col_fidelity(F.col(text_col), F.col(lang_col))
    if tokenizer == "preanalyzed":
        # post-stop length = non-placeholder slots (the "" slots consume
        # positions but are not indexed terms, like stopword holes)
        return F.size(
            F.filter(
                token_array_for(F.col(text_col), tokenizer),
                lambda t: F.length(t) > 0,
            )
        )
    return doc_length_col_for(F.col(text_col), tokenizer)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    text_col: str = "text",
    key_col: str = "url",
    ts_col: str | None = None,
    num_segments: int = 1,
    positions: bool = True,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    resume: bool = False,
    sort_col: str | None = None,
    tokenizer: str = "jvm",
    lang_col: str = "lang",
    ram_budget_mb: float | None = None,
) -> IndexPaths:
    """Build (or resume) the full inverted index under `out_dir`.

    sort_col: optional INDEX SORTING (the SortingMergePolicy idea,
    lucene/misc SortingMergePolicy.java / later-Lucene index sorting):
    docIDs follow (sort_col asc, key_col asc) instead of key rank, so docs
    with similar static score potential cluster into the same docID chunks.
    Sorting by ascending field length puts short (BM25-favored) docs first,
    which is what makes block-max WAND's chunk pruning actually fire —
    uniformly shuffled corpora have near-identical block maxima everywhere
    and are unprunable at any block size."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # fat posting/partial rows → small columnar reader batches (see session.py)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")

    _t0 = [time.time()]

    def _phase(name: str) -> None:
        # opt-in wall-clock per build phase (LSS_PHASE_TIMING=1): the
        # scaling bench uses this to find which stage stops scaling
        if os.environ.get("LSS_PHASE_TIMING"):
            now = time.time()
            print(f"[build-phase] {name} {now - _t0[0]:.1f}s", file=sys.stderr, flush=True)
            _t0[0] = now

    # --- 1. dedup: updateDocument semantics = delete-by-key + re-add
    # (IndexWriter.java:1187) → keep the newest warc_ts per url. max_by hash
    # agg (map-side combinable), not a row_number window (sort shuffle, no
    # partial); ties broken deterministically by (ts, text).
    src = pages.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    carry_cols = [] if sort_col is None else [sort_col]
    if tokenizer in ("lang", "lang-fidelity"):
        carry_cols.append(lang_col)
    if ts_col is not None:
        aggs = [
            F.max_by(F.col(text_col), F.struct(F.col(ts_col), F.col(text_col))).alias(
                text_col
            )
        ]
        for c in carry_cols:
            aggs.append(
                F.max_by(F.col(c), F.struct(F.col(ts_col), F.col(text_col))).alias(c)
            )
        src = src.groupBy(key_col).agg(*aggs)

    # --- 2. deterministic docIDs = global url rank. The sorted corpus is
    # read by two downstream passes: corpus-scale inputs parquet-stage it
    # (caching multi-GB text in executors OOMs), small inputs (< 256 MB of
    # source files, or in-memory frames) persist instead — two fewer jobs
    # where the driver-barrier floor dominates.
    def _input_bytes(df: DataFrame) -> int | None:
        try:
            files = df.inputFiles()
        except Exception:  # noqa: BLE001 — exotic sources: assume big
            return None
        if not files:
            return 0  # in-memory frame (tests/toy corpora)
        try:
            return sum(
                os.path.getsize(f.removeprefix("file:")) for f in files
            )
        except OSError:  # non-local storage: assume big
            return None
    size = _input_bytes(src)
    small_input = size is not None and size < 256 * 1024 * 1024
    ids_staging = None if small_input else os.path.join(out_dir, "_staging_ids")
    id_cols = [key_col, text_col, *carry_cols]
    with_ids = assign_dense_ids(
        src.select(*id_cols),
        order_col=key_col if sort_col is None else [sort_col, key_col],
        id_col="doc_id",
        staging_dir=ids_staging,
        single_partition=small_input,
    )

    # --- 3. docs table: post-stop length (JVM expression) + norm byte —
    # a map-only pass over the staged corpus, no joins. Collection totals
    # (maxDoc, sumTTF) ride along as observed metrics of the SAME write job
    # instead of a separate aggregation pass (one driver barrier saved —
    # fixed job overhead is what caps scaling efficiency at small corpora).
    from pyspark.sql import Observation

    obs_docs = Observation("docs_totals")
    docs_tbl = (
        with_ids.select(
            "doc_id",
            key_col,
            (
                doc_length_col(F.col(text_col))
                if tokenizer == "jvm"
                else _doc_length_dispatch(text_col, tokenizer, lang_col)
            ).cast("long").alias("dl"),
        )
        .withColumn("norm_byte", _norm_byte_udf()(F.col("dl")))
        .observe(obs_docs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t"))
    )
    # docs live under seg=bulk so NRT appends (docs/seg=N) share the layout
    _phase("dedup+docids")
    docs_tbl.write.mode("overwrite").parquet(os.path.join(paths.docs, "seg=bulk"))
    totals = obs_docs.get
    _phase("docs+totals")
    docs_tbl = spark.read.parquet(paths.docs)
    max_doc = int(totals["n"])
    sum_ttf = int(totals["t"] or 0)
    if ram_budget_mb is not None:
        # RAM-bounded flush policy (IndexWriterConfig.setRAMBufferSizeMB,
        # default 16 MB; DocumentsWriterFlushControl flushes the DWPT whose
        # buffer crosses the budget): pick the segment count so one
        # segment's in-RAM posting buffer ≈ the budget. Estimated from the
        # observed token total — each token costs ~a posting entry in the
        # pack buffers (int64 doc gap + tf + norm byte, double that with
        # positions), which is the doc-count-independent analog of Lucene's
        # bytesUsed() accounting. An explicit num_segments > the estimate
        # still wins (caller asked for more flushes, never fewer).
        per_token_bytes = 20 if positions else 12
        est_segments = math.ceil(
            (sum_ttf * per_token_bytes) / (ram_budget_mb * 1024 * 1024)
        )
        num_segments = max(num_segments, max(1, est_segments))
    seg_span = max(1, math.ceil(max_doc / num_segments))
    if num_segments == 1:
        seg_doc_stats = {0: (max_doc, sum_ttf)}
    else:
        seg_doc_stats = {
            int(r.seg): (int(r.n_docs), int(r.ttf))
            for r in docs_tbl.groupBy(
                (F.col("doc_id") / F.lit(seg_span)).cast("int").alias("seg")
            )
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("ttf"))
            .collect()
        }

    # --- 4. DWPT pass: invert + pack partial posting rows
    partials_staging = None
    partials = invert_and_pack_partials(
        with_ids, text_col, seg_span, chunk_span, positions,
        tokenizer=tokenizer, lang_col=lang_col,
    )
    if num_segments > 1 or resume:
        # staged once: the per-segment loop re-reads partials per segment,
        # and resume needs them durable across restarts. 32 MB row groups:
        # posting rows are huge, and oversized row groups (from lagging size
        # estimation on fat rows) OOM the vectored parquet reader.
        partials_staging = os.path.join(out_dir, "_staging_partials")
        partials.write.mode("overwrite").option(
            "parquet.block.size", str(32 * 1024 * 1024)
        ).parquet(partials_staging)
        _phase("invert+partials")
        partials = spark.read.parquet(partials_staging)
    # else: single segment, no resume — one consumer, so the recombine
    # shuffle reads the invert pass directly (the largest intermediate is
    # never materialized twice)

    # norm cache from the global stats (known since step 3) — the impact
    # metadata (Lucene 8+ impacts idea, see POSTINGS_SCHEMA) is computed
    # INSIDE the recombine kernel where the merged arrays are in memory,
    # so the dictionary job below never re-reads the fat array columns
    from ..query.bm25 import BM25Stats as _BS, norm_cache as _nc

    cache64 = (
        _nc(_BS(max_doc=max_doc, sum_total_term_freq=sum_ttf)).astype(np.float64)
        if max_doc > 0
        else np.ones(256, dtype=np.float64)
    )
    n_chunks = max_doc // chunk_span + 1
    sc_factor = max(1, math.ceil(n_chunks / MAX_SC_ENTRIES))
    stream_recombine = make_stream_recombiner(cache64)

    # --- 5. per-segment sort-merge of partials → postings
    done_segs: set[int] = set()
    if resume and os.path.exists(paths.lineage):
        done_segs = {
            r.seg_id
            for r in spark.read.parquet(paths.lineage)
            .where(F.col("status") == "complete")
            .select("seg_id")
            .collect()
        }

    approx_terms: int | None = 0 if not done_segs else None  # resume: unknown
    for seg in range(num_segments):
        if seg in done_segs:
            continue
        obs_seg = Observation(f"seg_{seg}_metrics")
        # ONE fat shuffle, keyed by term alone: HashPartitioning(term)
        # satisfies the (term, chunk_id) groupBy's ClusteredDistribution
        # (term determines the partition), so the recombine runs on this
        # exchange directly AND its output is already term-local for the
        # write — the old plan shuffled the full posting bytes twice
        # ((term, chunk) hash for recombine, then term hash for file
        # locality). Head-term concentration is unchanged: the write task
        # for a head term held its whole posting list before too; now the
        # recombine of that term's chunks runs in the same task (each
        # pandas group is still one (term, chunk) slice, so peak memory
        # stays chunk-bounded). A small segment collapses to one globally
        # term-sorted file instead — 32 fragment files of a 5k-doc segment
        # cost more in per-file open/footer overhead than they buy in
        # write parallelism (Lucene: one postings file per segment).
        seg_partials = partials.where(F.col("seg_id") == seg)
        seg_partials = (
            seg_partials.repartition(1)
            if small_input
            else seg_partials.repartition(F.col("term"))
        )
        # recombine as a STREAMING kernel over term-sorted partitions, not
        # groupBy.applyInPandas: a web-scale vocabulary makes most
        # (term, chunk) groups singletons, and per-group pandas overhead at
        # 10^8+ groups would dominate the build (see make_stream_recombiner;
        # measured ~20× on a 200k-distinct-term corpus). The sort rides the
        # SAME exchange the groupBy needed.
        merged = (
            seg_partials.sortWithinPartitions("term", "chunk_id")
            .mapInPandas(stream_recombine, schema=POSTINGS_SCHEMA)
            .withColumn("seg_id", F.lit(seg).cast("int"))
            # lineage metrics observed during the write itself (no re-read
            # aggregation job). term_count is approx_count_distinct —
            # observed metrics cannot run DISTINCT aggregates — which is
            # fine: lineage term_count is informational; the exact global
            # count lives in the terms table.
            .observe(
                obs_seg,
                F.min("first_doc").alias("doc_id_min"),
                F.max(F.element_at("skip_last_doc", -1)).alias("doc_id_max"),
                F.approx_count_distinct("term").alias("term_count"),
                F.sum("df_chunk").alias("row_count"),
            )
        )
        (
            merged.sortWithinPartitions("term", "chunk_id")
            .write.mode("overwrite")
            .option("parquet.block.size", str(32 * 1024 * 1024))
            .parquet(os.path.join(paths.postings, f"seg_id={seg}"))
        )
        m = obs_seg.get
        lineage_row = spark.createDataFrame(
            [
                (
                    int(m["doc_id_min"] or 0),
                    int(m["doc_id_max"] or 0),
                    int(m["term_count"] or 0),
                    int(m["row_count"] or 0),
                    int(m["row_count"] or 0) * 8,
                    seg,
                    "complete",
                    int(time.time() * 1000),
                    seg_doc_stats.get(seg, (0, 0))[0],
                    seg_doc_stats.get(seg, (0, 0))[1],
                )
            ],
            "doc_id_min long, doc_id_max long, term_count long, row_count long, "
            "posting_bytes long, seg_id int, status string, built_at_snapshot long, "
            "n_docs long, ttf long",
        )
        lineage_row.write.mode("append").parquet(paths.lineage)
        if approx_terms is not None:
            approx_terms += int(m["term_count"] or 0)
        _phase(f"seg{seg}_recombine+write")

    # --- 6. term dictionary (term, termID=global term rank, df, ttf) PLUS
    # per-term impact metadata (the Lucene 8+ impacts idea —
    # Lucene50PostingsWriter writes per-block (tf, norm) impact pairs;
    # ImpactsDISI turns them into score upper bounds). Stored in the
    # DICTIONARY instead of interleaved with postings, so the driver — which
    # already looks up and caches query terms — gets, with ZERO extra jobs:
    #   imp_tfs/imp_nbs/imp_docs: the term's top-K (tf, norm_byte, docID)
    #     pairs under (score ratio tf/(tf+cache[nb]) desc, docID asc) — k ≤
    #     K distinct real docs, so the k-th best of their float32 scores is
    #     a VALID θ (any k attainable scores' min ≤ global k-th best)
    #     computable driver-side; and for a SINGLE-term query with k ≤ K
    #     the pairs answer the whole top-k from the driver's dictionary
    #     cache with ZERO Spark actions (impact-sorted postings head /
    #     ImpactsEnum early termination), guarded by a sufficiency check
    #     against the selection-order cutoff;
    #   sc_ids/sc_ubs: per SUPERCHUNK (≤1024 entries/term; superchunk =
    #     sc_factor consecutive chunks) max block score ratio — driver-side
    #     chunk pruning: Σ_t w_t·ub_t[sc] < θ_pad drops the whole range.
    # Together they collapse block-max WAND from 3 Spark actions to ONE
    # (the pruned scan) — the fixed per-action cost is what made WAND lose
    # to the exhaustive single-action plan at every measured scale.
    #
    # The per-row sketches were computed inside the recombine kernel (see
    # make_recombiner): this job reads ONLY the small impact columns —
    # parquet column pruning skips the fat posting arrays entirely — and
    # cascades them chunk → superchunk → term ENTIRELY IN JVM expressions
    # (no Python workers): each pair carries its negated float64 ratio, so
    # array_sort on struct(nr, doc, …) reproduces _impact_select's total
    # order (ratio desc, doc asc) and slice(…, 1, K) is the selection —
    # valid at every cascade level by the closure property. Per-group agg
    # buffers stay bounded: ≤ sc_factor·K pairs at level 1, ≤ 1024·K at
    # level 2 (the MAX_SC_ENTRIES cap — why the cascade has two levels).
    postings_all = spark.read.option("basePath", paths.postings).parquet(
        os.path.join(paths.postings, "seg_id=*")
    )
    compact_rows = postings_all.select(
        "term",
        (F.col("chunk_id") / F.lit(sc_factor)).cast("int").alias("sc"),
        "ub",
        F.arrays_zip("imp_nr", "imp_docs", "imp_tfs", "imp_nbs").alias("pairs"),
        F.col("df_chunk").cast("long").alias("df_chunk"),
        "ttf_row",
    )

    def _topk_pairs(col: F.Column) -> F.Column:
        return F.slice(F.array_sort(F.flatten(col)), 1, IMPACT_K)

    if sc_factor == 1 and num_segments == 1:
        # superchunk == chunk and one segment: (term, sc) is already unique
        # (recombine emits one row per (term, chunk)) and a term has
        # ≤ MAX_SC_ENTRIES rows, so the per-term agg buffer is bounded
        # without the intermediate level — one shuffle instead of two.
        # Multi-segment builds keep the (term, sc) agg: a chunk straddling
        # a segment boundary yields duplicate sc rows, and the WAND
        # consumer requires sc_ids unique (ub[sc_ids] += fancy-index).
        sc_level = compact_rows
    else:
        sc_level = compact_rows.groupBy("term", "sc").agg(
            F.max("ub").alias("ub"),
            _topk_pairs(F.collect_list("pairs")).alias("pairs"),
            F.sum("df_chunk").alias("df_chunk"),
            F.sum("ttf_row").alias("ttf_row"),
        )
    term_stats = (
        sc_level.groupBy("term")
        .agg(
            F.sum("df_chunk").alias("df"),
            F.sum("ttf_row").alias("ttf"),
            F.array_sort(
                F.collect_list(F.struct(F.col("sc"), F.col("ub")))
            ).alias("scub"),
            _topk_pairs(F.collect_list("pairs")).alias("pairs"),
        )
        .select(
            "term",
            "df",
            "ttf",
            F.col("scub.sc").alias("sc_ids"),
            F.col("scub.ub").alias("sc_ubs"),
            F.col("pairs.imp_tfs").alias("imp_tfs"),
            F.col("pairs.imp_nbs").alias("imp_nbs"),
            F.col("pairs.imp_docs").alias("imp_docs"),
        )
    )
    # one-task dense ids when the VOCABULARY is small — gated on the
    # observed approx term counts (summed over segments: an overestimate,
    # so the distributed path is kept conservatively; resume leaves the
    # count unknown → distributed). Vocabulary grows ~corpus^0.5 (Heaps),
    # so web corpora up to ~10^8 docs stay under the default 1M-term cap
    # while 10^12-doc builds keep the fully distributed rank assignment.
    # This is the terms-phase scaling fix: the range-sampled sort + count
    # collect + offset join are 4 driver barriers over a dictionary that
    # one task sorts in seconds.
    vocab_cap = int(os.environ.get("LSS_TERMS_SINGLE_PARTITION_MAX", "1000000"))
    terms_tbl = assign_dense_ids(
        term_stats, order_col="term", id_col="term_id",
        single_partition=small_input
        or (approx_terms is not None and approx_terms <= vocab_cap),
    )
    terms_tbl.write.mode("overwrite").parquet(paths.terms)
    _phase("terms")

    with open(paths.stats, "w") as fh:
        json.dump(
            {
                "max_doc": int(max_doc),
                "sum_total_term_freq": int(sum_ttf),
                "num_segments": num_segments,
                "seg_span": seg_span,
                "chunk_span": chunk_span,
                "positions": positions,
                "block_size": BLOCK_SIZE,
                "tokenizer": tokenizer,
                # index-sorting marker (SortingMergePolicy / IndexWriterConfig
                # setIndexSort analog): docIDs ascend by this column, so chunk
                # 0 holds the BM25-favored docs — WAND seeds θ there without
                # first ranking chunk bounds (any seed chunk is lossless;
                # chunk 0 on a sorted index is also the best one)
                "sort_col": sort_col,
                # dictionary impact metadata validity: the single-action WAND
                # path may use imp_*/sc_* ONLY while max_doc still equals
                # this value and no tombstones exist — appends add docs the
                # sketches don't cover (their chunks would be wrongly
                # pruned), purge shrinks max_doc; both mismatch and disable
                "impact_meta": {
                    "sc_factor": sc_factor,
                    "k": IMPACT_K,
                    "max_doc": int(max_doc),
                },
                # live-lineage snapshot at write time (see nrt.write_stats):
                # for a fresh bulk build the lineage sums equal the stats
                "lineage_n_docs": int(max_doc),
                "lineage_ttf": int(sum_ttf),
            },
            fh,
        )
    spark.catalog.clearCache()
    if partials_staging is not None:
        shutil.rmtree(partials_staging, ignore_errors=True)
    if ids_staging is not None:
        shutil.rmtree(ids_staging, ignore_errors=True)
    return paths
