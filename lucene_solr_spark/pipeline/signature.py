"""SignatureUpdateProcessor — ingest-time dedup signatures.

Reference: solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java (+ MD5Signature.java,
TextProfileSignature.java): each added document gets a signature computed
over its configured fields (field names processed in SORTED order,
:69-71); with overwriteDupes=true the signature field acts as a unique
key, so a later document with the same signature replaces the earlier one.

Two signature functions:

- ``md5_signature``: MD5 over the concatenated field values
  (MD5Signature.java) — exact dedup. Pure Catalyst (`md5(concat_ws)`),
  pushes through whole-stage codegen, portable to the DuckDB oracle.
- ``text_profile_signature``: the Nutch fuzzy profile
  (TextProfileSignature.java:49-138) — keep letters/digits lowercased,
  tokens STRICTLY longer than minTokenLen, count, quantize counts to
  quant = round(maxFreq·quantRate) (min 2 when maxFreq>1, so singleton
  tokens vanish from multi-token profiles), drop below-quant tokens,
  profile = "token cnt" lines sorted by count desc, MD5 of the profile.
  Near-identical pages (boilerplate diffs, reordered words) collapse to
  one signature. DECLARED divergence: the reference sorts ties in
  HashMap-iteration order (unspecified); this engine tie-breaks by token
  ascending so the signature is deterministic at any parallelism.

Scale: the profile is a per-document computation — an Arrow-batched
pandas UDF (zero shuffles), NOT an explode+groupBy (two shuffles of the
tokenized corpus). Dedup itself is one window per signature partition.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

_NON_ALNUM = re.compile(r"[^0-9a-z]+")


def md5_signature(cols: list[str]):
    """MD5Signature over the given fields, names sorted like the factory
    (:69-71); null fields contribute the empty string."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in sorted(cols)]
    return F.md5(F.concat(*parts))


def _profile(content: str, quant_rate: float, min_token_len: int) -> str:
    toks = [
        t
        for t in _NON_ALNUM.split(content.lower())
        if len(t) > min_token_len
    ]
    if not toks:
        return hashlib.md5(b"").hexdigest()
    counts = Counter(toks)
    max_freq = max(counts.values())
    quant = round(max_freq * quant_rate)
    if quant < 2:
        quant = 2 if max_freq > 1 else 1
    profile = []
    for tok, cnt in counts.items():
        cnt = (cnt // quant) * quant
        if cnt < quant:
            continue
        profile.append((tok, cnt))
    profile.sort(key=lambda tc: (-tc[1], tc[0]))  # deterministic tie-break
    text = "\n".join(f"{t} {c}" for t, c in profile)
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def text_profile_signature(
    text_col: str, quant_rate: float = 0.01, min_token_len: int = 2
):
    """TextProfileSignature as an Arrow-batched column expression."""

    @pandas_udf("string")
    def sig(s: pd.Series) -> pd.Series:
        return s.fillna("").map(
            lambda c: _profile(c, quant_rate, min_token_len)
        )

    return sig(F.col(text_col))


def with_signature(
    df: DataFrame,
    sig_col: str = "signatureField",
    fields: list[str] | None = None,
    text_profile: str | None = None,
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """Attach the signature column: exact MD5 over `fields`, or the fuzzy
    text profile of `text_profile` when given."""
    if text_profile is not None:
        return df.withColumn(
            sig_col, text_profile_signature(text_profile, quant_rate, min_token_len)
        )
    if not fields:
        raise ValueError("fields or text_profile required")
    return df.withColumn(sig_col, md5_signature(fields))


def dedup_by_signature(
    df: DataFrame,
    sig_col: str = "signatureField",
    order_col: str | None = None,
    key_col: str = "url",
) -> DataFrame:
    """overwriteDupes=true semantics over a batch: one survivor per
    signature — the LAST write wins, exactly like the processor's
    delete-by-signature-then-add sequence. `order_col` is the ingest
    order (falls back to `key_col`: highest key = latest). One shuffle,
    partitioned by signature."""
    order = F.col(order_col or key_col)
    w = Window.partitionBy(sig_col).orderBy(order.desc(), F.col(key_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
