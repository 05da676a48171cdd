"""DataImportHandler transformers — the DIH <field .../> transformer
chain (transformer="RegexTransformer,TemplateTransformer,...") as pure
Catalyst column transforms over a DataFrame of entity rows.

Reference (solr/contrib/dataimporthandler/src/java/.../dataimport/):
- RegexTransformer.java:40-175 — per-field regex / splitBy /
  replaceWith / groupNames / sourceColName; a non-matching regex leaves
  the row value untouched (process returns null → no put), single
  capture group replaces the column, multiple unnamed groups produce a
  list, groupNames fan matches out into other columns.
- TemplateTransformer.java — template="${entity.col}-${entity.other}";
  if ANY referenced variable is null the column is left untouched
  (resolvable=false → continue); a bare single-variable template copies
  the value (preserving its type) rather than string-concatenating.
- DateFormatTransformer.java — dateTimeFormat SimpleDateFormat parse to
  a timestamp (sourceColName supported).
- NumberFormatTransformer.java — formatStyle number|integer|percent|
  currency with an xx-XX locale; percent divides by 100, currency strips
  the symbol, grouping separators are locale-dependent.
- HTMLStripTransformer.java — stripHTML="true" runs the
  HTMLStripCharFilter over the column.
- ClobTransformer.java — clob="true" casts the LOB to its string form.
- LogTransformer (logging side effect) is a no-op here;
  ScriptTransformer (JSR-223 JavaScript engine) stays excluded like
  StatelessScriptUpdateProcessor.

Everything is column expressions (regexp_extract / split / concat /
to_timestamp / regexp_replace) — at 100 TB the whole transformer chain
fuses into the ingest scan's projection, no Python in the row path.

Caveat vs the row-at-a-time reference: a regex whose match succeeds with
an EMPTY capture group is treated as no-match by the rlike guard (both
render to '' in Spark); the reference distinguishes them.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["transform_entity", "TRANSFORMERS"]

_VAR_RE = re.compile(r"\$\{([^}]+)\}")

# minimal locale table for NumberFormat: (grouping, decimal)
_LOCALE_SEPS = {
    None: (",", "."), "en-US": (",", "."), "en-GB": (",", "."),
    "de-DE": (".", ","), "fr-FR": (" ", ","), "it-IT": (".", ","),
    "es-ES": (".", ","), "pl-PL": (" ", ","),
}


def _src(field: dict) -> str:
    return field.get("sourceColName") or field["column"]


def _regex_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    for field in fields:
        regex = field.get("regex")
        split_by = field.get("splitBy")
        if regex is None and split_by is None:
            continue
        col_name = field["column"]
        src = F.col(_src(field))
        if split_by is not None:
            # Java String.split drops TRAILING empty strings; Spark's
            # split keeps them — slice up to the last non-empty part
            parts = F.split(src, split_by, -1)
            last_non_empty = F.aggregate(
                F.transform(parts, lambda x, i: F.when(x != "", i + 1)
                            .otherwise(F.lit(0))),
                F.lit(0), lambda a, b: F.greatest(a, b))
            df = df.withColumn(
                col_name, F.slice(parts, 1, last_non_empty))
            continue
        replace_with = field.get("replaceWith")
        if replace_with is not None:
            df = df.withColumn(
                col_name, F.regexp_replace(src, regex, replace_with))
            continue
        n_groups = re.compile(regex).groups
        group_names = [g.strip() for g in
                       (field.get("groupNames") or "").split(",")]
        matched = src.rlike(regex)
        if n_groups <= 1:
            # single group: replace on match, keep the original otherwise
            df = df.withColumn(
                col_name,
                F.when(matched, F.regexp_extract(src, regex, 1))
                .otherwise(F.col(col_name)
                           if col_name in df.columns else F.lit(None)))
        elif field.get("groupNames"):
            for i, gname in enumerate(group_names[:n_groups], start=1):
                if gname:
                    df = df.withColumn(
                        gname,
                        F.when(matched, F.regexp_extract(src, regex, i)))
        else:
            df = df.withColumn(
                col_name,
                F.when(matched, F.array(*[
                    F.regexp_extract(src, regex, i)
                    for i in range(1, n_groups + 1)])))
    return df


def _template_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    for field in fields:
        tpl = field.get("template")
        if tpl is None:
            continue
        col_name = field["column"]
        variables = _VAR_RE.findall(tpl)
        # "${e.x}" variables resolve to the column after the last dot
        var_cols = [v.rsplit(".", 1)[-1] for v in variables]
        all_present = None
        for c in var_cols:
            cond = F.col(c).isNotNull()
            all_present = cond if all_present is None else (all_present & cond)
        if len(variables) == 1 and tpl == "${%s}" % variables[0]:
            value = F.col(var_cols[0])  # bare variable keeps its type
        else:
            parts: list[Column] = []
            pos = 0
            for m in _VAR_RE.finditer(tpl):
                if m.start() > pos:
                    parts.append(F.lit(tpl[pos:m.start()]))
                parts.append(
                    F.col(m.group(1).rsplit(".", 1)[-1]).cast("string"))
                pos = m.end()
            if pos < len(tpl):
                parts.append(F.lit(tpl[pos:]))
            value = F.concat(*parts)
        existing = (F.col(col_name) if col_name in df.columns
                    else F.lit(None).cast("string"))
        df = df.withColumn(
            col_name,
            F.when(all_present, value).otherwise(existing)
            if all_present is not None else value)
    return df


def _date_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    for field in fields:
        fmt = field.get("dateTimeFormat")
        if fmt is None:
            continue
        df = df.withColumn(
            field["column"], F.to_timestamp(F.col(_src(field)), fmt))
    return df


def _number_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    for field in fields:
        style = field.get("formatStyle")
        if style is None:
            continue
        grouping, decimal = _LOCALE_SEPS.get(
            field.get("locale"), _LOCALE_SEPS[None])
        src = F.trim(F.col(_src(field)).cast("string"))
        # strip currency symbols and spaces, normalize separators
        cleaned = F.regexp_replace(src, r"[^\d\-" +
                                   re.escape(grouping + decimal) + "%]", "")
        cleaned = F.regexp_replace(cleaned, re.escape(grouping), "")
        if decimal != ".":
            cleaned = F.regexp_replace(cleaned, re.escape(decimal), ".")
        if style == "integer":
            value = F.regexp_replace(cleaned, r"\..*$", "").cast("long")
        elif style == "percent":
            value = (F.regexp_replace(cleaned, "%", "").cast("double")
                     / F.lit(100.0))
        elif style in ("number", "currency"):
            value = cleaned.cast("double")
        else:
            raise ValueError(f"unknown formatStyle {style!r}")
        df = df.withColumn(field["column"], value)
    return df


def _htmlstrip_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    from ..analysis.charfilter import html_strip

    for field in fields:
        if str(field.get("stripHTML", "")).lower() != "true":
            continue
        df = df.withColumn(
            field["column"], html_strip(F.col(_src(field)).cast("string")))
    return df


def _clob_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    for field in fields:
        if str(field.get("clob", "")).lower() != "true":
            continue
        df = df.withColumn(
            field["column"], F.col(_src(field)).cast("string"))
    return df


def _log_transformer(df: DataFrame, fields: list[dict]) -> DataFrame:
    return df  # logging side effect only


TRANSFORMERS = {
    "RegexTransformer": _regex_transformer,
    "TemplateTransformer": _template_transformer,
    "DateFormatTransformer": _date_transformer,
    "NumberFormatTransformer": _number_transformer,
    "HTMLStripTransformer": _htmlstrip_transformer,
    "ClobTransformer": _clob_transformer,
    "LogTransformer": _log_transformer,
}


def transform_entity(df: DataFrame, fields: list[dict],
                     transformers: str | list[str] = "") -> DataFrame:
    """Apply the entity's transformer chain in declaration order, each
    transformer visiting every <field> spec — exactly the DIH row
    pipeline (EntityProcessorWrapper.applyTransformer), but as stacked
    column projections Catalyst collapses into the scan."""
    names = ([t.strip() for t in transformers.split(",") if t.strip()]
             if isinstance(transformers, str) else list(transformers))
    for name in names:
        fn = TRANSFORMERS.get(name)
        if fn is None:
            if name == "ScriptTransformer":
                raise NotImplementedError(
                    "ScriptTransformer (JSR-223 engine) is excluded, like "
                    "StatelessScriptUpdateProcessor")
            raise KeyError(
                f"unknown transformer {name!r}; supported: "
                f"{sorted(TRANSFORMERS)}")
        df = fn(df, fields)
    return df
