"""Solr UpdateRequestProcessor chain (solr/core .../update/processor) as
DataFrame transforms.

Reference classes (each factory's mutation semantics reproduced over
columns; multiValued fields are array columns):
- TrimFieldUpdateProcessorFactory.java:45 — String.trim on every value
- RemoveBlankFieldUpdateProcessorFactory.java:39 — zero-length values
  removed (null for single-valued, filtered out of arrays)
- RegexReplaceProcessorFactory.java:43 — pattern.matcher(v)
  .replaceAll(Matcher.quoteReplacement(replacement)): LITERAL
  replacement, every occurrence
- TruncateFieldUpdateProcessorFactory.java:48 — subSequence(0, maxLength)
- ConcatFieldUpdateProcessorFactory.java:49 — join a multivalued field's
  values with the delimiter (default ", ")
- FieldLengthUpdateProcessorFactory.java:43 — CharSequence values
  replaced by their Integer length
- CountFieldValuesUpdateProcessorFactory.java:45 — value count of a
  multivalued field (intended for a COPY of the field)
- CloneFieldUpdateProcessorFactory.java:64 / IgnoreField… / DefaultValue…
  (AbstractDefaultValue…:57 — only when the field is absent) /
  TimestampUpdateProcessorFactory.java:43 (NOW when absent) /
  UUIDUpdateProcessorFactory.java:42
- First/Last/Min/MaxFieldValue / UniqFields factories — multivalued
  subset selectors (FieldValueSubsetUpdateProcessorFactory.java:40)
- ParseBoolean/Int/Long/Float/Double/Date factories (solr 4.4's schemaless
  parse chain): parse when every value parses, else leave unchanged
  (AllValuesOrNoneFieldMutatingUpdateProcessor.java:43)

The chain composes left-to-right like UpdateRequestProcessorChain
(UpdateRequestProcessorChain.java:121). Everything is column
expressions; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _is_array(df: DataFrame, field: str) -> bool:
    return isinstance(df.schema[field].dataType, T.ArrayType)


def _mutate(df: DataFrame, fields: list[str], one: "callable") -> DataFrame:
    """Apply a per-value mutation to each field; arrays map element-wise
    (FieldMutatingUpdateProcessor.mutate iterates values)."""
    for f in fields:
        col = F.col(f)
        df = df.withColumn(
            f, F.transform(col, one) if _is_array(df, f) else one(col)
        )
    return df


def trim_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    return _mutate(df, fields, lambda v: F.trim(v))


def remove_blank_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    out = df
    for f in fields:
        col = F.col(f)
        if _is_array(df, f):
            out = out.withColumn(f, F.filter(col, lambda v: F.length(v) > 0))
        else:
            out = out.withColumn(f, F.when(F.length(col) > 0, col))
    return out


def regex_replace_fields(
    df: DataFrame, fields: list[str], pattern: str, replacement: str
) -> DataFrame:
    # Matcher.quoteReplacement → the replacement is LITERAL ($ and \ inert)
    lit = replacement.replace("\\", "\\\\").replace("$", "\\$")
    return _mutate(df, fields, lambda v: F.regexp_replace(v, pattern, lit))


def truncate_fields(df: DataFrame, fields: list[str], max_length: int) -> DataFrame:
    return _mutate(df, fields, lambda v: F.substring(v, 1, max_length))


def field_length(df: DataFrame, fields: list[str]) -> DataFrame:
    return _mutate(df, fields, lambda v: F.length(v))


def concat_fields(df: DataFrame, fields: list[str], delimiter: str = ", ") -> DataFrame:
    for f in fields:
        if _is_array(df, f):
            df = df.withColumn(f, F.array_join(F.col(f), delimiter))
    return df


def count_field_values(df: DataFrame, field: str, dest: str) -> DataFrame:
    return df.withColumn(dest, F.size(F.col(field)))


def clone_field(df: DataFrame, source: str, dest: str) -> DataFrame:
    return df.withColumn(dest, F.col(source))


def ignore_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    return df.drop(*fields)


def default_value(df: DataFrame, field: str, value) -> DataFrame:
    if field not in df.columns:
        return df.withColumn(field, F.lit(value))
    return df.withColumn(field, F.coalesce(F.col(field), F.lit(value)))


def timestamp_field(df: DataFrame, field: str = "timestamp") -> DataFrame:
    if field not in df.columns:
        return df.withColumn(field, F.current_timestamp())
    return df.withColumn(
        field, F.coalesce(F.col(field), F.current_timestamp())
    )


def uuid_field(df: DataFrame, field: str = "id") -> DataFrame:
    if field not in df.columns:
        return df.withColumn(field, F.expr("uuid()"))
    return df.withColumn(field, F.coalesce(F.col(field), F.expr("uuid()")))


def first_field_value(df: DataFrame, fields: list[str]) -> DataFrame:
    for f in fields:
        df = df.withColumn(f, F.element_at(F.col(f), 1))
    return df


def last_field_value(df: DataFrame, fields: list[str]) -> DataFrame:
    for f in fields:
        df = df.withColumn(f, F.element_at(F.col(f), -1))
    return df


def min_field_value(df: DataFrame, fields: list[str]) -> DataFrame:
    for f in fields:
        df = df.withColumn(f, F.array_min(F.col(f)))
    return df


def max_field_value(df: DataFrame, fields: list[str]) -> DataFrame:
    for f in fields:
        df = df.withColumn(f, F.array_max(F.col(f)))
    return df


def uniq_field_values(df: DataFrame, fields: list[str]) -> DataFrame:
    # UniqFieldsUpdateProcessor keeps first occurrences in order —
    # array_distinct's documented behavior
    for f in fields:
        df = df.withColumn(f, F.array_distinct(F.col(f)))
    return df


def _all_or_none(df: DataFrame, fields: list[str], parsed_of) -> DataFrame:
    """AllValuesOrNoneFieldMutatingUpdateProcessor: mutate only when EVERY
    value parses, else leave untouched. Solr's granularity is
    per-document-field; a typed DataFrame column cannot hold strings for
    some rows and numbers for others, so the rule is applied at COLUMN
    granularity — any non-null value failing to parse anywhere leaves the
    whole field unchanged (the AddSchemaFields/schemaless usage, where the
    guessed type applies to the field). One aggregate action per field."""
    for f in fields:
        col = F.col(f)
        if _is_array(df, f):
            parsed = F.transform(col, parsed_of)
            bad = F.size(F.filter(parsed, lambda v: v.isNull())) > F.size(
                F.filter(col, lambda v: v.isNull())
            )
        else:
            parsed = parsed_of(col)
            bad = col.isNotNull() & parsed.isNull()
        n_bad = df.where(bad).limit(1).count()
        if n_bad == 0:
            df = df.withColumn(f, parsed)
    return df


def _parse_numeric(df: DataFrame, fields: list[str], cast_to: str) -> DataFrame:
    # try_cast: malformed → NULL (ANSI-mode cast would throw mid-check)
    return _all_or_none(
        df, fields, lambda v: F.trim(v).try_cast(cast_to)
    )


def parse_int_fields(df, fields):  # noqa: D103
    return _parse_numeric(df, fields, "int")


def parse_long_fields(df, fields):  # noqa: D103
    return _parse_numeric(df, fields, "long")


def parse_float_fields(df, fields):  # noqa: D103
    return _parse_numeric(df, fields, "float")


def parse_double_fields(df, fields):  # noqa: D103
    return _parse_numeric(df, fields, "double")


def parse_boolean_fields(
    df: DataFrame,
    fields: list[str],
    true_values: tuple = ("true",),
    false_values: tuple = ("false",),
    case_sensitive: bool = False,
) -> DataFrame:
    def one(v: Column) -> Column:
        s = v if case_sensitive else F.lower(v)
        tv = true_values if case_sensitive else tuple(t.lower() for t in true_values)
        fv = false_values if case_sensitive else tuple(t.lower() for t in false_values)
        return (
            F.when(s.isin(*tv), F.lit(True))
            .when(s.isin(*fv), F.lit(False))
        )

    return _all_or_none(df, fields, one)


def parse_date_fields(
    df: DataFrame, fields: list[str], formats: list[str]
) -> DataFrame:
    def one(v: Column) -> Column:
        out = None
        for fmt in formats:
            t = F.try_to_timestamp(F.trim(v), F.lit(fmt))
            out = t if out is None else F.coalesce(out, t)
        return out

    return _all_or_none(df, fields, one)


class ProcessorChain:
    """UpdateRequestProcessorChain: processors compose in order; run()
    threads the frame through each (UpdateRequestProcessorChain.java:121)."""

    def __init__(self, *steps):
        self.steps = list(steps)

    def run(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            df = step(df)
        return df


def regexp_boost(
    df: DataFrame,
    boost_entries,
    input_field: str = "url",
    boost_field: str = "urlboost",
) -> DataFrame:
    """RegexpBoostProcessor (RegexpBoostProcessor.java:40-178): match
    `input_field` against each (pattern, boost) entry — whole-value match
    (Matcher.matches(), :170) — multiplying the boosts of every matching
    pattern into `boost_field` (double, 1.0 when nothing matches).
    `boost_entries` is a list of (pattern, boost) or a boost file path
    (lines `<pattern><whitespace><boost>`, :137)."""
    if isinstance(boost_entries, str):
        entries = []
        with open(boost_entries) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) == 2:
                    entries.append((parts[0], float(parts[1])))
        boost_entries = entries
    boost = F.lit(1.0)
    for pattern, b in boost_entries:
        # matches() = anchored whole-value match
        boost = boost * F.when(
            F.regexp_like(F.col(input_field), F.lit(f"^(?:{pattern})$")),
            F.lit(float(b)),
        ).otherwise(F.lit(1.0))
    return df.withColumn(boost_field, boost)
