"""Ingestion loaders: the Solr update-path parsers re-expressed as Spark
readers (XMLLoader/JsonLoader/CSVLoader/JavabinLoader —
solr/core/src/java/org/apache/solr/handler/loader/*.java — and
DataImportHandler's delta queries — solr/contrib/dataimporthandler/).

Spark's DataSource API subsumes the format zoo; what this module adds is
the schema contract (conform any input to the BASELINE.json input_hint
shape) and incremental loading (delta pulls by watermark column).

Iceberg note: the container has no Iceberg runtime, so tables are parquet
directories with write-once segment dirs + a lineage table standing in for
Iceberg snapshots; `read_pages` accepts a catalog table name and uses
`spark.read.table` when a real catalog (e.g. Iceberg) is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    **reader_options,
) -> DataFrame:
    """Load a pages table from parquet/json/csv/catalog-table and conform it
    to the canonical schema (missing optional columns become NULL; extras
    are dropped; url+text required)."""
    if fmt is None:
        fmt = "table" if "/" not in source else "parquet"
    if fmt == "table":
        df = spark.read.table(source)
    elif fmt == "parquet":
        df = spark.read.options(**reader_options).parquet(source)
    elif fmt == "json":
        df = spark.read.options(**reader_options).json(source)
    elif fmt == "csv":
        df = spark.read.options(header="true", **reader_options).csv(source)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    return conform_pages(df)


def conform_pages(df: DataFrame) -> DataFrame:
    """Project any input onto the input_hint schema
    (url, warc_ts, html, text, lang). A pages source with raw `html` but no
    extracted `text` gets text = html_strip(html) — the
    HTMLStripCharFilter position in the analysis chain
    (HTMLStripCharFilterFactory.java; charfilter precedes the tokenizer),
    as one JVM regexp projection riding the same scan."""
    cols = set(df.columns)
    if "text" not in cols and "html" in cols:
        from ..analysis.charfilter import html_strip

        df = df.withColumn(
            "text", html_strip(F.col("html").cast("string"))
        )
        cols = set(df.columns)
    missing_required = {"url", "text"} - cols
    if missing_required:
        raise ValueError(f"pages input missing required columns: {sorted(missing_required)}")
    out = []
    for field in PAGES_SCHEMA.fields:
        if field.name in cols:
            out.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*out)


def delta_pages(
    spark: SparkSession,
    source: str,
    since,
    fmt: str | None = None,
    watermark_col: str = "warc_ts",
) -> DataFrame:
    """DataImportHandler delta-query analog: only rows newer than `since`.
    With parquet/Iceberg the predicate prunes files/partitions at the scan
    (min/max statistics), so a delta pull reads only fresh data."""
    return read_pages(spark, source, fmt=fmt).where(F.col(watermark_col) > F.lit(since))


def external_file_field(
    spark: SparkSession,
    path: str,
    key_col: str = "url",
    val_col: str = "external_val",
) -> DataFrame:
    """ExternalFileField / FileFloatSource (solr/core/src/java/org/apache/
    solr/schema/ExternalFileField.java, search/function/FileFloatSource.java:
    245-300): per-document floats maintained OUTSIDE the index (click rates,
    editorial ranks) in `key=value` text lines. Parse rules reproduced:
    split on the LAST '=', lines without '=' skipped, unparsable floats
    skipped, a key's LAST line wins. Returns (key_col, val_col float) for
    joining as a ValueSource (boosted_topk / custom_score_topk /
    sort_topk); coalesce missing keys to the FileFloatSource defVal at
    join time.

    Order: monotonically_increasing_id over the text scan is globally
    ascending in file order (partition index ⋅ row-in-split), so
    max_by(value, line_id) is the reference's overwrite semantics without
    collecting the file."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("_line"), "value"
    )
    parsed = lines.select(
        "_line",
        F.regexp_extract("value", r"^(.*)=([^=]*)$", 1).alias(key_col),
        F.regexp_extract("value", r"^(.*)=([^=]*)$", 2)
        .try_cast("float")
        .alias(val_col),
    ).where((F.col(key_col) != "") & F.col(val_col).isNotNull())
    return parsed.groupBy(key_col).agg(
        F.max_by(val_col, "_line").alias(val_col)
    )
