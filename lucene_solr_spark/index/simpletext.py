"""SimpleText postings codec (lucene/codecs/simpletext): the
human-readable debug dump/load of the inverted index, byte-layout
faithful to SimpleTextFieldsWriter.

Reference (lucene/codecs/src/java/org/apache/lucene/codecs/simpletext/
SimpleTextFieldsWriter.java:38-46): the exact prefixes —
    field <name>\\n
      term <text>\\n
        doc <docID>\\n
          freq <tf>\\n
          pos <position>\\n    (one line per occurrence)
    END\\n
(two-space indent steps; we emit DOCS_AND_FREQS_AND_POSITIONS, the
engine's index options). SimpleTextFieldsReader parses the same lines
back. The reference marks this codec "FOR RECREATIONAL USE ONLY" —
it exists to make an index diffable/debuggable, and so does this.

Spark shape: the chunk-packed posting rows unpack to (term, doc, tf,
positions) in one Arrow mapInPandas pass (cumsum of doc gaps, pos_flat
sliced by tf, the same decode the query kernels use), are sorted
distributed by (term, doc), and stream through toLocalIterator into the
text file — the driver holds one partition at a time, never the index.
import reads the text back into a postings DataFrame for round-trip
verification or re-indexing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["export_simpletext", "import_simpletext", "unpacked_postings"]

_SCHEMA = "term string, doc long, freq int, positions array<int>"


def unpacked_postings(spark: SparkSession, paths, field: str = "text") -> DataFrame:
    """Chunk rows → one row per (term, doc) with tf and positions — the
    SimpleTextFieldsReader view of the index."""
    from .build import IndexPaths

    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    rows = spark.read.parquet(paths.postings).select(
        "term", "first_doc", "doc_gaps", "tfs", "pos_flat")

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docs_out, tfs_out, pos_out = [], [], [], []
            for r in pdf.itertuples(index=False):
                gaps = np.asarray(r.doc_gaps, dtype=np.int64)
                docs = r.first_doc + np.cumsum(gaps)
                tfs = np.asarray(r.tfs, dtype=np.int64)
                if r.pos_flat is not None and len(r.pos_flat):
                    flat = np.asarray(r.pos_flat, dtype=np.int32)
                    bounds = np.concatenate(([0], np.cumsum(tfs)))
                    plists = [flat[bounds[i]:bounds[i + 1]].tolist()
                              for i in range(len(docs))]
                else:
                    plists = [[] for _ in range(len(docs))]
                terms.extend([r.term] * len(docs))
                docs_out.extend(docs.tolist())
                tfs_out.extend(tfs.tolist())
                pos_out.extend(plists)
            yield pd.DataFrame({
                "term": terms, "doc": docs_out, "freq": tfs_out,
                "positions": pos_out})

    return rows.mapInPandas(unpack, _SCHEMA)


def export_simpletext(spark: SparkSession, paths, out_path: str,
                      field: str = "text") -> int:
    """Write the index in the SimpleText layout; returns posting count.
    Terms sort bytewise like the reference's term dictionary order."""
    unpacked = unpacked_postings(spark, paths, field).orderBy("term", "doc")
    n = 0
    with open(out_path, "w", encoding="utf-8") as out:
        out.write(f"field {field}\n")
        last_term = None
        # toLocalIterator streams one partition at a time to the driver
        for row in unpacked.toLocalIterator():
            if row["term"] != last_term:
                out.write(f"  term {row['term']}\n")
                last_term = row["term"]
            out.write(f"    doc {row['doc']}\n")
            out.write(f"      freq {row['freq']}\n")
            for p in row["positions"]:
                out.write(f"      pos {p}\n")
            n += 1
        out.write("END\n")
    return n


def import_simpletext(spark: SparkSession, path: str) -> DataFrame:
    """Parse a SimpleText dump back into (term, doc, freq, positions) —
    SimpleTextFieldsReader's scan, as a distributed line parse: the file
    reads as a DataFrame of lines with ids, and a mapInPandas pass
    rebuilds postings by carrying the open term/doc through each batch
    (single ordered partition: this is a debug format, not a data
    path)."""
    lines = (spark.read.text(path)
             .coalesce(1))  # preserve file order end-to-end

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        term = None
        doc = None
        freq = 0
        positions: list[int] = []
        rows: list[tuple] = []

        def flush():
            nonlocal doc, freq, positions
            if doc is not None:
                rows.append((term, doc, freq, positions))
            doc, freq, positions = None, 0, []

        for pdf in batches:
            for line in pdf["value"]:
                if line.startswith("      pos "):
                    positions.append(int(line[10:]))
                elif line.startswith("      freq "):
                    freq = int(line[11:])
                elif line.startswith("    doc "):
                    flush()
                    doc = int(line[8:])
                elif line.startswith("  term "):
                    flush()
                    term = line[7:]
                elif line.startswith("field ") or line == "END":
                    flush()
            if rows:
                yield pd.DataFrame(
                    rows, columns=["term", "doc", "freq", "positions"])
                rows = []
        flush()
        if rows:
            yield pd.DataFrame(
                rows, columns=["term", "doc", "freq", "positions"])

    return lines.mapInPandas(parse, _SCHEMA)
