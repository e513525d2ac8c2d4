"""1->N explode operators (SURVEY.md §2.1 S11, §2.8 M2-M3).

- zip_explode: recursive zip-archive walk over a binary column, one output
  row per extracted entry (incl. nested zips, skipping directories) —
  reference FnDecompressor.kt:105-139 (ZipInputStream walk) + fan-out
  :52-88. Implemented as mapInPandas over stdlib `zipfile` (Arrow-batched,
  partition-parallel, no shuffle).
- debatch: batch payload -> one row per record via split+explode (pure
  built-ins) — reference fn-debatcher/Function.kt:64-77 (HL7 batch split).
- output path rewrite riding along (P11: FnDecompressor.kt:90-92).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZIP_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType(), False),
        T.StructField("entry_path", T.StringType(), False),
        T.StructField("entry_bytes", T.BinaryType(), True),
    ]
)


def _walk_zip(name: str, payload: bytes, prefix: str = "") -> list[tuple[str, str, bytes]]:
    """Recursive entry walk; nested zips expand in place with a '!' separator
    (directories skipped, like FnDecompressor.kt:118-121)."""
    out: list[tuple[str, str, bytes]] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            data = zf.read(info.filename)
            path = f"{prefix}{info.filename}"
            if info.filename.lower().endswith(".zip"):
                out.extend(_walk_zip(name, data, prefix=f"{path}!"))
            else:
                out.append((name, path, data))
    return out


def zip_explode(df: DataFrame, name_col: str = "name", payload_col: str = "payload") -> DataFrame:
    """One row per (recursively) extracted zip entry."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, bytes]] = []
            for name, payload in zip(pdf[name_col], pdf[payload_col]):
                if payload is None:
                    continue
                rows.extend(_walk_zip(str(name), bytes(payload)))
            yield pd.DataFrame(rows, columns=["source_name", "entry_path", "entry_bytes"])

    return df.mapInPandas(op, ZIP_ENTRY_SCHEMA)


def debatch(
    df: DataFrame,
    text_col: str = "text",
    delimiter: str = "\n",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Batch payload -> one row per non-empty record, with its index
    (explode(split(...)) — pure Catalyst, whole-stage-codegen'd)."""
    keep = keep_cols or [c for c in df.columns if c != text_col]
    exploded = df.select(
        *keep,
        F.posexplode(F.split(F.col(text_col), F.lit(delimiter))).alias("record_index", "record"),
    )
    return exploded.filter(F.trim(F.col("record")) != "")


def rewrite_output_path(df: DataFrame, path_col: str = "entry_path") -> DataFrame:
    """P11 path rewrite: ingest/ -> processed/, .zip -> -decompressed/
    (FnDecompressor.kt:90-92)."""
    c = F.col(path_col)
    c = F.regexp_replace(c, "^ingest/", "processed/")
    c = F.regexp_replace(c, "\\.zip$", "-decompressed/")
    return df.withColumn(path_col, c)
