"""File-based scans (SURVEY.md §2.1 S3/S6 whole-blob byte scan, S9 delimited
text scan; §2.4 F8 extension check).

Reference basis:
- S3/S6: blob-trigger with content bound as bytes (FnCacheUpdater.kt:22-27,
  AzureBlobServiceImpl.kt:25-27, RouteIngestedFile.kt:250) -> Spark's
  `binaryFile` format: each file becomes one row (path, modificationTime,
  length, content:binary). Spark parallelizes whole-file reads across tasks,
  the built-in equivalent of the reference's 10-coroutine ranged reader (S7,
  RouteIngestedFile.kt:483-517) — splittable formats are additionally ranged
  automatically via spark.sql.files.maxPartitionBytes.
- S9: ADF DelimitedTextSource with recursive dir listing and no partition
  discovery (spikes/PL_ReportStream/pipeline/PL_ReportStream.json:18-28) ->
  `recursiveFileLookup` csv scan with an explicit schema (schema inference at
  100 TB means reading everything twice; the reference never infers either,
  SURVEY §1.3).
- F8: `.csv` extension required (FnCSVValidationGeneric.kt:40-42) ->
  `pathGlobFilter` applied at LISTING time (files that don't match are never
  opened — pushdown, not post-filter).

Scale notes: file listing is driver-side and O(files); at 100 TB prefer few
large files or a manifest/lake table (lake/table.py) over raw-dir scans. The
glob filter prunes before any task launches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ERR_BAD_EXTENSION = "file is not a csv"  # FnCSVValidationGeneric.kt:41 analog


def scan_binary(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Whole-file byte scan (S3/S6): one row per file with content:binary.

    `glob` (e.g. ``*.zip``) prunes at listing time — the F8 extension check
    pushed into the scan instead of evaluated per row.
    """
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", str(recursive).lower()
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def scan_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    delimiter: str = ",",
    recursive: bool = True,
) -> DataFrame:
    """Delimited text scan (S9): recursive listing, explicit schema (never
    inferred — ADF's DelimitedTextSource declares its mapping too)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("recursiveFileLookup", str(recursive).lower())
        .csv(path)
    )


def split_by_extension(
    df: DataFrame, ext: str, path_col: str = "path"
) -> tuple[DataFrame, DataFrame]:
    """F8 as a row-level split for already-listed inventories: (matching,
    rejected-with-error). The reference dead-letters non-csv uploads with an
    exact error (FnCSVValidationGeneric.kt:40-42); rejected rows carry the
    same assertable string rather than aborting the batch (F12,
    CHANGELOG 0.0.40)."""
    pred = F.lower(F.col(path_col)).endswith(ext.lower())
    ok = df.filter(pred)
    bad = df.filter(~pred).withColumn("error", F.lit(ERR_BAD_EXTENSION))
    return ok, bad
