"""Iceberg-style hidden partitioning: transform specs, spec evolution, pruning.

Public-spec semantics (Apache Iceberg table spec, "Partitioning" /
"Partition Evolution"): a partition spec is an ordered list of fields, each a
(source column, transform) pair; every data file records the partition tuple
it was written under PLUS the id of the spec that produced it. Evolving the
spec NEVER rewrites old files — each file is pruned through its OWN spec, and
a file whose spec cannot answer a predicate simply stays in the scan (pruning
is an optimization, never a correctness dependency: the exact row predicate
is always applied after). Users filter on SOURCE columns only; the engine
maps the predicate through each transform — the "hidden" part, which removes
the whole class of wrong-partition-column bugs hive-style layouts invite
(querying `ts` but forgetting to also constrain `ts_day`).

Transforms (every partition value is stored as the STRING Spark's
``partitionBy`` directory name carries; formats are chosen monotone wherever
range pruning needs order):

==============  =====================================  =====================
transform       Spark write expression                 prunes
==============  =====================================  =====================
identity        ``cast(col as string)``                equality + range
bucket[N]       ``pmod(md5_int32(col), N)``            equality only
truncate[W]     string prefix / int floor-to-multiple  equality + range
years/months/
days/hours      UTC ``date_format`` (lexicographic     equality + range
                == chronological)
==============  =====================================  =====================

The bucket transform reuses the engine's md5 hash family (``md5_int32``,
functions/textstats.py) because it has an exact Python twin — the reader
computes the predicate value's bucket driver-side with ``hashlib.md5`` and
prunes byte-identically to what the JVM wrote. NULL source values land in
Spark's ``__HIVE_DEFAULT_PARTITION__`` directory; those files are never
pruned (conservative: the empty-string/NULL ambiguity of hive dir names makes
them unprunable, and the row predicate excludes their rows anyway).

Scale: partition pruning here is manifest-level — the driver drops files from
the scan list before Spark ever lists them, exactly like the existing
ts_stats/col_stats pruning, but (a) it holds after ANY rewrite because the
values are part of the layout, not per-file footer luck, and (b) the
write-side ``repartition(partition exprs)`` clusters each commit so one
partition value maps to one file per commit rather than smearing every value
across every task's output — at 10^10 events this is the difference between
opening 1/365th of the files for a one-day scan and opening all of them.
"""

from __future__ import annotations

import hashlib
import re
import urllib.parse
from datetime import date, datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PART_PREFIX = "_part_"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_TIME_TRANSFORMS = {
    "years": ("yyyy", "%Y"),
    "months": ("yyyy-MM", "%Y-%m"),
    "days": ("yyyy-MM-dd", "%Y-%m-%d"),
    "hours": ("yyyy-MM-dd-HH", "%Y-%m-%d-%H"),
}
TRANSFORMS = {"identity", "bucket", "truncate"} | set(_TIME_TRANSFORMS)

_SCALAR_OK = (T.StringType, T.IntegerType, T.LongType)


def validate_spec(fields: list[dict], schema: T.StructType) -> list[dict]:
    """Normalize + validate a spec field list against the table schema."""
    if not isinstance(fields, list) or not fields:
        raise ValueError("partition spec must be a non-empty list of fields")
    by_name = {f.name: f.dataType for f in schema.fields}
    seen: set[str] = set()
    out: list[dict] = []
    for fld in fields:
        name, col, tf = fld.get("name"), fld.get("col"), fld.get("transform")
        param = fld.get("param")
        if not name or not re.fullmatch(r"[A-Za-z0-9_]+", name):
            raise ValueError(f"bad partition field name: {name!r}")
        if name in seen:
            raise ValueError(f"duplicate partition field name: {name!r}")
        seen.add(name)
        if col not in by_name:
            raise ValueError(f"partition source column {col!r} not in schema")
        dt = by_name[col]
        if tf not in TRANSFORMS:
            raise ValueError(f"unknown transform {tf!r} (have {sorted(TRANSFORMS)})")
        if tf in _TIME_TRANSFORMS:
            if not isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
                raise ValueError(f"{tf} requires a timestamp/date column, got {dt}")
            norm = {"name": name, "col": col, "transform": tf}
        elif tf == "identity":
            if not isinstance(dt, _SCALAR_OK):
                raise ValueError(f"identity partitioning supports string/int/long, got {dt}")
            norm = {"name": name, "col": col, "transform": tf,
                    "str": isinstance(dt, T.StringType)}
        elif tf == "bucket":
            if not isinstance(dt, _SCALAR_OK):
                raise ValueError(f"bucket partitioning supports string/int/long, got {dt}")
            if not isinstance(param, int) or param < 2:
                raise ValueError("bucket requires integer param >= 2")
            norm = {"name": name, "col": col, "transform": tf, "param": param}
        else:  # truncate
            if not isinstance(param, int) or param < 1:
                raise ValueError("truncate requires integer param >= 1")
            if isinstance(dt, T.StringType):
                norm = {"name": name, "col": col, "transform": tf, "param": param, "str": True}
            elif isinstance(dt, (T.IntegerType, T.LongType)):
                norm = {"name": name, "col": col, "transform": tf, "param": param, "str": False}
            else:
                raise ValueError(f"truncate supports string/int/long, got {dt}")
        out.append(norm)
    return out


def transform_col(fld: dict) -> Column:
    """The write-side Spark expression producing this field's partition value."""
    from data_exchange_routing_spark.functions.textstats import md5_int32

    c = F.col(fld["col"])
    tf = fld["transform"]
    if tf in _TIME_TRANSFORMS:
        return F.date_format(c, _TIME_TRANSFORMS[tf][0])
    if tf == "identity":
        return c.cast("string")
    if tf == "bucket":
        return F.pmod(md5_int32(c.cast("string")), F.lit(fld["param"])).cast("string")
    # truncate
    if fld.get("str"):
        return F.substring(c, 1, fld["param"])
    return (c - F.pmod(c, F.lit(fld["param"]))).cast("string")


def partition_columns(fields: list[dict], df: DataFrame) -> tuple[DataFrame, list[str]]:
    """Append the derived ``_part_*`` columns; return (df, partition col names)."""
    names = [PART_PREFIX + fld["name"] for fld in fields]
    out = df.select("*", *[transform_col(fld).alias(n) for fld, n in zip(fields, names)])
    return out, names


def salted_repartition(df: DataFrame, pcols: list[str], salt: int) -> DataFrame:
    """Cluster the batch for the partitioned write WITHOUT a one-task-per-
    partition-value straggler: with ``salt`` > 1, rows of each partition
    value spread across up to ``salt`` writer tasks (deterministic row-hash
    salt — no rand(), replay-stable), each writing its own file into the
    same partition directory. This is the skew half of Iceberg's hash write
    distribution + target-file-size splitting: a hot partition (one crawl
    day at 100 TB) becomes ``salt`` parallel writers and ``salt`` manifest
    entries instead of one straggler task emitting one giant file. Pruning
    is unaffected — the directory (= partition value) is what the manifest
    records, regardless of how many files land in it."""
    cols = [F.col(c) for c in pcols]
    if salt <= 1:
        return df.repartition(*cols)
    # MapType is not hashable in Spark (HASH_MAP_TYPE error) at ANY nesting
    # depth (array<map>, struct{m: map}); any remaining column set salts
    # fine — uniformity, not uniqueness, is what matters
    def _has_map(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    data_cols = [
        F.col(f.name)
        for f in df.schema.fields
        if not f.name.startswith(PART_PREFIX) and not _has_map(f.dataType)
    ]
    # non-empty by construction: every spec field's source column is a
    # hashable scalar/timestamp (validate_spec) and rides in the dataframe
    cols = cols + [F.pmod(F.xxhash64(*data_cols), F.lit(salt))]
    # explicit partition count: a by-column repartition is an AQE coalesce
    # target, which would merge the salted splits right back into one task
    n = max(salt, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "8")))
    return df.repartition(n, *cols)


def decode_dir_value(raw: str) -> str | None:
    """Directory-name value -> partition value (None = NULL/unknown bucket)."""
    if raw == HIVE_NULL or raw == "":
        return None
    return urllib.parse.unquote(raw)


def parse_path_partition(path: str) -> dict[str, str | None]:
    """Extract {field_name: value} from a staged file's directory components."""
    out: dict[str, str | None] = {}
    for comp in path.split("/"):
        if comp.startswith(PART_PREFIX) and "=" in comp:
            name, _, raw = comp.partition("=")
            out[name[len(PART_PREFIX):]] = decode_dir_value(raw)
    return out


# ---------------------------------------------------------------- py twins
def _py_time(value, tf: str) -> str:
    """Python twin of the UTC date_format write expression."""
    if isinstance(value, datetime):
        if value.tzinfo is not None:
            value = value.astimezone(timezone.utc).replace(tzinfo=None)
    elif not isinstance(value, date):
        raise TypeError(f"{tf} predicate bound must be datetime/date, got {type(value)}")
    return value.strftime(_TIME_TRANSFORMS[tf][1])


def _py_bucket(value, n: int) -> str:
    """Python twin of pmod(md5_int32(cast(value as string)), n)."""
    h = int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:8], 16)
    return str(h % n)


def _py_value(fld: dict, value) -> str:
    """Transform a predicate bound exactly as the write expression would."""
    tf = fld["transform"]
    if tf in _TIME_TRANSFORMS:
        return _py_time(value, tf)
    if tf == "identity":
        return str(value)
    if tf == "bucket":
        return _py_bucket(value, fld["param"])
    if fld.get("str"):
        return str(value)[: fld["param"]]
    w = fld["param"]
    return str(int(value) - (int(value) % w))


def eq_keep(fld: dict, part_value: str, value) -> bool:
    """May a file with this partition value hold rows where col == value?"""
    return part_value == _py_value(fld, value)


def range_keep(fld: dict, part_value: str, lo, hi) -> bool:
    """May a file with this partition value hold rows with col in [lo, hi]?

    Monotone transforms map the bounds through the transform and compare in
    the partition-value domain; bucket cannot range-prune (returns True).
    """
    tf = fld["transform"]
    if tf == "bucket":
        return True
    numeric = (tf == "identity" and not fld.get("str")) or (
        tf == "truncate" and not fld.get("str")
    )
    if numeric:
        pv = int(part_value)
        if lo is not None and pv < int(_py_value(fld, lo)):
            return False
        if hi is not None and pv > int(_py_value(fld, hi)):
            return False
        return True
    if lo is not None and part_value < _py_value(fld, lo):
        return False
    if hi is not None and part_value > _py_value(fld, hi):
        return False
    return True


def normalize_bound(value, dtype):
    """Predicate bound -> the Python value whose ``str()`` matches the write
    expression's cast-to-string of the COLUMN-typed value. Without this, an
    integral float bound on a long column ('42.0' vs stored '42'), an int
    bound on a double column ('42' vs stored '42.0'), or a Python bool
    ('True' vs Spark 'true') silently prunes files whose rows the SQL
    predicate WOULD match. Non-coercible bounds (42.5 on a long column)
    pass through: their string never equals a stored value, which matches
    the row predicate's own empty result."""
    if dtype is None or value is None:
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        if isinstance(value, float) and value.is_integer():
            return int(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        if isinstance(value, int):
            return float(value)
    return value


def prune_files(
    files: list[dict],
    specs: dict,
    part_eq: tuple | None,
    part_range: tuple | None,
    schema: T.StructType | None = None,
) -> list[dict]:
    """Manifest-level file pruning through each file's OWN spec (evolution-safe).

    Files without partition metadata (pre-spec commits, driver-side appends,
    compaction outputs written while no spec was active) are always kept; a
    NULL partition value keeps its file too. The caller still applies the
    exact row predicate — pruning only ever removes provably-disjoint files.
    ``schema`` (when available) normalizes bound values to the column's
    type so cross-type bounds can never prune rows the row predicate would
    keep (see normalize_bound); normalization is LOCAL to pruning — the
    caller's row predicate keeps its original literals.
    """
    if schema is not None:
        types = {f.name: f.dataType for f in schema.fields}
        if part_eq is not None:
            part_eq = (part_eq[0], normalize_bound(part_eq[1], types.get(part_eq[0])))
        if part_range is not None:
            dt = types.get(part_range[0])
            part_range = (
                part_range[0],
                normalize_bound(part_range[1], dt),
                normalize_bound(part_range[2], dt),
            )

    def _keep(f: dict) -> bool:
        part = f.get("partition")
        if not part:
            return True
        fields = specs.get(str(f.get("spec_id")))
        if not fields:
            return True
        for fld in fields:
            pv = part.get(fld["name"])
            if pv is None:
                continue
            if part_eq is not None and fld["col"] == part_eq[0]:
                if not eq_keep(fld, pv, part_eq[1]):
                    return False
            if part_range is not None and fld["col"] == part_range[0]:
                if not range_keep(fld, pv, part_range[1], part_range[2]):
                    return False
        return True

    return [f for f in files if _keep(f)]
