"""Storage-partitioned join (SPJ) between co-bucketed lake tables.

Two keyed LakeTables whose layouts share the same bucket function
(``pmod(xxhash64(key), n_buckets)``, same ``n_buckets``) are join-aligned on
disk: every key lives in the same bucket ordinal on both sides. Their
equi-join therefore never needs a shuffle — each bucket pair joins locally.
This is Spark's storage-partitioned join (public design, SPARK-37375 /
Iceberg SPJ) realized for this repo's own manifest format, where the built-in
DSv2 path can't see the bucketing.

Physical shape: the ONLY distributed input is ``spark.range(n_buckets)`` with
one bucket ordinal per partition; a ``mapInPandas`` task reads its bucket's
parquet files for both sides straight from storage (pyarrow), resolves each
side's merge-on-read state locally (bucketing guarantees every revision of a
key is in this bucket), and hash-joins in Arrow. Zero data rows cross the
network — no Exchange appears anywhere in the plan (asserted in tests). At
100 TB the per-task footprint is one bucket of each side, which is exactly
the quantity ``compact()``/``rebucket()`` keep bounded; parallelism is
``n_buckets`` (rebucket() raises it as the table grows).

Supports inner / left / full-outer. Requirements (checked, loud errors):
both tables keyed, equal n_buckets, no unbucketed (bucket == -1) files — the same "matching partition spec" contract
Iceberg SPJ enforces.

Resolution parity: the local resolve mirrors ``LakeTable._resolve`` exactly —
last writer per key by (warc_ts DESC NULLS LAST, _lsn DESC NULLS LAST),
tombstones hidden — and the equivalence ``bucket_join == read().join(read())``
is gated by tests and a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .table import DELETED_COL, INTERNAL_COLS, LSN_COL, LakeTable


def _files_by_bucket(table: LakeTable, op: str) -> dict[int, list[str]]:
    snap = table.snapshot()
    if snap.key is None:
        raise ValueError(f"{op} requires keyed tables (got unkeyed {table.path})")
    out: dict[int, list[str]] = {}
    for f in snap.files:
        b = f["bucket"]
        if b == -1:
            raise ValueError(
                f"{op} requires a fully bucketed layout; {table.path} has "
                "unbucketed (-1) files — run compact() first"
            )
        out.setdefault(b, []).append(os.path.join(table.path, f["path"]))
    return out


def _pandas_dtype_hint(dt: T.DataType):
    # used only to type EMPTY frames so pd.merge on an empty side keeps
    # column identity; non-empty frames keep whatever pyarrow produced
    import numpy as np

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "Int64"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return np.float64
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.TimestampType):
        return "datetime64[us, UTC]"
    return object


def bucket_join(
    left: LakeTable,
    right: LakeTable,
    how: str = "inner",
    rsuffix: str = "_r",
    batch_rows: int = 1 << 16,
    columns: list[str] | None = None,
) -> DataFrame:
    """Shuffle-free equi-join of two co-bucketed keyed tables on their keys.

    Output columns: the left key (named as on the left), every public left
    column, then every public right column except its key — right columns
    whose names clash with a left column get ``rsuffix``. ``columns``
    restricts the output to the named source columns (key always included)
    AND pushes the projection into the per-file parquet reads — only the
    requested columns plus the resolve columns (key, warc_ts, _lsn,
    _deleted) are ever decoded, the column-pruning a 100 TB scan needs.
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(f"bucket_join supports inner/left/full, got {how!r}")
    lsnap, rsnap = left.snapshot(), right.snapshot()
    for side, tbl, snap in (("left", left, lsnap), ("right", right, rsnap)):
        live = tbl._live_renames(snap)
        if live:
            # the executor-side pyarrow reads project by CURRENT name only;
            # files written before a rename would silently null the renamed
            # column here — refuse loudly instead
            raise ValueError(
                f"{side} table has live column renames {sorted(live)}; "
                "bucket_join reads files by current name — run a full "
                "compact()/rewrite_files() to purge old-name bytes first"
            )
        act = tbl._active_defaults(snap, snap.files)
        if act:
            # the executor-side pyarrow reads have no per-file seq, so
            # initial defaults on pre-add files would read NULL here —
            # refuse loudly instead (a compact() materializes them)
            raise ValueError(
                f"{side} table has active column defaults {sorted(act)}; "
                "bucket_join cannot apply initial defaults — run a full "
                "compact() to materialize them first"
            )
    lf, rf = _files_by_bucket(left, "bucket_join"), _files_by_bucket(right, "bucket_join")
    if lsnap.n_buckets != rsnap.n_buckets:
        raise ValueError(
            f"bucket layouts differ ({lsnap.n_buckets} vs {rsnap.n_buckets} "
            "buckets); rebucket() one side first"
        )
    lkey, rkey = lsnap.key, rsnap.key
    if rkey != lkey and rkey in {f.name for f in lsnap.schema().fields}:
        raise ValueError(
            f"right key {rkey!r} clashes with a non-key left column; rename one side"
        )
    n = lsnap.n_buckets

    lschema = [f for f in lsnap.schema().fields if f.name not in INTERNAL_COLS]
    rschema = [
        f
        for f in rsnap.schema().fields
        if f.name not in INTERNAL_COLS and f.name != rkey
    ]
    if columns is not None:
        known = {f.name for f in lschema} | {f.name for f in rschema}
        unknown = [c for c in columns if c not in known]
        if unknown:
            raise ValueError(f"columns not on either side: {unknown}")
        keep = set(columns)
        lschema = [f for f in lschema if f.name == lkey or f.name in keep]
        rschema = [f for f in rschema if f.name in keep]
    lnames = [f.name for f in lschema]
    rename = {f.name: (f.name + rsuffix if f.name in lnames else f.name) for f in rschema}
    out_fields = [T.StructField(f.name, f.dataType, f.nullable) for f in lschema] + [
        T.StructField(rename[f.name], f.dataType, True) for f in rschema
    ]
    out_schema = T.StructType(out_fields)
    resolve_cols = ["warc_ts", LSN_COL, DELETED_COL]
    l_need = dict.fromkeys([lkey, *resolve_cols] + [f.name for f in lschema])
    r_need = dict.fromkeys([rkey, *resolve_cols] + [f.name for f in rschema])
    l_dtypes = {
        f.name: _pandas_dtype_hint(f.dataType)
        for f in lsnap.schema().fields
        if f.name in l_need
    }
    r_dtypes = {
        f.name: _pandas_dtype_hint(f.dataType)
        for f in rsnap.schema().fields
        if f.name in r_need
    }

    def _task(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        def _load(paths: list[str], want: dict) -> pd.DataFrame:
            frames = []
            for p in paths:
                # projection pushdown: decode only the needed columns that
                # this file actually has (older files may predate evolution)
                avail = set(pq.read_schema(p).names)
                frames.append(
                    pq.read_table(p, columns=[c for c in want if c in avail]).to_pandas()
                )
            if frames:
                df = pd.concat(frames, ignore_index=True, sort=False)
            else:
                df = pd.DataFrame()
            for c, dt in want.items():  # evolution null-backfill + empty typing
                if c not in df.columns:
                    df[c] = pd.Series([None] * len(df), dtype=dt if len(df) == 0 else object)
            return df

        def _resolve(df: pd.DataFrame, key: str) -> pd.DataFrame:
            if len(df) == 0:
                return df
            ts = pd.to_datetime(df["warc_ts"])
            floor = (
                pd.Timestamp.min.tz_localize(ts.dt.tz)
                if getattr(ts.dt, "tz", None) is not None
                else pd.Timestamp.min
            )
            # desc NULLS LAST == nulls order as the minimum
            df = df.assign(
                _o_ts=ts.fillna(floor),
                _o_lsn=pd.to_numeric(df[LSN_COL], errors="coerce").fillna(float("-inf")),
            )
            df = df.sort_values(["_o_ts", "_o_lsn"], ascending=False, kind="mergesort")
            df = df.drop_duplicates(subset=[key], keep="first")
            dead = df[DELETED_COL].fillna(False).astype(bool)
            return df[~dead].drop(columns=["_o_ts", "_o_lsn"])

        for pdf in batches:
            for b in pdf["id"].tolist():
                b = int(b)
                l = _resolve(_load(lf.get(b, []), l_dtypes), lkey)
                r = _resolve(_load(rf.get(b, []), r_dtypes), rkey)
                l = l[[f.name for f in lschema]] if len(l) else pd.DataFrame(
                    {f.name: pd.Series(dtype=l_dtypes[f.name]) for f in lschema}
                )
                rcols = [rkey] + [f.name for f in rschema]
                r = r[rcols] if len(r) else pd.DataFrame(
                    {c: pd.Series(dtype=r_dtypes[c]) for c in rcols}
                )
                r = r.rename(columns=rename)
                j = l.merge(
                    r,
                    left_on=lkey,
                    right_on=rkey,
                    how="outer" if how == "full" else how,
                    suffixes=("", rsuffix),
                )
                if rkey != lkey and rkey in j.columns:
                    if how == "full":  # right-only rows carry the key in rkey
                        j[lkey] = j[lkey].where(j[lkey].notna(), j[rkey])
                    if rkey not in out_schema.names:
                        j = j.drop(columns=[rkey])
                j = j[[f.name for f in out_fields]]
                for start in range(0, max(len(j), 1), batch_rows):
                    yield j.iloc[start : start + batch_rows]

    ids = left.spark.range(0, n, 1, n)  # one bucket ordinal per partition
    return ids.mapInPandas(_task, schema=out_schema)
