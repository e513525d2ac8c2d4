"""Row lineage on append-only lake tables (Iceberg v3 row-id analog).

Reference parity note: the reference tracks per-file identity through its
processing-status reports (PSReportEnvelope.kt:7-58, report id = filename —
FnStoreReportingEvent.kt:66-84); at 100 TB the row-level analog is a stable
``_row_id`` that survives compaction, so incremental consumers and audits
can track a row through rewrites without trusting file positions.

Semantics follow the public Iceberg v3 shape: ids are IMPLICIT for
as-written files (manifest ``first_row_id`` + row position — zero write
cost on the ingest hot path), and MATERIALIZED into files by any rewrite
(CoW delete, retention expiry, compaction, full rewrite); an UPDATE keeps
the row's id. Keyed tables refuse — their stable identity is the merge key.
"""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, path):
    return LakeTable.create(spark, path, schema=SCHEMA, key=None)


def _rows(spark, triples):
    ts = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(u, ts + dt.timedelta(hours=h), v) for u, h, v in triples], SCHEMA
    )


def _ids(t, **kw):
    return {r.url: r._row_id for r in t.read(with_row_ids=True, **kw).collect()}


def test_ids_unique_monotonic_and_zero_cost_on_ingest(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.append(_rows(spark, [("c", 2, 3)]), epoch_id=1)
    ids = _ids(t)
    assert sorted(ids.values()) == [0, 1, 2]
    # implicit on the ingest path: no _row_id column in the data files,
    # only manifest first_row_id
    import pyarrow.parquet as pq
    import os

    for f in t.snapshot().files:
        names = pq.ParquetFile(os.path.join(t.path, f["path"])).schema_arrow.names
        assert "_row_id" not in names
        assert f["first_row_id"] is not None
    assert t.snapshot().next_row_id == 3
    # plain reads are id-free (no identity join in the plan)
    assert "_row_id" not in t.read().columns


def test_ids_stable_across_every_rewrite_kind(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    t.append(_rows(spark, [("d", 30, 4), ("e", 31, 5)]), epoch_id=1)
    before = _ids(t)

    # CoW delete rewrites the matching file: survivors keep ids
    t.delete_eq("v", 2)
    after_cow = _ids(t)
    assert after_cow == {k: v for k, v in before.items() if k != "b"}

    # full rewrite materializes ids into the folded file
    t.rewrite_files(n_files=1)
    assert _ids(t) == after_cow
    import pyarrow.parquet as pq
    import os

    f = t.snapshot().files[0]
    assert f.get("row_ids") == "file" and f.get("first_row_id") is None
    names = pq.ParquetFile(os.path.join(t.path, f["path"])).schema_arrow.names
    assert "_row_id" in names

    # retention expiry straddle rewrite keeps survivor ids
    t2 = _mk(spark, tmpdir_path + "/t2")
    t2.append(_rows(spark, [("old", 0, 1), ("new", 48, 2)]), epoch_id=0)
    ids2 = _ids(t2)
    t2.expire_data("warc_ts", dt.datetime(2026, 1, 2))
    assert _ids(t2) == {"new": ids2["new"]}


def test_mor_delete_compaction_and_update_preserve_ids(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    before = _ids(t)
    t.delete_matching_mor("url = 'b'")
    # MoR delete: ids visible through the anti-join read
    assert _ids(t) == {k: v for k, v in before.items() if k != "b"}
    # UPDATE keeps the row's id on its new image (Iceberg v3 semantics)
    t.update_matching_mor("url = 'c'", {"v": "v * 10"})
    got = {
        (r.url, r.v): r._row_id for r in t.read(with_row_ids=True).collect()
    }
    assert got == {("a", 1): before["a"], ("c", 30): before["c"]}
    # compaction folds everything; ids unchanged
    t.compact_mor_deletes()
    assert _ids(t) == {"a": before["a"], "c": before["c"]}
    # ids never reused: the next append continues past the high watermark
    t.append(_rows(spark, [("f", 9, 9)]), epoch_id=1)
    ids = _ids(t)
    assert ids["f"] >= 3 and len(set(ids.values())) == 3


def test_time_travel_and_pruned_reads_carry_ids(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    v0 = t.current_version()
    ids0 = _ids(t)
    t.delete_eq("v", 1)
    # historical read resolves ids from THAT snapshot's manifest
    assert _ids(t, version=v0) == ids0
    # range-pruned read still attaches ids
    got = _ids(t, range_filter=("v", 2, 2))
    assert got == {"b": ids0["b"]}


def test_keyed_table_refuses_row_ids(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path + "/t", schema=SCHEMA, key="url")
    with pytest.raises(ValueError, match="merge key"):
        t.read(with_row_ids=True)


def test_branch_publish_and_clone_keep_id_space_consistent(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    ids0 = _ids(t)
    b = t.create_branch("audit")
    b.append(_rows(spark, [("c", 2, 3)]), epoch_id=1)
    t.publish_branch("audit")
    ids1 = _ids(t)
    assert {k: ids1[k] for k in ids0} == ids0  # pre-branch ids unchanged
    assert len(set(ids1.values())) == 3  # no collisions across the splice
    # post-publish append stays above every spliced id
    t.append(_rows(spark, [("d", 3, 4)]), epoch_id=2)
    ids2 = _ids(t)
    assert len(set(ids2.values())) == 4
    # a hardlink clone preserves ids and its id space keeps advancing
    c = t.clone_to(tmpdir_path + "/c")
    assert _ids(c) == ids2
    c.append(_rows(spark, [("e", 4, 5)]), epoch_id=3)
    idsc = _ids(c)
    assert len(set(idsc.values())) == 5


def test_hidden_partitioned_rewrite_keeps_ids(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.set_partition_spec(
        [{"name": "url_p", "col": "url", "transform": "truncate", "param": 1}]
    )
    t.append(_rows(spark, [("ax", 0, 1), ("ay", 1, 2), ("bx", 2, 3)]), epoch_id=0)
    before = _ids(t)
    t.delete_eq_mor("url", "ay")
    t.compact_mor_deletes()
    assert _ids(t) == {k: v for k, v in before.items() if k != "ay"}
    # partition-pruned read carries ids too
    got = _ids(t, part_eq=("url", "ax"))
    assert got == {"ax": before["ax"]}
