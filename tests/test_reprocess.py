"""Dead-letter reprocessing: fix the route config, resubmit, exactly-once."""

from pyspark.sql import functions as F

from data_exchange_routing_spark.pipeline import (
    Warehouse,
    replay,
    reprocess_dead_letters,
)
from data_exchange_routing_spark.schemas import ROUTE_CONFIG
from data_exchange_routing_spark.sources.configs import DEFAULT_ROUTES
from data_exchange_routing_spark.sources.datagen import write_change_events


def _fixed_config(spark):
    """The post-incident config: octet-stream now routes to an existing
    table; xml stays broken (is_valid=false)."""
    rows = [
        {
            "route_key": k,
            "destination_table": t,
            "destination_partition": p,
            "extra_meta": m,
            "is_valid": v,
        }
        for (k, t, p, m, v) in DEFAULT_ROUTES
    ] + [
        {
            "route_key": "application/octet-stream",
            "destination_table": "web_pages_plain",
            "destination_partition": ":y/:m/:d",
            "extra_meta": {"tier": "recovered"},
            "is_valid": True,
        }
    ]
    return spark.createDataFrame(rows, ROUTE_CONFIG)


def test_reprocess_fix_and_resubmit_exactly_once(spark, tmp_path):
    events = str(tmp_path / "events")
    write_change_events(spark, events, 800, 120, n_epochs=2)
    wh = Warehouse(spark, str(tmp_path / "wh"), n_buckets=8)
    replay(wh, events)

    dl = wh.table("dead_letter").read()
    route_dead = dl.filter(F.col("stage") == "route")
    n_route_dead = route_dead.count()
    assert n_route_dead > 0  # octet-stream + xml events dead-lettered
    plain0 = wh.table("web_pages_plain").read().count()

    res = reprocess_dead_letters(
        wh, events, epoch_id=1000, route_config=_fixed_config(spark)
    )
    assert res["resolved_lsns"] > 0
    assert res["retried_lsns"] >= res["resolved_lsns"]
    # octet events merged into their (fixed) destination
    assert wh.table("web_pages_plain").read().count() > plain0
    # resolution markers drained the fixed share of the error feed
    dl2 = wh.table("dead_letter").read()
    resolved_rows = dl2.filter(F.col("stage") == "resolved")
    assert resolved_rows.count() == res["resolved_lsns"]
    assert resolved_rows.filter(
        F.col("error") == "reprocessed as epoch 1000"
    ).count() == res["resolved_lsns"]
    # xml events still fail under the new config (is_valid=false) and
    # re-dead-letter in the reprocess epoch
    assert dl2.filter(F.col("stage") == "route").count() > n_route_dead

    # exactly-once: the same reprocess epoch is a metadata no-op
    before = {
        n: wh.table(n).current_version()
        for n in ("web_pages_plain", "dead_letter")
    }
    res2 = reprocess_dead_letters(
        wh, events, epoch_id=1000, route_config=_fixed_config(spark)
    )
    assert res2.get("skipped") is True
    for n, v in before.items():
        assert wh.table(n).current_version() == v
