"""Warehouse.register_views: the spark.sql surface over the lake layer —
live views equal the DataFrame API; tag-pinned views are snapshot-isolated."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_exchange_routing_spark.pipeline import Warehouse, replay
from data_exchange_routing_spark.sources.datagen import write_change_events


def test_sql_views_match_dataframe_api_and_pin_tags(spark, tmpdir_path):
    events = f"{tmpdir_path}/events"
    write_change_events(spark, events, 600, 60, n_epochs=2)
    wh = Warehouse(spark, f"{tmpdir_path}/wh", n_buckets=4)
    replay(wh, events, stop_after_epoch=0)
    wh.publish_snapshot("after_e0")
    replay(wh, events)

    views = wh.register_views()
    assert "web_pages" in views
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT lang, count(*) AS n FROM web_pages GROUP BY lang"
        ).collect()
    }
    exp = {
        tuple(r)
        for r in wh.table("web_pages").read()
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp and got

    # tag-pinned views see ONLY epoch 0 — and SQL joins across them are
    # consistent (same cut for every table)
    wh.register_views(tag="after_e0", prefix="t0_")
    live = spark.sql("SELECT count(*) FROM web_pages").first()[0]
    pinned = spark.sql("SELECT count(*) FROM t0_web_pages").first()[0]
    assert 0 < pinned < live
    assert pinned == wh.read_consistent("after_e0")["web_pages"].count()
