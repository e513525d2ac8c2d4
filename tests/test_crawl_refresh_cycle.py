"""End-to-end crawl-refresh cycle: the stored corpus plans its own recrawl.

Composition exercised as ONE flow (each stage is individually oracle- or
gate-tested elsewhere; this test proves they compose):

  1. CDC replay seeds the warehouse (reference ingest loop,
     RouteIngestedFile.kt:86-200 analog),
  2. a sitemap feed with MESSY locs (upper-case scheme/host, default port,
     tracking params, fragments) is canonicalized onto the merge-key space,
  3. per-URL sitemap freshness is joined against the stored captures'
     max(warc_ts) -> recrawl candidates (lastmod newer than the capture),
  4. REP robots rules filter the candidates (longest-prefix-match),
  4b. a category blocklist bans one registered domain outright (DNS-suffix
     hash join) and registered_domains (PSL) derives the key politeness
     budgets group on,
  5. frontier_schedule assigns per-registered-domain politeness waves,
  6. the scheduled frontier is turned into synthesized fetch events (a new
     binlog segment) and replayed into the SAME warehouse,
  7. the final web_pages state equals the pandas oracle over
     original + refresh events (LWW by (warc_ts, lsn), byte-identical text).

Scale notes: the per-URL freshness feed and the stored-capture side each
reduce with one map-side-combined aggregation before a key-partitioned
equi-join; robots rules are control-plane sized and broadcast; scheduling
pays exactly the one per-host exchange the politeness cap requires.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.crawl import (
    blocklist_filter,
    frontier_schedule,
    registered_domains,
    robots_filter,
)
from data_exchange_routing_spark.operators.parse import canonicalize_url, host_of
from data_exchange_routing_spark.pipeline import Warehouse, replay
from data_exchange_routing_spark.sources.datagen import write_change_events
from tests.oracle import oracle_final_states


def host_of_py(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]

N_EVENTS = 3000
N_URLS = 250
N_EPOCHS = 3


@pytest.fixture(scope="module")
def cycle_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refresh_events"))
    write_change_events(spark, d, N_EVENTS, N_URLS, n_epochs=N_EPOCHS)
    return d


def test_crawl_refresh_cycle(spark, cycle_events_dir, tmpdir_path):
    wh = Warehouse(spark, os.path.join(tmpdir_path, "wh_refresh"), n_buckets=8)
    res = replay(wh, cycle_events_dir)
    assert res["applied_epochs"] == list(range(N_EPOCHS))

    # -- 2. sitemap feed over the live URL set, deliberately messy locs ----
    stored = wh.table("web_pages").read().select("url", "warc_ts", "lang")
    fresh = stored.groupBy("url").agg(F.max("warc_ts").alias("captured_ts"))

    messy = fresh.select(
        "url",
        "captured_ts",
        F.concat(
            F.lit("HTTPS://"),
            F.upper(F.regexp_extract("url", r"https://([^/]+)", 1)),
            F.lit(":443"),
            F.regexp_extract("url", r"https://[^/]+(/.*)$", 1),
            F.lit("?utm_source=cycle&fbclid=zz#frag"),
        ).alias("loc_raw"),
        # deterministically: every 3rd url (by stable hash) has a sitemap
        # <lastmod> NEWER than its stored capture -> due for recrawl
        F.when(
            F.pmod(F.xxhash64("url"), F.lit(3)) == 0,
            F.col("captured_ts") + F.expr("INTERVAL 2 DAYS"),
        )
        .otherwise(F.col("captured_ts") - F.expr("INTERVAL 2 DAYS"))
        .alias("lastmod"),
    )

    canon = canonicalize_url(messy, url_col="loc_raw", out_col="loc")
    # canonicalization must land every messy loc back on its merge key
    assert canon.filter(F.col("loc") != F.col("url")).count() == 0

    # -- 3. recrawl candidates: sitemap freshness vs stored capture --------
    cand = (
        canon.groupBy("loc")
        .agg(F.max("lastmod").alias("last_mod"), F.max("captured_ts").alias("captured_ts"))
        .filter(F.col("last_mod") > F.col("captured_ts"))
        .select(
            F.col("loc").alias("url"),
            "last_mod",
            F.datediff(F.col("last_mod"), F.col("captured_ts")).alias("staleness_days"),
            host_of(F.col("loc")).alias("host"),
            F.regexp_extract("loc", r"https://[^/]+(/.*)$", 1).alias("path"),
        )
    )
    due_flags = {
        r["url"]: r["due"]
        for r in fresh.select(
            "url", (F.pmod(F.xxhash64("url"), F.lit(3)) == 0).alias("due")
        ).collect()
    }
    expected_due = {u for u, d in due_flags.items() if d}
    got_due = {r["url"] for r in cand.collect()}
    assert got_due == expected_due and len(got_due) > 0

    # -- 4. robots: block /p/1* except the /p/12* carve-out, on every host --
    hosts = [r["host"] for r in cand.select("host").distinct().collect()]
    rules = spark.createDataFrame(
        [(h, "disallow", "/p/1") for h in hosts] + [(h, "allow", "/p/12") for h in hosts],
        "host string, rule string, prefix string",
    )
    allowed = robots_filter(cand, rules).filter(F.col("allowed"))
    got_allowed = {r["url"] for r in allowed.collect()}
    exp_allowed = {
        u
        for u in expected_due
        for p in [u.split(".example", 1)[1]]
        if not p.startswith("/p/1") or p.startswith("/p/12")
    }
    assert got_allowed == exp_allowed

    # -- 4b. blocklist ban of one domain + PSL registered-domain keying ----
    banned = sorted(hosts)[0]
    bl_rules = spark.createDataFrame(
        [("banned", banned, "")], "category string, domain string, path_prefix string"
    )
    bl = blocklist_filter(allowed.select("url", "host", "path", "last_mod", "staleness_days"), bl_rules)
    assert {r["url"] for r in bl.filter(F.col("blocked")).collect()} == {
        u for u in exp_allowed if host_of_py(u) == banned
    }
    clean = bl.filter(~F.col("blocked"))
    exp_fetched = {u for u in exp_allowed if host_of_py(u) != banned}

    psl = spark.createDataFrame([("example",)], "suffix string")
    dom = registered_domains(clean, psl)
    # datagen hosts are site-N.example: one label above the suffix, so the
    # registered domain IS the host — the politeness key the budget wants
    assert dom.filter(F.col("registered_domain") != F.col("host")).count() == 0

    # -- 5. politeness waves: <= concurrency fetches per domain per wave ---
    sched = frontier_schedule(
        dom.select("url", F.col("registered_domain").alias("host"), "last_mod", "staleness_days"),
        host_col="host",
        priority_cols=[F.col("staleness_days").desc(), F.col("url").asc()],
        concurrency=2,
    )
    per_wave = sched.groupBy("host", "wave").count().collect()
    assert all(r["count"] <= 2 for r in per_wave)
    waves = sched.select("host", "wave").distinct().groupBy("host").agg(
        F.max("wave").alias("mx"), F.count("*").alias("n")
    )
    # waves are dense 0..max per host
    assert waves.filter(F.col("n") != F.col("mx") + 1).count() == 0

    # -- 6. synthesized fetch events: a new binlog segment ------------------
    max_lsn = spark.read.parquet(cycle_events_dir).agg(F.max("lsn")).collect()[0][0]
    refetch = (
        sched.join(stored.groupBy("url").agg(F.max("lang").alias("lang")), "url")
        .select(
            (F.lit(max_lsn + 1) + F.row_number().over(Window.orderBy("url")))
            .cast("long")
            .alias("lsn"),
            F.lit("U").alias("op"),
            "url",
            F.col("last_mod").cast("timestamp").alias("warc_ts"),
            F.encode(
                F.concat(
                    F.lit("<html><head><title>refresh</title></head><body><p>refetched "),
                    F.col("url"),
                    F.lit(" wave "),
                    F.col("wave").cast("string"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
            "lang",
            F.lit("text/html").alias("content_type"),
            F.create_map(
                F.lit("data_stream_id"), F.lit("stream-refresh"),
                F.lit("data_stream_route"), F.lit("route-0"),
                F.lit("Reporting_Jurisdiction"), F.lit("J1"),
                F.lit("charset"), F.lit("utf-8"),
            ).alias("meta"),
        )
    )
    refetch.write.parquet(os.path.join(cycle_events_dir, f"epoch_hint={N_EPOCHS}"))

    # -- 7. replay the refresh epoch into the same warehouse ---------------
    res2 = replay(wh, cycle_events_dir)
    assert res2["applied_epochs"] == [N_EPOCHS]

    all_events = spark.read.parquet(cycle_events_dir).toPandas()
    exp = oracle_final_states(all_events)["web_pages"]
    got = wh.table("web_pages").read().toPandas()
    for col in exp.columns:
        if col not in got.columns:
            assert exp[col].isna().all()
            got[col] = None
    got = got[exp.columns].sort_values("url").reset_index(drop=True)
    exp = exp.sort_values("url").reset_index(drop=True)
    assert len(got) == len(exp)
    for col in exp.columns:
        g, e = got[col], exp[col]
        if col == "html":
            g = g.map(lambda b: bytes(b) if b is not None else None)
        assert g.where(pd.notna(g), None).equals(e.where(pd.notna(e), None)), f"web_pages.{col} differs"

    # every scheduled url now carries the refreshed payload (LWW took the
    # newer (warc_ts, lsn)); byte-identical text via the shared extractor
    refreshed = got[got["url"].isin(exp_fetched)]
    assert len(refreshed) == len(exp_fetched)
    assert refreshed["text"].str.contains("refetched", regex=False).all()
