"""Host-noise-free plan audit: shuffle bytes + scan bytes per headline query.

Wall-clock on this sandbox swings multi-x with hypervisor paging windows
(see BENCH/BASELINE.md), but the BYTES a plan moves are a property of the
plan alone. This script runs every headline query once at the given SF and
records, from the Spark stage/executor REST API, the shuffle write bytes and
input bytes each one causes. Output: one JSON line per query +
a markdown table on stdout, pasted into SCALE.md §13.

Usage: python scripts/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def _stage_totals(spark) -> tuple[int, int]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    return (
        sum(st.get("shuffleWriteBytes", 0) for st in stages),
        sum(st.get("inputBytes", 0) for st in stages),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from data_exchange_routing_spark.plans.queries import QUERIES
    from data_exchange_routing_spark.session import get_spark

    spark = get_spark(
        "shuffle_audit",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "true"},
    )
    rows = []
    for name in HEADLINE:
        s0, i0 = _stage_totals(spark)
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        s1, i1 = _stage_totals(spark)
        rows.append({"query": name, "shuffle_mb": round((s1 - s0) / 1e6, 2),
                     "input_mb": round((i1 - i0) / 1e6, 2)})
        print(json.dumps(rows[-1]))
    print("\n| query | shuffle MB | input MB |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['shuffle_mb']} | {r['input_mb']} |")


if __name__ == "__main__":
    main()
