"""data_exchange_routing_spark — a from-scratch PySpark-native CDC/incremental-ingest
engine with the query & data-processing capabilities of CDCgov/data-exchange-routing.

The reference (snapshot 2024-10-20, /root/reference) is a config-driven
validate-then-route ingest pipeline (Azure Functions, Kotlin). This package
re-expresses its semantics Spark-first:

- change-event scan          -> batch/streaming DataFrame sources   (sources/events.py)
- JSON parse + projection    -> from_json / built-in functions      (operators/parse.py)
- metadata validation        -> when/otherwise validity split       (operators/validate.py)
- route-config lookup (join) -> broadcast hash join                 (operators/routing.py)
- 1->N multicast routing     -> per-destination filtered writes     (operators/routing.py)
- chunked atomic commit      -> staged parquet + atomic snapshot    (lake/table.py)
- dead-lettering             -> dead_letter table append            (operators/routing.py)
- lineage/metrics reports    -> lineage_metrics table append        (streaming/lineage.py)
- dedup by sequence order    -> salted window row_number            (operators/dedup.py)
- scalar extension functions -> Arrow-vectorized pandas UDFs        (functions/*.py)

Everything here derives from public knowledge only (Apache Spark APIs and the
public reference repo); no proprietary systems are referenced.
"""

__version__ = "0.1.0"

ENGINE_NAME = "data_exchange_routing_spark"
