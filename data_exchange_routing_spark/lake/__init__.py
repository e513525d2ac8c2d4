from data_exchange_routing_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
