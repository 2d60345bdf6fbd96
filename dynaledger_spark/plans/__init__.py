from dynaledger_spark.plans.registry import QUERY_REGISTRY, QuerySpec, register

__all__ = ["QUERY_REGISTRY", "QuerySpec", "register"]
