"""Query registry — the single source of truth behind __spark_entry__.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers one QuerySpec: a Spark builder (spark, sf_dir) ->
DataFrame and, where the semantics are ANSI-SQL-expressible, an oracle SQL
string for the driver's DuckDB comparison.

Determinism contract for oracle-checked queries:
  * every computed column is aliased identically in Spark and SQL;
  * SUM/AVG over doubles goes through an exact DECIMAL accumulator and is
    cast back to DOUBLE at the end — aggregation order then cannot change
    the result, so Spark's partial aggregates and DuckDB agree bitwise;
  * window orderings include a unique tiebreaker column;
  * per-row double arithmetic is IEEE-deterministic and needs no special
    handling.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERY_REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, headline=headline, doc=doc or fn.__doc__ or "", tags=tags
        )
        return fn

    return wrap


# The driver verifies the FIRST 50 registry entries in insertion order
# (VERDICT r1). Spend that budget where verification adds information:
# queries with exact oracles that have no green driver row yet (never run
# in round 1, or errored on the since-fixed nanos-read defect) go first;
# round-1 driver-green queries follow (re-verification is cheap insurance,
# not new signal); rows-only queries (no DuckDB oracle → weaker check)
# go last. Names derived from CORRECTNESS_r01.json; unknown/new queries
# default into the front tier so future additions get verified too.
_ROUND1_DRIVER_GREEN = frozenset(
    {
        "anti_join_fk", "bottomk_suppliers", "broadcast_lookup_default",
        "cube_sales_priority", "date_rollup", "date_validity",
        "doc_assembly", "exists_bulk_orders", "fact_build",
        "first_last_order_span", "flatten_explode", "hash_split_train_val",
        "inactive_customers_except", "lead_next_order_gap",
        "media_decode_meta", "media_features", "media_frame_sample",
        "media_resize_dims", "median_disc_by_priority",
        "ntile_acctbal_quartiles", "orc_roundtrip_revenue",
        "regex_extract_id_buckets", "rolling_30d_revenue", "sales_rollup",
        "scalar_stats", "scalar_subquery_small_qty", "shard_round_robin",
        "sql_passthrough", "statement_query", "stddev_exact_by_flag",
        "stratified_sample_docs", "topk_customers", "union_by_name",
        "unique_key_check", "unpivot_lineitem_measures",
        "validation_summary",
    }
)


def driver_order(registry: dict[str, QuerySpec]) -> list[str]:
    """Registry names ordered for the driver's truncated verify window."""

    def tier(name: str) -> int:
        spec = registry[name]
        if spec.oracle is None:
            return 2
        return 1 if name in _ROUND1_DRIVER_GREEN else 0

    # Stable within tiers: keep registration order (itself meaningful —
    # flagship operators register early in each module).
    names = list(registry)
    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is fully populated.

    Returned dict is in driver-priority order (see :func:`driver_order`):
    the driver's CORRECTNESS check truncates to the first 50 entries.
    """
    from dynaledger_spark.plans import (  # noqa: F401
        queries_approx,
        queries_core,
        queries_multimodal,
        queries_sampling,
        queries_sql_ext,
        queries_streaming,
        queries_text,
        queries_timeseries,
        queries_vector,
    )

    return {name: QUERY_REGISTRY[name] for name in driver_order(QUERY_REGISTRY)}
