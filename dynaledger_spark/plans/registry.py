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


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is fully populated."""
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

    return QUERY_REGISTRY
