"""Scale utilities: skew salting and bucketed co-located joins.

These are the knobs a 100 TB deployment reaches for when the defaults
stop being enough:

  * AQE's skew-join split handles moderate skew automatically
    (session.py enables it); `salted_join` is the explicit fix for the
    pathological case — one key holding a double-digit percent of a
    fact table, where even a split partition won't fit an executor.
  * `write_bucketed` / bucket-co-located joins remove the shuffle from
    repeated large-large joins on a stable key (fact ⋈ fact): both
    sides pre-hashed into the same bucket layout at write time, so the
    join runs map-side forever after — the Spark analog of the
    reference keeping per-quarter tables pre-organized for its joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting.

    The big (skewed) side gets a pseudo-random salt in [0, n_salts); the
    small side is replicated n_salts times with every salt value. The
    join key becomes (key, salt), so a hot key's rows spread across
    n_salts reducers instead of melting one. Result is identical to the
    plain join for inner/left; cost is n_salts× the small side (which
    must stay broadcast-or-near-broadcast sized).

    right/full are rejected: an unmatched small-side row exists once per
    salt replica, so those join types would emit n_salts null-extended
    duplicates. Salt the other input (swap the arguments) instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "unmatched replicated small-side rows would duplicate under "
            "right/full joins — swap the inputs to salt the other side"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, on + ["_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    Both sides of a recurring join written with the same (cols,
    n_buckets) join shuffle-free; sorted buckets additionally enable
    merge-join without a sort step.
    """
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a managed-table location left by a previous session's metastore
    # blocks CREATE; clear it (local warehouse only)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    shutil.rmtree(loc, ignore_errors=True)

    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — Catalyst sees the matching
    distributions and plans no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
