"""Incremental-maintenance / storage-efficiency operators (round-5
batch 4).

Two patterns a production lakehouse runs constantly:

* **Incremental view maintenance** — refresh a materialized daily
  aggregate from a late-arriving delta batch by merging per-day
  partials, instead of recomputing the world. The ORACLE recomputes
  from scratch, so parity is a proof that the incremental merge is
  equivalent to full recomputation — the IVM correctness property
  itself.
* **Content-defined chunking (CDC) dedup** — the storage-dedup
  primitive (rsync/backup/borg lineage): cut each document at
  content-determined positions (8-char rolling-hash windows), hash the
  chunks, and measure cross-corpus chunk-level redundancy. Unlike
  fixed-size blocks, CDC cut points survive insertions — the property
  that makes chunk dedup work on shifted content.

Float discipline: everything here is integer counts and integer
polynomial hashes (mod 1e9+7, the doc_fingerprint convention); the
only floats are final ratios rounded at 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Incremental view maintenance: merge a late delta into the daily rollup
# ---------------------------------------------------------------------------
@register(
    "ivm_daily_revenue_refresh",
    doc="IVM: base daily rollup + late-batch delta merged per day ≡ full recompute",
    oracle="""
        WITH full_agg AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        delta_days AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day
            FROM events
            WHERE event_type = 'purchase' AND event_id % 97 = 0
        )
        SELECT strftime(f.day, '%Y-%m-%d') AS day, f.cents, f.n_events,
               d.day IS NOT NULL AS touched
        FROM full_agg f LEFT JOIN delta_days d ON d.day = f.day
        ORDER BY day
    """,
)
def ivm_daily_revenue_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-view refresh path: the base rollup (on-time
    events, event_id % 97 ≠ 0 stands in for "already materialized")
    and the late-batch delta aggregate merge with a per-day full-outer
    combine — the work is O(|delta days|) beyond the base, never a
    re-scan of history. The oracle RECOMPUTES the view from the full
    union, so the hash match is exactly the IVM invariant:
    merge(base, delta) ≡ recompute(base ∪ delta). `touched` marks the
    days a real refresh would rewrite (the delta's partition-pruning
    set).

    Plan: two filtered aggregates over one scan lineage + a full-outer
    merge join on day; at scale the base side is the stored view (no
    scan at all) and only the delta aggregate runs — the merge is the
    same.
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100).cast("bigint")
    late = F.col("event_id") % 97 == 0
    base = (
        ev.filter(~late)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(cents).alias("b_cents"),
            F.count(F.lit(1)).alias("b_n"),
        )
    )
    delta = (
        ev.filter(late)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(cents).alias("d_cents"),
            F.count(F.lit(1)).alias("d_n"),
        )
    )
    merged = base.join(delta, "day", "full_outer").select(
        "day",
        (
            F.coalesce(F.col("b_cents"), F.lit(0))
            + F.coalesce(F.col("d_cents"), F.lit(0))
        )
        .cast("bigint")
        .alias("cents"),
        (F.coalesce(F.col("b_n"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0)))
        .cast("bigint")
        .alias("n_events"),
        F.col("d_n").isNotNull().alias("touched"),
    )
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        "n_events",
        "touched",
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (the storage-dedup primitive)
# ---------------------------------------------------------------------------
_CDC_WIN = 8  # rolling-hash window (chars)
_CDC_MASK = 32  # cut when window-hash % 32 == 0 → ~32-char expected chunks


@register(
    "cdc_chunk_dedup",
    doc="content-defined chunking: rolling-hash cut points, chunk-hash dedup rate per source",
    oracle=f"""
        WITH cutpos AS (
            SELECT doc_id, source, text, length(text) AS n,
                   [i FOR i IN range({_CDC_WIN}, length(text) + 1)
                    IF list_reduce(
                        [CAST(ascii(text[j:j]) AS BIGINT)
                         FOR j IN range(i - {_CDC_WIN} + 1, i + 1)],
                        (acc, c) -> (acc * 31 + c) % 1000000007
                    ) % {_CDC_MASK} = 0] AS cuts
            FROM documents
        ),
        bounds AS (
            SELECT doc_id, source, text,
                   list_concat(list_concat([CAST(0 AS BIGINT)], cuts),
                               [CAST(n AS BIGINT)]) AS bs
            FROM cutpos
        ),
        chunks AS (
            SELECT source,
                   text[bs[k] + 1 : bs[k + 1]] AS chunk
            FROM bounds, unnest(range(1, len(bs))) AS u(k)
            WHERE bs[k + 1] > bs[k]
        ),
        hashed AS (
            SELECT source, chunk, length(chunk) AS clen,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           [CAST(ascii(chunk[j:j]) AS BIGINT)
                            FOR j IN range(1, length(chunk) + 1)]),
                       (acc, c) -> (acc * 31 + c) % 1000000007
                   ) AS chash
            FROM chunks
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(DISTINCT chash) AS BIGINT) AS n_unique,
               CAST(SUM(clen) AS BIGINT) AS total_chars,
               CAST(SUM(CASE WHEN rn = 1 THEN clen ELSE 0 END) AS BIGINT)
                   AS stored_chars,
               round(1.0 - CAST(SUM(CASE WHEN rn = 1 THEN clen ELSE 0 END)
                                AS DOUBLE) / CAST(SUM(clen) AS DOUBLE), 9)
                   AS dedup_savings
        FROM (
            SELECT source, clen, chash,
                   row_number() OVER (PARTITION BY source, chash
                                      ORDER BY clen) AS rn
            FROM hashed
        )
        GROUP BY source ORDER BY source
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking with a portable rolling hash: cut after
    char i when the polynomial hash of the trailing 8-char window ≡ 0
    (mod 32) — expected ~32-char chunks whose boundaries move WITH the
    content (insert a word and only the neighbouring chunks change,
    unlike fixed-size blocks). Chunks hash (mod 1e9+7) and dedup
    per source; `dedup_savings` = 1 − stored/total chars is the
    storage win a chunk store would realize. All tallies are exact
    integers.

    Plan: the window hashes, cut points and chunk extraction are all
    per-row array work (nested higher-order lambdas — the
    embedding_covariance precedent), so the only exchange is the final
    (source, chunk-hash) aggregate; its shuffle carries one row per
    CHUNK (~len/32 of the char volume), not per window.
    """
    import os

    from dynaledger_spark.plans.spread import spread_if_serial

    # single-file corpus → 1-task scan running the WHOLE cut-point scan,
    # chunk extraction and chunk hashing single-threaded (~1.3 s of this
    # query's map side at sf0.1); spread first, gated on the scan's
    # actual parallelism (plans/spread.py)
    d = spread_if_serial(
        spark,
        _t(spark, sf_dir, "documents"),
        os.path.join(sf_dir, "documents.parquet"),
    )
    n = F.length("text")
    # Char codes as an array, BOUND AS A LAMBDA VARIABLE so it evaluates
    # once per row: a withColumn'd array gets inlined by Catalyst's
    # CollapseProject and re-derived at every element_at (O(len) split per
    # access → measured 45 s at sf0.001), and substr(text, j) is an O(j)
    # UTF-8 scan (O(len²) total → 13.5 s at sf0.1). transform(array(codes),
    # cs -> …) is the let-binding: the element materializes, inner lambdas
    # index it at O(1).
    codes = F.transform(
        F.split("text", ""), lambda ch: F.ascii(ch).cast("bigint")
    )

    def _cuts_from(cs):
        # Spark's sequence(a, b) DESCENDS when a > b (not empty like
        # DuckDB's range), so guard sub-window documents explicitly.
        return F.when(
            n >= _CDC_WIN,
            F.filter(
                F.sequence(F.lit(_CDC_WIN), n),
                lambda i: F.aggregate(
                    F.sequence(i - (_CDC_WIN - 1), i),
                    F.lit(0).cast("bigint"),
                    lambda acc, j: (acc * 31 + F.element_at(cs, j))
                    % 1000000007,
                )
                % _CDC_MASK
                == 0,
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    cuts = F.element_at(
        F.transform(F.array(codes), lambda cs: _cuts_from(cs)), 1
    )
    bounds = d.select(
        "doc_id",
        "source",
        "text",
        F.concat(F.array(F.lit(0)), cuts, F.array(n)).alias("bs"),
    )
    chunks = bounds.select(
        "source",
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size("bs") - 1),
                    lambda k: F.col("text").substr(
                        F.element_at(F.col("bs"), k) + 1,
                        F.element_at(F.col("bs"), k + 1)
                        - F.element_at(F.col("bs"), k),
                    ),
                ),
                lambda c: F.length(c) > 0,
            )
        ).alias("chunk"),
    )
    from dynaledger_spark.functions.text import rolling_fingerprint

    hashed = chunks.select(
        "source",
        F.length("chunk").alias("clen"),
        rolling_fingerprint(F.col("chunk")).alias("chash"),
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("source", "chash").orderBy("clen")
    )
    return (
        hashed.withColumn("rn", rn)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("chash").cast("bigint").alias("n_unique"),
            F.sum("clen").cast("bigint").alias("total_chars"),
            F.sum(F.when(F.col("rn") == 1, F.col("clen")).otherwise(0))
            .cast("bigint")
            .alias("stored_chars"),
        )
        .select(
            "source",
            "n_chunks",
            "n_unique",
            "total_chars",
            "stored_chars",
            F.round(
                1.0
                - F.col("stored_chars").cast("double")
                / F.col("total_chars").cast("double"),
                9,
            ).alias("dedup_savings"),
        )
        .orderBy("source")
    )
