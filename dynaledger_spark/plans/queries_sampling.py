"""Deterministic sampling / splitting / sharding over the documents corpus.

Training-data pipelines need *reproducible* subsetting: the same doc must
land in the same split on every run, on any cluster size, with no RNG
state to ship. Everything here keys off an explicit multiplicative hash
of the stable `doc_id` — pure JVM-side integer arithmetic (narrow, no
shuffle except where noted) that any other engine can replay bitwise,
which is also what makes the DuckDB oracles exact. `df.sample()` /
`sampleBy()` would be nondeterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Raw scan, NOT queries_text._docs: these queries are scan-side
    # projections/filters, so the compute-repartition the text/dedup
    # queries need (single-file corpus quirk) would only add a shuffle.
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# Knuth's multiplicative constants, reduced mod 2^32.
_H1 = 2654435761
_H2 = 1103515245
_M32 = 4294967296

# shard_round_robin: fixed-width range buckets over the 2^32 hash domain
# (power of two so _M32 // _RR_BUCKETS is exact and bucket ids stay in
# [0, _RR_BUCKETS)).
_RR_BUCKETS = 1024


def _mhash(col, mult: int, add: int = 0):
    """(col * mult + add) % 2^32 as exact arithmetic at ANY id magnitude.

    A raw BIGINT multiply overflows signed-64 once ids exceed ~2^31.7
    (ANSI mode then throws — found by hypothesis, tests/test_properties
    .py), while DuckDB silently promotes to int128; widening through
    DECIMAL(38,0) makes Spark take the same exact path, then the mod
    brings it back to a small BIGINT. Still a pure scan-side JVM
    expression."""
    return ((col.cast("decimal(38,0)") * mult + add) % _M32).cast("bigint")


@register(
    "hash_split_train_val",
    doc="deterministic 80/10/10 train/val/test split by doc_id hash",
    oracle=f"""
        SELECT doc_id,
               CAST((doc_id * {_H1}) % {_M32} % 100 AS INT) AS bucket,
               CASE WHEN (doc_id * {_H1}) % {_M32} % 100 < 80 THEN 'train'
                    WHEN (doc_id * {_H1}) % {_M32} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def hash_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment as a pure projection: no shuffle, no
    sample(), no seed to lose — re-running on 1 or 1000 executors yields
    the identical split, and adding new docs never reassigns old ones
    (the property random splits lack)."""
    docs = _docs(spark, sf_dir)
    bucket = _mhash(F.col("doc_id"), _H1) % 100
    return docs.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "stratified_sample_docs",
    doc="deterministic stratified sample: 50% of 'en', 10% of other langs",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE (doc_id * {_H2} + 12345) % {_M32} % 100 <
              CASE WHEN lang = 'en' THEN 50 ELSE 10 END
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates as a hash-threshold filter — the
    deterministic twin of `df.sampleBy('lang', fractions)`. Pushed to the
    scan as a plain predicate (filter + projection, zero shuffles); rates
    change by editing the CASE, membership never flickers between runs."""
    docs = _docs(spark, sf_dir)
    h = _mhash(F.col("doc_id"), _H2, 12345) % 100
    rate = F.when(F.col("lang") == "en", 50).otherwise(10)
    return docs.filter(h < rate).select("doc_id", "lang")


@register(
    "shard_round_robin",
    doc="deterministic corpus shuffle → exactly-balanced round-robin shards",
    oracle=f"""
        SELECT doc_id,
               CAST(row_number() OVER
                        (ORDER BY (doc_id * {_H1} + 97) % {_M32}, doc_id)
                    % 8 AS INT) AS shard
        FROM documents
    """,
)
def shard_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic shuffle (order by hash) then round-robin into
    8 shards: shard sizes are exactly equal (hash-mod alone is binomial),
    and the order within a shard is a reproducible pseudo-random permutation
    — what a training loader wants for epoch order.

    The global rank is computed DISTRIBUTED (VERDICT r11 item 4 — the
    documented twin, now the implementation): the hash domain [0, 2^32)
    is cut into {_RR_BUCKETS} fixed-width range buckets (a pure
    projection — no sampling, unlike repartitionByRange, so the
    assignment is deterministic on any cluster), each bucket ranks its
    own rows with a PARTITIONED row_number, and a {_RR_BUCKETS}-row
    count aggregate yields per-bucket base offsets via a broadcast
    inequality self-join (grid-sized BroadcastNestedLoop, ≤2^20
    comparisons — never corpus-sized). global_rank = offset + local
    rank reproduces ORDER BY (h, doc_id) exactly because the bucket id
    is monotone in h and doc_id is unique. No total-order sort, no
    single-partition window; the multiplicative hash keeps buckets
    uniform at any corpus size."""
    docs = _docs(spark, sf_dir)
    h = _mhash(F.col("doc_id"), _H1, 97)
    width = _M32 // _RR_BUCKETS
    base = docs.select(
        "doc_id", h.alias("h"), (h / width).cast("int").alias("b")
    )
    from dynaledger_spark.plans.cache import tracked_persist

    # ≤ _RR_BUCKETS rows, read by both sides of the offset join — persist
    # so the corpus is scanned once for the counts, not twice.
    counts = base.groupBy("b").agg(F.count(F.lit(1)).alias("n")).transform(
        tracked_persist
    )
    lower = counts.select(
        F.col("b").alias("lb"), F.col("n").alias("ln")
    )
    offsets = (
        counts.join(F.broadcast(lower), F.col("lb") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.coalesce(F.sum("ln"), F.lit(0)).alias("offset"))
    )
    rn = F.row_number().over(W.partitionBy("b").orderBy("h", "doc_id"))
    return (
        base.join(F.broadcast(offsets), "b")
        .select(
            "doc_id",
            ((F.col("offset") + rn) % 8).cast("int").alias("shard"),
        )
    )


# ---------------------------------------------------------------------------
# Split-leakage audit (round-4)
# ---------------------------------------------------------------------------
@register(
    "split_leakage_check",
    doc="exact-content duplicates crossing the train/val/test boundary",
    oracle=f"""
        WITH labeled AS (
            SELECT md5(substr(text, 1, 40)) AS content_hash,
                   CASE WHEN (doc_id * {_H1}) % {_M32} % 100 < 80 THEN 'train'
                        WHEN (doc_id * {_H1}) % {_M32} % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT content_hash,
               CAST(COUNT(*) FILTER (split = 'train') AS BIGINT) AS n_train,
               CAST(COUNT(*) FILTER (split = 'val') AS BIGINT) AS n_val,
               CAST(COUNT(*) FILTER (split = 'test') AS BIGINT) AS n_test
        FROM labeled
        GROUP BY content_hash
        HAVING COUNT(*) FILTER (split = 'train') > 0
           AND COUNT(*) FILTER (split <> 'train') > 0
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit every eval pipeline needs after hash-splitting: content
    fingerprints that appear in train AND in val/test (near-identical
    text under different doc_ids silently inflates eval scores). The
    fingerprint is the prefix-40 canonicalization (the same blocking key
    ngram_jaccard uses): the regenerated testdata has no byte-identical
    texts, only near-dups, so an md5(text) key was 0-row at every SF — a
    vacuous green (VERDICT r9 item 1). Composes the hash_split
    assignment with the fingerprint — one groupBy on the 16-byte hash
    with conditional counts, map-side combinable. An empty result is the
    passing state; the testdata's injected near-dups do leak, so
    rows > 0 here (8 at sf0.001/sf0.01, 72 at sf0.1).
    """
    docs = _docs(spark, sf_dir)
    bucket = _mhash(F.col("doc_id"), _H1) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    labeled = docs.select(
        F.md5(F.substring("text", 1, 40)).alias("content_hash"),
        split.alias("split"),
    )
    agg = labeled.groupBy("content_hash").agg(
        F.sum((F.col("split") == "train").cast("bigint")).alias("n_train"),
        F.sum((F.col("split") == "val").cast("bigint")).alias("n_val"),
        F.sum((F.col("split") == "test").cast("bigint")).alias("n_test"),
    )
    return agg.filter(
        (F.col("n_train") > 0) & ((F.col("n_val") + F.col("n_test")) > 0)
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (round-4): deterministic A-ES
# ---------------------------------------------------------------------------
_AES_K = 50


@register(
    "weighted_sample_aes",
    doc=f"deterministic A-ES weighted sample without replacement (k={_AES_K}, weight=n_chars)",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   round(-ln(((doc_id * {_H2} + 99991) % {_M32} + 1)
                             / CAST({_M32} + 1 AS DOUBLE)) / n_chars, 18) AS aes_key
            FROM documents
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, aes_key
        FROM keyed
        QUALIFY row_number() OVER (ORDER BY aes_key, doc_id) <= {_AES_K}
    """,
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the exponential-race
    construction (Efraimidis-Spirakis A-ES): each row draws
    key = −ln(u)/w and the k SMALLEST keys win — inclusion probability
    proportional to weight, in ONE pass, mergeable as a top-k (the
    shape that samples 100 TB without a shuffle: per-partition top-k,
    driver merge). u is hash-uniform from the doc_id (no RNG — the
    same multiplicative-hash determinism as every sampler here), so
    membership is reproducible across runs, engines, and appends.
    ln() is ~1-ulp across libms: the key rounds to 18dp (keys are
    ~1e-5-scale; rounding collisions fall to the doc_id tiebreak, which
    both engines share).
    """
    docs = _docs(spark, sf_dir)
    u = (_mhash(F.col("doc_id"), _H2, 99991) + 1) / float(_M32 + 1)
    key = F.round(-F.log(u) / F.col("n_chars"), 18)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        key.alias("aes_key"),
    )
    return keyed.orderBy("aes_key", "doc_id").limit(_AES_K)


# ---------------------------------------------------------------------------
# Temperature-scaled source rebalancing (UniMax-style) — round 5
# ---------------------------------------------------------------------------
_TEMP_FRAC = 0.5  # select half the corpus, reweighted


@register(
    "temperature_resample_sources",
    doc="temperature-scaled (T=2) source mixture resampling with deterministic selection",
    oracle=f"""
        WITH srcs AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
                   CAST(SUM(CAST(round(sqrt(n_docs), 6) AS DECIMAL(27,6)))
                        AS DOUBLE) AS sum_w
            FROM srcs
        ),
        tgt AS (
            SELECT source, n_docs,
                   CAST(floor({_TEMP_FRAC} * n_total
                              * round(sqrt(n_docs), 6) / sum_w) AS BIGINT)
                       AS target_n
            FROM srcs CROSS JOIN tot
        ),
        ranked AS (
            SELECT source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY (doc_id * 2654435761) % 4294967296,
                                               doc_id) AS rn
            FROM documents
        ),
        sel AS (
            SELECT r.source, COUNT(*) AS selected_n
            FROM ranked r JOIN tgt ON tgt.source = r.source
            WHERE r.rn <= tgt.target_n
            GROUP BY r.source
        ),
        seltot AS (SELECT CAST(SUM(selected_n) AS BIGINT) AS s FROM sel)
        SELECT t.source,
               CAST(t.n_docs AS BIGINT) AS n_docs,
               t.target_n,
               CAST(COALESCE(sel.selected_n, 0) AS BIGINT) AS selected_n,
               round(CAST(COALESCE(sel.selected_n, 0) AS DOUBLE) / seltot.s, 9)
                   AS new_share
        FROM tgt t LEFT JOIN sel ON sel.source = t.source
        CROSS JOIN seltot
        ORDER BY t.source
    """,
)
def temperature_resample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture rebalancing (the UniMax/mT5 recipe):
    source sampling weights ∝ share^(1/T) with T=2 (= √n), which lifts
    tail sources and damps head ones, then a deterministic hash-ranked
    selection takes each source's quota — no RNG, byte-reproducible.
    Differs from mixture_rebalance_sample (which targets FIXED shares):
    here the target is a smooth function of the observed distribution.
    √n rounds at 6 dp before the DECIMAL weight sum so the normalizer
    is combine-order-independent; quotas are one floor() on identical
    doubles.

    Plan: per-source quota table is dimension-sized (broadcast); the
    corpus pays one source-partitioned rank window and one hash
    aggregate. A skewed source is one sorted run — linear.
    """
    docs = _docs(spark, sf_dir)
    srcs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = srcs.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.sum(F.round(F.sqrt(F.col("n_docs")), 6).cast("decimal(27,6)"))
        .cast("double")
        .alias("sum_w"),
    )
    tgt = srcs.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.floor(
            _TEMP_FRAC
            * F.col("n_total")
            * F.round(F.sqrt(F.col("n_docs")), 6)
            / F.col("sum_w")
        )
        .cast("bigint")
        .alias("target_n"),
    )
    wsrc = W.partitionBy("source").orderBy(_mhash(F.col("doc_id"), _H1), "doc_id")
    ranked = docs.select(
        "source", F.row_number().over(wsrc).alias("rn")
    )
    sel = (
        ranked.join(F.broadcast(tgt.select("source", "target_n")), "source")
        .filter(F.col("rn") <= F.col("target_n"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("selected_n"))
    )
    seltot = sel.agg(F.sum("selected_n").cast("bigint").alias("s"))
    return (
        tgt.join(sel, "source", "left")
        .crossJoin(F.broadcast(seltot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "target_n",
            F.coalesce(F.col("selected_n"), F.lit(0))
            .cast("bigint")
            .alias("selected_n"),
            F.round(
                F.coalesce(F.col("selected_n"), F.lit(0)).cast("double")
                / F.col("s"),
                9,
            ).alias("new_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI
# ---------------------------------------------------------------------------
def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


_BOOT_B = 200
# Inverse-CDF thresholds for Poisson(1): P(X <= k) for k = 0..5; draws
# above the last threshold cap at 6 (P ≈ 1 - 1e-4 — negligible mass,
# identical cap on both engines so exactness is unaffected).
_POIS1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _pois_case_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS1_CDF)
    )
    return f"CASE {arms} ELSE 6 END"


@register(
    "bootstrap_mean_ci",
    doc="Poisson-bootstrap 95% CI of the mean purchase value (200 deterministic replicates)",
    oracle=f"""
        WITH s AS (
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        draws AS (
            SELECT CAST(u.r AS BIGINT) AS rep, cents,
                   {_pois_case_sql(
                       "CAST((event_id * " + str(_H1)
                       + " + CAST(u.r AS BIGINT) * " + str(_H2)
                       + ") % " + str(_M32)
                       + " AS DOUBLE) / " + str(_M32) + ".0"
                   )} AS w
            FROM s, unnest(range(1, {_BOOT_B} + 1)) AS u(r)
        ),
        reps AS (
            SELECT rep,
                   CAST(SUM(CAST(w AS BIGINT) * cents) AS BIGINT) AS wsum,
                   CAST(SUM(w) AS BIGINT) AS wn
            FROM draws GROUP BY rep
        ),
        means AS (
            SELECT CAST(wsum AS DOUBLE) / wn / 100.0 AS m,
                   row_number() OVER (ORDER BY CAST(wsum AS DOUBLE) / wn,
                                      rep) AS rk
            FROM reps
        ),
        pt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(cents) AS BIGINT) AS tot
            FROM s
        )
        SELECT n_events,
               CAST({_BOOT_B} AS BIGINT) AS n_replicates,
               CASE WHEN n_events > 0 THEN
                    round(CAST(tot AS DOUBLE) / n_events / 100.0, 9)
               END AS point_mean,
               round((SELECT m FROM means
                      WHERE rk = CAST(ceil(0.025 * {_BOOT_B}) AS BIGINT)), 9)
                   AS ci_lo,
               round((SELECT m FROM means
                      WHERE rk = CAST(ceil(0.975 * {_BOOT_B}) AS BIGINT)), 9)
                   AS ci_hi
        FROM pt
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Poisson bootstrap (Chamandy et al., Google 2012) — THE
    resampling scheme for distributed data: instead of materializing B
    resampled datasets, each row draws an independent Poisson(1)
    multiplicity per replicate, so one pass over the corpus yields all
    B replicate sums. Draws are DETERMINISTIC — the multiplicative-hash
    uniform u = ((event_id·H1 + rep·H2) mod 2³²)/2³² pushed through the
    exact Poisson(1) inverse CDF — so both engines reproduce identical
    weights and the CI is oracle-exact (percentile method on the
    order statistics of the replicate means, ranks ⌈0.025B⌉/⌈0.975B⌉).

    Plan: map-side explode ×B (no shuffle), ONE hash aggregate on the
    B-row replicate key, a 200-row rank window, and 1-row combines. At
    100 TB the per-replicate partials combine map-side, so cost is one
    corpus scan + B·|partitions| partial rows — the reason this beats
    classic resampling by construction.
    """
    import os

    from dynaledger_spark.plans.spread import spread_if_serial

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # single-file corpus → 1-task scan; the ×B explode and the Poisson
    # CASE chain are the heavy map-side work, so spread the (skinny)
    # pre-explode rows across all cores first (guide §2.5 input skew) —
    # gated on the scan's actual parallelism, so a multi-file events
    # table keeps the raw scan (plans/spread.py)
    s = spread_if_serial(
        spark,
        ev.select(
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        ),
        os.path.join(sf_dir, "events.parquet"),
    )
    # (e·H1 + r·H2) mod 2³² ≡ ((e·H1 mod 2³²) + (r·H2 mod 2³²)) mod 2³²:
    # the e-term is one DECIMAL op per EVENT (hoisted above the explode —
    # the old form paid B decimal multiplies per event), the r-term is a
    # 200-entry literal array folded at plan time, and the recombination
    # is pure bigint (< 2³³, exact). Identical h values by modular algebra
    # — PROVIDED event_id ≥ 0 (true by generation: ids are sequence
    # numbers): Spark's % truncates toward the dividend's sign, so for a
    # negative e the split form could differ from (e·H1 + r·H2) mod 2³²
    # (ADVICE r13; wrap a_term in pmod if ids ever go signed).
    rep_h2 = F.array(
        *[F.lit((r * _H2) % _M32) for r in range(1, _BOOT_B + 1)]
    )
    a_term = (
        (F.col("event_id").cast("decimal(38,0)") * _H1) % _M32
    ).cast("bigint")
    draws = s.select(
        "cents",
        a_term.alias("_a"),
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("rep"),
    ).select(
        F.col("rep").cast("bigint").alias("rep"),
        "cents",
        ((F.col("_a") + F.element_at(rep_h2, F.col("rep"))) % _M32).alias("h"),
    )
    u = F.col("h").cast("double") / float(_M32)
    w = F.lit(6)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < float(_POIS1_CDF[k]), k).otherwise(w)
    reps = (
        draws.select("rep", "cents", w.alias("w"))
        .groupBy("rep")
        .agg(
            F.sum(F.col("w").cast("bigint") * F.col("cents"))
            .cast("bigint")
            .alias("wsum"),
            F.sum("w").cast("bigint").alias("wn"),
        )
    )
    m = F.col("wsum").cast("double") / F.col("wn") / 100.0
    means = reps.select(
        m.alias("m"),
        F.row_number()
        .over(W.orderBy((F.col("wsum").cast("double") / F.col("wn")), "rep"))
        .alias("rk"),
    )
    import math as _math

    lo_rk = int(_math.ceil(0.025 * _BOOT_B))
    hi_rk = int(_math.ceil(0.975 * _BOOT_B))
    # 1-row aggregates (not filter->select): on an empty corpus the rank
    # rows don't exist and the oracle's scalar subqueries yield NULL —
    # MAX over the empty group is the same NULL in a guaranteed 1 row
    lo = means.filter(F.col("rk") == lo_rk).agg(
        F.round(F.max("m"), 9).alias("ci_lo")
    )
    hi = means.filter(F.col("rk") == hi_rk).agg(
        F.round(F.max("m"), 9).alias("ci_hi")
    )
    pt = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("tot"),
    )
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_events",
            F.lit(_BOOT_B).cast("bigint").alias("n_replicates"),
            F.when(
                F.col("n_events") > 0,
                F.round(
                    F.col("tot").cast("double") / F.col("n_events") / 100.0, 9
                ),
            ).alias("point_mean"),
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# UniMax budget allocation (round 7)
# ---------------------------------------------------------------------------
_UNIMAX_EPOCH_CAP = 3          # max epochs any source may repeat
_UNIMAX_B_NUM, _UNIMAX_B_DEN = 59, 20  # budget = 2.95 x corpus chars


@register(
    "unimax_allocation",
    doc="UniMax epoch-capped uniform budget allocation across sources (closed-form waterfilling)",
    oracle=f"""
        WITH srcs AS (
            SELECT source, CAST(SUM(n_chars) AS BIGINT) AS s
            FROM documents GROUP BY source
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_src,
                   ({_UNIMAX_B_NUM} * CAST(SUM(s) AS BIGINT))
                       // {_UNIMAX_B_DEN} AS budget
            FROM srcs
        ),
        ranked AS (
            SELECT source, s, {_UNIMAX_EPOCH_CAP} * s AS u, n_src, budget,
                   row_number() OVER (ORDER BY {_UNIMAX_EPOCH_CAP} * s,
                                      source) AS i,
                   SUM({_UNIMAX_EPOCH_CAP} * s)
                       OVER (ORDER BY {_UNIMAX_EPOCH_CAP} * s, source
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
            FROM srcs CROSS JOIN stats
        ),
        flagged AS (
            SELECT *,
                   (u * (n_src - i + 1) + cum - u) <= budget AS sat
            FROM ranked
        ),
        kn AS (
            SELECT COALESCE(MAX(CASE WHEN sat THEN i END), 0) AS k,
                   COALESCE(MAX(CASE WHEN sat THEN cum END), 0) AS cum_k
            FROM flagged
        )
        SELECT f.source,
               f.s AS chars_total,
               f.u AS cap_chars,
               f.i <= kn.k AS saturated,
               CASE WHEN f.i <= kn.k THEN CAST(f.u AS DOUBLE)
                    ELSE CAST(f.budget - kn.cum_k AS DOUBLE)
                         / (f.n_src - kn.k) END AS quota_chars,
               CASE WHEN f.i <= kn.k THEN CAST(f.u AS DOUBLE)
                    ELSE CAST(f.budget - kn.cum_k AS DOUBLE)
                         / (f.n_src - kn.k) END
                   / CAST(f.s AS DOUBLE) AS epochs
        FROM flagged f CROSS JOIN kn
        ORDER BY f.source
    """,
)
def unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al. 2023, arXiv:2304.09151): allocate a token
    budget across sources as UNIFORMLY as possible subject to a
    per-source epoch cap — the published fix for temperature sampling's
    head-overweighting. Instead of the paper's sequential loop this
    uses the closed-form waterfill: sort sources by cap u_i = C·s_i
    ascending; source i saturates iff u_i·(N-i+1) + cum_{i-1} ≤ B
    (that test is MONOTONE in i for sorted u, so the saturated set is a
    prefix); the K saturated sources take their caps and the rest split
    the remaining budget equally. Everything up to the final waterline
    is BIGINT-exact (budget = 59·Σs // 20 ≈ 2.95 epochs, strictly below
    Σu = 3·Σs so K < N always); the waterline is ONE IEEE division and
    epochs one more, so the DuckDB twin agrees bitwise. With the
    testdata's ~1.37× size spread the 2.95-epoch budget lands inside
    the cap range — small sources saturate, large ones share the
    waterline (non-vacuous at both SFs).

    Plan: one map-side hash aggregate over documents → 20-row source
    table; the rank window and the K-scan run on those 20 rows (global
    window whitelisted as calendar-bounded: |sources|, not corpus).
    At 100 TB the corpus pays exactly one scan+combine; everything
    after is dimension-sized. reference: SURVEY §2.11 (sampling tier).
    """
    docs = _docs(spark, sf_dir)
    srcs = docs.groupBy("source").agg(F.sum("n_chars").cast("bigint").alias("s"))
    stats = srcs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
        F.expr(
            f"({_UNIMAX_B_NUM} * CAST(SUM(s) AS BIGINT)) div {_UNIMAX_B_DEN}"
        ).alias("budget"),
    )
    u = (F.lit(_UNIMAX_EPOCH_CAP) * F.col("s")).alias("u")
    w = W.orderBy(F.lit(_UNIMAX_EPOCH_CAP) * F.col("s"), "source")
    ranked = (
        srcs.crossJoin(F.broadcast(stats))
        .select(
            "source", "s", u, "n_src", "budget",
            F.row_number().over(w).alias("i"),
            F.sum(F.lit(_UNIMAX_EPOCH_CAP) * F.col("s"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("cum"),
        )
    )
    flagged = ranked.withColumn(
        "sat",
        (F.col("u") * (F.col("n_src") - F.col("i") + 1) + F.col("cum") - F.col("u"))
        <= F.col("budget"),
    )
    kn = flagged.agg(
        F.coalesce(F.max(F.when(F.col("sat"), F.col("i"))), F.lit(0)).alias("k"),
        F.coalesce(F.max(F.when(F.col("sat"), F.col("cum"))), F.lit(0)).alias(
            "cum_k"
        ),
    )
    quota = F.when(
        F.col("i") <= F.col("k"), F.col("u").cast("double")
    ).otherwise(
        (F.col("budget") - F.col("cum_k")).cast("double")
        / (F.col("n_src") - F.col("k"))
    )
    return (
        flagged.crossJoin(F.broadcast(kn))
        .select(
            "source",
            F.col("s").alias("chars_total"),
            F.col("u").alias("cap_chars"),
            (F.col("i") <= F.col("k")).alias("saturated"),
            quota.alias("quota_chars"),
            (quota / F.col("s").cast("double")).alias("epochs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (round 7)
# ---------------------------------------------------------------------------
_KFOLD = 5


@register(
    "stratified_kfold_assign",
    doc=f"stratified {_KFOLD}-fold CV assignment: hash-ordered round-robin within each lang",
    oracle=f"""
        WITH ranked AS (
            SELECT lang,
                   CAST((row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * {_H1}) % {_M32}, doc_id) - 1)
                        % {_KFOLD} AS BIGINT) AS fold
            FROM documents
        )
        SELECT lang, fold, COUNT(*) AS n_docs
        FROM ranked GROUP BY lang, fold
        ORDER BY lang, fold
    """,
)
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation assignment (the
    StratifiedKFold contract): within every stratum (lang), documents
    are dealt round-robin into {_KFOLD} folds, so each fold's class
    mix mirrors the corpus and fold sizes differ by at most one per
    stratum. Dealing order is the multiplicative doc_id hash (ties by
    doc_id) — deterministic, append-stable in distribution, and free
    of the temporal/source ordering the raw doc_id would leak into
    folds. Output is the (lang, fold) census the balance property is
    read off of.

    Plan: one exchange on lang for the rank window (strata are the
    shards), rollup rides the same partitioning. At 100 TB the window
    is replaced by the pure-projection form fold = mhash(doc_id) % k
    (hash_split_train_val's shape) at the cost of the exact
    max-minus-min<=1 guarantee — this op is the exact-census miniature.
    reference: SURVEY §2.11 (sampling/splits tier).
    """
    docs = _docs(spark, sf_dir)
    w = W.partitionBy("lang").orderBy(
        _mhash(F.col("doc_id"), _H1), F.col("doc_id")
    )
    ranked = docs.select(
        "lang",
        ((F.row_number().over(w) - 1) % _KFOLD).cast("bigint").alias("fold"),
    )
    return (
        ranked.groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "fold")
    )


# ---------------------------------------------------------------------------
# Near-dup split leakage (round 7) — contamination the exact audit misses
# ---------------------------------------------------------------------------
def _ndl_oracle() -> str:
    from dynaledger_spark.plans.queries_text import _portable_minhash_oracle

    split_of = (
        "CASE WHEN ({id} * " + str(_H1) + ") % " + str(_M32) + " % 100 < 80 "
        "THEN 'train' WHEN ({id} * " + str(_H1) + ") % " + str(_M32)
        + " % 100 < 90 THEN 'val' ELSE 'test' END"
    )
    return f"""
        WITH found AS (
            SELECT id_a, id_b FROM ({_portable_minhash_oracle()}) f
        ),
        labeled AS (
            SELECT {split_of.format(id='id_a')} AS split_a,
                   {split_of.format(id='id_b')} AS split_b
            FROM found
        ),
        norm AS (
            SELECT least(split_a, split_b) AS split_lo,
                   greatest(split_a, split_b) AS split_hi
            FROM labeled
        )
        SELECT split_lo, split_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CASE WHEN split_lo = split_hi THEN 0 ELSE 1 END AS is_leak
        FROM norm GROUP BY split_lo, split_hi
        ORDER BY split_lo, split_hi
    """


@register(
    "near_dup_split_leakage",
    doc="near-dup pairs crossing the train/val/test boundary (the audit exact hashes miss)",
    oracle=None,  # attached below (composes the portable-minhash oracle)
)
def near_dup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contamination split_leakage_check cannot see: NEAR-duplicate
    pairs (MinHash-LSH verified, Jaccard >= 0.5) whose members landed
    in different splits — paraphrase-level leakage that inflates eval
    exactly like exact duplicates do, which is why modern eval
    protocols dedup test sets against train with fuzzy matching (the
    GPT-3 appendix's 13-gram overlap screen is the same idea at n-gram
    grain; this is the MinHash grain). Splits are the repo's
    deterministic hash assignment (hash_split_train_val), so the whole
    audit is replayable.

    Plan: the pair table is minhash_portable_pairs' bucketed plan; the
    split label is a scan-side expression on each id; the rollup is a
    9-cell-max aggregate. reference: SURVEY §2.11 (sampling/eval tier).
    """
    from dynaledger_spark.operators.dedup import portable_minhash_pairs

    docs = _docs(spark, sf_dir)
    found = portable_minhash_pairs(docs).select("id_a", "id_b")

    def split_of(col):
        b = _mhash(F.col(col), _H1) % 100
        return (
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        )

    labeled = found.select(
        split_of("id_a").alias("split_a"), split_of("id_b").alias("split_b")
    )
    return (
        labeled.select(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            F.when(F.col("split_lo") == F.col("split_hi"), 0)
            .otherwise(1)
            .alias("is_leak"),
        )
        .orderBy("split_lo", "split_hi")
    )


from dynaledger_spark.plans.registry import QUERY_REGISTRY as _QRS  # noqa: E402

_QRS["near_dup_split_leakage"].oracle = _ndl_oracle()


# ---------------------------------------------------------------------------
# Priority sampling with unbiased subset-sum estimation (round 9)
# ---------------------------------------------------------------------------
# Duffield, Lund & Thorup 2007 ("Priority sampling for estimation of
# arbitrary subset sums", JACM): draw priority q_i = w_i / u_i, keep the
# k largest, read tau = the (k+1)-th priority, and estimate ANY subset's
# weight-sum as sum over the subset's sampled members of max(w_i, tau) —
# unbiased, with near-optimal variance among k-sample schemes. The one
# capability A-ES sampling (weighted_sample_aes) lacks: the sample comes
# with an ESTIMATOR, so a 64-row sample answers every per-class total.
# Division-only arithmetic (no ln), so both engines agree bitwise.
_PRIO_K = 64


@register(
    "priority_sample_subset_sum",
    doc=f"Duffield-Lund-Thorup priority sample (k={_PRIO_K}) + unbiased per-class subset-sum estimates beside exact totals",
    oracle=f"""
        WITH keyed AS (
            SELECT o_orderkey, o_orderpriority, o_totalprice AS w,
                   o_totalprice /
                     ((((o_orderkey * {_H2} + 424243) % {_M32}) + 1)
                      / CAST({_M32} + 1 AS DOUBLE)) AS prio
            FROM orders
        ),
        top AS (
            SELECT * FROM keyed ORDER BY prio DESC, o_orderkey LIMIT {_PRIO_K + 1}
        ),
        tau AS (SELECT MIN(prio) AS tau FROM top),
        samp AS (SELECT t.* FROM top t, tau WHERE t.prio > tau.tau),
        est AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   CAST(SUM(CAST(greatest(w, (SELECT tau FROM tau))
                                 AS DECIMAL(27,6))) AS DOUBLE) AS est_total
            FROM samp GROUP BY o_orderpriority
        ),
        exact AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                       AS exact_total
            FROM orders GROUP BY o_orderpriority
        )
        SELECT e.o_orderpriority, e.n_orders,
               COALESCE(s.n_sampled, 0) AS n_sampled,
               COALESCE(s.est_total, 0.0) AS est_total,
               e.exact_total
        FROM exact e LEFT JOIN est s USING (o_orderpriority)
        ORDER BY e.o_orderpriority
    """,
)
def priority_sample_subset_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup 2007): one k-row weighted
    sample of orders (w = o_totalprice, u hash-uniform from o_orderkey —
    no RNG, reproducible across runs/engines/appends) that carries an
    UNBIASED estimator for every subset's weight-sum: per sampled item
    w-hat = max(w, tau) with tau = the (k+1)-th priority; per-class
    estimates sit beside the exact per-class totals so the error is
    visible in the output. u and q = w/u are single IEEE divisions and
    the estimator folds through a DECIMAL(27,6) accumulator, so the
    whole query is oracle-exact (the A-ES sampler needs an 18dp-rounded
    ln(); this scheme is division-only).

    Scale: top-(k+1) by priority is a TakeOrdered — per-partition
    top-(k+1) then a (k+1)-row driver merge, NO shuffle of the corpus
    (the same mergeability that samples 100 TB in one pass). tau and the
    sample are k+1 rows — broadcast-sized forever; the exact totals are
    one map-side-combinable aggregate.
    reference: SURVEY §2.11 (sampling tier).
    """
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    u = (_mhash(F.col("o_orderkey"), _H2, 424243) + 1) / float(_M32 + 1)
    keyed = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").alias("w"),
        (F.col("o_totalprice") / u).alias("prio"),
    )
    top = keyed.orderBy(F.col("prio").desc(), "o_orderkey").limit(_PRIO_K + 1)
    tau = top.agg(F.min("prio").alias("tau"))
    samp = top.crossJoin(F.broadcast(tau)).filter(F.col("prio") > F.col("tau"))
    est = samp.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(
            F.greatest(F.col("w"), F.col("tau")).cast("decimal(27,6)")
        ).cast("double").alias("est_total"),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("exact_total"),
    )
    return (
        exact.join(est, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_orders",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("bigint").alias("n_sampled"),
            F.coalesce(F.col("est_total"), F.lit(0.0)).alias("est_total"),
            "exact_total",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------
# DuckDB twin of Spark's conv(hex, 16, 10): the shared base-16
# strpos-polynomial helper (one definition repo-wide).
from dynaledger_spark.plans.queries_stats import _duck_hex_poly  # noqa: E402

_HRW_KEY_DUCK = (
    _duck_hex_poly("md5(concat(d.doc_id, '#', s.shard))", 10) + " * 16 + s.shard"
)
_HRW_KEY_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '#',"
    " CAST(shard AS STRING))), 1, 10), 16, 10) AS BIGINT) * 16 + shard"
)


@register(
    "rendezvous_hash_shard",
    doc="HRW (rendezvous) shard assignment at 8 shards + minimal-movement audit vs 9 shards",
    oracle=f"""
        WITH shards AS (
            SELECT CAST(unnest(range(0, 9)) AS BIGINT) AS shard
        ),
        keyed AS (
            SELECT d.doc_id, s.shard,
                   CAST({_HRW_KEY_DUCK} AS BIGINT) AS hkey
            FROM documents d CROSS JOIN shards s
        ),
        winners AS (
            SELECT doc_id,
                   MAX(CASE WHEN shard < 8 THEN hkey END) % 16 AS shard8,
                   MAX(hkey) % 16 AS shard9
            FROM keyed GROUP BY doc_id
        )
        SELECT CAST(shard8 AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(CASE WHEN shard9 <> shard8 THEN 1 END) AS BIGINT) AS n_moved,
               CAST(COUNT(CASE WHEN shard9 <> shard8 AND shard9 <> 8 THEN 1 END)
                    AS BIGINT) AS n_moved_wrongly
        FROM winners GROUP BY shard8 ORDER BY shard8
    """,
)
def rendezvous_hash_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight hashing (Thaler & Ravishankar
    1998) — the shard assignment a 100 TB pipeline wants when the shard
    count changes over time: each doc goes to the shard with the highest
    hash(doc, shard), so growing 8 -> 9 shards moves ONLY the ~1/9 of
    docs whose new shard-8 key wins (n_moved_wrongly is 0 by
    construction: a doc never moves BETWEEN old shards). Modulo-hash
    sharding (hash_split_train_val's scheme) reassigns ~8/9 of all docs
    on the same resize.

    Determinism: the per-(doc, shard) key is the leading 40 bits of an
    md5, disambiguated by appending the shard id in the low 4 bits
    (hkey = h*16 + shard), so MAX() is a total order even under 40-bit
    hash collisions and both engines pick the identical winner; the
    winning shard is recovered as hkey % 16. Pure scan-side expressions:
    a 9-way broadcast cross join then one hash aggregate per doc —
    stateless, no coordination table, the same plan at any corpus size.
    """
    docs = _docs(spark, sf_dir)
    shards = spark.range(0, 9).select(F.col("id").alias("shard"))
    keyed = docs.select("doc_id").crossJoin(F.broadcast(shards)).select(
        "doc_id", "shard", F.expr(_HRW_KEY_SPARK).alias("hkey")
    )
    winners = keyed.groupBy("doc_id").agg(
        (F.max(F.when(F.col("shard") < 8, F.col("hkey"))) % 16).alias("shard8"),
        (F.max("hkey") % 16).alias("shard9"),
    )
    return (
        winners.groupBy("shard8")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("shard9") != F.col("shard8"), 1))
            .cast("bigint")
            .alias("n_moved"),
            F.count(
                F.when(
                    (F.col("shard9") != F.col("shard8")) & (F.col("shard9") != 8), 1
                )
            )
            .cast("bigint")
            .alias("n_moved_wrongly"),
        )
        .select(
            F.col("shard8").cast("bigint").alias("shard"),
            "n_docs",
            "n_moved",
            "n_moved_wrongly",
        )
        .orderBy("shard")
    )
