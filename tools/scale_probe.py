"""Empirical skew/scale probe: 10x data + deliberately hot keys.

Builds a ~10x corpus from sf0.1 (events and documents unioned 10 times
with perturbed ids), injects two adversarial skews —
  * one hot USER: ~100k extra purchase events on a single user_id
    (the segmented-EWMA / sessionization stress shape), and
  * one hot DOCUMENT: one boilerplate text duplicated 3,000 times
    (the degenerate-LSH-bucket / exact-dup stress shape) —
then runs the operator families whose scale posture SCALE.md claims,
at 1x and at 10x+skew, and reports the wall-clock ratio plus whether
the guard paths (LSH bucket cap, bounded EWMA segments) engaged.

Run: python tools/scale_probe.py   (writes nothing into the repo;
probe data lives under /tmp and is removed on exit)
Results are transcribed into SCALE.md ("Measured" section).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import load_all
from dynaledger_spark.session import get_spark

SF1 = "/root/testdata/sf0.1"
QUERIES = [
    "minhash_lsh_pairs",        # LSH banding + bucket cap
    "dedup_exact",              # hash groupBy
    "ewma_user_values",         # segmented per-key fold (hot user)
    "time_bucket_ohlc",         # single-exchange rollup
    "curation_pipeline_e2e",    # 5-stage composed plan
    "salted_join_segment_revenue",  # explicit salt path
    "simhash_near_dup_pairs",   # pigeonhole chunk join
    # round-4 families
    "segment_dedup_boilerplate",  # hot doc -> 3000x duplicated segment keys
    "boilerplate_strip_stats",    # skewed join back on the hot segment key
    "knn_join_topk",              # broadcast fan-out over a 10x corpus
    "tokenize_to_ids",            # broadcast-vocab probe + doc reassembly
    "mad_outlier_summary",        # exact medians over 10x groups (the documented sketch-at-scale caveat)
    "near_dup_purge_e2e",         # CC with a 3000-node dup cluster (diameter ~600 via the +-5 window)
    # late round-4 families (queries_feature / queries_mlprep)
    "dup_span_marking",           # gram-clustered window; 3000 identical docs -> one gram key with 3000x cnt rows
    "twap_user_value",            # hot user: 100k-event timeline through the lead() window (no per-key arrays)
    "attribution_linear",         # 10x both sides of the 7-day range join (hot user is purchase-only -> unattributed by design)
    "feature_hash_vectorize",     # 10x word explode into the O(buckets) aggregate
    "event_trigram_top",          # hot user's 100k-row window partition, two leads per row
    # round-4 batches 5-6 (queries_featurestore / queries_eval)
    "pit_join_click_tier",        # hot user's 100k purchases -> tier-change stream through one merged as-of window
    "rolling_purchase_features",  # hot user: 100k rows inside one 30d RANGE frame (incremental slide, no O(n^2))
    "markov_sequence_score",      # hot user's fold stays bounded at |types|^2 terms by the per-(user,prev,cur) count
    "cms_heavy_hitters",          # 3000x-duplicated boilerplate words -> constant-size sketch grid regardless
    "pmi_collocations",           # 10x bigram stream through joint + margins aggregates
    # round-5 batch 2/3 families
    "bm25_topk_docs",             # 3000x hot doc -> term-filtered tf shuffle + scalar broadcasts
    "rrf_hybrid_topk",            # fusion of two bounded top-100s over the 10x corpus
    "mlm_mask_positions",         # zero-exchange scan-project at 10x+3000 dup docs
    "psi_feature_drift",          # hot user: 100k purchases land in a few (type, bin) cells
    "join_key_skew_report",       # must REPORT the injected hot user, not choke on it
    "freshness_lag_by_type",      # 1-row watermark broadcast over 10x events
    "rsi_14_daily_revenue",       # calendar-bounded daily windows over 10x events
    "kwic_concordance",           # TakeOrdered over the exploded 10x+hot-doc hit stream
    # round-7: the TPC-H family against 10x lineitem/orders with a 50k-line
    # hot order and a 20k-order hot customer
    "tpch_q3_shipping_priority",   # orderkey shuffle + TakeOrdered under the hot order
    "tpch_q6_forecast_revenue",    # pure scan-agg: must scale ~linearly with I/O
    "tpch_q8_market_share",        # 7-table join tree, two broadcast nation sides
    "tpch_q13_order_count_distribution",  # LEFT-join count with the 20k-order hot customer
    "tpch_q15_top_supplier",       # quarter agg + 1-row max broadcast
    "tpch_q17_small_quantity_revenue",    # correlated-AVG decorrelation at 10x
    "tpch_q18_large_volume_customers",    # HAVING>300 over the 50k-line hot order
    "tpch_q22_global_sales_opportunity",  # anti join against 10x orders
    # round-7: the adapted nine
    "tpch_q2_min_cost_supplier",     # (partkey,suppkey) offer-book agg at 10x
    "tpch_q4_order_priority",        # left_semi under the 50k-line hot order
    "tpch_q9_product_type_profit",   # 5-way join, orderkey shuffle at 10x
    "tpch_q11_important_stock",      # partkey agg + 1-row total broadcast
    "tpch_q12_priority_pivot",       # CASE pivot over the year-sliced shuffle
    "tpch_q16_parts_supplier_count", # distinct agg with the hot order's 50k lines
    "tpch_q19_disjunctive_revenue",  # disjunctive scan residuals at 10x
    "tpch_q20_promotion_suppliers",  # nested (suppkey,partkey) agg + semi gate
    "tpch_q21_waiting_suppliers",    # semi+anti self-joins vs the 50k-line order
    # round-7 curation batch: embeddings 10x'd as EXACT clones (every
    # vector gains 9 cosine-1.0 twins), documents 10x+3000 dups
    "semdedup_prune",          # within-cell pairs grow ~100x, prune rate ~90%
    "margin_knn_scores",       # 20-query broadcast over the 10x corpus
    "dsir_importance_weights", # token explode + bucket stats at 10x docs
    # round-7 batch 2
    "unimax_allocation",       # one corpus agg; waterfill stays 20 rows at any SF
    "fisher_lda_quality",      # two moment/score passes, 1-row model broadcast
    "pq_encode_fixed",         # zero-exchange scan encode: must scale ~linearly
    "kcenter_coreset_greedy",  # 7 rounds x pool scan; pool has 10x exact twins
    "mmr_rerank",              # scan+TakeOrdered(20) then bounded driver greedy
    "char_entropy_quality",    # char explode with the 3000x hot doc
    "tokenizer_fertility_by_source",  # regex counting inside codegen, no explode
    # round-7 batch 4
    "doremi_domain_weights",   # token explode + vocab/source aggregates at 10x
    "distinct_ngram_diversity",  # two gram-key distinct aggregates, hot doc dups
    "winnowing_fingerprints",  # per-doc window pass; 3000-dup hot doc = 3000 partitions
    # round-7 batch 6
    "ccnet_perplexity_buckets",  # scoring exchange + per-lang ntile at 10x docs
    "hard_negative_mining",    # 20-query label-filtered fan-out over 10x corpus
    "length_grouped_batching",  # two per-shard rank windows, hot doc dups
    # round-7 batch 7
    "winnowing_overlap_pairs",  # 3000-dup doc's fingerprints MUST drop at the posting cap
    "decontam_embedding_sim",  # benchmark side grows with corpus/50 — still broadcast at 10x
    "filter_agreement_kappa",  # one map-side aggregate; 6-row projection
    # round-7 batch 8
    "spearman_quality_scores",  # scoring exchange + two per-source rank windows
    "hill_tail_index",         # corpus scan into TakeOrdered(51); rest is 51 rows
    "stratified_kfold_assign",  # one lang exchange; rollup rides the window partitioning
    # round-7 batch 9
    "quality_ensemble_gate",   # scan-side gates + one source rollup
    "bits_per_byte_by_source",  # token explode + (source,word) agg + byte rollup
    # round-7 batch 10
    "lsh_recall_eval",  # 3000-dup cluster MUST collapse to one md5 group before the PPJoin
    "jaccard_prefix_filter_join",  # same collapse; output itself is C(3001,2) pairs for the cluster
    "link_prediction_common_neighbors",  # hot middle vertex MUST drop at the 128-degree cap
    # round-7 batch 11
    "adamic_adar_link_prediction",  # same capped wedge join + per-pair fold
    "minhash_estimation_error",  # verified pairs x sig agreement; bucket cap bounds pairs
    # round-7 batch 12
    "near_dup_split_leakage",  # bucket-capped pairs + scan-side split labels
    "ngram_novelty_rate",  # gram explode + one gram-key left join; 3000-dup doc collapses in train_set
    # round-8: the remaining unprobed featurestore/incremental/retrieval queries
    "acf_daily_revenue",          # |days|-bounded lag frame over a 10x daily rollup
    "basket_association_rules",   # pair explode within orders; hot 50k-line order MUST hit the basket cap
    "km_churn_curve",             # per-user span agg then |users|-row risk table
    "quantile_normalize_by_type", # two per-type rank windows; hot user adds 100k rows to one type
    "mad_outlier_days",           # exact medians over 10x day groups (documented sketch-at-scale caveat)
    "ivm_daily_revenue_refresh",  # delta-partition refresh: cost tracks the delta, not the 10x base
    "cdc_chunk_dedup",            # chunk-hash anti join; 3000-dup doc collapses to one chunk set
    "ndcg_lexical_vs_dense",      # two bounded top-k lists over the 10x corpus, then a 20-row join
    # round-8 sparse-similarity additions
    "fastss_edit1_pairs",   # vocab-sized deletion-key join; 3000-dup doc only inflates counts, not keys
    "tfidf_cosine_pairs",   # rare-gram blocking: the hot doc's grams go ubiquitous (df>8) and LEAVE the blocking set
    "self_bleu_proxy",      # gram explode + two map-side aggregates; linear in corpus bytes
    "bucketed_colocated_join",  # bucketed WRITES dominate; scan+join rides the layout
    "kmv_theta_sketch_pairs",   # per-type distinct collapses the hot user; pair algebra on |types|^2 * k rows
    "conformal_calibration",    # train agg + cal rank window + broadcast test scan; hot user adds rows to one type shard
    "schema_evolution_merge_read",  # two parquet writes + mergeSchema scan; linear in bytes
    "als_half_step_portable",   # (cust,part) ratings agg + per-user 5-integer solve; hot order joins to one customer
    "dpp_partition_pruned_join",  # partitioned rewrite + DPP-pruned scan; linear in bytes
    "fellegi_sunter_linkage",   # (segment, bucket)-blocked pair scoring; scan-side fixed-weight sum
    "lpa_communities_fixed",    # 3 rounds of edge-label join+agg; hot order capped at MAX_BASKET before pairs
    # round-9 combined clone+skew sweep: the similarity/graph/embedding
    # queries that had never seen the probe corpus (which carries BOTH
    # failure modes: exact-clone embeddings + 3000-dup docs + hot keys)
    "ann_cosine_topk", "ann_lsh_bucketed", "cosine_near_dup_windowed",
    "embedding_norms", "centroid_assign_fixed", "quantized_cosine_pairs",
    "random_projection_jl", "ann_recall_eval", "grid_density_clusters",
    "power_iteration_portable", "kmeans_portable_lloyd",
    "ann_ivf_persisted_topk", "ann_ivf_topk", "power_iteration_top_pc",
    "copurchase_degree_hist",
    "copurchase_triangles",  # probe-driven redesign: degree-oriented wedges (22x -> 4.5x)
    "bfs_levels_copurchase", "kcore_copurchase",
    "pagerank_portable_fixedpoint", "pagerank_copurchase",
    "minhash_portable_pairs", "simhash_portable_fingerprints",
    "doc_fingerprint", "lang_id",
    "dedup_clusters",  # pointer-jumping CC over the 3000-dup cluster: ~6x, O(rounds x edges)
    "ngram_jaccard", "text_quality", "containment_scores",
    "dedup_keep_best", "minhash_portable_incremental", "type_token_ratio",
    "vocab_build_topn", "lang_id_confusion", "source_vocab_overlap",
    "compression_ratio_quality", "simhash_fingerprints",
    # round-10: the RAG retrieval composition (3000-dup hot doc makes one
    # fingerprint block and one index cell hot; bench grams stay broadcast)
    "rag_pipeline_e2e",
    # round-10 batch 2: experimentation / decision-science + sharding + RM3
    "ab_srm_check",            # one distinct over 10x events (hot user collapses to 1 unit)
    "ips_offline_eval",        # per-user lookups; hot user's 100k purchases skew ONE join key
    "beta_binomial_shrinkage", # |users|-row rates + 1-row prior broadcast
    "huber_mean_irls",         # 4 map-side-combined aggregates over 10x events
    "ar1_forecast",            # |days|-bounded series after one 10x rollup
    "rendezvous_hash_shard",   # stateless 9-way expression fan-out; 3000-dup doc is 3000 distinct ids
    "rm3_query_expansion",     # two term-filtered tf shuffles; hot doc joins the feedback set at most once
    # round-10 batch 3
    "sequential_test_readout", # ONE scan into a (day, arm) pre-aggregate; looks derive on |days| rows
    "psm_stratified_att",      # per-user aggregate collapses the hot user to one row before the NTILE
    "ucb1_allocation",         # one map-side aggregate to |arms| rows
    "forecast_backtest_mase",  # |days|-bounded windows after one daily rollup
    "textrank_keywords",       # vocab-bounded edge set: the 3000-dup doc adds ZERO new bigram edges
]

# CLI: `python tools/scale_probe.py q1 q2 ...` probes only the named
# queries (used to extend the measured table without re-running the
# whole suite). Guarded to script execution: importers (sf1_bench
# borrows build_probe) carry their own argv.
if __name__ == "__main__" and len(sys.argv) > 1:
    _known = set(QUERIES)
    _unknown = [q for q in sys.argv[1:] if q not in _known]
    if _unknown:
        # unknown names may still be valid registry queries (used to probe a
        # query before it joins the measured table) — warn, don't guess
        print(f"scale_probe: not in the measured QUERIES list: {_unknown}", file=sys.stderr)
        from dynaledger_spark.plans.registry import load_all as _la

        _reg = _la()
        _bad = [q for q in _unknown if q not in _reg]
        if _bad:
            sys.exit(f"scale_probe: unrecognized query names: {_bad}")
    # dedupe while preserving argv order: the same name passed twice
    # should probe (and report) once
    QUERIES = list(dict.fromkeys(sys.argv[1:]))


def build_probe(spark, dest: str, mult: int = 10, skew: bool = True) -> None:
    """10x dataset under `dest`. skew=True injects the adversarial hot
    keys (hot order / hot customer / hot user / 3000-dup doc) for the
    guard-path probes; skew=False builds the CLEAN 10x corpus — the
    "sf1" whole-suite scaling datapoint (BASELINE.md)."""
    os.makedirs(dest, exist_ok=True)
    scaled = (
        "events.parquet", "documents.parquet", "lineitem.parquet",
        "orders.parquet", "embeddings.parquet",
    )
    for f in os.listdir(SF1):
        if f.endswith(".parquet") and f not in scaled:
            os.symlink(os.path.join(SF1, f), os.path.join(dest, f))

    # --- TPC-H fact tables: 10x with consistent orderkey perturbation
    # (lineitem and orders shift together so the FK holds), custkey /
    # partkey / suppkey domains fixed (each customer simply has 10x the
    # orders — the realistic scale-up). Two adversarial skews:
    #   * hot ORDER 999,999,999 with 50k lineitems — the skewed-orderkey
    #     shuffle shape for Q3/Q10/Q18's join and HAVING aggregate;
    #   * hot CUSTOMER 7 with 20k extra (lineitem-less) orders — the
    #     skewed-custkey shape for Q13's LEFT-join count and Q22's anti
    #     join.
    li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(SF1, "orders.parquet"))
    n_li, n_od = li.count(), od.count()
    licopies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
        for i in range(mult)
    ]
    li_big = licopies[0]
    for c in licopies[1:]:
        li_big = li_big.unionByName(c)
    hot_li = spark.range(50_000).select(
        F.lit(999_999_999).cast("long").alias("l_orderkey"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) + 1).alias("l_partkey"),
        (F.pmod(F.col("id"), F.lit(100)) + 1).alias("l_suppkey"),
        (F.col("id") + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.col("id"), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        (F.pmod(F.col("id") * 7919, F.lit(90_000)) / 100.0 + 100.0).alias("l_extendedprice"),
        (F.pmod(F.col("id"), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(F.col("id"), F.lit(9)) / 100.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.expr(
            "timestamp'1997-06-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 31536000)"
        ).alias("l_shipdate"),
    )
    if skew:
        li_big = li_big.unionByName(hot_li.select(*li.columns))
    li_big.write.mode("overwrite").parquet(os.path.join(dest, "lineitem.parquet"))

    odcopies = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
        for i in range(mult)
    ]
    od_big = odcopies[0]
    for c in odcopies[1:]:
        od_big = od_big.unionByName(c)
    hot_orders = spark.range(20_001).select(
        (F.col("id") + 980_000_000).alias("o_orderkey"),
        F.lit(7).cast("long").alias("o_custkey"),
        F.lit("F").alias("o_orderstatus"),
        (F.pmod(F.col("id") * 104729, F.lit(400_000)) / 100.0).alias("o_totalprice"),
        F.expr(
            "timestamp'1996-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 126144000)"
        ).alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    )
    # ...and the hot order itself, owned by customer 7
    hot_one = spark.sql(
        "SELECT CAST(999999999 AS BIGINT) AS o_orderkey, CAST(7 AS BIGINT) AS o_custkey, "
        "'O' AS o_orderstatus, CAST(123456.78 AS DOUBLE) AS o_totalprice, "
        "timestamp'1997-05-01 00:00:00' AS o_orderdate, '1-URGENT' AS o_orderpriority"
    )
    if skew:
        od_big = od_big.unionByName(hot_orders.select(*od.columns)).unionByName(
            hot_one.select(*od.columns)
        )
    od_big.write.mode("overwrite").parquet(os.path.join(dest, "orders.parquet"))
    print(
        f"probe built: lineitem {n_li} -> {mult}x, orders {n_od} -> {mult}x"
        + (" (+50k-line hot order, +20k-order hot customer)" if skew else "")
    )

    ev = spark.read.parquet(os.path.join(SF1, "events.parquet"))
    n_ev = ev.count()
    copies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        .withColumn("user_id", (F.col("user_id") + F.lit(i * 1500)))
        for i in range(mult)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    # hot user: 100k purchases on user 999999, spread over the same span
    hot = (
        spark.range(100_000)
        .select(
            (F.col("id") + 900_000_000).alias("event_id"),
            F.lit(999_999).cast("long").alias("user_id"),
            F.lit("purchase").alias("event_type"),
            F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id*7)").alias("ts"),
            (F.pmod(F.col("id") * 2654435761, F.lit(100_000)) / 100.0).alias("value"),
            F.lit('{"k":"v"}').alias("props"),
        )
    )
    if skew:
        ev_cols = [f.name for f in ev.schema.fields]
        big = big.unionByName(hot.select(*[c for c in ev_cols if c in hot.columns]), allowMissingColumns=True)
    big.write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))

    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
    n_docs = docs.count()
    dcopies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(mult)
    ]
    dbig = dcopies[0]
    for c in dcopies[1:]:
        dbig = dbig.unionByName(c)
    if skew:
        one = docs.limit(1).collect()[0]
        boiler = (
            spark.range(3000)
            .select(
                (F.col("id") + 900_000_000).alias("doc_id"),
                *[F.lit(one[c]).alias(c) for c in docs.columns if c not in ("doc_id",)],
            )
        )
        dbig = dbig.unionByName(boiler.select(*docs.columns))
    dbig.write.mode("overwrite").parquet(os.path.join(dest, "documents.parquet"))
    print(
        f"probe built: events {n_ev} -> {mult}x, docs {n_docs} -> {mult}x"
        + (" (+100k-event hot user, +3000-dup doc)" if skew else "")
    )

    # --- embeddings: 10x with the VECTORS UNCHANGED (ids shifted) —
    # the adversarial case for semantic dedup: every vector now has 9
    # exact clones (cosine 1.0), so SemDeDup's within-cell pair count
    # and prune rate both explode; margin-kNN's neighborhoods saturate.
    emb = spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
    n_emb = emb.count()
    ecopies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        for i in range(mult)
    ]
    ebig = ecopies[0]
    for c in ecopies[1:]:
        ebig = ebig.unionByName(c)
    ebig.write.mode("overwrite").parquet(os.path.join(dest, "embeddings.parquet"))
    print(f"probe built: embeddings {n_emb} -> {mult}x exact clones")


def run(spark, reg, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            reg[name].build(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            if dt <= 2.0:
                break
        out[name] = best
    return out


def main() -> None:
    spark = get_spark("scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = load_all()
    dest = tempfile.mkdtemp(prefix="dl_scale10x_")
    try:
        build_probe(spark, dest)

        base = run(spark, reg, SF1)
        big = run(spark, reg, dest)
        print(f"\n{'query':34s} {'1x':>7s} {'10x+skew':>9s} {'ratio':>6s}")
        for name in QUERIES:
            print(f"{name:34s} {base[name]:7.2f} {big[name]:9.2f} {big[name]/base[name]:6.1f}")

        # guard engagement evidence
        from dynaledger_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

        docs = spark.read.parquet(os.path.join(dest, "documents.parquet"))
        sigs = minhash_signatures(docs)
        banded = sigs.select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(31)),
                    lambda b: F.hash(F.slice("sig", b * 4 + 1, 4), b),
                )
            ).alias("band", "band_hash"),
        )
        capped = (
            banded.groupBy("band", "band_hash")
            .count()
            .filter(F.col("count") > 1000)
            .count()
        )
        print(f"\nLSH hot buckets over cap (dropped before collect_list): {capped}")

        from dynaledger_spark.plans.queries_pipeline import EWMA_SEGMENT, ewma_segmented

        ev = spark.read.parquet(os.path.join(dest, "events.parquet")).filter(
            "event_type = 'purchase'"
        )
        hot_row = (
            ewma_segmented(ev).filter("user_id = 999999").collect()[0]
        )
        print(
            f"hot user EWMA: n_events={hot_row['n_events']} -> "
            f"{-(-hot_row['n_events'] // EWMA_SEGMENT)} bounded segments of <= {EWMA_SEGMENT} rows"
        )

        # round-4 guard evidence: the hot document's duplicated segments
        # concentrate on few keys — count the occurrences the hot keys carry
        from dynaledger_spark.plans.queries_text import _segments

        seg_counts = (
            spark.read.parquet(os.path.join(dest, "documents.parquet"))
            .select(F.explode(_segments(F.col("text"))).alias("seg"))
            .groupBy("seg").count()
        )
        hot_segs = seg_counts.filter("count >= 3000").count()
        print(f"hot segment keys (>=3000 occurrences, AQE skew-join territory): {hot_segs}")

        # dup-span guard evidence: the 3000-dup boilerplate doc turns each
        # of its 8-grams into a hot window partition — report the largest
        # (gram, doc) partition the spillable window sorter absorbs
        toks = F.split(F.col("text"), " ")
        grams_arr = F.when(
            F.size(toks) >= 8,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 7),
                lambda i: F.array_join(F.slice(toks, i, 8), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        hot_gram = (
            spark.read.parquet(os.path.join(dest, "documents.parquet"))
            .select(F.explode(grams_arr).alias("g"), F.lit(1).alias("one"))
            .groupBy("g").count().agg(F.max("count")).collect()[0][0]
        )
        print(f"dup-span hottest gram partition (rows through the window sorter): {hot_gram}")
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
