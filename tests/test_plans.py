"""Physical-plan assertions — the scale contract, checked in CI.

Correctness says WHAT a query returns; these tests pin HOW Spark is
allowed to execute it: filters reach the parquet scan, projections
prune the read schema, dims broadcast instead of shuffling the fact
side, top-k uses WindowGroupLimit, the last-wins merge never degrades
to SortAggregate, and equal-bucketed tables join without an Exchange.
Each property is exactly what survives (or dies) at a 100×/1000×
scale-up, so a regression here is a perf bug even when results stay
right."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from messdb_spark.queries import QUERIES


def plan_str(df, mode: str = "formatted") -> str:
    from messdb_spark.queries import plan_of
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_of(df).explain(mode)   # pre-pin frame: the REAL plan shape
    return buf.getvalue()


def test_range_filter_pushes_to_scan(spark, sf_dir):
    """O3 range filter must become PushedFilters on the parquet scan
    (the analog of the reference's subtree pruning, Trie.hs:492-510)."""
    from messdb_spark.operators.core import KeyBound, KeyedTable, range_filter
    from messdb_spark.session import read_table

    o = read_table(spark, sf_dir, "orders")
    t = range_filter(KeyedTable(o, ("o_orderkey",)),
                     lo=KeyBound((100,)), hi=KeyBound((500,)))
    p = plan_str(t.df)
    assert "PushedFilters:" in p
    assert "GreaterThanOrEqual(o_orderkey,100" in p.replace(" ", "")


def test_projection_prunes_read_schema(spark, sf_dir):
    """A 2-column projection must read a 2-column schema — scanning
    all 11 lineitem columns for it would be 5× the IO at 100 TB."""
    from messdb_spark.session import read_table

    li = read_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    p = plan_str(df)
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert rs and "l_orderkey" in rs[0] and "l_quantity" in rs[0]
    assert "l_extendedprice" not in rs[0] and "l_returnflag" not in rs[0]


def test_dim_joins_broadcast_not_shuffle(spark):
    """q5 joins fact→dims: every dim side must be a BroadcastHashJoin;
    a SortMergeJoin against nation/customer would shuffle the fact
    table once per dim."""
    df = QUERIES["q5_local_supplier_volume"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_uses_window_group_limit(spark):
    """Per-group top-k must use WindowGroupLimit (rank pushdown):
    each partition keeps k rows before the shuffle instead of sorting
    whole groups."""
    df = QUERIES["topk_orders_per_segment"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "WindowGroupLimit" in p


def test_last_wins_merge_is_all_hash(spark):
    """O1 fold_to_last takes the anti-join path: no SortAggregate (the
    degradation max_by(struct) aggregation suffers), and the base side
    joins broadcast when the delta is small."""
    from messdb_spark.operators.core import KeyedTable, merge_tables

    base = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    delta = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"))
    merged = merge_tables([KeyedTable(base, ("k",)), KeyedTable(delta, ("k",))])
    p = plan_str(merged.df, "simple")
    assert "SortAggregate" not in p
    assert "BroadcastHashJoin" in p  # anti-join against the tiny delta


def test_minhash_signatures_are_map_only(spark):
    """MinHash signatures must be narrow: shingles are folded inside a
    per-row array expression (transform→array_min), never exploded into
    rows — the plan may contain the band-unpivot Generate (stack) but
    no explode Generate and no aggregate over shingles."""
    df = QUERIES["minhash_lsh_candidates"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "stack" in p                 # band unpivot
    assert "Generate explode" not in p  # shingle space never becomes rows
    assert "array_min(transform(" in p  # signature fold is an expression


@pytest.mark.parametrize("nm", ["q1_pricing_summary", "q6_forecast_revenue"])
def test_fact_aggs_partial_and_pushed(spark, nm):
    """The hot scan→filter→agg pipeline must (a) push the date filter
    into the parquet scan and (b) partial-aggregate map-side (shuffle
    carries one row per (partition, group), not per input row)."""
    df = QUERIES[nm].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    assert "partial_sum" in p
    assert "SortAggregate" not in p


def test_equal_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must join with
    ZERO Exchange operators — the co-located join that bucketing buys
    at 100 TB (shuffle cost moves to write time, amortized over every
    later join)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_t")
    try:
        a = spark.range(0, 20000).select(F.col("id").alias("k"),
                                         (F.col("id") % 7).alias("x"))
        b = spark.range(0, 20000).select(F.col("id").alias("k"),
                                         (F.col("id") % 11).alias("y"))
        for nm, df in (("ta", a), ("tb", b)):
            (df.write.mode("overwrite")
               .option("path", str(tmp_path / nm))
               .bucketBy(8, "k").sortBy("k")
               .saveAsTable(f"buckets_t.{nm}"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("buckets_t.ta").join(spark.table("buckets_t.tb"), "k")
            p = plan_str(j, "simple")
            assert "Exchange" not in p
            assert j.count() == 20000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckets_t CASCADE")


def test_interval_join_is_hash_not_nested_loop(spark):
    """The bucketed interval join must plan as a hash/sort-merge join
    on the bucket key — never the BroadcastNestedLoopJoin Catalyst
    picks for a raw range predicate (O(n*m) and broadcast-bound at
    100 TB)."""
    from messdb_spark.operators.range_join import interval_join

    pts = spark.range(0, 5000).select(F.col("id").alias("p"),
                                      F.col("id").alias("pid"))
    ivs = spark.range(0, 500).select((F.col("id") * 10).alias("lo"),
                                     (F.col("id") * 10 + 7).alias("hi"),
                                     F.col("id").alias("iid"))
    j = interval_join(pts, ivs, point_col="p", lo_col="lo", hi_col="hi",
                      bucket_width=10)
    p = plan_str(j, "simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p

    # raw range predicate for contrast: Catalyst degrades to BNLJ
    raw = pts.join(ivs, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
    assert "BroadcastNestedLoopJoin" in plan_str(raw, "simple")


def test_stratified_sample_uses_window_group_limit(spark):
    """Per-stratum quota must prune partial-side (WindowGroupLimit
    Partial before the shuffle) so only quota winners shuffle."""
    df = QUERIES["stratified_sample_per_lang"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "WindowGroupLimit" in p and "Partial" in p


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — a SortMergeJoin here
    would shuffle every corpus shingle at 100 TB."""
    df = QUERIES["benchmark_contamination"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q11_threshold_has_no_window(spark):
    """q11's >avg-threshold filter must NOT use an unpartitioned window
    (Window.partitionBy() funnels the whole O(parts) aggregate through
    ONE partition — a single-executor stage at parts ≈ 10⁸). The
    threshold is a 1-row scalar agg broadcast back via cross join; the
    only SinglePartition exchange allowed is the one feeding that 1-row
    agg (over ~32 partial rows), never the O(parts) window frame."""
    df = QUERIES["q11_important_parts"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "Window" not in p
    assert "partial_sum" in p  # per-part agg still combines map-side


def test_ppjoin_broadcast_gated_on_candidate_count(spark):
    """PPJoin's verify-stage broadcast must be CONDITIONAL on the
    measured candidate count (VERDICT r7 #2): a near-duplicate-heavy
    100 TB shard can blow the candidate set past driver/broadcast
    limits, so above _PP_BCAST_MAX the verify joins must fall back to
    shuffle joins on the bigint pair keys. Pin both branches:
    under the cap the candidate frame broadcasts (no corpus-sized
    shuffle on the verify side); with the cap forced to 0 the plan
    must carry no forced broadcast of cand and never degrade to a
    nested-loop/cartesian join."""
    from messdb_spark.queries.mining import _ppjoin_pairs

    sf = "/root/testdata/sf0.001"
    small = _ppjoin_pairs(spark, sf, bcast_max=10**9)
    p = plan_str(small, "simple")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    # force the shuffle branch AND disable auto/AQE broadcasts: any
    # BroadcastHashJoin left in this plan could only come from a forced
    # hint — exactly the defect being pinned. (In production AQE stays
    # on and may legitimately re-broadcast from runtime stats.)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced = _ppjoin_pairs(spark, sf, bcast_max=0)
        p2 = plan_str(forced, "simple")
        assert "BroadcastNestedLoopJoin" not in p2
        assert "CartesianProduct" not in p2
        assert "BroadcastHashJoin" not in p2   # no forced hint survives
        # the verify joins shuffle on the key columns instead
        assert "SortMergeJoin" in p2 or "ShuffledHashJoin" in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # both branches agree on results (same candidate set, same verify)
    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, forced.collect()))
    assert a == b and len(a) > 0


def test_simhash_band_join_is_equi_hash(spark):
    """SimHash candidates must come from an equi-join on
    (band_idx, band_value) — never the BroadcastNestedLoopJoin /
    cartesian a bare doc_id < doc_id pair predicate degrades to."""
    df = QUERIES["simhash_near_dup_pairs"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "bit_count" in p  # Hamming is one JVM op, not a char fold


def test_mixture_sample_prunes_rank_map_side(spark):
    """The constant rank bound must become a WindowGroupLimit so each
    partition keeps <= budget candidate rows before the shuffle."""
    df = QUERIES["mixture_sample_by_source"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "simple")
    assert "WindowGroupLimit" in p


def test_sequence_packing_has_no_per_source_window_over_docs(spark):
    """The doc-level running sum must partition by (source, shard) —
    shard count grows with data — never by source alone (fixed
    cardinality = one partition per source at scale). Only the tiny
    shard-totals level may window per source."""
    import re

    df = QUERIES["sequence_packing_offsets"].fn(spark, "/root/testdata/sf0.001")
    p = plan_str(df, "formatted")
    # the doc-level running-sum exchange hashes on (source, shard)
    assert re.search(r"hashpartitioning\(source#\d+, shard#\d+", p)


def test_round3_feature_ops_plan_shapes(spark, sf_dir):
    """Round-3 operators: stats/gates must broadcast (never shuffle the
    fact side into a SortMergeJoin), the RP-SimHash projection must be
    join-free map-only, and the session sweep must not funnel through
    a single-partition exchange."""
    z = QUERIES["zscore_event_values"].fn(spark, sf_dir)
    p = plan_str(z)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    g = QUERIES["length_percentile_gate"].fn(spark, sf_dir)
    p = plan_str(g)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    s = QUERIES["embedding_rp_simhash"].fn(spark, sf_dir)
    p = plan_str(s)
    assert "Join" not in p  # pure map + one hash agg

    a = QUERIES["active_sessions_per_hour"].fn(spark, sf_dir)
    p = plan_str(a)
    assert "Exchange SinglePartition" not in p

    # scalar thresholds ride a 1-row broadcast (BNLJ with a 1-row side
    # is the q15 pattern, not a cartesian blowup): the broadcast input
    # must be an aggregate, and no CartesianProduct may appear
    h = QUERIES["order_total_histogram"].fn(spark, sf_dir)
    p = plan_str(h)
    assert "CartesianProduct" not in p


def test_global_rank_avoids_corpus_single_partition(spark, sf_dir):
    """Exact global rank must range-partition the corpus; the only
    SinglePartition exchange allowed is the P-row offsets window
    (driver-scale). A second one means the corpus window regressed to
    the naive one-task global sort."""
    df = QUERIES["global_rank_by_length"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert plan.lower().count("singlepartition") <= 1
    assert "rangepartitioning" in plan.lower()


def test_round4_dedup_ops_never_cartesian(spark, sf_dir):
    """The round-4 candidate-pair operators must stay banded/bucketed
    equi-joins: a CartesianProduct or un-broadcast nested loop in any
    of them is the O(n²) scale regression the designs exist to avoid."""
    for name in ("semantic_dedup_survivors", "lsh_candidates_verified",
                 "perplexity_filter_bigram"):
        plan = plan_str(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        # BroadcastNestedLoopJoin only acceptable with a broadcast side
        # (the tiny-query-side pattern); these queries shouldn't need it
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_mining_ops_plan_shapes(spark, sf_dir):
    """Session-2 mining operators keep their scale contracts: the
    prefix-filter similarity join and PageRank stay equi-join-only (a
    CartesianProduct in either is the O(n²)/O(V·E) regression their
    designs exist to avoid); chi-square keyword marginals broadcast
    (never a SortMergeJoin that shuffles the cell table per marginal);
    MAD's per-type stats ride broadcast joins back to the fact rows."""
    for name in ("ppjoin_jaccard_pairs", "pagerank_customer_supplier",
                 "paragraph_dedup_stats"):
        plan = plan_str(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    for name in ("chisq_keywords_per_source", "mad_outlier_events"):
        plan = plan_str(QUERIES[name].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_ewma_exact_under_repartition(spark, sf_dir):
    """The binary-weight EWMA must be partitioning-invariant: integer
    weighted sums + one final divide give bit-identical output no
    matter how the input is carved up (the property plain float EWMA
    accumulation lacks)."""
    from messdb_spark.queries import QUERIES as Q
    from messdb_spark.session import read_table

    base = {(r["user_id"]): (r["n_recent"], r["ewma_value"])
            for r in Q["ewma_user_spend"].fn(spark, sf_dir).collect()}
    # recompute from a deliberately re-carved input
    e = read_table(spark, sf_dir, "events").repartition(13, "event_type")
    e.createOrReplaceTempView("_ewma_recarved")
    import messdb_spark.queries.mining as mining
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    c = e.select("user_id", "ts", "event_id",
                 F.floor(F.coalesce("value", F.lit(0.0)) * 100 + F.lit(0.5))
                  .cast("long").alias("cents"))
    wu = W.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                          F.col("event_id").desc())
    r = (c.withColumn("rn", F.row_number().over(wu))
          .filter(F.col("rn") <= mining._EWMA_N))
    again = {(row["user_id"]): (row["n_recent"], row["ewma_value"])
             for row in (
        r.groupBy("user_id")
         .agg(F.count(F.lit(1)).alias("n_recent"),
              F.sum(F.expr(f"cents * shiftleft(CAST(1 AS BIGINT), "
                           f"{mining._EWMA_N} - rn)")).alias("num"),
              F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                           f"{mining._EWMA_N} - rn)")).alias("den"))
         .select("user_id", "n_recent",
                 mining.quantize(F.col("num").cast("double") / F.col("den")
                                 / 100.0, 4).alias("ewma_value"))
    ).collect()}
    assert base == again


def test_catalog_diff_is_single_full_outer(spark, sf_dir, warehouse):
    """diff_tables: one full-outer sort-merge/hash join on the key —
    no extra exchanges from the presence flags."""
    from messdb_spark.operators.core import KeyedTable, diff_tables

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, v string")
    plan = plan_str(diff_tables(KeyedTable(a, ("k",)), KeyedTable(b, ("k",))))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    # exactly one join operator in the physical tree (tree summary lists
    # each operator once with an id like "(9) SortMergeJoin")
    import re
    joins = re.findall(r"\(\d+\)\s+(\w*Join\w*)", plan)
    assert len(joins) == 1, joins


def test_round5_new_ops_plan_shapes(spark, sf_dir):
    """Round-5 additions keep their scale contracts: the deterministic
    sketches and linkage operators must stay equi-join/hash-agg only —
    no cartesian pair space, no nested loop; the bloom probe's word
    table and the count-min estimate sides must ride broadcast joins
    (the filter is KBs; shuffling the probe keys against it would be
    the regression)."""
    for name in ("hll_md5_distinct_orders", "ddsketch_price_quantiles",
                 "record_linkage_scores", "duplicate_span_fraction",
                 "training_mix_interleave", "user_event_sequences"):
        plan = plan_str(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    # the bloom query returns driver-collected stats (ExistingRDD), so
    # assert the probe-side join shape on a rebuilt pipeline: probe
    # positions joined to the packed word table must broadcast the
    # words, never shuffle the probe
    from messdb_spark.queries.sketches import _bf_pos_spark, _BF_K
    from messdb_spark.session import read_table
    li = read_table(spark, sf_dir, "lineitem")
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    pos = probe.select("k", F.expr(_bf_pos_spark("k", "0")).alias("pos"))
    words = (pos.select("pos").distinct()
             .groupBy(F.expr("shiftright(pos, 5)").alias("word"))
             .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                         "CAST(pos % 32 AS INT)))").alias("wv")))
    probe_join = pos.join(F.broadcast(words),
                          F.expr("shiftright(pos, 5)") == F.col("word"),
                          "left")
    plan = plan_str(probe_join)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_registers_bounded(spark, sf_dir):
    """The HLL register table must stay <= m rows per group regardless
    of input cardinality — the bounded-state property that lets the
    sketch replace countDistinct at 100 TB."""
    from messdb_spark.queries.sketches import _HLL_M
    out = QUERIES["hll_md5_distinct_orders"].fn(spark, sf_dir)
    for r in out.collect():
        assert 0 < r["n_buckets_hit"] <= _HLL_M
        assert 1 <= r["max_rho"] <= 53


def test_ddsketch_histogram_bounded(spark, sf_dir):
    """The quantile sketch's per-group bucket count is histogram-
    bounded (~32 per power of two), not data-bounded."""
    from pyspark.sql import functions as F
    from messdb_spark.session import read_table
    o = read_table(spark, sf_dir, "orders")
    c = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    shift = F.when(c < 32, F.lit(0)) \
             .otherwise(F.length(F.bin(c)) - 5).cast("int")
    sub = F.when(c < 32, c).otherwise(
        F.expr("shiftright(CAST(floor(o_totalprice * 100.0 + 0.5) AS "
               "BIGINT), length(bin(CAST(floor(o_totalprice * 100.0 "
               "+ 0.5) AS BIGINT))) - 5)"))
    n_buckets = (o.select("o_orderpriority", shift.alias("s"),
                          sub.alias("b")).distinct().count())
    # cents span < 2^31 => < 27 powers of two x 16 sub-buckets x groups
    assert n_buckets < 27 * 16 * 5


def test_bfs_cdc_mw_plan_shapes(spark, sf_dir):
    """Round-5 traversal/rank/CDC additions keep their scale contracts.

    bfs_min_hops / cdc_apply_tombstones materialize through
    localCheckpoint (loop lineage cuts), so the per-round join shapes
    are asserted on inline rebuilds of one round, the same move as the
    bloom probe test above."""
    from messdb_spark.operators.core import KeyedTable, apply_cdc
    from messdb_spark.session import read_table

    # BFS round: edges ⋈ frontier then anti-join vs visited must stay
    # hash joins — a nested-loop here is quadratic in the frontier
    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(F.col("l_orderkey").alias("src"),
                      F.col("l_suppkey").alias("dst"))
    frontier = edges.select(F.col("src")).distinct().limit(50)
    visited = frontier.withColumnRenamed("src", "node")
    reached = (edges.join(frontier, "src")
                    .select(F.col("dst").alias("node")).distinct()
                    .join(visited, "node", "left_anti"))
    plan = plan_str(reached)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # CDC apply: the netting fold carries a struct payload, so it is
    # sort-based (struct aggregation buffers aren't hash-aggregable) —
    # the property that matters at scale is that the PARTIAL max_by
    # runs map-side, upstream of the Exchange, so the shuffle moves one
    # netted row per (partition, key), never the raw op-log
    e = read_table(spark, sf_dir, "events")
    base = KeyedTable(
        e.select("user_id", "event_type", "value").filter(F.lit(False)),
        ("user_id",))
    oplog = e.select(
        "user_id",
        F.when(F.col("event_type") == "error", "delete")
         .otherwise("upsert").alias("op"),
        "event_type", "value",
        F.struct("ts", "event_id").alias("ord"))
    applied = apply_cdc(base, oplog, op_col="op", ord_col="ord")
    plan = plan_str(applied.df)
    assert "partial_max_by" in plan
    # the Exchange must carry the netted partial-agg rows (its input is
    # the partial max_by's extremum buffer), never the raw op-log
    import re
    exch = re.search(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert exch and "ExtremumOrdering" in exch.group(1), plan
    assert "CartesianProduct" not in plan

    # Mann-Whitney / KS: the rank/CDF window must run over the
    # per-(pair, cent) AGGREGATED relation (domain-bounded), never the
    # raw event rows — the aggregate has to appear upstream of the
    # Window in the plan
    for name in ("mannwhitney_value_shift", "ks_value_distance"):
        plan = plan_str(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "Window" in plan, name
        assert "HashAggregate" in plan, name

    # OLS: two cascaded hash aggs, no window, no sort, no cartesian
    plan = plan_str(QUERIES["ols_daily_revenue_trend"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_round6_corpus_stats_plan_shapes(spark, sf_dir):
    """Round-6 corpus statistics: no cartesian anywhere; the MMR
    candidate generation broadcasts the query side; entropy/Zipf stay
    partial-aggregated (vocab-bounded shuffles)."""
    for name in ("token_entropy_per_source", "zipf_token_rank_fit",
                 "keyword_extraction_rake", "ngram_novelty_scores"):
        p = plan_str(QUERIES[name].fn(spark, sf_dir), "simple")
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name

    # MMR's returned frame is a union of pinned picks (the loop frames
    # are localCheckpointed); assert the candidate-generation stage —
    # the only corpus-sized part — broadcasts the query side
    from messdb_spark.queries.similarity import _DOT, _MMR_NQ, _norm_col
    from messdb_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.withColumn("nrm", _norm_col("embedding"))
    q = (n.filter(F.col("vec_id") < _MMR_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"),
                  F.col("nrm").alias("q_nrm")))
    c = n.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"),
                 F.col("nrm").alias("c_nrm"))
    sims = (c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
             .select("query_id", "cand_id",
                     (F.expr(_DOT.format(a="q_emb", b="c_emb"))
                      / (F.col("q_nrm") * F.col("c_nrm"))).alias("sim")))
    p = plan_str(sims, "simple")
    assert "BroadcastNestedLoopJoin" in p      # corpus streams, q broadcast
    assert "CartesianProduct" not in p


def test_rfm_and_acf_fold_before_ranking(spark, sf_dir):
    """RFM ranks run on the per-customer aggregate (HashAggregate
    below the windows), and the ACF lag join is over the tiny daily
    series with the lag frame broadcast."""
    p = plan_str(QUERIES["rfm_customer_segments"].fn(spark, sf_dir))
    assert "HashAggregate" in p and "Window" in p
    p2 = plan_str(QUERIES["autocorrelation_daily_revenue"]
                  .fn(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in p2 or "BroadcastHashJoin" in p2
    assert "CartesianProduct" not in p2


def test_round7_new_ops_plan_shapes(spark, sf_dir):
    """Round-7 queries: no cartesian products anywhere; the MaxSim
    reranker and k-NN graph keep the corpus streaming (broadcast query
    side / id-only pair shuffles); the quality classifier is a single
    hash-agg pipeline with the weight array folded as a literal (no
    join for the weights); bootstrap's resample relation partial-
    aggregates before its only exchange."""
    for name in ("knn_graph_lsh", "colbert_maxsim_topk",
                 "quality_classifier_scores", "dp_noisy_counts",
                 "seasonal_dow_decomposition", "target_encoding_loo",
                 "randomized_response_rate", "train_eval_leakage_audit",
                 "bootstrap_ci_segment_spend"):
        p = plan_str(QUERIES[name].fn(spark, sf_dir), "simple")
        assert "CartesianProduct" not in p, name

    # MaxSim: the 10-query token matrix must broadcast (corpus never
    # shuffles for the join)
    p = plan_str(QUERIES["colbert_maxsim_topk"].fn(spark, sf_dir),
                 "simple")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # quality classifier: weights are a plan literal — exactly the
    # explode + two-level hash agg, no join operator at all
    p = plan_str(QUERIES["quality_classifier_scores"].fn(spark, sf_dir),
                 "simple")
    assert "Join" not in p
    assert "HashAggregate" in p
    # target encoding: segment stats and global mean broadcast back
    p = plan_str(QUERIES["target_encoding_loo"].fn(spark, sf_dir),
                 "simple")
    assert "BroadcastHashJoin" in p
    # leakage audit: the eval shingle set must semi-join (never an
    # inner-join blowup on shingle multiplicity)
    p = plan_str(QUERIES["train_eval_leakage_audit"].fn(spark, sf_dir),
                 "simple")
    assert "LeftSemi" in p


def test_exact_substring_plan_shape(spark, sf_dir):
    """ExactSubstr (round 9): the detection pass must shuffle position
    HASHES, never gram strings or a cartesian pair space — and the
    island merge must be a per-doc window, not a global sort."""
    from messdb_spark.queries.linkage import _exact_substring_spans

    spans, verified = _exact_substring_spans(spark, sf_dir)
    # detection phase (pre-checkpoint frame rides on __pre_pin__):
    # inline hashing — xxhash64(substring(...)) inside the projection
    # means only (doc_id, i, h) rows reach the first exchange
    det = plan_str(verified)
    assert "xxhash64" in det
    assert "CartesianProduct" not in det
    assert "BroadcastNestedLoopJoin" not in det
    # island merge is a doc-partitioned window, not a global ordering
    full = plan_str(spans)
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full
    assert "Window" in full
    assert "hashpartitioning(doc_id" in full


def test_anchor_sampling_plan_shape(spark, sf_dir):
    """Anchor-sampled ExactSubstr (round 9): anchor selection must be
    MAP-SIDE — built/filtered inside the row via array lambdas: no
    corpus-wide Window shuffle, no join; nothing position-sized leaves
    the stage until the (already 1/w-sampled) anchors do. The ONE
    exchange allowed is the r15 few-splits input rebalance
    (_spread_chunks — chunk rows, keyed by doc), which exists so the
    hashing stage is parallel when the scan is a single small file."""
    from messdb_spark.queries.linkage import _anchor_positions

    import re

    det = plan_str(_anchor_positions(spark, sf_dir))
    assert "Generate" in det                  # the anchor explode
    # every exchange must be the doc-keyed rebalance (it can print
    # twice: once live, once inside the InMemoryRelation's cached
    # plan); anything else — range/single-partition, or a partitioning
    # on a position-sized key — would be a real detection shuffle
    assert "rangepartitioning" not in det
    assert "SinglePartition" not in det
    keys = re.findall(r"hashpartitioning\((\w+)", det)
    assert all(k == "doc_id" for k in keys), keys
    assert "Window" not in det
    assert "Join" not in det
    assert "CartesianProduct" not in det
