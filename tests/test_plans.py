"""Physical-plan regression tests: pin the SCALE properties of the
declared queries — pushdown, pruning, broadcast joins, shuffle budgets —
so a plan regression fails here before it becomes a 100 TB incident.
Result correctness is covered by the oracle tests; these check the HOW.
"""

from __future__ import annotations

import k_means_clustering_via_map_reduce_spark.queries as Q
from k_means_clustering_via_map_reduce_spark.plans import (
    broadcast_hash_join_count,
    count_shuffles,
    pushed_filters,
    scan_read_schemas,
    whole_stage_codegen_spans,
)

Q.load_all()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = Q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p and "LessThanOrEqual" in p for p in pushed), pushed


def test_q1_column_pruning(spark, sf_dir):
    """Q1 touches 6 of lineitem's 16 columns; the scan must not read the
    rest (l_comment etc. are the bulk of the bytes)."""
    df = Q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    schemas = scan_read_schemas(df)
    assert schemas, "no parquet scan found"
    for s in schemas:
        assert "l_comment" not in s and "l_shipinstruct" not in s, s


def test_q1_shuffle_budget(spark, sf_dir):
    """Scan → partial agg → exchange → final agg → exchange (sort): the
    fact table is shuffled only as K-group partial aggregates."""
    df = Q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_q4_star_join_broadcasts_all_dims(spark, sf_dir):
    """orders/customer/nation/region must all broadcast: the lineitem
    fact table is never shuffled before aggregation."""
    df = Q.QUERIES["q4_star_join"](spark, sf_dir)
    assert broadcast_hash_join_count(df) == 4
    # agg exchange + sort exchange only — no join shuffles
    assert count_shuffles(df) <= 2


def test_q3_join_broadcasts_smaller_side(spark, sf_dir):
    df = Q.QUERIES["q3_join_agg"](spark, sf_dir)
    assert broadcast_hash_join_count(df) >= 1


def test_q6_semi_and_q7_anti_stay_broadcast(spark, sf_dir):
    for name in ("q6_semi_join", "q7_anti_join"):
        df = Q.QUERIES[name](spark, sf_dir)
        assert broadcast_hash_join_count(df) >= 1, name


def test_q8_topk_is_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then merge of K rows), never a global sort."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q8_top_k"](spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_q2_projection_prunes_scan(spark, sf_dir):
    df = Q.QUERIES["q2_filter_project"](spark, sf_dir)
    for s in scan_read_schemas(df):
        assert "o_comment" not in s and "o_clerk" not in s, s


def test_q17_dedup_single_shuffle(spark, sf_dir):
    """Exact dedup = groupBy(text): one hash exchange (plus the
    presentation sort)."""
    df = Q.QUERIES["q17_dedup_exact"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_d2_band_join_shuffles_no_arrays(spark, sf_dir):
    """The MinHash band self-join + candidate dedup must shuffle only
    scalar (doc_id, band_id, band_hash) rows — the shingle arrays ride
    along only in the post-dedup payload re-join. A fat array column in
    these exchanges is a bands× payload amplification at 100 TB."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _shingled,
        lsh_candidate_ids,
        minhash_signatures,
    )
    from k_means_clustering_via_map_reduce_spark.plans import (
        shuffled_array_columns,
    )

    ids = lsh_candidate_ids(minhash_signatures(_shingled(spark, sf_dir)))
    assert shuffled_array_columns(ids) == []


def test_s2_band_join_shuffles_no_arrays(spark, sf_dir):
    """Same pin for SRP-LSH: the band join and candidate dedup carry ids
    and band keys only; the 64-dim vectors never enter a hash shuffle."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.functions.vector import (
        vector_norm,
    )
    from k_means_clustering_via_map_reduce_spark.operators.similarity import (
        TOPK_N_QUERIES,
        srp_candidate_ids,
    )
    from k_means_clustering_via_map_reduce_spark.plans import (
        shuffled_array_columns,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    assert shuffled_array_columns(srp_candidate_ids(e, q)) == []


def test_relational_queries_use_codegen(spark, sf_dir):
    """Every pure-relational query should execute inside whole-stage
    codegen spans (no interpreted row loops in the hot path)."""
    for name in ("q1_pricing_summary", "q3_join_agg", "q10_window_rank"):
        df = Q.QUERIES[name](spark, sf_dir)
        df.collect()  # AQE finalizes (and codegens) stages on execution
        assert whole_stage_codegen_spans(df) >= 1, name


def test_codegen_ledger_metric_cannot_silently_zero(spark, sf_dir):
    """The PLANS ledger's codegen_stages column must report >=1 for a
    known-codegen query WITHOUT executing it — the static AQE-off count
    plan_snapshot.py records. PLANS_r05-r11 carried a dead 0 here
    because "formatted" explain never prints the literal
    WholeStageCodegen (VERDICT r11 "What's wrong" #1)."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        codegen_stage_count,
    )

    df = Q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    n = codegen_stage_count(df)  # no action performed
    assert n >= 1, f"static codegen count must be nonzero, got {n}"
    # and the helper restored the AQE conf it toggled
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_t9_broadcasts_eval_grams(spark, sf_dir):
    """Decontamination must broadcast the (small) benchmark gram set —
    hash-shuffling the exploded 100 TB corpus on the gram key instead
    would be the classic scale killer for this operator."""
    df = Q.QUERIES["t9_decontaminate"](spark, sf_dir)
    assert broadcast_hash_join_count(df) >= 1
    # Budget: 2 test-scale spread() fan-outs + the tiny eval-side
    # distinct + the per-doc count agg + the presentation sort. The
    # corpus-side gram match itself must add NO exchange.
    assert count_shuffles(df) <= 5


def test_t11_pii_redact_is_narrow(spark, sf_dir):
    """The scrub is a pure per-row projection: nothing but the
    test-scale spread() fan-out and the final presentation sort may
    exchange."""
    df = Q.QUERIES["t11_pii_redact"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_f3_scan_is_partition_pruned(spark, sf_dir):
    """The event_type IN-filter must prune at the DIRECTORY level of the
    partitionBy layout (PartitionFilters on the scan), not read all
    partitions and filter rows — at 100 TB this is the difference
    between scanning the 2 selected partitions and the whole store."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        partition_filters,
    )

    df = Q.QUERIES["f3_partition_pruned_scan"](spark, sf_dir)
    parts = partition_filters(df)
    assert any("event_type" in p and "IN" in p.upper() for p in parts), parts
    # The partition column never reaches row-level pushdown: it does not
    # exist inside the data files.
    assert not any("event_type" in p for p in pushed_filters(df))


def test_q31_single_window_shuffle(spark, sf_dir):
    """All three distribution functions share one window spec: one hash
    exchange on o_custkey + per-partition sort, then only the final
    presentation sort — no per-function re-shuffle."""
    df = Q.QUERIES["q31_window_distribution"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_q32_grouping_sets_single_aggregate(spark, sf_dir):
    """Grouping sets expand to one Expand + a single hash aggregate:
    one agg exchange + the presentation sort, not one shuffle per set."""
    df = Q.QUERIES["q32_grouping_sets"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_p3_packing_shuffle_budget(spark, sf_dir):
    """Running-offset window (hash exchange on lang + sort) feeding the
    manifest agg: the agg reuses the window's partitioning (lang is a
    prefix of the agg key), so only the presentation sort adds an
    exchange."""
    df = Q.QUERIES["p3_token_packing"](spark, sf_dir)
    assert count_shuffles(df) <= 3


def test_q33_spine_join_is_broadcast(spark, sf_dir):
    """The dense hour × type spine is tiny relative to the events it
    fills; it must broadcast into the left join against the hourly
    aggregate — hash-shuffling the aggregate against a spine would add
    a full exchange for no reason. Budget: hourly agg + types distinct
    + ffill window + presentation sort."""
    df = Q.QUERIES["q33_gap_fill"](spark, sf_dir)
    assert broadcast_hash_join_count(df) >= 1
    assert count_shuffles(df) <= 4


def test_s4_centroids_shuffle_budget(spark, sf_dir):
    """posexplode fans out BEFORE the agg, but partial aggregation must
    collapse it map-side: the only exchanges are the test-scale spread
    fan-out, the (label, pos) agg, and the presentation sort."""
    df = Q.QUERIES["s4_label_centroids"](spark, sf_dir)
    assert count_shuffles(df) <= 3


def test_p4_quota_shuffle_budget(spark, sf_dir):
    """Quality scoring is narrow; the quota is one window shuffle on
    source (+ spread fan-out + presentation sort)."""
    df = Q.QUERIES["p4_source_quota"](spark, sf_dir)
    assert count_shuffles(df) <= 3


def test_q34_salted_exchange_actually_executes(spark, sf_dir):
    """The SHUFFLE_HASH hint must hold: a broadcast would skip the
    salted exchange and make the q34 correctness check vacuous. Budget:
    both join-side exchanges on (c_custkey, salt) + agg + sort."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q34_salted_join"](spark, sf_dir)
    assert broadcast_hash_join_count(df) == 0
    assert "ShuffledHashJoin" in physical_plan(df)
    assert count_shuffles(df) <= 4


def test_d6_cell_join_hash_exchange_path(spark, sf_dir):
    """At fixture scale AQE broadcasts d6's cell self-join (measured in
    BASELINE.md §scale: shuffle rows ≈ 0); beyond the broadcast
    threshold the design claims ONE hash exchange on the cell id with
    the vectors riding co-partitioned. Force the at-scale regime by
    disabling auto-broadcast and pin that plan — and that the result
    set is identical on both paths."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        semantic_pairs,
    )
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    broadcast_rows = semantic_pairs(e).collect()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced = semantic_pairs(e)
        plan = physical_plan(forced)
        assert "BroadcastHashJoin" not in plan
        assert "hashpartitioning(cell" in plan, plan[:2000]
        forced_rows = forced.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert sorted(map(tuple, forced_rows)) == sorted(
        map(tuple, broadcast_rows)
    )


def test_f5_scan_is_dynamically_pruned(spark, sf_dir):
    """f5's partition set is only discoverable by RUNNING the dim-side
    tier filter, so the fact scan must carry a dynamicpruningexpression
    in its PartitionFilters (the broadcast-reuse DPP subquery) — static
    pruning is impossible and reading all partitions then filtering
    post-join would defeat the layout at 100 TB."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        partition_filters,
    )

    df = Q.QUERIES["f5_dpp_scan"](spark, sf_dir)
    parts = partition_filters(df)
    assert any("dynamicpruning" in p.lower() for p in parts), parts


def test_q43_join_is_bloom_prefiltered(spark, sf_dir):
    """The runtime Bloom filter must be injected: a bloom_filter_agg on
    the filtered orders side and a might_contain pre-filter on the
    lineitem side, dropping non-joining fact rows before the shuffle.
    Also pins that the conf overrides used to compile q43's plan do NOT
    leak: a plain join planned afterwards has no bloom filter."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    df = Q.QUERIES["q43_bloom_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "might_contain" in plan, plan[:2000]
    assert "bloom_filter_agg" in plan, plan[:2000]

    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    other = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderstatus"
    ).count()
    assert "might_contain" not in physical_plan(other)


def test_decorrelation_family_plans_real_joins(spark, sf_dir):
    """Q44/Q46's IN-over-HAVING and Q47's NOT EXISTS must decorrelate
    into semi/anti hash joins — never a nested-loop over the fact
    table. A BroadcastNestedLoopJoin in any of these is the
    O(n·m) plan that dies at 100 TB (q42's null-aware NOT IN arm is
    the one place that cost is semantically forced, and is pinned
    THERE)."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    for name, marker in [
        ("q44_large_volume_orders", "LeftSemi"),
        ("q46_small_part_suppliers", "LeftSemi"),
        ("q47_dormant_high_balance", "LeftAnti"),
    ]:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        assert marker in plan, (name, marker, plan)


def test_q45_correlated_avg_decorrelates_to_aggregate_join(spark, sf_dir):
    """Q45's per-part scalar subquery must plan as ONE per-key aggregate
    joined back on l_partkey — not a per-row re-aggregation."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q45_small_lot_revenue"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_t15_gopher_rules_is_one_narrow_pass(spark, sf_dir):
    """T15's four rules must evaluate array-local in the scan stage: the
    plan carries no Python UDF and shuffles only per-source counter
    state (one partial-agg exchange + the presentation sort)."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["t15_gopher_rules"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert count_shuffles(df) <= 3, physical_plan(df)


def test_t15_every_rule_is_live(spark, sf_dir):
    """Each declared Gopher rule must both pass and fail somewhere on
    the fixtures — a rule that cannot fail pins nothing (the paper's
    symbol/bullet rules are excluded for exactly that reason)."""
    rows = Q.QUERIES["t15_gopher_rules"](spark, sf_dir).collect()
    n_docs = sum(r.n_docs for r in rows)
    for col in ("n_wordcount", "n_meanlen", "n_stopwords", "n_repetition",
                "n_pass_all"):
        passed = sum(r[col] for r in rows)
        assert 0 < passed < n_docs, (col, passed, n_docs)


def test_k13_assignment_is_literal_broadcast(spark, sf_dir):
    """K13's weight pass must assign points to candidates via the
    literal-centroid expression — no join against a candidate relation,
    no cartesian; the only join in the final plan is the K-row
    meta-to-weights stitch."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["k13_kmeanspp_init"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # Formatted explain names each node twice (tree + details), so one
    # physical join = two mentions.
    joins = sum(plan.count(j) for j in
                ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    assert joins <= 2, plan


def test_d8_fuzzy_join_is_key_blocked(spark, sf_dir):
    """D8 must join on the deletion KEY (hash/broadcast equi join) —
    never a levenshtein-theta cross product."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["d8_fuzzy_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q51_lateral_decorrelates_to_window_join(spark, sf_dir):
    """Q51's correlated LATERAL (ORDER BY + LIMIT per nation) must plan
    as a ranked-window + single equi-join — never a per-outer-row
    re-execution (nested-loop) of the subquery."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q51_lateral_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_q49_recursive_cte_runs_on_union_loop(spark, sf_dir):
    """Q49 must execute on Spark 4's recursive-union operator
    (UnionLoop) — the engine-managed fixpoint loop — not on some
    unrolled approximation."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q49_recursive_cte"](spark, sf_dir)
    assert "UnionLoop" in physical_plan(df)


def test_t16_sql_udf_inlines_to_jvm(spark, sf_dir):
    """The SQL UDF tier's whole value is that Catalyst inlines the
    function body into plain JVM expressions: the plan must contain NO
    Python evaluation node (BatchEvalPython / ArrowEvalPython /
    MapInPandas) and exactly the q18-style agg exchanges."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        count_shuffles,
        physical_plan,
    )

    df = Q.QUERIES["t16_sql_udf_score"](spark, sf_dir)
    plan = physical_plan(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in plan
    # spread() fan-out + partial/final agg exchange + presentation sort.
    assert count_shuffles(df) <= 3


def test_q54_collated_group_single_exchange(spark, sf_dir):
    """Collation-aware grouping must hash-partition on the collated key
    directly — one agg exchange plus the presentation sort, exactly
    like the uncollated q15 shape."""
    from k_means_clustering_via_map_reduce_spark.plans import count_shuffles

    df = Q.QUERIES["q54_collation_groupby"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_q52_decimal_sums_stay_partial_final(spark, sf_dir):
    """Decimal exactness must not cost the partial-agg split: two
    HashAggregates around one exchange, no sort-based fallback."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        count_shuffles,
        physical_plan,
    )

    df = Q.QUERIES["q52_decimal_money"](spark, sf_dir)
    assert physical_plan(df).count("HashAggregate") >= 2
    assert count_shuffles(df) <= 2


def test_p6_shared_shard_exchange(spark, sf_dir):
    """Both p6 window specs partition on shard: ONE hash exchange for
    the ranked head + shard totals (plus spread fan-out and the
    presentation sort)."""
    from k_means_clustering_via_map_reduce_spark.plans import count_shuffles

    df = Q.QUERIES["p6_epoch_shuffle"](spark, sf_dir)
    assert count_shuffles(df) <= 3


def test_f12_bucketed_join_no_join_exchange(spark, sf_dir):
    """Both f12 sides read co-located buckets: the SortMergeJoin must
    have NO Exchange beneath it (the only shuffles are the aggregate
    and the presentation sort), and the scans must report the bucketed
    layout."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        count_shuffles,
        physical_plan,
    )

    df = Q.QUERIES["f12_bucketed_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert count_shuffles(df) <= 2


def test_q55_fills_share_one_window_exchange(spark, sf_dir):
    """Forward and backward fill partition+order identically: one
    user_id exchange plus the presentation sort."""
    from k_means_clustering_via_map_reduce_spark.plans import count_shuffles

    df = Q.QUERIES["q55_ignore_nulls_nav"](spark, sf_dir)
    assert count_shuffles(df) <= 2


def test_q59_null_safe_join_stays_hash_joinable(spark, sf_dir):
    """`<=>` must plan as a HASH join (broadcast or shuffled) — the
    null-safe predicate is an equi-key, not a theta condition; a
    BroadcastNestedLoopJoin here would be the quadratic trap the
    docstring rules out."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    plan = physical_plan(Q.QUERIES["q59_null_safe_join"](spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_d9_incremental_probe_never_cartesian(spark, sf_dir):
    """The batch-vs-corpus membership probe is a keyed semi join on the
    content hash — no pair space, no corpus self-join."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    plan = physical_plan(Q.QUERIES["d9_incremental_dedup"](spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_q62_cyclic_join_pushes_date_and_broadcasts_dims(spark, sf_dir):
    """TPC-H Q5 shape: the order-year range reaches the orders scan,
    every dim side broadcasts (at fixture scale even customer), and the
    fact table shuffles at most twice (orders⋈lineitem + agg) — the
    cycle-closing c_nationkey = s_nationkey edge must NOT turn into a
    nation-pair blowup (no nested-loop anywhere)."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q62_local_supplier_volume"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("o_orderdate" in p and "GreaterThanOrEqual" in p for p in pushed), pushed
    assert broadcast_hash_join_count(df) >= 3
    assert count_shuffles(df) <= 2
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_t19_containment_never_cartesian(spark, sf_dir):
    """The directional containment join is postings-blocked on
    (lang, shingle) — an equi hash join, never a pair-space scan."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    plan = physical_plan(Q.QUERIES["t19_ngram_containment"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_d10_dup_span_never_cartesian(spark, sf_dir):
    """Both d10 stages key on the gram — doc pairs never materialize."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    plan = physical_plan(Q.QUERIES["d10_dup_span_profile"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_q64_double_correlation_is_semi_plus_anti(spark, sf_dir):
    """The Q21 shape must run as ONE semi + ONE anti hash join over
    single-pass lineitem reductions — no nested loop, no per-row
    rescans."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q64_blamed_supplier"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan[:800]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_q65_correlated_min_over_join_decorrelates(spark, sf_dir):
    """The TPC-H Q2 shape must decorrelate: ONE per-partkey min
    aggregate over the region-restricted join (a partial+final
    HashAggregate pair), equi-joined back to the outer flow — never a
    per-outer-row rescan (no nested loop / cartesian). Dims broadcast
    on both arms, and the p_size / r_name filters reach the scans."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q65_min_cost_supplier"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "partial_min" in plan, plan[:800]  # decorrelated aggregate
    assert broadcast_hash_join_count(df) >= 6  # 3 dims x both arms
    pushed = pushed_filters(df)
    assert any("p_size" in p for p in pushed), pushed
    assert any("r_name" in p for p in pushed), pushed


def test_f19_partitioned_table_prunes_on_read(spark, sf_dir):
    """The write-side layout f19 creates must pay off on read: a
    source-filtered scan of the partitioned table prunes at PARTITION
    level (the predicate appears under PartitionFilters, not as a data
    filter over all files)."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    Q.QUERIES["f19_dynamic_partition_overwrite"](spark, sf_dir).collect()
    df = spark.table("f19_docs_part").filter(F.col("source") == "src3")
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "src3" in pf, pf


def test_q66_scalar_over_cte_never_per_row(spark, sf_dir):
    """The Q15 shape's quadratic failure mode — recomputing the
    quarter aggregation per outer row — must not appear: no nested
    loop / cartesian, a bounded shuffle budget (two aggregation
    passes + broadcast join + sort), and the shipdate range pushed to
    the lineitem scans."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        count_shuffles,
        physical_plan,
    )

    df = Q.QUERIES["q66_top_supplier_quarter"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert count_shuffles(df) <= 4
    pushed = pushed_filters(df)
    assert any(
        "l_shipdate" in p and "GreaterThanOrEqual" in p for p in pushed
    ), pushed


def test_q67_fraction_threshold_is_scalar_not_rescan(spark, sf_dir):
    """The Q11 shape's global-total threshold must collapse to a
    scalar subquery literal filter over ONE per-partkey aggregate —
    never a per-row recomputation (nested loop / cartesian). The
    nationkey IN-list reaches the supplier scan and the dim
    broadcasts."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q67_top_value_parts"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Subquery" in plan, plan[:800]
    assert broadcast_hash_join_count(df) >= 1
    pushed = pushed_filters(df)
    assert any("s_nationkey" in p and "In(" in p for p in pushed), pushed


def test_q68_outer_join_pushes_residual_and_stacks_aggs(spark, sf_dir):
    """Q13 shape: the ON-clause priority predicate must be pushed to
    the orders SCAN (it only affects match-ness, never which customers
    survive the outer join), the join must stay LeftOuter (the
    zero-order bucket is load-bearing), and both aggregation levels
    must run partial+final."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q68_order_count_distribution"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftOuter" in plan
    pushed = pushed_filters(df)
    assert any("o_orderpriority" in p and "Not(" in p for p in pushed), pushed
    assert "partial_count" in plan


def test_q69_disjunction_pushes_to_both_scans(spark, sf_dir):
    """Q19 shape: Catalyst must extract the single-sided disjunctions
    and push them below the join — the part scan sees the brand/size
    OR, the lineitem scan sees the quantity OR — leaving the full OR
    as the join residual over the pre-filtered match set."""
    df = Q.QUERIES["q69_disjunctive_filter_join"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("p_brand" in p and "Or(" in p for p in pushed), pushed
    assert any("l_quantity" in p and "Or(" in p for p in pushed), pushed
    assert broadcast_hash_join_count(df) >= 1


def test_q70_dual_role_dim_pushes_pair_to_both_scans(spark, sf_dir):
    """Q7 shape: the nation dim appears under two roles; each role's
    scan must receive the extracted n_name IN (N1, N2) disjunction,
    every join must broadcast (5 BHJs: orders, customer, supplier,
    nation x2), and the shipdate range must reach the fact scan."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q70_nation_pair_volume"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert broadcast_hash_join_count(df) == 5
    pushed = pushed_filters(df)
    nation_ors = [p for p in pushed if "n_name" in p and "Or(" in p]
    assert len(nation_ors) >= 2, pushed
    assert any(
        "l_shipdate" in p and "GreaterThanOrEqual" in p for p in pushed
    ), pushed


def test_q75_not_in_plans_null_aware_anti_join(spark, sf_dir):
    """Q16's NOT IN over the negative-balance subquery must plan as a
    single null-aware BROADCAST ANTI hash join (SPARK-32290) — never a
    nested-loop / per-row subquery rescan, which is the O(n·m) plan
    that dies at 100 TB. All three negated/set part filters must reach
    the part scan so the broadcast build shrinks pre-join."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q75_supplier_variety"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan, plan[:800]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    pushed = pushed_filters(df)
    assert any("p_size" in p and "In(" in p for p in pushed), pushed
    assert any("p_brand" in p and "Not(" in p for p in pushed), pushed
    # distinct agg = partial-distinct then final count (two agg levels
    # beyond the grouping pair), all hash-based
    assert plan.count("HashAggregate") >= 4, plan[:800]


def test_q71_market_share_is_one_pass_all_dims_broadcast(spark, sf_dir):
    """Q8's ratio must be ONE aggregation pass (numerator as a CASE
    accumulator — no second scan or self-join), over a join graph
    where every dimension broadcasts (7 BHJs: part, orders, customer,
    nation x2, region, supplier at fixture scale) and the region /
    type / orderdate filters reach their scans."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q71_market_share"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert broadcast_hash_join_count(df) == 7
    # one partial+final aggregate pair, not a revenue/share join
    # (formatted explain lists each node twice: tree + detail section)
    assert plan.count("HashAggregate") == 4, plan[:800]
    assert plan.count("partial_sum") >= 1, plan[:800]
    pushed = pushed_filters(df)
    assert any("r_name" in p for p in pushed), pushed
    assert any("p_type" in p for p in pushed), pushed
    assert any(
        "o_orderdate" in p and "GreaterThanOrEqual" in p for p in pushed
    ), pushed


def test_q76_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    """Q3's LIMIT 10 must compose with the ORDER BY into
    TakeOrderedAndProject (per-partition local top-k, driver merge of
    k·P rows) — a global Sort of the whole aggregate before the limit
    is the plan that materializes the full group space at 100 TB. The
    segment dim must broadcast and both straddle dates must push."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q76_shipping_priority"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert broadcast_hash_join_count(df) >= 1
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p and "GreaterThan" in p for p in pushed), pushed
    assert any("o_orderdate" in p and "LessThan" in p for p in pushed), pushed
    assert any("c_mktsegment" in p for p in pushed), pushed


def test_q77_exists_is_semi_join_with_residual(spark, sf_dir):
    """Q4's EXISTS must plan as ONE left-semi hash join on l_orderkey
    carrying the cross-table date comparison as a join residual —
    never a nested-loop or a distinct-aggregate of lineitem. The
    quarter range must prune the orders scan."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q77_order_priority_check"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan, plan[:800]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    pushed = pushed_filters(df)
    assert any(
        "o_orderdate" in p and "GreaterThanOrEqual" in p for p in pushed
    ), pushed


def test_q78_scan_bound_all_filters_pushed_four_columns(spark, sf_dir):
    """Q6 is the scan face: all three predicates must reach
    PushedFilters (shipdate range, discount band, quantity cap) and
    the ReadSchema must carry exactly the 4 referenced columns — a
    scan that reads more IS the regression at 100 TB."""
    df = Q.QUERIES["q78_forecast_revenue"](spark, sf_dir)
    pushed = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(col in p for p in pushed), (col, pushed)
    schemas = scan_read_schemas(df)
    assert schemas
    for s in schemas:
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
            assert col in s, (col, s)
        assert "l_partkey" not in s and "l_returnflag" not in s, s
    assert count_shuffles(df) <= 1


def test_q79_aggregates_before_wide_dims_attach(spark, sf_dir):
    """Q10's shuffle must carry (custkey, revenue) partials only — the
    aggregate runs BEFORE customer/nation attach, so c_name/n_name
    strings never ride the exchange; the dims broadcast onto the
    20-row-bound result and the top-k is TakeOrderedAndProject."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q79_returned_item_report"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    # customer + nation always broadcast; at fixture scale the
    # quarter-pruned orders side broadcasts too (3rd BHJ) — at 100 TB
    # it would shuffle, but the dims stay broadcast either way
    assert broadcast_hash_join_count(df) >= 2
    # one partial+final pair for the per-custkey sum; the joins add none
    assert count_shuffles(df) <= 1, plan[:800]
    pushed = pushed_filters(df)
    assert any("l_returnflag" in p for p in pushed), pushed


def test_q80_is_explode_shaped_not_windowed(spark, sf_dir):
    """The trailing-distinct plan must be the bounded contribution
    explode: no Window node anywhere (Spark cannot window a DISTINCT,
    and a rank-based workaround would be a global sort), and a Generate
    (explode) node present; the final join of two day-keyed aggregates
    is broadcast (day cardinality is tiny)."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q80_trailing_distinct_users"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "Generate" in plan, plan
    assert broadcast_hash_join_count(df) >= 1


def test_d12_has_no_cartesian_and_broadcasts_lang_counts(spark, sf_dir):
    """The weighted pair join must stay an equi-join on (lang, shingle)
    — never a nested-loop — and the 5-row per-lang doc counts attach
    by broadcast."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["d12_tfidf_cosine_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert broadcast_hash_join_count(df) >= 1


def test_f25_scan_reads_only_kept_files(spark, sf_dir):
    """The z-order read must plan over the pruned file list only: both
    probe predicates still push to the scan (defense in depth below the
    manifest prune)."""
    df = Q.QUERIES["f25_zorder_skipping_read"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("doc_id" in p for p in pushed), pushed
    assert any("n_chars" in p for p in pushed), pushed


def test_q94_single_window_exchange_on_custkey(spark, sf_dir):
    """Q94's running total, classification, and rollup ride ONE
    exchange on o_custkey plus the final-agg exchange — a plan that
    re-shuffles per stage would double the 100 TB exchange bill."""
    df = Q.QUERIES["q94_fifo_allocation"](spark, sf_dir)
    assert count_shuffles(df) <= 3  # window + final agg + sort


def test_q96_profile_is_one_scan(spark, sf_dir):
    """Q96 profiles four columns in ONE pass: exactly one parquet scan
    of lineitem (the naive per-column loop reads the table four
    times)."""
    df = Q.QUERIES["q96_numeric_profile"](spark, sf_dir)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1, schemas
    # and the melt must not widen the scan beyond the profiled columns
    assert "l_comment" not in schemas[0] and "l_orderkey" not in schemas[0]


def test_q97_window_runs_over_compressed_domain(spark, sf_dir):
    """Q97 aggregates to the (group, value) domain BEFORE the window:
    the plan must show a partial/final aggregate below the window sort
    — the compression that keeps a weighted quantile tractable on raw
    100 TB rows."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q97_weighted_median"](spark, sf_dir)
    plan = physical_plan(df)
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= agg_pos < win_pos, plan[:500]


def test_q93_sweep_is_day_partitioned_not_global(spark, sf_dir):
    """Q93's running boundary sum partitions by day — the plan's
    window sort keys must include the day key, never a global
    single-partition order."""
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    df = Q.QUERIES["q93_peak_concurrency"](spark, sf_dir)
    plan = physical_plan(df)
    assert "partitionBy" not in plan or True  # textual form varies
    # the give-away of a global sweep is a SinglePartition exchange
    # feeding a Window; assert none exists
    import re

    assert not re.search(
        r"Exchange SinglePartition[^\n]*\n[^\n]*Window", plan
    ), plan[:800]


def test_s12_pairs_join_is_broadcast_grid(spark, sf_dir):
    """S12's candidate generation joins postings through the broadcast
    admissible-cell-pair table — the corpus must never cross-join
    itself."""
    df = Q.QUERIES["s12_global_1nn"](spark, sf_dir)
    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan[:500]


def test_s10_assign_udf_runs_once(spark, sf_dir):
    """The r13 cell-join checkpoint: s10's final plan must carry NO
    residual Python-eval node — the cosine cell-assign UDF runs exactly
    once inside the checkpointed frame, which all three consumers
    (radii collect + both self-join sides) then read. Before the
    checkpoint the pushed join-key constraints duplicated the UDF into
    8 ArrowEvalPython nodes (plans/r13/s10_..._before.txt)."""
    from k_means_clustering_via_map_reduce_spark.plans import (
        count_shuffles,
        physical_plan,
    )

    df = Q.QUERIES["s10_radius_selfjoin_profile"](spark, sf_dir)
    plan = physical_plan(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan[:500]
    # post-checkpoint shape: profile agg + final-join + presentation
    # sort exchanges only (the assign pass lives in the checkpoint).
    assert count_shuffles(df) <= 3, physical_plan(df)
