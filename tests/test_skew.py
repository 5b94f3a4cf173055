"""salted_join must be result-identical to the plain join and actually
re-key the shuffle on (join keys, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.skew import salted_join
from k_means_clustering_via_map_reduce_spark.sources import load_table


def _sorted_rows(df, keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_salted_inner_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "inner"
    ).select("o_orderkey", "o_custkey", "c_mktsegment")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        on=["c_custkey"],
        salt=8,
    ).select(
        "o_orderkey", F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    assert _sorted_rows(salted, ["o_orderkey"]) == _sorted_rows(
        plain, ["o_orderkey"]
    )


def test_salted_join_survives_pathological_key(spark):
    """A single hot key (80% of probe rows) still joins correctly and the
    shuffle is keyed on (key, salt) — the hot key spreads across salt
    sub-partitions instead of one task."""
    hot = spark.range(10_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = salted_join(hot, dim, on=["k"], salt=8)
    assert out.count() == 10_000
    got = out.filter(F.col("k") == 7).select("v").distinct().collect()
    assert [r["v"] for r in got] == [14]

    from k_means_clustering_via_map_reduce_spark.plans import physical_plan

    plan = physical_plan(salted_join(hot, dim, on=["k"], salt=8))
    assert "__salt" in plan, "salt key absent from the join plan"


def test_salted_join_spreads_duplicates_via_id_col(spark):
    """Fully-duplicated probe rows (identical in every payload column —
    the pathological skew shape) scatter across salt values when a
    stable surrogate id is provided; map-typed payload columns must not
    break the salt."""
    dup = spark.range(4_000).select(
        F.col("id").alias("rid"),
        F.lit(7).alias("k"),
        F.lit("same").alias("payload"),
        F.create_map(F.lit("a"), F.lit(1)).alias("m"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = salted_join(dup, dim, on=["k"], salt=8, probe_id_col="rid")
    assert out.count() == 4_000
    # Reconstruct the salt the same way the operator does and check the
    # duplicates actually use >1 salt value.
    salts = (
        dup.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("rid")), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts > 1, "id-salted duplicate rows still collapse onto one salt"


def test_salted_join_default_salt_is_value_pure(spark):
    """Without probe_id_col the salt is a pure function of row values:
    recomputing it twice (fresh lineage each time) yields identical
    assignments, and duplicate rows — which share values — share a salt.
    This is the retry-safety contract (no positional/nondeterministic
    input to the salt)."""
    probe = spark.range(2_000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") % 7).alias("payload")
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    a = salted_join(probe, dim, on=["k"], salt=8)
    b = salted_join(probe, dim, on=["k"], salt=8)
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b
    assert a.count() == 2_000
    # identical (k, payload) rows map to identical salts by construction
    n_distinct = probe.distinct().count()
    salts = (
        probe.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col("k"), F.col("payload")), F.lit(8)
            ).cast("int"),
        )
        .select("k", "payload", "__salt")
        .distinct()
        .count()
    )
    assert salts == n_distinct, "salt is not a pure function of row values"


def test_salted_left_join_preserves_unmatched(spark):
    probe = spark.range(100).select(F.col("id").alias("k"))
    build = spark.range(50).select(
        F.col("id").alias("k"), F.lit("hit").alias("tag")
    )
    out = salted_join(probe, build, on=["k"], how="left", salt=4)
    assert out.count() == 100
    assert out.filter(F.col("tag").isNull()).count() == 50
