"""The declared relational query surface (SURVEY.md §2.3, Q1-Q18).

The reference implements none of this directly — its MapReduce substrate
(scan → partition → shuffle → group → aggregate → sink, master.py:215-258)
*implies* these capabilities, and the engine contract (BASELINE.json north
star) requires them as a general relational surface. Every query here is:

- a declarative DataFrame build (Catalyst owns pushdown/pruning/join
  strategy; zero hand scheduling — SURVEY.md §4),
- deterministic: total ORDER BY on a unique key, floats rounded to 4
  decimals (the reference's own sink precision, master.py:266),
- paired with an ANSI-SQL DuckDB oracle with IDENTICAL column names and
  types (int-valued derived columns cast to bigint on the Spark side to
  match DuckDB's BIGINT).

Registry: ``QUERIES[name](spark, sf_dir) -> DataFrame`` and
``ORACLE_SQL[name]``; extension operators (operators/*) register here too.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k_means_clustering_via_map_reduce_spark.session import configure
from k_means_clustering_via_map_reduce_spark.sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def staging_key(sf_dir: str, table: str) -> tuple[str, float]:
    """Cache key for process-lifetime staged copies (CSV/JSONL/ORC/
    partitioned/streaming stagings): (sf_dir, source parquet mtime), so
    an in-process rewrite of the source table invalidates the staged
    copy instead of serving stale data. Superseded entries' staging
    dirs are reclaimed by their TemporaryDirectory finalizers."""
    import os as _os

    path = _os.path.join(sf_dir, f"{table}.parquet")
    try:
        mtime = _os.path.getmtime(path)
    except OSError:
        mtime = 0.0
    return (sf_dir, mtime)


def load_all() -> None:
    """Import every module that registers query-surface entries."""
    import k_means_clustering_via_map_reduce_spark.kmeans  # noqa: F401
    import k_means_clustering_via_map_reduce_spark.operators  # noqa: F401
    import k_means_clustering_via_map_reduce_spark.sources.python_source  # noqa: F401
    import k_means_clustering_via_map_reduce_spark.streaming  # noqa: F401


def query(name: str, oracle: str | None = None):
    """Register a query builder; wraps it so externally-built sessions
    (the verify driver's) get engine confs applied first."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return wrapped

    return deco


def r4(c) -> F.Column:
    return F.round(c, 4)


# --------------------------------------------------------------------------
# Q1 — pricing summary: scan + filter + hash agg + sort.
# Engine form of the reference's only agg pattern (grouped mean,
# reducer.py:116-132) widened to sum/avg/count with partial+final agg from
# Catalyst (SURVEY.md O11/O12).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                            AS sum_qty,
           round(sum(l_extendedprice), 4)                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)    AS sum_disc_price,
           round(avg(l_quantity), 4)                            AS avg_qty,
           round(avg(l_extendedprice), 4)                       AS avg_price,
           round(avg(l_discount), 4)                            AS avg_disc,
           count(*)                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q2 — projection + filter + sort + limit (σ/π the reference lacks, §2.2).
# --------------------------------------------------------------------------
@query(
    "q2_filter_project",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 100000
    ORDER BY o_orderkey LIMIT 100
    """,
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q3 — inner equi-join + agg. The closest reference analogue is the
# broadcast-centroid × points dataflow (O4+O6); here a real hash join.
# --------------------------------------------------------------------------
@query(
    "q3_join_agg",
    oracle="""
    SELECT c_mktsegment, count(*) AS order_count,
           round(sum(o_totalprice), 4) AS total_price
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            r4(F.sum("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q4 — 5-way star join. Dims are explicitly broadcast (the 100 TB plan:
# fact table never shuffles for dim joins; AQE confirms at runtime).
# --------------------------------------------------------------------------
@query(
    "q4_star_join",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q5 — left outer join + IS NULL (customers with no qualifying order).
# The right side is filtered BEFORE the join so the result is non-empty at
# every test scale factor — a 0-row match is a vacuous correctness signal
# for outer-null logic.
# --------------------------------------------------------------------------
@query(
    "q5_left_join_null",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer LEFT JOIN (
        SELECT * FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 150000
    ) o ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL
    ORDER BY c_custkey
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q6 — left SEMI join (EXISTS).
# --------------------------------------------------------------------------
@query(
    "q6_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q7 — left ANTI join (NOT EXISTS). The right side is filtered to a
# quantity slice so the anti-join is non-vacuous at every test scale
# factor (every part appears in lineitem, but not at quantity > 45).
# --------------------------------------------------------------------------
@query(
    "q7_anti_join",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity > 45)
    ORDER BY p_partkey
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Q8 — top-k: Spark plans TakeOrderedAndProject (no global sort at scale).
# --------------------------------------------------------------------------
@query(
    "q8_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q9 — distinct aggregate.
# --------------------------------------------------------------------------
@query(
    "q9_distinct_agg",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q10 — ranking window: latest order per customer.
# --------------------------------------------------------------------------
@query(
    "q10_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1 ORDER BY o_custkey
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Q11 — analytic window with explicit ROWS frame (running sum).
# --------------------------------------------------------------------------
@query(
    "q11_running_sum",
    oracle="""
    SELECT o_custkey, o_orderdate, o_orderkey,
           round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_total
    FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        r4(F.sum("o_totalprice").over(w)).alias("running_total"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --------------------------------------------------------------------------
# Q12 — set operations: (A EXCEPT B) UNION ALL (A INTERSECT B).
# A = high-balance custkeys, B = BUILDING-segment custkeys.
# --------------------------------------------------------------------------
@query(
    "q12_set_ops",
    oracle="""
    SELECT c_custkey FROM (
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       EXCEPT
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      UNION ALL
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    ) ORDER BY c_custkey
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.exceptAll(b.intersect(a)).union(a.intersect(b)).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Q13 — scalar function sweep (string/date/math). The reference's entire
# scalar surface is sqrt/pow/mean/%.4f (SURVEY.md §2.2); this is the
# engine's general pyspark.sql.functions surface.
# --------------------------------------------------------------------------
@query(
    "q13_scalar_sweep",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderstatus)                            AS status_u,
           substr(o_orderpriority, 1, 1)                   AS prio_first,
           CAST(length(o_orderpriority) AS BIGINT)         AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority)     AS status_prio,
           CAST(year(o_orderdate) AS BIGINT)               AS order_year,
           CAST(month(o_orderdate) AS BIGINT)              AS order_month,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
           round(o_totalprice * 0.1, 4)                    AS price_tenth,
           round(abs(o_totalprice - 200000), 4)            AS abs_diff
    FROM orders ORDER BY o_orderkey LIMIT 200
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.upper("o_orderstatus").alias("status_u"),
            F.substring("o_orderpriority", 1, 1).alias("prio_first"),
            F.length("o_orderpriority").cast("bigint").alias("prio_len"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            # DATE kept as yyyy-MM-dd string: DuckDB's pandas bridge turns
            # DATE into midnight timestamps, which would sabotage the hash.
            F.date_format(
                F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"
            ).alias("due_date"),
            r4(F.col("o_totalprice") * 0.1).alias("price_tenth"),
            r4(F.abs(F.col("o_totalprice") - 200000)).alias("abs_diff"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q14 — ROLLUP (grouping sets). NULLS FIRST pinned on both sides.
# --------------------------------------------------------------------------
@query(
    "q14_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_custs,
           round(sum(c_acctbal), 4) AS total_bal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            r4(F.sum("c_acctbal")).alias("total_bal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


# --------------------------------------------------------------------------
# Q15 — time bucketing (batch form of a tumbling window; K4's oracle).
# --------------------------------------------------------------------------
@query(
    "q15_time_bucket",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts, event_type,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("hour_ts", "event_type")
    )


# --------------------------------------------------------------------------
# Q16 — pivot-style conditional aggregation.
# --------------------------------------------------------------------------
@query(
    "q16_conditional_agg",
    oracle="""
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 4)
             AS qty_returned,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 4)
             AS qty_accepted,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4)
             AS hi_disc_revenue,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            r4(
                F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0))
            ).alias("qty_returned"),
            r4(
                F.sum(F.when(F.col("l_returnflag") == "A", F.col("l_quantity")).otherwise(0.0))
            ).alias("qty_accepted"),
            r4(
                F.sum(
                    F.when(
                        F.col("l_discount") > 0.05,
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    ).otherwise(0.0)
                )
            ).alias("hi_disc_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q17 — exact deduplication (hash groupBy on full text; the canonical
# keep-lowest-id policy). Scale path: a single hash shuffle on text —
# for 100 TB, group on md5(text) instead to shrink shuffle width (same
# result for exact dup semantics modulo md5 collisions).
# --------------------------------------------------------------------------
@query(
    "q17_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text ORDER BY doc_id
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Q18 — text stats (string functions + agg).
# --------------------------------------------------------------------------
@query(
    "q18_text_stats",
    oracle="""
    SELECT source, lang, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(length(text)), 4) AS avg_text_len
    FROM documents GROUP BY source, lang ORDER BY source, lang
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(F.avg("n_chars")).alias("avg_chars"),
            r4(F.avg(F.length("text"))).alias("avg_text_len"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# Q19 — CUBE (full grouping-set lattice; complements Q14's ROLLUP).
# --------------------------------------------------------------------------
@query(
    "q19_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("total_price"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


# --------------------------------------------------------------------------
# Q22 — lag/lead analytics: day-over-day value deltas per event type.
# --------------------------------------------------------------------------
@query(
    "q22_lag_delta",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(sum(value), 4) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, total,
           round(total - lag(total) OVER (
             PARTITION BY event_type ORDER BY day), 4) AS delta,
           round(lead(total) OVER (
             PARTITION BY event_type ORDER BY day) - total, 4) AS next_delta
    FROM daily ORDER BY event_type, day
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(r4(F.sum("value")).alias("total"))
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "total",
        r4(F.col("total") - F.lag("total").over(w)).alias("delta"),
        r4(F.lead("total").over(w) - F.col("total")).alias("next_delta"),
    ).orderBy("event_type", "day")


# --------------------------------------------------------------------------
# Q23 — INTERSECT (completes the set-op family with Q12's EXCEPT/UNION).
# --------------------------------------------------------------------------
@query(
    "q23_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY c_custkey
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    open_orders = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.intersect(open_orders).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Q24 — JSON extraction (the scalar-function category the reference uses
# only as serialization, mapper.py:71-72; here it is a queryable type).
# --------------------------------------------------------------------------
@query(
    "q24_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON column with an EXPLICIT schema
    (from_json — JVM-side, vectorizable; no schema inference in engine
    code) and aggregate the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            r4(F.avg("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q25 — PIVOT (wide conditional aggregation with an explicit value list).
# --------------------------------------------------------------------------
@query(
    "q25_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS n_f,
           count(*) FILTER (o_orderstatus = 'O') AS n_o,
           count(*) FILTER (o_orderstatus = 'P') AS n_p,
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 0), 4)
             AS open_total
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an EXPLICIT pivot-value list — at scale an
    unlisted pivot costs an extra distinct-values job and makes the
    output schema data-dependent; listing values keeps the plan static.
    Counts coalesce to 0 to match SQL FILTER semantics on empty cells."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        r4(F.coalesce(F.col("O_total"), F.lit(0.0))).alias("open_total"),
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# Q26 — correlated scalar subquery, entered through the SQL surface.
# Catalyst decorrelates it into an aggregate + join; the engine's SQL
# entry point (Engine.sql) is exercised by the same path.
# --------------------------------------------------------------------------
@query(
    "q26_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "kmce_q26_orders"
    )
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
        FROM kmce_q26_orders o
        WHERE o_totalprice > (
          SELECT 1.5 * avg(o2.o_totalprice) FROM kmce_q26_orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Q27 — supplier rollup (completes engine-table coverage: every TESTDATA
# table is now exercised by at least one oracled query).
# --------------------------------------------------------------------------
@query(
    "q27_supplier_stats",
    oracle="""
    SELECT n_name, count(*) AS n_suppliers,
           round(avg(s_acctbal), 4) AS avg_acctbal,
           round(max(s_acctbal), 4) AS max_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            r4(F.avg("s_acctbal")).alias("avg_acctbal"),
            r4(F.max("s_acctbal")).alias("max_acctbal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q29 — exact grouped percentiles (sort-based exact quantiles; the
# bounded-memory approximate path at 100 TB is t5's GK sketch — this is
# its exactness anchor, the same anchor/scale-path pairing as d4 vs s2).
# --------------------------------------------------------------------------
@query(
    "q29_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           round(max(value), 4)                 AS vmax
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per event_type.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    definition h = p·(n-1) with linear interpolation between the two
    bracketing order statistics. Outputs round to 6 decimals, not 4:
    source values carry 4 decimals and interpolation fractions here have
    ≤2 (h's fractional part comes from p's two decimal digits), so every
    exact result sits ON the 1e-6 grid — whereas a 4-decimal round can
    land exactly on a half-boundary (e.g. a p50 midpoint of two values
    an odd last-digit apart), where engines round opposite ways.

    Scale: exact per-group percentiles sort each group's values — a
    full-group materialization (Spark's ``percentile`` agg buffers the
    group). Fine for bounded group cardinality × group size; the
    unbounded-stream / huge-group path is t5's mergeable GK sketch.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            r4(F.max("value")).alias("vmax"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q30 — FULL OUTER join (completes the join-type family: inner Q3/Q4,
# left+null Q5, semi Q6, anti Q7, as-of Q20, range Q28).
# --------------------------------------------------------------------------
@query(
    "q30_full_outer_activity",
    oracle="""
    WITH c AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), p AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.day, p.day)         AS day,
           coalesce(n_clicks, 0)          AS n_clicks,
           coalesce(n_purchases, 0)       AS n_purchases
    FROM c FULL OUTER JOIN p
      ON c.user_id = p.user_id AND c.day = p.day
    ORDER BY user_id, day
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) click vs purchase activity via FULL OUTER join —
    both null sides are populated (~40% of rows are one-sided on the
    fixtures), so outer-row generation on BOTH sides is actually
    exercised, not vacuously green."""
    ev = load_table(spark, sf_dir, "events")

    def daily(etype: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(
                "user_id", F.date_trunc("day", F.col("ts")).alias("day")
            )
            .agg(F.count(F.lit(1)).alias(out))
        )

    c, p = daily("click", "n_clicks"), daily("purchase", "n_purchases")
    return (
        c.join(p, ["user_id", "day"], "full_outer")
        .select(
            "user_id",
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .orderBy("user_id", "day")
    )


# --------------------------------------------------------------------------
# F1 — JSONL source/sink round-trip: the engine's non-parquet text-format
# surface, driver-checked (sinks.py's writers are otherwise pytest-only).
# --------------------------------------------------------------------------
_JSONL_STAGED: dict[str, object] = {}


@query(
    "f1_jsonl_roundtrip",
    oracle="""
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
)
def f1_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents to JSON-lines, read back with an EXPLICIT schema
    (inferSchema is prohibited engine-wide, SURVEY.md §1.5), and
    aggregate per (lang, source) — with per-group min/max md5 of the
    text so any escaping/encoding corruption in the round-trip flips
    the hash, not just the row count. The oracle reads the ORIGINAL
    parquet: round-trip fidelity IS the assertion.

    Scale: the JSONL write/read is per-partition parallel (one file per
    task, splittable line format); staged once per (process, sf_dir)
    like the streaming events dir."""
    import tempfile as _tf

    key = staging_key(sf_dir, "documents")
    if key not in _JSONL_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_jsonl_")
        load_table(spark, sf_dir, "documents").write.mode(
            "overwrite"
        ).json(tmp.name + "/docs")
        _JSONL_STAGED[key] = tmp
    docs = spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).json(_JSONL_STAGED[key].name + "/docs")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_md5"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_md5"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Q31 — distribution window functions (ntile / percent_rank / cume_dist),
# completing the window family: ranking (Q10 row_number), analytic frames
# (Q11 running sum), navigation (Q22 lag/lead), distribution (here).
# --------------------------------------------------------------------------
@query(
    "q31_window_distribution",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS BIGINT)       AS quartile,
           round(percent_rank() OVER w, 6)       AS pct_rank,
           round(cume_dist() OVER w, 6)          AS cum_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-value quartiles and rank distributions.

    Determinism: the window ORDER BY ends in the unique o_orderkey, so
    ntile's row numbering (which, unlike percent_rank/cume_dist, depends
    on ORDER within ties, not just rank) is total. percent_rank and
    cume_dist round to 6 decimals: denominators here are small integers
    whose reciprocals are not 4-decimal-grid values.

    Scale: one hash shuffle on o_custkey, then per-partition sort —
    identical shape to Q10/Q11; no global sort before the final output
    ORDER BY."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Q32 — explicit GROUPING SETS (the general lattice form; Q14's ROLLUP and
# Q19's CUBE are its fixed specializations), entered through the SQL
# surface like Q26.
# --------------------------------------------------------------------------
@query(
    "q32_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority,
             o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked grouping-set lattice: both single-column marginals, the
    full pair, and the grand total — the shape CUBE can't express without
    computing unwanted sets. grouping() flags disambiguate data NULLs
    from subtotal NULLs and give the ORDER BY a deterministic lattice
    ordering (NULLS FIRST pinned explicitly: Spark and DuckDB default
    null ordering differ).

    Scale: Spark expands grouping sets into one Expand + single hash
    aggregate — one shuffle total, not one per set."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "kmce_q32_orders"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total_price
        FROM kmce_q32_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority,
                 o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# F2 — CSV source/sink round-trip (completes the text-format matrix with
# F1's JSONL: parquet is the canonical store, JSONL + CSV the interchange
# formats, SURVEY.md §2.2 "Scans / sources").
# --------------------------------------------------------------------------
_CSV_STAGED: dict[str, object] = {}


@query(
    "f2_csv_roundtrip",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
    FROM documents GROUP BY source ORDER BY source
    """,
)
def f2_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents to headered CSV, read back with an EXPLICIT schema,
    and aggregate per source with min/max text md5 — quoting/escaping
    corruption in the round-trip flips the hash. The oracle reads the
    ORIGINAL parquet: fidelity is the assertion (same contract as F1).

    Round-trip options are set so the reader can parse everything the
    writer legally emits: ``multiLine`` for quoted embedded newlines,
    and an explicit ``nullValue`` sentinel so empty strings survive
    (the default maps unquoted empties to NULL on read). The cost:
    multiLine CSV is NOT line-splittable — one task per file, which is
    why parquet is the canonical store and CSV only interchange.

    Scale: the staged write happens once per (process, sf_dir); files
    stay per-partition parallel at the file granularity."""
    import tempfile as _tf

    csv_opts = {"header": "true", "nullValue": "\\N"}
    key = staging_key(sf_dir, "documents")
    if key not in _CSV_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_csv_")
        load_table(spark, sf_dir, "documents").write.mode(
            "overwrite"
        ).options(**csv_opts).csv(tmp.name + "/docs")
        _CSV_STAGED[key] = tmp
    docs = (
        spark.read.schema(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, "
            "n_chars BIGINT"
        )
        .options(**csv_opts, multiLine="true")
        .csv(_CSV_STAGED[key].name + "/docs")
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_md5"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_md5"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# F3 — partition-pruned scan over a partitionBy layout: THE 100 TB scan
# lever (a date/type-partitioned store turns a full-corpus scan into a
# directory listing + selected-partition read). The layout is written by
# sinks.write_parquet(partition_by=...); the pruning itself is pinned in
# tests/test_plans.py via plans.partition_filters.
# --------------------------------------------------------------------------
_PARTITIONED_STAGED: dict[str, object] = {}


def staged_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage events partitioned by event_type, once per (process, sf_dir).
    Shared with the plan-pin test so both inspect the same layout."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.sinks import (
        write_parquet,
    )

    key = staging_key(sf_dir, "events")
    if key not in _PARTITIONED_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_part_")
        write_parquet(
            load_table(spark, sf_dir, "events"),
            tmp.name + "/events",
            partition_by=("event_type",),
        )
        _PARTITIONED_STAGED[key] = tmp
    return _PARTITIONED_STAGED[key].name + "/events"


@query(
    "f3_partition_pruned_scan",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY 1, 2 ORDER BY event_type, day
    """,
)
def f3_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily stats for two event types read from an event_type-partitioned
    parquet layout. The IN-filter prunes at the DIRECTORY level
    (PartitionFilters, no file footers of excluded partitions touched) —
    on a 1000-executor cluster over year-partitioned 100 TB this is the
    difference between scanning 2 partitions and scanning 500.

    The partition column comes back from the directory key; values and
    aggregates must still match the unpartitioned oracle exactly —
    layout must never change results."""
    path = staged_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# P3 — token-budget sequence packing (concat-and-chunk): assign documents
# to fixed-token-budget training sequences by cumulative offset — the
# standard "concatenate the corpus, split every N tokens" LM batching
# shape, as a deterministic relational query.
# --------------------------------------------------------------------------
PACK_BUDGET = 2048


@query(
    "p3_token_packing",
    oracle=f"""
    WITH d AS (
      SELECT lang, doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start_tok
      FROM d
    )
    SELECT lang, CAST(floor(start_tok / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY lang, seq_id ORDER BY lang, seq_id
    """,
)
def p3_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language packing manifest: each document lands in the sequence
    where its first token falls (documents straddling a boundary belong
    to their starting sequence — exactly what a chunker that concatenates
    then splits produces). Deterministic: (lang, doc_id) is a total
    order.

    Scale: one hash shuffle on lang + per-partition sort for the running
    offset, then a second small agg — same two-exchange shape as t8. At
    100 TB the per-lang partition is the skew risk; the production
    variant packs per (lang, shard) with shard = pmod(hash(doc_id), N)
    to bound any single sort partition, at the cost of N partial tail
    sequences per lang."""
    from k_means_clustering_via_map_reduce_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        c.groupBy(
            "lang",
            F.floor(F.col("start_tok") / float(PACK_BUDGET))
            .cast("bigint")
            .alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "seq_id")
    )


# --------------------------------------------------------------------------
# Q33 — gap-filled time series with forward fill (the hypertable
# rollup/gap-fill family): a dense hourly spine per event_type, hours
# with no events emitted as zero-count gap rows, last known hourly
# average carried forward.
# --------------------------------------------------------------------------
@query(
    "q33_gap_fill",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                      date_trunc('hour', max(ts)) AS hi FROM events),
    h AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
            AS hour_ts FROM b),
    t AS (SELECT DISTINCT event_type FROM events),
    a AS (SELECT date_trunc('hour', ts) AS hour_ts, event_type,
                 count(*) AS n, round(avg(value), 4) AS av
          FROM events GROUP BY 1, 2)
    SELECT h.hour_ts, t.event_type,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           CAST(a.n IS NULL AS BIGINT)      AS is_gap,
           last_value(a.av IGNORE NULLS) OVER (
             PARTITION BY t.event_type ORDER BY h.hour_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM h CROSS JOIN t
    LEFT JOIN a ON a.hour_ts = h.hour_ts AND a.event_type = t.event_type
    ORDER BY t.event_type, h.hour_ts
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type over the observed time range:
    215 of 3600 spine slots are genuine gaps on the sf0.01 fixture, so
    both the zero-fill and the IGNORE-NULLS forward fill are exercised
    non-vacuously (leading gaps before a type's first value stay NULL
    in both engines).

    Scale: the spine is hours × types — tiny relative to the events it
    summarizes (a year is 8.8k rows/type) — so it broadcasts into the
    left join against the hourly aggregate; the only full-data work is
    the one hash agg. The forward fill shuffles spine-sized data only."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), r4(F.avg("value")).alias("av")
    )
    # Bounds and the type set derive from the (tiny) hourly aggregate,
    # not from events — min(hour_ts) == date_trunc(min(ts)) — so the
    # full corpus is scanned exactly once. The re-aggregation is over
    # hours × types rows.
    hourly = hourly.localCheckpoint(eager=False)
    bounds = hourly.agg(
        F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi")
    )
    spine_hours = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 hour)")
        ).alias("hour_ts")
    )
    types = hourly.select("event_type").distinct()
    spine = spine_hours.crossJoin(types)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Explicit broadcast of the hourly aggregate (a left join builds its
    # RIGHT side): both sides are spine-sized, but they derive from a
    # checkpoint boundary whose size the planner can't estimate — without
    # the hint the join would pessimistically sort-merge.
    return (
        spine.join(F.broadcast(hourly), ["hour_ts", "event_type"], "left")
        .select(
            "hour_ts",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.col("n").isNull().cast("bigint").alias("is_gap"),
            F.last("av", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_type", "hour_ts")
    )


# --------------------------------------------------------------------------
# Q34 — salted join, driver-checked: the skew fallback (operators/skew.py)
# run end-to-end with a forced shuffle join, oracled against the PLAIN
# join — salting must never change results.
# --------------------------------------------------------------------------
@query(
    "q34_salted_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3's join computed through ``salted_join`` with a SHUFFLE_HASH
    hint (a broadcast would bypass the salted exchange and make this
    check vacuous): the shuffle keys on (c_custkey, salt), scattering
    any hot customer across ``salt`` tasks, and the result must equal
    the plain join's — which is exactly what sharing q3's oracle shape
    asserts.

    Scale: the trade is salt× build-side replication for salt× hot-key
    parallelism — the fallback when the build side is too big to
    broadcast and one key is pathological (AQE's skew split can divide
    a partition but not a single key's build-side row set)."""
    from k_means_clustering_via_map_reduce_spark.operators.skew import (
        salted_join,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice", "o_orderkey"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        o, c.hint("shuffle_hash"), on=["c_custkey"],
        probe_id_col="o_orderkey",
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q35 — array-function sweep over token arrays (the array face of Q13's
# scalar sweep): sort/distinct/slice/contains/join compose identically
# in Spark and DuckDB's list dialect.
# --------------------------------------------------------------------------
@query(
    "q35_array_functions",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w
               FROM documents)
    SELECT doc_id,
           CAST(len(w) AS BIGINT)                   AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT)    AS n_distinct,
           array_to_string(list_sort(list_distinct(w))[1:5], ' ')
                                                    AS first5_sorted,
           CAST(list_contains(w, 'the') AS BIGINT)  AS has_the,
           list_sort(list_distinct(w))[1]           AS min_token
    FROM d ORDER BY doc_id
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document array expressions: token count, distinct count, the
    first five distinct tokens in sort order (joined to a scalar string
    so the driver compare stays array-free), membership test, lexical
    minimum. All narrow JVM projections — zero shuffles except the
    presentation sort.

    Dialect notes pinned by the oracle: Spark ``slice``/DuckDB list
    slicing both clamp short arrays, and both sort ASCII-lexically for
    plain strings."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    dist_sorted = F.sort_array(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.array_join(F.slice(dist_sorted, 1, 5), " ").alias("first5_sorted"),
        F.array_contains(toks, "the").cast("bigint").alias("has_the"),
        F.element_at(dist_sorted, 1).alias("min_token"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q36 — date/time function sweep (completes Q13's scalar sweep on the
# temporal side): quarter / ISO week / day-of-week / month-end /
# day-arithmetic / month-arithmetic with clamping.
# --------------------------------------------------------------------------
@query(
    "q36_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT)        AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT)     AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT)  AS dow,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(datediff('day', DATE '1995-01-01',
                         CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH,
                    '%Y-%m-%d') AS plus2m
    FROM orders ORDER BY o_orderkey LIMIT 200
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal scalar functions over order dates. Dialect notes pinned
    by the oracle: Spark's dayofweek is 1=Sunday while DuckDB's is
    0=Sunday (the oracle adds 1); both engines' month addition clamps
    to month end (Jan 31 + 1 month = Feb 28/29); ISO week numbering
    agrees. Date outputs are formatted yyyy-MM-dd strings — DuckDB's
    pandas bridge renders DATE as midnight timestamps, which would
    break value compares otherwise.

    All narrow projections; the only exchange is the top-k sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
            F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
            F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
                "month_end"
            ),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01")
            )
            .cast("bigint")
            .alias("days_since"),
            F.date_format(
                F.add_months(F.col("o_orderdate").cast("date"), 2),
                "yyyy-MM-dd",
            ).alias("plus2m"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q37 — regexp-function sweep (extract-with-group / global replace /
# match count), restricted to the Java∩RE2 dialect like t11 so the
# oracle replays identically.
# --------------------------------------------------------------------------
@query(
    "q37_regexp_functions",
    oracle=r"""
    SELECT doc_id,
           CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT)
             AS src_num,
           CAST(len(regexp_extract_all(text, '\bt[a-z]+')) AS BIGINT)
             AS n_twords,
           md5(regexp_replace(text, '[aeiou]', '_', 'g')) AS scrub_md5
    FROM documents ORDER BY doc_id
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalars over documents: capture-group extraction (the
    numeric source suffix), word-boundary match counting, and a global
    vowel scrub hashed so any divergence in replacement semantics flips
    the value. Dialect deltas pinned by the oracle: Spark's
    regexp_replace is global by default while DuckDB needs the 'g'
    flag; \b and character classes behave identically in Java and RE2.

    All narrow JVM projections — zero shuffles except the presentation
    sort."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("source"), r"src([0-9]+)", 1)
        .cast("bigint")
        .alias("src_num"),
        F.regexp_count(F.col("text"), F.lit(r"\bt[a-z]+"))
        .cast("bigint")
        .alias("n_twords"),
        F.md5(
            F.encode(
                F.regexp_replace(F.col("text"), r"[aeiou]", "_"), "UTF-8"
            )
        ).alias("scrub_md5"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q38 — higher-order-function sweep: lambda-expression transforms /
# filters / folds / pairwise zips over token arrays, entirely inside
# whole-stage codegen (the engine's own operators build on exactly these
# primitives — functions/text.py, functions/vector.py — so the surface
# deserves a declared, oracled entry of its own).
# --------------------------------------------------------------------------
@query(
    "q38_higher_order_functions",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w
               FROM documents)
    SELECT doc_id,
           CAST(list_aggregate(list_transform(w, t -> strlen(t)), 'sum')
                AS BIGINT) AS total_chars,
           CAST(list_aggregate(list_transform(w, t -> strlen(t)), 'max')
                AS BIGINT) AS max_token_len,
           CAST(len(list_filter(w, t -> strlen(t) > 4)) AS BIGINT)
             AS n_long_tokens,
           CAST(coalesce(list_aggregate(
                  list_transform(list_zip(w[1:-2], w[2:-1]),
                                 p -> CASE WHEN p[1] = p[2]
                                      THEN 1 ELSE 0 END),
                  'sum'), 0) AS BIGINT) AS n_repeats
    FROM d ORDER BY doc_id
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lambda-expression pipeline: transform (token →
    length), fold (sum), max, filter-count, and an adjacent-pair
    zip_with counting immediate token repeats. All array-local
    expressions in one codegen stage — zero shuffles except the
    presentation sort; no Python in the loop even though every value is
    a per-element lambda."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    lens = F.transform(toks, lambda t: F.length(t))
    n = F.size(toks)
    pair_repeats = F.aggregate(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.when(a == b, 1).otherwise(0),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("total_chars"),
        F.array_max(lens).cast("bigint").alias("max_token_len"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4))
        .cast("bigint")
        .alias("n_long_tokens"),
        pair_repeats.alias("n_repeats"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# F4 — ORC source/sink round-trip (completes the format matrix: parquet
# canonical, JSONL/CSV text interchange, ORC the columnar interchange
# with other Hadoop-ecosystem engines).
# --------------------------------------------------------------------------
_ORC_STAGED: dict[str, object] = {}


@query(
    "f4_orc_roundtrip",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def f4_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents to ORC, read back, aggregate per lang with
    min/max text md5 — same fidelity contract as F1/F2: the oracle
    reads the ORIGINAL parquet, so any encoding corruption in the ORC
    round-trip flips the hash. ORC is columnar with predicate-pushdown
    and column-pruning support like parquet, so unlike the text
    formats this round-trip keeps the scan-side scale properties.

    Scale: per-partition parallel, stripe-splittable; staged once per
    (process, sf_dir)."""
    import tempfile as _tf

    key = staging_key(sf_dir, "documents")
    if key not in _ORC_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_orc_")
        load_table(spark, sf_dir, "documents").write.mode(
            "overwrite"
        ).orc(tmp.name + "/docs")
        _ORC_STAGED[key] = tmp
    docs = spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).orc(_ORC_STAGED[key].name + "/docs")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_md5"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_md5"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q39 — RANGE window frame: trailing 1-hour sum per event, framed by the
# ORDER-KEY VALUE (event-time seconds), not row count — the time-series
# frame Q11's ROWS frame cannot express (a row 59 minutes back and a row
# 2 days back are both "1 row away" to ROWS).
# --------------------------------------------------------------------------
@query(
    "q39_range_frame",
    oracle="""
    SELECT event_id,
           CAST(count(*) OVER w AS BIGINT)        AS n_trailing_1h,
           round(sum(value) OVER w, 4)            AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity within its type: the frame spans
    every event whose epoch second is within 3600 of this one's —
    including same-second ties on BOTH sides of the current row, which
    a ROWS frame would split arbitrarily. Order keys are FLOORED to
    whole seconds explicitly on both sides: Spark's long cast truncates
    while DuckDB's double cast rounds half-up, and the sub-second
    timestamps in the fixture land rows on exactly that boundary —
    frame membership must be integer-exact.

    Scale: one hash shuffle on event_type + per-partition sort —
    identical to q11's shape; the range frame is evaluated with a
    sliding two-pointer over the sorted run, not a rescan."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_1h"),
            r4(F.sum("value").over(w)).alias("sum_trailing_1h"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q40 — NULL-semantics aggregate sweep: the fixtures carry no NULLs, so
# NULLs are synthesized in-query (values below a cutoff) and every
# null-sensitive aggregate corner is pinned: count(*) vs count(col),
# null-skipping avg/max, coalesce-to-zero sums, and all-NULL groups.
# --------------------------------------------------------------------------
@query(
    "q40_null_semantics",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CASE WHEN value >= 50 THEN value END AS vn
      FROM events
    )
    SELECT event_type,
           count(*)                                   AS n_rows,
           count(vn)                                  AS n_nonnull,
           round(avg(vn), 4)                          AS avg_skipnull,
           round(sum(coalesce(vn, 0)), 4)             AS sum_zerofill,
           round(max(vn), 4)                          AS max_vn,
           CAST(count(*) - count(vn) AS BIGINT)       AS n_null
    FROM v GROUP BY event_type ORDER BY event_type
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-skipping aggregate semantics over synthesized NULLs (~12% of
    values fall below the cutoff): count(col) skips NULLs while
    count(*) does not, avg's denominator is the non-null count (NOT a
    zero-filled mean — the two differ on every group here), and max
    ignores NULLs. Spark and ANSI SQL agree on all of it; this query
    exists so the agreement is pinned rather than assumed."""
    ev = load_table(spark, sf_dir, "events")
    vn = F.when(F.col("value") >= 50, F.col("value"))
    return (
        ev.select("event_type", vn.alias("vn"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("vn").alias("n_nonnull"),
            r4(F.avg("vn")).alias("avg_skipnull"),
            r4(F.sum(F.coalesce("vn", F.lit(0)))).alias("sum_zerofill"),
            r4(F.max("vn")).alias("max_vn"),
            (F.count(F.lit(1)) - F.count("vn"))
            .cast("bigint")
            .alias("n_null"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q41 — batch sessionization: the gap-based session assignment k4's
# streaming session_window computes with state, expressed relationally
# (lag-gap flag + running sum) so it is exactly SQL-replayable. The
# classic two-window composition every warehouse sessionizes with.
# --------------------------------------------------------------------------
SESSION_GAP_MS = 30 * 60 * 1000


@query(
    "q41_sessionize",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
                       > {SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM o
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT)            AS n_events,
           min(ts)                             AS session_start,
           CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT)
                                               AS duration_ms,
           round(sum(value), 4)                AS total_value
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-based sessions (30-min inactivity closes a session):
    a new-session flag from lag(), a running sum turning flags into
    session ids, then per-session stats. Gap comparison is in INTEGER
    milliseconds (unix_millis / epoch_ms) — the fixtures carry
    sub-second timestamps, and float-seconds arithmetic could disagree
    across engines exactly at the 1800 s boundary.

    Scale: one hash shuffle on user_id feeds BOTH windows and the final
    agg (same partitioning, no re-exchange — the two window specs and
    the groupBy share the user_id clustering); per-user event runs sort
    within partitions. Skewed power users are the 100 TB risk; bound is
    per-user history length, same as any sessionizer."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(F.lag("ts").over(w).cast("timestamp"))
    is_new = F.when(
        gap_ms.isNull() | (gap_ms > SESSION_GAP_MS), 1
    ).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.select("user_id", "event_id", "ts", "value").withColumn(
        "session_id", F.sum(is_new).over(run).cast("bigint")
    )
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_millis(F.max("ts").cast("timestamp")) - F.unix_millis(F.min("ts").cast("timestamp")))
            .cast("bigint")
            .alias("duration_ms"),
            r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# Q42 — NOT IN vs NOT EXISTS three-valued-logic pin: with one NULL in the
# subquery, `x NOT IN (subq)` is never TRUE (x <> NULL is UNKNOWN), so
# the NOT IN arm returns ZERO rows while NOT EXISTS (which tests row
# existence, not value equality) returns the real anti-join count. The
# classic silent-wrong-results trap, pinned engine-vs-oracle instead of
# assumed. Fixtures carry no NULL keys, so one is synthesized.
# --------------------------------------------------------------------------
_Q42_BODY = """
    WITH sub AS (
      SELECT CASE WHEN o_custkey %% 97 = 0 THEN NULL ELSE o_custkey END AS k
      FROM %(orders)s
    )
    SELECT
      CAST((SELECT count(*) FROM %(customer)s
            WHERE c_custkey NOT IN (SELECT k FROM sub)) AS BIGINT)
        AS not_in_nullable,
      CAST((SELECT count(*) FROM %(customer)s c
            WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey))
        AS BIGINT)
        AS not_exists,
      CAST((SELECT count(*) FROM %(customer)s
            WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL))
        AS BIGINT)
        AS not_in_nullfree
"""


@query(
    "q42_not_in_nulls",
    oracle=_Q42_BODY % {"orders": "orders", "customer": "customer"},
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware anti-join semantics via the SQL entry point: the
    NOT IN arm must be 0 (one NULL poisons the whole predicate) while
    the NOT EXISTS and null-filtered NOT IN arms agree on the real
    anti-join count (on these fixtures: exactly the customers whose
    every order row had its key nulled by the %97 rule — equality with
    NULL never matches, so those customers "lose" their orders). Spark
    plans the NOT IN arm as a NULL-AWARE anti join (broadcast
    nested-loop at this shape) precisely because hash anti-join would
    be wrong — the row pins that the engine pays that cost rather than
    returning the fast wrong answer."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "kmce_q42_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "kmce_q42_customer"
    )
    return spark.sql(
        _Q42_BODY % {"orders": "kmce_q42_orders", "customer": "kmce_q42_customer"}
    )


# --------------------------------------------------------------------------
# F5 — DYNAMIC partition pruning: f3 prunes with a literal IN-filter the
# planner sees at compile time; here the selected partition set is only
# discoverable by executing the dim-side filter (tier = 'hot' over a
# dimension relation), so pruning must happen at RUNTIME via the
# broadcast-reuse subquery (`dynamicpruningexpression` in the scan's
# PartitionFilters — pinned in tests/test_plans.py). The star-schema
# 100 TB lever: fact partitions skipped because the dim filter said so,
# without the user repeating the filter on the fact side.
# --------------------------------------------------------------------------
EVENT_TIERS = (
    ("click", "hot"),
    ("purchase", "hot"),
    ("view", "cold"),
    ("signup", "cold"),
    ("error", "cold"),
)

_F5_DIM_VALUES = ", ".join(f"('{t}', '{tier}')" for t, tier in EVENT_TIERS)


@query(
    "f5_dpp_scan",
    oracle=f"""
    WITH dim(event_type, tier) AS (VALUES {_F5_DIM_VALUES})
    SELECT e.event_type, date_trunc('day', e.ts) AS day,
           count(*) AS n_events, round(sum(e.value), 4) AS total_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    WHERE d.tier = 'hot'
    GROUP BY 1, 2 ORDER BY e.event_type, day
    """,
)
def f5_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily stats for the 'hot'-tier event types, where "hot" lives in
    a dimension relation rather than a literal predicate: the
    partitioned fact scan cannot be pruned statically, so Catalyst
    plants a dynamic-pruning subquery that reuses the dim broadcast and
    skips the cold partitions' directories at runtime. Results must be
    layout-independent: the oracle replays the join over the
    UNPARTITIONED original."""
    path = staged_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    dim = spark.createDataFrame(
        list(EVENT_TIERS), "event_type string, tier string"
    )
    return (
        ev.join(dim.filter(F.col("tier") == "hot"), "event_type")
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# F6 — CDC merge (upsert/delete) into a parquet snapshot: the
# incremental-maintenance face of the sink surface. Plain parquet has no
# MERGE primitive, so the engine expresses it as the classic
# full-outer-join rewrite; the aggregation runs over the REREAD
# snapshot, so join logic, write fidelity, and read-back are all under
# the oracle compare.
# --------------------------------------------------------------------------
_MERGE_STAGED: dict[tuple, object] = {}

_F6_CDC = """
    SELECT o_orderkey AS k, 'U' AS op,
           o_totalprice * 1.1 AS price, 'U' AS status
    FROM {orders} WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey, 'D', CAST(NULL AS DOUBLE), CAST(NULL AS STRING)
    FROM {orders} WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, 'I', o_totalprice / 2, 'N'
    FROM {orders} WHERE o_orderkey % 13 = 0
"""


@query(
    "f6_merge_upsert",
    oracle=f"""
    WITH cdc AS ({_F6_CDC.format(orders="orders")}),
    merged AS (
      SELECT coalesce(c.k, b.o_orderkey) AS k,
             CASE WHEN c.op IN ('U', 'I') THEN c.price
                  ELSE b.o_totalprice END AS price,
             CASE WHEN c.op IN ('U', 'I') THEN c.status
                  ELSE b.o_orderstatus END AS status
      FROM orders b FULL OUTER JOIN cdc c ON b.o_orderkey = c.k
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(price), 4) AS total_price,
           min(k) AS min_key, max(k) AS max_key
    FROM merged GROUP BY status ORDER BY status
    """,
)
def f6_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a deterministic CDC batch (updates %7, deletes %11,
    inserts %13 under shifted keys) to the orders table via the
    full-outer-join MERGE rewrite, write the merged snapshot to
    parquet, read it back, and aggregate per status — matched-update,
    matched-delete, and not-matched-insert arms all non-vacuous.

    Scale: the join shuffles on the key both sides once (CDC batches
    are usually broadcastable; this one is deliberately fact-scale to
    exercise the shuffle path). A production deployment bounds the
    rewrite with partition-level copy-on-write: cluster the snapshot
    by key range / date, semi-join the CDC batch to find TOUCHED
    partitions, and rewrite only those via dynamic partition overwrite
    (sinks.write_parquet partition_by + partitionOverwriteMode=dynamic)
    — rewriting 100 TB per batch is the anti-pattern this docstring
    exists to warn about."""
    import tempfile as _tf

    base = load_table(spark, sf_dir, "orders")
    base.createOrReplaceTempView("kmce_f6_orders")
    cdc = spark.sql(_F6_CDC.format(orders="kmce_f6_orders"))
    b, c = base.alias("b"), cdc.alias("c")
    merged = (
        b.join(c, F.col("b.o_orderkey") == F.col("c.k"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("c.k"), F.col("b.o_orderkey")).alias("k"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.price"))
            .otherwise(F.col("b.o_totalprice"))
            .alias("price"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.status"))
            .otherwise(F.col("b.o_orderstatus"))
            .alias("status"),
        )
    )
    key = staging_key(sf_dir, "orders")
    if key not in _MERGE_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_merge_")
        merged.write.mode("overwrite").parquet(tmp.name + "/snapshot")
        _MERGE_STAGED[key] = tmp
    snap = spark.read.parquet(_MERGE_STAGED[key].name + "/snapshot")
    return (
        snap.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            r4(F.sum("price")).alias("total_price"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# Q43 — runtime Bloom-filter join pruning: the ROW-level complement of
# f5's directory-level dynamic pruning. A selective dim-side filter
# injects a bloom_filter_agg on the build side and a might_contain
# pre-filter on the fact scan, so fact rows that cannot join are
# dropped BEFORE the shuffle — at 100 TB this cuts shuffle volume by
# the dim filter's selectivity without any user-written semi join.
# --------------------------------------------------------------------------
_BLOOM_CONFS = {
    # Fixture tables are far below the production thresholds, so the
    # injection rule is opened up while THIS query's plan is compiled
    # (forced below), then every conf is restored: the cached physical
    # plan keeps the bloom filter; no other query sees the overrides.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Suppress broadcast so the filtered exchange actually executes —
    # under a broadcast join the bloom filter would be pointless (the
    # fact side never shuffles).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@query(
    "q43_bloom_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice), 4) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem⋈orders under a selective order-price filter, planned
    with runtime Bloom-filter injection (might_contain pinned in
    tests/test_plans.py). The filter is semantically transparent —
    results must equal the plain join, which is exactly what the
    oracle replays."""
    old = {
        k: spark.conf.get(k, None) for k in _BLOOM_CONFS
    }
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        df = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                r4(F.sum("l_extendedprice")).alias("total_price"),
            )
            .orderBy("o_orderstatus")
        )
        # Force plan compilation NOW so the bloom-injection confs are in
        # effect; the QueryExecution caches the physical plan, so the
        # restore below cannot un-inject it.
        df._jdf.queryExecution().executedPlan()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


# --------------------------------------------------------------------------
# Q44–Q47 — the decorrelation family: the four classic TPC-H subquery
# shapes (Q18/Q17/Q20/Q22) that force Catalyst's subquery rewrites —
# IN-over-grouped-HAVING, correlated scalar aggregate, two-level nested
# IN, and global scalar + anti join. The reference has no subqueries at
# all (its one "query" is the hard-coded K-Means driver, master.py), so
# these pin the engine's relational surface where silent wrong results
# classically hide. Entered through the SQL surface so the decorrelation
# actually runs (DataFrame builds would pre-decorrelate by hand).
# --------------------------------------------------------------------------
_Q44_BODY = """
    SELECT c_name, c.c_custkey, o.o_orderkey,
           round(o.o_totalprice, 4) AS o_totalprice,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM %(customer)s c
    JOIN %(orders)s o ON c.c_custkey = o.o_custkey
    JOIN %(lineitem)s l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM %(lineitem)s
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
"""


@query(
    "q44_large_volume_orders",
    oracle=_Q44_BODY
    % {"customer": "customer", "orders": "orders", "lineitem": "lineitem"},
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over GROUP BY ... HAVING. Catalyst
    rewrites the IN into a left-semi join against the grouped HAVING
    aggregate — the fact table is scanned twice but never squared, and
    the semi join's build side is only the qualifying keys. Total
    ORDER BY via the unique o_orderkey tiebreak."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q44_{t}")
    return spark.sql(
        _Q44_BODY
        % {
            "customer": "kmce_q44_customer",
            "orders": "kmce_q44_orders",
            "lineitem": "kmce_q44_lineitem",
        }
    )


_Q45_BODY = """
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small_lots
    FROM %(lineitem)s l JOIN %(part)s p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM %(lineitem)s l2
        WHERE l2.l_partkey = l.l_partkey
      )
"""


@query(
    "q45_small_lot_revenue",
    oracle=_Q45_BODY % {"lineitem": "lineitem", "part": "part"},
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate subquery (per-part
    average quantity) decorrelated into a per-key aggregate joined back
    to the probe side. The threshold compare is FP-exact on both
    engines: l_quantity is integer-valued, so sum/avg in double carry
    no rounding and 0.5*avg is deterministic regardless of the
    aggregation order — no boundary-flip risk in the filter."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q45_{t}")
    return spark.sql(
        _Q45_BODY % {"lineitem": "kmce_q45_lineitem", "part": "kmce_q45_part"}
    )


_Q46_BODY = """
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 4) AS s_acctbal
    FROM %(supplier)s s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM %(lineitem)s
      WHERE l_partkey IN (
        SELECT p_partkey FROM %(part)s WHERE p_name LIKE 'small%%'
      )
      GROUP BY l_suppkey HAVING sum(l_quantity) > 60
    )
    ORDER BY s.s_suppkey
"""


@query(
    "q46_small_part_suppliers",
    oracle=_Q46_BODY
    % {"supplier": "supplier", "lineitem": "lineitem", "part": "part"},
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two-level nested IN — suppliers who moved more
    than a threshold volume of 'small%%' parts. The inner IN prunes
    lineitem to the qualifying part keys (broadcast semi join at dim
    scale) BEFORE the per-supplier aggregate, so the grouped HAVING
    runs over the reduced set; the outer IN is a second semi join on
    the K qualifying suppliers."""
    for t in ("supplier", "lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q46_{t}")
    return spark.sql(
        _Q46_BODY
        % {
            "supplier": "kmce_q46_supplier",
            "lineitem": "kmce_q46_lineitem",
            "part": "kmce_q46_part",
        }
    )


_Q47_BODY = """
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_dormant,
           round(sum(c.c_acctbal), 4) AS total_bal
    FROM %(customer)s c
    WHERE c.c_acctbal > (
        SELECT round(avg(c2.c_acctbal), 0) FROM %(customer)s c2
        WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM %(orders)s o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '2001-01-01'
      )
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


@query(
    "q47_dormant_high_balance",
    oracle=_Q47_BODY % {"customer": "customer", "orders": "orders"},
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated global scalar subquery (the
    above-average balance threshold) + correlated NOT EXISTS planned as
    an anti join against the recent-order set. The scalar threshold is
    rounded to whole units BEFORE the compare so double-summation order
    (which differs between engines) cannot flip boundary rows — the
    same discipline as p4's round-before-rank. Every customer has
    SOME order on these fixtures (q5's zero-order rows come from a
    filtered join), so dormancy is defined against a recency cutoff,
    which keeps the anti join non-vacuous at every SF."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q47_{t}")
    return spark.sql(
        _Q47_BODY % {"customer": "kmce_q47_customer", "orders": "kmce_q47_orders"}
    )


# --------------------------------------------------------------------------
# F7 — raw text-line ingestion: the log-file face of the source surface
# (f1/f2/f4 cover structured interchange; real corpora also arrive as
# semi-structured text lines that must be regex-parsed into columns).
# Documents are formatted as one `key=value` log line each, written with
# the text sink, re-read with spark.read.text, and re-structured with
# JVM-side regexp_extract — per-group text md5s make any formatting,
# escaping, or parse drift flip the compare. The oracle reads the
# ORIGINAL parquet: parse fidelity is the assertion.
# --------------------------------------------------------------------------
_TEXT_STAGED: dict[tuple, object] = {}

_F7_LINE_RE = r"^id=(\d+) lang=(\S+) source=(\S+) chars=(\d+) :: (.*)$"


@query(
    "f7_textline_roundtrip",
    oracle="""
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
    FROM documents GROUP BY source, lang ORDER BY source, lang
    """,
)
def f7_textline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format documents as log lines, round-trip through the text
    source/sink, regex-parse back to columns, and aggregate with
    fidelity hashes.

    The line format is valid because the corpus is line-safe (no
    embedded newlines — pinned by the md5 compare itself: a newline
    would split a line, drop a doc, and flip n_docs/min_md5). Parsing
    is a single narrow JVM regexp projection — no UDF, no shuffle
    before the small aggregate; at 100 TB the text source splits by
    line offsets, so this is scan-parallel exactly like production log
    ingestion."""
    import tempfile as _tf

    key = staging_key(sf_dir, "documents")
    if key not in _TEXT_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_text_")
        load_table(spark, sf_dir, "documents").select(
            F.concat(
                F.lit("id="), F.col("doc_id"),
                F.lit(" lang="), F.col("lang"),
                F.lit(" source="), F.col("source"),
                F.lit(" chars="), F.col("n_chars"),
                F.lit(" :: "), F.col("text"),
            ).alias("value")
        ).write.mode("overwrite").text(tmp.name + "/docs")
        _TEXT_STAGED[key] = tmp
    lines = spark.read.text(_TEXT_STAGED[key].name + "/docs")
    # try_cast, not cast: under ANSI mode a malformed line (regexp miss
    # -> '' extract) must become NULL, not kill the whole ingest job.
    parsed = lines.select(
        F.regexp_extract("value", _F7_LINE_RE, 1)
        .try_cast("bigint")
        .alias("doc_id"),
        F.regexp_extract("value", _F7_LINE_RE, 2).alias("lang"),
        F.regexp_extract("value", _F7_LINE_RE, 3).alias("source"),
        F.regexp_extract("value", _F7_LINE_RE, 4)
        .try_cast("bigint")
        .alias("n_chars"),
        F.regexp_extract("value", _F7_LINE_RE, 5).alias("text"),
    )
    return (
        parsed.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_md5"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_md5"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# F8 — small-file compaction with range clustering: the OPERATIONAL scan
# lever f3/f5 don't cover. Streaming ingest (k11) and per-task writers
# leave thousands of small files; compaction rewrites them into few
# large, time-clustered files (repartitionByRange on ts +
# sortWithinPartitions), giving back scan parallelism sized by data (not
# file count) AND min/max footer pruning for time-range predicates.
# Layout must never change results: the oracle replays the range
# aggregate over the ORIGINAL events parquet, and the clustering claims
# (file count collapsed, per-file ts ranges disjoint) are pinned with
# parquet footer statistics in tests/test_sinks.py.
# --------------------------------------------------------------------------
_COMPACT_STAGED: dict[tuple, object] = {}

COMPACT_SMALL_FILES = 64
COMPACT_TARGET_FILES = 4


def staged_compacted_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage the small-file layout then its compaction, once per
    (process, sf_dir, mtime). Returns the root with ``small/`` and
    ``compacted/`` beneath it."""
    import tempfile as _tf

    key = staging_key(sf_dir, "events")
    if key not in _COMPACT_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_compact_")
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(COMPACT_SMALL_FILES).write.parquet(tmp.name + "/small")
        (
            spark.read.parquet(tmp.name + "/small")
            .repartitionByRange(COMPACT_TARGET_FILES, F.col("ts"))
            .sortWithinPartitions("ts")
            .write.parquet(tmp.name + "/compacted")
        )
        _COMPACT_STAGED[key] = tmp
    return _COMPACT_STAGED[key].name


@query(
    "f8_compacted_scan",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
)
def f8_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range aggregate read from the COMPACTED layout: 64 ingest
    files rewritten into 4 time-clustered ones. The ts predicate is
    pushed to the scan, where the clustered layout lets parquet skip
    whole files/row-groups by footer min/max — at 100 TB the difference
    between touching a day's files and touching every ingest file ever
    written. Values must equal the oracle's replay over the original
    un-compacted table (compaction is an organizational rewrite, never
    a semantic one)."""
    root = staged_compacted_events(spark, sf_dir)
    ev = spark.read.parquet(root + "/compacted")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# F9 — gzip-compressed JSONL round-trip: the compressed-TEXT ingest
# surface (web-corpus JSONL is near-universally shipped gzip'd). Same
# fidelity contract as f1: the oracle reads the ORIGINAL parquet, so any
# corruption through compress→decompress→parse flips the md5 aggregate.
# --------------------------------------------------------------------------
_GZ_STAGED: dict[tuple, object] = {}

GZ_JSONL_FILES = 16


@query(
    "f9_gzip_jsonl_roundtrip",
    oracle="""
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
)
def f9_gzip_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents as gzip-compressed JSON-lines, read them back
    with an explicit schema, aggregate with per-group fidelity hashes
    against the original parquet.

    Splittability caveat (the operational contract of this source):
    gzip is a NON-splittable codec — a ``.json.gz`` file can never be
    divided across scan tasks, however large it is (Spark may still
    pack several small WHOLE files into one task). Parallelism
    therefore comes from FILE COUNT, which the writer controls: we
    repartition to ``GZ_JSONL_FILES`` before the write so the read
    side has that many independent units of work. At 100 TB the same rule holds — ingest pipelines
    should emit many bounded-size .gz files (or use a splittable
    codec: bzip2 splits but is slow; zstd/lz4 on text files are also
    whole-file in Spark's text/json sources — only container formats
    like parquet/orc make zstd splittable). Spark picks the gzip
    decode path from the extension automatically; no conf needed."""
    import tempfile as _tf

    key = staging_key(sf_dir, "documents")
    if key not in _GZ_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_gzjsonl_")
        (
            load_table(spark, sf_dir, "documents")
            .repartition(GZ_JSONL_FILES)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .json(tmp.name + "/docs")
        )
        _GZ_STAGED[key] = tmp
    docs = spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).json(_GZ_STAGED[key].name + "/docs")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_md5"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_md5"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Q48 — map-function sweep: the MAP face of the scalar-function surface
# (§2.2's last unchecked cell; arrays = q35, json = q24, higher-order =
# q38). Per order, the line→quantity MAP is built from pre-aggregated
# entries (fixture linenumbers are NOT unique per order, so a naive
# map_from_entries would throw DUPLICATE_MAP_KEY — the dedup aggregate
# is part of the semantics), then every map primitive must agree with
# its relational equivalent, which is exactly what the oracle computes
# map-free.
# --------------------------------------------------------------------------
@query(
    "q48_map_functions",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_linenumber, sum(l_quantity) AS q
      FROM lineitem WHERE l_orderkey < 1000
      GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_keys,
           round(min(CASE WHEN l_linenumber = 1 THEN q END), 4) AS qty1,
           round(sum(q), 4) AS sum_vals,
           CAST(count(CASE WHEN q >= 25 THEN 1 END) AS BIGINT) AS n_big,
           CAST(min(l_linenumber) AS BIGINT) AS first_key,
           round(2 * sum(q), 4) AS sum_doubled
    FROM per GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map primitives vs relational ground truth: size ≡ distinct-key
    count, try_element_at ≡ keyed lookup (NULL where line 1 is absent —
    ~80% of fixture orders, so the null path is live), map_values
    fold ≡ SUM, map_filter ≡ filtered count, map_keys order ≡ MIN (keys
    sorted at build), transform_values ≡ scalar rewrite. Integer-valued
    quantities keep every fold FP-exact regardless of either engine's
    summation order.

    Scale: one (orderkey, linenumber) pre-aggregate + one per-order
    collect_list — both partial-agg'd map-side; maps stay row-local and
    never cross the driver compare (only scalars do)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.filter(F.col("l_orderkey") < 1000)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum("l_quantity").alias("q"))
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "q")))
    )
    mapped = per.groupBy("l_orderkey").agg(m.alias("m"))
    doubled = F.transform_values(F.col("m"), lambda k, v: 2 * v)
    return mapped.select(
        "l_orderkey",
        F.size("m").cast("bigint").alias("n_keys"),
        r4(F.try_element_at("m", F.lit(1))).alias("qty1"),
        r4(
            F.aggregate(
                F.map_values("m"), F.lit(0.0), lambda acc, v: acc + v
            )
        ).alias("sum_vals"),
        F.size(F.map_filter("m", lambda k, v: v >= 25))
        .cast("bigint")
        .alias("n_big"),
        F.element_at(F.map_keys("m"), 1).cast("bigint").alias("first_key"),
        r4(
            F.aggregate(
                F.map_values(doubled), F.lit(0.0), lambda acc, v: acc + v
            )
        ).alias("sum_doubled"),
    ).orderBy("l_orderkey")


# --------------------------------------------------------------------------
# Q49 — RECURSIVE CTE (new in Spark 4.0, SPARK-24497): iterative
# hierarchy traversal expressed declaratively. Synthetic parent-child
# over part (parent = partkey DIV 10: a stable ~5-level decimal trie),
# each node walked to its root with depth tracking. Execution is the
# classic recursive-union loop: each step is one distributed scan of the
# previous step's frontier — linear in (rows × chain length), the same
# shape as d5's label propagation but engine-managed.
# --------------------------------------------------------------------------
@query(
    "q49_recursive_cte",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM part
      UNION ALL
      SELECT node, cur // 10, depth + 1 FROM anc WHERE cur >= 10
    )
    SELECT CAST(cur AS BIGINT) AS root, CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(node) AS BIGINT) AS sum_nodes
    FROM anc WHERE cur < 10
    GROUP BY root, depth ORDER BY root, depth
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every part walked up the decimal trie to its single-digit root;
    output counts parts per (root, chain depth). Recursion terminates
    structurally (cur strictly shrinks), well under Spark's default
    recursion limit; DuckDB replays the identical WITH RECURSIVE."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q49_part")
    return spark.sql("""
      WITH RECURSIVE anc AS (
        SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM q49_part
        UNION ALL
        SELECT node, cur DIV 10, depth + 1 FROM anc WHERE cur >= 10
      )
      SELECT CAST(cur AS BIGINT) AS root, CAST(depth AS BIGINT) AS depth,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(node) AS BIGINT) AS sum_nodes
      FROM anc WHERE cur < 10
      GROUP BY root, depth ORDER BY root, depth""")


# --------------------------------------------------------------------------
# Q50 — UNPIVOT: wide→long reshaping, the inverse face of Q25's PIVOT
# (completing the reshape pair). Spark's df.unpivot is a zero-shuffle
# narrow explode of measure columns; the oracle replays it as the
# portable UNION ALL rewrite.
# --------------------------------------------------------------------------
@query(
    "q50_unpivot",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 4)      AS sum_qty,
             round(sum(l_extendedprice), 4) AS sum_price,
             round(sum(l_discount), 4)      AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM base
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM base
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM base
    ORDER BY l_returnflag, measure
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag measure columns unpivoted to (flag, measure, val)
    long format. The unpivot itself is narrow (each input row emits its
    measures locally — no shuffle beyond the feeding aggregate), so the
    reshape adds nothing to the 100 TB cost of the aggregation it
    follows."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.sum("l_extendedprice")).alias("sum_price"),
        r4(F.sum("l_discount")).alias("sum_disc"),
    )
    return base.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "val",
    ).orderBy("l_returnflag", "measure")


# --------------------------------------------------------------------------
# Q51 — LATERAL join: per-row correlated table subquery (top-3 customers
# per nation by balance), the join face q26's scalar correlated subquery
# and q8's global window top-k don't cover. Catalyst decorrelates the
# lateral into a ranked window join — no per-row re-execution.
# --------------------------------------------------------------------------
@query(
    "q51_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 4) AS c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 3
    ) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance for EACH nation via a
    correlated LATERAL subquery with ORDER BY + LIMIT — identical SQL on
    both engines. Ties inside the top-3 are broken by (c_acctbal DESC,
    c_name), making the selected set total-order deterministic."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("q51_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "q51_customer"
    )
    return spark.sql("""
      SELECT n.n_name, t.c_name, round(t.c_acctbal, 4) AS c_acctbal
      FROM q51_nation n, LATERAL (
        SELECT c_name, c_acctbal FROM q51_customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 3
      ) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")


# --------------------------------------------------------------------------
# F10 — VARIANT semi-structured type (new in Spark 4.0): props parsed
# ONCE into the binary variant encoding, then typed path extraction via
# variant_get — the open-schema ingestion path for JSON whose shape is
# not declared up front (q24 is the closed-schema from_json face). The
# string-typed re-extraction (digit length) pins that the variant
# round-trips values, not just numbers that happen to cast.
# --------------------------------------------------------------------------
@query(
    "f10_variant_json",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(sum(length(props->>'$.k')) AS BIGINT) AS sum_k_digits
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def f10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props → VARIANT via parse_json, per-type aggregation of a
    bigint-typed get and a string-typed get of the same path. All
    expressions are JVM-side; at 100 TB the variant parse is a narrow
    projection and (with a parquet VARIANT column) Spark 4 shreds
    variants into columnar form so path gets keep pushdown/pruning."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.expr(
                "variant_get(parse_json(props), '$.k', 'bigint')"
            ).alias("k"),
            F.length(
                F.expr("variant_get(parse_json(props), '$.k', 'string')")
            ).alias("k_digits"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("k_digits").cast("bigint").alias("sum_k_digits"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q52 — DECIMAL-exact money aggregation. The reference's only numeric
# type is Python float (mapper.py:30-33 parses x,y as float); the engine
# declares the exact fixed-point surface a billing-grade aggregate needs.
# Every intermediate stays in decimal (no FP drift): the per-row net is
# rounded HALF_UP to the 4-decimal money grid and cast back to
# DECIMAL(18,4) on BOTH sides, so decimal sums are bit-exact across
# engines; only the final presentation casts to double.
# --------------------------------------------------------------------------
@query(
    "q52_decimal_money",
    oracle="""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,4)) AS p,
             CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) *
                  (CAST(1 AS DECIMAL(18,4)) -
                   CAST(l_discount AS DECIMAL(18,4))), 4)
                  AS DECIMAL(18,4)) AS n
      FROM lineitem)
    SELECT l_returnflag, count(*) AS n_items,
           CAST(sum(p) AS DOUBLE) AS gross,
           CAST(sum(n) AS DOUBLE) AS net,
           round(CAST(sum(n) AS DOUBLE)/count(*), 4) AS avg_net
    FROM d GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-exact revenue per return flag.

    DECIMAL(18,4) × (1 − DECIMAL(18,4)) is exact on both engines
    (Spark: precision 38/scale 8 intermediate, no precision loss;
    DuckDB: width 37/scale 8), so rounding THAT product to the money
    grid is deterministic — summing doubles instead would make the
    result order-dependent in the last ulp. round() is HALF_UP on
    positive values in both engines.

    Scale: identical plan shape to q1 (partial+final hash agg on a
    3-value key); decimal sums carry 16-byte state per group — the
    exactness costs nothing at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    net = F.round(
        price * (F.lit(1).cast("decimal(18,4)") - disc), 4
    ).cast("decimal(18,4)")
    return (
        li.select("l_returnflag", price.alias("p"), net.alias("n"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("p").cast("double").alias("gross"),
            F.sum("n").cast("double").alias("net"),
            F.round(
                F.sum("n").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_net"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q53 — INTERVAL-type arithmetic: literal day/minute intervals and a
# per-row VARIABLE interval via make_interval. Completes the temporal
# surface q36 opened (q36 covers calendar scalars; this covers the
# interval algebra). The elapsed-seconds check deliberately avoids
# timestampdiff/date_diff, whose boundary-crossing-vs-elapsed semantics
# differ between Spark and DuckDB — epoch subtraction is dialect-free.
# --------------------------------------------------------------------------
@query(
    "q53_interval_arith",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS ts_p90,
           ts - INTERVAL 7 DAY AS ts_m7d,
           ts + to_minutes(event_id % 120) AS ts_var,
           CAST(epoch(ts + to_minutes(event_id % 120)) - epoch(ts)
                AS BIGINT) AS var_secs
    FROM events ORDER BY event_id LIMIT 500
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic sweep over event timestamps.

    All four derived columns are narrow JVM projections (one codegen
    stage); at 100 TB this is a pure map with full pushdown. The
    fixture timestamps are all >7 days past the epoch so ts_m7d can't
    underflow, and event_id%120 minutes never crosses a DST boundary
    (session timezone pinned UTC engine-wide in session.configure)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "ts",
            (F.col("ts") + F.expr("INTERVAL '90' MINUTE")).alias("ts_p90"),
            (F.col("ts") - F.expr("INTERVAL '7' DAY")).alias("ts_m7d"),
            (
                F.col("ts")
                + F.expr(
                    "make_interval(0,0,0,0,0, CAST(event_id % 120 AS INT), 0)"
                )
            ).alias("ts_var"),
        )
        .withColumn(
            "var_secs",
            (F.unix_timestamp("ts_var") - F.unix_timestamp("ts"))
            .cast("bigint"),
        )
        .drop("ts")
        .orderBy("event_id")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q54 — collation-aware grouping (Spark 4.0 string collations,
# SPARK-46830): case-insensitive aggregation via UTF8_LCASE instead of
# the lower()-rewrite idiom. The reference has no string surface at all;
# the engine declares the collated comparison face because corpus joins
# on user-supplied keys (hosts, tags, emails) are case-insensitive in
# practice. The mixed-case input is synthesized in-query (fixtures are
# clean lowercase) so the collation genuinely merges 3 case variants
# per key — lower() canonicalizes only the OUTPUT label.
# --------------------------------------------------------------------------
@query(
    "q54_collation_groupby",
    oracle="""
    WITH m AS (SELECT CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                           WHEN event_id % 3 = 1 THEN
                             upper(event_type[1]) || lower(event_type[2:])
                           ELSE event_type END AS mixed, value FROM events)
    SELECT lower(mixed) AS etype, count(*) AS n, round(sum(value), 4) AS total
    FROM m GROUP BY lower(mixed) ORDER BY etype
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group mixed-case event types under the UTF8_LCASE collation.

    The grouping key is `collate(mixed, 'UTF8_LCASE')` — the hash
    exchange partitions on the collation-normalized key directly, so
    UPPER/Initcap/lower variants of one type land in one group without
    rewriting the data. DuckDB replays with an explicit lower() group
    key (simple case folding ≡ UTF8_LCASE on this ASCII corpus).

    Scale: same one-exchange agg as q15; collation support means the
    normalization travels with the TYPE (joins, aggs, distinct all
    inherit it) instead of being re-spelled per query."""
    ev = load_table(spark, sf_dir, "events")
    mixed = (
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.initcap("event_type"))
        .otherwise(F.col("event_type"))
    )
    return (
        ev.select(F.collate(mixed, "UTF8_LCASE").alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("etype"), "n", "total"
        )
        .orderBy("etype")
    )


# --------------------------------------------------------------------------
# F11 — schema-evolution read (mergeSchema): a corpus written in batches
# whose schema GREW over time (a `quality` score column added mid-stream)
# read back as one table, old batches surfacing NULL for the new column.
# The operational reality of any long-lived 100 TB store: you cannot
# rewrite history when the pipeline adds a field.
# --------------------------------------------------------------------------
_EVOLVED_STAGED: dict[str, object] = {}


@query(
    "f11_schema_evolution",
    oracle="""
    WITH m AS (SELECT lang, n_chars,
          CASE WHEN doc_id % 2 = 1 THEN round(ln(1 + n_chars), 4) END
            AS quality
        FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(count(quality) AS BIGINT) AS n_scored,
           round(sum(quality), 4) AS sum_quality,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM m GROUP BY lang ORDER BY lang
    """,
)
def f11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents as two parquet batches — v1 (even doc_ids)
    written BEFORE the `quality` column existed, v2 (odd doc_ids) with
    it — then read both through `mergeSchema=true` and aggregate with
    null-skipping count/sum so the evolved column's NULL back-fill is
    load-bearing in the oracle compare.

    Scale: mergeSchema reconciles footers at planning time (one footer
    read per file — at 100 TB pin the superset schema in a catalog /
    `spark.read.schema(...)` instead of paying per-file merge, which
    this entry documents as the production form); the scan itself stays
    columnar with pushdown, and old files simply lack the pruned
    column's pages. The oracle replays from the ORIGINAL table, so a
    dropped row, a mis-back-filled NULL, or a batch routed to the wrong
    schema flips the hash."""
    import tempfile as _tf

    key = staging_key(sf_dir, "documents")
    if key not in _EVOLVED_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_evolve_")
        d = load_table(spark, sf_dir, "documents")
        d.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "source", "n_chars"
        ).write.mode("overwrite").parquet(tmp.name + "/docs/v1")
        d.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.round(F.log1p("n_chars"), 4).alias("quality"),
        ).write.mode("overwrite").parquet(tmp.name + "/docs/v2")
        _EVOLVED_STAGED[key] = tmp
    root = _EVOLVED_STAGED[key].name
    merged = spark.read.option("mergeSchema", "true").parquet(
        root + "/docs/v1", root + "/docs/v2"
    )
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("quality").alias("n_scored"),
            F.round(F.sum("quality"), 4).alias("sum_quality"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F12 — bucketed-table co-located join, driver-checked. The bucketed
# sink (`sources/sinks.write_bucketed`) was previously pytest-only
# surface; this entry runs the read side end-to-end: both join sides
# persisted hash-bucketed on the join key, then sort-merge-joined with
# ZERO exchange under the join — the shuffle-once-at-write-time lever
# for repeated 100 TB fact joins.
# --------------------------------------------------------------------------
_BUCKETED_STAGED: dict[str, object] = {}


@query(
    "f12_bucketed_join",
    oracle="""
    SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    ORDER BY c_mktsegment, o_orderstatus
    """,
)
def f12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(segment, status) order stats through BUCKETED tables.

    Staging writes orders and customer hash-bucketed (8 buckets) and
    bucket-sorted on the custkey; the join carries a `merge` hint so
    the plan is a SortMergeJoin whose BOTH inputs read co-located
    buckets directly (`Bucketed: true`, no Exchange under the join —
    pinned in tests/test_plans.py). The layout must never change
    results: the oracle replays the plain join over the ORIGINAL
    parquet.

    Scale: at 100 TB the fact-table shuffle is paid ONCE at ingest
    (write_bucketed's repartition) and amortized over every subsequent
    key join/aggregation; bucket count is the parallelism knob and
    would be sized to cluster cores × small multiple, not 8."""
    from k_means_clustering_via_map_reduce_spark.sources.sinks import (
        write_bucketed,
    )

    key = staging_key(sf_dir, "orders")
    if _BUCKETED_STAGED.get("key") != key:
        # A previous PROCESS may have left the managed-table location on
        # disk while this session's in-memory catalog has no entry for
        # it — saveAsTable then refuses with LOCATION_ALREADY_EXISTS.
        # Drop catalog entries AND stale locations before staging.
        import os
        import shutil as _sh
        from urllib.parse import urlparse as _urlparse

        warehouse = _urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        ).path
        for tbl in ("f12_orders_b", "f12_customer_b"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            _sh.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
            ),
            "f12_orders_b",
            ("o_custkey",),
            8,
            sort_cols=("o_custkey",),
        )
        write_bucketed(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            "f12_customer_b",
            ("c_custkey",),
            8,
            sort_cols=("c_custkey",),
        )
        _BUCKETED_STAGED["key"] = key
    ob = spark.table("f12_orders_b")
    cb = spark.table("f12_customer_b")
    return (
        ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .orderBy("c_mktsegment", "o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q55 — IGNORE NULLS navigation: per-user forward fill (last click value
# at-or-before each event) and backward fill (next click value
# at-or-after), over NULLs synthesized from the event type. Completes
# the window family's null-navigation face (q33 gap-fills a SERIES;
# this navigates sparse values inside an EVENT sequence — the
# last-known-attribute idiom of sessionized telemetry).
# --------------------------------------------------------------------------
@query(
    "q55_ignore_nulls_nav",
    oracle="""
    WITH b AS (SELECT event_id, user_id, ts,
          CASE WHEN event_type = 'click' THEN round(value, 4) END AS cv
        FROM events)
    SELECT event_id, user_id,
           last_value(cv IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_click_v,
           first_value(cv IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_click_v
    FROM b ORDER BY event_id LIMIT 1000
    """,
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward/backward fill of the sparse click value per user.

    Both fills share ONE user_id hash exchange (two frames over the
    same partitioning+ordering); boundary rows before a user's first
    click / after their last stay NULL on both engines — the
    null-preserving corner the IGNORE NULLS modifier is usually
    assumed, not checked, to honor.

    Scale: one exchange + per-partition sort, the q11 shape; the fill
    itself is frame-local state (a single remembered value), not a
    join against the click subset."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_type") == "click", F.round("value", 4)
        ).alias("cv"),
    )
    w_ff = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        base.select(
            "event_id",
            "user_id",
            F.last("cv", ignorenulls=True).over(w_ff).alias("last_click_v"),
            F.first("cv", ignorenulls=True).over(w_bf).alias("next_click_v"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q56 — ordered-set string aggregation (LISTAGG, Spark 4.0 SPARK-42746):
# DISTINCT values concatenated under an explicit WITHIN GROUP ordering.
# Without the ordering clause the result is partition-order-dependent —
# the classic nondeterminism trap this entry pins shut on both engines.
# --------------------------------------------------------------------------
@query(
    "q56_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ','
                      ORDER BY o_orderstatus) AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct order statuses per priority as one ordered CSV cell.

    Scale: LISTAGG is the one aggregate whose STATE is output-sized —
    fine here (≤3 statuses) and for any bounded-domain column, but at
    100 TB an unbounded listagg is a driver-killer by construction;
    the engine's contract is ordered-DISTINCT over bounded domains
    (beyond that, keep rows relational — explode is free, concat is
    not)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q56_orders"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               count(*) AS n
        FROM q56_orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# Q57 — deterministic MODE + exact MEDIAN per group. Spark's
# mode(expr, true) breaks frequency ties toward the LOWEST value — the
# oracle replays that contract relationally (count → rank by (cnt DESC,
# value)) instead of trusting DuckDB's own arbitrary-tie mode; median is
# interpolated percentile(0.5) on both engines (q29's h-formula).
# --------------------------------------------------------------------------
@query(
    "q57_mode_median",
    oracle="""
    WITH c AS (SELECT event_type, user_id % 10 AS b, count(*) AS cnt
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, b, row_number() OVER
            (PARTITION BY event_type ORDER BY cnt DESC, b) AS rk FROM c)
    SELECT e.event_type, r.b AS mode_bucket,
           round(median(e.value), 4) AS med_value, count(*) AS n
    FROM events e JOIN r ON e.event_type = r.event_type AND r.rk = 1
    GROUP BY e.event_type, r.b ORDER BY e.event_type
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common user bucket (deterministic tie-break) and exact
    median value per event type.

    Scale: mode's state is a per-group value→count map — bounded here
    (10 buckets) but corpus-sized for high-cardinality columns, where
    t5's sketches are the production substitute; exact median requires
    the full sorted group (Spark buffers per group), with
    approx_percentile as the bounded-memory fallback. Declaring the
    exact forms WITH their memory contracts is the point of this
    entry."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("mode(user_id % 10, true)").alias("mode_bucket"),
            F.round(F.expr("median(value)"), 4).alias("med_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# F13 — XML ingestion (Spark 4.0 built-in XML, SPARK-44751): from_xml
# with an explicit schema over element AND attribute extraction. The
# last text-interchange format in the matrix (f1 JSONL, f2 CSV, f7 log
# lines, f10 VARIANT, f13 XML). XML is synthesized in-query from
# document fields, so the oracle replays the SAME fields directly —
# from_xml is pinned against ground truth, and the per-row id-attribute
# equality check (n_id_ok == n_docs) proves row-level parse fidelity,
# not just aggregate luck.
# --------------------------------------------------------------------------
@query(
    "f13_xml_ingest",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           count(*) AS n_id_ok
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def f13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse per-document XML records (attribute `_id`, elements
    `lang`/`chars`) with an explicit schema and aggregate per language.

    Scale: from_xml is a narrow JVM projection — no UDF, no shuffle
    before the aggregate; a 100 TB XML corpus reads as text lines (f7's
    splittable contract) with from_xml as the parse stage. Schema
    inference is prohibited engine-wide (SURVEY.md §1.5): the explicit
    schema keeps the parse deterministic and malformed records NULL
    (ANSI-safe) instead of corpus-dependent."""
    d = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<doc id="'),
        F.col("doc_id").cast("string"),
        F.lit('"><lang>'),
        F.col("lang"),
        F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars></doc>"),
    )
    parsed = d.select("doc_id", xml.alias("x")).select(
        "doc_id",
        F.from_xml("x", "_id BIGINT, lang STRING, chars BIGINT").alias("p"),
    )
    return (
        parsed.select(
            "doc_id",
            F.col("p._id").alias("xid"),
            F.col("p.lang").alias("lang"),
            F.col("p.chars").alias("chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").alias("sum_chars"),
            F.sum(F.when(F.col("xid") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_id_ok"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q58 — multiplicity-preserving set ops: INTERSECT ALL (bag semantics —
# min of per-side multiplicities) beside UNION's distinct fold.
# Completes the set-op family q12 (EXCEPT ALL / UNION ALL) and q23
# (INTERSECT) opened: every ANSI set operator now has a driver-checked
# entry in exactly one multiplicity flavor that distinguishes it from
# the others. Non-vacuous on fixtures: the high-value key list carries
# repeat customers (507 bag rows vs 148 distinct at sf0.001).
# --------------------------------------------------------------------------
@query(
    "q58_set_ops_all",
    oracle="""
    WITH hi AS (SELECT o_custkey AS k FROM orders
                WHERE o_totalprice > 150000),
    op AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
    ia AS (SELECT k FROM hi INTERSECT ALL SELECT k FROM op),
    ud AS (SELECT k FROM hi UNION SELECT k FROM op)
    SELECT 'intersect_all' AS op, count(*) AS n,
           count(DISTINCT k) AS n_distinct FROM ia
    UNION ALL
    SELECT 'union_distinct' AS op, count(*) AS n,
           count(DISTINCT k) AS n_distinct FROM ud
    ORDER BY op
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL vs UNION(distinct) multiplicity counts over the
    same two keyed inputs.

    Scale: Spark plans INTERSECT ALL as one hash aggregate per side +
    a join on the key with generate-style multiplicity replay — never a
    pair blow-up; UNION distinct is union + hash aggregate. Both
    shapes are single-exchange on the key."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q58_orders"
    )
    return spark.sql(
        """
        WITH hi AS (SELECT o_custkey AS k FROM q58_orders
                    WHERE o_totalprice > 150000),
        op AS (SELECT o_custkey AS k FROM q58_orders
               WHERE o_orderstatus = 'O'),
        ia AS (SELECT k FROM hi INTERSECT ALL SELECT k FROM op),
        ud AS (SELECT k FROM hi UNION SELECT k FROM op)
        SELECT 'intersect_all' AS op, count(*) AS n,
               count(DISTINCT k) AS n_distinct FROM ia
        UNION ALL
        SELECT 'union_distinct' AS op, count(*) AS n,
               count(DISTINCT k) AS n_distinct FROM ud
        ORDER BY op
        """
    )


# --------------------------------------------------------------------------
# F14 — catalog DML: CTAS + INSERT INTO, driver-checked. The
# table-lifecycle surface a user migrating FROM the reference's
# file-shuffling scripts TO the engine actually touches first: create a
# managed table from a query, append a second batch with INSERT INTO,
# read the union back. (UPDATE/DELETE on raw parquet require a
# transactional table format; the engine's declared equivalent is f6's
# MERGE rewrite + partition-level copy-on-write.)
# --------------------------------------------------------------------------
@query(
    "f14_ctas_insert",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 4)
             AS total_bal
    FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def f14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS the BUILDING segment into a managed parquet table, INSERT
    INTO the MACHINERY segment, aggregate the combined table. The
    oracle reads the ORIGINAL customer table, so a lost INSERT batch,
    a double-applied CTAS, or append-vs-overwrite confusion flips the
    hash.

    Scale: CTAS/INSERT INTO are the same distributed parquet writes as
    df.write (one file per task); INSERT INTO appends new files without
    touching existing ones — at 100 TB the append pattern composes
    with partitionBy (f3) and bucketing (f12), and f8's compaction
    handles the small-file accumulation INSERT streams create."""
    import shutil as _sh
    from urllib.parse import urlparse as _urlparse

    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "f14_customer"
    )
    # Fresh table per run: CTAS must see neither a catalog entry nor a
    # stale warehouse location from a previous process (f12's lesson).
    import os

    warehouse = _urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    spark.sql("DROP TABLE IF EXISTS f14_seg")
    _sh.rmtree(os.path.join(warehouse, "f14_seg"), ignore_errors=True)
    spark.sql(
        """
        CREATE TABLE f14_seg USING parquet AS
        SELECT c_custkey, c_mktsegment, c_acctbal FROM f14_customer
        WHERE c_mktsegment = 'BUILDING'
        """
    )
    spark.sql(
        """
        INSERT INTO f14_seg
        SELECT c_custkey, c_mktsegment, c_acctbal FROM f14_customer
        WHERE c_mktsegment = 'MACHINERY'
        """
    )
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n,
               round(sum(c_acctbal), 4) AS total_bal
        FROM f14_seg GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


# --------------------------------------------------------------------------
# Q59 — null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
# MATCH each other, unlike plain = (where NULL = NULL is NULL and the
# rows silently vanish from an inner join). The join-predicate face of
# q40/q42's three-valued-logic family, with NULLs synthesized on BOTH
# sides so the NULL×NULL pair block is live in the result.
# --------------------------------------------------------------------------
@query(
    "q59_null_safe_join",
    oracle="""
    WITH a AS (SELECT event_id, CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE user_id END AS k FROM events),
    b AS (SELECT event_id AS b_id, CASE WHEN event_id % 11 = 0 THEN NULL
                    ELSE user_id END AS k FROM events)
    SELECT count(*) AS n_pairs,
           CAST(sum(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair counts through a null-safe equi-join, split into the
    NULL-key block vs keyed matches.

    Scale: `<=>` remains a HASH-joinable equi-predicate (NULL hashes
    like any value under null-safe semantics) — Spark plans the same
    shuffled hash join as plain `=`, it does NOT degrade to a nested
    loop; but every NULL on both sides lands in ONE key group, so at
    100 TB a null-heavy column makes `<=>` the textbook skew key —
    filter the NULL block out and union it back (or salt, q34) when
    nulls dominate."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("user_id"))
        .alias("k"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.when(F.col("event_id") % 11 == 0, None)
        .otherwise(F.col("user_id"))
        .alias("k"),
    )
    return a.join(b, a.k.eqNullSafe(b.k)).groupBy().agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(a.k.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_pairs"),
    )


# --------------------------------------------------------------------------
# Q60 — bivariate statistical aggregates: corr / covar_samp /
# stddev_samp per group. The df.stat face of the aggregate surface —
# what a feature-engineering pass computes before training. 6-decimal
# rounding: these are ratios of large co-moment sums, stable far beyond
# 1e-6 relative despite distributed summation order.
# --------------------------------------------------------------------------
@query(
    "q60_corr_covar",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
           round(stddev_samp(l_quantity), 6) AS qty_sd
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity/price correlation, quantity/discount covariance, and
    quantity spread per return flag.

    Scale: Spark computes all three via single-pass mergeable co-moment
    state (Welford-style partial aggregation) — one exchange of
    (groups × a few doubles), the same partial+final shape as q1; no
    second pass, no centering join."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "qty_disc_covar"
            ),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_sd"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q61 — time-weighted average over irregular samples: each value
# weighted by its holding interval (seconds until the next sample in
# the same series), the hypertable/metrics operator a plain avg gets
# WRONG whenever sampling density correlates with value. dt is floored
# to whole seconds on BOTH sides (Spark unix_timestamp floors; DuckDB
# CAST(epoch) ROUNDS — the q39 boundary divergence, pinned here with an
# explicit floor in the oracle).
# --------------------------------------------------------------------------
@query(
    "q61_time_weighted_avg",
    oracle="""
    WITH b AS (SELECT user_id % 100 AS ub, event_id, ts, value AS v
               FROM events),
    l AS (SELECT ub, event_id, ts, v,
                 lead(ts) OVER (PARTITION BY ub ORDER BY ts, event_id)
                   AS nxt FROM b),
    d AS (SELECT ub, v, CAST(floor(epoch(nxt)) - floor(epoch(ts))
                             AS BIGINT) AS dt
          FROM l WHERE nxt IS NOT NULL)
    SELECT ub, count(*) AS n_iv, CAST(sum(dt) AS BIGINT) AS total_s,
           round(sum(v*dt)/sum(dt), 6) AS tw_avg,
           round(avg(v), 6) AS plain_avg
    FROM d GROUP BY ub ORDER BY ub
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted vs plain average per user bucket; the final
    (open-ended) sample of each series carries no interval and is
    excluded on both sides — the standard last-point convention.

    Scale: ONE series-key exchange serves both the lead() interval
    construction and the aggregate (q41's shared-exchange idiom); the
    weighting itself is row-local arithmetic. The plain_avg column sits
    beside tw_avg so the fixture demonstrates they genuinely diverge
    (sampling density is value-correlated here)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("ub").orderBy("ts", "event_id")
    base = (
        ev.select(
            (F.col("user_id") % 100).alias("ub"),
            "event_id",
            "ts",
            F.col("value").alias("v"),
        )
        .withColumn("nxt", F.lead("ts").over(w))
        .withColumn(
            "dt",
            (F.unix_timestamp("nxt") - F.unix_timestamp("ts"))
            .cast("bigint"),
        )
    )
    return (
        base.filter(F.col("dt").isNotNull())
        .groupBy("ub")
        .agg(
            F.count(F.lit(1)).alias("n_iv"),
            F.sum("dt").alias("total_s"),
            F.round(F.sum(F.col("v") * F.col("dt")) / F.sum("dt"), 6)
            .alias("tw_avg"),
            F.round(F.avg("v"), 6).alias("plain_avg"),
        )
        .orderBy("ub")
    )


# --------------------------------------------------------------------------
# Q62 — TPC-H Q5 shape: the classic CYCLIC join graph (local-supplier
# volume). Unlike q4's pure star, the c_nationkey = s_nationkey edge
# closes a cycle customer–orders–lineitem–supplier–customer, the
# canonical join-ORDER benchmark: a bad order materializes the
# customer×supplier cross-nation space, a good one keeps the fact table
# flowing through two hash joins plus broadcast dims. The reference's
# substrate (one map + one reduce, master.py:215-258) cannot express a
# multi-join at all; Catalyst picks the order and AQE re-plans at
# runtime.
# --------------------------------------------------------------------------
@query(
    "q62_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation from lineitems whose customer and supplier
    share a nation, one region + one order-year selected.

    Scale plan: orders⋈lineitem is the only big shuffle pair (both
    sides hash on orderkey); supplier/nation/region are explicit
    broadcasts so the l_suppkey + the cycle-closing c_nationkey =
    s_nationkey predicate evaluate map-side; the o_orderdate range
    prunes the fact flow before any join. At 100 TB the same plan
    holds with customer promoted to a shuffle join — AQE decides from
    runtime sizes, nothing here hand-schedules it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (
                F.col("o_orderdate")
                >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'")
            )
            & (
                F.col("o_orderdate")
                < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'")
            )
        )
        .groupBy("n_name")
        .agg(
            r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Q63 — approximate COUNT(DISTINCT) with a checked error bound: the
# sketch-aggregate face of q9's exact distinct. HLL++ register merge is
# max() — commutative and associative — so the approx value is a pure
# function of the VALUE SET, independent of partitioning and merge
# order; the query asserts the estimate lands within 10% of exact
# (rsd=0.02 ⇒ 5σ) and ships the exact count + the bound verdict, which
# the oracle reproduces engine-independently. At 100 TB this is the
# aggregate that turns a two-shuffle exact distinct into one narrow
# mergeable-state pass.
# --------------------------------------------------------------------------
@query(
    "q63_approx_distinct_bound",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS approx_within_10pct
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs HLL++ distinct customers per order priority; the
    approx value itself is engine-internal (register layout differs
    across engines), so the contract column is the BOUND CHECK, which
    both engines can state exactly."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        )
        .select(
            "o_orderpriority",
            "exact_custs",
            (
                F.abs(F.col("approx") - F.col("exact_custs"))
                <= 0.10 * F.col("exact_custs")
            ).alias("approx_within_10pct"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# F16 — malformed-record ingest policy: real corpus files carry broken
# rows, and the loss policy (drop vs quarantine) must be explicit, not
# incidental. The staging writes a pipe-separated CSV with every
# doc_id % 7 == 0 row deliberately corrupted (non-numeric n_chars);
# DROPMALFORMED must then reproduce EXACTLY the clean subset of the
# original parquet (the oracle's predicate replays the corruption
# rule), and the PERMISSIVE + columnNameOfCorruptRecord quarantine path
# is pinned in tests/test_sources.py. Schema-on-read is what makes the
# policy enforceable — an inferred schema would silently widen n_chars
# to string and "parse" the broken rows.
# --------------------------------------------------------------------------
_F16_STAGED: dict[tuple, object] = {}

F16_BAD_MOD = 7


def staged_malformed_csv(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents as pipe-separated CSV text with doc_id % 7 == 0
    rows corrupted (n_chars field replaced by a non-numeric token)."""
    import tempfile as _tf

    key = staging_key(sf_dir, "documents")
    if key not in _F16_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_badcsv_")
        (
            load_table(spark, sf_dir, "documents")
            .select(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    F.col("lang"),
                    F.col("source"),
                    F.when(
                        F.col("doc_id") % F16_BAD_MOD == 0, F.lit("CORRUPT")
                    ).otherwise(F.col("n_chars").cast("string")),
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(tmp.name + "/csv")
        )
        _F16_STAGED[key] = tmp
    return _F16_STAGED[key].name + "/csv"


F16_SCHEMA = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"


@query(
    "f16_malformed_csv",
    oracle=f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_ok,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % {F16_BAD_MOD} <> 0
    GROUP BY lang ORDER BY lang
    """,
)
def f16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang survivor stats reading the corrupted CSV under
    DROPMALFORMED: exactly the rows the corruption rule spared, with
    values bit-equal to the original parquet."""
    path = staged_malformed_csv(spark, sf_dir)
    survivors = (
        spark.read.schema(F16_SCHEMA)
        .options(sep="|", mode="DROPMALFORMED")
        .csv(path)
    )
    return (
        survivors.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_ok"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q64 — TPC-H Q21 shape: DOUBLE correlation on the same fact table
# (EXISTS + NOT EXISTS, both correlated to the outer lineitem on
# orderkey with a suppkey inequality). The hardest standard
# decorrelation case after the q44-q47 family: a naive plan rescans
# lineitem per outer row; the right plan is ONE pass feeding a
# LeftSemi and a LeftAnti hash join (pinned in tests/test_plans.py).
# Adapted to the fixture schema ("late" → l_returnflag = 'R'): blamed
# suppliers — the only supplier who returned a line in a finished
# multi-supplier order.
# --------------------------------------------------------------------------
@query(
    "q64_blamed_supplier",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by count of finished multi-supplier orders
    where they alone returned a line.

    Scale plan: the fact table is read once per correlation arm, each
    arm reduced to (orderkey, suppkey) before its join — the semi arm
    keeps any-other-supplier orders, the anti arm removes
    other-supplier-returned ones; both hash on l_orderkey, the same
    key the base flow already carries, so AQE coalesces the exchanges.
    No per-row re-scan, no nested loop (pinned); supplier is a
    broadcast dim. This is the plan Catalyst's decorrelation produces
    from the SQL form too — the explicit semi/anti build keeps the
    intent visible."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    base = (
        l1.filter(F.col("l1.l_returnflag") == "R")
        .join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("l1.l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
    )
    semi = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    anti = semi.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        anti.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q65 — TPC-H Q2 shape: the multi-column correlated MIN subquery whose
# aggregate ranges over a JOIN RESULT (lineitem ⋈ supplier ⋈ nation ⋈
# region), not a base table — the one classic decorrelation pattern
# q44-q47/q64 do not cover. The fixture has no partsupp, so lineitem
# plays it: supply cost = l_extendedprice / l_quantity (an IEEE-exact
# double division both engines compute identically, so the
# min-equality filter carries no boundary-flip risk). Min-cost
# European supplier per size-15 part. Entered through the SQL surface
# so Catalyst's scalar-subquery decorrelation actually runs: the right
# plan computes ONE per-partkey min aggregate over the
# region-restricted join and joins it back — no per-outer-row re-scan,
# no nested loop (pinned in tests/test_plans.py).
# --------------------------------------------------------------------------
_Q65_BODY = """
    SELECT DISTINCT round(s.s_acctbal, 4) AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_type,
           round(l.l_extendedprice / l.l_quantity, 4) AS supply_cost
    FROM %(part)s p
    JOIN %(lineitem)s l ON p.p_partkey = l.l_partkey
    JOIN %(supplier)s s ON s.s_suppkey = l.l_suppkey
    JOIN %(nation)s n ON s.s_nationkey = n.n_nationkey
    JOIN %(region)s r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND l.l_extendedprice / l.l_quantity = (
        SELECT min(l2.l_extendedprice / l2.l_quantity)
        FROM %(lineitem)s l2
        JOIN %(supplier)s s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN %(nation)s n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN %(region)s r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""
_Q65_TABLES = ("part", "lineitem", "supplier", "nation", "region")


@query(
    "q65_min_cost_supplier",
    oracle=_Q65_BODY % {t: t for t in _Q65_TABLES},
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part across the 4-way dim chain (TPC-H Q2
    shape). (s_name, p_partkey) is a unique key of the DISTINCT output
    and both appear in the ORDER BY chain, so the sort is total.

    Scale plan: Catalyst decorrelates the correlated scalar MIN into a
    per-l_partkey min aggregate over the region-filtered join, then an
    equi-join back to the outer flow on (partkey, cost) — the fact
    table is scanned twice but never re-scanned per row; supplier /
    nation / region are broadcast dims on both arms; the p_size and
    r_name filters reach the scans. A correlated-MIN-over-join that
    silently re-executed per outer row would be quadratic in parts —
    the plan pin exists to make that regression loud."""
    for t in _Q65_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q65_{t}")
    return spark.sql(_Q65_BODY % {t: f"kmce_q65_{t}" for t in _Q65_TABLES})


# --------------------------------------------------------------------------
# F18 — snapshot-versioned table read (time travel): reproducible-corpus
# pinning, the lakehouse-lifecycle capability training pipelines rely on
# (train @ corpus-version N must replay bit-identically after any number
# of later appends). Composes f17's atomic-manifest commit protocol with
# f14's table lifecycle; mechanism in sources/versioned.py. The staged
# table commits v1 = every third document, then APPENDS the rest as v2 —
# and the query reads AT VERSION 1 afterwards, so a versioning bug
# (reader lists the data dir, manifest includes v2 files, commit not
# atomic) surfaces as extra rows against the oracle's v1 predicate.
# --------------------------------------------------------------------------
_F18_STAGED: dict[tuple, object] = {}


@query(
    "f18_time_travel_read",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE doc_id % 3 = 0
    GROUP BY source ORDER BY source
    """,
)
def f18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate a version-1 time-travel read taken AFTER version 2 was
    committed; must equal the v1 snapshot exactly (the oracle's
    doc_id % 3 = 0 predicate on the original table).

    Scale: a commit is one distributed parquet write plus an O(#files)
    driver-side manifest; the versioned read is a plain parquet scan of
    the pinned file list (pushdown/pruning/codegen unchanged) — the
    Delta/Iceberg snapshot-read asymptotics, minimally."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F18_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_versioned_")
        d = load_table(spark, sf_dir, "documents")
        commit_append(d.filter(F.col("doc_id") % 3 == 0), tmp.name)
        commit_append(d.filter(F.col("doc_id") % 3 != 0), tmp.name)
        _F18_STAGED[key] = tmp
    snap = read_version(spark, _F18_STAGED[key].name, version=1)
    return (
        snap.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# F19 — DYNAMIC partition overwrite: INSERT OVERWRITE that replaces
# ONLY the partitions present in the incoming data, leaving every other
# partition untouched. The write-side twin of f3/f5's read-side
# pruning, and the idiom every partitioned ingest job uses to restate
# one day/source without rewriting the table. The classic data-loss bug
# this pins: under the default STATIC mode the same INSERT OVERWRITE
# silently wipes ALL partitions — here the untouched sources must
# survive with their original rows, and the restated source must carry
# exactly the modified rows, or the oracle hash flips.
# --------------------------------------------------------------------------
@query(
    "f19_dynamic_partition_overwrite",
    oracle="""
    WITH eff AS (
      SELECT doc_id, lang, source,
             CASE WHEN source = 'src3' THEN n_chars + 1000000
                  ELSE n_chars END AS n_chars
      FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM eff GROUP BY source ORDER BY source
    """,
)
def f19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents partitioned by source, then dynamically
    INSERT OVERWRITE only the 'src3' partition with shifted n_chars;
    aggregate the read-back. Untouched partitions must keep their
    original rows (static-mode wipeout, a doubled write, or a lost
    partition all flip the hash).

    Scale: dynamic overwrite commits at partition granularity — the
    job rewrites only the partitions the incoming frame contains, so
    restating one day of a 100 TB date-partitioned corpus moves one
    day's bytes. Composes with f3's partition-pruned reads; the
    conf is per-write here (set and restored) rather than session-wide.
    """
    import os as _os
    import shutil as _sh
    from urllib.parse import urlparse as _urlparse

    d = load_table(spark, sf_dir, "documents")
    # 'src3' exists at every fixture scale (TESTDATA sources are
    # src0..src19); restating a REAL partition keeps the oracle
    # non-vacuous — a no-op restatement would hash-match even under a
    # broken write path.
    warehouse = _urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    spark.sql("DROP TABLE IF EXISTS f19_docs_part")
    _sh.rmtree(
        _os.path.join(warehouse, "f19_docs_part"), ignore_errors=True
    )
    (
        d.select("doc_id", "lang", "n_chars", "source")
        .write.partitionBy("source")
        .saveAsTable("f19_docs_part")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated = (
            d.filter(F.col("source") == "src3")
            .select(
                "doc_id",
                "lang",
                (F.col("n_chars") + 1_000_000).alias("n_chars"),
                "source",
            )
        )
        restated.write.mode("overwrite").insertInto("f19_docs_part")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.table("f19_docs_part")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# F20 — small-file compaction (OPTIMIZE): the standing repair job for
# the lakehouse pathology streaming ingest creates — one file per
# micro-batch until scan planning is O(millions of files). Four appends
# of 6-way-split document slices build a 24-file versioned table; the
# compacted version must carry BYTE-IDENTICAL rows in a handful of
# files, with pre-compaction time travel untouched (pytest pins the
# file counts, the old-version read, and reclamation via
# expire+vacuum; mechanism in sources/versioned.py:compact).
# --------------------------------------------------------------------------
_F20_STAGED: dict[tuple, object] = {}


def _f20_compacted_table(spark: SparkSession, sf_dir: str):
    """Build (once per process/fixture) the 4-commit small-file table
    and compact it; returns (root, compacted_version)."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        compact,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F20_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_compact_")
        d = load_table(spark, sf_dir, "documents")
        for i in range(4):
            commit_append(
                d.filter(F.col("doc_id") % 4 == i).repartition(6), tmp.name
            )
        v = compact(spark, tmp.name, target_files=2)
        _F20_STAGED[key] = (tmp, v)
    tmp, v = _F20_STAGED[key]
    return tmp.name, v


@query(
    "f20_compacted_table_read",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def f20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the COMPACTED version of a 24-file versioned table;
    must equal the original documents table exactly (per-lang counts +
    content md5 extremes), proving compaction is a pure physical
    rewrite — no row lost, duplicated, or mutated.

    Scale: the rewrite is coalesce-based (narrow, shuffle-free
    bin-packing — no row redistribution), the commit is one O(#files)
    driver-side manifest, and the compacted read plans 2 files instead
    of 24 with pushdown/pruning unchanged."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_version,
    )

    root, v = _f20_compacted_table(spark, sf_dir)
    return (
        read_version(spark, root, v)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_md5"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_md5"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q66 — TPC-H Q15 shape: a derived aggregate VIEW consumed twice — once
# as the join input and once under a global-MAX scalar subquery that
# selects its top row ("the quarter's best supplier"). Completes the
# decorrelation family's last classic face after q44-q47/q64/q65: the
# scalar subquery ranges over the SAME derived aggregate the outer
# query joins, so the right plan computes the revenue aggregation once
# and reuses the exchange, never recomputing per outer row. FP
# discipline (q47's rule): the revenue CTE is evaluated TWICE (once as
# the join input, once under the scalar max) and a final hash
# aggregate's merge order is shuffle-fetch nondeterministic, so the
# SAME supplier's double sum can differ in the last ulp between the
# two passes — a raw equality would then return zero rows. Both sides
# are therefore rounded to whole units before the compare; the fixture
# margin between the top two suppliers is ~1% (far beyond the unit
# grid), so the winner set is unchanged and engine-stable.
# --------------------------------------------------------------------------
_Q66_BODY = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM %(lineitem)s
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           round(r.total_revenue, 4) AS total_revenue
    FROM %(supplier)s s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE round(r.total_revenue, 0) =
          (SELECT max(round(total_revenue, 0)) FROM revenue)
    ORDER BY s.s_suppkey
"""


@query(
    "q66_top_supplier_quarter",
    oracle=_Q66_BODY % {"lineitem": "lineitem", "supplier": "supplier"},
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best supplier of 1996-Q1 by discounted revenue (TPC-H Q15
    shape). Entered through the SQL surface so the scalar-over-CTE
    rewrite actually runs.

    Scale plan: the revenue view is a per-suppkey partial+final
    aggregate; the global max collapses it to a scalar subquery
    result applied as a literal filter; supplier is a broadcast dim.
    Spark 4 plans the CTE's two consumers as two aggregation passes
    (no exchange reuse at this shape) — a CONSTANT factor, pinned
    distinct from the quadratic failure mode (per-outer-row rescan /
    nested loop) the plan test excludes. The shipdate range reaches
    both scans."""
    for t in ("lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q66_{t}")
    return spark.sql(
        _Q66_BODY
        % {"lineitem": "kmce_q66_lineitem", "supplier": "kmce_q66_supplier"}
    )


# --------------------------------------------------------------------------
# Q67 — TPC-H Q11 shape: a grouped aggregate filtered by a FRACTION of
# its own global total (the "important stock" pattern). Distinct from
# q66's Q15 face: the scalar subquery here is a fraction of sum, not
# max, and the surviving set is a top slice (hundreds of rows), not a
# single winner. The fixture has no partsupp table, so "value held per
# part" is derived from shipped lineitems restricted to a supplier
# nation group — same shape, available columns.
# --------------------------------------------------------------------------
_Q67_BODY = """
    WITH part_value AS (
      SELECT l.l_partkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS part_value
      FROM %(lineitem)s l
      JOIN %(supplier)s s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey IN (1, 2, 3)
      GROUP BY l.l_partkey)
    SELECT l_partkey AS p_partkey, round(part_value, 4) AS part_value
    FROM part_value
    WHERE part_value > (
      SELECT round(0.0007 * sum(part_value), 0) FROM part_value)
    ORDER BY part_value DESC, p_partkey
"""


@query(
    "q67_top_value_parts",
    oracle=_Q67_BODY % {"lineitem": "lineitem", "supplier": "supplier"},
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose nation-group shipment value exceeds 0.07% of the
    group total (TPC-H Q11 shape).

    Scale plan: one per-partkey partial+final aggregate; the global
    total collapses the same view to a scalar literal filter — never a
    per-row rescan. The nationkey IN-list reaches the supplier scan and
    prunes lineitem through a broadcast hash semi-ish join before the
    aggregate shuffles. FP discipline: the threshold is rounded to
    whole units before the compare (q47's round-before-compare rule);
    measured fixture margin is >100 units at sf0.01 and >800 at
    sf0.001, so double-summation order cannot flip a boundary row."""
    for t in ("lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q67_{t}")
    return spark.sql(
        _Q67_BODY
        % {"lineitem": "kmce_q67_lineitem", "supplier": "kmce_q67_supplier"}
    )


# --------------------------------------------------------------------------
# Q68 — TPC-H Q13 shape: LEFT OUTER join with an ON-clause residual
# predicate, then TWO stacked aggregations (per-customer order count →
# distribution of counts). The classic skew probe: the second group-by
# key is the FIRST aggregate's output, so its cardinality is tiny
# (~max orders per customer) and its heaviest key is the modal count.
# --------------------------------------------------------------------------
_Q68_BODY = """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM %(customer)s c LEFT JOIN %(orders)s o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


@query(
    "q68_order_count_distribution",
    oracle=_Q68_BODY % {"customer": "customer", "orders": "orders"},
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of non-urgent order counts per customer, including
    zero-order customers (TPC-H Q13 shape).

    Scale plan: the priority filter is a join RESIDUAL, not a WHERE —
    pushing it as a pre-join filter on orders is the correct rewrite
    (and what both engines do) because it only affects which rows
    MATCH, never which customers survive the outer join. First
    aggregate shuffles on c_custkey (same key as the join, so AQE can
    reuse the exchange); the second aggregate's input is one row per
    customer and its key space is ~tens of values — partial aggregation
    collapses it map-side, so the second shuffle carries only
    (count, freq) pairs per task. count(o_orderkey) over the null-
    extended rows yields 0 (COUNT ignores NULLs) — the LEFT JOIN's
    zero-bucket is load-bearing and an inner-join regression drops it."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q68_{t}")
    return spark.sql(
        _Q68_BODY
        % {"customer": "kmce_q68_customer", "orders": "kmce_q68_orders"}
    )


# --------------------------------------------------------------------------
# Q69 — TPC-H Q19 shape: a disjunction of conjunctive branches, each
# mixing build-side (part) and probe-side (lineitem) predicates. The
# plan-quality question is whether the engine extracts the per-side
# sub-disjunctions and pushes them below the join (Spark's CNF-based
# extractPredicatesWithinOutputSet, SPARK-28220 lineage) instead of
# evaluating the whole OR post-join over the full match set.
# --------------------------------------------------------------------------
_Q69_BODY = """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM %(lineitem)s l JOIN %(part)s p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 60)
"""


@query(
    "q69_disjunctive_filter_join",
    oracle=_Q69_BODY % {"lineitem": "lineitem", "part": "part"},
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue over three brand/size/quantity disjunctive branches
    (TPC-H Q19 shape). All three branches are non-vacuous on the
    fixtures (205/832/980 matching lineitems at sf0.01).

    Scale plan: Catalyst extracts the part-only disjunction
    (brand1∧size OR brand2∧size OR brand3∧size) and the lineitem-only
    quantity disjunction and pushes each below the join — the part
    build side shrinks to the three brands BEFORE broadcast and the
    lineitem scan skips row groups outside quantity [1,60] via parquet
    min/max. The residual OR runs only over rows surviving both
    pushed approximations. Single-row output: global partial+final
    aggregate, no groupBy shuffle."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q69_{t}")
    return spark.sql(
        _Q69_BODY % {"lineitem": "kmce_q69_lineitem", "part": "kmce_q69_part"}
    )


# --------------------------------------------------------------------------
# Q70 — TPC-H Q7 shape: the same dimension (nation) joined TWICE under
# different roles (supplier's nation vs customer's nation) with a
# symmetric pair predicate, grouped by the role pair and shipment year.
# Exercises self-dim aliasing + join-order freedom across a 5-way star.
# --------------------------------------------------------------------------
_Q70_BODY = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM %(lineitem)s l
      JOIN %(orders)s o ON o.o_orderkey = l.l_orderkey
      JOIN %(customer)s c ON c.c_custkey = o.o_custkey
      JOIN %(supplier)s s ON s.s_suppkey = l.l_suppkey
      JOIN %(nation)s ns ON ns.n_nationkey = s.s_nationkey
      JOIN %(nation)s nc ON nc.n_nationkey = c.c_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query(
    "q70_nation_pair_volume",
    oracle=_Q70_BODY
    % {
        "lineitem": "lineitem",
        "orders": "orders",
        "customer": "customer",
        "supplier": "supplier",
        "nation": "nation",
    },
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral 1996-97 trade volume between NATION_1 and NATION_2 by
    direction and year (TPC-H Q7 shape).

    Scale plan: every dim (nation ×2 roles, supplier, customer) is
    broadcast; lineitem⋈orders is the only shuffle candidate and at
    dim scale orders broadcasts too, leaving the fact scan shuffle-free
    until the 4-group final aggregate. The pair disjunction references
    BOTH nation aliases so it stays a post-join residual, but each
    alias's single-sided implication (n_name IN (N1, N2)) is pushed to
    its own nation scan — the broadcast build is 2 rows per role. The
    shipdate range prunes the fact scan at row-group level. year() is
    evaluated pre-aggregate, JVM-side."""
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q70_{t}")
    return spark.sql(
        _Q70_BODY
        % {
            "lineitem": "kmce_q70_lineitem",
            "orders": "kmce_q70_orders",
            "customer": "kmce_q70_customer",
            "supplier": "kmce_q70_supplier",
            "nation": "kmce_q70_nation",
        }
    )


# --------------------------------------------------------------------------
# Q71–Q75 — the remaining TPC-H faces (Q8, Q9, Q12, Q14, Q16 shapes),
# adapted to the fixture schema: this corpus has no partsupp table, no
# l_shipmode, and no commit/receipt dates, so — as q65 (Q2) already
# established — lineitem's (l_partkey, l_suppkey) pairing plays
# partsupp's role, l_extendedprice/l_quantity is the unit-cost proxy,
# and Q12's cross-column date arithmetic becomes a cross-TABLE
# (lineitem vs orders) date residual. Every shape element the TPC-H
# query exercises survives: Q8's CASE-sum-over-sum market share, Q9's
# derived profit measure over the widest join graph, Q12's two-level
# CASE counts, Q14's promo ratio, Q16's distinct agg + NOT IN
# subquery. The reference's only aggregate is the fixed per-cluster
# mean (master.py:215-258); this whole family is engine surface.
# --------------------------------------------------------------------------
_Q71_BODY = """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS nation
      FROM %(part)s p
      JOIN %(lineitem)s l ON p.p_partkey = l.l_partkey
      JOIN %(orders)s o ON o.o_orderkey = l.l_orderkey
      JOIN %(customer)s c ON c.c_custkey = o.o_custkey
      JOIN %(nation)s nc ON nc.n_nationkey = c.c_nationkey
      JOIN %(region)s r ON r.r_regionkey = nc.n_regionkey
      JOIN %(supplier)s s ON s.s_suppkey = l.l_suppkey
      JOIN %(nation)s ns ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""
_Q71_TABLES = (
    "part", "lineitem", "orders", "customer", "nation", "region", "supplier"
)


@query("q71_market_share", oracle=_Q71_BODY % {t: t for t in _Q71_TABLES})
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of ASIA-market STANDARD-part revenue by order
    year (TPC-H Q8 shape): the CASE-sum-over-sum ratio aggregate over
    the widest dim graph in the suite — nation joined twice in
    different roles (market region via customer, share dimension via
    supplier), 8 relations total.

    Scale plan: the only fact-sized flow is lineitem⋈orders; every
    dim (part filtered to one type, customer, both nation roles,
    region, supplier) broadcasts. The region and type filters reach
    their scans, and the orderdate range prunes orders row groups
    BEFORE the fact join. The ratio is one pass — numerator rides as
    a CASE inside the same aggregate, never a second scan or a
    self-join. A division of two same-group double sums is ulp-stable
    at round-6 (ratio ~1e-1, error ~1e-15 relative)."""
    for t in _Q71_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q71_{t}")
    return spark.sql(_Q71_BODY % {t: f"kmce_q71_{t}" for t in _Q71_TABLES})


_Q72_BODY = """
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
      SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity * 0.05 AS amount
      FROM %(part)s p
      JOIN %(lineitem)s l ON p.p_partkey = l.l_partkey
      JOIN %(supplier)s s ON s.s_suppkey = l.l_suppkey
      JOIN %(orders)s o ON o.o_orderkey = l.l_orderkey
      JOIN %(nation)s ns ON ns.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%%red%%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""
_Q72_TABLES = ("part", "lineitem", "supplier", "orders", "nation")


@query("q72_nation_profit", oracle=_Q72_BODY % {t: t for t in _Q72_TABLES})
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and order year (TPC-H Q9
    shape): a DERIVED measure — revenue minus a per-unit cost proxy
    (p_retailprice × quantity × carry rate; this corpus has no
    partsupp/ps_supplycost) — aggregated over nation × year.

    Scale plan: part (substring-filtered before broadcast), supplier,
    and nation broadcast; lineitem⋈orders is the one real shuffle.
    The LIKE filter can't prune row groups (no dictionary pushdown on
    substring match) but DOES shrink the broadcast build to ~1/4 of
    part before the fact join touches it, so the fact rows surviving
    the part join carry the filter's full selectivity. The profit
    expression folds into one projected column pre-aggregate —
    revenue and cost are never separately aggregated and differenced
    (which would double the agg state and the FP cancellation)."""
    for t in _Q72_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q72_{t}")
    return spark.sql(_Q72_BODY % {t: f"kmce_q72_{t}" for t in _Q72_TABLES})


_Q73_BODY = """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM %(orders)s o
    JOIN %(lineitem)s l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""
_Q73_TABLES = ("orders", "lineitem")


@query("q73_priority_counts", oracle=_Q73_BODY % {t: t for t in _Q73_TABLES})
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slow-shipped 1997 lineitems split into high/low order-priority
    counts per return flag (TPC-H Q12 shape): complementary two-level
    CASE counts inside one aggregate, plus a cross-TABLE date residual
    (shipped >30 days after ordering — this corpus has no
    commit/receipt dates, so Q12's cross-column date algebra becomes
    a join residual, which is the harder case: it cannot be pushed to
    either scan and must run post-join).

    Scale plan: the single-sided shipdate range DOES push to the
    lineitem scan (row-group pruning to one year) while the
    cross-table comparison correctly stays a join filter; both CASE
    branches ride one shuffle-free partial aggregate into a 3-group
    final. One fact⋈fact equi-join on the natural key — nothing else
    moves."""
    for t in _Q73_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q73_{t}")
    return spark.sql(_Q73_BODY % {t: f"kmce_q73_{t}" for t in _Q73_TABLES})


_Q74_BODY = """
    SELECT round(100.00 * sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
             AS promo_revenue
    FROM %(lineitem)s l
    JOIN %(part)s p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
"""
_Q74_TABLES = ("lineitem", "part")


@query("q74_promo_revenue", oracle=_Q74_BODY % {t: t for t in _Q74_TABLES})
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of September-1997 revenue from PROMO parts (TPC-H Q14):
    the canonical conditional-ratio aggregate — numerator is a CASE
    over the join's dimension attribute, denominator the unconditional
    sum, one row out.

    Scale plan: the one-month shipdate range prunes the lineitem scan
    to ~1/60 of row groups before anything joins; part broadcasts
    (p_type must survive INTO the join for the CASE, so there is no
    dimension filter — the build is whole-part, still dim-sized);
    the ratio is computed from two accumulators of a single partial
    aggregate, never two passes. Round-6 on a ~O(10) ratio is 8
    orders of magnitude above double noise."""
    for t in _Q74_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q74_{t}")
    return spark.sql(_Q74_BODY % {t: f"kmce_q74_{t}" for t in _Q74_TABLES})


_Q75_BODY = """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM %(part)s p
    JOIN %(lineitem)s l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s.s_suppkey FROM %(supplier)s s WHERE s.s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""
_Q75_TABLES = ("part", "lineitem", "supplier")


@query("q75_supplier_variety", oracle=_Q75_BODY % {t: t for t in _Q75_TABLES})
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers have shipped each surviving
    (brand, type, size) part class, excluding suppliers in arrears
    (TPC-H Q16 shape): a DISTINCT aggregate stacked on negated
    dimension filters and a NOT IN over a subquery — lineitem's
    (l_partkey, l_suppkey) pairing plays partsupp's role, and the
    negative-balance exclusion plays the complaints NOT IN (6
    excluded suppliers at sf0.01, non-vacuous).

    Scale plan: the NOT IN must plan as a single null-aware
    broadcast anti join (pinned in tests/test_plans.py beside q42's
    3VL pin — a NOT IN that degraded to a per-row subquery re-scan
    would be quadratic); the three part filters push to the part scan
    and shrink the broadcast build before the fact join; the distinct
    agg is the only shuffle (partial distinct on (class, suppkey),
    then final count). ORDER BY covers the full group key, so the
    sort is total."""
    for t in _Q75_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmce_q75_{t}")
    return spark.sql(_Q75_BODY % {t: f"kmce_q75_{t}" for t in _Q75_TABLES})


# ---------------------------------------------------------------------------
# Q76 — TPC-H Q3 shape: the SHIPPING-PRIORITY top-k — a revenue
# aggregate over a 3-way fact join, filtered by a segment dim and an
# order-date/ship-date straddle, then ORDER BY revenue LIMIT 10. The
# canonical "top-k over a join" face: the interesting scale property is
# that the LIMIT must ride the sort (TakeOrderedAndProject), never a
# full materialized sort of the aggregate. Built in the DataFrame API
# (not shared SQL) so the oracle parity is non-trivial.
# ---------------------------------------------------------------------------

_Q76_ORACLE = """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
"""


@query("q76_shipping_priority", oracle=_Q76_ORACLE)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped BUILDING-segment orders by open revenue (TPC-H
    Q3 shape): orders placed before the cutoff whose lineitems ship
    after it, ranked by discounted revenue. (This corpus has no
    o_shippriority; o_orderpriority rides in its projection slot.)

    Scale plan: customer (segment-filtered, ~1/5) broadcasts; the
    only real shuffle is lineitem⋈orders on orderkey, and both date
    filters push to their own scans (each side of the straddle is
    single-table, so row-group pruning applies to BOTH fact scans).
    The LIMIT composes with the sort into TakeOrderedAndProject —
    each partition keeps only its local top-10, the driver merges
    k·P rows, and the full aggregate is never globally sorted or
    materialized. Ties broken by (o_orderdate, l_orderkey) so the
    top-10 is total and the hash deterministic."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-03-15").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r4(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("revenue")
        )
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q77 — TPC-H Q4 shape: EXISTS with a CROSS-TABLE correlated residual.
# The EXISTS predicate compares a subquery column against an OUTER
# column (l_shipdate > o_orderdate + 30 days), so the semi join carries
# a non-equi residual on top of its equi key — the case where a naive
# engine degrades to a per-row subquery re-scan.
# ---------------------------------------------------------------------------

_Q77_ORACLE = """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@query("q77_order_priority_check", oracle=_Q77_ORACLE)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority for 1997-Q1 orders with at least one
    slow lineitem (TPC-H Q4 shape; shipped >30 days after ordering
    stands in for commitdate<receiptdate, which this corpus lacks).

    Scale plan: expressed as a LEFT SEMI join whose condition is the
    equi key PLUS the cross-table date residual — Catalyst keeps the
    hash join on l_orderkey and evaluates the residual on matches, so
    existence short-circuits (no distinct-aggregate of lineitem, no
    per-row re-scan, lineitem never duplicated into the count). The
    quarter filter prunes orders row groups before the join; the
    post-semi aggregate is 5 groups. At 100 TB the semi join is the
    single shuffle and its build side is quarter-pruned orders, not
    the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    slow_exists = quarter.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        ),
        "left_semi",
    )
    return (
        slow_exists.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q78 — TPC-H Q6 shape: the pure SCAN-HEAVY single-table aggregate —
# three pushable range predicates, no join, one output row. The face
# that measures raw scan + pushdown quality: at 100 TB this query IS
# the parquet reader, and everything else must vanish.
# ---------------------------------------------------------------------------

_Q78_ORACLE = """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""


@query("q78_forecast_revenue", oracle=_Q78_ORACLE)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue increase if 1996 discounts of 5-7% on small lots had
    been waived (TPC-H Q6 shape): a single-table filter-aggregate
    whose entire cost is the scan.

    Scale plan: all three predicates (shipdate range, discount band,
    quantity cap) are simple column comparisons, so every one reaches
    PushedFilters and min/max row-group pruning; the scan reads only
    the 4 referenced columns (ReadSchema projection). The aggregate
    is a zero-group partial→final pair — one shuffle of one row per
    partition. There is nothing else: at 100 TB this plan is
    scan-bound by construction, which is the point of the face.
    l_discount is float-valued, so the band uses >=/<= (not
    BETWEEN-with-epsilon): the corpus quantizes discounts to exact
    0.01 steps and both engines compare the same stored doubles."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q79 — TPC-H Q10 shape: the RETURNED-ITEM report — top-20 customers by
# lost revenue in a quarter, carrying wide customer attributes through
# the aggregate. The face where group-key width matters: the aggregate
# key is the whole projected customer row, and the top-k must again be
# TakeOrderedAndProject, not a global sort.
# ---------------------------------------------------------------------------

_Q79_ORACLE = """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           round(c.c_acctbal, 4) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query("q79_returned_item_report", oracle=_Q79_ORACLE)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in 1997-Q4 (TPC-H
    Q10 shape): returned lineitems joined up through orders to the
    customer and nation dims, aggregated on the full customer
    projection.

    Scale plan: the quarter filter prunes orders and the returnflag
    filter prunes lineitem (both reach their scans — returnflag is
    dictionary-encoded, so 2/3 of row groups drop); lineitem⋈orders
    is the one fact shuffle, then customer and nation broadcast onto
    the pre-aggregated per-custkey partial (aggregate BEFORE the wide
    dim attributes attach, so the shuffle carries (custkey, revenue)
    pairs, never c_name/n_name strings). The top-20 rides
    TakeOrderedAndProject with the c_custkey tiebreak making it
    total."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (
                    F.col("o_orderdate")
                    >= F.lit("1997-10-01").cast("timestamp")
                )
                & (
                    F.col("o_orderdate")
                    < F.lit("1998-01-01").cast("timestamp")
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("raw_revenue")
        )
    )
    return (
        per_cust.join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            r4(F.col("raw_revenue")).alias("revenue"),
            r4(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q80 — trailing-window COUNT DISTINCT (7-day active users). The one
# aggregate shape the window family (Q10/Q11/Q22/Q31/Q39) could not
# cover: DISTINCT does not decompose over a sliding frame (the trailing
# week's uniques are NOT the sum of daily uniques), and Spark rejects
# count(DISTINCT) over a window entirely. The scalable form is the
# CONTRIBUTION EXPLODE: dedup (user, day) once, fan each pair out to
# the ≤7 window-days it contributes to (a BOUNDED ×7 narrow explode —
# never user×user or day×day pair space), then one exact distinct
# aggregate keyed by window-day. At 100 TB the dedup is the only
# corpus-sized shuffle; the explode rides on the deduped (user, day)
# table, which is orders of magnitude smaller than events.
# --------------------------------------------------------------------------
_Q80_ORACLE = """
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS day_users
      FROM daily GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.day_users,
           CAST(count(DISTINCT x.user_id) AS BIGINT) AS trailing7_users
    FROM days d JOIN daily x ON x.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day, d.day_users
    ORDER BY day
"""


@query("q80_trailing_distinct_users", oracle=_Q80_ORACLE)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q80: per observed day, that day's distinct users AND the exact
    trailing-7-day distinct users, via the contribution explode (see
    the section comment). The oracle computes the same windows with a
    range self-join — a window boundary slip, a double-counted user, or
    a phantom future day (the explode emits days past the data's max;
    the inner join to OBSERVED days must drop them) flips the hash."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    day_users = daily.groupBy("day").agg(
        F.countDistinct("user_id").alias("day_users")
    )
    contrib = daily.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day"),
    )
    trailing = contrib.groupBy("day").agg(
        F.countDistinct("user_id").alias("trailing7_users")
    )
    return (
        day_users.join(trailing, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_users",
            "trailing7_users",
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# F21 — SCHEMA EVOLUTION on the versioned table (round-8 surface,
# registered round 8). This is the CATALOG form whose absence f11's
# docstring flags: f11 evolves loose parquet files via mergeSchema,
# paying a per-file footer reconcile at every planning and having no
# answer for time travel or type conflicts; here the schema is table
# METADATA. A later commit ADDS a column; the manifest
# records the evolved union schema at the commit point (the Delta
# metaData-action idiom, sources/versioned.py:_evolve_schema), readers
# read with that EXPLICIT schema so pre-evolution files null-fill the
# added column deterministically (never footer-sampling roulette), and
# time travel to a pre-evolution version still returns the ORIGINAL
# narrow schema. A type change for an existing column fails loudly at
# commit time. All pinned in tests/test_schema_evolution.py.
# --------------------------------------------------------------------------
_F21_STAGED: dict[tuple, object] = {}

F21_ORACLE = """
    WITH v AS (
      SELECT doc_id, lang, n_chars, NULL AS quality
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang, n_chars,
             round(n_chars / 100.0, 4) AS quality
      FROM documents WHERE doc_id % 2 = 1)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(quality) AS BIGINT) AS n_scored,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM v GROUP BY lang ORDER BY lang
"""


@query("f21_schema_evolution_read", oracle=F21_ORACLE)
def f21_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the LATEST read of a table whose second commit added a
    ``quality`` column: v1 rows (even doc_ids, committed pre-evolution)
    must surface quality as NULL, v2 rows (odd doc_ids) carry their
    computed score, and count(quality)/avg(quality) prove the null-fill
    is exact — a reader that sampled a v1 footer would drop the column
    (hash-flips on n_scored), one that sampled v2's would work only by
    luck.

    Scale: evolution is O(1) metadata at the commit point (one schema
    union on the driver, no data rewrite — history is never touched);
    reads stay plain pinned-file parquet scans with pushdown/pruning
    unchanged, the added column read as null vectors for old files."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F21_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_evolved_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        commit_append(d.filter(F.col("doc_id") % 2 == 0), tmp.name)
        commit_append(
            d.filter(F.col("doc_id") % 2 == 1).withColumn(
                "quality", F.round(F.col("n_chars") / 100.0, 4)
            ),
            tmp.name,
        )
        _F21_STAGED[key] = tmp
    latest = read_version(spark, _F21_STAGED[key].name)
    return (
        latest.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("quality").alias("n_scored"),
            r4(F.avg("quality")).alias("avg_quality"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F22 — copy-on-write DELETE read (round-8 surface, registered round
# 8). The right-to-be-forgotten
# operation of a training-corpus store: delete one language from the
# versioned table and aggregate the survivors; the PRE-delete snapshot
# must still show the deleted rows (history is immutable — physical
# reclaim is retention + vacuum, the Delta GDPR contract). Staged with
# lang-partitioned files so the file-granular COW is real: clean
# languages' files carry into the new manifest BY NAME, unrewritten
# (pinned in tests/test_delete_where.py).
# --------------------------------------------------------------------------
_F22_STAGED: dict[tuple, object] = {}

F22_ORACLE = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents WHERE lang <> 'de'
    GROUP BY source ORDER BY source
"""


@query("f22_delete_where_read", oracle=F22_ORACLE)
def f22_delete_where_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the table AFTER `DELETE WHERE lang = 'de'`: the oracle
    replays the delete relationally, so a row the COW rewrite lost, a
    survivor it dropped from an affected file, or a deleted row leaking
    through an untouched file flips the hash. n_langs pins that exactly
    one language vanished.

    Scale: the delete costs O(affected files) data work — the staged
    layout isolates the target language to its own files, so the clean
    files are carried by name and never reread or rewritten; the read
    stays a pinned-file parquet scan."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F22_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_cow_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
        commit_append(d.repartition(5, "lang"), tmp.name)
        delete_where(spark, tmp.name, "lang = 'de'")
        _F22_STAGED[key] = tmp
    latest = read_version(spark, _F22_STAGED[key].name)
    return (
        latest.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# F23 — manifest-stats DATA SKIPPING read (round-8 surface,
# registered round 8). The
# versioned table records per-file column min/max at every commit
# (Delta add-action stats); a range probe prunes the FILE LIST before
# Spark ever sees it. Staged as one file per doc_id range so the
# skipping is real and measurable: the probe range below touches 2 of
# 10 files (asserted at staging time — a silent stats regression would
# surface as a staging failure, not a quiet full scan).
# --------------------------------------------------------------------------
_F23_STAGED: dict[tuple, object] = {}

F23_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE doc_id >= 120 AND doc_id < 220
    GROUP BY lang ORDER BY lang
"""


@query("f23_data_skipping_read", oracle=F23_ORACLE)
def f23_data_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate a doc_id range read through manifest-stats file
    pruning: the manifest names 10 range-clustered files, the probe
    keeps 2, and the result must equal the oracle's plain relational
    filter — pruning must be invisible to semantics (a file wrongly
    skipped loses rows and flips the hash; min_doc/max_doc pin the
    boundary rows of both kept files).

    Scale: the prune is O(#files) DRIVER-side metadata — at 100 TB it
    is the difference between planning over every file's footer and
    handing Spark exactly the files that can match; the scan itself
    then still row-group-prunes inside the survivors."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        prune_files,
        read_manifest,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F23_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_skip_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        hi = d.agg(F.max("doc_id")).collect()[0][0]
        step = (hi + 10) // 10
        for b in range(10):
            commit_append(
                d.filter(
                    (F.col("doc_id") >= b * step)
                    & (F.col("doc_id") < (b + 1) * step)
                ).coalesce(1),
                tmp.name,
            )
        v = 10
        assert len(read_manifest(tmp.name, v)["files"]) == 10
        kept = prune_files(tmp.name, v, "doc_id", 120, 219)
        # the staging contract: skipping must keep EXACTLY the files
        # whose bucket range intersects the probe — and actually skip
        want = len(range(120 // step, 219 // step + 1))
        assert len(kept) == want < 10, (kept, step)
        _F23_STAGED[key] = (tmp, kept)
    tmp, kept = _F23_STAGED[key]
    pruned = spark.read.parquet(
        *[_os.path.join(tmp.name, f) for f in kept]
    )
    return (
        pruned.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 220))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F25 — OPTIMIZE ZORDER: multi-column clustering for 2-D data skipping
# (round-8 surface). f23 proves 1-D skipping on a range-clustered
# layout; its blind spot is the SECOND predicate column — in any 1-D
# sort layout every file spans the full range of every other column,
# so stats prune on the sort key only. Z-ordering interleaves the bits
# of both columns (sources/versioned.py: z_value/zorder_commit, the
# Delta OPTIMIZE ZORDER BY idiom), giving each file a compact
# rectangle-ish region of the 2-D space and TIGHT per-file min/max on
# BOTH columns; `prune_files` then intersects the two pruned lists.
# Staging asserts the 2-D win structurally: EACH single-column prune
# alone already drops files on the z layout (impossible for the
# non-sort column of a 1-D layout), and the intersection drops more.
# --------------------------------------------------------------------------
_F25_STAGED: dict[tuple, object] = {}

F25_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    WHERE doc_id >= 100 AND doc_id < 300
      AND n_chars >= 150 AND n_chars < 300
    GROUP BY lang ORDER BY lang
"""


@query("f25_zorder_skipping_read", oracle=F25_ORACLE)
def f25_zorder_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate a 2-D range probe (doc_id x n_chars) read through
    manifest-stats pruning of a Z-ORDERED 16-file layout: the kept file
    list is the INTERSECTION of both columns' prunes, and the result
    must equal the oracle's plain relational filter — pruning must stay
    invisible to semantics at any layout (a file wrongly skipped by
    either column's bounds loses rows and flips the hash).

    Scale: the clustering costs one range-shuffle at write time
    (exactly Delta's OPTIMIZE ZORDER BY); every later 2-D probe prunes
    files by BOTH predicates driver-side before Spark plans a single
    task. At 100 TB this is the difference between 'scan the week'
    and 'scan the week AND the tenant'."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        prune_files,
        read_manifest,
        zorder_commit,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F25_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_zorder_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        v = zorder_commit(d, tmp.name, "doc_id", "n_chars", n_files=16)
        n_files = len(read_manifest(tmp.name, v)["files"])
        by_doc = prune_files(tmp.name, v, "doc_id", 100, 299)
        by_chars = prune_files(tmp.name, v, "n_chars", 150, 299)
        kept = sorted(set(by_doc) & set(by_chars))
        # the 2-D claim, asserted at staging: each single-column prune
        # already drops files on a z layout, and intersecting drops more
        assert len(by_doc) < n_files, (len(by_doc), n_files)
        assert len(by_chars) < n_files, (len(by_chars), n_files)
        assert 0 < len(kept) <= min(len(by_doc), len(by_chars))
        _F25_STAGED[key] = (tmp, kept)
    tmp, kept = _F25_STAGED[key]
    pruned = spark.read.parquet(
        *[_os.path.join(tmp.name, f) for f in kept]
    )
    return (
        pruned.filter(
            (F.col("doc_id") >= 100)
            & (F.col("doc_id") < 300)
            & (F.col("n_chars") >= 150)
            & (F.col("n_chars") < 300)
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F26 — MERGE INTO the versioned table (round-9 surface, library-first
# per the new-entry budget pacing; the @query registration is one
# decorator away). The last missing lakehouse verb: Delta's upsert —
# WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *, one commit,
# file-granular COW on the matched side (sources/versioned.py:
# merge_into). The staged table holds the documents metadata in 5
# lang-clustered files; the merge source UPDATES every even-doc_id
# en row's n_chars (+1000) and INSERTS 20 brand-new doc_ids — so the
# oracle can replay the whole upsert relationally, and the clean
# languages' files must carry by name (pinned in tests/test_merge.py).
# --------------------------------------------------------------------------
_F26_STAGED: dict[tuple, object] = {}

F26_ORACLE = """
    WITH merged AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' AND doc_id % 2 = 0
                  THEN n_chars + 1000 ELSE n_chars END AS n_chars
      FROM documents
      UNION ALL
      SELECT 1000000 + gs.i AS doc_id, 'xx' AS lang,
             10 * gs.i AS n_chars
      FROM generate_series(0, 19) gs(i))
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           max(doc_id) AS max_doc
    FROM merged GROUP BY lang ORDER BY lang
"""


@query("f26_merge_into_read", oracle=F26_ORACLE)
def f26_merge_into_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the table AFTER one MERGE commit that both updates
    (en rows with even doc_id gain 1000 chars) and inserts (20 new
    'xx'-lang rows): the oracle replays the upsert relationally, so a
    lost update, a dropped survivor, a duplicated insert, or an update
    leaking into a clean file flips the hash; max_doc pins the inserts.

    Scale: one semi-join probe finds the affected files, the rewrite
    joins only their rows against the (broadcastable) source, clean
    files carry by name — O(affected + source), never a table rewrite."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        merge_into,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F26_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_merge_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        commit_append(d.repartition(5, "lang"), tmp.name)
        updates = (
            d.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
            .withColumn("n_chars", F.col("n_chars") + 1000)
        )
        inserts = spark.range(20).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.lit("xx").alias("lang"),
            (F.col("id") * 10).cast(d.schema["n_chars"].dataType).alias(
                "n_chars"
            ),
        )
        merge_into(
            spark, tmp.name, updates.unionByName(inserts), "doc_id"
        )
        _F26_STAGED[key] = tmp
    latest = read_version(spark, _F26_STAGED[key].name)
    return (
        latest.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F27 — batch CHANGE DIFF read (round-9 surface, library-first; the
# @query registration is one decorator away). The incremental-ETL verb
# k23 serves as a stream, batch-shaped: read_changes(root, v0, v1)
# returns exactly the rows appended between two versions
# (sources/versioned.py — compaction contributes nothing, COW raises,
# diffs compose; pinned in tests/test_version_feed.py). Staged as four
# doc_id-quarter commits; the diff past version 2 must equal the plain
# relational filter for quarters 3 and 4.
# --------------------------------------------------------------------------
_F27_STAGED: dict[tuple, object] = {}

F27_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE doc_id % 4 IN (2, 3)
    GROUP BY lang ORDER BY lang
"""


@query("f27_change_diff_read", oracle=F27_ORACLE)
def f27_change_diff_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the batch diff of versions (2, 4]: the table was built
    as four doc_id-quarter commits, so the diff must hold exactly the
    last two quarters' rows — a version boundary slip, a re-emitted
    early commit, or a dropped added-file flips the hash.

    Scale: the diff reads ONLY the added files of the requested range —
    O(changes), never O(table); range resolution is driver-side
    manifest metadata."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_changes,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F27_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_diff_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        for q in range(4):
            commit_append(d.filter(F.col("doc_id") % 4 == q), tmp.name)
        _F27_STAGED[key] = tmp
    diff = read_changes(spark, _F27_STAGED[key].name, 2, 4)
    return (
        diff.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# K24 — incremental aggregate maintenance, end to end (round-9 surface,
# library-first; the @query registration is one decorator away). The
# corpus lands in three versioned commits with a REFRESH interleaved
# after each (operators/incremental.py: read_changes diff -> one MERGE
# -> atomic ledger checkpoint); the terminal state must equal the
# plain batch token count of the whole corpus — a dropped diff, a
# double-applied refresh, a merge that lost an existing token, or a
# checkpoint slip all flip the hash.
# --------------------------------------------------------------------------
_K24_STAGED: dict[tuple, object] = {}

K24_ORACLE = """
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
          FROM documents)
    GROUP BY token ORDER BY token
"""


@query("k24_incremental_token_counts", oracle=K24_ORACLE)
def k24_incremental_token_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained token-count state after three interleaved
    commit+refresh rounds — exact incremental maintenance, never a
    corpus re-scan (each refresh reads only its diff; pinned with
    asserted row counts in tests/test_incremental.py).

    Scale: the corpus is append-only and huge, the state is
    vocabulary-sized; each refresh shuffles O(diff) plus the touched
    slice of the state — the standing-statistics job shape (vocab,
    dedup signatures, quality histograms) at 100 TB."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        token_counts_state,
    )

    state = _stage_k24(spark, sf_dir)
    return (
        token_counts_state(spark, state)
        .select("token", F.col("freq").cast("bigint").alias("freq"))
        .orderBy("token")
    )


def _stage_k24(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per source mtime) k24's maintained
    token-count state: three interleaved commit+refresh rounds."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _K24_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_inc_")
        corpus = _os.path.join(tmp.name, "corpus")
        state = _os.path.join(tmp.name, "state")
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        for third in range(3):
            commit_append(d.filter(F.col("doc_id") % 3 == third), corpus)
            refresh_token_counts(spark, corpus, state)
        _K24_STAGED[key] = (tmp, state)
    return _K24_STAGED[key][1]


# --------------------------------------------------------------------------
# F28 — SHALLOW CLONE read (round-10 surface, library-first; the @query
# registration is one decorator away). Delta's CREATE TABLE ... SHALLOW
# CLONE: fork a snapshot as a new writable table in O(#files) driver
# metadata, zero data copied (sources/versioned.py: clone_table). The
# staged flow commits documents at the source, clones it, appends 20
# brand-new 'xx'-lang rows TO THE CLONE, and aggregates the clone's
# latest version — so the oracle replays source-content + fork-delta
# relationally, and the source table must remain bit-identical
# (pinned in tests/test_clone.py along with the zero-copy property).
# --------------------------------------------------------------------------
_F28_STAGED: dict[tuple, object] = {}

F28_ORACLE = """
    WITH forked AS (
      SELECT doc_id, lang, n_chars FROM documents
      UNION ALL
      SELECT 2000000 + gs.i AS doc_id, 'xx' AS lang,
             7 * gs.i AS n_chars
      FROM generate_series(0, 19) gs(i))
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           max(doc_id) AS max_doc
    FROM forked GROUP BY lang ORDER BY lang
"""


@query("f28_shallow_clone_read", oracle=F28_ORACLE)
def f28_shallow_clone_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate a CLONE after forking it from the source snapshot and
    appending 20 'xx'-lang rows to the fork only: a clone that copied
    data (wrong files), leaked its append back to the source, or lost
    a source file reference flips the hash; max_doc pins the fork
    delta.

    Scale: the clone commit is O(#files) driver-side JSON — forking a
    petabyte table costs milliseconds and zero storage until the fork
    diverges; reads plan exactly the referenced files with carried
    stats, so pruning works on the fork immediately."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        clone_table,
        commit_append,
        read_version,
    )

    import os as _os

    key = staging_key(sf_dir, "documents")
    if key not in _F28_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_clone_")
        src = _os.path.join(tmp.name, "src")
        dst = _os.path.join(tmp.name, "fork")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        commit_append(d.repartition(5, "lang"), src)
        clone_table(src, dst)
        inserts = spark.range(20).select(
            (F.col("id") + 2_000_000).alias("doc_id"),
            F.lit("xx").alias("lang"),
            (F.col("id") * 7).cast(d.schema["n_chars"].dataType).alias(
                "n_chars"
            ),
        )
        commit_append(inserts, dst)
        _F28_STAGED[key] = (tmp, src, dst)
    _, _, dst = _F28_STAGED[key]
    return (
        read_version(spark, dst)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q81 — ordered FUNNEL analysis (round-10 surface, library-first; the
# @query registration is one decorator away). The product-analytics
# verb the windowed q-family doesn't cover: how many users completed
# signup -> view -> click -> purchase IN ORDER, each step strictly
# after the previous one's first completion AND within a 48-hour
# deadline of it (MATCH_RECOGNIZE-lite, expressed as chained
# conditional-min aggregation; without the deadline every fixture user
# completes and the funnel cannot discriminate). All timestamp
# comparisons run in exact integer MICROSECONDS (unix_micros /
# epoch_us — the fixture's nanos are microsecond-aligned, and both
# engines convert exactly), so a boundary event can never flip a
# strict-after compare across engines.
#
# Scale: the four step times are CHAINED WINDOW MINIMA over one
# user_id partitioning — a single exchange + sort serves all four
# passes (q41's clustering-reuse discipline), then one global 4-column
# aggregate and a stack() to rows. No driver loop, no per-step re-scan
# of the events table, no per-row UDF; per-user work is bounded by
# history length, the same envelope as any sessionizer.
# --------------------------------------------------------------------------
Q81_STEPS = ("signup", "view", "click", "purchase")
Q81_DEADLINE_US = 48 * 3600 * 1_000_000  # each step within 48h of prev

Q81_ORACLE = f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (
      SELECT user_id, min(us) AS t FROM e
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(us) AS t FROM e JOIN s1 USING (user_id)
      WHERE event_type = 'view' AND us > s1.t
        AND us <= s1.t + {Q81_DEADLINE_US} GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(us) AS t FROM e JOIN s2 USING (user_id)
      WHERE event_type = 'click' AND us > s2.t
        AND us <= s2.t + {Q81_DEADLINE_US} GROUP BY e.user_id),
    s4 AS (
      SELECT e.user_id, min(us) AS t FROM e JOIN s3 USING (user_id)
      WHERE event_type = 'purchase' AND us > s3.t
        AND us <= s3.t + {Q81_DEADLINE_US} GROUP BY e.user_id),
    counts AS (
      SELECT '1_signup' AS step, count(*) AS n_users FROM s1
      UNION ALL SELECT '2_view', count(*) FROM s2
      UNION ALL SELECT '3_click', count(*) FROM s3
      UNION ALL SELECT '4_purchase', count(*) FROM s4)
    SELECT step, CAST(n_users AS BIGINT) AS n_users,
           round(CAST(n_users AS DOUBLE) / first_value(n_users)
                 OVER (ORDER BY step), 4) AS frac_of_entry
    FROM counts ORDER BY step
"""


def funnel_counts(e: DataFrame) -> DataFrame:
    """The funnel core over a (user_id, event_type, us) frame —
    factored so tests can drive synthetic out-of-order histories."""
    w = Window.partitionBy("user_id")
    d = e
    prev_t = None
    for i, step in enumerate(Q81_STEPS, start=1):
        cond = F.col("event_type") == step
        if prev_t is not None:
            cond = (
                cond
                & (F.col("us") > F.col(prev_t))
                & (F.col("us") <= F.col(prev_t) + Q81_DEADLINE_US)
            )
        d = d.withColumn(f"t{i}", F.min(F.when(cond, F.col("us"))).over(w))
        prev_t = f"t{i}"
    per_user = d.groupBy("user_id").agg(
        *[F.first(f"t{i}").alias(f"t{i}") for i in range(1, 5)]
    )
    totals = per_user.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(1, 5)]
    )
    stack_args = ", ".join(
        f"'{i + 1}_{s}', n{i + 1}, CAST(n{i + 1} AS DOUBLE) / n1"
        for i, s in enumerate(Q81_STEPS)
    )
    return (
        totals.select(
            F.expr(
                f"stack(4, {stack_args}) AS (step, n_users, frac_raw)"
            )
        )
        .select(
            "step",
            F.col("n_users").cast("bigint").alias("n_users"),
            r4(F.col("frac_raw")).alias("frac_of_entry"),
        )
        .orderBy("step")
    )


@query("q81_funnel_steps", oracle=Q81_ORACLE)
def q81_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q81: users reaching each ordered funnel step (strictly-after
    chaining on first completions, 48h step deadline) plus the
    conversion fraction from the entry step — a step-order slip, an
    inclusive-boundary compare, or a lost per-user first-completion
    flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return funnel_counts(e)


# --------------------------------------------------------------------------
# K25 — incremental VOCABULARY maintenance with write-once first_seen
# (round-10 surface, library-first; the @query registration is one
# decorator away). k24 proves additive incremental state; this adds the
# per-column merge semantics real standing stats need: first_seen is
# IMMUTABLE once set (the version whose refresh introduced the token),
# freq accumulates. Staged as three doc_id-third commits with a refresh
# after each, so the oracle can replay first_seen as min(third)+1 —
# a merge that overwrites first_seen on re-encountered tokens (the
# naive UPDATE SET *) flips the hash on every cross-third token.
# --------------------------------------------------------------------------
_K25_STAGED: dict[tuple, object] = {}

K25_ORACLE = """
    WITH tok AS (
      SELECT doc_id % 3 AS third,
             unnest(string_split(trim(text), ' ')) AS token
      FROM documents)
    SELECT token, CAST(min(third) + 1 AS BIGINT) AS first_seen,
           CAST(count(*) AS BIGINT) AS freq
    FROM tok GROUP BY token ORDER BY token
"""


@query("k25_incremental_vocab", oracle=K25_ORACLE)
def k25_incremental_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained vocabulary after three interleaved commit+refresh
    rounds: (token, first_seen corpus version, accumulated freq) —
    exact incremental maintenance with a write-once column, never a
    corpus re-scan.

    Scale: O(diff) per refresh against a vocabulary-sized state (the
    k24 envelope); the state answers vocabulary-growth-over-time
    queries (first_seen <= V) without history replay."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        vocab_state,
    )

    state = _stage_k25(spark, sf_dir)
    return (
        vocab_state(spark, state)
        .select(
            "token",
            F.col("first_seen").cast("bigint").alias("first_seen"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        .orderBy("token")
    )


def _stage_k25(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per source mtime) k25's maintained
    vocabulary state: three interleaved commit+refresh rounds."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_vocab,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _K25_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_vocab_")
        corpus = _os.path.join(tmp.name, "corpus")
        state = _os.path.join(tmp.name, "state")
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        for third in range(3):
            commit_append(d.filter(F.col("doc_id") % 3 == third), corpus)
            refresh_vocab(spark, corpus, state)
        _K25_STAGED[key] = (tmp, state)
    return _K25_STAGED[key][1]


# --------------------------------------------------------------------------
# Q82 — event-type TRANSITION MATRIX (round-10 surface, library-first;
# the @query registration is one decorator away). The Markov-chain view
# of user behavior: for each ordered pair (src, dst) of event types,
# how many times a user's event of type src was immediately followed by
# one of type dst, plus the row-normalized transition probability —
# the "what happens after an error" / session-model-fitting primitive.
#
# Scale: one lead() window over the user_id partitioning (one exchange,
# the q41 clustering), then a 25-row aggregate; the probability is a
# windowed sum over the 25-row result — driver-trivial. Per-user
# ordering ties break on event_id for a total order.
# --------------------------------------------------------------------------
Q82_ORACLE = """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT event_type AS src, nxt AS dst,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0
                 / sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
    FROM o WHERE nxt IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q82_transition_matrix", oracle=Q82_ORACLE)
def q82_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q82: the 5x5 next-event transition matrix with row-normalized
    probabilities — an ordering slip (wrong tie-break), a lost last
    event, or a normalization over the wrong margin flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.withColumn("nxt", F.lead("event_type").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    counts = o.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_total = F.sum("n").over(Window.partitionBy("src"))
    return (
        counts.withColumn("p", r4(F.col("n") / row_total))
        .select("src", "dst", "n", "p")
        .orderBy("src", "dst")
    )


# --------------------------------------------------------------------------
# K26 — SLIDING-WINDOW incremental maintenance (round-10 surface,
# library-first; the @query registration is one decorator away). k24
# proves the additive fold; this adds the semantics addition cannot
# express: RETRACTION. Token counts over the LAST 2 corpus versions,
# maintained as per-version sub-aggregates — each refresh appends the
# new diff's sub-aggregate and COW-deletes the ones that slid out
# (operators/incremental.py: refresh_token_counts_window; retraction by
# deletion is O(expired state), never a re-read of old corpus files).
# Staged as four doc_id-quarter commits with a refresh after each, so
# the terminal state must equal the plain recount of quarters 3 and 4.
# --------------------------------------------------------------------------
_K26_STAGED: dict[tuple, object] = {}

K26_ORACLE = """
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
          FROM documents WHERE doc_id % 4 IN (2, 3))
    GROUP BY token ORDER BY token
"""


@query("k26_windowed_token_counts", oracle=K26_ORACLE)
def k26_windowed_token_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained sliding-window (last-2-versions) token counts
    after four interleaved commit+refresh rounds — a dropped
    retraction (stale counts), a double-applied diff, or a window
    boundary slip flips the hash.

    Scale: per refresh O(diff) corpus reads + one append + one
    stats-pruned COW delete of the expired sub-aggregates; the serving
    sum touches <= window rows per token."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        windowed_token_counts,
    )

    state = _stage_k26(spark, sf_dir)
    return (
        windowed_token_counts(spark, state)
        .select("token", F.col("freq").cast("bigint").alias("freq"))
        .orderBy("token")
    )


def _stage_k26(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per source mtime) k26's sliding-window
    token-count state: four interleaved commit+refresh rounds."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts_window,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _K26_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_slide_")
        corpus = _os.path.join(tmp.name, "corpus")
        state = _os.path.join(tmp.name, "state")
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        for q in range(4):
            commit_append(d.filter(F.col("doc_id") % 4 == q), corpus)
            refresh_token_counts_window(spark, corpus, state, window=2)
        _K26_STAGED[key] = (tmp, state)
    return _K26_STAGED[key][1]


def ensure_staged_incremental(spark: SparkSession, sf_dir: str) -> None:
    """PUBLIC staging entrypoint for the incremental-maintenance
    entries' input states (k24 token counts, k25 vocabulary, k26
    sliding window) — one staging path shared by the queries and
    bench.py's prestage (the round-12 ADVICE #3 discipline, extended
    in the r13 optimization round). The registered queries measure the
    SERVE path over the maintained state — which is what their
    isolated min-of-N records have always measured, since the staging
    dict persists across runs within a session; prestaging aligns the
    in-suite numbers with those records. The verify driver still pays
    staging inside its own run, so oracle compares are unaffected."""
    _stage_k24(spark, sf_dir)
    _stage_k25(spark, sf_dir)
    _stage_k26(spark, sf_dir)


# --------------------------------------------------------------------------
# Q83 — ROLLING Z-SCORE anomaly detection (round-10 surface, library-
# first; the @query registration is one decorator away). The streaming
# telemetry primitive batch-shaped: each event scored against the
# rolling mean/stddev of the PRECEDING 20 same-type events (the
# trailing frame excludes the current row — self-inclusion would
# dampen exactly the outliers being hunted), flagged at |z| > 2.5;
# warm-up rows (< 10 predecessors) are unscored. Per-type anomaly
# accounting comes back.
#
# Scale: one exchange on event_type feeds the three frame aggregates
# (shared window spec — one sort, multi-aggregate) and the final
# group-by reuses the clustering; frame width bounds per-row state.
# The z boundary sits on continuous data (ulp coincidence at 2.5 is
# measure-zero); max_abs_z rounds for display only.
# --------------------------------------------------------------------------
Q83_WINDOW = 20
Q83_MIN_PREV = 10
Q83_Z = 2.5

Q83_ORACLE = f"""
    WITH w AS (
      SELECT event_type, value,
             avg(value) OVER (PARTITION BY event_type
                 ORDER BY ts, event_id
                 ROWS BETWEEN {Q83_WINDOW} PRECEDING AND 1 PRECEDING)
               AS mu,
             stddev_samp(value) OVER (PARTITION BY event_type
                 ORDER BY ts, event_id
                 ROWS BETWEEN {Q83_WINDOW} PRECEDING AND 1 PRECEDING)
               AS sd,
             count(*) OVER (PARTITION BY event_type
                 ORDER BY ts, event_id
                 ROWS BETWEEN {Q83_WINDOW} PRECEDING AND 1 PRECEDING)
               AS nprev
      FROM events),
    z AS (
      SELECT event_type, (value - mu) / sd AS z FROM w
      WHERE nprev >= {Q83_MIN_PREV} AND sd > 0)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN abs(z) > {Q83_Z} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           round(max(abs(z)), 4) AS max_abs_z
    FROM z GROUP BY event_type ORDER BY event_type
"""


@query("q83_rolling_zscore", oracle=Q83_ORACLE)
def q83_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q83: per-type anomaly accounting under trailing-window z-scores
    — a frame boundary slip (self-inclusion, off-by-one at either
    edge), a warm-up miscount, or a stddev population/sample mixup
    flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts", "event_id"
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-Q83_WINDOW, -1)
    )
    w = (
        e.withColumn("mu", F.avg("value").over(frame))
        .withColumn("sd", F.stddev_samp("value").over(frame))
        .withColumn("nprev", F.count(F.lit(1)).over(frame))
    )
    z = (
        w.filter((F.col("nprev") >= Q83_MIN_PREV) & (F.col("sd") > 0))
        .withColumn("z", (F.col("value") - F.col("mu")) / F.col("sd"))
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(
                (F.abs("z") > Q83_Z).cast("bigint")
            ).alias("n_anomalies"),
            r4(F.max(F.abs("z"))).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# F29 — AS OF ingest-batch time travel (round-10 surface, library-first;
# the @query registration is one decorator away). "Read the corpus as
# it stood when ingest batch B landed": resolve the earliest version
# whose cumulative batch ledger contains B (sources/versioned.py:
# version_for_batch) and read that pinned snapshot — the reproducible-
# training-run verb, keyed on a deterministic coordinate instead of the
# wall clock (which no oracle could replay). Staged as four quarter
# commits carrying batch ids 10/20/30/40; AS OF batch 20 must see
# exactly the first two quarters.
# --------------------------------------------------------------------------
_F29_STAGED: dict[tuple, object] = {}

F29_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE doc_id % 4 IN (0, 1)
    GROUP BY lang ORDER BY lang
"""


@query("f29_asof_batch_read", oracle=F29_ORACLE)
def f29_asof_batch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the snapshot AS OF ingest batch 20 of a four-commit
    table (batches 10/20/30/40 over doc_id quarters): a ledger-
    resolution slip (wrong version, later quarters leaking in) flips
    the hash.

    Scale: resolution is O(versions) driver-side manifest metadata;
    the read plans exactly the pinned version's files — time travel
    costs nothing at scan time."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_version,
        version_for_batch,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F29_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_asof_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        for q in range(4):
            commit_append(
                d.filter(F.col("doc_id") % 4 == q),
                tmp.name,
                batch_id=(q + 1) * 10,
            )
        _F29_STAGED[key] = tmp
    root = _F29_STAGED[key].name
    v = version_for_batch(root, 20)
    return (
        read_version(spark, root, v)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F30 — RESTORE (round-11 surface, library-first; the @query
# registration is one decorator away). Delta's RESTORE TABLE ... TO
# VERSION AS OF as an auditable zero-copy commit: roll a table back to
# an earlier snapshot by manifest reference, keep history readable,
# keep the ingest ledger. The staged lifecycle — append, append, COW
# delete (the "oops" to undo), RESTORE past it, append again — makes
# the final aggregate pin the rollback: without the restore the
# deleted language's rows are missing from the hash; without isolation
# the restore would also wipe the post-restore append.
#
# Scale: the restore commit is O(#files) driver-side JSON whatever the
# table size; the read after it plans the referenced files directly.
# Mechanism + lifecycle invariants: sources/versioned.py::restore_table,
# tests/test_restore.py.
# --------------------------------------------------------------------------
_F30_STAGED: dict[tuple, object] = {}

F30_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    GROUP BY lang ORDER BY lang
"""


@query("f30_restore_read", oracle=F30_ORACLE)
def f30_restore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate a table after RESTORE undid a COW delete: v1+v2 load
    two doc_id thirds, v3 deletes lang='en' (the mistake), v4 restores
    to v2, v5 appends the last third — the result must equal the plain
    full-corpus aggregate, so a restore that missed files, leaked the
    delete, or clobbered the later append flips the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where,
        read_version,
        restore_table,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F30_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_restore_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        commit_append(d.filter(F.col("doc_id") % 3 == 0), tmp.name)
        commit_append(d.filter(F.col("doc_id") % 3 == 1), tmp.name)
        delete_where(spark, tmp.name, "lang = 'en'")
        restore_table(tmp.name, 2)
        commit_append(d.filter(F.col("doc_id") % 3 == 2), tmp.name)
        _F30_STAGED[key] = tmp
    return (
        read_version(spark, _F30_STAGED[key].name)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q84 — gap-based SESSIONIZATION (round-11 surface, library-first; the
# @query registration is one decorator away). The canonical event-
# analytics operator the reference's substrate cannot express at all:
# per-user sessions cut at >30-minute silence, reported as the
# session-length histogram with duration mass. All time arithmetic in
# exact integer microseconds (the q81 discipline), so a boundary event
# can never flip the cut across engines; equal-timestamp ties are
# harmless by construction (a tie's lag-diff is 0 on every ordering,
# and RANGE-framed cumulative sums give tied rows one shared session
# id in both engines).
#
# Scale: ONE exchange + sort on user_id serves the lag, the cumulative
# sum, and the per-session grouping (the q41 clustering-reuse
# discipline — .explain shows a single Exchange); per-user work is
# history-length-bounded. This is the shape Delta/Spark sessionize at
# any scale when the gap rule is relational; the stateful streaming
# twin is k4's session window.
# --------------------------------------------------------------------------
Q84_GAP_US = 30 * 60 * 1_000_000

Q84_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us FROM events),
    m AS (
      SELECT user_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {Q84_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid,
             us
      FROM m),
    per AS (
      SELECT user_id, sid, count(*) AS n_events,
             max(us) - min(us) AS dur
      FROM s GROUP BY user_id, sid)
    SELECT n_events,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(dur) AS BIGINT) AS total_dur_us,
           CAST(max(dur) AS BIGINT) AS max_dur_us
    FROM per GROUP BY n_events ORDER BY n_events
"""


def sessionize(e: DataFrame, gap_us: int = Q84_GAP_US) -> DataFrame:
    """(user_id, sid, n_events, dur) over a (user_id, us) frame —
    factored so tests can drive synthetic boundary histories."""
    w = Window.partitionBy("user_id").orderBy("us")
    new_s = F.when(
        F.lag("us").over(w).isNull()
        | (F.col("us") - F.lag("us").over(w) > gap_us),
        1,
    ).otherwise(0)
    cum = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn("new_s", new_s)
        .withColumn("sid", F.sum("new_s").over(cum))
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("us") - F.min("us")).alias("dur"),
        )
    )


@query("q84_sessionization", oracle=Q84_ORACLE)
def q84_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q84: the session-length histogram under a 30-minute gap rule —
    a cut-boundary slip (>= for >), a lost first-event session start,
    or a cumulative-sum framing difference flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    per = sessionize(e)
    return (
        per.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("dur").alias("total_dur_us"),
            F.max("dur").alias("max_dur_us"),
        )
        .orderBy("n_events")
    )


# --------------------------------------------------------------------------
# Q85 — COHORT RETENTION matrix (round-11 surface, library-first; the
# @query registration is one decorator away). Users are cohorted by
# the epoch week of their FIRST event; each later active week counts
# them at offset = week - cohort_week. Epoch weeks (us // 7 days) keep
# the bucketing timezone-free and integer-exact in both engines.
#
# Scale: one per-user min (partial agg), one broadcast-sized join back
# (users << events), one (cohort, offset) aggregate — no window over
# the event table, no driver loop; this is the shape retention jobs
# run at any scale.
# --------------------------------------------------------------------------
Q85_WEEK_US = 7 * 86400 * 1_000_000

Q85_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {Q85_WEEK_US} AS wk FROM events),
    first AS (
      SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_wk, e.wk - f.cohort_wk AS off
      FROM e JOIN first f USING (user_id))
    SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(off AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort_wk, off ORDER BY cohort_wk, week_offset
"""


@query("q85_cohort_retention", oracle=Q85_ORACLE)
def q85_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q85: the (cohort week, week offset) active-user matrix — a
    first-week slip, a distinct-activity miss (double-counting a user
    active twice in one week), or an offset off-by-one flips the
    hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        # integer DIV, never float division: exact at any epoch
        F.expr(
            f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {Q85_WEEK_US}"
        ).alias("wk"),
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_wk", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_wk", "week_offset")
    )


# --------------------------------------------------------------------------
# Q86 — SCD-2 TEMPORAL dimension join (round-11 surface, library-first;
# the @query registration is one decorator away). The data-warehouse
# staple q20's event-to-event as-of doesn't cover: facts join a
# SLOWLY-CHANGING DIMENSION on (key, fact_ts BETWEEN valid_from AND
# valid_to) — each fact picks up the dimension attributes that were in
# force when it happened. The dimension here is synthesized
# deterministically (per-user tier history: three validity windows
# with per-user irregular cut points, all integer-us arithmetic) so
# the ORACLE performs the same BETWEEN join over the same dim CTE —
# the join semantics are what's under test, not the dim content.
#
# Scale: the classic SCD shape — an equi-join on the dimension KEY
# with the validity range as a residual filter. Versions-per-key is
# small by construction (SCD dims change slowly), so the fan-out is
# bounded and the dim side broadcasts; no interval index needed until
# versions-per-key grows large (then q28's binned range join is the
# lever).
# --------------------------------------------------------------------------
Q86_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, value FROM events),
    bounds AS (
      SELECT min(us) AS lo, max(us) + 1 AS hi FROM e),
    users AS (SELECT DISTINCT user_id FROM e),
    dim AS (
      SELECT u.user_id, w.i,
             CASE w.i WHEN 0 THEN b.lo
                      WHEN 1 THEN b.lo + (b.hi - b.lo)
                                  * (u.user_id % 7 + 1) // 10
                      ELSE b.lo + (b.hi - b.lo)
                                  * (u.user_id % 3 + 8) // 11 END
               AS valid_from,
             CASE w.i WHEN 0 THEN b.lo + (b.hi - b.lo)
                                  * (u.user_id % 7 + 1) // 10
                      WHEN 1 THEN b.lo + (b.hi - b.lo)
                                  * (u.user_id % 3 + 8) // 11
                      ELSE b.hi END AS valid_to,
             (u.user_id + w.i) % 4 AS tier
      FROM users u, (SELECT unnest(generate_series(0, 2)) AS i) w,
           bounds b)
    SELECT d.tier,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           round(sum(e.value), 4) AS sum_value
    FROM e JOIN dim d
      ON d.user_id = e.user_id
     AND e.us >= d.valid_from AND e.us < d.valid_to
    GROUP BY d.tier ORDER BY d.tier
"""


def scd2_dim(e: DataFrame) -> DataFrame:
    """(user_id, valid_from, valid_to, tier): the synthesized SCD-2
    tier history — three windows per user, per-user irregular cuts,
    integer-us arithmetic (DIV, never float) so both engines build the
    identical dimension."""
    from pyspark.sql.window import Window as _W

    bounds = e.agg(
        F.min("us").alias("lo"), (F.max("us") + 1).alias("hi")
    )
    users = e.select("user_id").distinct()
    d = (
        users.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            "lo",
            "hi",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
        )
        .withColumn(
            "cut1",
            F.expr("lo + (hi - lo) * (user_id % 7 + 1) DIV 10"),
        )
        .withColumn(
            "cut2",
            F.expr("lo + (hi - lo) * (user_id % 3 + 8) DIV 11"),
        )
    )
    # key emitted as d_user_id: the dim derives FROM the fact frame,
    # and a same-name join column would be an ambiguous self-join
    return d.select(
        F.col("user_id").alias("d_user_id"),
        F.when(F.col("i") == 0, F.col("lo"))
        .when(F.col("i") == 1, F.col("cut1"))
        .otherwise(F.col("cut2"))
        .alias("valid_from"),
        F.when(F.col("i") == 0, F.col("cut1"))
        .when(F.col("i") == 1, F.col("cut2"))
        .otherwise(F.col("hi"))
        .alias("valid_to"),
        ((F.col("user_id") + F.col("i")) % 4).alias("tier"),
    )


@query("q86_scd2_temporal_join", oracle=Q86_ORACLE)
def q86_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q86: per-tier event accounting through the SCD-2 BETWEEN join —
    a validity-boundary slip (>= vs >), a version overlap/gap in the
    dim build, or a fact matching two versions flips the hash (every
    event matches EXACTLY one version by construction; pinned in
    tests)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    dim = scd2_dim(e)
    joined = e.join(
        F.broadcast(dim),
        [
            F.col("user_id") == F.col("d_user_id"),
            F.col("us") >= F.col("valid_from"),
            F.col("us") < F.col("valid_to"),
        ],
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# Q87 — weighted PAGERANK over the source-provenance graph (round-11
# surface, library-first; the @query registration is one decorator
# away). The iterative-graph-algorithm face beyond d5's connected
# components: rank sources by shared-content mass (d14's edges,
# weight = shared segments), 3 power iterations, damping 0.85. All
# rank arithmetic in INTEGER MICRO-UNITS (bigint, floor division) —
# the k13 quantization discipline taken to its exact conclusion, so
# both engines compute bit-identical ranks with no float-summation
# order anywhere; floor losses make total mass slightly sub-1e6,
# which is deterministic and documented (production PageRank uses
# doubles with a convergence tolerance; the integer form is the
# cross-engine correctness anchor). Dangling sources (no shared
# content) keep the teleport term only.
#
# Scale: per iteration one join of the rank vector (node-sized)
# against the edge list (edge-sized) + one aggregate — the standard
# distributed PageRank shape; iteration count is fixed, driver state
# is zero (the loop builds one lazy plan per iteration over
# node-sized frames).
# --------------------------------------------------------------------------
Q87_ITERS = 3
Q87_DAMP_PCT = 85  # damping in percent — integer arithmetic only
Q87_UNIT = 1_000_000

_Q87_EDGES = f"""
    d AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS w
      FROM documents),
    segs AS (
      SELECT doc_id, source,
             unnest(list_transform(
               generate_series(0,
                 CAST(ceil(len(w) / 8.0) AS BIGINT) - 1),
               i -> array_to_string(w[i * 8 + 1 : i * 8 + 8], ' ')))
               AS seg
      FROM d),
    s AS (
      SELECT seg, source, count(*) AS n FROM segs GROUP BY seg, source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS w
      FROM s a JOIN s b ON a.seg = b.seg AND a.source < b.source
      GROUP BY a.source, b.source),
    edges AS (
      SELECT src_a AS u, src_b AS v, w FROM pairs
      UNION ALL
      SELECT src_b AS u, src_a AS v, w FROM pairs),
    outw AS (SELECT u, sum(w) AS tot FROM edges GROUP BY u),
    nodes AS (SELECT DISTINCT source FROM documents),
    nn AS (SELECT count(*) AS n FROM nodes)
"""


def _q87_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.source,
             ({Q87_UNIT} * (100 - {Q87_DAMP_PCT})) // (100 * nn.n)
             + coalesce((
                 SELECT sum((r.rank * e.w * {Q87_DAMP_PCT})
                            // (o.tot * 100))
                 FROM edges e
                 JOIN {prev} r ON r.source = e.u
                 JOIN outw o ON o.u = e.u
                 WHERE e.v = n.source), 0) AS rank
      FROM nodes n, nn)
    """


Q87_ORACLE = (
    "WITH "
    + _Q87_EDGES
    + f""",
    r0 AS (SELECT source, {Q87_UNIT} // nn.n AS rank FROM nodes, nn)
    """
    + "".join(
        "," + _q87_iter_sql(f"r{i}", f"r{i + 1}")
        for i in range(Q87_ITERS)
    )
    + f"""
    SELECT source, CAST(rank AS BIGINT) AS rank_micro
    FROM r{Q87_ITERS} ORDER BY source
"""
)


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = Q87_ITERS,
    damp_pct: int = Q87_DAMP_PCT,
) -> DataFrame:
    """(source, rank_micro) after ``iters`` integer-exact power
    iterations over a weighted directed edge list (u, v, w)."""
    spark = nodes.sparkSession
    nodes = nodes.persist()
    n = nodes.count()
    outw = edges.groupBy("u").agg(F.sum("w").alias("tot"))
    # ew and nodes are rescanned every iteration: persist once so the
    # upstream segment-provenance join (q87's expensive input) is not
    # recomputed per power step (VERDICT r10 "What's wrong" #4).
    ew = edges.join(outw, "u").persist()
    teleport = (Q87_UNIT * (100 - damp_pct)) // (100 * n)
    ranks = nodes.select(
        "source", F.lit(Q87_UNIT // n).cast("bigint").alias("rank")
    )
    for _ in range(iters):
        inflow = (
            ew.join(ranks, ew["u"] == ranks["source"])
            .select(
                F.col("v"),
                F.expr(
                    f"(rank * w * {damp_pct}) DIV (tot * 100)"
                ).alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["source"] == inflow["v"], "left")
            .select(
                "source",
                (
                    F.lit(teleport)
                    + F.coalesce(F.col("inflow"), F.lit(0))
                ).cast("bigint").alias("rank"),
            )
            # Truncate the compounding iterative lineage: without this
            # the plan (and every re-optimization of it) grows with the
            # iteration count — the standard iterative-algorithm trap
            # at scale. localCheckpoint materializes the K-row rank
            # vector on executors and severs the plan.
            .localCheckpoint(eager=True)
        )
    out = ranks.select(
        "source", F.col("rank").alias("rank_micro")
    ).orderBy("source")
    # ranks is checkpointed, so the result no longer references ew or
    # nodes; release the cached inputs.
    ew.unpersist()
    nodes.unpersist()
    return out


@query("q87_source_pagerank", oracle=Q87_ORACLE)
def q87_source_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q87: integer micro-unit PageRank of every source over the
    shared-segment graph — a weight slip, a dangling-node leak, a
    damping error, or any float-order divergence flips the hash
    (ranks are bit-identical by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        SEGMENT_WORDS,
        d14_source_provenance,
    )

    # the oracle hardcodes the segment width (module-import order makes
    # the constant unimportable at oracle-definition time) — guard the
    # mirror loudly instead of desyncing silently (the d2b lesson)
    assert SEGMENT_WORDS == 8, "Q87_ORACLE hardcodes SEGMENT_WORDS=8"

    pairs = d14_source_provenance(spark, sf_dir).select(
        "src_a", "src_b", F.col("n_shared_segments").alias("w")
    )
    edges = pairs.select(
        F.col("src_a").alias("u"), F.col("src_b").alias("v"), "w"
    ).unionByName(
        pairs.select(
            F.col("src_b").alias("u"), F.col("src_a").alias("v"), "w"
        )
    )
    nodes = docs.select("source").distinct()
    return pagerank_integer(nodes, edges)


# --------------------------------------------------------------------------
# F31 — DESCRIBE HISTORY (round-11 surface, library-first; the @query
# registration is one decorator away). The audit face of the table
# lifecycle: one row per surviving version with its commit kind, file
# accounting, and cumulative ledger size. The staged lifecycle is
# fully deterministic (every commit coalesce(1), fixed verb sequence),
# so the oracle is the LITERAL expected history — the one oracle form
# that is right for pure metadata (there is no data to replay; the
# history IS the assertion).
#
# Scale: O(versions) driver-side manifest reads, no data touched —
# the same cost class as Delta's DESCRIBE HISTORY.
# --------------------------------------------------------------------------
_F31_STAGED: dict[tuple, object] = {}

F31_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'append',  CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(2 AS BIGINT), 'append',  CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(3 AS BIGINT), 'delete',  CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(4 AS BIGINT), 'restore', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(5 AS BIGINT), 'append',  CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(3 AS BIGINT)),
      (CAST(6 AS BIGINT), 'compact', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(3 AS BIGINT))
    ) AS t(version, kind, n_files, n_added, n_batches)
    ORDER BY version
"""


@query("f31_table_history", oracle=F31_ORACLE)
def f31_table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F31: the audit history of a six-verb lifecycle (append, append,
    COW delete, restore, append, OPTIMIZE) — a kind misclassification,
    a file-accounting slip, a ledger reset across restore/compact, or
    a lost version row flips the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        compact,
        delete_where,
        restore_table,
        table_history,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F31_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_history_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        root = tmp.name
        commit_append(
            d.filter(F.col("doc_id") % 3 == 0).coalesce(1), root,
            batch_id=10,
        )
        commit_append(
            d.filter(F.col("doc_id") % 3 == 1).coalesce(1), root,
            batch_id=20,
        )
        # the predicate confines the COW to v1's single file, so the
        # rewrite is one-partition-in/one-file-out regardless of the
        # scan's small-file packing — the literal oracle stays stable
        delete_where(spark, root, "lang = 'en' AND doc_id % 3 = 0")
        restore_table(root, 2)
        commit_append(
            d.filter(F.col("doc_id") % 3 == 2).coalesce(1), root,
            batch_id=30,
        )
        compact(spark, root, target_files=1)
        _F31_STAGED[key] = tmp
    return (
        table_history(spark, _F31_STAGED[key].name)
        .select("version", "kind", "n_files", "n_added", "n_batches")
        .orderBy("version")
    )


# --------------------------------------------------------------------------
# Q88 — market-basket co-occurrence pairs. The association-mining
# primitive (the support table behind apriori/FP-growth): how many
# orders contain each PAIR of parts, reported as the support histogram
# with an exact pair-identity checksum. The reference's substrate has
# no self-join at all; this is the canonical one.
#
# Scale: the pair space is generated per-order (basket² fan-out, but
# baskets are bounded — a 100-item basket yields 4,950 pairs, never a
# corpus² join); the only corpus-sized shuffles are the per-order
# distinct and the (x, y) pair count. A pathological mega-basket is
# the q34 salting story, not this plan's.
# --------------------------------------------------------------------------
Q88_ORACLE = """
    WITH po AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    pairs AS (
      SELECT a.p AS x, b.p AS y, count(*) AS n_orders
      FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(x + y) AS BIGINT) AS pair_key_mass
    FROM pairs GROUP BY n_orders ORDER BY n_orders
"""


@query("q88_basket_pairs", oracle=Q88_ORACLE)
def q88_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q88: per-support pair counts with an exact endpoint checksum —
    a duplicate-line slip (missing per-order distinct), a reflexive or
    double-counted pair (x < y violated), or a join-key error flips
    the hash."""
    po = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        pairs.groupBy("n_orders")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("x") + F.col("y")).alias("pair_key_mass"),
        )
        .orderBy("n_orders")
    )


# --------------------------------------------------------------------------
# Q89 — Pareto / ABC classification: rank parts by shipped quantity,
# classify by cumulative share (A = first 50% of mass, B = to 80%,
# C = the tail). The inventory-curation operator every warehouse
# report runs. The share cut is evaluated with INTEGER cross-
# multiplication (cum * 10 <= total * 5), so no engine ever divides
# before classifying — a float cumshare at a boundary part cannot
# flip the class. l_quantity is integral by TPC-H construction; the
# engine casts it to BIGINT so sums are exact in both engines.
#
# Scale: one partial agg to part grain (the corpus-sized shuffle),
# then ONE global sort of the part-grain table for the cumulative
# window — the p13 ntile discipline; the presentation agg is 3 rows.
# --------------------------------------------------------------------------
Q89_ORACLE = """
    WITH pq AS (
      SELECT l_partkey AS pk, sum(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT sum(qty) AS total FROM pq),
    c AS (
      SELECT pk, qty, total,
             sum(qty) OVER (ORDER BY qty DESC, pk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM pq, t),
    cls AS (
      SELECT CASE WHEN cum * 10 <= total * 5 THEN 'A'
                  WHEN cum * 10 <= total * 8 THEN 'B'
                  ELSE 'C' END AS abc_class,
             pk, qty, total
      FROM c)
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(qty) AS BIGINT) AS sum_qty,
           round(sum(qty) * 1.0 / any_value(total), 4) AS qty_share
    FROM cls GROUP BY abc_class ORDER BY abc_class
"""


@query("q89_pareto_class", oracle=Q89_ORACLE)
def q89_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q89: the ABC mass split — an unstable rank order (ties must
    break on partkey), a cumulative frame slip (RANGE for ROWS double-
    counts tied quantities), or a boundary division flips the hash."""
    pq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    total = pq.agg(F.sum("qty").alias("total"))
    w = (
        Window.orderBy(F.col("qty").desc(), F.col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = pq.crossJoin(F.broadcast(total)).withColumn("cum", F.sum("qty").over(w))
    cls = c.withColumn(
        "abc_class",
        F.when(F.col("cum") * 10 <= F.col("total") * 5, "A")
        .when(F.col("cum") * 10 <= F.col("total") * 8, "B")
        .otherwise("C"),
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("qty").alias("sum_qty"),
            r4(F.sum("qty") * 1.0 / F.any_value("total")).alias("qty_share"),
        )
        .orderBy("abc_class")
    )


# --------------------------------------------------------------------------
# Q90 — gaps-and-islands: per-user CONSECUTIVE-DAY event streaks via
# the day − row_number() island key, reported as the streak-length
# histogram. The classic engagement metric (n-day streaks) and the
# canonical islands pattern — no iteration, one window pass. Days are
# exact integer epoch days (us DIV 86400e6), the q84/q85 discipline.
#
# Scale: one distinct to (user, day) grain, one window sorted within
# user (row_number), one re-agg — all on the user clustering; per-user
# work is history-bounded. No self-join formulation (the O(days²)
# trap) anywhere.
# --------------------------------------------------------------------------
Q90_DAY_US = 86400 * 1_000_000

Q90_ORACLE = f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {Q90_DAY_US} AS day
      FROM events),
    isl AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM ud),
    streaks AS (
      SELECT user_id, island, count(*) AS streak_len,
             min(day) AS start_day
      FROM isl GROUP BY user_id, island)
    SELECT CAST(streak_len AS BIGINT) AS streak_len,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(start_day) AS BIGINT) AS first_start_day
    FROM streaks GROUP BY streak_len ORDER BY streak_len
"""


@query("q90_streak_islands", oracle=Q90_ORACLE)
def q90_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q90: the consecutive-day streak histogram — a missing (user,
    day) dedup (same-day events split an island), an off-by-one in the
    island key, or a non-dense row numbering flips the hash."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {Q90_DAY_US}"
            ).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    streaks = (
        ud.withColumn("island", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min("day").alias("start_day"),
        )
    )
    return (
        streaks.groupBy("streak_len")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("start_day").alias("first_start_day"),
        )
        .orderBy("streak_len")
    )


# --------------------------------------------------------------------------
# Q91 — TRIANGLE COUNT over the part co-purchase graph: nodes are
# parts, an undirected edge joins two parts that share an order, a
# triangle is three pairwise-connected parts. The graph-analytics
# primitive behind clustering-coefficient / community features — and a
# second graph shape beside q87's iterative PageRank: q91 is the
# JOIN-bound one.
#
# Scale: the engine runs the DEGREE-ORIENTED wedge algorithm — every
# edge is directed from its lower-(degree, id) endpoint, wedges are
# pairs of out-edges, and a wedge closes iff its two far endpoints are
# an edge. Orienting by degree bounds out-degrees by O(sqrt(edges)) on
# any graph (arboricity bound), so wedge volume is O(edges^1.5) worst
# case instead of sum(degree²) — the difference between a hub node
# generating deg² wedges and its edges being charged to their smaller
# endpoints. Triangle count is orientation-invariant, so the oracle
# replays the plain id-ordered triple join.
# --------------------------------------------------------------------------
Q91_ORACLE = """
    WITH po AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM po a JOIN po b ON a.o = b.o AND a.p < b.p),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT x AS v FROM e UNION ALL SELECT y AS v FROM e)
      GROUP BY v),
    tri AS (
      SELECT e1.x AS a, e1.y AS b, e2.y AS c
      FROM e e1 JOIN e e2 ON e2.x = e1.y
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
           CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT coalesce(sum(a + b + c), 0) FROM tri) AS BIGINT)
             AS tri_key_mass
"""


@query("q91_triangle_count", oracle=Q91_ORACLE)
def q91_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q91: global triangle census with an endpoint checksum — a
    double-counted wedge (orientation tie-break slip), a missed
    closing edge (the (min, max) canonicalization), or an edge-dedup
    error flips the hash. The engine's degree orientation must count
    EXACTLY what the oracle's id orientation counts."""
    po = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
        # The edge set is read four ways (degrees, orientation join,
        # closing-edge probe, edge count); materialize it once instead
        # of re-running the lineitem self-join + distinct per use — the
        # pre-optimization plan carried 56 lineitem scans across 2,007
        # plan lines / 114 Exchanges, and Catalyst planning alone cost
        # seconds (guide §3.3/§7.2: truncate duplicated subtrees).
        # e/deg/dir_e checkpoints are non-replicated executor-local
        # storage: an executor loss mid-query fails the job (retry
        # recomputes) — accepted for the planning-cost win above.
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("x").alias("v"))
        .unionAll(e.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        # Re-read by both endpoint-attach joins and the node-count
        # aggregate; K-distinct-node sized, cheap to hold.
        .localCheckpoint(eager=False)
    )
    # attach degrees, orient each edge from the lower-(d, id) endpoint
    ed = (
        e.join(deg.withColumnRenamed("v", "x").withColumnRenamed("d", "dx"), "x")
        .join(deg.withColumnRenamed("v", "y").withColumnRenamed("d", "dy"), "y")
    )
    fwd = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    dir_e = ed.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("dst"),
        # Read by the adjacency build and the edge probe; one
        # materialization instead of two degree-attach joins.
    ).localCheckpoint(eager=False)
    # Triangle count by ADJACENCY INTERSECTION over the degree-oriented
    # DAG (r13 optimization round, guide §3.3 "explode before a join
    # multiplies the shuffle"): the previous form materialized EVERY
    # wedge (two out-edges of a common source) and probed each against
    # the closing-edge set — wedge volume is Σ_src d_out², which at
    # scale dwarfs the triangle count. Here each oriented edge (u, v)
    # instead intersects the two out-neighbor lists, so non-closing
    # wedges are never materialized and the only new shuffle is the
    # out-adjacency build (out-degree is O(√m)-bounded under degree
    # orientation, so no list is pathological). Equivalence: a triangle
    # x→y→z (DAG order by (d, id)) is counted exactly once — at edge
    # (x, y), where z ∈ N⁺(x) ∩ N⁺(y); at (x, z) it is missed because
    # y ∉ N⁺(z), and at (y, z) because x ∉ N⁺(y) — the same
    # once-per-triangle census the wedge+closing form computed, with
    # the identical key mass x+y+z = (u+v) per member + Σ members.
    adj = dir_e.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    tri_e = (
        dir_e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(
            adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu")),
            "u",
        )
        .join(
            adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv")),
            "v",
        )
        .withColumn("common", F.array_intersect("nu", "nv"))
        .select(
            F.size("common").alias("n_c"),
            (F.col("u") + F.col("v")).alias("uv"),
            F.aggregate(
                "common",
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("c_sum"),
        )
    )
    stats = tri_e.agg(
        F.coalesce(F.sum("n_c"), F.lit(0)).cast("bigint").alias("n_triangles"),
        F.coalesce(
            F.sum(F.col("n_c") * F.col("uv") + F.col("c_sum")), F.lit(0)
        ).alias("tri_key_mass"),
    )
    meta = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
        )
    )
    return F.broadcast(meta).crossJoin(stats).select(
        "n_nodes", "n_edges", "max_degree", "n_triangles", "tri_key_mass"
    )


# --------------------------------------------------------------------------
# Q92 — calendar GAP-FILL with forward-fill: the time-series
# densification operator (Timescale's time_bucket_gapfill + locf).
# Per event type, the daily event-count series is densified over the
# GLOBAL observed [min_day, max_day] calendar; missing days take
# count 0 and carry the last observed day's count forward (locf).
# Days are exact integer epoch days; the calendar is generated with
# sequence()/generate_series, never read from data.
#
# Scale: the calendar is |days| × |types| rows — metadata-sized next
# to the event table (a 10-year calendar is 3,653 rows per type); the
# corpus contributes one partial agg to (type, day) grain. The
# forward-fill window sorts the DENSE series (small), not the corpus.
# --------------------------------------------------------------------------
Q92_ORACLE = f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // {Q90_DAY_US} AS day, count(*) AS n
      FROM events GROUP BY event_type, day),
    bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM d),
    cal AS (
      SELECT t.event_type,
             unnest(generate_series(bounds.lo, bounds.hi)) AS day
      FROM (SELECT DISTINCT event_type FROM d) t, bounds),
    dense AS (
      SELECT cal.event_type, cal.day,
             coalesce(d.n, 0) AS n,
             CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS is_gap,
             coalesce(last_value(d.n IGNORE NULLS) OVER (
               PARTITION BY cal.event_type ORDER BY cal.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS locf
      FROM cal LEFT JOIN d
        ON d.event_type = cal.event_type AND d.day = cal.day)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(is_gap) AS BIGINT) AS n_gap_days,
           CAST(sum(n) AS BIGINT) AS observed_mass,
           CAST(sum(CASE WHEN is_gap = 1 THEN locf ELSE 0 END) AS BIGINT)
             AS carried_mass
    FROM dense GROUP BY event_type ORDER BY event_type
"""


@query("q92_gapfill_locf", oracle=Q92_ORACLE)
def q92_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q92: gap-filled daily series per event type — a calendar bound
    slip, a gap misclassified as observed, or a forward-fill that
    reads the zero-filled column instead of the observed one flips
    the hash (carried_mass counts locf on GAP days only)."""
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {Q90_DAY_US}"
            ).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    obs = (
        d.withColumnRenamed("day", "d_day")
        .withColumnRenamed("event_type", "d_type")
    )
    dense = cal.join(
        obs,
        (F.col("event_type") == F.col("d_type"))
        & (F.col("day") == F.col("d_day")),
        "left",
    ).select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("cnt"),
        F.when(F.col("d_day").isNull(), 1).otherwise(0).alias("is_gap"),
        F.col("n").alias("obs_n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = dense.withColumn(
        "locf", F.coalesce(F.last("obs_n", ignorenulls=True).over(w), F.lit(0))
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("is_gap").alias("n_gap_days"),
            F.sum("cnt").alias("observed_mass"),
            F.sum(
                F.when(F.col("is_gap") == 1, F.col("locf")).otherwise(0)
            ).alias("carried_mass"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# F32 — CHECK-constrained table read (Delta's ALTER TABLE ADD
# CONSTRAINT ... CHECK): stage a versioned table, attach a CHECK
# constraint (validated against EXISTING data at attach time, a
# metadata-only commit), append under it, then prove enforcement by
# attempting a VIOLATING append — which must raise and burn no
# version. The face reads the final snapshot; the history carries the
# 'constraint' commit kind.
#
# Scale: attach cost is one validation scan of the table (same as
# Delta); enforcement cost is O(first violation) per incoming batch —
# a take(1) over the batch, never a table scan. Constraints are
# snapshot metadata carried by every commit verb (append, COW
# rewrite, merge, compact, clone, restore).
# --------------------------------------------------------------------------
_F32_STAGED: dict[tuple, object] = {}

F32_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(3 AS BIGINT) AS n_versions,
           CAST(1 AS BIGINT) AS n_constraint_commits
    FROM documents GROUP BY lang ORDER BY lang
"""


@query("f32_check_constraint_read", oracle=F32_ORACLE)
def f32_check_constraint_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F32: per-lang stats of a CHECK-constrained table after one
    rejected append — a constraint that silently admits the poisoned
    batch (its negative n_chars rows shift sum_chars), a burned
    version on rejection, or a lost constraint-kind history row flips
    the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        ConstraintViolationError,
        add_check_constraint,
        commit_append,
        latest_version,
        read_version,
        table_history,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F32_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_constraint_")
        d = load_table(spark, sf_dir, "documents")
        commit_append(d.filter(F.col("doc_id") % 2 == 0), tmp.name)
        add_check_constraint(
            spark, tmp.name, "chars_nonneg",
            "n_chars >= 0 AND lang IS NOT NULL",
        )
        commit_append(d.filter(F.col("doc_id") % 2 == 1), tmp.name)
        poisoned = d.limit(5).withColumn("n_chars", F.lit(-1).cast("long"))
        try:
            commit_append(poisoned, tmp.name)
            raise AssertionError(
                "f32 staging: violating append was ACCEPTED"
            )
        except ConstraintViolationError:
            pass
        if latest_version(tmp.name) != 3:
            raise AssertionError(
                "f32 staging: rejected append burned a version"
            )
        _F32_STAGED[key] = tmp
    root = _F32_STAGED[key].name
    hist = table_history(spark, root).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(
            F.when(F.col("kind") == "constraint", 1).otherwise(0)
        ).alias("n_constraint_commits"),
    )
    return (
        read_version(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(hist))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F33 — CONCURRENT-WRITER read (Delta's optimistic concurrency,
# minimally): two appends race from the same base version — the
# manifest link's EEXIST makes the slower one LOSE the slot, and
# because appends commute, it REBASES onto the winner's head and
# commits one version higher (data files written once, only the
# manifest retries). Non-commuting verbs (COW delete/update, merge)
# take an ``expected_version`` CAS instead: a stale read snapshot is
# a hard ConcurrentWriteError, never a rebase. The face stages
# exactly that race deterministically (the _assume_parent injection
# hook), proves the stale delete is refused, and reads the merged
# result: all three appends present, nothing lost, nothing doubled.
#
# Scale: conflict detection is O(1) manifest metadata (a version
# compare + a link syscall); a rebase re-reads one manifest — commit
# cost stays independent of table size, Delta's contract.
# --------------------------------------------------------------------------
_F33_STAGED: dict[tuple, object] = {}

F33_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(3 AS BIGINT) AS n_versions,
           CAST(3 AS BIGINT) AS n_appends
    FROM documents GROUP BY lang ORDER BY lang
"""


@query("f33_concurrent_append_read", oracle=F33_ORACLE)
def f33_concurrent_append_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F33: per-lang stats after a two-writer append race plus a
    refused stale delete — a lost loser (its rows vanish), a
    double-applied rebase, a clobbered winner manifest, or a stale
    delete that went through (doc_id % 3 = 0 rows vanish) all flip
    the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        ConcurrentWriteError,
        commit_append,
        delete_where,
        latest_version,
        read_version,
        table_history,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F33_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_race_")
        d = load_table(spark, sf_dir, "documents")
        base = commit_append(d.filter(F.col("doc_id") % 3 == 0), tmp.name)
        # writers X and Y both read head = base; X lands first
        vx = commit_append(
            d.filter(F.col("doc_id") % 3 == 1), tmp.name, batch_id=101
        )
        # Y built against the stale base -> EEXIST -> auto-rebase
        vy = commit_append(
            d.filter(F.col("doc_id") % 3 == 2), tmp.name, batch_id=102,
            _assume_parent=base,
        )
        if (vx, vy) != (2, 3):
            raise AssertionError(f"f33 staging: race landed as {(vx, vy)}")
        # a COW delete whose read snapshot went stale must be REFUSED
        try:
            delete_where(
                spark, tmp.name, "doc_id % 3 = 0", expected_version=base
            )
            raise AssertionError("f33 staging: stale delete was ACCEPTED")
        except ConcurrentWriteError:
            pass
        if latest_version(tmp.name) != 3:
            raise AssertionError(
                "f33 staging: refused delete burned a version"
            )
        _F33_STAGED[key] = tmp
    root = _F33_STAGED[key].name
    hist = table_history(spark, root).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(
            F.when(F.col("kind") == "append", 1).otherwise(0)
        ).alias("n_appends"),
    )
    return (
        read_version(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(hist))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F34 — DELETION VECTORS: merge-on-read DELETE (round-10 wave 4).
# Delta's deletion vectors / Iceberg's positional delete files,
# re-expressed Spark-first over the `_metadata` hidden columns: a
# delete commit writes (file, row_index) sidecars and ZERO data files;
# every reader applies one LEFT ANTI join; OPTIMIZE's flush
# (materialize_dvs) folds vectors back into plain files file-
# granularly. The staged lifecycle — three quarter commits, two
# stacked DV deletes, a post-delete append (rows that must NOT be
# affected), then an in-query materialize-equivalence probe — makes
# the hash pin the whole contract: a vector that leaks onto the late
# append, fails to union, resurrects under materialization, or drops
# live rows all flip it.
#
# Scale: the delete is O(matching rows) distributed sidecar write +
# one O(#files) manifest — zero write amplification on a 100 TB
# table; the read-side anti-join is O(deleted rows), broadcast when
# small, AQE-replanned when not (Iceberg's positional-delete merge
# asymptotics). Mechanism + verb-composition invariants:
# sources/versioned.py::delete_where_dv, tests/test_deletion_vectors.py.
# --------------------------------------------------------------------------
_F34_STAGED: dict[tuple, object] = {}

F34_ORACLE = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    WHERE doc_id % 4 = 3
       OR (lang <> 'de' AND doc_id % 7 <> 3)
    GROUP BY source ORDER BY source
"""


@query("f34_deletion_vector_read", oracle=F34_ORACLE)
def f34_deletion_vector_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F34: per-source stats through two stacked merge-on-read deletes.
    v1-v3 load doc_id quarters 0-2, v4 DV-deletes lang='de', v5
    DV-deletes doc_id%7=3 (vectors UNION), v6 appends quarter 3 —
    which, arriving after the deletes, keeps its 'de' and %7 rows. The
    staging then probes materialize-equivalence: a full OPTIMIZE flush
    of the vectors must leave the aggregate bit-identical, and the
    result is read from the UNFLUSHED snapshot so the driver hash
    exercises the anti-join read path itself."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where_dv,
        materialize_dvs,
        read_manifest,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F34_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_dv_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
        for q in range(3):
            commit_append(d.filter(F.col("doc_id") % 4 == q), tmp.name)
        v4 = delete_where_dv(spark, tmp.name, "lang = 'de'")
        v5 = delete_where_dv(spark, tmp.name, "doc_id % 7 = 3")
        if (v4, v5) != (4, 5):
            raise AssertionError(f"f34 staging: DV commits landed {(v4, v5)}")
        if read_manifest(tmp.name, 5)["added"]:
            raise AssertionError(
                "f34 staging: a DV delete wrote data files — merge-on-"
                "read contract broken"
            )
        commit_append(d.filter(F.col("doc_id") % 4 == 3), tmp.name)
        # materialize-equivalence probe on a THROWAWAY restore of the
        # same root: flush vectors, aggregate must be bit-identical
        pre = read_version(spark, tmp.name, 6).agg(
            F.count(F.lit(1)), F.sum("n_chars")
        ).collect()[0]
        materialize_dvs(spark, tmp.name)  # v7: plain files, no dvs
        post = read_version(spark, tmp.name, 7).agg(
            F.count(F.lit(1)), F.sum("n_chars")
        ).collect()[0]
        if tuple(pre) != tuple(post):
            raise AssertionError(
                f"f34 staging: materialize_dvs changed content "
                f"{tuple(pre)} -> {tuple(post)}"
            )
        _F34_STAGED[key] = tmp
    root = _F34_STAGED[key].name
    return (
        # v6 = the unflushed merge-on-read snapshot: the driver hash
        # goes through the DV anti-join, not the materialized files
        read_version(spark, root, 6)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q93 — PEAK CONCURRENCY sweep-line (round-10 wave 4): the classic
# interval-overlap operator (max simultaneous sessions per calendar
# day) the reference's substrate cannot express. Sessions come from
# q84's gap rule; each contributes +1 at its start and -1 one
# microsecond after its last event (inclusive-end intervals), clipped
# to day boundaries, and the peak is the max of the running boundary
# sum. All integer microseconds; the tie rule is pinned by ordering
# (us, delta) so simultaneous ends apply before starts and RANGE-frame
# peers apply together in both engines.
#
# Scale: the sweep partitions by DAY — no global ordered sum; per-day
# work is bounded by that day's boundary count, the exact shape a
# 1000-executor sweep over years of data wants. Session derivation
# reuses q84's single exchange on user_id.
# --------------------------------------------------------------------------
Q93_DAY_US = 86400 * 1_000_000

Q93_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us FROM events),
    m AS (
      SELECT user_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {Q84_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid,
             us
      FROM m),
    ses AS (
      SELECT user_id, sid, min(us) AS s_us, max(us) + 1 AS e_us
      FROM s GROUP BY user_id, sid),
    d AS (
      SELECT s_us, e_us,
             unnest(generate_series(s_us // {Q93_DAY_US},
                                    (e_us - 1) // {Q93_DAY_US})) AS day
      FROM ses),
    clip AS (
      SELECT day,
             greatest(s_us, day * {Q93_DAY_US}) AS cs,
             least(e_us, (day + 1) * {Q93_DAY_US}) AS ce
      FROM d),
    b AS (
      SELECT day, cs AS us, 1 AS delta FROM clip
      UNION ALL
      SELECT day, ce AS us, -1 AS delta FROM clip),
    r AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day ORDER BY us, delta) AS run
      FROM b)
    SELECT CAST(r.day AS BIGINT) AS day_idx,
           CAST(max(r.run) AS BIGINT) AS peak_concurrent,
           CAST(n.n AS BIGINT) AS n_active_sessions
    FROM r JOIN (SELECT day, count(*) AS n FROM clip GROUP BY day) n
      USING (day)
    GROUP BY r.day, n.n ORDER BY day_idx
"""


@query("q93_peak_concurrency", oracle=Q93_ORACLE)
def q93_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q93: per-day peak concurrent sessions — an interval-end
    convention slip (inclusive vs exclusive), a tie-order flip at
    equal boundary instants, a midnight clip miss on a cross-day
    session, or a lost day in a multi-day span all flip the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    day = Q93_DAY_US
    w = Window.partitionBy("user_id").orderBy("us")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    ses = (
        e.withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > Q84_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(cum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("s_us"),
            (F.max("us") + 1).alias("e_us"),
        )
    )
    clip = (
        ses.withColumn(
            "day",
            F.explode(
                F.sequence(
                    (F.col("s_us") / day).cast("bigint"),
                    ((F.col("e_us") - 1) / day).cast("bigint"),
                )
            ),
        )
        .select(
            "day",
            F.greatest(F.col("s_us"), F.col("day") * day).alias("cs"),
            F.least(F.col("e_us"), (F.col("day") + 1) * day).alias("ce"),
        )
    )
    bounds = clip.select(
        "day", F.col("cs").alias("us"), F.lit(1).alias("delta")
    ).unionAll(
        clip.select("day", F.col("ce").alias("us"), F.lit(-1).alias("delta"))
    )
    sweep = Window.partitionBy("day").orderBy("us", "delta")
    peaks = (
        bounds.withColumn("run", F.sum("delta").over(sweep))
        .groupBy("day")
        .agg(F.max("run").alias("peak_concurrent"))
    )
    active = clip.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active_sessions")
    )
    return (
        peaks.join(active, "day")
        .select(
            F.col("day").alias("day_idx"),
            "peak_concurrent",
            "n_active_sessions",
        )
        .orderBy("day_idx")
    )


# --------------------------------------------------------------------------
# Q94 — FIFO BUDGET ALLOCATION (round-10 wave 4): the running-total
# depletion operator (payments-to-invoices, inventory draw-down,
# quota spend). Each customer draws a fixed budget against their
# orders in (date, key) order; an order is filled up to what remains.
# All arithmetic in exact BIGINT cents (the q87/q89 discipline) — no
# engine adds doubles in engine-chosen order, so full/partial/empty
# classification is bit-stable.
#
# Scale: one window exchange on o_custkey (per-customer running sum),
# then a partial-agg rollup — no self-join, no driver loop.
# --------------------------------------------------------------------------
Q94_BUDGET_CENTS = 100_000_000  # $1M per customer

Q94_ORACLE = f"""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate
      FROM orders),
    c AS (
      SELECT o_orderpriority, cents,
             sum(cents) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS cum
      FROM o),
    a AS (
      SELECT o_orderpriority, cents,
             CASE WHEN cum <= {Q94_BUDGET_CENTS} THEN cents
                  WHEN cum - cents >= {Q94_BUDGET_CENTS} THEN 0
                  ELSE {Q94_BUDGET_CENTS} - (cum - cents) END AS alloc
      FROM c)
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN alloc = cents THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full,
           CAST(sum(CASE WHEN alloc > 0 AND alloc < cents THEN 1 ELSE 0 END)
             AS BIGINT) AS n_partial,
           CAST(sum(CASE WHEN alloc = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unfilled,
           CAST(sum(alloc) AS BIGINT) AS alloc_cents
    FROM a GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("q94_fifo_allocation", oracle=Q94_ORACLE)
def q94_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q94: per-priority fill census of a $1M-per-customer FIFO draw —
    a frame slip (RANGE vs ROWS on the unique (date, key) order is
    harmless, but losing the key tiebreak is not), a boundary-order
    overflow misclassification, or float drift in the running total
    all flip the hash."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
        "o_orderdate",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    b = Q94_BUDGET_CENTS
    alloc = F.when(F.col("cum") <= b, F.col("cents")).when(
        F.col("cum") - F.col("cents") >= b, F.lit(0)
    ).otherwise(F.lit(b) - (F.col("cum") - F.col("cents")))
    return (
        o.withColumn("cum", F.sum("cents").over(w))
        .withColumn("alloc", alloc)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.when(F.col("alloc") == F.col("cents"), 1).otherwise(0)
            ).alias("n_full"),
            F.sum(
                F.when(
                    (F.col("alloc") > 0) & (F.col("alloc") < F.col("cents")),
                    1,
                ).otherwise(0)
            ).alias("n_partial"),
            F.sum(F.when(F.col("alloc") == 0, 1).otherwise(0)).alias(
                "n_unfilled"
            ),
            F.sum("alloc").alias("alloc_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q95 — RELATIONAL DIVISION (round-10 wave 4): "customers whose orders
# cover EVERY order priority" — the universal-quantifier join (Codd's
# division) that trips naive NOT EXISTS formulations. Expressed as the
# scalable count-distinct-equals-total form: one per-customer distinct
# count against one broadcast scalar, no double-negated correlated
# subquery, no priorities×customers blow-up.
#
# Scale: one partial-agg exchange on o_custkey + a broadcast of the
# 1-row total; the customer join is key-equi on the surviving
# (complete) customers only.
# --------------------------------------------------------------------------
Q95_ORACLE = """
    WITH total AS (
      SELECT count(DISTINCT o_orderpriority) AS t FROM orders),
    cov AS (
      SELECT o_custkey
      FROM orders GROUP BY o_custkey
      HAVING count(DISTINCT o_orderpriority) = (SELECT t FROM total))
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_complete,
           round(sum(c_acctbal), 4) AS sum_acctbal
    FROM customer JOIN cov ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@query("q95_relational_division", oracle=Q95_ORACLE)
def q95_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q95: per-segment census of customers covering all order
    priorities — an off-by-one in the coverage bar, a distinct miss,
    or a lost segment flips the hash."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    total = o.agg(
        F.countDistinct("o_orderpriority").alias("t")
    )
    cov = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("k"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("k") == F.col("t"))
        .select("o_custkey")
    )
    return (
        cust.join(cov, cust["c_custkey"] == cov["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_complete"),
            r4(F.sum("c_acctbal")).alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q96 — NUMERIC COLUMN PROFILE (round-10 wave 4): the Deequ/data-
# quality profiling operator — per-column count / nulls / distincts /
# min / max / mean / stddev plus an 8-bin equi-width histogram, in ONE
# pass via melt-to-long (no per-column scan loop). Histogram bins are
# computed from the per-column min/max with a clamp (never an epsilon
# fudge), integer-exact in both engines; mean/stddev round to 4dp (the
# q1 float discipline).
#
# Scale: the melt multiplies rows by the column count but stays a
# narrow projection feeding ONE partial-aggregated groupBy — the shape
# that profiles a 100 TB table in a single scan. A per-column loop of
# full scans (the naive form) would read the table k times.
# --------------------------------------------------------------------------
Q96_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
Q96_BINS = 8


def _q96_hist_sql(col: str) -> str:
    return f"""
      SELECT '{col}' AS column_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(v) AS BIGINT) AS n_null,
             CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
             round(min(v), 4) AS min_v,
             round(max(v), 4) AS max_v,
             round(avg(v), 4) AS mean_v,
             round(stddev_samp(v), 4) AS stddev_v,
             {", ".join(
                 f'''CAST(sum(CASE WHEN bin = {b} THEN 1 ELSE 0 END)
                 AS BIGINT) AS h{b}'''
                 for b in range(Q96_BINS)
             )}
      FROM (
        SELECT {col} AS v,
               least(CAST(floor(({col} - mm.lo) * {Q96_BINS}
                                / (mm.hi - mm.lo)) AS BIGINT),
                     {Q96_BINS - 1}) AS bin
        FROM lineitem,
             (SELECT min({col}) AS lo, max({col}) AS hi FROM lineitem) mm
      )
    """


Q96_ORACLE = (
    " UNION ALL ".join(
        f"SELECT * FROM ({_q96_hist_sql(c)})" for c in Q96_COLS
    )
    + " ORDER BY column_name"
)


@query("q96_numeric_profile", oracle=Q96_ORACLE)
def q96_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q96: one-pass numeric profile of four lineitem measures — a
    null-counting slip, a histogram edge landing in the wrong bin, or
    a max row escaping the clamp into a ninth bin all flip the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in Q96_COLS
                ]
            )
        ).alias("m")
    ).select("m.column_name", "m.v")
    w = Window.partitionBy("column_name")
    binned = melted.withColumn(
        "bin",
        F.least(
            F.floor(
                (F.col("v") - F.min("v").over(w))
                * Q96_BINS
                / (F.max("v").over(w) - F.min("v").over(w))
            ).cast("bigint"),
            F.lit(Q96_BINS - 1),
        ),
    )
    return (
        binned.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
            r4(F.min("v")).alias("min_v"),
            r4(F.max("v")).alias("max_v"),
            r4(F.avg("v")).alias("mean_v"),
            r4(F.stddev_samp("v")).alias("stddev_v"),
            *[
                F.sum(
                    F.when(F.col("bin") == b, 1).otherwise(0)
                ).alias(f"h{b}")
                for b in range(Q96_BINS)
            ],
        )
        .orderBy("column_name")
    )


# --------------------------------------------------------------------------
# F35 — COLUMN MAPPING: metadata-only RENAME COLUMN (round-10 wave 4).
# Delta's column-mapping name mode re-expressed minimally: data files
# keep their original ("physical") column names forever, the manifest
# carries the logical schema plus a logical->physical map, and a
# rename is one O(#files) manifest commit — zero bytes rewritten at
# any table size. The staged lifecycle makes the indirection load-
# bearing across HETEROGENEOUS files: two quarters committed under
# the old name, the rename, a third quarter appended under the new
# name (its files still write the physical spelling), a COW delete
# predicated ON THE NEW NAME that must hit rows in both file
# generations, then a fourth quarter appended after the delete. The
# staging also probes that the newest file's raw parquet schema
# speaks the physical name — a rename that rewrote data, missed old
# files, or leaked physical names to readers flips the hash or the
# probe. Mechanism + verb-composition invariants:
# sources/versioned.py::rename_column, tests/test_column_mapping.py.
# --------------------------------------------------------------------------
_F35_STAGED: dict[tuple, object] = {}

F35_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    WHERE doc_id % 4 = 3 OR n_chars % 5 <> 0
    GROUP BY lang ORDER BY lang
"""


@query("f35_column_mapping_read", oracle=F35_ORACLE)
def f35_column_mapping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F35: per-lang stats through a mid-history column rename — the
    delete predicate runs on the NEW logical name over files written
    both before and after the rename, so a broken physical-name
    indirection loses rows from one file generation and flips the
    hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where,
        read_manifest,
        read_version,
        rename_column,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F35_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_colmap_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        commit_append(d.filter(F.col("doc_id") % 4 < 2), tmp.name)
        rename_column(tmp.name, "n_chars", "char_count")
        commit_append(
            d.filter(F.col("doc_id") % 4 == 2).withColumnRenamed(
                "n_chars", "char_count"
            ),
            tmp.name,
        )
        delete_where(spark, tmp.name, "char_count % 5 = 0")
        commit_append(
            d.filter(F.col("doc_id") % 4 == 3).withColumnRenamed(
                "n_chars", "char_count"
            ),
            tmp.name,
        )
        # indirection probes: readers see the logical name only, the
        # newest file stores the physical one
        cols = read_version(spark, tmp.name).columns
        if "char_count" not in cols or "n_chars" in cols:
            raise AssertionError(f"f35 staging: logical schema leak {cols}")
        m = read_manifest(tmp.name, 5)
        import os as _os

        raw = spark.read.parquet(_os.path.join(tmp.name, m["added"][0]))
        if "n_chars" not in raw.columns:
            raise AssertionError(
                "f35 staging: post-rename file dropped the physical "
                f"column spelling ({raw.columns})"
            )
        _F35_STAGED[key] = tmp
    return (
        read_version(spark, _F35_STAGED[key].name)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("char_count").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F36 — STABLE ROW IDS (round-10 wave 4): Delta's row tracking,
# minimally — a dense synthetic id derived at read time from manifest
# file offsets + the `_metadata.row_index` physical position. No
# shuffle, no window over data, no zipWithIndex; ids are dense at
# birth, stable under append (old rows never renumber), stable under
# DV delete (survivors keep their ids, dead ids vanish), and
# layout-independent (same ids under any split parallelism — pinned
# in tests/test_rowids.py). The example-level lineage primitive: join
# loss spikes back to corpus rows, key a labels sidecar, audit-cite
# examples — without materializing an id column into 100 TB of
# parquet.
#
# The staged lifecycle commits three doc_id-sorted single-file
# batches, DV-deletes doc_id%7=2 (ids must NOT shift), then
# aggregates id spans per lang; the oracle replays the id assignment
# as rank-within-commit + commit base — integer-exact.
#
# Scale: offsets are O(#files) driver-side metadata; the id join is a
# broadcast of the (file, base) table; the scan stays columnar with
# pushdown. Mechanism: sources/versioned.py::read_with_rowids.
# --------------------------------------------------------------------------
_F36_STAGED: dict[tuple, object] = {}

F36_ORACLE = """
    WITH d AS (
      SELECT doc_id, lang, doc_id % 3 AS grp FROM documents),
    n AS (
      SELECT sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1
      FROM d),
    r AS (
      SELECT doc_id, lang, grp,
             row_number() OVER (PARTITION BY grp ORDER BY doc_id) - 1
               AS rk
      FROM d),
    ids AS (
      SELECT doc_id, lang, grp,
             CASE grp WHEN 0 THEN rk
                      WHEN 1 THEN n.n0 + rk
                      ELSE n.n0 + n.n1 + rk END AS row_id
      FROM r, n),
    live AS (
      SELECT * FROM ids WHERE grp = 2 OR doc_id % 7 <> 2)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(row_id) AS BIGINT) AS min_rid,
           CAST(max(row_id) AS BIGINT) AS max_rid,
           CAST(sum(row_id) AS BIGINT) AS sum_rid
    FROM live GROUP BY lang ORDER BY lang
"""


@query("f36_stable_rowids", oracle=F36_ORACLE)
def f36_stable_rowids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F36: per-lang row-id spans through three sorted commits and a
    DV delete — an id that shifts under deletion, renumbers on
    append, or depends on scan parallelism flips the exact integer
    sums."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where_dv,
        read_with_rowids,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F36_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_rowid_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang"
        )
        for g in range(2):
            commit_append(
                d.filter(F.col("doc_id") % 3 == g)
                .repartition(1)
                .sortWithinPartitions("doc_id"),
                tmp.name,
            )
        delete_where_dv(spark, tmp.name, "doc_id % 7 = 2")
        pre = {
            r["doc_id"]: r["_row_id"]
            for r in read_with_rowids(spark, tmp.name).collect()
        }
        commit_append(
            d.filter(F.col("doc_id") % 3 == 2)
            .repartition(1)
            .sortWithinPartitions("doc_id"),
            tmp.name,
        )
        post = {
            r["doc_id"]: r["_row_id"]
            for r in read_with_rowids(spark, tmp.name).collect()
        }
        # stability probe: the append must not move one existing id
        moved = [k for k, v in pre.items() if post.get(k) != v]
        if moved:
            raise AssertionError(
                f"f36 staging: append shifted {len(moved)} row id(s), "
                f"e.g. {moved[:3]}"
            )
        _F36_STAGED[key] = tmp
    return (
        read_with_rowids(spark, _F36_STAGED[key].name)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_row_id").alias("min_rid"),
            F.max("_row_id").alias("max_rid"),
            F.sum("_row_id").alias("sum_rid"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q97 — WEIGHTED MEDIAN / quartiles (round-10 wave 4): the robust
# aggregation (each quantity value weighted by its revenue mass) that
# percentile_cont cannot express and engines disagree on when done in
# floats. Integer-exact by construction: weights are BIGINT cents,
# the selection rule is the cross-multiplied k*cumw >= q*total
# predicate (no division anywhere), lower-quantile convention
# (smallest x whose scaled cumulative weight reaches the bar).
#
# Scale: the raw table compresses FIRST through a (group, value)
# partial aggregate — the window then runs over the compressed value
# domain (|distinct values| rows per group, here ~50), never the raw
# rows. That ordering is what makes a weighted quantile tractable on
# 100 TB: the exchange carries the compressed domain only.
# --------------------------------------------------------------------------
Q97_ORACLE = """
    WITH t AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS w
      FROM lineitem),
    s AS (SELECT g, x, sum(w) AS w FROM t GROUP BY g, x),
    c AS (
      SELECT g, x, w,
             sum(w) OVER (PARTITION BY g ORDER BY x) AS cw,
             sum(w) OVER (PARTITION BY g) AS tw
      FROM s)
    SELECT g AS l_returnflag,
           CAST(min(CASE WHEN 4 * cw >= tw THEN x END) AS BIGINT)
             AS wq25,
           CAST(min(CASE WHEN 2 * cw >= tw THEN x END) AS BIGINT)
             AS wmedian,
           CAST(min(CASE WHEN 4 * cw >= 3 * tw THEN x END) AS BIGINT)
             AS wq75,
           CAST(max(tw) AS BIGINT) AS total_weight_cents
    FROM c GROUP BY g ORDER BY l_returnflag
"""


@query("q97_weighted_median", oracle=Q97_ORACLE)
def q97_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q97: revenue-weighted quantity quartiles per return flag — a
    float-division quantile rule, an upper-median convention, or a
    window over raw rows instead of the compressed domain flips the
    hash (the last one only at scale; the first two here)."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("w"),
    )
    s = t.groupBy("g", "x").agg(F.sum("w").alias("w"))
    cw = (
        Window.partitionBy("g")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    c = s.withColumn("cw", F.sum("w").over(cw)).withColumn(
        "tw", F.sum("w").over(Window.partitionBy("g"))
    )
    return (
        c.groupBy("g")
        .agg(
            F.min(
                F.when(4 * F.col("cw") >= F.col("tw"), F.col("x"))
            ).alias("wq25"),
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("x"))
            ).alias("wmedian"),
            F.min(
                F.when(4 * F.col("cw") >= 3 * F.col("tw"), F.col("x"))
            ).alias("wq75"),
            F.max("tw").alias("total_weight_cents"),
        )
        .select(
            F.col("g").alias("l_returnflag"),
            "wq25",
            "wmedian",
            "wq75",
            "total_weight_cents",
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q98 — MAXIMUM DRAWDOWN (round-11 bank, library-first; the @query
# registration is one decorator away). The risk/monitoring staple:
# per-user running balance (+cents for purchase/signup, -cents for
# view/click/error), running peak, and the deepest peak-to-current
# drop. BIGINT cents end to end; ties in the event order break on
# event_id, so the running series is a total function of the data.
#
# Scale: ONE exchange on user_id serves the cumulative sum, the
# running max, and the drawdown (three RANGE frames over one sort),
# then a per-user presentation row — no self-join, no driver loop.
# --------------------------------------------------------------------------
Q98_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS amt
      FROM events),
    cb AS (
      SELECT user_id, us, event_id,
             sum(amt) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS bal
      FROM e),
    c AS (
      SELECT user_id, bal,
             max(bal) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS peak
      FROM cb),
    d AS (
      SELECT user_id, bal, peak, peak - bal AS dd FROM c)
    SELECT user_id,
           CAST(max(peak) AS BIGINT) AS peak_cents,
           CAST(max(dd) AS BIGINT) AS max_drawdown_cents,
           CAST(sum(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_at_peak
    FROM d GROUP BY user_id ORDER BY user_id
"""


@query("q98_max_drawdown", oracle=Q98_ORACLE)
def q98_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q98 (banked): per-user peak balance, deepest drawdown, and the
    at-peak event count — a frame slip between the cumulative sum and
    the running max, a tie-order difference, or float money flips the
    exact integer hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.when(
            F.col("event_type").isin("purchase", "signup"),
            F.round(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(-F.round(F.col("value") * 100).cast("bigint"))
        .alias("amt"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    c = e.withColumn("bal", F.sum("amt").over(w)).withColumn(
        "peak", F.max(F.col("bal")).over(w)
    )
    d = c.withColumn("dd", F.col("peak") - F.col("bal"))
    return (
        d.groupBy("user_id")
        .agg(
            F.max("peak").alias("peak_cents"),
            F.max("dd").alias("max_drawdown_cents"),
            F.sum(F.when(F.col("dd") == 0, 1).otherwise(0)).alias(
                "n_at_peak"
            ),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q99 — INTERVAL UNION coverage (round-11 bank, library-first). The
# complement of q93's peak: per day, the total wall-clock time with
# AT LEAST ONE session active (union of overlapping intervals) and
# the number of maximal busy spans. Boundaries at the same instant
# are pre-aggregated (one net delta per (day, us)), so no tie rule is
# ever needed; segment lengths are exact integer microseconds.
#
# Scale: the q93 day-partitioned sweep plus one lead() over the
# collapsed boundary set — per-day work bounded by that day's
# distinct boundary instants.
# --------------------------------------------------------------------------
Q99_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us FROM events),
    m AS (
      SELECT user_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {Q84_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid,
             us
      FROM m),
    ses AS (
      SELECT user_id, sid, min(us) AS s_us, max(us) + 1 AS e_us
      FROM s GROUP BY user_id, sid),
    d AS (
      SELECT s_us, e_us,
             unnest(generate_series(s_us // {Q93_DAY_US},
                                    (e_us - 1) // {Q93_DAY_US})) AS day
      FROM ses),
    clip AS (
      SELECT day,
             greatest(s_us, day * {Q93_DAY_US}) AS cs,
             least(e_us, (day + 1) * {Q93_DAY_US}) AS ce
      FROM d),
    b AS (
      SELECT day, us, sum(delta) AS delta FROM (
        SELECT day, cs AS us, 1 AS delta FROM clip
        UNION ALL
        SELECT day, ce AS us, -1 AS delta FROM clip)
      GROUP BY day, us),
    r AS (
      SELECT day, us, delta,
             sum(delta) OVER (PARTITION BY day ORDER BY us) AS run,
             lead(us) OVER (PARTITION BY day ORDER BY us) AS nxt
      FROM b),
    seg AS (
      SELECT day,
             CASE WHEN run > 0 AND nxt IS NOT NULL
                  THEN nxt - us ELSE 0 END AS cov,
             CASE WHEN run > 0
                   AND coalesce(lag(run) OVER (PARTITION BY day
                                               ORDER BY us), 0) = 0
                  THEN 1 ELSE 0 END AS starts
      FROM r)
    SELECT CAST(day AS BIGINT) AS day_idx,
           CAST(sum(cov) AS BIGINT) AS covered_us,
           CAST(sum(starts) AS BIGINT) AS n_busy_spans
    FROM seg GROUP BY day ORDER BY day_idx
"""


@query("q99_interval_union", oracle=Q99_ORACLE)
def q99_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q99 (banked): per-day union-covered microseconds and maximal
    busy-span count — a lost same-instant boundary collapse, an
    open/closed segment slip, or a span-start rule difference flips
    the exact integer hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    day = Q93_DAY_US
    w = Window.partitionBy("user_id").orderBy("us")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    ses = (
        e.withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > Q84_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(cum))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_us"), (F.max("us") + 1).alias("e_us"))
    )
    clip = ses.withColumn(
        "day",
        F.explode(
            F.sequence(
                (F.col("s_us") / day).cast("bigint"),
                ((F.col("e_us") - 1) / day).cast("bigint"),
            )
        ),
    ).select(
        "day",
        F.greatest(F.col("s_us"), F.col("day") * day).alias("cs"),
        F.least(F.col("e_us"), (F.col("day") + 1) * day).alias("ce"),
    )
    b = (
        clip.select("day", F.col("cs").alias("us"), F.lit(1).alias("delta"))
        .unionAll(
            clip.select(
                "day", F.col("ce").alias("us"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("day", "us")
        .agg(F.sum("delta").alias("delta"))
    )
    sweep = Window.partitionBy("day").orderBy("us")
    r = (
        b.withColumn(
            "run",
            F.sum("delta").over(
                sweep.rangeBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("nxt", F.lead("us").over(sweep))
        .withColumn("prev_run", F.lag("run").over(sweep))
    )
    seg = r.select(
        "day",
        F.when(
            (F.col("run") > 0) & F.col("nxt").isNotNull(),
            F.col("nxt") - F.col("us"),
        )
        .otherwise(0)
        .alias("cov"),
        F.when(
            (F.col("run") > 0)
            & (F.coalesce(F.col("prev_run"), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("starts"),
    )
    return (
        seg.groupBy("day")
        .agg(
            F.sum("cov").alias("covered_us"),
            F.sum("starts").alias("n_busy_spans"),
        )
        .select(
            F.col("day").alias("day_idx"), "covered_us", "n_busy_spans"
        )
        .orderBy("day_idx")
    )


# --------------------------------------------------------------------------
# F37 — ATOMIC MULTI-TABLE TRANSACTION (round-11 bank, library-first).
# commit_multi gives several versioned tables all-or-nothing
# visibility through one coordinator CAS file (the Iceberg/Nessie
# catalog-commit shape — beyond Delta's per-table log). The staged
# lifecycle: seed two tables atomically, inject a CRASHED second
# transaction (manifests linked, never finalized — must stay
# invisible on BOTH tables and block writers loudly), abort it, then
# land the second half atomically. The union-read equals the plain
# corpus aggregate only if atomicity held at every step.
# Mechanism + crash/CAS invariants: sources/versioned.py::commit_multi,
# tests/test_multi_txn.py.
# --------------------------------------------------------------------------
_F37_STAGED: dict[tuple, object] = {}

F37_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents GROUP BY lang ORDER BY lang
"""


@query("f37_multi_table_txn_read", oracle=F37_ORACLE)
def f37_multi_table_txn_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F37 (banked): per-lang stats over the UNION of two tables fed
    exclusively by multi-table transactions, one of which crashed
    mid-commit and was recovered — a visibility leak (half a txn
    showing), a lost abort, or a blocked-slot mishandling flips the
    hash or raises in staging."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        abort_txn,
        commit_multi,
        latest_version,
        read_manifest,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F37_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_mtxn_")
        a = _os.path.join(tmp.name, "even")
        b = _os.path.join(tmp.name, "odd")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        even, odd = d.filter(F.col("doc_id") % 2 == 0), d.filter(
            F.col("doc_id") % 2 == 1
        )
        half = F.col("doc_id") % 4 < 2
        commit_multi({a: even.filter(half), b: odd.filter(half)})
        # crash injection: linked but never finalized -> invisible
        commit_multi(
            {a: even.filter(~half), b: odd.filter(~half)},
            _crash_before_finalize=True,
        )
        if latest_version(a) != 1 or latest_version(b) != 1:
            raise AssertionError(
                "f37 staging: a crashed multi-table txn became visible"
            )
        txn = read_manifest(a, 2)["txn"]
        if not abort_txn(txn["coordinator"], txn["id"]):
            raise AssertionError("f37 staging: abort lost to a crash")
        commit_multi({a: even.filter(~half), b: odd.filter(~half)})
        n = (
            read_version(spark, a).count()
            + read_version(spark, b).count()
        )
        if n != d.count():
            raise AssertionError(
                f"f37 staging: union carries {n} rows, corpus has "
                f"{d.count()}"
            )
        _F37_STAGED[key] = tmp
    base = _F37_STAGED[key].name
    u = read_version(spark, _os.path.join(base, "even")).unionByName(
        read_version(spark, _os.path.join(base, "odd"))
    )
    return (
        u.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q100 — RECONCILIATION AUDIT (round-11 bank, library-first). The
# referential/financial data-quality staple: per priority, how many
# orders have NO lines at all, and how far each lined order's header
# total drifts from its computed line total — bucketed by RELATIVE
# drift through cross-multiplied BIGINT-cents predicates (100·|diff|
# <= total is "within 1%": no engine divides before classifying, the
# q89/q94 discipline), with the absolute drift mass summed exactly.
#
# Scale: one partial-agg rollup of lineitem to order grain, one
# key-equi FULL join with orders, one aggregate — the audit costs a
# single co-partitioned pass at any size (bucketed layouts serve the
# join shuffle-free via f12's lever).
# --------------------------------------------------------------------------
Q100_ORACLE = """
    WITH l AS (
      SELECT l_orderkey,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT o.o_orderpriority,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS head_cents,
             l.line_cents
      FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey),
    c AS (
      SELECT o_orderpriority,
             line_cents IS NULL AS lineless,
             abs(coalesce(line_cents, 0) - head_cents) AS diff,
             head_cents
      FROM j)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN lineless THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lineless,
           CAST(sum(CASE WHEN NOT lineless AND 100 * diff <= head_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
           CAST(sum(CASE WHEN NOT lineless AND 100 * diff > head_cents
                          AND 10 * diff <= head_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct,
           CAST(sum(CASE WHEN NOT lineless AND 10 * diff > head_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond,
           CAST(sum(CASE WHEN lineless THEN 0 ELSE diff END) AS BIGINT)
             AS drift_cents
    FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("q100_reconciliation", oracle=Q100_ORACLE)
def q100_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q100 (banked): per-priority header-vs-lines reconciliation — a
    lost line-less order (join type slip), a pre-division bucket
    classification, or float money flips the exact integer hash."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l_sum = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 100
        )
        .cast("bigint")
        .alias("line_cents")
    )
    j = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("head_cents"),
    ).join(l_sum, o["o_orderkey"] == l_sum["l_orderkey"], "left")
    c = j.select(
        "o_orderpriority",
        F.col("line_cents").isNull().alias("lineless"),
        F.abs(
            F.coalesce(F.col("line_cents"), F.lit(0))
            - F.col("head_cents")
        ).alias("diff"),
        "head_cents",
    )
    nl = ~F.col("lineless")
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("lineless"), 1).otherwise(0)).alias(
                "n_lineless"
            ),
            F.sum(
                F.when(
                    nl & (100 * F.col("diff") <= F.col("head_cents")), 1
                ).otherwise(0)
            ).alias("n_within_1pct"),
            F.sum(
                F.when(
                    nl
                    & (100 * F.col("diff") > F.col("head_cents"))
                    & (10 * F.col("diff") <= F.col("head_cents")),
                    1,
                ).otherwise(0)
            ).alias("n_within_10pct"),
            F.sum(
                F.when(
                    nl & (10 * F.col("diff") > F.col("head_cents")), 1
                ).otherwise(0)
            ).alias("n_beyond"),
            F.sum(
                F.when(F.col("lineless"), 0).otherwise(F.col("diff"))
            ).alias("drift_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q101 — BITEMPORAL AS-OF (round-12 surface, library-first; the @query
# registration is one decorator away). Two time axes: VALID time (when
# a fact became true) and TRANSACTION time (when the system recorded
# it — here a deterministic per-event recording lag). A bitemporal
# probe (V, T) answers "what did we BELIEVE at T the state was at V" —
# the audit/backtest primitive one-axis AS OF (f29) and the as-of join
# (operators/asof.py) cannot express: a late-arriving correction is
# visible to a probe with a later T but the same V.
#
# The two probes share V (mid-fixture) and differ only in T; rows
# recorded in the gap flip belief — so a query that conflates the axes
# collapses the probes to identical rows and flips the hash.
#
# Scale shape: both time predicates push into the scan; the per-user
# argmax is one window over (user_id), computed per probe and unioned
# — two passes over a pruned scan, no self-join, no driver state.
# --------------------------------------------------------------------------
Q101_V_US = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC, mid-fixture
Q101_T1_US = Q101_V_US             # probe 1: belief as recorded AT V
Q101_T2_US = 1_706_486_400_000_000  # probe 2: 2024-01-29, after corrections
Q101_LAG_US = 3_600_000_000        # recording lag unit: 1 hour

Q101_ORACLE = f"""
    WITH u AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS valid_us,
             epoch_us(ts) + (event_id % 7) * {Q101_LAG_US} AS tx_us
      FROM events),
    probes AS (
      SELECT 1 AS probe_id, {Q101_V_US} AS v, {Q101_T1_US} AS t
      UNION ALL
      SELECT 2, {Q101_V_US}, {Q101_T2_US}),
    vis AS (
      SELECT p.probe_id, u.user_id, u.value,
             row_number() OVER (
               PARTITION BY p.probe_id, u.user_id
               ORDER BY u.valid_us DESC, u.tx_us DESC, u.event_id DESC
             ) AS rn
      FROM probes p JOIN u
        ON u.valid_us <= p.v AND u.tx_us <= p.t)
    SELECT probe_id, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(value), 4) AS believed_total,
           round(avg(value), 4) AS believed_mean
    FROM vis WHERE rn = 1
    GROUP BY probe_id ORDER BY probe_id
"""


@query("q101_bitemporal_asof", oracle=Q101_ORACLE)
def q101_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q101 (registered r12): per-user bitemporal as-of state under two probes
    differing only in transaction time — conflating the axes, a wrong
    argmax tie-break, or a boundary flip (<= vs <) flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("valid_us"),
    )
    u = e.withColumn(
        "tx_us",
        F.col("valid_us") + (F.col("event_id") % 7) * F.lit(Q101_LAG_US),
    )
    from pyspark.sql.window import Window

    probes = [(1, Q101_V_US, Q101_T1_US), (2, Q101_V_US, Q101_T2_US)]
    outs = []
    w = Window.partitionBy("user_id").orderBy(
        F.col("valid_us").desc(), F.col("tx_us").desc(),
        F.col("event_id").desc()
    )
    for pid, v, t in probes:
        vis = (
            u.filter((F.col("valid_us") <= v) & (F.col("tx_us") <= t))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        outs.append(
            vis.agg(
                F.count(F.lit(1)).alias("n_users"),
                r4(F.sum("value")).alias("believed_total"),
                r4(F.avg("value")).alias("believed_mean"),
            ).select(F.lit(pid).cast("int").alias("probe_id"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # The oracle's GROUP BY probe_id omits a probe with zero visible
    # rows, while the ungrouped agg above always emits one row; drop
    # empty probes so both sides agree at every fixture scale
    # (ADVICE r11).
    return out.filter(F.col("n_users") > 0).orderBy("probe_id")


# --------------------------------------------------------------------------
# Q102 — ROBUST outlier profile via MAD (round-12 surface,
# library-first). Mean/stddev z-scores (q83's family) are themselves
# dragged by the outliers they hunt; median absolute deviation is the
# standard robust scale. Exact per-group medians via the q29
# percentile discipline (Spark `percentile` == DuckDB quantile_cont,
# h = p(n-1) linear interpolation), two passes: median, then MAD and
# the outlier census against 3*MAD.
#
# Scale shape: two grouped exact-percentile passes (group-buffered,
# q29's documented bound) + one broadcast join of the 5-row median
# frame; the unbounded-group path is t5's GK sketch.
# --------------------------------------------------------------------------
Q102_ORACLE = """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.50) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.50) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(any_value(d.med), 6) AS med,
           round(any_value(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(max(d.adev), 6) AS max_adev
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type ORDER BY d.event_type
"""


@query("q102_mad_outliers", oracle=Q102_ORACLE)
def q102_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q102 (registered r12): per-type MAD and 3*MAD outlier census — an
    interpolation slip in either percentile pass, a deviation computed
    against the wrong group's median, or a boundary flip at 3*MAD
    flips the hash."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.50)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.50)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("bigint")
            ).alias("n_outliers"),
            F.round(F.max("adev"), 6).alias("max_adev"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q103 — approx_count_distinct CALIBRATION census (round-12 surface,
# library-first; the @query registration is one decorator away). The
# sketch the engine actually ships for cardinality at 100 TB is
# HyperLogLog++ (`approx_count_distinct` — mergeable, O(1) state,
# shuffle-light); this entry pins its accuracy CONTRACT relationally:
# per event_type, the exact distinct user count, the HLL estimate's
# relative error checked against 4x the configured rsd (0.02), and the
# rsd-bound boolean the oracle asserts LITERALLY true. Spark's HLL++
# is deterministic for fixed data + rsd (hash-based, order-free), so
# the boolean is stable; if an engine upgrade degraded the sketch, the
# hash flips — t5's GK discipline applied to cardinality.
#
# Scale shape: one partial+final agg per group; the sketch buffer is
# the only state — this is the census you run INSTEAD of exact
# distinct at corpus scale, here calibrated against the exact answer
# while the fixture still permits one.
# --------------------------------------------------------------------------
Q103_RSD = 0.02

Q103_ORACLE = """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS within_bound,
           CAST(NULL AS DOUBLE) AS rel_err_if_out
    FROM events GROUP BY event_type ORDER BY event_type
"""


@query("q103_hll_calibration", oracle=Q103_ORACLE)
def q103_hll_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q103 (registered r12): exact-vs-HLL cardinality per event type — the
    oracle hard-codes ``within_bound = true``, so an estimator drifting
    past 4x its configured rsd flips the hash. ``rel_err_if_out`` is
    NULL whenever the bound holds (so green runs hash-match) and
    carries the rounded relative error on a violation, making a future
    failure diagnosable from the driver's row diff (ADVICE r11)."""
    ev = load_table(spark, sf_dir, "events")
    within = F.abs(F.col("est") - F.col("exact_distinct")) <= F.lit(
        4 * Q103_RSD
    ) * F.col("exact_distinct")
    rel_err = F.abs(F.col("est") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_distinct"),
            F.expr(
                f"approx_count_distinct(user_id, {Q103_RSD})"
            ).alias("est"),
        )
        .select(
            "event_type",
            "exact_distinct",
            within.alias("within_bound"),
            F.when(~within, F.round(rel_err, 6))
            .otherwise(F.lit(None).cast("double"))
            .alias("rel_err_if_out"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# F39 — DESCRIBE DETAIL (round-12 surface, library-first; the @query
# registration is one decorator away). The one-row operational summary
# of a table head (Delta's verb): file/row accounting with LIVE rows
# net of deletion vectors, surviving versions, and the metadata
# surfaces in force. The staged lifecycle (append, append, rename,
# DV delete) makes every field load-bearing; byte totals exist in the
# verb but are excluded from the oracled projection (compressed sizes
# are not SQL-derivable).
#
# Scale: O(#files + #sidecars + #versions) driver metadata reads, no
# data scan — the same cost class as DESCRIBE HISTORY (f31).
# --------------------------------------------------------------------------
_F39_STAGED: dict = {}

F39_ORACLE = """
    WITH pop AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 3 IN (0, 1)),
    dead AS (
      SELECT count(*) AS n FROM pop
      WHERE lang = 'en' AND doc_id % 3 = 0 AND doc_id % 2 = 0)
    SELECT CAST(4 AS BIGINT) AS version,
           CAST(2 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows_physical,
           CAST(count(*) - (SELECT n FROM dead) AS BIGINT) AS n_rows_live,
           CAST(4 AS BIGINT) AS n_versions_live,
           CAST(1 AS BIGINT) AS n_dv_sidecars,
           CAST(1 AS BIGINT) AS n_mapped_columns,
           CAST(0 AS BIGINT) AS n_constraints,
           CAST(0 AS BIGINT) AS n_external_files
    FROM pop
"""


@query("f39_table_detail", oracle=F39_ORACLE)
def f39_table_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F39 (registered r12): DESCRIBE DETAIL of a four-verb lifecycle — a
    physical-vs-live row conflation, a stale-DV count, a lost mapping
    entry, or a version-survival slip flips the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where_dv,
        rename_column,
        table_detail,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F39_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_detail_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        root = tmp.name
        commit_append(d.filter(F.col("doc_id") % 3 == 0).coalesce(1), root)
        commit_append(d.filter(F.col("doc_id") % 3 == 1).coalesce(1), root)
        rename_column(root, "n_chars", "chars")
        # the predicate confines matches to v1's single file, so
        # exactly ONE sidecar part survives _drop_empty_files and the
        # literal n_dv_sidecars stays stable at every fixture scale
        delete_where_dv(
            spark,
            root,
            "lang = 'en' AND doc_id % 3 = 0 AND doc_id % 2 = 0",
        )
        _F39_STAGED[key] = tmp
    return table_detail(spark, _F39_STAGED[key].name).drop("n_bytes")


# --------------------------------------------------------------------------
# F41 — GENERATED COLUMNS (round-13 surface, library-first; the @query
# registration is one decorator away). Delta's GENERATED ALWAYS AS:
# `chars_bucket` is declared once as an expression of `n_chars`; the
# declaration backfills existing rows in one COW rewrite, and every
# later append either omits the column (the engine computes it) or
# must supply row-for-row matching values (mismatch = loud
# GeneratedColumnError, pinned in tests/test_generated_columns.py).
# Because the column is PHYSICAL in every file it carries min/max
# stats and participates in file skipping — Delta's
# partition-pruning-via-generated-column lever.
#
# Scale: declaration is one distributed rewrite (OPTIMIZE's cost
# class); each later append adds one projected expression to its own
# write; reads pay nothing.
# --------------------------------------------------------------------------
_F41_STAGED: dict = {}
F41_BUCKET = 500

F41_ORACLE = f"""
    SELECT CAST(n_chars // {F41_BUCKET} AS BIGINT) AS chars_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY 1 ORDER BY chars_bucket
"""


@query("f41_generated_column", oracle=F41_ORACLE)
def f41_generated_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F41 (banked): per-bucket census over a GENERATED column — half
    the rows were backfilled by the declaration rewrite, half computed
    at append time from a frame that never carried the column; a
    divergence between the two paths, a lost backfill row, or a stale
    expression flips the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        add_generated_column,
        commit_append,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F41_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_gen_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        root = tmp.name
        commit_append(d.filter(F.col("doc_id") % 2 == 0).coalesce(1), root)
        add_generated_column(
            spark, root, "chars_bucket",
            f"CAST(n_chars DIV {F41_BUCKET} AS BIGINT)",
        )
        # append WITHOUT the column: the engine must compute it
        commit_append(d.filter(F.col("doc_id") % 2 == 1).coalesce(1), root)
        _F41_STAGED[key] = tmp
    t = read_version(spark, _F41_STAGED[key].name)
    return (
        t.groupBy("chars_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("chars_bucket")
    )


# --------------------------------------------------------------------------
# Q104 — EXPONENTIALLY-DECAYED engagement score (round-13 surface,
# library-first). The feature every ranking/abuse pipeline derives:
# per user, a recency-weighted activity score where each older event
# counts 3/4 of the next newer one, over the user's last Q104_W
# events. Computed INTEGER-EXACT: money in cents, decay as the exact
# rational (3/4)^age scaled by 4^(W-1) — D = Σ cents_age · 3^age ·
# 4^(W-1-age) — so the hash cannot drift on libm pow() ulps between
# engines (3^7·4^7·max_cents ≈ 3.6e12, comfortably inside both
# engines' exact-integer double range and int64).
#
# Scale shape: ONE exchange on user_id serves the ordering window and
# the 8-row tail (rank filter), then a per-user sum — no self-join.
# --------------------------------------------------------------------------
Q104_W = 8
Q104_ALPHA_NUM, Q104_ALPHA_DEN = 3, 4

Q104_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT user_id, cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY us DESC, event_id DESC) - 1
               AS age
      FROM e),
    t AS (SELECT * FROM r WHERE age < {Q104_W})
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_recent,
           CAST(sum(cents
                    * CAST(pow({Q104_ALPHA_NUM}, age) AS BIGINT)
                    * CAST(pow({Q104_ALPHA_DEN}, {Q104_W - 1} - age)
                           AS BIGINT)) AS BIGINT) AS decayed_score
    FROM t GROUP BY user_id ORDER BY user_id
"""


@query("q104_decayed_engagement", oracle=Q104_ORACLE)
def q104_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q104 (banked): per-user decayed engagement over the last 8
    events — an age off-by-one, a tie-order flip in the recency rank,
    or a float decay (instead of the exact rational) flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    t = e.withColumn("age", F.row_number().over(w) - 1).filter(
        F.col("age") < Q104_W
    )
    weight = F.pow(F.lit(Q104_ALPHA_NUM), F.col("age")).cast(
        "bigint"
    ) * F.pow(
        F.lit(Q104_ALPHA_DEN), F.lit(Q104_W - 1) - F.col("age")
    ).cast("bigint")
    return (
        t.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            F.sum(F.col("cents") * weight).alias("decayed_score"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q105 — BITEMPORAL BELIEF DRIFT (round-13 surface, library-first).
# q101 answers "what did we believe at T"; the audit question that
# follows is "what CHANGED between T1 and T2 about the same valid
# moment V" — late-arriving corrections surfacing per user. Per user:
# the believed state at (V, T1) full-outer-joined with (V, T2),
# classified appeared / changed / unchanged (a user visible at T1
# stays visible at T2 — tx_us <= T1 <= T2 — so 'disappeared' is
# impossible by construction and its absence is itself pinned), then
# aggregated per change kind with the value drift.
#
# Scale shape: two pruned scans + per-user argmax windows (q101's
# cost), one full outer join on user_id — no pair space.
# --------------------------------------------------------------------------
Q105_ORACLE = f"""
    WITH u AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS valid_us,
             epoch_us(ts) + (event_id % 7) * {Q101_LAG_US} AS tx_us
      FROM events),
    b1 AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY valid_us DESC, tx_us DESC, event_id DESC) AS rn
        FROM u WHERE valid_us <= {Q101_V_US} AND tx_us <= {Q101_T1_US})
      WHERE rn = 1),
    b2 AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY valid_us DESC, tx_us DESC, event_id DESC) AS rn
        FROM u WHERE valid_us <= {Q101_V_US} AND tx_us <= {Q101_T2_US})
      WHERE rn = 1),
    j AS (
      SELECT coalesce(b1.user_id, b2.user_id) AS user_id,
             b1.value AS v1, b2.value AS v2,
             CASE WHEN b1.user_id IS NULL THEN 'appeared'
                  WHEN b1.value <> b2.value THEN 'changed'
                  ELSE 'unchanged' END AS kind
      FROM b1 FULL OUTER JOIN b2 ON b1.user_id = b2.user_id)
    SELECT kind, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(coalesce(v2, 0) - coalesce(v1, 0)), 4) AS total_drift
    FROM j GROUP BY kind ORDER BY kind
"""


@query("q105_belief_drift", oracle=Q105_ORACLE)
def q105_belief_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q105 (banked): per-kind census of belief changes between two
    transaction times for one valid moment — a corrected row escaping
    the T1 snapshot, a drift signed backwards, or a phantom
    'disappeared' class flips the hash."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("valid_us"),
    )
    u = e.withColumn(
        "tx_us",
        F.col("valid_us") + (F.col("event_id") % 7) * F.lit(Q101_LAG_US),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("valid_us").desc(), F.col("tx_us").desc(),
        F.col("event_id").desc()
    )

    def believed(t_us: int) -> DataFrame:
        return (
            u.filter(
                (F.col("valid_us") <= Q101_V_US) & (F.col("tx_us") <= t_us)
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "value")
        )

    b1 = believed(Q101_T1_US).withColumnRenamed("value", "v1")
    b2 = believed(Q101_T2_US).withColumnRenamed("value", "v2")
    j = b1.join(b2, "user_id", "full_outer").select(
        F.when(F.col("v1").isNull(), "appeared")
        .when(F.col("v1") != F.col("v2"), "changed")
        .otherwise("unchanged")
        .alias("kind"),
        F.coalesce(F.col("v2"), F.lit(0.0)).alias("v2c"),
        F.coalesce(F.col("v1"), F.lit(0.0)).alias("v1c"),
    )
    return (
        j.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            r4(F.sum(F.col("v2c") - F.col("v1c"))).alias("total_drift"),
        )
        .orderBy("kind")
    )


# --------------------------------------------------------------------------
# F42 — CONDITIONAL MERGE (round-13 surface, library-first; the @query
# registration is one decorator away). Delta's full MERGE shape on the
# versioned store: WHEN MATCHED AND <pred> THEN DELETE, WHEN MATCHED
# AND <pred> THEN UPDATE, WHEN NOT MATCHED AND <pred> THEN INSERT —
# the account-lifecycle upsert every CDC/state pipeline ships (close
# dormant accounts, take the larger balance, admit only substantial
# new ones). f26 pins the unconditional upsert; this pins the clause
# ORDER (delete before update), the src_<col> predicate namespace,
# and NULL-predicate-is-false semantics against a relational oracle.
#
# Scale: identical to f26 — file-granular COW keyed on the merge key;
# the clauses are per-row expressions inside the same single rewrite.
# --------------------------------------------------------------------------
_F42_STAGED: dict = {}
F42_MID = "2024-01-15 00:00:00"
F42_DEL_BELOW = 150_000     # ~lower quartile of matched late totals:
# the delete clause closes ~25% of matched accounts at every fixture
# scale (non-vacuous by construction, census pinned in the bank test)
F42_INSERT_FLOOR = 170_000  # ~median of unmatched late totals: the
# insert predicate rejects roughly half the new accounts

F42_ORACLE = f"""
    WITH e AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    early AS (
      SELECT user_id,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n_events
      FROM e WHERE ts < TIMESTAMP '{F42_MID}' AND user_id % 2 = 0
      GROUP BY user_id),
    late AS (
      SELECT user_id,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n_events
      FROM e WHERE ts >= TIMESTAMP '{F42_MID}'
      GROUP BY user_id),
    kept_matched AS (
      SELECT t.user_id,
             CASE WHEN s.total_cents > t.total_cents
                  THEN s.total_cents ELSE t.total_cents END AS total_cents,
             CASE WHEN s.total_cents > t.total_cents
                  THEN s.n_events ELSE t.n_events END AS n_events
      FROM early t JOIN late s USING (user_id)
      WHERE NOT (s.total_cents < {F42_DEL_BELOW})),
    untouched AS (
      SELECT t.* FROM early t LEFT JOIN late s USING (user_id)
      WHERE s.user_id IS NULL),
    inserted AS (
      SELECT s.* FROM late s LEFT JOIN early t USING (user_id)
      WHERE t.user_id IS NULL AND s.total_cents >= {F42_INSERT_FLOOR})
    SELECT user_id, total_cents, n_events FROM kept_matched
    UNION ALL SELECT user_id, total_cents, n_events FROM untouched
    UNION ALL SELECT user_id, total_cents, n_events FROM inserted
    ORDER BY user_id
"""


@query("f42_conditional_merge", oracle=F42_ORACLE)
def f42_conditional_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F42 (banked): account-state table after a three-clause MERGE —
    a clause-order flip (update before delete), a src_/target
    namespace swap, a NULL predicate admitting a row, or an
    unconditional insert flips the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        merge_into,
        read_version,
    )

    key = staging_key(sf_dir, "events")
    if key not in _F42_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_cmerge_")
        e = load_table(spark, sf_dir, "events").select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        early = (
            e.filter(
                (F.col("ts") < F.lit(F42_MID).cast("timestamp"))
                & (F.col("user_id") % 2 == 0)
            )
            .groupBy("user_id")
            .agg(
                F.sum("cents").alias("total_cents"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )
        late = (
            e.filter(F.col("ts") >= F.lit(F42_MID).cast("timestamp"))
            .groupBy("user_id")
            .agg(
                F.sum("cents").alias("total_cents"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )
        root = tmp.name + "/state"
        commit_append(early.coalesce(1), root)
        merge_into(
            spark,
            root,
            late,
            "user_id",
            when_matched_delete=f"src_total_cents < {F42_DEL_BELOW}",
            when_matched_update="src_total_cents > total_cents",
            when_not_matched_insert=f"total_cents >= {F42_INSERT_FLOOR}",
        )
        _F42_STAGED[key] = tmp
    return read_version(spark, _F42_STAGED[key].name + "/state").orderBy(
        "user_id"
    )


# --------------------------------------------------------------------------
# F43 — ALTER TABLE DROP COLUMN (round-14 surface, library-first; the
# @query registration is one decorator away). Delta's column-mapping
# drop: one metadata-only commit, no file touched, time travel below
# the drop still shows the column, and the dropped name is RETIRED —
# a later append reusing it is refused (pre-drop files still store the
# physical column; a re-add would read ghost values out of history).
# --------------------------------------------------------------------------
_F43_STAGED: dict[tuple, object] = {}

F43_ORACLE = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(4 AS BIGINT) AS n_cols_now,
           CAST(5 AS BIGINT) AS n_cols_v1,
           CAST(count(*) AS BIGINT) AS n_docs_v1_with_text
    FROM documents GROUP BY source ORDER BY source
    """


def f43_drop_column_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F43 (banked): aggregate the post-drop snapshot (text gone,
    rows intact) joined with the pre-drop time-travel view (text
    still present and non-null) — a drop that loses rows, a schema
    that keeps the field, or a time-travel read that forgets it flips
    the hash."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        drop_column,
        read_version,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F43_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_dropcol_")
        d = load_table(spark, sf_dir, "documents")
        commit_append(d, tmp.name)
        drop_column(tmp.name, "text")
        _F43_STAGED[key] = tmp
    root = _F43_STAGED[key].name
    now = read_version(spark, root)  # v2: no text column
    v1 = read_version(spark, root, version=1)
    now_agg = now.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.lit(len(now.columns)).cast("bigint").alias("n_cols_now"),
        F.lit(len(v1.columns)).cast("bigint").alias("n_cols_v1"),
    )
    v1_agg = v1.filter(F.col("text").isNotNull()).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_v1_with_text")
    )
    return now_agg.join(F.broadcast(v1_agg), "source").orderBy("source")


# --------------------------------------------------------------------------
# F44 — time travel BY TIMESTAMP (round-14 surface, library-first; the
# @query registration is one decorator away). Delta's TIMESTAMP AS OF,
# resolved exactly as Delta resolves it: the commit files' own mtimes.
# A timestamp captured between two commits must pin the earlier one.
# --------------------------------------------------------------------------
_F44_STAGED: dict[tuple, object] = {}

F44_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE doc_id % 3 = 0
    GROUP BY lang ORDER BY lang
    """


def f44_timestamp_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F44 (banked): read AS OF a wall-clock instant captured between
    commit 1 and commit 2 — must equal the v1 snapshot exactly; a
    resolution that rounds up to v2, skips hidden versions wrongly, or
    misorders mtimes flips the hash."""
    import tempfile as _tf
    import time as _time

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_as_of_timestamp,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F44_STAGED:
        import os as _os

        from k_means_clustering_via_map_reduce_spark.sources.versioned import (  # noqa: E501
            _manifest_path,
        )

        tmp = _tf.TemporaryDirectory(prefix="kmce_tstravel_")
        d = load_table(spark, sf_dir, "documents")
        commit_append(d.filter(F.col("doc_id") % 3 == 0), tmp.name)
        commit_append(d.filter(F.col("doc_id") % 3 != 0), tmp.name)
        # Capture "between" from the commits' OWN mtimes, not a
        # wall-clock read racing them: on a coarse-mtime filesystem
        # (1 s granularity) the two commits can share a truncated
        # mtime, so force v2 strictly later first, then take the
        # midpoint — deterministic on every filesystem.
        p1, p2 = _manifest_path(tmp.name, 1), _manifest_path(tmp.name, 2)
        m1 = _os.path.getmtime(p1)
        if _os.path.getmtime(p2) <= m1:
            _os.utime(p2, (m1 + 2, m1 + 2))
        between = (m1 + _os.path.getmtime(p2)) / 2
        _F44_STAGED[key] = (tmp, between)
    tmp, between = _F44_STAGED[key]
    snap = read_as_of_timestamp(spark, tmp.name, between)
    return (
        snap.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q106 — DISTINCT aggregates across a grouping-set lattice (round-14
# surface, library-first; the @query registration is one decorator
# away). q32's lattice carried only algebraic aggregates; COUNT(
# DISTINCT) across grouping sets is the non-algebraic case — Spark
# must route the Expand through a distinct-aware aggregate, the exact
# shape of a "unique users by type, by day, by both, and overall"
# reporting query.
# --------------------------------------------------------------------------
Q106_ORACLE = """
    SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           CAST(grouping(event_type) AS BIGINT) AS g_type,
           CAST(grouping(day) AS BIGINT)        AS g_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM (SELECT event_type, date_trunc('day', ts) AS day, user_id
          FROM events)
    GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
    ORDER BY g_type, g_day,
             event_type NULLS FIRST, day NULLS FIRST
    """


def q106_distinct_grouping_sets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q106 (banked): exact distinct-user counts over the full
    reporting lattice — a grouping flag swap, a distinct collapsed to
    a plain count, or a subtotal NULL confused with a data NULL flips
    the hash."""
    load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "date_trunc('day', ts) AS day", "user_id"
    ).createOrReplaceTempView("kmce_q106_events")
    return spark.sql(
        """
        SELECT event_type, day,
               CAST(grouping(event_type) AS BIGINT) AS g_type,
               CAST(grouping(day) AS BIGINT)        AS g_day,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM kmce_q106_events
        GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
        ORDER BY g_type, g_day,
                 event_type NULLS FIRST, day NULLS FIRST
        """
    )
