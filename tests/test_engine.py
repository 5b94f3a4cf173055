"""Engine facade: the reference's whole user workflow must work through
one object — points file in, centroids.txt out — plus SQL over the
registered tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.engine import Engine

# The reference's Input/points2.txt workload: 20 points in [0,100],
# K=4, M=2, R=2, 7 max iterations → golden centroids.txt (reproduced in
# FIXTURES.md §3 from dump_master.txt).
POINTS2 = [
    (84.37, 20.73), (16.8, 99.27), (10.39, 36.17), (35.51, 14.82),
    (5.2, 87.43), (86.82, 29.26), (16.81, 72.01), (61.42, 57.7),
    (94.37, 10.78), (43.25, 75.54), (94.06, 86.53), (78.09, 75.89),
    (38.39, 47.79), (36.43, 23.17), (97.48, 81.33), (27.42, 68.57),
    (63.79, 5.56), (22.66, 43.85), (89.52, 27.78), (85.99, 47.69),
]


def test_reference_workload_end_to_end(spark, tmp_path):
    pts_file = tmp_path / "points2.txt"
    pts_file.write_text("\n".join(f"{x},{y}" for x, y in POINTS2) + "\n")
    out_file = tmp_path / "centroids.txt"

    eng = Engine(spark)
    res = eng.run_reference_workload(
        str(pts_file),
        num_clusters=4,
        max_iterations=7,
        num_mappers=2,  # accepted for parity, ignored (scheduler's job)
        num_reducers=2,
        output_path=str(out_file),
    )
    assert len(res.centroids) == 4
    lines = out_file.read_text().splitlines()
    assert len(lines) == 4
    for line in lines:
        xs = line.split(",")
        assert len(xs) == 2
        for v in xs:
            assert "." in v and len(v.split(".")[1]) == 4  # %.4f format


def test_sql_over_registered_tables(spark, sf_dir):
    eng = Engine(spark)
    eng.register_tables(sf_dir)
    via_sql = eng.sql(
        "SELECT o_orderstatus, count(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ).collect()
    via_df = (
        eng.table(sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
        .collect()
    )
    assert via_sql == via_df


def test_fit_drops_empty_clusters_like_reference(spark):
    """Duplicated first-K points → some initial centroids win no points
    → K shrinks (reference behavior, SURVEY.md §7.4)."""
    rows = [(float(i % 2), float(i % 2), i) for i in range(10)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE, row_idx BIGINT")
    res = Engine(spark).fit(df, k=4, max_iter=5)
    assert len(res.centroids) == 2


def test_cli_parser_accepts_reference_parameters():
    from k_means_clustering_via_map_reduce_spark.__main__ import build_parser

    args = build_parser().parse_args(
        [
            "--points", "Input/points2.txt",
            "--k", "4",
            "--max-iter", "7",
            "--mappers", "2",
            "--reducers", "2",
            "--output", "centroids.txt",
        ]
    )
    assert (args.points, args.k, args.max_iter) == ("Input/points2.txt", 4, 7)
    assert args.tol == 1e-3


def test_observed_metrics_piggyback_on_one_pass(spark, sf_dir):
    """Observation metrics must report the same facts a separate
    aggregation would, collected during the SAME job."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.engine import observed
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    df, obs = observed(
        orders,
        "gate",
        {
            "rows": F.count(F.lit(1)),
            "neg_prices": F.sum(
                (F.col("o_totalprice") < 0).cast("long")
            ),
            "max_price": F.max("o_totalprice"),
        },
    )
    n = df.count()
    got = obs.get
    assert got["rows"] == n > 0
    assert got["neg_prices"] == 0
    assert got["max_price"] == orders.agg(
        F.max("o_totalprice")
    ).collect()[0][0]
