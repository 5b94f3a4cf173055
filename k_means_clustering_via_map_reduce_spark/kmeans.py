"""K-Means kernels.

K1 — ``lloyd_fit``: DataFrame Lloyd's with the reference's exact iteration
semantics (SURVEY.md §2.3 K1, §7.4):

- deterministic init: first K rows in input order (master.py:27-30),
- assignment: argmin over centroids, ties to the LOWEST index
  (mapper.py:28 ``list.index(min(...))``),
- update: per-cluster component-wise mean (reducer.py:116-132),
- convergence: max centroid move ≤ tol (0.001, master.py:32-41) — but
  matched BY CLUSTER ID, fixing the reference's positional compare over a
  racily-ordered file (§7.4),
- empty clusters are dropped and K shrinks permanently (the reference's
  observable behavior: a cluster with no points produces no reducer
  output, and master.py:258 adopts the shorter list),
- precision: float64 end-to-end (the reference's float32 is a gRPC wire
  artifact we do not replicate, §1.2); ``%.4f`` only at the sink
  (master.py:266).

Execution shape per iteration: one narrow projection (assignment — a
literal-centroid broadcast, no join, no shuffle) + one groupBy over at
most K groups (partial aggregation map-side, so the shuffle moves only
K·dim·partitions values, not the data). The input is cached once. This is
the whole reference architecture — M mappers, R reducers, M·R shuffle
files, gRPC barriers (master.py:215-258) — reduced to K rows of driver
state per iteration, and it scales to any row count Spark can scan.

K2 — ``mllib_fit``: the production path via ``pyspark.ml.clustering``
(n-dim, KMeans|| init, DataFrame-native) for when reference-parity init
is not required.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.functions.vector import nearest_centroid


@dataclass
class LloydResult:
    centroids: list[tuple[float, ...]]  # final centroids, cluster_id = index
    iterations: int
    converged: bool
    history: list[list[tuple[float, ...]]] = field(default_factory=list)

    def formatted(self) -> list[str]:
        """The reference's sink format: '%.4f,%.4f' per centroid
        (master.py:266)."""
        return [",".join(f"{v:.4f}" for v in c) for c in self.centroids]


def _features_col(feature_cols: tuple[str, ...]) -> F.Column:
    return F.array(*[F.col(c).cast("double") for c in feature_cols])


def _select_features(
    df: DataFrame,
    feature_cols: tuple[str, ...],
    array_col: str | None,
    order_col: str,
) -> DataFrame:
    feat = (
        F.col(array_col).cast("array<double>")
        if array_col is not None
        else _features_col(tuple(feature_cols))
    )
    return df.select(feat.alias("features"), F.col(order_col).alias("__ord"))


def lloyd_fit(
    df: DataFrame,
    k: int,
    feature_cols: tuple[str, ...] = ("x", "y"),
    order_col: str = "row_idx",
    max_iter: int = 20,
    tol: float = 1e-3,
    array_col: str | None = None,
) -> LloydResult:
    feats = _select_features(df, feature_cols, array_col, order_col).cache()
    try:
        first_k = feats.orderBy("__ord").limit(k).collect()
        centroids = [tuple(r["features"]) for r in first_k]

        iterations = 0
        converged = False
        history: list[list[tuple[float, ...]]] = []
        dim = len(centroids[0])
        for _ in range(max_iter):
            iterations += 1
            assigned = feats.withColumn(
                "cluster_id", nearest_centroid(F.col("features"), centroids)
            )
            means = (
                assigned.groupBy("cluster_id")
                .agg(
                    *[
                        F.avg(F.col("features")[i]).alias(f"m{i}")
                        for i in range(dim)
                    ]
                )
                .collect()
            )
            by_id = {
                r["cluster_id"]: tuple(r[f"m{i}"] for i in range(dim))
                for r in means
            }
            # Empty clusters drop out (no group emitted); K shrinks, ids
            # renumber by old-id order — reference semantics (§7.4).
            new_centroids = [by_id[i] for i in sorted(by_id)]
            history.append(new_centroids)
            if len(new_centroids) == len(centroids):
                max_move = max(
                    math.dist(old, new)
                    for old, new in zip(centroids, new_centroids)
                )
                centroids = new_centroids
                if max_move <= tol:
                    converged = True
                    break
            else:
                centroids = new_centroids
        return LloydResult(centroids, iterations, converged, history)
    finally:
        feats.unpersist()


def lloyd_fit_join(
    df: DataFrame,
    k: int,
    feature_cols: tuple[str, ...] = ("x", "y"),
    order_col: str = "row_idx",
    max_iter: int = 20,
    tol: float = 1e-3,
    array_col: str | None = None,
    init_centroids: list[list[float]] | None = None,
) -> LloydResult:
    """Lloyd's with the centroids shipped as a BROADCAST VARIABLE into an
    Arrow-batched numpy argmin — identical semantics to ``lloyd_fit``
    (same init, lowest-index tie-break via numpy argmin's first-match,
    empty-cluster drop, id-matched convergence), different physical
    shape for large K:

    - plan size is O(1) in K — the literal form embeds K·dim constants
      in the expression tree and recompiles codegen every iteration
      (fine for K=4 in 2-D, pathological for a 10k×512 codebook);
    - assignment stays NARROW (no shuffle): one matmul per Arrow batch
      against the broadcast center matrix — the same physical shape
      MLlib's own KMeans uses;
    - the only shuffle per iteration remains the K-group partial-mean
      aggregation.

    Use this form when K·dim is large; ``lloyd_fit`` when it is tiny.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    feats = _select_features(df, feature_cols, array_col, order_col).cache()
    spark = df.sparkSession
    sc = spark.sparkContext
    try:
        if init_centroids is not None:
            # Externally seeded fit (e.g. k14's K-Means|| + weighted
            # refine chain); everything downstream — assignment ties,
            # empty-cluster drop, id-matched convergence — is identical.
            centroids = [tuple(c) for c in init_centroids]
        else:
            first_k = feats.orderBy("__ord").limit(k).collect()
            centroids = [tuple(r["features"]) for r in first_k]
        dim = len(centroids[0])

        iterations = 0
        converged = False
        history: list[list[tuple[float, ...]]] = []

        # Build the K-group mean aggregate columns ONCE: each
        # F.avg(...)[i].alias(...) is several py4j round-trips, and dim
        # of them per iteration dominated the driver-side loop cost
        # (measured 1-4 s/iteration of pure DataFrame construction at
        # dim=64 vs ~0.05 s hoisted; the Column objects are immutable
        # and reusable across iterations).
        agg_cols = [
            F.avg(F.col("features")[i]).alias(f"m{i}") for i in range(dim)
        ]

        for _ in range(max_iter):
            iterations += 1
            bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))

            @pandas_udf("int")
            def nearest(vs: pd.Series) -> pd.Series:
                c = bc.value  # (k, dim)
                mat = np.vstack(vs.to_numpy())  # (n, dim)
                # One matmul for the expanded square, then fold the
                # per-row v·v back in and take sqrt BEFORE argmin so
                # the compared quantity is the same sqrt distance the
                # literal path (lloyd_fit / nearest_centroid SQL)
                # orders by — sub-ulp near-ties break identically in
                # both fit paths. argmin returns the FIRST minimum →
                # lowest cid on ties, the reference's
                # list.index(min(...)) semantics.
                d = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
                d += (mat * mat).sum(axis=1)[:, None]
                np.maximum(d, 0.0, out=d)  # FP cancellation guard
                return pd.Series(
                    np.argmin(np.sqrt(d), axis=1).astype(np.int32)
                )

            means = (
                feats.withColumn("cluster_id", nearest(F.col("features")))
                .groupBy("cluster_id")
                .agg(*agg_cols)
                .collect()
            )
            bc.unpersist()
            by_id = {
                r["cluster_id"]: tuple(r[f"m{i}"] for i in range(dim))
                for r in means
            }
            new_centroids = [by_id[i] for i in sorted(by_id)]
            history.append(new_centroids)
            if len(new_centroids) == len(centroids):
                max_move = max(
                    math.dist(old, new)
                    for old, new in zip(centroids, new_centroids)
                )
                centroids = new_centroids
                if max_move <= tol:
                    converged = True
                    break
            else:
                centroids = new_centroids
        return LloydResult(centroids, iterations, converged, history)
    finally:
        feats.unpersist()


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[float, ...]],
    feature_cols: tuple[str, ...] = ("x", "y"),
) -> DataFrame:
    """Label rows with their nearest-centroid id (the map stage,
    mapper.py:31-36, as a narrow projection)."""
    return df.withColumn(
        "cluster_id",
        nearest_centroid(_features_col(tuple(feature_cols)), centroids),
    )


def assign_clusters_broadcast(
    df: DataFrame,
    centroids: list[tuple[float, ...]],
    array_col: str,
) -> DataFrame:
    """``assign_clusters`` for large codebooks: the centroid matrix rides
    a broadcast variable into an Arrow-batched numpy argmin (same
    lowest-index tie semantics), keeping the plan O(1) in K·dim where
    the literal-expression form would embed K·dim constants."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )

    @pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        c = bc.value
        mat = np.vstack(vs.to_numpy())
        d = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.withColumn(
        "cluster_id", nearest(F.col(array_col).cast("array<double>"))
    )


def centroids_df(spark: SparkSession, result: LloydResult) -> DataFrame:
    """Centroids as a DataFrame sink, 4-decimal rounded like the
    reference's centroids.txt (master.py:264-266)."""
    dim = len(result.centroids[0])
    rows = [
        (i, *[round(v, 4) for v in c]) for i, c in enumerate(result.centroids)
    ]
    schema = "cluster_id INT, " + ", ".join(f"c{i} DOUBLE" for i in range(dim))
    return spark.createDataFrame(rows, schema=schema)


def mllib_fit(
    df: DataFrame,
    k: int,
    feature_cols: tuple[str, ...] | None = None,
    array_col: str | None = None,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
):
    """K2: MLlib KMeans (n-dim production path). Accepts either scalar
    ``feature_cols`` or an existing array column ``array_col``.

    Returns (model, predictions DataFrame with 'prediction' column).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if array_col is not None:
        vec = df.withColumn(
            "__features", array_to_vector(F.col(array_col).cast("array<double>"))
        )
    else:
        cols = tuple(feature_cols or ("x", "y"))
        vec = df.withColumn(
            "__features", array_to_vector(_features_col(cols))
        )
    model = (
        KMeans(k=k, maxIter=max_iter, tol=tol, seed=seed, featuresCol="__features")
        .fit(vec)
    )
    return model, model.transform(vec).withColumnRenamed("prediction", "cluster_id")


# --------------------------------------------------------------------------
# Query-surface registration (SURVEY.md §2.3 K1/K2).
#
# K1 gets a FULL SQL oracle: Lloyd's with a fixed iteration count unrolls
# into plain relational algebra (assign = argmin correlated subquery,
# update = group-avg), so DuckDB can replay the exact kernel. The engine
# runs with tol=0 — early stop only at an exact fixed point, where extra
# unrolled SQL iterations are no-ops, keeping both sides identical.
# --------------------------------------------------------------------------
from k_means_clustering_via_map_reduce_spark.queries import ORACLE_SQL, QUERIES, query  # noqa: E402

_K1_K = 4
_K1_ITERS = 5


def _lloyd_oracle_sql(k: int, iters: int) -> str:
    """Generate the unrolled DuckDB Lloyd's for the embeddings table's
    first two dimensions (1-based list indexing in DuckDB)."""
    ctes = [
        "pts AS MATERIALIZED (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,"
        " CAST(embedding[2] AS DOUBLE) AS y FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, x, y"
        f" FROM (SELECT vec_id, x, y FROM pts ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT p.vec_id, p.x, p.y,"
            f" (SELECT c.cid FROM {prev} c"
            f"  ORDER BY sqrt((p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y)) ASC,"
            f"  c.cid ASC LIMIT 1) AS cid FROM pts p)"
        )
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT row_number() OVER (ORDER BY cid) - 1 AS cid,"
            f" ax AS x, ay AS y FROM"
            f" (SELECT cid, avg(x) AS ax, avg(y) AS ay FROM a{i} GROUP BY cid))"
        )
    ctes.append(
        f"af AS (SELECT (SELECT c.cid FROM c{iters} c"
        f" ORDER BY sqrt((p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y)) ASC,"
        f" c.cid ASC LIMIT 1) AS cid FROM pts p)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT c.cid AS cluster_id, round(c.x, 4) AS cx, round(c.y, 4) AS cy,
           coalesce(n.n_points, 0) AS n_points
    FROM c{iters} c LEFT JOIN
         (SELECT cid, count(*) AS n_points FROM af GROUP BY cid) n USING (cid)
    ORDER BY cluster_id
    """
    )


@query("k1_kmeans_lloyd", oracle=_lloyd_oracle_sql(_K1_K, _K1_ITERS))
def k1_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 on the embeddings table's first two dims: k=4, 5 iterations,
    reference iteration semantics (first-K init by vec_id, lowest-index
    ties, empty-cluster drop)."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.select(
        F.col("vec_id"),
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    res = lloyd_fit(
        df, k=_K1_K, order_col="vec_id", max_iter=_K1_ITERS, tol=0.0
    )
    counts = (
        assign_clusters(df, res.centroids)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    cents = spark.createDataFrame(
        [(i, c[0], c[1]) for i, c in enumerate(res.centroids)],
        schema="cluster_id INT, x DOUBLE, y DOUBLE",
    )
    return (
        cents.join(counts, "cluster_id", "left")
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            F.round("x", 4).alias("cx"),
            F.round("y", 4).alias("cy"),
            F.coalesce(F.col("n_points"), F.lit(0)).cast("bigint").alias("n_points"),
        )
        .orderBy("cluster_id")
    )


_K1B_K = 256
_K1B_ITERS = 3


@query("k1b_lloyd_join_largek")
def k1b_lloyd_join_largek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-codebook Lloyd's: K=256 over the FULL 64-dim embedding
    column via ``lloyd_fit_join`` — the O(1)-plan-size path whose
    assignment is one numpy matmul per Arrow batch against a broadcast
    (K, dim) matrix. The literal-expression form would embed
    K·dim = 16,384 constants in the plan and recompile codegen every
    iteration; this entry exists to keep the broadcast path exercised
    and benched at representative codebook size every round. Rows-only
    for the driver (a 3-iteration 64-dim K-Means has no tractable SQL
    oracle); exact parity with ``lloyd_fit`` on the same inputs is
    pinned at K=16x64-dim in tests/test_kmeans.py, and both 2-D forms
    are oracled via k1.

    At sf0.01 (500 vectors) most of the 256 first-row-init clusters
    survive with ~2 points; empty clusters drop per reference
    semantics, so the output also exercises the K-shrink path at scale.
    """
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    res = lloyd_fit_join(
        emb,
        k=_K1B_K,
        order_col="vec_id",
        max_iter=_K1B_ITERS,
        tol=0.0,
        array_col="embedding",
    )
    cents = spark.createDataFrame(
        [
            (i, float(sum(v * v for v in c) ** 0.5))
            for i, c in enumerate(res.centroids)
        ],
        schema="cluster_id INT, c_norm DOUBLE",
    )
    counts = (
        assign_clusters_broadcast(emb, res.centroids, array_col="embedding")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    return (
        cents.join(counts, "cluster_id", "left")
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            F.round("c_norm", 4).alias("c_norm"),
            F.coalesce("n_points", F.lit(0)).cast("bigint").alias("n_points"),
        )
        .orderBy("cluster_id")
    )


@query("k2_kmeans_mllib")
def k2_kmeans_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 production path: MLlib KMeans over the full 64-dim embedding
    column (seeded). No SQL oracle (KMeans|| init is not expressible in
    SQL) — correctness is covered by pytest property tests; the driver
    records the rows-only check."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _, preds = mllib_fit(emb, k=8, array_col="embedding", max_iter=10, seed=42)
    return (
        preds.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.avg(F.col("embedding")[0].cast("double")), 4).alias("avg_dim0"),
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------------------------------------
# K13 — scalable K-Means|| initialization (Bahmani et al., VLDB 2012),
# DETERMINISTIC and therefore SQL-oracle-able. MLlib's own KMeans|| is
# seeded-random (which is why k2 is rows-only); this variant replaces
# the RNG with a value-pure md5 draw (p5's idiom) and quantizes every
# distance/cost to a 1e-6 grid (k5's trick for making iterative math
# replay in unrolled SQL), so the full distributed seeding — R rounds of
# cost-proportional oversampling — becomes an exact DuckDB replay.
# --------------------------------------------------------------------------
KMPP_OVERSAMPLE = 8.0   # l: expected candidates drawn per round
KMPP_ROUNDS = 3
_KMPP_SALT = "kmpp"
_KMPP_HEX = 6           # draw granularity: 16^6 buckets


def _kmpp_d2(vcol, cvec) -> F.Column:
    """Squared euclidean distance from an array<double> column to a
    centroid array column/literal, rounded to the 1e-6 grid BEFORE any
    min/sum so both engines agree bit-for-bit downstream."""
    return F.round(
        F.aggregate(
            F.zip_with(vcol, cvec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _kmpp_min_d2(vcol, cands) -> F.Column:
    """Grid-rounded distance to the NEAREST candidate, evaluated as one
    ``transform`` over a single array-of-arrays literal: plan/codegen
    size stays O(dim) regardless of candidate count (the per-candidate
    expression form recompiles an O(cands·dim) tree every round — at
    round 3 with ~25 candidates that is the dominant wall cost)."""
    return F.array_min(
        F.transform(
            _matrix_literal([vec for _, _, vec in cands]),
            lambda c: _kmpp_d2(vcol, c),
        )
    )


def _matrix_literal(rows: list[list[float]]) -> F.Column:
    """The candidate matrix as ONE folded literal: ``from_json`` of a
    constant string is constant-folded by Catalyst into a single
    ArrayData literal (kept in the codegen references array), so the
    analyzed/optimized tree and the generated code stay O(1) in
    cands·dim — the ``F.array(F.array(F.lit...))`` form built a
    CreateArray tree of cands·dim Literal nodes (1,792 at round 3)
    that re-paid analysis + codegen on every seeding pass (measured
    3x on the pass wall time). Values are bit-identical: json.dumps
    emits repr-style shortest round-trip decimals and Jackson parses
    back to the nearest double — the same IEEE-754 value the F.lit
    path embedded."""
    import json

    return F.from_json(
        F.lit(json.dumps(rows)), "array<array<double>>"
    )


def _kmpp_draw(vec_id, r: int) -> F.Column:
    """Value-pure uniform draw in [0, 1): md5 of (salt, round, id) —
    independent of partitioning, row order, and cluster size."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_KMPP_SALT}{r}_"), vec_id.cast("string"))),
            1,
            _KMPP_HEX,
        ),
        16,
        10,
    ).cast("bigint")
    return h / F.lit(float(16 ** _KMPP_HEX))


def kmeans_parallel_init(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: float = KMPP_OVERSAMPLE,
    rounds: int = KMPP_ROUNDS,
) -> list[tuple[int, int, list[float]]]:
    """Run the distributed K-Means|| seeding loop and return the
    candidate set as ``(round_added, vec_id, vector)`` (round 0 = the
    deterministic seed: the minimum-id row, mirroring k1's first-row
    init).

    Per round: ONE narrow pass computes each point's grid-rounded
    squared distance to the nearest current candidate (literal-centroid
    broadcast — no join, no shuffle; the k1b broadcast-variable form
    applies verbatim when the candidate set outgrows literal plans),
    one scalar aggregate yields the round's total cost, and points with
    ``u(id, round) < l * d2 / cost`` join the candidate set. Only the
    O(l) selected rows ever reach the driver — the kmeans|| contract
    (candidates ~ l*rounds regardless of corpus size), so the loop is
    100 TB-shaped exactly like MLlib's own implementation
    (mllib KMeans.scala initKMeansParallel).
    """
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    # The seeding loop makes 2 passes per round (cost aggregate +
    # selection) plus the seed pass — materialize the projected corpus
    # once instead of re-scanning parquet per pass (the shape MLlib's
    # own initKMeansParallel uses: it requires its input cached;
    # guide §5 — cache what is reused across iterative passes).
    # Non-replicated executor-local storage: executor loss mid-seeding
    # fails the job (retry recomputes one narrow projection).
    ).localCheckpoint(eager=False)
    seed = e.orderBy("vec_id").limit(1).collect()[0]
    cands: list[tuple[int, int, list[float]]] = [(0, seed["vec_id"], list(seed["v"]))]
    for r in range(1, rounds + 1):
        scored = e.select(
            "vec_id", "v", _kmpp_min_d2(F.col("v"), cands).alias("d2")
        )
        cost = scored.agg(F.round(F.sum("d2"), 6)).collect()[0][0]
        # Degenerate round: every remaining point coincides with a
        # candidate (cost == 0.0 would make d2/cost NaN and draw
        # nothing) or the input was empty (cost is NULL -> None).
        if not cost:
            break
        picked = (
            scored.filter(
                _kmpp_draw(F.col("vec_id"), r)
                < F.lit(oversample) * F.col("d2") / F.lit(float(cost))
            )
            .select("vec_id", "v")
            .collect()
        )
        # collect() order is partition-dependent; sort so the returned
        # LIST (not just the set) is canonical across partitionings —
        # refine_weighted_candidates' FP weighted sums are
        # order-sensitive.
        cands.extend(
            (r, row["vec_id"], list(row["v"]))
            for row in sorted(picked, key=lambda row: row["vec_id"])
        )
    return cands


@query(
    "k13_kmeanspp_init",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c1 AS (
      SELECT 0 AS round_added, vec_id, v FROM e ORDER BY vec_id LIMIT 1
    ),
    d_1 AS (
      SELECT e.vec_id,
             min(round(list_sum(list_transform(
                 generate_series(1, len(e.v)),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), 6)) AS d2
      FROM e, c1 c
      GROUP BY e.vec_id
    ),
    s1 AS (
      SELECT 1 AS round_added, d.vec_id, e.v
      FROM d_1 d JOIN e ON e.vec_id = d.vec_id,
           (SELECT round(sum(d2), 6) AS cost FROM d_1) t
      WHERE CAST(('0x' || substr(md5('{_KMPP_SALT}1_' || CAST(d.vec_id AS VARCHAR)), 1, {_KMPP_HEX})) AS BIGINT)
              / {float(16 ** _KMPP_HEX)}
            < {KMPP_OVERSAMPLE} * d.d2 / t.cost
    ),
    c2 AS (SELECT * FROM c1 UNION ALL SELECT * FROM s1),
    d_2 AS (
      SELECT e.vec_id,
             min(round(list_sum(list_transform(
                 generate_series(1, len(e.v)),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), 6)) AS d2
      FROM e, c2 c
      GROUP BY e.vec_id
    ),
    s2 AS (
      SELECT 2 AS round_added, d.vec_id, e.v
      FROM d_2 d JOIN e ON e.vec_id = d.vec_id,
           (SELECT round(sum(d2), 6) AS cost FROM d_2) t
      WHERE CAST(('0x' || substr(md5('{_KMPP_SALT}2_' || CAST(d.vec_id AS VARCHAR)), 1, {_KMPP_HEX})) AS BIGINT)
              / {float(16 ** _KMPP_HEX)}
            < {KMPP_OVERSAMPLE} * d.d2 / t.cost
    ),
    c3 AS (SELECT * FROM c2 UNION ALL SELECT * FROM s2),
    d_3 AS (
      SELECT e.vec_id,
             min(round(list_sum(list_transform(
                 generate_series(1, len(e.v)),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), 6)) AS d2
      FROM e, c3 c
      GROUP BY e.vec_id
    ),
    s3 AS (
      SELECT 3 AS round_added, d.vec_id, e.v
      FROM d_3 d JOIN e ON e.vec_id = d.vec_id,
           (SELECT round(sum(d2), 6) AS cost FROM d_3) t
      WHERE CAST(('0x' || substr(md5('{_KMPP_SALT}3_' || CAST(d.vec_id AS VARCHAR)), 1, {_KMPP_HEX})) AS BIGINT)
              / {float(16 ** _KMPP_HEX)}
            < {KMPP_OVERSAMPLE} * d.d2 / t.cost
    ),
    cfinal AS (SELECT * FROM c3 UNION ALL SELECT * FROM s3),
    dist AS (
      SELECT e.vec_id AS x_id, c.vec_id AS c_id,
             round(list_sum(list_transform(
                 generate_series(1, len(e.v)),
                 i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), 6) AS d2
      FROM e, cfinal c
    ),
    near AS (
      SELECT x_id, c_id FROM (
        SELECT x_id, c_id,
               row_number() OVER (PARTITION BY x_id ORDER BY d2, c_id) AS rn
        FROM dist
      ) WHERE rn = 1
    )
    SELECT c.round_added, c.vec_id,
           CAST(count(n.x_id) AS BIGINT) AS weight
    FROM cfinal c LEFT JOIN near n ON n.c_id = c.vec_id
    GROUP BY c.round_added, c.vec_id
    ORDER BY c.vec_id
    """,
)
def k13_kmeanspp_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K13: the K-Means|| seeding loop end-to-end, driver-checked — the
    distributed half of production K-Means initialization (what k2's
    MLlib fit runs internally, but deterministic). Output: every
    candidate with the round it was drawn in and its attraction weight
    (points whose nearest final candidate it is, grid-rounded distance,
    ties to the lowest candidate id) — exactly the weighted set the
    local refine step (a K-row weighted Lloyd's, k1's domain) consumes.

    Scale: R narrow corpus passes + R scalar aggregates + one final
    K-group count shuffle. Nothing data-sized reaches the driver; the
    candidate set is O(l·R) by construction. The SQL oracle replays all
    three rounds unrolled (the k1/k5 quantized-trajectory pattern) —
    disproving k2's "KMeans|| is not SQL-expressible" for the
    deterministic variant."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cands = kmeans_parallel_init(emb)
    weights = candidate_weights(emb, cands)
    meta = spark.createDataFrame(
        [(r, cid) for r, cid, _ in cands], "round_added INT, vec_id BIGINT"
    )
    return (
        meta.join(weights, meta.vec_id == weights.c_id, "left")
        .select(
            "round_added",
            "vec_id",
            F.coalesce("weight", F.lit(0)).cast("bigint").alias("weight"),
        )
        .orderBy("vec_id")
    )


def candidate_weights(
    emb: DataFrame,
    cands: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attraction weight of each K-Means|| candidate: how many corpus
    points have it as their nearest candidate (grid-rounded distance,
    ties to the lowest candidate id). One narrow pass + one
    O(candidates)-group aggregate; the assignment is a single
    ``transform`` over ONE literal array of (vec, id) structs — same
    O(1)-in-candidate-count plan shape as ``_kmpp_min_d2``; struct
    ordering gives (min d, then min id): the lowest-id tie-break.
    Returns a DataFrame (c_id BIGINT, weight BIGINT)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # ONE folded literal for the whole (vec, id) candidate table — the
    # same constant-folding trick as _matrix_literal (see there); the
    # CreateArray/CreateStruct tree form re-paid O(cands·dim) analysis
    # and codegen on every call.
    import json

    pairs = F.from_json(
        F.lit(
            json.dumps(
                [{"vec": vec, "c": cid} for _, cid, vec in cands]
            )
        ),
        "array<struct<vec:array<double>,c:bigint>>",
    )
    assign = e.select(
        F.array_min(
            F.transform(
                pairs,
                lambda p: F.struct(
                    _kmpp_d2(F.col("v"), p["vec"]).alias("d"),
                    p["c"].alias("c"),
                ),
            )
        )["c"].alias("c_id")
    )
    return assign.groupBy("c_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("weight")
    )


def refine_weighted_candidates(
    cands: list[tuple[int, int, list[float]]],
    weights: dict[int, int],
    k: int,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> list[list[float]]:
    """The LOCAL half of K-Means|| (Bahmani et al. §3.3): recluster the
    O(l·R) weighted candidates down to k centers. Driver-side numpy by
    design — the input is K-row-sized whatever the corpus was, so this
    is the same "small local problem" MLlib solves after its own
    parallel init (LocalKMeans.kMeansPlusPlus).

    Deterministic where the paper leaves it random: init = the k
    heaviest candidates (ties to the lowest vec_id), then weighted
    Lloyd's (argmin ties to the lowest candidate index) until the max
    center move is <= tol. Returns k centers (fewer only if fewer
    candidates exist)."""
    import numpy as np

    order = sorted(cands, key=lambda c: (-weights.get(c[1], 0), c[1]))
    pts = np.asarray([vec for _, _, vec in cands], dtype=np.float64)
    wts = np.asarray(
        [float(weights.get(cid, 0)) for _, cid, _ in cands], dtype=np.float64
    )
    centers = np.asarray([vec for _, _, vec in order[:k]], dtype=np.float64)
    for _ in range(max_iter):
        d = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)  # first-match = lowest index
        new = centers.copy()
        for j in range(len(centers)):
            m = assign == j
            wsum = wts[m].sum()
            if wsum > 0:
                new[j] = (pts[m] * wts[m, None]).sum(axis=0) / wsum
        move = float(np.sqrt(((new - centers) ** 2).sum(axis=1)).max())
        centers = new
        if move <= tol:
            break
    return [list(c) for c in centers]


def corpus_wssse(
    emb: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Within-set sum of squared errors of the corpus against ``centers``:
    one narrow broadcast-centers pass (numpy matmul per Arrow batch, the
    lloyd_fit_join assignment shape) + one scalar aggregate. Nothing
    data-sized reaches the driver."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bc = emb.sparkSession.sparkContext.broadcast(
        np.asarray(centers, dtype=np.float64)
    )

    @pandas_udf("double")
    def min_d2(vs: pd.Series) -> pd.Series:
        c = bc.value
        mat = np.vstack(vs.to_numpy())
        d = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
        d += (mat * mat).sum(axis=1)[:, None]
        np.maximum(d, 0.0, out=d)
        return pd.Series(d.min(axis=1))

    return float(
        emb.select(
            min_d2(F.col(vec_col).cast("array<double>")).alias("d2")
        ).agg(F.sum("d2")).collect()[0][0]
    )


K14_K = 8
K14_MAX_ITER = 10


def production_fit(
    emb: DataFrame,
    k: int = K14_K,
    max_iter: int = K14_MAX_ITER,
    tol: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> LloydResult:
    """The full deterministic production K-Means chain (Bahmani et al.
    VLDB 2012 end-to-end): K-Means|| distributed seeding (k13's
    ``kmeans_parallel_init``) → attraction weights (one narrow pass) →
    driver-local weighted refine of the O(l·R) candidate set down to k
    seeds (``refine_weighted_candidates``) → seeded distributed Lloyd's
    (``lloyd_fit_join``: broadcast-matrix assignment, K-group partial
    aggregate per iteration). Every stage is deterministic, so the whole
    fit is value-pure — unlike MLlib's seeded-random k2 path.

    Scale: identical per-stage shapes to k13/k1b — R narrow corpus
    passes for seeding, one weight pass, a K-row local problem, then
    max_iter Lloyd's iterations whose only shuffle is the K-group mean."""
    cands = kmeans_parallel_init(emb, id_col=id_col, vec_col=vec_col)
    weights = {
        r["c_id"]: r["weight"]
        for r in candidate_weights(
            emb, cands, id_col=id_col, vec_col=vec_col
        ).collect()
    }
    seeds = refine_weighted_candidates(cands, weights, k)
    return lloyd_fit_join(
        emb,
        k=k,
        order_col=id_col,
        max_iter=max_iter,
        tol=tol,
        array_col=vec_col,
        init_centroids=seeds,
    )


@query("k14_production_fit")
def k14_production_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K14: the k13 seeding closed through to a full fit — K-Means||
    candidates, weighted local refine, seeded Lloyd's to convergence
    (k=8, 10-iteration budget: k2's exact fit shape, deterministic).
    Rows-only for the driver (the seeded fit composes k13's oracled
    seeding with k1b's pinned-parity Lloyd's; the full chain at 64-dim
    has no tractable SQL oracle) — quality is pinned by pytest: corpus
    WSSSE must not lose to MLlib's own KMeans|| fit at the same k and
    iteration budget (tests/test_kmeans.py), and the output is
    golden-hash pinned (tests/test_golden_hashes.py). Output: one row
    per final cluster with size, centroid norm, and the fit-level WSSSE
    (same scalar on every row, 4-decimal) so the hash pins fit quality,
    not just cluster shapes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    res = production_fit(emb)
    # ONE post-fit corpus pass instead of two (corpus_wssse +
    # assign_clusters_broadcast each re-scanned the corpus; guide §1.2
    # — at 100 TB that is a full extra read). The fused kernel computes
    # the SAME distance matrix both kernels built (identical numpy
    # expression), takes cluster_id = argmin(d) exactly as
    # assign_clusters_broadcast did and d2 = max(min(d), 0) — equal to
    # corpus_wssse's min over the clamped matrix, since clamping only
    # lifts negatives to the same 0 the min then returns. The lazy
    # localCheckpoint materializes the 2-column frame once so the two
    # aggregates below don't re-run the kernel (executor loss ⇒ job
    # retry from scratch; acceptable for a 2-column per-row frame that
    # is itself one cheap narrow pass to rebuild).
    bc = spark.sparkContext.broadcast(
        np.asarray([list(c) for c in res.centroids], dtype=np.float64)
    )

    @pandas_udf("double")
    def min_d2(vs: pd.Series) -> pd.Series:
        c = bc.value
        mat = np.vstack(vs.to_numpy())
        d = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
        d += (mat * mat).sum(axis=1)[:, None]
        return pd.Series(np.maximum(d.min(axis=1), 0.0))

    assigned = (
        assign_clusters_broadcast(emb, res.centroids, array_col="embedding")
        .select(
            "cluster_id",
            min_d2(F.col("embedding").cast("array<double>")).alias("d2"),
        )
        .localCheckpoint(eager=False)
    )
    wssse = float(assigned.agg(F.sum("d2")).collect()[0][0])
    cents = spark.createDataFrame(
        [
            (i, float(sum(v * v for v in c) ** 0.5))
            for i, c in enumerate(res.centroids)
        ],
        schema="cluster_id INT, c_norm DOUBLE",
    )
    counts = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_points")
    )
    return (
        cents.join(counts, "cluster_id", "left")
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            F.round("c_norm", 4).alias("c_norm"),
            F.coalesce("n_points", F.lit(0)).cast("bigint").alias("n_points"),
            F.round(F.lit(wssse), 4).alias("fit_wssse"),
        )
        .orderBy("cluster_id")
    )
