"""User-facing engine facade — the three entry points the reference
exposes as three separate processes (SURVEY.md §3: ``python master.py``
+ per-worker ``mapper.py``/``reducer.py`` servers), collapsed into one
object over one SparkSession:

- ``Engine.fit`` / ``Engine.run_reference_workload``: the K-Means
  workload (the reference's only query), with its exact iteration
  semantics;
- ``Engine.sql`` / ``Engine.table``: the relational surface over the
  engine tables;
- ``Engine.stream_tumbling``: the streaming surface.

A user of the reference switches by replacing their stdin-driven
``master.py`` run with ``Engine().run_reference_workload(...)`` — same
inputs (a points file, K, max iterations), same ``centroids.txt``
output format, no mapper/reducer processes to boot (the M and R
parameters are accepted for signature parity and ignored: Spark's DAG
scheduler owns physical parallelism, SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from k_means_clustering_via_map_reduce_spark.kmeans import (
    LloydResult,
    lloyd_fit,
    mllib_fit,
)
from k_means_clustering_via_map_reduce_spark.session import configure, get_spark
from k_means_clustering_via_map_reduce_spark.sources import (
    TABLE_NAMES,
    load_table,
    read_points_csv,
    write_centroids_txt,
)


class Engine:
    def __init__(self, spark: SparkSession | None = None):
        self.spark = configure(spark) if spark is not None else get_spark()

    # -- relational surface ------------------------------------------------
    def register_tables(self, sf_dir: str) -> None:
        """Register every engine table for ``sf_dir`` as a temp view so
        ``sql()`` can query them by name."""
        for name in TABLE_NAMES:
            load_table(self.spark, sf_dir, name).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, sf_dir: str, name: str) -> DataFrame:
        return load_table(self.spark, sf_dir, name)

    # -- K-Means surface ---------------------------------------------------
    def fit(
        self,
        df: DataFrame,
        k: int,
        feature_cols: tuple[str, ...] = ("x", "y"),
        order_col: str = "row_idx",
        max_iter: int = 20,
        tol: float = 1e-3,
    ) -> LloydResult:
        """Reference-semantics Lloyd's (first-K init, lowest-index ties,
        id-matched convergence, empty-cluster drop)."""
        return lloyd_fit(
            df,
            k,
            feature_cols=feature_cols,
            order_col=order_col,
            max_iter=max_iter,
            tol=tol,
        )

    def fit_mllib(self, df: DataFrame, k: int, **kw):
        """Production-path K-Means (MLlib, n-dim, KMeans|| init)."""
        return mllib_fit(df, k, **kw)

    def init_kmeans_parallel(self, df: DataFrame, **kw):
        """Deterministic K-Means|| seeding (k13): returns the weighted
        candidate set ``(round_added, vec_id, vector)`` for a local
        refine via ``fit``; reproducible across runs/partitionings."""
        from k_means_clustering_via_map_reduce_spark.kmeans import (
            kmeans_parallel_init,
        )

        return kmeans_parallel_init(df, **kw)

    def run_reference_workload(
        self,
        points_path: str,
        num_clusters: int,
        max_iterations: int,
        num_mappers: int | None = None,
        num_reducers: int | None = None,
        tol: float = 1e-3,
        output_path: str | None = None,
    ) -> LloydResult:
        """The reference's end-to-end run (master.py:198-266): read an
        ``x,y``-per-line points file, Lloyd's with first-K init and
        tolerance ``tol`` (master.py:32), optionally write the
        ``centroids.txt``-format ``%.4f`` output (master.py:264-266).

        ``num_mappers``/``num_reducers`` mirror the reference's M/R
        prompts and are deliberately unused — physical parallelism is
        the scheduler's job, not the query's.
        """
        del num_mappers, num_reducers
        pts = read_points_csv(self.spark, points_path)
        result = self.fit(
            pts, num_clusters, max_iter=max_iterations, tol=tol
        )
        if output_path is not None:
            write_centroids_txt(result.centroids, output_path)
        return result

    # -- streaming surface -------------------------------------------------
    def stream_tumbling(self, sf_dir: str) -> DataFrame:
        """Event-time tumbling-window counts as a real streaming query
        (file source → watermark → windowed agg → memory sink)."""
        from k_means_clustering_via_map_reduce_spark.streaming.windows import (
            stream_tumbling_counts,
        )

        return stream_tumbling_counts(self.spark, sf_dir)


def observed(
    df: DataFrame, name: str, metrics: dict[str, "F.Column"]
) -> tuple[DataFrame, "object"]:
    """Attach zero-cost pipeline metrics to a DataFrame via Spark's
    Observation API: the named aggregate expressions are computed
    DURING the job that materializes ``df`` (piggybacked on the
    existing pass — no second scan), and read back from the returned
    Observation after an action.

    The operational face of a production pipeline: row counts, null
    rates, and invariant checks (e.g. "no negative prices survived the
    filter") collected per run without paying an extra aggregation
    job — at 100 TB a separate validation pass would double the scan
    bill. Pinned in tests/test_engine.py.

    Usage::

        df, obs = observed(df, "ingest", {
            "rows": F.count(F.lit(1)),
            "null_keys": F.sum(F.col("k").isNull().cast("long")),
        })
        df.write.parquet(...)          # any action
        assert obs.get["null_keys"] == 0
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs
