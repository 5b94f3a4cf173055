"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, per the scale design:
- ``s1_cosine_topk``: brute-force cosine top-k — broadcast the (small)
  query set against the full corpus, rank with a window. Oracled in SQL.
  This is the correctness baseline AND the right plan whenever the query
  set is broadcastable: the corpus is scanned once, no shuffle of the
  corpus itself, only (n_queries × k) rows survive the window.
- ``s2_lsh_topk``: signed-random-projection LSH — deterministic
  hyperplanes, band blocking, exact cosine re-rank inside buckets.
  Sub-quadratic; recall is checked against s1 in pytest (driver records
  rows-only).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k_means_clustering_via_map_reduce_spark.functions.vector import (
    dot,
    vector_norm,
)
from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table, spread

TOPK_N_QUERIES = 20
TOPK_K = 5

LSH_PLANES = 24
LSH_BANDS = 8
LSH_ROWS = LSH_PLANES // LSH_BANDS
LSH_SEED = 42
EMBEDDING_DIM = 64


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = TOPK_K
) -> DataFrame:
    """Cosine top-k of every query against the corpus. The query side is
    explicitly broadcast; ties break to the lower neighbor id."""
    # Norms are precomputed once per vector on each side; the quadratic
    # stage then pays one dot + one divide per pair, in the same FP
    # operation order as the SQL oracle. The corpus side is spread so the
    # broadcast join's probe stage uses every core even when the scan is a
    # single row group.
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    c = spread(corpus).withColumn("nrm", vector_norm(F.col("v")))
    pairs = c.alias("c").join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


@query(
    "s1_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {TOPK_N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qv, e.v)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(e.v, e.v))) AS cos,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_dot_product(q.qv, e.v)
                        / (sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(e.v, e.v))) DESC,
                        e.vec_id ASC) AS rank
      FROM q JOIN e ON e.vec_id != q.query_id
    )
    SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos_sim
    FROM scored WHERE rank <= {TOPK_K}
    ORDER BY query_id, rank
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return brute_force_topk(e, q).orderBy("query_id", "rank")


def _hyperplanes(dim: int = EMBEDDING_DIM, planes: int = LSH_PLANES, seed: int = LSH_SEED):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim))


def srp_sketch(df: DataFrame, vec_col: str = "v") -> DataFrame:
    """Signed-random-projection sketch: bit p = sign(v · plane_p), packed
    into per-band integers, emitted as one ``bands`` array column.

    Computed as a single Arrow-batched pandas UDF doing one numpy matmul
    per batch: (batch × dim) @ (dim × planes). The hyperplanes are a
    deterministic closure constant (seeded RNG) shipped once per executor
    — the Spark-idiomatic replacement for a 24×64-literal expression tree,
    which costs thousands of py4j calls to build and falls out of
    whole-stage codegen anyway (higher-order-function folds are
    interpreted). BLAS does the hot loop instead."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes_t = _hyperplanes().T  # (dim, planes)
    weights = (2 ** np.arange(LSH_ROWS - 1, -1, -1)).astype(np.int64)

    @pandas_udf("array<long>")
    def bands_of(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy())  # (n, dim)
        bits = (mat @ planes_t >= 0).astype(np.int64)  # (n, planes)
        packed = bits.reshape(len(mat), LSH_BANDS, LSH_ROWS) @ weights
        return pd.Series(list(packed))

    return df.withColumn("bands", bands_of(F.col(vec_col)))


def srp_candidate_ids(corpus: DataFrame, q_full: DataFrame) -> DataFrame:
    """The slim candidate-generation core of SRP-LSH: deduped
    (query_id, vec_id) pairs sharing ≥ 1 sketch band. The only columns
    entering the band join and candidate-dedup shuffles are scalar ids
    and band keys — the vectors stay out (pinned by
    tests/test_plans.py::test_s2_band_join_shuffles_no_arrays). The
    ``spread`` round-robin repartition before the sketch is the one
    deliberate payload move (fixture parallelism; a no-op at scale)."""

    def banded_keys(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
        sk = srp_sketch(df, vec_col)
        return sk.select(
            id_col,
            F.posexplode("bands").alias("band_id", "band_val"),
        )

    c_keys = banded_keys(spread(corpus), "v", "vec_id")
    q_keys = banded_keys(q_full.select("query_id", "qv"), "qv", "query_id")
    return (
        c_keys.join(F.broadcast(q_keys), ["band_id", "band_val"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = TOPK_K
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing ≥1 LSH band with the
    query, re-ranked by exact cosine.

    Scale shape: ONE corpus pass computes the sketch, bands explode to
    slim (vec_id, band_id, band_val) rows — LSH_BANDS rows per vector,
    linear, ~20 bytes each; the vectors themselves never enter the band
    join or the candidate dedup shuffle. A single equi-join on the banded
    key (query side broadcast) finds candidates; after the id-pair dedup
    the vectors + norms are joined back for the exact re-rank (pair side
    is small, so AQE broadcasts it — the corpus is re-scanned, not
    shuffled). No per-band rescan, no quadratic blow-up."""

    c_full = spread(corpus).withColumn("nrm", vector_norm(F.col("v")))
    q_full = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    cand_ids = srp_candidate_ids(corpus, q_full)
    scored = (
        cand_ids.join(c_full, "vec_id")
        .join(F.broadcast(q_full), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


@query("s2_lsh_topk")
def lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via SRP-LSH banding + exact re-rank. Rows-only
    for the driver; pytest measures recall vs s1_cosine_topk."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return lsh_topk(e, q).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# IVF — inverted-file ANN: coarse k-means quantizer + cell-probed search.
# --------------------------------------------------------------------------
IVF_NLIST = 16
IVF_NPROBE = 8
IVF_SEED = 42


def _cell_probe_udf(centers, n_probe: int):
    """pandas UDF: the ``n_probe`` nearest coarse-quantizer cells per
    vector (squared-L2, ties by cell id via stable argsort), one numpy
    matmul per Arrow batch. ``centers`` is a closure constant shipped once
    per executor — the coarse codebook is small by construction."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centers)  # (nlist, dim)
    c_sq = (c * c).sum(axis=1)  # (nlist,)

    @pandas_udf("array<int>")
    def probe(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy())  # (n, dim)
        # argmin over ||v - c||² == argmin over c·c - 2 v·c  (v·v constant)
        d = c_sq[None, :] - 2.0 * (mat @ c.T)  # (n, nlist)
        cells = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype(
            np.int32
        )
        return pd.Series(list(cells))

    return probe


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOPK_K,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """ANN top-k via an IVF index: train a coarse k-means quantizer
    (MLlib, seeded), assign every corpus vector to its nearest cell, and
    search each query only in its ``nprobe`` closest cells with exact
    cosine re-ranking.

    Scale shape: training samples/aggregates to ``nlist`` centers (driver
    state is the codebook only); cell assignment is one narrow matmul
    pass; the search is an equi-join on cell id with the tiny query side
    broadcast — per-query work drops from |corpus| to
    ~|corpus|·nprobe/nlist, and the corpus is never shuffled."""
    from k_means_clustering_via_map_reduce_spark.kmeans import mllib_fit

    model, _ = mllib_fit(
        corpus, k=nlist, array_col="v", max_iter=10, seed=IVF_SEED
    )
    centers = [ctr.tolist() for ctr in model.clusterCenters()]

    assign = _cell_probe_udf(centers, 1)
    probe = _cell_probe_udf(centers, nprobe)

    c = (
        spread(corpus)
        .withColumn("cell", assign(F.col("v"))[0])
        .withColumn("nrm", vector_norm(F.col("v")))
    )
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            vector_norm(F.col("v")).alias("qnrm"),
        )
        .withColumn("cell", F.explode(probe(F.col("qv"))))
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


@query("s3_ivf_topk")
def ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via an IVF (cell-probed) index. Rows-only for
    the driver; pytest measures recall vs s1_cosine_topk."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return ivf_topk(e, q).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# S4 — per-label embedding centroids: element-wise vector mean by group,
# the aggregation face of the embedding surface (class prototypes for
# semantic dedup / nearest-class-mean classification).
# --------------------------------------------------------------------------


@query(
    "s4_label_centroids",
    oracle=f"""
    SELECT label, CAST(i AS BIGINT) AS pos,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(CAST(embedding AS DOUBLE[])[i+1]), 4) AS mean_val
    FROM embeddings, range(0, {EMBEDDING_DIM}) t(i)
    GROUP BY label, i ORDER BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label, emitted as one row per
    (label, dimension) so the result is scalar-hashable by the driver
    compare (no array columns cross it).

    Scale: posexplode fans each vector into dim scalar rows BEFORE the
    shuffle, but Catalyst's partial aggregation collapses them map-side
    to (labels × dim) partial sums per task — the wire carries
    aggregate state, not the corpus. That is exactly MLlib's own
    reduce shape for computing cluster means, expressed relationally."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .groupBy("label", F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            r4(F.avg("val")).alias("mean_val"),
        )
        .orderBy("label", "pos")
    )


# --------------------------------------------------------------------------
# S5 — product quantization (PQ) with asymmetric-distance search
# (Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
# Search", IEEE TPAMI 2011 — ADC variant): the memory-compression half
# of a production IVF-PQ index (s3 is the cell-probing half). Vectors
# compress 64 float32 dims → PQ_SUBSPACES 4-bit codes (256 B → 4 B
# payload): at 100 TB that is the difference between an index that fits
# executor memory and one that does not — candidate scanning reads the
# code table, never the vectors.
# --------------------------------------------------------------------------
PQ_SUBSPACES = 8
PQ_CODES = 16
PQ_TRAIN_SAMPLE = 256
PQ_KMEANS_ITERS = 10
PQ_CAND_FACTOR = 12


def _pq_codebooks(sample):
    """Deterministic per-subspace Lloyd's on a driver-side sample:
    init = first PQ_CODES sample rows (the engine's O17 determinism
    anchor), fixed PQ_KMEANS_ITERS iterations, empty cells keep their
    previous centroid, float64 throughout. Returns
    (PQ_SUBSPACES, PQ_CODES, sub_dim). Driver state is the codebook
    only — (8 × 16 × 8) floats regardless of corpus size; the sample is
    a fixed-size head slice exactly like k1's init."""
    import numpy as np

    n, dim = sample.shape
    sub_dim = dim // PQ_SUBSPACES
    books = []
    for s in range(PQ_SUBSPACES):
        x = sample[:, s * sub_dim : (s + 1) * sub_dim]  # (n, sub_dim)
        c = x[:PQ_CODES].copy()
        for _ in range(PQ_KMEANS_ITERS):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # first-match ties, O6 semantics
            for j in range(PQ_CODES):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books.append(c)
    return np.stack(books)  # (subspaces, codes, sub_dim)


def _pq_encode_udf(books):
    """pandas UDF: per-subspace nearest-codeword ids (squared-L2, stable
    first-match ties) — one (batch × codes) distance matrix per subspace
    per Arrow batch. Pure per-row function: encoding is independent of
    partitioning and row order."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    b = np.asarray(books)  # (S, K, d)
    s_n, k_n, d_n = b.shape
    b_sq = (b * b).sum(axis=2)  # (S, K)

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        codes = np.empty((mat.shape[0], s_n), dtype=np.int32)
        for s in range(s_n):
            x = mat[:, s * d_n : (s + 1) * d_n]
            # argmin ||x-c||² == argmin c·c - 2 x·c (x·x constant per row)
            d = b_sq[s][None, :] - 2.0 * (x @ b[s].T)
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def _pq_adc_scores(
    codes_df: DataFrame, queries, books, passthrough: tuple = ()
) -> DataFrame:
    """(vec_id, query_id, adc): asymmetric distance of every corpus code
    row to every query, via per-query lookup tables — table[s, j] =
    ||q_sub_s - codeword_j||², so adc = Σ_s table[s, codes[s]]. One
    mapInPandas pass over the CODE table (the vectors are never read
    here); per-batch cost is pure numpy fancy-indexing. ``passthrough``
    names extra int columns of ``codes_df`` copied onto every output
    row (s8 carries the IVF cell through so per-query cell restriction
    needs no corpus-sized re-join); () leaves s5's plan byte-identical.
    """
    import numpy as np

    b = np.asarray(books)  # (S, K, d)
    s_n, k_n, d_n = b.shape
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.vstack([q[1] for q in queries]).astype(np.float64)
    # tables: (Q, S, K)
    tables = np.empty((len(q_ids), s_n, k_n))
    for s in range(s_n):
        qs = q_mat[:, s * d_n : (s + 1) * d_n]  # (Q, d)
        diff = qs[:, None, :] - b[s][None, :, :]  # (Q, K, d)
        tables[:, s, :] = (diff * diff).sum(axis=2)

    out_schema = "vec_id bigint, query_id bigint, adc double" + "".join(
        f", {c} int" for c in passthrough
    )

    def score(batches):
        for pdf in batches:
            codes = np.vstack(pdf["codes"].to_numpy())  # (n, S)
            vec_ids = pdf["vec_id"].to_numpy()
            n = len(vec_ids)
            sub_idx = np.arange(s_n)[None, :]
            frames = []
            for qi, qid in enumerate(q_ids):
                adc = tables[qi][sub_idx, codes].sum(axis=1)
                data = {
                    "vec_id": vec_ids,
                    "query_id": np.full(n, qid),
                    "adc": adc,
                }
                for c in passthrough:
                    data[c] = pdf[c].to_numpy()
                frames.append(pd.DataFrame(data))
            yield pd.concat(frames, ignore_index=True)

    return codes_df.mapInPandas(score, out_schema)


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOPK_K,
) -> DataFrame:
    """PQ-compressed ANN: train per-subspace codebooks on a
    deterministic head sample, encode the corpus to 4-bit code arrays,
    score every (query, code-row) pair by asymmetric distance, keep the
    top ``k * PQ_CAND_FACTOR`` candidates per query, and exact-rerank
    only those against the real vectors.

    Scale shape: the scan that feeds candidate generation reads the
    CODE table (4 B/vector payload — 64× smaller than the vectors);
    per-partition top-C pre-selection bounds the shuffle to
    (partitions × Q × C) scalar rows regardless of corpus size (the
    global top-C by (adc, vec_id) is a subset of the union of
    per-partition top-Cs under the same total order); only the C
    candidates per query ever touch the full vectors again, via a
    broadcast semi-style join. Ties break by vec_id everywhere, so the
    result is partitioning-independent."""
    n_cand = k * PQ_CAND_FACTOR
    sample = (
        corpus.orderBy("vec_id")
        .limit(PQ_TRAIN_SAMPLE)
        .select("v")
        .toPandas()
    )
    import numpy as np

    books = _pq_codebooks(np.vstack(sample["v"].to_numpy()).astype(np.float64))

    q_rows = [
        (r["vec_id"], r["v"])
        for r in queries.select("vec_id", "v").orderBy("vec_id").collect()
    ]

    codes = spread(corpus).select(
        "vec_id", _pq_encode_udf(books)(F.col("v")).alias("codes")
    )
    scored = _pq_adc_scores(codes, q_rows, books).filter(
        F.col("vec_id") != F.col("query_id")
    )

    w_local = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("r", F.row_number().over(w_local))
        .filter(F.col("r") <= n_cand)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )

    qdf = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    c = corpus.withColumn("nrm", vector_norm(F.col("v")))
    reranked = (
        c.join(F.broadcast(cand), c["vec_id"] == cand["neighbor_id"])
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


@query("s5_pq_adc_topk")
def pq_adc_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via PQ codes + asymmetric distance + exact
    re-rank. Rows-only for the driver (seeded codebooks); pytest pins
    recall vs s1_cosine_topk and a golden output hash."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return pq_adc_topk(e, q).orderBy("query_id", "rank")


@query(
    "s6_filtered_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    en AS (SELECT e.* FROM e JOIN documents d ON e.vec_id = d.doc_id
           WHERE d.lang = 'en'),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id < {TOPK_N_QUERIES}),
    scored AS (
      SELECT q.query_id, en.vec_id AS neighbor_id,
             list_dot_product(q.qv, en.v)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(en.v, en.v))) AS cos,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_dot_product(q.qv, en.v)
                        / (sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(en.v, en.v))) DESC,
                        en.vec_id ASC) AS rank
      FROM q JOIN en ON en.vec_id != q.query_id)
    SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos_sim
    FROM scored WHERE rank <= {TOPK_K} ORDER BY query_id, rank
    """,
)
def s6_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: metadata-filtered similarity search — top-k cosine neighbors
    among ONLY the corpus rows passing a document predicate
    (lang = 'en'), the retrieval shape of every filtered vector store
    ("nearest English documents").

    PRE-filtering is the declared contract: the predicate semi-joins
    the corpus down BEFORE any distance is computed, so k results are
    guaranteed (post-filtering an unfiltered top-k loses recall when
    the filter is selective — the classic filtered-ANN bug, which this
    oracle would catch as missing rows). The predicate side broadcasts
    (it is an id list); the filtered corpus then flows through the s1
    broadcast-probe/window plan unchanged.

    Scale: at selectivity s the scan cost drops to s·corpus; for the
    IVF path (s3) the same semi-join applies per probed cell. The
    window top-k keeps only (queries × k) rows past the scan."""
    docs = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    en_ids = docs.filter(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = e.join(F.broadcast(en_ids), "vec_id", "left_semi")
    queries = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return brute_force_topk(corpus, queries).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# S7 — PERSISTED IVF index: build once, serve many. s3 refits its coarse
# quantizer on every call; a production ANN service trains/encodes at
# ingest and the query path only LOADS — this entry splits the two.
# The index is two catalog tables: ``s7_centroids`` (the coarse
# codebook, nlist rows) and ``s7_postings`` (vec_id, v, nrm, cell),
# hash-BUCKETED on the cell id (f12's lever) so every cell-keyed join
# or aggregate over the corpus is shuffle-free forever after — at
# 100 TB the corpus-sized shuffle is paid once at index build, never
# per query.
# --------------------------------------------------------------------------
S7_BUCKETS = 8
_S7_STAGED: dict = {}


def embeddings_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v double[]) — the canonical ANN corpus projection every
    persisted-index entry serves from, factored to ONE place so the
    staging key below always describes the projection actually indexed
    (round-12 ADVICE #3)."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def ensure_staged_s7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent (process, sf_dir)-keyed build of the persisted s7
    IVF artifacts; returns the corpus projection. PUBLIC: the s7/s9b/
    s10/s12/s13 queries and bench.py's prestage all stage through this
    one function, so the staging logic cannot desynchronize (round-12
    ADVICE #3)."""
    from k_means_clustering_via_map_reduce_spark.queries import staging_key

    e = embeddings_corpus(spark, sf_dir)
    key = staging_key(sf_dir, "embeddings")
    if _S7_STAGED.get("key") != key:
        build_ivf_index(e)
        _S7_STAGED["key"] = key
    return e


def ensure_staged_s8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s8's IVF-PQ mirror of ``ensure_staged_s7``."""
    from k_means_clustering_via_map_reduce_spark.queries import staging_key

    e = embeddings_corpus(spark, sf_dir)
    key = staging_key(sf_dir, "embeddings")
    if _S8_STAGED.get("key") != key:
        build_ivf_pq_index(e)
        _S8_STAGED["key"] = key
    return e


def ensure_staged(spark: SparkSession, sf_dir: str) -> None:
    """Build every persisted similarity artifact (s7 + s8) — the one
    prestage entrypoint bench.py calls."""
    ensure_staged_s7(spark, sf_dir)
    ensure_staged_s8(spark, sf_dir)


def build_ivf_index(corpus: DataFrame, prefix: str = "s7") -> None:
    """Index build (the ingest-time job): train the seeded coarse
    quantizer, persist the codebook and the cell-bucketed postings.
    This is the ONLY place the quantizer is fit; the serve path never
    refits (pinned in tests/test_similarity.py by making the fit
    entrypoint explode under monkeypatch while searches keep working).
    """
    import os as _os
    import shutil as _sh
    from urllib.parse import urlparse as _urlparse

    from k_means_clustering_via_map_reduce_spark.kmeans import mllib_fit
    from k_means_clustering_via_map_reduce_spark.sources.sinks import (
        write_bucketed,
    )

    spark = corpus.sparkSession
    # stale-location guard (f12's lesson): a previous process may have
    # left the managed location while this catalog has no entry
    warehouse = _urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    for tbl in (f"{prefix}_centroids", f"{prefix}_postings"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _sh.rmtree(_os.path.join(warehouse, tbl), ignore_errors=True)

    model, _ = mllib_fit(
        corpus, k=IVF_NLIST, array_col="v", max_iter=10, seed=IVF_SEED
    )
    centers = [c.tolist() for c in model.clusterCenters()]
    spark.createDataFrame(
        list(enumerate(centers)), "cell int, center array<double>"
    ).write.mode("overwrite").saveAsTable(f"{prefix}_centroids")

    assign = _cell_probe_udf(centers, 1)
    postings = (
        spread(corpus)
        .withColumn("cell", assign(F.col("v"))[0])
        .withColumn("nrm", vector_norm(F.col("v")))
        .select("cell", "vec_id", "v", "nrm")
    )
    write_bucketed(
        postings, f"{prefix}_postings", ("cell",), S7_BUCKETS,
        sort_cols=("cell",),
    )


def ivf_search_persisted(
    spark: SparkSession,
    queries: DataFrame,
    k: int = TOPK_K,
    nprobe: int = IVF_NPROBE,
    prefix: str = "s7",
    broadcast_probe: bool = True,
) -> DataFrame:
    """Serve path: load the SAVED codebook (nlist rows — a driver-side
    scalar read, not data-sized) and probe the bucketed postings. No
    fit, no corpus write, no corpus shuffle: with the default broadcast
    probe the postings are scanned in place; with
    ``broadcast_probe=False`` (a query set too big to broadcast) the
    merge join reads co-located buckets on the corpus side and only the
    probe side is exchanged — either way the corpus never moves."""
    centers = [
        r.center
        for r in spark.table(f"{prefix}_centroids").orderBy("cell").collect()
    ]
    probe = _cell_probe_udf(centers, nprobe)
    c = spark.table(f"{prefix}_postings")
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            vector_norm(F.col("v")).alias("qnrm"),
        )
        .withColumn("cell", F.explode(probe(F.col("qv"))))
    )
    joined = (
        c.join(F.broadcast(q), "cell")
        if broadcast_probe
        else c.join(q.hint("merge"), "cell")
    )
    scored = joined.filter(F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


@query("s7_persisted_ivf_topk")
def s7_persisted_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k through the PERSISTED IVF index: build runs once per
    corpus (staged), every call after that is serve-only. Same seeded
    quantizer parameters as s3, so the output must EQUAL s3's exactly
    (pinned in tests/test_similarity.py) and shares its golden hash
    at sf0.001; rows-only for the driver (the k-means fit in the build
    phase is not SQL-expressible)."""
    e = ensure_staged_s7(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return ivf_search_persisted(spark, q).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# S8 — persisted IVF-PQ hybrid index: s7's build-once/serve-many
# discipline applied to the FULL production ANN stack: coarse IVF cells restrict
# the scan, PQ codes make the scanned payload 4 bits/subspace, exact
# rerank restores precision on the candidate set — and every artifact
# (coarse codebook, PQ codebooks, cell-bucketed code table, postings)
# is a catalog table written once at ingest.
# --------------------------------------------------------------------------


def build_ivf_pq_index(corpus: DataFrame, prefix: str = "s8") -> None:
    """Extend ``build_ivf_index`` with the PQ artifacts: per-subspace
    codebooks trained on the same deterministic head sample s5 uses
    (persisted as ``{prefix}_pq_books`` rows), and the corpus encoded
    to 4-bit code arrays stored cell-BUCKETED as ``{prefix}_codes`` —
    the table the serve path scans (S ints/vector instead of the full
    vector). The only fits anywhere are here."""
    import numpy as np

    from k_means_clustering_via_map_reduce_spark.sources.sinks import (
        write_bucketed,
    )

    import os as _os
    import shutil as _sh
    from urllib.parse import urlparse as _urlparse

    spark = corpus.sparkSession
    build_ivf_index(corpus, prefix)

    # stale-location guard (f12's lesson) for the two PQ tables — a
    # PREVIOUS process may have left the managed location while this
    # catalog has no entry
    warehouse = _urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    for tbl in (f"{prefix}_pq_books", f"{prefix}_codes"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _sh.rmtree(_os.path.join(warehouse, tbl), ignore_errors=True)

    sample = (
        corpus.orderBy("vec_id").limit(PQ_TRAIN_SAMPLE).select("v").toPandas()
    )
    books = _pq_codebooks(np.vstack(sample["v"].to_numpy()).astype(np.float64))
    rows = [
        (s, j, [float(x) for x in books[s][j]])
        for s in range(len(books))
        for j in range(len(books[s]))
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, center array<double>"
    ).write.mode("overwrite").saveAsTable(f"{prefix}_pq_books")

    codes = (
        spark.table(f"{prefix}_postings")
        .select(
            "cell", "vec_id", _pq_encode_udf(books)(F.col("v")).alias("codes")
        )
    )
    write_bucketed(
        codes, f"{prefix}_codes", ("cell",), S7_BUCKETS, sort_cols=("cell",)
    )


def ivf_pq_search_persisted(
    spark: SparkSession,
    queries: DataFrame,
    k: int = TOPK_K,
    nprobe: int = IVF_NPROBE,
    prefix: str = "s8",
    cand_factor: int = PQ_CAND_FACTOR,
) -> DataFrame:
    """Serve path: coarse-probe the saved centroids, ADC-score ONLY the
    code rows in probed cells, exact-rerank the top candidates against
    the saved postings. Loads three tables, fits nothing.

    Scale plan: the scan side is the CODE table restricted to the
    UNION of probed cells (bucket pruning on the saved layout); the
    per-query cell restriction rides the scorer's passthrough cell
    column into a broadcast semi-join on (query_id, cell) — the corpus
    is never re-joined for metadata. Candidates (queries × C scalar
    rows) broadcast into the postings rerank, so the full vectors are
    read only for candidate ids. Ties break by vec_id at both ranking
    levels — partitioning-independent end to end."""
    import numpy as np

    # cand_factor is the serve-time recall knob: the ADC candidate pool
    # is k*cand_factor per query, and a FIXED pool decays in recall as
    # the corpus grows (the s5 lesson) — scale it with corpus growth.
    # Measured in BASELINE.md's round-7 serve-knob sweep.
    n_cand = k * cand_factor
    centers = np.asarray(
        [
            r.center
            for r in spark.table(f"{prefix}_centroids")
            .orderBy("cell")
            .collect()
        ]
    )
    brows = spark.table(f"{prefix}_pq_books").orderBy(
        "subspace", "code"
    ).collect()
    s_n = 1 + max(r.subspace for r in brows)
    k_n = 1 + max(r.code for r in brows)
    books = [
        [None] * k_n for _ in range(s_n)
    ]
    for r in brows:
        books[r.subspace][r.code] = list(r.center)

    q_rows = [
        (r["vec_id"], r["v"])
        for r in queries.select("vec_id", "v").orderBy("vec_id").collect()
    ]
    q_mat = np.vstack([v for _, v in q_rows]).astype(np.float64)
    c_sq = (centers * centers).sum(axis=1)
    d = c_sq[None, :] - 2.0 * (q_mat @ centers.T)
    probed = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
    pairs = [
        (int(q_rows[i][0]), int(c))
        for i in range(len(q_rows))
        for c in probed[i]
    ]
    pairs_df = spark.createDataFrame(pairs, "query_id bigint, cell int")
    cells_df = pairs_df.select("cell").distinct()

    codes = spark.table(f"{prefix}_codes").join(
        F.broadcast(cells_df), "cell", "left_semi"
    )
    scored = (
        _pq_adc_scores(codes, q_rows, books, passthrough=("cell",))
        .join(F.broadcast(pairs_df), ["query_id", "cell"], "left_semi")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= n_cand)
        .select("query_id", "vec_id")
    )
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in q_rows],
        "query_id bigint, qv array<double>",
    ).withColumn("qnrm", vector_norm(F.col("qv")))
    rerank = (
        spark.table(f"{prefix}_postings")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


_S8_STAGED: dict = {}


@query("s8_ivfpq_persisted_topk")
def s8_ivfpq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: top-k through the PERSISTED IVF-PQ hybrid — the full
    production ANN serving stack from saved artifacts: coarse cells
    restrict the scan, 4-bit PQ codes make the scanned payload tiny,
    exact rerank restores precision on the candidate set. Build runs
    once per corpus (staged); every call after that loads the three
    catalog tables and fits NOTHING (both fit entrypoints exploded
    under monkeypatch in tests/test_ivfpq_persisted.py, which also
    pins recall vs brute force, probed-cell containment, and
    determinism). Rows-only for the driver (seeded k-means + PQ
    codebooks are not SQL-expressible); the full canonical output is
    golden-hash pinned at sf0.001 in tests/test_golden_hashes.py.

    Scale: the serve scan is the cell-bucketed code table pruned to
    the union of probed cells; per-query cell restriction and the
    candidate set ride broadcast semi-joins; full vectors are read
    only for candidate ids in the rerank. The corpus never re-shuffles
    after the one-time build."""
    e = ensure_staged_s8(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return ivf_pq_search_persisted(spark, q).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# S9 — RADIUS (threshold) similarity search (round-9 surface,
# library-first per the new-entry budget pacing; the @query
# registration is one decorator away). The query face the top-k family
# (s1/s2/s3/s5/s7/s8) cannot express: "everything within cosine >= R
# of each query" has an UNBOUNDED per-query result set — the
# dedup-candidate / retrieval-recall primitive where the caller needs
# ALL matches, not the best k. Exact truth arm (the s1 discipline):
# broadcast the query set, one dot + divide per pair, filter — no
# window, no rank, so the plan is a pure narrow map over the corpus.
#
# Scale: the broadcast-probe scan is embarrassingly parallel and the
# output is result-sized; the IVF-pruned serving variant (probe only
# cells whose centroid can still beat R — s3's machinery with a radius
# bound instead of a candidate count) is the registered round-9 work,
# to be measured against this arm for recall exactly as s3 vs s1.
# --------------------------------------------------------------------------
S9_RADIUS = 0.3
S9_N_QUERIES = 10

S9_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id < {S9_N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qv, e.v)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(e.v, e.v))) AS cos
      FROM q JOIN e ON e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim
    FROM scored WHERE cos >= {S9_RADIUS}
    ORDER BY query_id, neighbor_id
"""


@query("s9_radius_search", oracle=S9_ORACLE)
def s9_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: every (query, neighbor) pair within cosine >= 0.3 of the
    first-{n} query set, exact. Same FP operation order as the oracle
    (per-side norms precomputed, one dot + one divide per pair), so the
    unrounded threshold compare agrees bit-for-bit; the output rounds
    to 4 decimals only for display."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < S9_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    c = spread(e).withColumn("nrm", vector_norm(F.col("v")))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cos", dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
        )
        .filter(F.col("cos") >= S9_RADIUS)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            r4(F.col("cos")).alias("cos_sim"),
        )
        .orderBy("query_id", "neighbor_id")
    )


# --------------------------------------------------------------------------
# S9b — IVF-pruned radius search, EXACT (round-9 surface, library-first).
# s9's brute arm scans |corpus| per query; this serves the same radius
# query probing only the cells that can possibly contain a match, with
# NO recall loss — unlike the top-k IVF (s3), whose nprobe knob trades
# recall, the radius form admits an exact prune from per-cell geometry:
#
#   Build records each cell's angular RADIUS rad(c) = max angle between
#   a member and its centroid. By the spherical triangle inequality,
#   every member x of c has angle(q, x) >= angle(q, c) - rad(c); so if
#   angle(q, c) - rad(c) > acos(R), NO member of c can reach cosine R,
#   and the cell is pruned EXACTLY (an ulp slack keeps float acos from
#   ever over-pruning; extra probing is correctness-free).
#
# Scale: centroids + radii are a K-row broadcast; the per-query probe
# list is a K-row driver-free computation; the search joins corpus to
# (query, cell) pairs on cell id — per-query work is the member count
# of the admissible cells, and the corpus never shuffles. Tight
# queries (high R) probe 1-2 cells; a query near a cell boundary pays
# exactly the cells geometry demands, never a recall cut.
#
# Honest geometry note (pinned in tests/test_similarity.py): the prune
# only BITES on clusterable data. The fixture embeddings are
# near-isotropic (pairwise cosine mean ~0 in 64-d), so cell radii
# approach 90 degrees and every cell stays admissible at R=0.3 — the
# bound is exact but vacuous there; on 8 tight synthetic clusters it
# prunes >=half the (query, cell) grid with zero loss. This is the
# fundamental IVF premise (FAISS's too): coarse quantization buys
# nothing on isotropic noise.
# --------------------------------------------------------------------------
S9B_EPS = 1e-9


def _cosine_assign_udf(centers):
    """Per-vector (cell id, angle-to-centroid) under COSINE assignment —
    the angular-metric counterpart of _cell_probe_udf, so cell radii
    and the probe bound live in one geometry."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centers, dtype=np.float64)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)

    @pandas_udf("struct<cell: int, angle: double>")
    def assign(vs: pd.Series) -> pd.DataFrame:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = np.clip(mat @ c.T, -1.0, 1.0)  # (n, K)
        best = cos.argmax(axis=1)
        ang = np.arccos(cos[np.arange(len(mat)), best])
        return pd.DataFrame({"cell": best.astype("int32"), "angle": ang})

    # r13 optimization round: the duplicated ArrowEvalPython nodes in
    # the cell-join plans (join-key isnotnull constraints pushed below
    # this projection re-evaluate the UDF per side — guide §4.4) were
    # A/B-tested against BOTH remedies twice under different host
    # conditions. asNondeterministic() loses everywhere (s9b 1.75 s →
    # 4.9 s — the fence blocks the surrounding filter/prune
    # optimizations too) and stays out. The lazy localCheckpoint of the
    # assigned frame lost under the first window (s10 3.0→5.0 s) but
    # WON decisively when re-measured (27.0→9.9 s first-use, 6.7→3.8 s
    # warmed, every interleaved round) — it is now applied inside
    # _cell_pruned_selfjoin (s10/s12, three consumers). s9b keeps the
    # re-evaluating form: only two consumers, and its measured isolate
    # (2.4 s) sits at the fixed-cost floor. See OPTIMIZATION_r13.md.
    return assign


def radius_search_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    radius: float = S9_RADIUS,
    nlist: int = IVF_NLIST,
    centers: list | None = None,
) -> DataFrame:
    """Exact radius search through cell pruning; returns the SAME rows
    as the brute s9 arm plus a probe ledger pytest reads.

    ``centers`` lets the caller serve from a persisted coarse codebook
    (the s7 index) instead of refitting — the bound is exact under ANY
    centers, so a stale or shared codebook costs probes, never rows."""
    import math

    if centers is None:
        from k_means_clustering_via_map_reduce_spark.kmeans import mllib_fit

        model, _ = mllib_fit(
            corpus, k=nlist, array_col="v", max_iter=10, seed=IVF_SEED
        )
        centers = [ctr.tolist() for ctr in model.clusterCenters()]
    assign = _cosine_assign_udf(centers)

    c = (
        spread(corpus)
        .withColumn("a", assign(F.col("v")))
        .select(
            "vec_id",
            "v",
            F.col("a.cell").alias("cell"),
            F.col("a.angle").alias("angle"),
        )
        .withColumn("nrm", vector_norm(F.col("v")))
    )
    rads = {
        r["cell"]: r["rad"]
        for r in c.groupBy("cell").agg(F.max("angle").alias("rad")).collect()
    }
    limit = math.acos(max(min(radius, 1.0), -1.0))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    # per-query admissible cells: angle(q, centroid) <= acos(R) + rad(c)
    import numpy as np

    centers_arr = np.asarray(centers, dtype=np.float64)
    centers_arr = centers_arr / np.linalg.norm(
        centers_arr, axis=1, keepdims=True
    )
    q_rows = q.collect()  # query set is dim-sized by contract (s1/s9)
    probe_pairs = []
    for row in q_rows:
        qv = np.asarray(row["qv"], dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        ang = np.arccos(np.clip(centers_arr @ qv, -1.0, 1.0))
        for cell, a in enumerate(ang):
            if cell in rads and a <= limit + rads[cell] + S9B_EPS:
                probe_pairs.append((int(row["query_id"]), cell))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(
        probe_pairs, "query_id BIGINT, cell INT"
    )
    qp = q.join(F.broadcast(probes), "query_id")
    matched = (
        c.join(F.broadcast(qp), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cos",
            dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")),
        )
        .filter(F.col("cos") >= radius)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            r4(F.col("cos")).alias("cos_sim"),
        )
        .orderBy("query_id", "neighbor_id")
    )
    matched._kmce_probes = len(probe_pairs)  # pytest ledger
    matched._kmce_total = len(q_rows) * len(rads)
    return matched


@query("s9b_radius_search_ivf", oracle=S9_ORACLE)
def s9b_radius_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b: the IVF-pruned radius search over the fixture embeddings.
    The prune is EXACT (spherical triangle inequality with an ulp of
    slack — extra probing is correctness-free, under-probing
    impossible), so this serves the SAME oracle as the brute s9 arm at
    every scale and any clustering: registration reuses S9_ORACLE
    verbatim. Serves from the s7 persisted codebook (built here if
    absent — one seeded fit per process shared across s7/s9b, never a
    per-query refit).

    Scale: centroids + per-cell radii are a K-row broadcast; per-query
    admissible cells are a K-row driver computation; the search joins
    corpus to (query, cell) pairs on cell id — per-query work is the
    member mass of admissible cells, and on clusterable corpora (the
    IVF premise, measured honestly in tests/test_similarity.py and
    BASELINE.md §r8 s9b) that is a small fraction of the table."""
    e = ensure_staged_s7(spark, sf_dir)
    centers = [
        r.center
        for r in spark.table("s7_centroids").orderBy("cell").collect()
    ]
    q = e.filter(F.col("vec_id") < S9_N_QUERIES)
    return radius_search_ivf(e, q, centers=centers)


# --------------------------------------------------------------------------
# S10 — cosine radius SELF-JOIN neighbor profile (round-11 surface,
# library-first; the @query registration is one decorator away). The
# corpus-vs-corpus face of s9: for EVERY vector, how many neighbors
# lie within cosine >= R, with the strongest/weakest neighbor
# similarity — the semantic-dedup candidate census (d6's question) and
# the density signal cluster-quality checks read. The prune is the
# s9b spherical triangle inequality applied on BOTH sides: members of
# cells (a, b) can only pair within R if
# angle(centroid_a, centroid_b) <= acos(R) + rad_a + rad_b, so the
# admissible cell-pair grid is a K^2 driver-side numpy computation and
# the join touches only admissible pairs — EXACT under any clustering,
# so the oracle is the brute all-pairs replay at every scale.
#
# Per-vector summaries use count/max/min only (addition-order-free),
# so the hash cannot hang on float summation order.
#
# Scale: postings join postings through a broadcast K^2 pair table,
# shuffling on the cell key once (the s7 bucketed layout serves it
# shuffle-free); per-vector fan-out is the mass of admissible cells —
# on clusterable corpora (the IVF premise, measured in
# tests/test_similarity.py) a small fraction of N, and the profile
# output is exactly N rows whatever the pair count.
# --------------------------------------------------------------------------
S10_RADIUS = 0.3

S10_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (
      SELECT a.vec_id AS va,
             list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM e a JOIN e b ON a.vec_id != b.vec_id),
    n AS (
      SELECT va AS vec_id, count(*) AS n_neighbors,
             round(max(cos), 4) AS max_cos,
             round(min(cos), 4) AS min_cos
      FROM p WHERE cos >= {S10_RADIUS} GROUP BY va)
    SELECT e.vec_id,
           CAST(coalesce(n.n_neighbors, 0) AS BIGINT) AS n_neighbors,
           n.max_cos, n.min_cos
    FROM e LEFT JOIN n USING (vec_id) ORDER BY e.vec_id
"""


def _cell_pruned_selfjoin(
    corpus: DataFrame, centers: list, radius: float
) -> tuple[DataFrame, int, int]:
    """(va, vb, cos) pairs with cos >= radius, exact through the
    two-sided spherical cell prune; returns (pairs, n_admissible_pairs,
    n_grid) for the pytest prune ledgers. Shared by s10's census and
    s12's nearest-neighbor argmax."""
    import math

    import numpy as np

    assign = _cosine_assign_udf(centers)
    c = (
        spread(corpus)
        .withColumn("a", assign(F.col("v")))
        .select(
            "vec_id",
            "v",
            F.col("a.cell").alias("cell"),
            F.col("a.angle").alias("angle"),
        )
        .withColumn("nrm", vector_norm(F.col("v")))
        # Three consumers read this frame (the radii collect below and
        # BOTH sides of the cell self-join), each re-running the scan +
        # assign UDF; the lazy checkpoint runs that pass once. Re-tested
        # this round against the re-evaluating form with interleaved
        # A/B rounds: the checkpoint won every round (27.0→9.9 s
        # first-use, 6.7→3.8 s warmed) — see OPTIMIZATION_r13.md §s10;
        # re-proven for s12 in r14 (first-use 5.7→4.1 s, ADVICE r13).
        # Costs to know (ADVICE r13): (1) each construction pins one
        # copy of the assigned vector frame in executor-local block
        # storage until the session ends — callers looping this in one
        # long-lived session should unpersist via the returned frame's
        # rdd after their action; (2) localCheckpoint is NON-replicated
        # and truncates lineage, so on a distributed deployment an
        # executor loss mid-query fails the job instead of recomputing
        # (acceptable here: one cheap narrow pass rebuilds it on retry;
        # use reliable checkpoint/DISK_ONLY persist when running
        # non-local with preemptible executors).
        .localCheckpoint(eager=False)
    )
    rads = {
        r["cell"]: r["rad"]
        for r in c.groupBy("cell").agg(F.max("angle").alias("rad")).collect()
    }
    limit = math.acos(max(min(radius, 1.0), -1.0))
    cn = np.asarray(centers, dtype=np.float64)
    cn = cn / np.linalg.norm(cn, axis=1, keepdims=True)
    ang = np.arccos(np.clip(cn @ cn.T, -1.0, 1.0))
    cells = sorted(rads)
    pairs = [
        (int(ca), int(cb))
        for ca in cells
        for cb in cells
        if ang[ca, cb] <= limit + rads[ca] + rads[cb] + S9B_EPS
    ]
    spark = corpus.sparkSession
    pairs_df = spark.createDataFrame(pairs, "cell_a INT, cell_b INT")
    a = c.select(
        F.col("vec_id").alias("va"),
        F.col("v").alias("av"),
        F.col("nrm").alias("anrm"),
        F.col("cell").alias("cell_a"),
    )
    b = c.select(
        F.col("vec_id").alias("vb"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
        F.col("cell").alias("cell_b"),
    )
    matched = (
        a.join(F.broadcast(pairs_df), "cell_a")
        .join(b, "cell_b")
        .filter(F.col("va") != F.col("vb"))
        .withColumn(
            "cos",
            dot(F.col("av"), F.col("bv"))
            / (F.col("anrm") * F.col("bnrm")),
        )
        .filter(F.col("cos") >= radius)
        .select("va", "vb", "cos")
    )
    return matched, len(pairs), len(cells) * len(cells)


def radius_selfjoin_profile(
    corpus: DataFrame,
    centers: list,
    radius: float = S10_RADIUS,
) -> DataFrame:
    """Per-vector radius-neighbor profile through the two-sided cell
    prune. ``centers`` is any coarse codebook (shared with s7/s9b);
    exactness never depends on it."""
    matched, n_pairs, n_grid = _cell_pruned_selfjoin(
        corpus, centers, radius
    )
    prof = matched.groupBy("va").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        r4(F.max("cos")).alias("max_cos"),
        r4(F.min("cos")).alias("min_cos"),
    )
    base = corpus.select("vec_id")
    out = (
        base.join(prof, base["vec_id"] == prof["va"], "left")
        .select(
            "vec_id",
            F.coalesce(F.col("n_neighbors"), F.lit(0))
            .cast("bigint")
            .alias("n_neighbors"),
            "max_cos",
            "min_cos",
        )
        .orderBy("vec_id")
    )
    out._kmce_cell_pairs = n_pairs  # pytest prune ledger
    out._kmce_cell_grid = n_grid
    return out


@query("s10_radius_selfjoin_profile", oracle=S10_ORACLE)
def s10_radius_selfjoin_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S10: every vector's radius-0.3 neighbor census, exact through
    the two-sided cell prune — a one-sided bound (missing rad_b), a
    dropped isolated vector, or a self-pair leak flips the hash.
    Serves from the s7 persisted codebook (built here if absent — the
    s9b discipline, one seeded fit per process)."""
    e = ensure_staged_s7(spark, sf_dir)
    centers = [
        r.center
        for r in spark.table("s7_centroids").orderBy("cell").collect()
    ]
    return radius_selfjoin_profile(e, centers)


# --------------------------------------------------------------------------
# S11 — exact MAXIMUM-INNER-PRODUCT top-k (MIPS): rank by the inner
# product of the query against POPULARITY-SCALED item vectors, NOT by
# cosine. The retrieval scoring recommender and two-tower models
# actually serve: the item's scalar prior (popularity, freshness, CTR
# calibration) lives in its vector's NORM, so ranking = prior × cosine
# and differs from cosine whenever priors vary. The fixture embeddings
# are unit-norm, so the prior is attached explicitly — a deterministic
# quarter-step weight 1 + (vec_id % 7) / 4 (exact binary fractions:
# the scale multiply is a single exact-input IEEE op in both engines).
# MIPS has no triangle inequality; the s3/s5 index path applies only
# after norm augmentation, for which this exact form is the oracle.
#
# Determinism: score = weight * dot(q, v) — one dot in the oracle's
# operand order, one multiply; ties to the lower neighbor id; the
# ranking key is the raw double, 4-dp rounding touches display only.
#
# Scale: identical to s1 — broadcast the query side, scan the corpus
# once, per-query top-k via window; no corpus shuffle.
# --------------------------------------------------------------------------
S11_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      1 + (vec_id % 7) / 4.0 AS wt
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {TOPK_N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             e.wt * list_dot_product(q.qv, e.v) AS ip,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY e.wt * list_dot_product(q.qv, e.v) DESC,
                        e.vec_id ASC) AS rank
      FROM q JOIN e ON e.vec_id != q.query_id
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           round(ip, 4) AS inner_product
    FROM scored WHERE rank <= {TOPK_K}
    ORDER BY query_id, rank
"""


@query("s11_mips_topk", oracle=S11_ORACLE)
def s11_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: exact popularity-scaled inner-product top-5 for the first
    20 vectors — a normalization sneaking in (MIPS order must differ
    from s1's cosine order; pinned in tests), a prior applied to the
    query side, a self-match, or an unstable tie flips the hash."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (1 + (F.col("vec_id") % 7) / 4.0).alias("wt"),
    )
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = spread(e).join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.col("wt") * dot(F.col("qv"), F.col("v"))).alias("ip"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ip").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK_K)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("ip")).alias("inner_product"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# S12 — EXACT global 1-NN self-join (round-10 wave 4): every vector's
# single nearest neighbor by cosine, with its label agreement — THE
# semantic-dedup primitive (a near-duplicate is a 1-NN above
# threshold) and the standard embedding-quality probe (1-NN label
# agreement ≈ k-NN classifier accuracy at k=1). Exactness strategy:
# the s10 two-sided cell prune at a radius every vector's true 1-NN
# provably clears — the argmax inside the radius-R neighborhood IS
# the global argmax whenever each vector has ≥1 neighbor at cos >= R,
# and the query VERIFIES that coverage at run time and raises loudly
# rather than return a silently-approximate neighbor (measured
# min-over-vectors max-cos: 0.268 @ sf0.01, 0.282 @ sf0.001,
# 0.329 @ sf0.1 — all above R=0.25).
#
# Determinism: cos = fold-ordered dot / (norm_a * norm_b), the exact
# operand order DuckDB's list_dot_product uses, so the ranking key is
# bit-identical across engines; ties break to the lower neighbor id.
#
# Scale: pair generation touches only admissible cell pairs (the s7
# bucketed layout serves the join shuffle-free); the argmax is one
# window over the pruned pairs, output exactly N rows. On corpora
# where coverage at a fixed R fails, the production fallback is
# radius doubling per uncovered stratum — the guard names them.
# --------------------------------------------------------------------------
S12_RADIUS = 0.25

S12_ORACLE = """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS la, b.label AS lb,
             list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM e a JOIN e b ON a.vec_id != b.vec_id),
    r AS (
      SELECT va, vb, la, lb, cos,
             row_number() OVER (PARTITION BY va
                                ORDER BY cos DESC, vb ASC) AS rn
      FROM p)
    SELECT va AS vec_id, vb AS nn_id, round(cos, 4) AS nn_cos,
           CAST(CASE WHEN la = lb THEN 1 ELSE 0 END AS BIGINT)
             AS same_label
    FROM r WHERE rn = 1 ORDER BY vec_id
"""


def nearest_neighbor_profile(
    corpus: DataFrame, centers: list, radius: float = S12_RADIUS
) -> DataFrame:
    """Exact 1-NN per vector through the cell prune, with the runtime
    coverage guard that makes the radius-bounded argmax provably
    global. ``corpus``: (vec_id, v, label)."""
    matched, n_pairs, n_grid = _cell_pruned_selfjoin(
        corpus.select("vec_id", "v"), centers, radius
    )
    w = Window.partitionBy("va").orderBy(
        F.col("cos").desc(), F.col("vb").asc()
    )
    nn = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("va", "vb", "cos")
        .localCheckpoint(eager=True)
    )
    n_corpus = corpus.count()
    n_covered = nn.count()
    if n_covered != n_corpus:
        missing = (
            corpus.select("vec_id")
            .join(nn, corpus["vec_id"] == nn["va"], "left_anti")
            .limit(5)
            .collect()
        )
        raise AssertionError(
            f"s12 coverage guard: {n_corpus - n_covered} vector(s) have "
            f"no neighbor at cos >= {radius} — the radius-bounded argmax "
            f"is not provably global (e.g. {[r['vec_id'] for r in missing]}); "
            "raise the radius or fall back to per-stratum doubling"
        )
    labels = corpus.select("vec_id", "label")
    la = labels.select(
        F.col("vec_id").alias("va"), F.col("label").alias("la")
    )
    lb = labels.select(
        F.col("vec_id").alias("vb"), F.col("label").alias("lb")
    )
    out = (
        nn.join(la, "va")
        .join(lb, "vb")
        .select(
            F.col("va").alias("vec_id"),
            F.col("vb").alias("nn_id"),
            r4(F.col("cos")).alias("nn_cos"),
            F.when(F.col("la") == F.col("lb"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("same_label"),
        )
        .orderBy("vec_id")
    )
    out._kmce_cell_pairs = n_pairs
    out._kmce_cell_grid = n_grid
    return out


@query("s12_global_1nn", oracle=S12_ORACLE)
def s12_global_1nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: every vector's exact nearest neighbor and label agreement —
    a prune that loses the true 1-NN, an unstable float tie, a
    self-match leak, or a coverage hole (guarded, loud) flips it.
    Serves from the s7 persisted codebook (one seeded fit per
    process)."""
    ensure_staged_s7(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    centers = [
        r.center
        for r in spark.table("s7_centroids").orderBy("cell").collect()
    ]
    return nearest_neighbor_profile(e, centers)


# --------------------------------------------------------------------------
# S13 — EXACT top-k via cell-bound pruning (round-12 surface,
# library-first; the @query registration is one decorator away). s1 is
# exact but scans every (query, vector) pair; s3/s5 prune but are
# approximate. S13 is the third point of the design space: EXACT
# results with most of the corpus pruned — the production shape for
# "exact retrieval over a 100 TB embedding store" (FAISS IVF with
# exact bounds / Branch-and-bound NN search).
#
# Bound: for unit query u = q/|q|, any x in cell C with centroid c and
# residual radius r = max |x - c| satisfies
#     dot(u, x) <= dot(u, c) + r          (Cauchy-Schwarz on x - c)
# so  cos(q, x) <= (dot(u,c) + r) / min_norm(C)   when numerator > 0
#     cos(q, x) <= (dot(u,c) + r) / max_norm(C)   otherwise.
# Phase A exact-scores each query's top-NPROBE cells by bound and
# takes tau = its kth-best candidate; phase B exact-scores only the
# remaining cells whose bound clears tau (minus a float-slack epsilon,
# which can only UNprune). A pruned cell provably contains no vector
# that could enter the top-k, so the merged result equals s1's —
# byte-for-byte, same oracle SQL, full hash check.
#
# Scale shape: cell stats are nlist rows; (query x cell) bounds are
# Q x nlist rows — both broadcast. The corpus is scanned via equi-join
# on cell id in both phases, never shuffled, never crossed with more
# than the broadcast query side; per-query work is |probed cells| +
# |bound-cleared cells| instead of |corpus|.
# --------------------------------------------------------------------------
S13_SLACK = 1e-6

S13_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {TOPK_N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qv, e.v)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(e.v, e.v))) AS cos,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_dot_product(q.qv, e.v)
                        / (sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(e.v, e.v))) DESC,
                        e.vec_id ASC) AS rank
      FROM q JOIN e ON e.vec_id != q.query_id
    )
    SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos_sim
    FROM scored WHERE rank <= {TOPK_K}
    ORDER BY query_id, rank
"""


def norm_pruned_exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOPK_K,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    centers: list | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """EXACT cosine top-k with cell-bound pruning (see the S13 block
    comment for the bound derivation and scale shape).

    ``centers`` lets the caller serve from a PERSISTED coarse codebook
    (the s7/s12 build/serve split) — the result is exact for ANY cell
    assignment (the bound holds per cell regardless of how cells were
    chosen; only the pruning RATE depends on codebook quality), so
    sharing s7's codebook changes cost, never the hash."""
    from k_means_clustering_via_map_reduce_spark.functions.vector import (
        euclidean_distance_cols,
    )

    spark = corpus.sparkSession
    if centers is None:
        from k_means_clustering_via_map_reduce_spark.kmeans import mllib_fit

        model, _ = mllib_fit(
            corpus, k=nlist, array_col="v", max_iter=10, seed=IVF_SEED
        )
        centers = [ctr.tolist() for ctr in model.clusterCenters()]
    if assigned is not None:
        # pre-assigned (cell, vec_id, v, nrm) postings — s7's bucketed
        # table: both phase joins read co-located buckets, the corpus
        # is never re-assigned or shuffled per query
        c = assigned
    else:
        assign = _cell_probe_udf(centers, 1)
        c = (
            spread(corpus)
            .withColumn("cell", assign(F.col("v"))[0])
            .withColumn("nrm", vector_norm(F.col("v")))
        )
    cells_df = spark.createDataFrame(
        [(i, centers[i]) for i in range(len(centers))],
        "cell INT, ctr ARRAY<DOUBLE>",
    )
    stats = (
        c.join(F.broadcast(cells_df), "cell")
        .select(
            "cell",
            euclidean_distance_cols(F.col("v"), F.col("ctr")).alias("resid"),
            "nrm",
        )
        .groupBy("cell")
        .agg(
            F.max("resid").alias("r"),
            F.min("nrm").alias("mn"),
            F.max("nrm").alias("mx"),
        )
        .join(F.broadcast(cells_df), "cell")
    )

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        vector_norm(F.col("v")).alias("qnrm"),
    )
    # (query x cell) upper bounds: Q x nlist rows, all metadata-sized
    num = dot(F.col("qv"), F.col("ctr")) / F.col("qnrm") + F.col("r")
    bounds = (
        q.crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "cell",
            F.when(num > 0, num / F.col("mn"))
            .otherwise(num / F.col("mx"))
            .alias("ub"),
        )
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("ub").desc(), F.col("cell").asc()
    )
    ranked = bounds.withColumn("cr", F.row_number().over(wb))
    probe = ranked.filter(F.col("cr") <= nprobe).select(
        "query_id", "cell"
    )
    rest = ranked.filter(F.col("cr") > nprobe).select(
        "query_id", "cell", "ub"
    )

    def _exact(cand_cells: DataFrame) -> DataFrame:
        qc = cand_cells.join(F.broadcast(q), "query_id")
        return (
            c.join(F.broadcast(qc), "cell")
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (
                    dot(F.col("qv"), F.col("v"))
                    / (F.col("qnrm") * F.col("nrm"))
                ).alias("cos_sim"),
            )
        )

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    phase_a = _exact(probe)
    # tau = the kth-best phase-A score per query (-inf when < k found):
    # Q rows, broadcast back onto the remaining cells' bounds
    tau = (
        phase_a.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == k)
        .select("query_id", F.col("cos_sim").alias("tau"))
    )
    survivors = (
        rest.join(F.broadcast(tau), "query_id", "left")
        .filter(
            F.col("tau").isNull()
            | (F.col("ub") >= F.col("tau") - F.lit(S13_SLACK))
        )
        .select("query_id", "cell")
    )
    merged = phase_a.unionByName(_exact(survivors))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            r4(F.col("cos_sim")).alias("cos_sim"),
        )
    )


@query("s13_exact_pruned_topk", oracle=S13_ORACLE)
def s13_exact_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 (registered r12): exact top-k equal to s1 with cell-bound pruning —
    an invalid bound, a dropped boundary tie, or a probe/survivor
    overlap duplicate flips the hash against the s1 oracle. Serves
    from the s7 persisted codebook (one seeded fit per process, the
    s12 pattern); exactness is codebook-independent."""
    e = ensure_staged_s7(spark, sf_dir)
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES)
    centers = [
        r.center
        for r in spark.table("s7_centroids").orderBy("cell").collect()
    ]
    return norm_pruned_exact_topk(
        e, q, centers=centers, assigned=spark.table("s7_postings")
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# S14 — nearest-centroid assignment census (round-14 surface,
# library-first; the @query registration is one decorator away). The
# semantic-labeling verb: s4's exact per-label centroids become a
# classifier — every vector is assigned to its nearest centroid by
# squared euclidean distance (O6 argmin semantics: ties -> lowest
# label) and the (true label, assigned label) confusion census comes
# back with per-cell counts. Centroids are ROUNDED to 4 decimals
# before the distance (both engines compute the identical r4 values —
# s4's driver hash proves it every round), so the argmin key is
# engine-exact up to genuine float near-ties the synthetic clusters
# don't produce (d6's measured-gap discipline).
#
# Scale: the centroid table is (labels x dim) scalars — a broadcast;
# the assignment is one narrow pass over the corpus (no shuffle until
# the census aggregate); the census is labels² rows.
# --------------------------------------------------------------------------
S14_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    cent AS (
      SELECT label AS c_label, i AS pos,
             round(avg(v[i + 1]), 4) AS c_val
      FROM e, range(0, {EMBEDDING_DIM}) t(i)
      GROUP BY label, i),
    dists AS (
      SELECT e.vec_id, e.label, c.c_label,
             sum((e.v[c.pos + 1] - c.c_val) * (e.v[c.pos + 1] - c.c_val))
               AS d2
      FROM e, cent c
      GROUP BY e.vec_id, e.label, c.c_label),
    assigned AS (
      SELECT vec_id, label,
             (array_agg(c_label ORDER BY d2, c_label))[1] AS assigned
      FROM dists GROUP BY vec_id, label)
    SELECT label AS true_label, assigned AS assigned_label,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM assigned GROUP BY label, assigned
    ORDER BY true_label, assigned_label
"""


def nearest_centroid_census(e: DataFrame) -> DataFrame:
    """(true_label, assigned_label, n_vecs) over a (vec_id, label, v)
    frame: assign every vector to the nearest r4-rounded label
    centroid, ties to the lowest label."""
    from pyspark.sql.window import Window

    cent = (
        e.select(
            "label",
            F.posexplode(F.col("v")).alias("pos", "val"),
        )
        .groupBy(F.col("label").alias("c_label"), "pos")
        .agg(r4(F.avg("val")).alias("c_val"))
        .groupBy("c_label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "c_val"))
            ).alias("cs")
        )
        .select("c_label", F.col("cs.c_val").alias("c"))
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        F.aggregate(
            F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    w = Window.partitionBy("vec_id", "label").orderBy("d2", "c_label")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", F.col("c_label").alias("assigned"))
    )
    return (
        assigned.groupBy(
            F.col("label").alias("true_label"),
            F.col("assigned").alias("assigned_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("true_label", "assigned_label")
    )


def s14_nearest_centroid_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S14 (banked): the label-centroid confusion census — a centroid
    drift, an argmin tie broken away from lowest label, or a distance
    over the wrong dimension subset flips the hash."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return nearest_centroid_census(e)
