"""K1/K2 kernel tests (SURVEY.md §5.2): golden parity against the
reference's own sample inputs and logged output, oracle equivalence,
and property-based invariants."""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from k_means_clustering_via_map_reduce_spark.kmeans import (
    assign_clusters,
    centroids_df,
    lloyd_fit,
    mllib_fit,
)
from k_means_clustering_via_map_reduce_spark.sources import read_points_csv
from tests.kmeans_oracle import lloyd_oracle

REF_INPUT = "/root/reference/Input"


def load_ref_points(name: str) -> list[tuple[float, float]]:
    pts = []
    with open(os.path.join(REF_INPUT, name)) as f:
        for line in f:
            if line.strip():
                x, y = line.strip().split(",")
                pts.append((float(x), float(y)))
    return pts


def points_df(spark, pts):
    return spark.createDataFrame(
        [(float(x), float(y), i) for i, (x, y) in enumerate(pts)],
        schema="x DOUBLE, y DOUBLE, row_idx INT",
    )


@pytest.mark.parametrize(
    "fname,k,max_iter",
    [
        ("points1.txt", 3, 10),
        ("points2.txt", 4, 7),
        ("points3.txt", 2, 10),
        ("points3.txt", 4, 5),
    ],
)
def test_lloyd_matches_python_oracle(spark, fname, k, max_iter):
    pts = load_ref_points(fname)
    res = lloyd_fit(points_df(spark, pts), k=k, max_iter=max_iter)
    o_centroids, o_iters, o_conv = lloyd_oracle(pts, k, max_iter)
    assert res.iterations == o_iters
    assert res.converged == o_conv
    assert len(res.centroids) == len(o_centroids)
    for got, want in zip(res.centroids, o_centroids):
        assert math.dist(got, want) < 1e-9


def test_reference_golden_points2(spark):
    """The reference's final logged run (dump_master.txt: points2, K=4,
    7 iterations) produced centroids.txt. Its pipeline is float32-lossy
    (SURVEY.md §1.2), so compare the f64 engine result as a SET at the
    reference's own %.4f sink precision with 1e-3 slack (§7.3)."""
    golden = {
        (68.7944, 50.4526),
        (86.8043, 25.4590),
        (15.0706, 33.6109),
        (23.8604, 74.2431),
    }
    pts = load_ref_points("points2.txt")
    res = lloyd_fit(points_df(spark, pts), k=4, max_iter=7)
    assert len(res.centroids) == 4
    got = {tuple(round(v, 4) for v in c) for c in res.centroids}
    for g in got:
        assert any(math.dist(g, ref) <= 1e-3 for ref in golden), (g, golden)


def test_csv_source_roundtrip(spark):
    """The reference's own input format (whitespace-padded 'x,y' lines,
    Input/points2.txt) through the engine CSV source → same result."""
    df = read_points_csv(spark, os.path.join(REF_INPUT, "points2.txt"))
    res = lloyd_fit(df, k=4, max_iter=7)
    pts = load_ref_points("points2.txt")
    o_centroids, _, _ = lloyd_oracle(pts, 4, 7)
    for got, want in zip(res.centroids, o_centroids):
        assert math.dist(got, want) < 1e-9


def test_csv_row_index_contiguous_across_split_scan(spark, tmp_path):
    """row_idx must stay a contiguous 0..n-1 line index even when the
    file scan splits into many partitions (the per-partition numbering +
    offset path — no single-task global sort)."""
    p = tmp_path / "pts.csv"
    n = 2000
    p.write_text("".join(f"{i}.0,{i}.5\n" for i in range(n)))
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try:
        raw = spark.read.schema("x DOUBLE, y DOUBLE").csv(str(p))
        assert raw.rdd.getNumPartitions() > 4, "scan did not split"
        rows = read_points_csv(spark, str(p)).orderBy("row_idx").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert [r["row_idx"] for r in rows] == list(range(n))
    assert [r["x"] for r in rows] == [float(i) for i in range(n)]


def test_empty_cluster_drops_and_k_shrinks(spark):
    """A far-outlier initial centroid captures no points → its id emits no
    group and K shrinks permanently (reference behavior, §7.4)."""
    pts = [(1e6, 1e6)] + [(float(i % 3), float(i % 3)) for i in range(30)]
    res = lloyd_fit(points_df(spark, pts), k=2, max_iter=5)
    # centroid 0 = (1e6,1e6) owns only itself; centroid 1 the rest — no
    # drop here. Make an actual orphan: init points identical.
    pts2 = [(0.0, 0.0), (0.0, 0.0)] + [(5.0, 5.0)] * 10
    res2 = lloyd_fit(points_df(spark, pts2), k=2, max_iter=5)
    o_c, o_i, o_conv = lloyd_oracle(pts2, 2, 5)
    assert len(res2.centroids) == len(o_c) == 1
    assert res2.converged == o_conv
    assert math.dist(res2.centroids[0], o_c[0]) < 1e-12
    del res


def test_tie_breaks_to_lowest_index(spark):
    """Equidistant point → lowest centroid index (mapper.py:28 parity)."""
    pts = [(0.0, 0.0), (2.0, 0.0), (1.0, 0.0)]
    df = points_df(spark, pts)
    labeled = assign_clusters(df, [(0.0, 0.0), (2.0, 0.0)]).collect()
    by_xy = {(r["x"], r["y"]): r["cluster_id"] for r in labeled}
    assert by_xy[(1.0, 0.0)] == 0


def test_tie_parity_between_fit_paths_adversarial(spark):
    """Exact equidistant points (integer coordinates, so BOTH distance
    formulations — literal sqrt((v-c)^2) and the join path's
    sqrt(c.c - 2v.c + v.v) — compute the identical representable
    value) must break to the LOWEST centroid index in lloyd_fit AND
    lloyd_fit_join alike, leaving every iteration identical."""
    from k_means_clustering_via_map_reduce_spark.kmeans import lloyd_fit_join

    # First two rows seed centroids (0,0) and (8,0); the remaining
    # points sit exactly on the x=4 bisector at several offsets.
    pts = [(0.0, 0.0), (8.0, 0.0), (4.0, 0.0), (4.0, 2.0), (4.0, -6.0)]
    a = lloyd_fit(points_df(spark, pts), k=2, max_iter=3)
    b = lloyd_fit_join(points_df(spark, pts), k=2, max_iter=3)
    assert a.iterations == b.iterations
    assert a.history == b.history
    # All ties joined cluster 0: its first-iteration mean moves to the
    # tie points' centroid with the seed, cluster 1 keeps only its seed.
    assert a.history[0][1] == (8.0, 0.0)


def test_formatted_sink_matches_reference_format(spark):
    pts = load_ref_points("points2.txt")
    res = lloyd_fit(points_df(spark, pts), k=4, max_iter=7)
    for line in res.formatted():
        x, y = line.split(",")
        assert len(x.split(".")[1]) == 4 and len(y.split(".")[1]) == 4
    cdf = centroids_df(spark, res)
    assert cdf.count() == 4


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-50, 50, allow_nan=False), st.floats(-50, 50, allow_nan=False)
        ),
        min_size=5,
        max_size=40,
    ),
    k=st.integers(2, 4),
)
def test_property_engine_equals_oracle(spark_prop, pts, k):
    res = lloyd_fit(points_df(spark_prop, pts), k=k, max_iter=5)
    o_centroids, o_iters, o_conv = lloyd_oracle(pts, k, 5)
    assert res.iterations == o_iters
    assert res.converged == o_conv
    assert len(res.centroids) == len(o_centroids)
    for got, want in zip(res.centroids, o_centroids):
        assert math.dist(got, want) < 1e-7


def test_wssse_non_increasing(spark):
    """Lloyd's invariant: within-cluster SSE never increases."""
    pts = load_ref_points("points1.txt")

    def wssse(centroids):
        return sum(
            min(math.dist(p, c) ** 2 for c in centroids) for p in pts
        )

    res = lloyd_fit(points_df(spark, pts), k=3, max_iter=10)
    costs = [wssse(cs) for cs in res.history]
    assert all(a >= b - 1e-9 for a, b in zip(costs, costs[1:]))


def test_mllib_agreement_small_scale(spark):
    """K2 vs K1 on well-separated blobs: same cost (± slack) and k."""
    import random

    rng = random.Random(7)
    centers = [(0.0, 0.0), (20.0, 20.0), (-20.0, 15.0)]
    pts = [
        (cx + rng.gauss(0, 0.5), cy + rng.gauss(0, 0.5))
        for cx, cy in centers
        for _ in range(40)
    ]
    rng.shuffle(pts)
    df = points_df(spark, pts)
    k1 = lloyd_fit(df, k=3, max_iter=20)
    model, preds = mllib_fit(df, k=3, max_iter=20, seed=1)
    assert preds.select("cluster_id").distinct().count() == 3

    def cost(centroids):
        return sum(min(math.dist(p, c) ** 2 for c in centroids) for p in pts)

    mllib_centers = [tuple(c) for c in model.clusterCenters()]
    assert abs(cost(k1.centroids) - cost(mllib_centers)) / cost(k1.centroids) < 0.05


def test_lloyd_join_form_equals_literal_form_highdim(spark):
    """Large-codebook parity at representative dimensionality: K=16 over
    the 64-dim embeddings, both forms, exact same centroids/iterations.
    (K=256 runs only through the broadcast form — the literal form's
    16k-constant plan is the thing lloyd_fit_join exists to avoid — and
    is exercised end-to-end by the registered k3 query.)"""
    from k_means_clustering_via_map_reduce_spark.kmeans import (
        lloyd_fit,
        lloyd_fit_join,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    a = lloyd_fit(
        emb, k=16, order_col="vec_id", max_iter=3, tol=0.0, array_col="embedding"
    )
    b = lloyd_fit_join(
        emb, k=16, order_col="vec_id", max_iter=3, tol=0.0, array_col="embedding"
    )
    assert a.iterations == b.iterations
    assert a.converged == b.converged
    assert len(a.centroids) == len(b.centroids)
    for ca, cb in zip(a.centroids, b.centroids):
        assert math.dist(ca, cb) < 1e-9


def test_k3_largek_query_shape(spark):
    """The registered K=256 entry returns one row per surviving cluster
    with total point coverage and deterministic output across runs."""
    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    df = Q.QUERIES["k1b_lloyd_join_largek"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert 0 < len(rows) <= 256
    assert sum(r["n_points"] for r in rows) == 500
    again = Q.QUERIES["k1b_lloyd_join_largek"](spark, "/root/testdata/sf0.01").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


@pytest.mark.parametrize(
    "fname,k,max_iter",
    [("points1.txt", 3, 10), ("points2.txt", 4, 7)],
)
def test_lloyd_join_form_equals_literal_form(spark, fname, k, max_iter):
    """The broadcast-UDF large-K variant must reproduce lloyd_fit
    exactly: same iterations, convergence, and centroids."""
    from k_means_clustering_via_map_reduce_spark.kmeans import lloyd_fit_join

    pts = load_ref_points(fname)
    a = lloyd_fit(points_df(spark, pts), k=k, max_iter=max_iter)
    b = lloyd_fit_join(points_df(spark, pts), k=k, max_iter=max_iter)
    assert a.iterations == b.iterations
    assert a.converged == b.converged
    assert len(a.centroids) == len(b.centroids)
    for ca, cb in zip(a.centroids, b.centroids):
        assert math.dist(ca, cb) < 1e-9


def test_kmeans_parallel_init_contract(spark, sf_dir):
    """K13 seeding contract: the seed is the minimum-id row, every
    candidate is a corpus row drawn in a declared round, the draw is
    deterministic across repeat runs, and attraction weights partition
    the corpus."""
    from k_means_clustering_via_map_reduce_spark.kmeans import (
        kmeans_parallel_init,
    )
    from k_means_clustering_via_map_reduce_spark.queries import QUERIES
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cands = kmeans_parallel_init(emb)
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert cands[0][0] == 0 and cands[0][1] == min(ids)
    assert all(cid in ids for _, cid, _ in cands)
    assert all(0 <= r <= 3 for r, _, _ in cands)
    assert len({cid for _, cid, _ in cands}) == len(cands)  # no re-draws
    # Oversampling must actually draw beyond the seed on real data.
    assert len(cands) > 1

    again = kmeans_parallel_init(emb)
    assert [(r, c) for r, c, _ in again] == [(r, c) for r, c, _ in cands]

    rows = QUERIES["k13_kmeanspp_init"](spark, sf_dir).collect()
    assert len(rows) == len(cands)
    assert sum(r.weight for r in rows) == emb.count()


def test_refine_weighted_candidates_beats_naive_init(spark, sf_dir):
    """The point of K-Means|| seeding: reclustering the weighted
    candidate set must yield k centers whose corpus WSSSE is no worse
    than the naive first-k-rows init those candidates replace — and the
    refine must be deterministic."""
    import numpy as np

    from k_means_clustering_via_map_reduce_spark.kmeans import (
        kmeans_parallel_init,
        refine_weighted_candidates,
    )
    from k_means_clustering_via_map_reduce_spark.queries import QUERIES
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cands = kmeans_parallel_init(emb)
    weights = {
        r.vec_id: r.weight
        for r in QUERIES["k13_kmeanspp_init"](spark, sf_dir).collect()
    }
    k = 8
    refined = refine_weighted_candidates(cands, weights, k)
    assert len(refined) == k
    assert refine_weighted_candidates(cands, weights, k) == refined

    pts = np.asarray(
        [list(r.embedding) for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )

    def wssse(centers):
        c = np.asarray(centers, dtype=np.float64)
        d = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return float(d.min(axis=1).sum())

    naive = pts[:k]  # first k rows by vec_id — k1's init
    assert wssse(refined) <= wssse(naive)


def test_kmeans_parallel_candidate_count_tracks_oversampling_not_corpus(
    spark,
):
    """The kmeans|| scale contract MEASURED: expected draws per round
    equal the oversampling parameter l (sum of l*d2/cost over the
    corpus is l by construction), so the candidate set stays O(l*R)
    as the corpus grows — this is what makes the per-round driver
    collect legitimate at any scale. 500-vec vs 2000-vec corpora must
    both land near 1 + l*R, not scale 4x with the data."""
    from k_means_clustering_via_map_reduce_spark.kmeans import (
        KMPP_OVERSAMPLE,
        KMPP_ROUNDS,
        kmeans_parallel_init,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    expected = 1 + KMPP_OVERSAMPLE * KMPP_ROUNDS
    sizes = {}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = load_table(spark, sf_dir, "embeddings")
        sizes[sf_dir] = (emb.count(), len(kmeans_parallel_init(emb)))
    (n1, c1), (n2, c2) = sizes.values()
    assert n2 == 4 * n1  # the corpora really differ 4x
    for c in (c1, c2):
        assert expected / 3 <= c <= expected * 3, (sizes, expected)
    # Candidate growth must be decoupled from corpus growth.
    assert c2 < 2 * c1 + 10, sizes


def test_k14_production_fit_matches_or_beats_mllib_at_equal_budget(
    spark, sf_dir
):
    """The k14 chain (K-Means|| seeding → weighted refine → seeded
    Lloyd's) must produce a fit whose corpus WSSSE does not lose to
    MLlib's own KMeans (KMeans|| init, same k, same iteration budget,
    same tol). At the pinned sf0.001 fixture the deterministic chain is
    strictly better (measured 0.9875× MLlib); both solvers land in
    local optima, so on other fixtures we allow 1% (measured 1.0032× at
    sf0.01) — the property under test is equal-quality-class, not
    global dominance."""
    from k_means_clustering_via_map_reduce_spark.kmeans import (
        K14_K,
        K14_MAX_ITER,
        corpus_wssse,
        mllib_fit,
        production_fit,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    res = production_fit(emb)
    assert len(res.centroids) == K14_K
    w14 = corpus_wssse(emb, [list(c) for c in res.centroids])
    model, _ = mllib_fit(
        emb, k=K14_K, array_col="embedding", max_iter=K14_MAX_ITER, seed=42
    )
    w_mllib = float(model.summary.trainingCost)
    if sf_dir.rstrip("/").endswith("sf0.001"):
        assert w14 <= w_mllib
    else:
        assert w14 <= 1.01 * w_mllib

    # Determinism of the whole chain: same centroids on a second run.
    again = production_fit(emb)
    assert [
        tuple(round(v, 9) for v in c) for c in again.centroids
    ] == [tuple(round(v, 9) for v in c) for c in res.centroids]
