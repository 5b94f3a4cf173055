"""S8 persisted IVF-PQ hybrid (operators/similarity.py, registered as
s8_ivfpq_persisted_topk; rows-only for the driver, golden-hash pinned
in test_golden_hashes.py).

Pins: recall vs the s1 brute-force truth; the serve path loads saved
artifacts and never fits (both fit entrypoints exploded under
monkeypatch); every returned neighbor lies in a cell the query
actually probed; determinism across calls; and s5's unchanged
passthrough-default plan (the shared scorer grew an optional parameter
— its default output must stay identical)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import k_means_clustering_via_map_reduce_spark.operators.similarity as S
from k_means_clustering_via_map_reduce_spark.sources import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    S.build_ivf_pq_index(e, prefix="s8t")
    return e


def _serve(spark, corpus, **kw):
    q = corpus.filter(F.col("vec_id") < S.TOPK_N_QUERIES)
    return S.ivf_pq_search_persisted(
        spark, q, prefix="s8t", **kw
    ).orderBy("query_id", "rank")


@pytest.mark.timeout(600)
def test_recall_vs_bruteforce(spark, corpus):
    got = _serve(spark, corpus).collect()
    truth = (
        S.brute_force_topk(
            corpus, corpus.filter(F.col("vec_id") < S.TOPK_N_QUERIES)
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    t = {}
    g = {}
    for r in truth:
        t.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in got:
        g.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(g) == set(t)
    recalls = [len(g[q] & t[q]) / len(t[q]) for q in t]
    mean_recall = sum(recalls) / len(recalls)
    # IVF(nprobe=8/16 cells) × PQ(8×16 codes) compounding, then exact
    # rerank over 12k candidates: recall must stay a usable retrieval
    # (s5 alone pins 0.5; the cell restriction costs a little more).
    assert mean_recall >= 0.4, mean_recall


@pytest.mark.timeout(600)
def test_serve_never_refits(spark, corpus, monkeypatch):
    def boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("serve path must not fit")

    import k_means_clustering_via_map_reduce_spark.kmeans as KM

    monkeypatch.setattr(KM, "mllib_fit", boom)
    monkeypatch.setattr(S, "_pq_codebooks", boom)
    rows = _serve(spark, corpus).collect()
    assert rows, "serve-only search must still return results"


@pytest.mark.timeout(600)
def test_neighbors_come_only_from_probed_cells(spark, corpus):
    got = _serve(spark, corpus).collect()
    centers = np.asarray(
        [
            r.center
            for r in spark.table("s8t_centroids").orderBy("cell").collect()
        ]
    )
    cell_of = {
        r.vec_id: r.cell
        for r in spark.table("s8t_codes").select("vec_id", "cell").collect()
    }
    qv = {
        r.vec_id: np.asarray(r.v)
        for r in corpus.filter(
            F.col("vec_id") < S.TOPK_N_QUERIES
        ).collect()
    }
    c_sq = (centers * centers).sum(axis=1)
    for r in got:
        d = c_sq - 2.0 * (qv[r.query_id] @ centers.T)
        probed = set(
            np.argsort(d, kind="stable")[: S.IVF_NPROBE].tolist()
        )
        assert cell_of[r.neighbor_id] in probed, r


@pytest.mark.timeout(600)
def test_serve_is_deterministic(spark, corpus):
    a = [tuple(r) for r in _serve(spark, corpus).collect()]
    b = [tuple(r) for r in _serve(spark, corpus).collect()]
    assert a == b and len(a) > 0


@pytest.mark.timeout(600)
def test_s5_default_passthrough_unchanged(spark, corpus):
    """The shared ADC scorer's default output schema stays exactly
    (vec_id, query_id, adc) — s5's golden hash depends on it."""
    import numpy as np

    sample = (
        corpus.orderBy("vec_id")
        .limit(S.PQ_TRAIN_SAMPLE)
        .select("v")
        .toPandas()
    )
    books = S._pq_codebooks(
        np.vstack(sample["v"].to_numpy()).astype(np.float64)
    )
    codes = corpus.limit(50).select(
        "vec_id", S._pq_encode_udf(books)(F.col("v")).alias("codes")
    )
    q_rows = [
        (r["vec_id"], r["v"])
        for r in corpus.filter(F.col("vec_id") < 3)
        .select("vec_id", "v")
        .orderBy("vec_id")
        .collect()
    ]
    out = S._pq_adc_scores(codes, q_rows, books)
    assert out.columns == ["vec_id", "query_id", "adc"]
    assert out.count() == 50 * 3


@pytest.mark.timeout(600)
def test_cand_factor_knob_monotone_and_converges_to_probed_exact(
    spark, corpus
):
    """The round-7 serve-time recall knob: widening the ADC candidate
    pool can only ADD candidates to the exact rerank, so the top-k
    recall vs brute force is non-decreasing in cand_factor — and at a
    pool spanning every probed-cell row the PQ approximation cancels
    entirely (the result equals exact scoring of the probed cells,
    i.e. the s7 path's answer at equal nprobe)."""
    truth = {}
    for r in S.brute_force_topk(
        corpus, corpus.filter(F.col("vec_id") < S.TOPK_N_QUERIES)
    ).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rows):
        g = {}
        for r in rows:
            g.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(g.get(q, set()) & t) / len(t) for q, t in truth.items()
        ) / len(truth)

    n_corpus = corpus.count()
    rs = [
        recall(_serve(spark, corpus, cand_factor=cf).collect())
        for cf in (3, 12, (n_corpus // S.TOPK_K) + 1)
    ]
    assert rs[0] <= rs[1] <= rs[2], rs
    s7_answer = S.ivf_search_persisted(
        spark,
        corpus.filter(F.col("vec_id") < S.TOPK_N_QUERIES),
        prefix="s8t",
    ).orderBy("query_id", "rank").collect()
    exhaustive = _serve(
        spark, corpus, cand_factor=(n_corpus // S.TOPK_K) + 1
    ).collect()
    assert [tuple(r) for r in exhaustive] == [tuple(r) for r in s7_answer]
