"""BM25 full-text scoring (operators/text.py:bm25_topk, registered as
t22_bm25_topk). Oracle: an independent pure-Python BM25 over the
collected fixture corpus (Lucene idf form), exact to rounding, plus the
registered entry's own DuckDB oracle through the driver-style compare."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from k_means_clustering_via_map_reduce_spark.operators.text import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table

QUERY = ["window", "merge", "join"]


def _python_bm25(rows, terms, k1=BM25_K1, b=BM25_B):
    docs = {r.doc_id: r.text.strip().split(" ") for r in rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = Counter(
        t for w in docs.values() for t in set(w) if t in terms
    )
    scores = {}
    matched = {}
    for doc_id, w in docs.items():
        tf = Counter(t for t in w if t in terms)
        if not tf:
            continue
        s = 0.0
        for t, f in tf.items():
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * f * (k1 + 1) / (
                f + k1 * (1 - b + b * len(w) / avgdl)
            )
        scores[doc_id] = s
        matched[doc_id] = len(tf)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked, matched


@pytest.mark.timeout(300)
def test_bm25_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = bm25_topk(docs, QUERY, k=25).collect()
    ranked, matched = _python_bm25(
        docs.select("doc_id", "text").collect(), set(QUERY)
    )
    assert len(got) == min(25, len(ranked))
    for row, (doc_id, score) in zip(got, ranked):
        assert row.doc_id == doc_id
        assert row.score == pytest.approx(round(score, 4), abs=1e-4)
        assert row.n_matched_terms == matched[doc_id]
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


@pytest.mark.timeout(300)
def test_bm25_is_partitioning_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in bm25_topk(docs, QUERY, k=10).collect()]
    b = [
        tuple(r)
        for r in bm25_topk(docs.repartition(13), QUERY, k=10).collect()
    ]
    assert a == b


@pytest.mark.timeout(300)
def test_bm25_no_match_is_empty(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert bm25_topk(docs, ["zz_nonexistent_token"], k=5).count() == 0


@pytest.mark.timeout(300)
def test_bm25_stays_jvm_side(spark, sf_dir):
    """The hot path must stay in whole-stage codegen: no Python eval
    node anywhere in the plan (the t16 discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = bm25_topk(docs, QUERY, k=10)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "EvalPython" not in plan


@pytest.mark.timeout(300)
def test_bm25_matches_duckdb_oracle(spark, sf_dir):
    """The registered t22 entry against its own declared DuckDB oracle
    (read from the registry, so test and registration cannot drift),
    through the same canonical compare the verify driver uses."""
    import k_means_clustering_via_map_reduce_spark.queries as Q
    from tests.oracle_utils import compare_to_oracle

    Q.load_all()
    docs = load_table(spark, sf_dir, "documents")
    compare_to_oracle(
        bm25_topk(docs, QUERY, k=25), Q.ORACLE_SQL["t22_bm25_topk"], sf_dir
    )
