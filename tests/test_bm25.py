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


def test_t26_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T26_ORACLE,
        t26_bigram_lm_score,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(t26_bigram_lm_score(spark, sf_dir), T26_ORACLE, sf_dir)


def test_t26_scores_match_pure_python_lm(spark, sf_dir):
    """Per-doc scores vs a from-scratch add-one bigram LM."""
    import math
    from collections import Counter

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        t26_bigram_lm_score,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    docs = [
        (r["doc_id"], (r["text"] or "").strip().split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    uni: Counter = Counter()
    bi: Counter = Counter()
    vocab = set()
    for _, w in docs:
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            uni[a] += 1
            bi[(a, b)] += 1
    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_nll"])
        for r in t26_bigram_lm_score(spark, sf_dir).collect()
    }
    v = len(vocab)
    for did, w in docs:
        prs = list(zip(w, w[1:]))
        if not prs:
            assert did not in got
            continue
        nll = sum(
            -math.log((bi[p] + 1.0) / (uni[p[0]] + v)) for p in prs
        )
        assert got[did][0] == len(prs)
        assert abs(got[did][1] - round(nll / len(prs), 4)) <= 1e-4, did
