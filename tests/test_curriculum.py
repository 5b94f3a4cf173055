"""P9 curriculum ordering (operators/sampling.py:curriculum_order,
registered as p9_curriculum_summary). Oracle: a pure-Python model over
the collected fixture corpus, plus the registered entry's own DuckDB
oracle through the driver-style compare."""

from __future__ import annotations

import hashlib

import pytest

from k_means_clustering_via_map_reduce_spark.operators.sampling import (
    curriculum_order,
    curriculum_summary,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table

N_PHASES = 4
SEED = "epoch0"


def _python_model(rows, n_phases=N_PHASES, seed=SEED):
    diff = {
        r.doc_id: round(r.n_chars / len(r.text.strip().split(" ")), 6)
        for r in rows
    }
    values = sorted(diff.values())
    n = len(values)
    walls = []
    for i in range(1, n_phases):
        # exact percentile, linear interpolation (h = p·(n−1)), the
        # q29 formula both engines implement
        h = (i / n_phases) * (n - 1)
        lo, frac = int(h), h - int(h)
        v = values[lo] if frac == 0 else (
            values[lo] + frac * (values[lo + 1] - values[lo])
        )
        walls.append(round(v, 6))
    out = {}
    for doc_id, d in diff.items():
        phase = 1 + sum(1 for w in walls if d > w)
        draw = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:12]
        out[doc_id] = (d, phase, draw)
    return out


@pytest.mark.timeout(300)
def test_curriculum_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = curriculum_order(docs, N_PHASES, SEED).collect()
    model = _python_model(
        docs.select("doc_id", "text", "n_chars").collect()
    )
    assert len(got) == len(model)
    for r in got:
        d, phase, draw = model[r.doc_id]
        assert r.difficulty == pytest.approx(d, abs=1e-6)
        assert r.phase == phase, (r.doc_id, r.difficulty, r.phase, phase)
        assert r.draw == draw


@pytest.mark.timeout(300)
def test_phases_are_difficulty_monotone_and_balanced(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = curriculum_order(docs, N_PHASES, SEED).collect()
    by_phase = {}
    for r in got:
        by_phase.setdefault(r.phase, []).append(r.difficulty)
    assert set(by_phase) == {1, 2, 3, 4}
    # walls separate phases: max of phase p <= min of phase p+1
    for p in range(1, N_PHASES):
        assert max(by_phase[p]) <= min(by_phase[p + 1])
    # balanced to within boundary-tie slack
    n = len(got)
    for p, vals in by_phase.items():
        assert len(vals) == pytest.approx(n / N_PHASES, rel=0.25), p


@pytest.mark.timeout(300)
def test_new_seed_reshuffles_within_fixed_walls(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: (r.phase, r.draw)
         for r in curriculum_order(docs, N_PHASES, "epoch0").collect()}
    b = {r.doc_id: (r.phase, r.draw)
         for r in curriculum_order(docs, N_PHASES, "epoch1").collect()}
    assert all(a[d][0] == b[d][0] for d in a)      # walls fixed
    assert any(a[d][1] != b[d][1] for d in a)      # order reshuffled


@pytest.mark.timeout(300)
def test_summary_is_partitioning_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in curriculum_summary(docs).collect()]
    b = [
        tuple(r)
        for r in curriculum_summary(docs.repartition(17)).collect()
    ]
    assert a == b and len(a) == N_PHASES


@pytest.mark.timeout(300)
def test_curriculum_summary_matches_duckdb_oracle(spark, sf_dir):
    """The registered p9 entry against its own declared DuckDB oracle
    (Spark percentile ≡ DuckDB quantile_cont, the q29 pairing), read
    from the registry so test and registration cannot drift."""
    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.sources import load_table
    from tests.oracle_utils import compare_to_oracle

    Q.load_all()
    docs = load_table(spark, sf_dir, "documents")
    compare_to_oracle(
        curriculum_summary(docs), Q.ORACLE_SQL["p9_curriculum_summary"], sf_dir
    )
