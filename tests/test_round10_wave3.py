"""Structural pins for the round-10 third-wave operators (q88-q92,
t31, p15, s11, m13, m14, f32, f33, k27) — invariants the oracle hash
cannot localize when it flips. The oracle equivalence itself is
test_queries_oracle.py's parametrized sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import k_means_clustering_via_map_reduce_spark.queries as Q

Q.load_all()


def _rows(spark, sf_dir, name):
    return Q.QUERIES[name](spark, sf_dir).collect()


# ---------------------------------------------------------------- q88


def test_q88_pair_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q88_basket_pairs")
    assert rows, "no co-purchase pairs"
    assert all(r.n_orders >= 1 for r in rows)
    # every pair's key sum is >= 1 + 2 = 3: the checksum can never be
    # smaller than 3x the pair count
    assert all(r.pair_key_mass >= 3 * r.n_pairs for r in rows)
    # total pairs equals an independent distinct-pair count
    li = Q.load_table(spark, sf_dir, "lineitem")
    po = li.select("l_orderkey", "l_partkey").distinct()
    a, b = po.alias("a"), po.alias("b")
    n_pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey"), F.col("b.l_partkey"))
        .distinct()
        .count()
    )
    assert sum(r.n_pairs for r in rows) == n_pairs


# ---------------------------------------------------------------- q89


def test_q89_share_boundaries(spark, sf_dir):
    rows = {r.abc_class: r for r in _rows(spark, sf_dir, "q89_pareto_class")}
    li = Q.load_table(spark, sf_dir, "lineitem")
    total = li.agg(
        F.sum(F.col("l_quantity").cast("bigint"))
    ).collect()[0][0]
    got = sum(r.sum_qty for r in rows.values())
    assert got == total, "classes must partition the quantity mass"
    assert sum(r.n_parts for r in rows.values()) == (
        li.select("l_partkey").distinct().count()
    )
    if "A" in rows:
        assert rows["A"].sum_qty * 10 <= total * 5
    if "A" in rows and "B" in rows:
        assert (rows["A"].sum_qty + rows["B"].sum_qty) * 10 <= total * 8


# ---------------------------------------------------------------- q90


def test_q90_streak_mass(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q90_streak_islands")
    assert rows
    day_us = Q.Q90_DAY_US
    ud = (
        Q.load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {day_us}"),
        )
        .distinct()
        .count()
    )
    # every (user, day) belongs to exactly one streak
    assert sum(r.streak_len * r.n_streaks for r in rows) == ud
    assert all(r.n_users <= r.n_streaks for r in rows)


# ---------------------------------------------------------------- q91


def test_q91_orientation_invariance(spark, sf_dir):
    """The engine's degree-oriented wedge count must equal the naive
    id-ordered triple join — the pin that catches a tie-break slip or
    a double-counted wedge even if both would hash-match SOME oracle."""
    row = _rows(spark, sf_dir, "q91_triangle_count")[0]
    po = (
        Q.load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = po.alias("a"), po.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    naive = (
        e1.join(e2, F.col("e2.x") == F.col("e1.y"))
        .join(
            e3,
            (F.col("e3.x") == F.col("e1.x")) & (F.col("e3.y") == F.col("e2.y")),
        )
        .select(
            (F.col("e1.x") + F.col("e1.y") + F.col("e2.y")).alias("s")
        )
        .agg(F.count(F.lit(1)), F.coalesce(F.sum("s"), F.lit(0)))
        .collect()[0]
    )
    assert (row.n_triangles, row.tri_key_mass) == (naive[0], naive[1])
    assert row.n_edges == e.count()


# ---------------------------------------------------------------- q92


def test_q92_calendar_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q92_gapfill_locf")
    assert rows
    # the calendar is GLOBAL: every type densifies to the same day count
    assert len({r.n_days for r in rows}) == 1
    ev = Q.load_table(spark, sf_dir, "events")
    assert sum(r.observed_mass for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.n_gap_days < r.n_days


# ---------------------------------------------------------------- t31


def test_t31_ranking_shape(spark, sf_dir):
    rows = _rows(spark, sf_dir, "t31_collocation_pmi")
    assert rows
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T31_MIN_COUNT,
        T31_TOP_N,
    )

    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= T31_TOP_N
        assert all(r.c_xy >= T31_MIN_COUNT for r in rs)
        # rounded PMI is nonincreasing in rank (ratio ordering survives
        # the 4-dp display rounding up to ties)
        srt = sorted(rs, key=lambda r: r.rank)
        assert all(
            srt[i].pmi >= srt[i + 1].pmi for i in range(len(srt) - 1)
        )


# ---------------------------------------------------------------- p15


def test_p15_budget_binds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "p15_token_budget_pick")
    assert rows
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P15_BUDGET,
    )

    docs = Q.load_table(spark, sf_dir, "documents")
    per_src = {
        r.source: (r.n_docs, r.n_toks)
        for r in docs.select(
            "source", F.size(F.split(F.trim("text"), " ")).alias("t")
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("n_toks"))
        .collect()
    }
    for r in rows:
        n_docs, n_toks = per_src[r.source]
        assert 1 <= r.n_kept <= n_docs
        if n_toks > P15_BUDGET:
            # an overflowing source must spend at least its budget
            # (the boundary doc is kept)
            assert r.kept_tokens >= P15_BUDGET
            assert r.n_kept < n_docs or r.kept_tokens == n_toks
        else:
            assert r.n_kept == n_docs and r.kept_tokens == n_toks


# ---------------------------------------------------------------- s11


def test_s11_differs_from_cosine(spark, sf_dir):
    """MIPS ranking must NOT be cosine ranking on this fixture — the
    norm variation is real, so a normalization sneaking into s11 (or
    an un-normalized s1) shows up as identical neighbor lists."""
    mips = _rows(spark, sf_dir, "s11_mips_topk")
    cos = _rows(spark, sf_dir, "s1_cosine_topk")
    assert mips and cos
    m = {(r.query_id, r.rank): r.neighbor_id for r in mips}
    c = {(r.query_id, r.rank): r.neighbor_id for r in cos}
    assert set(m) == set(c), "same (query, rank) grid"
    assert m != c, "MIPS order must differ from cosine somewhere"
    for r in mips:
        assert 1 <= r.rank <= 5 and r.neighbor_id != r.query_id


# ---------------------------------------------------------------- m13


def test_m13_pixel_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir, "m13_dominant_color")
    assert rows
    for r in rows:
        assert r.n_pixels == r.w * r.h
        assert 1 <= r.dom_count <= r.n_pixels
        assert 1 <= r.n_buckets <= min(512, r.n_pixels)
        assert 0 <= r.dom_bucket < 512
        # the dominant bucket's count bounds the mean bucket population
        assert r.dom_count * r.n_buckets >= r.n_pixels


# ---------------------------------------------------------------- m14


def test_m14_run_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir, "m14_silence_runs")
    docs = Q.load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs, "every WAV doc must report (LEFT join)"
    for r in rows:
        assert r.n_samples == r.doc_id % 400 + 2
        assert 0 <= r.n_silent <= r.n_samples
        assert (r.n_silent_runs == 0) == (r.n_silent == 0)
        assert r.max_silent_run <= r.n_silent
        if r.n_silent_runs:
            # runs partition the silent samples into maximal blocks
            assert r.max_silent_run * r.n_silent_runs >= r.n_silent


# ---------------------------------------------------------------- k27


def test_k27_emits_each_view_once(spark, sf_dir):
    rows = _rows(spark, sf_dir, "k27_stream_semi_join")
    assert rows
    ids = [r.view_id for r in rows]
    assert len(ids) == len(set(ids)), "semi join must emit a view ONCE"
    # the conversion set is a strict subset of all views (some views
    # never convert on the fixture)
    n_views = (
        Q.load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .count()
    )
    assert 0 < len(ids) < n_views
