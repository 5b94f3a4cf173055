"""Round-11 staged operators (t29, t30, p14, d14, s10): driver-style
oracle compares plus the structural properties each one's contract
claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_to_oracle


# ------------------------------------------------------------------ t29
def test_t29_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T29_ORACLE,
        t29_perplexity_gate,
    )

    compare_to_oracle(t29_perplexity_gate(spark, sf_dir), T29_ORACLE, sf_dir)


def test_t29_gate_is_a_quartile(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        t29_perplexity_gate,
    )

    for r in t29_perplexity_gate(spark, sf_dir).collect():
        # ntile(4): flagged quartile within 1 of n/4, and the flagged
        # (worst) mean NLL strictly above the kept mean
        assert abs(r["n_flagged"] - r["n_docs"] / 4) <= 1
        assert r["flagged_avg_nll"] > r["kept_avg_nll"]


# ------------------------------------------------------------------ t30
def test_t30_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T30_ORACLE,
        t30_token_rarity_profile,
    )

    compare_to_oracle(
        t30_token_rarity_profile(spark, sf_dir), T30_ORACLE, sf_dir
    )


def test_t30_rank_semantics(spark, sf_dir):
    """Every document rows out; rank 1 = the most frequent token, so a
    doc containing the corpus's top token has min possible components
    and avg_log2_rank >= 0 with rarest_rank <= vocab size."""
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        t30_token_rarity_profile,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    prof = t30_token_rarity_profile(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(prof) == n_docs
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim("text"), " ")).alias("t"))
        .distinct()
        .count()
    )
    for r in prof:
        assert 0.0 <= r["avg_log2_rank"]
        assert 1 <= r["rarest_rank"] <= vocab


# ------------------------------------------------------------------ p14
def test_p14_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P14_ORACLE,
        p14_epoch_sharding,
    )

    compare_to_oracle(p14_epoch_sharding(spark, sf_dir), P14_ORACLE, sf_dir)


def test_p14_deal_is_deterministic_and_epoch_dependent(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        epoch_shard,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = {
        r["doc_id"]: r["shard"]
        for r in epoch_shard(docs, 0).collect()
    }
    e0b = {
        r["doc_id"]: r["shard"]
        for r in epoch_shard(docs.repartition(7), 0).collect()
    }
    assert e0 == e0b  # layout-independent
    e1 = {
        r["doc_id"]: r["shard"]
        for r in epoch_shard(docs, 1).collect()
    }
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    # a re-deal moves ~ (1 - 1/N) of rows; an epoch bleed moves none
    assert moved > len(e0) // 2


def test_p14_shards_partition_the_corpus(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P14_SHARDS,
        p14_epoch_sharding,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    n = load_table(spark, sf_dir, "documents").count()
    rows = p14_epoch_sharding(spark, sf_dir).collect()
    for epoch in {r["epoch"] for r in rows}:
        got = [r for r in rows if r["epoch"] == epoch]
        assert sum(r["n_docs"] for r in got) == n
        assert {r["shard"] for r in got} <= set(range(P14_SHARDS))


# ------------------------------------------------------------------ d14
def test_d14_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D14_ORACLE,
        d14_source_provenance,
    )

    compare_to_oracle(
        d14_source_provenance(spark, sf_dir), _D14_ORACLE, sf_dir
    )


def test_d14_pairs_are_unordered_and_nonvacuous(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        d14_source_provenance,
    )

    rows = d14_source_provenance(spark, sf_dir).collect()
    assert rows  # the fixture genuinely shares segments across sources
    seen = set()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert (r["src_a"], r["src_b"]) not in seen
        seen.add((r["src_a"], r["src_b"]))
        assert r["n_occurrence_pairs"] >= r["n_shared_segments"] >= 1


# ------------------------------------------------------------------ s10
def test_s10_matches_brute_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.similarity import (
        S10_ORACLE,
        s10_radius_selfjoin_profile,
    )

    compare_to_oracle(
        s10_radius_selfjoin_profile(spark, sf_dir), S10_ORACLE, sf_dir
    )


def test_s10_prune_bites_on_clusters_with_zero_loss(spark):
    """On tight synthetic clusters the two-sided cell bound must prune
    most of the K^2 grid while the profile stays EXACTLY the brute
    answer (the s9b honesty discipline at self-join shape)."""
    import numpy as np

    from k_means_clustering_via_map_reduce_spark.operators.similarity import (
        radius_selfjoin_profile,
    )

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 10.0
    rows = []
    for i in range(160):
        c = centers[i % 8]
        rows.append((i, (c + rng.standard_normal(16) * 0.05).tolist()))
    e = spark.createDataFrame(rows, "vec_id BIGINT, v ARRAY<DOUBLE>")
    got = radius_selfjoin_profile(e, [c.tolist() for c in centers])
    pruned = {r["vec_id"]: (r["n_neighbors"], r["max_cos"], r["min_cos"])
              for r in got.collect()}
    assert got._kmce_cell_pairs < got._kmce_cell_grid / 2  # prune bites
    # brute truth: all-pairs via a single-cell codebook (no pruning
    # possible when every vector shares one cell)
    one_cell = radius_selfjoin_profile(e, [centers[0].tolist()])
    assert one_cell._kmce_cell_pairs == one_cell._kmce_cell_grid == 1
    truth = {
        r["vec_id"]: (r["n_neighbors"], r["max_cos"], r["min_cos"])
        for r in one_cell.collect()
    }
    assert pruned == truth  # zero loss under real pruning


# ------------------------------------------------------------------ m11
def test_m11_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        M11_ORACLE,
        m11_image_neardup_census,
    )

    compare_to_oracle(
        m11_image_neardup_census(spark, sf_dir), M11_ORACLE, sf_dir
    )


def test_m11_banding_is_pigeonhole_complete_to_three_bits(spark):
    """Hashes differing in <= 3 bits MUST pair (one of 4 bands
    untouched); a 4-bit spread ACROSS all bands must not (bounded
    blocking, not brute force) — and hamming counts are exact."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        dhash_neardup_census,
    )

    base = "00000000" + "00000000"  # 16 hex zeros
    flip3 = "01" + "0001" + "0000000001"  # bits in 3 different bands
    spread4 = "1000" + "1000" + "1000" + "1000"  # one bit per band
    rows = [(0, base), (1, base), (2, flip3), (3, spread4)]
    hashes = spark.createDataFrame(rows, "doc_id BIGINT, dhash STRING")
    got = {
        r["doc_id"]: (r["n_exact"], r["n_near"])
        for r in dhash_neardup_census(hashes).collect()
    }
    # 0 and 1 are exact dups; 2 is within hamming 3 of both (bits in 3
    # bands -> the 4th band matches, candidates complete); 3 touches
    # every band with a single bit, so it shares NO band with base and
    # never becomes a candidate despite hamming 4
    assert got[0] == (1, 1) and got[1] == (1, 1)
    assert got[2] == (0, 2)
    assert got[3] == (0, 0)


# ------------------------------------------------------------------ d15
def test_d15_matches_batch_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D2B_ORACLE,
        d15_incremental_minhash_pairs,
    )

    compare_to_oracle(
        d15_incremental_minhash_pairs(spark, sf_dir), _D2B_ORACLE, sf_dir
    )


def test_d15_maintained_equals_batch_under_interleavings(spark, tmp_path):
    """The maintained index must serve EXACTLY the batch d2b pairs
    after every prefix of an interleaving that includes a lagging
    refresher (two commits folded by one refresh), an immediate
    refresher, and a no-op refresh — the index is a pure function of
    the corpus content, never of the refresh cadence."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        minhash_banding_pairs_md5,
        minhash_pairs_from_index,
        refresh_minhash_index,
        shingle_docs,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        latest_version,
        read_version,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "index")
    fam = "the quick brown fox jumps over the lazy dog {}"
    batches = [
        [(0, "en", fam.format("one")), (1, "en", fam.format("two"))],
        [(10, "en", fam.format("three")), (11, "de", fam.format("vier"))],
        [(20, "en", "completely unrelated words about spark plans")],
        [(30, "de", fam.format("funf"))],
    ]
    refresh_after = {0, 2, 3}  # batch 1 folds lazily into refresh 2

    def batch_truth():
        docs = read_version(spark, corpus).select("doc_id", "lang", "text")
        return sorted(
            map(tuple, minhash_banding_pairs_md5(
                shingle_docs(docs).withColumn("n_sh", F.size("sh"))
                .drop("n_sh")
            ).collect())
        )

    for i, rows in enumerate(batches):
        commit_append(
            spark.createDataFrame(
                rows, "doc_id BIGINT, lang STRING, text STRING"
            ),
            corpus,
        )
        if i in refresh_after:
            refresh_minhash_index(spark, corpus, state)
            got = sorted(
                map(
                    tuple,
                    minhash_pairs_from_index(spark, corpus, state).collect(),
                )
            )
            assert got == batch_truth(), f"prefix through batch {i}"
    v = latest_version(state)
    # a refresh with nothing new burns no index version
    refresh_minhash_index(spark, corpus, state)
    assert latest_version(state) == v


# ------------------------------------------------------------------ q86
def test_q86_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q86_ORACLE,
        q86_scd2_temporal_join,
    )

    compare_to_oracle(
        q86_scd2_temporal_join(spark, sf_dir), Q86_ORACLE, sf_dir
    )


def test_q86_dim_versions_tile_the_timeline(spark, sf_dir):
    """SCD-2 structural contract: per user the versions are gap-free,
    overlap-free, and cover [lo, hi) — so every fact matches EXACTLY
    one version (checked globally too)."""
    from k_means_clustering_via_map_reduce_spark.queries import scd2_dim
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    dim = scd2_dim(e).collect()
    by_user = {}
    for r in dim:
        by_user.setdefault(r["d_user_id"], []).append(
            (r["valid_from"], r["valid_to"])
        )
    lo = min(v[0] for vs in by_user.values() for v in vs)
    hi = max(v[1] for vs in by_user.values() for v in vs)
    for u, vs in by_user.items():
        vs.sort()
        assert len(vs) == 3
        assert vs[0][0] == lo and vs[-1][1] == hi
        for (f1, t1), (f2, t2) in zip(vs, vs[1:]):
            assert t1 == f2  # contiguous: no gap, no overlap
            assert f1 < t1 <= f2 < t2
    n = e.count()
    m = e.join(
        spark.createDataFrame(dim),
        [
            F.col("user_id") == F.col("d_user_id"),
            F.col("us") >= F.col("valid_from"),
            F.col("us") < F.col("valid_to"),
        ],
    ).count()
    assert m == n  # exactly one version per fact


def test_d15_refresh_raises_on_corpus_cow(spark, tmp_path):
    """A corpus COW delete poisons the append-only diff — the index
    refresh must RAISE (k24's loud-failure contract), never fold a
    best-effort delta that silently keeps signatures for deleted
    docs."""
    import pytest as _pytest

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        refresh_minhash_index,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        delete_where,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "index")
    commit_append(
        spark.createDataFrame(
            [(0, "en", "a b c d"), (1, "en", "a b c e")],
            "doc_id BIGINT, lang STRING, text STRING",
        ),
        corpus,
    )
    refresh_minhash_index(spark, corpus, state)
    delete_where(spark, corpus, "doc_id = 0")
    with _pytest.raises(ValueError, match="copy-on-write"):
        refresh_minhash_index(spark, corpus, state)


# ------------------------------------------------------------------ q87
def test_q87_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q87_ORACLE,
        q87_source_pagerank,
    )

    compare_to_oracle(
        q87_source_pagerank(spark, sf_dir), Q87_ORACLE, sf_dir
    )


def test_q87_integer_pagerank_hand_computed(spark):
    """A 3-node graph small enough to fold by hand: a<->b (w=1 each
    way), c dangling. Teleport = 150000//3 = 50000; a and b feed each
    other their full damped rank; c never receives."""
    from k_means_clustering_via_map_reduce_spark.queries import (
        pagerank_integer,
    )

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "source STRING"
    )
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "u STRING, v STRING, w BIGINT"
    )
    got = {
        r["source"]: r["rank_micro"]
        for r in pagerank_integer(nodes, edges, iters=3).collect()
    }
    r = 1_000_000 // 3  # 333333
    for _ in range(3):
        inflow = (r * 1 * 85) // (1 * 100)
        r_ab = 50_000 + inflow
        r = r_ab
    assert got == {"a": r, "b": r, "c": 50_000}


def test_q87_mass_is_bounded_and_dangling_gets_teleport(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        q87_source_pagerank,
    )

    rows = q87_source_pagerank(spark, sf_dir).collect()
    total = sum(r["rank_micro"] for r in rows)
    # floor losses only shrink mass, teleport floor only shrinks it
    assert total <= 1_000_000
    assert all(r["rank_micro"] >= 1 for r in rows)


# ------------------------------------------------------------------ f31
def test_f31_matches_literal_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F31_ORACLE,
        f31_table_history,
    )

    compare_to_oracle(f31_table_history(spark, sf_dir), F31_ORACLE, sf_dir)


def test_table_history_kinds_and_retention(spark, tmp_path):
    """Every verb classifies correctly; expired versions drop out of
    the history (retention is part of the truth, not an error)."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        clone_table,
        commit_append,
        expire_versions,
        merge_into,
        table_history,
    )

    src = str(tmp_path / "src")
    commit_append(spark.range(5).select("id"), src, batch_id=1)
    dst = str(tmp_path / "fork")
    clone_table(src, dst)
    merge_into(
        spark, dst, spark.range(3, 8).select("id"), "id"
    )
    hist = {r["version"]: r["kind"]
            for r in table_history(spark, dst).collect()}
    assert hist == {1: "clone", 2: "merge"}
    commit_append(spark.range(100, 101).select("id"), dst)
    expire_versions(dst, keep_last=2)
    hist2 = {r["version"]: r["kind"]
             for r in table_history(spark, dst).collect()}
    assert hist2 == {2: "merge", 3: "append"}


# ------------------------------------------------------------------ m12
def test_m12_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        M12_ORACLE,
        m12_scene_change_detect,
    )

    compare_to_oracle(
        m12_scene_change_detect(spark, sf_dir), M12_ORACLE, sf_dir
    )


def test_m12_delta_is_signed_exact(spark):
    """A hand-built 3-frame KVID: frame deltas computed from REAL
    bytes must be the signed abs diff (a uint8 subtraction would wrap
    and a 255->0 step must score 255, not 1... the other way around:
    |0 - 255| = 255, never the uint8 wrap 1)."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        VIDEO_H,
        VIDEO_W,
        frame_delta_profile,
    )

    npx = VIDEO_W * VIDEO_H
    f0 = bytes([0] * npx)
    f1 = bytes([255] * npx)
    f2 = bytes([250] * npx)
    blob = (
        b"KVID"
        + (3).to_bytes(4, "little")
        + VIDEO_W.to_bytes(2, "little")
        + VIDEO_H.to_bytes(2, "little")
        + f0 + f1 + f2
    )
    df = spark.createDataFrame([(7, blob)], "doc_id BIGINT, blob BINARY")
    got = {
        r["pair_idx"]: r["delta_sum"]
        for r in frame_delta_profile(df).collect()
    }
    assert got == {0: 255 * npx, 1: 5 * npx}
