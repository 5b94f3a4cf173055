"""Round-14 bank (library-first, unregistered): driver-style oracle
checks plus semantic pins for the nine staged operators — f43 DROP
COLUMN, f44 timestamp time travel, q106 distinct grouping sets, t37
char-trigram profile, d20 URL-canonical dedup, p19 per-source top-k
quality, k32 stream-SCD2 temporal enrich, m19 zero crossings, s14
nearest-centroid census.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_to_oracle


# -- f43 drop column ---------------------------------------------------------


def test_f43_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F43_ORACLE,
        f43_drop_column_read,
    )

    compare_to_oracle(f43_drop_column_read(spark, sf_dir), F43_ORACLE,
                      sf_dir)


def test_drop_column_invariants(spark, tmp_path):
    """Metadata-only: no data file touched; time travel below the drop
    shows the column; re-adding the dropped name is refused; dropping
    the last column / a constrained column / a generated base is
    refused; dropping the generated column itself removes its
    expression."""
    import os

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        add_generated_column,
        commit_append,
        drop_column,
        read_manifest,
        read_version,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.range(4).selectExpr("id", "id*3 AS n", "'x' AS s")
        .coalesce(1),
        root,
    )
    files_before = set()
    for dirpath, _, names in os.walk(os.path.join(root, "data")):
        files_before |= {os.path.join(dirpath, n) for n in names}
    mtimes = {f: os.path.getmtime(f) for f in files_before}
    v = drop_column(root, "s")
    assert read_manifest(root, v)["dropped"] == {"s": "s"}
    # no data file added, removed, or rewritten
    files_after = set()
    for dirpath, _, names in os.walk(os.path.join(root, "data")):
        files_after |= {os.path.join(dirpath, n) for n in names}
    assert files_after == files_before
    assert all(os.path.getmtime(f) == mtimes[f] for f in files_before)
    assert read_version(spark, root).columns == ["id", "n"]
    assert read_version(spark, root, version=1).columns == ["id", "n", "s"]
    # rows intact
    assert read_version(spark, root).count() == 4
    # retired name: re-add refused
    with pytest.raises(ValueError, match="retired"):
        commit_append(
            spark.range(4, 6).selectExpr("id", "id*3 AS n", "'y' AS s"),
            root,
        )
    # plain append without the dropped column still works
    commit_append(spark.range(4, 6).selectExpr("id", "id*3 AS n"), root)
    assert read_version(spark, root).count() == 6
    # refusals
    with pytest.raises(ValueError, match="only column"):
        r2 = str(tmp_path / "one")
        commit_append(spark.range(3).selectExpr("id"), r2)
        drop_column(r2, "id")
    r3 = str(tmp_path / "gen")
    commit_append(spark.range(3).selectExpr("id", "id*2 AS base"), r3)
    add_generated_column(spark, r3, "b", "CAST(base DIV 2 AS BIGINT)")
    with pytest.raises(ValueError, match="generated"):
        drop_column(r3, "base")
    v = drop_column(r3, "b")  # dropping the generated col itself is fine
    assert read_manifest(r3, v).get("generated", {}) == {}
    assert read_version(spark, r3).columns == ["id", "base"]


def test_drop_column_retire_persists_until_compaction_flushes(
    spark, tmp_path
):
    """The dropped record rides every DATA commit (appends, COW
    rewrites) — ghost files still exist — but COMPACTION rewrites the
    manifest's whole file set without the column and flushes the
    record exactly as it flushes the rename mapping (the documented
    'OPTIMIZE to flush' semantics): after compact, re-adding the name
    is SOUND (null-filled history, no ghosts) and must be allowed."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        compact,
        drop_column,
        dropped_columns,
        read_version,
        update_where,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.range(4).selectExpr("id", "id*3 AS n", "'x' AS s")
        .coalesce(1),
        root,
    )
    drop_column(root, "s")
    commit_append(spark.range(4, 8).selectExpr("id", "id*3 AS n"), root)
    update_where(spark, root, "id = 0", {"n": "n + 1"})
    assert dropped_columns(root) == {"s": "s"}  # survives data commits
    with pytest.raises(ValueError, match="retired"):
        commit_append(
            spark.range(8, 9).selectExpr("id", "id*3 AS n", "'y' AS s"),
            root,
        )
    compact(spark, root, target_files=1)
    assert dropped_columns(root) == {}  # flushed with the rewrite
    commit_append(  # re-add is now sound: no file stores the old s
        spark.range(8, 9).selectExpr("id", "id*3 AS n", "'y' AS s"),
        root,
    )
    rows = {r["id"]: (r["n"], r["s"])
            for r in read_version(spark, root).collect()}
    assert rows[8] == (24, "y")
    assert rows[0] == (1, None)  # history null-fills the re-added column
    assert len(rows) == 9


# -- f44 timestamp travel ----------------------------------------------------


def test_f44_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F44_ORACLE,
        f44_timestamp_travel_read,
    )

    compare_to_oracle(
        f44_timestamp_travel_read(spark, sf_dir), F44_ORACLE, sf_dir
    )


def test_timestamp_travel_resolution(spark, tmp_path):
    """Before-first raises; between pins the earlier; at/after head
    pins head."""
    import time

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_as_of_timestamp,
        version_as_of_timestamp,
    )

    root = str(tmp_path / "t")
    t0 = time.time()
    commit_append(spark.range(3).selectExpr("id"), root)
    t1 = time.time()
    commit_append(spark.range(3, 6).selectExpr("id"), root)
    t2 = time.time()
    with pytest.raises(ValueError, match="at or before"):
        version_as_of_timestamp(root, t0 - 10)
    assert version_as_of_timestamp(root, t1) == 1
    assert version_as_of_timestamp(root, t2) == 2
    assert read_as_of_timestamp(spark, root, t1).count() == 3
    assert read_as_of_timestamp(spark, root, t2).count() == 6


# -- q106 distinct grouping sets ---------------------------------------------


def test_q106_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q106_ORACLE,
        q106_distinct_grouping_sets,
    )

    compare_to_oracle(
        q106_distinct_grouping_sets(spark, sf_dir), Q106_ORACLE, sf_dir
    )


def test_q106_lattice_is_consistent(spark, sf_dir):
    """The grand total's distinct-user count can never exceed the sum
    of per-type distinct counts, and equals the table's own."""
    from k_means_clustering_via_map_reduce_spark.queries import (
        q106_distinct_grouping_sets,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    rows = q106_distinct_grouping_sets(spark, sf_dir).collect()
    grand = [r for r in rows if r["g_type"] == 1 and r["g_day"] == 1]
    assert len(grand) == 1
    truth = load_table(spark, sf_dir, "events").select(
        "user_id"
    ).distinct().count()
    assert grand[0]["n_users"] == truth
    per_type = [
        r for r in rows if r["g_type"] == 0 and r["g_day"] == 1
    ]
    assert sum(r["n_users"] for r in per_type) >= truth


# -- t37 char trigram profile ------------------------------------------------


def test_t37_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T37_ORACLE,
        t37_char_trigram_profile,
    )

    compare_to_oracle(
        t37_char_trigram_profile(spark, sf_dir), T37_ORACLE, sf_dir
    )


def test_t37_boundary_trigrams_counted(spark):
    """A 3-char text contributes exactly its one trigram; 2-char texts
    contribute nothing; ties rank lexicographically."""
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        char_trigram_profile,
    )

    docs = spark.createDataFrame(
        [(1, "xx", "abc"), (2, "xx", "ab"), (3, "xx", "bcd")],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    rows = char_trigram_profile(docs, k=5).collect()
    got = [(r["rank"], r["trigram"], r["n"]) for r in rows]
    assert got == [(1, "abc", 1), (2, "bcd", 1)]


# -- d20 url canonical dedup -------------------------------------------------


def test_d20_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        D20_ORACLE,
        d20_url_canonical_dup,
    )

    compare_to_oracle(
        d20_url_canonical_dup(spark, sf_dir), D20_ORACLE, sf_dir
    )


def test_canonicalize_url_forms(spark):
    """Every messy variant collapses to the same canonical; a genuinely
    different page does not."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        canonicalize_url,
    )

    urls = [
        "https://a.example.com/en/page/5?id=5",
        "HTTPS://A.EXAMPLE.COM/en/page/5?id=5",
        "https://a.example.com:443/en/page/5?id=5",
        "https://a.example.com/en/page/5/?id=5",
        "https://a.example.com/en/page/5?utm_source=feed&id=5",
        "https://a.example.com/en/page/5?id=5&utm_campaign=x",
    ]
    different = "https://a.example.com/en/page/6?id=6"
    df = spark.createDataFrame(
        [(u,) for u in urls + [different]], "url STRING"
    )
    got = [
        r["c"] for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert len(set(got[:-1])) == 1
    assert got[0] == "https://a.example.com/en/page/5?id=5"
    assert got[-1] != got[0]


# -- p19 per-source top-k quality --------------------------------------------


def test_p19_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P19_ORACLE,
        p19_source_topk_quality,
    )

    compare_to_oracle(
        p19_source_topk_quality(spark, sf_dir), P19_ORACLE, sf_dir
    )


def test_p19_ranks_by_quality_then_doc_id(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P19_TOP_K,
        p19_source_topk_quality,
    )

    rows = p19_source_topk_quality(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= P19_TOP_K
        for a, b in zip(rs, rs[1:]):
            assert (a["quality"], -a["doc_id"]) >= (
                b["quality"], -b["doc_id"]
            ), source


# -- k32 stream SCD-2 temporal enrich ----------------------------------------


def test_k32_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.streaming.joins import (
        K32_ORACLE,
        k32_stream_scd2_enrich,
    )

    compare_to_oracle(
        k32_stream_scd2_enrich(spark, sf_dir), K32_ORACLE, sf_dir
    )


def test_k32_era_boundary_routes_exactly(spark, sf_dir):
    """Every event lands in exactly one era (closed/open boundary) —
    totals reconcile with the raw table."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table
    from k_means_clustering_via_map_reduce_spark.streaming.joins import (
        k32_stream_scd2_enrich,
    )

    rows = k32_stream_scd2_enrich(spark, sf_dir).collect()
    n = sum(r["n_events"] for r in rows)
    assert n == load_table(spark, sf_dir, "events").count()
    assert {r["era"] for r in rows} == {"early", "late"}


# -- m19 zero crossings ------------------------------------------------------


def test_m19_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        M19_ORACLE,
        m19_zero_crossings,
    )

    compare_to_oracle(m19_zero_crossings(spark, sf_dir), M19_ORACLE, sf_dir)


def test_m19_crossings_match_pure_python(spark, sf_dir):
    """Spot-verify a handful of docs against the raw sample formula."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        m19_zero_crossings,
    )

    rows = {
        r["doc_id"]: r
        for r in m19_zero_crossings(spark, sf_dir).collect()
    }
    for did in list(rows)[:5]:
        n = did % 400 + 2
        v = [(did * 31 + i * 17) % 2048 - 1024 for i in range(n)]
        total = sum(
            1 for a, b in zip(v, v[1:]) if (a >= 0) != (b >= 0)
        )
        r = rows[did]
        assert r["n_samples"] == n
        assert r["total_crossings"] == total
        assert r["crossing_permille"] == 1000 * total // (n - 1)


# -- s14 nearest-centroid census ---------------------------------------------


def test_s14_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.similarity import (
        S14_ORACLE,
        s14_nearest_centroid_census,
    )

    compare_to_oracle(
        s14_nearest_centroid_census(spark, sf_dir), S14_ORACLE, sf_dir
    )


def test_s14_census_covers_corpus_and_ties_go_low(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.similarity import (
        nearest_centroid_census,
        s14_nearest_centroid_census,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    rows = s14_nearest_centroid_census(spark, sf_dir).collect()
    total = sum(r["n_vecs"] for r in rows)
    assert total == load_table(spark, sf_dir, "embeddings").count()
    # synthetic tie: two identical centroids -> assignment picks the
    # LOWER label (O6 semantics)
    e = spark.createDataFrame(
        [(1, 5, [1.0, 0.0]), (2, 9, [1.0, 0.0]), (3, 2, [0.0, 1.0])],
        "vec_id BIGINT, label BIGINT, v ARRAY<DOUBLE>",
    )
    got = {
        (r["true_label"], r["assigned_label"])
        for r in nearest_centroid_census(e).collect()
    }
    assert (5, 5) in got and (9, 5) in got  # 9's centroid ties with 5's


def test_retired_spelling_cannot_return_via_rename(spark, tmp_path):
    """The ghost-resurrection path the round-13 review found: rename
    p->s, drop s (retiring BOTH spellings), then rename y->s would let
    a SECOND drop of 's' clobber the first retirement — so renaming
    INTO any retired spelling is refused, and retirements accumulate
    under physical keys."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        drop_column,
        dropped_columns,
        rename_column,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame(
            [(1, 10, "a")], "id BIGINT, y BIGINT, p STRING"
        ).coalesce(1),
        root,
    )
    rename_column(root, "p", "s")
    drop_column(root, "s")
    assert dropped_columns(root) == {"p": "s"}  # physical-keyed
    with pytest.raises(ValueError, match="retired"):
        rename_column(root, "y", "s")
    with pytest.raises(ValueError, match="retired"):
        rename_column(root, "y", "p")
    # two drops accumulate — neither retirement is lost
    commit_append(
        spark.createDataFrame([(2, 20, 30)],
                              "id BIGINT, y BIGINT, z BIGINT"),
        root,
    )
    drop_column(root, "z")
    assert dropped_columns(root) == {"p": "s", "z": "z"}
    for bad in ("s", "p", "z"):
        with pytest.raises(ValueError, match="retired"):
            commit_append(
                spark.createDataFrame(
                    [(3, 1, "x")], f"id BIGINT, y BIGINT, {bad} STRING"
                ),
                root,
            )


def test_conditional_merge_src_guard_fires_on_empty_source(
    spark, tmp_path
):
    """The guard must refuse BEFORE the empty-source early return — an
    API misuse validated against an empty batch would otherwise pass
    silently and explode on the first real one."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        merge_into,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame([(1, 10)], "id BIGINT, src_v BIGINT")
        .coalesce(1),
        root,
    )
    empty = spark.createDataFrame([], "id BIGINT, src_v BIGINT")
    with pytest.raises(ValueError, match="src_"):
        merge_into(
            spark, root, empty, "id", when_matched_update="src_src_v > 0"
        )
