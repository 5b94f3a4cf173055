"""Round-13 bank (library-first, unregistered): driver-style oracle
checks plus semantic pins for the nine staged operators — f40 bloom
file skipping, f41 generated columns, k31 streaming top-k, d18
containment pairs, q104 decayed engagement, q105 belief drift, p18
temperature mixing, t36 readability, and d19 prefix-filtered
jaccard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_to_oracle


# -- f40 bloom skipping ------------------------------------------------------


def test_f40_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        F40_ORACLE,
        f40_bloom_skipping,
    )

    compare_to_oracle(f40_bloom_skipping(spark, sf_dir), F40_ORACLE, sf_dir)


def test_f40_bloom_prunes_past_minmax(spark, sf_dir):
    """The bite must be attributable to the BLOOM: min/max ranges keep
    3 of the 10 staged files for the probe, the bloom keeps exactly the
    1 file that holds it."""
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        F40_PROBE,
        _f40_stage,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        bloom_might_contain,
        latest_version,
        read_manifest,
    )

    root = _f40_stage(spark, sf_dir)
    m = read_manifest(root, latest_version(root))
    stats = m["stats"]
    minmax_kept = bloom_kept = 0
    for f in m["files"]:
        lo_hi = stats.get(f, {}).get("source")
        if lo_hi is None or lo_hi[0] <= F40_PROBE <= lo_hi[1]:
            minmax_kept += 1
        b = stats.get(f, {}).get("__bloom__", {}).get("source")
        if b is None or bloom_might_contain(b, F40_PROBE):
            bloom_kept += 1
    assert minmax_kept == 3
    assert bloom_kept == 1


def test_f40_bloom_never_false_negative(spark, sf_dir):
    """Every value actually present in a file must probe positive in
    that file's bloom — a false negative is lost rows."""
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        F40_FILES,
        _f40_stage,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        bloom_might_contain,
        latest_version,
        read_manifest,
    )

    root = _f40_stage(spark, sf_dir)
    m = read_manifest(root, latest_version(root))
    for i, f in enumerate(m["files"][:F40_FILES]):
        b = m["stats"][f]["__bloom__"]["source"]
        for src in (f"src{i}", f"src{19 - i}"):
            assert bloom_might_contain(b, src), (f, src)


# -- f41 generated columns ---------------------------------------------------


def test_f41_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F41_ORACLE,
        f41_generated_column,
    )

    compare_to_oracle(f41_generated_column(spark, sf_dir), F41_ORACLE, sf_dir)


def test_generated_column_invariants(spark, tmp_path):
    """Mismatched supplied values raise; matching ones pass; renaming
    a referenced column is refused; the backfill covers history."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        GeneratedColumnError,
        add_generated_column,
        commit_append,
        read_version,
        rename_column,
    )

    root = str(tmp_path / "t")
    commit_append(spark.range(5).selectExpr("id", "id*3 AS n"), root)
    add_generated_column(spark, root, "b", "CAST(n DIV 2 AS BIGINT)")
    got = {r["id"]: r["b"] for r in read_version(spark, root).collect()}
    assert got == {i: (i * 3) // 2 for i in range(5)}  # backfill
    with pytest.raises(GeneratedColumnError):
        commit_append(
            spark.range(5, 8).selectExpr(
                "id", "id*3 AS n", "CAST(0 AS BIGINT) AS b"
            ),
            root,
        )
    commit_append(  # engine computes the omitted column
        spark.range(5, 8).selectExpr("id", "id*3 AS n"), root
    )
    got = {r["id"]: r["b"] for r in read_version(spark, root).collect()}
    assert got == {i: (i * 3) // 2 for i in range(8)}
    with pytest.raises(ValueError, match="generated"):
        rename_column(root, "n", "m")


# -- k31 streaming top-k -----------------------------------------------------


def test_k31_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
        K31_ORACLE,
        streaming_topk_query,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        pytest.skip("transformWithState protobuf runtime unavailable")
    compare_to_oracle(streaming_topk_query(spark, sf_dir), K31_ORACLE, sf_dir)


def test_k31_board_is_full_and_ranked(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
        K31_TOPK,
        streaming_topk_query,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        pytest.skip("transformWithState protobuf runtime unavailable")
    rows = streaming_topk_query(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, board in by_type.items():
        assert [r["rank"] for r in board] == list(
            range(1, K31_TOPK + 1)
        ), et
        cents = [r["total_cents"] for r in board]
        assert cents == sorted(cents, reverse=True), et


# -- d18 containment ---------------------------------------------------------


def test_d18_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D18_ORACLE,
        d18_containment_pairs,
    )

    compare_to_oracle(d18_containment_pairs(spark, sf_dir), _D18_ORACLE,
                      sf_dir)


def test_d18_catches_quote_inclusion_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted inside a long
    one scores containment 1.0 while jaccard stays far below d1's 0.5
    threshold."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        containment_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, "en", quote), (2, "en", filler + " " + quote)],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    sh = docs.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    rows = containment_pairs(sh).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["containment"] == 1.0
    assert r["jaccard"] < JACCARD_THRESHOLD


# -- q104 decayed engagement -------------------------------------------------


def test_q104_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q104_ORACLE,
        q104_decayed_engagement,
    )

    compare_to_oracle(
        q104_decayed_engagement(spark, sf_dir), Q104_ORACLE, sf_dir
    )


def test_q104_newest_event_carries_max_weight(spark, tmp_path):
    """age 0 = the NEWEST event: one user, two events of 1.00, the
    score must be 100*(3^0*4^7) + 100*(3^1*4^6) — a reversed age
    ordering would give the same sum here, so use distinct values:
    newest=2.00, older=1.00 -> 200*16384 + 100*12288."""
    import datetime as dt

    from k_means_clustering_via_map_reduce_spark.queries import (
        q104_decayed_engagement,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 7, "click", 1.00, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 10), 7, "click", 2.00, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = q104_decayed_engagement(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["decayed_score"] == 200 * 4**7 + 100 * 3 * 4**6


# -- q105 belief drift -------------------------------------------------------


def test_q105_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q105_ORACLE,
        q105_belief_drift,
    )

    compare_to_oracle(q105_belief_drift(spark, sf_dir), Q105_ORACLE, sf_dir)


def test_q105_no_disappeared_kind(spark, sf_dir):
    """T1 <= T2 means T1-visible users stay visible at T2 — a
    'disappeared' class would be a bitemporal axis conflation."""
    from k_means_clustering_via_map_reduce_spark.queries import (
        q105_belief_drift,
    )

    kinds = {
        r["kind"] for r in q105_belief_drift(spark, sf_dir).collect()
    }
    assert "disappeared" not in kinds
    assert kinds <= {"appeared", "changed", "unchanged"}
    assert "changed" in kinds  # corrections actually land in the gap


# -- p18 temperature mixing --------------------------------------------------


def test_p18_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P18_ORACLE,
        p18_temperature_mix,
    )

    compare_to_oracle(p18_temperature_mix(spark, sf_dir), P18_ORACLE, sf_dir)


def test_p18_smallest_lang_keeps_everything(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        p18_temperature_mix,
    )

    rows = p18_temperature_mix(spark, sf_dir).collect()
    smallest = min(rows, key=lambda r: r["n_before"])
    assert smallest["keep_permille"] == 1000
    assert smallest["n_kept"] == smallest["n_before"]
    for r in rows:
        assert r["n_kept"] <= r["n_before"]
        assert 0 < r["keep_permille"] <= 1000


# -- t36 readability ---------------------------------------------------------


def test_t36_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T36_ORACLE,
        t36_readability,
    )

    compare_to_oracle(t36_readability(spark, sf_dir), T36_ORACLE, sf_dir)


def test_t36_syllable_floor_is_one(spark):
    """A vowel-free token still counts one syllable (the standard
    heuristic floor) — dropping it would zero-divide real corpora."""
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        t36_readability,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(1, "en", "xyz pqrst", "s", 9)],
            "doc_id BIGINT, lang STRING, text STRING, source STRING,"
            " n_chars BIGINT",
        ).coalesce(1).write.parquet(tmp + "/documents.parquet")
        r = t36_readability(spark, tmp).collect()[0]
        assert r["syll_per_word"] == 1.0
        assert r["mono_permille"] == 1000


# -- d19 prefix-filtered jaccard ---------------------------------------------


def test_d19_matches_d1_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D1_ORACLE,
        d19_prefix_jaccard_pairs,
    )

    compare_to_oracle(
        d19_prefix_jaccard_pairs(spark, sf_dir), _D1_ORACLE, sf_dir
    )


def test_d19_equals_d1_exactly(spark, sf_dir):
    """The whole point: the prefix-filtered path is LOSSLESS — row-set
    identical to d1's full posting join (d1b's cap, by contrast, drops
    pairs)."""
    from k_means_clustering_via_map_reduce_spark.queries import QUERIES
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        d19_prefix_jaccard_pairs,
    )

    d1 = sorted(
        map(tuple, QUERIES["d1_jaccard_pairs"](spark, sf_dir).collect())
    )
    d19 = sorted(
        map(tuple, d19_prefix_jaccard_pairs(spark, sf_dir).collect())
    )
    assert d19 == d1


def test_d19_complete_on_hot_shingle_corpus(spark):
    """Completeness under the adversary the prefix exists for: every
    doc shares one boilerplate trigram (which the ascending-df order
    pushes OUT of every prefix), plus two true near-dups that must
    still be found through their rare prefix tokens."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    hot = "zz hot token"
    base = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        # 1 and 2 differ in ONE tail word: 6 of 9 trigrams shared,
        # J = 6/12 = exactly the 0.5 threshold (boundary included)
        (1, "en", f"{base} theta {hot}"),
        (2, "en", f"{base} iota {hot}"),
        (3, "en", f"one two three four five six {hot}"),
        (4, "en", f"seven eight nine ten eleven {hot}"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING"
    )
    sh = docs.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    got = {
        (r["a_id"], r["b_id"])
        for r in prefix_filtered_jaccard_pairs(sh).collect()
    }
    assert (1, 2) in got  # found through the rare prefix, not the hot token
    assert all(p in {(1, 2)} for p in got)


# -- f42 conditional merge ---------------------------------------------------


def test_f42_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F42_ORACLE,
        f42_conditional_merge,
    )

    compare_to_oracle(
        f42_conditional_merge(spark, sf_dir), F42_ORACLE, sf_dir
    )


def test_f42_every_clause_fires(spark, sf_dir):
    """Non-vacuity: the staged merge must exercise ALL five outcomes
    (delete, update, keep, insert, rejected insert) at every fixture
    scale, or the oracle proves nothing about the clause it skipped."""
    import duckdb

    from k_means_clustering_via_map_reduce_spark.queries import (
        F42_DEL_BELOW,
        F42_INSERT_FLOOR,
        F42_MID,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{sf_dir}/events.parquet'"
    )
    row = con.execute(f"""
      WITH e AS (SELECT user_id, ts,
                        CAST(round(value*100) AS BIGINT) cents FROM events),
      early AS (SELECT user_id, sum(cents) t FROM e
                WHERE ts < TIMESTAMP '{F42_MID}' AND user_id % 2 = 0
                GROUP BY user_id),
      late AS (SELECT user_id, sum(cents) t FROM e
               WHERE ts >= TIMESTAMP '{F42_MID}' GROUP BY user_id)
      SELECT
        (SELECT count(*) FROM early t JOIN late s USING (user_id)
         WHERE s.t < {F42_DEL_BELOW}),
        (SELECT count(*) FROM early t JOIN late s USING (user_id)
         WHERE s.t >= {F42_DEL_BELOW} AND s.t > t.t),
        (SELECT count(*) FROM early t JOIN late s USING (user_id)
         WHERE s.t >= {F42_DEL_BELOW} AND s.t <= t.t),
        (SELECT count(*) FROM late s LEFT JOIN early t USING (user_id)
         WHERE t.user_id IS NULL AND s.t >= {F42_INSERT_FLOOR}),
        (SELECT count(*) FROM late s LEFT JOIN early t USING (user_id)
         WHERE t.user_id IS NULL AND s.t < {F42_INSERT_FLOOR})
    """).fetchall()[0]
    assert all(n > 0 for n in row), row


def test_merge_delete_clause_wins_over_update(spark, tmp_path):
    """Delta's clause order: a row satisfying BOTH the delete and the
    update predicate is DELETED, and a NULL predicate admits nothing."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        merge_into,
        read_version,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "id BIGINT, v BIGINT"
        ).coalesce(1),
        root,
    )
    src = spark.createDataFrame(
        [(1, 100), (2, None), (4, 40)], "id BIGINT, v BIGINT"
    )
    merge_into(
        spark,
        root,
        src,
        "id",
        # id 1: both clauses true -> delete wins
        when_matched_delete="src_v > 50",
        # id 2: src_v NULL -> predicate NULL -> false -> row KEPT as-is
        when_matched_update="src_v > v",
        when_not_matched_insert="v >= 40",
    )
    got = {r["id"]: r["v"] for r in read_version(spark, root).collect()}
    assert got == {2: 20, 3: 30, 4: 40}


def test_merge_unconditional_default_unchanged(spark, tmp_path):
    """Backwards compatibility: no clause arguments = the f26 plain
    upsert (every match updates, every unmatched source row inserts)."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        merge_into,
        read_version,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame([(1, 10), (2, 20)], "id BIGINT, v BIGINT")
        .coalesce(1),
        root,
    )
    merge_into(
        spark,
        root,
        spark.createDataFrame([(2, 5), (3, 30)], "id BIGINT, v BIGINT"),
        "id",
    )
    got = {r["id"]: r["v"] for r in read_version(spark, root).collect()}
    assert got == {1: 10, 2: 5, 3: 30}


def test_f40_bloom_composes_with_rename_dv_and_compact(spark, tmp_path):
    """Bloom skipping across the lifecycle: the probe resolves the
    RENAMED logical column through the mapping; DV deletes leave the
    bloom valid (rows only disappear); a compaction rewrite DROPS the
    bloom (stats recollected bloomlessly) and the reader must fall
    back to keep-everything, never lose rows."""
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        register_versioned_source,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        compact,
        delete_where_dv,
        latest_version,
        read_manifest,
        rename_column,
    )

    register_versioned_source(spark)
    root = str(tmp_path / "t")
    for grp in ("aa", "bb", "cc"):
        commit_append(
            spark.createDataFrame(
                [(i, grp) for i in range(5)], "id BIGINT, g STRING"
            ).coalesce(1),
            root,
            bloom_columns=("g",),
        )

    def probe(col_name):
        df = (
            spark.read.format("kmce_versioned")
            .option("root", root)
            .load()
        )
        from pyspark.sql import functions as F

        return sorted(
            r["id"] for r in df.filter(F.col(col_name) == "bb").collect()
        )

    assert probe("g") == list(range(5))
    rename_column(root, "g", "grp")
    assert probe("grp") == list(range(5))  # mapping-resolved bloom probe
    delete_where_dv(spark, root, "id = 0 AND grp = 'bb'")
    assert probe("grp") == [1, 2, 3, 4]  # bloom still valid post-DV
    compact(spark, root, target_files=1)
    m = read_manifest(root, latest_version(root))
    assert all(
        "__bloom__" not in m["stats"].get(f, {}) for f in m["files"]
    ), "compaction rewrites must drop blooms, not carry stale ones"
    assert probe("grp") == [1, 2, 3, 4]  # conservative keep, no loss


def test_bloom_columns_type_checked_before_write(spark, tmp_path):
    """A float bloom column must be refused BEFORE any data file is
    written (no orphaned files for vacuum to clean)."""
    import os

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    root = str(tmp_path / "t")
    with pytest.raises(ValueError, match="bloom_columns"):
        commit_append(
            spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
            root,
            bloom_columns=("v",),
        )
    assert not os.path.exists(os.path.join(root, "data")), (
        "refusal must precede the data write"
    )


def test_merge_conditional_refuses_src_prefixed_target(spark, tmp_path):
    """Round-12 ADVICE #4: conditional clauses inject src_<col>
    aliases over the joined frame, so a target column literally named
    src_* would be silently shadowed — the engine must refuse loudly.
    The unconditional upsert on the same table stays available."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        merge_into,
        read_version,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame(
            [(1, 10)], "id BIGINT, src_v BIGINT"
        ).coalesce(1),
        root,
    )
    src = spark.createDataFrame([(1, 99)], "id BIGINT, src_v BIGINT")
    with pytest.raises(ValueError, match="src_"):
        merge_into(
            spark, root, src, "id", when_matched_update="src_src_v > 0"
        )
    merge_into(spark, root, src, "id")  # unconditional path unaffected
    got = {r["id"]: r["src_v"] for r in read_version(spark, root).collect()}
    assert got == {1: 99}


def test_d18_binding_cap_drops_hot_shingle_pairs_only(spark):
    """Round-12 ADVICE #2: with a BINDING posting cap the hot shingle
    leaves the index on the engine side exactly as the cap-encoded
    oracle drops it — pairs reachable only through the hot shingle
    vanish, pairs carried by rare shingles survive with UNDERESTIMATED
    (never inflated) scores."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        containment_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    hot = "zz hot token"  # appears in EVERY doc -> df = 4
    rows = [
        (1, "en", f"{quote} {hot}"),
        (2, "en", " ".join(f"w{i}" for i in range(40)) + f" {quote} {hot}"),
        (3, "en", f"one two three four five {hot}"),
        (4, "en", f"six seven eight nine ten {hot}"),
    ]
    sh = (
        spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, text STRING")
        .select("doc_id", "lang", shingles(F.col("text"), 3).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )
    uncapped = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_pairs(sh).collect()
    }
    capped = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_pairs(sh, posting_cap=3).collect()
    }
    assert (1, 2) in uncapped
    assert set(capped) <= set(uncapped)  # subset, never new pairs
    for pair, c in capped.items():
        assert c <= uncapped[pair]  # underestimate, never inflated
    # the quote pair survives through its rare shingles even capped
    assert (1, 2) in capped
