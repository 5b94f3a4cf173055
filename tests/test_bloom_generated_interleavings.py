"""Model-based property test: BLOOM FILE SKIPPING x GENERATED COLUMNS
x COLUMN RENAME composed with the table lifecycle — the thirteenth
interleaving harness on the versioned table (VERDICT r12 "Next round"
#6: every new metadata surface meets the lifecycle verbs in arbitrary
order; this triple — bloom sidecars + generated-column invariants +
column mapping — had never been composed).

One table carries a string key ``grp`` (bloom-indexed on every
append), a base ``n``, and ``b GENERATED ALWAYS AS (n DIV 2)`` —
bloom-indexed TOO, on appends where the ENGINE computed it (the
ordering under test: generated materialization must precede the
bloom-column validation, or an omitted-b append with a b-bloom would
be refused). Appends (with/without b), COW updates to the base
column, conditional merges, DV deletes, COW deletes, compaction, and
renames of the bloom column run in arbitrary order; renaming the
generated column's base must always be REFUSED.

Invariants no sequence may break:
1. visible rows == model (id -> (grp, n)), with b == n DIV 2 on every
   row, read via ``read_version`` under the CURRENT logical names;
2. a bloom-pruned connector probe on the current grp name returns
   exactly the model's matching ids — a bloom (stale, renamed,
   rewrite-orphaned, or DV-crossed) may only ever cost time, never
   rows;
3. the same for a probe on the generated column's value.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.python_source import (
    register_versioned_source,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (

# NIGHTLY TIER (r14, VERDICT r13 #7): this generated-lifecycle harness
# dominates suite wall clock; it is deselected by the default run
# (pytest.ini addopts) so the driver's verify window fits, and runs
# with `pytest -m nightly`. Coverage of operators touched in r14
# lives in the always-on tier.
pytestmark = pytest.mark.nightly

    add_generated_column,
    commit_append,
    compact,
    delete_where,
    delete_where_dv,
    merge_into,
    read_version,
    rename_column,
    update_where,
)

GRPS = ("aa", "bb", "cc")

_OPS = st.lists(
    st.sampled_from(
        [
            "append_plain",
            "append_with_b",
            "update_base",
            "cond_merge",
            "dv_delete",
            "cow_delete",
            "rename_bloom_col",
            "rename_base_refused",
            "compact",
        ]
    ),
    min_size=4,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(ops=_OPS)
def test_bloom_generated_rename_lifecycle_interleavings(
    spark_prop, ops, tmp_path_factory
):
    spark = spark_prop
    register_versioned_source(spark)
    root = str(tmp_path_factory.mktemp("bloomlife") / "t")
    # model: id -> (grp, n); b is derived, never stored in the model
    model = {i: (GRPS[i % 3], i * 3) for i in range(6)}
    grp_name = "grp"

    def df_of(rows, with_b):
        if with_b:
            data = [
                (i, g, n, n // 2) for i, (g, n) in sorted(rows.items())
            ]
            return spark.createDataFrame(
                data, f"id BIGINT, {grp_name} STRING, n BIGINT, b BIGINT"
            )
        return spark.createDataFrame(
            [(i, g, n) for i, (g, n) in sorted(rows.items())],
            f"id BIGINT, {grp_name} STRING, n BIGINT",
        )

    commit_append(
        df_of(model, False).coalesce(1), root,
        bloom_columns=(grp_name,),
    )
    add_generated_column(spark, root, "b", "CAST(n DIV 2 AS BIGINT)")
    seq = [100]

    def fresh():
        seq[0] += 10
        return {
            seq[0] + j: (GRPS[(seq[0] + j) % 3], (seq[0] + j) * 3)
            for j in range(2)
        }

    def check():
        got = {
            r["id"]: (r[grp_name], r["n"], r["b"])
            for r in read_version(spark, root).collect()
        }
        assert got == {
            i: (g, n, n // 2) for i, (g, n) in model.items()
        }
        # bloom-pruned connector probes: never lose a row, never
        # invent one — on the string bloom column AND the generated one
        conn = (
            spark.read.format("kmce_versioned").option("root", root)
        )
        probe_grp = sorted(
            r["id"]
            for r in conn.load()
            .filter(F.col(grp_name) == "bb")
            .collect()
        )
        assert probe_grp == sorted(
            i for i, (g, _) in model.items() if g == "bb"
        )
        if model:
            bval = max(n // 2 for _, n in model.values())
            probe_b = sorted(
                r["id"]
                for r in conn.load().filter(F.col("b") == bval).collect()
            )
            assert probe_b == sorted(
                i for i, (_, n) in model.items() if n // 2 == bval
            )

    for op in ops:
        if op == "append_plain":
            # engine computes b, THEN blooms it: the ordering this
            # harness exists to pin
            rows = fresh()
            commit_append(
                df_of(rows, False), root,
                bloom_columns=(grp_name, "b"),
            )
            model.update(rows)
        elif op == "append_with_b":
            rows = fresh()
            commit_append(
                df_of(rows, True), root,
                bloom_columns=(grp_name, "b"),
            )
            model.update(rows)
        elif op == "update_base":
            if not model:
                continue
            victim = min(model)
            # COW rewrite: the rewritten file loses its blooms
            # (conservative), b must be recomputed
            update_where(spark, root, f"id = {victim}", {"n": "n + 2"})
            g, n = model[victim]
            model[victim] = (g, n + 2)
        elif op == "cond_merge":
            rows = fresh()
            if model:
                k = min(model)
                g, n = model[k]
                rows[k] = (g, n + (9 if k % 2 == 0 else -9))
            merge_into(
                spark,
                root,
                df_of(rows, False),
                "id",
                when_matched_delete="src_n < n",
                when_matched_update="src_n > n",
                when_not_matched_insert="n % 2 = 0",
            )
            for i, (g, n) in rows.items():
                if i in model:
                    if n < model[i][1]:
                        del model[i]
                    elif n > model[i][1]:
                        model[i] = (g, n)
                elif n % 2 == 0:
                    model[i] = (g, n)
        elif op == "dv_delete":
            if not model:
                continue
            victim = min(model)
            # predicate on the CURRENT logical bloom-column name —
            # resolves through the mapping after renames
            g = model[victim][0]
            delete_where_dv(
                spark, root,
                f"id = {victim} AND {grp_name} = '{g}'",
            )
            del model[victim]
        elif op == "cow_delete":
            if not model:
                continue
            victim = max(model)
            delete_where(spark, root, f"id = {victim}")
            del model[victim]
        elif op == "rename_bloom_col":
            new = f"{grp_name}_r"
            rename_column(root, grp_name, new)
            grp_name = new
        elif op == "rename_base_refused":
            with pytest.raises(ValueError, match="generated"):
                rename_column(root, "n", "m")
        elif op == "compact":
            compact(spark, root, target_files=1)
        check()


def test_bloom_on_engine_computed_generated_column(spark, tmp_path):
    """The direct composition pin: an append OMITTING the generated
    column may still bloom-index it — generated materialization
    precedes bloom validation, and the written file's bloom answers
    for the engine-computed values."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        bloom_might_contain,
        latest_version,
        read_manifest,
    )

    root = str(tmp_path / "t")
    commit_append(spark.range(4).selectExpr("id", "id*3 AS n"), root)
    add_generated_column(spark, root, "b", "CAST(n DIV 2 AS BIGINT)")
    commit_append(
        spark.range(4, 8).selectExpr("id", "id*3 AS n").coalesce(1),
        root,
        bloom_columns=("b",),
    )
    m = read_manifest(root, latest_version(root))
    (new_file,) = m["added"]
    bloom = m["stats"][new_file]["__bloom__"]["b"]
    for i in range(4, 8):
        assert bloom_might_contain(bloom, (i * 3) // 2), i
