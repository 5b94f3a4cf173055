"""Model-based property test: atomic MULTI-TABLE transactions composed
with RENAME COLUMN and DELETION-VECTOR deletes on BOTH participant
tables — the eleventh interleaving harness on the versioned table
(VERDICT r11 "Next round" #6: the two newest metadata surfaces,
column mapping and DV sidecars, meeting the cross-table commit
protocol; ten prior harnesses found a bug every time a new surface
met the lifecycle verbs).

Two tables take committed multi-appends, crashed (pending)
multi-appends, recovery aborts, RENAME COLUMN generations, and DV
deletes (keyed on id AND on the renamed value column, so the
mapping-aware predicate scan is exercised) in arbitrary order. The
invariants no sequence may break:

- ATOMIC VISIBILITY: a committed multi-txn's rows appear on BOTH
  tables under each side's CURRENT logical column names; a pending or
  aborted one's rows appear on NEITHER.
- PENDING BLOCKS LOUDLY: while a txn is pending, rename_column and
  delete_where_dv on either participant raise ConcurrentWriteError —
  neither a metadata-only commit nor a sidecar-only commit may land
  above an unsettled slot.
- DV DEAD STAYS DEAD: rows DV-deleted before a rename stay invisible
  after it (the sidecar keys are physical, the rename is logical),
  and rows DV-deleted through a predicate on the RENAMED column
  resolve through the mapping to the right physical column.
- APPEND UNDER MAPPING: multi-appends to a renamed table write
  physical column names and read back logical ones — a mapping slip
  on the multi-table write path would surface as a schema or value
  mismatch on the very next read.
- DETAIL HONESTY: table_detail's n_rows_live equals the model's live
  row count on every side after every step (the f39 surface composed
  with all of the above).
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

    ConcurrentWriteError,
    abort_txn,
    commit_append,
    commit_multi,
    delete_where_dv,
    latest_version,
    read_manifest,
    read_version,
    rename_column,
    table_detail,
    table_history,
)

_OPS = st.lists(
    st.one_of(
        st.just("multi_commit"),
        st.just("multi_crash"),
        st.just("recover_abort"),
        st.tuples(st.just("rename"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("dv_by_id"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("dv_by_value"), st.sampled_from(["a", "b"])),
    ),
    min_size=4,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(ops=_OPS)
def test_txn_rename_dv_interleavings(spark_prop, ops, tmp_path_factory):
    spark = spark_prop
    base = tmp_path_factory.mktemp("txnmapdv")
    a, b = str(base / "a"), str(base / "b")
    roots = {"a": a, "b": b}
    # model: per side, live rows id -> value and the current logical
    # name of the value column
    model = {
        "a": {i: i * 7 for i in range(0, 5)},
        "b": {i: i * 7 for i in range(100, 105)},
    }
    vcol = {"a": "v", "b": "v"}
    gen = {"a": 0, "b": 0}
    for s in ("a", "b"):
        commit_append(
            spark.createDataFrame(
                sorted(model[s].items()), "id BIGINT, v BIGINT"
            ).coalesce(1),
            roots[s],
        )
    seq = 0
    pending = None  # (coordinator, txn_id, {side: version})

    def fresh(side):
        nonlocal seq
        seq += 1
        lo = (10_000 if side == "a" else 20_000) + 100 * seq
        return {i: i * 7 for i in range(lo, lo + 3)}

    def side_df(side, rows):
        return spark.createDataFrame(
            sorted(rows.items()), f"id BIGINT, {vcol[side]} BIGINT"
        )

    def check():
        for s in ("a", "b"):
            got = read_version(spark, roots[s])
            assert sorted(got.columns) == sorted(["id", vcol[s]]), s
            vals = {r["id"]: r[vcol[s]] for r in got.collect()}
            assert vals == model[s], s
            detail = table_detail(spark, roots[s]).collect()[0]
            assert detail["n_rows_live"] == len(model[s]), s
            hist = {
                r["version"]
                for r in table_history(spark, roots[s]).collect()
            }
            if pending is not None:
                assert pending[2][s] not in hist, s

    for op in ops:
        kind = op[0] if isinstance(op, tuple) else op
        side = op[1] if isinstance(op, tuple) else None
        if kind == "multi_commit":
            ra, rb = fresh("a"), fresh("b")
            dfs = {a: side_df("a", ra), b: side_df("b", rb)}
            if pending is None:
                commit_multi(dfs)
                model["a"].update(ra)
                model["b"].update(rb)
            else:
                with pytest.raises(ConcurrentWriteError):
                    commit_multi(dfs)
        elif kind == "multi_crash":
            if pending is not None:
                continue
            got = commit_multi(
                {a: side_df("a", fresh("a")), b: side_df("b", fresh("b"))},
                _crash_before_finalize=True,
            )
            import os as _os

            slots = {s: got[_os.path.abspath(roots[s])] for s in ("a", "b")}
            man = read_manifest(a, slots["a"])
            pending = (man["txn"]["coordinator"], man["txn"]["id"], slots)
        elif kind == "recover_abort":
            if pending is None:
                continue
            assert abort_txn(pending[0], pending[1]) is True
            pending = None
        elif kind == "rename":
            nxt = f"v_r{gen[side] + 1}"
            if pending is None:
                rename_column(roots[side], vcol[side], nxt)
                vcol[side] = nxt
                gen[side] += 1
            else:
                with pytest.raises(ConcurrentWriteError):
                    rename_column(roots[side], vcol[side], nxt)
        elif kind in ("dv_by_id", "dv_by_value"):
            if not model[side]:
                continue
            victim = min(model[side])
            pred = (
                f"id = {victim}"
                if kind == "dv_by_id"
                else f"{vcol[side]} = {model[side][victim]}"
            )
            if pending is None:
                delete_where_dv(spark, roots[side], pred)
                del model[side][victim]
            else:
                with pytest.raises(ConcurrentWriteError):
                    delete_where_dv(spark, roots[side], pred)
        check()

    # settle any open transaction and confirm both tables accept every
    # verb again, with the aborted rows never surfacing
    if pending is not None:
        assert abort_txn(pending[0], pending[1]) is True
        pending = None
        check()
    for s in ("a", "b"):
        nxt = f"v_r{gen[s] + 1}"
        rename_column(roots[s], vcol[s], nxt)
        vcol[s] = nxt
    extra = {a: side_df("a", fresh("a")), b: side_df("b", fresh("b"))}
    got = commit_multi(extra)
    assert len(got) == 2
    model["a"].update(
        {r["id"]: r[vcol["a"]] for r in extra[a].collect()}
    )
    model["b"].update(
        {r["id"]: r[vcol["b"]] for r in extra[b].collect()}
    )
    check()


def test_dv_predicate_on_renamed_column_resolves_mapping(spark, tmp_path):
    """Direct pin for the sharpest composition: rename v->w, then DV
    delete WHERE w = <value> — the predicate must resolve through the
    mapping to the physical column v, delete exactly the matching
    row, and stay deleted under a second rename."""
    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame(
            [(i, i * 7) for i in range(6)], "id BIGINT, v BIGINT"
        ).coalesce(1),
        root,
    )
    rename_column(root, "v", "w")
    delete_where_dv(spark, root, "w = 21")  # id 3
    got = {r["id"]: r["w"] for r in read_version(spark, root).collect()}
    assert got == {i: i * 7 for i in range(6) if i != 3}
    rename_column(root, "w", "x")
    got2 = {r["id"]: r["x"] for r in read_version(spark, root).collect()}
    assert got2 == got
    d = table_detail(spark, root).collect()[0]
    assert d["n_rows_live"] == 5 and d["n_dv_sidecars"] == 1
    assert d["n_mapped_columns"] == 1  # w->v collapsed into x->v
