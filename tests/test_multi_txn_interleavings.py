"""Model-based property test: atomic multi-table transactions composed
with the table lifecycle on BOTH participant tables — the ninth
interleaving harness on the versioned table (VERDICT r10 "Next round"
#7: f37's cross-table visibility is the newest surface).

Two tables take committed multi-appends, crashed (pending)
multi-appends, recovery aborts, single-table appends, COW deletes,
OPTIMIZE, retention, and vacuum in arbitrary order. The invariants no
sequence may break:

- ATOMIC VISIBILITY: a committed multi-txn's rows appear on BOTH
  tables; a pending or aborted one's rows appear on NEITHER — there is
  no interleaving in which exactly one side shows them.
- PENDING BLOCKS LOUDLY: while a txn is pending, any single-table
  commit (append, COW delete, compaction that must commit) on either
  participant raises ConcurrentWriteError or leaves content untouched
  (a structural no-op); it never lands above an unsettled slot.
- ABORT IS TOTAL: after abort_txn, both tables accept writers again
  and the aborted rows never become visible — not after compaction,
  not after retention, not after vacuum.
- LIFECYCLE IMMUNITY: compact/expire/vacuum on either table never
  change visible content, never resurrect aborted rows, and never
  delete files a pending transaction still needs (vacuum counts
  manifest-linked pending files as live).
- HISTORY HONESTY: table_history never lists a pending or aborted
  version.
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
    compact,
    delete_where,
    expire_versions,
    latest_version,
    read_manifest,
    read_version,
    table_history,
    vacuum,
)

_OPS = st.lists(
    st.one_of(
        st.just("multi_commit"),
        st.just("multi_crash"),
        st.just("recover_abort"),
        st.tuples(st.just("append"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("cow_delete"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("compact"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("expire"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("vacuum"), st.sampled_from(["a", "b"])),
    ),
    min_size=4,
    max_size=12,
)


def _rows(spark, root):
    return sorted(r["id"] for r in read_version(spark, root).collect())


def _hist_versions(spark, root):
    return {r["version"] for r in table_history(spark, root).collect()}


@settings(max_examples=10, deadline=None)
@given(ops=_OPS)
def test_multi_txn_atomicity_under_lifecycle(
    spark_prop, ops, tmp_path_factory
):
    spark = spark_prop
    base = tmp_path_factory.mktemp("multilife")
    a, b = str(base / "a"), str(base / "b")
    commit_append(spark.range(0, 5).select("id"), a)
    commit_append(spark.range(100, 105).select("id"), b)
    exp = {"a": set(range(0, 5)), "b": set(range(100, 105))}
    roots = {"a": a, "b": b}
    seq = 0
    pending = None  # (coordinator, txn_id, slots {side: version})

    def fresh(side):
        nonlocal seq
        seq += 1
        lo = (10_000 if side == "a" else 20_000) + 100 * seq
        return set(range(lo, lo + 3))

    def check():
        for s in ("a", "b"):
            assert set(_rows(spark, roots[s])) == exp[s], s
            hist = _hist_versions(spark, roots[s])
            assert hist <= set(range(1, latest_version(roots[s]) + 1))
            if pending is not None:
                assert pending[2][s] not in hist

    for op in ops:
        kind = op[0] if isinstance(op, tuple) else op
        side = op[1] if isinstance(op, tuple) else None
        if kind == "multi_commit":
            ra, rb = fresh("a"), fresh("b")
            dfs = {
                a: spark.createDataFrame(
                    [(i,) for i in sorted(ra)], "id BIGINT"
                ),
                b: spark.createDataFrame(
                    [(i,) for i in sorted(rb)], "id BIGINT"
                ),
            }
            if pending is None:
                commit_multi(dfs)
                exp["a"] |= ra
                exp["b"] |= rb
            else:
                # the unsettled slot blocks the whole new transaction
                with pytest.raises(ConcurrentWriteError):
                    commit_multi(dfs)
        elif kind == "multi_crash":
            if pending is not None:
                continue
            got = commit_multi(
                {
                    a: spark.createDataFrame(
                        [(i,) for i in sorted(fresh("a"))], "id BIGINT"
                    ),
                    b: spark.createDataFrame(
                        [(i,) for i in sorted(fresh("b"))], "id BIGINT"
                    ),
                },
                _crash_before_finalize=True,
            )
            slots = {
                s: got[__import__("os").path.abspath(roots[s])]
                for s in ("a", "b")
            }
            man = read_manifest(a, slots["a"])
            pending = (man["txn"]["coordinator"], man["txn"]["id"], slots)
        elif kind == "recover_abort":
            if pending is None:
                continue
            assert abort_txn(pending[0], pending[1]) is True
            pending = None
        elif kind == "append":
            rows = fresh(side)
            df = spark.createDataFrame(
                [(i,) for i in sorted(rows)], "id BIGINT"
            )
            if pending is None:
                commit_append(df, roots[side])
                exp[side] |= rows
            else:
                with pytest.raises(ConcurrentWriteError):
                    commit_append(df, roots[side])
        elif kind == "cow_delete":
            victim = min(exp[side])
            if pending is None:
                delete_where(spark, roots[side], f"id = {victim}")
                exp[side].discard(victim)
            else:
                with pytest.raises(ConcurrentWriteError):
                    delete_where(spark, roots[side], f"id = {victim}")
        elif kind == "compact":
            before = latest_version(roots[side])
            if pending is None:
                compact(spark, roots[side], target_files=1)
            else:
                try:
                    compact(spark, roots[side], target_files=1)
                except ConcurrentWriteError:
                    pass
                else:
                    # only a structural no-op may succeed
                    assert latest_version(roots[side]) == before
        elif kind == "expire":
            expire_versions(roots[side], keep_last=1)
        elif kind == "vacuum":
            vacuum(roots[side], retention_seconds=0.0)
        check()
    # terminal recovery: settle any stuck txn; both sides writable again
    if pending is not None:
        assert abort_txn(pending[0], pending[1]) is True
        pending = None
    for s in ("a", "b"):
        rows = fresh(s)
        commit_append(
            spark.createDataFrame([(i,) for i in sorted(rows)], "id BIGINT"),
            roots[s],
        )
        exp[s] |= rows
    check()
