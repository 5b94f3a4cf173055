"""Plan-shape regression ledger: record per-query physical-plan metrics
(exchange count, broadcast-join count, nested-loop / cartesian /
Python-eval presence, codegen stage count) for every BATCH query in the
registry, as one JSON file. Committed per round (PLANS_r{N}.json) so a
plan regression — a new shuffle, a broadcast that stopped firing, a
Python boundary sneaking into a hot path — shows up as a one-line diff
between rounds, independent of timing noise.

tests/test_plans.py pins the high-stakes shapes as hard assertions; this
ledger covers the WHOLE surface shallowly.

Usage: python scripts/plan_snapshot.py [out.json]   (sf dir from
$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01 — plan SHAPE, not
timing, so the small fixture is the right input).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from k_means_clustering_via_map_reduce_spark.session import configure

# Streaming entries execute a real streaming query at BUILD time (the
# returned frame is the materialized sink) — their "plan" is a
# localCheckpoint scan, not the streaming plan, so they are excluded;
# their semantics are pinned by oracles + dedicated streaming tests.
# The K-Means fits likewise run their iterative driver loop at build.
_SKIP = re.compile(r"^(k\d|p1_)")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("kmce-plan-snapshot")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)

    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.plans import (
        broadcast_hash_join_count,
        codegen_stage_count,
        count_shuffles,
        physical_plan,
    )

    Q.load_all()
    ledger: dict[str, dict] = {}
    for name in sorted(Q.QUERIES):
        if _SKIP.match(name):
            continue
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            plan = physical_plan(df)
            ledger[name] = {
                "shuffles": count_shuffles(df),
                "broadcast_joins": broadcast_hash_join_count(df),
                "sort_merge_joins": plan.count("SortMergeJoin"),
                "has_nested_loop": "NestedLoop" in plan
                or "CartesianProduct" in plan,
                "python_eval": any(
                    n in plan
                    for n in (
                        "BatchEvalPython",
                        "ArrowEvalPython",
                        "MapInPandas",
                        "FlatMapGroupsInPandas",
                        "PythonDataSource",
                    )
                ),
                # distinct [codegen id : N] markers from an AQE-off
                # re-plan — "formatted" mode never prints the literal
                # WholeStageCodegen, which left this column dead 0 in
                # PLANS_r05-r11 (VERDICT r11 #1)
                "codegen_stages": codegen_stage_count(df),
            }
        except Exception as exc:  # pragma: no cover
            ledger[name] = {"error": str(exc)[:200]}
        print(f"{name}: {ledger[name]}", file=sys.stderr, flush=True)
    with open(out_path, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
        fh.write("\n")
    bad = [n for n, r in ledger.items() if r.get("error")]
    print(f"wrote {out_path}: {len(ledger)} queries, {len(bad)} errors")
    if bad:
        print("errors:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
