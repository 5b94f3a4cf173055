"""CLI entry — the reference's interactive ``python master.py`` run
(stdin prompts for point file, M, R, K, max iterations,
master.py:199-206) as a batch command:

    python -m k_means_clustering_via_map_reduce_spark \
        --points Input/points2.txt --k 4 --max-iter 7 \
        --output centroids.txt

``--mappers``/``--reducers`` are accepted for parity with the
reference's prompts and ignored (Spark's scheduler owns physical
parallelism, SURVEY.md §4.2).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="k_means_clustering_via_map_reduce_spark",
        description="K-Means over a points file, reference semantics "
        "(first-K init, tol=0.001 convergence, %.4f output).",
    )
    p.add_argument("--points", default=None, help="x,y-per-line input file")
    p.add_argument("--k", type=int, default=None, help="number of clusters")
    p.add_argument("--max-iter", type=int, default=20)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--output", default=None, help="centroids.txt path")
    p.add_argument(
        "--mappers", type=int, default=None, help="accepted and ignored"
    )
    p.add_argument(
        "--reducers", type=int, default=None, help="accepted and ignored"
    )
    p.add_argument(
        "--explain-query",
        metavar="NAME",
        default=None,
        help="instead of the K-Means run: print the named registered "
        "query's formatted physical plan + scale summary (shuffles, "
        "joins, pushed filters) over --sf-dir",
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR"),
        help="fixture dir for --explain-query (default: the "
        "SPARK_GRAFT_SF_DIR env var, as bench.py uses)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.explain_query is not None:
        if args.sf_dir is None:
            parser.error(
                "--explain-query needs a fixture dir: pass --sf-dir or "
                "set SPARK_GRAFT_SF_DIR"
            )
        return _explain(args.explain_query, args.sf_dir)
    if args.points is None or args.k is None:
        parser.error("--points and --k are required (or use --explain-query)")
    from k_means_clustering_via_map_reduce_spark.engine import Engine

    res = Engine().run_reference_workload(
        args.points,
        num_clusters=args.k,
        max_iterations=args.max_iter,
        num_mappers=args.mappers,
        num_reducers=args.reducers,
        tol=args.tol,
        output_path=args.output,
    )
    for line in res.formatted():
        print(line)
    print(
        f"# iterations={res.iterations} converged={res.converged} "
        f"k={len(res.centroids)}"
    )
    return 0


def _explain(name: str, sf_dir: str) -> int:
    """Plan observability for the declared surface — the engine-side
    replacement for the reference's dump_master.txt log trawling."""
    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.plans import (
        broadcast_hash_join_count,
        count_shuffles,
        physical_plan,
        pushed_filters,
        whole_stage_codegen_spans,
    )
    from k_means_clustering_via_map_reduce_spark.session import get_spark

    Q.load_all()
    if name not in Q.QUERIES:
        print(f"unknown query: {name}; known: {', '.join(sorted(Q.QUERIES))}")
        return 2
    df = Q.QUERIES[name](get_spark(app_name="kmce-explain"), sf_dir)
    print(physical_plan(df))
    print(f"# shuffles={count_shuffles(df)}"
          f" broadcast_joins={broadcast_hash_join_count(df)}"
          f" codegen_spans={whole_stage_codegen_spans(df)}")
    for f in pushed_filters(df):
        print(f"# pushed: {f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
