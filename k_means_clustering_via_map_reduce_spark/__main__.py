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


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="k_means_clustering_via_map_reduce_spark",
        description="K-Means over a points file, reference semantics "
        "(first-K init, tol=0.001 convergence, %.4f output).",
    )
    p.add_argument("--points", required=True, help="x,y-per-line input file")
    p.add_argument("--k", type=int, required=True, help="number of clusters")
    p.add_argument("--max-iter", type=int, default=20)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--output", default=None, help="centroids.txt path")
    p.add_argument(
        "--mappers", type=int, default=None, help="accepted and ignored"
    )
    p.add_argument(
        "--reducers", type=int, default=None, help="accepted and ignored"
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
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


if __name__ == "__main__":
    raise SystemExit(main())
