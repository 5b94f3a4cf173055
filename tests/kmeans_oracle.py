"""Pure-Python Lloyd's oracle (FIXTURES.md §1.3): the ~30-line reference
implementation of the K1 semantics — first-K init, lowest-index tie-break,
component-wise mean, id-matched max-move ≤ tol stop, empty-cluster drop.
Used to check the DataFrame kernel, never executed on Spark.
"""

from __future__ import annotations

import math


def _euclid(a: tuple[float, ...], b: tuple[float, ...]) -> float:
    """Naive sqrt-of-sum-of-squares, matching the reference's
    euclidean_distance (mapper.py:23-24) and the engine's SQL expression —
    NOT math.dist, whose internal rescaling avoids the denormal underflow
    both the reference and the engine exhibit (and hypothesis finds)."""
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def lloyd_oracle(
    points: list[tuple[float, ...]], k: int, max_iter: int, tol: float = 1e-3
):
    centroids = [tuple(p) for p in points[:k]]
    iterations = 0
    converged = False
    for _ in range(max_iter):
        iterations += 1
        groups: dict[int, list[tuple[float, ...]]] = {}
        for p in points:
            dists = [_euclid(p, c) for c in centroids]
            cid = dists.index(min(dists))  # lowest-index tie-break
            groups.setdefault(cid, []).append(p)
        new_centroids = [
            tuple(
                sum(p[d] for p in groups[cid]) / len(groups[cid])
                for d in range(len(points[0]))
            )
            for cid in sorted(groups)
        ]
        if len(new_centroids) == len(centroids):
            max_move = max(
                _euclid(o, n) for o, n in zip(centroids, new_centroids)
            )
            centroids = new_centroids
            if max_move <= tol:
                converged = True
                break
        else:
            centroids = new_centroids
    return centroids, iterations, converged
