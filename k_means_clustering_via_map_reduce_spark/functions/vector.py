"""Vector math as pure JVM-side column expressions.

The reference computes Euclidean distance with a row-at-a-time Python loop
(``euclidean_distance``, mapper.py:23-24) and argmin with
``list.index(min(...))`` (mapper.py:26-29). Here both are whole-stage-
codegen expressions over ``array<double>`` columns: no Python in the hot
path, vectorized parquet input, n-dimensional by construction (the
reference is accidentally n-dim in its workers but pinned to 2-D by its
protobuf ``Point``; SURVEY.md §1.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (element order fold —
    deterministic left-to-right summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vector_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (vector_norm(a) * vector_norm(b))


def squared_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean_distance_cols(a: Column, b: Column) -> Column:
    """n-dim Euclidean distance, the engine form of mapper.py:23-24."""
    return F.sqrt(squared_distance(a, b))


def centroid_literal(centroids: Sequence[Sequence[float]]) -> Column:
    """Embed the (small, K-row) centroid list as a literal
    array<array<double>> column — the Spark-native form of the reference's
    per-task centroid broadcast (master.py:64-66, comm.proto:21). For K
    centroids this is O(K·dim) plan size; genuinely large centroid sets
    should use a broadcast join instead.
    """
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )


def nearest_centroid(point: Column, centroids: Sequence[Sequence[float]]) -> Column:
    """0-based index of the nearest centroid; ties break to the lowest
    index, matching the reference's ``list.index(min(dists))``
    (mapper.py:28): ``array_position`` returns the FIRST occurrence of the
    min, and the min value is bit-identical to the element it came from.

    The comparison is over TRUE (sqrt) distances, not squared ones —
    algebraically equivalent, but not in floating point: sqrt compresses
    sub-ulp differences into EXACT ties (e.g. candidate distances
    sqrt(2.0) vs sqrt(2.0 + 4e-16) round to the same double), and the
    reference compares after its sqrt (mapper.py:23-24), so a
    squared-space argmin would break the wrong way on those ties —
    found by the hypothesis property test with adversarial denormals."""
    dists = F.transform(
        centroid_literal(centroids),
        lambda c: euclidean_distance_cols(point, c),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
