"""Sinks.

The reference's sinks are hand-rolled text files: per-reducer centroid
lines that DROP the cluster key (``write_centroids_to_file``,
reducer.py:134-137 — despite README.md:79-84 promising (id, centroid)),
a racy shared append-mode accumulator (reducer.py:139-142), and the final
``centroids.txt`` at 4-decimal precision (master.py:264-266).

Engine equivalents: ``df.write`` with explicit format/mode for datasets
(partition-parallel, atomic via the Hadoop commit protocol — no 'w'-mode
clobber races to inherit), and a driver-side writer for the K-row
centroid artifact that preserves both the cluster id (fixing the
reference's key drop) and the reference's exact ``%.4f`` line format for
parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Canonical dataset sink. ``partition_by`` buckets the layout for
    partition-pruned reads downstream (e.g. events by date at 100 TB)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed-table sink: persist ``df`` hash-bucketed on
    ``bucket_cols`` so every later join or aggregation on those keys is
    SHUFFLE-FREE — both sides of an equi-join over same-bucketed tables
    read co-located buckets and merge in place, which at 100 TB is the
    difference between re-shuffling the fact table on every query and
    shuffling it exactly once at write time. ``sort_cols`` additionally
    sorts within each bucket so sort-merge joins skip their sort.

    The frame is pre-partitioned to one task per bucket (Spark's
    repartition and bucket assignment share the same Murmur3 hash), so
    the layout is exactly ``num_buckets`` files, not
    tasks x num_buckets file fragments.
    """
    from pyspark.sql import functions as F

    w = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Interchange sink — the engine form of the reference's text outputs
    (one directory of part files, not a single handle all workers race
    on)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (the reference used JSON only as shuffle
    serialization, mapper.py:71-72; here it is a queryable format)."""
    df.write.mode(mode).json(path)


def write_centroids_txt(
    centroids: list[tuple[float, ...]], path: str, keyed: bool = False
) -> None:
    """The reference's final sink: one centroid per line, coordinates
    rounded to 4 decimals (``f"{x:.4f},{y:.4f}"``, master.py:264-266).
    K rows of driver state — a driver-side write, not a Spark job.

    ``keyed=True`` prefixes the cluster id, providing the (id, centroid)
    output README.md:79-84 documented but reducer.py:134-137 dropped.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i, c in enumerate(centroids):
            coords = ",".join(f"{v:.4f}" for v in c)
            f.write((f"{i}," if keyed else "") + coords + "\n")
