"""Versioned-table lifecycle cost-shape probe (BASELINE.md §round-6).

f18/f20/k21 claim the manifest-per-version table's commit cost is
"metadata-proportional": one distributed parquet write + one driver-side
manifest that lists the parent's files plus the new ones. That claim has
a real scale shape worth MEASURING, not asserting:

- commit i's metadata term is O(files(i)) — cumulative manifests copy
  the parent file list, so N one-file-per-commit appends cost O(N^2)
  cumulative metadata bytes without compaction. This is the same
  pathology Delta Lake checkpoints / Iceberg manifest-lists exist for,
  and f20's OPTIMIZE (a REPLACING snapshot) is this table's repair.
- read-at-version planning is O(files named by THAT manifest), never
  O(table history) — old small files behind a compacted version cost
  its readers nothing.

The probe measures four things on a real table (constant-size batches,
so any growth is history-driven, not data-driven) and one synthetic
metadata-only sweep (the Spark write's fixed cost hides the O(files)
term at probe scale; fabricated manifests of 10^3..10^6 entries isolate
it):

1. per-commit wall time at commit 1..N (expect ~flat: the distributed
   write dominates at probe scale);
2. manifest bytes + file count at version checkpoints (expect linear);
3. read-at-version wall for early/mid/late versions (expect ~linear in
   that version's file count);
4. commit-after-compaction: OPTIMIZE at version N, then more appends —
   their manifests shrink back to O(1 + k) entries;
5. driver-side commit metadata cost vs fabricated parent-manifest size
   (read parent manifest + extend + write new), no Spark involved.

Run: python scripts/versioned_lifecycle_probe.py  (prints the markdown
tables; paste/refresh the BASELINE.md section from them).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from k_means_clustering_via_map_reduce_spark.session import configure
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    _manifest_path,
    commit_append,
    compact,
    read_manifest,
    read_version,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_COMMITS = 96
POST_COMPACT_COMMITS = 8
CHECKPOINTS = (1, 8, 16, 32, 64, 96)


def _spark() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("kmce-versioned-probe")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)
    return spark


def real_table_probe(spark: SparkSession) -> None:
    events = (
        spark.read.parquet(os.path.join(SRC, "events.parquet"))
        .select("event_id", "event_type", "value")
        .limit(2000)
        .cache()
    )
    events.count()
    with tempfile.TemporaryDirectory(prefix="kmce_vprobe_") as tmp:
        root = os.path.join(tmp, "table")
        walls: list[float] = []
        for i in range(N_COMMITS):
            batch = events.coalesce(1)  # constant size, one file/commit
            t0 = time.time()
            commit_append(batch, root)
            walls.append(time.time() - t0)
        print("\n### per-commit wall (constant 2000-row 1-file batches)\n")
        print("| commits | wall s (mean of window) | manifest files | manifest bytes |")
        print("|---|---|---|---|")
        for cp in CHECKPOINTS:
            lo = max(0, cp - 8)
            window = walls[lo:cp]
            man = read_manifest(root, cp)
            print(
                f"| {cp} | {sum(window)/len(window):.3f} | "
                f"{len(man['files'])} | "
                f"{os.path.getsize(_manifest_path(root, cp))} |"
            )
        print("\n### read-at-version wall (count(), planning + scan)\n")
        print("| version | files | wall s |")
        print("|---|---|---|")
        for v in (8, 32, 96):
            t0 = time.time()
            n = read_version(spark, root, v).count()
            man = read_manifest(root, v)
            print(f"| {v} | {len(man['files'])} | {time.time() - t0:.3f} |")
            assert n == 2000 * v, (v, n)
        t0 = time.time()
        cv = compact(spark, root, target_files=1)
        t_compact = time.time() - t0
        post = []
        for i in range(POST_COMPACT_COMMITS):
            t0 = time.time()
            commit_append(events.coalesce(1), root)
            post.append(time.time() - t0)
        man_last = read_manifest(root, cv + POST_COMPACT_COMMITS)
        t0 = time.time()
        n = read_version(spark, root).count()
        t_read = time.time() - t0
        assert n == 2000 * (N_COMMITS + POST_COMPACT_COMMITS), n
        print(f"\ncompact at v{N_COMMITS} -> v{cv}: {t_compact:.2f} s "
              f"(96 files -> 1, narrow coalesce rewrite)")
        print(f"post-compaction commits: mean {sum(post)/len(post):.3f} s, "
              f"latest manifest files = {len(man_last['files'])} "
              f"(1 compacted + {POST_COMPACT_COMMITS} appends)")
        print(f"read latest (v{cv + POST_COMPACT_COMMITS}) after compaction: "
              f"{t_read:.3f} s")


def metadata_only_probe() -> None:
    """Driver-side commit metadata term in isolation: parent manifest of
    F fabricated entries -> read, extend by 1, json-dump the child. No
    Spark, no data files."""
    print("\n### metadata-only commit term vs parent manifest size\n")
    print("| parent files | read+extend+write s | manifest MB |")
    print("|---|---|---|")
    with tempfile.TemporaryDirectory(prefix="kmce_vmeta_") as tmp:
        for f_count in (1_000, 10_000, 100_000, 1_000_000):
            root = os.path.join(tmp, f"t{f_count}")
            os.makedirs(os.path.join(root, "_manifests"))
            files = [
                f"data/txn-00001-abcdef/part-{i:06d}-"
                f"0123456789abcdef.snappy.parquet"
                for i in range(f_count)
            ]
            with open(_manifest_path(root, 1), "w") as fh:
                json.dump(
                    {"version": 1, "parent": 0, "files": files,
                     "added": files}, fh,
                )
            best = min(
                _time_meta_commit(root) for _ in range(3)
            )
            mb = os.path.getsize(_manifest_path(root, 1)) / 1e6
            print(f"| {f_count:,} | {best:.3f} | {mb:.1f} |")
            shutil.rmtree(root)


def _time_meta_commit(root: str) -> float:
    t0 = time.time()
    man = read_manifest(root, 1)
    child = {
        "version": 2,
        "parent": 1,
        "files": man["files"] + ["data/txn-00002-fedcba/part-000000.parquet"],
        "added": ["data/txn-00002-fedcba/part-000000.parquet"],
    }
    tmp = _manifest_path(root, 2) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(child, fh)
    os.remove(tmp)
    return time.time() - t0


def cow_probe(spark) -> None:
    """Round-7 delete/update cost shape: a COW rewrite touching f of N
    files must cost O(f) data work — wall and files-rewritten should
    track the AFFECTED count, never the table size, and every clean
    file must carry into the new manifest by name."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        delete_where,
    )

    print("\n## COW delete cost shape (20-file table, O(affected) claim)")
    print("| files touched | wall s | files rewritten | files carried |")
    print("|---|---|---|---|")
    for touch in (1, 5, 10, 20):
        root = tempfile.mkdtemp(prefix="kmce_cow_probe_")
        try:
            for b in range(20):
                commit_append(
                    spark.range(b * 1000, (b + 1) * 1000)
                    .select(
                        F.col("id"),
                        (F.col("id") % 97).alias("v"),
                    )
                    .coalesce(1),
                    root,
                )
            before = read_manifest(root, 20)["files"]
            # delete one row from each of the first `touch` buckets
            ids = ", ".join(str(b * 1000 + 7) for b in range(touch))
            t0 = time.time()
            v = delete_where(spark, root, f"id IN ({ids})")
            dt = time.time() - t0
            m = read_manifest(root, v)
            carried = len([f for f in before if f in m["files"]])
            print(
                f"| {touch} | {dt:.2f} | {len(m['deleted_from'])} "
                f"| {carried} |"
            )
            assert len(m["deleted_from"]) == touch
            assert carried == 20 - touch
        finally:
            shutil.rmtree(root, ignore_errors=True)


def merge_probe(spark) -> None:
    """Round-8 merge cost shape: a MERGE whose source keys land in f of
    N files must rewrite exactly those f files (plus one insert file)
    and carry the rest by name — O(affected + source), like delete."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        merge_into,
    )

    print("\n## COW merge cost shape (20-file table, O(affected) claim)")
    print("| files touched | wall s | files rewritten | files carried |")
    print("|---|---|---|---|")
    for touch in (1, 5, 10, 20):
        root = tempfile.mkdtemp(prefix="kmce_merge_probe_")
        try:
            for b in range(20):
                commit_append(
                    spark.range(b * 1000, (b + 1) * 1000)
                    .select(
                        F.col("id"),
                        (F.col("id") % 97).alias("v"),
                    )
                    .coalesce(1),
                    root,
                )
            before = read_manifest(root, 20)["files"]
            # update one row in each of the first `touch` buckets,
            # plus one brand-new insert
            src_rows = [(b * 1000 + 7, -1) for b in range(touch)]
            src_rows.append((10_000_000, -2))
            src = spark.createDataFrame(src_rows, "id BIGINT, v BIGINT")
            t0 = time.time()
            v = merge_into(spark, root, src, "id")
            dt = time.time() - t0
            m = read_manifest(root, v)
            carried = len([f for f in before if f in m["files"]])
            print(
                f"| {touch} | {dt:.2f} | {len(m['merged_from'])} "
                f"| {carried} |"
            )
            assert len(m["merged_from"]) == touch
            assert carried == 20 - touch
        finally:
            shutil.rmtree(root, ignore_errors=True)


def skipping_probe(spark) -> None:
    """Round-8 f23 arm: manifest-stats file skipping vs predicate
    selectivity on a 64-file range-clustered table. The claim: the
    prune is O(#files) DRIVER metadata, and the SCAN cost then tracks
    the KEPT file count, not the table size — the difference between
    'hand Spark 64 files and let row-group stats save you' and 'hand
    Spark exactly the files that can match'."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        prune_files,
    )

    n_files = 64
    rows_per = 10_000
    print("\n## f23 data skipping vs selectivity (64-file table, "
          f"{rows_per} rows/file)")
    print("| files kept | prune ms (driver) | pruned scan s | full scan s |")
    print("|---|---|---|---|")
    root = tempfile.mkdtemp(prefix="kmce_skip_probe_")
    try:
        ver = 0
        for b in range(n_files):
            ver = commit_append(
                spark.range(b * rows_per, (b + 1) * rows_per)
                .select(F.col("id"), (F.col("id") % 97).alias("v"))
                .coalesce(1),
                root,
            )
        for keep in (1, 4, 16, 64):
            lo = 0
            hi = keep * rows_per - 1
            t0 = time.time()
            kept = prune_files(root, ver, "id", lo, hi)
            prune_ms = (time.time() - t0) * 1e3
            assert len(kept) == keep, (keep, len(kept))
            pred = (F.col("id") >= lo) & (F.col("id") <= hi)
            t0 = time.time()
            n_pruned = (
                spark.read.parquet(*[os.path.join(root, f) for f in kept])
                .filter(pred)
                .count()
            )
            t_pruned = time.time() - t0
            man = read_manifest(root, ver)
            t0 = time.time()
            n_full = (
                spark.read.parquet(
                    *[os.path.join(root, f) for f in man["files"]]
                )
                .filter(pred)
                .count()
            )
            t_full = time.time() - t0
            assert n_pruned == n_full == keep * rows_per
            print(f"| {keep} | {prune_ms:.1f} | {t_pruned:.3f} "
                  f"| {t_full:.3f} |")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def feed_probe(spark) -> None:
    """Round-8 k23 arm: change-feed restart incrementality under
    history growth. A cold checkpoint drains all H versions; a RESTART
    after 2 more commits must consume exactly those 2 — wall ~flat in
    H (offset resume is a manifest lookup, never a re-read), the
    property that makes the feed a scheduled-job primitive."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        register_version_feed_source,
    )

    register_version_feed_source(spark)
    rows_per = 2_000
    print("\n## k23 change-feed restart incrementality (x1->x8 history)")
    print("| history H | cold drain s | cold rows | restart s "
          "| restart rows |")
    print("|---|---|---|---|---|")
    for h in (8, 16, 32, 64):
        tmp = tempfile.mkdtemp(prefix="kmce_feed_probe_")
        try:
            root = os.path.join(tmp, "t")
            sink, ckpt = os.path.join(tmp, "s"), os.path.join(tmp, "c")
            for b in range(h):
                commit_append(
                    spark.range(b * rows_per, (b + 1) * rows_per)
                    .select(F.col("id"), (F.col("id") % 97).alias("v"))
                    .coalesce(1),
                    root,
                )

            def run() -> None:
                q = (
                    spark.readStream.format("kmce_version_feed")
                    .option("root", root)
                    .load()
                    .writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            t0 = time.time()
            run()
            t_cold = time.time() - t0
            n_cold = spark.read.parquet(sink).count()
            for b in (h, h + 1):
                commit_append(
                    spark.range(b * rows_per, (b + 1) * rows_per)
                    .select(F.col("id"), (F.col("id") % 97).alias("v"))
                    .coalesce(1),
                    root,
                )
            t0 = time.time()
            run()
            t_restart = time.time() - t0
            n_total = spark.read.parquet(sink).count()
            assert n_cold == h * rows_per, (h, n_cold)
            assert n_total == (h + 2) * rows_per, (h, n_total)
            print(f"| {h} | {t_cold:.2f} | {n_cold} | {t_restart:.2f} "
                  f"| {n_total - n_cold} |")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def zorder_probe(spark) -> None:
    """Round-8 f25 arm: files kept under a 2-D range probe, Z-ordered
    layout vs 1-D sort layout, at 64 files. Columns are independent
    (y is a multiplicative-hash scramble of x), so the 1-D layout's
    per-file y-bounds span the whole domain — the quantified version
    of the claim tests/test_zorder.py pins structurally."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        prune_files,
        read_manifest,
        zorder_commit,
    )

    n, files = 262_144, 64
    d = spark.range(n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % n).alias("y"),
    )
    print("\n## f25 Z-order vs 1-D layout: files kept under 2-D probes "
          f"({files}-file table, {n} rows)")
    print("| probe (frac of each dim) | kept (z) | kept (1-D x-sort) |")
    print("|---|---|---|")
    zroot = tempfile.mkdtemp(prefix="kmce_zp_")
    lroot = tempfile.mkdtemp(prefix="kmce_lp_")
    try:
        vz = zorder_commit(d, zroot, "x", "y", n_files=files, bits=12)
        vl = commit_append(
            d.repartitionByRange(files, "x").sortWithinPartitions("x"),
            lroot,
        )
        assert len(read_manifest(zroot, vz)["files"]) == files
        for frac in (8, 4, 2):
            w = n // frac
            kz = set(prune_files(zroot, vz, "x", 0, w - 1)) & set(
                prune_files(zroot, vz, "y", 0, w - 1)
            )
            kl = set(prune_files(lroot, vl, "x", 0, w - 1)) & set(
                prune_files(lroot, vl, "y", 0, w - 1)
            )
            print(f"| 1/{frac} x 1/{frac} | {len(kz)} | {len(kl)} |")
    finally:
        shutil.rmtree(zroot, ignore_errors=True)
        shutil.rmtree(lroot, ignore_errors=True)



def incremental_probe_r8(spark) -> None:
    """Round-8 incremental-maintenance cost shape: with H corpus
    versions already processed, the NEXT refresh (one new version)
    must cost ~flat wall regardless of H — the refresh reads only the
    diff plus the vocabulary-sized state, never the corpus."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts,
    )

    rows_per = 2_000
    print("\n## incremental refresh wall vs processed history (x1->x8)")
    print("| history H | catch-up s (H versions) | +1 refresh s "
          "| state rows |")
    print("|---|---|---|---|")
    for h in (8, 16, 32, 64):
        tmp = tempfile.mkdtemp(prefix="kmce_incprobe_")
        try:
            corpus = os.path.join(tmp, "c")
            state = os.path.join(tmp, "s")
            for b in range(h):
                commit_append(
                    spark.range(b * rows_per, (b + 1) * rows_per)
                    .select(
                        F.col("id").alias("doc_id"),
                        F.concat(
                            F.lit("tok"),
                            (F.col("id") % 500).cast("string"),
                            F.lit(" tok"),
                            (F.col("id") % 501).cast("string"),
                        ).alias("text"),
                    )
                    .coalesce(1),
                    corpus,
                )
            t0 = time.time()
            refresh_token_counts(spark, corpus, state)
            t_catchup = time.time() - t0
            commit_append(
                spark.range(h * rows_per, (h + 1) * rows_per)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat(
                        F.lit("tok"), (F.col("id") % 500).cast("string")
                    ).alias("text"),
                )
                .coalesce(1),
                corpus,
            )
            t0 = time.time()
            refresh_token_counts(spark, corpus, state)
            t_inc = time.time() - t0
            from k_means_clustering_via_map_reduce_spark.operators.incremental import (  # noqa: E501
                token_counts_state,
            )

            n_state = token_counts_state(spark, state).count()
            print(f"| {h} | {t_catchup:.2f} | {t_inc:.2f} | {n_state} |")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    if "--zorder" in sys.argv:
        spark = _spark()
        zorder_probe(spark)
        spark.stop()
        return
    if "--cow" in sys.argv:
        spark = _spark()
        cow_probe(spark)
        spark.stop()
        return
    if "--round8" in sys.argv:
        spark = _spark()
        skipping_probe(spark)
        feed_probe(spark)
        spark.stop()
        return
    if "--merge" in sys.argv:
        spark = _spark()
        merge_probe(spark)
        spark.stop()
        return
    if "--incremental" in sys.argv:
        spark = _spark()
        incremental_probe_r8(spark)
        spark.stop()
        return
    spark = _spark()
    real_table_probe(spark)
    metadata_only_probe()
    cow_probe(spark)
    skipping_probe(spark)
    feed_probe(spark)
    zorder_probe(spark)
    merge_probe(spark)
    incremental_probe_r8(spark)
    spark.stop()


if __name__ == "__main__":
    main()
