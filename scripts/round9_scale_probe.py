"""Round-9 scale evidence (VERDICT r08 "Next round" #5):

1. d11b capped-vs-uncapped segment near-dup curve, ×1→×8 with a PLANTED
   GLOBAL HOT SHINGLE. Corpus copies get disjoint vocabularies (the
   scale_evidence.py discipline — duplicate density constant), but one
   bigram ("zzhot zzhot") is appended to EVERY document in EVERY copy,
   so its per-lang segment-df grows linearly with scale and the
   uncapped pair join's hot component grows QUADRATICALLY. The capped
   arm (posting_cap=300, binding at every scale here) must flatten
   back to ~linear: the d1b posting-cap discipline measured at segment
   granularity. Metrics per arm per scale: the pair-JOIN's output
   cardinality (counted directly — Catalyst chains join -> both aggs
   in one exchange-free stage by reusing the (lang, seg) partitioning,
   so shuffle metrics cannot see this volume), the max surviving
   posting size (the per-key fan-out bound: grows with the corpus
   uncapped, <= cap by construction capped), and the full family-calc
   wall time.

2. f24 connector prune curve under growing file counts (16/64/256
   single-file commits): a selective range probe through the
   kmce_versioned DataSource must plan O(selected) input partitions and
   stay ~flat in wall time while the full scan grows with the table.

Run: python scripts/round9_scale_probe.py  (markdown to stdout; paste
into BASELINE.md round-9 sections).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_evidence import (  # noqa: E402
    _app_id,
    _spark,
    shuffle_metrics,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/kmce_r9_corpus_h1"
MULTS = (1, 2, 4, 8)
HOT_EVERY = 1  # EVERY doc carries the global hot bigram
PROBE_CAP = 300  # binds from x2 on this corpus's lang mix


def build_hot_corpora(spark: SparkSession) -> None:
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    for m in MULTS:
        out = os.path.join(WORK, f"x{m}")
        if os.path.exists(os.path.join(out, "_DONE")):
            continue
        copies = []
        for i in range(m):
            t = (
                F.col("text")
                if i == 0
                else F.regexp_replace("text", r"(\S+)", f"c{i}$1")
            )
            # the hot bigram is NOT prefixed: global across copies, so
            # its segment-df scales with the corpus while every other
            # shingle's stays constant
            t = F.when(
                F.col("doc_id") % HOT_EVERY == 0,
                F.concat(t, F.lit(" zzhot zzhot")),
            ).otherwise(t)
            copies.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias(
                        "doc_id"
                    ),
                    t.alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        d = copies[0]
        for c in copies[1:]:
            d = d.unionAll(c)
        d.write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        open(os.path.join(out, "_DONE"), "w").close()


def _pair_join_rows(docs, cap) -> int:
    """Row count of the shingle-posting self-join — segment_family_df's
    dominant intermediate, counted with the same prunes. Catalyst runs
    join -> n_common agg -> partner agg in ONE stage here (the groupBy
    keys extend the (lang, seg) hash partitioning the dist agg already
    established — zero extra exchanges), so shuffle metrics CANNOT see
    this volume; the join's own output cardinality is the honest cost
    number, and a count() of a join is row-semantics, not a prunable
    column scan."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        D11_JACCARD,
        D11_SHINGLE_W,
        SEGMENT_WORDS,
    )

    w = F.split(F.trim(F.col("text")), " ")
    seg_expr = F.expr(
        f"transform(sequence(0, cast(ceil(size(w) / {SEGMENT_WORDS}.0)"
        f" as int) - 1), i -> array_join(slice(w, i * {SEGMENT_WORDS}"
        f" + 1, {SEGMENT_WORDS}), ' '))"
    )
    segs = docs.select("doc_id", "lang", w.alias("w")).select(
        "doc_id", "lang", F.posexplode(seg_expr).alias("seg_idx", "seg")
    )
    dist = segs.groupBy("lang", "seg").agg(
        F.countDistinct("doc_id").alias("df")
    )
    sw = F.split(F.col("seg"), " ")
    shingle_expr = F.when(
        F.size(sw) >= D11_SHINGLE_W,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(split(seg, ' ')) -"
                f" {D11_SHINGLE_W - 1}), i -> array_join(slice("
                f"split(seg, ' '), i, {D11_SHINGLE_W}), ' '))"
            )
        ),
    ).otherwise(F.array(F.col("seg")))
    sh = dist.withColumn("sh", shingle_expr).withColumn(
        "n_sh", F.size("sh")
    )
    ex = sh.select(
        "lang", "seg", "df", "n_sh", F.explode("sh").alias("sg")
    )
    if cap is not None:
        keep = (
            ex.groupBy("lang", "sg")
            .agg(F.count(F.lit(1)).alias("seg_df"))
            .filter(F.col("seg_df") <= cap)
            .select("lang", "sg")
        )
        ex = ex.join(keep, ["lang", "sg"])
    # max surviving posting list: the per-key bound on join fan-out —
    # uncapped it grows with the corpus (the hot shingle), capped it is
    # <= cap BY CONSTRUCTION, which is the whole claim
    max_posting = (
        ex.groupBy("lang", "sg")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    a, b = ex.alias("a"), ex.alias("b")
    n = a.join(
        b,
        [
            F.col("a.sg") == F.col("b.sg"),
            F.col("a.lang") == F.col("b.lang"),
            F.col("a.seg") != F.col("b.seg"),
            F.col("a.n_sh") >= D11_JACCARD * F.col("b.n_sh"),
            F.col("b.n_sh") >= D11_JACCARD * F.col("a.n_sh"),
        ],
    ).count()
    return n, max_posting


def d11b_probe(spark: SparkSession) -> None:
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        segment_family_df,
    )

    print("\n## Round-9 d11b capped-vs-uncapped curve (planted hot shingle)")
    print(f"(sf0.1 ×1→×8, hot bigram in every {HOT_EVERY}th doc across "
          f"copies; cap={PROBE_CAP})")
    print("| scale | arm | pair-join rows | max posting | wall s (full family calc) |")
    print("|---|---|---|---|---|")
    for m in MULTS:
        docs = spark.read.parquet(
            os.path.join(WORK, f"x{m}", "documents.parquet")
        )
        for arm, cap in (("uncapped", None), ("capped", PROBE_CAP)):
            pairs, max_posting = _pair_join_rows(docs, cap)
            t0 = time.time()
            fam = segment_family_df(docs, posting_cap=cap)
            fam.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("family_df").alias("mass"),
            ).collect()
            wall = time.time() - t0
            print(
                f"| ×{m} | {arm} | {pairs:,} | {max_posting:,} "
                f"| {wall:.1f} |"
            )


def f24_probe(spark: SparkSession) -> None:
    import shutil
    import tempfile

    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        register_versioned_source,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    register_versioned_source(spark)
    rows_per = 10_000
    print("\n## Round-9 f24 connector prune curve (growing file counts)")
    print(f"({rows_per} rows/file, probe = one file's id range; "
          "partitions from the post-prune RDD)")
    print("| files | probe partitions | probe s | full-scan partitions "
          "| full s |")
    print("|---|---|---|---|---|")
    for n_files in (16, 64, 256):
        root = tempfile.mkdtemp(prefix=f"kmce_f24_{n_files}_")
        try:
            for b in range(n_files):
                commit_append(
                    spark.range(b * rows_per, (b + 1) * rows_per)
                    .select(F.col("id"), (F.col("id") % 97).alias("v"))
                    .coalesce(1),
                    root,
                )
            lo, hi = 0, rows_per - 1  # exactly the first file
            t0 = time.time()
            probe = (
                spark.read.format("kmce_versioned")
                .option("root", root)
                .load()
                .filter((F.col("id") >= lo) & (F.col("id") <= hi))
            )
            n_probe = probe.count()
            t_probe = time.time() - t0
            p_probe = probe.rdd.getNumPartitions()
            t0 = time.time()
            full = (
                spark.read.format("kmce_versioned")
                .option("root", root)
                .load()
            )
            n_full = full.count()
            t_full = time.time() - t0
            p_full = full.rdd.getNumPartitions()
            assert n_probe == rows_per, n_probe
            assert n_full == n_files * rows_per, n_full
            print(
                f"| {n_files} | {p_probe} | {t_probe:.2f} | {p_full} "
                f"| {t_full:.2f} |"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = _spark()
    only = [a for a in sys.argv[1:] if a.startswith("--")]
    if only == ["--k26-only"]:
        k26_probe(spark)
        return
    if "--f24-only" not in sys.argv:
        build_hot_corpora(spark)
        d11b_probe(spark)
    if "--d11b-only" not in sys.argv:
        f24_probe(spark)
        k26_probe(spark)




def k26_probe(spark: SparkSession) -> None:
    """Sliding-window maintenance cost shape: per-refresh wall and
    state size as HISTORY grows — the window bounds the state, the
    diff bounds the refresh, and retraction cost tracks the expired
    sub-aggregates, not the history length."""
    import shutil
    import tempfile

    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts_window,
        windowed_token_counts,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_manifest,
        latest_version,
    )

    rows_per = 2_000
    print("\n## Round-9 k26 sliding-window maintenance cost (history growth)")
    print(f"({rows_per} docs/commit, window=2; wall is the FULL refresh "
          "incl. retraction)")
    print("| history versions | refresh wall s | state rows | state files |")
    print("|---|---|---|---|")
    base = tempfile.mkdtemp(prefix="kmce_k26_")
    corpus = os.path.join(base, "corpus")
    state = os.path.join(base, "state")
    try:
        checkpoints = {1, 2, 4, 8, 16, 32}
        for n in range(1, 33):
            commit_append(
                spark.range(n * 100_000, n * 100_000 + rows_per).selectExpr(
                    "id AS doc_id",
                    # ~40 tokens/doc, version-salted vocab so each diff
                    # contributes fresh tokens (worst case for state)
                    f"concat_ws(' ', transform(sequence(1, 40),"
                    f" i -> concat('v{n}w', pmod(id * i, 500)))) AS text",
                ),
                corpus,
            )
            t0 = time.time()
            refresh_token_counts_window(spark, corpus, state, window=2)
            wall = time.time() - t0
            if n in checkpoints:
                srows = windowed_token_counts(spark, state).count()
                sfiles = len(
                    read_manifest(state, latest_version(state))["files"]
                )
                print(f"| {n} | {wall:.1f} | {srows:,} | {sfiles} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)

if __name__ == "__main__":
    main()
