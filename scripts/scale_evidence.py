"""Off-fixture scale evidence for the dedup/ANN family (BASELINE.md §scale).

The plan-shape tests (tests/test_plans.py) PIN that the d1/d2/d3/s2/t6
shuffles carry only scalar rows; this script MEASURES that their cost
actually grows ~linearly with corpus size, which no fixture-scale run can
show. It:

1. builds ×1/×2/×4/×8 corpora from sf0.1 (each copy gets a disjoint
   vocabulary via a per-copy token prefix, so duplicate DENSITY stays
   constant while corpus SIZE scales — naive replication would add
   cross-copy duplicate pairs quadratically and poison the measurement;
   embeddings get a per-copy id offset and a tiny deterministic
   perturbation),
2. runs each operator end-to-end per scale with a job group, and
3. reads wall time + shuffle write bytes/records for exactly that job
   group from the Spark REST API (the same numbers the UI shows).

It also builds the HOT-SHINGLE corpus (one trigram present in every
document) and contrasts exact d1 against the posting-capped variant —
the c² blow-up guard measured, not just asserted.

Run:  python scripts/scale_evidence.py   (writes a markdown table to
stdout; paste/refresh the BASELINE.md "Off-fixture scale evidence"
section from it).

One-off probes can narrow the sweep, e.g. the ×16 decade extension for
the heaviest operators:

    python scripts/scale_evidence.py --mults 16 \\
        --queries d1b_jaccard_capped,p2_curation_pipeline,t6_tfidf_top_terms

(custom --queries skips the d6/hot-shingle extras; --mults entries must
stay powers of two so the d6 cell knob can scale exactly).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.session import _RUNTIME_CONFS, configure

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/kmce_scale_corpus"
MULTS = [1, 2, 4, 8]
QUERIES_UNDER_TEST = [
    "d1_jaccard_pairs",
    "d1b_jaccard_capped",
    "d2_minhash_lsh_pairs",
    "d3_simhash_pairs",
    "s2_lsh_topk",
    "t6_tfidf_top_terms",
    "t9_decontaminate",
    "p3_token_packing",
    "s4_label_centroids",
]


def _spark() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("kmce-scale-evidence")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.ui.enabled", "true")  # REST API is the metrics source
        .config("spark.ui.port", "4047")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure(spark)


def build_corpora(spark: SparkSession) -> None:
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    for m in MULTS:
        out = os.path.join(WORK, f"x{m}")
        if os.path.exists(os.path.join(out, "_DONE")):
            continue
        copies_d = []
        copies_e = []
        for i in range(m):
            # Disjoint vocabulary per copy: prefix every token. Copy 0
            # keeps the original text so ×1 equals the fixture corpus.
            t = (
                F.col("text")
                if i == 0
                else F.regexp_replace("text", r"(\S+)", f"c{i}$1")
            )
            copies_d.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    t.alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
            # Rotate the dimension order per copy (k = 7i mod 64, distinct
            # and nonzero for i in 1..7): components are ~iid, so a copy's
            # cosine against its original is distributed like an UNRELATED
            # pair — duplicate density stays constant as the corpus grows.
            # (An additive epsilon here would make every copy a near-dup of
            # its original: cross-copy pair counts — and any pair-based
            # operator's work — would then grow quadratically with the
            # multiplier, poisoning the linearity measurement.)
            k = (7 * i) % 64
            rot = (
                F.col("embedding")
                if k == 0
                else F.concat(
                    F.slice("embedding", k + 1, 64 - k),
                    F.slice("embedding", 1, k),
                )
            )
            copies_e.append(
                embs.select(
                    (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                    rot.alias("embedding"),
                    "label",
                )
            )
        d = copies_d[0]
        for c in copies_d[1:]:
            d = d.unionAll(c)
        e = copies_e[0]
        for c in copies_e[1:]:
            e = e.unionAll(c)
        d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
        open(os.path.join(out, "_DONE"), "w").close()
    # Hot-shingle corpus: ×1 with one trigram appended to EVERY doc.
    out = os.path.join(WORK, "hot")
    if not os.path.exists(os.path.join(out, "_DONE")):
        docs.select(
            "doc_id",
            F.concat("text", F.lit(" zzhot zzhot zzhot")).alias("text"),
            "lang",
            "source",
            "n_chars",
        ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        embs.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
        open(os.path.join(out, "_DONE"), "w").close()


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4047/api/v1{path}") as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _rest("/applications")[0]["id"]


def shuffle_metrics(app_id: str, group: str) -> tuple[int, int]:
    """(shuffle write bytes, shuffle write records) summed over the
    unique stages of all jobs in ``group``. Write-side is the canonical
    'data moved' number (every shuffled row is written exactly once;
    reads can double-count retried fetches)."""
    jobs = _rest(f"/applications/{app_id}/jobs")
    stage_ids: set[int] = set()
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.update(j["stageIds"])
    by_id: dict[int, tuple[int, int]] = {}
    for s in _rest(f"/applications/{app_id}/stages?status=complete"):
        sid = s["stageId"]
        if sid in stage_ids:
            # keep the last attempt per stage
            by_id[sid] = (s["shuffleWriteBytes"], s["shuffleWriteRecords"])
    return (
        sum(v[0] for v in by_id.values()),
        sum(v[1] for v in by_id.values()),
    )


def _task_shuffle_read_rows(app_id: str, group: str) -> list[int]:
    """Per-task shuffle-read record counts for the heaviest-read stage
    of the jobs in ``group`` — the join stage, where key skew shows up
    as one task reading the hot key's entire partition."""
    jobs = _rest(f"/applications/{app_id}/jobs")
    stage_ids: set[int] = set()
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.update(j["stageIds"])
    best: tuple[int, list[int]] = (0, [])
    for sid in stage_ids:
        try:
            attempts = _rest(f"/applications/{app_id}/stages/{sid}")
        except Exception:
            continue
        for att in attempts:
            if att.get("status") != "COMPLETE":
                continue
            tasks = _rest(
                f"/applications/{app_id}/stages/{sid}/"
                f"{att['attemptId']}/taskList?length=5000"
            )
            reads = [
                t.get("taskMetrics", {})
                .get("shuffleReadMetrics", {})
                .get("recordsRead", 0)
                for t in tasks
                if t.get("taskMetrics")
            ]
            total = sum(reads)
            if total > best[0]:
                best = (total, reads)
    return best[1]


def skew_probe(spark: SparkSession) -> None:
    """VERDICT r04 #7: measure that ``salted_join`` actually flattens a
    skewed key's per-task shuffle distribution (q34 proves result
    equality only). Synthetic zipf-ish workload: 2M probe rows, 50% on
    ONE hot key, the rest uniform over 10k cold keys; 10,001-row build
    side. Broadcast and AQE skew-splitting are disabled for the
    measurement — exactly the documented salting scenario (broadcast
    infeasible, runtime re-planning unavailable/undesired). Reports
    max/median per-task shuffle-read rows for the join stage, salted vs
    plain, plus result-count equality."""
    import statistics

    from k_means_clustering_via_map_reduce_spark.operators.skew import (
        salted_join,
    )

    sc = spark.sparkContext
    app_id = _app_id()
    # Runtime-settable confs; restored after the probe.
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n_probe, n_cold_keys = 2_000_000, 10_000
        probe = spark.range(n_probe, numPartitions=32).select(
            F.col("id").alias("row_id"),
            F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
            .otherwise(
                F.pmod(F.xxhash64("id"), F.lit(n_cold_keys)) + 1
            )
            .cast("bigint")
            .alias("k"),
        )
        build = spark.range(n_cold_keys + 1).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("payload")
        )
        results = []
        for label, df in (
            ("plain_join", probe.join(build, "k")),
            (
                "salted_join(16)",
                salted_join(probe, build, ["k"], probe_id_col="row_id"),
            ),
        ):
            grp = f"skew:{label}"
            sc.setJobGroup(grp, grp)
            t0 = time.perf_counter()
            n = df.count()
            dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            reads = _task_shuffle_read_rows(app_id, grp)
            mx = max(reads) if reads else 0
            med = int(statistics.median(reads)) if reads else 0
            results.append((label, n, dt, mx, med))
            print(
                f"# {grp}: out={n} wall={dt:.1f}s max-task={mx:,} "
                f"median-task={med:,} tasks={len(reads)}",
                file=sys.stderr,
                flush=True,
            )
        assert results[0][1] == results[1][1], "salted join changed results"
        print("\n| variant | out rows | wall s | max task shuffle rows "
              "| median task | max/median skew |")
        print("|---|---|---|---|---|---|")
        for label, n, dt, mx, med in results:
            ratio = mx / med if med else float("inf")
            print(
                f"| {label} | {n:,} | {dt:.1f} | {mx:,} | {med:,} "
                f"| {ratio:.1f}× |"
            )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def incremental_probe(spark: SparkSession) -> None:
    """d9's declared cost shape, measured: a FIXED recrawl batch (built
    from the x1 fixture, 2/5 of its docs) probed against corpora grown
    x1..x8. The dup/ingest split must be IDENTICAL at every corpus size
    (grown copies carry disjoint prefixed vocabularies, so only copy-0
    originals can match the batch), while total shuffle grows with the
    corpus only through the DISTINCT hash-set build — the probe side is
    batch-sized at any corpus scale."""
    sc = spark.sparkContext
    app_id = _app_id()
    src_docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    batch = src_docs.filter(F.col("doc_id") % 5 < 2).select(
        (F.col("doc_id") + 100_000_000).alias("new_id"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" updated")))
        .alias("text"),
    ).localCheckpoint(eager=True)
    rows = []
    for m in MULTS:
        corpus = spark.read.parquet(
            os.path.join(WORK, f"x{m}", "documents.parquet")
        )
        grp = f"incremental:x{m}"
        sc.setJobGroup(grp, grp)
        t0 = time.perf_counter()
        base_h = corpus.select(
            F.md5(F.encode("text", "UTF-8")).alias("h")
        ).distinct()
        newh = batch.select(
            "new_id", F.md5(F.encode("text", "UTF-8")).alias("h")
        )
        dup = newh.join(base_h, "h", "left_semi").count()
        total = batch.count()
        dt = time.perf_counter() - t0
        sc.setJobGroup("", "")
        srows, sbytes = shuffle_metrics(app_id, grp)
        rows.append((f"x{m}", total, dup, total - dup, dt, srows, sbytes))
        print(
            f"# {grp}: batch={total} dup={dup} wall={dt:.1f}s "
            f"shuffle_rows={srows:,} shuffle_MB={sbytes / 1e6:.1f}",
            file=sys.stderr,
            flush=True,
        )
    base_split = (rows[0][2], rows[0][3])
    for r in rows:
        assert (r[2], r[3]) == base_split, \
            f"dup/ingest split changed at {r[0]}: {r[2]}/{r[3]}"
    print("\n| corpus | batch | dup | ingest | wall s | shuffle rows "
          "| shuffle MB |")
    print("|---|---|---|---|---|---|---|")
    for name, total, dup, ing, dt, srows, sbytes in rows:
        print(
            f"| {name} | {total} | {dup} | {ing} | {dt:.1f} "
            f"| {srows:,} | {sbytes / 1e6:.1f} |"
        )


def ann_probe(spark: SparkSession) -> None:
    """VERDICT r05 #6: the similarity family's measured growth decades.
    For each corpus scale, run the approximate searchers (s2 SRP-LSH,
    s3 IVF, s5 PQ-ADC) and the exact filtered searcher (s6) against the
    SAME grown corpus, recording wall time, shuffle-write rows/bytes,
    and recall vs that scale's own brute-force truth (s1). The declared
    scale shapes under test: banded join (s2), cell probe (s3), code
    scan (s5), filter semi-join + broadcast probe (s6) — all shuffle
    corpus-linear or less, never pair-quadratic; recall floors must
    hold at EVERY size (an index whose recall decays with corpus growth
    is mis-banded/mis-celled). Ends with a repeat-run bit-identity
    check at the largest scale: every searcher is deterministic for a
    fixed corpus (seeded hyperplanes / seeded k-means / head-sample
    codebooks), so two runs must hash identically."""
    import hashlib

    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    sc = spark.sparkContext
    app_id = _app_id()
    under_test = ["s2_lsh_topk", "s3_ivf_topk", "s5_pq_adc_topk",
                  "s6_filtered_topk"]
    approx = {"s2_lsh_topk", "s3_ivf_topk", "s5_pq_adc_topk"}
    rows = []
    for m in MULTS:
        sf = os.path.join(WORK, f"x{m}")
        truth: dict[int, set] = {}
        for r in Q.QUERIES["s1_cosine_topk"](spark, sf).collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for qname in under_test:
            group = f"{qname}@x{m}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            got = Q.QUERIES[qname](spark, sf).collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            wb, wr = shuffle_metrics(app_id, group)
            if qname in approx:
                by_q: dict[int, set] = {}
                for r in got:
                    by_q.setdefault(r["query_id"], set()).add(
                        r["neighbor_id"]
                    )
                hits = sum(
                    len(v & by_q.get(k, set())) for k, v in truth.items()
                )
                recall = hits / sum(len(v) for v in truth.values())
            else:
                recall = float("nan")  # s6 is exact within its filter
            rows.append((qname, m, dt, wr, wb, len(got), recall))
            print(
                f"# {group}: {dt:.1f}s shuffleW={wb/1e6:.1f}MB ({wr} rows) "
                f"out={len(got)} recall={recall:.3f}",
                file=sys.stderr,
                flush=True,
            )
        # s5 with its candidate-pool knob scaled with the corpus (the
        # d6 cell-knob pattern): a FIXED rerank pool decays on growing
        # random corpora (the fixed-knob rows above measure that
        # honestly); the operator's scaling contract is C ∝ N — pool
        # rows stay ≪ corpus, recall must then hold at every size.
        from k_means_clustering_via_map_reduce_spark.operators import (
            similarity as S,
        )

        saved_factor = S.PQ_CAND_FACTOR
        S.PQ_CAND_FACTOR = saved_factor * m
        try:
            group = f"s5_pq_adc(Cxm)@x{m}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            got = Q.QUERIES["s5_pq_adc_topk"](spark, sf).collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            wb, wr = shuffle_metrics(app_id, group)
            by_q = {}
            for r in got:
                by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            hits = sum(
                len(v & by_q.get(k, set())) for k, v in truth.items()
            )
            recall = hits / sum(len(v) for v in truth.values())
            rows.append(("s5_pq_adc(Cxm)", m, dt, wr, wb, len(got), recall))
            print(
                f"# {group}: {dt:.1f}s shuffleW={wb/1e6:.1f}MB ({wr} rows) "
                f"out={len(got)} recall={recall:.3f}",
                file=sys.stderr,
                flush=True,
            )
        finally:
            S.PQ_CAND_FACTOR = saved_factor
    print("\n| query | scale | wall s | shuffle rows | shuffle MB "
          "| out | recall vs s1 |")
    print("|---|---|---|---|---|---|---|")
    for qname, m, dt, wr, wb, n, recall in rows:
        rc = "exact" if recall != recall else f"{recall:.3f}"
        print(
            f"| {qname} | x{m} | {dt:.1f} | {wr:,} | {wb/1e6:.1f} "
            f"| {n} | {rc} |"
        )
    # repeat-run bit-identity at the largest scale
    big = os.path.join(WORK, f"x{MULTS[-1]}")
    print("\nrepeat-run check (x%d):" % MULTS[-1])
    for qname in under_test:
        digests = []
        for _ in range(2):
            pdf = Q.QUERIES[qname](spark, big).toPandas()
            canon = sorted(
                tuple(map(str, r))
                for r in pdf[sorted(pdf.columns)].itertuples(
                    index=False, name=None
                )
            )
            digests.append(
                hashlib.sha256(repr(canon).encode()).hexdigest()[:16]
            )
        same = digests[0] == digests[1]
        print(f"  {qname}: {digests[0]} == {digests[1]} -> {same}")
        assert same, f"{qname} not deterministic across reruns"


def ann_persisted_probe(spark: SparkSession) -> None:
    """VERDICT r06 #5: the PERSISTED index family's build/serve split
    measured across corpus growth. For each scale: the first s7/s8 call
    pays the one-time index build (seeded coarse fit, PQ codebooks,
    bucketed table writes); the second call serves purely from the
    saved catalog tables. Records build-call wall, serve-call wall,
    serve shuffle, recall vs that scale's own s1 brute-force truth,
    and a serve-twice bit-identity check. The scale contract under
    test: serve cost tracks the PROBED slice (cells × queries), not
    the corpus — so serve wall must grow far slower than corpus size
    while recall holds; and the build/serve ratio should WIDEN with
    scale (the whole point of persisting the index)."""
    import hashlib

    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    sc = spark.sparkContext
    app_id = _app_id()
    under_test = ["s7_persisted_ivf_topk", "s8_ivfpq_persisted_topk"]
    rows = []
    for m in MULTS:
        sf = os.path.join(WORK, f"x{m}")
        truth: dict[int, set] = {}
        for r in Q.QUERIES["s1_cosine_topk"](spark, sf).collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for qname in under_test:
            # call 1: build + serve (staging key is per-corpus)
            group = f"{qname}:build@x{m}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            Q.QUERIES[qname](spark, sf).collect()
            build_dt = time.perf_counter() - t0
            # call 2: serve-only from the persisted tables
            group = f"{qname}:serve@x{m}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            got = Q.QUERIES[qname](spark, sf).collect()
            serve_dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            wb, wr = shuffle_metrics(app_id, group)
            by_q: dict[int, set] = {}
            for r in got:
                by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            hits = sum(
                len(v & by_q.get(k, set())) for k, v in truth.items()
            )
            recall = hits / sum(len(v) for v in truth.values())
            rows.append((qname, m, build_dt, serve_dt, wr, wb, recall))
            print(
                f"# {qname}@x{m}: build+serve {build_dt:.1f}s, serve "
                f"{serve_dt:.1f}s, shuffleW={wb/1e6:.1f}MB ({wr} rows), "
                f"recall={recall:.3f}",
                file=sys.stderr,
                flush=True,
            )
    print("\n| query | scale | build+serve s | serve s | serve shuffle "
          "rows | serve MB | recall vs s1 |")
    print("|---|---|---|---|---|---|---|")
    for qname, m, bdt, sdt, wr, wb, recall in rows:
        print(
            f"| {qname} | x{m} | {bdt:.1f} | {sdt:.1f} | {wr:,} "
            f"| {wb/1e6:.1f} | {recall:.3f} |"
        )
    # serve-twice bit-identity at the largest scale
    big = os.path.join(WORK, f"x{MULTS[-1]}")
    print("\nserve-twice bit-identity (x%d):" % MULTS[-1])
    for qname in under_test:
        digests = []
        for _ in range(2):
            pdf = Q.QUERIES[qname](spark, big).toPandas()
            canon = sorted(
                tuple(map(str, r))
                for r in pdf[sorted(pdf.columns)].itertuples(
                    index=False, name=None
                )
            )
            digests.append(
                hashlib.sha256(repr(canon).encode()).hexdigest()[:16]
            )
        same = digests[0] == digests[1]
        print(f"  {qname}: {digests[0]} == {digests[1]} -> {same}")
        assert same, f"{qname} serve not deterministic"

    # Serve-knob recovery sweep at the largest scale: the fixed-parameter
    # decay above is a KNOB choice, not an index limitation — recall is
    # recovered at serve time (no rebuild) by probing more cells (s7)
    # and widening the ADC candidate pool with the corpus (s8, the s5
    # C∝N lesson). Records the recall/serve-cost trade each knob buys.
    from k_means_clustering_via_map_reduce_spark.operators.similarity import (
        TOPK_N_QUERIES,
        ivf_pq_search_persisted,
        ivf_search_persisted,
    )

    big_q = (
        spark.read.parquet(os.path.join(big, "embeddings.parquet"))
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .filter(F.col("vec_id") < TOPK_N_QUERIES)
    )
    truth = {}
    for r in Q.QUERIES["s1_cosine_topk"](spark, big).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_truth = sum(len(v) for v in truth.values())

    def _recall(rows) -> float:
        by_q: dict[int, set] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(v & by_q.get(k, set())) for k, v in truth.items()) / n_truth

    print("\nserve-knob recovery sweep (x%d, no rebuild):" % MULTS[-1])
    print("| query | knob | serve s | recall vs s1 |")
    print("|---|---|---|---|")
    for nprobe in (8, 12, 16):
        t0 = time.perf_counter()
        got = ivf_search_persisted(spark, big_q, nprobe=nprobe).collect()
        dt = time.perf_counter() - t0
        print(f"| s7 | nprobe={nprobe} | {dt:.1f} | {_recall(got):.3f} |")
    for nprobe, cf in ((8, 12), (12, 48), (16, 96)):
        t0 = time.perf_counter()
        got = ivf_pq_search_persisted(
            spark, big_q, nprobe=nprobe, cand_factor=cf
        ).collect()
        dt = time.perf_counter() - t0
        print(
            f"| s8 | nprobe={nprobe},cand_factor={cf} | {dt:.1f} "
            f"| {_recall(got):.3f} |"
        )


def main() -> None:
    import argparse

    global MULTS, QUERIES_UNDER_TEST
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mults",
        default=None,
        help="comma-separated corpus multipliers (powers of two)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated query names; when given, the d6 and "
        "hot-shingle extras are skipped",
    )
    ap.add_argument(
        "--incremental",
        action="store_true",
        help="run ONLY the d9 incremental-dedup probe (fixed batch vs "
        "grown corpora, dup-split invariance + shuffle growth)",
    )
    ap.add_argument(
        "--skew",
        action="store_true",
        help="run ONLY the salted-join skew probe (zipf-keyed synthetic "
        "join, per-task shuffle distribution salted vs plain)",
    )
    ap.add_argument(
        "--ann",
        action="store_true",
        help="run ONLY the similarity-family probe (s2/s3/s5/s6 across "
        "grown corpora: wall, shuffle, recall-vs-s1, repeat-run check)",
    )
    ap.add_argument(
        "--ann-persisted",
        action="store_true",
        help="run ONLY the persisted-index probe (s7/s8 build vs serve "
        "walls, serve shuffle, recall-vs-s1, serve-twice bit-identity)",
    )
    args = ap.parse_args()
    if args.skew:
        skew_probe(_spark())
        return
    if args.mults:
        MULTS = [int(x) for x in args.mults.split(",")]
    if args.ann_persisted:
        spark = _spark()
        print("building corpora...", file=sys.stderr, flush=True)
        build_corpora(spark)
        ann_persisted_probe(spark)
        return
    if args.ann:
        spark = _spark()
        print("building corpora...", file=sys.stderr, flush=True)
        build_corpora(spark)
        ann_probe(spark)
        return
    if args.incremental:
        spark = _spark()
        print("building corpora...", file=sys.stderr, flush=True)
        build_corpora(spark)
        incremental_probe(spark)
        return
    run_extras = args.queries is None
    if args.queries:
        QUERIES_UNDER_TEST = args.queries.split(",")

    spark = _spark()
    sc = spark.sparkContext
    print("building corpora...", file=sys.stderr, flush=True)
    build_corpora(spark)
    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    app_id = _app_id()

    # Warm codegen/workers so ×1 isn't penalized by JVM startup.
    Q.QUERIES["d3_simhash_pairs"](spark, os.path.join(WORK, "x1")).count()

    rows = []
    for qname in QUERIES_UNDER_TEST:
        for m in MULTS:
            group = f"{qname}@x{m}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            n = Q.QUERIES[qname](spark, os.path.join(WORK, f"x{m}")).count()
            dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            wb, wr = shuffle_metrics(app_id, group)
            rows.append((qname, m, dt, wb, wr, n))
            print(
                f"# {group}: {dt:.1f}s shuffleW={wb/1e6:.1f}MB "
                f"({wr} rows) out={n}",
                file=sys.stderr,
                flush=True,
            )

    # d6 with the cell-size knob scaled as designed: corpus 2^k times
    # larger runs with SEMANTIC_CELL_BITS + k, holding per-cell pair work
    # constant — measuring the operator's own scaling contract rather
    # than a fixed-cell quadratic strawman.
    if not run_extras:
        _emit_table(rows)
        return
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        SEMANTIC_CELL_BITS,
        semantic_pairs,
    )

    import math

    for m in MULTS:
        # Exact +log2(m): MULTS are powers of two by design; fail loudly
        # rather than silently under-scale the cell knob if someone adds
        # an intermediate multiplier.
        assert m & (m - 1) == 0, f"MULTS must be powers of two, got {m}"
        bits = SEMANTIC_CELL_BITS + int(math.log2(m))
        group = f"d6_semantic@x{m}(b={bits})"
        e = (
            spark.read.parquet(
                os.path.join(WORK, f"x{m}", "embeddings.parquet")
            )
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            )
        )
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        n = semantic_pairs(e, n_bits=bits).count()
        dt = time.perf_counter() - t0
        sc.setJobGroup("", "")
        wb, wr = shuffle_metrics(app_id, group)
        rows.append((f"d6_semantic (b={bits})", m, dt, wb, wr, n))
        print(
            f"# {group}: {dt:.1f}s shuffleW={wb/1e6:.1f}MB ({wr} rows) out={n}",
            file=sys.stderr,
            flush=True,
        )

    # Hot-shingle: exact vs capped on the same corpus.
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _shingled,
        jaccard_pairs_capped,
    )

    hot = os.path.join(WORK, "hot")
    for label, df in [
        ("d1_exact@hot", Q.QUERIES["d1_jaccard_pairs"](spark, hot)),
        (
            "d1_capped1000@hot",
            jaccard_pairs_capped(_shingled(spark, hot), posting_cap=1000),
        ),
    ]:
        sc.setJobGroup(label, label)
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        sc.setJobGroup("", "")
        wb, wr = shuffle_metrics(app_id, label)
        rows.append((label, 1, dt, wb, wr, n))
        print(
            f"# {label}: {dt:.1f}s shuffleW={wb/1e6:.1f}MB ({wr} rows) out={n}",
            file=sys.stderr,
            flush=True,
        )

    _emit_table(rows)


def _emit_table(rows) -> None:
    print("\n| query | corpus | wall s | shuffle write MB | shuffle rows | out rows |")
    print("|---|---|---|---|---|---|")
    for qname, m, dt, wb, wr, n in rows:
        print(
            f"| {qname} | ×{m} | {dt:.1f} | {wb / 1e6:.1f} | {wr:,} | {n:,} |"
        )


if __name__ == "__main__":
    main()
