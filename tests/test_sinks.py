"""Sink round-trips: every writer must produce data the matching reader
recovers exactly, and the centroid text sink must reproduce the
reference's ``centroids.txt`` format (master.py:264-266)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources import (
    load_table,
    write_centroids_txt,
    write_csv,
    write_json,
    write_parquet,
)


def _collect_sorted(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_parquet_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_pq")
    write_parquet(src, out)
    back = spark.read.parquet(out)
    assert _collect_sorted(back, "o_orderkey") == _collect_sorted(src, "o_orderkey")


def test_parquet_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """partitionBy produces a hive layout whose partitions a filtered read
    prunes (the scan only lists matching directories)."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_part")
    write_parquet(src, out, partition_by=("o_orderstatus",))
    statuses = {
        r["o_orderstatus"] for r in src.select("o_orderstatus").distinct().collect()
    }
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}
    one = sorted(statuses)[0]
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == one)
    want = src.filter(F.col("o_orderstatus") == one)
    assert back.count() == want.count()


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(src, out)
    back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert _collect_sorted(back, "n_nationkey") == _collect_sorted(src, "n_nationkey")


def test_json_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    write_json(src, out)
    back = spark.read.schema(src.schema).json(out)
    assert _collect_sorted(back, "r_regionkey") == _collect_sorted(src, "r_regionkey")


def test_centroids_txt_reference_format(tmp_path):
    cents = [(86.80427551269531, 24.972623825073242), (1.5, -2.0)]
    path = str(tmp_path / "centroids.txt")
    write_centroids_txt(cents, path)
    lines = open(path).read().splitlines()
    # the reference's '%.4f,%.4f' per line, no key (master.py:266)
    assert lines == ["86.8043,24.9726", "1.5000,-2.0000"]


def test_centroids_txt_keyed(tmp_path):
    cents = [(0.0, 1.0), (2.0, 3.0)]
    path = str(tmp_path / "centroids_keyed.txt")
    write_centroids_txt(cents, path, keyed=True)
    assert open(path).read().splitlines() == ["0,0.0000,1.0000", "1,2.0000,3.0000"]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Same-bucketed tables joined on the bucket key must not exchange:
    the scan's bucket layout already satisfies the join's required
    hash distribution — the 100 TB case for shuffling the fact table
    once at write time instead of per query."""
    from k_means_clustering_via_map_reduce_spark.plans.introspect import (
        count_shuffles,
        physical_plan,
    )
    from k_means_clustering_via_map_reduce_spark.sources import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "bkt_orders", ("o_orderkey",), 4)
    write_bucketed(lineitem, "bkt_lineitem", ("l_orderkey",), 4)
    try:
        bo, bl = spark.table("bkt_orders"), spark.table("bkt_lineitem")
        # Pin the sort-merge path: broadcast would also be shuffle-free
        # but would not exercise the bucket co-location being tested.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bo.join(
                bl, bo.o_orderkey == bl.l_orderkey
            ).groupBy("o_orderkey").count()
            jplan = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            assert count_shuffles(jplan) == 0, physical_plan(jplan)
            plain = orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            ).groupBy("o_orderkey").count()
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, plain.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_layout_one_file_per_bucket(spark, sf_dir, tmp_path):
    """The pre-repartition inside write_bucketed keeps the layout at
    exactly num_buckets data files (not tasks x buckets fragments)."""
    from k_means_clustering_via_map_reduce_spark.sources import write_bucketed

    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    write_bucketed(src, "bkt_customer", ("c_custkey",), 4)
    try:
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED bkt_customer")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        path = loc.removeprefix("file:")
        files = [
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith("_")
        ]
        assert len(files) == 4, files
        back = spark.table("bkt_customer")
        assert _collect_sorted(back, "c_custkey") == _collect_sorted(
            src, "c_custkey"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_csv_round_trip_adversarial_text(spark, tmp_path):
    """The f2 CSV options (multiLine read, nullValue sentinel) must
    round-trip text the fixture corpus happens not to contain: embedded
    newlines, quotes, commas, empty strings, and NULLs — each of which
    the default reader options would corrupt (record split mid-field,
    empty-as-null conflation)."""
    rows = [
        (1, "plain text"),
        (2, "comma, inside"),
        (3, 'quoted "word" here'),
        (4, "line one\nline two"),
        (5, ""),
        (6, None),
        (7, "trailing backslash \\"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    opts = {"header": "true", "nullValue": "\\N"}
    path = str(tmp_path / "docs")
    df.write.mode("overwrite").options(**opts).csv(path)
    back = (
        spark.read.schema("doc_id BIGINT, text STRING")
        .options(**opts, multiLine="true")
        .csv(path)
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


def test_f8_compaction_collapses_files_and_clusters_time(spark, sf_dir):
    """The compaction rewrite must actually deliver its two claims:
    (1) file count collapses from the 64 ingest files to the target 4;
    (2) per-file ts ranges are pairwise disjoint (footer min/max
    clustering — what lets a time predicate skip whole files).
    Equal endpoints are allowed: rows sharing one timestamp may
    straddle a range boundary."""
    import glob

    import pyarrow.parquet as pq

    from k_means_clustering_via_map_reduce_spark.queries import (
        COMPACT_TARGET_FILES,
        staged_compacted_events,
    )

    root = staged_compacted_events(spark, sf_dir)
    small = glob.glob(root + "/small/part-*.parquet")
    compacted = glob.glob(root + "/compacted/part-*.parquet")
    assert len(small) > COMPACT_TARGET_FILES * 4
    assert 0 < len(compacted) <= COMPACT_TARGET_FILES

    ranges = []
    for f in compacted:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (ranges,)


def test_f9_gzip_layout_and_parallelism_contract(spark, sf_dir):
    """f9's scale story is that parallelism under a non-splittable codec
    comes from file count: the staged write must emit GZ_JSONL_FILES
    gzip part files (each one scan task on read), and the read-side
    DataFrame must see that many input partitions."""
    import glob

    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    Q.QUERIES["f9_gzip_jsonl_roundtrip"](spark, sf_dir).collect()
    (key,) = [k for k in Q._GZ_STAGED if k[0] == sf_dir]
    root = Q._GZ_STAGED[key].name + "/docs"
    parts = glob.glob(os.path.join(root, "part-*"))
    assert len(parts) == Q.GZ_JSONL_FILES
    assert all(p.endswith(".json.gz") for p in parts)
    docs = spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).json(root)
    # The non-splittable contract: a .gz file is never SPLIT across
    # tasks (Spark may still bin several small whole files into one
    # FilePartition, so partitions <= files) — every file's rows must
    # land in exactly one partition, and file count must still yield
    # real parallelism.
    n_parts = docs.rdd.getNumPartitions()
    assert 1 < n_parts <= Q.GZ_JSONL_FILES
    file_to_parts = (
        docs.select(F.input_file_name().alias("f"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("f")
        .agg(F.countDistinct("pid").alias("n"))
        .collect()
    )
    assert len(file_to_parts) == Q.GZ_JSONL_FILES
    assert all(r["n"] == 1 for r in file_to_parts)


def test_f15_sensor_source_partition_independence(spark):
    """The custom Python DataSource's round-robin split must produce the
    SAME rows at any partition count, and actually plan one task per
    declared InputPartition."""
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        _HAVE_DATASOURCE,
        read_sensor,
    )

    if not _HAVE_DATASOURCE:
        import pytest

        pytest.skip("pyspark.sql.datasource unavailable")
    a = sorted(read_sensor(spark, rows=200, partitions=3).collect())
    b = sorted(read_sensor(spark, rows=200, partitions=7).collect())
    assert a == b and len(a) == 200
    assert read_sensor(spark, rows=200, partitions=7).rdd.getNumPartitions() == 7


def test_k16_tick_stream_restart_exactly_once(spark, tmp_path):
    """Two AvailableNow runs sharing one checkpoint: run 1 consumes
    ticks 0..400, run 2 (source grown to 1000) must resume from the
    COMMITTED offset and consume only 400..1000 — the terminal
    complete-mode aggregate equals the full-feed aggregate with no
    double count of the first 400."""
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        _HAVE_DATASOURCE,
        TICK_CHANNELS,
        run_tick_stream,
    )

    if not _HAVE_DATASOURCE:
        import pytest

        pytest.skip("pyspark.sql.datasource unavailable")

    ckpt = str(tmp_path / "tick_ckpt")
    run_tick_stream(spark, 400, ckpt)
    res = {
        r["chan"]: (r["n"], r["sum_v"])
        for r in run_tick_stream(spark, 1000, ckpt).collect()
    }
    expect = {}
    for r in range(1000):
        n, s = expect.get(r % TICK_CHANNELS, (0, 0.0))
        expect[r % TICK_CHANNELS] = (n + 1, s + float((r * 13) % 100))
    assert res == {c: (n, round(s, 4)) for c, (n, s) in expect.items()}


def test_k20_etick_restart_exactly_once_and_state(spark, tmp_path):
    """Two live-trigger runs sharing one checkpoint: run 1 consumes
    only the on-time batch and stops at its terminal watermark; run 2
    (full schedule) must resume from the COMMITTED offset — the union
    of the two append-mode emission logs equals the full-schedule
    oracle exactly, with no (window, chan) emitted twice (exactly-once
    across restart: a re-read of batch 0 would double-emit the early
    windows, a lost offset would drop them). The admissible duplicates
    arriving in run 2 prove the restored watermark still admits
    late-but-in-horizon rows. The watermarked aggregate must carry
    exactly ONE stateful operator."""
    import duckdb

    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        _ETICK_LAST_PROGRESS,
        _HAVE_DATASOURCE,
        run_etick_stream,
    )

    if not _HAVE_DATASOURCE:
        import pytest

        pytest.skip("pyspark.sql.datasource unavailable")

    def emitted(df):
        rows = [
            ((r["win"]["start"], r["chan"]), (r["n_events"], r["sum_v"]))
            for r in df.collect()
        ]
        # exactly-once: the durable emission log must never carry a
        # (window, chan) twice — a replayed batch 0 would
        assert len({k for k, _ in rows}) == len(rows), "double emission"
        return dict(rows)

    ckpt = str(tmp_path / "etick_ckpt")
    sink = str(tmp_path / "etick_sink")
    run1 = emitted(run_etick_stream(spark, 1, ckpt, sink_dir=sink))
    full = emitted(run_etick_stream(spark, 3, ckpt, sink_dir=sink))

    # run 1 emitted the early windows; run 2 only ADDED the rest
    assert run1 and set(run1) < set(full)
    assert all(full[k] == v for k, v in run1.items())

    want = {
        (r[0].to_pydatetime(), r[1]): (r[2], r[3])
        for r in duckdb.sql(
            Q.ORACLE_SQL["k20_stream_source_watermark"]
        ).fetchdf().itertuples(index=False, name=None)
    }
    assert full == want

    state_ops = [
        p["stateOperators"]
        for p in _ETICK_LAST_PROGRESS
        if p.get("stateOperators")
    ]
    assert state_ops and all(len(ops) == 1 for ops in state_ops)
