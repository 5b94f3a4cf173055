"""F24: the versioned table as a Spark Python DataSource with
pushdown-driven file skipping (round-8 pre-build)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.python_source import (
    F24_ORACLE,
    f24_versioned_connector_read,
    register_versioned_source,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    read_version,
)
from tests.oracle_utils import compare_to_oracle


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    for lo in (0, 100, 200):
        commit_append(
            spark.range(lo, lo + 10)
            .selectExpr("id", "cast(id % 7 as double) as v")
            .coalesce(1),
            root,
        )
    register_versioned_source(spark)
    return root


def _load(spark, root, **opts):
    r = spark.read.format("kmce_versioned").option("root", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_connector_equals_read_version(spark, table):
    got = sorted(map(tuple, _load(spark, table).collect()))
    want = sorted(map(tuple, read_version(spark, table).collect()))
    assert got == want and len(got) == 30


def test_pushed_range_prunes_partitions_and_keeps_rows(spark, table):
    q = _load(spark, table).filter("id >= 100 and id < 110")
    # partitions == surviving files: 1 of 3 (observable skipping)
    assert q.rdd.getNumPartitions() == 1
    assert sorted(r["id"] for r in q.collect()) == list(range(100, 110))
    # a range spanning two files keeps exactly two partitions
    q2 = _load(spark, table).filter("id >= 95 and id <= 205")
    assert q2.rdd.getNumPartitions() == 2


def test_residual_filters_still_apply_post_scan(spark, table):
    """Pruning is file-granular; Spark must still drop the non-matching
    rows INSIDE the surviving file (every filter is yielded back)."""
    q = _load(spark, table).filter("id >= 100 and id < 103")
    assert q.rdd.getNumPartitions() == 1
    assert sorted(r["id"] for r in q.collect()) == [100, 101, 102]


def test_time_travel_option(spark, table):
    v1 = _load(spark, table, version="1")
    assert sorted(r["id"] for r in v1.collect()) == list(range(10))


def test_schema_evolution_null_fill_through_connector(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a")], "id bigint, tag string")
    commit_append(base, root)
    commit_append(
        base.withColumn("id", F.lit(2).cast("bigint")).withColumn(
            "score", F.lit(0.5)
        ),
        root,
    )
    register_versioned_source(spark)
    rows = {r["id"]: r["score"] for r in _load(spark, root).collect()}
    assert rows == {1: None, 2: 0.5}


def test_unpruneable_filter_keeps_all_files(spark, table):
    """A filter on a column with no per-file spread still returns the
    right rows — pruning must never turn conservative-keep into drop."""
    q = _load(spark, table).filter("v = 3.0")
    assert q.rdd.getNumPartitions() == 3
    assert q.count() == read_version(spark, table).filter("v = 3.0").count()


def test_f24_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        f24_versioned_connector_read(spark, sf_dir), F24_ORACLE, sf_dir
    )


# ------------------------------------------------------------------
# Property: under ANY commit sequence (random column subsets — i.e.
# random schema evolution — and random range probes), the connector
# must agree with read_version exactly, pruned or not.
# ------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_COMMITS = st.lists(
    st.tuples(
        st.sets(st.sampled_from(["a", "b"])),  # optional columns carried
        st.integers(0, 3),  # id-range bucket for this commit
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None)
@given(commits=_COMMITS, probe=st.integers(0, 3))
def test_connector_parity_under_random_evolution(spark_prop, commits, probe):
    import tempfile

    from pyspark.sql import functions as F

    spark = spark_prop
    register_versioned_source(spark)
    with tempfile.TemporaryDirectory(prefix="kmce_vdsprop_") as d:
        root = f"{d}/t"
        seq = 0
        for cols, bucket in commits:
            seq += 1
            df = spark.range(
                bucket * 100 + seq, bucket * 100 + seq + 5
            ).select(F.col("id"))
            for c in sorted(cols):
                df = df.withColumn(c, F.lit(float(seq)))
            commit_append(df.coalesce(1), root)
        def feed():
            # one load() per query: Spark 4.1 attaches a Python
            # source's pushdown planning to the loaded relation node
            # (see test_spark_attaches_pushdown_to_loaded_relation),
            # so reusing one DataFrame across differently-filtered
            # queries reads stale plans — an upstream behavior, not a
            # connector contract
            return (
                spark.read.format("kmce_versioned")
                .option("root", root)
                .load()
            )

        lo, hi = probe * 100, probe * 100 + 99
        # sort by repr: evolved columns carry None next to floats,
        # which plain tuple ordering cannot compare
        got = sorted(
            map(tuple, feed().filter(f"id >= {lo} and id <= {hi}").collect()),
            key=repr,
        )
        want = sorted(
            map(
                tuple,
                read_version(spark, root)
                .filter(f"id >= {lo} and id <= {hi}")
                .collect(),
            ),
            key=repr,
        )
        assert got == want
        # full-table parity too (no pushed filters at all)
        assert sorted(map(tuple, feed().collect()), key=repr) == sorted(
            map(tuple, read_version(spark, root).collect()), key=repr
        )


def test_spark_attaches_pushdown_to_loaded_relation(spark):
    """UPSTREAM BEHAVIOR PIN (not a connector contract): Spark 4.1's
    PlanPythonDataSourceScan attaches the pushdown planning to the
    loaded relation node, so a filterless re-read of the SAME loaded
    DataFrame after a filtered query reuses the filtered partitions —
    for EVERY pushFilters source (minimal toy repro here, zero
    connector code involved; a fresh reader is built per planning).
    If a Spark upgrade fixes this, this test fails and the load()-per-
    query guidance in python_source.py can be dropped."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class P(InputPartition):
        def __init__(self, lo):
            self.lo = lo

    class R(DataSourceReader):
        def __init__(self):
            self.pruned = False

        def pushFilters(self, filters):
            fl = list(filters)
            if fl:
                self.pruned = True
            yield from fl

        def partitions(self):
            return [P(0)] if self.pruned else [P(0), P(10)]

        def read(self, part):
            for i in range(part.lo, part.lo + 10):
                yield (i,)

    class Toy(DataSource):
        @classmethod
        def name(cls):
            return "kmce_toy_pushdown"

        def schema(self):
            return "id bigint"

        def reader(self, schema):
            return R()

    spark.dataSource.register(Toy)
    df = spark.read.format("kmce_toy_pushdown").load()
    assert df.count() == 20
    assert df.filter("id < 100").count() == 10  # pruned planning
    assert df.count() == 10  # the quirk: stale pruned planning reused
    assert spark.read.format("kmce_toy_pushdown").load().count() == 20


def test_version_option_parse_is_explicit(spark, table):
    """Round-7 ADVICE: version="0" must fail loudly (versions start at
    1), not hunt for a manifest v0; "" and non-integers are rejected
    rather than silently meaning latest; omitting the option IS latest."""
    import pytest
    from pyspark.errors import PySparkException

    for bad in ("0", "-3", "", "latest", "1.5"):
        with pytest.raises((PySparkException, ValueError)):
            _load(spark, table, version=bad).collect()
    # omitted option == explicit latest version
    got = sorted(map(tuple, _load(spark, table).collect()))
    want = sorted(map(tuple, _load(spark, table, version="3").collect()))
    assert got == want


def test_connector_applies_dvs_and_column_mapping(spark, tmp_path):
    """Merge-on-read parity: the connector must reproduce
    read_version's semantics on a table with live deletion vectors AND
    a renamed column — a connector that reads logical names from
    physical files null-fills silently; one that ignores sidecars
    resurrects deleted rows."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        delete_where_dv,
        rename_column,
    )

    root = str(tmp_path / "t")
    for lo in (0, 100):
        commit_append(
            spark.range(lo, lo + 10)
            .selectExpr("id", "cast(id % 7 as double) as v")
            .coalesce(1),
            root,
        )
    rename_column(root, "v", "score")
    delete_where_dv(spark, root, "id % 3 = 0")
    register_versioned_source(spark)
    got_df = _load(spark, root)
    assert sorted(got_df.columns) == ["id", "score"]
    got = sorted(map(tuple, got_df.collect()))
    want = sorted(map(tuple, read_version(spark, root).collect()))
    assert got == want
    assert len(got) == 20 - 7  # ids 0,3,6,9 and 102,105,108 dropped
    # no silent null-fill: every surviving score is real
    assert got_df.filter("score is null").count() == 0
    # stats pruning still translates logical -> physical
    pruned = _load(spark, root).filter("score >= 0 and id >= 100")
    assert sorted(r["id"] for r in pruned.collect()) == [
        i for i in range(100, 110) if i % 3
    ]


def test_connector_rejects_out_of_range_dv_positions(spark, tmp_path):
    """Round-11 ADVICE: a corrupt sidecar position beyond the file's
    row count must raise a diagnosable kmce_versioned error, not a
    bare numpy IndexError from the mask fill."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        delete_where_dv,
        read_manifest,
    )

    root = str(tmp_path / "t")
    commit_append(spark.range(0, 10).selectExpr("id").coalesce(1), root)
    v = delete_where_dv(spark, root, "id = 4")
    side = os.path.join(root, read_manifest(root, v)["dvs"][0])
    tbl = pq.read_table(side)
    pq.write_table(
        pa.table(
            {
                "_dv_file": tbl.column("_dv_file").to_pylist(),
                "_dv_pos": [10**6] * len(tbl),
            }
        ),
        side,
    )
    for crc in glob.glob(os.path.join(os.path.dirname(side), ".*.crc")):
        os.remove(crc)
    register_versioned_source(spark)
    with pytest.raises(Exception, match="out of range"):
        _load(spark, root).collect()
