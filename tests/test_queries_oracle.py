"""Every registered query with a SQL oracle must hash-match DuckDB on the
same parquet tables — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import os

import pytest

import k_means_clustering_via_map_reduce_spark.queries as Q
from tests.oracle_utils import compare_to_oracle

Q.load_all()


@pytest.fixture(scope="module")
def sf_dir() -> str:
    """Oracle compares run at the DRIVER'S scale (sf0.01), overriding the
    suite-wide sf0.001 default: q39's epoch-rounding divergence only
    manifested on sf0.01's boundary rows — a mismatch the fast fixtures
    cannot reach must fail HERE, not first in the driver."""
    return os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )


def oracled_names() -> list[str]:
    return sorted(n for n in Q.QUERIES if n in Q.ORACLE_SQL)


@pytest.mark.parametrize("name", oracled_names())
def test_query_matches_oracle(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, Q.ORACLE_SQL[name], sf_dir)


def test_all_queries_have_unique_names():
    assert len(Q.QUERIES) == len(set(Q.QUERIES))


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs_and_is_nonempty_schema(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert df.schema.fields, f"{name} produced an empty schema"
