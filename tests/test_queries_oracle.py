"""Every registered query with a SQL oracle must hash-match DuckDB on the
same parquet tables — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

import k_means_clustering_via_map_reduce_spark.queries as Q
from tests.oracle_utils import compare_to_oracle

Q.load_all()


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
