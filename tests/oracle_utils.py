"""DuckDB oracle comparison harness (SURVEY.md §5.2-3).

Mirrors the verify driver's contract: run the Spark query and the ANSI-SQL
oracle over the same parquet tables, sort columns by name, compare values
order-insensitively. Strict equality is the goal (both sides round floats
to 4 decimals inside the query); tiny float residue beyond that is a bug.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pandas as pd

from k_means_clustering_via_map_reduce_spark.sources import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return _canon_cell(float(v))
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
        if isinstance(v, np.datetime64):
            return pd.Timestamp(v).to_pydatetime().replace(tzinfo=None).isoformat()
    except ImportError:
        pass
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mism, (
        f"{len(mism)} mismatched rows (of {len(s_rows)}); first 3: {mism[:3]}"
    )
