"""Driver-style validation for selected registry entries: run the
Spark query on a VANILLA session (the driver's shape — engine confs
applied only through the @query wrapper) and compare row-for-row with
the DuckDB oracle at sf0.01, sorting columns by name before compare
exactly as the driver's value-hash does.

Usage: python scripts/driver_sim.py q93_peak_concurrency f34_...
       python scripts/driver_sim.py --all          (every oracled entry)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("KMCE_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    import datetime as _dt

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    # The driver compares str-mapped PANDAS frames, where a DuckDB DATE
    # arrives as a midnight Timestamp — str-equal to Spark's TIMESTAMP.
    # fetchall() hands back datetime.date instead; widen to midnight so
    # this sim matches the driver's verdict (datetime before date:
    # datetime IS a date subclass).
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    return v


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:]
    if names == ["--all"]:
        names = [n for n in qs if n in oracles]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failures += 1
            continue
        df = qs[name](spark, SF_DIR)
        cols = sorted(df.columns)
        got = [
            tuple(_norm(r[c]) for c in cols) for r in df.collect()
        ]
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows)")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        order = sorted(range(len(ocols)), key=lambda i: ocols[i])
        want = [
            tuple(_norm(row[i]) for i in order) for row in cur.fetchall()
        ]
        if sorted(ocols) != cols:
            print(f"{name}: COLUMN MISMATCH spark={cols} oracle={sorted(ocols)}")
            failures += 1
        elif got == want:
            print(f"{name}: MATCH ({len(got)} rows)")
        else:
            print(
                f"{name}: VALUE MISMATCH spark={len(got)} oracle={len(want)}"
            )
            for g, w in list(zip(got, want))[:3]:
                if g != w:
                    print(f"  spark  {g}\n  oracle {w}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
