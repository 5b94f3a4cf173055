"""O20 chaos parity (SURVEY.md §5.2-5): the reference retries failed
tasks by reassigning them round-robin FOREVER, and the reassigned task
clobbers the healthy worker's shuffle output ('w'-mode write,
mapper.py:69, master.py:115). Spark's lineage-based retry must instead
recompute the failed task only, produce correct results, and give up
after spark.task.maxFailures.

Task retry needs ``local[N, maxFailures]``, a different master than the
shared test session — so this runs in a subprocess with its own JVM.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark import TaskContext
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = (
        SparkSession.builder.master("local[4, 3]")  # 3 task attempts
        .appName("chaos")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    @pandas_udf("long")
    def flaky(x: pd.Series) -> pd.Series:
        ctx = TaskContext.get()
        # Every task's FIRST attempt dies; retries succeed.
        if ctx.attemptNumber() == 0:
            raise RuntimeError("injected failure (attempt 0)")
        return x * 2

    df = spark.range(0, 1000, numPartitions=4).select(
        F.col("id"), flaky(F.col("id")).alias("doubled")
    )
    total = df.agg(F.sum("doubled")).collect()[0][0]
    assert total == 999 * 1000, total  # 2 * sum(0..999)
    n = df.count()
    assert n == 1000, n
    print("RETRY_OK")

    # And a job that exhausts maxFailures must FAIL, not loop forever
    # (the reference's retry storm, dump_master.txt).
    @pandas_udf("long")
    def always_dies(x: pd.Series) -> pd.Series:
        raise RuntimeError("injected permanent failure")

    try:
        spark.range(10).select(always_dies(F.col("id"))).collect()
        print("UNEXPECTED_SUCCESS")
    except Exception:
        print("GAVE_UP_OK")
    spark.stop()
    """
)


def test_spark_retry_replaces_corrupting_reassignment():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    out = proc.stdout
    assert "RETRY_OK" in out, (out, proc.stderr[-2000:])
    assert "GAVE_UP_OK" in out, (out, proc.stderr[-2000:])
    assert "UNEXPECTED_SUCCESS" not in out
