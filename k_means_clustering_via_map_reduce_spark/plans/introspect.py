"""Physical-plan introspection.

The reference has no optimizer and no plans to inspect — its dataflow is
hard-coded (SURVEY.md §4.1) and its only observability is print/dump-file
logging (master.py:21-24, mapper.py:74-77). The engine's equivalent
observability surface is Catalyst's physical plan; these helpers turn it
into assertable facts so tests can pin the SCALE properties — filters
reaching the parquet scan, dimension tables broadcast, shuffle counts,
whole-stage-codegen coverage — not just result correctness. A plan
regression (lost pushdown, join flipping to sort-merge) fails CI here
long before it becomes a 100 TB incident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints), as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan. Every one is a
    full materialize-and-repartition of its input — the unit of cost that
    dominates at scale (the reference's equivalent was M·R partition
    files + M·R gRPC fetches per iteration, SURVEY.md §3.3)."""
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))


def broadcast_hash_join_count(df: DataFrame) -> int:
    """Number of broadcast hash joins — the no-shuffle join strategy every
    small-dimension join should hit."""
    return len(re.findall(r"\(\d+\) BroadcastHashJoin\b", physical_plan(df)))


def _split_filter_list(body: str) -> list[str]:
    """Split a plan's filter-list body on TOP-LEVEL commas only — a
    filter like ``x IN (a,b)`` contains commas that must not fragment
    it."""
    out: list[str] = []
    depth = 0
    cur = []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _scan_filter_lists(df: DataFrame, label: str) -> list[str]:
    out: list[str] = []
    for m in re.finditer(
        rf"{label}: \[([^\]]*)\]", physical_plan(df)
    ):
        body = m.group(1).strip()
        if body:
            out.extend(_split_filter_list(body))
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` list in the plan's scans, flattened.
    Empty ⇒ no predicate reached the source."""
    return _scan_filter_lists(df, "PushedFilters")


def partition_filters(df: DataFrame) -> list[str]:
    """Every ``PartitionFilters: [...]`` list in the plan's scans,
    flattened. These prune whole DIRECTORIES of a partitionBy layout
    before any file is opened — coarser and cheaper than row-group-level
    ``PushedFilters``. Empty on a scan of a partitioned table ⇒ the
    query reads every partition."""
    return _scan_filter_lists(df, "PartitionFilters")


def scan_read_schemas(df: DataFrame) -> list[str]:
    """The ``ReadSchema`` of every parquet scan — what column pruning
    actually left to be read off disk."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (\S+)", physical_plan(df))
    ]


def _iter_jvm_nodes(node):
    """Depth-first walk of a JVM SparkPlan / TreeNode via py4j."""
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_jvm_nodes(children.apply(i))


def shuffled_array_columns(
    df: DataFrame, include_round_robin: bool = False
) -> list[str]:
    """Names of array-typed attributes that travel through ANY shuffle
    exchange in ``df``'s physical plan — checked against the actual
    attribute data types on the exchange's output, not plan text, so
    intermediate columns (exploded payloads that never reach the final
    schema) are caught too. Empty ⇒ every shuffle moves only scalar
    rows — the property the slim LSH band joins exist to guarantee.

    Round-robin exchanges (``spread()``'s fixture-parallelism
    repartition, a no-op on real multi-split inputs) are excluded unless
    ``include_round_robin``: they move each payload row exactly once by
    design, unlike a hash shuffle where a fat column rides a high-fanout
    key."""
    plan = df._jdf.queryExecution().sparkPlan()  # type: ignore[attr-defined]
    hits: list[str] = []
    for node in _iter_jvm_nodes(plan):
        if node.getClass().getSimpleName() != "ShuffleExchangeExec":
            continue
        part_kind = node.outputPartitioning().getClass().getSimpleName()
        if part_kind == "RoundRobinPartitioning" and not include_round_robin:
            continue
        out = node.output()
        for i in range(out.size()):
            attr = out.apply(i)
            if attr.dataType().typeName() == "array":
                label = f"{attr.name()}#{attr.exprId().id()}"
                if label not in hits:
                    hits.append(label)
    return hits


def codegen_stage_count(df: DataFrame) -> int:
    """Number of DISTINCT whole-stage-codegen stages in the STATIC
    physical plan — no execution required.

    Under AQE the formatted plan hides ``[codegen id : N]`` markers
    until the query has actually run (``isFinalPlan=true``), which is
    what silently zeroed the PLANS_r05–r11 ledger column (VERDICT r11
    "What's wrong" #1: it counted the literal ``WholeStageCodegen``,
    which "formatted" mode never prints). This helper re-plans a
    trivial clone of ``df`` with AQE off — the stage-local plans AQE
    executes are the same static plans, so the count is the real
    codegen coverage, derived deterministically and cheaply. The
    clone's ``Filter true`` is constant-folded away, so the plan is
    identical to ``df``'s."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        plan = physical_plan(df.where(F.lit(True)))
    finally:
        spark.conf.set(key, prev)
    return len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the executed-plan string —
    wider/fewer spans mean more of the query runs as fused generated
    code. Under AQE the count is only materialized once the query has
    run (``isFinalPlan=true``): call an action on ``df`` first, else
    this returns 0."""
    cg = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    return int(m.group(1)) if m else 0
