"""Skew mitigation utilities.

First-line defenses are built in and already enabled by the session
factory (session.py): AQE skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``) and runtime broadcast
selection. Salting is the fallback for the cases those cannot fix:

- a shuffle join whose hot key exceeds what AQE's split granularity
  helps with (AQE splits the partition, but one KEY still lands in one
  task on the build side);
- a repeatable pipeline that must not depend on runtime re-planning.

``salted_join`` replicates the (small-ish) build side ``salt`` times and
scatters the probe side's hot keys across ``salt`` sub-partitions:
shuffle parallelism for a single key becomes ``salt`` tasks at the cost
of ``salt×`` build-side volume — the standard trade when broadcast is
infeasible and a key is pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

DEFAULT_SALT = 16


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = DEFAULT_SALT,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with the shuffle keyed on
    (join keys, salt) instead of the join keys alone.

    The probe-side salt is a PURE FUNCTION of row values — never of row
    position — so a task retry that recomputes rows in a different order
    reassigns identical salts and can neither drop nor duplicate rows
    (the SPARK-23207 round-robin-repartition hazard this deliberately
    avoids; a positional salt is only safe over a freshly scanned
    deterministic source, which the skewed-probe case — the output of an
    upstream join/shuffle — is not):

    - With ``probe_id_col`` (a stable per-row surrogate id): salt =
      xxhash64(id) mod salt — uniform even when every payload value is
      identical. Pass it whenever the probe has ANY unique column; this
      is the fully-general path.
    - Without it: salt = xxhash64(all hashable columns) mod salt.
      Fully-duplicated probe rows then share one salt value, so for the
      degenerate duplicate-heavy skew shape the spread degrades — a
      documented mitigation limit, never a correctness risk. Map-typed
      columns are excluded from the hash (xxhash64 rejects them).

    The build side is replicated once per salt value via a
    ``sequence``+``explode`` (rows × salt). Result equals the plain join
    for inner/left joins (each probe row meets each build match exactly
    once, under exactly one salt value).
    """
    if probe_id_col is not None:
        salt_expr = F.xxhash64(F.col(probe_id_col))
    else:
        hashable = [
            F.col(f.name)
            for f in probe.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
        salt_expr = F.xxhash64(*hashable)
    p = probe.withColumn(
        "__salt", F.pmod(salt_expr, F.lit(salt)).cast("int")
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = p.join(b, on + ["__salt"], how)
    return joined.drop("__salt")
