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

    The probe side gets a deterministic pseudo-random salt per row —
    xxhash64 of the row's hashable columns mixed with a per-row
    disambiguator, so no RNG and no dependence on the row's VALUES being
    distinct. Without the disambiguator, fully-duplicated probe rows (a
    common real skew shape) would all hash to one salt and still land in
    a single task. Pass ``probe_id_col`` naming a stable surrogate id
    when one exists (fully deterministic); otherwise
    ``monotonically_increasing_id`` is mixed in, which is deterministic
    for a deterministic source under a stable partition layout — the
    same condition Spark task retries already rely on. Map-typed
    columns are excluded from the hash (xxhash64 rejects them).

    The build side is replicated once per salt value via a
    ``sequence``+``explode`` (rows × salt). Result equals the plain join
    for inner/left joins (each probe row meets each build match exactly
    once, under exactly one salt value).
    """
    hashable = [
        F.col(f.name)
        for f in probe.schema.fields
        if not isinstance(f.dataType, MapType)
    ]
    disambig = (
        F.col(probe_id_col)
        if probe_id_col is not None
        else F.monotonically_increasing_id()
    )
    p = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*hashable, disambig), F.lit(salt)).cast("int"),
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = p.join(b, on + ["__salt"], how)
    return joined.drop("__salt")
