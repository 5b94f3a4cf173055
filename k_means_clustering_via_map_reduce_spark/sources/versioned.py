"""Snapshot-versioned parquet table — manifest-file time travel.

The lakehouse-lifecycle capability a training-data pipeline leans on
hardest: REPRODUCIBLE CORPUS PINNING. A training run records "corpus @
version N" and every later re-read of version N must return bit-identical
data, no matter how many appends happened since. This is the core
mechanism of Delta Lake / Iceberg snapshot reads, re-expressed minimally:

- data files are IMMUTABLE once written (appends add files, never touch
  existing ones);
- each commit writes ``_manifests/v{N}.json`` naming the complete file
  list visible at version N (previous manifest's files + the new ones);
- the manifest write is the COMMIT POINT, made atomic with the same
  tmp-file + rename discipline as the f17 sink: a crash after the data
  write but before the manifest rename leaves orphan data files that no
  manifest references — invisible to every reader, reclaimable by a
  vacuum that keeps any file named in any manifest;
- readers NEVER list the data directory; they read exactly the files a
  manifest names, so concurrent in-flight appends cannot tear a read.

The reference (a fixed two-stage MapReduce over one static CSV,
master.py:12-266) has no table lifecycle at all; this is engine surface
beyond it, composing f17's commit protocol with f14's table lifecycle.

Scale: a commit is one parquet write (distributed) plus one O(#files)
driver-side JSON write — metadata cost is proportional to file count,
not rows, the same asymptotics as Delta's transaction log. Reads are
plain parquet scans of the pinned file list: pushdown, pruning and
whole-stage codegen all apply unchanged.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version:05d}.json")


_TXN_DIR = "_txns"


def _txn_state(
    coordinator: str, txn_id: str, local_root: str | None = None
) -> str:
    """'committed' | 'aborted' | 'pending' — resolved from the
    coordinator table's single CAS file (see ``commit_multi``), with a
    PARTICIPANT-LOCAL mirror checked first: after a successful commit,
    each participant records the verdict under its own ``_txns`` dir,
    so a later relocation or deletion of the coordinator table cannot
    retroactively darken committed history (a missing coordinator
    otherwise reads as 'pending', which fails CLOSED — safe for
    aborts, wrong for commits)."""
    if local_root is not None and os.path.abspath(
        local_root
    ) != os.path.abspath(coordinator):
        try:
            with open(
                os.path.join(local_root, _TXN_DIR, f"{txn_id}.final")
            ) as f:
                s = f.read().strip()
                if s:
                    return s
        except FileNotFoundError:
            pass
    path = os.path.join(coordinator, _TXN_DIR, f"{txn_id}.final")
    try:
        with open(path) as f:
            return f.read().strip() or "pending"
    except FileNotFoundError:
        return "pending"


def _finalize_txn(coordinator: str, txn_id: str, state: str) -> str:
    """Compare-and-swap the transaction outcome: the FIRST finalizer
    (committer racing a recoverer) wins via link-don't-clobber; the
    loser reads the winner's verdict. Returns the WINNING state."""
    d = os.path.join(coordinator, _TXN_DIR)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{txn_id}.final")
    tmp = final + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        f.write(state)
    try:
        os.link(tmp, final)
    except FileExistsError:
        pass
    finally:
        os.remove(tmp)
    return _txn_state(coordinator, txn_id)


def _manifest_visible(manifest: dict, root: str | None = None) -> bool:
    """A manifest carrying a multi-table ``txn`` tag is visible only
    once its coordinator (or the participant-local mirror under
    ``root``) records 'committed'; plain manifests are visible by
    construction (the link WAS the commit point)."""
    t = manifest.get("txn")
    if not t:
        return True
    return (
        _txn_state(t["coordinator"], t["id"], local_root=root)
        == "committed"
    )


def _raw_max_version(root: str) -> int:
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        # parse the FULL stem: f"{v:05d}" widens past 5 digits at
        # v=100000, so a fixed [1:6] slice would silently truncate and
        # point the next commit at a stale parent
        int(n[1 : n.index(".")])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions, default=0)


def latest_version(root: str) -> int:
    """Highest VISIBLE committed version, or 0 if the table is empty.
    Manifests belonging to a pending or aborted multi-table
    transaction are invisible — they can only ever sit ABOVE the
    visible head (a pending slot blocks later commits), so the walk
    down is O(in-flight txns), almost always zero extra reads."""
    v = _raw_max_version(root)
    while v > 0:
        try:
            if _manifest_visible(read_manifest(root, v), root):
                return v
        except FileNotFoundError:
            # expired hole (or a listdir/read race): this version has
            # no readable manifest, so it cannot be the answer — keep
            # walking to the highest version that IS readable and
            # visible (round-11 ADVICE: returning v here handed
            # callers a snapshot read_version could only throw on)
            pass
        v -= 1
    return 0


def _link_slot(tmp: str, root: str, version: int) -> None:
    """Link a manifest into its slot with aborted-garbage recovery: if
    the slot is held by a manifest whose multi-table transaction was
    ABORTED (a crashed commit_multi that never cleaned up), remove the
    invisible garbage and retry once. A PENDING occupant raises
    ConcurrentWriteError (the in-flight transaction owns the slot);
    a visible occupant re-raises FileExistsError for the caller's
    normal race handling (rebase or hard conflict)."""
    target = _manifest_path(root, version)
    try:
        os.link(tmp, target)
        return
    except FileExistsError:
        try:
            occupant = read_manifest(root, version)
        except FileNotFoundError:
            os.link(tmp, target)  # garbage vanished under us
            return
        t = occupant.get("txn")
        if t:
            state = _txn_state(t["coordinator"], t["id"], local_root=root)
            if state == "aborted":
                try:
                    os.remove(target)
                except FileNotFoundError:
                    pass
                os.link(tmp, target)
                return
            if state == "pending":
                raise ConcurrentWriteError(
                    f"slot v{version} of {root} is held by in-flight "
                    f"multi-table transaction {t['id']} — retry after "
                    "it finalizes (or abort_txn it)"
                ) from None
        raise


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def applied_batches(root: str) -> set[int]:
    """Ingest-ledger read: the batch ids already committed into the
    table, carried CUMULATIVELY in every manifest (the Delta txn-action
    idiom) — one latest-manifest read, O(#batches) driver-side, no
    directory scan. Empty for an empty table."""
    latest = latest_version(root)
    if latest == 0:
        return set()
    return set(read_manifest(root, latest).get("batches", []))


class ConcurrentWriteError(RuntimeError):
    """A committer's read snapshot went stale under it: either an
    ``expected_version`` CAS failed for a non-commuting verb, or an
    append's rebase found the table metadata (constraints) changed
    since the rows were validated. Delta's
    ConcurrentAppend/MetadataChangedException, minimally."""


class ConstraintViolationError(ValueError):
    """Incoming rows falsified a table CHECK constraint; the commit
    wrote no manifest (orphaned data files only, invisible)."""


def table_constraints(root: str, version: int | None = None) -> dict:
    """The table's CHECK constraints ({name: sql_expr}) at ``version``
    (latest when None) — snapshot metadata like the schema, carried
    forward by every commit verb."""
    if version is None:
        version = latest_version(root)
    if version == 0:
        return {}
    return read_manifest(root, version).get("constraints", {})


def _carry_constraints(manifest: dict, prev: dict) -> None:
    # one carry point for BOTH row-rule metadata surfaces (CHECK
    # constraints and generated-column expressions), so every verb that
    # already carries constraints carries generated columns too — a
    # verb that misses this helper loses both loudly in tests, not one
    # silently
    if "constraints" in prev:
        manifest["constraints"] = prev["constraints"]
    if "generated" in prev:
        manifest["generated"] = prev["generated"]


def _enforce_constraints(df: DataFrame, constraints: dict) -> None:
    """Reject ``df`` if any row falsifies any constraint. SQL CHECK
    semantics: NULL passes (only an expression that evaluates to FALSE
    violates). Cost is O(first violation) — one short-circuit take(1)
    over the incoming batch, never the table."""
    from pyspark.sql import functions as F

    for name, expr in constraints.items():
        bad = df.filter(
            ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        ).take(1)
        if bad:
            raise ConstraintViolationError(
                f"CHECK constraint {name!r} ({expr}) violated, e.g. by "
                f"row {bad[0].asDict()}"
            )


def add_check_constraint(
    spark: SparkSession, root: str, name: str, expr: str
) -> int:
    """ALTER TABLE ADD CONSTRAINT ... CHECK (Delta's verb): validate
    the EXISTING table against ``expr`` (one scan — a constraint that
    history already falsifies must fail here, not at the next append),
    then commit a METADATA-ONLY version carrying the same files with
    the constraint recorded. Enforcement from then on is on every
    row-adding commit (append, merge, COW update rewrite)."""
    parent = latest_version(root)
    if parent == 0:
        raise ValueError("cannot constrain an empty table")
    prev = read_manifest(root, parent)
    cons = dict(prev.get("constraints", {}))
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists")
    _enforce_constraints(read_version(spark, root, parent), {name: expr})
    txn = uuid.uuid4().hex[:12]
    manifest = {
        "version": parent + 1,
        "parent": parent,
        "files": prev.get("files", []),
        "added": [],
        "constraint_added": name,
        "constraints": {**cons, name: expr},
        "batches": prev.get("batches", []),
        "stats": prev.get("stats", {}),
    }
    if prev.get("schema") is not None:
        manifest["schema"] = prev["schema"]
    if "external_files" in prev:
        manifest["external_files"] = prev["external_files"]
    if prev.get("dvs"):
        manifest["dvs"] = prev["dvs"]
    _carry_mapping(manifest, prev)
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, parent + 1) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, root, parent + 1)
    finally:
        os.remove(tmp)
    return parent + 1


def table_generated(root: str, version: int | None = None) -> dict:
    """The table's GENERATED columns ({name: sql_expr}) at ``version``
    (latest when None) — snapshot metadata carried forward by every
    commit verb (same carry point as constraints)."""
    if version is None:
        version = latest_version(root)
    if version == 0:
        return {}
    return read_manifest(root, version).get("generated", {})


def add_generated_column(
    spark: SparkSession, root: str, name: str, expr: str
) -> int:
    """ALTER TABLE ADD COLUMN ... GENERATED ALWAYS AS (Delta's
    generated columns, minimally): record ``name = expr`` as table
    metadata and MATERIALIZE the column for existing rows in one COW
    rewrite, so the column is physical in every file — which is what
    makes it carry min/max stats and participate in file skipping
    (Delta's partition-pruning-via-generated-column lever). From then
    on every append either omits the column (the engine computes it)
    or provides values that must MATCH the expression row-for-row
    (a mismatch is a loud error, not a silent divergence).

    Scale: the one-time backfill is a distributed rewrite of the
    table (the same cost class as OPTIMIZE); each later append adds
    one projected expression to its own write. Refused when ``name``
    exists or ``expr`` references a column that doesn't."""
    parent = latest_version(root)
    if parent == 0:
        raise ValueError("cannot add a generated column to an empty table")
    prev = read_manifest(root, parent)
    schema = table_schema(root, parent)
    if schema is None:
        raise ValueError(
            "add_generated_column needs a recorded table schema — "
            "recommit once to record one"
        )
    names = [f.name for f in schema.fields]
    if name in names:
        raise ValueError(f"generated column {name!r} already exists")
    gen = dict(prev.get("generated", {}))
    from pyspark.sql import functions as F

    current = read_version(spark, root, parent)
    backfilled = current.withColumn(name, F.expr(expr))
    txn = uuid.uuid4().hex[:12]
    data_dir = os.path.join(root, _DATA_DIR, f"txn-{parent + 1:05d}-{txn}")
    mapping = prev.get("column_mapping", {})
    _to_physical(backfilled, mapping).write.parquet(data_dir)
    new_files = sorted(
        os.path.join(os.path.relpath(data_dir, root), n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )
    from pyspark.sql.types import StructField, StructType

    new_schema = StructType(
        list(schema.fields)
        + [StructField(name, backfilled.schema[name].dataType, True)]
    )
    manifest = {
        "version": parent + 1,
        "parent": parent,
        "files": new_files,
        "added": new_files,
        "generated_added": name,
        "generated": {**gen, name: expr},
        "schema": new_schema.jsonValue(),
        "batches": prev.get("batches", []),
        "stats": _collect_file_stats(root, new_files),
    }
    if "constraints" in prev:
        manifest["constraints"] = prev["constraints"]
    if "external_files" in prev:
        manifest["external_files"] = prev["external_files"]
    _carry_mapping(manifest, prev)
    # COW backfill: vectors were applied by read_version, files are new
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, parent + 1) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, root, parent + 1)
    finally:
        os.remove(tmp)
    return parent + 1


class GeneratedColumnError(ValueError):
    """An append supplied values for a generated column that do not
    match its expression (Delta's generated-column invariant)."""


def _apply_generated(df: DataFrame, generated: dict) -> DataFrame:
    """Materialize or validate generated columns on an incoming batch:
    absent -> computed; present -> one short-circuit take(1) proves
    every supplied value equals the expression (null-safe)."""
    from pyspark.sql import functions as F

    for name, expr in generated.items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr))
            continue
        bad = df.filter(~(F.col(name).eqNullSafe(F.expr(expr)))).take(1)
        if bad:
            raise GeneratedColumnError(
                f"generated column {name!r} = ({expr}) does not match "
                f"the supplied value, e.g. in row {bad[0].asDict()}"
            )
    return df


def table_schema(root: str, version: int | None = None):
    """The evolved table schema at ``version`` (latest when None), or
    None for pre-evolution manifests that recorded no schema."""
    from pyspark.sql.types import StructType

    if version is None:
        version = latest_version(root)
    if version == 0:
        return None
    sj = read_manifest(root, version).get("schema")
    return StructType.fromJson(sj) if sj else None


def _relax_nullability(dt):
    """Recursively mark every nested position nullable. Nullability is
    PART of Spark's nested dataTypes (array containsNull, map
    valueContainsNull, struct field nullable), and it reflects how a
    frame was BUILT (F.array of literals is containsNull=false; the
    same column read back from parquet is true) — not a real type
    difference. The evolution guard must compare types modulo
    nullability or a byte-identical recommit would be rejected."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _relax_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_relax_nullability(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(
            _relax_nullability(dt.keyType),
            _relax_nullability(dt.valueType),
            True,
        )
    return dt


def _evolve_schema(parent, incoming):
    """Union the parent table schema with an incoming commit's schema:
    existing columns keep their position and must keep their TYPE
    (a silent type change corrupts every time-travel read, so it fails
    loudly here at the commit point); new columns append in the
    incoming order and read as NULL in pre-evolution files. All fields
    come back nullable — an added column is necessarily absent from
    history."""
    from pyspark.sql.types import StructField, StructType

    if parent is None:
        return StructType(
            [
                StructField(f.name, _relax_nullability(f.dataType), True)
                for f in incoming.fields
            ]
        )
    by_name = {f.name: f for f in incoming.fields}
    out = []
    for f in parent.fields:
        inc = by_name.get(f.name)
        if inc is not None and _relax_nullability(
            inc.dataType
        ) != _relax_nullability(f.dataType):
            raise ValueError(
                f"incompatible schema evolution for column {f.name!r}: "
                f"table has {f.dataType.simpleString()}, commit has "
                f"{inc.dataType.simpleString()} — rewrite history "
                f"explicitly instead of committing a type change"
            )
        out.append(StructField(f.name, _relax_nullability(f.dataType), True))
    known = {f.name for f in parent.fields}
    out.extend(
        StructField(f.name, _relax_nullability(f.dataType), True)
        for f in incoming.fields
        if f.name not in known
    )
    return StructType(out)


def _collect_file_stats(root: str, rel_files: list) -> dict:
    """Per-file column min/max from the parquet FOOTERS of newly
    written files (Delta's add-action stats, minimally): an O(#files)
    driver-side metadata read — the data is not re-scanned. Only
    int/float/bool/str leaf columns are recorded (they JSON-round-trip
    exactly); a column with no usable stats in a file is simply absent
    — readers must treat absence as "cannot prune", never "empty"."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in rel_files:
        stats: dict = {}
        try:
            meta = pq.ParquetFile(os.path.join(root, rel)).metadata
        except Exception:
            out[rel] = {}
            continue
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    # mark unprunable: a single statless row group
                    # poisons the whole file's bound for that column
                    stats[name] = None
                    continue
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode(), hi.decode()
                    except UnicodeDecodeError:
                        stats[name] = None
                        continue
                if not isinstance(lo, (int, float, bool, str)):
                    stats[name] = None
                    continue
                cur = stats.get(name)
                if cur is None and name in stats:
                    continue  # already poisoned
                if cur is None:
                    stats[name] = [lo, hi]
                else:
                    stats[name] = [min(cur[0], lo), max(cur[1], hi)]
        # NULL-COUNT stats (round-12 surface, Delta's nullCount add
        # stats): per-column total nulls + the file row count, under
        # reserved keys so the [lo, hi] entry shape is untouched. A
        # column where ANY row group omits null_count is absent —
        # readers must treat absence as "cannot prune".
        nulls: dict = {}
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                st = col.statistics
                n = st.null_count if st is not None else None
                name = col.path_in_schema
                if n is None:
                    nulls[name] = None
                elif name not in nulls:
                    nulls[name] = int(n)
                elif nulls[name] is not None:
                    nulls[name] += int(n)
        kept_nulls = {k: v for k, v in nulls.items() if v is not None}
        out[rel] = {k: v for k, v in stats.items() if v is not None}
        if kept_nulls:
            out[rel]["__nulls__"] = kept_nulls
        out[rel]["__rows__"] = int(meta.num_rows)
    return out


# ---------------------------------------------------------------------------
# Bloom-filter file skipping (round-13 surface, Delta's per-column
# bloom filter index re-expressed manifest-side). Min/max bounds
# (f23), z-order (f25) and null counts (f38) cannot prune an EQUALITY
# probe on a column whose values interleave across files (source,
# label, tenant ids); a tiny per-file bloom can. Opt-in per commit
# (``commit_append(..., bloom_columns=("source",))``) — Delta's
# delta.bloomFilter column property, minimally; files without a bloom
# are always KEPT, so the degradation mode is "no skip", never lost
# rows.
# ---------------------------------------------------------------------------
_BLOOM_BITS = 4096  # 512 bytes/column/file in the manifest (base64)
_BLOOM_HASHES = 4   # md5 gives 4 independent 4-byte slices


def _bloom_indexes(value) -> list[int]:
    """The k bit positions for a value: md5 of its canonical string,
    sliced into k 4-byte ints — stable across processes and Python
    hash randomization (the reader MUST reproduce the writer's bits)."""
    import hashlib

    digest = hashlib.md5(str(value).encode("utf-8")).digest()
    return [
        int.from_bytes(digest[4 * i: 4 * i + 4], "big") % _BLOOM_BITS
        for i in range(_BLOOM_HASHES)
    ]


def _bloom_of_values(values) -> str:
    """Base64 bitset over the distinct values of one file's column."""
    import base64

    bits = bytearray(_BLOOM_BITS // 8)
    for v in values:
        if v is None:
            continue
        for ix in _bloom_indexes(v):
            bits[ix // 8] |= 1 << (ix % 8)
    return base64.b64encode(bytes(bits)).decode("ascii")


def bloom_might_contain(b64: str, value) -> bool:
    import base64

    bits = base64.b64decode(b64)
    return all(
        bits[ix // 8] & (1 << (ix % 8)) for ix in _bloom_indexes(value)
    )


def _collect_bloom_stats(root: str, rel_files: list, columns) -> dict:
    """Per-file per-column blooms, read column-pruned from the freshly
    written files (only the indexed columns are materialized — on a
    cluster this ride-alongs the write job; driver-side here it is one
    O(rows of indexed columns) pass per commit). Only str/int/bool
    columns are indexed: their str() round-trips exactly between
    writer and prober; floats are refused loudly."""
    import pyarrow.parquet as pq

    out: dict = {}
    cols = [c for c in columns]
    if not cols:
        return out
    for rel in rel_files:
        per_file: dict = {}
        try:
            tbl = pq.read_table(os.path.join(root, rel), columns=cols)
        except Exception:
            continue  # no bloom: reader keeps the file (conservative)
        for c in cols:
            vals = tbl.column(c).to_pylist()
            bad = next(
                (v for v in vals
                 if v is not None and not isinstance(v, (str, int, bool))),
                None,
            )
            if bad is not None:
                raise ValueError(
                    f"bloom_columns: column {c!r} holds "
                    f"{type(bad).__name__} — only str/int/bool columns "
                    "have an exact canonical form for bloom probing"
                )
            per_file[c] = _bloom_of_values(set(vals))
        if per_file:
            out[rel] = per_file
    return out


def prune_files(
    root: str, version: int, column: str, lo, hi
) -> list:
    """Manifest-side data skipping: the subset of version N's files
    whose recorded [min, max] for ``column`` intersects [lo, hi].
    Files with no stats for the column are KEPT (conservative — a
    reader must never lose rows to missing metadata). This is the
    file-level pruning a plain parquet scan cannot do (Spark prunes
    row groups inside the files it is GIVEN; the manifest decides
    which files it is given)."""
    m = read_manifest(root, version)
    stats = m.get("stats", {})
    # footer stats are keyed by the files' PHYSICAL column names;
    # callers prune on logical names
    column = m.get("column_mapping", {}).get(column, column)
    kept = []
    for f in m["files"]:
        s = stats.get(f, {}).get(column)
        # reserved per-file stats keys (__nulls__/__rows__) are not
        # [lo, hi] bounds — a column literally named like one cannot
        # prune, which is the conservative direction
        if s is None or not isinstance(s, list):
            kept.append(f)
        elif not (hi < s[0] or lo > s[1]):
            kept.append(f)
    return kept



def commit_append(
    df: DataFrame,
    root: str,
    batch_id: int | None = None,
    *,
    bloom_columns: tuple = (),
    _assume_parent: int | None = None,
) -> int:
    """Append ``df`` as a new immutable snapshot; returns the new
    version. Optimistic concurrency with AUTO-REBASE: two racing
    committers both write their (uniquely-named) data files, ``os.link``
    fails with EEXIST for the loser — and because appends COMMUTE with
    every data commit (the new files touch nothing the winner read or
    rewrote), the loser rebases: re-read the new head, re-derive the
    evolved schema against it (a type conflict still fails loudly),
    re-link one version higher. Rebase REFUSES (ConcurrentWriteError)
    if the table's constraint metadata changed since this df was
    validated — the rows would be entering under rules they were never
    checked against (Delta's MetadataChangedException). The data files
    are written exactly once; only the manifest retries.

    ``batch_id`` (streaming ingest) rides INSIDE the manifest, so the
    ledger record and the commit are one atomic link — there is no
    crash window in which the version exists but its batch id is
    unrecorded (the round-6 marker-file design had exactly that
    window, bounding replays to one duplicate instead of zero).

    ``_assume_parent`` is the deterministic race-injection hook (tests
    and the f33 face): build the first manifest attempt against a
    KNOWN-STALE parent so the EEXIST→rebase path runs without threads.
    Production callers never pass it.
    """
    txn = uuid.uuid4().hex[:12]
    parent = latest_version(root) if _assume_parent is None else _assume_parent
    gen = table_generated(root, parent)
    if gen:
        # materialize/validate generated columns BEFORE constraint
        # checks (a constraint may reference a generated column)
        df = _apply_generated(df, gen)
    validated_cons = table_constraints(root, parent)
    _enforce_constraints(df, validated_cons)
    # Schema evolution happens AT the commit point (Delta metaData-action
    # idiom): the manifest records the evolved union schema, and a type
    # conflict with history fails loudly BEFORE any data is written.
    parent_logical = table_schema(root, parent)
    _evolve_schema(parent_logical, df.schema)
    validated_mapping = column_mapping(root, parent)
    _check_retired_names(
        df.columns, parent_logical, validated_mapping,
        dropped_columns(root, parent),
    )
    if bloom_columns:
        # fail BEFORE the data write (a post-write type error would
        # orphan the files until vacuum): bloom probing requires the
        # exact canonical str() form only str/int/bool round-trip
        ok_types = {"string", "bigint", "int", "smallint", "tinyint",
                    "boolean"}
        dtypes = dict(df.dtypes)
        bad = [
            c for c in bloom_columns
            if dtypes.get(c, "<missing>") not in ok_types
        ]
        if bad:
            raise ValueError(
                f"bloom_columns {bad} must be string/integer/boolean "
                f"columns of the frame (got "
                f"{ {c: dtypes.get(c, '<missing>') for c in bad} })"
            )
    data_dir = os.path.join(root, _DATA_DIR, f"txn-{parent + 1:05d}-{txn}")
    _to_physical(df, validated_mapping).write.parquet(data_dir)
    new_files = sorted(
        os.path.join(os.path.relpath(data_dir, root), n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )
    new_stats = _collect_file_stats(root, new_files)
    if bloom_columns:
        # f40 bloom skipping: reserved __bloom__ key beside the
        # [lo, hi] bounds; physical column names (mapping applied at
        # write) so the reader probes what the files actually store
        blooms = _collect_bloom_stats(
            root,
            new_files,
            [validated_mapping.get(c, c) for c in bloom_columns],
        )
        for rel, per_file in blooms.items():
            new_stats.setdefault(rel, {})["__bloom__"] = per_file
    for _attempt in range(8):
        evolved = _evolve_schema(table_schema(root, parent), df.schema)
        prev = read_manifest(root, parent) if parent else {}
        prev_files = prev.get("files", [])
        batches = prev.get("batches", [])
        if batch_id is not None:
            batches = batches + [batch_id]
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "files": prev_files + new_files,
            "added": new_files,
            "batches": batches,
            "schema": evolved.jsonValue(),
            # per-file min/max (Delta add-action stats): parents' stats
            # carry forward, new files' come off their fresh footers
            "stats": {**prev.get("stats", {}), **new_stats},
        }
        if prev.get("dvs"):
            # live deletion vectors are snapshot state: an append that
            # dropped them would resurrect every DV-deleted row
            manifest["dvs"] = prev["dvs"]
        _carry_mapping(manifest, prev)
        _carry_constraints(manifest, prev)
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        tmp = _manifest_path(root, parent + 1) + f".{txn}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            # link (not rename): atomic AND refuses to clobber an
            # existing manifest, so the slower of two racing commits
            # loses the slot and falls into the rebase path below
            # instead of silently overwriting the winner's snapshot.
            _link_slot(tmp, root, parent + 1)
            return parent + 1
        except FileExistsError:
            head = latest_version(root)
            if head <= parent:
                raise  # a manifest exists ABOVE the head walk: corrupt
            if table_constraints(root, head) != validated_cons:
                raise ConcurrentWriteError(
                    f"append rebase aborted: table constraints changed "
                    f"between validation (v{parent}) and commit "
                    f"(v{head}) — re-validate and retry"
                )
            if column_mapping(root, head) != validated_mapping:
                raise ConcurrentWriteError(
                    f"append rebase aborted: the column mapping changed "
                    f"between validation (v{parent}) and commit "
                    f"(v{head}) — the data files were written under the "
                    "old physical naming; rewrite and retry"
                )
            parent = head
        finally:
            os.remove(tmp)
    raise ConcurrentWriteError(
        f"append to {root} lost {8} straight manifest races"
    )


def compact(
    spark: SparkSession, root: str, target_files: int = 1
) -> int:
    """OPTIMIZE: rewrite the latest version's file set into
    ``target_files`` larger files, committed as a NEW version with
    byte-identical row content. The new manifest names ONLY the
    compacted files (a REPLACING snapshot, unlike ``commit_append``'s
    cumulative one) — older manifests still pin the original small
    files, so time travel to pre-compaction versions is untouched, and
    ``expire_versions`` + ``vacuum`` is what finally reclaims them.

    This closes the lakehouse lifecycle loop: streaming/incremental
    ingest (k11/f17) produces one small file per micro-batch — the
    small-file pathology that makes a 100 TB table's scan planning
    O(millions of files) — and compaction is the standing repair job.

    Scale: ``coalesce`` (not ``repartition``) — bin-packing needs no
    row redistribution, so the rewrite is a narrow, shuffle-free
    read-merge-write; commit cost stays one O(#files) driver-side
    manifest. Uses the same link-don't-clobber commit as
    ``commit_append``, so a compactor racing an appender loses loudly
    and leaves only invisible orphans."""
    parent = latest_version(root)
    if parent == 0:
        raise ValueError("cannot compact an empty table")
    txn = uuid.uuid4().hex[:12]
    version = parent + 1
    data_dir = os.path.join(root, _DATA_DIR, f"txn-{version:05d}-{txn}")
    read_version(spark, root, parent).coalesce(target_files).write.parquet(
        data_dir
    )
    new_files = sorted(
        os.path.join(os.path.relpath(data_dir, root), n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )
    prev = read_manifest(root, parent)
    manifest = {
        "version": version,
        "parent": parent,
        "files": new_files,
        "added": new_files,
        "compacted_from": parent,
        # the ingest ledger is snapshot state: compaction rewrites the
        # FILE list but must carry the applied-batch record forward, or
        # a post-compaction checkpoint replay would double-commit
        "batches": prev.get("batches", []),
    }
    _carry_constraints(manifest, prev)
    # the table schema is likewise snapshot state — the compacted files
    # are homogeneous, but dropping the record would reopen the
    # footer-sampling nondeterminism for any LATER evolved commit
    parent_schema = prev.get("schema")
    if parent_schema is not None:
        manifest["schema"] = parent_schema
    manifest["stats"] = _collect_file_stats(root, new_files)
    tmp = _manifest_path(root, version) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, root, version)
    finally:
        os.remove(tmp)
    return version


def expire_versions(root: str, keep_last: int) -> list[int]:
    """Retention: drop manifests older than the newest ``keep_last``
    versions (time travel to them stops working; later versions keep
    every file they reference, since manifests are cumulative file
    lists). Returns the versions expired by THIS call — versions a
    previous retention run already dropped are skipped, so the job is
    idempotent (the round-6 property test falsified the unconditional
    remove with append→compact→expire→expire). The latest version is
    always kept; ``keep_last`` < 1 is rejected."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    latest = latest_version(root)
    expired = [
        v
        for v in range(1, latest - keep_last + 1)
        if os.path.exists(_manifest_path(root, v))
    ]
    for v in expired:
        os.remove(_manifest_path(root, v))
    return expired


def vacuum(root: str, retention_seconds: float = 3600.0) -> list[str]:
    """Garbage-collect data files no surviving manifest references:
    losers of racing commits, aborted-commit orphans, and files whose
    only referencing manifests were expired. Returns the deleted
    relative paths. O(#files) driver-side metadata work.

    ``retention_seconds`` is the Delta-VACUUM-style grace window: a
    file younger than it is kept even when unreferenced, because it
    may belong to an IN-FLIGHT commit — ``commit_append`` writes data
    files before the manifest link, so an unreferenced-now file
    becomes referenced the moment that committer links. Deleting
    inside the window would let the racing ``os.link`` still succeed
    and produce a committed version whose parquet files are gone.
    Pass 0 only when no commit can be running concurrently (tests,
    single-writer maintenance windows)."""
    import time

    mdir = os.path.join(root, _MANIFEST_DIR)
    live: set[str] = set()
    if os.path.isdir(mdir):
        for n in os.listdir(mdir):
            if n.startswith("v") and n.endswith(".json"):
                with open(os.path.join(mdir, n)) as f:
                    m = json.load(f)
                live.update(m["files"])
                # deletion-vector sidecars are as load-bearing as data
                # files: dropping a referenced DV would RESURRECT rows
                live.update(m.get("dvs", []))
    cutoff = time.time() - retention_seconds
    removed = []
    for top in (_DATA_DIR, _DV_DIR):
        ddir = os.path.join(root, top)
        if not os.path.isdir(ddir):
            continue
        for txn in sorted(os.listdir(ddir)):
            tdir = os.path.join(ddir, txn)
            for n in sorted(os.listdir(tdir)):
                rel = os.path.join(top, txn, n)
                path = os.path.join(tdir, n)
                if (
                    n.endswith(".parquet")
                    and rel not in live
                    and os.path.getmtime(path) <= cutoff
                ):
                    os.remove(path)
                    removed.append(rel)
            if (
                not any(n.endswith(".parquet") for n in os.listdir(tdir))
                and os.path.getmtime(tdir) <= cutoff
            ):
                # only bookkeeping files (_SUCCESS etc.) remain, and the
                # dir is outside the grace window (an in-flight write's
                # dir holds no *.parquet yet — the mtime guard keeps it)
                import shutil

                shutil.rmtree(tdir)
    return removed


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the exact file set manifest N names (latest
    when ``version`` is None). Never lists the data directory. When
    the manifest carries deletion vectors (merge-on-read DELETE,
    ``delete_where_dv``), the DV anti-join is applied here, so every
    reader — time travel, compaction, the f-family queries — sees the
    post-delete row set without any file having been rewritten."""
    if version is None:
        version = latest_version(root)
    m = read_manifest(root, version)
    if not _manifest_visible(m, root):
        raise ValueError(
            f"version {version} of {root} belongs to an uncommitted or "
            f"aborted multi-table transaction — it is not a readable "
            "snapshot"
        )
    files = m["files"]
    _check_external_refs(root, files)
    reader = spark.read
    schema = table_schema(root, version)
    mapping = m.get("column_mapping", {})
    if schema is not None:
        # Read with the manifest's EVOLVED schema, not a sampled parquet
        # footer: under schema evolution the files are heterogeneous,
        # and a footer-sampled read would return whichever commit's
        # schema Spark happened to pick (dropping added columns
        # nondeterministically). The explicit schema makes every read
        # deterministic and null-fills columns a file predates. Under
        # column mapping the files speak PHYSICAL names; the scan reads
        # those and the final projection restores the logical names.
        reader = reader.schema(_physical_schema(schema, mapping))
    scan = reader.parquet(*[os.path.join(root, f) for f in files])
    dvs = m.get("dvs", [])
    if dvs:
        scan = _strip_dv_rows(spark, root, scan, dvs)
    if mapping:
        scan = _to_logical(scan, schema, mapping)
    return scan


def _check_external_refs(root: str, files: list) -> None:
    """Clone manifests reference files OUTSIDE the table root by
    absolute path (the shallow-fork contract; `clone_table` also
    records them under the manifest's ``external_files`` key). A
    relocated or source-vacuumed reference must fail LOUDLY at plan
    time with table context — never as an opaque mid-scan error, and
    never a silent partial read. Absoluteness IS the marker, so the
    check survives fork-side COW/append commits that carry the refs
    forward by name. O(#external refs) driver-side stat calls."""
    missing = [
        f for f in files if os.path.isabs(f) and not os.path.exists(f)
    ]
    if missing:
        raise FileNotFoundError(
            f"table {root}: {len(missing)} externally-referenced "
            f"file(s) missing (cloned source relocated or vacuumed?); "
            f"first: {missing[:3]}"
        )


# ---------------------------------------------------------------------------
# Column mapping — METADATA-ONLY rename (Delta's column-mapping
# feature, name mode, minimally). Data files keep their original
# ("physical") column names forever; the manifest's schema is the
# LOGICAL schema, and a ``column_mapping`` dict (logical -> physical,
# identity pairs omitted) bridges the two. ``rename_column`` is one
# O(#files) manifest commit — zero data rewritten at any table size —
# and every reader scans with the physical schema then aliases to
# logical, so files written before AND after the rename read
# identically. OPTIMIZE (compact) rewrites all files under their
# logical names and drops the mapping, the same flush contract as
# deletion vectors.
# ---------------------------------------------------------------------------
def column_mapping(root: str, version: int | None = None) -> dict:
    """The logical -> physical name map at ``version`` (latest when
    None); empty when no rename ever happened (identity)."""
    if version is None:
        version = latest_version(root)
    if version == 0:
        return {}
    return read_manifest(root, version).get("column_mapping", {})


def _carry_dropped(manifest: dict, prev: dict) -> None:
    """Carry the DROPPED-column retirement record. Called from
    _carry_mapping (the data-commit writers) AND directly by the two
    metadata verbs that build their mapping by hand (rename_column,
    drop_column) — compact alone omits it deliberately: its rewrite
    leaves no file storing a dropped column, which is exactly the
    flush."""
    if prev.get("dropped"):
        manifest["dropped"] = prev["dropped"]


def _carry_mapping(manifest: dict, prev: dict) -> None:
    # data-commit writers route through here; the dropped record rides
    # along so drops survive merges, clones, and multi-table commits
    if prev.get("column_mapping"):
        manifest["column_mapping"] = prev["column_mapping"]
    _carry_dropped(manifest, prev)


def dropped_columns(root: str, version: int | None = None) -> dict:
    """The {physical name: logical-name-at-drop} record of every
    column ever dropped, as of ``version`` (latest when None) —
    physical-keyed so retirements accumulate even if a logical name
    is later reused."""
    if version is None:
        version = latest_version(root)
    if version == 0:
        return {}
    return read_manifest(root, version).get("dropped", {})


def _physical_schema(schema, mapping: dict):
    """The logical schema with mapped fields renamed to their physical
    (on-disk) spelling — what the parquet reader must be given."""
    from pyspark.sql.types import StructField, StructType

    if schema is None or not mapping:
        return schema
    return StructType(
        [
            StructField(
                mapping.get(f.name, f.name), f.dataType, f.nullable
            )
            for f in schema.fields
        ]
    )


def _to_logical(df: DataFrame, schema, mapping: dict) -> DataFrame:
    """Alias a physical-named scan back to logical names (schema field
    order). Extra helper columns would be dropped — callers attach
    them after."""
    from pyspark.sql import functions as F

    if schema is None or not mapping:
        return df
    return df.select(
        *[
            F.col(mapping.get(f.name, f.name)).alias(f.name)
            for f in schema.fields
        ]
    )


def _check_retired_names(
    df_cols, parent_logical, mapping: dict, dropped: dict | None = None
) -> None:
    """Retired-name rule: a NEW logical column may not reuse a name
    that is some other column's on-disk physical spelling — the files
    would carry two meanings for one physical column. DROPPED columns
    retire BOTH their spellings the same way: pre-drop files still
    store the physical column, so a re-added same-name column would
    read ghost values out of history. Shared by commit_append and
    commit_multi."""
    dropped = dropped or {}
    if not mapping and not dropped:
        return
    known = (
        {f.name for f in parent_logical.fields}
        if parent_logical is not None
        else set()
    )
    retired = {phys for log, phys in mapping.items() if phys != log}
    retired |= set(dropped) | set(dropped.values())
    bad = sorted((set(df_cols) - known) & retired)
    if bad:
        raise ValueError(
            f"append: new column(s) {bad} collide with retired "
            "physical column names (rename/drop history) — pick "
            "different names or OPTIMIZE to flush the mapping first"
        )


def _to_physical(df: DataFrame, mapping: dict) -> DataFrame:
    """Rename a logical-named frame to physical spelling before a file
    write, so every data file of the table speaks one naming."""
    from pyspark.sql import functions as F

    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def rename_column(root: str, old: str, new: str) -> int:
    """ALTER TABLE ... RENAME COLUMN (Delta's column-mapping verb):
    one metadata-only commit — the logical schema gets the new name,
    the mapping records new -> <old's physical name>, and no data file
    is touched. Time travel below the rename shows the old name (each
    manifest carries its own schema+mapping). Refuses when a CHECK
    constraint references the old name (rewrite the constraint
    explicitly; a silent textual rewrite could alias an unrelated
    substring), and when ``new`` already exists logically.

    Note the retired-name rule enforced at append time: once ``old``
    is a physical-only name, a LATER new column may not reuse it
    (files would hold two meanings for one physical column). Delta
    avoids this with GUID physical names (id mode); this store keeps
    names readable and refuses the collision loudly instead."""
    import re as _re

    from pyspark.sql.types import StructField, StructType

    parent = latest_version(root)
    if parent == 0:
        raise ValueError("cannot rename a column of an empty table")
    prev = read_manifest(root, parent)
    schema = table_schema(root, parent)
    if schema is None:
        raise ValueError(
            "rename_column needs a recorded table schema (pre-evolution "
            "manifest) — recommit once to record one"
        )
    names = [f.name for f in schema.fields]
    if old not in names:
        raise ValueError(f"rename_column: no column {old!r} in {names}")
    if new in names:
        raise ValueError(f"rename_column: column {new!r} already exists")
    dropped = prev.get("dropped", {})
    retired = set(dropped) | set(dropped.values())
    if new in retired:
        raise ValueError(
            f"rename_column: {new!r} is a retired spelling of a DROPPED "
            "column — pre-drop files still store it; pick another name "
            "or compact first to flush the retirement"
        )
    for cname, expr in prev.get("constraints", {}).items():
        if _re.search(rf"\b{_re.escape(old)}\b", expr):
            raise ValueError(
                f"rename_column: CHECK constraint {cname!r} ({expr}) "
                f"references {old!r} — drop and recreate it against the "
                "new name first"
            )
    for gname, expr in prev.get("generated", {}).items():
        if gname == old or _re.search(rf"\b{_re.escape(old)}\b", expr):
            raise ValueError(
                f"rename_column: generated column {gname!r} = ({expr}) "
                f"involves {old!r} — a silent rename would desynchronize "
                "the expression from the data it generated"
            )
    mapping = dict(prev.get("column_mapping", {}))
    physical = mapping.pop(old, old)
    mapping[new] = physical
    new_schema = StructType(
        [
            StructField(new if f.name == old else f.name, f.dataType,
                        f.nullable)
            for f in schema.fields
        ]
    )
    txn = uuid.uuid4().hex[:12]
    manifest = {
        "version": parent + 1,
        "parent": parent,
        "files": prev.get("files", []),
        "added": [],
        "renamed_column": [old, new],
        "column_mapping": mapping,
        "schema": new_schema.jsonValue(),
        "batches": prev.get("batches", []),
        "stats": prev.get("stats", {}),
    }
    _carry_dropped(manifest, prev)
    _carry_constraints(manifest, prev)
    if "external_files" in prev:
        manifest["external_files"] = prev["external_files"]
    if prev.get("dvs"):
        manifest["dvs"] = prev["dvs"]
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, parent + 1) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, root, parent + 1)
    finally:
        os.remove(tmp)
    return parent + 1


def drop_column(root: str, name: str) -> int:
    """ALTER TABLE ... DROP COLUMN (Delta's column-mapping drop,
    round-14 surface): one metadata-only commit — the logical schema
    loses the field, no data file is touched, and time travel below
    the drop still shows the column (each manifest carries its own
    schema). The dropped column's BOTH spellings (logical-at-drop and
    physical) join the retired-name set: pre-drop files still store
    the physical column, so a re-added same-name column would read
    ghost values out of history — refused loudly at append
    (``_check_retired_names``), exactly the rename rule. COMPACTION
    lifts the retirement the same way it flushes the rename mapping:
    the rewrite leaves no file storing the old column, so a
    post-compact re-add is sound (null-filled history).

    Refuses: dropping the last column, a column a CHECK constraint
    references, and a generated column's BASE (the expression would
    dangle); dropping the generated column ITSELF is fine and removes
    its expression. Blooms/min-max stats are per-file entries keyed by
    physical name — they simply go dark with the column (readers only
    consult stats for pushed predicates over live columns)."""
    import re as _re

    from pyspark.sql.types import StructField, StructType

    parent = latest_version(root)
    if parent == 0:
        raise ValueError("cannot drop a column of an empty table")
    prev = read_manifest(root, parent)
    schema = table_schema(root, parent)
    if schema is None:
        raise ValueError(
            "drop_column needs a recorded table schema (pre-evolution "
            "manifest) — recommit once to record one"
        )
    names = [f.name for f in schema.fields]
    if name not in names:
        raise ValueError(f"drop_column: no column {name!r} in {names}")
    if len(names) == 1:
        raise ValueError("drop_column: cannot drop the only column")
    for cname, expr in prev.get("constraints", {}).items():
        if _re.search(rf"\b{_re.escape(name)}\b", expr):
            raise ValueError(
                f"drop_column: CHECK constraint {cname!r} ({expr}) "
                f"references {name!r} — drop the constraint first"
            )
    gen = dict(prev.get("generated", {}))
    for gname, expr in gen.items():
        if gname != name and _re.search(
            rf"\b{_re.escape(name)}\b", expr
        ):
            raise ValueError(
                f"drop_column: generated column {gname!r} = ({expr}) "
                f"references {name!r} — drop the generated column first"
            )
    gen.pop(name, None)
    mapping = dict(prev.get("column_mapping", {}))
    physical = mapping.pop(name, name)
    new_schema = StructType(
        [f for f in schema.fields if f.name != name]
    )
    txn = uuid.uuid4().hex[:12]
    manifest = {
        "version": parent + 1,
        "parent": parent,
        "files": prev.get("files", []),
        "added": [],
        "dropped_column": [name, physical],
        # keyed by PHYSICAL spelling: physical names are unique across
        # drops (a retired spelling can never come back, below), so a
        # reused LOGICAL name cannot clobber an earlier retirement
        "dropped": {**prev.get("dropped", {}), physical: name},
        "schema": new_schema.jsonValue(),
        "batches": prev.get("batches", []),
        "stats": prev.get("stats", {}),
    }
    if mapping:
        manifest["column_mapping"] = mapping
    if "constraints" in prev:
        manifest["constraints"] = prev["constraints"]
    if gen:
        manifest["generated"] = gen
    if "external_files" in prev:
        manifest["external_files"] = prev["external_files"]
    if prev.get("dvs"):
        manifest["dvs"] = prev["dvs"]
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, parent + 1) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, root, parent + 1)
    finally:
        os.remove(tmp)
    return parent + 1


def version_as_of_timestamp(root: str, ts: float) -> int:
    """The newest version whose manifest was committed at or before
    unix-seconds ``ts`` — Delta's TIMESTAMP AS OF resolution, using
    the commit file's own mtime exactly as Delta does. Hidden
    (txn-invisible) versions are skipped; raises if the table has no
    commit at or before ``ts``."""
    head = latest_version(root)
    if head == 0:
        raise ValueError(f"{root} has no committed versions")
    # newest-first with early return: the first visible manifest with
    # mtime <= ts IS the newest such version, so resolution is O(1)
    # manifest reads for recent timestamps instead of O(versions)
    for v in range(head, 0, -1):
        path = _manifest_path(root, v)
        try:
            mtime = os.path.getmtime(path)
        except FileNotFoundError:
            continue  # expired/vacuumed hole
        if mtime <= ts and _manifest_visible(read_manifest(root, v), root):
            return v
    raise ValueError(
        f"no version of {root} committed at or before ts={ts}"
    )


def read_as_of_timestamp(
    spark: SparkSession, root: str, ts: float
) -> DataFrame:
    """Time-travel read by TIMESTAMP (Delta's ``timestampAsOf``):
    resolve the version via commit-file mtimes, then the plain pinned
    snapshot read."""
    return read_version(spark, root, version_as_of_timestamp(root, ts))


# ---------------------------------------------------------------------------
# Deletion vectors — MERGE-ON-READ delete (Delta's deletion vectors /
# Iceberg's positional delete files, re-expressed Spark-first). A DV
# commit writes NO data files: it records (file, row position) pairs in
# parquet sidecars under dv/ and a manifest that carries the same file
# list plus the grown ``dvs`` sidecar set. Readers apply one LEFT ANTI
# join keyed on the hidden ``_metadata`` columns (file_path, row_index
# — stable physical positions, independent of split parallelism), so a
# delete over a 100 TB table costs O(matching rows) distributed work
# and zero rewrite; ``materialize_dvs`` (OPTIMIZE's DV flush) folds the
# vectors back into plain files, file-granularly. Reference: the
# MapReduce substrate has no deletes at all (SURVEY.md §2.1); this is
# engine surface beyond it, the low-write-amplification twin of the
# copy-on-write ``delete_where``.
# ---------------------------------------------------------------------------
_DV_DIR = "dv"
_DV_SCHEMA = "_dv_file STRING, _dv_pos BIGINT"


def _dv_file_key(root: str):
    """JVM-side file key for each scanned row: ``_metadata.file_path``
    normalized from its URI form (``file:/abs`` or ``file:///abs``) to
    a bare path, then made TABLE-RELATIVE when it lives under ``root``
    (relocation-safe for table-local files — the same contract as the
    manifest's relative file refs). External (cloned) refs stay
    absolute, matching their manifest spelling. Pure string expressions
    — no UDF in the read path."""
    from pyspark.sql import functions as F

    base = os.path.abspath(root) + os.sep
    fp = F.col("_metadata.file_path")
    # Spark reports file_path in PERCENT-ENCODED URI form; the manifest
    # records raw paths. Decode the URI branch (mirroring _uri_to_local,
    # round-11 ADVICE) so a root containing a space/%/non-ASCII char
    # still prefix-matches ``base`` and keys come out table-relative.
    # ``url_decode`` is form-decoding ('+' -> ' '); a literal '+' is
    # legal un-encoded in a URI path, so pre-escape it to '%2B' to make
    # the decode pure percent-decoding. Bare (schemeless) paths pass
    # through un-decoded, exactly as _uri_to_local treats them.
    bare = F.when(
        fp.startswith("file:"),
        F.url_decode(
            F.regexp_replace(
                F.concat(F.lit("/"), F.regexp_replace(fp, "^file:/*", "")),
                r"\+",
                "%2B",
            )
        ),
    ).otherwise(fp)
    return F.when(
        bare.startswith(base),
        F.substring(bare, len(base) + 1, 2147483647),
    ).otherwise(bare)


def _read_dvs(spark: SparkSession, root: str, dv_rel: list) -> DataFrame:
    """The union of the manifest's deletion-vector sidecars, read with
    a pinned schema (never footer-sampled)."""
    return spark.read.schema(_DV_SCHEMA).parquet(
        *[os.path.join(root, f) for f in dv_rel]
    )


def _attach_dv_cols(df: DataFrame, root: str) -> DataFrame:
    """Attach the DV join key (file key + physical row index) to a
    file-scan frame. Must be called on the scan relation itself —
    ``_metadata`` does not survive joins."""
    from pyspark.sql import functions as F

    return df.withColumn("_kmce_dv_file", _dv_file_key(root)).withColumn(
        "_kmce_dv_pos", F.col("_metadata.row_index")
    )


def _strip_dv_rows(
    spark: SparkSession, root: str, scan: DataFrame, dv_rel: list
) -> DataFrame:
    """Filter DV-deleted rows out of a file scan: one LEFT ANTI join on
    (file key, row position). Extra columns already on ``scan`` (e.g.
    the COW engine's ``_kmce_file``) pass through untouched. The DV
    side is O(deleted rows); Catalyst broadcasts it when small and AQE
    re-plans when not — the same asymptotics as Iceberg's positional
    delete merge."""
    dv = _read_dvs(spark, root, dv_rel)
    keyed = _attach_dv_cols(scan, root)
    cond = (keyed["_kmce_dv_file"] == dv["_dv_file"]) & (
        keyed["_kmce_dv_pos"] == dv["_dv_pos"]
    )
    return keyed.join(dv, cond, "left_anti").drop(
        "_kmce_dv_file", "_kmce_dv_pos"
    )


def delete_where_dv(
    spark: SparkSession,
    root: str,
    predicate: str,
    batch_id: int | None = None,
    expected_version: int | None = None,
) -> int:
    """MERGE-ON-READ DELETE: commit a new version in which no live row
    satisfies ``predicate`` by recording the matching rows' (file,
    position) pairs as deletion-vector sidecars — no data file is read
    back, rewritten, or moved. Returns the new version (the CURRENT
    version for a no-op: predicate matched nothing live, no version
    burned, no sidecar kept).

    Contract mirrors ``delete_where`` exactly from a reader's view —
    the two are interchangeable verbs over the same table; this one
    trades read-side join work for O(1) write amplification, the right
    half of the trade-off for frequent small deletes over huge files
    (Delta enables DVs for exactly that shape). Already-deleted rows
    are invisible to the predicate scan, so re-running a delete is a
    clean no-op, and DVs from successive deletes UNION. History stays
    immutable: version N-1 still shows the rows; ``materialize_dvs``
    or any OPTIMIZE/COW rewrite folds vectors into files.

    Scale: the scan is predicate-pushed; the sidecar write is
    O(matching rows) distributed; the commit is one O(#files) driver
    manifest. Non-commuting with concurrent rewrites, so the manifest
    link race raises rather than rebases (pass ``expected_version``
    for CAS semantics)."""
    import shutil

    from pyspark.sql import functions as F

    parent = latest_version(root)
    if expected_version is not None and parent != expected_version:
        raise ConcurrentWriteError(
            f"dv delete on {root} expected head v{expected_version}, "
            f"found v{parent}"
        )
    if parent == 0:
        raise ValueError("cannot delete from an empty table")
    manifest = read_manifest(root, parent)
    files = manifest["files"]
    _check_external_refs(root, files)
    reader = spark.read
    schema = table_schema(root, parent)
    mapping = manifest.get("column_mapping", {})
    if schema is not None:
        reader = reader.schema(_physical_schema(schema, mapping))
    keyed = _attach_dv_cols(
        reader.parquet(*[os.path.join(root, f) for f in files]), root
    )
    prev_dvs = manifest.get("dvs", [])
    if prev_dvs:
        dv = _read_dvs(spark, root, prev_dvs)
        cond = (keyed["_kmce_dv_file"] == dv["_dv_file"]) & (
            keyed["_kmce_dv_pos"] == dv["_dv_pos"]
        )
        keyed = keyed.join(dv, cond, "left_anti")
    if mapping:
        # the predicate speaks logical names; keep the vector key cols
        keyed = keyed.select(
            *[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in schema.fields
            ],
            F.col("_kmce_dv_file"),
            F.col("_kmce_dv_pos"),
        )
    txn = uuid.uuid4().hex[:12]
    version = parent + 1
    doomed = keyed.filter(predicate).select(
        F.col("_kmce_dv_file").alias("_dv_file"),
        F.col("_kmce_dv_pos").alias("_dv_pos"),
    )
    dv_dir = os.path.join(root, _DV_DIR, f"txn-{version:05d}-{txn}")
    doomed.write.parquet(dv_dir)
    new_dvs = _drop_empty_files(
        root,
        sorted(
            os.path.join(os.path.relpath(dv_dir, root), n)
            for n in os.listdir(dv_dir)
            if n.endswith(".parquet")
        ),
    )
    if not new_dvs:
        shutil.rmtree(dv_dir, ignore_errors=True)
        return parent
    new_manifest = {
        "version": version,
        "parent": parent,
        "files": files,
        "added": [],
        "dvs": prev_dvs + new_dvs,
        "dv_added": new_dvs,
        "batches": (
            manifest.get("batches", [])
            + ([batch_id] if batch_id is not None else [])
        ),
        # per-file min/max stay VALID bounds after row deletion —
        # conservative for pruning, never lossy
        "stats": manifest.get("stats", {}),
    }
    if manifest.get("schema") is not None:
        new_manifest["schema"] = manifest["schema"]
    _carry_constraints(new_manifest, manifest)
    _carry_mapping(new_manifest, manifest)
    if "external_files" in manifest:
        new_manifest["external_files"] = manifest["external_files"]
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, version) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(new_manifest, f)
    try:
        _link_slot(tmp, root, version)
    finally:
        os.remove(tmp)
    return version


def materialize_dvs(spark: SparkSession, root: str) -> int:
    """OPTIMIZE's deletion-vector flush: rewrite ONLY the files that
    have live DV rows (survivors re-written without their deleted
    rows), carry every clean file BY NAME, and commit a new version
    with no ``dvs`` — after which reads are plain scans again. A table
    with no DVs is a no-op (current version, no commit). History stays
    immutable: the DV versions still apply their vectors on time
    travel until retention.

    Scale: data work is O(rows in DV'd files); the distinct-file probe
    is bounded by the manifest's file count."""
    parent = latest_version(root)
    if parent == 0:
        raise ValueError("cannot materialize an empty table")
    manifest = read_manifest(root, parent)
    dvs = manifest.get("dvs", [])
    if not dvs:
        return parent
    dv_keys = {
        r["_dv_file"]
        for r in _read_dvs(spark, root, dvs)
        .select("_dv_file")
        .distinct()
        .collect()
    }
    # stale keys (files a later COW/compact already rewrote) resolve to
    # nothing here — their vectors are inert and simply dropped
    affected = [f for f in manifest["files"] if f in dv_keys]
    # Guard (round-11 ADVICE): a stale key is a RELATIVE name no longer
    # in the file list. A key that is an absolute/encoded spelling OF a
    # live manifest file is not stale — it is a key-normalization bug,
    # and dropping it would silently resurrect deleted rows. Raise.
    from urllib.parse import unquote

    base = os.path.abspath(root) + os.sep
    live = set(manifest["files"])
    mismatched = sorted(
        k
        for k in dv_keys
        if k not in live
        and any(
            cand.startswith(base) and cand[len(base):] in live
            for cand in (k, unquote(k))
        )
    )
    if mismatched:
        raise ValueError(
            f"deletion-vector keys {mismatched[:3]} are alternate "
            f"spellings of live manifest files of {root}; refusing to "
            "drop them as stale (key-normalization bug would resurrect "
            "deleted rows)"
        )
    txn = uuid.uuid4().hex[:12]
    version = parent + 1
    new_files: list = []
    if affected:
        reader = spark.read
        schema = table_schema(root, parent)
        # the rewrite keeps the files' PHYSICAL naming (mapping carries
        # forward unchanged — only compact flushes it)
        if schema is not None:
            reader = reader.schema(
                _physical_schema(
                    schema, manifest.get("column_mapping", {})
                )
            )
        scan = reader.parquet(*[os.path.join(root, f) for f in affected])
        survivors = _strip_dv_rows(spark, root, scan, dvs)
        data_dir = os.path.join(root, _DATA_DIR, f"txn-{version:05d}-{txn}")
        survivors.write.parquet(data_dir)
        new_files = _drop_empty_files(
            root,
            sorted(
                os.path.join(os.path.relpath(data_dir, root), n)
                for n in os.listdir(data_dir)
                if n.endswith(".parquet")
            ),
        )
    affected_set = set(affected)
    kept = [f for f in manifest["files"] if f not in affected_set]
    prev_stats = manifest.get("stats", {})
    new_manifest = {
        "version": version,
        "parent": parent,
        "files": kept + new_files,
        "added": new_files,
        "dv_materialized_from": affected,
        "batches": manifest.get("batches", []),
        "stats": {
            **{f: prev_stats[f] for f in kept if f in prev_stats},
            **_collect_file_stats(root, new_files),
        },
    }
    if manifest.get("schema") is not None:
        new_manifest["schema"] = manifest["schema"]
    _carry_constraints(new_manifest, manifest)
    _carry_mapping(new_manifest, manifest)
    if "external_files" in manifest:
        # externally-referenced files may have been rewritten local;
        # keep only refs still in the carried file list
        ext = [f for f in manifest["external_files"] if f in set(kept)]
        if ext:
            new_manifest["external_files"] = ext
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, version) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(new_manifest, f)
    try:
        _link_slot(tmp, root, version)
    finally:
        os.remove(tmp)
    return version


def read_with_rowids(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    id_col: str = "_row_id",
) -> DataFrame:
    """Snapshot read with a STABLE synthetic row id — Delta's row
    tracking, minimally: id = (cumulative row offset of the file in
    manifest order) + (physical row position within the file), derived
    entirely from the manifest plus the ``_metadata.row_index`` hidden
    column. No shuffle, no window over data, no zipWithIndex: ids are
    assigned at READ time from metadata, identically on every executor
    layout.

    Stability contract (the useful half of row tracking): ids are
    dense 0..n-1 at birth and STABLE UNDER APPEND (a new commit's
    files sort after every existing file, so old rows keep their ids),
    under RENAME (metadata-only), and under DV DELETE (deleted rows
    keep occupying their positions — survivors' ids never shift, ids
    of dead rows simply disappear). A COW rewrite or OPTIMIZE
    renumbers the rewritten files' rows — same caveat Delta documents
    when row tracking is off during a rewrite. Per-file row counts
    come from parquet footers, an O(#files) driver-side metadata read
    (a production deployment records counts in the commit's
    add-action stats instead).

    The primitive a training pipeline needs for example-level lineage:
    join loss spikes back to corpus rows, cite examples in an audit,
    or key a labels sidecar without materializing an id column."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    if version is None:
        version = latest_version(root)
    m = read_manifest(root, version)
    if not _manifest_visible(m, root):
        raise ValueError(
            f"version {version} of {root} belongs to an uncommitted or "
            f"aborted multi-table transaction — it is not a readable "
            "snapshot"
        )
    files = m["files"]
    _check_external_refs(root, files)
    offsets = []
    base = 0
    for f in files:
        offsets.append((f, base))
        base += pq.ParquetFile(
            os.path.join(root, f)
        ).metadata.num_rows
    reader = spark.read
    schema = table_schema(root, version)
    mapping = m.get("column_mapping", {})
    if schema is not None:
        reader = reader.schema(_physical_schema(schema, mapping))
    scan = (
        reader.parquet(*[os.path.join(root, f) for f in files])
        .withColumn("_kmce_rid_file", _dv_file_key(root))
        .withColumn("_kmce_rid_pos", F.col("_metadata.row_index"))
    )
    dvs = m.get("dvs", [])
    if dvs:
        # the (file, position) key IS the deletion-vector key — reuse
        # the attached columns (``_metadata`` does not survive joins,
        # so the strip must precede the offset join)
        dv = _read_dvs(spark, root, dvs)
        cond = (scan["_kmce_rid_file"] == dv["_dv_file"]) & (
            scan["_kmce_rid_pos"] == dv["_dv_pos"]
        )
        scan = scan.join(dv, cond, "left_anti")
    base_df = spark.createDataFrame(
        offsets, "_kmce_rid_file STRING, _kmce_rid_base BIGINT"
    )
    scan = (
        scan.join(F.broadcast(base_df), "_kmce_rid_file")
        .withColumn(
            id_col, F.col("_kmce_rid_base") + F.col("_kmce_rid_pos")
        )
        .drop("_kmce_rid_file", "_kmce_rid_pos", "_kmce_rid_base")
    )
    if mapping:
        scan = scan.select(
            *[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in schema.fields
            ],
            F.col(id_col),
        )
    return scan


def commit_multi(
    dfs: dict[str, DataFrame],
    batch_id: int | None = None,
    _crash_before_finalize: bool = False,
) -> dict[str, int]:
    """ATOMIC MULTI-TABLE append (the Iceberg/Nessie catalog-commit
    shape — beyond Delta's per-table log): append one DataFrame to
    each of several versioned tables such that readers observe ALL
    the new snapshots or NONE, even across crashes.

    Protocol (single-CAS visibility): the lexicographically-first
    table root is the transaction COORDINATOR. Each participating
    manifest links into its slot carrying a ``txn`` tag
    ({id, coordinator}) — tagged manifests are INVISIBLE to every
    reader until the coordinator's ``_txns/<id>.final`` file says
    'committed'. That file is created once, by link-don't-clobber, so
    the commit point is one atomic filesystem op covering all tables.
    A crash before the finalize leaves pending manifests that block
    their slots (writers get a loud ConcurrentWriteError) until
    ``abort_txn`` settles the verdict; a recoverer and a late
    committer CAS on the same file, so exactly one outcome wins.

    Per table the append carries commit_append's full contract —
    constraints, schema evolution, column-mapping physical write,
    dv/mapping/constraint carry, optional shared ``batch_id`` ledger
    entry. No rebase: any slot conflict aborts the WHOLE transaction
    (manifests are invisible, so removal is safe) and the caller
    retries.

    ``_crash_before_finalize`` is the deterministic crash-injection
    hook for tests; production callers never pass it.

    Scale: one distributed file write per table + O(Σ #files) driver
    manifests + ONE coordinator link — the same asymptotics as N
    independent appends, with atomicity riding a single extra file."""
    if not dfs:
        raise ValueError("commit_multi: no tables given")
    roots = sorted(os.path.abspath(r) for r in dfs)
    by_abs = {os.path.abspath(r): df for r, df in dfs.items()}
    if len(roots) != len(by_abs):
        raise ValueError("commit_multi: duplicate table roots")
    coordinator = roots[0]
    txn_id = uuid.uuid4().hex
    linked: list[tuple[str, int]] = []

    def _abort() -> None:
        _finalize_txn(coordinator, txn_id, "aborted")
        for r, v in linked:
            try:
                os.remove(_manifest_path(r, v))
            except FileNotFoundError:
                pass

    try:
        for root in roots:
            df = by_abs[root]
            parent = latest_version(root)
            g = table_generated(root, parent)
            if g:
                df = _apply_generated(df, g)
            cons = table_constraints(root, parent)
            _enforce_constraints(df, cons)
            parent_logical = table_schema(root, parent)
            evolved = _evolve_schema(parent_logical, df.schema)
            mapping = column_mapping(root, parent)
            _check_retired_names(
                df.columns, parent_logical, mapping,
                dropped_columns(root, parent),
            )
            txn8 = txn_id[:12]
            data_dir = os.path.join(
                root, _DATA_DIR, f"txn-{parent + 1:05d}-{txn8}"
            )
            _to_physical(df, mapping).write.parquet(data_dir)
            new_files = sorted(
                os.path.join(os.path.relpath(data_dir, root), n)
                for n in os.listdir(data_dir)
                if n.endswith(".parquet")
            )
            prev = read_manifest(root, parent) if parent else {}
            manifest = {
                "version": parent + 1,
                "parent": parent,
                "files": prev.get("files", []) + new_files,
                "added": new_files,
                "batches": (
                    prev.get("batches", [])
                    + ([batch_id] if batch_id is not None else [])
                ),
                "schema": evolved.jsonValue(),
                "stats": {
                    **prev.get("stats", {}),
                    **_collect_file_stats(root, new_files),
                },
                "txn": {"id": txn_id, "coordinator": coordinator},
            }
            if prev.get("dvs"):
                manifest["dvs"] = prev["dvs"]
            _carry_mapping(manifest, prev)
            _carry_constraints(manifest, prev)
            if "external_files" in prev:
                manifest["external_files"] = prev["external_files"]
            os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
            tmp = _manifest_path(root, parent + 1) + f".{txn8}.tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            try:
                _link_slot(tmp, root, parent + 1)
            finally:
                os.remove(tmp)
            linked.append((root, parent + 1))
    except BaseException:
        _abort()
        raise
    if _crash_before_finalize:
        # test hook: every manifest linked, nothing visible
        return {r: v for r, v in linked}
    state = _finalize_txn(coordinator, txn_id, "committed")
    if state != "committed":
        # a recoverer aborted us between our last link and the CAS
        for r, v in linked:
            try:
                os.remove(_manifest_path(r, v))
            except FileNotFoundError:
                pass
        raise ConcurrentWriteError(
            f"multi-table txn {txn_id} was aborted by a recoverer "
            "before it could finalize — retry"
        )
    # best-effort participant-local verdict mirrors: committed history
    # must stay readable even if the coordinator table is later
    # relocated or dropped (readers check the local mirror first)
    for r, _v in linked:
        if r != coordinator:
            try:
                _finalize_txn(r, txn_id, "committed")
            except OSError:
                pass  # mirror is an availability optimization only
    return {r: v for r, v in linked}


def abort_txn(coordinator: str, txn_id: str) -> bool:
    """Settle a stuck multi-table transaction (the maintenance verb a
    crashed ``commit_multi`` needs): CAS the outcome to 'aborted'.
    Returns True if the abort won; False if the transaction had
    already committed (in which case its manifests are live history
    and must stand). Aborted manifests left behind are invisible and
    reclaimed lazily by the next writer's slot claim."""
    return _finalize_txn(coordinator, txn_id, "aborted") == "aborted"


def _uri_to_local(uri: str) -> str:
    """Normalize an ``input_file_name()`` value to a real local path.

    Spark builds and filesystems disagree on the URI form ('file:///p',
    'file:/p' single-slash, percent-encoded characters in the path) —
    parse as a URI rather than string-stripping a literal 'file://'
    prefix (round-7 ADVICE). A bare path (no scheme) passes through."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(uri)
    path = unquote(parsed.path) if parsed.scheme else uri
    return os.path.realpath(path)


def _drop_empty_files(root: str, rel_files: list) -> list:
    """Remove zero-row parquet outputs from a freshly-written file set
    (deleting them from disk too). A COW rewrite whose affected files
    lose ALL their rows (e.g. the k26 retraction deleting a whole
    version's sub-aggregate) otherwise leaves a 0-row file that carries
    forward in every later manifest — a small-file leak that grows with
    table age. O(#new files) driver-side footer reads."""
    import pyarrow.parquet as pq

    kept = []
    for rel in rel_files:
        path = os.path.join(root, rel)
        try:
            n = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            kept.append(rel)
            continue
        if n > 0:
            kept.append(rel)
        else:
            try:
                os.remove(path)
            except OSError:
                pass
    return kept


def _cow_rewrite(
    spark: SparkSession,
    root: str,
    predicate: str,
    transform,
    manifest_key: str,
    batch_id: int | None = None,
    expected_version: int | None = None,
) -> int:
    """Shared copy-on-write engine for DELETE/UPDATE: find the files
    that CONTAIN matching rows (one input_file_name() scan, predicate
    pushdown pruning the rest), rewrite only those files through
    ``transform`` (given the affected-file frame, returns the rows the
    new files must hold), carry every clean file into the new manifest
    BY NAME, and commit with the same link-don't-clobber discipline as
    commit_append. A predicate matching nothing commits nothing."""
    from pyspark.sql import functions as F

    parent = latest_version(root)
    if expected_version is not None and parent != expected_version:
        # COW rewrites do NOT commute (they read the snapshot they
        # rewrite): a stale read snapshot is a hard conflict, never a
        # rebase (Delta's ConcurrentDeleteReadException shape).
        raise ConcurrentWriteError(
            f"rewrite of {root} expected head v{expected_version}, "
            f"found v{parent}"
        )
    if parent == 0:
        raise ValueError("cannot rewrite an empty table")
    manifest = read_manifest(root, parent)
    rel_files = manifest["files"]
    schema = table_schema(root, parent)
    mapping = manifest.get("column_mapping", {})
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_physical_schema(schema, mapping))
    abs_of = {os.path.realpath(os.path.join(root, f)): f for f in rel_files}
    df = reader.parquet(*abs_of).withColumn(
        "_kmce_file", F.input_file_name()
    )
    dvs = manifest.get("dvs", [])
    if dvs:
        # a merge-on-read table: DV-deleted rows are DEAD — they must
        # neither count as predicate matches nor resurrect through the
        # rewrite's survivor pass (the rewritten files bake the
        # deletions in; the carried DV entries for them go stale and
        # inert, flushed by the next materialize_dvs)
        df = _strip_dv_rows(spark, root, df, dvs)
    if mapping:
        # the predicate and the transform speak LOGICAL names; alias
        # the physical scan, keeping the provenance column
        df = df.select(
            *[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in schema.fields
            ],
            F.col("_kmce_file"),
        )
    raw_affected = [
        r["_kmce_file"]
        for r in df.filter(predicate).select("_kmce_file").distinct().collect()
    ]
    affected_abs = {_uri_to_local(u) for u in raw_affected}
    unknown = affected_abs - set(abs_of)
    if unknown:
        raise ValueError(
            f"input_file_name() returned paths outside the manifest "
            f"file set: {sorted(unknown)[:3]}"
        )
    affected_rel = sorted(abs_of[a] for a in affected_abs)
    if not affected_rel:
        return parent
    txn = uuid.uuid4().hex[:12]
    version = parent + 1
    data_dir = os.path.join(root, _DATA_DIR, f"txn-{version:05d}-{txn}")
    # filter on the RAW strings this very scan produced — immune to any
    # further normalization quirk, since re-scan reproduces them exactly
    affected_rows = df.filter(
        F.col("_kmce_file").isin(raw_affected)
    ).drop("_kmce_file")
    rewritten = transform(affected_rows)
    # an UPDATE can falsify a CHECK constraint; a DELETE can't, but the
    # enforcement is O(first violation) over the affected subset only
    _enforce_constraints(rewritten, manifest.get("constraints", {}))
    _to_physical(rewritten, mapping).write.parquet(data_dir)
    new_files = _drop_empty_files(
        root,
        sorted(
            os.path.join(os.path.relpath(data_dir, root), n)
            for n in os.listdir(data_dir)
            if n.endswith(".parquet")
        ),
    )
    affected = set(affected_rel)
    kept = [f for f in rel_files if f not in affected]
    prev_stats = manifest.get("stats", {})
    new_manifest = {
        "version": version,
        "parent": parent,
        "files": kept + new_files,
        "added": new_files,
        manifest_key: affected_rel,
        "batches": (
            manifest.get("batches", [])
            + ([batch_id] if batch_id is not None else [])
        ),
        "stats": {
            **{f: prev_stats[f] for f in kept if f in prev_stats},
            **_collect_file_stats(root, new_files),
        },
    }
    if manifest.get("schema") is not None:
        new_manifest["schema"] = manifest["schema"]
    _carry_constraints(new_manifest, manifest)
    _carry_mapping(new_manifest, manifest)
    if dvs:
        # vectors for KEPT files stay live; entries keyed to rewritten
        # files reference nothing in the new file list (inert)
        new_manifest["dvs"] = dvs
    if "external_files" in manifest:
        ext = [f for f in manifest["external_files"] if f in set(kept)]
        if ext:
            new_manifest["external_files"] = ext
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, version) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(new_manifest, f)
    try:
        _link_slot(tmp, root, version)
    finally:
        os.remove(tmp)
    return version


def delete_where(
    spark: SparkSession,
    root: str,
    predicate: str,
    batch_id: int | None = None,
    expected_version: int | None = None,
) -> int:
    """COPY-ON-WRITE DELETE (Delta/Iceberg's DELETE FROM, minimally):
    commit a new version in which no row satisfies ``predicate`` — the
    right-to-be-forgotten operation a training-corpus store must have.
    Returns the new version (the CURRENT version for a no-op delete:
    no version burned, no byte rewritten).

    File-granular COW: only files that actually CONTAIN matching rows
    are rewritten (their survivors re-written into new files); every
    untouched file is carried into the new manifest BY NAME, unread and
    unmoved. History is immutable — earlier versions still name the
    original files and still show the deleted rows (physical reclaim is
    expire_versions + vacuum, exactly as for compaction) — so "forget"
    at the TABLE level is this delete plus retention of the history
    window, the same contract Delta documents for GDPR.

    Scale: a delete touching f of N files costs O(f) data work +
    O(N) manifest metadata, never a full-table rewrite."""

    def drop_matches(affected):
        return affected.filter(f"NOT ({predicate})")

    return _cow_rewrite(
        spark, root, predicate, drop_matches, "deleted_from",
        batch_id=batch_id, expected_version=expected_version,
    )


def update_where(
    spark: SparkSession, root: str, predicate: str, assignments: dict
) -> int:
    """COPY-ON-WRITE UPDATE (Delta's UPDATE ... SET): rows matching
    ``predicate`` get each ``assignments`` column replaced by its SQL
    expression (evaluated per row, old values visible on the right-hand
    side); every other row — in affected files AND in untouched files —
    survives byte-identical. Same file-granular COW, no-op, history,
    ledger, and schema-carry contracts as ``delete_where``; assignments
    may only SET existing columns (new columns are schema evolution,
    i.e. commit_append's job, not a side effect of an update)."""
    from pyspark.sql import functions as F

    schema = table_schema(root)
    if schema is not None:
        known = {f.name for f in schema.fields}
        unknown = sorted(set(assignments) - known)
        if unknown:
            raise ValueError(
                f"update_where may only SET existing columns; unknown: "
                f"{unknown} (add columns via commit_append schema "
                f"evolution instead)"
            )
    gen = table_generated(root)
    gen_assigned = sorted(set(assignments) & set(gen))
    if gen_assigned:
        # Delta's generated-column invariant: SET on a base column
        # triggers recomputation; SET directly on the generated column
        # is refused (a consistent value is redundant, an inconsistent
        # one would silently desynchronize the expression)
        raise ValueError(
            f"update_where may not SET generated columns "
            f"{gen_assigned}; they are recomputed from their "
            "expressions when their inputs change"
        )

    def apply_set(affected):
        # ONE select, every right-hand side bound to the ORIGINAL row —
        # SQL UPDATE semantics. A withColumn chain would instead let a
        # later assignment read an earlier assignment's NEW value,
        # silently breaking e.g. the swap UPDATE ... SET a = b, b = a.
        cols = []
        for name in affected.columns:
            if name in assignments:
                cols.append(
                    F.when(
                        F.expr(predicate), F.expr(assignments[name])
                    )
                    .otherwise(F.col(name))
                    .alias(name)
                )
            else:
                cols.append(F.col(name))
        out = affected.select(*cols)
        # recompute generated columns AFTER the assignments land, so
        # an update to a base column keeps its derived columns true to
        # their expressions (idempotent on untouched rows — values
        # were already consistent)
        for name, expr in gen.items():
            if name in out.columns:
                out = out.withColumn(name, F.expr(expr))
        return out

    return _cow_rewrite(spark, root, predicate, apply_set, "updated_from")


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key: str,
    batch_id: int | None = None,
    expected_version: int | None = None,
    *,
    when_matched_update: str | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: str | None = None,
) -> int:
    """MERGE INTO (Delta's upsert verb, WHEN MATCHED UPDATE SET * /
    WHEN NOT MATCHED INSERT * — plus the CONDITIONAL clauses, round-13
    surface): every stored row whose ``key`` appears in ``source`` is
    replaced by that source row's values (one update per matched
    TARGET row — stored duplicates each update, preserving
    multiplicity, Delta's semantics); source rows with unmatched keys
    insert. Duplicate keys in ``source`` are rejected loudly (two
    source rows matching one target row is nondeterministic — the same
    error Delta raises). Both halves land in ONE commit.

    Conditional clauses (all optional; defaults preserve the plain
    upsert):

    - ``when_matched_delete``: SQL predicate over the target row's
      columns (plain names) and the matched source row's values
      (``src_<col>``) — matching rows where it holds are DELETED.
      Evaluated BEFORE the update clause (Delta's clause order).
    - ``when_matched_update``: same namespace; matched rows surviving
      the delete clause take source values only where it holds,
      otherwise keep their stored values.
    - ``when_not_matched_insert``: predicate over source columns;
      unmatched source rows insert only where it holds.

    NULL predicates are false (SQL semantics). Generated columns and
    CHECK constraints are enforced on the merged content exactly as
    in the unconditional form.

    Namespace guard: the two MATCHED predicates see source values
    under ``src_<col>`` aliases, while the NOT-MATCHED insert
    predicate runs on the bare source frame and therefore uses PLAIN
    column names (there is no target row to collide with). Because
    the ``src_`` aliases are injected over the joined frame, a table
    whose own schema contains ``src_``-prefixed columns would be
    silently shadowed — so supplying any conditional clause against
    such a table raises ``ValueError`` loudly instead (round-12
    ADVICE #4). The unconditional upsert remains available for those
    tables.

    File-granular COW like delete/update: affected files are exactly
    those containing a matched key (one semi-join probe); clean files
    carry into the new manifest BY NAME; a merge whose source is empty
    commits nothing. History stays immutable — the pre-merge snapshot
    still shows the old rows.

    ``batch_id`` rides inside the manifest exactly as in
    ``commit_append`` (one atomic link — no crash window between the
    merge and its ledger record), so incremental-maintenance jobs can
    checkpoint "processed through source version V" on the STATE
    table itself.

    Scale: the probe and the rewrite join key on ``key`` — broadcast
    when the source is dim-sized (the common upsert shape), plain
    shuffle otherwise; data work is O(affected files + source), never
    a table rewrite."""
    from pyspark.sql import functions as F

    parent = latest_version(root)
    if expected_version is not None and parent != expected_version:
        raise ConcurrentWriteError(
            f"merge into {root} expected head v{expected_version}, "
            f"found v{parent}"
        )
    if parent == 0:
        raise ValueError("cannot merge into an empty table")
    manifest = read_manifest(root, parent)
    rel_files = manifest["files"]
    schema = table_schema(root, parent)
    mapping = manifest.get("column_mapping", {})
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_physical_schema(schema, mapping))
    abs_of = {os.path.realpath(os.path.join(root, f)): f for f in rel_files}
    df = reader.parquet(*abs_of).withColumn(
        "_kmce_file", F.input_file_name()
    )
    dvs = manifest.get("dvs", [])
    if dvs:
        # same merge-on-read discipline as _cow_rewrite: DV-deleted
        # rows neither match source keys nor survive into rewrites
        df = _strip_dv_rows(spark, root, df, dvs)
    if mapping:
        # the source frame and the key speak LOGICAL names
        df = df.select(
            *[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in schema.fields
            ],
            F.col("_kmce_file"),
        )
    cols = [c for c in df.columns if c != "_kmce_file"]
    gen = manifest.get("generated", {})
    required = [c for c in cols if c not in gen]
    if not (
        set(required) <= set(source.columns) <= set(cols)
    ):
        raise ValueError(
            f"merge_into source columns {sorted(source.columns)} must "
            f"equal table columns {sorted(cols)} (generated columns "
            f"{sorted(gen)} may be omitted — they are computed; "
            "schema evolution is commit_append's job)"
        )
    conditional = (
        when_matched_update is not None
        or when_matched_delete is not None
        or when_not_matched_insert is not None
    )
    shadowed = [c for c in cols if c.startswith("src_")]
    if conditional and shadowed:
        raise ValueError(
            f"merge_into conditional clauses inject src_<col> aliases "
            f"for the matched source row, which would silently shadow "
            f"the table's own columns {shadowed}; rename them or use "
            "the unconditional upsert. (The not-matched insert "
            "predicate uses PLAIN source column names — only the two "
            "matched-clause predicates carry the src_ namespace.)"
        )
    src = source.select(*[c for c in cols if c in source.columns])
    if gen:
        # generated-column invariant on the upsert path: omitted ->
        # computed; supplied -> validated row-for-row (a silent
        # inconsistent insert is the bug this closes)
        src = _apply_generated(src, gen)
    src = src.select(*cols)
    n_src, n_keys, n_null = src.agg(
        F.count(F.lit(1)),
        F.count_distinct(F.col(key)),
        F.count(F.when(F.col(key).isNull(), 1)),
    ).collect()[0]
    if n_null:
        raise ValueError(
            f"merge_into source has {n_null} NULL {key!r} rows — a NULL "
            "key matches nothing and would silently insert; filter or "
            "key them explicitly"
        )
    if n_src != n_keys:
        raise ValueError(
            f"merge_into source has duplicate keys ({n_src} rows, "
            f"{n_keys} distinct {key!r}) — a target row would match "
            "more than one source row"
        )
    keys = src.select(key).distinct()
    raw_affected = [
        r["_kmce_file"]
        for r in df.join(keys, key, "left_semi")
        .select("_kmce_file")
        .distinct()
        .collect()
    ]
    affected_abs = {_uri_to_local(u) for u in raw_affected}
    unknown = affected_abs - set(abs_of)
    if unknown:
        raise ValueError(
            f"input_file_name() returned paths outside the manifest "
            f"file set: {sorted(unknown)[:3]}"
        )
    affected_rel = sorted(abs_of[a] for a in affected_abs)
    if n_src == 0:
        return parent
    affected_rows = df.filter(
        F.col("_kmce_file").isin(raw_affected)
    ).drop("_kmce_file")
    # matched target rows take the source row's values (multiplicity
    # preserved: LEFT join keyed on key, coalesce per column); clean
    # rows of affected files pass through byte-identical
    src_m = src.select(
        F.col(key),
        *[F.col(c).alias(f"_kmce_src_{c}") for c in cols if c != key],
    ).withColumn("_kmce_matched", F.lit(True))
    joined = affected_rows.join(src_m, key, "left")
    # CONDITIONAL CLAUSES (Delta's full MERGE shape): predicates see
    # the TARGET row's columns under their own names and the matched
    # SOURCE row's values as ``src_<col>``. Clause order is Delta's:
    # WHEN MATCHED AND <delete> THEN DELETE is evaluated before the
    # update clause; a NULL predicate is false (SQL semantics).
    for c in cols:
        if c != key:
            joined = joined.withColumn(f"src_{c}", F.col(f"_kmce_src_{c}"))
    matched = F.coalesce(F.col("_kmce_matched"), F.lit(False))

    def _cond(pred: str | None):
        if pred is None:
            return None
        return F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))

    del_cond = (
        matched & _cond(when_matched_delete)
        if when_matched_delete is not None
        else F.lit(False)
    )
    upd_cond = (
        matched
        if when_matched_update is None
        else matched & _cond(when_matched_update)
    )
    survivors = joined.filter(~del_cond)
    updated = survivors.select(
        *[
            F.col(key)
            if c == key
            else F.when(upd_cond, F.col(f"_kmce_src_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in cols
        ]
    )
    inserts = src.join(affected_rows.select(key), key, "left_anti")
    if when_not_matched_insert is not None:
        inserts = inserts.filter(_cond(when_not_matched_insert))
    new_content = updated.unionByName(inserts.select(*cols))
    # updates and inserts both enter under the table's CHECK rules
    _enforce_constraints(new_content, manifest.get("constraints", {}))
    txn = uuid.uuid4().hex[:12]
    version = parent + 1
    data_dir = os.path.join(root, _DATA_DIR, f"txn-{version:05d}-{txn}")
    _to_physical(new_content, mapping).write.parquet(data_dir)
    new_files = _drop_empty_files(
        root,
        sorted(
            os.path.join(os.path.relpath(data_dir, root), n)
            for n in os.listdir(data_dir)
            if n.endswith(".parquet")
        ),
    )
    affected = set(affected_rel)
    kept = [f for f in rel_files if f not in affected]
    prev_stats = manifest.get("stats", {})
    new_manifest = {
        "version": version,
        "parent": parent,
        "files": kept + new_files,
        "added": new_files,
        "merged_from": affected_rel,
        "batches": (
            manifest.get("batches", [])
            + ([batch_id] if batch_id is not None else [])
        ),
        "stats": {
            **{f: prev_stats[f] for f in kept if f in prev_stats},
            **_collect_file_stats(root, new_files),
        },
    }
    if manifest.get("schema") is not None:
        new_manifest["schema"] = manifest["schema"]
    _carry_constraints(new_manifest, manifest)
    _carry_mapping(new_manifest, manifest)
    if dvs:
        new_manifest["dvs"] = dvs
    if "external_files" in manifest:
        ext = [f for f in manifest["external_files"] if f in set(kept)]
        if ext:
            new_manifest["external_files"] = ext
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, version) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(new_manifest, f)
    try:
        _link_slot(tmp, root, version)
    finally:
        os.remove(tmp)
    return version


def z_value(x, y, bits: int = 10):
    """Morton/Z-order interleave of two normalized non-negative ints
    (x in even bit positions, y in odd): the multi-dimensional
    clustering key behind `zorder_commit`. Pure JVM column arithmetic
    (shifts + masks unrolled per bit), no UDF."""
    from pyspark.sql import functions as F

    xb = x.cast("bigint")
    yb = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftright(xb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yb, i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_commit(
    df: DataFrame,
    root: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 10,
) -> int:
    """Commit ``df`` as ONE version laid out in ``n_files`` files
    range-clustered by the Z-value of (col_x, col_y) — the OPTIMIZE
    ZORDER BY layout: each file covers a compact rectangle-ish region
    of the 2-D space, so the per-file min/max stats recorded at commit
    are TIGHT on BOTH columns simultaneously and `prune_files` can skip
    on either predicate (a 1-D sort layout gives tight stats on the
    sort column only — every file spans the full range of the other).

    Columns are min-max normalized to ``bits`` bits from one driver-side
    agg (rank normalization is the skew-robust production variant; the
    interleave itself is identical). The Z column is dropped before the
    write — it is layout, not data."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    for c in (col_x, col_y):
        if not isinstance(df.schema[c].dataType, NumericType):
            raise TypeError(
                f"zorder_commit: column {c!r} is "
                f"{df.schema[c].dataType.simpleString()}, need a numeric "
                "type to interleave"
            )
    mx = df.agg(
        F.min(col_x).alias("nx"),
        F.max(col_x).alias("mx"),
        F.min(col_y).alias("ny"),
        F.max(col_y).alias("my"),
    ).collect()[0]
    if mx["mx"] is None or mx["my"] is None:
        raise ValueError(
            "zorder_commit: empty input (or all-NULL cluster columns) — "
            "nothing to lay out"
        )
    scale = 1 << bits
    # (x - min) * scale / (max - min + 1) lands every value in
    # [0, scale-1] regardless of sign or offset; the former max-only
    # form produced negative bins for negative values and degenerate
    # bins for large positive minimums, silently collapsing clustering
    # quality (round-8 ADVICE).
    nx = F.floor(
        (F.col(col_x) - mx["nx"]) * scale / (mx["mx"] - mx["nx"] + 1)
    )
    ny = F.floor(
        (F.col(col_y) - mx["ny"]) * scale / (mx["my"] - mx["ny"] + 1)
    )
    z = z_value(nx, ny, bits)
    clustered = (
        df.withColumn("_kmce_z", z)
        .repartitionByRange(n_files, "_kmce_z")
        .sortWithinPartitions("_kmce_z")
        .drop("_kmce_z")
    )
    return commit_append(clustered, root)


def read_changes(
    spark: SparkSession, root: str, v0: int, v1: int | None = None
) -> DataFrame:
    """Batch change feed (Delta's table_changes for append-only
    tables): the rows ADDED between version ``v0`` (exclusive) and
    ``v1`` (inclusive; latest when None), as one batch DataFrame — the
    incremental-ETL primitive for jobs that checkpoint a version number
    themselves instead of running a streaming query.

    Exactly the k23 feed's semantics, batch-shaped: compaction versions
    contribute NOTHING (no data change), copy-on-write delete/update/
    merge versions RAISE (an append-only diff cannot represent them),
    and rows read with v1's evolved schema (older files null-fill).

    Scale: resolving the range is O(versions in range) driver-side
    manifest reads; the scan reads only the added files — O(changes),
    never O(table)."""
    latest = latest_version(root)
    if v1 is None:
        v1 = latest
    if not 0 <= v0 <= v1 <= latest:
        raise ValueError(
            f"read_changes: need 0 <= v0 <= v1 <= latest, got "
            f"v0={v0} v1={v1} latest={latest}"
        )
    files: list[str] = []
    for v in range(v0 + 1, v1 + 1):
        m = read_manifest(root, v)
        if not _manifest_visible(m, root):
            # belt-and-braces mirror of read_version's check (round-11
            # ADVICE): the range bound comes from latest_version so an
            # in-flight slot should never be inside it, but if one ever
            # is (invariant erosion, coordinator races), emitting its
            # `added` files would surface uncommitted data
            raise ValueError(
                f"read_changes: version {v} of {root} belongs to an "
                "uncommitted or aborted multi-table transaction"
            )
        if "compacted_from" in m or "dv_materialized_from" in m:
            # OPTIMIZE and the DV flush rewrite the SAME live rows into
            # new files — no-data-change versions (dataChange=false);
            # emitting their `added` files would re-deliver old rows
            continue
        if (
            m.get("deleted_from")
            or m.get("updated_from")
            or m.get("merged_from")
            or m.get("dv_added")
            or "restored_from" in m
        ):
            # empty merged_from = insert-only merge: nothing rewritten,
            # the added files are genuinely new rows; a RESTORE can
            # remove rows (everything added after the restore point),
            # and a DV delete removes rows without adding files —
            # an append-only diff cannot represent any of them
            raise ValueError(
                f"read_changes: version {v} is a copy-on-write rewrite, "
                "deletion-vector delete, or restore; the append-only "
                "change diff cannot represent deletes/updates/rollbacks"
            )
        files.extend(m.get("added", []))
    schema = table_schema(root, v1) if v1 >= 1 else None
    if not files:
        if schema is None:
            raise ValueError(
                "read_changes: empty range on a table with no recorded "
                "schema — nothing to shape an empty frame with"
            )
        return spark.createDataFrame([], schema)
    mapping = column_mapping(root, v1) if v1 >= 1 else {}
    reader = spark.read
    if schema is not None:
        # files speak physical names whatever renames happened in or
        # around the range; present the range under v1's logical names
        reader = reader.schema(_physical_schema(schema, mapping))
    scan = reader.parquet(*[os.path.join(root, f) for f in files])
    return _to_logical(scan, schema, mapping)


def clone_table(src_root: str, dst_root: str, version: int | None = None) -> int:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE`` verb):
    commit a version-1 manifest at ``dst_root`` whose file list
    references the source snapshot's data files BY ABSOLUTE PATH — no
    data is copied, the clone is O(#files) driver-side metadata.
    Returns the clone's version (always 1).

    The clone is a fully independent table from its first commit on:
    appends/OPTIMIZE/COW on the clone write their own files under
    ``dst_root`` (a manifest may mix absolute source refs with local
    relative refs — every reader joins against the table root, and
    ``os.path.join(root, abs) == abs`` on POSIX); the source never
    observes them, and vice versa. Stats and schema carry from the
    source manifest (re-keyed to the absolute names), so file pruning
    works on the clone immediately.

    Caveats, same as Delta's: ``vacuum(dst)`` can never touch source
    files (it only removes files under the clone's own data dir), but
    ``vacuum``+``expire_versions`` on the SOURCE can delete files the
    clone still references — retention policy on a cloned-from table
    must account for live clones. Time travel below the clone point
    shows the source's history only from the source table.

    Scale: the 100 TB use case is dev/test forks and experiment
    isolation — a writable snapshot of a petabyte table in
    milliseconds, paying storage only for the delta the fork writes.

    Reference parity: the MapReduce substrate has no table lifecycle
    at all; CLONE is engine surface beyond it (SURVEY.md §2.3 f-family).
    """
    src_version = (
        latest_version(src_root) if version is None else version
    )
    if src_version == 0:
        raise ValueError(f"cannot clone an empty table: {src_root}")
    if latest_version(dst_root) != 0:
        raise ValueError(
            f"clone target {dst_root} is not empty — clone creates a "
            "NEW table"
        )
    src_manifest = read_manifest(src_root, src_version)
    if not _manifest_visible(src_manifest, src_root):
        raise ValueError(
            f"cannot clone {src_root} v{src_version}: the snapshot "
            "belongs to an uncommitted or aborted multi-table "
            "transaction"
        )
    if src_manifest.get("dvs"):
        # DV sidecar keys are SOURCE-relative; re-rooted under the
        # clone they would resolve against the wrong base and silently
        # resurrect deleted rows — the one failure mode this store
        # never accepts. Materialize first (Delta gates several
        # clone×DV combinations the same way).
        raise ValueError(
            f"cannot shallow-clone {src_root} v{src_version}: snapshot "
            "carries live deletion vectors — run materialize_dvs on "
            "the source first"
        )
    src_abs = os.path.abspath(src_root)
    abs_files = [
        f if os.path.isabs(f) else os.path.join(src_abs, f)
        for f in src_manifest["files"]
    ]
    stats = src_manifest.get("stats", {})
    abs_stats = {
        (f if os.path.isabs(f) else os.path.join(src_abs, f)): s
        for f, s in stats.items()
    }
    txn = uuid.uuid4().hex[:12]
    manifest = {
        "version": 1,
        "parent": 0,
        "files": abs_files,
        "added": abs_files,
        # distinct key for refs living OUTSIDE this table's root —
        # readers verify their existence loudly (round-10 ADVICE)
        "external_files": abs_files,
        "cloned_from": {"root": src_abs, "version": src_version},
        "batches": [],
        "stats": abs_stats,
    }
    if src_manifest.get("schema") is not None:
        manifest["schema"] = src_manifest["schema"]
    _carry_constraints(manifest, src_manifest)
    _carry_mapping(manifest, src_manifest)
    os.makedirs(os.path.join(dst_root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(dst_root, 1) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, dst_root, 1)
    finally:
        os.remove(tmp)
    return 1


def restore_table(root: str, version: int) -> int:
    """RESTORE (Delta's ``RESTORE TABLE ... TO VERSION AS OF V``):
    commit a NEW version whose content equals snapshot ``version`` — an
    auditable roll-back, not history surgery. Zero data copy: the new
    manifest references the target snapshot's files BY NAME, so the
    restore is O(#files) driver-side metadata at any table size.

    History stays immutable: the rolled-back versions remain readable
    (until retention), the restore records ``restored_from`` for audit,
    and the cumulative ingest ledger CARRIES FORWARD — a batch ingested
    after the restore point still resolves to its original introducing
    version (whose snapshot still shows it); the restore never
    un-ingests. The change feed raises on restore versions (a rollback
    can remove rows, which an append-only diff cannot represent).

    Vacuum safety falls out of the manifest model: the restored files
    are referenced by a surviving manifest, so ``vacuum`` keeps them;
    files added after the restore point stay referenced by their own
    surviving manifests until retention expires those."""
    latest = latest_version(root)
    if latest == 0:
        raise ValueError("cannot restore an empty table")
    if not 1 <= version <= latest:
        raise ValueError(
            f"restore_table: version {version} out of range "
            f"(1..{latest})"
        )
    target = read_manifest(root, version)  # raises if expired
    if not _manifest_visible(target, root):
        raise ValueError(
            f"cannot restore {root} to v{version}: the snapshot "
            "belongs to an uncommitted or aborted multi-table "
            "transaction"
        )
    if version == latest:
        return latest  # restoring to the head is a no-op, no commit
    head = read_manifest(root, latest)
    txn = uuid.uuid4().hex[:12]
    new_version = latest + 1
    manifest = {
        "version": new_version,
        "parent": latest,
        "files": target["files"],
        "added": [],
        "restored_from": version,
        # the ingest ledger is cumulative table HISTORY, not snapshot
        # content — it survives the rollback
        "batches": head.get("batches", []),
        "stats": target.get("stats", {}),
    }
    if target.get("schema") is not None:
        manifest["schema"] = target["schema"]
    # constraints are snapshot metadata: a restore returns to the
    # TARGET's rules (same contract as the schema record above)
    _carry_constraints(manifest, target)
    _carry_mapping(manifest, target)
    if "external_files" in target:
        manifest["external_files"] = target["external_files"]
    if target.get("dvs"):
        # restoring to a merge-on-read snapshot restores its vectors
        # too — same root, same relative sidecar refs, still live
        manifest["dvs"] = target["dvs"]
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, new_version) + f".{txn}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        _link_slot(tmp, root, new_version)
    finally:
        os.remove(tmp)
    return new_version


def version_for_batch(root: str, batch_id: int) -> int:
    """Resolve the earliest version whose cumulative ingest ledger
    contains ``batch_id`` — time travel keyed on a DETERMINISTIC ingest
    coordinate instead of wall time (Delta's TIMESTAMP AS OF resolves a
    commit timestamp the same way; wall clocks don't replay across
    engines, batch ids do). Raises KeyError if no version carries the
    batch. O(versions) driver-side manifest reads, earliest-first.

    The ledger is CUMULATIVE, so the earliest surviving manifest that
    contains the batch is the introducing version only if its PARENT
    manifest is readable and lacks the batch (or the match is v1,
    which has no parent). After retention expired the introducing
    manifest, any surviving match also contains later commits —
    returning it would silently time-travel FORWARD of the batch, so
    that case raises instead (Delta's TIMESTAMP AS OF errors on
    pre-retention timestamps the same way)."""
    latest = latest_version(root)
    for v in range(1, latest + 1):
        try:
            m = read_manifest(root, v)
        except FileNotFoundError:
            continue  # expired history below the retention window
        if batch_id in m.get("batches", []):
            if v == 1:
                return v
            try:
                parent = read_manifest(root, v - 1)
            except FileNotFoundError:
                raise KeyError(
                    f"version_for_batch: batch {batch_id} of {root} "
                    f"predates retained history — the earliest surviving "
                    f"version carrying it (v{v}) has an expired parent, "
                    f"so its snapshot includes commits after the batch"
                ) from None
            if batch_id in parent.get("batches", []):
                # unreachable via the earliest-first scan (the parent
                # would have matched), kept as a loud invariant
                raise KeyError(
                    f"version_for_batch: ledger invariant violated at "
                    f"v{v} of {root}"
                )
            return v
    raise KeyError(
        f"version_for_batch: no version of {root} carries batch "
        f"{batch_id} (latest={latest})"
    )


def table_history(spark: SparkSession, root: str) -> DataFrame:
    """DESCRIBE HISTORY (Delta's verb, minimally): one row per
    SURVIVING version — version, commit kind, file/added counts, the
    cumulative ledger size, and the audit pointer (restored_from /
    cloned_from root, when present). Driver-side manifest walk,
    O(versions) metadata reads, no data touched; expired versions are
    simply absent (retention is part of the history's truth).

    Kinds mirror the commit verbs: append, delete, update, merge,
    compact, restore, clone, constraint."""
    latest = latest_version(root)
    rows = []
    for v in range(1, latest + 1):
        try:
            m = read_manifest(root, v)
        except FileNotFoundError:
            continue
        if not _manifest_visible(m, root):
            continue  # in-flight/aborted txn manifests are not history
        if "restored_from" in m:
            kind, audit = "restore", str(m["restored_from"])
        elif "cloned_from" in m:
            kind, audit = "clone", m["cloned_from"]["root"]
        elif "compacted_from" in m:
            kind, audit = "compact", None
        elif "constraint_added" in m:
            kind, audit = "constraint", m["constraint_added"]
        elif "renamed_column" in m:
            kind, audit = "rename", "->".join(m["renamed_column"])
        elif m.get("deleted_from"):
            kind, audit = "delete", None
        elif m.get("dv_added"):
            kind, audit = "dv_delete", None
        elif "dv_materialized_from" in m:
            kind, audit = "dv_materialize", None
        elif m.get("updated_from"):
            kind, audit = "update", None
        elif "merged_from" in m:
            kind, audit = "merge", None
        else:
            kind, audit = "append", None
        rows.append(
            (
                v,
                kind,
                len(m.get("files", [])),
                len(m.get("added", [])),
                len(m.get("batches", [])),
                audit,
            )
        )
    return spark.createDataFrame(
        rows,
        "version BIGINT, kind STRING, n_files BIGINT, n_added BIGINT,"
        " n_batches BIGINT, audit STRING",
    )


def table_detail(spark: SparkSession, root: str) -> DataFrame:
    """DESCRIBE DETAIL (Delta's verb, minimally): ONE row summarizing
    the table head — version, file/byte accounting, physical and LIVE
    row counts (physical minus live deletion-vector rows), surviving
    version count, and the metadata surfaces in force (DV sidecars,
    column-mapping entries, constraints, external clone refs).

    Driver-side manifest + footer metadata only — no data scan: row
    counts come from the __rows__ stats recorded at commit (falling
    back to parquet footers for pre-stats files), DV row counts from
    sidecar footers. O(#files + #sidecars + #versions) metadata reads,
    the same cost class as DESCRIBE HISTORY (f31)."""
    import pyarrow.parquet as pq

    head = latest_version(root)
    if head == 0:
        raise ValueError(f"table_detail: {root} is empty")
    m = read_manifest(root, head)
    stats = m.get("stats", {})
    n_bytes = 0
    n_rows_physical = 0
    for f in m["files"]:
        path = os.path.join(root, f)
        try:
            n_bytes += os.path.getsize(path)
        except OSError:
            pass
        rows = stats.get(f, {}).get("__rows__")
        if rows is None:
            rows = pq.ParquetFile(path).metadata.num_rows
        n_rows_physical += int(rows)
    live_files = set(m["files"])
    # Union (file, pos) pairs across sidecars before counting — a
    # merged or hand-crafted sidecar set with overlapping vectors must
    # not double-count a position, mirroring the read path's dead-set
    # union (ADVICE r11). Stale keys (files later rewritten) are inert
    # — count only vectors pointing at live files.
    dead: set[tuple[str, int]] = set()
    for side in m.get("dvs", []):
        tbl = pq.read_table(
            os.path.join(root, side), columns=["_dv_file", "_dv_pos"]
        )
        dead.update(
            (k, p)
            for k, p in zip(
                tbl.column("_dv_file").to_pylist(),
                tbl.column("_dv_pos").to_pylist(),
            )
            if k in live_files
        )
    n_dv_rows = len(dead)
    n_versions = sum(
        1
        for v in range(1, head + 1)
        if os.path.exists(_manifest_path(root, v))
    )
    row = {
        "version": head,
        "n_files": len(m["files"]),
        "n_bytes": int(n_bytes),
        "n_rows_physical": int(n_rows_physical),
        "n_rows_live": int(n_rows_physical - n_dv_rows),
        "n_versions_live": n_versions,
        "n_dv_sidecars": len(m.get("dvs", [])),
        "n_mapped_columns": len(m.get("column_mapping", {})),
        "n_constraints": len(m.get("constraints", [])),
        "n_external_files": len(m.get("external_files", [])),
    }
    schema = (
        "version BIGINT, n_files BIGINT, n_bytes BIGINT, "
        "n_rows_physical BIGINT, n_rows_live BIGINT, "
        "n_versions_live BIGINT, n_dv_sidecars BIGINT, "
        "n_mapped_columns BIGINT, n_constraints BIGINT, "
        "n_external_files BIGINT"
    )
    return spark.createDataFrame([tuple(row.values())], schema)
