"""Incremental aggregate maintenance over the versioned lakehouse —
the composition the round-8 verbs exist for.

The pattern (Delta/Databricks' incremental-ETL idiom): a MATERIALIZED
AGGREGATE (here: exact corpus token counts) lives in its own versioned
table; a refresh job reads ONLY the corpus versions committed since its
last run (``read_changes``), folds the delta into the state with ONE
MERGE (``merge_into``), and checkpoints "processed through corpus
version V" in the state table's own manifest ledger (``batch_id`` —
atomic with the merge, so a crash between processing and recording is
impossible by construction, the k21 ingest discipline reused).

Invariants (tests/test_incremental.py):
- after any append/refresh interleaving, state == the batch recount of
  the whole corpus (exactness);
- a refresh with nothing new is a NO-OP (no version burned);
- each refresh's data cost is O(diff + touched state files), never a
  corpus re-scan — the diff row counts are asserted, not assumed.

Scale: this is the 100 TB shape for every standing corpus statistic
(vocabulary, dedup signatures, quality histograms): the corpus is
append-only and huge, the state is vocabulary-sized, and each refresh
shuffles only the new data plus the touched slice of the state.

Reference: the MapReduce substrate recomputes its whole input every run
(master.py:215-258 re-reads the full CSV); incremental maintenance is
engine surface beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    applied_batches,
    commit_append,
    latest_version,
    merge_into,
    read_changes,
    read_version,
)


def _token_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def refresh_token_counts(
    spark: SparkSession, corpus_root: str, state_root: str
) -> int:
    """One incremental refresh: fold the un-processed corpus versions'
    token counts into the state table. Returns the corpus version the
    state now reflects (unchanged => no-op, no version burned)."""
    done = max(applied_batches(state_root), default=0)
    now = latest_version(corpus_root)
    if now <= done:
        return done
    delta = _token_counts(
        read_changes(spark, corpus_root, done, now).select("text")
    )
    if not delta.head(1):
        # row-empty diff (compaction-only versions since the
        # checkpoint): committing would burn a state version on
        # nothing — the no-op discipline the lifecycle tests pin
        return done
    if latest_version(state_root) == 0:
        commit_append(delta, state_root, batch_id=now)
        return now
    state = read_version(spark, state_root).select(
        "token", F.col("freq").alias("old_freq")
    )
    merged = (
        delta.join(state, "token", "left")
        .select(
            "token",
            (
                F.col("freq") + F.coalesce(F.col("old_freq"), F.lit(0))
            ).alias("freq"),
        )
    )
    merge_into(spark, state_root, merged, "token", batch_id=now)
    return now


def token_counts_state(spark: SparkSession, state_root: str) -> DataFrame:
    """The maintained aggregate, read back as a plain snapshot."""
    return read_version(spark, state_root)


def refresh_vocab(
    spark: SparkSession, corpus_root: str, state_root: str
) -> int:
    """One incremental VOCABULARY refresh: fold the un-processed corpus
    versions into a (token, first_seen, freq) state — ``first_seen`` is
    the corpus version of the refresh that introduced the token and is
    IMMUTABLE once set (the SCD-style "record creation version" field),
    while ``freq`` accumulates additively. Returns the corpus version
    the state now reflects.

    The merge therefore has per-column semantics k24's plain additive
    merge does not exercise: existing rows keep their first_seen and
    add freqs; brand-new tokens enter with first_seen = this refresh's
    corpus version. A merge that overwrites first_seen (the naive
    UPDATE SET *) silently corrupts every "vocabulary growth over time"
    query downstream — the exact bug the k25 oracle flips on.

    Scale: identical envelope to refresh_token_counts — O(diff) reads,
    vocabulary-sized state, one MERGE; the state table answers both
    "current vocab" and "vocab as of version V" (first_seen <= V)
    without replaying history."""
    done = max(applied_batches(state_root), default=0)
    now = latest_version(corpus_root)
    if now <= done:
        return done
    delta = _token_counts(
        read_changes(spark, corpus_root, done, now).select("text")
    ).withColumn("first_seen", F.lit(now).cast("bigint"))
    if not delta.head(1):
        return done  # row-empty diff: no-op, no version burned
    if latest_version(state_root) == 0:
        commit_append(
            delta.select("token", "first_seen", "freq"),
            state_root,
            batch_id=now,
        )
        return now
    state = read_version(spark, state_root).select(
        "token",
        F.col("first_seen").alias("old_first_seen"),
        F.col("freq").alias("old_freq"),
    )
    merged = delta.join(state, "token", "left").select(
        "token",
        # first_seen is write-once: the stored value wins
        F.coalesce(F.col("old_first_seen"), F.col("first_seen")).alias(
            "first_seen"
        ),
        (F.col("freq") + F.coalesce(F.col("old_freq"), F.lit(0))).alias(
            "freq"
        ),
    )
    merge_into(spark, state_root, merged, "token", batch_id=now)
    return now


def vocab_state(spark: SparkSession, state_root: str) -> DataFrame:
    """The maintained vocabulary, read back as a plain snapshot."""
    return read_version(spark, state_root)


def refresh_token_counts_window(
    spark: SparkSession,
    corpus_root: str,
    state_root: str,
    window: int = 2,
) -> int:
    """One SLIDING-WINDOW refresh: maintain exact token counts over the
    LAST ``window`` corpus versions — the k24 additive fold plus the
    semantics it cannot express: RETRACTION. The state table keeps one
    (token, version, freq) sub-aggregate row per contributing corpus
    version; a refresh appends the new diff's sub-aggregate and
    COW-deletes the sub-aggregates that slid out of the window, then
    the serving view sums the survivors. Returns the corpus version the
    state now reflects.

    Retraction-by-deletion beats retraction-by-subtraction: subtracting
    needs the expired version's counts re-derivable (a second read of
    old corpus files — O(history)), while deleting its sub-aggregate
    rows is file-granular COW against version-clustered state files —
    O(expired state), and an interrupted refresh can always re-run (the
    ledger checkpoint rides the LAST commit of the refresh).

    Scale: per refresh O(diff) corpus reads + one append + one
    stats-pruned COW delete over the vocabulary-sized state; the
    serving sum is a window-bounded aggregate of <= window
    sub-aggregates per token.

    Granularity note: a refresh that folds SEVERAL corpus versions
    labels the whole delta with the newest one, so the window is exact
    over corpus versions only when refreshes run per commit (the k24
    cadence); a lagging refresher coarsens expiry to refresh batches —
    conservative (late retraction), never early."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        delete_where,
    )

    done = max(applied_batches(state_root), default=0)
    now = latest_version(corpus_root)
    if now <= done:
        return done
    delta = _token_counts(
        read_changes(spark, corpus_root, done, now).select("text")
    ).select(
        "token",
        F.lit(now).cast("bigint").alias("version"),
        "freq",
    )
    low = now - window  # versions <= low slide out
    empty_delta = not bool(delta.head(1))
    if latest_version(state_root) == 0:
        if empty_delta:
            return done  # nothing to add, nothing to retract
        commit_append(delta, state_root, batch_id=now)
        return now
    # Up to two commits per refresh (append, then retraction); the
    # batch_id rides the FINAL commit so a crash between them replays
    # the whole refresh — the re-append would duplicate, so an
    # idempotency guard first drops any partial rows for `now` (a
    # no-op delete burns no version). When nothing expires, the
    # retraction would be a no-op COW (which records no ledger entry),
    # so the batch_id rides the append instead. A row-empty diff
    # (compaction-only versions since the checkpoint) must not burn an
    # append version — but it can still slide sub-aggregates out of
    # the window, so the retraction (which carries the checkpoint)
    # runs whenever anything expired.
    delete_where(spark, state_root, f"version = {now}")
    has_expired = bool(
        read_version(spark, state_root)
        .filter(F.col("version") <= low)
        .head(1)
    )
    if empty_delta:
        if has_expired:
            delete_where(
                spark, state_root, f"version <= {low}", batch_id=now
            )
            return now
        return done  # pure no-op: no data, no expiry, no version
    if has_expired:
        commit_append(delta, state_root)
        delete_where(
            spark, state_root, f"version <= {low}", batch_id=now
        )
    else:
        commit_append(delta, state_root, batch_id=now)
    return now


def windowed_token_counts(
    spark: SparkSession, state_root: str
) -> DataFrame:
    """The serving view: token counts summed over the in-window
    sub-aggregates."""
    return (
        read_version(spark, state_root)
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )
