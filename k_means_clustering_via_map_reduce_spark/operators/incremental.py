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
