"""Incremental aggregate maintenance (round-9 pre-build): exactness
against the batch recount under any append/refresh interleaving, no-op
discipline, ledger checkpointing, and O(diff) refresh cost."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.incremental import (
    _token_counts,
    refresh_token_counts,
    token_counts_state,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    applied_batches,
    commit_append,
    latest_version,
    read_changes,
)


def _corpus_batch(spark, b: int):
    texts = [
        (b * 10 + i, " ".join(f"w{(b + i + j) % 7}" for j in range(5)))
        for i in range(4)
    ]
    return spark.createDataFrame(texts, "doc_id BIGINT, text STRING")


def _state_rows(spark, state_root):
    return sorted(
        (r["token"], r["freq"])
        for r in token_counts_state(spark, state_root).collect()
    )


def _batch_recount(spark, corpus_root):
    full = read_changes(spark, corpus_root, 0)
    return sorted(
        (r["token"], r["freq"]) for r in _token_counts(full).collect()
    )


def test_refresh_matches_batch_recount_and_checkpoints(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(_corpus_batch(spark, 0), corpus)
    commit_append(_corpus_batch(spark, 1), corpus)
    v = refresh_token_counts(spark, corpus, state)
    assert v == 2 and applied_batches(state) == {2}
    assert _state_rows(spark, state) == _batch_recount(spark, corpus)
    # more corpus, second refresh folds ONLY the new versions
    commit_append(_corpus_batch(spark, 2), corpus)
    v = refresh_token_counts(spark, corpus, state)
    assert v == 3 and applied_batches(state) == {2, 3}
    assert _state_rows(spark, state) == _batch_recount(spark, corpus)


def test_refresh_with_nothing_new_is_noop(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(_corpus_batch(spark, 0), corpus)
    refresh_token_counts(spark, corpus, state)
    sv = latest_version(state)
    assert refresh_token_counts(spark, corpus, state) == 1
    assert latest_version(state) == sv  # no version burned


def test_refresh_reads_only_the_diff(spark, tmp_path):
    """The O(diff) claim, asserted: the refresh's change read holds
    exactly the new batches' rows, never the whole corpus."""
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    for b in range(4):
        commit_append(_corpus_batch(spark, b), corpus)
    refresh_token_counts(spark, corpus, state)
    commit_append(_corpus_batch(spark, 9), corpus)
    done = max(applied_batches(state))
    diff = read_changes(spark, corpus, done)
    assert diff.count() == 4  # one new batch, 4 docs — not 20


@settings(max_examples=6, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 5)),
            st.just("refresh"),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_state_exact_under_any_interleaving(spark_prop, ops, tmp_path_factory):
    spark = spark_prop
    base = tmp_path_factory.mktemp("inc")
    corpus, state = str(base / "corpus"), str(base / "state")
    commit_append(_corpus_batch(spark, 99), corpus)
    for op in ops:
        if op == "refresh":
            refresh_token_counts(spark, corpus, state)
        else:
            commit_append(_corpus_batch(spark, op[1]), corpus)
    refresh_token_counts(spark, corpus, state)  # terminal catch-up
    assert _state_rows(spark, state) == _batch_recount(spark, corpus)


def test_state_counts_are_plain_spark_aggregable(spark, tmp_path):
    """The state is a first-class versioned table: time travel shows
    the aggregate as of each refresh."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_version,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(_corpus_batch(spark, 0), corpus)
    refresh_token_counts(spark, corpus, state)
    first = sorted(
        map(tuple, read_version(spark, state, 1).collect())
    )
    commit_append(_corpus_batch(spark, 1), corpus)
    refresh_token_counts(spark, corpus, state)
    # the v1 snapshot still shows the first refresh's counts
    assert sorted(map(tuple, read_version(spark, state, 1).collect())) == first
    total = (
        token_counts_state(spark, state)
        .agg(F.sum("freq").alias("s"))
        .collect()[0]["s"]
    )
    assert total == 8 * 5  # 8 docs x 5 tokens


def test_k24_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        K24_ORACLE,
        k24_incremental_token_counts,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        k24_incremental_token_counts(spark, sf_dir), K24_ORACLE, sf_dir
    )


def test_vocab_first_seen_is_write_once(spark, tmp_path):
    """k25 core semantics: a token re-encountered in a later diff keeps
    its original first_seen while freq accumulates; new tokens stamp
    the current corpus version."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_vocab,
        vocab_state,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha gamma")],
            "doc_id BIGINT, text STRING",
        ),
        corpus,
    )
    refresh_vocab(spark, corpus, state)
    commit_append(
        spark.createDataFrame(
            [(3, "alpha delta")], "doc_id BIGINT, text STRING"
        ),
        corpus,
    )
    refresh_vocab(spark, corpus, state)
    rows = {
        r["token"]: (r["first_seen"], r["freq"])
        for r in vocab_state(spark, state).collect()
    }
    assert rows == {
        "alpha": (1, 3),  # first_seen stays 1, freq 2 + 1
        "beta": (1, 1),
        "gamma": (1, 1),
        "delta": (2, 1),
    }


def test_vocab_refresh_with_nothing_new_is_noop(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_vocab,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        latest_version,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(_corpus_batch(spark, 0), corpus)
    refresh_vocab(spark, corpus, state)
    v = latest_version(state)
    refresh_vocab(spark, corpus, state)
    assert latest_version(state) == v


def test_k25_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        K25_ORACLE,
        k25_incremental_vocab,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        k25_incremental_vocab(spark, sf_dir), K25_ORACLE, sf_dir
    )


def test_windowed_refresh_retracts_expired_versions(spark, tmp_path):
    """k26 core: after the window slides, only in-window versions'
    tokens remain; the retraction is exact."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts_window,
        windowed_token_counts,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    batches = ["aa bb", "bb cc", "cc dd"]
    for i, text in enumerate(batches):
        commit_append(
            spark.createDataFrame(
                [(i, text)], "doc_id BIGINT, text STRING"
            ),
            corpus,
        )
        refresh_token_counts_window(spark, corpus, state, window=2)
    rows = {
        r["token"]: r["freq"]
        for r in windowed_token_counts(spark, state).collect()
    }
    # window = versions 2..3 => "bb cc" + "cc dd"
    assert rows == {"bb": 1, "cc": 2, "dd": 1}


def test_windowed_refresh_noop_and_ledger(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts_window,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        applied_batches,
        latest_version,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(
        spark.createDataFrame([(0, "x y")], "doc_id BIGINT, text STRING"),
        corpus,
    )
    refresh_token_counts_window(spark, corpus, state, window=2)
    assert applied_batches(state) == {1}
    v = latest_version(state)
    # nothing new: no version burned, ledger unchanged
    refresh_token_counts_window(spark, corpus, state, window=2)
    assert latest_version(state) == v
    assert applied_batches(state) == {1}


def test_windowed_refresh_compaction_only_diff_is_noop(spark, tmp_path):
    """A corpus diff that is ROW-EMPTY (only a compaction version since
    the checkpoint) must burn no state version — the round-10 ADVICE
    re-entry of the empty-file leak through the append path — while a
    window slide driven by data-less versions still RETRACTS expired
    sub-aggregates (retraction-only commit carrying the checkpoint)."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts_window,
        windowed_token_counts,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        compact,
        read_manifest,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    commit_append(
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha")], "doc_id BIGINT, text STRING"
        ).coalesce(2),
        corpus,
    )
    refresh_token_counts_window(spark, corpus, state, window=3)
    v = latest_version(state)
    # compaction advances the corpus version with a row-empty diff;
    # window=3 means nothing expires yet (sub-agg version 1 > 2-3)
    compact(spark, corpus, target_files=1)
    assert refresh_token_counts_window(spark, corpus, state, window=3) == 1
    assert latest_version(state) == v  # pure no-op: no version burned
    for f in read_manifest(state, v)["files"]:
        assert "txn-" in f  # sanity: files all came from real commits
    # a data commit, then a refresh: normal path (low = 3-3 = 0)
    commit_append(
        spark.createDataFrame(
            [(2, "gamma")], "doc_id BIGINT, text STRING"
        ).coalesce(1),
        corpus,
    )
    assert refresh_token_counts_window(spark, corpus, state, window=3) == 3
    # another compaction slides version-1 sub-aggregates out of the
    # window (low = 4-3 = 1): retraction-ONLY refresh on a row-empty
    # diff — checkpoint rides the delete, and NO empty append happened
    compact(spark, corpus, target_files=1)
    v_before = latest_version(state)
    assert refresh_token_counts_window(spark, corpus, state, window=3) == 4
    assert latest_version(state) == v_before + 1  # exactly one commit
    assert applied_batches(state) >= {4}
    counts = {
        r["token"]: r["freq"]
        for r in windowed_token_counts(spark, state).collect()
    }
    assert counts == {"gamma": 1}  # v1's alpha/beta retracted


def test_k26_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        K26_ORACLE,
        k26_windowed_token_counts,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        k26_windowed_token_counts(spark, sf_dir), K26_ORACLE, sf_dir
    )


def test_windowed_refresh_state_files_stay_bounded(spark, tmp_path):
    """The retraction must not leak empty files: after many refreshes
    the state manifest holds only the in-window versions' files (the
    round-9 probe caught one 0-row file accumulating per retraction
    before _drop_empty_files)."""
    from k_means_clustering_via_map_reduce_spark.operators.incremental import (
        refresh_token_counts_window,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        latest_version,
        read_manifest,
    )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    for i in range(8):
        commit_append(
            spark.createDataFrame(
                [(i, f"w{i} common")], "doc_id BIGINT, text STRING"
            ).coalesce(1),
            corpus,
        )
        refresh_token_counts_window(spark, corpus, state, window=2)
    n_files = len(read_manifest(state, latest_version(state))["files"])
    assert n_files <= 4, n_files  # in-window appends only, no leak
