"""T23 learned-merge BPE: the engine's trainer/encoder vs an INDEPENDENT
pure-Python reference implementation.

The reference here is deliberately a different code path from
operators/text.py: it builds its histogram with DuckDB (not Spark),
represents words as space-joined SYMBOL STRINGS (not lists), and merges
with tokenized string replacement — so a bug in the engine's list-based
merge walk cannot be mirrored by construction. Both must produce the
identical merge list AND identical per-document token counts.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest
from hypothesis import given as given_hyp
from hypothesis import settings as settings_hyp
from hypothesis import strategies as st_hyp

from k_means_clustering_via_map_reduce_spark.operators.text import (
    BPE_END,
    BPE_N_MERGES,
    BPE_WORD_RE,
    bpe_encode_len,
    bpe_token_counts,
    train_bpe_merges,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table

# ------------------------------------------------------------------
# Reference implementation (string-table BPE, subword-nmt style)
# ------------------------------------------------------------------


def _ref_histogram(sf_dir: str) -> Counter:
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT w, count(*) FROM (
              SELECT unnest(regexp_extract_all(lower(text),
                            '{BPE_WORD_RE}')) AS w
              FROM read_parquet('{sf_dir}/documents.parquet')
            ) GROUP BY w
            """
        ).fetchall()
    finally:
        con.close()
    return Counter(dict(rows))


def _ref_train(hist: Counter, n_merges: int) -> list[tuple[str, str]]:
    # word -> space-joined symbol string
    vocab = {
        " ".join(list(w) + [BPE_END]): f for w, f in sorted(hist.items())
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for symstr, freq in vocab.items():
            syms = symstr.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = {
            _ref_apply(symstr, best): f for symstr, f in vocab.items()
        }
    return merges


def _ref_apply(symstr: str, pair: tuple[str, str]) -> str:
    """Left-to-right non-overlapping merge on a space-joined string."""
    syms = symstr.split(" ")
    out = []
    i = 0
    while i < len(syms):
        if (
            i + 1 < len(syms)
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return " ".join(out)


def _ref_encode_len(word: str, merges: list[tuple[str, str]]) -> int:
    symstr = " ".join(list(word) + [BPE_END])
    for pair in merges:
        symstr = _ref_apply(symstr, pair)
    return len(symstr.split(" "))


# ------------------------------------------------------------------
# Parity tests
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def merges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return train_bpe_merges(spark, docs)


def test_trained_merges_match_reference(spark, sf_dir, merges):
    ref = _ref_train(_ref_histogram(sf_dir), BPE_N_MERGES)
    assert merges == ref


def test_encode_lengths_match_reference_per_document(spark, sf_dir, merges):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    word_re = re.compile(BPE_WORD_RE)
    memo: dict[str, int] = {}
    for row in docs.collect():
        words = word_re.findall((row["text"] or "").lower())
        want = 0
        for w in words:
            if w not in memo:
                memo[w] = _ref_encode_len(w, merges)
            want += memo[w]
        assert got[row["doc_id"]] == (want, len(words)), row["doc_id"]


def test_training_is_partitioning_independent(spark, sf_dir, merges):
    """The histogram shuffle must make training independent of input
    partitioning — the property that lets the same merges come off a
    1000-executor histogram."""
    docs = load_table(spark, sf_dir, "documents").repartition(7, "lang")
    assert train_bpe_merges(spark, docs) == merges


def test_merges_compress_the_corpus(merges):
    """Learned merges must actually help: frequent words encode to
    fewer tokens than their character length."""
    assert 1 <= bpe_encode_len("scan", merges) < len("scan") + 1
    assert 1 <= bpe_encode_len("row", merges) < len("row") + 1


def test_encode_overlap_is_left_to_right():
    """'aaa' under a single (a,a) merge: left-to-right non-overlap
    gives (aa)(a)(</w>) = 3 symbols, never 2."""
    assert bpe_encode_len("aaa", [("a", "a")]) == 3
    assert _ref_encode_len("aaa", [("a", "a")]) == 3


def test_encode_empty_and_oov():
    assert bpe_encode_len("", []) == 1  # bare end marker
    # word with no applicable merge: chars + end marker
    assert bpe_encode_len("xyz", [("a", "b")]) == 4


def test_vocab_cap_is_deterministic(spark, sf_dir):
    """Capping the histogram keeps (count desc, word) order: with a cap
    of 5 the trainer sees exactly the 5 heaviest words and still
    produces a deterministic merge list."""
    docs = load_table(spark, sf_dir, "documents")
    a = train_bpe_merges(spark, docs, n_merges=6, vocab_cap=5)
    b = train_bpe_merges(spark, docs, n_merges=6, vocab_cap=5)
    assert a == b and len(a) == 6


# ------------------------------------------------------------------
# Property tests (Spark-free: the pure training/encode cores vs the
# string-table reference over arbitrary corpora — fixture parity above
# can only exercise the 31-word synthetic vocabulary)
# ------------------------------------------------------------------

from collections import Counter as _Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from k_means_clustering_via_map_reduce_spark.operators.text import (
    train_merges_from_histogram,
)

_words = st.text(alphabet="ab0", min_size=1, max_size=6)
_hist = st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=12)


@settings(max_examples=300, deadline=None)
@given(hist=_hist, n_merges=st.integers(0, 12))
def test_training_matches_reference_on_arbitrary_histograms(hist, n_merges):
    """Tiny 3-char alphabet + small words maximize pair-count TIES and
    repeated-symbol overlaps ('aaa') — exactly the cases where a
    tie-break or merge-walk divergence between implementations hides."""
    got = train_merges_from_histogram(sorted(hist.items()), n_merges)
    want = _ref_train(_Counter(hist), n_merges)
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    word=st.text(alphabet="ab0", min_size=0, max_size=8),
    hist=_hist,
    n_merges=st.integers(1, 10),
)
def test_encode_matches_reference_under_trained_merges(word, hist, n_merges):
    """Encode ANY word (trained-on or OOV) under merges trained on an
    unrelated histogram: both walks must agree, and the count must be
    bounded by the unmerged symbol count."""
    merges = train_merges_from_histogram(sorted(hist.items()), n_merges)
    got = bpe_encode_len(word, merges)
    assert got == _ref_encode_len(word, merges)
    assert 1 <= got <= len(word) + 1


# ------------------------------------------------------------------
# T25: encode under the externally-supplied artifact
# ------------------------------------------------------------------


def test_t25_artifact_provenance():
    """T25_MERGES is the t23 trainer's output on the sf0.001 fixture,
    frozen as a shipped artifact — re-derive it from the fixture with
    the INDEPENDENT reference trainer to pin the provenance."""
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T25_MERGES,
    )

    ref = _ref_train(_ref_histogram("/root/testdata/sf0.001"), BPE_N_MERGES)
    assert T25_MERGES == ref


def test_t25_encode_matches_reference_per_document(spark, sf_dir):
    """Per-doc token counts under the SUPPLIED merges must match the
    independent string-table reference — the artifact-serving half of
    the round trip (t23 pins the training half)."""
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T25_MERGES,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, T25_MERGES).collect()
    }
    word_re = re.compile(BPE_WORD_RE)
    memo: dict[str, int] = {}
    for row in docs.collect():
        want = 0
        for w in word_re.findall((row["text"] or "").lower()):
            if w not in memo:
                memo[w] = _ref_encode_len(w, T25_MERGES)
            want += memo[w]
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_t25_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T25_ORACLE,
        t25_bpe_encode_supplied,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        t25_bpe_encode_supplied(spark, sf_dir), T25_ORACLE, sf_dir
    )


def test_t25_oracle_recursive_cte_encodes_like_the_engine(spark, sf_dir):
    """The oracle's wrapped-string rewrite must equal _bpe_merge_word's
    pass semantics WORD BY WORD, not just in aggregate — drive the
    recursive CTE alone against bpe_encode_len over the corpus vocab."""
    import duckdb

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        BPE_END as END,
    )
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T25_MERGES,
        bpe_encode_len,
    )

    rows = ", ".join(
        f"({i + 1}, '{left}', '{right}')"
        for i, (left, right) in enumerate(T25_MERGES)
    )
    con = duckdb.connect()
    try:
        got = dict(
            con.execute(f"""
            WITH RECURSIVE merges(mrank, ml, mr) AS
              (SELECT * FROM (VALUES {rows})),
            dw AS (
              SELECT DISTINCT
                unnest(regexp_extract_all(lower(text), '{BPE_WORD_RE}'))
                  AS word
              FROM read_parquet('{sf_dir}/documents.parquet')),
            enc AS (
              SELECT word, 0 AS r,
                     regexp_replace(word, '(.)', '|\\1|', 'g')
                       || '|{END}|' AS s
              FROM dw
              UNION ALL
              SELECT e.word, e.r + 1,
                     replace(e.s, '|' || m.ml || '||' || m.mr || '|',
                             '|' || m.ml || m.mr || '|')
              FROM enc e JOIN merges m ON m.mrank = e.r + 1)
            SELECT word, (len(s) - len(replace(s, '|', ''))) // 2
            FROM enc WHERE r = {len(T25_MERGES)}
            """).fetchall()
        )
    finally:
        con.close()
    assert got, "vocab empty"
    for w, n in got.items():
        assert n == bpe_encode_len(w, T25_MERGES), w


@pytest.mark.parametrize("n_merges", [4, 24])
@settings_hyp(max_examples=20, deadline=None)
@given_hyp(
    hist=st_hyp.lists(
        st_hyp.tuples(
            st_hyp.text(alphabet="abcd01", min_size=1, max_size=8),
            st_hyp.integers(1, 50),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_recursive_cte_encode_matches_engine_on_arbitrary_merges(
    hist, n_merges
):
    """The T25 oracle's wrapped-string rewrite, driven with MERGES
    TRAINED ON ARBITRARY HISTOGRAMS (not just the shipped artifact):
    for every word in the histogram, the DuckDB recursive CTE must
    encode to the same token count as the engine's merge pass — the
    guard for the replace()-semantics equivalence argument."""
    import duckdb

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        bpe_encode_len,
        train_merges_from_histogram,
    )

    merges = train_merges_from_histogram(hist, n_merges)
    if not merges:
        return
    rows = ", ".join(
        f"({i + 1}, '{left}', '{right}')"
        for i, (left, right) in enumerate(merges)
    )
    words = ", ".join(f"('{w}')" for w, _ in hist)
    con = duckdb.connect()
    try:
        got = dict(
            con.execute(f"""
            WITH RECURSIVE merges(mrank, ml, mr) AS
              (SELECT * FROM (VALUES {rows})),
            dw(word) AS (SELECT * FROM (VALUES {words})),
            enc AS (
              SELECT word, 0 AS r,
                     regexp_replace(word, '(.)', '|\\1|', 'g')
                       || '|{BPE_END}|' AS s
              FROM dw
              UNION ALL
              SELECT e.word, e.r + 1,
                     replace(e.s, '|' || m.ml || '||' || m.mr || '|',
                             '|' || m.ml || m.mr || '|')
              FROM enc e JOIN merges m ON m.mrank = e.r + 1)
            SELECT word, (len(s) - len(replace(s, '|', ''))) // 2
            FROM enc WHERE r = {len(merges)}
            """).fetchall()
        )
    finally:
        con.close()
    for w, _ in hist:
        assert got[w] == bpe_encode_len(w, merges), (w, merges)
