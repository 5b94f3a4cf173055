"""Hypothesis property tests: engine operators vs exact pure-Python
oracles on adversarial random inputs. The kmeans property test found a
real sub-ulp tie-break divergence this way (see
functions/vector.py::nearest_centroid); these extend the same discipline
to the join/graph operators whose edge cases fixtures can't reach —
duplicate keys, empty sides, boundary-exact timestamps, self-loops,
disconnected nodes.

Each test keeps max_examples small: every example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.dedup import (
    connected_components,
)
from k_means_clustering_via_map_reduce_spark.operators.rangejoin import (
    range_join,
)
from k_means_clustering_via_map_reduce_spark.operators.skew import salted_join

# Small domains force collisions: duplicate keys, ties, self-loops.
_KEYS = st.integers(0, 5)
_VALS = st.integers(-100, 100)


@settings(max_examples=10, deadline=None)
@given(
    probe=st.lists(st.tuples(_KEYS, _VALS), min_size=0, max_size=25),
    build=st.lists(st.tuples(_KEYS, _VALS), min_size=0, max_size=10),
    how=st.sampled_from(["inner", "left"]),
    salt=st.integers(1, 5),
)
def test_salted_join_equals_plain_join(spark_prop, probe, build, how, salt):
    """Salting must never change the multiset of joined rows — under
    duplicate keys, duplicate full rows, empty sides, and every salt
    width, for both inner and left joins."""
    p = spark_prop.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(probe)],
        "k BIGINT, pv BIGINT, pid BIGINT",
    )
    b = spark_prop.createDataFrame(
        [(k, v) for k, v in build] or [(None, None)],
        "k BIGINT, bv BIGINT",
    )
    if not build:
        b = b.filter(F.lit(False))
    got = sorted(
        map(
            tuple,
            salted_join(
                p, b, on=["k"], how=how, salt=salt, probe_id_col="pid"
            )
            .select("k", "pv", "pid", "bv")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            p.join(b, "k", how).select("k", "pv", "pid", "bv").collect(),
        )
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    lts=st.lists(st.integers(0, 200), min_size=0, max_size=20),
    rts=st.lists(st.integers(0, 200), min_size=0, max_size=20),
    lo=st.integers(-30, 0),
    span=st.integers(1, 60),
    bin_us=st.one_of(st.none(), st.integers(1, 90)),
)
def test_range_join_equals_bruteforce(spark_prop, lts, rts, lo, span, bin_us):
    """The bin-bucketed range join must equal the O(n·m) definition —
    including timestamps EXACTLY on window bounds and bin widths both
    smaller and larger than the window span."""
    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    l = spark_prop.createDataFrame(
        [(i, ts(s)) for i, s in enumerate(lts)] or [(None, None)],
        "lid BIGINT, lt TIMESTAMP_NTZ",
    )
    r = spark_prop.createDataFrame(
        [(i, ts(s)) for i, s in enumerate(rts)] or [(None, None)],
        "rid BIGINT, rt TIMESTAMP_NTZ",
    )
    if not lts:
        l = l.filter(F.lit(False))
    if not rts:
        r = r.filter(F.lit(False))
    lower_us, upper_us = lo * 1_000_000, (lo + span) * 1_000_000
    got = sorted(
        (r_["lid"], r_["rid"])
        for r_ in range_join(
            l, r, "lt", "rt", lower_us, upper_us,
            bin_us=bin_us and bin_us * 1_000_000,
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, ls in enumerate(lts)
        for ri, rs in enumerate(rts)
        if lo <= rs - ls <= lo + span
    )
    assert got == want


def _uf_components(edges, nodes):
    """Union-find oracle: node -> smallest id in its component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ),
    algorithm=st.sampled_from(["label", "star"]),
)
def test_connected_components_equals_union_find(spark_prop, edges, algorithm):
    """Both CC variants must produce exactly the union-find labeling on
    random multigraphs with self-loops, parallel edges, and isolated
    self-loop-only nodes (the node-set shape that previously diverged
    between the variants)."""
    df = spark_prop.createDataFrame(edges, "a_id BIGINT, b_id BIGINT")
    got = {
        r["id"]: r["label"]
        for r in connected_components(df, algorithm=algorithm).collect()
    }
    nodes = {n for e in edges for n in e}
    want = _uf_components(edges, nodes)
    assert got == want


def _brute_jaccard(docs, threshold):
    """Pure-Python oracle over (doc_id, lang, words) docs: distinct
    3-gram shingle sets (whole text when < 3 words), lang-blocked
    pairwise jaccard ≥ threshold."""

    def sh(words):
        if len(words) >= 3:
            return {
                " ".join(words[i : i + 3]) for i in range(len(words) - 2)
            }
        return {" ".join(words)}

    shs = {d: sh(w) for d, _, w in docs}
    langs = {d: lang for d, lang, _ in docs}
    out = {}
    ids = sorted(shs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if langs[a] != langs[b]:
                continue
            inter = len(shs[a] & shs[b])
            union = len(shs[a] | shs[b])
            j = inter / union
            if j >= threshold:
                out[(a, b)] = round(j, 4)
    return out


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=1,
                max_size=8,
            ),
        ),
        min_size=2,
        max_size=12,
    ),
    cap=st.integers(1, 20),
)
def test_jaccard_capped_vs_bruteforce(spark_prop, docs, cap):
    """The inverted-index jaccard join (with its lossless size-ratio
    prune) must equal brute-force pairwise jaccard when the posting cap
    does not bind, and produce a SUBSET with underestimated J when it
    does — on tiny alphabets that force heavy shingle sharing, short
    texts hitting the <3-token fallback, and identical documents."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles as sh_expr,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        jaccard_pairs_capped,
    )

    rows = [(i, lang, " ".join(w)) for i, (lang, w) in enumerate(docs)]
    d = spark_prop.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING"
    )
    shingled = d.select(
        "doc_id", "lang", sh_expr(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))

    want = _brute_jaccard(
        [(i, lang, w) for i, (lang, w) in enumerate(docs)],
        JACCARD_THRESHOLD,
    )

    exact = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in jaccard_pairs_capped(
            shingled, posting_cap=10_000
        ).collect()
    }
    assert exact == want

    capped = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in jaccard_pairs_capped(shingled, posting_cap=cap).collect()
    }
    assert set(capped) <= set(want)
    for pair, j in capped.items():
        assert j <= want[pair] + 1e-9


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=15,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0,
        max_size=15,
        unique=True,
    ),
)
def test_asof_join_equals_backward_search(spark_prop, lefts, rights):
    """The union+window as-of join must equal a per-row backward search:
    for each left row, the right payload at the MAX right ts ≤ left ts
    within the key (inclusive — a right row exactly at the left ts
    matches), NULL when none precedes. Right rows are unique per
    (key, ts) — the operator's documented determinism contract (q20
    pre-aggregates to guarantee it)."""
    import datetime as _dt

    from k_means_clustering_via_map_reduce_spark.operators.asof import (
        asof_join,
    )

    base = _dt.datetime(2024, 1, 1)

    def ts(s):
        return base + _dt.timedelta(seconds=s)

    l = spark_prop.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(lefts)],
        "lid BIGINT, k BIGINT, ts TIMESTAMP_NTZ",
    )
    r = spark_prop.createDataFrame(
        [(k, ts(s), k * 1000 + s) for k, s in rights] or [(None, None, None)],
        "k BIGINT, ts TIMESTAMP_NTZ, payload BIGINT",
    )
    if not rights:
        r = r.filter(F.lit(False))
    got = {
        row["lid"]: row["payload"]
        for row in asof_join(l, r, on=["k"]).collect()
    }
    want = {}
    for i, (k, s) in enumerate(lefts):
        cands = [(rs, k * 1000 + rs) for rk, rs in rights if rk == k and rs <= s]
        want[i] = max(cands)[1] if cands else None
    assert got == want


def test_containment_and_dup_span_match_python_on_random_docs(spark_prop):
    """Property: on seeded random word-soup corpora, the engine's
    containment scores and dup-span counts equal a pure-Python
    set/ngram oracle — the kernel-vs-oracle pattern for the two
    round-5 gram operators."""
    import random

    import pyspark.sql.functions as F

    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(24):
        n = rng.randint(10, 40)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # Plant a superset pair: doc 100 contains doc 101's text verbatim.
    inner = " ".join(rng.choice(vocab) for _ in range(12))
    docs.append((100, inner + " " + " ".join(rng.choice(vocab) for _ in range(25))))
    docs.append((101, inner))
    df = spark_prop.createDataFrame(docs, "doc_id long, text string")

    def py_shingles(text, n=3):
        w = text.strip().split(" ")
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {i: py_shingles(t) for i, t in docs}

    got = {
        r["doc_id"]: set(r["sh"])
        for r in df.select(
            "doc_id", shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert got == sets

    # Containment: the planted pair scores 1.0 in the inner→outer
    # direction, matching the python sets.
    c = len(sets[101] & sets[100]) / len(sets[101])
    assert c == 1.0

    # Dup-span positions (rolling 8-grams) vs python.
    W = 8

    def py_grams(text):
        w = text.strip().split(" ")
        return [" ".join(w[i : i + W]) for i in range(max(len(w) - W + 1, 0))]

    all_grams = {}
    for i, t in docs:
        for g in py_grams(t):
            all_grams.setdefault(g, set()).add(i)
    want = {}
    for i, t in docs:
        gs = py_grams(t)
        if gs:
            want[i] = (
                len(gs),
                sum(1 for g in gs if len(all_grams[g]) >= 2),
            )

    w = F.split(F.trim(F.col("text")), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(W - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, W)),
    )
    g = df.filter(F.size(w) >= W).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    nd = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    per = (
        g.join(nd, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("nd") >= 2, 1)).alias("n_dup"),
        )
        .collect()
    )
    got2 = {r["doc_id"]: (r["n"], r["n_dup"]) for r in per}
    assert got2 == want
