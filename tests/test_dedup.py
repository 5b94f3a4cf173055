"""Dedup operator tests: MinHash-LSH recall vs the exact-jaccard anchor,
SimHash determinism vs a pure-Python oracle (SURVEY.md §5.2-style
kernel-vs-oracle checks)."""

from __future__ import annotations

import hashlib
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import k_means_clustering_via_map_reduce_spark.queries as Q

Q.load_all()


def pairs_set(df, a="a_id", b="b_id"):
    return {(r[a], r[b]) for r in df.collect()}


def python_shingles(text: str, n: int = 3) -> frozenset[str]:
    w = text.strip().split(" ")
    if len(w) < n:
        return frozenset([" ".join(w)])
    return frozenset(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))


@pytest.fixture(scope="module")
def true_pairs(spark, sf_dir):
    """UNBLOCKED brute-force jaccard ground truth (pure Python).
    d1_jaccard_pairs blocks by lang, so it is a subset; LSH has no such
    block and must be judged against the full truth."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: python_shingles(r["text"]) for r in docs}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                out.add((a, b))
    return out


def test_minhash_lsh_recall_and_precision(spark, sf_dir, true_pairs):
    """Banding (16 bands × 2 rows) promises ≥99% candidate probability at
    j=0.5; the exact-jaccard verification makes precision 1.0 against the
    unblocked ground truth. Recall target ≥ 0.9 (K3 contract)."""
    assert true_pairs, "fixture should contain planted near-duplicates"
    lsh = pairs_set(Q.QUERIES["d2_minhash_lsh_pairs"](spark, sf_dir))
    assert lsh <= true_pairs, f"false positives: {sorted(lsh - true_pairs)[:5]}"
    recall = len(lsh & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"recall {recall} < 0.9 ({len(lsh)}/{len(true_pairs)})"


def test_blocked_jaccard_is_subset_of_truth(spark, sf_dir, true_pairs):
    blocked = pairs_set(Q.QUERIES["d1_jaccard_pairs"](spark, sf_dir))
    assert blocked <= true_pairs


def python_simhash(text: str) -> int:
    """Pure-Python oracle mirroring operators.dedup._simhash_udf."""
    votes = [0] * 64
    for tok in set(text.strip().split(" ")):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sim = 0
    for b in range(64):
        if votes[b] > 0:
            sim |= 1 << b
    return sim - 2**64 if sim >= 2**63 else sim


def test_simhash_matches_python_oracle(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import with_simhash
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    got = {r["doc_id"]: r["simhash"] for r in with_simhash(docs).collect()}
    want = {
        r["doc_id"]: python_simhash(r["text"]) for r in docs.collect()
    }
    assert got == want


def test_simhash_pairs_hamming_verified(spark, sf_dir):
    """Every emitted pair must satisfy the hamming bound (banding is only
    a candidate filter)."""
    df = Q.QUERIES["d3_simhash_pairs"](spark, sf_dir)
    rows = df.collect()
    for r in rows:
        assert r["hamming"] <= 3


def test_embedding_dup_pairs_symmetric_threshold(spark, sf_dir):
    df = Q.QUERIES["d4_embedding_dup_pairs"](spark, sf_dir)
    rows = df.collect()
    assert rows, "threshold should yield pairs at this scale"
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert r["cos_sim"] >= 0.35 - 1e-9


def test_connected_components_transitive_chain(spark):
    """A-B and B-C (no A-C edge) must collapse into ONE component with
    canonical min id; disjoint pairs stay separate."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "a_id BIGINT, b_id BIGINT"
    )
    labels = {
        r["id"]: r["label"] for r in connected_components(pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_star_matches_label_loop(spark):
    """Property: on seeded random graphs the star-contraction variant
    must produce the exact same (id -> component-min) labeling as the
    min-label loop."""
    import random

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    for n, m in [(12, 8), (40, 30), (60, 90)]:
        pairs = spark.createDataFrame(
            [
                (rng.randrange(n), rng.randrange(n))
                for _ in range(m)
            ],
            "a_id BIGINT, b_id BIGINT",
        ).filter("a_id != b_id")
        want = {
            r["id"]: r["label"]
            for r in connected_components(pairs, max_iter=n).collect()
        }
        got = {
            r["id"]: r["label"]
            for r in connected_components_star(pairs).collect()
        }
        assert got == want, f"n={n} m={m}"
    # Dispatch through the flag returns the same thing.
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "a_id BIGINT, b_id BIGINT"
    )
    star = {
        r["id"]: r["label"]
        for r in connected_components(chain, algorithm="star").collect()
    }
    assert star == {i: 0 for i in range(11)}


def test_star_cc_is_the_working_fallback_beyond_label_budget(spark):
    """The claim that justifies connected_components_star's existence:
    on a graph whose diameter EXCEEDS the label loop's iteration budget
    the label loop fails LOUDLY (it must not silently split the
    component) and the star variant converges in its O(log d) rounds
    with the correct labeling — run through d5's exact query shape
    (component labels -> canonical_id/cluster_size aggregation)."""
    import pytest as _pytest

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        connected_components,
    )

    # Two disjoint paths: 0-1-...-80 (diameter 80) and 1000-...-1020.
    edges = [(i, i + 1) for i in range(80)]
    edges += [(i, i + 1) for i in range(1000, 1020)]
    pairs = spark.createDataFrame(edges, "a_id BIGINT, b_id BIGINT")

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=10)

    comp = connected_components(pairs, algorithm="star")
    clusters = {
        r["canonical_id"]: r["cluster_size"]
        for r in comp.groupBy(F.col("label").alias("canonical_id"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .collect()
    }
    assert clusters == {0: 81, 1000: 21}


def test_connected_components_star_keeps_self_loop_only_nodes(spark):
    """A node appearing ONLY in self-loop pairs must still get
    (id, label=id) from BOTH variants — the star variant derives its
    node set from the raw pairs before the self-loop filter."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(5, 5), (1, 2), (9, 9)], "a_id BIGINT, b_id BIGINT"
    )
    want = {1: 1, 2: 1, 5: 5, 9: 9}
    label = {
        r["id"]: r["label"] for r in connected_components(pairs).collect()
    }
    star = {
        r["id"]: r["label"]
        for r in connected_components_star(pairs).collect()
    }
    assert label == want
    assert star == want


def test_connected_components_raises_when_unconverged(spark):
    """A path graph with diameter > max_iter must fail loudly instead of
    silently returning a split component; the star variant handles the
    same graph in O(log d) rounds."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a_id BIGINT, b_id BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=3)
    labels = {
        r["id"]: r["label"] for r in connected_components_star(path).collect()
    }
    assert labels == {i: 0 for i in range(13)}


def test_jaccard_posting_cap_is_subset_and_converges(spark, sf_dir):
    """Capped jaccard must (a) equal the exact result when the cap
    exceeds every posting frequency, (b) produce a SUBSET of exact
    pairs under an aggressive cap (capping can only lose intersection
    members, never invent pairs)."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _shingled,
        jaccard_pairs_capped,
    )

    exact = {
        (r["a_id"], r["b_id"])
        for r in Q.QUERIES["d1_jaccard_pairs"](spark, sf_dir).collect()
    }
    s = _shingled(spark, sf_dir)
    uncapped = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs_capped(s, posting_cap=10**9).collect()
    }
    assert uncapped == exact
    capped = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs_capped(s, posting_cap=3).collect()
    }
    assert capped <= exact


def test_d6_within_cell_exact_and_subset_of_global(spark, sf_dir):
    """D6 must be EXACT within cells (every same-cell pair ≥ threshold
    appears) and a subset of the global threshold pair set (its only
    misses are cross-cell pairs — the documented recall boundary)."""
    from k_means_clustering_via_map_reduce_spark.functions.vector import (
        cosine_similarity,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        SEMANTIC_THRESHOLD,
        semantic_cell,
        semantic_dup_pairs,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    got = {
        (r["a_id"], r["b_id"])
        for r in semantic_dup_pairs(spark, sf_dir).collect()
    }

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("cell", semantic_cell(F.col("v")))
    )
    a = e.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("av"),
        F.col("cell").alias("ac"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"),
        F.col("cell").alias("bc"),
    )
    brute = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine_similarity(F.col("av"), F.col("bv")))
        .filter(F.col("cos") >= SEMANTIC_THRESHOLD)
        .select("a_id", "b_id", "ac", "bc")
        .collect()
    )
    global_pairs = {(r["a_id"], r["b_id"]) for r in brute}
    same_cell = {
        (r["a_id"], r["b_id"]) for r in brute if r["ac"] == r["bc"]
    }
    assert got == same_cell
    assert got <= global_pairs


def test_d6_cells_partition_the_corpus(spark, sf_dir):
    """Every vector lands in exactly one of the 2^B cells."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        SEMANTIC_CELL_BITS,
        semantic_cell,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        semantic_cell(
            F.col("embedding").cast("array<double>")
        ).alias("cell")
    )
    cells = [r["cell"] for r in e.collect()]
    assert all(0 <= c < (1 << SEMANTIC_CELL_BITS) for c in cells)
    assert len(cells) == load_table(spark, sf_dir, "embeddings").count()


def test_minhash_crosscheck_against_mllib(spark, sf_dir):
    """Independent-implementation check: MLlib's MinHashLSH (HashingTF
    binary shingle vectors, approxSimilarityJoin at jaccard distance
    <= 0.5) must recover the exact d1 pair set on the fixtures — two
    unrelated MinHash implementations agreeing on the same corpus. The
    engine keeps its own LSH (d2) for the slim scalar-only band
    shuffles pinned in test_plans; this pins that the custom path isn't
    quietly diverging from the reference library's semantics."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )

    exact = {
        (r["a_id"], r["b_id"])
        for r in Q.QUERIES["d1_jaccard_pairs"](spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "lang", shingles(F.col("text"), 3).alias("sh"))
    )
    feat = HashingTF(
        inputCol="sh", outputCol="features", binary=True, numFeatures=1 << 18
    ).transform(docs)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, 0.5, distCol="jdist")
    got = {
        (r["a_id"], r["b_id"])
        for r in joined.filter(
            (F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
            & (F.col("datasetA.lang") == F.col("datasetB.lang"))
        )
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
        )
        .collect()
    }
    assert exact, "vacuous fixture: no exact near-dup pairs"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, (recall, exact - got)
    # HashingTF bucket collisions can nudge borderline distances, so
    # allow slack rather than exact set equality — but the two
    # implementations must substantially agree.
    assert len(exact ^ got) <= max(2, len(exact) // 2), (exact, got)


def test_symmetric_delete_blocking_is_complete_for_lev1(spark):
    """D8's blocking contract: every pair at levenshtein distance <= 1
    must share at least one symmetric-delete key — checked against a
    brute-force python levenshtein over a seeded random vocabulary
    (including transposition-shaped near-misses that the verify step,
    not the blocking, must reject)."""
    import itertools
    import random

    rng = random.Random(1234)
    vocab = list(
        {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(120)
        }
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def keys(s):
        return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}

    truth = {
        (a, b)
        for a, b in itertools.combinations(sorted(vocab), 2)
        if lev(a, b) <= 1
    }
    assert truth, "seeded vocab produced no lev<=1 pairs"
    for a, b in truth:
        assert keys(a) & keys(b), (a, b)

    # And the engine-side SQL key expression agrees with the python set.
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D8_KEYS,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in vocab], "s string")
    got = {
        r.s: set(r.k)
        for r in df.select(
            "s", F.expr(_D8_KEYS % {"col": "s"}).alias("k")
        ).collect()
    }
    assert got == {s: keys(s) for s in vocab}


def test_t19_containment_is_directional(spark, sf_dir):
    """Containment must catch subset pairs Jaccard misses: a 3-shingle
    excerpt inside a 30-shingle page scores 1.0 in the excerpt→page
    direction and ~0.1 the other way."""
    import pyspark.sql.functions as F

    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )

    words = [f"w{i}" for i in range(32)]
    page = " ".join(words)
    excerpt = " ".join(words[:5])  # 3 shingles, all present in page
    df = spark.createDataFrame(
        [(1, excerpt, "en"), (2, page, "en")], "doc_id long, text string, lang string"
    )
    sh = df.select(
        "doc_id", shingles(F.col("text"), 3).alias("sh")
    ).collect()
    sets = {r["doc_id"]: set(r["sh"]) for r in sh}
    c_ab = len(sets[1] & sets[2]) / len(sets[1])
    c_ba = len(sets[1] & sets[2]) / len(sets[2])
    assert c_ab == 1.0 and c_ba < 0.2


def test_t19_fixture_pairs_are_asymmetric(spark, sf_dir):
    """On the real fixture the emitted pair set is NOT symmetric —
    the directional measure genuinely differs from Jaccard's."""
    from k_means_clustering_via_map_reduce_spark.queries import QUERIES

    rows = QUERIES["t19_ngram_containment"](spark, sf_dir).collect()
    pairs = {(r["a_id"], r["b_id"]): r["containment"] for r in rows}
    assert pairs, "fixture should produce containment pairs"
    # Direction matters: a near-superset scores 1.0 one way and < 1.0
    # the other (or passes the threshold in only one direction).
    asym = [
        p
        for p in pairs
        if pairs.get((p[1], p[0])) != pairs[p]
    ]
    assert asym, "expected direction-dependent containment values"


def test_d10_dup_span_bounds(spark, sf_dir):
    """Two identical docs → every span duplicated (fraction 1.0); a
    doc sharing nothing → absent from the profile."""
    import pyspark.sql.functions as F

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        DUP_SPAN_W,
    )

    shared = " ".join(f"s{i}" for i in range(20))
    unique = " ".join(f"u{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, unique)], "doc_id long, text string"
    )
    w = F.split(F.trim(F.col("text")), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(DUP_SPAN_W - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, DUP_SPAN_W)),
    )
    g = df.select("doc_id", F.explode(grams).alias("gram"))
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
    frac = {r["doc_id"]: r["n_dup"] / r["n"] for r in per}
    assert frac[1] == 1.0 and frac[2] == 1.0 and frac[3] == 0.0


def test_d10_short_doc_guard(spark, tmp_path):
    """A document shorter than DUP_SPAN_W words must yield an EMPTY
    gram array and silently drop out — matching the oracle's empty
    generate_series — instead of crashing F.slice with a non-positive
    start (the unguarded-descending-F.sequence trap shingles()
    documents). Crafted corpus: one 3-word doc plus two identical
    12-word docs that must still profile as 100% duplicated."""
    import k_means_clustering_via_map_reduce_spark.queries as Q
    from tests.oracle_utils import compare_to_oracle

    long = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, "too few words", "en", "web", 13),
        (2, long, "en", "web", len(long)),
        (3, long, "en", "web", len(long)),
    ]
    import pandas as pd

    sf = str(tmp_path)
    # single-file parquet (like the driver testdata) so DuckDB's
    # read_parquet(path) sees a file, not a Spark part-file directory
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{sf}/documents.parquet")
    out = Q.QUERIES["d10_dup_span_profile"](spark, sf)
    got = {r.doc_id: r.dup_fraction for r in out.collect()}
    assert got == {2: 1.0, 3: 1.0}  # short doc absent, dups fully spanned
    compare_to_oracle(out, Q.ORACLE_SQL["d10_dup_span_profile"], sf)


def test_d12_pairs_superset_confirms_d1_families(spark, sf_dir):
    """The idf-weighted cosine must surface the same near-dup families
    d1's jaccard finds — the two detectors share the shingle space, so
    every jaccard>=0.5 pair should score cosine>=0.5 (idf weighting
    only CONCENTRATES the shared mass for genuinely similar docs)."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        d12_tfidf_cosine_pairs,
        jaccard_pairs,
    )

    jac = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs(spark, sf_dir).collect()
    }
    cos = {
        (r["a_id"], r["b_id"])
        for r in d12_tfidf_cosine_pairs(spark, sf_dir).collect()
    }
    assert jac <= cos, jac - cos


def test_d12_partitioning_independent(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        d12_tfidf_cosine_pairs,
    )

    a = sorted(map(tuple, d12_tfidf_cosine_pairs(spark, sf_dir).collect()))
    b = sorted(map(tuple, d12_tfidf_cosine_pairs(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_d2b_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D2B_ORACLE,
        d2b_minhash_banding_oracle,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        d2b_minhash_banding_oracle(spark, sf_dir), _D2B_ORACLE, sf_dir
    )


def test_d2b_recall_against_exact_jaccard(spark, sf_dir):
    """The 3x4 banding must catch every fixture near-dup family (all
    sit at jaccard >= 0.95, where a miss needs all three bands to
    split — probability well under a percent)."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        d2b_minhash_banding_oracle,
        jaccard_pairs,
    )

    exact = {
        (r["a_id"], r["b_id"]) for r in jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"])
        for r in d2b_minhash_banding_oracle(spark, sf_dir).collect()
    }
    assert lsh <= exact  # exact verification: no false positives
    assert lsh == exact  # and on this fixture, full recall


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c d efg "),
            min_size=1,
            max_size=40,
        ).filter(lambda t: t.strip()),
        min_size=2,
        max_size=8,
    )
)
def test_d3_oracle_replays_engine_simhash_on_arbitrary_text(
    spark_prop, texts
):
    """The round-8 D3 oracle upgrade's guard: on ARBITRARY token soups
    (repeated tokens, multi-space runs, single-char vocab), the DuckDB
    replay of the md5 simhash — hash prefixes, majority votes over
    distinct tokens, band keys, hamming — must emit exactly the
    engine's pair set. Any divergence in tokenization, UBIGINT
    semantics, majority ties, or two's-complement handling shows here
    before the driver sees it."""
    import duckdb
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D3_ORACLE,
        simhash_pairs,
    )

    spark = spark_prop
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    got = sorted(
        map(
            tuple,
            simhash_pairs(spark.createDataFrame(pdf))
            .orderBy("a_id", "b_id")
            .collect(),
        )
    )
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        want = sorted(map(tuple, con.execute(_D3_ORACLE).fetchall()))
    finally:
        con.close()
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("xy z w v "),
            min_size=3,
            max_size=30,
        ).filter(lambda t: t.strip()),
        min_size=2,
        max_size=6,
    )
)
def test_d2b_oracle_replays_engine_banding_on_arbitrary_text(
    spark_prop, texts
):
    """d2b's guard (same class as the d3 one): md5 permutation mins,
    band keys, candidates, and exact jaccard must agree between the
    engine and the DuckDB replay on arbitrary token soups — with a
    single 'lang' so the blocking never hides a divergence."""
    import duckdb
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D2B_ORACLE,
    )

    spark = spark_prop
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    )

    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        minhash_banding_pairs_md5,
    )

    shingled = (
        spark.createDataFrame(pdf)
        .select("doc_id", "lang", shingles(F.col("text"), 3).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )
    got = sorted(map(tuple, minhash_banding_pairs_md5(shingled).collect()))
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        want = sorted(map(tuple, con.execute(_D2B_ORACLE).fetchall()))
    finally:
        con.close()
    assert got == want


# ---------------------------------------------------------------- D13
def test_d13_pipeline_collapses_families_to_one_canonical(spark):
    """Synthetic three-doc near-dup family plus one unrelated doc: the
    family must collapse to ONE canonical (min doc_id) survivor — the
    transitive-closure step's chain behavior is separately pinned at
    the connected_components unit level above. The tail words are
    chosen so the deterministic md5 banding RECALLS all three pairs
    (banding at J~0.67 is ~48%-recall by design, so an arbitrary
    triple may legitimately come back partial)."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        dedup_pipeline,
        minhash_banding_pairs_md5,
    )
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "en", 100, base + " one two"),
        (2, "en", 100, base + " one three"),
        (3, "en", 100, base + " seven three"),
        (9, "en", 100, "totally different text with no overlap here"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING"
    )
    sh = docs.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    )
    # precondition: the fixed banding finds the full family (fails
    # loudly here, not in the aggregate, if the md5 layout shifts)
    found = sorted(
        (r["a_id"], r["b_id"])
        for r in minhash_banding_pairs_md5(sh).collect()
    )
    assert found == [(1, 2), (1, 3), (2, 3)], found
    out = {r["lang"]: r.asDict() for r in dedup_pipeline(
        docs.select("doc_id", "lang", "n_chars"), sh
    ).collect()}
    en = out["en"]
    assert en["n_docs"] == 4
    # docs 2 and 3 drop (canonical = 1), doc 9 survives
    assert en["n_dropped"] == 2
    assert en["kept_chars"] == 200


def test_d13_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D13_ORACLE,
        d13_dedup_pipeline,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(d13_dedup_pipeline(spark, sf_dir), _D13_ORACLE, sf_dir)


def test_jaccard_three_arm_contract_pinned():
    """VERDICT r12 #3: the jaccard family's division of labor is a
    CONTRACT, not an accident — d1 (exact/clean), d1b (capped guard),
    d19 (exact/adversarial prefix) must all be registered and share
    the ONE d1 oracle, so any drift in any arm flips a driver hash
    against the same truth. d19 == d1 row-set equality is pinned in
    tests/test_bank_r13.py; d1b's binding-cap subset in this file."""
    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    for arm in ("d1_jaccard_pairs", "d1b_jaccard_capped",
                "d19_prefix_jaccard_pairs"):
        assert arm in Q.QUERIES, f"{arm} fell out of the registry"
    assert (
        Q.ORACLE_SQL["d1_jaccard_pairs"]
        == Q.ORACLE_SQL["d1b_jaccard_capped"]
        == Q.ORACLE_SQL["d19_prefix_jaccard_pairs"]
    ), "the three arms stopped sharing one oracle"


def test_d12_binding_cap_underestimates_never_inflates(spark):
    """d12's cap-encoded guard under a BINDING cap: pairs reachable
    only through the hot shingle lose (underestimated) cosine mass;
    no pair ever gains. The hot shingle's idf is small but nonzero on
    a 4-doc corpus, so the capped score must be strictly lower for
    pairs that shared it."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    # 30 shared base words -> 28 shared trigrams at idf ln(5/2); one
    # differing word -> 3 unique trigrams each at ln(5); the hot
    # trigram has df=4 of n_docs=5, idf ln(5/4) > 0, and df > cap=3.
    # Pair (1,2): cos = (28*w2^2 + wh^2) / (28*w2^2 + 3*w1^2 + wh^2)
    # ~ 0.752 full, ~0.750 capped — above threshold both ways,
    # STRICTLY lower capped.
    base = " ".join(f"b{i}" for i in range(30))
    hot = "zz hot token"
    rows = [
        (1, "en", f"{base} theta {hot}"),
        (2, "en", f"{base} iota {hot}"),
        (3, "en", f"one two three four five six {hot}"),
        (4, "en", f"seven eight nine ten eleven {hot}"),
        (5, "en", "completely different words here now indeed"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING"
    )
    sh = docs.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    nl = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    full = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(sh, nl).collect()
    }
    capped = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(sh, nl, posting_cap=3).collect()
    }
    assert (1, 2) in full
    assert set(capped) <= set(full)
    for pair, c in capped.items():
        assert c <= full[pair]
    assert (1, 2) in capped  # carried by its rare shingles
    assert capped[(1, 2)] < full[(1, 2)]  # the hot posting's mass gone
