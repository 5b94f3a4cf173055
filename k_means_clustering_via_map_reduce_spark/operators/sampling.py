"""Sampling operators for training-data pipelines: seeded per-stratum
subsampling (class rebalancing, eval-split carving) without ever
materializing or shuffling the full dataset.

Scale shape: ``sampleBy`` is a narrow per-row Bernoulli filter — no
shuffle, no state; at 100 TB the cost is the scan. The hash-based
variant is deterministic per ROW VALUE (not per partition layout), so
the same row always lands on the same side of the cut — the property a
reproducible train/eval split needs across reruns, repartitions, and
engine versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table, spread

SAMPLE_SEED = 42


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = SAMPLE_SEED
) -> DataFrame:
    """Per-stratum Bernoulli sample (Spark's ``sampleBy``). Fast and
    shuffle-free; sampled SET depends on the seed and row order, so use
    ``hash_split`` when exact rerun-reproducibility matters."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    salt: str = "kmce",
) -> DataFrame:
    """Value-deterministic subsample: keep a row iff
    xxhash64(salt, keys) mod 10^6 < fraction·10^6. Independent of
    partitioning, ordering, and cluster size — the reproducible
    train/eval-split primitive."""
    bucket = F.pmod(
        F.xxhash64(F.lit(salt), *[F.col(c) for c in key_cols]),
        F.lit(1_000_000),
    )
    return df.filter(bucket < int(fraction * 1_000_000))


@query("p1_stratified_sample")
def stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% per-lang document sample via hash_split on
    doc_id (value-deterministic ⇒ stable row set), with per-stratum
    counts. Rows-only for the driver (hash constants are
    engine-internal); pytest checks determinism, subset property, and
    per-stratum fraction tolerance."""
    d = load_table(spark, sf_dir, "documents")
    sampled = hash_split(d, ["doc_id"], 0.2)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# P4 — per-source quota selection: cap each source's contribution at the
# N highest-quality documents (source mixing/weighting — upweighting
# curated sources and capping boilerplate-heavy ones is standard
# LM-corpus construction practice).
# --------------------------------------------------------------------------
SOURCE_QUOTA = 15

from k_means_clustering_via_map_reduce_spark.operators.text import (  # noqa: E402
    QUALITY_SQL,
)


@query(
    "p4_source_quota",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      string_split(trim(text), ' ') AS w FROM documents),
    q AS (SELECT doc_id, source, {QUALITY_SQL} AS quality FROM d),
    r AS (SELECT doc_id, source, quality,
                 row_number() OVER (PARTITION BY source
                   ORDER BY quality DESC, doc_id) AS rk
          FROM q)
    SELECT source, doc_id, quality, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {SOURCE_QUOTA}
    ORDER BY source, rk
    """,
)
def source_quota_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{quota} documents per source by T2 quality score (4-decimal
    rounded BEFORE ranking so Spark and the oracle rank identical keys;
    ties break on doc_id). On the sf0.01 fixture every source holds ~25
    docs, so the quota genuinely truncates.

    Scale: one hash shuffle on source + per-partition TOP-N — Spark
    executes rank-then-filter as a windowed top-k without sorting whole
    partitions to completion, and quality itself is a narrow per-row
    projection. Source count is the only cardinality that matters
    downstream (quota x sources rows survive)."""
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        _quality_expr,
    )
    from pyspark.sql.window import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "source", _quality_expr().alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    return (
        scored.withColumn(
            "rk", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rk") <= SOURCE_QUOTA)
        .select("source", "doc_id", "quality", "rk")
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# P5 — source-weighted corpus mixing: keep each document with a
# per-source probability (upweight curated sources, downweight bulk
# scrapes) via a value-pure md5 draw — the "data mixing weights" step of
# LM-corpus assembly, deterministic and SQL-replayable.
# --------------------------------------------------------------------------
MIX_SALT = "mix"
MIX_WEIGHTS = (  # (sources, keep permille)
    (("src0", "src1", "src2"), 1000),
    (("src3", "src4", "src5"), 500),
)
MIX_DEFAULT_PERMILLE = 200


def _mix_draw(doc_id: F.Column) -> F.Column:
    """Uniform-ish [0, 1000) draw as a pure function of the row key:
    first 4 hex chars of md5(salt || id) mod 1000 — replayable in any
    engine with md5 (the oracle's exact expression)."""
    h = F.substring(
        F.md5(F.concat(F.lit(MIX_SALT), doc_id.cast("string"))), 1, 4
    )
    return F.conv(h, 16, 10).cast("bigint") % 1000


@query(
    "p5_source_mixing",
    oracle=f"""
    WITH kept AS (
      SELECT * FROM documents
      WHERE CAST(('0x' || substr(md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 4))
                 AS BIGINT) % 1000
            < CASE WHEN source IN ('src0','src1','src2') THEN 1000
                   WHEN source IN ('src3','src4','src5') THEN 500
                   ELSE {MIX_DEFAULT_PERMILLE} END
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM kept GROUP BY source ORDER BY source
    """,
)
def source_mixing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source survivor stats after weighted mixing: full-weight
    curated sources, half-weight mid-tier, 20% bulk tail. The draw is a
    pure function of (salt, doc_id) — independent of partitioning, row
    order, and cluster size, so the same corpus always mixes to the
    same subset (the reproducibility property hash_split documents,
    extended to per-group weights).

    Scale: a narrow per-row filter + one agg — no shuffle beyond the
    aggregation; weights live in the expression (or a broadcast lookup
    at many-source scale)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    weight = F.lit(MIX_DEFAULT_PERMILLE)
    for sources, permille in reversed(MIX_WEIGHTS):
        weight = F.when(F.col("source").isin(*sources), permille).otherwise(
            weight
        )
    kept = d.filter(_mix_draw(F.col("doc_id")) < weight)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# P6 — deterministic epoch shuffle + sharding: the "shuffle the corpus
# differently every epoch" step of LM training-data assembly, as a
# value-pure relational query. Order key = md5(epoch_salt || doc_id);
# shard = leading hex nibbles mod N. Changing the salt re-deals both the
# global order and the shard assignment; nothing depends on partitioning,
# row order, or cluster size (p1/p5's reproducibility property, extended
# to ORDERING).
# --------------------------------------------------------------------------
EPOCH_SALT = "epoch7|"
EPOCH_SHARDS = 8


@query(
    "p6_epoch_shuffle",
    oracle=f"""
    WITH b AS (SELECT doc_id, n_chars,
          md5('{EPOCH_SALT}' || CAST(doc_id AS VARCHAR)) AS okey,
          CAST(('0x' || substr(md5('{EPOCH_SALT}' ||
               CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
            % {EPOCH_SHARDS} AS shard
        FROM documents),
    t AS (SELECT shard,
                 CAST(row_number() OVER (PARTITION BY shard ORDER BY okey)
                      AS BIGINT) AS rk,
                 doc_id, okey,
                 count(*) OVER (PARTITION BY shard) AS n_in_shard,
                 CAST(sum(n_chars) OVER (PARTITION BY shard) AS BIGINT)
                   AS sum_chars_shard
          FROM b)
    SELECT shard, rk, doc_id, okey, n_in_shard, sum_chars_shard
    FROM t WHERE rk <= 3 ORDER BY shard, rk
    """,
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: per-shard head of the epoch-shuffled corpus plus shard-level
    stats — the first 3 docs each shard would stream, with the shard's
    doc count and char budget beside them.

    Both window specs (the ranked head and the unordered shard totals)
    partition on `shard`, so Catalyst computes them over ONE hash
    exchange (pinned in tests/test_plans.py); a training loader at
    100 TB does the same thing per epoch with a sort WITHIN each shard
    file write (f8's repartitionByRange idiom) rather than a global
    sort. The md5 order key is uniform enough that shards stay balanced
    at any corpus size (no hot shard, no skew salt needed)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    okey = F.md5(F.concat(F.lit(EPOCH_SALT), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(okey, 1, 4), 16, 10).cast("bigint") % EPOCH_SHARDS
    )
    base = d.select(
        "doc_id", "n_chars", okey.alias("okey"), shard.alias("shard")
    )
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("shard").orderBy("okey")
    w_all = Window.partitionBy("shard")
    return (
        base.select(
            "shard",
            F.row_number().over(w_rank).cast("bigint").alias("rk"),
            "doc_id",
            "okey",
            F.count(F.lit(1)).over(w_all).alias("n_in_shard"),
            F.sum("n_chars").over(w_all).alias("sum_chars_shard"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("shard", "rk")
    )


# --------------------------------------------------------------------------
# P7 — temperature-scaled mixture sampling: keep-rates COMPUTED from the
# data (rate_s ∝ n_s^(α-1), the multilingual-LM "temperature" reweight
# of XLM-R / mT5, α = 0.5) rather than p5's static table. Two passes:
# a tiny per-stratum count aggregate (|langs| rows) broadcast back onto
# the corpus, then the same value-pure md5 draw as p5. α = 0.5 keeps the
# weight function at sqrt(), which IEEE 754 rounds correctly in every
# engine — the computed permille thresholds are bit-identical between
# Spark and the oracle (a generic pow() would not guarantee that).
# --------------------------------------------------------------------------
P7_SALT = "temp"
P7_TARGET_FRAC = 0.5  # corpus-level keep budget before per-lang reweighting


@query(
    "p7_temperature_mix",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(n) AS total_n, sum(sqrt(n)) AS z FROM counts),
    rates AS (
      SELECT lang, n,
             CAST(least(1000, floor(round(1000 * {P7_TARGET_FRAC} * total_n
                                          * sqrt(n) / (z * n), 6)))
                  AS BIGINT) AS permille
      FROM counts, tot),
    kept AS (
      SELECT d.lang, d.doc_id, d.n_chars, r.permille
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE CAST(('0x' || substr(md5('{P7_SALT}'
                   || CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 1000
            < r.permille)
    SELECT lang, permille, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM kept GROUP BY lang, permille ORDER BY lang
    """,
)
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang survivor stats under temperature sampling: rare
    languages keep (almost) everything, the dominant one is cut hardest
    — expected keep-rate ratio between langs i,j is sqrt(n_j/n_i).

    Scale: pass 1 is a partial-agg count collapsing to |langs| rows
    (broadcast); pass 2 is a narrow per-row filter. Nothing shuffles
    the corpus itself; the draw is a pure function of (salt, doc_id) so
    the mixture is reproducible across reruns, partitionings, and
    engines."""
    d = spread(load_table(spark, sf_dir, "documents"))
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total_n"), F.sum(F.sqrt("n")).alias("z")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1000),
            # z = sum(sqrt(n)) is an order-dependent FP sum; round the
            # pre-floor product to 6 decimals on BOTH sides so a value
            # landing within FP jitter of an integer boundary cannot
            # floor() differently across engines or partitionings.
            F.floor(
                F.round(
                    1000
                    * P7_TARGET_FRAC
                    * F.col("total_n")
                    * F.sqrt("n")
                    / (F.col("z") * F.col("n")),
                    6,
                )
            ),
        )
        .cast("bigint")
        .alias("permille"),
    )
    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(P7_SALT), F.col("doc_id").cast("string"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(draw < F.col("permille"))
        .groupBy("lang", "permille")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# P8 — contamination-aware train/eval split: carve a held-out set with
# the value-pure draw, then REMOVE from train any document sharing a
# near-dup fingerprint with an eval document — the split-decontamination
# step every LM training pipeline runs so the held-out loss measures
# generalization, not memorized near-duplicates leaking across the cut.
# (t9 decontaminates against an EXTERNAL eval-gram list; p8 is the
# within-corpus split form.) Composes existing primitives: p5's md5
# draw + t4's min-shingle-md5 fingerprint + a semi join.
# --------------------------------------------------------------------------
P8_SALT = "split"
P8_EVAL_PERMILLE = 100  # 10% held out


@query(
    "p8_decontaminated_split",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS w,
                      CAST(('0x' || substr(md5('{P8_SALT}'
                           || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                        % 1000 < {P8_EVAL_PERMILLE} AS is_eval
               FROM documents),
    f AS (SELECT doc_id, lang, is_eval,
                 CASE WHEN len(w) >= 5 THEN
                   list_min(list_transform(generate_series(1, len(w) - 4),
                            i -> md5(array_to_string(w[i:i+4], ' '))))
                 ELSE md5(array_to_string(w, ' ')) END AS fp
          FROM d),
    efp AS (SELECT DISTINCT fp FROM f WHERE is_eval),
    t AS (SELECT f.*, (NOT is_eval AND fp IN (SELECT fp FROM efp))
                   AS contaminated
          FROM f)
    SELECT lang,
           CAST(count(CASE WHEN is_eval THEN 1 END) AS BIGINT) AS n_eval,
           CAST(count(CASE WHEN NOT is_eval THEN 1 END) AS BIGINT)
             AS n_train,
           CAST(count(CASE WHEN contaminated THEN 1 END) AS BIGINT)
             AS n_removed,
           CAST(count(CASE WHEN NOT is_eval AND NOT contaminated THEN 1
                      END) AS BIGINT) AS n_train_clean
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def decontaminated_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang split accounting: held-out size, raw train size, the
    contaminated train docs removed (fixture: the planted near-dup
    pairs whose twins landed across the cut — non-zero, pinned in
    pytest), and the clean train count.

    Scale: the draw and the fingerprint are narrow per-row
    projections; eval fingerprints are |eval| rows (broadcast — at a
    10% cut of 100 TB that is still only a digest per eval doc, and a
    shuffle semi join replaces the broadcast when it outgrows the
    driver); one semi join flags contamination. Nothing shuffles the
    corpus; the fingerprint is the SAME 1-perm MinHash t4 ships, so
    blocking strength is a documented, tested primitive."""
    d = spread(load_table(spark, sf_dir, "documents"))
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        min_shingle_md5_fingerprint,
    )

    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(P8_SALT), F.col("doc_id").cast("string"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    base = d.select(
        "doc_id",
        "lang",
        (draw < P8_EVAL_PERMILLE).alias("is_eval"),
        min_shingle_md5_fingerprint(F.col("text"), 5).alias("fp"),
    )
    eval_fp = base.filter("is_eval").select("fp").distinct()
    train = base.filter(~F.col("is_eval"))
    contaminated = train.join(
        F.broadcast(eval_fp), "fp", "left_semi"
    ).select("doc_id", F.lit(True).alias("contaminated"))
    flagged = base.join(contaminated, "doc_id", "left").na.fill(
        {"contaminated": False}
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.when(F.col("is_eval"), 1)).alias("n_eval"),
            F.count(F.when(~F.col("is_eval"), 1)).alias("n_train"),
            F.count(F.when(F.col("contaminated"), 1)).alias("n_removed"),
            F.count(
                F.when(~F.col("is_eval") & ~F.col("contaminated"), 1)
            ).alias("n_train_clean"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# P9 — curriculum ordering (round-7 surface, library-first). Implemented
# and pytest-pinned this round; @query registration deferred to round 7
# per the driver-budget pacing rule (VERDICT r05 "Next round" #1).
# --------------------------------------------------------------------------
P9_PHASES = 4


def curriculum_order(
    docs: DataFrame, n_phases: int = P9_PHASES, seed: str = "epoch0"
) -> DataFrame:
    """Deterministic curriculum assignment: easy→hard phases by a
    difficulty proxy (mean token length — longer words ≈ harder text),
    with a value-pure shuffled order WITHIN each phase.

    Returns (doc_id, difficulty, phase 1..n, draw) where the full
    curriculum order is the sort key (phase ASC, draw ASC, doc_id ASC).
    The in-phase order is md5(seed ‖ doc_id) — p6's epoch-shuffle
    idiom — so re-running with a new seed reshuffles WITHIN phases
    while the phase walls stay put.

    Scale plan: phase walls are EXACT percentile boundaries computed by
    ONE aggregate and broadcast back as a 1-row literal frame — never a
    global ntile window (which would funnel the corpus through a single
    window partition). Phase assignment is then a narrow per-row
    comparison. No dense rank is materialized: the curriculum IS the
    sort key triple, and a consumer lands it with
    writer.partitionBy(phase) + sortWithinPartitions(draw) (the f12
    bucket lever), so nothing ever globally sorts. Ties at a phase
    wall go to the LOWER phase on both engines (boundary compare is
    ``difficulty > wall``, and walls are rounded to the 1e-6 grid so
    an FP ulp cannot move a document across a wall).
    """
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
        F.col("n_chars").cast("double").alias("n_chars"),
    )
    scored = toks.select(
        "doc_id",
        F.round(F.col("n_chars") / F.col("n_tok"), 6).alias("difficulty"),
    )
    probs = [i / n_phases for i in range(1, n_phases)]
    walls = scored.agg(
        F.expr(
            "transform(percentile(difficulty, array("
            + ",".join(str(p) for p in probs)
            + ")), w -> round(w, 6))"
        ).alias("walls")
    )
    assigned = (
        scored.crossJoin(F.broadcast(walls))
        .withColumn(
            "phase",
            (
                F.lit(1)
                + F.aggregate(
                    F.col("walls"),
                    F.lit(0),
                    lambda acc, w: acc
                    + F.when(F.col("difficulty") > w, 1).otherwise(0),
                )
            ).cast("int"),
        )
        .drop("walls")
        .withColumn(
            "draw",
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed), F.lit("|"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                12,
            ),
        )
    )
    return assigned


def curriculum_summary(
    docs: DataFrame, n_phases: int = P9_PHASES, seed: str = "epoch0"
) -> DataFrame:
    """Per-phase curriculum stats + the first document each phase
    would feed (min draw, doc_id tiebreak) — the presentation-sized
    face of ``curriculum_order`` for the round-7 query entry."""
    order = curriculum_order(docs, n_phases, seed)
    first = order.select(
        "phase",
        F.struct("draw", "doc_id").alias("key"),
    ).groupBy("phase").agg(F.min("key").alias("k"))
    stats = order.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("difficulty"), 6).alias("min_diff"),
        F.round(F.max("difficulty"), 6).alias("max_diff"),
    )
    return (
        stats.join(first, "phase")
        .select(
            "phase",
            "n_docs",
            "min_diff",
            "max_diff",
            F.col("k.doc_id").alias("first_doc"),
        )
        .orderBy("phase")
    )


@query(
    "p9_curriculum_summary",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             round(n_chars * 1.0 / len(string_split(trim(text), ' ')), 6)
               AS difficulty
      FROM documents),
    w AS (SELECT list_transform(
                   quantile_cont(difficulty, [0.25, 0.5, 0.75]),
                   x -> round(x, 6)) AS walls
          FROM s),
    a AS (
      SELECT doc_id, difficulty,
             CAST(1 + len(list_filter(w.walls, x -> difficulty > x))
                  AS INT) AS phase,
             substr(md5('epoch0' || '|' || CAST(doc_id AS VARCHAR)), 1, 12)
               AS draw
      FROM s CROSS JOIN w),
    ranked AS (
      SELECT phase, doc_id,
             row_number() OVER (PARTITION BY phase
                                ORDER BY draw, doc_id) AS rn
      FROM a),
    stats AS (
      SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
             round(min(difficulty), 6) AS min_diff,
             round(max(difficulty), 6) AS max_diff
      FROM a GROUP BY phase)
    SELECT s.phase, s.n_docs, s.min_diff, s.max_diff,
           r.doc_id AS first_doc
    FROM stats s JOIN ranked r ON r.phase = s.phase AND r.rn = 1
    ORDER BY s.phase
    """,
)
def p9_curriculum_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: per-phase curriculum stats + each phase's first-served doc —
    the presentation face of ``curriculum_order`` (easy→hard phases by
    mean token length, md5 epoch shuffle within phases). The oracle
    recomputes the walls with DuckDB quantile_cont (== Spark percentile,
    the q29 pairing, both rounded to the 1e-6 grid so an ulp cannot move
    a doc across a wall), the phase assignment, and the min-draw first
    document; a wall slip, a boundary-tie flip, or a draw-formula drift
    flips the hash. Monotone/balanced phases, seed-reshuffle-within-
    fixed-walls, and partitioning invariance are pinned in
    tests/test_curriculum.py.

    Scale: the walls are ONE broadcast aggregate (never a global ntile
    window); assignment is a narrow per-row compare; the summary is one
    groupBy over n_phases keys. The full curriculum order needs no
    materialized rank — (phase, draw, doc_id) IS the sort key."""
    return curriculum_summary(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# P10 — LENGTH-BUCKETED packing (round-8 surface, registered round 8).
# The padding-economics counterpart of p3's concat-and-chunk:
# documents are NOT split across sequences — each doc lands whole in a
# sequence of same-bucket docs (the fairseq/HF "bucketed batching"
# idiom), and the cost is PADDING, which this operator measures.
#
# Buckets are powers of two over token length (width = 2^ceil(log2 n));
# a sequence in bucket W holds floor(PACK_BUDGET / W) docs; docs fill
# sequences in doc_id order, so the assignment is a total order and the
# whole plan is two exchanges: one shuffle on the bucket key for the
# in-bucket row_number, one presentation aggregate. At 100 TB the
# per-bucket partition is the skew risk (same as p3's per-lang cumsum);
# the production variant shards the row_number as (bucket,
# pmod(hash(doc_id), N)) at the cost of ≤N partial tail sequences per
# bucket.
# --------------------------------------------------------------------------
P10_BUDGET = 2048

P10_ORACLE = f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents),
    b AS (
      SELECT doc_id, n_tok,
             CAST(power(2, ceil(log2(greatest(n_tok, 1)))) AS BIGINT)
               AS bucket_w
      FROM d),
    s AS (
      SELECT doc_id, n_tok, bucket_w,
             CAST(floor((row_number() OVER (PARTITION BY bucket_w
                                            ORDER BY doc_id) - 1)
                  / greatest(floor({P10_BUDGET} / bucket_w), 1))
                  AS BIGINT) AS seq_id
      FROM b)
    SELECT bucket_w,
           CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           round(1.0 - sum(n_tok)
                 / (count(DISTINCT seq_id) * {P10_BUDGET}.0), 4)
             AS padding_frac
    FROM s GROUP BY bucket_w ORDER BY bucket_w
"""


def bucketed_packing(
    docs: DataFrame, budget: int = P10_BUDGET, n_shards: int = 1
) -> DataFrame:
    """Per-doc (bucket_w, seq_id) assignment under whole-doc bucketed
    packing. Deterministic: doc_id totally orders every bucket.

    Docs LONGER than the budget land in a bucket wider than the budget
    itself; the per-sequence capacity is clamped to one, so each such
    doc gets its own overflow sequence (the downstream trainer's
    truncate-or-reject decision point) instead of a NULL seq_id — and
    its bucket's padding_frac goes honestly NEGATIVE, surfacing the
    overflow debt rather than hiding those docs from the counts.

    ``n_shards`` is the 100 TB lever: a Zipfian corpus concentrates in
    a few buckets, and a per-bucket row_number funnels each hot bucket
    through ONE sort partition. Sharding the window key as (bucket,
    pmod(hash(doc_id), N)) bounds any single sort partition to ~1/N of
    its bucket; the cost is bounded and measurable — sequences never
    span shards, so at most N-1 EXTRA partial tail sequences per
    bucket (one per non-final shard), pinned in
    tests/test_bucketed_packing.py. Shard ids offset the seq space by
    shard so assignments stay globally unique and deterministic."""
    from pyspark.sql.window import Window

    from k_means_clustering_via_map_reduce_spark.functions.text import tokens

    d = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    b = d.withColumn(
        "bucket_w",
        F.pow(
            F.lit(2.0), F.ceil(F.log2(F.greatest(F.col("n_tok"), F.lit(1))))
        ).cast("bigint"),
    )
    cap = F.greatest(F.floor(F.lit(budget) / F.col("bucket_w")), F.lit(1))
    if n_shards <= 1:
        w = Window.partitionBy("bucket_w").orderBy("doc_id")
        return b.withColumn(
            "seq_id",
            F.floor((F.row_number().over(w) - 1) / cap).cast("bigint"),
        )
    b = b.withColumn(
        "shard", F.pmod(F.hash("doc_id"), F.lit(n_shards))
    )
    w = Window.partitionBy("bucket_w", "shard").orderBy("doc_id")
    # per-shard seq spaces interleave via seq*N + shard: globally
    # unique without any cross-shard coordination (no second shuffle)
    return (
        b.withColumn(
            "seq_id",
            (
                F.floor((F.row_number().over(w) - 1) / cap)
                * F.lit(n_shards)
                + F.col("shard")
            ).cast("bigint"),
        )
        .drop("shard")
    )


@query("p10_bucketed_packing", oracle=P10_ORACLE)
def p10_bucketed_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: padding economics of whole-doc bucketed packing — per
    bucket: sequences built, docs and tokens packed, and the padding
    fraction the budget pays for keeping documents unsplit (p3's
    chunker wastes zero padding but splits documents; this is the
    other end of the trade every LM data pipeline picks a point on).

    Scale: bucket count is log2(max doc length) ≈ a dozen keys; the
    in-bucket row_number is the one data shuffle (sharded variant
    documented above for hot buckets); the summary is a dozen-row
    aggregate. Oracle-exact: token counts are integers, the bucket
    edges are exact powers of two, and padding_frac rounds at 4
    decimals from integer ratios."""
    docs = load_table(spark, sf_dir, "documents")
    s = bucketed_packing(docs)
    return (
        s.groupBy("bucket_w")
        .agg(
            F.countDistinct("seq_id").alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            r4(
                F.lit(1.0)
                - F.sum("n_tok")
                / (F.countDistinct("seq_id") * F.lit(float(P10_BUDGET)))
            ).alias("padding_frac"),
        )
        .orderBy("bucket_w")
    )


# --------------------------------------------------------------------------
# P11 — WEIGHTED sample-without-replacement (round-9 surface,
# library-first per the new-entry budget pacing; the @query
# registration is one decorator away). The "pick K docs
# length-weighted" curation primitive, as SEQUENTIAL POISSON SAMPLING
# (Ohlsson): rank key = u / w with u a value-pure md5 draw and w the
# doc weight; the K smallest keys are the sample — inclusion
# probability ~ proportional to w (the πps estimator survey statistics
# ships on).
#
# Key design point: u/w is ONE IEEE division of two exactly-
# representable integers (52-bit md5 draw, integer weight), and IEEE
# division is correctly rounded in every engine — so the ranking is
# BIT-IDENTICAL across Spark and DuckDB, unlike the classic
# Efraimidis-Spirakis u^(1/w) (pow/ln differ by ulps across libm
# implementations, and an ulp at the rank-K cut flips the sample).
# Tie-break doc_id for a total order.
#
# Scale: orderBy(key).limit(K) plans as TakeOrderedAndProject —
# per-partition top-K then a K-row merge; the corpus never shuffles,
# the reducer sees executors×K rows. The draw is value-pure (md5 of
# the row key), so the sample is partition- and history-independent:
# the same corpus always yields the same sample on any cluster.
# --------------------------------------------------------------------------
P11_SALT = "psamp"
P11_K = 200


def weighted_sample(
    docs: DataFrame, k: int = P11_K, weight_col: str = "n_chars"
) -> DataFrame:
    """The k docs with smallest md5-uniform / weight — heavier docs
    draw smaller keys more often, hence inclusion ~ proportional to
    weight. Deterministic: (key, doc_id) totally orders the corpus."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(P11_SALT), F.col("doc_id").cast("string"))
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    )
    key = u / F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    return docs.withColumn("_kmce_key", key).orderBy(
        "_kmce_key", "doc_id"
    ).limit(k)


P11_ORACLE = f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             (CAST(('0x' || substr(md5('{P11_SALT}' ||
                     CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
              * 1.0 + 1.0)
             / greatest(CAST(n_chars AS DOUBLE), 1.0) AS k
      FROM documents),
    sample AS (
      SELECT * FROM keyed ORDER BY k, doc_id LIMIT {P11_K})
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM sample GROUP BY source ORDER BY source
"""


@query("p11_weighted_sample", oracle=P11_ORACLE)
def p11_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: per-source composition of the length-weighted K-doc sample
    — the oracle replays draw, division, total order, cut, and
    aggregate, so a draw-width slip, a weight clamp difference, an
    unstable tie-break, or an off-by-one at the cut flips the hash."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    s = weighted_sample(docs)
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# P12 — resample the corpus TO A TARGET MIXTURE (round-10 surface,
# library-first; the @query registration is one decorator away). The
# "hit the data-mixing spec" primitive: given per-source target shares,
# downsample each source with a value-pure Bernoulli so the output mix
# matches the spec at the largest achievable size (downsample-only —
# the bottleneck source, the one most under target, is kept whole and
# everything else thins to match). Target here: share proportional to
# source index + 1 (graded 1..20 — the fixture's sources are uniform,
# so a uniform target would be vacuous and every rate would be 1).
#
#   N_out  = min_s  n_s / p_s          (the downsample-only frontier)
#   rate_s = p_s * N_out / n_s         (bottleneck source: exactly 1)
#   keep doc iff md5-draw(doc_id) < rate_s * 2^52
#
# The draw is the p5/p11 discipline: a 52-bit md5 prefix is exactly
# representable in a double, IEEE multiply/divide are correctly rounded
# everywhere, so acceptance is BIT-IDENTICAL across engines, partition
# layouts, and history.
#
# Scale: one vocabulary-sized agg for the per-source counts (broadcast
# back), then a narrow filter over the corpus — no shuffle of the data,
# no collect; rates recompute from the live counts, so the operator
# self-adjusts as the corpus grows.
# --------------------------------------------------------------------------
P12_SALT = "pmix"


def target_mix_resample(
    docs: DataFrame, share_col: F.Column
) -> DataFrame:
    """Downsample-only resampling of ``docs`` to the per-source target
    shares given by ``share_col`` (an expression over the `source`
    column; normalized internally). Returns survivors."""
    from pyspark.sql.window import Window
    shares = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn("p_raw", share_col)
        .withColumn(
            "p_s",
            F.col("p_raw")
            / F.sum("p_raw").over(Window.partitionBy()),
        )
        .withColumn("frontier", F.col("n_s") / F.col("p_s"))
        .withColumn(
            "n_out", F.min("frontier").over(Window.partitionBy())
        )
        .withColumn(
            "rate", F.col("p_s") * F.col("n_out") / F.col("n_s")
        )
        .select("source", "rate")
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(P12_SALT), F.col("doc_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    return (
        docs.join(F.broadcast(shares), "source")
        .filter(u < F.col("rate") * F.lit(float(1 << 52)))
        .drop("rate")
    )


P12_ORACLE = f"""
    WITH counts AS (
      SELECT source, count(*) AS n_s,
             CAST(substr(source, 4) AS DOUBLE) + 1 AS p_raw
      FROM documents GROUP BY source),
    normed AS (
      SELECT source, n_s, p_raw / sum(p_raw) OVER () AS p_s
      FROM counts),
    rates AS (
      SELECT source, n_s, p_s, min(n_s / p_s) OVER () AS n_out
      FROM normed),
    surv AS (
      SELECT d.doc_id, d.source, d.n_chars
      FROM documents d JOIN rates r USING (source)
      WHERE CAST(('0x' || substr(md5('{P12_SALT}'
              || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) * 1.0
            < (r.p_s * r.n_out / r.n_s) * 4503599627370496.0)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM surv GROUP BY source ORDER BY source
"""


@query("p12_target_mix_resample", oracle=P12_ORACLE)
def p12_target_mix_resample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """P12: per-source composition of the target-mixture resample
    (target share proportional to source index + 1) — a rate slip, a
    normalization error, a draw-width difference, or a frontier
    min taken over the wrong set flips the hash."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    share = F.substring("source", 4, 10).cast("double") + F.lit(1.0)
    s = target_mix_resample(docs, share)
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# P13 — QUALITY-QUANTILE curriculum buckets (round-10 surface,
# library-first; the @query registration is one decorator away).
# Curriculum training feeds data easy-to-hard: rank the corpus by the
# t2 quality score and cut it into N equal-depth buckets (ntile), then
# report each bucket's composition — the schedule manifest a training
# loop consumes. Ranking key is (rounded quality, doc_id): rounding
# BEFORE ranking makes Spark and the oracle rank identical keys (the
# p4 discipline), doc_id makes the order total, so the bucket
# assignment is bit-stable across engines and partitionings.
#
# Scale: ntile is one global sort — the one operation that genuinely
# wants a range partitioner (Spark plans exactly that); everything
# else is per-bucket aggregation. At 100 TB the schedule would be cut
# per-shard with approx quantile bounds; the exact global form is the
# correctness anchor.
# --------------------------------------------------------------------------
P13_BUCKETS = 8

P13_ORACLE = f"""
    WITH d AS (SELECT doc_id, source, n_chars,
                      string_split(trim(text), ' ') AS w FROM documents),
    q AS (SELECT doc_id, source, n_chars,
                 {QUALITY_SQL} AS quality FROM d),
    t AS (SELECT doc_id, source, n_chars, quality,
                 ntile({P13_BUCKETS}) OVER (ORDER BY quality, doc_id)
                   AS bucket
          FROM q)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM t GROUP BY bucket ORDER BY bucket
"""


@query("p13_quality_curriculum", oracle=P13_ORACLE)
def p13_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: the 8-bucket quality curriculum manifest — a ranking-key
    difference, an ntile boundary slip, or an unstable tie-break flips
    the hash (avg_quality must be monotone nondecreasing in bucket by
    construction; pinned in tests)."""
    from pyspark.sql.window import Window

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        _quality_expr,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "source", "n_chars", _quality_expr().alias("quality")
    )
    w = Window.orderBy("quality", "doc_id")
    return (
        scored.withColumn("bucket", F.ntile(P13_BUCKETS).over(w))
        .groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(F.avg("quality")).alias("avg_quality"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# P14 — deterministic EPOCH SHARDING (round-11 surface, library-first;
# the @query registration is one decorator away). The training-loader
# contract: every epoch deals the corpus into N shards by a value-pure
# hash salted with the epoch number, so (a) shard assignment is
# reproducible from (epoch, doc_id) alone — no stored shuffle order,
# no history dependence — and (b) consecutive epochs deal DIFFERENT
# partitions (the reshuffle-each-epoch semantics) without moving a
# byte until read time. md5-prefix hashing is the p5/p11/p12
# discipline: replayable in any engine, bit-identical acceptance.
#
# Scale: the assignment is a narrow projection (no shuffle at all);
# the per-(epoch, shard) accounting below is one aggregate. A real
# loader would partition-write by (epoch, shard) — f2's dynamic
# partition write — but the assignment itself is the operator.
# --------------------------------------------------------------------------
P14_SHARDS = 8
P14_EPOCHS = 2
P14_SALT = "epoch"

P14_ORACLE = f"""
    WITH a AS (
      SELECT e.epoch, d.doc_id, d.n_chars,
             CAST(('0x' || substr(md5('{P14_SALT}' ||
                   CAST(e.epoch AS VARCHAR) || '|' ||
                   CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
               % {P14_SHARDS} AS shard
      FROM documents d,
           (SELECT unnest(generate_series(0, {P14_EPOCHS - 1}))
              AS epoch) e)
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM a GROUP BY epoch, shard ORDER BY epoch, shard
"""


def epoch_shard(docs: DataFrame, epoch: int,
                n_shards: int = P14_SHARDS) -> DataFrame:
    """Assign every row a deterministic shard for ``epoch`` — the
    value-pure reshuffle-per-epoch dealer."""
    key = F.concat(
        F.lit(f"{P14_SALT}{epoch}|"), F.col("doc_id").cast("string")
    )
    shard = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10)
        .cast("bigint") % n_shards
    )
    return docs.withColumn("epoch", F.lit(epoch).cast("bigint")
                           ).withColumn("shard", shard)


@query("p14_epoch_sharding", oracle=P14_ORACLE)
def p14_epoch_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: the per-(epoch, shard) composition of the deterministic
    dealer over two epochs — a salt slip, a modulus boundary
    difference, or an epoch bleed (same deal both epochs) flips the
    hash (min/max doc pin membership, not just counts)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    dealt = None
    for e in range(P14_EPOCHS):
        d = epoch_shard(docs, e)
        dealt = d if dealt is None else dealt.unionByName(d)
    return (
        dealt.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("epoch", "shard")
    )


# --------------------------------------------------------------------------
# P15 — per-source TOKEN-BUDGET selection: keep each source's
# highest-quality documents until the source's token budget is spent.
# The data-mixture verb between p4 (doc-count quota) and p7
# (temperature weights): real mixtures are specified in TOKENS, and
# the greedy quality-ordered prefix is how curation pipelines spend
# them. A document is kept iff it STARTS within budget (cumulative
# tokens BEFORE it < budget) — the boundary doc that overflows the
# budget is kept, the one after is not, and both engines agree
# because the rule never divides.
#
# Determinism: ranking key is (rounded quality DESC, doc_id) — the
# p13 discipline; token counts are exact integers (len of the token
# list), so the cumulative frame is integer-exact.
#
# Scale: one window pass per source over (quality, doc_id) — the
# corpus shuffles once on source; at 100 TB the same plan runs
# per-shard with budget split proportionally (documented), the exact
# global form is the correctness anchor.
# --------------------------------------------------------------------------
P15_BUDGET = 800  # tokens per source; binds at every fixture scale

P15_ORACLE = f"""
    WITH d AS (SELECT doc_id, source,
                      string_split(trim(text), ' ') AS w FROM documents),
    q AS (SELECT doc_id, source, len(w) AS n_tok,
                 {QUALITY_SQL} AS quality FROM d),
    c AS (SELECT doc_id, source, n_tok, quality,
                 coalesce(sum(n_tok) OVER (PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS before
          FROM q),
    kept AS (SELECT * FROM c WHERE before < {P15_BUDGET})
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
           round(min(quality), 4) AS min_kept_quality,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM kept GROUP BY source ORDER BY source
"""


@query("p15_token_budget_pick", oracle=P15_ORACLE)
def p15_token_budget_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15: the per-source greedy token-budget manifest — a ranking-key
    difference, a frame that includes the current row (kept docs could
    then never overflow the budget), or a budget compare on the
    inclusive sum flips the hash (kept_tokens >= budget whenever a
    source overflows; pinned in tests)."""
    from pyspark.sql.window import Window

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        _quality_expr,
        tokens,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    q = d.select(
        "doc_id", "source",
        F.size(tokens(F.col("text"))).alias("n_tok"),
        _quality_expr().alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = q.withColumn(
        "before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    kept = c.filter(F.col("before") < P15_BUDGET)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tok").alias("kept_tokens"),
            r4(F.min("quality")).alias("min_kept_quality"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# P16 — WATERFILL mixture allocation (round-10 wave 4): split a global
# token budget across sources so every source gets an equal share of
# the budget EXCEPT sources too small to absorb theirs — their surplus
# redistributes among the rest (the classic cap-and-redistribute /
# water-filling solution, the exact form of the "cap each source,
# re-normalize the remainder" step every mixture recipe applies before
# temperature weighting). Solved RELATIONALLY, not iteratively: sorted
# by size, a source is saturated iff fully funding it and giving every
# later source at least as much still fits the budget —
# n_j*(k-j) + prefix_j <= B, a cross-multiplied BIGINT predicate (no
# engine divides before classifying), so the saturated set is one
# window pass and the final level is one integer division; the
# remainder goes to the first r unsaturated sources in (size, source)
# order. Bit-stable in both engines end to end.
#
# Scale: per-source sizes are one partial-agg groupBy over the corpus;
# everything after operates on the K-row source table (the global
# window is over K rows, not data — stated because an unpartitioned
# window over DATA would be the usual red flag).
# --------------------------------------------------------------------------
P16_BUDGET_NUM = 6  # budget = (6 * total_tokens) div 10
P16_BUDGET_DEN = 10

P16_ORACLE = f"""
    WITH s AS (
      SELECT source, lang,
             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n
      FROM documents GROUP BY source, lang),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             ({P16_BUDGET_NUM} * sum(n)) // {P16_BUDGET_DEN} AS b
      FROM s),
    o AS (
      SELECT source, lang, n,
             row_number() OVER (ORDER BY n, source, lang) AS rk,
             sum(n) OVER (ORDER BY n, source, lang) AS pre
      FROM s),
    js AS (
      SELECT coalesce(max(CASE WHEN o.n * (t.k - o.rk) + o.pre <= t.b
                                THEN o.rk END), 0) AS jstar
      FROM o, t),
    pj AS (
      SELECT coalesce(max(CASE WHEN o.rk = js.jstar THEN o.pre END), 0)
               AS pre_star
      FROM o, js),
    lev AS (
      SELECT CASE WHEN js.jstar = t.k THEN 0
                  ELSE (t.b - pj.pre_star) // (t.k - js.jstar) END AS lvl,
             CASE WHEN js.jstar = t.k THEN 0
                  ELSE (t.b - pj.pre_star) % (t.k - js.jstar) END AS rem,
             js.jstar AS jstar
      FROM js, pj, t)
    SELECT o.source, o.lang, o.n AS n_tokens,
           CAST(CASE WHEN o.rk <= lev.jstar THEN o.n
                     ELSE lev.lvl
                          + CASE WHEN o.rk - lev.jstar <= lev.rem
                                 THEN 1 ELSE 0 END
                END AS BIGINT) AS alloc_tokens,
           CAST(CASE WHEN o.rk <= lev.jstar THEN 1 ELSE 0 END AS BIGINT)
             AS saturated
    FROM o, lev ORDER BY o.source, o.lang
"""


@query("p16_waterfill_mix", oracle=P16_ORACLE)
def p16_waterfill_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16: per-(source, lang) waterfill allocation of 60% of the
    corpus's tokens — units as small as one rare-language document
    SATURATE (keep everything) while large units split the remainder
    evenly; a saturation off-by-one, a pre-division classification, a
    lost remainder token, or an unstable sort among equal-size units
    flips the hash."""
    d = load_table(spark, sf_dir, "documents")
    s = (
        d.select(
            "source",
            "lang",
            F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("n_tok").cast("bigint").alias("n"))
    )
    t = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(
            f"({P16_BUDGET_NUM} * sum(n)) div {P16_BUDGET_DEN}"
        ).alias("b"),
    )
    # K-row table from here on: the unpartitioned windows below order
    # SOURCES, never data rows
    wo = Window.orderBy("n", "source", "lang")
    o = (
        s.withColumn("rk", F.row_number().over(wo))
        .withColumn(
            "pre",
            F.sum("n").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .crossJoin(F.broadcast(t))
    )
    js = o.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("n") * (F.col("k") - F.col("rk")) + F.col("pre")
                    <= F.col("b"),
                    F.col("rk"),
                )
            ),
            F.lit(0).cast("bigint"),
        ).alias("jstar")
    )
    o2 = o.crossJoin(F.broadcast(js))
    pj = o2.agg(
        F.coalesce(
            F.max(
                F.when(F.col("rk") == F.col("jstar"), F.col("pre"))
            ),
            F.lit(0).cast("bigint"),
        ).alias("pre_star")
    )
    full = o2.crossJoin(F.broadcast(pj))
    lvl = F.when(F.col("jstar") == F.col("k"), F.lit(0)).otherwise(
        F.expr("(b - pre_star) div (k - jstar)")
    )
    rem = F.when(F.col("jstar") == F.col("k"), F.lit(0)).otherwise(
        (F.col("b") - F.col("pre_star")) % (F.col("k") - F.col("jstar"))
    )
    return (
        full.withColumn("lvl", lvl)
        .withColumn("rem", rem)
        .select(
            "source",
            "lang",
            F.col("n").alias("n_tokens"),
            F.when(F.col("rk") <= F.col("jstar"), F.col("n"))
            .otherwise(
                F.col("lvl")
                + F.when(
                    F.col("rk") - F.col("jstar") <= F.col("rem"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_tokens"),
            F.when(F.col("rk") <= F.col("jstar"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("saturated"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# P17 — DEDUP-AWARE mixing weights (round-12 surface, library-first;
# the @query registration is one decorator away). P5 mixes by
# hand-assigned source weights; production corpus assembly derives the
# weight from the data: sources whose segments are heavily SHARED
# across documents (boilerplate, mirrored content) get down-weighted
# so the mix does not over-sample duplicated mass. Per source:
# boilerplate fraction = occurrences of globally multi-document
# 8-word segments / total segment occurrences, in integer permille;
# keep_permille = 1000 - 500 * fraction (up to a 50% down-weight),
# then P5's value-pure md5 draw — fully replayable in SQL.
#
# Scale shape: one (seg -> distinct doc count) aggregation (the d7/d11
# inverted-index shuffle, no pair join at all), one broadcast of the
# per-source 20-row weight table, one narrow filter. The draw is a
# pure function of (salt, doc_id): partitioning- and order-independent.
# --------------------------------------------------------------------------
P17_SALT = "mix"  # p5's salt: the SAME draw, different weight source

P17_ORACLE = """
    WITH d AS (SELECT doc_id, source, n_chars,
                      string_split(trim(text), ' ') AS w
               FROM documents),
    segs AS (
      SELECT doc_id, source,
             unnest(list_transform(
               generate_series(0,
                 CAST(ceil(len(w) / 8.0) AS BIGINT) - 1),
               i -> array_to_string(list_slice(w, i*8+1, i*8+8), ' ')))
               AS seg
      FROM d),
    g AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg),
    occ AS (
      SELECT s.source,
             count(*) AS total_occ,
             sum(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS dup_occ
      FROM segs s JOIN g ON s.seg = g.seg
      GROUP BY s.source),
    wts AS (
      SELECT source, total_occ, dup_occ,
             1000 - (500 * dup_occ) // total_occ AS keep_permille
      FROM occ),
    kept AS (
      SELECT d.source, d.doc_id, d.n_chars, w.keep_permille,
             w.total_occ, w.dup_occ
      FROM d JOIN wts w ON d.source = w.source
      WHERE CAST(('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)),
                                 1, 4)) AS BIGINT) % 1000
            < w.keep_permille)
    SELECT source,
           CAST(any_value(total_occ) AS BIGINT) AS total_occ,
           CAST(any_value(dup_occ) AS BIGINT) AS dup_occ,
           CAST(any_value(keep_permille) AS BIGINT) AS keep_permille,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM kept GROUP BY source ORDER BY source
"""


@query("p17_dedup_aware_mix", oracle=P17_ORACLE)
def p17_dedup_aware_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 (banked): per-source keep rates derived from cross-document
    segment duplication, applied via the p5 md5 draw — a segmentation
    slip, an occurrence counted once instead of per duplicate, an
    integer-division drift in the permille, or a draw-boundary flip
    changes the hash."""
    d = spread(load_table(spark, sf_dir, "documents"))
    w = F.split(F.trim(F.col("text")), " ")
    seg_expr = (
        "transform(sequence(0, cast(ceil(size(w) / 8.0) as int) - 1),"
        " i -> array_join(slice(w, i * 8 + 1, 8), ' '))"
    )
    segs = d.select(
        "doc_id", "source", w.alias("w")
    ).select("doc_id", "source", F.explode(F.expr(seg_expr)).alias("seg"))
    g = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("nd"))
    occ = (
        segs.join(g, "seg")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_occ"),
            F.sum((F.col("nd") > 1).cast("bigint")).alias("dup_occ"),
        )
    )
    wts = occ.withColumn(
        "keep_permille",
        F.lit(1000)
        - F.expr("(500 * dup_occ) DIV total_occ").cast("bigint"),
    )
    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(P17_SALT), F.col("doc_id").cast("string")
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    kept = d.join(F.broadcast(wts), "source").filter(
        draw < F.col("keep_permille")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.first("total_occ").alias("total_occ"),
            F.first("dup_occ").alias("dup_occ"),
            F.first("keep_permille").alias("keep_permille"),
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# P18 — TEMPERATURE-SCALED language mixing (round-13 surface,
# library-first; the @query registration is one decorator away). The
# multilingual-corpus sampling law (mBERT/XLM-R's alpha-scaling):
# flatten the language distribution by keeping lang L with rate
# proportional to (n_min / n_L)^(1 - alpha), alpha = 0.5 — the
# smallest language keeps everything, larger ones are downsampled
# toward sqrt-flattened balance. Rates are derived from the corpus
# itself (one 5-row count), and the per-row draw is the p5 value-pure
# md5 — deterministic, partitioning-independent, SQL-replayable.
#
# DETERMINISM NOTE: the rate is floor(1000 * sqrt(n_min / n_L)) —
# sqrt and double division are IEEE correctly-rounded, so the permille
# thresholds are bit-identical in any engine; round() at a .5
# boundary would not be.
#
# Scale shape: one tiny count agg (broadcast back as a 5-row join) +
# a narrow per-row filter — no data-sized shuffle.
# --------------------------------------------------------------------------
P18_SALT = "temp"

P18_ORACLE = f"""
    WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    lo AS (SELECT min(n_docs) AS n_min FROM n),
    rate AS (
      SELECT lang, n_docs,
             CAST(floor(1000 * sqrt(n_min * 1.0 / n_docs)) AS BIGINT)
               AS keep_permille
      FROM n, lo),
    kept AS (
      SELECT d.lang, d.n_chars, r.keep_permille, r.n_docs
      FROM documents d JOIN rate r ON d.lang = r.lang
      WHERE CAST(('0x' || substr(md5('{P18_SALT}' ||
                                     CAST(d.doc_id AS VARCHAR)), 1, 4))
                 AS BIGINT) % 1000 < r.keep_permille)
    SELECT lang, any_value(keep_permille) AS keep_permille,
           any_value(n_docs) AS n_before,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM kept GROUP BY lang ORDER BY lang
"""


@query("p18_temperature_mix", oracle=P18_ORACLE)
def p18_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18 (banked): per-lang survivors under sqrt-temperature
    sampling — a rate computed against the wrong extreme, a round
    instead of floor, or a draw-salt drift flips the hash."""
    d = spread(load_table(spark, sf_dir, "documents"))
    n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = n.agg(F.min("n_docs")).collect()[0][0]
    rate = n.select(
        "lang",
        "n_docs",
        F.floor(
            1000 * F.sqrt(F.lit(float(n_min)) / F.col("n_docs"))
        ).cast("bigint").alias("keep_permille"),
    )
    h = F.substring(
        F.md5(F.concat(F.lit(P18_SALT), F.col("doc_id").cast("string"))),
        1,
        4,
    )
    draw = F.conv(h, 16, 10).cast("bigint") % 1000
    kept = d.join(F.broadcast(rate), "lang").filter(
        draw < F.col("keep_permille")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.first("keep_permille").alias("keep_permille"),
            F.first("n_docs").alias("n_before"),
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# P19 — per-source top-k quality selection (round-14 surface,
# library-first; the @query registration is one decorator away). The
# "take the best K documents from every source" curation verb — the
# greedy head of a quality curriculum (p13 buckets by quality; this
# SELECTS by it). Ranking key is the ROUNDED t2 quality score (both
# engines compute the identical 4-decimal value — t2's driver hash
# proves it every round), ties broken by doc_id, so the selection is
# engine-exact with no float-order sensitivity.
#
# Scale: one window partitioned by source over a projected (source,
# quality, doc_id) frame — the sort is per-source and the payload is
# three scalars per doc; the text column never reaches the shuffle.
# --------------------------------------------------------------------------
P19_TOP_K = 3


def p19_source_topk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19 (banked): per-source top-3 docs by rounded quality — a
    quality-formula drift, an unrounded rank key, or a tie broken
    away from lowest-doc_id flips the hash."""
    from pyspark.sql.window import Window

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        _quality_expr,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "source", "doc_id", _quality_expr().alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= P19_TOP_K)
        .select("source", "rank", "doc_id", "quality")
        .orderBy("source", "rank")
    )


def _p19_oracle() -> str:
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        QUALITY_SQL,
    )

    return f"""
    WITH d AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS w
      FROM documents),
    s AS (SELECT doc_id, source, {QUALITY_SQL} AS quality FROM d),
    r AS (
      SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rank
      FROM s)
    SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, quality
    FROM r WHERE rank <= {P19_TOP_K}
    ORDER BY source, rank
    """


P19_ORACLE = _p19_oracle()
