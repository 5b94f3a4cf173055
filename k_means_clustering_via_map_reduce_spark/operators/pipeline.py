"""P2 — the composed corpus-curation pipeline: what a training-data prep
job actually runs, end-to-end, as ONE declarative DAG.

    quality-score → filter → exact dedup → near-dup cluster removal
    (keep canonical) → deterministic train/val split → per-(lang, split)
    corpus stats

Every stage reuses an already-oracled operator (t2 quality expression,
q17-style exact dedup, d1b capped-jaccard pairs, d5 connected
components, p1-style value-hash split), so the whole composition gets a
single DuckDB oracle that replays the identical computation — the proof
that the engine's operators COMPOSE, not just run in isolation.

Scale shape (100 TB): every stage is linear — narrow quality projection,
one text-keyed shuffle for exact dedup, the capped inverted-index join
for near-dup pairs (posting cap bounds hot-shingle blow-up, measured in
BASELINE.md §scale), CC iterations bounded by near-dup cluster diameter
(loud failure otherwise), and a value-pure md5 split with no shuffle at
all. Nothing in the DAG materializes a quadratic intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k_means_clustering_via_map_reduce_spark.functions.text import shingles, tokens
from k_means_clustering_via_map_reduce_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    connected_components,
    jaccard_pairs_capped,
)
from k_means_clustering_via_map_reduce_spark.operators.text import (
    STOPWORDS,
    _quality_expr,
)
from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table, spread

CURATION_QUALITY_MIN = 0.78
CURATION_POSTING_CAP = 100_000  # never binds on fixtures; the 100 TB guard
CURATION_SPLIT_SALT = "kmce"

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def split_col(doc_id: F.Column) -> F.Column:
    """Deterministic 14/16 train split from the first hex char of
    md5(salt || doc_id) — a pure function of the row's key, identical in
    any engine with md5 (which is how the oracle replays it), independent
    of partitioning and cluster size."""
    h = F.substring(
        F.md5(F.concat(F.lit(CURATION_SPLIT_SALT), doc_id.cast("string"))), 1, 1
    )
    return F.when(h < F.lit("e"), F.lit("train")).otherwise(F.lit("val"))


def curate(docs: DataFrame) -> DataFrame:
    """The curation DAG over a ``documents``-shaped frame, returning the
    kept rows with (doc_id, lang, text, quality, split)."""
    scored = docs.select(
        "doc_id", "lang", "text", _quality_expr().alias("quality")
    )
    kept = scored.filter(F.col("quality") >= CURATION_QUALITY_MIN)
    # Exact dedup: lowest doc_id per exact text survives (q17 semantics).
    w = Window.partitionBy("text").orderBy("doc_id")
    exact = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # Materialized once: both the pair-generation branch and the
        # final canonical join consume it; without this the scan +
        # quality + dedup window would run twice (at 100 TB this
        # boundary would be a durable checkpoint between pipeline
        # stages).
        .localCheckpoint(eager=False)
    )
    # Near-dup clusters among the survivors; drop everything but the
    # canonical (minimum doc_id) member of each cluster.
    sh = exact.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    pairs = jaccard_pairs_capped(
        sh,
        threshold=JACCARD_THRESHOLD,
        posting_cap=CURATION_POSTING_CAP,
        # connected components consumes the pairs order-insensitively;
        # the default global sort is a pure barrier here
        ordered=False,
    ).select("a_id", "b_id")
    comp = connected_components(pairs)
    non_canonical = comp.filter(F.col("id") != F.col("label")).select(
        F.col("id").alias("doc_id")
    )
    canonical = exact.join(non_canonical, "doc_id", "left_anti")
    return canonical.withColumn("split", split_col(F.col("doc_id")))


@query(
    "p2_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, lang, text, string_split(trim(text), ' ') AS w
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text, w,
             round(0.5 * least(1.0, len(w) / 30.0)
                   + 0.3 * (len(list_distinct(w)) * 1.0 / len(w))
                   + 0.2 * (1.0 - len(list_filter(w, t -> t IN ({_STOP_SQL}))) * 1.0 / len(w)),
                   4) AS quality
      FROM d
    ),
    kept AS (SELECT * FROM scored WHERE quality >= {CURATION_QUALITY_MIN}),
    exact AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    ),
    s AS (
      SELECT doc_id, lang,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' ')))
             ELSE [array_to_string(w, ' ')] END AS sh
      FROM exact
    ),
    p AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 1.0
            / len(list_distinct(a.sh || b.sh)) >= {JACCARD_THRESHOLD}
    ),
    e AS (
      SELECT a_id AS x, b_id AS y FROM p
      UNION SELECT b_id, a_id FROM p
    ),
    reach(x, y) AS (
      SELECT x, y FROM e
      UNION
      SELECT r.x, e.y FROM reach r JOIN e ON r.y = e.x
    ),
    lbl AS (
      SELECT x AS doc_id, least(x, min(y)) AS label FROM reach GROUP BY x
    ),
    canon AS (
      SELECT k.* FROM exact k LEFT JOIN lbl ON k.doc_id = lbl.doc_id
      WHERE lbl.doc_id IS NULL OR lbl.label = k.doc_id
    ),
    sp AS (
      SELECT *,
             CASE WHEN substr(md5('{CURATION_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                  THEN 'train' ELSE 'val' END AS split
      FROM canon
    )
    SELECT lang, split, count(*) AS n_docs,
           CAST(sum(len(w)) AS BIGINT) AS total_tokens,
           round(avg(quality), 4) AS avg_quality
    FROM sp GROUP BY lang, split ORDER BY lang, split
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: the full curation DAG with per-(lang, split) corpus stats,
    hash-checked against a DuckDB oracle that replays every stage."""
    d = spread(load_table(spark, sf_dir, "documents"))
    out = curate(d)
    return (
        out.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.col("text"))))
            .cast("bigint")
            .alias("total_tokens"),
            r4(F.avg("quality")).alias("avg_quality"),
        )
        .orderBy("lang", "split")
    )
