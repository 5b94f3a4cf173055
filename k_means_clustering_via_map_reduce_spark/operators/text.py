"""Text-analysis operators for a training-data pipeline: token stats,
quality scoring, language-ID heuristic, document fingerprinting.

All four are pure JVM-side expressions (no Python UDFs) over the
``documents`` table, each with an exact DuckDB oracle. At 100 TB these are
narrow per-row projections — no shuffle except the final presentation
sort, which a pipeline deployment would drop.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint inference
# cannot resolve function-local aliases under `from __future__ import
# annotations` (stringified hints)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.functions.text import (
    min_shingle_md5_fingerprint,
    tokens,
)
from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table, spread

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# Marker tokens per language for the n-gram language-ID heuristic.
# (The fixture corpus is synthetic shared-vocabulary text, so the point is
# deterministic pipeline shape, not linguistic accuracy.)
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "que"),
    "fr": ("le", "les", "et"),
}


@query(
    "t1_token_stats",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(len(w) AS BIGINT)                 AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT)  AS n_distinct,
           round(len(list_distinct(w)) * 1.0 / len(w), 4) AS ttr
    FROM d ORDER BY doc_id
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct count, type-token
    ratio."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        r4(F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
    ).orderBy("doc_id")


def _quality_expr():
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return r4(
        0.5 * F.least(F.lit(1.0), n_tok / 30.0)
        + 0.3 * (n_dist / n_tok)
        + 0.2 * (1.0 - n_stop / n_tok)
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

# The DuckDB replay of _quality_expr over a token-list column ``w`` —
# single source of truth for every oracle that re-scores quality (t2
# here, p4's per-source quota, p2's pipeline keeps its own inlined copy
# only because its CTE chain threads extra columns).
QUALITY_SQL = f"""round(0.5 * least(1.0, len(w) / 30.0)
                 + 0.3 * (len(list_distinct(w)) * 1.0 / len(w))
                 + 0.2 * (1.0 - len(list_filter(w, t -> t IN ({_STOP_SQL}))) * 1.0 / len(w)),
                 4)"""


@query(
    "t2_quality_score",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
    SELECT doc_id, {QUALITY_SQL} AS quality
    FROM d ORDER BY doc_id
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation + lexical diversity
    + inverse stopword density, in [0, 1]."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", _quality_expr().alias("quality")).orderBy("doc_id")


def _marker_count(markers: tuple[str, ...]):
    # NB: a `lambda t, m=markers:` default-arg closure would change the
    # lambda's arity — PySpark would pass the array index as `m`.
    def pred(t):
        return t.isin(*markers)

    return pred


def _lang_scores():
    toks = tokens(F.col("text"))
    return {
        lang: F.size(F.filter(toks, _marker_count(markers))).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }


@query(
    "t3_lang_id",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    s AS (SELECT doc_id,
           CAST(len(list_filter(w, t -> t IN ('the','a','of')))   AS BIGINT) AS en_score,
           CAST(len(list_filter(w, t -> t IN ('der','die','und'))) AS BIGINT) AS de_score,
           CAST(len(list_filter(w, t -> t IN ('el','la','que')))  AS BIGINT) AS es_score,
           CAST(len(list_filter(w, t -> t IN ('le','les','et')))  AS BIGINT) AS fr_score
    FROM d)
    SELECT doc_id, en_score, de_score, es_score, fr_score,
           CASE WHEN en_score >= greatest(de_score, es_score, fr_score) THEN 'en'
                WHEN de_score >= greatest(es_score, fr_score) THEN 'de'
                WHEN es_score >= fr_score THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM s ORDER BY doc_id
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with a deterministic en>de>es>fr
    tie-break."""
    d = spread(load_table(spark, sf_dir, "documents"))
    scores = _lang_scores()
    scored = d.select("doc_id", *[c.alias(f"{lang}_score") for lang, c in scores.items()])
    en, de, es, fr = (F.col(f"{lg}_score") for lg in ("en", "de", "es", "fr"))
    return scored.withColumn(
        "predicted_lang",
        F.when(en >= F.greatest(de, es, fr), "en")
        .when(de >= F.greatest(es, fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr"),
    ).orderBy("doc_id")


@query(
    "t4_fingerprint",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
    SELECT doc_id,
           CASE WHEN len(w) >= 5 THEN
             list_min(list_transform(generate_series(1, len(w) - 4),
                      i -> md5(array_to_string(w[i:i+4], ' '))))
           ELSE md5(array_to_string(w, ' ')) END AS fingerprint
    FROM d ORDER BY doc_id
    """,
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-md5 over 5-word shingles: a 1-permutation MinHash usable as a
    rolling-hash-style near-dup blocking key."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        min_shingle_md5_fingerprint(F.col("text"), 5).alias("fingerprint"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T6 — TF-IDF top terms per document.
# --------------------------------------------------------------------------
TFIDF_TOP_N = 3


@query(
    "t6_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs / df.df) AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(n.n_docs / df.df) DESC, tf.term ASC
             ) AS rnk
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
           round(score, 4) AS score
    FROM scored WHERE rnk <= {TFIDF_TOP_N}
    ORDER BY doc_id, rnk
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (idf = ln(N/df), raw tf; ties
    break alphabetically).

    Scale shape: explode to (doc, term) postings; tf is one hash agg on
    (doc_id, term); df is one on term; the idf join keys on term (high
    cardinality — data-sized parallelism); top-N per doc is a window on
    doc_id. All shuffle volume is postings-linear — the inverted-index
    pattern again, this time for scoring rather than pairing.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # N as a broadcast 1-row aggregate inside the SAME job — a driver-side
    # d.count() would pay one extra full scan and a separate action.
    n = d.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias(
                "score"
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_N)
        .select(
            "doc_id",
            F.col("rnk").cast("bigint").alias("rnk"),
            "term",
            r4(F.col("score")).alias("score"),
        )
        .orderBy("doc_id", "rnk")
    )


# --------------------------------------------------------------------------
# T7 — BPE-ish token counting (subword-proxy statistics for budgeting
# training tokens, vs plain whitespace words).
# --------------------------------------------------------------------------
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@query(
    "t7_bpeish_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '{BPEISH_PATTERN}'))
             AS BIGINT) AS n_bpeish,
           round(len(regexp_extract_all(text, '{BPEISH_PATTERN}')) * 1.0
                 / len(string_split(trim(text), ' ')), 4) AS tokens_per_word
    FROM documents ORDER BY doc_id
    """,
)
def bpeish_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace words vs a BPE-ish regex token count (letter runs,
    single digits, single punctuation — the GPT-2 pre-tokenizer shape
    without the vocabulary). The count, not the split, is what a
    token-budget estimator needs; the regex stays in the class both
    Java and RE2 dialects treat identically."""
    d = spread(load_table(spark, sf_dir, "documents"))
    words = tokens(F.col("text"))
    # NB: Spark SQL processes backslash escapes in plain string literals
    # ('\\s' would become 's'); the R'...' raw literal keeps the regex
    # identical to DuckDB's escape-free single-quoted string.
    bpeish = F.expr(f"regexp_extract_all(text, R'{BPEISH_PATTERN}', 0)")
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(bpeish).cast("bigint").alias("n_bpeish"),
        r4(F.size(bpeish) / F.size(words)).alias("tokens_per_word"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T8 — grouped-map extension point (applyInPandas): per-language z-score
# normalization of document length.
# --------------------------------------------------------------------------
@query(
    "t8_zscore_by_lang",
    # length() (characters) on both sides — strlen() is BYTES in DuckDB
    # and would diverge from Spark's F.length on any non-ASCII text.
    oracle="""
    SELECT doc_id, lang,
           round((length(text) - avg(length(text)) OVER (PARTITION BY lang))
                 / stddev_samp(length(text)) OVER (PARTITION BY lang),
                 4) AS z_len
    FROM documents ORDER BY doc_id
    """,
)
def zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via ``applyInPandas`` — the grouped-map
    UDF extension point (one Arrow batch per group, full-group numpy
    vectorization). Expressible as window functions too (the oracle
    does exactly that); the point here is the operator shape a custom
    per-group transform (feature scaling, per-source calibration) needs
    when it is NOT window-expressible. Shuffle: one hash partition by
    the group key; each group must fit one executor's memory — for hot
    groups, pre-aggregate or salt instead."""
    import pandas as pdd

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", F.length("text").alias("n_len")
    )

    def zscore(pdf: pdd.DataFrame) -> pdd.DataFrame:
        # Emit z UNROUNDED: pandas .round() is half-even (banker's) while
        # the engine's r4 / the oracle's round() are half-away-from-zero,
        # so rounding parity lives on the Spark side.
        x = pdf["n_len"].astype("float64")
        z = (x - x.mean()) / x.std(ddof=1)
        return pdd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z_len": z,
            }
        )

    return (
        d.groupBy("lang")
        .applyInPandas(zscore, schema="doc_id BIGINT, lang STRING, z_len DOUBLE")
        # A 1-doc group has stddev NaN in pandas but NULL in SQL — map it.
        .select(
            "doc_id",
            "lang",
            r4(F.nanvl(F.col("z_len"), F.lit(None).cast("double"))).alias(
                "z_len"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T9 — benchmark decontamination: training docs that leak eval n-grams.
# --------------------------------------------------------------------------
# Real pipelines use 8-13-gram overlap; the synthetic fixtures draw from
# a ~30-word vocabulary, so 3-grams are the scale-equivalent collision
# rate (5-grams leak exactly one doc at sf0.01 — vacuous as a check).
DECONTAM_NGRAM = 3
DECONTAM_EVAL_MOD = 97  # doc_id % 97 == 0 → the held-out "benchmark" set


@query(
    "t9_decontaminate",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {DECONTAM_NGRAM} THEN
               list_distinct(list_transform(
                 generate_series(1, len(w) - {DECONTAM_NGRAM - 1}),
                 i -> array_to_string(w[i:i+{DECONTAM_NGRAM - 1}], ' ')))
             ELSE [array_to_string(w, ' ')] END AS grams
      FROM d
    ),
    eval_grams AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g
      WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
    ),
    hits AS (
      SELECT t.doc_id, count(DISTINCT gram) AS n_leaked
      FROM g t, unnest(t.grams) AS u(gram)
      WHERE t.doc_id % {DECONTAM_EVAL_MOD} <> 0
        AND gram IN (SELECT gram FROM eval_grams)
      GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(n_leaked AS BIGINT) AS n_leaked
    FROM hits ORDER BY doc_id
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: train/eval decontamination — flag training documents sharing
    any word ``DECONTAM_NGRAM``-gram with the held-out benchmark slice
    (``doc_id % DECONTAM_EVAL_MOD == 0``), with the leaked-gram count.

    Scale shape: real benchmark suites are MBs against a 100 TB corpus,
    so the eval gram set BROADCASTS — the corpus side is one narrow
    explode → broadcast-hash semi-match → partial-agg count per doc.
    The corpus is never shuffled on the gram key; the only exchange is
    the per-doc count aggregation."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from pyspark.sql.functions import broadcast

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", shingles(F.col("text"), DECONTAM_NGRAM).alias("grams")
    )
    is_eval = F.col("doc_id") % DECONTAM_EVAL_MOD == 0
    eval_grams = (
        d.filter(is_eval)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corpus = d.filter(~is_eval).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    # Plain count, not count_distinct: each doc's gram list is already
    # distinct (shingles() dedups) and the broadcast side is distinct,
    # so every surviving (doc_id, gram) row is unique — count_distinct
    # would add a second exchange keyed on (doc_id, gram) for nothing.
    return (
        corpus.join(broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T10 — repetition scoring (Gopher-style repetition filters).
# --------------------------------------------------------------------------
@query(
    "t10_repetition",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    tok AS (
      SELECT doc_id, len(w) AS n_tokens, unnest(w) AS tok FROM d
    ),
    freq AS (
      SELECT doc_id, max(n_tokens) AS n_tokens, max(cnt) AS max_cnt
      FROM (SELECT doc_id, n_tokens, tok, count(*) AS cnt
            FROM tok GROUP BY doc_id, n_tokens, tok)
      GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 0 END AS n_tri,
             CASE WHEN len(w) >= 3 THEN
               len(list_distinct(list_transform(
                 generate_series(1, len(w) - 2),
                 i -> array_to_string(w[i:i+2], ' '))))
             ELSE 0 END AS n_tri_distinct
      FROM d
    )
    SELECT f.doc_id,
           round(f.max_cnt * 1.0 / f.n_tokens, 4) AS top_tok_frac,
           round(CASE WHEN t.n_tri > 0
                      THEN 1.0 - t.n_tri_distinct * 1.0 / t.n_tri
                      ELSE 0.0 END, 4) AS dup_trigram_frac
    FROM freq f JOIN tri t ON f.doc_id = t.doc_id
    ORDER BY f.doc_id
    """,
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: intra-document repetition signals, the Gopher-rule family —
    most-frequent-token fraction and duplicate-trigram fraction.

    Scale shape: the trigram fraction is a narrow per-row array
    expression (no shuffle); the token-mode needs one (doc_id, token)
    hash agg whose partial aggregation collapses each doc's counts
    map-side, then a per-doc max — both keyed aggs, both linear."""
    from k_means_clustering_via_map_reduce_spark.functions.text import tokens

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", tokens(F.col("text")).alias("w")
    )
    n_tok = F.size("w")
    # Duplicate-trigram fraction: array-local, no shuffle.
    tri_total = F.when(n_tok >= 3, n_tok - 2).otherwise(F.lit(0))
    tri_grams = F.transform(
        F.sequence(F.lit(1), n_tok - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 3)),
    )
    tri = d.select(
        "doc_id",
        tri_total.alias("n_tri"),
        F.when(n_tok >= 3, F.size(F.array_distinct(tri_grams)))
        .otherwise(F.lit(0))
        .alias("n_tri_distinct"),
    )
    # Most-frequent-token fraction: two keyed aggs with map-side combine.
    freq = (
        d.select("doc_id", n_tok.alias("n_tokens"), F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.max("n_tokens").alias("n_tokens"), F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("n_tokens").alias("n_tokens"), F.max("cnt").alias("max_cnt"))
    )
    return (
        freq.join(tri, "doc_id")
        .select(
            "doc_id",
            r4(F.col("max_cnt") / F.col("n_tokens")).alias("top_tok_frac"),
            r4(
                F.when(
                    F.col("n_tri") > 0,
                    1.0 - F.col("n_tri_distinct") / F.col("n_tri"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_trigram_frac"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T11 — PII redaction (regex scrub of emails / phone numbers).
# --------------------------------------------------------------------------
# Dialect-portable patterns: no backreferences or lookaround, so Java
# regex (Spark) and RE2 (DuckDB) match identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d[\d ]{6,}\d"


@query(
    "t11_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call +1 555 0' || CAST(doc_id AS VARCHAR)
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{PII_EMAIL}', '[EMAIL]', 'g'),
                              '{PII_PHONE}', '[PHONE]', 'g')) AS redacted_md5
    FROM synth ORDER BY doc_id
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: PII scrubbing — redact emails and phone numbers, count the
    redactions, and emit an md5 of the scrubbed text (hash-checkable
    without hauling full documents through the compare).

    The fixture corpus contains no organic PII, so a deterministic
    contact line derived from doc_id is appended first — the operator
    under test is the scrub itself, which the oracle replays verbatim.
    Scale shape: pure per-row JVM regex projection, no shuffle, no UDF;
    DuckDB needs the 'g' flag to match Spark's replace-all semantics."""
    d = spread(load_table(spark, sf_dir, "documents"))
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call +1 555 0"),
        F.col("doc_id").cast("string"),
    )
    t = d.select("doc_id", synth.alias("t"))
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PII_PHONE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.col("t"), PII_EMAIL, "[EMAIL]"),
                PII_PHONE,
                "[PHONE]",
            )
        ).alias("redacted_md5"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T12 — unigram log-probability scoring (perplexity-proxy quality filter:
# rank documents by how (un)likely their tokens are under the corpus's
# own unigram model — the relational core of CCNet-style LM filtering,
# with the corpus itself standing in for the external LM).
# --------------------------------------------------------------------------
@query(
    "t12_unigram_logprob",
    oracle="""
    WITH d AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM d GROUP BY doc_id, term),
    c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
    tot AS (SELECT sum(cnt) AS n FROM c),
    p AS (SELECT term, cnt * 1.0 / (SELECT n FROM tot) AS prob FROM c)
    SELECT tf.doc_id,
           round(sum(tf.tf * -ln(p.prob)) / sum(tf.tf), 4)
             AS avg_neg_logprob,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens
    FROM tf JOIN p USING (term)
    GROUP BY tf.doc_id ORDER BY tf.doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-probability per document under the corpus
    unigram distribution: low = templated/repetitive, high = rare-token
    noise — both tails are what a perplexity filter trims.

    Scale shape (t6's, tf-weighted): the exploded postings collapse to
    (doc, term, tf) rows FIRST — one agg with map-side combine — and
    everything downstream (corpus term counts, the probability lookup
    join, the per-doc weighted mean Σ tf·-ln p / Σ tf) runs over
    tf-distinct rows, never raw occurrences. The corpus total comes
    from the vocab-sized count table, not a second postings scan. On
    fixtures the vocab broadcasts; at open-web vocabulary sizes the
    lookup degrades gracefully to a hash join on term — shuffling
    distinct (doc, term) pairs, which on the repetitive documents this
    filter exists to catch is far fewer rows than occurrences."""
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = d.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cnts = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    tot = cnts.agg(F.sum("cnt").alias("n"))
    probs = cnts.crossJoin(F.broadcast(tot)).select(
        "term", (F.col("cnt") / F.col("n")).alias("prob")
    )
    return (
        tf.join(probs, "term")
        .groupBy("doc_id")
        .agg(
            r4(
                F.sum(F.col("tf") * -F.log("prob")) / F.sum("tf")
            ).alias("avg_neg_logprob"),
            F.sum("tf").cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T14 — Python UDTF extension point (SURVEY.md §2.2's third user-defined
# family, completing scalar pandas_udf (d3/s2), grouped-map
# applyInPandas (t8), and grouped-agg pandas UDF (t13)): a table
# function emitting one row per distinct within-document bigram, used
# through the SQL LATERAL join surface.
# --------------------------------------------------------------------------
BIGRAM_TOP_N = 20


def _bigram_udtf():
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string, n: bigint")
    class BigramCounts:
        """Yield (bigram, within-doc count) per input document, bigrams
        in lexical order (deterministic emission order, though nothing
        downstream depends on it)."""

        def eval(self, text: str):
            toks = text.strip().split(" ")
            c = Counter(
                " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
            )
            for bg, n in sorted(c.items()):
                yield bg, n

    return BigramCounts


@query(
    "t14_udtf_bigrams",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w
               FROM documents),
    bg AS (
      SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bigram
      FROM d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    )
    SELECT bigram,
           CAST(count(*) AS BIGINT)            AS total_n,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM bg GROUP BY bigram
    ORDER BY total_n DESC, bigram LIMIT {BIGRAM_TOP_N}
    """,
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-{BIGRAM_TOP_N} bigrams via a Python UDTF in a
    SQL LATERAL join — the user-defined TABLE function surface
    exercised end-to-end and oracled. The UDTF pre-counts bigrams
    per document, so the lateral output is (distinct bigrams per doc)
    rows, each carrying its count: the shuffle then aggregates
    sum(n) / count(*) per bigram with map-side combine.

    Scale note: a Python UDTF is the slow path by construction
    (row-at-a-time emission through the Python worker); the engine's
    own hot paths express the same dataflow as JVM explode +
    aggregation (t6, d7). This entry exists because the reference has
    NO user extension point at all (SURVEY.md §2.2) while a real
    engine must ship one — and its correctness contract (exact parity
    with the relational formulation) is what the oracle pins."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    spark.udtf.register("kmce_bigram_counts", _bigram_udtf())
    spread(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "kmce_t14_docs"
    )
    return spark.sql(
        f"""
        SELECT b.bigram,
               CAST(sum(b.n) AS BIGINT)             AS total_n,
               CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs
        FROM kmce_t14_docs d, LATERAL kmce_bigram_counts(d.text) b
        GROUP BY b.bigram
        ORDER BY total_n DESC, bigram LIMIT {BIGRAM_TOP_N}
        """
    )


# --------------------------------------------------------------------------
# T15 — Gopher-rule document filter (Rae et al., arXiv:2112.11446 §A1.1):
# the standard rule-based quality gate LM pipelines run BEFORE model-based
# scoring. Four of the paper's rules are live on these fixtures (word
# count bounds, mean-word-length bounds, >=2 distinct stopwords,
# repetition via type-token ratio); the symbol/bullet/ellipsis rules are
# identically-true on all-alphabetic synthetic text and are deliberately
# NOT declared (a rule that cannot fail pins nothing). All arithmetic is
# int-ratio division of identical operands on both engines, so the
# threshold compares are FP-exact — no boundary-flip risk.
# --------------------------------------------------------------------------
GOPHER_WC_MIN, GOPHER_WC_MAX = 20, 80
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 4.0, 10.0
GOPHER_MIN_STOP_KINDS = 2
GOPHER_TTR_MIN = 0.5


@query(
    "t15_gopher_rules",
    oracle=f"""
    WITH d AS (
      SELECT source, string_split(trim(text), ' ') AS w FROM documents
    ), f AS (
      SELECT source,
        (len(w) BETWEEN {GOPHER_WC_MIN} AND {GOPHER_WC_MAX}) AS r_wc,
        (list_sum(list_transform(w, t -> len(t))) * 1.0 / len(w)
           BETWEEN {GOPHER_MWL_MIN} AND {GOPHER_MWL_MAX}) AS r_mwl,
        (len(list_distinct(list_filter(w, t -> t IN ({_STOP_SQL}))))
           >= {GOPHER_MIN_STOP_KINDS}) AS r_stop,
        (len(list_distinct(w)) * 1.0 / len(w) >= {GOPHER_TTR_MIN}) AS r_ttr
      FROM d
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wordcount,
      CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_meanlen,
      CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords,
      CAST(sum(CASE WHEN r_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition,
      CAST(sum(CASE WHEN r_wc AND r_mwl AND r_stop AND r_ttr
               THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
    FROM f GROUP BY source ORDER BY source
    """,
)
def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: per-source pass counts for each live Gopher rule plus the
    conjunction — the rule-based curation gate as one narrow projection
    + one small aggregate.

    Scale: every rule is array-local inside a single codegen stage over
    the scan (no UDF, no shuffle); the only exchange carries
    (sources × 6 counters) of partial-agg state. At 100 TB this is a
    pure map-side pass — the same shape as t2, which model-based
    scoring would then rank within the survivors."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_len = sum_len * 1.0 / n_tok
    n_stop_kinds = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    )
    ttr = F.size(F.array_distinct(toks)) * 1.0 / n_tok
    r_wc = (n_tok >= GOPHER_WC_MIN) & (n_tok <= GOPHER_WC_MAX)
    r_mwl = (mean_len >= GOPHER_MWL_MIN) & (mean_len <= GOPHER_MWL_MAX)
    r_stop = n_stop_kinds >= GOPHER_MIN_STOP_KINDS
    r_ttr = ttr >= GOPHER_TTR_MIN

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return (
        d.select(
            "source",
            r_wc.alias("r_wc"),
            r_mwl.alias("r_mwl"),
            r_stop.alias("r_stop"),
            r_ttr.alias("r_ttr"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            cnt(F.col("r_wc")).alias("n_wordcount"),
            cnt(F.col("r_mwl")).alias("n_meanlen"),
            cnt(F.col("r_stop")).alias("n_stopwords"),
            cnt(F.col("r_ttr")).alias("n_repetition"),
            cnt(
                F.col("r_wc") & F.col("r_mwl") & F.col("r_stop") & F.col("r_ttr")
            ).alias("n_pass_all"),
        )
        .orderBy("source")
    )


@query(
    "t16_sql_udf_score",
    oracle="""
    WITH s AS (SELECT source,
      CASE WHEN lang = 'en' THEN round(ln(1 + n_chars) * 1.1, 6)
           ELSE round(ln(1 + n_chars), 6) END AS sc FROM documents)
    SELECT source, count(*) AS n_docs, round(sum(sc), 4) AS total_score,
           round(avg(sc), 4) AS avg_score
    FROM s GROUP BY source ORDER BY source
    """,
)
def sql_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16: declarative SQL scalar UDF (Spark 4.0 SQL UDFs,
    SPARK-46057) — `CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN
    expr` — applied to a per-document score, completing the
    user-defined family on its FAST side: unlike every Python-based
    extension point (t8 grouped-map, t13 grouped-agg, t14 UDTF), a SQL
    UDF is inlined by Catalyst into plain JVM expressions, so the
    aggregate below plans as partial_sum(CASE WHEN ...) inside
    whole-stage codegen with NO Python boundary (verified in
    tests/test_plans.py).

    This is the engine's recommended UDF tier for 100 TB: express the
    logic declaratively, get pushdown/codegen/partial-agg for free;
    drop to pandas UDFs only for genuinely procedural logic.

    The reference's hard-coded "query" has no user extension point at
    all (SURVEY.md §2.2 UDF row)."""
    spread(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "t16_documents"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION t16_doc_score(
          nc BIGINT, lang STRING)
        RETURNS DOUBLE
        RETURN CASE WHEN lang = 'en' THEN round(ln(1 + nc) * 1.1, 6)
                    ELSE round(ln(1 + nc), 6) END
        """
    )
    return spark.sql(
        """
        SELECT source, count(*) AS n_docs,
               round(sum(t16_doc_score(n_chars, lang)), 4) AS total_score,
               round(avg(t16_doc_score(n_chars, lang)), 4) AS avg_score
        FROM t16_documents GROUP BY source ORDER BY source
        """
    )


@query(
    "t17_url_parse",
    oracle="""
    WITH u AS (SELECT doc_id, source || '.example.com' AS host,
          '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
          n_chars AS q FROM documents)
    SELECT host, count(*) AS n_docs, CAST(sum(q) AS BIGINT) AS sum_q,
           min(path) AS min_path, max(path) AS max_path
    FROM u GROUP BY host ORDER BY host
    """,
)
def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17: URL component extraction with `parse_url` — the
    host/path/query-param decomposition every web-corpus pipeline runs
    before host-level dedup, domain mixing (p5's weights are per-host
    in practice), and robots/blocklist joins.

    URLs are synthesized in-query from document fields, so the oracle
    recomputes each component from the SAME fields directly — parse_url
    is thereby pinned against ground truth rather than against another
    parser's quirks. The query-param path exercises the
    (url, 'QUERY', key) three-argument form.

    Scale: parse_url is a narrow JVM projection (one codegen stage, no
    UDF); the host aggregate is the standard partial+final hash agg.
    At 100 TB host cardinality is millions — still a plain hash key,
    with d1b's posting-cap idiom available if one host dominates."""
    d = spread(load_table(spark, sf_dir, "documents"))
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("n_chars").cast("string"),
        F.lit("&s=1"),
    )
    return (
        d.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("q_param").cast("bigint")).alias("sum_q"),
            F.min("path").alias("min_path"),
            F.max("path").alias("max_path"),
        )
        .orderBy("host")
    )


@query(
    "t18_arrow_native_udf",
    oracle=r"""
    WITH t AS (SELECT source,
          len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
          length(text) AS n_chars2 FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars2) AS BIGINT) AS total_chars,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY source ORDER BY source
    """,
)
def arrow_native_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18: the ARROW-NATIVE extension point (`mapInArrow`) — the last
    face of the user-defined family (t8 grouped-map pandas, t13
    grouped-agg pandas, t14 UDTF, t16 SQL-inlined, here RecordBatch in
    → RecordBatch out with ALL compute in pyarrow.compute kernels).

    Versus a pandas UDF, nothing is ever materialized as Python
    objects or pandas blocks: batches stay Arrow end-to-end and the
    kernels (trim, regex split, list lengths) are C++ vectorized — the
    right tier when the logic IS expressible in Arrow kernels but not
    in Spark SQL functions. Both regex engines here are RE2 ('\\s+'
    behaves identically), and utf8_length matches DuckDB's
    codepoint-counting length.

    Scale: identical shape to every m-entry — Arrow-batched, narrow,
    no shuffle before the per-source aggregate."""
    import pyarrow as pa

    def tokenize(batches):
        import pyarrow.compute as pc

        for batch in batches:
            toks = pc.split_pattern_regex(
                pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("source"),
                    pc.list_value_length(toks).cast(pa.int64()),
                    pc.utf8_length(batch.column("text")).cast(pa.int64()),
                ],
                names=["source", "n_tokens", "n_chars2"],
            )

    d = spread(load_table(spark, sf_dir, "documents"))
    out = d.select("source", "text").mapInArrow(
        tokenize, schema="source STRING, n_tokens BIGINT, n_chars2 BIGINT"
    )
    return (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars2").alias("total_chars"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# T19 — n-gram CONTAINMENT (Broder's asymmetric near-dup measure):
# |grams(A) ∩ grams(B)| / |grams(A)|. Jaccard (d1) misses subset
# relationships — a paragraph quoted whole inside a 10× longer page
# scores near zero Jaccard but containment 1.0 in the A→B direction —
# so containment is the measure for quote/excerpt/superset detection,
# and it is DIRECTIONAL: both (a,b) orderings are emitted, normalized
# by each side's own shingle count.
# --------------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.8


@query(
    "t19_ngram_containment",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' ')))
             ELSE [array_to_string(w, ' ')] END AS sh
      FROM d
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 4)
             AS containment
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh)
          >= {CONTAINMENT_THRESHOLD}
    ORDER BY a_id, b_id
    """,
)
def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs ≥ {threshold} via the inverted
    index: explode shingles → equi-join postings on (lang, shingle) →
    count co-occurrences per ORDERED pair → normalize by the LEFT
    side's shingle count. The oracle brute-forces the within-lang cross
    space, so postings-blocking completeness sits under the hash.

    Scale: shuffle is the posting list (docs × shingles-per-doc,
    linear), keyed on the shingle — d1b's shape; the pair-count state
    only holds pairs that SHARE a gram. Containment needs no |A ∪ B|,
    so unlike Jaccard there is no union-size recomputation: one count
    plus one broadcast-sized n_sh lookup closes the score."""
    d = spread(load_table(spark, sf_dir, "documents"))
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )

    shingled = d.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    post = shingled.select(
        "doc_id", "lang", "n_sh", F.explode("sh").alias("g")
    )
    a, b = post.alias("a"), post.alias("b")
    common = (
        a.join(
            b,
            [
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.g") == F.col("b.g"),
                F.col("a.doc_id") != F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n_sh").alias("a_n"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.filter(
            F.col("n_common") * 1.0 / F.col("a_n") >= CONTAINMENT_THRESHOLD
        )
        .select(
            "a_id",
            "b_id",
            F.round(F.col("n_common") * 1.0 / F.col("a_n"), 4).alias(
                "containment"
            ),
        )
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# T20 — vocabulary profile per language: token count, type count,
# type-token ratio, hapax-legomenon fraction. The corpus-health signal
# a training-data pipeline watches for TEMPLATED/generated text (TTR
# collapses) and OCR noise or scrape garbage (hapax fraction spikes);
# Heaps'-law drift across snapshots is the standard monitoring use.
# --------------------------------------------------------------------------
@query(
    "t20_vocab_profile",
    oracle="""
    WITH w AS (
      SELECT lang, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    tf AS (SELECT lang, tok, count(*) AS n FROM w GROUP BY lang, tok)
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(count(*) * 1.0 / sum(n), 4) AS ttr,
           round(count(CASE WHEN n = 1 THEN 1 END) * 1.0 / count(*), 4)
             AS hapax_frac
    FROM tf GROUP BY lang ORDER BY lang
    """,
)
def vocab_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang vocabulary statistics over the token stream.

    Scale: one (lang, token)-keyed partial-agg exchange builds the term
    frequencies (map-side combine collapses repeated tokens before the
    shuffle — the shuffle carries the VOCABULARY, not the token
    stream), then a |langs|-row rollup. At 100 TB the vocabulary is
    the only large state and it is exactly what must be counted;
    nothing here is quadratic or driver-sided."""
    d = spread(load_table(spark, sf_dir, "documents"))
    w = d.select(
        "lang", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    tf = w.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.groupBy("lang")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.count(F.lit(1)) * 1.0 / F.sum("n"), 4).alias("ttr"),
            F.round(
                F.count(F.when(F.col("n") == 1, 1))
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("hapax_frac"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T21 — Zipf-slope corpus-health fit: least-squares slope of
# log(frequency) against log(rank) over each language's top-K head
# (natural text sits near -1; templated/generated text flattens toward
# 0, boilerplate floods steepen it). The regression-aggregate
# complement to t20's TTR/hapax monitor — the standard corpus-drift
# dashboard number, fit with the SQL regression aggregates so the
# whole computation stays JVM-side.
# --------------------------------------------------------------------------
ZIPF_HEAD_K = 500


@query(
    "t21_zipf_slope",
    oracle=f"""
    WITH w AS (
      SELECT lang, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    tf AS (SELECT lang, tok, count(*) AS n FROM w GROUP BY lang, tok),
    ranked AS (
      SELECT lang, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, tok ASC) AS rnk
      FROM tf)
    SELECT lang,
           round(regr_slope(ln(n), ln(rnk)), 4) AS zipf_slope,
           round(regr_r2(ln(n), ln(rnk)), 4) AS fit_r2,
           CAST(count(*) AS BIGINT) AS n_points
    FROM ranked WHERE rnk <= {ZIPF_HEAD_K}
    GROUP BY lang ORDER BY lang
    """,
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang Zipf fit over the top-{K} frequency head: slope, R²,
    and point count. Rank ties break by token so the rank assignment —
    and therefore the fit — is engine-exact; the log/regression
    arithmetic is plain double math rounded to 4 decimals on both
    sides.

    Scale: the (lang, token) partial agg is t20's vocabulary-sized
    shuffle; the rank window moves only per-lang vocabularies; the
    regression aggregates collapse the top-K head to 3 scalars per
    language map-side. Nothing data-sized reaches the driver."""
    d = spread(load_table(spark, sf_dir, "documents"))
    w = d.select(
        "lang", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    tf = w.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    win = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("tok").asc()
    )
    ranked = tf.withColumn("rnk", F.row_number().over(win)).filter(
        F.col("rnk") <= ZIPF_HEAD_K
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.round(F.expr("regr_slope(ln(n), ln(rnk))"), 4).alias(
                "zipf_slope"
            ),
            F.round(F.expr("regr_r2(ln(n), ln(rnk))"), 4).alias("fit_r2"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# BM25 full-text relevance scoring (round-7 surface, library-first).
# Implemented and pytest-pinned this round; the @query registration is
# DEFERRED to round 7 so the round-6 driver budget keeps landing on the
# stale verification tail (VERDICT r05 "Next round" #1 pacing rule).
# The reference has no text retrieval at all; this is the engine-side
# search face of the t19 inverted-index shape.
# --------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by Okapi BM25 against a bag of query terms.

    score(q, d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                        (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl)),
    idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)   (Lucene form,
    always positive). Whitespace tokenization, exact-match terms —
    the same token model as t19/t20, so the postings this builds are
    the ones the corpus already shuffles for dedup.

    Scale plan: the token explode is filtered to the QUERY TERMS
    IMMEDIATELY — the (doc, term) shuffle carries only matching
    postings (|q| terms × matching docs), never the corpus token
    stream; df/N/avgdl are one vocabulary-free broadcast-sized
    aggregate each (two scalar stats crossJoin-broadcast in, |q| df
    rows broadcast-join in — the t6/t12 scalar-total idiom); the
    final top-k is one global window over per-doc sums. No Python
    anywhere; ties break by doc_id so the rank is total.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("w"),
    ).withColumn("dl", F.size("w"))
    corpus_stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    post = (
        toks.select("doc_id", "dl", F.explode("w").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = post.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        post.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "t_score",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("t_score").alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        per_doc.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "doc_id",
            F.round("score", 4).alias("score"),
            "n_matched_terms",
        )
        .orderBy("rank")
    )


BM25_QUERY_TERMS = ["window", "merge", "join"]
BM25_TOPK = 25


@query(
    "t22_bm25_topk",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS w
               FROM documents),
    dl AS (SELECT doc_id, len(w) AS dl, w FROM d),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    post AS (SELECT doc_id, dl, unnest(w) AS term FROM dl),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM post
           WHERE term IN ('window', 'merge', 'join')
           GROUP BY doc_id, dl, term),
    dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
            GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                 * t.tf * (1.2 + 1)
                 / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avgdl)))
               AS score,
             CAST(count(*) AS BIGINT) AS n_matched_terms
      FROM tf t JOIN dft f USING (term) CROSS JOIN stats s
      GROUP BY t.doc_id),
    ranked AS (
      SELECT doc_id, score, n_matched_terms,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored)
    SELECT CAST(rank AS INT) AS rank, doc_id,
           round(score, 4) AS score, n_matched_terms
    FROM ranked WHERE rank <= 25 ORDER BY rank
    """,
)
def t22_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22: Okapi BM25 top-25 for a fixed 3-term query over the corpus
    — the retrieval face of the t19 inverted-index shape (the reference
    has no text search at all). The oracle recomputes the full scoring
    chain (Lucene idf, dl/avgdl normalization, per-doc sum, total-order
    rank) in ANSI SQL; a tokenization slip, an idf-form difference, or
    an unstable tie-break flips the hash. An independent pure-Python
    BM25 model, partitioning invariance, and the Python-free plan are
    pinned in tests/test_bm25.py; the flat-cost x16 disjoint-vocab
    scale curve is a BASELINE.md round-6 section.

    Scale: the token explode is filtered to the query terms before any
    shuffle, so the (doc, term) exchange carries |q|-term postings
    only; corpus stats and df ride in as broadcasts; top-k is one
    global window over per-doc sums (k rows, never the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERY_TERMS, k=BM25_TOPK)


# --------------------------------------------------------------------------
# T23 — LEARNED-merge BPE tokenizer (closes the "BPE-ish only" gap the
# round-6 review named: t7 counts subword-proxy regex tokens; this
# trains REAL byte-pair-encoding merges from corpus statistics and
# encodes with them).
#
# Architecture (the scalable split every production tokenizer trainer
# uses — HF tokenizers, subword-nmt, SentencePiece all train on a word
# HISTOGRAM, never on the raw corpus):
#   1. corpus → (word, freq) histogram: the ONLY corpus-sized shuffle,
#      a plain groupBy-count whose key space is the vocabulary;
#   2. merge training runs on the DRIVER over the histogram — BPE
#      training is inherently sequential (merge k+1 depends on the
#      state after merge k), and the histogram is vocab-sized (a KB-MB
#      artifact even for a 100 TB corpus, capped at BPE_VOCAB_CAP
#      heaviest words for a hard bound — the same K-row-collect
#      pattern as the K-Means centroid gather, kmeans.py O15);
#   3. encoding broadcasts the merge list (KBs) and runs as an
#      Arrow-batched pandas UDF — embarrassingly parallel, narrow,
#      with a per-batch word→len memo so each distinct word in a batch
#      is encoded once regardless of its frequency.
#
# Deterministic semantics (pinned so the independent reference
# implementation in tests/test_bpe.py can reproduce them exactly):
# words are [a-z0-9]+ runs of lower(text); a word's initial symbols
# are its characters plus a terminal '</w>'; pair counts sum word
# frequencies over ALL adjacent symbol pairs (overlaps counted); the
# winning pair maximizes (count, then lexicographically SMALLEST
# (left, right)); merges apply left-to-right non-overlapping. Applying
# the merge list once each, in rank order, is equivalent to
# lowest-rank-first encoding: a merge's pair is made of symbols that
# existed before its rank, and merging elsewhere only ever creates
# adjacencies involving the NEW symbol, so no earlier pair can
# reappear after its pass.
# --------------------------------------------------------------------------
BPE_WORD_RE = r"[a-z0-9]+"
BPE_N_MERGES = 24
BPE_VOCAB_CAP = 65536
BPE_END = "</w>"


def _bpe_merge_word(
    syms: list[str], left: str, right: str, merged: str
) -> list[str]:
    """One left-to-right non-overlapping merge pass over a symbol list."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = BPE_N_MERGES,
    vocab_cap: int = BPE_VOCAB_CAP,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the word histogram of
    ``docs.text``. Returns the rules in rank order.

    The histogram collect is bounded by ``vocab_cap`` heaviest words
    (ties broken by word, so the cap is deterministic); the coverage
    loss is the frequency mass of the dropped tail, which for Zipfian
    corpora (t21 measures this one's slope) is a vanishing fraction of
    tokens. Training cost is O(vocab × avg_word_len × n_merges) driver
    work — independent of corpus size."""
    hist_rows = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), R'{BPE_WORD_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(vocab_cap)
        .collect()
    )
    return train_merges_from_histogram(
        [(r["word"], int(r["freq"])) for r in hist_rows], n_merges
    )


def train_merges_from_histogram(
    hist: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The pure sequential training core over a (word, freq) histogram
    — factored Spark-free so the hypothesis property test can drive it
    against the independent reference on arbitrary corpora."""
    vocab: list[tuple[list[str], int]] = [
        (list(w) + [BPE_END], f) for w, f in hist
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        # max count; tie -> lexicographically smallest pair (total order)
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        vocab = [
            (_bpe_merge_word(syms, best[0], best[1], merged), freq)
            for syms, freq in vocab
        ]
    return merges


def bpe_encode_len(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of one word under the learned merges (rank order,
    one non-overlapping pass each — see the equivalence note above)."""
    syms = list(word) + [BPE_END]
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = _bpe_merge_word(syms, left, right, left + right)
    return len(syms)


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Per-document BPE token and word counts via an Arrow-batched
    pandas UDF. The merge list rides the closure (broadcast once per
    executor); a per-batch word→len memo collapses repeated words."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    word_re = _re.compile(BPE_WORD_RE)
    rules = list(merges)

    @pandas_udf("bigint")
    def n_bpe(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def doc_tokens(t) -> int:
            total = 0
            for w in word_re.findall((t or "").lower()):
                if w not in memo:
                    memo[w] = bpe_encode_len(w, rules)
                total += memo[w]
            return total

        return texts.map(doc_tokens)

    @pandas_udf("bigint")
    def n_words(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(word_re.findall((t or "").lower())))

    return docs.withColumn("n_bpe_tokens", n_bpe(F.col("text"))).withColumn(
        "n_words", n_words(F.col("text"))
    )


@query("t23_bpe_learned")
def t23_bpe_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23: train a real BPE tokenizer on the corpus (24 merges from
    the distributed word histogram), encode every document with it,
    and report per-language token economics: documents, words, BPE
    tokens, and the tokens-per-word fertility the merges bought.

    Rows-only by contract: merge training is an inherently iterative
    argmax loop no single SQL statement expresses. The full semantics
    are pinned instead by tests/test_bpe.py — an INDEPENDENT pure-
    Python reference (string-table implementation, separate code path)
    must reproduce both the merge list and every per-document token
    count — plus the sf0.001 golden digest in test_golden_hashes.py.

    Scale plan: one corpus→histogram shuffle (key space = vocabulary,
    partial-agg combines upstream), driver training on the vocab-sized
    histogram (the K-row-collect pattern), then a narrow Arrow-batched
    encode with a KB merge list in the closure and a 5-group final
    aggregate. Nothing pair-wise, nothing corpus-sized on the driver."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    merges = train_bpe_merges(spark, docs)
    enc = bpe_token_counts(docs.select("lang", "text"), merges)
    return (
        enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            r4(F.sum("n_bpe_tokens") / F.sum("n_words")).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T25 — encode with an EXTERNALLY-SUPPLIED merge list (round-8 surface).
# t23 proves train+encode as one pipeline; this is the other half of a
# production tokenizer lifecycle: the merges arrive as a pinned
# ARTIFACT (trained once, shipped like a tokenizer.json), and the
# engine must encode any corpus under them byte-exactly. T25_MERGES is
# the t23 trainer's output on the sf0.001 fixture, frozen here as that
# artifact (provenance pinned in tests/test_bpe.py).
#
# Unlike t23 (rows-only: TRAINING is an iterative argmax no SQL
# expresses), pure ENCODING is relationally expressible, so this entry
# is hash-verified: the oracle replays the whole merge loop in DuckDB
# with a recursive CTE over merge ranks. Each distinct word becomes a
# delimiter-wrapped symbol string ('|h||i||</w>|'); rank r's step
# rewrites '|a||b|' -> '|ab|' via replace(), whose left-to-right
# non-overlapping semantics on the WRAPPED form match
# _bpe_merge_word's single pass exactly (adjacent matches share no
# characters, so no boundary elision); the final token count is half
# the surviving delimiter count. A rank-order slip, an overlap bug, or
# an end-marker slip in either engine flips the hash.
#
# Scale: same plan as t23's encode half — broadcast-KB merge list,
# narrow Arrow-batched encode with per-batch word memoization, 5-group
# final aggregate; the oracle's recursive CTE is bounded by DISTINCT
# words × n_merges, the vocabulary-sized table every BPE stage here
# rides on.
# --------------------------------------------------------------------------
T25_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"),
    ("t", "</w>"), ("er", "</w>"), ("o", "w"), ("ow", "</w>"),
    ("l", "u"), ("i", "n"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("g", "</w>"), ("a", "s"), ("h", "</w>"),
    ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
]


def _t25_oracle(merges: list[tuple[str, str]]) -> str:
    rows = ", ".join(
        f"({i + 1}, '{left}', '{right}')"
        for i, (left, right) in enumerate(merges)
    )
    return f"""
    WITH RECURSIVE merges(mrank, ml, mr) AS (SELECT * FROM (VALUES {rows})),
    words AS (
      SELECT lang,
             unnest(regexp_extract_all(lower(text), '{BPE_WORD_RE}'))
               AS word
      FROM documents),
    dw AS (SELECT DISTINCT word FROM words),
    enc AS (
      SELECT word, 0 AS r,
             regexp_replace(word, '(.)', '|\\1|', 'g') || '|{BPE_END}|' AS s
      FROM dw
      UNION ALL
      SELECT e.word, e.r + 1,
             replace(e.s, '|' || m.ml || '||' || m.mr || '|',
                     '|' || m.ml || m.mr || '|')
      FROM enc e JOIN merges m ON m.mrank = e.r + 1),
    tok AS (
      SELECT word, (len(s) - len(replace(s, '|', ''))) // 2 AS n_tok
      FROM enc WHERE r = {len(merges)}),
    agg AS (
      SELECT w.lang,
             CAST(count(*) AS BIGINT) AS total_words,
             CAST(sum(t.n_tok) AS BIGINT) AS total_bpe_tokens,
             round(sum(t.n_tok) / (count(*) * 1.0), 4) AS tokens_per_word
      FROM words w JOIN tok t USING (word) GROUP BY w.lang),
    d AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang)
    SELECT d.lang, d.n_docs, a.total_words, a.total_bpe_tokens,
           a.tokens_per_word
    FROM d LEFT JOIN agg a USING (lang) ORDER BY d.lang
    """


T25_ORACLE = _t25_oracle(T25_MERGES)


@query("t25_bpe_encode_supplied", oracle=T25_ORACLE)
def t25_bpe_encode_supplied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25: encode the corpus under the externally-supplied T25_MERGES
    artifact and report per-language token economics — the serve half
    of the tokenizer lifecycle, hash-verified against a full relational
    replay of the merge loop (recursive CTE, see the section comment).

    Completes t23's round trip: t23 pins train+encode against the
    independent reference; this pins encode-under-a-given-artifact
    against a THIRD implementation (DuckDB string rewriting) with the
    driver's value hash as the judge."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    enc = bpe_token_counts(docs.select("lang", "text"), T25_MERGES)
    return (
        enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            r4(F.sum("n_bpe_tokens") / F.sum("n_words")).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T26 — bigram language-model quality scoring (round-9 surface,
# library-first per the new-entry budget pacing; the @query
# registration is one decorator away). The CCNet/KenLM idiom: train an
# n-gram LM on the corpus, score every document by its per-token
# negative log-likelihood, and filter the tail — the quality face
# t2/t15's rule-based scores approximate. Add-one-smoothed bigrams:
# p(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V), per-doc score =
# -sum(ln p) / n_pairs over adjacent token pairs.
#
# Fully relational, so SQL-oracled: counts are exact integers, the
# smoothing formula replays verbatim, and the one FP-summation-order
# hazard (a per-doc sum of ~dozens of ln terms) sits far inside the
# 4-decimal rounding that every avg()-bearing oracle here already
# rides on.
#
# Scale: training is ONE corpus->bigram-histogram shuffle (key space =
# seen bigrams, partial-agg combines upstream; a production corpus
# caps to the top-K bigrams exactly like the BPE vocab cap); scoring
# explodes adjacent pairs (narrow) and joins the vocabulary-sized
# count tables — broadcast when the vocab fits, plain shuffle joins
# otherwise; the per-doc aggregate is the only other exchange.
# --------------------------------------------------------------------------
T26_ORACLE = """
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents),
    pairs AS (
      -- generate_series cannot lateral-join a column in this DuckDB
      -- (the d11 oracle's workaround): build the pair list as a
      -- SCALAR list_transform and unnest the structs
      SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> struct_pack(w1 := w[i], w2 := w[i + 1])))
                 AS p
        FROM d WHERE len(w) >= 2)),
    uni AS (
      SELECT w1 AS w, count(*) AS cu FROM pairs GROUP BY w1),
    bi AS (
      SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2),
    v AS (
      SELECT count(DISTINCT tok) AS vocab
      FROM (SELECT unnest(w) AS tok FROM d)),
    scored AS (
      SELECT p.doc_id, p.lang,
             -ln((bi.cb + 1.0) / (uni.cu + v.vocab)) AS nll
      FROM pairs p
      JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
      JOIN uni ON uni.w = p.w1
      CROSS JOIN v)
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(nll) / count(*), 4) AS avg_nll
    FROM scored GROUP BY doc_id, lang ORDER BY doc_id
"""


@query("t26_bigram_lm_score", oracle=T26_ORACLE)
def t26_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26: per-document add-one-smoothed bigram negative
    log-likelihood — train and score in one relational plan, the
    oracle replaying counts, smoothing, and the per-doc mean exactly
    (a count slip, a vocabulary-size error, or an off-by-one in the
    smoothing flips the hash)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.split(F.trim(F.col("text")), " ")
    toks = docs.select("doc_id", "lang", w.alias("w")).filter(
        F.size("w") >= 2
    )
    pairs = toks.select(
        "doc_id",
        "lang",
        F.posexplode(F.expr("slice(w, 1, size(w) - 1)")).alias("i", "w1"),
        F.col("w"),
    ).select(
        "doc_id",
        "lang",
        "w1",
        F.expr("w[i + 1]").alias("w2"),
    )
    uni = pairs.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).alias("cu")
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    vocab = (
        docs.select(F.explode(w).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, pairs["w1"] == uni["w"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "nll",
            -F.log(
                (F.col("cb") + F.lit(1.0))
                / (F.col("cu") + F.col("vocab"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            r4(F.sum("nll") / F.count(F.lit(1))).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T27 — repetition-based quality filters (round-10 surface, library-
# first; the @query registration is one decorator away). The
# Gopher/MassiveText repetition rules, word-granular (the corpus has no
# line structure): a document dominated by one repeated n-gram, or with
# too few distinct words, is boilerplate/spam and leaves the training
# set. Two exact per-doc statistics plus the composed gate:
#
#   distinct_frac    = |distinct words| / |words|
#   top_bigram_frac  = max within-doc bigram count / (|words| - 1)
#   flagged          = top_bigram_frac >= 0.08 OR distinct_frac <= 0.40
#
# Scale: the whole computation is NARROW — split, array_distinct,
# sort-the-bigrams, one aggregate() lambda for the max run length —
# zero shuffles before the display orderBy, whole-stage codegen end to
# end. The d1-style explode+groupBy formulation would shuffle the
# corpus's full bigram stream; sorting WITHIN the row's array keeps the
# count local to the document, which is the only correct granularity
# anyway. Both sides compare the unrounded IEEE quotients (correctly
# rounded in every engine); rounding to 4dp is display-only.
# --------------------------------------------------------------------------
T27_TOP_BIGRAM_MAX = 0.08
T27_DISTINCT_MIN = 0.40

T27_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
    pairs AS (
      SELECT doc_id, p.w1 || ' ' || p.w2 AS bg
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 1),
                          i -> struct_pack(w1 := w[i], w2 := w[i + 1])))
                     AS p
            FROM d)),
    bgc AS (SELECT doc_id, bg, count(*) AS c FROM pairs
            GROUP BY doc_id, bg),
    top AS (SELECT doc_id, max(c) AS topc FROM bgc GROUP BY doc_id)
    SELECT d.doc_id, d.lang,
           CAST(len(w) AS BIGINT) AS n_words,
           round(len(list_distinct(w)) * 1.0 / len(w), 4)
             AS distinct_frac,
           round(t.topc * 1.0 / (len(w) - 1), 4) AS top_bigram_frac,
           (t.topc * 1.0 / (len(w) - 1) >= {T27_TOP_BIGRAM_MAX}
            OR len(list_distinct(w)) * 1.0 / len(w)
               <= {T27_DISTINCT_MIN}) AS flagged
    FROM d JOIN top t USING (doc_id)
    ORDER BY doc_id
"""


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc repetition statistics over a (doc_id, lang, text) frame
    — factored so tests can drive synthetic pathological documents."""
    w = F.split(F.trim(F.col("text")), " ")
    base = docs.select("doc_id", "lang", w.alias("w")).filter(
        F.size("w") >= 2
    )
    # max bigram multiplicity without leaving the row: build the bigram
    # array, sort it, and fold a (prev, run, best) accumulator — equal
    # bigrams are adjacent after the sort, so the longest run IS the
    # top count
    bg = F.expr(
        "array_sort(transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1))))"
    )
    top = F.expr(
        "aggregate(bg,"
        " struct(CAST(NULL AS STRING) AS prev, 0 AS run, 0 AS best),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', CASE WHEN acc.prev IS NOT NULL AND x = acc.prev"
        "           THEN acc.run + 1 ELSE 1 END,"
        "   'best', greatest(acc.best,"
        "           CASE WHEN acc.prev IS NOT NULL AND x = acc.prev"
        "           THEN acc.run + 1 ELSE 1 END)),"
        " acc -> acc.best)"
    )
    dfrac = F.size(F.array_distinct("w")) / F.size("w")
    tfrac = F.col("topc") / (F.size("w") - 1)
    return (
        base.withColumn("bg", bg)
        .withColumn("topc", top)
        .select(
            "doc_id",
            "lang",
            F.size("w").cast("bigint").alias("n_words"),
            r4(dfrac).alias("distinct_frac"),
            r4(tfrac).alias("top_bigram_frac"),
            (
                (tfrac >= T27_TOP_BIGRAM_MAX)
                | (dfrac <= T27_DISTINCT_MIN)
            ).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@query("t27_repetition_filter", oracle=T27_ORACLE)
def t27_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T27: per-document repetition quality gate — a run-length slip in
    the fold, an off-by-one in the bigram window, or a threshold
    boundary difference flips the hash (every doc is a row)."""
    return repetition_stats(spread(load_table(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# T28 — n-gram NOVELTY profile (round-10 surface, library-first; the
# @query registration is one decorator away). For each document, the
# fraction of its distinct 3-gram shingles appearing for the FIRST time
# in the corpus when documents are taken in doc_id order (per
# language, the dedup-family convention): the "how much new text does
# each document add" curve that corpus-growth monitoring and
# contamination analysis read, and the exact complement of t19's
# containment (a doc wholly made of seen shingles has novelty 0).
#
# Scale: one explode + one (lang, shingle) min-agg — the posting-list
# shuffle, corpus-linear — then a join back on the same key and a
# per-doc agg on doc_id; no pair space anywhere. first-seen is a pure
# min, so the profile is partition- and history-independent.
# --------------------------------------------------------------------------
T28_ORACLE = """
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents),
    s AS (
      SELECT doc_id, lang,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' ')))
             ELSE [array_to_string(w, ' ')] END AS sh
      FROM d),
    ex AS (SELECT doc_id, lang, unnest(sh) AS sg FROM s),
    first_seen AS (
      SELECT lang, sg, min(doc_id) AS first_doc
      FROM ex GROUP BY lang, sg)
    SELECT e.doc_id, e.lang,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS novelty_frac
    FROM ex e JOIN first_seen f ON f.lang = e.lang AND f.sg = e.sg
    GROUP BY e.doc_id, e.lang ORDER BY e.doc_id
"""


def novelty_profile(shingled: DataFrame) -> DataFrame:
    """Per-doc novelty over a (doc_id, lang, sh) frame — factored so
    tests can drive synthetic orderings."""
    ex = shingled.select("doc_id", "lang", F.explode("sh").alias("sg"))
    first_seen = ex.groupBy("lang", "sg").agg(
        F.min("doc_id").alias("first_doc")
    )
    novel = F.when(
        F.col("first_doc") == F.col("doc_id"), 1
    ).otherwise(0)
    return (
        ex.join(first_seen, ["lang", "sg"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            r4(F.sum(novel) / F.count(F.lit(1))).alias("novelty_frac"),
        )
        .orderBy("doc_id")
    )


@query("t28_novelty_profile", oracle=T28_ORACLE)
def t28_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28: per-doc first-occurrence shingle fraction in doc_id order —
    a min over the wrong key, a dedup slip in the shingle set, or a
    join that drops singleton shingles flips the hash."""
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _shingled,
    )

    return novelty_profile(_shingled(spark, sf_dir).drop("n_sh"))


# --------------------------------------------------------------------------
# T29 — PERPLEXITY-QUARTILE quality gate (round-11 surface, library-
# first; the @query registration is one decorator away). The CCNet /
# Wikipedia-LM filter shape: score every document under the corpus's
# own bigram LM (t26's add-one-smoothed NLL), rank per language, and
# gate the worst quartile. Ranking uses (ROUNDED score, doc_id) — the
# p13 discipline: rounding before ranking gives both engines identical
# sort keys, doc_id makes the order total, and ntile's integer
# semantics are engine-identical, so the gate is bit-stable where an
# interpolated-quantile threshold would hang correctness on a 1-ulp
# libm difference.
#
# Scale: t26's scoring plan (corpus-linear joins against the bigram/
# unigram tables) plus ONE per-language sort for the ntile — at 100 TB
# the ranking would run per-shard against broadcast approx-quantile
# cuts; the exact per-language form is the correctness anchor.
# --------------------------------------------------------------------------
T29_BUCKETS = 4

T29_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents),
    pairs AS (
      SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> struct_pack(w1 := w[i], w2 := w[i + 1])))
                 AS p
        FROM d WHERE len(w) >= 2)),
    uni AS (
      SELECT w1 AS w, count(*) AS cu FROM pairs GROUP BY w1),
    bi AS (
      SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2),
    v AS (
      SELECT count(DISTINCT tok) AS vocab
      FROM (SELECT unnest(w) AS tok FROM d)),
    scored AS (
      SELECT p.doc_id, p.lang,
             round(sum(-ln((bi.cb + 1.0) / (uni.cu + v.vocab)))
                   / count(*), 4) AS nll
      FROM pairs p
      JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
      JOIN uni ON uni.w = p.w1
      CROSS JOIN v
      GROUP BY p.doc_id, p.lang),
    ranked AS (
      SELECT doc_id, lang, nll,
             ntile({T29_BUCKETS}) OVER (PARTITION BY lang
                                        ORDER BY nll, doc_id) AS q
      FROM scored)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN q = {T29_BUCKETS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           round(avg(CASE WHEN q = {T29_BUCKETS} THEN nll END), 4)
             AS flagged_avg_nll,
           round(avg(CASE WHEN q < {T29_BUCKETS} THEN nll END), 4)
             AS kept_avg_nll
    FROM ranked GROUP BY lang ORDER BY lang
"""


@query("t29_perplexity_gate", oracle=T29_ORACLE)
def t29_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29: per-language worst-perplexity-quartile gate over the t26
    bigram-LM scores — a ranking-key difference, an ntile boundary
    slip, or a smoothing error upstream flips the hash."""
    from pyspark.sql.window import Window

    scored = t26_bigram_lm_score(spark, sf_dir).select(
        "doc_id", "lang", F.col("avg_nll").alias("nll")
    )
    w = Window.partitionBy("lang").orderBy("nll", "doc_id")
    ranked = scored.withColumn("q", F.ntile(T29_BUCKETS).over(w))
    flagged = F.col("q") == T29_BUCKETS
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(flagged.cast("bigint")).alias("n_flagged"),
            r4(F.avg(F.when(flagged, F.col("nll")))).alias(
                "flagged_avg_nll"
            ),
            r4(F.avg(F.when(~flagged, F.col("nll")))).alias(
                "kept_avg_nll"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T30 — token RARITY profile (round-11 surface, library-first; the
# @query registration is one decorator away). The CCNet word-frequency
# signal: rank the corpus vocabulary by frequency (dense_rank over
# count DESC, token ASC — the tie-break makes the rank total and
# engine-identical), then profile each document by the mean log2 rank
# of its tokens — low = common-word text, high = rare-word text; the
# complement of t21's corpus-level Zipf slope at document granularity.
#
# Scale: the vocabulary table is aggregate-sized (tokens, not
# occurrences); its global rank sort is vocab-bounded, and the
# occurrence join back is the corpus-linear posting shuffle every
# dedup/text op here already pays. No pair space, no driver loop.
# --------------------------------------------------------------------------
T30_ORACLE = """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    freq AS (
      SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT tok, dense_rank() OVER (ORDER BY c DESC, tok ASC) AS rnk
      FROM freq)
    SELECT t.doc_id, t.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(log2(r.rnk)), 4) AS avg_log2_rank,
           CAST(max(r.rnk) AS BIGINT) AS rarest_rank
    FROM toks t JOIN ranked r ON r.tok = t.tok
    GROUP BY t.doc_id, t.lang ORDER BY t.doc_id
"""


@query("t30_token_rarity_profile", oracle=T30_ORACLE)
def t30_token_rarity_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T30: per-document mean log2 frequency-rank of its tokens — a
    rank tie-break difference, a lost singleton token, or a join that
    drops out-of-vocabulary rows flips the hash (every doc is a
    row)."""
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.withColumn(
        "rnk",
        F.dense_rank().over(
            Window.orderBy(F.col("c").desc(), F.col("tok").asc())
        ),
    ).select("tok", "rnk")
    return (
        toks.join(ranked, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            r4(F.avg(F.log2("rnk"))).alias("avg_log2_rank"),
            F.max("rnk").cast("bigint").alias("rarest_rank"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T31 — PMI COLLOCATIONS: the top-10 adjacent-token collocations per
# language by pointwise mutual information, min bigram count 3. The
# phrase-mining primitive (new-term discovery, tokenizer-merge
# candidates, multi-word-expression lexicons) the t-family lacked:
# t14 ranks bigrams by raw count, which surfaces stopword pairs; PMI
# surfaces pairs that co-occur MORE than their unigram frequencies
# predict.
#
# Determinism: the ranking key is the raw likelihood ratio
# (c_xy * N) / (c_x * c_y) — exact BIGINT products, ONE IEEE division,
# bit-identical in both engines (the p11 discipline) — with (w1, w2)
# breaking ties; log2 touches only the displayed 4-dp value (the
# t26/t12 precedent).
#
# Scale: two vocabulary-keyed aggregates (unigrams, bigrams) off one
# narrow explode, a vocabulary-sized join to attach unigram counts,
# and a per-lang top-10 window over the min-count-filtered bigram
# table — the corpus shuffles on token keys only; at 100 TB the
# min-count filter is what keeps the joined table vocabulary-sized.
# --------------------------------------------------------------------------
T31_MIN_COUNT = 3
T31_TOP_N = 10

T31_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents),
    toks AS (
      SELECT lang, unnest(w) AS tok FROM d),
    uni AS (
      SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
    tot AS (
      SELECT lang, count(*) AS n FROM toks GROUP BY lang),
    pairs AS (
      SELECT lang, p.w1 AS w1, p.w2 AS w2
      FROM (
        SELECT lang,
               unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> struct_pack(w1 := w[i], w2 := w[i + 1])))
                 AS p
        FROM d WHERE len(w) >= 2)),
    bi AS (
      SELECT lang, w1, w2, count(*) AS c_xy
      FROM pairs GROUP BY lang, w1, w2
      HAVING count(*) >= {T31_MIN_COUNT}),
    scored AS (
      SELECT bi.lang, bi.w1, bi.w2, bi.c_xy,
             (bi.c_xy * tot.n) * 1.0 / (u1.c * u2.c) AS ratio
      FROM bi
      JOIN uni u1 ON u1.lang = bi.lang AND u1.tok = bi.w1
      JOIN uni u2 ON u2.lang = bi.lang AND u2.tok = bi.w2
      JOIN tot ON tot.lang = bi.lang),
    ranked AS (
      SELECT lang, w1, w2, c_xy, ratio,
             row_number() OVER (PARTITION BY lang
               ORDER BY ratio DESC, w1, w2) AS rank
      FROM scored)
    SELECT lang, CAST(rank AS BIGINT) AS rank, w1, w2,
           CAST(c_xy AS BIGINT) AS c_xy,
           round(log2(ratio), 4) AS pmi
    FROM ranked WHERE rank <= {T31_TOP_N}
    ORDER BY lang, rank
"""


@query("t31_collocation_pmi", oracle=T31_ORACLE)
def t31_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31: per-language top-10 PMI collocations — a bigram boundary
    slip (crossing documents), an N that counts pairs instead of
    tokens, a ranking on the rounded log instead of the exact ratio,
    or an unstable tie-break flips the hash."""
    from pyspark.sql.window import Window

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", tokens(F.col("text")).alias("w")
    )
    toks = d.select("lang", F.explode("w").alias("tok"))
    uni = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        d.filter(F.size("w") >= 2)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i - 1] AS w1, w[i] AS w2))"
                )
            ).alias("p"),
        )
        .select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bi = (
        pairs.groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= T31_MIN_COUNT)
    )
    u1 = uni.select(
        F.col("lang").alias("l1"), F.col("tok").alias("t1"), F.col("c").alias("c1")
    )
    u2 = uni.select(
        F.col("lang").alias("l2"), F.col("tok").alias("t2"), F.col("c").alias("c2")
    )
    scored = (
        bi.join(u1, (F.col("lang") == F.col("l1")) & (F.col("w1") == F.col("t1")))
        .join(u2, (F.col("lang") == F.col("l2")) & (F.col("w2") == F.col("t2")))
        .join(tot, "lang")
        .select(
            "lang", "w1", "w2", "c_xy",
            ((F.col("c_xy") * F.col("n")) * 1.0
             / (F.col("c1") * F.col("c2"))).alias("ratio"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("ratio").desc(), F.col("w1"), F.col("w2")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= T31_TOP_N)
        .select(
            "lang",
            F.col("rank").cast("bigint").alias("rank"),
            "w1", "w2", "c_xy",
            r4(F.log2("ratio")).alias("pmi"),
        )
        .orderBy("lang", "rank")
    )


# --------------------------------------------------------------------------
# T32 — TOKEN ENTROPY profile (round-10 wave 4): per-document unigram
# Shannon entropy aggregated per language — the information-density
# quality signal (low entropy = repetitive/templated text, the same
# family as t10's repetition ratios but measured in bits). Computed
# through the numerically-pinned identity
# H = log2(N) - (sum over tokens of n*log2(n)) / N, so every log2
# argument is an INTEGER count — both engines evaluate log2 on
# identical doubles and only the (rounded, 4dp) summation tail can
# differ, the t12/t26 float discipline.
#
# Scale: one explode + one (doc, token) partial-agg + one per-doc agg
# + one per-lang agg — all partial-aggregated exchanges, no window
# over raw tokens, no driver loop.
# --------------------------------------------------------------------------
T32_ORACLE = """
    WITH w AS (
      SELECT doc_id, lang,
             unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    tf AS (
      SELECT doc_id, lang, tok, count(*) AS n
      FROM w GROUP BY doc_id, lang, tok),
    doc AS (
      SELECT doc_id, lang,
             log2(sum(n)) - sum(n * log2(n)) / sum(n) AS h
      FROM tf GROUP BY doc_id, lang)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(h), 4) AS mean_entropy,
           round(min(h), 4) AS min_entropy,
           round(max(h), 4) AS max_entropy
    FROM doc GROUP BY lang ORDER BY lang
"""


@query("t32_token_entropy", oracle=T32_ORACLE)
def t32_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32: per-lang document entropy profile — a natural-log slip, a
    probability-form summation (log2 of non-integer args), or a lost
    duplicate token flips the 4dp hash."""
    d = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    doc = tf.groupBy("doc_id", "lang").agg(
        (
            F.log2(F.sum("n"))
            - F.sum(F.col("n") * F.log2("n")) / F.sum("n")
        ).alias("h")
    )
    return (
        doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(F.avg("h")).alias("mean_entropy"),
            r4(F.min("h")).alias("min_entropy"),
            r4(F.max("h")).alias("max_entropy"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T33 — RAKE keyword extraction (round-11 bank, library-first).
# Rapid Automatic Keyword Extraction, relationally: candidate phrases
# are the MAXIMAL stopword-free token runs (a gaps-and-islands cut on
# token positions — the q90 idiom inside documents), each word scores
# degree(w) = Σ over its phrase occurrences of the phrase length
# (co-occurrence mass) over freq(w), and the per-lang top-10 ranks on
# the exact (degree, freq) integers with the ratio computed once as
# one IEEE division (identical doubles in both engines; ties to the
# lexicographically-first word — the t31 discipline).
#
# Scale: posexplode + two partial-agg exchanges (phrase build, word
# rollup) + a per-lang top-k window over the word table — no
# self-join, no UDF.
# --------------------------------------------------------------------------
T33_TOPK = 10

T33_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang, t.tok, t.i
      FROM (
        SELECT doc_id, lang,
               unnest(string_split(trim(text), ' ')) AS tok,
               unnest(generate_series(1,
                 len(string_split(trim(text), ' ')))) AS i
        FROM documents) t),
    nonstop AS (
      SELECT doc_id, lang, tok, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
               AS isl
      FROM toks
      WHERE tok NOT IN {STOPWORDS!r}),
    phrases AS (
      SELECT doc_id, lang, isl, count(*) AS plen
      FROM nonstop GROUP BY doc_id, lang, isl),
    wordstats AS (
      SELECT n.lang, n.tok AS word,
             CAST(sum(p.plen) AS BIGINT) AS degree,
             CAST(count(*) AS BIGINT) AS freq
      FROM nonstop n
      JOIN phrases p ON p.doc_id = n.doc_id AND p.isl = n.isl
      GROUP BY n.lang, n.tok),
    ranked AS (
      SELECT lang, word, degree, freq,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY degree * 1.0 / freq DESC, word ASC) AS rk
      FROM wordstats)
    SELECT lang, CAST(rk AS BIGINT) AS rk, word, degree, freq
    FROM ranked WHERE rk <= {T33_TOPK}
    ORDER BY lang, rk
"""


@query("t33_rake_keywords", oracle=T33_ORACLE)
def t33_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T33 (banked): per-lang RAKE top-10 — a phrase cut that merges
    runs across a stopword, a degree that misses phrase co-occurrence
    mass, or an unstable ratio tie flips the hash."""
    from pyspark.sql.window import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.trim(F.col("text")), " ")).alias(
            "i0", "tok"
        ),
    ).select(
        "doc_id", "lang", "tok", (F.col("i0") + 1).alias("i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    nonstop = toks.filter(~F.col("tok").isin(*STOPWORDS)).withColumn(
        "isl", F.col("i") - F.row_number().over(w)
    )
    phrases = nonstop.groupBy("doc_id", "lang", "isl").agg(
        F.count(F.lit(1)).alias("plen")
    )
    wordstats = (
        nonstop.join(phrases, ["doc_id", "lang", "isl"])
        .groupBy("lang", "tok")
        .agg(
            F.sum("plen").alias("degree"),
            F.count(F.lit(1)).alias("freq"),
        )
    )
    rk = Window.partitionBy("lang").orderBy(
        (F.col("degree") / F.col("freq")).desc(), F.col("tok").asc()
    )
    return (
        wordstats.withColumn("rk", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rk") <= T33_TOPK)
        .select(
            "lang", "rk", F.col("tok").alias("word"), "degree", "freq"
        )
        .orderBy("lang", "rk")
    )


# --------------------------------------------------------------------------
# T34 — cross-lingual VOCABULARY OVERLAP matrix (round-12 surface,
# library-first; the @query registration is one decorator away). The
# corpus-composition diagnostic a multilingual training mix needs:
# for every language pair, the Jaccard overlap of their distinct
# vocabularies plus the asymmetric containment (share of A's vocab
# also in B) — high overlap flags near-duplicate subcorpora, script
# contamination, or mislabeled languages.
#
# Scale shape: one distinct (lang, token) aggregation (map-side
# combine), per-lang sizes are a 5-row aggregate joined broadcast;
# the intersection is a token-keyed equi-join of the distinct vocab
# with itself — the inverted-index shape, pairs materialize only for
# shared tokens, never a cross join of documents.
# --------------------------------------------------------------------------
T34_ORACLE = """
    WITH v AS (
      SELECT DISTINCT lang,
             unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    sz AS (SELECT lang, count(*) AS n FROM v GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS both
      FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY a.lang, b.lang)
    SELECT i.lang_a, i.lang_b,
           CAST(sa.n AS BIGINT) AS vocab_a,
           CAST(sb.n AS BIGINT) AS vocab_b,
           CAST(i.both AS BIGINT) AS n_shared,
           round(i.both * 1.0 / (sa.n + sb.n - i.both), 4) AS jaccard,
           round(i.both * 1.0 / sa.n, 4) AS containment_a_in_b,
           round(i.both * 1.0 / sb.n, 4) AS containment_b_in_a
    FROM inter i
    JOIN sz sa ON sa.lang = i.lang_a
    JOIN sz sb ON sb.lang = i.lang_b
    ORDER BY lang_a, lang_b
"""


@query("t34_vocab_overlap", oracle=T34_ORACLE)
def t34_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34 (banked): language-pair vocabulary Jaccard + containment —
    a lost duplicate collapse, a pair-order flip, or an intersection
    join that double-counts flips the hash."""
    d = spread(load_table(spark, sf_dir, "documents"))
    v = (
        d.select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
        )
        .distinct()
    )
    sz = v.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    a = v.alias("a")
    b = v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).alias("both"))
    )
    sa = sz.select(F.col("lang").alias("lang_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("lang").alias("lang_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("na").alias("vocab_a"),
            F.col("nb").alias("vocab_b"),
            F.col("both").alias("n_shared"),
            r4(F.col("both") / (F.col("na") + F.col("nb") - F.col("both"))
               ).alias("jaccard"),
            r4(F.col("both") / F.col("na")).alias("containment_a_in_b"),
            r4(F.col("both") / F.col("nb")).alias("containment_b_in_a"),
        )
        .orderBy("lang_a", "lang_b")
    )


# --------------------------------------------------------------------------
# T35 — language-ID CONFUSION census (round-12 surface, library-first;
# the @query registration is one decorator away). t3 predicts; this
# entry grades: the (labeled lang x predicted lang) contingency table
# with per-true-lang accuracy in integer permille — the evaluation
# face a production lang-ID gate ships alongside the classifier (and
# the census that catches mislabeled subcorpora: a true-lang row whose
# mass sits off-diagonal).
#
# Scale shape: the classifier is t3's narrow marker filter (one
# codegen stage, no shuffle); the census is a single 2-key hash agg
# joined broadcast to the 5-row per-lang totals.
# --------------------------------------------------------------------------
T35_ORACLE = """
    WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS w
               FROM documents),
    s AS (SELECT doc_id, lang,
           CAST(len(list_filter(w, t -> t IN ('the','a','of')))   AS BIGINT) AS en_score,
           CAST(len(list_filter(w, t -> t IN ('der','die','und'))) AS BIGINT) AS de_score,
           CAST(len(list_filter(w, t -> t IN ('el','la','que')))  AS BIGINT) AS es_score,
           CAST(len(list_filter(w, t -> t IN ('le','les','et')))  AS BIGINT) AS fr_score
    FROM d),
    p AS (SELECT doc_id, lang AS true_lang,
           CASE WHEN en_score >= greatest(de_score, es_score, fr_score) THEN 'en'
                WHEN de_score >= greatest(es_score, fr_score) THEN 'de'
                WHEN es_score >= fr_score THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM s),
    cell AS (SELECT true_lang, predicted_lang, count(*) AS n
             FROM p GROUP BY true_lang, predicted_lang),
    tot AS (SELECT true_lang, sum(n) AS n_true FROM cell GROUP BY true_lang)
    SELECT c.true_lang, c.predicted_lang,
           CAST(c.n AS BIGINT) AS n_docs,
           CAST(t.n_true AS BIGINT) AS n_true,
           CAST((1000 * c.n) // t.n_true AS BIGINT) AS cell_permille
    FROM cell c JOIN tot t ON c.true_lang = t.true_lang
    ORDER BY c.true_lang, c.predicted_lang
"""


@query("t35_langid_confusion", oracle=T35_ORACLE)
def t35_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T35 (banked): (true x predicted) language contingency with
    integer-permille cells — a tie-break drift in the classifier, a
    lost zero-score doc, or a permille rounding slip flips the hash.

    Fixture honesty: the synthetic corpus shares one English-ish
    vocabulary across all five labels, so t3's marker classifier
    predicts 'en' for every row here and the matrix is a single
    predicted column — the census's value on these fixtures is
    pinning exactly that (a mislabel-detector that must light up),
    and the counting/permille arithmetic it hash-checks."""
    d = spread(load_table(spark, sf_dir, "documents"))
    scores = _lang_scores()
    scored = d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        *[c.alias(f"{lang}_score") for lang, c in scores.items()],
    )
    en, de, es, fr = (F.col(f"{lg}_score") for lg in ("en", "de", "es", "fr"))
    p = scored.withColumn(
        "predicted_lang",
        F.when(en >= F.greatest(de, es, fr), "en")
        .when(de >= F.greatest(es, fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr"),
    )
    cell = p.groupBy("true_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = cell.groupBy("true_lang").agg(F.sum("n_docs").alias("n_true"))
    return (
        cell.join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "predicted_lang",
            "n_docs",
            "n_true",
            F.expr("(1000 * n_docs) DIV n_true").alias("cell_permille"),
        )
        .orderBy("true_lang", "predicted_lang")
    )


# --------------------------------------------------------------------------
# T36 — LEXICAL READABILITY census (round-13 surface, library-first;
# the @query registration is one decorator away). The Flesch family of
# readability scores over the curation corpus, with the standard
# heuristic syllable counter (vowel-group runs, floor 1/word). The
# synthetic fixtures carry no sentence punctuation, so the sentence
# unit is declared to be the DOCUMENT (stated, not fudged): the score
# still exercises the full pipeline — tokenize, per-word syllables via
# regexp_extract_all, three-level reaggregation, fixed-point linear
# combination — and flags the corpus-quality drift it exists for
# (avg words/doc and syllables/word both move when boilerplate or
# junk floods a language).
#
# Scale shape: pure per-row expressions (split + higher-order
# transform) + one grouped agg — no shuffle beyond the 5-group agg,
# no UDF.
# --------------------------------------------------------------------------
T36_ORACLE = """
    WITH d AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents),
    per AS (
      SELECT doc_id, lang, len(w) AS n_words,
             list_sum(list_transform(w, t -> len(t))) AS n_chars,
             list_sum(list_transform(w,
               t -> greatest(1, len(regexp_extract_all(t, '[aeiou]+')))))
               AS n_syll,
             list_sum(list_transform(w,
               t -> CASE WHEN len(regexp_extract_all(t, '[aeiou]+')) <= 1
                         THEN 1 ELSE 0 END)) AS n_mono
      FROM d)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(n_chars) * 1.0 / sum(n_words), 4) AS avg_word_len,
           round(sum(n_syll) * 1.0 / sum(n_words), 4) AS syll_per_word,
           CAST((1000 * sum(n_mono)) // sum(n_words) AS BIGINT)
             AS mono_permille,
           round(206.835 - 1.015 * (sum(n_words) * 1.0 / count(*))
                 - 84.6 * (sum(n_syll) * 1.0 / sum(n_words)), 4)
             AS reading_ease
    FROM per GROUP BY lang ORDER BY lang
"""


@query("t36_readability", oracle=T36_ORACLE)
def t36_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T36 (banked): per-lang readability census — a syllable counter
    missing the 1-per-word floor, a words-vs-docs denominator swap, or
    a coefficient slip in the Flesch combination flips the hash."""
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", F.split(F.trim(F.col("text")), " ").alias("w")
    )
    syll = (
        "aggregate(transform(w, t -> greatest(1, "
        "size(regexp_extract_all(t, '[aeiou]+', 0)))), 0L, (a, x) -> a + x)"
    )
    chars = "aggregate(transform(w, t -> length(t)), 0L, (a, x) -> a + x)"
    mono = (
        "aggregate(transform(w, t -> IF(size(regexp_extract_all(t, "
        "'[aeiou]+', 0)) <= 1, 1L, 0L)), 0L, (a, x) -> a + x)"
    )
    per = d.select(
        "lang",
        F.size("w").cast("bigint").alias("n_words"),
        F.expr(chars).alias("n_chars"),
        F.expr(syll).alias("n_syll"),
        F.expr(mono).alias("n_mono"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(F.sum("n_chars") / F.sum("n_words")).alias("avg_word_len"),
            r4(F.sum("n_syll") / F.sum("n_words")).alias("syll_per_word"),
            F.expr("(1000 * sum(n_mono)) DIV sum(n_words)").alias(
                "mono_permille"
            ),
            r4(
                F.lit(206.835)
                - F.lit(1.015) * (F.sum("n_words") / F.count(F.lit(1)))
                - F.lit(84.6) * (F.sum("n_syll") / F.sum("n_words"))
            ).alias("reading_ease"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T37 — character-trigram language profile (round-14 surface,
# library-first; the @query registration is one decorator away). The
# feature extractor behind statistical language ID (Cavnar & Trenkle's
# n-gram rank profiles): per language, the top-K character trigrams by
# frequency with deterministic ties. t3's marker-token heuristic
# CONSUMES hand-picked features; this op PRODUCES the learned ones.
#
# Scale: the trigram explode is corpus-linear (|text| rows per doc)
# and collapses map-side into (lang, trigram) partial counts before
# the shuffle; the rank window partitions by lang — 5 keys here, but
# the per-key row count is the trigram vocabulary (bounded by
# alphabet³), not the corpus.
# --------------------------------------------------------------------------
T37_TOP_K = 5

T37_ORACLE = f"""
    WITH tg AS (
      SELECT lang,
             unnest(list_transform(generate_series(1, length(text) - 2),
                                   i -> substr(text, i, 3))) AS trigram
      FROM documents WHERE length(text) >= 3),
    counts AS (
      SELECT lang, trigram, count(*) AS n
      FROM tg GROUP BY lang, trigram),
    ranked AS (
      SELECT lang, trigram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, trigram) AS rank
      FROM counts)
    SELECT lang, CAST(rank AS BIGINT) AS rank, trigram,
           CAST(n AS BIGINT) AS n
    FROM ranked WHERE rank <= {T37_TOP_K}
    ORDER BY lang, rank
    """


def char_trigram_profile(docs: DataFrame, k: int = T37_TOP_K) -> DataFrame:
    """(lang, rank, trigram, n): top-k character trigrams per lang,
    ties broken lexicographically."""
    from pyspark.sql.window import Window

    tg = docs.filter(F.length("text") >= 3).select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2),"
                   " i -> substring(text, i, 3))")
        ).alias("trigram"),
    )
    counts = tg.groupBy("lang", "trigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "trigram")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("lang", "rank", "trigram", "n")
        .orderBy("lang", "rank")
    )


def t37_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T37 (banked): per-lang top-5 character trigrams — a substring
    off-by-one, a lost boundary trigram, or a tie broken away from
    lexicographic flips the hash."""
    return char_trigram_profile(
        spread(load_table(spark, sf_dir, "documents"))
    )
