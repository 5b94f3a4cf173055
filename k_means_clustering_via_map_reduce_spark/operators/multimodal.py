"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container ships no image/audio codecs, so the DECODE step is a
clearly-marked stub (``decode_image`` raises NotImplementedError; the
deterministic ``fake_decode`` stands in for tests). Everything Spark-side
— schema, batch iteration, partitioning, UDF signatures — is real and
tested: swapping the stub for PIL/ffmpeg changes one function body.

Scale notes: binary payloads ride in Arrow record batches; per-partition
work is embarrassingly parallel (no shuffle). For 100 TB of media the
knobs are ``spark.sql.files.maxPartitionBytes`` (payload-sized splits)
and ``spark.sql.execution.arrow.maxRecordsPerBatch`` (bound batch memory
for wide blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query
from k_means_clustering_via_map_reduce_spark.sources import load_table, spread

MEDIA_SCHEMA = (
    "doc_id BIGINT, blob BINARY, media_type STRING, declared_w INT, declared_h INT"
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload + metadata from the documents
    table so the multimodal path has real bytes to move (stand-in for a
    parquet/tar source of actual media)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.when(F.col("doc_id") % 2 == 0, "image/png")
        .otherwise("audio/wav")
        .alias("media_type"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("declared_w"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("declared_h"),
    )


def decode_image(blob: bytes) -> "object":
    """REAL DECODER NOT AVAILABLE IN THIS CONTAINER — plug PIL/opencv here.

    Kept as an explicit stub so the pipeline shape is honest about where
    the codec boundary sits."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not shipped in this container"
    )


def fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (n_bytes, pseudo_w, pseudo_h)
    derived from the payload alone."""
    n = len(blob)
    return n, (n % 97) + 1, (n % 89) + 1


def media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The UDF
    signature and batch shape are exactly what a real decoder needs."""
    import pandas as pd

    out_schema = (
        "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
        "decoded_w INT, decoded_h INT"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "decoded_w": [f[1] for f in feats],
                    "decoded_h": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(extract, schema=out_schema)


@query(
    "m1_media_bytes",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
             AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
def media_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing, oracled: text → binary payload →
    mapInPandas byte stats. DuckDB checks via strlen (fixture text is
    UTF-8 where bytes == strlen's byte count)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    media = attach_fake_media(docs)
    return (
        media_features(media)
        .select("doc_id", "media_type", "n_bytes")
        .orderBy("doc_id")
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling shape: one row per sampled frame index, frame
    payload left as a stub slice of the blob. Real ffmpeg extraction
    replaces ``fake_decode``-style slicing; the explode/partition shape
    is the production one."""
    n_frames = (F.length("blob") % 30 + 1).cast("int")
    return (
        df.withColumn("n_frames", n_frames)
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("doc_id", "frame_idx", "n_frames")
    )
