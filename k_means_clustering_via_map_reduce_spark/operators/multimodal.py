"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

BMP/WAV headers and full PNGs (stdlib zlib: CRC'd IHDR + IDAT inflate)
decode for REAL in pure Python; formats that need an actual codec
library (JPEG/WebP/...) sit behind a clearly-marked stub
(``decode_image`` raises NotImplementedError; the deterministic
``fake_decode`` stands in for tests). Everything Spark-side — schema,
batch iteration, partitioning, UDF signatures — is real and tested:
swapping the stub for PIL/ffmpeg changes one function body.

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

from k_means_clustering_via_map_reduce_spark.queries import query, r4
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
    """REAL DECODER NOT AVAILABLE IN THIS CONTAINER for formats needing
    a codec library (progressive/arithmetic JPEG, WebP, AVIF, ...):
    plug PIL/opencv here.

    Kept as an explicit stub so the pipeline shape is honest about
    where the codec-library boundary sits. Natively decoded WITHOUT a
    codec library: BMP, WAV and PNG via ``decode_media`` (PNG through
    stdlib zlib: IHDR CRC check + IDAT inflate + full defiltering),
    BASELINE GRAYSCALE JPEG via ``operators/jpeg.py`` (real DCT /
    huffman encode+decode, driver-checked as m6), and BASELINE 4:2:0
    COLOR JPEG (BT.601 + chroma subsampling + interleaved MCUs,
    driver-checked as m6b) — the boundary is now progressive /
    arithmetic JPEG and the modern formats."""
    raise NotImplementedError(
        "progressive/arithmetic compressed-image decoding requires "
        "PIL/opencv, not shipped in this container; BMP/WAV/PNG decode "
        "via decode_media, baseline gray+4:2:0-color JPEG via "
        "operators/jpeg.py"
    )


# color type -> samples per pixel (PNG spec, IHDR semantics).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(blob: bytes) -> dict | None:
    """Pure-stdlib PNG decode: verify the 8-byte signature, parse IHDR
    (width/height as big-endian u32 at offsets 16/20, bit depth /
    color type / interlace at 24/25/28), verify the IHDR CRC32 over
    chunk type + data (offsets 12..29), then walk the chunk list,
    concatenate every IDAT payload and zlib-INFLATE it — for
    non-interlaced images the decompressed filtered stream must be
    exactly height * (1 + width * channels * bytes_per_sample) bytes.
    Any signature/CRC/inflate/length failure returns None (the blob is
    not a valid PNG; the caller routes it to the opaque path)."""
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n" or len(blob) < 33:
        return None
    if blob[12:16] != b"IHDR" or int.from_bytes(blob[8:12], "big") != 13:
        return None
    if int.from_bytes(blob[29:33], "big") != zlib.crc32(blob[12:29]):
        return None
    width = int.from_bytes(blob[16:20], "big")
    height = int.from_bytes(blob[20:24], "big")
    bit_depth, color_type = blob[24], blob[25]
    interlace = blob[28]
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or width <= 0 or height <= 0:
        return None
    idat = bytearray()
    pos = 33
    while pos + 8 <= len(blob):
        sz = int.from_bytes(blob[pos : pos + 4], "big")
        cid = blob[pos + 4 : pos + 8]
        if cid == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + sz]
        if cid == b"IEND":
            break
        pos += 12 + sz  # length + type + data + crc
    if idat:
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return None
        if interlace == 0:
            bps = max(1, bit_depth // 8)
            if len(raw) != height * (1 + width * channels * bps):
                return None
    return {
        "codec": "png",
        "width": width,
        "height": height,
        "channels": channels,
    }


def fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (n_bytes, pseudo_w, pseudo_h)
    derived from the payload alone."""
    n = len(blob)
    return n, (n % 97) + 1, (n % 89) + 1


def decode_media(blob: bytes) -> dict | None:
    """REAL decode for the three formats that need no codec library.

    - BMP (BITMAPINFOHEADER): signed little-endian width/height at byte
      offsets 18/22; negative height means top-down row order, so the
      pixel height is its magnitude.
    - WAV (RIFF): chunk walk from offset 12; channels/sample-rate/bits
      from the ``fmt `` chunk, sample count from the ``data`` chunk size
      over the frame size. Odd-sized chunks carry a pad byte (RIFF rule).
    - PNG: ``_decode_png`` — signature + IHDR with CRC32 verification
      and a real stdlib-zlib inflate of the IDAT stream (decompressed
      filtered-scanline length cross-checked against the header's
      geometry for non-interlaced images).

    Returns a feature dict, or ``None`` for any other format — the
    caller decides whether to route those to ``decode_image`` (real
    codecs) or ``fake_decode`` (tests)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(blob)
    if blob[:2] == b"BM" and len(blob) >= 26:
        w = int.from_bytes(blob[18:22], "little", signed=True)
        h = int.from_bytes(blob[22:26], "little", signed=True)
        return {"codec": "bmp", "width": w, "height": abs(h)}
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        channels = rate = bits = None
        data_size = None
        pos = 12
        while pos + 8 <= len(blob):
            cid = blob[pos : pos + 4]
            sz = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            if cid == b"fmt " and pos + 24 <= len(blob):
                channels = int.from_bytes(blob[pos + 10 : pos + 12], "little")
                rate = int.from_bytes(blob[pos + 12 : pos + 16], "little")
                bits = int.from_bytes(blob[pos + 22 : pos + 24], "little")
            elif cid == b"data":
                data_size = sz
            pos += 8 + sz + (sz & 1)
        if channels and rate and bits:
            frame = channels * (bits // 8)
            n_samples = (data_size // frame) if (data_size and frame) else 0
            return {
                "codec": "wav",
                "channels": channels,
                "sample_rate": rate,
                "n_samples": n_samples,
            }
    return None


def media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: BMP/WAV
    headers decode for REAL (``decode_media``); everything else takes
    the deterministic ``fake_decode`` stand-in for the codec-library
    boundary. The UDF signature and batch shape are exactly what a full
    decoder fleet needs — swapping ``fake_decode`` for PIL changes one
    branch."""
    import pandas as pd

    out_schema = (
        "doc_id BIGINT, media_type STRING, codec STRING, n_bytes BIGINT, "
        "decoded_w INT, decoded_h INT, n_channels INT, sample_rate INT, "
        "n_samples BIGINT"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf["blob"]:
                real = decode_media(b)
                if real is None:
                    n, w, h = fake_decode(b)
                    rows.append(("opaque", n, w, h, None, None, None))
                elif real["codec"] == "png":
                    rows.append(
                        ("png", len(b), real["width"], real["height"],
                         real["channels"], None, None)
                    )
                elif real["codec"] == "bmp":
                    rows.append(
                        ("bmp", len(b), real["width"], real["height"],
                         None, None, None)
                    )
                else:
                    rows.append(
                        ("wav", len(b), None, None, real["channels"],
                         real["sample_rate"], real["n_samples"])
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "codec": [r[0] for r in rows],
                    "n_bytes": [r[1] for r in rows],
                    "decoded_w": [r[2] for r in rows],
                    "decoded_h": [r[3] for r in rows],
                    "n_channels": [r[4] for r in rows],
                    "sample_rate": [r[5] for r in rows],
                    "n_samples": [r[6] for r in rows],
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


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build REAL media bytes from doc_id formulas — a fully-valid PNG
    (signature, CRC'd IHDR, zlib-deflated truecolor scanlines, IEND)
    for ids divisible by 4, a minimal-but-valid BMP header for the
    other even ids, a RIFF/WAVE header for odd ids — so the
    driver-checked decode path exercises actual binary parsing, not a
    stand-in. Layouts match what ``decode_media`` documents: BMP signed
    LE width/height at offsets 18/22; WAV ``fmt `` chunk at offset 12
    (channels @+10, rate @+12, bits @+22) followed by a ``data`` chunk
    whose size field alone determines the sample count; PNG per the
    spec's big-endian chunk layout."""
    import zlib

    import pandas as pd

    def png_chunk(cid: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + cid
            + data
            + zlib.crc32(cid + data).to_bytes(4, "big")
        )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 4 == 0:
                    # Complete truecolor PNG: deterministic pixel bytes,
                    # one filter-0 byte per scanline, single IDAT.
                    w = did % 64 + 1
                    h = did % 48 + 1
                    raw = b"".join(
                        b"\x00"
                        + bytes((did + y + j) % 256 for j in range(w * 3))
                        for y in range(h)
                    )
                    ihdr = (
                        w.to_bytes(4, "big")
                        + h.to_bytes(4, "big")
                        + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor
                    )
                    blobs.append(
                        b"\x89PNG\r\n\x1a\n"
                        + png_chunk(b"IHDR", ihdr)
                        + png_chunk(b"IDAT", zlib.compress(raw))
                        + png_chunk(b"IEND", b"")
                    )
                elif did % 2 == 0:
                    w = did % 640 + 1
                    h = did % 480 + 1
                    blobs.append(
                        b"BM"
                        + bytes(16)
                        + w.to_bytes(4, "little", signed=True)
                        + h.to_bytes(4, "little", signed=True)
                    )
                else:
                    channels = 1 + did % 3
                    rate = 8000 + (did % 8) * 1000
                    bits = 16
                    n_samples = did % 500 + 1
                    data_size = n_samples * channels * (bits // 8)
                    fmt = (
                        (1).to_bytes(2, "little")
                        + channels.to_bytes(2, "little")
                        + rate.to_bytes(4, "little")
                        + (rate * channels * 2).to_bytes(4, "little")
                        + (channels * 2).to_bytes(2, "little")
                        + bits.to_bytes(2, "little")
                    )
                    blobs.append(
                        b"RIFF"
                        + (36 + data_size).to_bytes(4, "little")
                        + b"WAVE"
                        + b"fmt "
                        + (16).to_bytes(4, "little")
                        + fmt
                        + b"data"
                        + data_size.to_bytes(4, "little")
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id BIGINT, blob BINARY"
    ).withColumn("media_type", F.lit("synthetic"))


@query(
    "m2_media_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN 'png'
                WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS codec,
           CASE WHEN doc_id % 4 = 0 THEN CAST(doc_id % 64 + 1 AS INT)
                WHEN doc_id % 2 = 0
                THEN CAST(doc_id % 640 + 1 AS INT) END AS decoded_w,
           CASE WHEN doc_id % 4 = 0 THEN CAST(doc_id % 48 + 1 AS INT)
                WHEN doc_id % 2 = 0
                THEN CAST(doc_id % 480 + 1 AS INT) END AS decoded_h,
           CASE WHEN doc_id % 4 = 0 THEN CAST(3 AS INT)
                WHEN doc_id % 2 = 1
                THEN CAST(1 + doc_id % 3 AS INT) END AS n_channels,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(8000 + (doc_id % 8) * 1000 AS INT) END
             AS sample_rate,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(doc_id % 500 + 1 AS BIGINT) END AS n_samples
    FROM documents ORDER BY doc_id
    """,
)
def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: REAL binary decode driver-checked end-to-end — deterministic
    PNG/BMP/WAV bytes are synthesized from doc_id formulas, pushed
    through the Arrow-batched parser (PNG rows traverse the full
    signature → CRC'd IHDR → zlib IDAT inflate path), and the DECODED
    fields must equal the oracle's direct recomputation of those
    formulas. A byte-offset bug in either the builder or the parser
    (absolute correctness of the parser against fixed golden bytes is
    pinned separately in tests/test_multimodal.py) breaks the match.

    Scale: same shape as m1 — no shuffle, embarrassingly parallel
    Arrow batches; blob bytes never leave the executor."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        media_features(synthesize_media(docs))
        .select(
            "doc_id", "codec", "decoded_w", "decoded_h",
            "n_channels", "sample_rate", "n_samples",
        )
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


# --------------------------------------------------------------------------
# M3 — REAL image resize (nearest-neighbor thumbnail) over decoded PNG
# pixels: the feature-extract/resize stage of a multimodal training
# pipeline, run on actual inflated + defiltered scanlines rather than a
# stand-in. Completes the decode → feature-extract → resize →
# frame-sample chain (m1 byte stats, m2 header decode, frame_sample).
# --------------------------------------------------------------------------
THUMB_GRID = 8


def png_pixel_array(blob: bytes):
    """Full pure-stdlib PNG pixel decode for 8-bit-depth non-interlaced
    images: signature + IHDR (CRC-checked), IDAT concatenation, zlib
    inflate, and PER-SCANLINE DEFILTERING for every filter type the
    spec defines (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth). Returns a
    (height, width*channels) uint8 numpy array, or None for anything
    that is not such a PNG. Filters 2/0 take the vectorized path; the
    sequential filters (Sub/Average/Paeth depend on the byte just
    written) run a per-byte loop — correct first, and thumbnails are
    small; a production deployment swaps in a C defilter here, not a
    different dataflow."""
    import zlib

    import numpy as np

    meta = _decode_png(blob)
    if meta is None or blob[24] != 8:
        return None
    w, h, channels = meta["width"], meta["height"], meta["channels"]
    idat = bytearray()
    pos = 33
    while pos + 8 <= len(blob):
        sz = int.from_bytes(blob[pos : pos + 4], "big")
        cid = blob[pos + 4 : pos + 8]
        if cid == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + sz]
        if cid == b"IEND":
            break
        pos += 12 + sz
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (1 + stride):
        return None
    bpp = channels  # 8-bit depth: bytes per pixel == channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (row[i] + pred) & 0xFF
        else:
            return None
        out[y] = cur
        pos += 1 + stride
    return out


def image_thumbnails(df: DataFrame, grid: int = THUMB_GRID) -> DataFrame:
    """(doc_id, w, h, thumb_sum, c00, cNN): nearest-neighbor
    ``grid``×``grid`` luma thumbnail of every decodable PNG blob —
    source pixel for cell (Y, X) is ((Y*h)//grid, (X*w)//grid), luma is
    the r+g+b byte sum. Rows whose blob is not an 8-bit PNG are dropped
    (the resize stage only consumes what the decode stage produced).

    Scale: identical shape to m1/m2 — Arrow-batched mapInPandas, no
    shuffle, blobs never leave the executor; output is grid²-bounded
    scalars per image regardless of image size."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                px = png_pixel_array(bytes(blob))
                if px is None:
                    continue
                h, stride = px.shape
                w = stride // 3
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                rgb = px.reshape(h, w, 3).astype(np.int64)
                thumb = rgb[np.ix_(ys, xs)].sum(axis=2)  # (grid, grid) luma
                rows.append(
                    (
                        int(did),
                        int(w),
                        int(h),
                        int(thumb.sum()),
                        int(thumb[0, 0]),
                        int(thumb[grid - 1, grid - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "w", "h", "thumb_sum", "c00", "c77"],
            )

    return df.select("doc_id", "blob").mapInPandas(
        extract,
        schema="doc_id BIGINT, w INT, h INT, thumb_sum BIGINT, "
        "c00 BIGINT, c77 BIGINT",
    )


@query(
    "m3_image_resize",
    oracle=f"""
    WITH png AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents WHERE doc_id % 4 = 0
    ), cells AS (
      SELECT doc_id, w, h, gy.y AS gy, gx.x AS gx,
             (doc_id + (gy.y * h) // {THUMB_GRID}
                     + 3 * ((gx.x * w) // {THUMB_GRID})) % 256
           + (doc_id + (gy.y * h) // {THUMB_GRID}
                     + 3 * ((gx.x * w) // {THUMB_GRID}) + 1) % 256
           + (doc_id + (gy.y * h) // {THUMB_GRID}
                     + 3 * ((gx.x * w) // {THUMB_GRID}) + 2) % 256 AS luma
      FROM png,
           generate_series(0, {THUMB_GRID - 1}) gy(y),
           generate_series(0, {THUMB_GRID - 1}) gx(x)
    )
    SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
           CAST(sum(luma) AS BIGINT)  AS thumb_sum,
           CAST(min(CASE WHEN gy = 0 AND gx = 0 THEN luma END) AS BIGINT)
             AS c00,
           CAST(min(CASE WHEN gy = {THUMB_GRID - 1}
                         AND gx = {THUMB_GRID - 1} THEN luma END) AS BIGINT)
             AS c77
    FROM cells GROUP BY doc_id, w, h ORDER BY doc_id
    """,
)
def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: REAL resize driver-checked — synthesized truecolor PNGs
    (deterministic pixel formula, see synthesize_media) are inflated,
    defiltered, and nearest-neighbor-resized to an 8×8 luma thumbnail;
    the oracle recomputes each sampled cell's bytes directly from the
    pixel formula. Any error in inflate, defiltering, row geometry, or
    the resampling index map shifts at least one sampled byte and
    breaks the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return image_thumbnails(synthesize_media(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M4 — REAL audio resample over actual PCM samples: the audio face of the
# decode → transform chain (m2 proved header decode, m3 proved image
# pixels; this proves sample-domain DSP). A mono 16-bit WAV with a real
# data payload is synthesized per doc from an id formula, chunk-walked,
# frombuffer'd to int16, low-passed with the 2-tap box filter and 2:1
# decimated — all inside one Arrow batch, no shuffle, samples never
# leave the executor. Integer arithmetic end-to-end (floor mean) keeps
# the result SQL-replayable exactly.
# --------------------------------------------------------------------------
AUDIO_RATE_IN = 8000
_M4_N = "doc_id % 400 + 2"  # samples per doc (>= 2 so decimation is real)


def synthesize_pcm_wav(docs: DataFrame) -> DataFrame:
    """Mono 16-bit little-endian WAV with a REAL ``data`` payload:
    sample i of doc d is ``((d*31 + i*17) % 2048) - 1024`` — full
    headroom inside int16, deterministic, and replayable as SQL."""
    import numpy as np
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 400 + 2
                i = np.arange(n, dtype=np.int64)
                samples = ((did * 31 + i * 17) % 2048 - 1024).astype("<i2")
                data = samples.tobytes()
                fmt = (
                    (1).to_bytes(2, "little")          # PCM
                    + (1).to_bytes(2, "little")        # mono
                    + AUDIO_RATE_IN.to_bytes(4, "little")
                    + (AUDIO_RATE_IN * 2).to_bytes(4, "little")
                    + (2).to_bytes(2, "little")        # frame size
                    + (16).to_bytes(2, "little")       # bits
                )
                blobs.append(
                    b"RIFF"
                    + (36 + len(data)).to_bytes(4, "little")
                    + b"WAVE"
                    + b"fmt "
                    + (16).to_bytes(4, "little")
                    + fmt
                    + b"data"
                    + len(data).to_bytes(4, "little")
                    + data
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id BIGINT, blob BINARY"
    )


def decode_pcm(blob: bytes):
    """Chunk-walk a RIFF/WAVE blob and return ``(rate, samples)`` with
    samples as an int64 numpy array (mono 16-bit PCM only — the format
    this pipeline synthesizes; anything else returns ``None`` so the
    caller can route to a codec library)."""
    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    rate = bits = channels = None
    data = None
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        sz = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 24 <= len(blob):
            channels = int.from_bytes(blob[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(blob[pos + 12 : pos + 16], "little")
            bits = int.from_bytes(blob[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            data = blob[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    if channels != 1 or bits != 16 or data is None:
        return None
    return rate, np.frombuffer(data, dtype="<i2").astype(np.int64)


def audio_resample(df: DataFrame, factor: int = 2) -> DataFrame:
    """2:1 (or factor:1) decimation with a box-filter anti-alias pass:
    each output sample is the FLOOR mean of its ``factor`` input
    samples (integer domain, so the oracle replays it exactly; a
    production resampler swaps the box filter for a windowed sinc in
    the same batch loop). Emits per-doc scalars so the result is
    driver-hashable without array columns."""
    import numpy as np
    import pandas as pd

    out_schema = (
        "doc_id BIGINT, rate_in INT, rate_out INT, n_in BIGINT, "
        "n_out BIGINT, sum_out BIGINT, min_out BIGINT, max_out BIGINT, "
        "first_out BIGINT"
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(blob)
                if decoded is None:
                    continue
                rate, s = decoded
                m = len(s) // factor * factor
                out = s[:m].reshape(-1, factor).sum(axis=1) // factor
                rows.append(
                    (
                        int(did), rate, rate // factor, len(s), len(out),
                        int(out.sum()), int(out.min()), int(out.max()),
                        int(out[0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "rate_in", "rate_out", "n_in", "n_out",
                    "sum_out", "min_out", "max_out", "first_out",
                ],
            )

    return df.mapInPandas(resample, schema=out_schema)


@query(
    "m4_audio_resample",
    oracle=f"""
    WITH samp AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             ((doc_id*31 + CAST(u.i AS BIGINT)*17) % 2048) - 1024 AS v
      FROM documents, UNNEST(generate_series(0, {_M4_N} - 1)) u(i)
    ), pairs AS (
      SELECT doc_id, i // 2 AS j,
             CAST(floor(sum(v) / 2.0) AS BIGINT) AS out_v
      FROM samp WHERE i < (({_M4_N}) // 2) * 2
      GROUP BY doc_id, i // 2
    )
    SELECT doc_id, CAST(8000 AS INT) AS rate_in, CAST(4000 AS INT) AS rate_out,
           CAST({_M4_N} AS BIGINT) AS n_in,
           CAST(count(*) AS BIGINT) AS n_out,
           CAST(sum(out_v) AS BIGINT) AS sum_out,
           CAST(min(out_v) AS BIGINT) AS min_out,
           CAST(max(out_v) AS BIGINT) AS max_out,
           CAST(min(CASE WHEN j = 0 THEN out_v END) AS BIGINT) AS first_out
    FROM pairs GROUP BY doc_id ORDER BY doc_id
    """,
)
def m4_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: synthesize real PCM WAVs from doc_id formulas, decode the
    byte stream for real (chunk walk + int16 frombuffer), box-filter +
    2:1 decimate in the integer domain, and emit per-doc scalars the
    oracle recomputes directly from the sample formula. A byte-offset,
    endianness, or filter-arithmetic bug anywhere in the chain breaks
    the hash match.

    Scale: same shape as m1/m2/m3 — Arrow-batched mapInPandas, 
    embarrassingly parallel, no shuffle until the final presentation
    sort; 100 TB of audio rides on maxPartitionBytes/maxRecordsPerBatch
    exactly as documented in the module header."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return audio_resample(synthesize_pcm_wav(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M5 — REAL video frame sampling over a raw-frame container: the
# frame-extraction stage of a video training pipeline (decode container →
# stride-sample frames → per-frame features), with actual frame payloads
# rather than the `frame_sample` stub shape above. The container is the
# engine's own trivial "KVID" format (magic + u32 frame count + u16 w/h +
# n_frames × w·h grayscale bytes) because real codec parsing (H.264/VP9)
# needs external libraries — that boundary stays behind
# ``decode_image``'s documented NotImplementedError stub; everything
# Spark-side (schema, Arrow batching, per-frame explode, aggregation) is
# the production shape.
# --------------------------------------------------------------------------
VIDEO_W = VIDEO_H = 8
VIDEO_SAMPLE_STEP = 4


def synthesize_video(docs: DataFrame) -> DataFrame:
    """KVID container with REAL frame payloads: pixel p of frame f of
    doc d is ``(d*31 + f*7 + p*3) % 256`` — deterministic and
    SQL-replayable; doc d carries ``d % 24 + 4`` frames."""
    import numpy as np
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 24 + 4
                f = np.arange(n).reshape(-1, 1)
                p = np.arange(VIDEO_W * VIDEO_H).reshape(1, -1)
                px = ((did * 31 + f * 7 + p * 3) % 256).astype(np.uint8)
                blobs.append(
                    b"KVID"
                    + n.to_bytes(4, "little")
                    + VIDEO_W.to_bytes(2, "little")
                    + VIDEO_H.to_bytes(2, "little")
                    + px.tobytes()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id BIGINT, blob BINARY"
    )


def sample_video_frames(
    df: DataFrame, step: int = VIDEO_SAMPLE_STEP
) -> DataFrame:
    """Parse each KVID blob and emit one row per SAMPLED frame (every
    ``step``-th), carrying the frame's exact integer pixel sum — the
    per-frame feature a real pipeline would replace with an embedding.

    The frame stride-slice is a zero-copy numpy reshape over the blob;
    unsampled frames are never materialized as rows. Blobs stay inside
    the executor; only (doc_id, frame_idx, scalars) leave the stage."""
    import numpy as np
    import pandas as pd

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "frame_idx": [],
                   "frame_sum": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                if blob[:4] != b"KVID":
                    continue  # non-video blob: skip, never crash the task
                n = int.from_bytes(blob[4:8], "little")
                w = int.from_bytes(blob[8:10], "little")
                h = int.from_bytes(blob[10:12], "little")
                arr = np.frombuffer(blob[12:], dtype=np.uint8).reshape(
                    n, w * h
                )
                for fi in range(0, n, step):
                    out["doc_id"].append(int(did))
                    out["n_frames"].append(n)
                    out["frame_idx"].append(fi)
                    out["frame_sum"].append(int(arr[fi].sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        sample,
        schema="doc_id BIGINT, n_frames BIGINT, frame_idx BIGINT, "
               "frame_sum BIGINT",
    )


@query(
    "m5_video_frame_sample",
    oracle=f"""
    WITH d AS (SELECT doc_id, doc_id % 24 + 4 AS n_frames FROM documents),
    fr AS (SELECT doc_id, n_frames,
                  unnest(range(0, n_frames, {VIDEO_SAMPLE_STEP}))
                    AS frame_idx FROM d),
    px AS (SELECT doc_id, n_frames, frame_idx,
                  unnest(range(0, {VIDEO_W * VIDEO_H})) AS p FROM fr),
    s AS (SELECT doc_id, n_frames, frame_idx,
                 sum((doc_id*31 + frame_idx*7 + p*3) % 256) AS fs
          FROM px GROUP BY 1,2,3)
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           count(*) AS n_sampled, CAST(sum(fs) AS BIGINT) AS sum_px,
           round(sum(fs)/(count(*)*{float(VIDEO_W * VIDEO_H)}), 4)
             AS mean_px
    FROM s GROUP BY doc_id, n_frames ORDER BY doc_id
    """,
)
def m5_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: synthesize real raw-frame videos from doc_id formulas,
    chunk-parse the container, stride-sample every 4th frame, and
    aggregate exact per-frame pixel sums per video. The oracle
    recomputes every sampled pixel from the formula, so a header-offset,
    stride, frame-count, or sampling-phase bug flips the hash.

    Scale: synthesis and sampling are Arrow-batched mapInPandas stages
    with no shuffle — frames are decoded where the blob lives and only
    per-frame scalar rows (frames/step per video) cross into the
    per-video aggregate; 100 TB of video is embarrassingly parallel in
    the same way as m1-m4. Integer pixel sums keep every stage
    FP-exact."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    frames = sample_video_frames(synthesize_video(docs))
    return (
        frames.groupBy("doc_id", "n_frames")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("frame_sum").alias("sum_px"),
            F.round(
                F.sum("frame_sum")
                / (F.count(F.lit(1)) * (VIDEO_W * VIDEO_H)),
                4,
            ).alias("mean_px"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# M6 — REAL JPEG round-trip (operators/jpeg.py): baseline grayscale
# encode (blockwise DCT → quantize → huffman entropy code, byte
# stuffing) and full decode (marker walk → huffman → dequantize →
# inverse DCT), closing the compressed-image half of the codec boundary
# the way round 4's PNG work closed lossless images. The entry's images
# are FLAT PER 8×8 BLOCK under an all-ones quant table, which makes the
# lossy pipeline bit-EXACT (DC-only blocks, integer-exact quantization)
# and therefore fully SQL-oracle-able — the AC/run-length/ZRL paths and
# lossy behavior are property-tested in tests/test_jpeg.py instead.
# --------------------------------------------------------------------------
JPEG_GRID = 4  # blocks per side -> 32x32 images


def jpeg_roundtrip(docs: DataFrame) -> DataFrame:
    """Per doc: synthesize a 32×32 block-flat grayscale image from the
    doc_id formula, ENCODE it as a real baseline JPEG, DECODE the bytes
    back, and emit scalars computed from the DECODED pixels only."""
    import numpy as np
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        Q_ONES,
        decode_gray,
        encode_gray,
    )

    g = JPEG_GRID

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {
            "doc_id": [], "w": [], "h": [], "n_px": [],
            "sum_px": [], "min_px": [], "max_px": [], "jpeg_ok": [],
        }
        for pdf in batches:
            for did in pdf["doc_id"]:
                did = int(did)
                r = np.arange(g).reshape(-1, 1)
                c = np.arange(g).reshape(1, -1)
                blocks = ((did * 7 + r * 11 + c * 13) % 256).astype(
                    np.uint8
                )
                img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                dec = decode_gray(encode_gray(img, Q_ONES))
                out["doc_id"].append(did)
                out["h"].append(dec.shape[0])
                out["w"].append(dec.shape[1])
                out["n_px"].append(int(dec.size))
                out["sum_px"].append(int(dec.astype(np.int64).sum()))
                out["min_px"].append(int(dec.min()))
                out["max_px"].append(int(dec.max()))
                out["jpeg_ok"].append(bool((dec == img).all()))
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    return docs.select("doc_id").mapInPandas(
        run,
        schema="doc_id BIGINT, w BIGINT, h BIGINT, n_px BIGINT, "
               "sum_px BIGINT, min_px BIGINT, max_px BIGINT, "
               "jpeg_ok BOOLEAN",
    )


@query(
    "m6_jpeg_roundtrip",
    oracle=f"""
    WITH b AS (SELECT doc_id, unnest(range(0, {JPEG_GRID})) AS r
               FROM documents),
    bc AS (SELECT doc_id, r, unnest(range(0, {JPEG_GRID})) AS c FROM b),
    px AS (SELECT doc_id, (doc_id*7 + r*11 + c*13) % 256 AS v FROM bc)
    SELECT doc_id,
           CAST({JPEG_GRID * 8} AS BIGINT) AS w,
           CAST({JPEG_GRID * 8} AS BIGINT) AS h,
           CAST({JPEG_GRID * JPEG_GRID * 64} AS BIGINT) AS n_px,
           CAST(sum(v) * 64 AS BIGINT) AS sum_px,
           CAST(min(v) AS BIGINT) AS min_px,
           CAST(max(v) AS BIGINT) AS max_px,
           TRUE AS jpeg_ok
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
)
def m6_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: per-doc scalars computed from pixels that traveled the FULL
    JPEG pipeline — blockwise DCT, quantization, zigzag, huffman
    entropy coding with byte stuffing, then the complete inverse on
    decode. The oracle recomputes every block value from the synthesis
    formula and asserts `jpeg_ok` TRUE: any codec bug — a wrong
    huffman table, a zigzag slip, a DC-prediction error, a stuffing
    mishap — yields non-identical pixels and flips the hash.

    Block-flat images under the all-ones quant table are the
    exactness anchor (DC-only, integer-exact); lossy behavior, AC
    runs, and golden bytes are pinned in tests/test_jpeg.py.

    Scale: same shape as m1-m5 — Arrow-batched mapInPandas, no
    shuffle, compressed bytes never leave the executor."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return jpeg_roundtrip(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# M6B — COLOR JPEG round-trip: baseline 3-component YCbCr 4:2:0
# (operators/jpeg.py encode_rgb420/decode_color — BT.601 transform,
# chroma box-subsampling, interleaved MCUs, both Annex K quant tables,
# all four huffman tables). The entry's images are CONSTANT-COLOR per
# 16×16 MCU under all-ones quant tables, which makes the full lossy
# color pipeline bit-EXACT (flat chroma survives the 2×2 box average
# losslessly; flat Y/Cb/Cr blocks are DC-only with sub-half-LSB total
# reconstruction error) and therefore SQL-oracle-able per channel.
# Lossy color behavior and golden bytes are pinned in tests/test_jpeg.py.
# --------------------------------------------------------------------------
JPEG_COLOR_TILES = 2  # MCU tiles per side -> 32x32x3 images


def jpeg_color_roundtrip(docs: DataFrame) -> DataFrame:
    """Per doc: synthesize a 32×32 RGB image of four constant MCU tiles
    from the doc_id formula, ENCODE as a real 4:2:0 color JPEG, DECODE,
    and emit per-channel scalars from the DECODED pixels only."""
    import numpy as np
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        Q_ONES,
        decode_color,
        encode_rgb420,
    )

    g = JPEG_COLOR_TILES

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {
            "doc_id": [], "w": [], "h": [],
            "sum_r": [], "sum_g": [], "sum_b": [], "rgb_ok": [],
        }
        for pdf in batches:
            for did in pdf["doc_id"]:
                did = int(did)
                img = np.zeros((g * 16, g * 16, 3), dtype=np.uint8)
                t = 0
                for ty in range(0, g * 16, 16):
                    for tx in range(0, g * 16, 16):
                        img[ty : ty + 16, tx : tx + 16] = [
                            (did * 7 + t * 29) % 256,
                            (did * 11 + t * 31) % 256,
                            (did * 13 + t * 37) % 256,
                        ]
                        t += 1
                dec = decode_color(encode_rgb420(img, Q_ONES, Q_ONES))
                out["doc_id"].append(did)
                out["h"].append(dec.shape[0])
                out["w"].append(dec.shape[1])
                for ch, k in enumerate(("sum_r", "sum_g", "sum_b")):
                    out[k].append(int(dec[..., ch].astype(np.int64).sum()))
                out["rgb_ok"].append(bool((dec == img).all()))
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    return docs.select("doc_id").mapInPandas(
        run,
        schema="doc_id BIGINT, w BIGINT, h BIGINT, sum_r BIGINT, "
               "sum_g BIGINT, sum_b BIGINT, rgb_ok BOOLEAN",
    )


@query(
    "m6b_jpeg_color_roundtrip",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      unnest(range(0, {JPEG_COLOR_TILES * JPEG_COLOR_TILES}))
                        AS t
               FROM documents),
    px AS (SELECT doc_id,
                  (doc_id*7 + t*29) % 256 AS r,
                  (doc_id*11 + t*31) % 256 AS g,
                  (doc_id*13 + t*37) % 256 AS b
           FROM t)
    SELECT doc_id,
           CAST({JPEG_COLOR_TILES * 16} AS BIGINT) AS w,
           CAST({JPEG_COLOR_TILES * 16} AS BIGINT) AS h,
           CAST(sum(r) * 256 AS BIGINT) AS sum_r,
           CAST(sum(g) * 256 AS BIGINT) AS sum_g,
           CAST(sum(b) * 256 AS BIGINT) AS sum_b,
           TRUE AS rgb_ok
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
)
def m6b_jpeg_color_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6B: per-doc per-channel scalars from pixels that traveled the
    FULL color JPEG pipeline — BT.601 forward transform, 4:2:0 chroma
    subsampling, interleaved-MCU DCT/huffman encode, complete decode,
    inverse transform. The oracle recomputes every tile's RGB from the
    synthesis formula and asserts `rgb_ok` TRUE: a sampling-factor
    slip, a chroma-table mixup, a per-component DC-predictor error, or
    an MCU-order bug yields non-identical pixels and flips the hash.

    Scale: identical shape to m6 — Arrow-batched mapInPandas, no
    shuffle, compressed bytes never leave the executor."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return jpeg_color_roundtrip(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# M7 — audio SPECTRAL analysis: a real DFT (np.fft engine path; an
# independent explicit-basis matmul is the pytest oracle — no audio
# library) over the decoded PCM stream — the feature-extraction stage an
# audio training pipeline runs after m4's sample-domain work (band
# energies / spectral fingerprints for dedup and quality gates). Two
# spectrum-derived quantities close the loop against SQL: the DC-bin
# energy |X₀|²/n equals (Σx)²/n computed straight off the sample
# formula, and Parseval's identity (Σ|X_k|² = n·Σx²) must hold to
# 1e-9 relative — both only come out right if the transform actually IS
# a DFT over exactly the decoded samples. The band-energy profile
# itself is cross-checked against numpy.fft in pytest (an independent
# implementation), since SQL cannot fit a Fourier basis.
# --------------------------------------------------------------------------
M7_BANDS = 8


def audio_spectrum(df: DataFrame) -> DataFrame:
    """Per-doc spectral scalars from a full complex DFT of the decoded
    PCM samples: n, exact time-domain energy, DC-bin energy, the
    strongest non-DC band (of M7_BANDS over the 0..n/2 half-spectrum),
    and the Parseval check."""
    import numpy as np
    import pandas as pd

    out_schema = (
        "doc_id BIGINT, n BIGINT, sum_sq BIGINT, dc_energy DOUBLE, "
        "top_band BIGINT, parseval_ok BOOLEAN"
    )

    def spectrum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(blob)
                if decoded is None:
                    continue
                _, s = decoded
                n = len(s)
                x = s.astype(np.float64)
                # O(n log n) FFT; the O(n²) explicit basis matmul is
                # the independent pytest oracle (test_multimodal.py),
                # which pins that this IS the DFT of exactly x
                spec = np.fft.fft(x)
                power = (spec.real**2 + spec.imag**2)
                sum_sq = int((s * s).sum())
                parseval = abs(power.sum() / n - float(sum_sq)) <= (
                    1e-9 * max(float(sum_sq), 1.0)
                )
                half = power[: n // 2 + 1]
                # band b covers bins [1 + b*(len-1)//BANDS, ...) of the
                # non-DC half-spectrum; ties break toward the lower band
                nb = len(half) - 1
                bands = np.zeros(M7_BANDS)
                for b in range(M7_BANDS):
                    lo = 1 + (nb * b) // M7_BANDS
                    hi = 1 + (nb * (b + 1)) // M7_BANDS
                    if hi > lo:
                        bands[b] = half[lo:hi].sum()
                top = int(np.argmax(bands))
                # dc_energy emitted UNROUNDED: Python round() is
                # half-even (banker's) while DuckDB/F.round are
                # half-away-from-zero — callers apply r4 engine-side
                rows.append(
                    (
                        int(did), n, sum_sq,
                        float(power[0]) / n,
                        top, bool(parseval),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n", "sum_sq", "dc_energy",
                    "top_band", "parseval_ok",
                ],
            )

    return df.mapInPandas(spectrum, schema=out_schema)


@query(
    "m7_audio_spectrum",
    oracle=f"""
    WITH samp AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             ((doc_id*31 + CAST(u.i AS BIGINT)*17) % 2048) - 1024 AS v
      FROM documents, UNNEST(generate_series(0, {_M4_N} - 1)) u(i)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v*v) AS BIGINT) AS sum_sq,
           round(CAST(sum(v) AS DOUBLE) * sum(v) / count(*), 4)
             AS dc_energy,
           TRUE AS parseval_ok
    FROM samp GROUP BY doc_id ORDER BY doc_id
    """,
)
def m7_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: per-doc spectral scalars whose DFT-derived values the oracle
    recomputes from the sample formula — DC-bin energy must equal
    (Σx)²/n and Parseval must hold, so a basis error, a dropped/offset
    sample, or a power miscount flips the hash. top_band (not
    SQL-expressible) is cross-checked against numpy.fft in
    tests/test_multimodal.py and deliberately excluded here.

    Scale: identical shape to m1-m6 — Arrow-batched mapInPandas, no
    shuffle, samples never leave the executor; the transform is an
    O(n log n) FFT per doc (the O(n²) basis matmul lives only in the
    pytest oracle), so per-doc cost stays tractable at real clip
    lengths. dc_energy is rounded HERE with F.round (half-away-from-
    zero, matching DuckDB) — the operator emits it unrounded."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        audio_spectrum(synthesize_pcm_wav(docs))
        .drop("top_band")
        .withColumn("dc_energy", r4(F.col("dc_energy")))
        .select("doc_id", "n", "sum_sq", "dc_energy", "parseval_ok")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# M8 — 2D CONVOLUTION stencil over decoded image pixels (round-8
# surface, registered round 8). The one compute shape the
# m-family lacked: m2/m3 prove decode and resampling, m7 proves 1-D
# transform DSP — this proves a NEIGHBORHOOD operator (3×3 Laplacian),
# the building block of edge detection / blur / sharpening feature
# extraction. The synthetic luma plane is linear in (y, x) except at
# the %256 byte wraps, so the Laplacian response isolates exactly the
# wrap discontinuities — a nontrivial, fully formula-replayable signal.
# --------------------------------------------------------------------------


def image_laplacian_stats(df: DataFrame) -> DataFrame:
    """(doc_id, w, h, n_interior, lap_abs_sum, lap_max): 3×3 Laplacian
    (4·c − N − S − E − W) of the luma plane (r+g+b per pixel) of every
    decodable 8-bit PNG blob, aggregated over INTERIOR pixels only
    (borders have no full neighborhood; a padded variant is a policy
    choice, not a different dataflow). Non-PNG rows are dropped.

    Scale: the m-family shape — Arrow-batched mapInPandas, no shuffle,
    pixels never leave the executor; the stencil is four vectorized
    numpy shifts per image (no Python per-pixel loop), O(w·h) per doc,
    and only 6 scalars per image survive."""
    import numpy as np
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        png_pixel_array,
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                px = png_pixel_array(bytes(blob))
                if px is None:
                    continue
                h, stride = px.shape
                w = stride // 3
                if w < 3 or h < 3:
                    continue
                luma = (
                    px.reshape(h, w, 3).astype(np.int64).sum(axis=2)
                )  # (h, w)
                c = luma[1:-1, 1:-1]
                lap = (
                    4 * c
                    - luma[:-2, 1:-1]
                    - luma[2:, 1:-1]
                    - luma[1:-1, :-2]
                    - luma[1:-1, 2:]
                )
                out.append(
                    (
                        int(did),
                        w,
                        h,
                        int(c.size),
                        int(np.abs(lap).sum()),
                        int(np.abs(lap).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "w", "h", "n_interior",
                    "lap_abs_sum", "lap_max",
                ],
            )

    return df.select("doc_id", "blob").mapInPandas(
        stats,
        schema="doc_id bigint, w int, h int, n_interior bigint, "
        "lap_abs_sum bigint, lap_max bigint",
    )


# Oracle: replay the pixel formula (synthesize_media's PNG scanlines:
# byte j of row y is (doc_id + y + j) % 256, so luma(y, x) =
# Σ_{c<3} (doc_id + y + 3x + c) % 256) over every interior cell and
# apply the same 5-point stencil relationally. generate_series blows
# the plane up to w·h rows per image — fine at oracle scale, and the
# POINT: the engine path never materializes cells off the executor.
M8_ORACLE = """
    WITH png AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents WHERE doc_id % 4 = 0 AND doc_id % 64 + 1 >= 3
        AND doc_id % 48 + 1 >= 3
    ), cells AS (
      SELECT doc_id, w, h, gy.y AS y, gx.x AS x,
             (doc_id + gy.y + 3 * gx.x) % 256
           + (doc_id + gy.y + 3 * gx.x + 1) % 256
           + (doc_id + gy.y + 3 * gx.x + 2) % 256 AS luma
      FROM png, generate_series(0, 47) gy(y), generate_series(0, 63) gx(x)
      WHERE gy.y < h AND gx.x < w
    ), lap AS (
      SELECT c.doc_id, c.w, c.h,
             4 * c.luma - n.luma - s.luma - e.luma - wst.luma AS v
      FROM cells c
      JOIN cells n  ON n.doc_id = c.doc_id AND n.y = c.y - 1 AND n.x = c.x
      JOIN cells s  ON s.doc_id = c.doc_id AND s.y = c.y + 1 AND s.x = c.x
      JOIN cells e  ON e.doc_id = c.doc_id AND e.y = c.y AND e.x = c.x + 1
      JOIN cells wst ON wst.doc_id = c.doc_id AND wst.y = c.y
                    AND wst.x = c.x - 1
      WHERE c.y BETWEEN 1 AND c.h - 2 AND c.x BETWEEN 1 AND c.w - 2
    )
    SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
           CAST(count(*) AS BIGINT) AS n_interior,
           CAST(sum(abs(v)) AS BIGINT) AS lap_abs_sum,
           CAST(max(abs(v)) AS BIGINT) AS lap_max
    FROM lap GROUP BY doc_id, w, h ORDER BY doc_id
"""


@query("m8_image_convolution", oracle=M8_ORACLE)
def m8_image_convolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: 3×3 Laplacian energy of every synthesized PNG, driver-checked
    against a full relational replay of the pixel formula and the
    stencil (self-joined generate_series plane). Any error in decode,
    row geometry, the neighborhood offsets, or the border exclusion
    shifts at least one doc's sums and flips the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return image_laplacian_stats(synthesize_media(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M9 — PERCEPTUAL HASH (dHash) of every decoded PNG (round-8 surface).
# The image-side counterpart of the text fingerprints (t4/d3): a
# 64-bit gradient hash — nearest-neighbor 9×8 luma thumbnail, one bit
# per horizontal neighbor comparison — that is invariant to scale and
# near-invariant to brightness/compression noise, the standard blocking
# key for image near-dup dedup (two images are candidates iff their
# dHashes are hamming-close; d3's banded hamming join applies verbatim
# with dhash in place of simhash).
#
# The hash is emitted as 16 hex chars (8 MSB-first row bytes), not a
# BIGINT: bit 63 of a 64-bit hash overflows a signed bigint in BOTH
# engines, and the hex-string form round-trips exactly. The oracle
# replays the whole construction relationally from the synthetic pixel
# formula — sampling grid, luma, neighbor comparisons, bit packing,
# hex rendering — so an index-map slip, a comparison direction flip,
# or an endianness mistake flips the hash.
#
# Scale: identical shape to m3 — Arrow-batched mapInPandas, no
# shuffle, blobs never leave the executor, 16 bytes out per image.
# --------------------------------------------------------------------------
M9_ORACLE = """
    WITH png AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents WHERE doc_id % 4 = 0
    ), cells AS (
      SELECT doc_id, w, h, gy.y AS y, gx.x AS x,
             (doc_id + (gy.y * h) // 8 + 3 * ((gx.x * w) // 9)) % 256
           + (doc_id + (gy.y * h) // 8 + 3 * ((gx.x * w) // 9) + 1) % 256
           + (doc_id + (gy.y * h) // 8 + 3 * ((gx.x * w) // 9) + 2) % 256
             AS luma
      FROM png, generate_series(0, 7) gy(y), generate_series(0, 8) gx(x)
    ), bits AS (
      SELECT a.doc_id, a.w, a.h, a.y, a.x,
             CASE WHEN a.luma < b.luma THEN 1 ELSE 0 END AS bit
      FROM cells a
      JOIN cells b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      WHERE a.x < 8
    ), rowbytes AS (
      SELECT doc_id, w, h, y,
             CAST(sum(bit * power(2, 7 - x)) AS BIGINT) AS rowbyte
      FROM bits GROUP BY doc_id, w, h, y
    )
    SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
           string_agg(printf('%02x', rowbyte), '' ORDER BY y) AS dhash
    FROM rowbytes GROUP BY doc_id, w, h ORDER BY doc_id
"""


def image_dhash(df: DataFrame) -> DataFrame:
    """(doc_id, w, h, dhash): 64-bit gradient perceptual hash of every
    decodable PNG blob as 16 hex chars — luma thumbnail cell (Y, X)
    samples source pixel ((Y*h)//8, (X*w)//9); bit (Y, X) is set iff
    cell (Y, X) is darker than its right neighbor; rows pack MSB-first
    (numpy packbits semantics)."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                px = png_pixel_array(bytes(blob))
                if px is None:
                    continue
                h, stride = px.shape
                w = stride // 3
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                rgb = px.reshape(h, w, 3).astype(np.int64)
                thumb = rgb[np.ix_(ys, xs)].sum(axis=2)  # (8, 9) luma
                bits = (thumb[:, :8] < thumb[:, 1:]).astype(np.uint8)
                rows.append(
                    (
                        int(did),
                        int(w),
                        int(h),
                        np.packbits(bits, axis=1).tobytes().hex(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "dhash"]
            )

    return df.select("doc_id", "blob").mapInPandas(
        extract, schema="doc_id BIGINT, w INT, h INT, dhash STRING"
    )


@query("m9_perceptual_hash", oracle=M9_ORACLE)
def m9_perceptual_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9: dHash fingerprint of every synthesized PNG, driver-checked
    against a full relational replay of sampling, luma, comparison,
    and MSB-first packing (see the section comment). The hamming
    near-dup JOIN over these hashes is d3's banded machinery verbatim;
    this entry pins the fingerprint itself through the REAL decode
    path (inflate + defilter + resample)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return image_dhash(synthesize_media(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M10 — windowed audio ENERGY analysis (round-10 surface, library-first;
# the @query registration is one decorator away). The voice-activity /
# energy-segmentation primitive: parse the RIFF/WAVE blob (the REAL
# chunk walk, decode_pcm), split samples into 32-sample non-overlapping
# windows, and compute per-doc exact INTEGER energy statistics — total
# and max window sum-of-squares plus the loud-window count (a window is
# loud iff sum_sq > 400k * window_len, the multiply form so neither
# engine divides). The oracle replays the synthetic PCM from its
# formula and re-windows with i // 32 — a header-parse slip, a window
# boundary error, a partial-tail mishandling, or an overflow flips the
# hash (fixture windows span mean-square 144..1,031,312; ~40% loud).
#
# Scale: Arrow-batched mapInPandas over the binary column — numpy does
# the windowing per batch, one pass, no shuffle before the final
# per-doc frame (the m7 spectrum envelope); blobs never leave their
# partition.
# --------------------------------------------------------------------------
M10_WINDOW = 32
M10_LOUD_MEAN_SQ = 400_000

M10_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             unnest(generate_series(0, doc_id % 400 + 1)) AS i
      FROM documents),
    samp AS (
      SELECT doc_id, i // {M10_WINDOW} AS w,
             (doc_id * 31 + i * 17) % 2048 - 1024 AS v
      FROM s),
    win AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS wlen,
             CAST(sum(v * v) AS BIGINT) AS sum_sq
      FROM samp GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(sum(wlen) AS BIGINT) AS n_samples,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(sum_sq) AS BIGINT) AS total_sq,
           CAST(max(sum_sq) AS BIGINT) AS max_window_sq,
           CAST(sum(CASE WHEN sum_sq > {M10_LOUD_MEAN_SQ} * wlen
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_loud
    FROM win GROUP BY doc_id ORDER BY doc_id
"""


def audio_energy_windows(df: DataFrame) -> DataFrame:
    """Per-doc exact windowed energy stats over a (doc_id, blob) frame
    of RIFF/WAVE audio — the real chunk-walk parse feeding integer
    numpy windowing."""
    import numpy as np
    import pandas as pd

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(bytes(blob))
                if decoded is None:
                    continue
                _, samples = decoded
                n = len(samples)
                n_win = -(-n // M10_WINDOW)
                sq = samples * samples
                wid = np.arange(n) // M10_WINDOW
                sums = np.bincount(wid, weights=sq).astype(np.int64)
                lens = np.bincount(wid).astype(np.int64)
                rows.append(
                    (
                        int(did),
                        int(n),
                        int(n_win),
                        int(sq.sum()),
                        int(sums.max()),
                        int((sums > M10_LOUD_MEAN_SQ * lens).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_windows",
                    "total_sq",
                    "max_window_sq",
                    "n_loud",
                ],
            )

    return df.mapInPandas(
        analyze,
        schema=(
            "doc_id BIGINT, n_samples BIGINT, n_windows BIGINT, "
            "total_sq BIGINT, max_window_sq BIGINT, n_loud BIGINT"
        ),
    )


@query("m10_audio_energy", oracle=M10_ORACLE)
def m10_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10: exact windowed energy statistics of every synthesized WAV,
    through the real RIFF parse — integer end to end, so the hash
    tolerates zero arithmetic drift."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return audio_energy_windows(synthesize_pcm_wav(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M11 — image NEAR-DUP census over dHash (round-11 surface, library-
# first; the @query registration is one decorator away). The promise
# m9 makes, kept: d3's banded hamming machinery verbatim with the
# 64-bit perceptual hash as the key. Bands = 4 x 16 bits (4 hex chars)
# — pigeonhole-complete for hamming <= 3 (a pair differing in <= 3
# bits leaves at least one band untouched); candidates verify by exact
# hamming (two 32-bit halves, xor + bit_count — integer-exact in both
# engines); the census reports, per image, its exact-duplicate count
# (d = 0) and its near-duplicate count (1 <= d <= 3).
#
# The oracle replays EVERYTHING relationally — the synthetic pixel
# formula, the thumbnail/luma/packing of m9, the banding, the xor
# hamming, the census — so this is a hash-verified near-dup join over
# a REAL decode path (inflate + defilter + resample on the engine
# side).
#
# Scale: identical shape to d3 — the posting shuffle is keyed on
# (band, 16-bit key), fan-out bounded by band-bucket population (the
# d1b cap lever applies if a band key ever goes viral); blobs never
# enter the join, only 16-hex fingerprints.
# --------------------------------------------------------------------------
M11_MAX_HAMMING = 3

_M9_BASE_SQL = M9_ORACLE.rsplit("ORDER BY", 1)[0]

M11_ORACLE = f"""
    WITH base AS ({_M9_BASE_SQL}),
    bands AS (
      SELECT doc_id, dhash, gb.b AS band,
             substr(dhash, gb.b * 4 + 1, 4) AS key
      FROM base, generate_series(0, 3) gb(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.dhash AS ah, b.dhash AS bh
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key
       AND a.doc_id <> b.doc_id),
    ham AS (
      SELECT a_id, b_id,
             bit_count(xor(CAST(('0x' || substr(ah, 1, 8)) AS BIGINT),
                           CAST(('0x' || substr(bh, 1, 8)) AS BIGINT)))
           + bit_count(xor(CAST(('0x' || substr(ah, 9, 8)) AS BIGINT),
                           CAST(('0x' || substr(bh, 9, 8)) AS BIGINT)))
               AS d
      FROM cand),
    census AS (
      SELECT a_id AS doc_id,
             sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS n_exact,
             sum(CASE WHEN d BETWEEN 1 AND {M11_MAX_HAMMING}
                 THEN 1 ELSE 0 END) AS n_near
      FROM ham GROUP BY a_id)
    SELECT b.doc_id,
           CAST(coalesce(c.n_exact, 0) AS BIGINT) AS n_exact,
           CAST(coalesce(c.n_near, 0) AS BIGINT) AS n_near
    FROM base b LEFT JOIN census c USING (doc_id)
    ORDER BY b.doc_id
"""


def dhash_neardup_census(
    hashes: DataFrame, max_hamming: int = M11_MAX_HAMMING
) -> DataFrame:
    """(doc_id, n_exact, n_near) over a (doc_id, dhash) frame — the
    banded-complete hamming census, factored so tests can drive
    synthetic hash sets across the pigeonhole boundary."""
    bands = hashes.select(
        "doc_id",
        "dhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "key", F.expr("substring(dhash, band * 4 + 1, 4)")
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"),
        F.col("dhash").alias("ah"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        F.col("dhash").alias("bh"),
        "band",
        "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", "ah", "bh")
        .dropDuplicates(["a_id", "b_id"])
    )
    half = lambda c, p: F.conv(F.substring(c, p, 8), 16, 10).cast("bigint")
    d = (
        F.bit_count(half(F.col("ah"), 1).bitwiseXOR(half(F.col("bh"), 1)))
        + F.bit_count(half(F.col("ah"), 9).bitwiseXOR(half(F.col("bh"), 9)))
    )
    ham = cand.withColumn("d", d)
    census = ham.groupBy(F.col("a_id").alias("doc_id")).agg(
        F.sum((F.col("d") == 0).cast("bigint")).alias("n_exact"),
        F.sum(
            ((F.col("d") >= 1) & (F.col("d") <= max_hamming)).cast(
                "bigint"
            )
        ).alias("n_near"),
    )
    return (
        hashes.select("doc_id")
        .join(census, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_exact"), F.lit(0))
            .cast("bigint")
            .alias("n_exact"),
            F.coalesce(F.col("n_near"), F.lit(0))
            .cast("bigint")
            .alias("n_near"),
        )
        .orderBy("doc_id")
    )


@query("m11_image_neardup_census", oracle=M11_ORACLE)
def m11_image_neardup_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """M11: per-image exact/near duplicate counts under hamming <= 3
    over the real-decode dHashes — a banding slip (incomplete
    candidates), an xor/bit_count error, or a dropped isolated image
    flips the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    # Materialize the fingerprints ONCE (r13 optimization round): the
    # census reads this frame three ways (both band self-join sides +
    # the isolated-image base), and each reference re-ran the full
    # synthesize → PNG decode → resample → dHash Python chain — the
    # pre-change plan carried 12 Python-eval nodes for one logical
    # pass (guide §4.4). (doc_id, 16-hex dhash) is the cheapest
    # possible materialization; the decode now runs exactly once
    # (non-replicated local storage: executor loss ⇒ job retry).
    hashes = (
        image_dhash(synthesize_media(docs))
        .select("doc_id", "dhash")
        .localCheckpoint(eager=False)
    )
    return dhash_neardup_census(hashes)


# --------------------------------------------------------------------------
# M12 — video SCENE-CHANGE detection (round-11 surface, library-first;
# the @query registration is one decorator away). The shot-boundary
# primitive every video-curation pipeline runs before sampling: score
# each CONSECUTIVE frame pair by the exact integer sum of absolute
# pixel deltas, flag a cut when the pair's total delta crosses the
# threshold, report per-video cut accounting. The synthetic pixel
# formula makes per-pair deltas genuinely vary (the +7 frame shift
# wraps mod 256 on a per-(doc, frame) varying pixel subset, so a cut
# here is "pair with at least one wrapping pixel") and the oracle
# replays every pixel of every pair relationally — a pairing
# off-by-one, an unsigned-underflow in the delta, or a threshold
# boundary slip flips the hash.
#
# Scale: the m5 shape — Arrow-batched mapInPandas where the blob
# lives, one numpy abs-diff per pair, only (doc_id, pair_idx, scalar)
# rows leave the stage; no shuffle before the per-video aggregate.
# --------------------------------------------------------------------------
M12_CUT_THRESHOLD = 10 * VIDEO_W * VIDEO_H  # mean abs delta >= 10


def frame_delta_profile(df: DataFrame) -> DataFrame:
    """(doc_id, pair_idx, delta_sum) for every consecutive frame pair
    of every KVID blob — exact integer arithmetic (int32 diffs, never
    uint8 underflow)."""
    import numpy as np
    import pandas as pd

    def deltas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "pair_idx": [], "delta_sum": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                if blob[:4] != b"KVID":
                    continue
                n = int.from_bytes(blob[4:8], "little")
                w = int.from_bytes(blob[8:10], "little")
                h = int.from_bytes(blob[10:12], "little")
                arr = (
                    np.frombuffer(blob[12:], dtype=np.uint8)
                    .reshape(n, w * h)
                    .astype(np.int32)
                )
                d = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
                for i, s in enumerate(d):
                    out["doc_id"].append(int(did))
                    out["pair_idx"].append(i)
                    out["delta_sum"].append(int(s))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        deltas,
        schema="doc_id BIGINT, pair_idx BIGINT, delta_sum BIGINT",
    )


M12_ORACLE = f"""
    WITH d AS (SELECT doc_id, doc_id % 24 + 4 AS n_frames
               FROM documents),
    pr AS (SELECT doc_id, n_frames,
                  unnest(range(0, n_frames - 1)) AS pair_idx FROM d),
    px AS (SELECT doc_id, n_frames, pair_idx,
                  unnest(range(0, {VIDEO_W * VIDEO_H})) AS p FROM pr),
    ds AS (SELECT doc_id, n_frames, pair_idx,
                  sum(abs((doc_id*31 + (pair_idx+1)*7 + p*3) % 256
                        - (doc_id*31 + pair_idx*7 + p*3) % 256)) AS s
           FROM px GROUP BY 1, 2, 3)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN s >= {M12_CUT_THRESHOLD}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           CAST(max(s) AS BIGINT) AS max_delta,
           CAST(sum(s) AS BIGINT) AS total_delta
    FROM ds GROUP BY doc_id ORDER BY doc_id
"""


@query("m12_scene_change_detect", oracle=M12_ORACLE)
def m12_scene_change_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """M12: per-video cut accounting under the exact-delta threshold —
    every consecutive pair scored through the REAL container parse,
    flagged, and aggregated; the oracle recomputes every pixel delta
    from the synthesis formula."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = frame_delta_profile(synthesize_video(docs))
    cut = (F.col("delta_sum") >= M12_CUT_THRESHOLD).cast("bigint")
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(cut).alias("n_cuts"),
            F.max("delta_sum").alias("max_delta"),
            F.sum("delta_sum").alias("total_delta"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# M13 — DOMINANT-COLOR census: quantize every decoded PNG pixel to a
# 9-bit color bucket (3 bits per channel) and report each image's
# dominant bucket, its population, and the image's palette width. The
# color-profile primitive behind thumbnail clustering, near-dup
# triage (palette histograms survive recompression better than bytes)
# and content filters (flesh-tone / flat-screenshot heuristics). Ties
# break to the LOWEST bucket id (np.argmax-first semantics, replayed
# as ORDER BY cnt DESC, bucket ASC).
#
# The engine path is the REAL decode (zlib inflate + filter-0 strip)
# via png_pixel_array; the oracle replays the synthetic pixel formula
# relationally — pixel (x, y) of doc d has r = (d + y + 3x) % 256 and
# g, b its +1/+2 successors, so buckets, counts, and the argmax are
# all integer-exact in both engines.
#
# Scale: per-image bounded Arrow-batched mapInPandas (numpy bincount
# per image), no shuffle before the K-row presentation sort; blobs
# never leave their partition.
# --------------------------------------------------------------------------
M13_SHIFT = 5  # 3 significant bits per channel -> 512 buckets

M13_ORACLE = """
    WITH png AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents WHERE doc_id % 4 = 0),
    ys AS (
      SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y
      FROM png),
    cells AS (
      SELECT doc_id, w, h, y, unnest(generate_series(0, w - 1)) AS x
      FROM ys),
    px AS (
      SELECT doc_id, w, h,
             ((doc_id + y + 3 * x) % 256) // 32 * 64
           + ((doc_id + y + 3 * x + 1) % 256) // 32 * 8
           + ((doc_id + y + 3 * x + 2) % 256) // 32 AS bucket
      FROM cells),
    hist AS (
      SELECT doc_id, w, h, bucket, count(*) AS cnt
      FROM px GROUP BY doc_id, w, h, bucket),
    ranked AS (
      SELECT doc_id, w, h, bucket, cnt,
             count(*) OVER (PARTITION BY doc_id) AS n_buckets,
             sum(cnt) OVER (PARTITION BY doc_id) AS n_pixels,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY cnt DESC, bucket ASC) AS rk
      FROM hist)
    SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
           CAST(n_pixels AS BIGINT) AS n_pixels,
           CAST(bucket AS BIGINT) AS dom_bucket,
           CAST(cnt AS BIGINT) AS dom_count,
           CAST(n_buckets AS BIGINT) AS n_buckets
    FROM ranked WHERE rk = 1 ORDER BY doc_id
"""


def dominant_color(df: DataFrame) -> DataFrame:
    """(doc_id, w, h, n_pixels, dom_bucket, dom_count, n_buckets) per
    decodable PNG blob — 9-bit quantized histogram, argmax with
    lowest-bucket tie-break."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                px = png_pixel_array(bytes(blob))
                if px is None:
                    continue
                h, stride = px.shape
                w = stride // 3
                rgb = px.reshape(h, w, 3).astype(np.int64)
                buckets = (
                    (rgb[:, :, 0] >> M13_SHIFT) * 64
                    + (rgb[:, :, 1] >> M13_SHIFT) * 8
                    + (rgb[:, :, 2] >> M13_SHIFT)
                ).ravel()
                counts = np.bincount(buckets, minlength=512)
                dom = int(counts.argmax())  # first max = lowest bucket
                rows.append(
                    (
                        int(did), int(w), int(h), int(buckets.size),
                        dom, int(counts[dom]),
                        int((counts > 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "w", "h", "n_pixels",
                    "dom_bucket", "dom_count", "n_buckets",
                ],
            )

    return df.select("doc_id", "blob").mapInPandas(
        extract,
        schema=(
            "doc_id BIGINT, w INT, h INT, n_pixels BIGINT, "
            "dom_bucket BIGINT, dom_count BIGINT, n_buckets BIGINT"
        ),
    )


@query("m13_dominant_color", oracle=M13_ORACLE)
def m13_dominant_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13: the dominant 9-bit color bucket of every synthesized PNG
    through the real decode — a channel-order slip (RGB vs BGR flips
    the bucket arithmetic), a quantization off-by-one, or an argmax
    tie-break difference flips the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return dominant_color(synthesize_media(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M14 — SILENCE-RUN segmentation: per WAV, the silent-sample count,
# the number of maximal silent runs, and the longest run, where a
# sample is silent iff |v| < 256 (one-eighth of the int16 fixture
# headroom). The voice-activity primitive m10's windowed energy
# cannot express: runs are BOUNDARY-exact (a run is maximal, not a
# window artifact), which is what silence trimming and utterance
# splitting actually consume. Integer end to end.
#
# The engine is a numpy run-length encode per blob through the REAL
# RIFF parse (decode_pcm); the oracle replays the PCM formula and
# finds runs with the gaps-and-islands idiom (i - row_number() over
# silent samples) — the q90 pattern at sample granularity.
#
# Scale: per-blob bounded Arrow-batched mapInPandas, no shuffle;
# run-length encoding is one vectorized diff per blob.
# --------------------------------------------------------------------------
M14_SILENCE_ABS = 256

M14_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             unnest(generate_series(0, doc_id % 400 + 1)) AS i
      FROM documents),
    samp AS (
      SELECT doc_id, i,
             CASE WHEN abs((doc_id * 31 + i * 17) % 2048 - 1024)
                       < {M14_SILENCE_ABS}
                  THEN 1 ELSE 0 END AS sil
      FROM s),
    isl AS (
      SELECT doc_id, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS k
      FROM samp WHERE sil = 1),
    runs AS (
      SELECT doc_id, k, count(*) AS run_len
      FROM isl GROUP BY doc_id, k),
    agg AS (
      SELECT doc_id, sum(run_len) AS n_silent,
             count(*) AS n_runs, max(run_len) AS max_run
      FROM runs GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.doc_id % 400 + 2 AS BIGINT) AS n_samples,
           CAST(coalesce(a.n_silent, 0) AS BIGINT) AS n_silent,
           CAST(coalesce(a.n_runs, 0) AS BIGINT) AS n_silent_runs,
           CAST(coalesce(a.max_run, 0) AS BIGINT) AS max_silent_run
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


def silence_runs(df: DataFrame) -> DataFrame:
    """(doc_id, n_samples, n_silent, n_silent_runs, max_silent_run)
    per decodable WAV blob — maximal-run statistics under the
    |v| < M14_SILENCE_ABS gate."""
    import numpy as np
    import pandas as pd

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(bytes(blob))
                if decoded is None:
                    continue
                _, samples = decoded
                sil = np.abs(samples) < M14_SILENCE_ABS
                # run-length encode: boundaries where the flag changes
                if sil.any():
                    edges = np.flatnonzero(np.diff(sil.astype(np.int8)))
                    starts = np.r_[0, edges + 1]
                    ends = np.r_[edges, len(sil) - 1]
                    lens = ends - starts + 1
                    silent_lens = lens[sil[starts]]
                    n_runs = int(silent_lens.size)
                    max_run = int(silent_lens.max())
                else:
                    n_runs = max_run = 0
                rows.append(
                    (
                        int(did), int(len(samples)), int(sil.sum()),
                        n_runs, max_run,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_silent",
                    "n_silent_runs", "max_silent_run",
                ],
            )

    return df.mapInPandas(
        analyze,
        schema=(
            "doc_id BIGINT, n_samples BIGINT, n_silent BIGINT, "
            "n_silent_runs BIGINT, max_silent_run BIGINT"
        ),
    )


@query("m14_silence_runs", oracle=M14_ORACLE)
def m14_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14: maximal silent-run statistics of every synthesized WAV
    through the real RIFF parse — a run split at a window boundary, a
    threshold compare slip (<= for <), or a lost zero-silence doc
    (LEFT join semantics) flips the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return silence_runs(synthesize_pcm_wav(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M15 — PATCH-GRID statistics (round-10 wave 4): partition every
# decoded PNG into a 4x4 patch grid (ViT patchify — the preprocessing
# every vision-transformer training pipeline runs before embedding)
# and emit per-patch pixel count and exact per-channel sums. Patch
# assignment uses the resolution-agnostic integer rule
# cell = (coord * GRID) div extent, so any width/height (including
# sizes not divisible by 4) partitions exhaustively with no pixel
# counted twice — an off-by-one at a patch seam moves mass between
# patches and flips the hash.
#
# The engine path is the REAL decode (zlib inflate + defilter) via
# png_pixel_array with a vectorized numpy bincount per patch; the
# oracle replays the synthetic pixel formula relationally
# (pixel (x, y) of doc d: r = (d + y + 3x) % 256, g/b its +1/+2
# successors), so counts and sums are integer-exact in both engines.
#
# Scale: per-image bounded Arrow-batched mapInPandas, no shuffle
# before the presentation sort; output is 16 rows per image whatever
# the resolution — the fixed-fanout shape a 100 TB patch-embedding
# feed wants (patches stream straight into the encoder batch).
# --------------------------------------------------------------------------
M15_GRID = 4

M15_ORACLE = f"""
    WITH png AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents WHERE doc_id % 4 = 0),
    ys AS (
      SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y
      FROM png),
    cells AS (
      SELECT doc_id, w, h, y, unnest(generate_series(0, w - 1)) AS x
      FROM ys),
    px AS (
      SELECT doc_id,
             (y * {M15_GRID}) // h AS cell_y,
             (x * {M15_GRID}) // w AS cell_x,
             (doc_id + y + 3 * x) % 256 AS r,
             (doc_id + y + 3 * x + 1) % 256 AS g,
             (doc_id + y + 3 * x + 2) % 256 AS b
      FROM cells)
    SELECT doc_id, CAST(cell_y AS INT) AS cell_y,
           CAST(cell_x AS INT) AS cell_x,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, cell_y, cell_x
    ORDER BY doc_id, cell_y, cell_x
"""


def patch_grid_stats(df: DataFrame, grid: int = M15_GRID) -> DataFrame:
    """(doc_id, cell_y, cell_x, n_px, sum_r, sum_g, sum_b) per
    decodable PNG blob — exhaustive integer patchify, vectorized per
    image."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                px = png_pixel_array(bytes(blob))
                if px is None:
                    continue
                h, stride = px.shape
                w = stride // 3
                rgb = px.reshape(h, w, 3).astype(np.int64)
                cy = (np.arange(h) * grid) // h
                cx = (np.arange(w) * grid) // w
                cell = (cy[:, None] * grid + cx[None, :]).ravel()
                n = np.bincount(cell, minlength=grid * grid)
                sums = [
                    np.bincount(
                        cell,
                        weights=rgb[:, :, ch].ravel(),
                        minlength=grid * grid,
                    ).astype(np.int64)
                    for ch in range(3)
                ]
                for c in range(grid * grid):
                    if n[c] == 0:
                        continue  # tiny images: empty grid rows/cols
                    rows.append(
                        (
                            int(did), c // grid, c % grid, int(n[c]),
                            int(sums[0][c]), int(sums[1][c]),
                            int(sums[2][c]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "cell_y", "cell_x", "n_px",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.select("doc_id", "blob").mapInPandas(
        extract,
        schema=(
            "doc_id BIGINT, cell_y INT, cell_x INT, n_px BIGINT, "
            "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT"
        ),
    )


@query("m15_patch_grid", oracle=M15_ORACLE)
def m15_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M15: 4x4 patchify statistics of every synthesized PNG through
    the real decode — a seam off-by-one, a channel-order slip, a
    dropped sub-grid-size image row, or double-counted seam pixels
    all flip the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return patch_grid_stats(synthesize_media(docs)).orderBy(
        "doc_id", "cell_y", "cell_x"
    )


# --------------------------------------------------------------------------
# M16 — CLIPPING-RUN census (round-11 bank, library-first). The
# loudness-QA twin of m14 at the other end of the amplitude range:
# maximal runs of samples at |v| >= M16_CLIP_ABS — sustained clipping
# is the recorder-saturation signal audio curation filters on (a
# single clipped sample is noise; a run is a defect). Same real RIFF
# parse, same vectorized RLE, same gaps-and-islands oracle with the
# gate flipped, plus the clipped-sample fraction in exact per-mille.
#
# Scale: per-blob bounded Arrow-batched mapInPandas, no shuffle.
# --------------------------------------------------------------------------
M16_CLIP_ABS = 1000  # PCM fixture range is [-1024, 1023]

M16_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             unnest(generate_series(0, doc_id % 400 + 1)) AS i
      FROM documents),
    samp AS (
      SELECT doc_id, i,
             CASE WHEN abs((doc_id * 31 + i * 17) % 2048 - 1024)
                       >= {M16_CLIP_ABS}
                  THEN 1 ELSE 0 END AS clip
      FROM s),
    isl AS (
      SELECT doc_id, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS k
      FROM samp WHERE clip = 1),
    runs AS (
      SELECT doc_id, k, count(*) AS run_len
      FROM isl GROUP BY doc_id, k),
    agg AS (
      SELECT doc_id, sum(run_len) AS n_clipped,
             count(*) AS n_runs, max(run_len) AS max_run
      FROM runs GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.doc_id % 400 + 2 AS BIGINT) AS n_samples,
           CAST(coalesce(a.n_clipped, 0) AS BIGINT) AS n_clipped,
           CAST(coalesce(a.n_runs, 0) AS BIGINT) AS n_clip_runs,
           CAST(coalesce(a.max_run, 0) AS BIGINT) AS max_clip_run,
           CAST(coalesce(a.n_clipped, 0) * 1000
                // (d.doc_id % 400 + 2) AS BIGINT) AS clip_permille
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


def clipping_runs(df: DataFrame) -> DataFrame:
    """(doc_id, n_samples, n_clipped, n_clip_runs, max_clip_run,
    clip_permille) per decodable WAV blob."""
    import numpy as np
    import pandas as pd

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(bytes(blob))
                if decoded is None:
                    continue
                _, samples = decoded
                clip = np.abs(samples) >= M16_CLIP_ABS
                if clip.any():
                    edges = np.flatnonzero(np.diff(clip.astype(np.int8)))
                    starts = np.r_[0, edges + 1]
                    ends = np.r_[edges, len(clip) - 1]
                    lens = ends - starts + 1
                    clip_lens = lens[clip[starts]]
                    n_runs = int(clip_lens.size)
                    max_run = int(clip_lens.max())
                else:
                    n_runs = max_run = 0
                n = int(len(samples))
                n_clip = int(clip.sum())
                rows.append(
                    (
                        int(did), n, n_clip, n_runs, max_run,
                        n_clip * 1000 // n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_clipped",
                    "n_clip_runs", "max_clip_run", "clip_permille",
                ],
            )

    return df.mapInPandas(
        analyze,
        schema=(
            "doc_id BIGINT, n_samples BIGINT, n_clipped BIGINT, "
            "n_clip_runs BIGINT, max_clip_run BIGINT, "
            "clip_permille BIGINT"
        ),
    )


@query("m16_clipping_runs", oracle=M16_ORACLE)
def m16_clipping_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M16 (banked): maximal clipping-run statistics of every
    synthesized WAV through the real RIFF parse — a gate flipped to
    strict >, a run split, or integer-division drift in the per-mille
    flips the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return clipping_runs(synthesize_pcm_wav(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M17 — WINDOWED ENERGY / dynamic-range profile (round-12 surface,
# library-first; the @query registration is one decorator away). m10
# reports whole-clip energy; loudness normalization (EBU R128-style
# gating, VAD front-ends) needs the WINDOWED profile: non-overlapping
# 32-sample windows, per-window ENERGY kept in integer domain
# (sum of squared samples — no sqrt, so the oracle is integer-exact),
# plus the loud-window census and the max-min dynamic range.
#
# Scale shape: identical to m14 — blobs decode inside one Arrow
# mapInPandas pass, only per-doc scalar features cross the shuffle;
# the oracle regenerates every sample from the synthesis formula.
# --------------------------------------------------------------------------
M17_WINDOW = 32
M17_LOUD_ENERGY = M17_WINDOW * 400_000  # mean square > 400k = "loud"

M17_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             unnest(generate_series(0, doc_id % 400 + 1)) AS i
      FROM documents),
    samp AS (
      SELECT doc_id, i,
             (doc_id * 31 + i * 17) % 2048 - 1024 AS v
      FROM s),
    win AS (
      SELECT doc_id, i // {M17_WINDOW} AS w,
             sum(v * v) AS energy
      FROM samp
      WHERE i // {M17_WINDOW} < (doc_id % 400 + 2) // {M17_WINDOW}
      GROUP BY doc_id, i // {M17_WINDOW}),
    agg AS (
      SELECT doc_id, count(*) AS n_windows,
             max(energy) AS max_energy, min(energy) AS min_energy,
             sum(CASE WHEN energy > {M17_LOUD_ENERGY} THEN 1 ELSE 0 END)
               AS n_loud
      FROM win GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(a.max_energy, 0) AS BIGINT) AS max_energy,
           CAST(coalesce(a.min_energy, 0) AS BIGINT) AS min_energy,
           CAST(coalesce(a.max_energy - a.min_energy, 0) AS BIGINT)
             AS dyn_range,
           CAST(coalesce(a.n_loud, 0) AS BIGINT) AS n_loud_windows
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


def windowed_energy(df: DataFrame) -> DataFrame:
    """(doc_id, n_windows, max/min window energy, dynamic range, loud
    census) per decodable WAV blob — integer-exact by construction."""
    import numpy as np
    import pandas as pd

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(bytes(blob))
                if decoded is None:
                    # The oracle LEFT JOINs every document, so a silent
                    # skip would surface as a missing-row mismatch; every
                    # blob on this path is engine-synthesized and MUST
                    # decode — fail loudly instead (ADVICE r11).
                    raise ValueError(
                        f"windowed_energy: undecodable PCM blob for "
                        f"doc_id={int(did)}"
                    )
                _, samples = decoded
                n = len(samples) - len(samples) % M17_WINDOW
                if n == 0:
                    rows.append((int(did), 0, 0, 0, 0, 0))
                    continue
                sq = samples[:n].astype(np.int64) ** 2
                e = sq.reshape(-1, M17_WINDOW).sum(axis=1)
                rows.append(
                    (
                        int(did), int(e.size), int(e.max()), int(e.min()),
                        int(e.max() - e.min()),
                        int((e > M17_LOUD_ENERGY).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_windows", "max_energy", "min_energy",
                    "dyn_range", "n_loud_windows",
                ],
            )

    return df.mapInPandas(
        analyze,
        schema=(
            "doc_id BIGINT, n_windows BIGINT, max_energy BIGINT, "
            "min_energy BIGINT, dyn_range BIGINT, n_loud_windows BIGINT"
        ),
    )


@query("m17_windowed_energy", oracle=M17_ORACLE)
def m17_windowed_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M17 (banked): per-window audio energy profile through the real
    RIFF parse — a window that straddles the tail remainder, an int16
    overflow in the square, or a loud-gate boundary flip changes the
    hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return windowed_energy(synthesize_pcm_wav(docs)).orderBy("doc_id")


# --------------------------------------------------------------------------
# M19 — zero-crossing rate (round-14 surface, library-first; the
# @query registration is one decorator away). The classic cheap
# voiced/unvoiced + noisiness feature (alongside m10's energy, m14's
# silence runs, m16's clipping): count sign boundaries between
# consecutive samples, per window and per doc, through the REAL RIFF
# parse. Integer end to end — a crossing is (v_i >= 0) != (v_{i+1} >=
# 0), attributed to the window of its LEFT sample — so the hash
# tolerates zero arithmetic drift.
#
# Scale: same shape as m10 — Arrow-batched mapInPandas over blobs that
# never leave executors; output is five scalars per doc.
# --------------------------------------------------------------------------
M19_WINDOW = 32

M19_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             unnest(generate_series(0, doc_id % 400)) AS i
      FROM documents),
    c AS (
      SELECT doc_id, i // {M19_WINDOW} AS w,
             CASE WHEN ((doc_id * 31 + i * 17) % 2048 - 1024 >= 0)
                   <> ((doc_id * 31 + (i + 1) * 17) % 2048 - 1024 >= 0)
                  THEN 1 ELSE 0 END AS x
      FROM s),
    win AS (
      SELECT doc_id, w, CAST(sum(x) AS BIGINT) AS n_cross
      FROM c GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(doc_id % 400 + 2 AS BIGINT) AS n_samples,
           CAST(sum(n_cross) AS BIGINT) AS total_crossings,
           CAST(max(n_cross) AS BIGINT) AS max_window_crossings,
           CAST(1000 * sum(n_cross) // (doc_id % 400 + 1) AS BIGINT)
             AS crossing_permille
    FROM win GROUP BY doc_id ORDER BY doc_id
"""


def zero_crossing_windows(df: DataFrame) -> DataFrame:
    """Per-doc exact zero-crossing stats over a (doc_id, blob) frame
    of RIFF/WAVE audio."""
    import numpy as np
    import pandas as pd

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = decode_pcm(bytes(blob))
                if decoded is None:
                    continue
                _, samples = decoded
                n = len(samples)
                nonneg = samples >= 0
                x = (nonneg[:-1] != nonneg[1:]).astype(np.int64)
                wid = np.arange(n - 1) // M19_WINDOW
                sums = np.bincount(wid, weights=x).astype(np.int64)
                total = int(x.sum())
                rows.append(
                    (
                        int(did),
                        int(n),
                        total,
                        int(sums.max()) if len(sums) else 0,
                        1000 * total // (n - 1),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "total_crossings",
                    "max_window_crossings",
                    "crossing_permille",
                ],
            )

    return df.mapInPandas(
        analyze,
        schema=(
            "doc_id BIGINT, n_samples BIGINT, total_crossings BIGINT, "
            "max_window_crossings BIGINT, crossing_permille BIGINT"
        ),
    )


def m19_zero_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M19 (banked): exact windowed zero-crossing census of every
    synthesized WAV through the real RIFF parse — a sign-boundary
    off-by-one, a crossing attributed to the wrong window, or a
    floor/round slip in the permille flips the hash."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return zero_crossing_windows(synthesize_pcm_wav(docs)).orderBy(
        "doc_id"
    )
