"""Multimodal plumbing tests: binary schema, Arrow batch shape, stub
boundary honesty."""

from __future__ import annotations

import pytest

from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    frame_sample,
    media_features,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table


def test_media_schema_is_binary(spark, sf_dir):
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    dtypes = dict(media.dtypes)
    assert dtypes["blob"] == "binary"
    assert dtypes["media_type"] == "string"


def test_media_features_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = media_features(media)
    row = feats.filter("doc_id = 0").collect()[0]
    text0 = docs.filter("doc_id = 0").collect()[0]["text"]
    assert row["n_bytes"] == len(text0.encode("utf-8"))
    assert 1 <= row["decoded_w"] <= 97
    assert feats.count() == docs.count()


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0")  # JPEG needs a real codec lib


# The canonical 70-byte 1x1 transparent PNG (8-bit RGBA), byte-for-byte
# as published everywhere (the ubiquitous data-URI placeholder pixel) —
# a true golden-bytes fixture the builder code cannot have influenced.
_GOLDEN_1X1_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d4944415478da636460f85f0f0002870180eb47ba920000000049454e44"
    "ae426082"
)


def test_decode_media_golden_png_bytes():
    """Absolute pin: the well-known 1x1 RGBA PNG must decode to exactly
    (png, 1, 1, 4) via the full signature -> CRC'd IHDR -> zlib IDAT
    inflate path."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        decode_media,
    )

    got = decode_media(_GOLDEN_1X1_PNG)
    assert got == {"codec": "png", "width": 1, "height": 1, "channels": 4}


def test_decode_media_png_property_roundtrip():
    """Property: for every color type / bit depth / geometry the spec
    allows (grayscale, truecolor, palette, +alpha variants; 8- and
    16-bit), a well-formed PNG built chunk-by-chunk from the raw
    filtered scanlines decodes to exactly its header geometry — and the
    channel count the color type implies."""
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        _PNG_CHANNELS,
        decode_media,
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + cid
            + data
            + zlib.crc32(cid + data).to_bytes(4, "big")
        )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 30),
        color_type=st.sampled_from([0, 2, 4, 6]),  # palette needs PLTE
        bit_depth=st.sampled_from([8, 16]),
        seed=st.integers(0, 255),
    )
    def roundtrip(w, h, color_type, bit_depth, seed):
        ch = _PNG_CHANNELS[color_type]
        bps = bit_depth // 8
        row = w * ch * bps
        raw = b"".join(
            b"\x00" + bytes((seed + y + j) % 256 for j in range(row))
            for y in range(h)
        )
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes([bit_depth, color_type, 0, 0, 0])
        )
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        got = decode_media(blob)
        assert got == {
            "codec": "png",
            "width": w,
            "height": h,
            "channels": ch,
        }

    roundtrip()


def test_decode_media_png_rejects_corruption():
    """A flipped IHDR CRC bit, a truncated IDAT zlib stream, and a
    geometry/IDAT length mismatch must each fail decode (None), not
    return plausible-looking fields."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        decode_media,
    )

    bad_crc = bytearray(_GOLDEN_1X1_PNG)
    bad_crc[30] ^= 0x01  # inside the IHDR CRC
    assert decode_media(bytes(bad_crc)) is None

    bad_idat = bytearray(_GOLDEN_1X1_PNG)
    bad_idat[45] ^= 0xFF  # inside the IDAT zlib stream
    assert decode_media(bytes(bad_idat)) is None

    wrong_geom = bytearray(_GOLDEN_1X1_PNG)
    import zlib as _zlib

    wrong_geom[19] = 2  # claim width=2; re-CRC so only geometry is wrong
    crc = _zlib.crc32(bytes(wrong_geom[12:29]))
    wrong_geom[29:33] = crc.to_bytes(4, "big")
    assert decode_media(bytes(wrong_geom)) is None


def _make_bmp(w: int, h: int) -> bytes:
    """Minimal valid 24-bit BMP: 14-byte file header + 40-byte
    BITMAPINFOHEADER + rows padded to 4 bytes."""
    row = (w * 3 + 3) & ~3
    pixels = bytes(row * h)
    header = (
        b"BM"
        + (54 + len(pixels)).to_bytes(4, "little")
        + bytes(4)
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + bytes(24)
    )
    return header + pixels


def _make_wav(channels: int, rate: int, n_samples: int, bits: int = 16) -> bytes:
    """Minimal PCM WAV: RIFF header + fmt chunk + data chunk."""
    frame = channels * bits // 8
    data = bytes(n_samples * frame)
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * frame).to_bytes(4, "little")
        + frame.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_media_features_decodes_real_bmp_and_wav(spark):
    """media_features must return the ACTUAL dimensions from generated
    BMP headers and the actual channel/rate/sample-count from generated
    WAV headers — pure-Python decode, no codec library; a non-media blob
    still takes the documented fake_decode path."""
    rows = [
        (1, _make_bmp(13, 7), "image/bmp", 0, 0),
        (2, _make_bmp(640, 480), "image/bmp", 0, 0),
        (3, _make_wav(2, 8000, 1000), "audio/wav", 0, 0),
        (4, _make_wav(1, 44100, 22050), "audio/wav", 0, 0),
        (5, b"not media at all", "text/plain", 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        schema="doc_id BIGINT, blob BINARY, media_type STRING, "
        "declared_w INT, declared_h INT",
    )
    got = {r["doc_id"]: r for r in media_features(df).collect()}
    assert (got[1]["codec"], got[1]["decoded_w"], got[1]["decoded_h"]) == (
        "bmp", 13, 7,
    )
    assert (got[2]["decoded_w"], got[2]["decoded_h"]) == (640, 480)
    assert (
        got[3]["codec"], got[3]["n_channels"], got[3]["sample_rate"],
        got[3]["n_samples"],
    ) == ("wav", 2, 8000, 1000)
    assert (got[4]["n_channels"], got[4]["sample_rate"], got[4]["n_samples"]) == (
        1, 44100, 22050,
    )
    assert got[5]["codec"] == "opaque"
    assert got[5]["n_bytes"] == len(b"not media at all")
    assert got[5]["decoded_w"] is not None  # fake path still populated


def test_decode_media_top_down_bmp_and_padded_wav_chunks():
    """Header edge cases: negative BMP height (top-down) reports its
    magnitude; a WAV with an odd-sized pre-data chunk still finds fmt
    and data thanks to RIFF pad-byte advancement."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        decode_media,
    )

    td = bytearray(_make_bmp(5, 9))
    td[22:26] = (-9).to_bytes(4, "little", signed=True)
    assert decode_media(bytes(td)) == {"codec": "bmp", "width": 5, "height": 9}

    wav = bytearray(_make_wav(2, 16000, 64))
    odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    padded = wav[:12] + odd + wav[12:]
    padded[4:8] = (len(padded) - 8).to_bytes(4, "little")
    got = decode_media(bytes(padded))
    assert got == {
        "codec": "wav",
        "channels": 2,
        "sample_rate": 16000,
        "n_samples": 64,
    }


def test_frame_sample_explodes(spark, sf_dir):
    media = attach_fake_media(load_table(spark, sf_dir, "documents")).limit(20)
    frames = frame_sample(media, every_n=10)
    rows = frames.collect()
    assert rows
    for r in rows:
        assert r["frame_idx"] < r["n_frames"]
        assert r["frame_idx"] % 10 == 0


def _png_with_filters(pixels, filters):
    """Build a valid truecolor PNG whose scanlines use the given
    per-row filter types, applying the spec's FORWARD filters
    (independent logic from the decoder's inverse)."""
    import zlib

    import numpy as np

    h, w, _ = pixels.shape
    stride = w * 3
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, ftype in enumerate(filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = int(cur[i - 3]) if i >= 3 else 0
            b = int(prev[i])
            c = int(prev[i - 3]) if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (int(cur[i]) - pred) & 0xFF
        raw.append(ftype)
        raw += bytes(enc.tolist())

    def chunk(cid, data):
        return (
            len(data).to_bytes(4, "big")
            + cid
            + data
            + zlib.crc32(cid + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_defilter_all_five_filter_types():
    """png_pixel_array must invert every PNG filter type exactly:
    deterministic pixels are forward-filtered (independent
    implementation above) with rows cycling through None/Sub/Up/
    Average/Paeth, then decoded back — byte-exact recovery required."""
    import numpy as np

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        png_pixel_array,
    )

    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    blob = _png_with_filters(pixels, filters)
    out = png_pixel_array(blob)
    assert out is not None
    assert out.shape == (10, 18)
    assert (out == pixels.reshape(10, 18)).all()


def test_png_pixel_array_rejects_non_png():
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        png_pixel_array,
    )

    assert png_pixel_array(b"BM" + bytes(40)) is None
    assert png_pixel_array(b"\x89PNG\r\n\x1a\n" + bytes(10)) is None


def test_decode_pcm_golden_wav_bytes():
    """Absolute parser correctness against hand-built bytes: a mono
    16-bit WAV with samples [-1024, 0, 1023, 5] must come back exactly,
    including the negative two's-complement values."""
    import numpy as np

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        decode_pcm,
    )

    samples = np.array([-1024, 0, 1023, 5], dtype="<i2")
    data = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    blob = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    rate, out = decode_pcm(blob)
    assert rate == 8000
    assert out.tolist() == [-1024, 0, 1023, 5]
    # Non-mono / non-16-bit blobs route to the codec boundary, not a
    # silent misparse.
    bad = blob.replace(
        b"fmt " + (16).to_bytes(4, "little") + fmt,
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little") + fmt[4:],
    )
    assert decode_pcm(bad) is None


def test_audio_resample_floor_mean_decimation(spark):
    """The 2-tap box decimator must floor-divide (matching the SQL
    oracle's floor) including on negative sums, and drop the odd tail
    sample."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        audio_resample,
        synthesize_pcm_wav,
    )

    docs = spark.createDataFrame([(3,)], "doc_id bigint")
    row = audio_resample(synthesize_pcm_wav(docs)).collect()[0]
    # doc 3: n = 5 samples, s[i] = ((93 + 17i) % 2048) - 1024
    s = [((93 + 17 * i) % 2048) - 1024 for i in range(5)]
    expect = [(s[0] + s[1]) // 2, (s[2] + s[3]) // 2]  # tail s[4] dropped
    assert row.n_in == 5 and row.n_out == 2
    assert row.sum_out == sum(expect)
    assert row.min_out == min(expect) and row.max_out == max(expect)
    assert row.first_out == expect[0]
    assert row.rate_in == 8000 and row.rate_out == 4000


def test_audio_decode_resample_property_roundtrip():
    """Property: for ANY mono int16 sample vector, a WAV built from it
    chunk-walks back to the exact samples, and the box decimator equals
    the pure-Python floor-mean (negative sums included)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        decode_pcm,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        samples=st.lists(
            st.integers(-32768, 32767), min_size=2, max_size=200
        ),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def roundtrip(samples, rate):
        arr = np.asarray(samples, dtype="<i2")
        data = arr.tobytes()
        fmt = (
            (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        blob = (
            b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        got_rate, got = decode_pcm(blob)
        assert got_rate == rate
        assert got.tolist() == samples
        m = len(got) // 2 * 2
        out = got[:m].reshape(-1, 2).sum(axis=1) // 2
        expect = [
            (samples[2 * j] + samples[2 * j + 1]) // 2
            for j in range(len(samples) // 2)
        ]
        assert out.tolist() == expect

    roundtrip()


def test_m5_kvid_sampler_golden_and_phase(spark):
    """Hand-built KVID container: the sampler must honor the header
    geometry (not the synthesis formula), emit exactly the stride-0
    sampling phase, and sum the real payload bytes."""
    import numpy as np
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        sample_video_frames,
    )

    # 2x2 frames, 5 of them, payload = arbitrary non-formula bytes.
    frames = np.arange(20, dtype=np.uint8).reshape(5, 4) * 3 % 251
    blob = (
        b"KVID" + (5).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + frames.tobytes()
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "blob": [bytearray(blob)]}),
        schema="doc_id BIGINT, blob BINARY",
    )
    rows = sorted(
        (r.frame_idx, r.frame_sum, r.n_frames)
        for r in sample_video_frames(df, step=2).collect()
    )
    expect = [(fi, int(frames[fi].sum()), 5) for fi in (0, 2, 4)]
    assert rows == expect

    # A non-KVID blob must be skipped, not crash the task.
    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [8], "blob": [bytearray(b"JUNKxxxx")]}),
        schema="doc_id BIGINT, blob BINARY",
    )
    assert sample_video_frames(bad).count() == 0


def test_m7_bands_match_basis_dft(spark, sf_dir):
    """The engine's FFT band profile cross-checked against an
    INDEPENDENT transform — an explicit O(n²) DFT basis matmul built
    here from the definition: for every doc the engine's top_band must
    equal the band argmax computed from matmul power, and Parseval
    must have held inside the operator. This pins what the SQL oracle
    can't: the non-DC half-spectrum itself (and that np.fft.fft in the
    engine path computes exactly the DFT of exactly these samples)."""
    import numpy as np

    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        M7_BANDS,
        audio_spectrum,
        synthesize_pcm_wav,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(64)
    got = {
        r["doc_id"]: (r["top_band"], r["parseval_ok"])
        for r in audio_spectrum(synthesize_pcm_wav(docs)).collect()
    }
    assert got and all(ok for _, ok in got.values())
    for did, (top, _) in got.items():
        n = did % 400 + 2
        i = np.arange(n, dtype=np.int64)
        x = ((did * 31 + i * 17) % 2048 - 1024).astype(np.float64)
        k = np.arange(n)
        basis = np.exp(-2j * np.pi * np.outer(k[: n // 2 + 1], k) / n)
        power = np.abs(basis @ x) ** 2
        # the matmul spans exactly the 0..n//2 half-spectrum the operator uses
        nb = len(power) - 1
        bands = np.zeros(M7_BANDS)
        for b in range(M7_BANDS):
            lo = 1 + (nb * b) // M7_BANDS
            hi = 1 + (nb * (b + 1)) // M7_BANDS
            if hi > lo:
                bands[b] = power[lo:hi].sum()
        assert int(np.argmax(bands)) == top, did


def test_m9_dhash_matches_formula_reference(spark, sf_dir):
    """Engine dHash (real PNG decode path) vs a pure-Python recompute
    straight from the synthesis formula — and the hashes must be
    non-trivially populated (only degenerate w=1 images, where every
    thumbnail column samples the same pixel, may be all-zero)."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        m9_perceptual_hash,
    )

    rows = m9_perceptual_hash(spark, sf_dir).collect()
    assert rows
    nonzero = 0
    for r in rows:
        did, w, h = r["doc_id"], r["w"], r["h"]
        assert w == did % 64 + 1 and h == did % 48 + 1

        def luma(y: int, x: int) -> int:
            sy, sx = (y * h) // 8, (x * w) // 9
            return sum((did + sy + 3 * sx + c) % 256 for c in range(3))

        want = bytearray()
        for y in range(8):
            b = 0
            for x in range(8):
                b = (b << 1) | (1 if luma(y, x) < luma(y, x + 1) else 0)
            want.append(b)
        assert r["dhash"] == want.hex(), did
        if r["dhash"] != "0" * 16:
            nonzero += 1
        else:
            assert w == 1, (did, w)  # all-zero only when degenerate
    assert nonzero > len(rows) * 0.8


# ---------------------------------------------------------------- M10
def test_m10_energy_pins_on_known_blob(spark):
    """Hand-computed pin: doc 0 has 2 samples (0*31 + i*17) % 2048 -
    1024 = (-1024, -1007); one window of length 2; sum_sq = 1024^2 +
    1007^2 = 2062625; loud iff 2062625 > 400000*2 (true)."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        audio_energy_windows,
        synthesize_pcm_wav,
    )

    d = spark.createDataFrame([(0,)], "doc_id BIGINT")
    row = audio_energy_windows(synthesize_pcm_wav(d)).collect()[0]
    assert row["n_samples"] == 2
    assert row["n_windows"] == 1
    assert row["total_sq"] == 1024 * 1024 + 1007 * 1007
    assert row["max_window_sq"] == row["total_sq"]
    assert row["n_loud"] == 1


def test_m10_partial_tail_window_counts(spark):
    """doc 34: 36 samples => one full 32-window + a 4-sample tail —
    both must appear, and the tail's loudness uses ITS length."""
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        audio_energy_windows,
        synthesize_pcm_wav,
    )

    d = spark.createDataFrame([(34,)], "doc_id BIGINT")
    row = audio_energy_windows(synthesize_pcm_wav(d)).collect()[0]
    assert row["n_samples"] == 36
    assert row["n_windows"] == 2


def test_m10_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        M10_ORACLE,
        m10_audio_energy,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(m10_audio_energy(spark, sf_dir), M10_ORACLE, sf_dir)
