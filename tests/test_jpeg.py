"""Baseline-JPEG codec tests (operators/jpeg.py): exactness anchors,
lossy bounds, a HAND-DERIVED spec pin (so encoder and decoder cannot
share a cancelling table bug), golden bytes, and scope guards."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
    Q_ONES,
    STD_LUMA,
    decode_gray,
    encode_gray,
)


def test_q1_roundtrip_within_one_on_noise():
    """All-ones quantization leaves only DCT float rounding: any uint8
    image round-trips within ±1 per pixel."""
    rng = np.random.RandomState(7)
    for shape in ((8, 8), (16, 24), (32, 8)):
        x = rng.randint(0, 256, shape).astype(np.uint8)
        y = decode_gray(encode_gray(x, Q_ONES))
        assert y.shape == x.shape
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1


def test_block_flat_is_bit_exact_under_q1():
    """DC-only blocks quantized by 1 are integer-exact — the m6 entry's
    whole-pipeline exactness contract."""
    rng = np.random.RandomState(11)
    blocks = rng.randint(0, 256, (4, 4)).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    assert (decode_gray(encode_gray(img, Q_ONES)) == img).all()


def test_std_table_smooth_gradient_bounded_and_compressed():
    """A non-wrapping smooth gradient under the Annex K luminance table:
    small reconstruction error AND genuine compression."""
    g = np.fromfunction(
        lambda i, j: np.minimum(i * 2 + j, 255), (64, 64)
    ).astype(np.uint8)
    blob = encode_gray(g, STD_LUMA)
    y = decode_gray(blob)
    assert np.abs(g.astype(int) - y.astype(int)).max() <= 12
    assert len(blob) < g.size // 4  # ≥4x smaller than raw


def test_entropy_bytes_hand_derived_for_all_128():
    """SPEC pin, independent of our own decoder: an all-128 8×8 image
    is one MCU of (DC diff 0, EOB). Annex K gives DC category 0 the
    code '00' and EOB the code '1010'; with '11' padding the entire
    entropy segment is the single byte 0x2B. A huffman-table or
    DC-prediction bug on the ENCODE side breaks this without any
    reference to decode_gray."""
    blob = encode_gray(np.full((8, 8), 128, dtype=np.uint8), STD_LUMA)
    sos = blob.index(bytes([0xFF, 0xDA]))
    scan = blob[sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big") :]
    assert scan == bytes([0x2B]) + b"\xff\xd9"


def test_byte_stuffing_roundtrips():
    """Images whose entropy stream emits 0xFF bytes must stuff and
    de-stuff transparently; sweep a range of contents to hit one."""
    rng = np.random.RandomState(3)
    hit_ff = False
    for _ in range(40):
        x = rng.randint(0, 256, (8, 16)).astype(np.uint8)
        blob = encode_gray(x, Q_ONES)
        sos = blob.index(bytes([0xFF, 0xDA]))
        scan = blob[sos + 8 : -2]
        hit_ff = hit_ff or b"\xff\x00" in scan
        y = decode_gray(blob)
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1
    assert hit_ff, "sweep never exercised byte stuffing"


def test_golden_bytes_pinned():
    """Format drift guard: the canonical seed-7 16×24 Q1 encode."""
    x = np.random.RandomState(7).randint(0, 256, (16, 24)).astype(np.uint8)
    digest = hashlib.md5(encode_gray(x, Q_ONES)).hexdigest()
    assert digest == "8a9d8c1736c56a56efbb444c802b7251", digest


def test_progressive_rejected_loudly():
    """Out-of-scope SOF markers must raise, not mis-decode."""
    blob = bytearray(encode_gray(np.zeros((8, 8), np.uint8), STD_LUMA))
    sof = blob.index(bytes([0xFF, 0xC0]))
    blob[sof + 1] = 0xC2  # progressive
    with pytest.raises(NotImplementedError):
        decode_gray(bytes(blob))


# ---------------------------------------------------------------------------
# Color (4:2:0 YCbCr) path
# ---------------------------------------------------------------------------

def _tile_image(seed=0, side=32):
    """Four constant-color 16x16 tiles — the 4:2:0 exactness anchor
    (chroma box-average of a constant tile is lossless; flat Y/Cb/Cr
    blocks are DC-only, integer-exact under Q1)."""
    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (  # noqa
        encode_rgb420,
    )

    img = np.zeros((side, side, 3), dtype=np.uint8)
    t = 0
    for ty in range(0, side, 16):
        for tx in range(0, side, 16):
            img[ty : ty + 16, tx : tx + 16] = [
                (seed * 7 + t * 29) % 256,
                (seed * 11 + t * 31) % 256,
                (seed * 13 + t * 37) % 256,
            ]
            t += 1
    return img


def test_color_tile_flat_is_bit_exact_under_q1():
    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        decode_color,
        encode_rgb420,
    )

    for seed in range(8):
        img = _tile_image(seed)
        dec = decode_color(encode_rgb420(img, Q_ONES, Q_ONES))
        assert (dec == img).all(), f"seed {seed} not exact"


def test_color_std_tables_smooth_bounded_and_compressed():
    """Lossy contract on a smooth gradient: bounded per-pixel error
    (chroma subsampling + quantization) and real compression."""
    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        decode_color,
        encode_rgb420,
    )

    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack(
        [(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    blob = encode_rgb420(img)
    dec = decode_color(blob)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and len(blob) < img.size // 2


def test_color_noise_roundtrip_within_chroma_bound():
    """Random noise under Q1: luma is block-exact within 1 (as gray),
    chroma error is dominated by the 2x2 box average — each channel
    must stay within the algebraic subsampling bound (|dCb|,|dCr| <=
    192 over a 2x2 box never moves RGB more than ~2*192*0.9, but with
    Q1 the only chroma loss IS the box average, so reconstructed 2x2
    means must match the original 2x2 chroma means to <=1)."""
    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        decode_color,
        encode_rgb420,
        rgb_to_ycbcr,
    )

    rng = np.random.RandomState(11)
    # range-limited noise keeps the reconstruction in gamut: the
    # worst-case chroma shift from 2x2 box-averaging range-64 noise
    # moves RGB by < 60, so no channel clips and the YCbCr-domain
    # comparison below is valid (clipping would contaminate Y).
    img = rng.randint(96, 160, (32, 32, 3)).astype(np.uint8)
    dec = decode_color(encode_rgb420(img, Q_ONES, Q_ONES))
    ycc_in = rgb_to_ycbcr(img.astype(np.float64))
    ycc_out = rgb_to_ycbcr(dec.astype(np.float64))
    # luma survives within rounding
    assert np.abs(ycc_in[..., 0] - ycc_out[..., 0]).max() <= 2.0
    for ch in (1, 2):
        mean_in = ycc_in[..., ch].reshape(16, 2, 16, 2).mean(axis=(1, 3))
        mean_out = ycc_out[..., ch].reshape(16, 2, 16, 2).mean(axis=(1, 3))
        assert np.abs(mean_in - mean_out).max() <= 2.0


def test_color_golden_bytes_pinned():
    """Format drift guard for the color path: canonical tile image."""
    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        encode_rgb420,
    )

    digest = hashlib.sha256(
        encode_rgb420(_tile_image(3), Q_ONES, Q_ONES)
    ).hexdigest()[:16]
    assert digest == "f7832ae648eb2721", digest


def test_color_header_structure():
    """The emitted stream must carry the full 3-component table set in
    order: two DQT segments (ids 0, 1), SOF0 with sampling 0x22/0x11/
    0x11 and qtable ids 0/1/1, FOUR DHT segments, and an SOS binding Y
    to DC0/AC0 and both chromas to DC1/AC1 — the layout any external
    baseline decoder needs to accept the file."""
    from k_means_clustering_via_map_reduce_spark.operators.jpeg import (
        encode_rgb420,
    )

    blob = encode_rgb420(_tile_image(1), Q_ONES, Q_ONES)
    assert blob.count(b"\xff\xdb") == 2
    assert blob.count(b"\xff\xc4") == 4
    sof = blob.index(b"\xff\xc0") + 4
    payload = blob[sof : sof + 15]
    assert payload[5] == 3  # components
    assert list(payload[6:]) == [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    sos = blob.index(b"\xff\xda") + 4
    assert list(blob[sos : sos + 7]) == [3, 1, 0x00, 2, 0x11, 3, 0x11]
