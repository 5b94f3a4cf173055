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
