"""M8 image convolution (round-8 pre-build): an independent per-pixel
LOOP reference for the vectorized stencil, geometry edge cases, and the
driver-style oracle pre-validation."""

from __future__ import annotations

import numpy as np
import pytest

from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
    M8_ORACLE,
    image_laplacian_stats,
    m8_image_convolution,
    synthesize_media,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from tests.oracle_utils import compare_to_oracle


def _loop_reference(luma: np.ndarray) -> tuple[int, int, int]:
    """Per-pixel 5-point stencil, deliberately scalar — a shift-offset
    bug in the engine's vectorized version cannot be mirrored here."""
    h, w = luma.shape
    total = 0
    biggest = 0
    n = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            v = (
                4 * int(luma[y, x])
                - int(luma[y - 1, x])
                - int(luma[y + 1, x])
                - int(luma[y, x - 1])
                - int(luma[y, x + 1])
            )
            total += abs(v)
            biggest = max(biggest, abs(v))
            n += 1
    return n, total, biggest


def test_engine_stencil_matches_loop_reference(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        png_pixel_array,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        "doc_id % 4 = 0 AND doc_id < 200"
    )
    blobs = {
        r["doc_id"]: bytes(r["blob"])
        for r in synthesize_media(docs).select("doc_id", "blob").collect()
    }
    got = {
        r["doc_id"]: (r["n_interior"], r["lap_abs_sum"], r["lap_max"])
        for r in image_laplacian_stats(
            synthesize_media(docs)
        ).collect()
    }
    checked = 0
    for did, blob in blobs.items():
        px = png_pixel_array(blob)
        if px is None:
            continue
        h, stride = px.shape
        w = stride // 3
        if w < 3 or h < 3:
            assert did not in got
            continue
        luma = px.reshape(h, w, 3).astype(np.int64).sum(axis=2)
        assert got[did] == _loop_reference(luma), did
        checked += 1
    assert checked >= 10


def test_flat_image_has_zero_response():
    """A constant plane is in the stencil's null space — byte wraps are
    the ONLY signal in the synthetic corpus, so a flat tile must report
    exactly zero."""
    import pandas as pd

    luma = np.full((5, 7), 99, dtype=np.int64)
    n, total, biggest = _loop_reference(luma)
    assert (n, total, biggest) == (15, 0, 0)


def test_linear_ramp_has_zero_response():
    """The Laplacian annihilates affine planes: luma = a·y + b·x + c
    (the synthetic formula BETWEEN wraps) must give zero — this is why
    the operator isolates the %256 discontinuities."""
    y, x = np.mgrid[0:6, 0:9]
    luma = (3 * y + 2 * x + 17).astype(np.int64)
    _, total, biggest = _loop_reference(luma)
    assert total == 0 and biggest == 0


@pytest.mark.parametrize("w,h", [(1, 10), (2, 10), (10, 1), (10, 2)])
def test_too_narrow_images_are_dropped(spark, w, h):
    """No full 3×3 neighborhood exists — the operator must drop the
    image, not emit a degenerate row (matches the oracle's w,h >= 3)."""
    import zlib

    def png_chunk(cid: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + cid
            + data
            + zlib.crc32(cid + data).to_bytes(4, "big")
        )

    raw = b"".join(b"\x00" + bytes(w * 3) for _ in range(h))
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"IDAT", zlib.compress(raw))
        + png_chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id bigint, blob binary")
    assert image_laplacian_stats(df).count() == 0


def test_m8_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(m8_image_convolution(spark, sf_dir), M8_ORACLE, sf_dir)
