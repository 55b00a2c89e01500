"""Perceptual-hash image dedup (r7): dHash over the pluggable
pixel-grid seam + Hamming-banded pairs via the shared
dedup.hamming_banded_pairs engine.  Planted-truth on synthetic byte
payloads (no image codec in this container — the stub grid tier)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.dedup import (
    hamming_banded_pairs,
    simhash_neardup_pairs,
)
from serverless_podcast_etl_spark.operators.multimodal import (
    DHASH_COLS,
    DHASH_ROWS,
    _stub_pixel_grid,
    dhash_from_grid,
    image_dhash,
    image_neardup_pairs,
)


def test_stub_pixel_grid_shape_and_determinism():
    payload = bytes(range(256)) * 3
    g1 = _stub_pixel_grid(payload)
    g2 = _stub_pixel_grid(payload)
    assert g1 == g2
    assert len(g1) == DHASH_ROWS
    assert all(len(r) == DHASH_COLS for r in g1)
    assert all(0 <= v <= 255 for r in g1 for v in r)
    with pytest.raises(ValueError):
        _stub_pixel_grid(b"")
    # shorter-than-grid payloads still fill every cell
    tiny = _stub_pixel_grid(b"ab")
    assert len(tiny) == DHASH_ROWS and all(len(r) == DHASH_COLS for r in tiny)


def test_dhash_gradient_and_signed_range():
    # strictly increasing rows -> every comparison bit set -> the
    # all-ones 64-bit value, which must arrive as signed -1
    inc = [[c * 10 for c in range(DHASH_COLS)] for _ in range(DHASH_ROWS)]
    assert dhash_from_grid(inc) == -1
    # strictly decreasing -> no bits
    dec = [[(DHASH_COLS - c) * 10 for c in range(DHASH_COLS)] for _ in range(DHASH_ROWS)]
    assert dhash_from_grid(dec) == 0
    # flat rows (ties are "not brighter") -> no bits
    flat = [[7] * DHASH_COLS for _ in range(DHASH_ROWS)]
    assert dhash_from_grid(flat) == 0


def test_image_neardup_planted_pairs(spark):
    """A byte-local edit of a payload must pair with its original at
    small Hamming distance; unrelated payloads must not pair."""
    base = (b"The quick brown fox jumps over the lazy dog. " * 40)
    edited = bytearray(base)
    edited[100] ^= 0xFF  # one flipped byte
    edited[700] ^= 0x0F  # and another, far away
    other = bytes(
        (i * 37 + 11) % 251 for i in range(len(base))
    )  # decorrelated
    df = spark.createDataFrame(
        [
            Row(asset_id=1, payload=bytes(base)),
            Row(asset_id=2, payload=bytes(edited)),
            Row(asset_id=3, payload=other),
        ]
    )
    pairs = image_neardup_pairs(
        df, id_col="asset_id", binary_col="payload"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 3


def test_image_dhash_matches_python_fold(spark):
    """The Spark mapInPandas output equals the driver-side Python
    composition grid -> dhash (bit-exact, incl. the signed cast)."""
    payloads = [
        b"x" * 100,
        bytes(range(200)),
        (b"abc123" * 50),
    ]
    df = spark.createDataFrame(
        [Row(asset_id=i, payload=p) for i, p in enumerate(payloads)]
    )
    got = {
        r["asset_id"]: r["dhash"]
        for r in image_dhash(df, "asset_id", "payload").collect()
    }
    want = {
        i: dhash_from_grid(_stub_pixel_grid(p))
        for i, p in enumerate(payloads)
    }
    assert got == want


def test_hamming_banded_pairs_band_divisibility_guard(spark):
    fp = spark.createDataFrame([Row(id=1, h=0)])
    with pytest.raises(ValueError, match="divide"):
        hamming_banded_pairs(
            fp, "id", "h", bits=64, band_bits=24, max_hamming=3
        )
    # beyond-pigeonhole settings are ALLOWED (q28's approximate
    # contract): this must build a plan, not raise
    hamming_banded_pairs(fp, "id", "h", bits=32, band_bits=8, max_hamming=6)


def test_simhash_delegates_unchanged(spark):
    """The q21-certified SimHash output survives the r7 refactor onto
    hamming_banded_pairs: near-identical texts pair, distinct do not."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog again and again"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog again and once"),
            Row(doc_id=3, text="entirely unrelated content about spark shuffle partitions"),
        ]
    )
    pairs = simhash_neardup_pairs(
        df, text_col="text", id_col="doc_id", max_hamming=5
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
