"""Decoded-pixel quality scoring + content gate (operators/image_quality.py)."""

from __future__ import annotations

import numpy as np
import pytest

from nrsr_crawler_spark.operators import image_quality as IQ
from nrsr_crawler_spark.sources.images import encode_image, original_pixels


def test_pixel_quality_flat():
    e, c, s, r, g = IQ.pixel_quality(np.full((16, 16), 77, dtype=np.uint8))
    assert (e, s, r, g) == (0, 0, 0, 0)
    assert c == 0  # 77 is not on the rails


def test_pixel_quality_clipped_even_after_jpeg_quantization():
    px = np.where(original_pixels("imgX") >= 128, np.uint8(255), np.uint8(0)).astype(np.uint8)
    # simulate the fake-jpeg 6-bit quantizer: 0→2, 255→254 (off the exact rails)
    quant = ((px & 0xFC) | 0x02).astype(np.uint8)
    for variant in (px, quant):
        _e, c, _s, _r, _g = IQ.pixel_quality(variant)
        assert c == 10000, "rail-tolerant clip detection must survive lossy round-trip"
    # a 2-value histogram has ≤ 1 bit of entropy
    assert IQ.pixel_quality(px)[0] <= 100


def test_pixel_quality_natural_margins():
    """Natural random images sit far from every gate threshold."""
    for iid in (f"img{i:010d}" for i in range(1, 40)):
        e, c, s, _r, _g = IQ.pixel_quality(original_pixels(iid))
        assert e >= 300 + 150, iid  # low_entropy threshold + margin
        assert c <= 5000 - 4000, iid  # clipped threshold - margin
        assert s > 0, iid


def test_entropy_uniform_is_log2_n_values():
    px = np.repeat(np.arange(256, dtype=np.uint8), 4).reshape(32, 32)
    e, _c, _s, r, _g = IQ.pixel_quality(px)
    assert e == 800  # log2(256) bits = 800 cbits exactly
    assert r == 255


def test_gate_priority_and_spark_pass(spark):
    """flat wins over clipped (a flat rail image is both); gate runs as one
    mapInPandas pass + column exprs."""
    rows = [
        ("flat_rail", encode_image(np.full((8, 8), 255, dtype=np.uint8), "png")),
        ("flat_mid", encode_image(np.full((8, 8), 128, dtype=np.uint8), "png")),
        ("clip", encode_image(
            np.where(original_pixels("imgY") >= 128, np.uint8(255), np.uint8(0)).astype(np.uint8), "jpeg")),
        ("nat", encode_image(original_pixels("imgZ"), "png")),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r.image_id: (r.flag, r.keep) for r in IQ.quality_gate(IQ.quality_stats(df)).collect()}
    assert got == {
        "flat_rail": ("flat", 0),
        "flat_mid": ("flat", 0),
        "clip": ("clipped", 0),
        "nat": ("ok", 1),
    }


def test_degrade_modes_deterministic():
    base = original_pixels("imgQ")
    flat = IQ.degrade_pixels(base, "flat", "imgQ")
    assert flat.std() == 0 and flat.shape == base.shape
    clipped = IQ.degrade_pixels(base, "clipped", "imgQ")
    assert set(np.unique(clipped)) <= {0, 255}
    assert np.array_equal(IQ.degrade_pixels(base, "ok", "imgQ"), base)
    with pytest.raises(ValueError):
        IQ.degrade_pixels(base, "nope", "imgQ")
