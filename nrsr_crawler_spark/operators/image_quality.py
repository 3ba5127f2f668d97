"""Decoded-pixel image quality scoring + gating (training-data pipeline).

The train-manifest gate (entry_queries_ml.images_train_manifest) filters on
STORED metadata (dims); this operator decodes pixels and scores the content
itself — the filter a multimodal pretraining pipeline runs to drop flat
placeholder images, clipped/thresholded scans, and low-information content
before captioning or embedding (the reference's ImagesPipeline stores
whatever Pillow decodes, settings.py:79-84 — content gating is the engine
addition the 100 TB pipeline needs).

One Arrow pass over the binary column computes ALL signals; every signal is
quantized to integers (centibits / basis points) so downstream gates and the
DuckDB oracle are hash-exact:

 - ``entropy_cbits``  — Shannon entropy of the 256-bin histogram, ×100;
 - ``clipped_bps``    — share of pixels at the dynamic-range rails, in
   basis points.  The rails are [0, 2] and [253, 255]: the fake-jpeg 6-bit
   quantizer (sources/images.py:47-48) maps 0→2 and 255→254, so a
   hard-clipped source must still be caught after a lossy round-trip;
 - ``std_cpx``        — pixel std ×100 (0 ⇔ perfectly flat);
 - ``dyn_range``      — max − min pixel value;
 - ``edge_bps``       — share of 4-neighbour |Δ| > 8 transitions, bps
   (texture proxy; flat AND smooth-gradient images both score ~0).

``quality_flags`` then gates in priority order flat → clipped →
low_entropy → ok, all pure column expressions (JVM-side, codegen).

Scale shape: mapInPandas is per-partition streaming (no shuffle, no
driver state); the flag gate is a projection.  At 100 TB the pass is
bounded by decode throughput — swapping the FIMG codec for Pillow at
deploy time changes only ``_decode_any``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.multimodal import _decode_any

QUALITY_SCHEMA = (
    "image_id string, entropy_cbits int, clipped_bps int, std_cpx int, "
    "dyn_range int, edge_bps int"
)

# rails tolerant of the fake-jpeg quantizer (see module docstring)
_CLIP_LO = 2
_CLIP_HI = 253


def pixel_quality(px: np.ndarray) -> tuple[int, int, int, int, int]:
    """Integer-quantized quality signals for one decoded grayscale image."""
    n = px.size
    hist = np.bincount(px.reshape(-1), minlength=256)
    p = hist[hist > 0] / n
    entropy_cbits = int(round(float(-(p * np.log2(p)).sum()) * 100))
    clipped = int(hist[: _CLIP_LO + 1].sum() + hist[_CLIP_HI:].sum())
    clipped_bps = (clipped * 10000) // n
    std_cpx = int(round(float(px.std()) * 100))
    dyn_range = int(px.max()) - int(px.min())
    d = px.astype(np.int16)
    edges = int((np.abs(d[:, 1:] - d[:, :-1]) > 8).sum() + (np.abs(d[1:, :] - d[:-1, :]) > 8).sum())
    n_pairs = max(px.shape[0] * (px.shape[1] - 1) + (px.shape[0] - 1) * px.shape[1], 1)
    edge_bps = (edges * 10000) // n_pairs
    return entropy_cbits, clipped_bps, std_cpx, dyn_range, edge_bps


def quality_stats(images: DataFrame) -> DataFrame:
    """(image_id, bytes) → integer quality signals, one Arrow pass."""

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "entropy_cbits", "clipped_bps", "std_cpx", "dyn_range", "edge_bps"
            )}
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, _fmt = _decode_any(bytes(data))
                e, c, s, r, g = pixel_quality(px)
                out["image_id"].append(iid)
                out["entropy_cbits"].append(e)
                out["clipped_bps"].append(c)
                out["std_cpx"].append(s)
                out["dyn_range"].append(r)
                out["edge_bps"].append(g)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(_gen, schema=QUALITY_SCHEMA)


def quality_flag(
    min_entropy_cbits: int = 300,
    max_clipped_bps: int = 5000,
) -> Column:
    """Gate expression over quality_stats columns, priority flat → clipped →
    low_entropy → ok.  Thresholds sit in wide deterministic margins: a flat
    image has std exactly 0; a rail-clipped image keeps clipped_bps = 10000
    through the lossy round-trip vs ~200-400 bps for natural content; 300
    cbits (3 bits) is far below any ≥64-pixel non-degenerate histogram and
    far above the ≤1-bit degenerate cases."""
    return (
        F.when(F.col("std_cpx") == 0, F.lit("flat"))
        .when(F.col("clipped_bps") >= max_clipped_bps, F.lit("clipped"))
        .when(F.col("entropy_cbits") < min_entropy_cbits, F.lit("low_entropy"))
        .otherwise(F.lit("ok"))
    )


def quality_gate(stats: DataFrame, **thresholds) -> DataFrame:
    """stats + (flag, keep) — the manifest-side content gate."""
    out = stats.withColumn("flag", quality_flag(**thresholds))
    return out.withColumn("keep", (F.col("flag") == "ok").cast("int"))


# -- degenerate-content planting (test/oracle fixture) --------------------------

def degrade_pixels(px: np.ndarray, mode: str, image_id: str) -> np.ndarray:
    """Deterministic degenerate variants of a source image: 'flat' replaces
    content with one constant (id-derived), 'clipped' thresholds every pixel
    to the rails, 'ok' passes through."""
    if mode == "ok":
        return px
    if mode == "flat":
        import zlib as _z

        level = (_z.crc32(image_id.encode()) >> 8) % 256
        return np.full_like(px, level)
    if mode == "clipped":
        return np.where(px >= 128, np.uint8(255), np.uint8(0)).astype(np.uint8)
    raise ValueError(f"unknown degrade mode {mode!r}")


def build_degraded_images(spark, modes: DataFrame) -> DataFrame:
    """(image_id, caption, mode) → image table with planted degenerate
    content (same codec/fmt selection as sources.images.build_images)."""
    from nrsr_crawler_spark.sources.images import (
        IMAGES_SCHEMA, decode_image, encode_image, fmt_for, original_pixels, phash64,
    )

    def _gen(batches):
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [], "caption": [], "phash": []}
            for iid, cap, mode in zip(pdf["image_id"], pdf["caption"], pdf["mode"]):
                px = degrade_pixels(original_pixels(iid), mode, iid)
                fmt = fmt_for(iid)
                data = encode_image(px, fmt)
                decoded, _ = decode_image(data)
                out["image_id"].append(iid)
                out["bytes"].append(data)
                out["w"].append(px.shape[1])
                out["h"].append(px.shape[0])
                out["fmt"].append(fmt)
                out["caption"].append(cap)
                out["phash"].append(phash64(decoded))
            yield pd.DataFrame(out)

    return modes.mapInPandas(_gen, schema=IMAGES_SCHEMA)
