"""Image+caption table: codecs, perceptual hash, and the Spark image path
(SURVEY §2.1 S7; BASELINE.json input_hint — the authoritative input shape:
(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash int64)).

Pillow is NOT available in this container, so the decode step is a
deterministic fake codec (documented stub per the task brief) implemented in
pure numpy+zlib with honest lossy/lossless semantics:

 - ``png``  : zlib over raw pixels — lossless, exact-roundtrip;
 - ``jpeg`` : 6-bit quantization then zlib — lossy with bounded error
   (max |Δ| = 3 per sample ⇒ MSE ≤ ~2.9 ⇒ PSNR ≥ ~43 dB > the 40 dB
   input_hint floor, for any image).

The container format is ``FIMG | fmt(1B) | h(u16) | w(u16) | zlib(payload)``.
Swapping in Pillow at deploy time changes only ``encode_image``/
``decode_image``; all Spark-side plumbing (schema, mapInPandas batching,
PSNR/caption verification) is real and tested.

The reference's image flow: ImagesPipeline downloads ``image_urls`` scraped
at members.py:136-137 into ./photos (settings.py:79-84), Pillow re-encoding
thumbnails.  Here decoded/verified rows land in the image+caption table and
the per-row invariant (decoded-pixel PSNR + caption equality) is checked by
``verify_images``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"FIMG"
FMT_CODES = {"png": 0, "jpeg": 1}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}

IMAGES_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"


# -- codec (deterministic numpy stand-in for Pillow) --------------------------

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w) uint8 grayscale."""
    h, w = pixels.shape
    if fmt == "jpeg":
        payload = (pixels & 0xFC) | 0x02  # 6-bit quantization, mid-step bias
    elif fmt == "png":
        payload = pixels
    else:
        raise NotImplementedError(f"fmt {fmt!r}: real codecs need Pillow (not in container)")
    head = MAGIC + bytes([FMT_CODES[fmt]]) + int(h).to_bytes(2, "little") + int(w).to_bytes(2, "little")
    return head + zlib.compress(payload.astype(np.uint8).tobytes(), 6)


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    if data[:4] != MAGIC:
        raise ValueError("not a FIMG container")
    fmt = FMT_NAMES[data[4]]
    h = int.from_bytes(data[5:7], "little")
    w = int.from_bytes(data[7:9], "little")
    pixels = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w)
    return pixels, fmt


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 block-mean, threshold at the mean."""
    h, w = pixels.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = pixels[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def original_pixels(image_id: str, min_px: int = 8, max_px: int = 64) -> np.ndarray:
    """Deterministic source-of-truth pixels for an image_id (seeded RNG —
    FIXTURES.md §1); regenerable anywhere for PSNR verification."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    side = int(rng.integers(min_px, max_px + 1))
    return rng.integers(0, 256, size=(side, side), dtype=np.uint8)


def fmt_for(image_id: str) -> str:
    return "png" if (zlib.crc32(image_id.encode()) & 1) == 0 else "jpeg"


# -- Spark plumbing ------------------------------------------------------------

def build_images(spark: SparkSession, captions: DataFrame) -> DataFrame:
    """captions: (image_id string, caption string) → the full image+caption
    table.  Encode runs in mapInPandas (Arrow batches)."""

    def _gen(batches):
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [], "caption": [], "phash": []}
            for iid, cap in zip(pdf["image_id"], pdf["caption"]):
                px = original_pixels(iid)
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

    return captions.mapInPandas(_gen, schema=IMAGES_SCHEMA)


VERIFY_SCHEMA = (
    "image_id string, fmt string, psnr_db double, exact boolean, caption_ok boolean, "
    "w_ok boolean, h_ok boolean, phash_ok boolean"
)


def verify_images(images: DataFrame, expected_captions: DataFrame) -> DataFrame:
    """Per-row input_hint invariant: decoded-pixel PSNR≥40dB (lossy) / exact
    (lossless), caption equality, dims + phash consistency."""
    joined = images.join(
        expected_captions.withColumnRenamed("caption", "expected_caption"), "image_id"
    )

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "fmt", "psnr_db", "exact", "caption_ok", "w_ok", "h_ok", "phash_ok")}
            for row in pdf.itertuples(index=False):
                decoded, fmt = decode_image(bytes(row.bytes))
                orig = original_pixels(row.image_id)
                p = psnr(orig, decoded)
                out["image_id"].append(row.image_id)
                out["fmt"].append(fmt)
                out["psnr_db"].append(p if np.isfinite(p) else 999.0)
                out["exact"].append(bool(np.array_equal(orig, decoded)))
                out["caption_ok"].append(row.caption == row.expected_caption)
                out["w_ok"].append(decoded.shape[1] == row.w)
                out["h_ok"].append(decoded.shape[0] == row.h)
                out["phash_ok"].append(phash64(decoded) == row.phash)
            yield pd.DataFrame(out)

    return joined.mapInPandas(_gen, schema=VERIFY_SCHEMA)
