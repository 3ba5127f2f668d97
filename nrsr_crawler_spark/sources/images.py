"""Image+caption table: codecs, perceptual hash, and the Spark image path
(SURVEY §2.1 S7; BASELINE.json input_hint — the authoritative input shape:
(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash int64)).

Three codec tiers (decode_image_any dispatches on payload magic):

 1. FIMG fake codec — the frozen-oracle default (below);
 2. real PNG — a genuine spec-compliant pure-stdlib codec (encode_png_real /
    decode_png_real), tested in-container;
 3. real JPEG/other — Pillow, capability-gated on HAS_PIL (absent here;
    tests skipif-gate so they run the moment the dependency exists).

The FIMG fake codec is deterministic, implemented in pure numpy+zlib with
honest lossy/lossless semantics:

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

import io
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # capability detection: real JPEG codec (absent in this container)
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised when Pillow exists
    _PILImage = None
    HAS_PIL = False

MAGIC = b"FIMG"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
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


# -- real codecs ---------------------------------------------------------------
#
# The reference actually downloads + Pillow-decodes JPEGs (ImagesPipeline,
# reference settings.py:79-84; Pillow at requirements.txt:1).  Real branches:
#
#  - PNG: a genuine spec-compliant codec in pure stdlib (zlib + chunk CRCs,
#    RFC 2083) for 8-bit grayscale — encodes filter-0 scanlines, decodes all
#    five filter types — so the real-format path runs and is tested even in
#    this Pillow-less container.  Output opens in any PNG viewer.
#  - JPEG (and non-grayscale PNG): Pillow when installed (HAS_PIL), else an
#    explicit NotImplementedError.  Tests for the Pillow branch are
#    skipif-gated so they execute the moment the dependency exists.


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_real(pixels: np.ndarray) -> bytes:
    """8-bit grayscale → real PNG bytes (pure stdlib; filter 0 scanlines)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # depth 8, gray, no interlace
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_real(data: bytes) -> np.ndarray:
    """Real PNG → 8-bit grayscale pixels (pure stdlib; filters 0-4).

    Supports the subset this engine emits (8-bit grayscale, non-interlaced);
    anything else falls through to Pillow when available."""
    if bytes(data[: len(PNG_MAGIC)]) != PNG_MAGIC:
        raise ValueError("not a PNG")
    off = len(PNG_MAGIC)
    w = h = None
    idat = []
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        tag = bytes(data[off + 4 : off + 8])
        payload = bytes(data[off + 8 : off + 8 + ln])
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 0 or interlace != 0:
                if HAS_PIL:  # pragma: no cover - Pillow branch
                    return np.asarray(
                        _PILImage.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.uint8
                    )
                raise NotImplementedError(
                    "pure decoder handles 8-bit grayscale PNG; others need Pillow"
                )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w + 1
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        ftype = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            cur = np.cumsum(cur, dtype=np.int64) % 256
        elif ftype == 2:  # Up
            cur = (cur + prev) % 256
        elif ftype == 3:  # Average
            acc = cur.copy()
            left = 0
            for i in range(w):
                left = (acc[i] + (left + prev[i]) // 2) % 256
                acc[i] = left
            cur = acc
        elif ftype == 4:  # Paeth
            acc = cur.copy()
            left = upleft = 0
            for i in range(w):
                left = (acc[i] + _paeth(left, int(prev[i]), upleft)) % 256
                upleft = int(prev[i])
                acc[i] = left
            cur = acc
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = cur.astype(np.int32)
        out[r] = cur.astype(np.uint8)
    return out


def encode_image_real(pixels: np.ndarray, fmt: str, quality: int = 100) -> bytes:
    """Real-format encode: PNG via the pure codec (always available), JPEG via
    Pillow (capability-gated — the reference's actual ImagesPipeline path)."""
    if fmt == "png":
        return encode_png_real(pixels)
    if fmt == "jpeg":
        if not HAS_PIL:
            raise NotImplementedError("real JPEG encode needs Pillow (absent here)")
        buf = io.BytesIO()  # pragma: no cover - Pillow branch
        _PILImage.fromarray(np.ascontiguousarray(pixels, dtype=np.uint8), "L").save(
            buf, "JPEG", quality=quality
        )
        return buf.getvalue()
    raise NotImplementedError(f"fmt {fmt!r}")


def decode_image_any(data: bytes) -> tuple[np.ndarray, str]:
    """Unified decode dispatch: FIMG fake codec, real PNG (pure stdlib), real
    JPEG (Pillow when present).  All mapInPandas kernels route through this,
    so swapping payload formats never touches the Spark plumbing."""
    buf = bytes(data[:8])
    if buf[:4] == MAGIC:
        return decode_image(bytes(data))
    if buf == PNG_MAGIC:
        return decode_png_real(bytes(data)), "png"
    if buf[:3] == JPEG_MAGIC:
        if not HAS_PIL:
            raise NotImplementedError("real JPEG decode needs Pillow (absent here)")
        return (  # pragma: no cover - Pillow branch
            np.asarray(_PILImage.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.uint8),
            "jpeg",
        )
    if HAS_PIL:  # pragma: no cover - Pillow branch (gif/webp/…)
        img = _PILImage.open(io.BytesIO(bytes(data)))
        return np.asarray(img.convert("L"), dtype=np.uint8), (img.format or "").lower()
    raise NotImplementedError("unrecognized image payload needs Pillow at deploy time")


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

def build_images(spark: SparkSession, captions: DataFrame, codec: str = "fimg") -> DataFrame:
    """captions: (image_id string, caption string) → the full image+caption
    table.  Encode runs in mapInPandas (Arrow batches).

    codec: ``fimg`` (deterministic fake, the frozen-oracle default),
    ``real-png`` (every row genuine PNG via the pure-stdlib codec — runs in
    this container), or ``real`` (fmt_for-honoring: PNG pure, JPEG Pillow)."""
    if codec not in ("fimg", "real-png", "real"):
        raise ValueError(f"codec {codec!r}")

    def _gen(batches):
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [], "caption": [], "phash": []}
            for iid, cap in zip(pdf["image_id"], pdf["caption"]):
                px = original_pixels(iid)
                fmt = "png" if codec == "real-png" else fmt_for(iid)
                if codec == "fimg":
                    data = encode_image(px, fmt)
                else:
                    data = encode_image_real(px, fmt)
                decoded, _ = decode_image_any(data)
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
                decoded, fmt = decode_image_any(bytes(row.bytes))
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
