"""Multimodal binary-column operators (task brief: treat image/audio/video as
opaque ``binary`` + typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs over ``mapInPandas``).

Real here: schemas, Arrow batch shape, partitioning, the FIMG fake-codec
decode (sources/images.py), a genuine pure-stdlib PNG codec, numpy
resize/feature kernels, and the frame-sample container walk.  Capability-
gated (container lacks Pillow/ffmpeg): real JPEG/gif/webp decode runs via
``PIL.Image.open`` when Pillow is installed (``images.HAS_PIL``), raises
``NotImplementedError`` otherwise; video frame decode becomes pyav at
deploy time inside the SAME mapInPandas functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from nrsr_crawler_spark.sources.images import (
    MAGIC,
    decode_image,
    decode_image_any,
    encode_image,
    phash64,
)

DECODE_SCHEMA = "image_id string, w int, h int, fmt string, mean_px double, std_px double, phash long"
RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"
FRAMES_SCHEMA = "video_id string, frame_idx int, frame_bytes binary, w int, h int"
FEATURES_SCHEMA = "image_id string, features array<float>"


def _decode_any(data: bytes) -> tuple[np.ndarray, str]:
    """FIMG fake codec, real PNG (pure stdlib), real JPEG/other (Pillow when
    installed) — one dispatch for every decode kernel in the engine."""
    return decode_image_any(data)


def decode_stats(images: DataFrame) -> DataFrame:
    """binary → typed metadata + pixel stats (the 'decode' stage)."""

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "w", "h", "fmt", "mean_px", "std_px", "phash")}
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, fmt = _decode_any(data)
                out["image_id"].append(iid)
                out["w"].append(px.shape[1])
                out["h"].append(px.shape[0])
                out["fmt"].append(fmt)
                out["mean_px"].append(float(px.mean()))
                out["std_px"].append(float(px.std()))
                out["phash"].append(phash64(px))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(_gen, schema=DECODE_SCHEMA)


def block_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean resize (area interpolation)."""
    h, w = px.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            block = px[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)]
            out[i, j] = int(round(float(block.mean())))
    return out


def resize_images(images: DataFrame, out_h: int = 16, out_w: int = 16) -> DataFrame:
    """binary → re-encoded resized binary (the 'thumbnail' stage the
    reference's ImagesPipeline ran via Pillow, settings.py:79-84)."""

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, fmt = _decode_any(data)
                small = block_resize(px, out_h, out_w)
                out["image_id"].append(iid)
                out["bytes"].append(encode_image(small, fmt))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(_gen, schema=RESIZE_SCHEMA)


def extract_features(images: DataFrame, bins: int = 16) -> DataFrame:
    """binary → embedding-ish feature vector (normalized histogram)."""

    def _gen(batches):
        for pdf in batches:
            out = {"image_id": [], "features": []}
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, _ = _decode_any(data)
                hist, _edges = np.histogram(px, bins=bins, range=(0, 256))
                feats = (hist / max(px.size, 1)).astype(np.float32)
                out["image_id"].append(iid)
                out["features"].append(feats.tolist())
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(_gen, schema=FEATURES_SCHEMA)


# -- video: concatenated FIMG frames with a u32 count header --------------------

def pack_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    parts = [len(frames).to_bytes(4, "little")]
    for f in frames:
        b = encode_image(f, fmt)
        parts.append(len(b).to_bytes(4, "little"))
        parts.append(b)
    return b"".join(parts)


def sample_frames(videos: DataFrame, every: int = 2) -> DataFrame:
    """video binary → every-Nth decoded frame re-encoded standalone
    (the 'frame-sample' stage; pyav/ffmpeg at deploy time)."""

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("video_id", "frame_idx", "frame_bytes", "w", "h")}
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                buf = bytes(data)
                n = int.from_bytes(buf[:4], "little")
                off = 4
                for idx in range(n):
                    ln = int.from_bytes(buf[off: off + 4], "little")
                    off += 4
                    frame = buf[off: off + ln]
                    off += ln
                    if idx % every == 0:
                        px, _fmt = decode_image(frame)
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["frame_bytes"].append(frame)
                        out["w"].append(px.shape[1])
                        out["h"].append(px.shape[0])
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes").mapInPandas(_gen, schema=FRAMES_SCHEMA)


PATCHES_SCHEMA = (
    "image_id string, patch_idx int, prow int, pcol int, ph int, pw int, "
    "patch_sum long, canvas_sum long"
)


def extract_patches(
    images: DataFrame, patch: int = 8, grid: int = 4
) -> DataFrame:
    """ViT-style patchify (Dosovitskiy et al., arXiv:2010.11929 §3): decode,
    block-resize to a (grid·patch)² canvas, split into ``grid × grid``
    non-overlapping ``patch × patch`` tiles — one row per tile with its
    EXACT integer pixel sum (uint8 sums are integers, so the invariant
    Σ patch_sum == canvas total is engine-exact and oracle-checkable;
    a training pipeline would emit the flattened pixel vector instead,
    same batch shape).  ``canvas_sum`` repeats the whole-canvas total on
    every row so the coverage identity is checkable without a second
    decode (the resize+re-encode path is lossy for jpeg-ish images).

    One Arrow pass (mapInPandas), rows out = grid² per image — bounded
    fan-out, no shuffle, no join."""
    side = patch * grid

    def _gen(batches):
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "image_id", "patch_idx", "prow", "pcol", "ph", "pw",
                    "patch_sum", "canvas_sum",
                )
            }
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, _fmt = _decode_any(data)
                canvas = block_resize(px, side, side)
                total = int(canvas.astype(np.int64).sum())
                for r in range(grid):
                    for c in range(grid):
                        tile = canvas[
                            r * patch : (r + 1) * patch, c * patch : (c + 1) * patch
                        ]
                        out["image_id"].append(iid)
                        out["patch_idx"].append(r * grid + c)
                        out["prow"].append(r)
                        out["pcol"].append(c)
                        out["ph"].append(tile.shape[0])
                        out["pw"].append(tile.shape[1])
                        out["patch_sum"].append(int(tile.astype(np.int64).sum()))
                        out["canvas_sum"].append(total)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(_gen, schema=PATCHES_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "audio_id string, sample_rate int, n_samples long, energy long, peak int"
)
AUDIO_WINDOWS_SCHEMA = (
    "audio_id string, win_idx int, n long, energy long, "
    "total_energy long, n_windows int"
)


def decode_audio_stats(audios: DataFrame) -> DataFrame:
    """binary → typed audio metadata + EXACT integer signal stats
    (energy = Σ s² in int64, peak = max |s|) — the audio 'decode' stage."""
    from nrsr_crawler_spark.sources.audio import decode_audio

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "sample_rate", "n_samples", "energy", "peak")}
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, sr = decode_audio(bytes(data))
                s64 = s.astype(np.int64)
                out["audio_id"].append(aid)
                out["sample_rate"].append(sr)
                out["n_samples"].append(int(s.shape[0]))
                out["energy"].append(int((s64 * s64).sum()))
                out["peak"].append(int(np.abs(s64).max()) if s.shape[0] else 0)
            yield pd.DataFrame(out)

    return audios.select("audio_id", "bytes").mapInPandas(_gen, schema=AUDIO_STATS_SCHEMA)


def audio_window_features(audios: DataFrame, window: int = 256) -> DataFrame:
    """Fixed-window energy features (the RMS-frame stage of an audio
    pipeline): one row per ``window``-sample frame with its exact int64
    energy, plus the clip total carried per row so the coverage identity
    Σ frame energy == total is oracle-checkable without a second decode
    (same convention as extract_patches' canvas_sum).  Short tail frames
    keep their true length ``n``."""
    from nrsr_crawler_spark.sources.audio import decode_audio

    def _gen(batches):
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "audio_id", "win_idx", "n", "energy", "total_energy", "n_windows"
                )
            }
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, _sr = decode_audio(bytes(data))
                s64 = s.astype(np.int64)
                total = int((s64 * s64).sum())
                n_win = max(1, -(-s.shape[0] // window)) if s.shape[0] else 0
                for i in range(n_win):
                    frame = s64[i * window : (i + 1) * window]
                    out["audio_id"].append(aid)
                    out["win_idx"].append(i)
                    out["n"].append(int(frame.shape[0]))
                    out["energy"].append(int((frame * frame).sum()))
                    out["total_energy"].append(total)
                    out["n_windows"].append(n_win)
            yield pd.DataFrame(out)

    return audios.select("audio_id", "bytes").mapInPandas(_gen, schema=AUDIO_WINDOWS_SCHEMA)
