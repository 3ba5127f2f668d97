"""Audio table: fake PCM codec + deterministic synth (task brief: treat
image/AUDIO/video as opaque binary columns with typed metadata; decode /
feature-extract as Arrow UDFs, real codecs stubbed).

No soundfile/ffmpeg in this container, so the codec is a documented
deterministic stand-in: ``FAUD | sr(u32) | n(u32) | int16 samples LE`` —
lossless by construction (PCM is already raw).  Swapping in
``soundfile.read`` / pyav at deploy time changes only ``encode_audio``/
``decode_audio``; the Spark-side plumbing (schema, mapInPandas batching,
integer-energy invariants) is real and tested.

Synthesis is seeded from the audio id (md5), like the image generator: a
sine carrier + deterministic integer noise, 16 kHz int16 mono.  All
energy/feature math downstream is exact int64 (|s| ≤ 32767, Σ s² over a few
thousand samples ≪ 2⁶³).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC_AUD = b"FAUD"
SAMPLE_RATE = 16_000

AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int, n_samples long, caption string"


def encode_audio(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """samples: 1-D int16."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    return (
        MAGIC_AUD
        + int(sample_rate).to_bytes(4, "little")
        + int(s.shape[0]).to_bytes(4, "little")
        + s.tobytes()
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if bytes(data[:4]) != MAGIC_AUD:
        # real-codec branch — requires soundfile/ffmpeg, absent here
        raise NotImplementedError(
            "non-FAUD payloads need soundfile/pyav at deploy time"
        )
    sr = int.from_bytes(data[4:8], "little")
    n = int.from_bytes(data[8:12], "little")
    samples = np.frombuffer(data[12 : 12 + 2 * n], dtype="<i2")
    if samples.shape[0] != n:
        raise ValueError("truncated FAUD payload")
    return samples, sr


def synth_samples(audio_id: str) -> np.ndarray:
    """Deterministic int16 clip for ``audio_id``: seeded length (1000-2600
    samples), sine carrier + LCG noise — reproducible in any process."""
    seed = int.from_bytes(hashlib.md5(audio_id.encode()).digest()[:8], "big")
    n = 1000 + (seed % 5) * 400
    freq = 100 + (seed >> 3) % 900
    t = np.arange(n, dtype=np.float64)
    carrier = 12000.0 * np.sin(2.0 * np.pi * freq * t / SAMPLE_RATE)
    lcg = (seed + 0x9E3779B97F4A7C15 * np.arange(n, dtype=np.uint64)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    noise = ((lcg >> np.uint64(33)).astype(np.int64) % 2001) - 1000
    return np.clip(np.round(carrier) + noise, -32768, 32767).astype(np.int16)


def build_audio(spark: SparkSession, ids: DataFrame) -> DataFrame:
    """(audio_id, caption) → the audio table (one Arrow pass, the audio twin
    of images.build_images)."""

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "bytes", "sample_rate", "n_samples", "caption")}
            for aid, cap in zip(pdf["audio_id"], pdf["caption"]):
                s = synth_samples(aid)
                out["audio_id"].append(aid)
                out["bytes"].append(encode_audio(s))
                out["sample_rate"].append(SAMPLE_RATE)
                out["n_samples"].append(int(s.shape[0]))
                out["caption"].append(cap)
            yield pd.DataFrame(out)

    return ids.select("audio_id", "caption").mapInPandas(_gen, schema=AUDIO_SCHEMA)
