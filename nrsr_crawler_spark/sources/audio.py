"""Audio table: fake PCM codec + deterministic synth (task brief: treat
image/AUDIO/video as opaque binary columns with typed metadata; decode /
feature-extract as Arrow UDFs, real codecs stubbed).

Three codec tiers (decode_audio dispatches on payload magic):

 1. FAUD fake PCM — ``FAUD | sr(u32) | n(u32) | int16 samples LE`` —
    lossless by construction, the frozen-oracle default;
 2. real RIFF/WAV via stdlib ``wave`` (encode_audio_wav) — a genuine audio
    container, tested in-container;
 3. FLAC/OGG/… via soundfile, capability-gated on HAS_SOUNDFILE (absent
    here; tests skipif-gate so they run the moment the dependency exists).

The Spark-side plumbing (schema, mapInPandas batching, integer-energy
invariants) is identical across tiers.

Synthesis is seeded from the audio id (md5), like the image generator: a
sine carrier + deterministic integer noise, 16 kHz int16 mono.  All
energy/feature math downstream is exact int64 (|s| ≤ 32767, Σ s² over a few
thousand samples ≪ 2⁶³).
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # capability detection: FLAC/OGG/… codecs (absent in this container)
    import soundfile as _soundfile

    HAS_SOUNDFILE = True
except ImportError:  # pragma: no cover - exercised when soundfile exists
    _soundfile = None
    HAS_SOUNDFILE = False

MAGIC_AUD = b"FAUD"
MAGIC_RIFF = b"RIFF"
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


def encode_audio_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """int16 mono → genuine RIFF/WAV bytes (stdlib ``wave`` — a real audio
    container, playable anywhere; runs and is tested in this container)."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV in the stdlib branch")
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
        samples = np.frombuffer(raw, dtype="<i2")
        if w.getnchannels() > 1:  # downmix by taking channel 0, deterministic
            samples = samples[:: w.getnchannels()]
    return samples, sr


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Dispatch on payload magic: FAUD fake PCM, real RIFF/WAV (stdlib),
    anything else via soundfile when installed (FLAC/OGG — the deploy-time
    branch, capability-gated on HAS_SOUNDFILE)."""
    head = bytes(data[:4])
    if head == MAGIC_RIFF:
        return _decode_wav(data)
    if head != MAGIC_AUD:
        if HAS_SOUNDFILE:  # pragma: no cover - soundfile branch
            arr, sr = _soundfile.read(io.BytesIO(bytes(data)), dtype="int16")
            if arr.ndim > 1:
                arr = arr[:, 0]
            return np.ascontiguousarray(arr, dtype="<i2"), int(sr)
        raise NotImplementedError(
            "non-FAUD/WAV payloads need soundfile/pyav at deploy time"
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


def build_audio(spark: SparkSession, ids: DataFrame, codec: str = "faud") -> DataFrame:
    """(audio_id, caption) → the audio table (one Arrow pass, the audio twin
    of images.build_images).  codec: ``faud`` (frozen-oracle default) or
    ``wav`` (genuine RIFF/WAV container, runs in-container)."""
    if codec not in ("faud", "wav"):
        raise ValueError(f"codec {codec!r}")
    enc = encode_audio if codec == "faud" else encode_audio_wav

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "bytes", "sample_rate", "n_samples", "caption")}
            for aid, cap in zip(pdf["audio_id"], pdf["caption"]):
                s = synth_samples(aid)
                out["audio_id"].append(aid)
                out["bytes"].append(enc(s))
                out["sample_rate"].append(SAMPLE_RATE)
                out["n_samples"].append(int(s.shape[0]))
                out["caption"].append(cap)
            yield pd.DataFrame(out)

    return ids.select("audio_id", "caption").mapInPandas(_gen, schema=AUDIO_SCHEMA)
