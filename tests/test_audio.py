"""Audio modality: fake PCM codec round-trip, decode stats, window-energy
tiling, explicit non-FAUD stub (sources/audio.py, multimodal audio kernels)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.multimodal import (
    audio_window_features,
    decode_audio_stats,
)
from nrsr_crawler_spark.sources.audio import (
    SAMPLE_RATE,
    build_audio,
    decode_audio,
    encode_audio,
    synth_samples,
)


def test_pcm_codec_roundtrip_lossless():
    s = synth_samples("aud0000000007")
    out, sr = decode_audio(encode_audio(s))
    assert sr == SAMPLE_RATE
    assert np.array_equal(out, s)
    assert out.dtype == np.dtype("<i2")


def test_non_faud_decode_is_explicit_stub():
    # RIFF/WAV is a REAL branch since round 4 (stdlib wave; test_real_codecs);
    # payloads needing a compressed-audio codec stay capability-gated.
    from nrsr_crawler_spark.sources.audio import HAS_SOUNDFILE

    if HAS_SOUNDFILE:
        pytest.skip("soundfile installed; stub branch unreachable")
    with pytest.raises(NotImplementedError, match="soundfile|pyav"):
        decode_audio(b"fLaC....not decodable here")


def test_decode_stats_exact_integers(spark):
    ids = spark.createDataFrame(
        [(f"aud{i:010d}", f"cap {i}") for i in range(1, 7)],
        "audio_id string, caption string",
    )
    auds = build_audio(spark, ids)
    got = {r["audio_id"]: r for r in decode_audio_stats(auds).collect()}
    for aid, r in got.items():
        s = synth_samples(aid).astype(np.int64)
        assert r["n_samples"] == s.shape[0]
        assert r["energy"] == int((s * s).sum())
        assert r["peak"] == int(np.abs(s).max())
        assert r["sample_rate"] == SAMPLE_RATE


def test_window_features_tile_the_clip_exactly(spark):
    ids = spark.createDataFrame(
        [(f"aud{i:010d}", f"cap {i}") for i in range(1, 7)],
        "audio_id string, caption string",
    )
    auds = build_audio(spark, ids)
    rows = audio_window_features(auds, window=256).collect()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["audio_id"], []).append(r)
    for aid, ws in by_clip.items():
        n = synth_samples(aid).shape[0]
        n_win = -(-n // 256)
        assert sorted(w["win_idx"] for w in ws) == list(range(n_win))
        assert sum(w["n"] for w in ws) == n
        assert sum(w["energy"] for w in ws) == ws[0]["total_energy"]
        # tail frame keeps its true length
        tail = max(ws, key=lambda w: w["win_idx"])
        assert tail["n"] == n - 256 * (n_win - 1)
