"""Fused Pallas log-mel kernel vs the XLA conv path and the golden
WhisperFeatureExtractor fixtures (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jiao_liao_speech_recognition_tpu.frontend.features import (
    log_mel_spectrogram,
    pad_or_trim,
)
from jiao_liao_speech_recognition_tpu.frontend.pallas_frontend import (
    fused_log_mel,
    fused_log_mel_raw,
)
from jiao_liao_speech_recognition_tpu.utils.config import FrontendConfig


def _wav(seed, secs, scale=0.1):
    rng = np.random.RandomState(seed)
    t = np.arange(int(16000 * secs)) / 16000.0
    return (
        rng.randn(len(t)) * scale * 0.3 + np.sin(2 * np.pi * 440 * t) * scale
    ).astype(np.float32)


def test_fused_matches_xla_path():
    cfg = FrontendConfig(chunk_seconds=3.0)
    wav = np.stack([pad_or_trim(_wav(s, 2.0), cfg) for s in (0, 1)])
    want = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))
    got = np.asarray(fused_log_mel(jnp.asarray(wav), cfg))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2e-4


def test_fused_matches_whisper_fe():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    cfg = FrontendConfig()
    wav = _wav(2, 4.0, 0.3)
    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    got = np.asarray(fused_log_mel(pad_or_trim(wav, cfg)[None], cfg))[0]
    assert got.shape == ref.shape == (80, 3000)
    assert np.abs(got - ref).max() < 2e-4


def test_fused_raw_odd_lengths():
    """Non-tile-multiple frame counts are padded internally and trimmed."""
    wav = jnp.asarray(_wav(3, 0.9))[None]  # 14400 samples -> 90 frames
    out = np.asarray(fused_log_mel_raw(wav))
    assert out.shape == (1, 80, 90)
    assert np.isfinite(out).all()
