"""SB-style fbank, global CMVN, augmentation chain, RTFx harness,
profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jiao_liao_speech_recognition_tpu.frontend.augment import augment_waveform
from jiao_liao_speech_recognition_tpu.frontend.cmvn import (
    GlobalCMVN,
    apply_global_cmvn,
    load_cmvn,
)
from jiao_liao_speech_recognition_tpu.frontend.features import fbank
from jiao_liao_speech_recognition_tpu.utils.config import AugmentConfig, FrontendConfig


def test_fbank_shapes_and_cmvn():
    cfg = FrontendConfig(whisper_norm=False, cmvn="utterance", preemphasis=0.97)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.1)
    out = np.asarray(fbank(wav, cfg))
    assert out.shape == (2, 80, 100)
    # utterance CMVN: per-mel mean ~0, std ~1
    assert np.abs(out.mean(axis=2)).max() < 1e-4
    assert np.abs(out.std(axis=2) - 1.0).max() < 1e-2


def test_fbank_preemphasis_changes_spectrum():
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1)
    a = np.asarray(fbank(wav, FrontendConfig(whisper_norm=False, cmvn="none", preemphasis=0.0)))
    b = np.asarray(fbank(wav, FrontendConfig(whisper_norm=False, cmvn="none", preemphasis=0.97)))
    assert np.abs(a - b).max() > 0.1  # low freqs attenuated


def test_global_cmvn_roundtrip(tmp_path, rng):
    acc = GlobalCMVN(4)
    feats = rng.randn(3, 4, 50).astype(np.float32) * 2.0 + 1.0
    lengths = np.array([50, 30, 10])
    acc.update(feats, lengths)
    mean, std = acc.finalize()
    # oracle over valid frames
    valid = np.concatenate([feats[b, :, : lengths[b]] for b in range(3)], axis=1)
    assert np.abs(mean - valid.mean(axis=1)).max() < 1e-5
    assert np.abs(std - valid.std(axis=1)).max() < 1e-4

    acc.save(tmp_path / "cmvn.npz")
    m2, s2 = load_cmvn(tmp_path / "cmvn.npz")
    assert np.allclose(m2, mean) and np.allclose(s2, std)

    normed = np.asarray(apply_global_cmvn(jnp.asarray(feats), m2, s2))
    nv = np.concatenate([normed[b, :, : lengths[b]] for b in range(3)], axis=1)
    assert np.abs(nv.mean(axis=1)).max() < 1e-4


def test_augment_chain_shapes_and_determinism():
    cfg = AugmentConfig(enabled=True, probability=1.0)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 8000).astype(np.float32) * 0.1)
    k = jax.random.PRNGKey(0)
    a = augment_waveform(k, wav, cfg)
    b = augment_waveform(k, wav, cfg)
    assert a.shape == wav.shape
    assert np.allclose(np.asarray(a), np.asarray(b))  # same key, same output
    c = augment_waveform(jax.random.PRNGKey(1), wav, cfg)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.isfinite(np.asarray(a)).all()


def test_augment_jit_compatible():
    cfg = AugmentConfig(enabled=True, probability=0.5)
    wav = jnp.zeros((1, 8000), jnp.float32)
    f = jax.jit(lambda k, w: augment_waveform(k, w, cfg))
    out = f(jax.random.PRNGKey(0), wav)
    assert out.shape == wav.shape


def test_rtfx_harness():
    from jiao_liao_speech_recognition_tpu.evals.rtfx import measure_rtfx

    def infer(wav, lengths):
        return jnp.sum(wav, axis=1).astype(jnp.int32)

    res = measure_rtfx(infer, batch=2, chunk_seconds=1.0, iters=3, num_buffers=2)
    assert res.rtfx > 0
    assert res.to_json()["metric"] == "rtfx"


def test_checked_catches_nan():
    from jiao_liao_speech_recognition_tpu.utils.profiling import checked

    def bad(x):
        return jnp.log(x)  # nan for negative

    f = checked(bad)
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))
