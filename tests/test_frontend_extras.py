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


def test_pitch_shift_changes_pitch_preserves_shape():
    """pitch_semitones is consumed: a pure tone shifted +2 semitones moves
    its dominant frequency by ~2^(2/12) while keeping length/duration."""
    from jiao_liao_speech_recognition_tpu.frontend.augment import pitch_shift

    sr, n = 16000, 16000
    t = np.arange(n) / sr
    wav = jnp.asarray(np.sin(2 * np.pi * 440.0 * t, dtype=np.float32)[None])
    # lo=hi band around +2 -> the only branch is +2 semitones
    out = pitch_shift(jax.random.PRNGKey(0), wav, 1.5, 2.5)
    assert out.shape == wav.shape
    spec = np.abs(np.fft.rfft(np.asarray(out)[0, 2000:14000]))
    freqs = np.fft.rfftfreq(12000, 1 / sr)
    peak = freqs[np.argmax(spec)]
    expect = 440.0 * 2 ** (2 / 12)  # ~493.9 Hz
    assert abs(peak - expect) < 15.0, peak


def test_augment_consumes_pitch_config():
    cfg = AugmentConfig(enabled=True, probability=1.0,
                        gain_db=(0.0, 0.0), noise_snr_db=(100.0, 100.0),
                        speed_rates=(1.0,), pitch_semitones=(2.0, 2.0))
    # degenerate range (lo==hi, no integer in open set) -> config validated:
    # with lo=hi=2 the integer set is {2}, so pitch DOES apply
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 8000).astype(np.float32))
    out = augment_waveform(jax.random.PRNGKey(1), wav, cfg)
    assert out.shape == wav.shape
    assert np.abs(np.asarray(out) - np.asarray(wav)).max() > 1e-3


def test_global_cmvn_wired_into_featurize(tmp_path, rng):
    """cmvn='global' loads stats from cmvn_stats_path and applies them;
    a missing path fails loudly instead of silently no-oping."""
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch

    wav = jnp.asarray(rng.randn(2, 32000).astype(np.float32) * 0.1)
    base_cfg = FrontendConfig(chunk_seconds=2.0, cmvn="none")
    feats = featurize_batch(wav, base_cfg)

    acc = GlobalCMVN(base_cfg.num_mels)
    acc.update(np.asarray(feats))
    stats = tmp_path / "cmvn.npz"
    acc.save(stats)

    cfg = FrontendConfig(chunk_seconds=2.0, cmvn="global", cmvn_stats_path=str(stats))
    got = featurize_batch(wav, cfg)
    mean, std = load_cmvn(stats)
    want = apply_global_cmvn(feats, mean, std)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5
    # corpus-mean ~0 per mel bin after normalization
    assert np.abs(np.asarray(got).mean(axis=(0, 2))).max() < 1e-3

    with pytest.raises(ValueError, match="cmvn_stats_path"):
        featurize_batch(wav, FrontendConfig(chunk_seconds=2.0, cmvn="global"))
    with pytest.raises(ValueError, match="unknown cmvn"):
        featurize_batch(wav, FrontendConfig(chunk_seconds=2.0, cmvn="banana"))
