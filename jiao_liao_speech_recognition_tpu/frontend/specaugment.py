"""SpecAugment on-device with jax.random (SURVEY.md C5).

Time/freq masking on log-mel features, standard in both SpeechBrain recipes
and Whisper fine-tunes (/root/reference/requirements.txt:71). RNG semantics
are jax.random streams — reproducible per step/example — rather than the
reference's numpy/torch global RNG; augmentation is outside the parity
surface (eval paths are augmentation-free, SURVEY §7 hard-part 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import SpecAugmentConfig


def _mask_axis(key, x: jnp.ndarray, axis: int, num_masks: int, max_width: int, fill):
    """Apply `num_masks` random contiguous masks along `axis` of [B, M, T]."""
    size = x.shape[axis]
    b = x.shape[0]
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (b, num_masks), 0, max(max_width, 1) + 1)
    starts = jax.random.randint(ks, (b, num_masks), 0, jnp.maximum(size - widths, 1))
    pos = jnp.arange(size)  # [size]
    # mask[b, i, p] = starts <= p < starts + widths
    hit = (pos[None, None, :] >= starts[..., None]) & (
        pos[None, None, :] < (starts + widths)[..., None]
    )
    mask = jnp.any(hit, axis=1)  # [B, size]
    shape = [x.shape[0], 1, 1]
    shape[axis] = size
    return jnp.where(mask.reshape(shape), fill, x)


def spec_augment(
    key: jax.Array, features: jnp.ndarray, cfg: SpecAugmentConfig
) -> jnp.ndarray:
    """Apply SpecAugment to [B, num_mels, T] features."""
    if not cfg.enabled:
        return features
    kf, kt = jax.random.split(key)
    fill = 0.0 if cfg.replace_with_zero else jnp.mean(features, axis=(1, 2), keepdims=True)
    t = features.shape[2]
    features = _mask_axis(kf, features, 1, cfg.num_freq_masks, cfg.freq_mask_width, fill)
    features = _mask_axis(
        kt, features, 2, cfg.num_time_masks, int(cfg.time_mask_fraction * t), fill
    )
    return features
