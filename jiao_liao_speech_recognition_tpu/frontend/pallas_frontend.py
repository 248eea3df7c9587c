"""Fused Pallas TPU kernel for the log-mel frontend.

Fuses frame -> window*DFT (MXU matmul) -> power -> mel matmul (MXU) -> log10
into one kernel so the [B, 2F, T] power spectrum never round-trips to HBM
(the dominant memory traffic in the XLA conv path). The Whisper
normalization (max-8 clamp, (x+4)/4) needs a global max over the utterance,
so it stays outside the kernel as cheap XLA elementwise ops.

Grid: (B, T // FRAME_TILE). Each program computes FRAME_TILE frames:
  frames [FRAME_TILE, n_fft] (gathered from padded wav in VMEM)
  @ dft_basis.T [n_fft, 2F]  -> power [FRAME_TILE, F]
  @ mel.T [F, num_mels]      -> [FRAME_TILE, num_mels] -> log10 -> out
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import FrontendConfig
from .features import _dft_basis, mel_filterbank

FRAME_TILE = 256  # frames per program; 3000 frames -> 12 programs (+pad)


def _kernel(wav_ref, basis_ref, mel_ref, out_ref, *, n_fft, hop, n_freqs, log_floor):
    """One tile of frames for one batch element.

    wav_ref:   [1, FRAME_TILE*hop + n_fft]  (overlapping window of padded wav)
    basis_ref: [n_fft, 2F] windowed DFT basis (transposed for matmul)
    mel_ref:   [F_pad, num_mels] mel filterbank (transposed, zero-padded)
    out_ref:   [1, FRAME_TILE, num_mels]
    """
    seg = wav_ref[0, :]  # [tile*hop + n_fft]
    # Build the frame matrix [FRAME_TILE, n_fft]. hop < n_fft so frames
    # overlap; express as gather-free strided slices stacked via fori_loop
    # into VMEM scratch would serialize — instead use a reshape trick:
    # seg strided view == seg[i*hop + j]. With hop=160, n_fft=400 take
    # seg reshaped [tile, hop] blocks and concatenate 3 shifted copies
    # (ceil(n_fft/hop) = 3) then slice columns.
    k = -(-n_fft // hop)  # chunks of hop covering one frame
    base = jax.lax.broadcasted_iota(jnp.int32, (FRAME_TILE, n_fft), 0) * hop
    col = jax.lax.broadcasted_iota(jnp.int32, (FRAME_TILE, n_fft), 1)
    frames = seg[(base + col).reshape(-1)].reshape(FRAME_TILE, n_fft)
    proj = jnp.dot(frames, basis_ref[:, :], preferred_element_type=jnp.float32)
    power = proj[:, :n_freqs] ** 2 + proj[:, n_freqs:] ** 2  # [tile, F]
    melspec = jnp.dot(power, mel_ref[:n_freqs, :], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = jnp.log(jnp.maximum(melspec, log_floor)) * np.float32(
        1.0 / np.log(10.0)
    )


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "num_mels", "mel_scale"))
def _fused_log_mel_impl(wav, n_fft, hop, num_mels, mel_scale):
    B, L = wav.shape
    n_freqs = n_fft // 2 + 1
    num_frames = L // hop  # Whisper: drop last frame
    pad = n_fft // 2
    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # pad frames to a FRAME_TILE multiple; pad wav so every tile's window is in-bounds
    t_pad = -(-num_frames // FRAME_TILE) * FRAME_TILE
    need = (t_pad - 1) * hop + n_fft
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))

    basis = jnp.asarray(_dft_basis(n_fft)).T  # [n_fft, 2F]
    mel = jnp.asarray(mel_filterbank(num_mels, n_fft, scale=mel_scale)).T  # [F, M]

    grid = (B, t_pad // FRAME_TILE)
    seg_len = FRAME_TILE * hop + n_fft
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_fft=n_fft, hop=hop, n_freqs=n_freqs, log_floor=1e-10
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, seg_len),
                lambda b, t: (b, t * FRAME_TILE * hop // seg_len if False else t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_fft, 2 * n_freqs), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, num_mels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_TILE, num_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, num_mels), jnp.float32),
    )(x, basis, mel)
    return out[:, :num_frames, :].transpose(0, 2, 1)  # [B, M, T]


def fused_log_mel(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Fused Pallas log-mel. Returns [B, num_mels, L//hop] *before* Whisper
    normalization-clamp; the caller applies the (max-8, +4, /4) tail."""
    raise NotImplementedError("pallas frontend lands after numeric parity of the XLA path")
