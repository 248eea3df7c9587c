"""Fused Pallas TPU kernel for the log-mel frontend.

Fuses framing -> windowed-DFT matmul (MXU) -> power -> mel matmul (MXU) ->
log10 into one kernel, so the [T, 2F] DFT projection and [T, F] power
spectrum never touch HBM. The XLA conv path (features.py) materializes those
intermediates (~300 MB for a 32x30 s batch in f32); here only the [T, M]
log-mel leaves the kernel.

Mosaic-friendly design (no gathers, no in-kernel reshapes, no concats):
* the host-side wrapper reshapes the padded waveform to hop-width rows
  [B, n_chunks, hop] — a free XLA reshape — so frame i starts at row i;
* grid = (batch, frame-tile): the k pre-shifted inputs make tiles
  non-overlapping, so BlockSpec tiling streams FRAME_TILE-frame blocks
  through VMEM (a single-row program holding the whole 30 s utterance
  overflows the 16 MB VMEM budget);
* instead of assembling the overlapping [FRAME_TILE, n_fft] frame matrix
  (whose lane-offset concat Mosaic rejects), the DFT matmul is decomposed
  into k = ceil(n_fft/hop) partial matmuls: shifted rows [TILE, hop] x basis
  chunk [hop, 2F], summed — algebraically identical;
* the k row-shifted views arrive as k separate XLA-prepared inputs (wav is
  tiny next to the fused-away intermediates), so every VMEM load in the
  kernel sits at a sublane-aligned offset — Mosaic rejects the +1/+2-row
  dynamic loads a single shared buffer would need;
* the mel matmul + VPU square/log finish the tile.

The Whisper normalization tail (clamp to per-utterance max-8, (x+4)/4)
needs a global max, so it stays outside as cheap XLA elementwise ops.
All math is float32 (parity hard-part 1, SURVEY §7).
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

FRAME_TILE = 512  # frames per inner-loop tile


def _logmel_kernel(*refs, n_fft, hop, n_freqs, log_floor):
    """One (batch row, frame tile) program: k+1 MXU matmuls.

    refs = (wav_0 .. wav_{k-1}, basis, mel, out):
    wav_j:  [1, FRAME_TILE, hop] — rows pre-shifted by j, so frame i's
            j-th chunk is wav_j[i]
    basis:  [k*hop, F2_pad] windowed DFT basis, zero rows past n_fft
    mel:    [F2_pad//2, M_pad] mel filterbank (transposed, zero-padded)
    out:    [1, FRAME_TILE, M_pad]
    """
    k = -(-n_fft // hop)  # chunks covering one frame
    wav_refs = refs[:k]
    basis_ref, mel_ref, out_ref = refs[k], refs[k + 1], refs[k + 2]

    # proj[i, f] = sum_j wav_j[i, :] @ basis[j*hop:(j+1)*hop, f]
    # precision=HIGHEST: Mosaic's default f32 dot is ~3-pass-bf16 ACCURATE
    # (though multi-pass-bf16 in cost — examples/profile_frontend_precision.py),
    # and a 3-term split leaves ~0.3 absolute error at deep spectral valleys
    # on the normalized log-mel surface; the on-chip tier
    # (tests/test_tpu_tier.py::test_pallas_frontend_lowering) caught exactly
    # that signature (max 0.124 vs the HIGHEST-precision jnp path).
    proj = jnp.zeros((FRAME_TILE, basis_ref.shape[1]), jnp.float32)
    for j in range(k):
        proj = proj + jnp.dot(
            wav_refs[j][0],
            basis_ref[j * hop : (j + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    power = proj[:, :n_freqs] ** 2 + proj[:, n_freqs : 2 * n_freqs] ** 2
    # the mel matmul stays at default precision: it contracts POSITIVE
    # powers against POSITIVE filter weights — no cancellation, so the
    # ~1e-5 relative error of multi-pass-bf16 stays ~1e-5 relative after
    # the log (vs the DFT above, where valley cancellation amplifies the
    # same error ~1000x past the 2e-4 parity bar)
    melspec = jnp.dot(power, mel_ref[:n_freqs, :], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(melspec, log_floor)) * np.float32(
        1.0 / np.log(10.0)
    )


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "num_mels", "mel_scale", "log_floor")
)
def fused_log_mel_raw(
    wav: jnp.ndarray,
    n_fft: int = 400,
    hop: int = 160,
    num_mels: int = 80,
    mel_scale: str = "slaney",
    log_floor: float = 1e-10,
) -> jnp.ndarray:
    """[B, L] PCM -> [B, num_mels, L//hop] log10-mel (no Whisper norm tail).

    Matches features.log_mel_spectrogram up to the normalization tail.
    """
    B, L = wav.shape
    n_freqs = n_fft // 2 + 1
    num_frames = L // hop  # Whisper convention: drop the final frame
    pad = n_fft // 2
    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")

    t_pad = max(-(-num_frames // FRAME_TILE) * FRAME_TILE, FRAME_TILE)
    k = -(-n_fft // hop)
    n_chunks_pad = t_pad  # tiled exactly by FRAME_TILE blocks
    need = (n_chunks_pad + k) * hop
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    x = x[:, :need].reshape(B, n_chunks_pad + k, hop)
    # k row-shifted views (XLA slices; each [B, n_chunks_pad, hop])
    xs = [x[:, j : j + n_chunks_pad, :] for j in range(k)]

    f2_pad = -(-2 * n_freqs // 128) * 128  # 402 -> 512
    m_pad = -(-num_mels // 128) * 128  # 80 -> 128
    basis = np.zeros((k * hop, f2_pad), np.float32)  # zero rows past n_fft
    basis[:n_fft, : 2 * n_freqs] = _dft_basis(n_fft).T
    mel = np.zeros((f2_pad // 2, m_pad), np.float32)
    mel[:n_freqs, :num_mels] = mel_filterbank(num_mels, n_fft, scale=mel_scale).T

    num_tiles = t_pad // FRAME_TILE
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _logmel_kernel,
            n_fft=n_fft,
            hop=hop,
            n_freqs=n_freqs,
            log_floor=log_floor,
        ),
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, FRAME_TILE, hop), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            )
            for _ in range(k)
        ]
        + [
            pl.BlockSpec(
                (k * hop, f2_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f2_pad // 2, m_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_TILE, m_pad), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * n_fft * f2_pad + 2 * B * t_pad * n_freqs * m_pad,
            bytes_accessed=4 * (B * need + B * t_pad * m_pad),
            transcendentals=B * t_pad * m_pad,
        ),
        interpret=interpret,
    )(*xs, jnp.asarray(basis), jnp.asarray(mel))
    return out[:, :num_frames, :num_mels].transpose(0, 2, 1)


def fused_log_mel(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Whisper-normalized fused log-mel: kernel + XLA normalization tail.

    Drop-in equal to features.log_mel_spectrogram(wav, cfg) for
    whisper_norm=True configs.
    """
    log_spec = fused_log_mel_raw(
        wav, cfg.n_fft, cfg.hop_length, cfg.num_mels, cfg.mel_scale, cfg.log_floor
    )
    if cfg.whisper_norm:
        mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
        log_spec = jnp.maximum(log_spec, mx - 8.0)
        log_spec = (log_spec + 4.0) / 4.0
    if cfg.cmvn == "utterance":
        mean = jnp.mean(log_spec, axis=2, keepdims=True)
        std = jnp.std(log_spec, axis=2, keepdims=True)
        log_spec = (log_spec - mean) / (std + 1e-8)
    return log_spec
