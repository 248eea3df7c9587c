"""Measure the fused log-mel kernel's f32-vs-bf16x3 DFT matmul cost on chip.

NEGATIVE RESULT (kept as the measurement record): a 3-term bf16 split
(hi/lo operand decomposition, f32 accumulation — "bf16x3") of the DFT
matmul measured **0.93x** (38.5 vs 35.9 ms/batch e2e dispatch at B=128 x
30 s, v5e, 2026-08-19) — Mosaic's f32 dot already runs at multi-pass-bf16
cost, so there is nothing to reclaim — AND the split's accuracy is
insufficient: dropping the lo*lo term leaves ~1.5e-5 error relative to the
spectrum's TYPICAL magnitude, which at deep spectral valleys (power 1e-6+
below peak, still inside Whisper's max-8-decades clamp) becomes orders-of-
magnitude relative error in power -> ~0.3 absolute error on the normalized
log-mel surface, 1000x over the 2e-4 parity bar. The production kernel
therefore stays f32 (pallas_frontend.py).

Methodology: distinct input buffers + hard syncs, measurement order
interleaved because the relay caches shipped input buffers (whichever fn
runs first pays the ~245 MB wav transfers; the first un-interleaved run of
this script read 5272 ms vs 37 ms purely from that artifact).

Usage: python examples/profile_frontend_precision.py [--batch 128] [--secs 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jiao_liao_speech_recognition_tpu.frontend import pallas_frontend as pf
    from jiao_liao_speech_recognition_tpu.frontend.features import (
        _dft_basis,
        mel_filterbank,
    )

    FRAME_TILE = pf.FRAME_TILE
    n_fft, hop, num_mels = 400, 160, 80
    n_freqs = n_fft // 2 + 1

    def _kernel_split(*refs, n_fft, hop, n_freqs, log_floor):
        k = -(-n_fft // hop)
        wav_refs = refs[:k]
        basis_ref, mel_ref, out_ref = refs[k], refs[k + 1], refs[k + 2]
        proj = jnp.zeros((FRAME_TILE, basis_ref.shape[1]), jnp.float32)
        for j in range(k):
            w = wav_refs[j][0]
            b = basis_ref[j * hop : (j + 1) * hop, :]
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            for lhs, rhs in ((w_hi, b_hi), (w_lo, b_hi), (w_hi, b_lo)):
                proj = proj + jnp.dot(
                    lhs, rhs, preferred_element_type=jnp.float32
                )
        power = proj[:, :n_freqs] ** 2 + proj[:, n_freqs : 2 * n_freqs] ** 2
        melspec = jnp.dot(
            power, mel_ref[:n_freqs, :], preferred_element_type=jnp.float32
        )
        out_ref[0] = jnp.log(jnp.maximum(melspec, log_floor)) * np.float32(
            1.0 / np.log(10.0)
        )

    @functools.partial(jax.jit, static_argnames=())
    def split_log_mel_raw(wav):
        B, L = wav.shape
        num_frames = L // hop
        pad = n_fft // 2
        x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
        t_pad = max(-(-num_frames // FRAME_TILE) * FRAME_TILE, FRAME_TILE)
        k = -(-n_fft // hop)
        need = (t_pad + k) * hop
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        x = x[:, :need].reshape(B, t_pad + k, hop)
        xs = [x[:, j : j + t_pad, :] for j in range(k)]
        f2_pad = -(-2 * n_freqs // 128) * 128
        m_pad = -(-num_mels // 128) * 128
        basis = np.zeros((k * hop, f2_pad), np.float32)
        basis[:n_fft, : 2 * n_freqs] = _dft_basis(n_fft).T
        mel = np.zeros((f2_pad // 2, m_pad), np.float32)
        mel[:n_freqs, :num_mels] = mel_filterbank(num_mels, n_fft).T
        num_tiles = t_pad // FRAME_TILE
        out = pl.pallas_call(
            functools.partial(
                _kernel_split, n_fft=n_fft, hop=hop, n_freqs=n_freqs,
                log_floor=1e-10,
            ),
            grid=(B, num_tiles),
            in_specs=[
                pl.BlockSpec((1, FRAME_TILE, hop), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(k)
            ]
            + [
                pl.BlockSpec((k * hop, f2_pad), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f2_pad // 2, m_pad), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, FRAME_TILE, m_pad),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, t_pad, m_pad), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(*xs, jnp.asarray(basis), jnp.asarray(mel))
        return out[:, :num_frames, :num_mels].transpose(0, 2, 1)

    B = args.batch
    samples = int(args.secs * 16000)
    rng = np.random.RandomState(0)
    wavs = [
        jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1)
        for _ in range(2)
    ]

    base = jax.jit(lambda w: pf.fused_log_mel_raw(w))

    def timeit(fn):
        outs = [fn(w) for w in wavs]  # warm each distinct buffer
        for o in outs:
            jax.block_until_ready(o)
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(args.iters):
            o = fn(wavs[i % 2])
            acc += float(np.asarray(o[0, 0, :4]).sum())  # hard sync
        dt = (time.perf_counter() - t0) / args.iters
        return dt, acc

    # interleave: the relay caches shipped input buffers, so whichever fn
    # runs first pays the wav transfers — alternate and take per-fn mins.
    t_f32 = min(timeit(base)[0] for _ in range(2))
    t_split = min(timeit(split_log_mel_raw)[0] for _ in range(2))
    t_f32 = min(t_f32, timeit(base)[0])
    t_split = min(t_split, timeit(split_log_mel_raw)[0])

    def norm(x):  # Whisper tail: clamp to max-8, (x+4)/4
        mx = x.max(axis=(1, 2), keepdims=True)
        return (np.maximum(x, mx - 8.0) + 4.0) / 4.0

    a = np.asarray(base(wavs[0]))
    b = np.asarray(split_log_mel_raw(wavs[0]))
    print(f"f32 kernel     : {t_f32*1e3:8.2f} ms/batch")
    print(f"bf16x3 kernel  : {t_split*1e3:8.2f} ms/batch  ({t_f32/t_split:.2f}x)")
    print(f"max abs diff (raw log10-mel)       : {np.abs(a-b).max():.3e}")
    print(f"max abs diff (whisper-normalized)  : {np.abs(norm(a)-norm(b)).max():.3e}")


if __name__ == "__main__":
    main()
