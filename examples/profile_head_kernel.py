"""A/B variants of the fused head+argmax kernel at flagship shapes.

Variants:
  prod     — shipped fused_head_argmax. Since round 3 production uses the
             STATIC UNROLL over the 9 V_CHUNK=512 chunks (the 1.74x winner
             of this A/B; Mosaic software-pipelines the chunk dots).
  fori     — local copy of the superseded lax.fori_loop chunk loop, kept
             here as the regression baseline. Expect prod ≈ 1.5-1.8x
             faster; prod/fori ≈ 1.0x means the unroll stopped engaging.

Marginal-cost method over chained applications (relay dispatch cancels).
Flagship: B=128, T'=750, d=512, V=4336.

Usage: python examples/profile_head_kernel.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n_warm=2):
    import jax

    for _ in range(n_warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def marginal(make_fn, args, lo=2, hi=8):
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    t_lo = min(timed(f_lo, *args) for _ in range(3))
    t_hi = min(timed(f_hi, *args) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=750)
    ap.add_argument("--vocab", type=int, default=4336)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from jiao_liao_speech_recognition_tpu.ops import fused_head as fh

    BLOCK_B, BLOCK_T, V_CHUNK = fh.BLOCK_B, fh.BLOCK_T, fh.V_CHUNK

    def _kernel_fori(x_ref, w_ref, b_ref, out_ref, *, v_chunks):
        # the superseded lax.fori_loop formulation (pre-r3 production):
        # per-iteration dynamic chunk slicing prevents Mosaic from
        # software-pipelining the chunk dots
        rows = BLOCK_B * BLOCK_T
        x = x_ref[...].reshape(rows, x_ref.shape[2])

        def body(c, carry):
            m, idx = carry
            w = jax.lax.dynamic_slice_in_dim(w_ref[...], c * V_CHUNK, V_CHUNK, 1)
            b = jax.lax.dynamic_slice_in_dim(b_ref[0], c * V_CHUNK, V_CHUNK, 0)
            logits = (
                jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + b[None, :]
            )
            local_m = jnp.max(logits, axis=1, keepdims=True)
            local_i = jnp.argmax(logits, axis=1, keepdims=True).astype(jnp.int32)
            upd = local_m > m
            return (
                jnp.where(upd, local_m, m),
                jnp.where(upd, local_i + c * V_CHUNK, idx),
            )

        m = jnp.full((rows, 1), -jnp.inf, jnp.float32)
        idx = jnp.zeros((rows, 1), jnp.int32)
        m, idx = jax.lax.fori_loop(0, v_chunks, body, (m, idx))
        out_ref[...] = idx[:, 0].reshape(BLOCK_B, BLOCK_T)

    @jax.jit
    def fori_head_argmax(x, kernel, bias):
        B, T, d = x.shape
        V = kernel.shape[1]
        b_pad = -(-B // BLOCK_B) * BLOCK_B
        t_pad = -(-T // BLOCK_T) * BLOCK_T
        v_pad = -(-V // V_CHUNK) * V_CHUNK
        xp = x
        if (b_pad, t_pad) != (B, T):
            xp = jnp.pad(x, ((0, b_pad - B), (0, t_pad - T), (0, 0)))
        wp = jnp.pad(kernel, ((0, 0), (0, v_pad - V))).astype(jnp.bfloat16)
        bp = jnp.pad(bias.astype(jnp.float32), (0, v_pad - V),
                     constant_values=-1e30)
        xp = xp.astype(jnp.bfloat16)
        grid = (b_pad // BLOCK_B, t_pad // BLOCK_T)
        out = pl.pallas_call(
            functools.partial(_kernel_fori, v_chunks=v_pad // V_CHUNK),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_B, BLOCK_T, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((d, v_pad), lambda b, i: (0, 0)),
                pl.BlockSpec((1, v_pad), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK_B, BLOCK_T), lambda b, i: (b, i)),
            out_shape=jax.ShapeDtypeStruct((b_pad, t_pad), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(xp, wp, bp[None, :])
        return out[:B, :T]

    B, T, d, V = args.batch, args.frames, 512, args.vocab
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32) * 0.3).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(d, V).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(V).astype(np.float32) * 0.01)

    a = np.asarray(fh.fused_head_argmax(x, w, bias))
    b = np.asarray(fori_head_argmax(x, w, bias))
    print(f"id mismatches prod vs fori: {(a != b).sum()} / {a.size}")

    def mk(fn):
        def make_fn(n):
            @jax.jit
            def f(x):
                acc = jnp.float32(0)
                xx = x
                for _ in range(n):  # unrolled chain (fori overhead trap)
                    ids = fn(xx, w, bias)
                    acc = acc + ids[0, 0].astype(jnp.float32)
                    xx = x + acc * 1e-9
                return acc
            return f
        return make_fn

    t_prod = marginal(mk(fh.fused_head_argmax), (x,))
    t_fori = marginal(mk(fori_head_argmax), (x,))
    print(f"prod (static unroll)  : {t_prod*1e3:8.2f} ms/iter")
    print(f"fori_loop baseline    : {t_fori*1e3:8.2f} ms/iter  "
          f"(prod is {t_fori/t_prod:.2f}x faster)")


if __name__ == "__main__":
    main()
