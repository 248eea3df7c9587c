"""A/B variants of the fused head+argmax kernel at flagship shapes.

Variants:
  prod     — shipped fused_head_argmax (fori_loop over 9 V_CHUNK=512 chunks)
  unroll   — same kernel with the chunk loop unrolled (static trip count;
             lets Mosaic software-pipeline the chunk dots)

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

    def _kernel_unrolled(x_ref, w_ref, b_ref, out_ref, *, v_chunks):
        rows = BLOCK_B * BLOCK_T
        x = x_ref[...].reshape(rows, x_ref.shape[2])
        m = jnp.full((rows, 1), -jnp.inf, jnp.float32)
        idx = jnp.zeros((rows, 1), jnp.int32)
        for c in range(v_chunks):  # static unroll
            w = w_ref[:, c * V_CHUNK : (c + 1) * V_CHUNK]
            b = b_ref[0, c * V_CHUNK : (c + 1) * V_CHUNK]
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
            m = jnp.where(upd, local_m, m)
            idx = jnp.where(upd, local_i + c * V_CHUNK, idx)
        out_ref[...] = idx[:, 0].reshape(BLOCK_B, BLOCK_T)

    @jax.jit
    def unrolled_head_argmax(x, kernel, bias):
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
            functools.partial(_kernel_unrolled, v_chunks=v_pad // V_CHUNK),
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
    b = np.asarray(unrolled_head_argmax(x, w, bias))
    print(f"id mismatches prod vs unroll: {(a != b).sum()} / {a.size}")

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
    t_unroll = marginal(mk(unrolled_head_argmax), (x,))
    print(f"prod fori_loop kernel : {t_prod*1e3:8.2f} ms/iter")
    print(f"unrolled kernel       : {t_unroll*1e3:8.2f} ms/iter  "
          f"({t_prod/t_unroll:.2f}x)")


if __name__ == "__main__":
    main()
