"""Micro-benchmark: whisper large-v3 decode-step cross-attention layouts.

The AR decode step is bound by re-reading the cross-attention K/V caches
(2 x B x 1500 x 1280 x 32 layers per token). This probe measures one
layer's Tq=1 attention under different cache layouts on the real chip to
pick the fastest for decode/whisper_generate:

  packed    : K/V as [B, T, H*dh] (the projection layout) + reshape einsum
  headmajor : K/V as [B, H, T, dh] (contiguous per-(b,h) [T, dh] tiles)
  f32       : headmajor with f32 caches (2x bytes control)

Each variant is chained N times inside one jit (output folds back into the
query) so the marginal per-iteration time excludes dispatch latency.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal(make_fn, args, lo=4, hi=20):
    import jax

    def timed(fn):
        # hard host sync via data fetch each call: block_until_ready alone
        # under-measures repeat dispatches through the axon relay
        _ = np.asarray(fn(*args)).sum()
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args)).sum()
        return time.perf_counter() - t0

    f_lo, f_hi = make_fn(lo), make_fn(hi)
    t_lo = min(timed(f_lo) for _ in range(3))
    t_hi = min(timed(f_hi) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tk", type=int, default=1500)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--dh", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    B, Tk, H, dh = args.batch, args.tk, args.heads, args.dh
    D = H * dh
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, 1, D), jnp.bfloat16)
    k_packed = jnp.asarray(rng.randn(B, Tk, D), jnp.bfloat16)
    v_packed = jnp.asarray(rng.randn(B, Tk, D), jnp.bfloat16)
    k_hm = jnp.asarray(k_packed.reshape(B, Tk, H, dh).transpose(0, 2, 1, 3))
    v_hm = jnp.asarray(v_packed.reshape(B, Tk, H, dh).transpose(0, 2, 1, 3))
    scale = 1.0 / np.sqrt(dh)

    bytes_per_iter = (k_packed.size + v_packed.size) * 2

    def attn_packed(q, k, v):
        qh = q.reshape(B, 1, H, dh)
        kh = k.reshape(B, Tk, H, dh)
        vh = v.reshape(B, Tk, H, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vh, preferred_element_type=jnp.float32)
        return o.reshape(B, 1, D).astype(q.dtype)

    def attn_headmajor(q, k, v):
        qh = q.reshape(B, 1, H, dh).transpose(0, 2, 1, 3)  # [B,H,1,dh]
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(B, 1, D).astype(q.dtype)

    def chain(fn):
        # k/v go in as ARGUMENTS, not jit closure constants: embedded
        # constants are serialized into the remote-compile request and blow
        # the relay's size limit at B >= 16 (HTTP 413)
        def mk(n):
            @jax.jit
            def f(q, k, v):
                def body(i, q):
                    return q * 0.5 + fn(q, k, v)
                return jax.lax.fori_loop(0, n, body, q)
            return f
        return mk

    for name, fn, kk, vv, nbytes in [
        ("packed [B,T,H*dh]", attn_packed, k_packed, v_packed, bytes_per_iter),
        ("headmajor [B,H,T,dh]", attn_headmajor, k_hm, v_hm, bytes_per_iter),
        ("headmajor f32", attn_headmajor, k_hm.astype(jnp.float32), v_hm.astype(jnp.float32), bytes_per_iter * 2),
    ]:
        t = marginal(chain(fn), (q, kk, vv))
        gbps = nbytes / t / 1e9
        print(f"{name:24s} {t*1e3:8.3f} ms/layer-step   ~{gbps:6.0f} GB/s effective")
        print(f"  -> x64 K+V reads/step (32 layers): {t*32*1e3:.1f} ms/token-step")


if __name__ == "__main__":
    main()
