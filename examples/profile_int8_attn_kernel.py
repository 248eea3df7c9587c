"""Isolated A/B of int8 decode-attention kernel variants on the real chip.

docs/PERFORMANCE.md records the current kernel at ~223 us/layer vs a ~41 us
cache-streaming roofline at large-v3 decode shapes (B=8, H=20, Tk=1500,
dh=64). Hypothesis: the grid of B*H tiny programs (209 KB of DMA each,
5 input streams per step) is dominated by per-grid-step DMA issue
overhead, not bandwidth. This script times, with the repo bench
methodology (distinct buffers, chained in-jit steps, hard sync):

  a) the old single-head-per-program layout (grid=(B*H,))
  b) a head-grouped variant (grid=(B, H/hg) with hg heads per program)
     for several hg

Measured 2026-08-18 (v5e, B=8 H=20 Tk=1500 dh=64, 32 in-jit layers per
dispatch): grid=(B*H,) 31,445 us/layer; grouped hg=4/10/20 all ~1,000
us/layer and pinned at the ~24 ms relay dispatch floor (32 ms/dispatch),
i.e. >=31x — per-grid-step DMA issue overhead dominated the old layout.
The grouped layout now IS ops/quant.int8_decode_attention; variant (a)
here preserves the old layout for regression A/Bs.

Usage: python examples/profile_int8_attn_kernel.py [--b 8] [--layers 32]
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jiao_liao_speech_recognition_tpu.ops.quant import (
        int8_decode_attention,
        quantize_kv,
    )

    B, H, Tk, dh, layers = 8, 20, 1500, 64, 32
    for i, a in enumerate(sys.argv):
        if a == "--b" and i + 1 < len(sys.argv):
            B = int(sys.argv[i + 1])
        if a == "--layers" and i + 1 < len(sys.argv):
            layers = int(sys.argv[i + 1])
        if a == "--tk" and i + 1 < len(sys.argv):
            Tk = int(sys.argv[i + 1])
    check = "--check" in sys.argv

    tk_pad = -(-Tk // 128) * 128

    def make_inputs(seed):
        r = np.random.RandomState(seed)
        k = jnp.asarray(r.randn(B, H, Tk, dh).astype(np.float32))
        v = jnp.asarray(r.randn(B, H, Tk, dh).astype(np.float32))
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        q = jnp.asarray(r.randn(B, H, 1, dh).astype(np.float32) * 0.1).astype(
            jnp.bfloat16
        )
        lens = jnp.full((B,), Tk, jnp.int32)
        return q, kq, ks, vq, vs, lens

    # ---- variant a: the OLD single-head-per-program layout ----
    def old_kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, *, scale):
        bh = pl.program_id(0)
        length = len_ref[bh]
        q = q_ref[0]
        kf = k_ref[0].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * (ks_ref[0] * scale)
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(idx < length, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pv = (p * vs_ref[0]).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            pv, v_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = o.astype(out_ref.dtype)

    def old_attn(qh, kq, ks, vq, vs, kv_lens):
        scale = 1.0 / np.sqrt(dh)
        qb = jnp.pad(
            qh.astype(jnp.bfloat16).reshape(B * H, 1, dh),
            ((0, 0), (0, 7), (0, 0)),
        )
        kb = jnp.pad(kq.reshape(B * H, Tk, dh), ((0, 0), (0, tk_pad - Tk), (0, 0)))
        vb = jnp.pad(vq.reshape(B * H, Tk, dh), ((0, 0), (0, tk_pad - Tk), (0, 0)))
        ksb = jnp.pad(
            ks.astype(jnp.float32).reshape(B * H, 1, Tk),
            ((0, 0), (0, 0), (0, tk_pad - Tk)),
        )
        vsb = jnp.pad(
            vs.astype(jnp.float32).reshape(B * H, 1, Tk),
            ((0, 0), (0, 0), (0, tk_pad - Tk)),
        )
        lens = jnp.broadcast_to(
            jnp.minimum(kv_lens.astype(jnp.int32), Tk)[:, None], (B, H)
        ).reshape(B * H)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H,),
            in_specs=[
                pl.BlockSpec((1, 8, dh), lambda b, lens: (b, 0, 0)),
                pl.BlockSpec((1, tk_pad, dh), lambda b, lens: (b, 0, 0)),
                pl.BlockSpec((1, 1, tk_pad), lambda b, lens: (b, 0, 0)),
                pl.BlockSpec((1, tk_pad, dh), lambda b, lens: (b, 0, 0)),
                pl.BlockSpec((1, 1, tk_pad), lambda b, lens: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, dh), lambda b, lens: (b, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(old_kernel, scale=scale),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, 8, dh), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * 8 * tk_pad * dh,
                bytes_accessed=2 * B * H * tk_pad * (dh + 4),
                transcendentals=B * H * 8 * tk_pad,
            ),
            interpret=jax.default_backend() != "tpu",
        )(lens, qb, kb, ksb, vb, vsb)
        return out.reshape(B, H, 8, dh)[:, :, :1, :]

    def chain(fn):
        # `layers` kernel calls per dispatch, q perturbed by the previous
        # output so steps cannot be collapsed/memoized.
        @jax.jit
        def run(q, kq, ks, vq, vs, lens):
            def body(i, q):
                o = fn(q, kq, ks, vq, vs, lens)
                return (q + 0.001 * o[:, :, :1, :]).astype(q.dtype)

            return jax.lax.fori_loop(0, layers, body, q)

        return run

    inputs = [make_inputs(s) for s in range(3)]
    if check:
        for lens_v in (
            inputs[0][5],
            jnp.asarray(np.arange(1, B + 1) * (Tk // (B + 1)), jnp.int32),
        ):
            q, kq, ks, vq, vs, _ = inputs[0]
            ref = old_attn(q, kq, ks, vq, vs, lens_v)
            got = int8_decode_attention(
                qh=q, kq=kq, ks=ks, vq=vq, vs=vs, kv_lens=lens_v
            )[:, :, :1, :]
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"check: max|diff| = {err:.2e}")
            assert err < 2e-5, err
        print("check ok")
        return
    variants = [
        ("old grid=(B*H,)", chain(old_attn)),
        ("prod (grouped)", chain(int8_decode_attention)),
    ]

    cache_bytes = 2 * B * H * Tk * (dh + 4)
    print(
        f"B={B} H={H} Tk={Tk} dh={dh} layers={layers}; cache stream "
        f"{cache_bytes/1e6:.1f} MB/layer; roofline "
        f"{cache_bytes/819e9*1e6:.0f} us/layer"
    )
    for name, run in variants:
        try:
            for q, *rest in inputs:  # compile + warm every buffer
                jax.block_until_ready(run(q, *rest))
            t0 = time.time()
            n = 0
            for q, *rest in inputs * 3:
                out = run(q, *rest)
                float(np.asarray(out).sum())  # hard sync
                n += 1
            dt = (time.time() - t0) / n
            print(
                f"{name:20s} {dt*1e3:8.2f} ms/dispatch  "
                f"{dt/layers*1e6:7.1f} us/layer  "
                f"{cache_bytes*layers/dt/1e9:6.0f} GB/s effective",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
