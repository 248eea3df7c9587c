"""Prototype A/B: W8A8 fused LN+MLP+residual kernel vs the bf16 one.

The flagship encoder is MXU-bound at B=128 x 30 s (docs/PERFORMANCE.md:
~62 ms of the 85 ms e2e batch is bf16 matmul floor), and the v5e MXU has
2x int8 throughput (measured 114 TOPS naive-XLA int8 chain vs the bf16
peak). The MLP sublayer is ~45% of block FLOPs. This script times, at
flagship shapes (d=512, mlp=2048, B=128, T=1500):

  a) ops/fused_mlp.fused_ln_mlp_residual (bf16, production)
  b) an inline W8A8 variant: int8 weights (per-out-channel scales) +
     per-row dynamic activation quantization in VMEM, int8x int8 MXU
     accumulation in int32

and reports max |y_int8 - y_bf16| so the quality cost is visible.

Usage: python examples/profile_w8a8_mlp.py [--b 128] [--t 1500]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")

    from jiao_liao_speech_recognition_tpu.ops.fused_mlp import (
        BLOCK_T,
        _gelu_f32,
        fused_ln_mlp_residual,
    )
    from jiao_liao_speech_recognition_tpu.ops.quant import quantize_int8

    B, T, d, mlp = 128, 1500, 512, 2048
    for i, a in enumerate(sys.argv):
        if a == "--b" and i + 1 < len(sys.argv):
            B = int(sys.argv[i + 1])
        if a == "--t" and i + 1 < len(sys.argv):
            T = int(sys.argv[i + 1])

    rng = np.random.RandomState(0)
    gelu_form = "tanh"
    eps = np.float32(1e-5)
    g = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1 + 1.0)
    bl = jnp.asarray(rng.randn(d).astype(np.float32) * 0.05)
    w1 = jnp.asarray(rng.randn(d, mlp).astype(np.float32) * (1 / np.sqrt(d)))
    b1 = jnp.asarray(rng.randn(mlp).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(mlp, d).astype(np.float32) * (1 / np.sqrt(mlp)))
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.02)
    w1q, s1 = quantize_int8(w1)
    w2q, s2 = quantize_int8(w2)

    def w8a8_kernel(
        x_ref, g_ref, bl_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
        out_ref,
    ):
        x = x_ref[0]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        ln = (xc * jax.lax.rsqrt(var + eps)) * g_ref[0] + bl_ref[0]
        # per-row (token) dynamic quantization of the LN output
        amax = jnp.max(jnp.abs(ln), axis=-1, keepdims=True)
        a_s = amax / 127.0
        safe = jnp.where(a_s > 0, a_s, 1.0)
        lq = jnp.clip(jnp.round(ln / safe), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            lq, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * (a_s * s1_ref[0]) + b1_ref[0]
        h = _gelu_f32(h, gelu_form)
        amax2 = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        h_s = amax2 / 127.0
        safe2 = jnp.where(h_s > 0, h_s, 1.0)
        hq = jnp.clip(jnp.round(h / safe2), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc2.astype(jnp.float32) * (h_s * s2_ref[0]) + b2_ref[0]
        out_ref[0] = x + y.astype(x.dtype)

    @jax.jit
    def w8a8(x):
        Bx, Tx, _ = x.shape
        t_pad = -(-Tx // BLOCK_T) * BLOCK_T
        xp = jnp.pad(x, ((0, 0), (0, t_pad - Tx), (0, 0))).astype(jnp.bfloat16)
        out = pl.pallas_call(
            w8a8_kernel,
            grid=(Bx, t_pad // BLOCK_T),
            in_specs=[
                pl.BlockSpec((1, BLOCK_T, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, d), lambda b, i: (0, 0)),
                pl.BlockSpec((1, d), lambda b, i: (0, 0)),
                pl.BlockSpec((d, mlp), lambda b, i: (0, 0)),
                pl.BlockSpec((1, mlp), lambda b, i: (0, 0)),
                pl.BlockSpec((1, mlp), lambda b, i: (0, 0)),
                pl.BlockSpec((mlp, d), lambda b, i: (0, 0)),
                pl.BlockSpec((1, d), lambda b, i: (0, 0)),
                pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_T, d), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((Bx, t_pad, d), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * Bx * t_pad * d * mlp,
                bytes_accessed=2 * Bx * t_pad * d * 2 + d * mlp * 2,
                transcendentals=Bx * t_pad * mlp,
            ),
            interpret=jax.default_backend() != "tpu",
        )(
            xp,
            g[None, :], bl[None, :],
            w1q, s1.astype(jnp.float32)[None, :], b1[None, :],
            w2q, s2.astype(jnp.float32)[None, :], b2[None, :],
        )
        return out[:, :Tx, :]

    @jax.jit
    def bf16(x):
        return fused_ln_mlp_residual(
            x.astype(jnp.bfloat16), g, bl, w1, b1, w2, b2, 1e-5, gelu_form
        )

    xs = [
        jnp.asarray(rng.randn(B, T, d).astype(np.float32) * 0.5).astype(
            jnp.bfloat16
        )
        for _ in range(2)
    ]

    ya = bf16(xs[0])
    yb = w8a8(xs[0])
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
    print(f"max |w8a8 - bf16| = {err:.4f}  (rel {rel:.4f})", flush=True)

    LAYERS = 12  # chain like an encoder stack so the ~24 ms relay dispatch
    # floor amortizes; dividing by LAYERS gives honest per-sublayer cost

    def chain(fn):
        @jax.jit
        def run(x):
            acc = x
            for _ in range(LAYERS):
                acc = fn(acc)
            return jnp.sum(acc.astype(jnp.float32))

        return run

    for name, fn in (("bf16 fused", chain(bf16)), ("w8a8 fused", chain(w8a8))):
        for x in xs:
            jax.block_until_ready(fn(x))
        t0 = time.perf_counter()
        n = 0
        for i in range(8):
            _ = float(fn(xs[i % 2]))
            n += 1
        dt = (time.perf_counter() - t0) / n
        fl = 4 * B * T * d * mlp * LAYERS
        print(
            f"{name}: {dt*1e3:8.2f} ms/dispatch  {dt/LAYERS*1e3:6.2f} "
            f"ms/sublayer  {fl/dt/1e12:6.1f} T(FL)OPS",
            flush=True,
        )


if __name__ == "__main__":
    main()
