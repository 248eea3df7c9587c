"""A/B the conv subsampler's strided nn.Conv vs a shifted-matmul form.

NEGATIVE RESULT (kept as the measurement record): the shifted-matmul
reformulation — pad once, view padded rows as PAIRS via free reshapes so
taps 0-1 come from one [2*Cin, Cout] MXU matmul and tap 2 from the
2-row-shifted pair view's first half — measured **0.48x** (7.00 vs 3.32
ms/iter at flagship shapes B=128, T=3000, 80->512->512, v5e, 2026-08-19).
XLA's own strided-conv lowering already keeps the MXU busy; the matmul form
pays extra HBM traffic for the pad copy and the strided z2 operand. The
production ConvSubsampler therefore stays nn.Conv.

Marginal-cost method (profile_encoder.py): chain the stage N times inside
one jitted fori_loop, report (t(hi)-t(lo))/(hi-lo) so relay dispatch latency
cancels.

Usage: python examples/profile_conv_subsampler.py [--batch 128]
"""

from __future__ import annotations

import argparse
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


def marginal(make_fn, args, lo=2, hi=10):
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    t_lo = min(timed(f_lo, *args) for _ in range(3))
    t_hi = min(timed(f_hi, *args) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=3000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import flax.linen as nn
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.models.ctc_model import ConvSubsampler

    class _Conv3Stride2(nn.Module):
        """k=3/stride-2/pad-1 Conv1d as two MXU matmuls (same param tree)."""

        features: int
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x):
            B, T, Cin = x.shape
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (3, Cin, self.features), jnp.float32,
            )
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            t_out = (T + 1) // 2
            xp = jnp.pad(x, ((0, 0), (1, 2 * t_out + 1 - T), (0, 0)))
            z01 = xp[:, : 2 * t_out].reshape(B, t_out, 2 * Cin)
            z2 = xp[:, 2 : 2 * t_out + 2].reshape(B, t_out, 2 * Cin)[..., :Cin]
            w01 = kernel[:2].reshape(2 * Cin, self.features).astype(self.dtype)
            w2 = kernel[2].astype(self.dtype)
            return (
                jnp.dot(z01.astype(self.dtype), w01)
                + jnp.dot(z2.astype(self.dtype), w2)
                + bias.astype(self.dtype)
            )

    class MatmulConvSubsampler(nn.Module):
        d_model: int = 512
        channels: int = 512
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            for i in range(2):
                feats = self.d_model if i == 1 else self.channels
                x = _Conv3Stride2(feats, self.dtype, name=f"conv{i + 1}")(x)
                x = nn.gelu(x, approximate=False)
            return x

    B, T = args.batch, args.frames
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, 80).astype(np.float32)).astype(jnp.bfloat16)

    prod = ConvSubsampler(512, 512, jnp.bfloat16, 4)
    cand = MatmulConvSubsampler()
    params = prod.init(jax.random.PRNGKey(0), x[:1])["params"]

    a = np.asarray(prod.apply({"params": params}, x[:2]), np.float32)
    b = np.asarray(cand.apply({"params": params}, x[:2]), np.float32)
    print(f"max abs diff (bf16 outputs): {np.abs(a - b).max():.3e}")

    def mk(mod):
        def make_fn(n):
            @jax.jit
            def f(x):
                def body(i, acc):
                    y = mod.apply({"params": params}, x + acc * 1e-9)
                    return acc + y[0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return f
        return make_fn

    t_cand = marginal(mk(cand), (x,))
    t_prod = marginal(mk(prod), (x,))
    print(f"production nn.Conv subsampler : {t_prod*1e3:8.2f} ms/iter")
    print(f"shifted-matmul subsampler     : {t_cand*1e3:8.2f} ms/iter  "
          f"({t_prod/t_cand:.2f}x)")


if __name__ == "__main__":
    main()
