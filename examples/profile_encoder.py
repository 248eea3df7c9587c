"""Per-component encoder profile on the real chip (marginal-cost method).

For each pipeline stage, jit a lax.fori_loop chaining the stage N times
(each iteration consumes the previous output, so the device serializes and
the host syncs once), then report (t(N_hi) - t(N_lo)) / (N_hi - N_lo) — the
marginal per-iteration device time with dispatch latency cancelled out.

Usage: python examples/profile_encoder.py [--batch 128] [--secs 30]
Writes a table to stdout; run AFTER bench.py so the XLA cache is warm.
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
    ap.add_argument("--secs", type=float, default=30.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.ctc import ctc_greedy_collapse
    from jiao_liao_speech_recognition_tpu.frontend.features import (
        featurize_batch,
        log_mel_spectrogram,
    )
    from jiao_liao_speech_recognition_tpu.models.ctc_model import (
        CTCEncoderModel,
        ConvSubsampler,
        CTCHead,
    )
    from jiao_liao_speech_recognition_tpu.models.layers import (
        TransformerBlock,
        length_mask,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import (
        CTCModelConfig,
        FrontendConfig,
    )

    fe = FrontendConfig()
    cfg = CTCModelConfig(vocab_size=4336)
    B = args.batch
    samples = int(args.secs * fe.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), samples, jnp.int32)

    model = CTCEncoderModel(cfg)
    feats0 = log_mel_spectrogram(wav[:1], fe)
    params = model.init(
        jax.random.PRNGKey(0), feats0, jnp.asarray([samples // fe.hop_length])
    )["params"]

    # ---- end to end (fused greedy) ----
    @jax.jit
    def infer(wav, lengths):
        feats = featurize_batch(wav, fe)
        ids, out_lens = model.apply(
            {"params": params}, feats, lengths // fe.hop_length,
            deterministic=True, head_mode="argmax_ids",
        )
        return ctc_greedy_collapse(ids, out_lens)

    t_e2e = min(timed(infer, wav, lengths) for _ in range(3))
    print(f"end-to-end infer (fused greedy)      {t_e2e*1e3:8.1f} ms")
    rtfx = args.secs * B / t_e2e
    print(f"  -> RTFx {rtfx:,.0f}")

    feats = featurize_batch(wav, fe)
    T = feats.shape[2]
    flens = jnp.full((B,), T, jnp.int32)

    # ---- frontend marginal ----
    def mk_frontend(n):
        @jax.jit
        def f(wav):
            def body(i, w):
                fz = featurize_batch(w, fe)
                # fold output back to wav shape cheaply to chain iterations
                return w + fz[0, 0, 0] * 1e-9
            return featurize_batch(jax.lax.fori_loop(0, n, body, wav), fe)
        return f

    print(f"frontend (fused log-mel)             {marginal(mk_frontend, (wav,))*1e3:8.1f} ms/iter")

    # ---- conv subsampler marginal ----
    sub = ConvSubsampler(cfg.d_model, cfg.conv_channels, jnp.bfloat16, cfg.subsample_factor)
    x_in = feats.transpose(0, 2, 1).astype(jnp.bfloat16)
    sub_params = sub.init(jax.random.PRNGKey(0), x_in[:1])["params"]

    def mk_sub(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                y = sub.apply({"params": sub_params}, x + acc * 1e-9)
                return acc + y[0, 0, 0].astype(jnp.float32)
            return sub.apply({"params": sub_params}, x + jax.lax.fori_loop(0, n, body, jnp.float32(0)) * 1e-9)
        return f

    print(f"conv subsampler                      {marginal(mk_sub, (x_in,))*1e3:8.1f} ms/iter")

    # ---- transformer block marginal (same-shape chain) ----
    blk = TransformerBlock(
        cfg.d_model, cfg.num_heads, cfg.mlp_dim, jnp.bfloat16,
        0.0, None, cfg.use_flash_attention,
    )
    Tp = T // cfg.subsample_factor
    x = jnp.asarray(rng.randn(B, Tp, cfg.d_model), jnp.bfloat16)
    blk_lens = jnp.full((B,), Tp, jnp.int32)
    mask = length_mask(blk_lens, Tp)
    blk_params = blk.init(jax.random.PRNGKey(0), x, mask)["params"]

    def mk_block(n):
        @jax.jit
        def f(x):
            def body(i, x):
                # threaded lengths engage the fused sublayer kernels
                return blk.apply(
                    {"params": blk_params}, x, mask, kv_lengths=blk_lens
                )
            return jax.lax.fori_loop(0, n, body, x)
        return f

    t_blk = marginal(mk_block, (x,))
    print(f"transformer block (marginal)         {t_blk*1e3:8.1f} ms/iter  x{cfg.num_layers} = {t_blk*cfg.num_layers*1e3:.1f} ms")

    # attention / MLP sublayers in isolation
    from jiao_liao_speech_recognition_tpu.models.layers import MLP, MultiHeadAttention
    import flax.linen as nn

    mha = MultiHeadAttention(cfg.num_heads, cfg.d_model, jnp.bfloat16, 0.0, None, cfg.use_flash_attention)
    mha_params = mha.init(jax.random.PRNGKey(0), x, mask=mask)["params"]

    def mk_mha(n):
        @jax.jit
        def f(x):
            def body(i, x):
                return x * 0.5 + mha.apply(
                    {"params": mha_params}, x, mask=mask, kv_lengths=blk_lens
                )
            return jax.lax.fori_loop(0, n, body, x)
        return f

    print(f"  attention sublayer                 {marginal(mk_mha, (x,))*1e3:8.1f} ms/iter")

    mlp = MLP(cfg.d_model, cfg.mlp_dim, jnp.bfloat16)
    mlp_params = mlp.init(jax.random.PRNGKey(0), x)["params"]

    def mk_mlp(n):
        @jax.jit
        def f(x):
            def body(i, x):
                return x * 0.5 + mlp.apply({"params": mlp_params}, x)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    print(f"  MLP sublayer                       {marginal(mk_mlp, (x,))*1e3:8.1f} ms/iter")

    def mk_ln(n):
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
        ln_params = ln.init(jax.random.PRNGKey(0), x)["params"]

        @jax.jit
        def f(x):
            def body(i, x):
                return ln.apply({"params": ln_params}, x) + x * 1e-6
            return jax.lax.fori_loop(0, n, body, x)
        return f

    print(f"  LayerNorm                          {marginal(mk_ln, (x,))*1e3:8.1f} ms/iter")

    # ---- heads ----
    head = CTCHead(cfg.vocab_size, jnp.bfloat16, cfg.d_model)
    head_params = head.init(jax.random.PRNGKey(0), x)["params"]

    def mk_head_logprobs(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                lp = jax.nn.log_softmax(
                    head.apply({"params": head_params}, x + acc * 1e-9), axis=-1
                )
                return acc + lp[0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return f

    print(f"head matmul+log_softmax (old path)   {marginal(mk_head_logprobs, (x,), lo=2, hi=6)*1e3:8.1f} ms/iter")

    def mk_head_argmax(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                ids = head.apply(
                    {"params": head_params}, x + acc * 1e-9, method=head.argmax_ids
                )
                return acc + ids[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return f

    print(f"head fused argmax (new path)         {marginal(mk_head_argmax, (x,), lo=2, hi=6)*1e3:8.1f} ms/iter")


if __name__ == "__main__":
    main()
