"""Decompose the WF-adapter fine-tune step cost and sweep the train batch.

Round-4 question (VERDICT item 1): the r3 training number (43 steps/s at
B=16 x 10 s = 6.9k audio-sec/s) sits 6.7x under the inference headline
(46k RTFx at B=128 x 30 s). How much of that gap is (a) batch-size
underutilization, (b) the unfused training forward (module path: training
never routes to the fused sublayer kernels), (c) the backward itself,
(d) featurize/SpecAugment/CTC-loss/optimizer overhead?

Measures, for each B in the sweep, on the production config
(flagship CTC + WF adapters, frozen backbone, 10 s utterances):

  step        — the full production jitted train step (train_loop's fn)
  step_nodrop — same with dropout=0 everywhere (isolates dropout ops)
  fwd         — forward loss only (value, no grad), train=True semantics
  fwd_det     — deterministic forward (inference path WITH fused kernels)
  feat        — featurize_batch + SpecAugment only

All timings chain ITERS applications on device with distinct input buffers
and one hard sync at the end (relay floor ~24 ms makes per-call timing
meaningless). Prints a table + audio-sec/s per variant.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_train_step.py [--batches 16,64,128]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--rbg" in sys.argv:
        # A/B the dropout RNG: rbg uses the TPU hardware generator instead
        # of computing threefry rounds on the VPU
        jax.config.update("jax_default_prng_impl", "rbg")

    from jiao_liao_speech_recognition_tpu.frontend.features import (
        dequantize_pcm,
        featurize_batch,
    )
    from jiao_liao_speech_recognition_tpu.frontend.specaugment import spec_augment
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.train.engine import (
        build_train_setup,
        init_state,
        make_ctc_loss_fn,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import (
        AdapterConfig,
        CTCModelConfig,
        ExperimentConfig,
    )

    batches = [16, 64, 128]
    for a in sys.argv[1:]:
        if a.startswith("--batches"):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]

    secs = 10.0
    vocab = 4336

    def make_config(dropout: float, use_flash: bool = True) -> ExperimentConfig:
        config = ExperimentConfig(
            model_family="ctc",
            ctc_model=CTCModelConfig(
                vocab_size=vocab,
                adapter=AdapterConfig(kind="wf", wf_rank=8),
                dropout=dropout,
                use_flash_attention=use_flash,
            ),
        )
        config.train.train_adapters_only = True
        return config

    config = make_config(0.1)
    fe = config.frontend
    samples = int(secs * fe.sample_rate)
    params = ModelBundle._init_params(config)

    def make_batches(B: int, n: int = 4):
        rng = np.random.RandomState(0)
        out = []
        for _ in range(n):
            out.append({
                "audio": jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1),
                "audio_lengths": jnp.full((B,), samples, jnp.int32),
                "labels": jnp.asarray(
                    rng.randint(1, vocab, (B, 24)).astype(np.int32)
                ),
                "label_lengths": jnp.full((B,), 24, jnp.int32),
            })
        jax.block_until_ready(out)
        return out

    def time_chain(fn, carry, bufs, iters, sync):
        # warm every buffer; thread the carry (the production step donates
        # its state arg, so a reused stale carry is an invalidated buffer)
        c = carry
        out = None
        for b in bufs:
            out = fn(c, b)
            if isinstance(out, tuple) and hasattr(out[0], "params"):
                c = out[0]
            _ = sync(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(c, bufs[i % len(bufs)])
            if isinstance(out, tuple) and hasattr(out[0], "params"):
                c = out[0]
        _ = sync(out)
        return (time.perf_counter() - t0) / iters

    def fresh_params():
        # the production step DONATES its state (params included), so every
        # variant gets its own copy of the param buffers
        return jax.tree_util.tree_map(jnp.copy, params)

    results = []
    for B in batches:
        bufs = make_batches(B)
        iters = max(12, int(60 * 16 / B))
        row = {"B": B}

        # --- full production step, dropout=0.1 ---
        cfg = make_config(0.1)
        model, loss_fn, tx, jitted = build_train_setup(cfg, params)
        state = init_state(cfg, tx, fresh_params())
        dt = time_chain(
            lambda s, b: jitted(s, b), state, bufs, iters,
            lambda out: float(out[1]["loss"]),
        )
        row["step"] = dt

        # --- full step, dropout=0 ---
        cfg0 = make_config(0.0)
        model0, loss_fn0, tx0, jitted0 = build_train_setup(cfg0, params)
        state0 = init_state(cfg0, tx0, fresh_params())
        dt = time_chain(
            lambda s, b: jitted0(s, b), state0, bufs, iters,
            lambda out: float(out[1]["loss"]),
        )
        row["step_nodrop"] = dt

        # --- full step, flash OFF in training ---
        # flash's custom_vjp backward RECOMPUTES its reference forward
        # (remat semantics); the einsum path lets XLA keep saved
        # intermediates — at training shapes the recompute may cost more
        # than the fwd HBM traffic flash saves
        cfgnf = make_config(0.1, use_flash=False)
        modelnf, loss_fnnf, txnf, jittednf = build_train_setup(cfgnf, params)
        statenf = init_state(cfgnf, txnf, fresh_params())
        dt = time_chain(
            lambda s, b: jittednf(s, b), statenf, bufs, iters,
            lambda out: float(out[1]["loss"]),
        )
        row["step_noflash"] = dt

        # --- forward-only loss (train=True) ---
        key = jax.random.PRNGKey(0)

        @jax.jit
        def fwd(params, batch, key):
            loss, _ = loss_fn(params, batch, key, True)
            return loss

        dt = time_chain(
            lambda s, b: fwd(params, b, key), None, bufs, iters,
            lambda out: float(out),
        )
        row["fwd"] = dt

        # --- deterministic forward (fused inference kernels engage) ---
        @jax.jit
        def fwd_det(params, batch, key):
            loss, _ = loss_fn(params, batch, key, False)
            return loss

        dt = time_chain(
            lambda s, b: fwd_det(params, b, key), None, bufs, iters,
            lambda out: float(out),
        )
        row["fwd_det"] = dt

        # --- featurize + specaugment only ---
        @jax.jit
        def feat(batch, key):
            audio = dequantize_pcm(batch["audio"])
            feats = featurize_batch(audio, fe)
            feats = spec_augment(key, feats, config.specaugment)
            return jnp.sum(feats)

        dt = time_chain(
            lambda s, b: feat(b, key), None, bufs, iters,
            lambda out: float(out),
        )
        row["feat"] = dt

        results.append(row)
        audio = B * secs
        print(
            f"B={B:4d}  step={row['step']*1e3:8.2f} ms ({audio/row['step']:8.0f} au-s/s, "
            f"{1/row['step']:6.2f} steps/s)  nodrop={row['step_nodrop']*1e3:8.2f}  "
            f"noflash={row['step_noflash']*1e3:8.2f}  "
            f"fwd={row['fwd']*1e3:7.2f}  fwd_det={row['fwd_det']*1e3:7.2f}  "
            f"feat={row['feat']*1e3:6.2f}",
            flush=True,
        )

    print("\nsummary (ms):")
    print(f"{'B':>4} {'step':>9} {'nodrop':>9} {'noflash':>9} {'fwd':>8} {'fwd_det':>8} {'feat':>7} {'au-s/s':>8}")
    for r in results:
        print(
            f"{r['B']:>4} {r['step']*1e3:>9.2f} {r['step_nodrop']*1e3:>9.2f} "
            f"{r['step_noflash']*1e3:>9.2f} "
            f"{r['fwd']*1e3:>8.2f} {r['fwd_det']*1e3:>8.2f} {r['feat']*1e3:>7.2f} "
            f"{r['B']*secs/r['step']:>8.0f}"
        )


if __name__ == "__main__":
    main()
