"""Whisper-large-v3 scale proof (SURVEY §7 hard-part 5; BASELINE configs[4]).

Modes (see also --mode train30: adapter fine-tune at the production 30 s
window, where the blockwise Pallas flash backward is the memory plan):

  --mode cpu8   Random-init the REAL large-v3 shape (d=1280, 32+32 layers,
                128 mels, ~1.55 B params), shard it DP(2) x FSDP(2) x TP(2)
                over a virtual 8-device CPU mesh — params via the combined
                Megatron-column/row + FSDP rules, optimizer state ZeRO-style
                — and run ONE adapter-only production train step on short
                audio. Proves the sharded train graph compiles and executes
                at full parameter scale without 8 real chips.

  --mode tpu    On the real chip: bench the large-v3 encoder forward and the
                AR greedy decode (lax.while_loop, KV-cached) at batch sizes
                that fit a single v5e HBM; report encoder RTFx and decode
                tokens/s. Methodology follows bench.py (distinct buffers,
                hard host sync per timed iteration).

Results are recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _large_v3_config(adapter_kind: str = "wf"):
    from jiao_liao_speech_recognition_tpu.utils.config import (
        AdapterConfig,
        ExperimentConfig,
        FrontendConfig,
        MeshConfig,
        SpecAugmentConfig,
        whisper_preset,
    )

    w = whisper_preset("large-v3")
    w.adapter = AdapterConfig(kind=adapter_kind, wf_rank=8)
    cfg = ExperimentConfig(
        model_family="whisper",
        whisper=w,
        frontend=FrontendConfig(num_mels=128, chunk_seconds=2.0),
        specaugment=SpecAugmentConfig(enabled=False),
        mesh=MeshConfig(data_axis=2, fsdp_axis=2, model_axis=2),
    )
    cfg.train.train_adapters_only = True
    return cfg


def run_cpu8() -> None:
    # 8 virtual devices time-slice ONE host core here, so a long matmul
    # chunk can starve a collective rendezvous past XLA:CPU's default 40 s
    # terminate timeout; raise it before the backend initializes
    flags = (
        "--xla_cpu_collective_call_terminate_timeout_seconds=7200 "
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    )
    if "collective_call_terminate" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flags
        ).strip()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        raise RuntimeError("run under JAX_PLATFORMS=cpu with 8 forced host devices")
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.parallel.mesh import (
        build_mesh,
        opt_state_sharding,
        replicated,
        shard_batch,
    )
    from jiao_liao_speech_recognition_tpu.parallel.tp_rules import fsdp_tp_sharding
    from jiao_liao_speech_recognition_tpu.train.engine import (
        build_train_setup,
        init_state,
    )

    cfg = _large_v3_config()
    mesh = build_mesh(cfg.mesh, jax.devices()[:8])
    print(f"mesh: {dict(mesh.shape)}", flush=True)

    t0 = time.time()
    params = ModelBundle._init_params(cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"init: {n_params/1e9:.2f} B params in {time.time()-t0:.0f}s", flush=True)

    model, loss_fn, tx, jitted_step = build_train_setup(cfg, params, mesh)
    state = init_state(cfg, tx, params)
    psh = fsdp_tp_sharding(mesh, state.params)
    state = state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, psh),
        opt_state=jax.device_put(
            state.opt_state, opt_state_sharding(mesh, state.opt_state)
        ),
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
    n_tp = sum(
        1 for s in jax.tree_util.tree_leaves(psh) if "model" in str(s.spec)
    )
    n_fsdp = sum(
        1 for s in jax.tree_util.tree_leaves(psh) if "fsdp" in str(s.spec)
    )
    print(f"shardings: {n_tp} TP leaves, {n_fsdp} FSDP leaves", flush=True)

    B, secs = 4, 2.0
    samples = int(secs * cfg.frontend.sample_rate)
    rng = np.random.RandomState(0)
    S = 8
    eot = 50257
    toks = np.full((B, S), eot, np.int32)
    toks[:, 0] = 50258
    tgts = np.full((B, S), -100, np.int32)
    tgts[:, :4] = rng.randint(100, 1000, (B, 4))
    batch = shard_batch(mesh, {
        "audio": rng.randn(B, samples).astype(np.float32) * 0.1,
        "audio_lengths": np.full((B,), samples, np.int32),
        "labels": np.zeros((B, 4), np.int32),
        "label_lengths": np.full((B,), 4, np.int32),
        "tokens": toks,
        "targets": tgts,
    })
    t0 = time.time()
    state, metrics = jitted_step(state, batch)
    loss = float(metrics["loss"])
    print(
        json.dumps({
            "mode": "cpu8", "ok": bool(np.isfinite(loss)), "loss": round(loss, 4),
            "params_b": round(n_params / 1e9, 3),
            "step_plus_compile_s": round(time.time() - t0, 1),
            "mesh": dict(mesh.shape),
        }),
        flush=True,
    )


def run_tpu(enc_batch: int = 16, dec_batch: int = 8, max_len: int = 64) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import (
        default_prompt,
        greedy_generate,
    )
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.models.whisper import WhisperModel
    from jiao_liao_speech_recognition_tpu.utils.config import FrontendConfig

    cfg = _large_v3_config()
    cfg.frontend = FrontendConfig(num_mels=128)  # full 30 s receptive field
    model = WhisperModel(cfg.whisper)
    t0 = time.time()
    params = ModelBundle._init_params(cfg)
    # bf16 inference weights: AR decode is weight-read-bound (the whole
    # 1.55 B-param tree streams from HBM every token), so halving the bytes
    # nearly halves the per-token latency and frees ~3 GB for batch
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    print(f"init {time.time()-t0:.0f}s (params cast to bf16)", flush=True)

    fe = cfg.frontend
    secs = 30.0
    samples = int(secs * fe.sample_rate)
    rng = np.random.RandomState(0)

    # ---- encoder forward RTFx ----
    @jax.jit
    def encode(params, wav):
        mel = featurize_batch(wav, fe)
        return model.apply({"params": params}, mel, method=model.encode)

    wavs = [
        jnp.asarray(rng.randn(enc_batch, samples).astype(np.float32) * 0.1)
        for _ in range(2)
    ]
    jax.block_until_ready(wavs)
    t0 = time.time()
    for w in wavs:
        _ = float(jnp.sum(encode(params, w)[:, 0, 0]))
    print(f"encoder compile+warm {time.time()-t0:.0f}s", flush=True)
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        out = encode(params, wavs[i % 2])
        _ = float(jnp.sum(out[:, 0, 0]))  # hard sync, tiny readback
    dt = time.perf_counter() - t0
    enc_rtfx = secs * enc_batch * iters / dt
    print(json.dumps({"mode": "tpu", "metric": "encoder_rtfx",
                      "batch": enc_batch, "value": round(enc_rtfx, 1)}), flush=True)

    # ---- AR greedy decode tokens/s ----
    prompt = default_prompt(cfg.whisper.vocab_size)

    @jax.jit
    def decode(params, wav):
        mel = featurize_batch(wav, fe)
        return greedy_generate(model, params, mel, max_len=max_len, prompt=prompt)

    wavs_d = [
        jnp.asarray(rng.randn(dec_batch, samples).astype(np.float32) * 0.1)
        for _ in range(2)
    ]
    jax.block_until_ready(wavs_d)
    t0 = time.time()
    for w in wavs_d:
        gen, n = decode(params, w)
        _ = int(np.asarray(n).sum())
    print(f"decode compile+warm {time.time()-t0:.0f}s", flush=True)
    iters = 4
    tok_count = 0
    t0 = time.perf_counter()
    for i in range(iters):
        gen, n = decode(params, wavs_d[i % 2])
        # random weights rarely emit EOT: counts ~= max_len per utterance
        tok_count += int(np.asarray(n).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": "tpu", "metric": "greedy_tokens_per_sec", "batch": dec_batch,
        "value": round(tok_count / dt, 1),
        "decode_rtfx": round(secs * dec_batch * iters / dt, 1),
        "max_len": max_len,
    }), flush=True)


def run_timed(batch: int = 4, max_len: int = 32) -> None:
    """Word-timestamp alignment at large-v3 scale on the real chip: greedy
    decode a batch of 30 s windows, then time the cross-attention DTW pass
    (decode/align.py) with curated alignment_heads — the realistic config:
    large-v3's generation_config ships (layer, head) pairs, so only those
    layers' q/k are captured (2-3 x [B, 1500, 1280] f32 fetches instead of
    32). Proves the capture fits and measures seconds per aligned batch."""
    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.align import (
        whisper_token_spans,
    )
    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import (
        default_prompt,
        greedy_generate,
    )
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.models.whisper import WhisperModel
    from jiao_liao_speech_recognition_tpu.utils.config import FrontendConfig

    cfg = _large_v3_config()
    cfg.frontend = FrontendConfig(num_mels=128)
    cfg.whisper = dataclasses.replace(
        cfg.whisper, alignment_heads=((20, 4), (25, 9), (30, 2))
    )
    model = WhisperModel(cfg.whisper)
    t0 = time.time()
    params = ModelBundle._init_params(cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    print(f"init {time.time()-t0:.0f}s (bf16)", flush=True)

    fe = cfg.frontend
    secs = 30.0
    samples = int(secs * fe.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(batch, samples).astype(np.float32) * 0.1)
    mel = featurize_batch(wav, fe)
    prompt = default_prompt(cfg.whisper.vocab_size)
    t0 = time.time()
    gen, n = greedy_generate(
        model, params, mel, max_len=max_len, prompt=prompt
    )
    gen, n = np.asarray(gen), np.asarray(n)
    print(f"greedy decode {time.time()-t0:.0f}s, lens={n.tolist()}", flush=True)

    t0 = time.time()
    spans = whisper_token_spans(
        cfg.whisper, params, mel, gen.astype(np.int64), n,
        tuple(prompt), 50257,
    )
    warm = time.time() - t0
    t0 = time.perf_counter()
    spans = whisper_token_spans(
        cfg.whisper, params, mel, gen.astype(np.int64), n,
        tuple(prompt), 50257,
    )
    hot = time.perf_counter() - t0
    ok = all(len(s) == int(ln) for s, ln in zip(spans, n))
    print(json.dumps({
        "mode": "timed", "metric": "align_seconds_per_batch",
        "batch": batch, "tokens": int(n.sum()),
        "warm_s": round(warm, 1), "value": round(hot, 2),
        "per_utt_s": round(hot / batch, 3), "spans_ok": ok,
    }), flush=True)


def run_train30(batch: int = 4, flash_train_min_q: int = 512,
                remat: bool = False) -> None:
    """WF-adapter fine-tune at the PRODUCTION 30 s window (T=1500) on one
    chip. Training self-attention routes through the blockwise Pallas flash
    backward (flash_train_min_q <= 1500): no [B, H, T, T] probs in HBM in
    either direction. The einsum path's saved probs are ~0.7 GB/layer at
    B=4 (4*20*1500^2 f32) — it still fits, but only because XLA's
    HBM-pressure rematerializer compresses/recomputes activations, and it
    runs ~6% slower (--flash-train-min-q 100000 to reproduce: 2.12 vs
    2.26 steps/s at B=4). r4 measured: B=4 -> 2.26 steps/s
    (271 audio-sec/s), no OOM; B=8 exhausts HBM unless whisper.remat=true
    (then 0.847 steps/s — remat pays ~2x forward, B=4 stays optimal)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.train.engine import (
        build_train_setup,
        init_state,
    )

    cfg = _large_v3_config()
    cfg.whisper = dataclasses.replace(
        cfg.whisper, flash_train_min_q=flash_train_min_q, remat=remat
    )
    params = ModelBundle._init_params(cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    _, _, tx, jitted_step = build_train_setup(cfg, params)
    state = init_state(cfg, tx, params)

    secs = 30.0
    samples = int(secs * cfg.frontend.sample_rate)
    rng = np.random.RandomState(0)
    S = 48
    toks = rng.randint(0, 51000, (batch, S)).astype(np.int32)
    batches = []
    for _ in range(2):
        batches.append({
            "audio": jnp.asarray(
                rng.randn(batch, samples).astype(np.float32) * 0.1
            ),
            "audio_lengths": jnp.full((batch,), samples, jnp.int32),
            "labels": jnp.asarray(toks),
            "label_lengths": jnp.full((batch,), S, jnp.int32),
            "tokens": jnp.asarray(toks),
            "targets": jnp.asarray(np.roll(toks, -1, 1)),
        })
    for b in batches:
        state, metrics = jitted_step(state, b)
        _ = float(metrics["loss"])
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = jitted_step(state, batches[i % len(batches)])
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": "train30", "metric": "large_v3_train30_steps_per_sec",
        "batch": batch, "flash_train_min_q": flash_train_min_q,
        "remat": remat,
        "value": round(iters / dt, 3),
        "audio_sec_per_sec": round(iters / dt * batch * secs, 1),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=["cpu8", "tpu", "timed", "train30"], required=True
    )
    ap.add_argument("--enc-batch", type=int, default=16)
    ap.add_argument("--dec-batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--flash-train-min-q", type=int, default=512)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    if args.mode == "cpu8":
        run_cpu8()
    elif args.mode == "timed":
        run_timed(max_len=args.max_len)
    elif args.mode == "train30":
        run_train30(args.batch, args.flash_train_min_q, args.remat)
    else:
        run_tpu(args.enc_batch, args.dec_batch, args.max_len)


if __name__ == "__main__":
    main()
