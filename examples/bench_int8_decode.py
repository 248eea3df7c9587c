"""A/B whisper-large-v3 AR greedy decode: bf16 vs int8-quantized serving.

Measures tokens/s and decode-RTFx for the bf16 tree vs ModelBundle.quantize()
(int8 decoder weights + int8 cross KV caches + int8 tied-embedding logits)
at several batch sizes on the real chip. Methodology follows the repo bench
rules (docs/PERFORMANCE.md): distinct input buffers per timed iteration and
a hard host sync, so the remote-relay memoization cannot inflate numbers.

Usage: python examples/bench_int8_decode.py [--batches 1,8,16]
Random-init weights (no network in this environment); throughput is
weight-shape-bound, not value-bound. r3 measured numbers live in
docs/PERFORMANCE.md ("Known costs / future levers").
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jiao_liao_speech_recognition_tpu.data.tokenizer import CharTokenizer
    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import (
        default_prompt,
        greedy_generate,
    )
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.models.whisper import WhisperModel
    from jiao_liao_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
        FrontendConfig,
        whisper_preset,
    )

    batches = [1, 8]
    for i, a in enumerate(sys.argv):
        if a == "--batches" and i + 1 < len(sys.argv):
            batches = [int(b) for b in sys.argv[i + 1].split(",")]
    if "--head-major" in sys.argv:
        # force head-major caches (+ the grouped decode-attention kernel)
        # at every batch size, to A/B against the packed small-batch layout
        from jiao_liao_speech_recognition_tpu.models import layers as _layers

        _layers.HEAD_MAJOR_MIN_BATCH = 1

    cfg = ExperimentConfig(model_family="whisper", whisper=whisper_preset("large-v3"))
    cfg.frontend = FrontendConfig(num_mels=128)
    model = WhisperModel(cfg.whisper)
    t0 = time.time()
    params = ModelBundle._init_params(cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    print(f"init {time.time()-t0:.0f}s", flush=True)
    bundle = ModelBundle(config=cfg, params=params, tokenizer=CharTokenizer([]))
    if "--bf16-only" in sys.argv:
        qparams = None
    else:
        t0 = time.time()
        qparams = bundle.quantize().params
        print(f"quantize {time.time()-t0:.0f}s", flush=True)

    fe = cfg.frontend
    secs, max_len = 30.0, 64
    samples = int(secs * fe.sample_rate)
    prompt = default_prompt(cfg.whisper.vocab_size)

    @jax.jit
    def decode(p, wav):
        mel = featurize_batch(wav, fe)
        return greedy_generate(model, p, mel, max_len=max_len, prompt=prompt)

    def bench(label, p, bsz, iters=4):
        rng = np.random.RandomState(bsz)
        wavs = [
            jnp.asarray(rng.randn(bsz, samples).astype(np.float32) * 0.1)
            for _ in range(2)
        ]
        jax.block_until_ready(wavs)
        t0 = time.time()
        for wv in wavs:  # compile + warm EVERY distinct buffer
            _, n = decode(p, wv)
            _ = int(np.asarray(n).sum())
        print(f"{label} B={bsz} compile+warm {time.time()-t0:.0f}s", flush=True)
        toks = 0
        t0 = time.perf_counter()
        for i in range(iters):
            _, n = decode(p, wavs[i % 2])
            toks += int(np.asarray(n).sum())  # hard host sync
        dt = time.perf_counter() - t0
        print(
            f"{label} B={bsz}: {toks/dt:.1f} tok/s, "
            f"decode_rtfx {secs*bsz*iters/dt:.1f}",
            flush=True,
        )

    variants = [("bf16", params), ("int8", qparams)]
    if "--bf16-only" in sys.argv:
        variants = variants[:1]
    for bsz in batches:
        for label, p in variants:
            try:
                bench(label, p, bsz)
            except Exception as e:  # B=32 bf16 OOMs by design; keep going
                print(f"{label} B={bsz} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
