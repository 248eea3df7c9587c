"""On-chip A/B: CTC-draft speculative greedy vs sequential AR greedy.

Measures, for the flagship joint CTC/attention config (d=512, 12 enc +
6 dec layers — configs/joint_ctc_attention.yaml), the serving-path decode
wall time of

  AR      : decode/whisper_generate.greedy_from_enc — one KV-cached
            decode_step per token (the HBM-bound baseline)
  spec@p  : decode/speculative.spec_greedy_from_enc with an injected draft
            whose tokens match the greedy output at rate (1-p) — i.e. p is
            the corruption rate, so acceptance is controlled exactly

Draft accuracy is swept (100% / 90% / 75% / 0%) by corrupting the AR
output itself, so the speedup curve is measured without needing a trained
checkpoint: a trained joint model's CTC draft lands somewhere on this
curve (CTC vs attention greedy agreement is typically high), and the
exactness tests (tests/test_speculative.py) guarantee the text is
identical at every point on it.

Run on the real chip:  python examples/profile_spec_decode.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=3):
    # hard host sync via ONE data fetch: block_until_ready alone
    # under-measures repeat dispatches through the axon relay, and fetching
    # every output would bill one ~20 ms relay roundtrip per array —
    # outputs of one jit call complete together, so fetching the first
    # syncs them all
    outs = fn(*args)
    _ = np.asarray(outs[0]).sum()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn(*args)
        _ = np.asarray(outs[0]).sum()
        best = min(best, time.perf_counter() - t0)
    return best, outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--max-len", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=4336)
    ap.add_argument(
        "--big", action="store_true",
        help="size the decoder to whisper-large-v3 scale (d=1280, 24 dec "
        "layers): the HBM-bound regime where verification passes beat "
        "sequential steps",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.speculative import (
        spec_greedy_from_enc,
    )
    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import (
        greedy_from_enc,
    )
    from jiao_liao_speech_recognition_tpu.models.joint import (
        JointCTCAttentionModel,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import JointModelConfig

    if args.big:
        # decoder at whisper-large-v3 scale; encoder kept shallow (it is
        # outside the timed region — enc is precomputed below)
        cfg = JointModelConfig(
            vocab_size=args.vocab, d_model=1280, num_layers=2,
            decoder_layers=24, num_heads=10, mlp_dim=5120,
            conv_channels=512, dropout=0.0, dtype="bfloat16",
        )
    else:
        cfg = JointModelConfig(
            vocab_size=args.vocab, d_model=512, num_layers=12,
            decoder_layers=6, num_heads=4, mlp_dim=2048, conv_channels=512,
            dropout=0.0, dtype="bfloat16",
        )
    model = JointCTCAttentionModel(cfg)
    B = args.batch
    T = int(args.seconds * 100)  # 10 ms frames
    L = args.max_len
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, cfg.num_mels, T).astype(np.float32))
    flens = jnp.full((B,), T, jnp.int32)
    toks = jnp.zeros((B, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, flens, toks)["params"]

    enc, enc_lengths = jax.jit(
        lambda p, f, fl: model.apply({"params": p}, f, fl, method=model.encode)
    )(params, feats, flens)
    enc = jax.block_until_ready(enc)

    ar = jax.jit(
        lambda p, e, el: greedy_from_enc(
            model, p, e, el, max_len=L, prompt=(0,), eot_id=0
        )
    )
    t_ar, (gen_g, len_g) = timed(ar, params, enc, enc_lengths)
    gen_np, len_np = np.asarray(gen_g), np.asarray(len_g)
    print(
        f"AR greedy (KV-cached loop)  B={B} L={L}: {t_ar*1e3:8.1f} ms"
        f"   lengths={len_np.tolist()}"
    )

    spec = jax.jit(
        lambda p, e, el, d, dl: spec_greedy_from_enc(
            model, p, e, el, d, dl, max_len=L, return_passes=True
        )
    )
    drng = np.random.RandomState(1)
    for corrupt in (0.0, 0.10, 0.25, 1.0):
        draft = gen_np.copy()
        if corrupt > 0:
            flip = drng.rand(*draft.shape) < corrupt
            draft = np.where(flip, (draft + 1 + drng.randint(0, args.vocab - 2, draft.shape)) % args.vocab, draft)
        t_sp, (gen_s, len_s, passes) = timed(
            spec, params, enc, enc_lengths,
            jnp.asarray(draft, jnp.int32), jnp.asarray(len_np, jnp.int32),
        )
        ok = all(
            tuple(a[: int(n)]) == tuple(b[: int(m)])
            for a, n, b, m in zip(
                np.asarray(gen_s), np.asarray(len_s), gen_np, len_np
            )
        )
        print(
            f"spec draft-acc={100*(1-corrupt):5.1f}% : {t_sp*1e3:8.1f} ms"
            f"   passes={int(passes):3d}   speedup={t_ar/t_sp:5.2f}x"
            f"   text==greedy: {ok}"
        )
        if "--assert" in sys.argv and not ok:
            print(f"ASSERT FAILED: spec text != greedy at corrupt={corrupt}")
            raise SystemExit(1)
    if "--assert" in sys.argv:
        print("ASSERT OK: speculative text == greedy at every corruption rate")


if __name__ == "__main__":
    main()
