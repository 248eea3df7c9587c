"""On-chip latency profile of the sliding-window streaming transcriber.

Simulates a live audio stream at the flagship CTC config: feeds a synthetic
stream hop-by-hop through serve.streaming.StreamingTranscriber and measures
what a caller would feel —

  * per-hop wall latency (one fixed-shape window forward through the relay),
  * the streaming real-time factor (hop compute / hop audio duration), and
  * commit latency (hop + lookahead + compute: audio-to-final-text delay).

Methodology per the verify skill: every hop's window contents differ
(rolling audio), each timed call ends in a hard host sync (the feed() path
materializes the id rows with np.asarray), and the first window is warmed
before timing. Run on the TPU; pass --cpu to sanity-check the loop off-chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_streaming.py
"""

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seconds", type=float, default=60.0, help="stream length")
    ap.add_argument("--window", type=float, default=10.0)
    ap.add_argument("--hop", type=float, default=0.4)
    ap.add_argument("--lookahead", type=float, default=0.64)
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument(
        "--batch", type=int, default=0,
        help="also time the raw window step at this batch (N concurrent "
        "streams share one dispatch: the real capacity number)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from jiao_liao_speech_recognition_tpu.data.tokenizer import CharTokenizer
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.serve.streaming import (
        StreamingConfig,
        StreamingTranscriber,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import (
        CTCModelConfig,
        ExperimentConfig,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    cfg = ExperimentConfig(
        model_family="ctc",
        ctc_model=CTCModelConfig(
            d_model=args.d_model, num_layers=args.layers, num_heads=4,
            mlp_dim=4 * args.d_model, conv_channels=args.d_model,
            dropout=0.0,
        ),
    )
    params = ModelBundle._init_params(cfg)
    vocab = [chr(0x4E00 + i) for i in range(4334)]
    bundle = ModelBundle(config=cfg, params=params, tokenizer=CharTokenizer(vocab))
    sc = StreamingConfig(
        window_seconds=args.window, hop_seconds=args.hop,
        lookahead_seconds=args.lookahead,
    )

    sr = cfg.frontend.sample_rate
    rng = np.random.RandomState(0)
    stream = (rng.randn(int(args.seconds * sr)) * 0.1).astype(np.float32)
    hop = int(args.hop * sr)

    # warm the window program (compile + first-buffer cost)
    warm = StreamingTranscriber(bundle, sc)
    t0 = time.perf_counter()
    warm.feed(stream[: max(hop, int(args.window * sr))])
    print(f"first-window (compile) s: {time.perf_counter() - t0:.1f}",
          file=sys.stderr)

    st = StreamingTranscriber(bundle, sc)
    lat = []
    t_start = time.perf_counter()
    for s in range(0, len(stream) - hop + 1, hop):
        t0 = time.perf_counter()
        st.feed(stream[s : s + hop])
        lat.append(time.perf_counter() - t0)
    st.finish()
    total = time.perf_counter() - t_start

    lat_ms = np.asarray(lat[2:]) * 1e3  # drop ramp-up hops
    audio_s = len(lat) * args.hop
    print(
        f"stream {audio_s:.0f}s  window {args.window}s  hop {args.hop}s  "
        f"lookahead {args.lookahead}s  model d={args.d_model} L{args.layers}"
    )
    print(
        f"per-hop latency ms: mean {lat_ms.mean():.1f}  p50 "
        f"{np.percentile(lat_ms, 50):.1f}  p95 {np.percentile(lat_ms, 95):.1f}  "
        f"max {lat_ms.max():.1f}"
    )
    rtf = total / audio_s
    print(
        f"streaming RTF {rtf:.4f} ({1.0 / rtf:.1f}x real-time headroom); "
        f"commit latency ~ hop + lookahead + compute = "
        f"{(args.hop + args.lookahead) * 1e3 + lat_ms.mean():.0f} ms"
    )
    n_stream_capacity = int(1.0 / rtf)
    print(
        f"single-chip capacity at this config: ~{n_stream_capacity} "
        f"concurrent real-time streams un-batched (single-stream hops are "
        f"dispatch/transfer-floor-bound through the relay, not compute-bound)"
    )

    if args.batch > 1:
        # N streams share one dispatch through the PRODUCTION pool: open B
        # slots, feed each a hop of its own audio, one pool.step() advances
        # all of them. Windows roll forward so every timed dispatch sees
        # distinct buffers; step() materializes the id rows (hard sync).
        from jiao_liao_speech_recognition_tpu.serve.streaming import (
            StreamingPool,
        )

        B = args.batch
        pool = StreamingPool(bundle, slots=B, stream_cfg=sc)
        sids = [pool.open() for _ in range(B)]
        streams = [
            (rng.randn(int((args.window + 12) * sr)) * 0.1).astype(np.float32)
            for _ in range(B)
        ]
        # prime each slot past one full window, then warm the batched program
        for sid, s in zip(sids, streams):
            pool.feed(sid, s[: int(args.window * sr) + hop])
        for _ in range(3):
            for k, sid in enumerate(sids):
                off = int(args.window * sr) + hop
                pool.feed(sid, streams[k][off : off + hop])
            pool.step()
        offs = [int(args.window * sr) + 2 * hop] * B
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            for k, sid in enumerate(sids):
                pool.feed(sid, streams[k][offs[k] : offs[k] + hop])
                offs[k] += hop
            n = len(pool.step())
            assert n == B, n
        t_step = (time.perf_counter() - t0) / iters
        cap = B * args.hop / t_step
        print(
            f"pool step B={B}: {t_step * 1e3:.1f} ms/step (one dispatch + "
            f"host bookkeeping) -> ~{cap:.0f} concurrent real-time "
            f"streams/chip at hop {args.hop}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
