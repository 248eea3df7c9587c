"""Measure streaming transcription's text-accuracy cost on the chip.

serve/streaming.py commits a frame once it has `lookahead_seconds` of right
context; inside a window the encoder is bidirectional, so early commits see
less future than the offline decode and can differ. This script measures
that cost end to end on a TRAINED model (docs/PERFORMANCE.md carries the
numbers; tests/test_streaming.py pins exactness only for the
single-window/finish path):

1. synthesize a 24-utterance tonal corpus (3 s each, char texts);
2. train the small flagship CTC shape (d=128, 2 layers) to overfitting with
   `cli train`;
3. offline CER via `cli evaluate` (greedy);
4. streamed CER at window 1.92 s (smaller than the utterances, so the
   sliding path + cross-window collapse carry are genuinely exercised),
   hop 0.32 s, lookahead swept {0.16, 0.32, 0.64} s — reporting corpus CER
   vs references AND exact-match rate vs the offline texts.

Usage: python examples/streaming_quality.py [--workdir /tmp/jl_sq] [--steps 600]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(args, capture_output=True, text=True, env=env, cwd=_REPO)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(args)} failed:\n{r.stderr[-2000:]}")
    return r.stdout


def main():
    workdir, steps = "/tmp/jl_sq", 600
    for i, a in enumerate(sys.argv):
        if a == "--workdir" and i + 1 < len(sys.argv):
            workdir = sys.argv[i + 1]
        if a == "--steps" and i + 1 < len(sys.argv):
            steps = int(sys.argv[i + 1])

    import numpy as np

    from jiao_liao_speech_recognition_tpu.data import ManifestRow, write_manifest
    from jiao_liao_speech_recognition_tpu.frontend.audio_io import write_wav

    os.makedirs(workdir, exist_ok=True)
    manifest = os.path.join(workdir, "train.jsonl")
    rng = np.random.RandomState(42)
    chars = list("的一是在不了有大人上中国我他这为来")
    rows, wavs, refs = [], [], []
    for i in range(24):
        n = int(3.0 * 16000)
        t = np.arange(n) / 16000.0
        wav = (
            0.3 * np.sin(2 * np.pi * (150 + i * 23) * t)
            + 0.2 * np.sin(2 * np.pi * (400 + i * 37) * t)
            + 0.05 * rng.randn(n)
        ).astype(np.float32)
        path = os.path.join(workdir, f"u{i}.wav")
        write_wav(path, wav, 16000)
        text = "".join(rng.choice(chars, size=rng.randint(4, 9)))
        rows.append(ManifestRow(audio=path, text=text, duration=3.0, dialect="syn"))
        wavs.append(wav)
        refs.append(text)
    write_manifest(rows, manifest)

    ckpt = os.path.join(workdir, "ckpt")
    cli = [sys.executable, "-m", "jiao_liao_speech_recognition_tpu.cli"]
    if not os.path.isdir(os.path.join(ckpt, "final")):
        print(f"training {steps} steps ...", flush=True)
        sh(cli + [
            "train", "--config", "configs/adapter_finetune.yaml",
            f"data.train_manifest={manifest}",
            "data.batch_size=8", "data.bucket_boundaries_seconds=[3.0]",
            "frontend.chunk_seconds=3.0",
            "ctc_model.d_model=128", "ctc_model.num_layers=2",
            "ctc_model.num_heads=4", "ctc_model.mlp_dim=256",
            "ctc_model.conv_channels=64",
            "ctc_model.use_flash_attention=false",
            "ctc_model.adapter.kind=none", "ctc_model.dropout=0.0",
            "train.train_adapters_only=false",
            f"train.optimizer.total_steps={steps}",
            "train.optimizer.learning_rate=3e-3",
            "train.optimizer.warmup_steps=50",
            f"train.checkpoint_dir={ckpt}",
            f"train.metrics_path={os.path.join(workdir, 'm.jsonl')}",
        ])

    out = sh(cli + [
        "evaluate", "--manifest", manifest,
        "--checkpoint", os.path.join(ckpt, "final"), "--batch-size", "8",
    ])
    offline = json.loads(out.strip().splitlines()[-1])
    print(f"offline greedy: CER {offline['cer']} WER {offline['wer']}",
          flush=True)

    from jiao_liao_speech_recognition_tpu.api import load
    from jiao_liao_speech_recognition_tpu.evals import corpus_cer
    from jiao_liao_speech_recognition_tpu.serve.streaming import (
        StreamingConfig,
        StreamingTranscriber,
    )

    bundle = load(checkpoint=os.path.join(ckpt, "final"))
    offline_texts = bundle.transcribe(wavs)

    results = {"offline_cer": offline["cer"]}
    hop = int(0.32 * 16000)
    # Two regimes:
    # * window >= utterance (3.2 s): isolates the LOOKAHEAD cost — the
    #   window start stays 0, so position embeddings match training and the
    #   only streaming effect is committing frames with limited right
    #   context.
    # * window < utterance (1.92 s): the sliding regime. A model trained on
    #   full utterances (absolute sinusoidal positions) is NOT shift-
    #   invariant; expect degradation unless training used windowed crops —
    #   the standard streaming-ASR training recipe, supported here via the
    #   data pipeline's cropping/chunking (train with
    #   frontend.chunk_seconds == the serving window).
    for window in (3.2, 1.92):
        for look in (0.16, 0.32, 0.64):
            sc = StreamingConfig(window_seconds=window, hop_seconds=0.32,
                                 lookahead_seconds=look)
            streamed = []
            for wav in wavs:
                st = StreamingTranscriber(bundle, sc)
                for s in range(0, len(wav), hop):
                    st.feed(wav[s : s + hop])
                streamed.append(st.finish().text)
            cer = corpus_cer(refs, streamed)
            match = float(
                np.mean([a == b for a, b in zip(streamed, offline_texts)])
            )
            results[f"w{window}_look{look}"] = {
                "cer": cer, "offline_match": match,
            }
            print(
                f"streamed window {window}s hop 0.32s lookahead {look}s: "
                f"CER {cer:.4f}  exact-match vs offline {match:.2f}",
                flush=True,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
