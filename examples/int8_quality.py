"""Measure the int8 serving quantization's text-accuracy cost on the chip.

BASELINE's quality bar is text-level; docs/PERFORMANCE.md's int8 serving
numbers (transcribe/evaluate --int8) needed a measured CER/WER cost, not
just a throughput table. This script produces one, end to end through the
production CLI:

1. synthesize a 24-utterance tonal corpus (3 s each, char texts);
2. train a small whisper (d=128, 2+2 layers) to overfitting on it with
   `cli train` (600 steps, ~25 steps/s on the v5e; final loss ~0.06);
3. `cli evaluate` the checkpoint four ways: {bf16, --int8} x {batch 4,
   batch 16} — batch 16 engages the head-major layout, whose quantized
   serving path ALSO stores the self-attention KV caches int8
   (models/whisper.init_cache), so both int8 cache regimes are covered.

Measured 2026-08-18 (v5e, this script verbatim):

    | batch | bf16 CER/WER | int8 CER/WER |
    |-------|--------------|--------------|
    | 4     | 0.0 / 0.0    | 0.0 / 0.0    |
    | 16    | 0.0 / 0.0    | 0.0 / 0.0    |

i.e. the full int8 serving step (weights + cross KV + self KV + logits)
reproduced every reference transcript exactly. On a model that decodes
near ties the cost may be nonzero — rerun this script against any real
checkpoint by pointing --manifest/--checkpoint at it.

Usage: python examples/int8_quality.py [--workdir /tmp/w8q] [--steps 600]
       add --assert to fail (exit 1) unless int8 CER/WER == bf16 CER/WER at
       every batch size — re-checks the published zero-cost claim so the
       docs number can't silently rot.
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
    workdir, steps = "/tmp/w8q", 600
    for i, a in enumerate(sys.argv):
        if a == "--workdir" and i + 1 < len(sys.argv):
            workdir = sys.argv[i + 1]
        if a == "--steps" and i + 1 < len(sys.argv):
            steps = int(sys.argv[i + 1])

    import numpy as np

    from jiao_liao_speech_recognition_tpu.data import (
        ManifestRow,
        write_manifest,
    )
    from jiao_liao_speech_recognition_tpu.frontend.audio_io import write_wav

    os.makedirs(workdir, exist_ok=True)
    manifest = os.path.join(workdir, "train.jsonl")
    rng = np.random.RandomState(42)
    chars = list("的一是在不了有大人上中国我他这为来")
    rows = []
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
    write_manifest(rows, manifest)

    ckpt = os.path.join(workdir, "ckpt")
    cli = [sys.executable, "-m", "jiao_liao_speech_recognition_tpu.cli"]
    if not os.path.isdir(os.path.join(ckpt, "final")):
        print(f"training {steps} steps ...", flush=True)
        sh(cli + [
            "train", "--config", "configs/adapter_finetune.yaml",
            "model_family=whisper", f"data.train_manifest={manifest}",
            "data.batch_size=8", "data.bucket_boundaries_seconds=[3.0]",
            "data.max_text_len=12", "frontend.chunk_seconds=3.0",
            "whisper.d_model=128", "whisper.encoder_layers=2",
            "whisper.decoder_layers=2", "whisper.num_heads=4",
            "whisper.mlp_dim=256", "whisper.max_source_positions=150",
            "whisper.max_target_positions=24",
            "whisper.use_flash_attention=false", "whisper.adapter.kind=none",
            "whisper.dropout=0.0", "train.train_adapters_only=false",
            f"train.optimizer.total_steps={steps}",
            "train.optimizer.learning_rate=3e-3",
            "train.optimizer.warmup_steps=50",
            f"train.checkpoint_dir={ckpt}",
            f"train.metrics_path={os.path.join(workdir, 'm.jsonl')}",
        ])

    results = {}
    for batch in (4, 16):
        for mode, extra in (("bf16", []), ("int8", ["--int8"])):
            out = sh(cli + [
                "evaluate", "--manifest", manifest,
                "--checkpoint", os.path.join(ckpt, "final"),
                "--batch-size", str(batch), *extra,
            ])
            res = json.loads(out.strip().splitlines()[-1])
            results[f"B{batch}_{mode}"] = {
                "cer": res["cer"], "wer": res["wer"],
            }
            print(f"B={batch} {mode}: CER {res['cer']} WER {res['wer']}",
                  flush=True)
    print(json.dumps(results))
    if "--assert" in sys.argv:
        bad = [
            b for b in (4, 16)
            if results[f"B{b}_int8"] != results[f"B{b}_bf16"]
        ]
        if bad:
            print(f"ASSERT FAILED: int8 != bf16 quality at batch {bad}")
            raise SystemExit(1)
        print("ASSERT OK: int8 quality == bf16 at every batch size")


if __name__ == "__main__":
    main()
