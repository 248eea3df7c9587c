"""End-to-end demo on synthetic data: corpus prep -> adapter fine-tune ->
evaluation, exercising the full BASELINE configs[2]/[3] stack.

Synthesizes a toy "dialect": each character of a small vocab maps to a
distinct tone (sine) sequence, so a model must genuinely learn
frame-to-symbol alignment. Stage 1 trains on the "neighbor" dialect (tones
400..1200 Hz); stage 2 adapts to the low-resource "target" dialect whose
tones are shifted (multi-dialect knowledge transfer, SURVEY 3.4). Prints
corpus CER before/after each stage.

Run: python examples/synthetic_demo.py [--steps 300] [--outdir /tmp/jl_demo]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


VOCAB = list("胶辽官话语音识别你好世界")


def synth_wave(text: str, base_hz: float, sr: int = 16000, per_char: float = 0.25,
               seed: int = 0) -> np.ndarray:
    """Each char -> a tone at base_hz * (1 + idx/len(vOCAB)), 250 ms."""
    rng = np.random.RandomState(seed)
    pieces = []
    for ch in text:
        idx = VOCAB.index(ch)
        f = base_hz * (1.0 + idx / len(VOCAB))
        t = np.arange(int(sr * per_char)) / sr
        tone = 0.3 * np.sin(2 * np.pi * f * t) * np.hanning(len(t))
        pieces.append(tone)
    wav = np.concatenate(pieces) + 0.01 * rng.randn(sum(len(p) for p in pieces))
    return wav.astype(np.float32)


def make_corpus(outdir: Path, name: str, base_hz: float, n: int, seed: int):
    from jiao_liao_speech_recognition_tpu.data import ManifestRow, write_manifest
    from jiao_liao_speech_recognition_tpu.frontend.audio_io import write_wav

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        text = "".join(rng.choice(VOCAB, rng.randint(2, 7)))
        wav = synth_wave(text, base_hz, seed=seed * 1000 + i)
        p = outdir / f"{name}_{i}.wav"
        write_wav(p, wav, 16000)
        rows.append(ManifestRow(str(p), text, len(wav) / 16000.0, name))
    mp = outdir / f"{name}.jsonl"
    write_manifest(rows, mp)
    return str(mp)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--outdir", default="/tmp/jl_demo")
    ap.add_argument("--target-steps", type=int, default=150)
    args = ap.parse_args()

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    from jiao_liao_speech_recognition_tpu.data.manifest import read_manifest
    from jiao_liao_speech_recognition_tpu.train.engine import evaluate_manifest
    from jiao_liao_speech_recognition_tpu.train.schedules import run_stages
    from jiao_liao_speech_recognition_tpu.utils.config import (
        AdapterConfig,
        CTCModelConfig,
        DataConfig,
        DialectStage,
        ExperimentConfig,
        FrontendConfig,
        OptimizerConfig,
        SpecAugmentConfig,
    )

    # neighboring dialect: plenty of data; target: same symbol->tone system
    # shifted ~9% (a "neighboring dialect" per the paper's premise), scarce
    neighbor = make_corpus(out, "neighbor", 440.0, 64, seed=1)
    target = make_corpus(out, "jiaoliao", 480.0, 24, seed=2)  # low-resource
    target_test = make_corpus(out, "jiaoliao_test", 480.0, 16, seed=3)

    cfg = ExperimentConfig(
        model_family="ctc",
        frontend=FrontendConfig(chunk_seconds=2.0),
        ctc_model=CTCModelConfig(
            vocab_size=16, d_model=128, num_layers=4, num_heads=4, mlp_dim=512,
            conv_channels=128, dropout=0.1,
            adapter=AdapterConfig(kind="wf", wf_rank=8, dropout=0.0),
        ),
        specaugment=SpecAugmentConfig(enabled=True, freq_mask_width=10),
        data=DataConfig(
            batch_size=16, bucket_boundaries_seconds=(2.0,), max_text_len=8,
            min_audio_seconds=0.1,
        ),
    )
    cfg.train.optimizer = OptimizerConfig(
        learning_rate=2e-3, warmup_steps=30, total_steps=args.steps,
        schedule="cosine",
    )
    stage1 = DialectStage(name="neighbor", manifests=(neighbor,), steps=args.steps,
                          train_adapters_only=False)
    stage2 = DialectStage(name="jiaoliao", manifests=(target,),
                          steps=args.target_steps,
                          train_adapters_only=True)  # frozen backbone + WFAdapter

    test_m = read_manifest(target_test)

    # stage 1 only: zero-shot transfer baseline on the target dialect
    cfg1 = dataclasses.replace(cfg, stages=(stage1,))
    params1, tokenizer, hist1 = run_stages(cfg1)
    print(json.dumps({"stage1": hist1}, ensure_ascii=False))
    zero_shot = evaluate_manifest(cfg1, params1, tokenizer, test_m)
    print(json.dumps({"after_neighbor_only": zero_shot}, ensure_ascii=False))

    # stage 2: adapter-only adaptation on the low-resource target
    cfg2 = dataclasses.replace(cfg, stages=(stage2,))
    params2, tokenizer, hist2 = run_stages(cfg2, params=params1, tokenizer=tokenizer)
    print(json.dumps({"stage2": hist2}, ensure_ascii=False))
    adapted = evaluate_manifest(cfg2, params2, tokenizer, test_m)
    print(json.dumps({"after_adaptation": adapted}, ensure_ascii=False))


if __name__ == "__main__":
    main()
