"""Benchmark: batched inference RTFx (audio-seconds of speech processed per
wall-clock second per chip) on the flagship transformer-CTC model, plus the
BASELINE-tracked adapter fine-tune steps/sec, the prefix-beam decode RTFx
(BASELINE configs[1] as written), a bucketed mixed-length RTFx through the
production BatchIterator (padding waste + text materialization included),
and the TPU-fused vs CPU-module greedy TEXT parity proof.

Inference pipeline measured end-to-end on device: raw waveform batch ->
fused log-mel frontend -> conv-subsampled transformer encoder -> CTC decode.
Training: the production jitted step (frozen backbone + WF adapters,
on-device featurize + SpecAugment + CTC loss) at batch 16 x 10 s.

Prints ONE JSON line:
  {"metric": "rtfx", "value": N, "unit": "audio_sec_per_sec_per_chip",
   "vs_baseline": N, "beam_rtfx": N, "bucketed_rtfx": N,
   "adapter_finetune_steps_per_sec": N, "parity_ok": bool, ...}
vs_baseline is measured RTFx / 200 (the driver-set >=200x real-time target,
BASELINE.md; the reference publishes no throughput numbers).

Flags: --large additionally measures whisper-large-v3 adapter fine-tune
steps/sec on the chip (several minutes: 3.1 GB bf16 weights + compile);
--no-parity / --no-beam / --no-bucketed skip sections. Each section is
fault-isolated: a failure nulls its field rather than killing the line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

_FLAGSHIP_VOCAB = 4336


def _flagship(vocab: int = _FLAGSHIP_VOCAB):
    from jiao_liao_speech_recognition_tpu.models.ctc_model import CTCEncoderModel
    from jiao_liao_speech_recognition_tpu.utils.config import (
        CTCModelConfig,
        FrontendConfig,
    )

    fe = FrontendConfig()
    cfg = CTCModelConfig(vocab_size=vocab)
    return CTCEncoderModel(cfg), cfg, fe


def _init_flagship_params(model, fe, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.frontend.features import (
        log_mel_spectrogram,
    )

    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, fe.sample_rate).astype(np.float32) * 0.1
    )
    feats0 = log_mel_spectrogram(wav, fe)
    return model.init(
        jax.random.PRNGKey(seed), feats0, jnp.asarray([fe.sample_rate // fe.hop_length])
    )["params"]


def bench_rtfx() -> float:
    """Headline greedy RTFx: fused frontend + encoder + fused head/argmax +
    on-device collapse, batch 128 x 30 s, two buffers in flight."""
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.ctc import ctc_greedy_collapse
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch

    model, cfg, fe = _flagship()
    secs, batch = 30.0, 128  # measured sweep {32,64,128}: 128 amortizes best
    samples = int(secs * fe.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(batch, samples).astype(np.float32) * 0.1)
    lengths = jnp.full((batch,), samples, jnp.int32)
    params = _init_flagship_params(model, fe)

    @jax.jit
    def infer(params, wav, lengths):
        feats = featurize_batch(wav, fe)
        ids, out_lens = model.apply(
            {"params": params}, feats, lengths // fe.hop_length,
            deterministic=True, head_mode="argmax_ids",
        )
        return ctc_greedy_collapse(ids, out_lens)

    # distinct input batches: identical repeated dispatches can be memoized
    # upstream of the chip (~500x inflation observed); warm every buffer
    # (first execution per buffer pays a one-time cost on the remote TPU)
    wavs = [jnp.roll(wav, i + 1, axis=0) + 1e-4 * (i + 1) for i in range(2)]
    jax.block_until_ready(wavs)
    for w in wavs:
        out = infer(params, w, lengths)
        _ = int(np.asarray(out[1]).sum())

    iters = 10
    t0 = time.perf_counter()
    prev = None
    for i in range(iters):
        # two batches in flight: sync batch i-1 while i executes — hides the
        # fixed per-dispatch latency without ever skipping an execution
        ids, n = infer(params, wavs[i % len(wavs)], lengths)
        if prev is not None:
            _ = int(np.asarray(prev).sum())
        prev = n
    _ = int(np.asarray(prev).sum())
    dt = time.perf_counter() - t0
    return secs * batch * iters / dt


def bench_beam_rtfx() -> float:
    """Prefix-beam decode RTFx (BASELINE configs[1] as written): device runs
    encoder + log_softmax + per-frame top-k pruning; the C++ engine
    (native/beam.cpp) runs the beam multithreaded across utterances while
    the chip works on the NEXT batch (1-deep software pipeline).

    Measured on a briefly-TRAINED model with the production pruned beam
    (DecodeConfig.beam_prune_logp semantics): deployed CTC models emit
    peaked, blank-dominated posteriors, where most frames collapse to the
    engine's O(beams) blank-only update — random-init near-uniform rows
    would overstate the per-frame beam cost by orders of magnitude."""
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.ctc import ctc_topk_posteriors
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch
    from jiao_liao_speech_recognition_tpu.utils.native_ext import load_beam

    model, cfg, fe = _flagship()
    secs, batch, K, beam_size = 30.0, 128, 16, 8
    prune_logp = -10.0
    samples = int(secs * fe.sample_rate)
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(batch, samples).astype(np.float32) * 0.1)
    lengths = jnp.full((batch,), samples, jnp.int32)
    params = _overfit_flagship()[0]
    engine = load_beam()

    @jax.jit
    def infer_topk(params, wav, lengths):
        feats = featurize_batch(wav, fe)
        log_probs, out_lens = model.apply(
            {"params": params}, feats, lengths // fe.hop_length, deterministic=True
        )
        tv, ti, bl = ctc_topk_posteriors(log_probs, K)
        return tv, ti, bl, out_lens

    wavs = [jnp.roll(wav, i + 1, axis=0) + 1e-4 * (i + 1) for i in range(2)]
    jax.block_until_ready(wavs)

    def host_beam(dev_out):
        tv, ti, bl, out_lens = [np.asarray(a) for a in dev_out]
        return engine.search(tv, ti, bl, out_lens, beam_size,
                             prune_logp=prune_logp)

    for w in wavs:  # warm every buffer + the C++ path
        _ = host_beam(infer_topk(params, w, lengths))

    iters = 6
    t0 = time.perf_counter()
    pending = infer_topk(params, wavs[0], lengths)
    total_out = 0
    for i in range(1, iters + 1):
        nxt = (
            infer_topk(params, wavs[i % len(wavs)], lengths)
            if i < iters
            else None
        )
        ids, lens = host_beam(pending)  # host beam overlaps device compute
        total_out += int(lens.sum())
        pending = nxt
    dt = time.perf_counter() - t0
    assert total_out >= 0
    return secs * batch * iters / dt


_BENCH_CORPUS = os.path.join(tempfile.gettempdir(), "jl_bench_corpus")


def _ensure_bucketed_corpus(n_utts: int = 256, seed: int = 3):
    """Synthetic mixed-length corpus on disk (cached across runs): durations
    drawn from a realistic right-skewed distribution over (3, 30] seconds."""
    from jiao_liao_speech_recognition_tpu.data import ManifestRow, write_manifest
    from jiao_liao_speech_recognition_tpu.frontend.audio_io import write_wav

    manifest = os.path.join(_BENCH_CORPUS, "bench.jsonl")
    marker = os.path.join(_BENCH_CORPUS, f".done_{n_utts}_{seed}")
    if os.path.exists(marker):
        return manifest
    os.makedirs(_BENCH_CORPUS, exist_ok=True)
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_utts):
        dur = float(np.clip(3.0 + rng.gamma(2.2, 4.5), 3.0, 30.0))
        n = int(dur * 16000)
        t = np.arange(n) / 16000.0
        wav = (
            0.25 * np.sin(2 * np.pi * (180 + (i % 40) * 11) * t)
            + 0.05 * rng.randn(n)
        ).astype(np.float32)
        path = os.path.join(_BENCH_CORPUS, f"b{i}.wav")
        write_wav(path, wav, 16000)
        rows.append(ManifestRow(audio=path, text="基准", duration=dur, dialect="bench"))
    write_manifest(rows, manifest)
    open(marker, "w").close()
    return manifest


def bench_bucketed_rtfx() -> float:
    """Mixed-length RTFx through the PRODUCTION input pipeline: manifest ->
    BatchIterator (length bucketing, one compiled shape per bucket) ->
    prefetch thread -> fused greedy infer -> host text materialization.
    RTFx counts SPOKEN seconds only, so bucket padding waste, ragged
    batches, host wav decode, and id->text all land in the denominator."""
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.data.manifest import read_manifest
    from jiao_liao_speech_recognition_tpu.data.pipeline import (
        BatchIterator,
        PrefetchIterator,
    )
    from jiao_liao_speech_recognition_tpu.data.tokenizer import CharTokenizer
    from jiao_liao_speech_recognition_tpu.decode.ctc import ctc_greedy_collapse
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch
    from jiao_liao_speech_recognition_tpu.utils.config import DataConfig

    model, cfg, fe = _flagship()
    params = _init_flagship_params(model, fe)

    manifest = read_manifest(_ensure_bucketed_corpus())
    tok = CharTokenizer.build([r.text for r in manifest.rows])
    data_cfg = DataConfig(
        batch_size=64,
        bucket_boundaries_seconds=[10.0, 20.0, 30.0],
        max_text_len=8,
        shuffle_seed=0,
        # int16 wire format: halves the host->device bytes (the relay link is
        # the bottleneck at mixed-length batch sizes); dequantized on device
        transfer_dtype="int16",
    )
    hop = fe.hop_length

    @jax.jit
    def infer(params, wav, lengths):
        feats = featurize_batch(wav, fe)
        ids, out_lens = model.apply(
            {"params": params}, feats, lengths // hop,
            deterministic=True, head_mode="argmax_ids",
        )
        return ctc_greedy_collapse(ids, out_lens)

    # one epoch = the iterator's own deterministic plan (batches are cut
    # PER BUCKET, so the count exceeds ceil(N/B) when buckets are ragged)
    n_batches = len(
        BatchIterator(
            manifest, tok, data_cfg, drop_last=False,
            process_index=0, process_count=1,
        )._plan_for_epoch()
    )

    def run_epoch(timed: bool):
        it = PrefetchIterator(
            BatchIterator(
                manifest, tok, data_cfg, drop_last=False,
                process_index=0, process_count=1,
            ),
            depth=2,
        )
        spoken = 0.0
        texts = []

        def materialize(pending):
            ids, lens = (np.asarray(a) for a in pending)
            for row, n in zip(ids, lens):
                texts.append("".join(chr(0x4E00 + int(t)) for t in row[: int(n)]))

        # 1-deep software pipeline: launch transfer+infer for batch i, THEN
        # sync batch i-1's ids — the host text work and the device round trip
        # overlap instead of serializing on one sync per batch
        pending = None
        for _ in range(n_batches):
            b = next(it)
            nxt = infer(
                params, jnp.asarray(b.audio), jnp.asarray(b.audio_lengths)
            )
            spoken += float(np.sum(b.audio_lengths)) / fe.sample_rate
            if pending is not None:
                materialize(pending)
            pending = nxt
        materialize(pending)
        return spoken, texts

    run_epoch(timed=False)  # warm every bucket shape
    t0 = time.perf_counter()
    spoken, texts = run_epoch(timed=True)
    dt = time.perf_counter() - t0
    assert len(texts) == len(manifest.rows)
    return spoken / dt


_OVERFIT_CACHE: dict = {}


def _overfit_flagship(n_utts: int = 64, secs: float = 8.0, steps: int = 150):
    """Overfit the flagship on synthetic utterances -> (params, wavs,
    lengths). Shared by the parity proof and the beam bench: a trained model
    emits PEAKED, blank-dominated posteriors — the regime deployed CTC
    models decode in — unlike random init's near-uniform rows. Cached per
    bench invocation so the two sections train once."""
    key = (n_utts, secs, steps)
    if key in _OVERFIT_CACHE:
        return _OVERFIT_CACHE[key]
    import jax
    import jax.numpy as jnp
    import optax

    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch
    from jiao_liao_speech_recognition_tpu.ops.ctc_loss import ctc_loss

    model, cfg, fe = _flagship()
    samples = int(secs * fe.sample_rate)
    rng = np.random.RandomState(11)
    wavs = rng.randn(n_utts, samples).astype(np.float32) * 0.1
    label_len = 6
    labels = rng.randint(1, cfg.vocab_size, (n_utts, label_len)).astype(np.int32)
    lengths = np.full((n_utts,), samples, np.int32)

    params = _init_flagship_params(model, fe, seed=1)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    hop = fe.hop_length

    @jax.jit
    def step(params, opt_state, wav, labels):
        def loss_fn(p):
            feats = featurize_batch(wav, fe)
            lp, out_lens = model.apply(
                {"params": p}, feats,
                jnp.full((wav.shape[0],), samples // hop, jnp.int32),
                deterministic=True,
            )
            nll = ctc_loss(lp, out_lens, labels, jnp.full((wav.shape[0],), label_len, jnp.int32))
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    B = 16
    wavs_d = jnp.asarray(wavs)
    labels_d = jnp.asarray(labels)
    for s in range(steps):
        i = (s * B) % n_utts
        params, opt_state, loss = step(
            params, opt_state, wavs_d[i : i + B], labels_d[i : i + B]
        )
    _ = float(loss)
    _OVERFIT_CACHE[key] = (params, wavs, lengths)
    return _OVERFIT_CACHE[key]


def bench_parity(n_utts: int = 64, secs: float = 8.0, steps: int = 150) -> bool:
    """BASELINE 'decode text parity (greedy), bit-for-bit at text level,
    TPU & CPU-JAX path': overfit the flagship on synthetic utterances, then
    transcribe them (a) on the TPU with every fused kernel engaged and
    (b) in a CPU-JAX subprocess through the plain module path, and require
    byte-identical text for all utterances."""
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.decode.ctc import ctc_greedy_collapse
    from jiao_liao_speech_recognition_tpu.frontend.features import featurize_batch

    model, cfg, fe = _flagship()
    hop = fe.hop_length
    params, wavs, lengths = _overfit_flagship(n_utts, secs, steps)
    wavs_d = jnp.asarray(wavs)

    @jax.jit
    def infer(params, wav, lengths):
        feats = featurize_batch(wav, fe)
        ids, out_lens = model.apply(
            {"params": params}, feats, lengths // hop,
            deterministic=True, head_mode="argmax_ids",
        )
        return ctc_greedy_collapse(ids, out_lens)

    ids, lens = infer(params, wavs_d, jnp.asarray(lengths))
    ids, lens = np.asarray(ids), np.asarray(lens)
    tpu_texts = [
        " ".join(str(int(t)) for t in row[: int(n)]) for row, n in zip(ids, lens)
    ]

    # CPU-JAX module path in a subprocess (this process's backend is pinned)
    with tempfile.TemporaryDirectory() as td:
        np.savez(
            os.path.join(td, "parity.npz"),
            wavs=wavs,
            lengths=lengths,
            **{
                "p_" + "/".join(map(str, k)): np.asarray(v)
                for k, v in _flatten_params(params).items()
            },
        )
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "bench_parity_cpu.py"),
             os.path.join(td, "parity.npz"), str(cfg.vocab_size)],
            capture_output=True, text=True, timeout=1800,
        )
        if out.returncode != 0:
            raise RuntimeError(f"cpu parity child failed:\n{out.stderr[-2000:]}")
        cpu_texts = json.loads(out.stdout.splitlines()[-1])

    mismatches = [i for i, (a, b) in enumerate(zip(tpu_texts, cpu_texts)) if a != b]
    if mismatches:
        sys.stderr.write(
            f"parity: {len(mismatches)}/{n_utts} utterances differ "
            f"(first: {mismatches[0]}: tpu={tpu_texts[mismatches[0]]!r} "
            f"cpu={cpu_texts[mismatches[0]]!r})\n"
        )
    return not mismatches


def _flatten_params(params):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        keys = tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[keys] = leaf
    return out


def bench_adapter_finetune() -> float:
    """Adapter fine-tune steps/sec (BASELINE tracked metric): the production
    jitted train step on the flagship CTC model with WF adapters + frozen
    backbone, batch 16 x 10 s. Distinct input batches per step; the step->
    step state dependency serializes execution on device, and the final
    block_until_ready is the only host sync inside the timed window."""
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.train.engine import (
        build_train_setup,
        init_state,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import (
        AdapterConfig,
        CTCModelConfig,
        ExperimentConfig,
    )

    config = ExperimentConfig(
        model_family="ctc",
        ctc_model=CTCModelConfig(
            vocab_size=_FLAGSHIP_VOCAB, adapter=AdapterConfig(kind="wf", wf_rank=8)
        ),
    )
    config.train.train_adapters_only = True

    params = ModelBundle._init_params(config)
    _, _, tx, jitted_step = build_train_setup(config, params)
    state = init_state(config, tx, params)

    B, secs = 16, 10.0
    samples = int(secs * config.frontend.sample_rate)
    rng = np.random.RandomState(0)
    batches = []
    for i in range(4):
        batches.append({
            "audio": jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1),
            "audio_lengths": jnp.full((B,), samples, jnp.int32),
            "labels": jnp.asarray(
                rng.randint(1, _FLAGSHIP_VOCAB, (B, 24)).astype(np.int32)
            ),
            "label_lengths": jnp.full((B,), 24, jnp.int32),
        })
    jax.block_until_ready(batches)
    for b in batches:  # warm every distinct buffer
        state, metrics = jitted_step(state, b)
        _ = float(metrics["loss"])

    # 60 iters ~= 1.5-2 s timed window: a 20-iter window (~0.5 s) showed
    # +-30% run-to-run wobble through the remote relay (one hiccup dominates)
    iters = 60
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = jitted_step(state, batches[i % len(batches)])
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"]))
    return iters / dt


def bench_large_v3_adapter() -> dict:
    """whisper-large-v3 adapter fine-tune on ONE chip (BASELINE configs[4]
    stretch scale): bf16 backbone ~3.1 GB frozen + WF adapters trained,
    B=4 x 8 s. Returns {steps_per_sec, peak_hbm_gb}."""
    import jax
    import jax.numpy as jnp

    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.train.engine import (
        build_train_setup,
        init_state,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import (
        AdapterConfig,
        ExperimentConfig,
        whisper_preset,
    )

    w = whisper_preset("large-v3")
    w.adapter = AdapterConfig(kind="wf", wf_rank=8)
    config = ExperimentConfig(model_family="whisper", whisper=w)
    config.frontend.num_mels = 128
    config.train.train_adapters_only = True

    params = ModelBundle._init_params(config)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    _, _, tx, jitted_step = build_train_setup(config, params)
    state = init_state(config, tx, params)

    B, secs = 4, 8.0
    samples = int(secs * config.frontend.sample_rate)
    rng = np.random.RandomState(0)
    S = 24
    toks = rng.randint(0, 51000, (B, S)).astype(np.int32)
    batches = []
    for i in range(2):
        batches.append({
            "audio": jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1),
            "audio_lengths": jnp.full((B,), samples, jnp.int32),
            "labels": jnp.asarray(toks),
            "label_lengths": jnp.full((B,), S, jnp.int32),
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
    peak = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    return {"steps_per_sec": round(iters / dt, 3), "peak_hbm_gb": peak}


def main() -> None:
    import jax

    # persistent XLA compile cache: repeat bench runs skip the ~1 min compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # best-effort native build (seconds): on a fresh checkout/VM the beam
    # section needs native/libbeam.so — a silent miss would null beam_rtfx
    from jiao_liao_speech_recognition_tpu.utils.native_ext import build_native

    if not build_native():
        sys.stderr.write(
            "bench: native build failed; the beam section will fall back or "
            "report null beam_rtfx\n"
        )

    args = set(sys.argv[1:])

    def section(fn, enabled=True, timeout_s=1500):
        """Fault-isolated section: an exception OR a hang (e.g. a wedged
        remote-relay compile) nulls this section's field instead of killing
        the whole JSON line."""
        if not enabled:
            return None
        import signal

        def _alarm(signum, frame):
            raise TimeoutError(f"section exceeded {timeout_s}s")

        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(timeout_s)
        try:
            return fn()
        except Exception as e:  # keep the JSON line alive; surface on stderr
            sys.stderr.write(f"bench section {fn.__name__} failed: {e}\n")
            return None
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def _device_alive():
        """Probe the backend in a SUBPROCESS with a hard kill: a wedged
        remote-relay init hangs inside native gRPC where SIGALRM's Python
        handler can't run, so an in-process timeout never fires."""
        import subprocess

        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "assert float(jnp.sum(jnp.ones((4,4)))) == 16.0;"
                 "print('ALIVE')"],
                capture_output=True, text=True, timeout=300,
            )
            return "ALIVE" in r.stdout
        except subprocess.TimeoutExpired:
            return False

    # one cheap upfront probe: if the backend (e.g. the remote TPU relay) is
    # down, emit the JSON line with nulls in ~5 min instead of burning the
    # per-section timeout five times over
    alive = bool(section(_device_alive, timeout_s=330))
    rtfx = section(bench_rtfx, alive)
    beam_rtfx = section(bench_beam_rtfx, alive and "--no-beam" not in args)
    bucketed = section(bench_bucketed_rtfx, alive and "--no-bucketed" not in args)
    steps_per_sec = section(bench_adapter_finetune, alive)
    parity = section(bench_parity, alive and "--no-parity" not in args)

    out = {
        "metric": "rtfx",
        "value": round(rtfx, 2) if rtfx else None,
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(rtfx / 200.0, 3) if rtfx else None,
        "beam_rtfx": round(beam_rtfx, 2) if beam_rtfx else None,
        "bucketed_rtfx": round(bucketed, 2) if bucketed else None,
        "adapter_finetune_steps_per_sec": (
            round(steps_per_sec, 2) if steps_per_sec else None
        ),
        "parity_ok": parity,
        "train_batch": 16,
        "train_secs_per_utt": 10.0,
    }
    if "--large" in args:
        large = section(bench_large_v3_adapter, alive)
        if large:
            out["large_v3_adapter_steps_per_sec"] = large["steps_per_sec"]
            out["large_v3_peak_hbm_gb"] = large["peak_hbm_gb"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
