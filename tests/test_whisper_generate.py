"""Whisper AR generation under lax.while_loop: greedy matches a per-step
teacher-forced argmax loop; EOT stopping and prompt forcing behave."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jiao_liao_speech_recognition_tpu.decode.whisper_generate import greedy_generate
from jiao_liao_speech_recognition_tpu.models.whisper import WhisperModel
from jiao_liao_speech_recognition_tpu.utils.config import WhisperConfig

CFG = WhisperConfig(
    vocab_size=50, d_model=64, encoder_layers=2, decoder_layers=2,
    num_heads=4, mlp_dim=128, max_target_positions=24, dtype="float32",
    use_flash_attention=False,
)
EOT = 2
PROMPT = (1, 3)


@pytest.fixture(scope="module")
def model_and_params():
    model = WhisperModel(CFG)
    mel = jnp.zeros((1, 80, 60))
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel, toks)["params"]
    return model, params


def _reference_greedy(model, params, mel, max_len):
    """Naive greedy: re-run the full teacher-forced decoder per step."""
    B = mel.shape[0]
    toks = np.zeros((B, max_len), np.int32)
    toks[:, : len(PROMPT)] = PROMPT
    enc = model.apply({"params": params}, mel, method=model.encode)
    done = np.zeros(B, bool)
    n = len(PROMPT)
    for pos in range(len(PROMPT), max_len):
        logits = model.apply(
            {"params": params}, jnp.asarray(toks[:, :pos]), enc, method=model.decode
        )
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        nxt = np.where(done, EOT, nxt)
        toks[:, pos] = nxt
        done |= nxt == EOT
        if done.all():
            n = pos + 1
            break
    return toks


@pytest.mark.heavy
def test_greedy_matches_teacher_forced_loop(model_and_params, rng):
    model, params = model_and_params
    mel = jnp.asarray(rng.randn(2, 80, 60).astype(np.float32) * 0.3)
    max_len = 12
    gen, lengths = greedy_generate(
        model, params, mel, max_len=max_len, prompt=PROMPT, eot_id=EOT
    )
    ref = _reference_greedy(model, params, np.asarray(mel), max_len)
    ref_gen = ref[:, len(PROMPT) :]
    gen = np.asarray(gen)
    for b in range(2):
        # compare up to (and including) the first EOT
        n = int(lengths[b])
        assert list(gen[b][:n]) == list(ref_gen[b][:n]), (b, gen[b], ref_gen[b])


def test_generate_stops_at_eot_and_pads(model_and_params, rng):
    model, params = model_and_params
    mel = jnp.asarray(rng.randn(1, 80, 60).astype(np.float32) * 0.3)
    gen, lengths = greedy_generate(
        model, params, mel, max_len=16, prompt=PROMPT, eot_id=EOT
    )
    gen = np.asarray(gen)[0]
    n = int(lengths[0])
    assert n <= gen.shape[0]
    # everything after the first EOT is EOT padding
    if n < gen.shape[0]:
        assert (gen[n:] == EOT).all()


def test_beam_size_one_matches_greedy(model_and_params, rng):
    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import beam_generate

    model, params = model_and_params
    mel = jnp.asarray(rng.randn(2, 80, 60).astype(np.float32) * 0.3)
    g_gen, g_len = greedy_generate(model, params, mel, max_len=12, prompt=PROMPT, eot_id=EOT)
    b_gen, b_len = beam_generate(
        model, params, mel, beam_size=1, max_len=12, prompt=PROMPT, eot_id=EOT
    )
    for b in range(2):
        n = int(g_len[b])
        assert int(b_len[b]) == n
        assert list(np.asarray(b_gen)[b][:n]) == list(np.asarray(g_gen)[b][:n])


def test_beam_score_not_worse_than_greedy(model_and_params, rng):
    """Beam-4's chosen sequence must score >= greedy's under the model."""
    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import beam_generate

    model, params = model_and_params
    mel = jnp.asarray(rng.randn(1, 80, 60).astype(np.float32) * 0.5)

    enc = model.apply({"params": params}, mel, method=model.encode)

    def seq_logprob(gen, n):
        toks = np.concatenate(
            [np.array(PROMPT, np.int32), np.asarray(gen)[0][: int(np.asarray(n)[0])]]
        )
        logits = model.apply(
            {"params": params}, jnp.asarray(toks[None, :]), enc, method=model.decode
        )
        lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
        return sum(
            float(lp[0, pos, toks[pos + 1]])
            for pos in range(len(PROMPT) - 1, len(toks) - 1)
        )

    g_gen, g_len = greedy_generate(model, params, mel, max_len=10, prompt=PROMPT, eot_id=EOT)
    b_gen, b_len = beam_generate(model, params, mel, beam_size=4, max_len=10,
                                 length_penalty=0.0, prompt=PROMPT, eot_id=EOT)
    # length_penalty=0 -> pure sequence-logprob comparison of the emitted
    # prefixes (both sequences here run to the horizon without EOT)
    assert seq_logprob(b_gen, b_len) >= seq_logprob(g_gen, g_len) - 1e-3


def test_temperature_sampling_consumed(model_and_params, rng):
    """DecodeConfig.temperature is consumed: T>0 samples (deterministic for
    a fixed rng, generally different from argmax), T=0 is pure greedy."""
    model, params = model_and_params
    mel = jnp.asarray(rng.randn(2, 80, 60).astype(np.float32) * 0.3)
    g0, _ = greedy_generate(model, params, mel, max_len=12, prompt=PROMPT, eot_id=EOT)
    key = jax.random.PRNGKey(3)
    s1, _ = greedy_generate(model, params, mel, max_len=12, prompt=PROMPT,
                            eot_id=EOT, temperature=2.0, rng=key)
    s2, _ = greedy_generate(model, params, mel, max_len=12, prompt=PROMPT,
                            eot_id=EOT, temperature=2.0, rng=key)
    assert (np.asarray(s1) == np.asarray(s2)).all(), "sampling not deterministic per key"
    # at T=2 on a random model, sampled tokens differ from argmax w.h.p.
    assert (np.asarray(s1) != np.asarray(g0)).any()


def test_generate_strategy_matrix(model_and_params, rng):
    """'beam_device' works for whisper and unknown strategies error loudly."""
    import dataclasses

    from jiao_liao_speech_recognition_tpu.decode.whisper_generate import generate
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.utils.config import (
        DecodeConfig, ExperimentConfig,
    )

    model, params = model_and_params
    cfg = ExperimentConfig(model_family="whisper", whisper=dataclasses.replace(
        CFG, prompt_ids=PROMPT, eot_id=EOT))
    bundle = ModelBundle(config=cfg, params=params, tokenizer=None)
    mel = jnp.asarray(rng.randn(1, 80, 60).astype(np.float32) * 0.3)
    g_b, _ = generate(bundle, mel, DecodeConfig(strategy="beam", beam_size=2))
    g_bd, _ = generate(bundle, mel, DecodeConfig(strategy="beam_device", beam_size=2))
    assert (np.asarray(g_b) == np.asarray(g_bd)).all()
    with pytest.raises(ValueError, match="unknown whisper decode"):
        generate(bundle, mel, DecodeConfig(strategy="banana"))


def test_head_major_cache_layout_matches_packed(model_and_params, rng, monkeypatch):
    """Decode with head-major [B,H,T,dh] caches (batch >= the layout
    threshold) produces identical tokens to the packed [B,T,d] layout."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    model, params = model_and_params
    B, max_len = 4, 12
    mel = jnp.asarray(rng.randn(B, 80, 60).astype(np.float32) * 0.3)

    monkeypatch.setattr(L, "HEAD_MAJOR_MIN_BATCH", 1 << 30)  # force packed
    gen_p, len_p = greedy_generate(
        model, params, mel, max_len=max_len, prompt=PROMPT, eot_id=EOT
    )
    monkeypatch.setattr(L, "HEAD_MAJOR_MIN_BATCH", 1)  # force head-major
    gen_h, len_h = greedy_generate(
        model, params, mel, max_len=max_len, prompt=PROMPT, eot_id=EOT
    )
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_h))
    np.testing.assert_array_equal(np.asarray(gen_p), np.asarray(gen_h))
