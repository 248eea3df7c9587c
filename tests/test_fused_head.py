"""Fused head+argmax kernel (ops/fused_head.py) parity with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiao_liao_speech_recognition_tpu.ops import fused_head
from jiao_liao_speech_recognition_tpu.ops.fused_head import fused_head_argmax


def _xla_argmax(x, kernel, bias):
    logits = jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        kernel.astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@pytest.mark.parametrize("B,T,d,V", [(2, 64, 128, 97), (1, 300, 256, 513)])
def test_fused_head_argmax_matches_xla(B, T, d, V):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32))
    kernel = jnp.asarray(rng.randn(d, V).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1)
    got = fused_head_argmax(x, kernel, bias)
    want = _xla_argmax(x, kernel, bias)
    assert got.shape == (B, T)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_head_vmem_fallback(monkeypatch):
    monkeypatch.setattr(fused_head, "_VMEM_BUDGET_BYTES", 0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 64).astype(np.float32))
    kernel = jnp.asarray(rng.randn(64, 50).astype(np.float32))
    bias = jnp.zeros((50,), jnp.float32)
    got = fused_head.fused_head_argmax.__wrapped__(x, kernel, bias)
    want = _xla_argmax(x, kernel, bias)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_model_argmax_ids_matches_log_probs_argmax():
    from jiao_liao_speech_recognition_tpu.models.ctc_model import CTCEncoderModel
    from jiao_liao_speech_recognition_tpu.utils.config import CTCModelConfig

    cfg = CTCModelConfig(
        vocab_size=89, d_model=128, num_layers=2, num_heads=4, mlp_dim=256,
        conv_channels=64, use_flash_attention=False, num_mels=80,
    )
    model = CTCEncoderModel(cfg)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 80, 160).astype(np.float32))
    lens = jnp.asarray([160, 120], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
    log_probs, out_lens = model.apply(
        {"params": params}, feats, lens, deterministic=True
    )
    ids, out_lens2 = model.apply(
        {"params": params}, feats, lens, deterministic=True, head_mode="argmax_ids"
    )
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(out_lens2))
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(jnp.argmax(log_probs, axis=-1), dtype=np.int32)
    )


def test_bundle_greedy_fast_path_matches_slow_path():
    """transcribe(greedy) through the fused path == decode over log_probs."""
    from jiao_liao_speech_recognition_tpu.decode.ctc import ctc_greedy_decode
    from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
    from jiao_liao_speech_recognition_tpu.utils.config import (
        CTCModelConfig,
        ExperimentConfig,
        FrontendConfig,
    )
    from jiao_liao_speech_recognition_tpu.data.tokenizer import CharTokenizer
    from jiao_liao_speech_recognition_tpu.decode.ctc import ids_to_texts

    tok = CharTokenizer.build(["你好世界这是测试"])
    config = ExperimentConfig(
        model_family="ctc",
        ctc_model=CTCModelConfig(
            vocab_size=len(tok), d_model=64, num_layers=1, num_heads=2,
            mlp_dim=128, conv_channels=32, use_flash_attention=False,
        ),
        frontend=FrontendConfig(chunk_seconds=2.0),
    )
    bundle = ModelBundle.load(config=config, tokenizer=tok)
    rng = np.random.RandomState(3)
    wav = rng.randn(2, 32000).astype(np.float32) * 0.1
    texts_fast = bundle.transcribe(wav)

    from jiao_liao_speech_recognition_tpu.frontend import features

    feats = features.featurize_batch(jnp.asarray(wav), config.frontend)
    flens = jnp.full((2,), 32000 // config.frontend.hop_length, jnp.int32)
    log_probs, out_lens = bundle.encode(feats, flens)
    ids, lens = ctc_greedy_decode(log_probs, out_lens)
    texts_slow = ids_to_texts(np.asarray(ids), np.asarray(lens), tok)
    assert texts_fast == texts_slow
