"""On-chip tier (r3 verdict item 7): real-TPU Mosaic lowering parity for
every fused Pallas kernel vs its XLA reference twin, ON THE CHIP.

The default suite pins CPU (interpret-mode kernels), so a Mosaic/XLA
regression in a kernel's TPU lowering used to surface only as a bench-day
surprise. This tier runs the actual lowered kernels:

    JL_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Shapes are kept small (one or two tiles) so each compile is seconds; the
persistent TPU compile cache (/tmp/jl_xla_cache) makes warm reruns fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("real TPU backend required (JL_TPU_TESTS=1)")


def _rand(rng, *shape, scale=0.3):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)


def test_fused_attention_sublayer_lowering():
    """Whole-D attention sublayer kernel (dh=128) vs the XLA reference."""
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_attention as fa

    rng = np.random.RandomState(0)
    B, T, d, H = 2, 300, 256, 2
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    wq, wk, wv, wo = (_rand(rng, d, d, scale=0.05) for _ in range(4))
    bq, bv, bo = (_rand(rng, d, scale=0.02) for _ in range(3))
    lens = jnp.asarray([T, 200], jnp.int32)
    got = fa.fused_attention_sublayer(
        x, g, bl, wq, bq, wk, wv, bv, wo, bo, lens, H
    )
    want = fa._attn_sublayer_reference(
        x, g, bl, wq, bq, wk, wv, bv, wo, bo, lens, H, 1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_attention_hsplit_lowering():
    """Head-group-split kernel (dh=64, large-v3 head shape) on chip."""
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_attention as fa

    rng = np.random.RandomState(1)
    B, T, d, H = 2, 300, 256, 4  # dh = 64 -> hsplit path
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    wq, wk, wv, wo = (_rand(rng, d, d, scale=0.05) for _ in range(4))
    bq, bv, bo = (_rand(rng, d, scale=0.02) for _ in range(3))
    lens = jnp.asarray([256, T], jnp.int32)
    got = fa._fused_attn_hsplit_impl(
        x, g, bl, wq, bq, wk, wv, bv, wo, bo, lens, H, 1e-5
    )
    want = fa._attn_sublayer_reference(
        x, g, bl, wq, bq, wk, wv, bv, wo, bo, lens, H, 1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize("gelu_form", ["tanh", "erf"])
def test_fused_ln_mlp_lowering(gelu_form):
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_mlp as fm

    rng = np.random.RandomState(2)
    B, T, d, mlp = 2, 300, 256, 512
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    w1, w2 = _rand(rng, d, mlp, scale=0.05), _rand(rng, mlp, d, scale=0.05)
    b1, b2 = _rand(rng, mlp, scale=0.02), _rand(rng, d, scale=0.02)
    got = fm.fused_ln_mlp_residual(x, g, bl, w1, b1, w2, b2, 1e-5, gelu_form)
    want = fm._ln_mlp_reference(x, g, bl, w1, b1, w2, b2, 1e-5, gelu_form)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_ln_mlp_csplit_lowering():
    """Hidden-chunk-split MLP kernel (wide-MLP shapes) on chip."""
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_mlp as fm

    rng = np.random.RandomState(3)
    B, T, d, mlp = 1, 260, 256, 1024
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    w1, w2 = _rand(rng, d, mlp, scale=0.05), _rand(rng, mlp, d, scale=0.05)
    b1, b2 = _rand(rng, mlp, scale=0.02), _rand(rng, d, scale=0.02)
    got = fm._fused_ln_mlp_csplit_impl(x, g, bl, w1, b1, w2, b2, 1e-5, "tanh")
    want = fm._ln_mlp_reference(x, g, bl, w1, b1, w2, b2, 1e-5, "tanh")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_ln_qkv_lowering():
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_mlp as fm

    rng = np.random.RandomState(4)
    B, T, d = 2, 300, 256
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    wq, wk, wv = (_rand(rng, d, d, scale=0.05) for _ in range(3))
    bq, bv = _rand(rng, d, scale=0.02), _rand(rng, d, scale=0.02)
    got = fm.fused_ln_qkv(x, g, bl, wq, bq, wk, wv, bv)
    want = fm._ln_qkv_reference(x, g, bl, wq, bq, wk, wv, bv, 1e-5)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-2, rtol=3e-2,
        )


def test_flash_attention_packed_lowering():
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import flash_attention as fl

    rng = np.random.RandomState(5)
    B, T, H, dh = 2, 300, 2, 128
    q = _rand(rng, B, T, H * dh).astype(jnp.bfloat16)
    k = _rand(rng, B, T, H * dh).astype(jnp.bfloat16)
    v = _rand(rng, B, T, H * dh).astype(jnp.bfloat16)
    lens = jnp.asarray([T, 250], jnp.int32)
    got = fl.flash_attention_packed(q, k, v, H, kv_lengths=lens)
    want = fl._reference_attention(
        q.reshape(B, T, H, dh), k.reshape(B, T, H, dh),
        v.reshape(B, T, H, dh), lens, False,
    ).reshape(B, T, H * dh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_head_argmax_lowering():
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_head as fh

    rng = np.random.RandomState(6)
    B, T, d, V = 8, 250, 256, 1333  # ragged V exercises the pad+(-1e30) bias
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    w = _rand(rng, d, V, scale=0.05)
    b = _rand(rng, V, scale=0.02)
    got = np.asarray(fh.fused_head_argmax(x, w, b))
    logits = (
        jnp.einsum(
            "btd,dv->btv", x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + b.astype(jnp.float32)
    )
    want = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
    mismatch = (got != want).mean()
    assert mismatch < 0.01, f"{mismatch:.4f} of argmax ids differ on chip"


def test_grouped_decode_attention_lowering():
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops.decode_attention import (
        grouped_decode_attention,
    )

    rng = np.random.RandomState(7)
    B, H, Tk, dh = 4, 4, 256, 128
    q = _rand(rng, B, H, 1, dh).astype(jnp.bfloat16)
    k = _rand(rng, B, H, Tk, dh).astype(jnp.bfloat16)
    v = _rand(rng, B, H, Tk, dh).astype(jnp.bfloat16)
    lens = jnp.asarray([Tk, 100, 17, 256], jnp.int32)
    got = grouped_decode_attention(q, k, v, lens)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(dh)
    mask = jnp.arange(Tk)[None, None, None, :] < lens[:, None, None, None]
    s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    want = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_int8_decode_attention_lowering(monkeypatch):
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops.quant import (
        int8_decode_attention,
        quantize_kv,
    )
    from jiao_liao_speech_recognition_tpu.models import layers as L

    rng = np.random.RandomState(8)
    B, H, Tk, dh = 2, 4, 256, 64
    q = _rand(rng, B, H, 1, dh)
    kq, ks = quantize_kv(rng.randn(B, H, Tk, dh).astype(np.float32))
    vq, vs = quantize_kv(rng.randn(B, H, Tk, dh).astype(np.float32))
    lens = jnp.asarray([Tk, 120], jnp.int32)
    got = int8_decode_attention(q, kq, ks, vq, vs, lens)
    # exact mul-reduce reference (the off-TPU branch), computed on chip
    monkeypatch.setattr(L, "_on_tpu", lambda: False)
    want = L._int8_cross_attention(q, kq, ks, vq, vs, lens, None, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_int8_matmul_lowering():
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops.quant import (
        int8_matmul,
        quantize_int8,
    )

    rng = np.random.RandomState(9)
    B, T, d, out = 2, 256, 256, 512
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    w = rng.randn(d, out).astype(np.float32) * 0.05
    wq, scale = quantize_int8(w)
    got = int8_matmul(x, wq, scale)
    wd = jnp.asarray(np.asarray(wq, np.float32) * np.asarray(scale))
    want = jnp.einsum(
        "btd,dv->btv", x, wd.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_pallas_frontend_lowering(tiny_wav):
    """Fused Pallas log-mel frontend vs the jnp/XLA reference path on chip."""
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.frontend.features import (
        log_mel_spectrogram,
    )
    from jiao_liao_speech_recognition_tpu.frontend.pallas_frontend import (
        fused_log_mel,
    )
    from jiao_liao_speech_recognition_tpu.utils.config import FrontendConfig

    fe = FrontendConfig(chunk_seconds=1.3)
    wav = jnp.asarray(np.stack([tiny_wav, tiny_wav * 0.5]))
    got = fused_log_mel(wav, fe)
    want = log_mel_spectrogram(wav, fe)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-3, rtol=2e-3,
    )


def test_fused_wf_attention_lowering():
    """WF-folded attention sublayer wrapper on the real chip vs the
    factored XLA reference."""
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_attention as fa

    rng = np.random.RandomState(10)
    B, T, d, H, r = 2, 300, 256, 2, 8
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    base = {
        k: _rand(rng, *s, scale=0.05)
        for k, s in (
            ("wq", (d, d)), ("bq", (d,)), ("wk", (d, d)), ("wv", (d, d)),
            ("bv", (d,)), ("wo", (d, d)), ("bo", (d,)),
        )
    }
    wf = {
        n: {
            "a": _rand(rng, d, r, scale=0.1),
            "g": jnp.ones((r,), jnp.float32),
            "b": _rand(rng, r, d, scale=0.1),
        }
        for n in ("q", "k", "v", "o")
    }
    lens = jnp.asarray([T, 222], jnp.int32)
    got = fa.fused_attention_sublayer_wf(x, g, bl, base, wf, H, 1e-5, 1.0, lens)
    want = fa._attn_sublayer_reference_wf(x, g, bl, base, wf, lens, H, 1e-5, 1.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_wf_mlp_lowering():
    _require_tpu()
    from jiao_liao_speech_recognition_tpu.ops import fused_mlp as fm

    rng = np.random.RandomState(11)
    B, T, d, mlp, r = 2, 300, 256, 512, 8
    x = _rand(rng, B, T, d).astype(jnp.bfloat16)
    g, bl = _rand(rng, d, scale=1.0) + 1.0, _rand(rng, d, scale=0.1)
    w1, w2 = _rand(rng, d, mlp, scale=0.05), _rand(rng, mlp, d, scale=0.05)
    b1, b2 = _rand(rng, mlp, scale=0.02), _rand(rng, d, scale=0.02)
    wf1 = {"a": _rand(rng, d, r, scale=0.1), "g": jnp.ones((r,), jnp.float32),
           "b": _rand(rng, r, mlp, scale=0.1)}
    wf2 = {"a": _rand(rng, mlp, r, scale=0.1), "g": jnp.ones((r,), jnp.float32),
           "b": _rand(rng, r, d, scale=0.1)}
    got = fm.fused_ln_mlp_residual_wf(
        x, g, bl, w1, b1, w2, b2, wf1, wf2, 1e-5, "tanh", 1.0
    )
    want = fm._ln_mlp_reference_wf(
        x, g, bl, w1, b1, w2, b2, wf1, wf2, 1e-5, "tanh", 1.0
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_flash_backward_lowering():
    """Pallas flash BACKWARD (dQ/dK/dV kernels) on the real chip vs the
    XLA einsum reference gradient — guards the Mosaic lowering of the
    lse-residual custom_vjp (interpret-mode parity lives in
    tests/test_flash_attention.py)."""
    _require_tpu()
    import jax

    from jiao_liao_speech_recognition_tpu.ops import flash_attention as fl

    rng = np.random.RandomState(11)
    B, T, H, dh = 2, 600, 2, 64
    q = _rand(rng, B, T, H, dh)
    k = _rand(rng, B, T, H, dh)
    v = _rand(rng, B, T, H, dh)
    lens = jnp.asarray([T, 511], jnp.int32)
    w = jnp.asarray(np.random.RandomState(12).randn(B, T, H, dh), jnp.float32)

    for causal in (False, True):
        def f_flash(q, k, v):
            return jnp.sum(
                fl.flash_attention(q, k, v, kv_lengths=lens, causal=causal) * w
            )

        def f_ref(q, k, v):
            return jnp.sum(fl._reference_attention(q, k, v, lens, causal) * w)

        gf = jax.jit(jax.grad(f_flash, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=3e-2, rtol=3e-2,
            )


def test_flash_train_gate_threshold():
    """The flash_train_min_q config knob controls whether TRAINING
    (deterministic=False) attention lowers to the Pallas flash kernel:
    Tq >= threshold -> Mosaic custom_call in the HLO, Tq < threshold ->
    pure-XLA einsum backward (saved softmax intermediates). Pins the
    r4 crossover gate (models/layers.py use_flash_here)."""
    _require_tpu()
    import flax.linen as nn

    from jiao_liao_speech_recognition_tpu.models.layers import (
        MultiHeadAttention,
    )

    d, H = 256, 2  # dh=128: packed fast path
    rng = np.random.RandomState(3)

    def lowered_text(T, min_q):
        mha = MultiHeadAttention(
            num_heads=H, d_model=d, dropout=0.1, use_flash=True,
            flash_train_min_q=min_q,
        )
        x = _rand(rng, 2, T, d).astype(jnp.bfloat16)
        params = mha.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, deterministic=False,
        )

        def step(p, x):
            out = mha.apply(
                p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(out.astype(jnp.float32))

        g = jax.grad(step, argnums=1)
        return jax.jit(g).lower(params, x).as_text()

    # above threshold: flash (Mosaic kernel) in fwd AND Pallas backward
    assert "tpu_custom_call" in lowered_text(256, min_q=128)
    # below threshold: einsum path, no Pallas anywhere in the train step
    assert "tpu_custom_call" not in lowered_text(256, min_q=512)
