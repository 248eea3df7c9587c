"""Fused transformer-sublayer kernels (ops/fused_mlp.py): LN+MLP+residual
and LN+QKV — parity with the flax module paths + gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiao_liao_speech_recognition_tpu.ops import fused_mlp as fm


def test_erf_gelu_matches_exact_gelu_below_bf16_ulp():
    """The kernel GELU (erf rational approx, Mosaic can't lower erf) must sit
    orders below one bf16 ulp from jax.nn.gelu(approximate=False) — the
    module-path form — so the fused TPU path and the CPU module path agree
    at text level (bench.py --parity proves that end-to-end on chip)."""
    x = jnp.asarray(np.linspace(-12.0, 12.0, 100001, dtype=np.float32))
    got = fm._erf_gelu_f32(x)
    want = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-6
    # After bf16 rounding the two forms agree except for inputs whose f32
    # value lands within ~1.5e-7 of a bf16 rounding boundary (one-ulp flips;
    # <1% of a dense grid — unavoidable for ANY erf differing at 1e-7 from
    # XLA's). Assert the flip rate stays in that regime; end-to-end TEXT
    # parity TPU-fused vs CPU-module is proven on-chip by bench.py --parity.
    core = np.asarray(jnp.abs(x) <= 4.0)
    gb = np.asarray(got.astype(jnp.bfloat16), np.float32)[core]
    wb = np.asarray(want.astype(jnp.bfloat16), np.float32)[core]
    flips = gb != wb
    assert flips.mean() < 0.01, f"bf16 flip rate {flips.mean():.4f}"
    if flips.any():
        # every flip is exactly one bf16 ulp
        rel = np.abs(gb[flips] - wb[flips]) / np.maximum(np.abs(wb[flips]), 1e-30)
        assert float(rel.max()) <= 1.0 / 128.0


def test_tanh_gelu_matches_jax_tanh_gelu():
    """The flagship family's kernel GELU (_tanh_gelu_f32) and module-path
    GELU (jax.nn.gelu(approximate=True)) are the SAME tanh form — agreement
    to f32 rounding of the formula (jax.nn.gelu orders the ops slightly
    differently, ~1e-6), so fused-vs-module numerics for the flagship
    differ only at bf16 rounding boundaries — the same <1% one-ulp-flip
    regime as the erf test above; end-to-end TEXT parity is proven on-chip
    by bench.py's parity section every round."""
    x = jnp.asarray(np.linspace(-12.0, 12.0, 100001, dtype=np.float32))
    got = fm._tanh_gelu_f32(x)
    want = jax.nn.gelu(x, approximate=True)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5
    gb = np.asarray(got.astype(jnp.bfloat16), np.float32)
    wb = np.asarray(want.astype(jnp.bfloat16), np.float32)
    flips = gb != wb
    assert flips.mean() < 0.01, f"bf16 flip rate {flips.mean():.4f}"
    if flips.any():
        rel = np.abs(gb[flips] - wb[flips]) / np.maximum(np.abs(wb[flips]), 1e-30)
        assert float(rel.max()) <= 1.0 / 128.0


def test_gelu_form_dispatch_and_validation():
    x = jnp.asarray(np.linspace(-3.0, 3.0, 257, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(fm._gelu_f32(x, "tanh")), np.asarray(fm._tanh_gelu_f32(x))
    )
    np.testing.assert_array_equal(
        np.asarray(fm._gelu_f32(x, "erf")), np.asarray(fm._erf_gelu_f32(x))
    )
    with pytest.raises(ValueError, match="gelu_form"):
        fm._gelu_f32(x, "relu")


def test_fused_ln_mlp_tanh_form_matches_tanh_reference():
    """gelu_form='tanh' (flagship default) end to end: kernel vs the XLA
    twin computing the same tanh GELU."""
    x, g, bl, w1, b1, w2, b2 = _mlp_inputs(seed=12)
    got = fm._fused_ln_mlp_fwd_impl.__wrapped__(
        x, g, bl, w1, b1, w2, b2, 1e-5, "tanh"
    )
    want = fm._ln_mlp_reference(x, g, bl, w1, b1, w2, b2, 1e-5, "tanh")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    # and the two forms genuinely differ (the knob is live)
    erf = fm._fused_ln_mlp_fwd_impl.__wrapped__(
        x, g, bl, w1, b1, w2, b2, 1e-5, "erf"
    )
    assert np.any(np.asarray(got, np.float32) != np.asarray(erf, np.float32))


def _mlp_inputs(B=2, T=96, d=128, mlp=256, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    bl = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    w1 = jnp.asarray(rng.randn(d, mlp).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(mlp).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(mlp, d).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.05)
    return x, g, bl, w1, b1, w2, b2


def _grad_compare(g_fused, g_ref):
    """bf16 forward rounding differences propagate into dL/dy = 2y, so
    compare direction + scale, not elementwise bits."""
    for gf, gr in zip(g_fused, g_ref):
        gf, gr = np.asarray(gf, np.float64), np.asarray(gr, np.float64)
        cos = float(
            (gf * gr).sum() / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-12)
        )
        assert cos > 0.999, cos
        np.testing.assert_allclose(
            np.linalg.norm(gf), np.linalg.norm(gr), rtol=2e-2
        )


def test_fused_ln_mlp_residual_matches_flax_block_numerics():
    """Kernel vs an explicit flax-style LN -> MLP -> residual chain."""
    import flax.linen as nn

    x, g, bl, w1, b1, w2, b2 = _mlp_inputs(seed=5)
    got = fm.fused_ln_mlp_residual(x, g, bl, w1, b1, w2, b2)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    h = ln.apply({"params": {"scale": g, "bias": bl}}, x)
    want = x + fm._mlp_reference(h, w1, b1, w2, b2)
    assert got.shape == want.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_csplit_mlp_matches_reference():
    """Hidden-chunk-split kernel (wide-MLP shapes, e.g. large-v3 5120):
    chunk accumulation in f32 scratch must match the whole-MLP reference."""
    x, g, bl, w1, b1, w2, b2 = _mlp_inputs(B=2, T=96, d=128, mlp=1024, seed=9)
    got = fm._fused_ln_mlp_csplit_impl(x, g, bl, w1, b1, w2, b2, 1e-5)
    want = fm._ln_mlp_reference(x, g, bl, w1, b1, w2, b2, 1e-5)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_csplit_dispatch_when_whole_mlp_too_wide(monkeypatch):
    """When the resident whole-MLP weights exceed VMEM but the chunk split
    fits, the entry point must route to the csplit kernel, not XLA."""
    x, g, bl, w1, b1, w2, b2 = _mlp_inputs(B=1, T=64, d=128, mlp=1024, seed=10)
    assert fm.mlp_csplit_fits_vmem(128, 1024)
    monkeypatch.setattr(fm, "mlp_fits_vmem", lambda d, m: False)
    got = fm._fused_ln_mlp_fwd_impl.__wrapped__(x, g, bl, w1, b1, w2, b2, 1e-5)
    want = fm._fused_ln_mlp_csplit_impl(x, g, bl, w1, b1, w2, b2, 1e-5)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_fused_ln_mlp_vmem_fallback(monkeypatch):
    monkeypatch.setattr(fm, "_VMEM_BUDGET_BYTES", 0)
    x, g, bl, w1, b1, w2, b2 = _mlp_inputs(seed=1)
    got = fm._fused_ln_mlp_fwd_impl.__wrapped__(x, g, bl, w1, b1, w2, b2, 1e-5)
    want = fm._ln_mlp_reference(x, g, bl, w1, b1, w2, b2, 1e-5)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_fused_ln_mlp_residual_gradients_match_reference():
    x, g, bl, w1, b1, w2, b2 = _mlp_inputs(T=64, seed=6)

    def loss_fused(g, bl, w1, b1, w2, b2):
        return jnp.sum(
            fm.fused_ln_mlp_residual(x, g, bl, w1, b1, w2, b2).astype(jnp.float32)
            ** 2
        )

    def loss_ref(g, bl, w1, b1, w2, b2):
        return jnp.sum(
            fm._ln_mlp_reference(x, g, bl, w1, b1, w2, b2, 1e-5).astype(jnp.float32)
            ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(g, bl, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(g, bl, w1, b1, w2, b2)
    _grad_compare(g_fused, g_ref)


def _qkv_inputs(B=2, T=96, d=128, D=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    bl = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    wq = jnp.asarray(rng.randn(d, D).astype(np.float32) * 0.05)
    bq = jnp.asarray(rng.randn(D).astype(np.float32) * 0.05)
    wk = jnp.asarray(rng.randn(d, D).astype(np.float32) * 0.05)
    wv = jnp.asarray(rng.randn(d, D).astype(np.float32) * 0.05)
    bv = jnp.asarray(rng.randn(D).astype(np.float32) * 0.05)
    return x, g, bl, wq, bq, wk, wv, bv


def test_fused_ln_qkv_matches_reference():
    args = _qkv_inputs(seed=7)
    got = fm.fused_ln_qkv(*args)
    want = fm._ln_qkv_reference(*args, 1e-5)
    for got_i, want_i in zip(got, want):
        assert got_i.shape == want_i.shape
        np.testing.assert_allclose(
            np.asarray(got_i, np.float32), np.asarray(want_i, np.float32),
            atol=3e-2, rtol=3e-2,
        )


def test_fused_ln_qkv_vmem_fallback(monkeypatch):
    monkeypatch.setattr(fm, "_VMEM_BUDGET_BYTES", 0)
    args = _qkv_inputs(seed=8)
    got = fm._fused_ln_qkv_fwd_impl.__wrapped__(*args, 1e-5)
    want = fm._ln_qkv_reference(*args, 1e-5)
    for got_i, want_i in zip(got, want):
        np.testing.assert_array_equal(
            np.asarray(got_i, np.float32), np.asarray(want_i, np.float32)
        )


def test_fused_ln_qkv_gradients_match_reference():
    x, g, bl, wq, bq, wk, wv, bv = _qkv_inputs(T=64, seed=9)

    def loss(fn):
        def inner(g, bl, wq, bq, wk, wv, bv):
            q, k, v = fn(x, g, bl, wq, bq, wk, wv, bv)
            return jnp.sum(
                q.astype(jnp.float32) ** 2
                + k.astype(jnp.float32) ** 2
                + v.astype(jnp.float32) ** 2
            )

        return inner

    g_fused = jax.grad(loss(fm.fused_ln_qkv), argnums=tuple(range(7)))(
        g, bl, wq, bq, wk, wv, bv
    )
    g_ref = jax.grad(
        loss(lambda *a: fm._ln_qkv_reference(*a, 1e-5)), argnums=tuple(range(7))
    )(g, bl, wq, bq, wk, wv, bv)
    _grad_compare(g_fused, g_ref)


def test_transformer_block_fused_sublayers_parity_when_forced(monkeypatch):
    """Force BOTH TransformerBlock fused sublayer paths (LN+QKV+flash+out
    and LN+MLP+residual) on CPU (interpret kernels) and check the block
    output matches the standard module path. d_model == num_heads * 128 so
    the attention fast path's head-dim gate passes."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    B, T, d, H, mlp_dim = 2, 80, 256, 2, 512
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    lens = jnp.asarray([T, 60], jnp.int32)
    mask = L.length_mask(lens, T)

    blk = L.TransformerBlock(d, H, mlp_dim, jnp.bfloat16, 0.0, None, use_flash=True)
    params = blk.init(jax.random.PRNGKey(0), x, mask=mask)["params"]
    want = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)

    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    got = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_transformer_block_fused_sublayers_parity_dh64(monkeypatch):
    """Same forced-path block parity at dh=64 (whisper-tiny/large-v3 head
    shape): attention routes through the head-group-split kernel."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    B, T, d, H, mlp_dim = 2, 80, 256, 4, 512
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    lens = jnp.asarray([T, 60], jnp.int32)
    mask = L.length_mask(lens, T)

    blk = L.TransformerBlock(d, H, mlp_dim, jnp.bfloat16, 0.0, None, use_flash=True)
    params = blk.init(jax.random.PRNGKey(0), x, mask=mask)["params"]
    want = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)

    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    got = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_transformer_block_fused_path_not_used_in_training(monkeypatch):
    """deterministic=False (training) must take the module path even when
    the TPU gate is forced on: gradients flow through the standard flax
    modules and dropout stays live."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    B, T, d, H, mlp_dim = 2, 80, 256, 2, 512
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    mask = L.length_mask(jnp.asarray([T, T], jnp.int32), T)

    blk = L.TransformerBlock(d, H, mlp_dim, jnp.bfloat16, 0.0, None, use_flash=False)
    params = blk.init(jax.random.PRNGKey(0), x, mask=mask)["params"]
    want = blk.apply(
        {"params": params}, x, mask=mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    got = blk.apply(
        {"params": params}, x, mask=mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
