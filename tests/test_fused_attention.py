"""Fused self-attention sublayer kernels (ops/fused_attention.py):
parity with the module-path numerics + gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiao_liao_speech_recognition_tpu.ops import fused_attention as fa


def _inputs(B=2, T=96, d=128, D=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    bl = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    wq = jnp.asarray(rng.randn(d, D).astype(np.float32) * 0.05)
    bq = jnp.asarray(rng.randn(D).astype(np.float32) * 0.05)
    wk = jnp.asarray(rng.randn(d, D).astype(np.float32) * 0.05)
    wv = jnp.asarray(rng.randn(d, D).astype(np.float32) * 0.05)
    bv = jnp.asarray(rng.randn(D).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.randn(D, d).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(d).astype(np.float32) * 0.05)
    lens = jnp.asarray([T, max(T // 2, 1)][:B] + [T] * max(0, B - 2), jnp.int32)
    return x, g, bl, wq, bq, wk, wv, bv, wo, bo, lens


def test_fused_attention_sublayer_matches_reference():
    args = _inputs(seed=1)
    got = fa.fused_attention_sublayer(*args, num_heads=1)
    want = fa._attn_sublayer_reference(*args, num_heads=1, eps=1e-5)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_attention_sublayer_multihead():
    # D = 2 * 128 heads, ragged lengths
    args = _inputs(B=3, T=80, d=256, D=256, seed=2)
    got = fa.fused_attention_sublayer(*args, num_heads=2)
    want = fa._attn_sublayer_reference(*args, num_heads=2, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_hsplit_matches_reference_dh64():
    """dh=64 heads (the whisper-large-v3 shape class) route through the
    head-group-split kernel: 2 heads packed per 128-lane group, out
    projection accumulated across group steps in f32 scratch."""
    args = _inputs(B=2, T=80, d=256, D=256, seed=4)
    got = fa._fused_attn_hsplit_impl(*args, num_heads=4, eps=1e-5)
    want = fa._attn_sublayer_reference(*args, num_heads=4, eps=1e-5)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_hsplit_dispatch_from_entry_point():
    """fused_attention_sublayer itself must route dh=64 shapes to the
    hsplit kernel (not the XLA reference): monkeypatch-free check via the
    support predicates + end-to-end value parity."""
    args = _inputs(B=2, T=80, d=256, D=256, seed=5)
    assert fa.attn_hsplit_supported(256, 4)
    assert fa.attn_hsplit_fits_vmem(256, 256, 80)
    got = fa.fused_attention_sublayer(*args, num_heads=4)
    want = fa._attn_sublayer_reference(*args, num_heads=4, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_hsplit_multiple_groups_ragged_lengths():
    """4 head groups (D=512, dh=64) with ragged kv lengths: the group-step
    accumulation must respect per-example masking identically."""
    args = _inputs(B=3, T=96, d=128, D=512, seed=6)
    got = fa._fused_attn_hsplit_impl(*args, num_heads=8, eps=1e-5)
    want = fa._attn_sublayer_reference(*args, num_heads=8, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_attention_vmem_fallback(monkeypatch):
    monkeypatch.setattr(fa, "_VMEM_BUDGET_BYTES", 0)
    args = _inputs(seed=3)
    got = fa._fused_attn_fwd_impl.__wrapped__(*args, num_heads=1, eps=1e-5)
    want = fa._attn_sublayer_reference(*args, num_heads=1, eps=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_fused_attention_gradients_match_reference():
    x, g, bl, wq, bq, wk, wv, bv, wo, bo, lens = _inputs(T=64, seed=4)

    def loss(fn):
        def inner(g, bl, wq, bq, wk, wv, bv, wo, bo):
            y = fn(x, g, bl, wq, bq, wk, wv, bv, wo, bo)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return inner

    fused = lambda *a: fa.fused_attention_sublayer(*a, lens, num_heads=1)
    ref = lambda *a: fa._attn_sublayer_reference(*a, lens, num_heads=1, eps=1e-5)
    g_fused = jax.grad(loss(fused), argnums=tuple(range(9)))(
        g, bl, wq, bq, wk, wv, bv, wo, bo
    )
    g_ref = jax.grad(loss(ref), argnums=tuple(range(9)))(
        g, bl, wq, bq, wk, wv, bv, wo, bo
    )
    for gf, gr in zip(g_fused, g_ref):
        gf, gr = np.asarray(gf, np.float64), np.asarray(gr, np.float64)
        cos = float(
            (gf * gr).sum() / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-12)
        )
        assert cos > 0.999, cos
        np.testing.assert_allclose(
            np.linalg.norm(gf), np.linalg.norm(gr), rtol=2e-2
        )


def test_transformer_block_uses_sublayer_kernel_when_forced(monkeypatch):
    """The TransformerBlock fast path routes through
    fused_attention_sublayer (not the flash fallback) for short sequences,
    and matches the module path."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    calls = {"n": 0}
    real = fa.fused_attention_sublayer

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    B, T, d, H, mlp_dim = 2, 80, 256, 2, 512
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    lens = jnp.asarray([T, 60], jnp.int32)
    mask = L.length_mask(lens, T)
    blk = L.TransformerBlock(d, H, mlp_dim, jnp.bfloat16, 0.0, None, use_flash=True)
    params = blk.init(jax.random.PRNGKey(0), x, mask=mask)["params"]
    want = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)

    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    monkeypatch.setattr(fa, "fused_attention_sublayer", spy)
    got = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    assert calls["n"] == 1
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
