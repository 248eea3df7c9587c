"""WF-adapter fused sublayer kernels (r4): forward parity vs the module
path, engagement checks, and grad parity of the custom_vjp backward vs the
factored flax modules.

Rationale (ops/fused_attention.fused_attention_sublayer_wf): WF-adapted
models previously always took the module path — the fused kernels read raw
dense weights. The _wf wrappers fold W + scale*A diag(g) B in XLA (skinny
matmuls, once per dispatch) and run the unchanged kernels; the backward
differentiates the FACTORED reference, so dA/dg/dB stay cheap and frozen-W
cotangents stay DCE-able dead code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jiao_liao_speech_recognition_tpu.models import layers as L
from jiao_liao_speech_recognition_tpu.ops import fused_attention as fa
from jiao_liao_speech_recognition_tpu.ops import fused_mlp as fm
from jiao_liao_speech_recognition_tpu.utils.config import AdapterConfig


def _block(d, H, mlp_dim):
    return L.TransformerBlock(
        d, H, mlp_dim, jnp.bfloat16, 0.0,
        AdapterConfig(kind="wf", wf_rank=4), use_flash=True,
    )


def _setup(seed, d=256, H=2, mlp_dim=512, B=2, T=80):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    lens = jnp.asarray([T, T - 16], jnp.int32)
    mask = L.length_mask(lens, T)
    blk = _block(d, H, mlp_dim)
    params = blk.init(jax.random.PRNGKey(seed), x, mask=mask)["params"]
    # perturb the zero-init WF 'b' factors so the inserts are live
    def bump(p):
        p = jax.tree_util.tree_map(lambda a: a, p)  # copy structure
        return p
    params = jax.tree_util.tree_map_with_path(
        lambda kp, a: (
            a + 0.05 * jnp.asarray(
                np.random.RandomState(len(kp)).randn(*a.shape), a.dtype
            )
            if any(getattr(k, "key", None) == "adapter_wf" for k in kp)
            else a
        ),
        params,
    )
    return blk, params, x, mask, lens


def test_wf_block_fused_parity_and_engagement(monkeypatch):
    """Forced-on fused path (interpret kernels on CPU) == module path for a
    WF-adapted block, and BOTH _wf wrappers actually engage."""
    blk, params, x, mask, lens = _setup(0)
    want = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)

    calls = {"attn": 0, "mlp": 0}
    real_attn = fa.fused_attention_sublayer_wf
    real_mlp = fm.fused_ln_mlp_residual_wf

    def spy_attn(*a, **k):
        calls["attn"] += 1
        return real_attn(*a, **k)

    def spy_mlp(*a, **k):
        calls["mlp"] += 1
        return real_mlp(*a, **k)

    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    monkeypatch.setattr(fa, "fused_attention_sublayer_wf", spy_attn)
    monkeypatch.setattr(fm, "fused_ln_mlp_residual_wf", spy_mlp)
    got = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    assert calls == {"attn": 1, "mlp": 1}
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_wf_block_fused_parity_dh64(monkeypatch):
    """dh=64 routes the WF attention through the head-group-split kernel."""
    blk, params, x, mask, lens = _setup(1, d=256, H=4)
    want = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    got = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_zero_init_wf_insert_is_exact_identity(monkeypatch):
    """Fresh (zero-B) WF adapters: the folded weights equal the raw weights
    bit-for-bit, so fused-WF == fused-plain exactly."""
    blk, params, x, mask, lens = _setup(2)
    # un-bump: restore zero 'b' factors
    params = jax.tree_util.tree_map_with_path(
        lambda kp, a: (
            jnp.zeros_like(a)
            if (
                any(getattr(k, "key", None) == "adapter_wf" for k in kp)
                and getattr(kp[-1], "key", None) == "b"
            )
            else a
        ),
        params,
    )
    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    got = blk.apply({"params": params}, x, mask=mask, kv_lengths=lens)
    plain = L.TransformerBlock(
        256, 2, 512, jnp.bfloat16, 0.0, None, use_flash=True
    )
    # strip adapter params for the plain block
    import flax

    pp = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)

    def strip(t):
        if isinstance(t, dict):
            return {k: strip(v) for k, v in t.items() if k != "adapter_wf"}
        return t

    want = plain.apply({"params": strip(pp)}, x, mask=mask, kv_lengths=lens)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def _grad_compare(ga, gb, atol=2e-2, rtol=5e-2):
    fa_, _ = jax.tree_util.tree_flatten(ga)
    fb_, _ = jax.tree_util.tree_flatten(gb)
    assert len(fa_) == len(fb_)
    for a, b in zip(fa_, fb_):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=atol, rtol=rtol,
        )


def test_wf_grad_parity_vs_module_path(monkeypatch):
    """d(loss)/d(adapter params) through the forced fused path == through
    the module path: the custom_vjp backward (factored reference) matches
    flax's autodiff of WFDense."""
    blk, params, x, mask, lens = _setup(3)

    def loss(p, fused):
        monkeypatch.setattr(L, "_on_tpu", lambda: fused)
        out = blk.apply({"params": p}, x, mask=mask, kv_lengths=lens)
        return jnp.sum((out.astype(jnp.float32)) ** 2) * 1e-3

    def adapter_grads(fused):
        g = jax.grad(lambda p: loss(p, fused))(params)
        return jax.tree_util.tree_map_with_path(
            lambda kp, a: (
                a
                if any(getattr(k, "key", None) == "adapter_wf" for k in kp)
                else None
            ),
            g,
        )

    _grad_compare(adapter_grads(True), adapter_grads(False))


def test_wf_attention_kernel_grad_parity_direct():
    """Direct custom_vjp check: grads of fused_attention_sublayer_wf wrt
    every input == grads of the factored reference."""
    rng = np.random.RandomState(7)
    B, T, d, H, r = 2, 80, 128, 1, 4
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    bl = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    base = {
        "wq": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "bq": jnp.asarray(rng.randn(d).astype(np.float32) * 0.02),
        "wk": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "wv": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "bv": jnp.asarray(rng.randn(d).astype(np.float32) * 0.02),
        "wo": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "bo": jnp.asarray(rng.randn(d).astype(np.float32) * 0.02),
    }
    wf = {
        n: {
            "a": jnp.asarray(rng.randn(d, r).astype(np.float32) * 0.1),
            "g": jnp.asarray(1.0 + 0.1 * rng.randn(r).astype(np.float32)),
            "b": jnp.asarray(rng.randn(r, d).astype(np.float32) * 0.1),
        }
        for n in ("q", "k", "v", "o")
    }
    lens = jnp.asarray([T, 60], jnp.int32)

    def loss_fused(args):
        x_, base_, wf_ = args
        out = fa.fused_attention_sublayer_wf(
            x_, g, bl, base_, wf_, H, 1e-5, 1.0, lens
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-3

    def loss_ref(args):
        x_, base_, wf_ = args
        out = fa._attn_sublayer_reference_wf(
            x_, g, bl, base_, wf_, lens, H, 1e-5, 1.0
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-3

    ga = jax.grad(loss_fused)((x, base, wf))
    gb = jax.grad(loss_ref)((x, base, wf))
    _grad_compare(ga, gb)


def test_wf_mlp_kernel_grad_parity_direct():
    rng = np.random.RandomState(9)
    B, T, d, mlp, r = 2, 80, 128, 256, 4
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    bl = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    w1 = jnp.asarray(rng.randn(d, mlp).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(mlp).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(mlp, d).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.02)
    wf1 = {
        "a": jnp.asarray(rng.randn(d, r).astype(np.float32) * 0.1),
        "g": jnp.asarray(1.0 + 0.1 * rng.randn(r).astype(np.float32)),
        "b": jnp.asarray(rng.randn(r, mlp).astype(np.float32) * 0.1),
    }
    wf2 = {
        "a": jnp.asarray(rng.randn(mlp, r).astype(np.float32) * 0.1),
        "g": jnp.asarray(1.0 + 0.1 * rng.randn(r).astype(np.float32)),
        "b": jnp.asarray(rng.randn(r, d).astype(np.float32) * 0.1),
    }

    def loss_fused(args):
        wf1_, wf2_ = args
        out = fm.fused_ln_mlp_residual_wf(
            x, g, bl, w1, b1, w2, b2, wf1_, wf2_, 1e-5, "tanh", 1.0
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-3

    def loss_ref(args):
        wf1_, wf2_ = args
        out = fm._ln_mlp_reference_wf(
            x, g, bl, w1, b1, w2, b2, wf1_, wf2_, 1e-5, "tanh", 1.0
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-3

    _grad_compare(
        jax.grad(loss_fused)((wf1, wf2)), jax.grad(loss_ref)((wf1, wf2))
    )


def test_wf_fused_forward_close_to_reference():
    """Folded-weight fused forward vs factored reference forward: equal to
    bf16 rounding of the weights."""
    rng = np.random.RandomState(11)
    B, T, d, H = 2, 80, 128, 1
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    bl = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    base = {
        k: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
        for k, s in (
            ("wq", (d, d)), ("bq", (d,)), ("wk", (d, d)), ("wv", (d, d)),
            ("bv", (d,)), ("wo", (d, d)), ("bo", (d,)),
        )
    }
    wf = {
        n: {
            "a": jnp.asarray(rng.randn(d, 4).astype(np.float32) * 0.1),
            "g": jnp.ones((4,), jnp.float32),
            "b": jnp.asarray(rng.randn(4, d).astype(np.float32) * 0.1),
        }
        for n in ("q", "k", "v", "o")
    }
    lens = jnp.asarray([T, T], jnp.int32)
    got = fa.fused_attention_sublayer_wf(x, g, bl, base, wf, H, 1e-5, 1.0, lens)
    want = fa._attn_sublayer_reference_wf(x, g, bl, base, wf, lens, H, 1e-5, 1.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
