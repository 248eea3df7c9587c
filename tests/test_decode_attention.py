"""Grouped-head bf16 decode-attention kernel (ops/decode_attention).

Interpret-mode equivalence vs a numpy oracle and vs the XLA einsum branch
in MultiHeadAttention's head-major decode path (the dispatch gate is pinned
both ways so the kernel is never compared to itself). The on-chip proof is
examples/profile_int8_attn_kernel.py --check plus the end-to-end decode
parity in bench.py --parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jiao_liao_speech_recognition_tpu.ops.decode_attention import (
    grouped_decode_attention,
)


def _oracle(q, k, v, lens):
    B, H, Tq, dh = q.shape
    Tk = k.shape[2]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
    mask = np.arange(Tk)[None, None, None, :] < lens[:, None, None, None]
    s = np.where(mask, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_bf16_kernel_matches_oracle_ragged_lengths():
    rng = np.random.RandomState(3)
    B, H, Tq, Tk, dh = 3, 4, 1, 256, 32
    q = rng.randn(B, H, Tq, dh).astype(np.float32)
    k = rng.randn(B, H, Tk, dh).astype(np.float32)
    v = rng.randn(B, H, Tk, dh).astype(np.float32)
    lens = np.asarray([Tk, 100, 7], np.int32)
    got = np.asarray(
        grouped_decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lens)
        )
    )
    want = _oracle(
        np.asarray(jnp.asarray(q).astype(jnp.bfloat16), np.float32),
        np.asarray(jnp.asarray(k).astype(jnp.bfloat16), np.float32),
        np.asarray(jnp.asarray(v).astype(jnp.bfloat16), np.float32),
        lens,
    )
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_bf16_kernel_zero_length_row_is_finite():
    rng = np.random.RandomState(5)
    B, H, Tq, Tk, dh = 2, 2, 1, 128, 16
    q = jnp.asarray(rng.randn(B, H, Tq, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32))
    lens = jnp.asarray([0, Tk], jnp.int32)
    out = np.asarray(grouped_decode_attention(q, k, v, lens))
    assert np.all(np.isfinite(out))


def test_bf16_kernel_rejects_unpadded_tk():
    q = jnp.zeros((1, 2, 1, 16), jnp.bfloat16)
    k = jnp.zeros((1, 2, 100, 16), jnp.bfloat16)
    with pytest.raises(ValueError, match="128"):
        grouped_decode_attention(q, k, k, jnp.asarray([100], jnp.int32))


def test_head_major_decode_dispatch_matches_einsum(monkeypatch):
    """MultiHeadAttention's head-major bf16 decode: kernel branch (gate
    pinned on; interpret mode here) == einsum branch (gate pinned off),
    including a cache horizon longer than the mask (built 128-padded).
    Caches are bf16 — the kernel only engages for bf16 caches."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    rng = np.random.RandomState(11)
    B, H, dh, Tk = 2, 2, 16, 128
    d = H * dh
    mha = L.MultiHeadAttention(num_heads=H, d_model=d, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(B, 1, d).astype(np.float32)).astype(jnp.bfloat16)
    cache = {
        "k": jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32)).astype(
            jnp.bfloat16
        ),
        "v": jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32)).astype(
            jnp.bfloat16
        ),
    }
    pos = 57
    mask = jnp.arange(Tk)[None, None, None, :] <= pos
    params = mha.init(
        jax.random.PRNGKey(0), x, kv_cache=cache, cache_index=pos, mask=mask,
        kv_lengths=jnp.int32(pos + 1),
    )

    kernel_calls = []
    real = grouped_decode_attention

    def spy(*a, **kw):
        kernel_calls.append(1)
        return real(*a, **kw)

    from jiao_liao_speech_recognition_tpu.ops import decode_attention as DA

    monkeypatch.setattr(DA, "grouped_decode_attention", spy)

    def run(on_tpu, **kw):
        monkeypatch.setattr(L, "_on_tpu", lambda: on_tpu)
        out, _ = mha.apply(
            params, x, kv_cache=cache, cache_index=jnp.int32(pos), **kw
        )
        return np.asarray(out, np.float32)

    got = run(True, mask=mask, kv_lengths=jnp.int32(pos + 1))
    assert kernel_calls, "kernel branch did not engage for threaded lengths"
    np.testing.assert_allclose(
        got, run(False, mask=mask, kv_lengths=jnp.int32(pos + 1)),
        atol=3e-2, rtol=3e-2,
    )

    # a bare mask (no threaded lengths) must take the exact masked einsum —
    # NOT the streaming kernel: lengths are never inferred from a mask
    kernel_calls.clear()
    got_mask_only = run(True, mask=mask)
    assert not kernel_calls, "mask-only call must not reach the kernel"
    np.testing.assert_allclose(got_mask_only, got, atol=3e-2, rtol=3e-2)


def test_non_prefix_key_mask_is_exact(monkeypatch):
    """The r2-advisor hazard, closed structurally: a NON-prefix [B,1,1,Tk]
    key mask (holes in the middle) must be applied exactly — previously the
    fast path would have misread it as 'attend to the first sum(mask)
    keys'. Now mask-only calls route to the masked einsum and match a
    hand-rolled reference."""
    from jiao_liao_speech_recognition_tpu.models import layers as L

    rng = np.random.RandomState(23)
    B, H, dh, Tk = 2, 2, 16, 128
    d = H * dh
    mha = L.MultiHeadAttention(num_heads=H, d_model=d, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(B, 1, d).astype(np.float32))
    cache = {
        "k": jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32)),
        "v": jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32)),
    }
    holes = np.ones((B, 1, 1, Tk), bool)
    holes[:, :, :, 10:40] = False  # non-contiguous validity
    holes[:, :, :, 100:] = False
    mask = jnp.asarray(holes)
    params = mha.init(
        jax.random.PRNGKey(0), x, kv_cache=cache, cache_index=5, mask=mask
    )
    monkeypatch.setattr(L, "_on_tpu", lambda: True)  # fast paths armed
    with jax.default_matmul_precision("highest"):  # f32-exact vs numpy
        out, _ = mha.apply(
            params, x, kv_cache=cache, cache_index=jnp.int32(5), mask=mask
        )

    # reference: q/k/v/out projections from the params, the step's own K/V
    # rows written at cache_index, then exact masked softmax
    p = params["params"]
    q = np.asarray(x) @ np.asarray(p["q_proj"]["dense"]["kernel"]) + np.asarray(
        p["q_proj"]["dense"]["bias"]
    )
    qh = q.reshape(B, 1, H, dh).transpose(0, 2, 1, 3)
    k2 = np.asarray(cache["k"]).copy()
    v2 = np.asarray(cache["v"]).copy()
    kn = np.asarray(x) @ np.asarray(p["k_proj"]["dense"]["kernel"])
    vn = np.asarray(x) @ np.asarray(p["v_proj"]["dense"]["kernel"]) + np.asarray(
        p["v_proj"]["dense"]["bias"]
    )
    k2[:, :, 5, :] = kn.reshape(B, H, dh)
    v2[:, :, 5, :] = vn.reshape(B, H, dh)
    s = np.einsum("bhqd,bhkd->bhqk", qh, k2) / np.sqrt(dh)
    s = np.where(holes, s, np.finfo(np.float32).min)
    pr = np.exp(s - s.max(-1, keepdims=True))
    pr /= pr.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bhkd->bhqd", pr, v2)
    o = o.transpose(0, 2, 1, 3).reshape(B, 1, d)
    want = o @ np.asarray(p["out_proj"]["dense"]["kernel"]) + np.asarray(
        p["out_proj"]["dense"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5, rtol=2e-5)


def test_f32_caches_keep_the_einsum_path(monkeypatch):
    """f32 head-major caches must NOT route through the kernel (it streams
    bf16 and would silently downcast the cache)."""
    from jiao_liao_speech_recognition_tpu.models import layers as L
    from jiao_liao_speech_recognition_tpu.ops import decode_attention as DA

    rng = np.random.RandomState(13)
    B, H, dh, Tk = 1, 2, 16, 128
    d = H * dh
    mha = L.MultiHeadAttention(num_heads=H, d_model=d, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(B, 1, d).astype(np.float32))
    cache = {
        "k": jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32)),
        "v": jnp.asarray(rng.randn(B, H, Tk, dh).astype(np.float32)),
    }
    mask = jnp.arange(Tk)[None, None, None, :] <= 5
    params = mha.init(
        jax.random.PRNGKey(0), x, kv_cache=cache, cache_index=5, mask=mask
    )

    def boom(*a, **kw):
        raise AssertionError("kernel must not engage for f32 caches")

    monkeypatch.setattr(DA, "grouped_decode_attention", boom)
    monkeypatch.setattr(L, "_on_tpu", lambda: True)
    out, _ = mha.apply(
        params, x, kv_cache=cache, cache_index=jnp.int32(5), mask=mask
    )
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_oversized_horizon_rejected_and_gated():
    """decode_attention_fits is the dispatch-gate escape hatch: oversized
    horizons report False, and a raw kernel call raises instead of failing
    deep in the Mosaic compile."""
    from jiao_liao_speech_recognition_tpu.ops.decode_attention import (
        decode_attention_fits,
    )

    assert decode_attention_fits(1536, 64, quantized=True)
    assert decode_attention_fits(1536, 64, quantized=False)
    assert not decode_attention_fits(131072, 128, quantized=False)
    q = jnp.zeros((1, 1, 1, 128), jnp.bfloat16)
    k = jnp.zeros((1, 1, 131072, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="VMEM"):
        grouped_decode_attention(q, k, k, jnp.asarray([7], jnp.int32))


def test_int8_cross_attention_multi_row_mask_is_exact():
    """A multi-query-row (e.g. causal-chunk) mask routes to the exact
    mul-reduce path and is applied row-by-row — previously such masks were
    rejected; now they are handled exactly (never collapsed to one key
    count per batch row)."""
    from jiao_liao_speech_recognition_tpu.models.layers import (
        _int8_cross_attention,
    )
    from jiao_liao_speech_recognition_tpu.ops.quant import quantize_kv

    rng = np.random.RandomState(17)
    B, H, Tq, Tk, dh = 1, 2, 4, 32, 8
    q = jnp.asarray(rng.randn(B, H, Tq, dh).astype(np.float32))
    kq, ks = quantize_kv(rng.randn(B, H, Tk, dh).astype(np.float32))
    vq, vs = quantize_kv(rng.randn(B, H, Tk, dh).astype(np.float32))
    causal = jnp.tril(jnp.ones((Tq, Tk), bool))[None, None]
    got = _int8_cross_attention(q, kq, ks, vq, vs, None, causal, jnp.float32)

    kd = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    vd = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), kd) / np.sqrt(dh)
    s = np.where(np.asarray(causal), s, np.finfo(np.float32).min)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, vd)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
