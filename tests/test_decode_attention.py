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
        jax.random.PRNGKey(0), x, kv_cache=cache, cache_index=pos, mask=mask
    )

    kernel_calls = []
    real = grouped_decode_attention

    def spy(*a, **kw):
        kernel_calls.append(1)
        return real(*a, **kw)

    from jiao_liao_speech_recognition_tpu.ops import decode_attention as DA

    monkeypatch.setattr(DA, "grouped_decode_attention", spy)

    def run(on_tpu):
        monkeypatch.setattr(L, "_on_tpu", lambda: on_tpu)
        out, _ = mha.apply(
            params, x, kv_cache=cache, cache_index=jnp.int32(pos), mask=mask
        )
        return np.asarray(out, np.float32)

    got = run(True)
    assert kernel_calls, "kernel branch did not engage for bf16 caches"
    np.testing.assert_allclose(got, run(False), atol=3e-2, rtol=3e-2)


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


def test_int8_cross_attention_rejects_multi_row_masks():
    """Both int8 branches collapse the mask to one key count per batch row;
    a multi-query-row mask must be rejected loudly, not silently wrong."""
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
    with pytest.raises(ValueError, match="single-query-row"):
        _int8_cross_attention(q, kq, ks, vq, vs, causal, jnp.float32)
