"""Pallas flash-attention kernel vs the XLA einsum reference (interpreter
mode on CPU; the same kernel compiles on TPU — exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jiao_liao_speech_recognition_tpu.ops.flash_attention import (
    _reference_attention,
    flash_attention,
)


def _qkv(rng, B, T, H, D, dtype=np.float32):
    q = rng.randn(B, T, H, D).astype(dtype)
    k = rng.randn(B, T, H, D).astype(dtype)
    v = rng.randn(B, T, H, D).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("B,T,H,D", [(2, 64, 2, 32), (1, 300, 4, 64)])
def test_flash_matches_reference(rng, B, T, H, D):
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.asarray([T] * B if B == 1 else [T, T // 2], jnp.int32)[:B]
    got = flash_attention(q, k, v, kv_lengths=lens)
    want = _reference_attention(q, k, v, lens, causal=False)
    # outputs on padded queries beyond kv_len are softmax over a masked row in
    # the reference; compare only valid region semantics: all query rows are
    # valid here (query padding is handled by callers), so compare all.
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_flash_causal(rng):
    B, T, H, D = 1, 128, 2, 32
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.full((B,), T, jnp.int32)
    got = flash_attention(q, k, v, kv_lengths=lens, causal=True)
    want = _reference_attention(q, k, v, lens, causal=True)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_flash_mask_form(rng):
    """length_mask-form [B,1,1,Tk] converts to lengths."""
    B, T, H, D = 2, 64, 2, 32
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.asarray([64, 30], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    got = flash_attention(q, k, v, mask=mask)
    want = _reference_attention(q, k, v, lens, causal=False)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_flash_gradients(rng):
    """custom_vjp backward == gradient of the reference attention."""
    B, T, H, D = 1, 64, 2, 32
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.asarray([50], jnp.int32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lengths=lens) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, lens, False) ** 2)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-3


def test_flash_native_layout_dh128(rng):
    """Dh=128 takes the copy-free [B,T,H,D] grid path; parity holds."""
    B, T, H, D = 2, 300, 3, 128
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.asarray([300, 200], jnp.int32)
    got = flash_attention(q, k, v, kv_lengths=lens)
    want = _reference_attention(q, k, v, lens, causal=False)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_flash_native_layout_causal(rng):
    B, T, H, D = 1, 256, 2, 128
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.full((B,), T, jnp.int32)
    got = flash_attention(q, k, v, kv_lengths=lens, causal=True)
    want = _reference_attention(q, k, v, lens, causal=True)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_flash_broadcast_mask(rng):
    """[1,1,1,Tk] broadcast masks (whisper decode_step form) expand to q's
    batch before the kv_lengths reduction — previously lens had shape [1]
    and the B*H grid read out-of-bounds scalar-prefetch entries."""
    B, T, H, D = 3, 64, 2, 32
    q, k, v = _qkv(rng, B, T, H, D)
    n = 40
    mask = (jnp.arange(T)[None, :] < n)[None, None, :, :][None][0]  # [1,1,1,T]
    assert mask.shape == (1, 1, 1, T)
    got = flash_attention(q, k, v, mask=mask)
    lens = jnp.full((B,), n, jnp.int32)
    want = _reference_attention(q, k, v, lens, causal=False)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_flash_rejects_wrong_length_batch(rng):
    B, T, H, D = 3, 64, 2, 32
    q, k, v = _qkv(rng, B, T, H, D)
    from jiao_liao_speech_recognition_tpu.ops.flash_attention import _flash_forward

    with pytest.raises(ValueError):
        _flash_forward(q, k, v, jnp.asarray([10], jnp.int32), False)


def test_packed_flash_matches_reference(rng):
    """Head-packed [B,T,H*128] kernel == reference on the unpacked layout."""
    from jiao_liao_speech_recognition_tpu.ops.flash_attention import (
        flash_attention_packed,
    )

    B, T, H, D = 2, 96, 3, 128
    q = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    lens = jnp.asarray([96, 40], jnp.int32)
    got = flash_attention_packed(q, k, v, H, kv_lengths=lens)
    want = _reference_attention(
        q.reshape(B, T, H, D), k.reshape(B, T, H, D), v.reshape(B, T, H, D),
        lens, causal=False,
    ).reshape(B, T, H * D)
    assert got.shape == (B, T, H * D)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3


def test_packed_flash_causal_and_masks(rng):
    from jiao_liao_speech_recognition_tpu.ops.flash_attention import (
        flash_attention_packed,
    )

    B, T, H, D = 2, 64, 2, 128
    q = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    lens = jnp.asarray([64, 30], jnp.int32)
    got = flash_attention_packed(q, k, v, H, kv_lengths=lens, causal=True)
    want = _reference_attention(
        q.reshape(B, T, H, D), k.reshape(B, T, H, D), v.reshape(B, T, H, D),
        lens, causal=True,
    ).reshape(B, T, H * D)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-3
    # key-validity mask form, broadcast over batch
    mask = (jnp.arange(T) < 30)[None, None, None, :]
    assert mask.shape == (1, 1, 1, T)
    got2 = flash_attention_packed(q, k, v, H, mask=mask)
    lens2 = jnp.full((B,), 30, jnp.int32)
    want2 = _reference_attention(
        q.reshape(B, T, H, D), k.reshape(B, T, H, D), v.reshape(B, T, H, D),
        lens2, causal=False,
    ).reshape(B, T, H * D)
    assert np.abs(np.asarray(got2) - np.asarray(want2)).max() < 2e-3
    # non-multiple-of-128 head dim is rejected (callers fall back)
    with pytest.raises(NotImplementedError):
        flash_attention_packed(q, k, v, 3, kv_lengths=lens)


def test_packed_flash_gradients(rng):
    from jiao_liao_speech_recognition_tpu.ops.flash_attention import (
        flash_attention_packed,
    )

    B, T, H, D = 1, 64, 2, 128
    q = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H * D).astype(np.float32))
    lens = jnp.asarray([50], jnp.int32)

    def f(q, k, v):
        return jnp.sum(flash_attention_packed(q, k, v, H, kv_lengths=lens) ** 2)

    def f_ref(q, k, v):
        out = _reference_attention(
            q.reshape(B, T, H, D), k.reshape(B, T, H, D), v.reshape(B, T, H, D),
            lens, False,
        )
        return jnp.sum(out.reshape(B, T, H * D) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-2


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_ragged_multiblock(rng, causal):
    """Pallas backward == reference grads over multiple q/k blocks with
    ragged kv lengths (exercises block-boundary masking and the causal
    start-block skip in the dkv kernel)."""
    B, T, H, D = 3, 300, 2, 64
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.asarray([300, 257, 128], jnp.int32)
    w = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))  # non-uniform cotangent

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lengths=lens, causal=causal) * w)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, lens, causal) * w)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_flash_backward_zero_grads_on_padded_keys(rng):
    """Keys beyond kv_len must receive exactly-zero dK/dV."""
    B, T, H, D = 1, 128, 1, 32
    q, k, v = _qkv(rng, B, T, H, D)
    lens = jnp.asarray([70], jnp.int32)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lengths=lens))

    _, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    assert np.abs(np.asarray(dk)[:, 70:]).max() == 0.0
    assert np.abs(np.asarray(dv)[:, 70:]).max() == 0.0
