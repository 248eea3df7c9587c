"""Blockwise (flash-style) attention as a Pallas TPU kernel.

Replaces the reference's CUDA attention (torch SDPA,
/root/reference/requirements.txt:75) with an online-softmax blockwise kernel
that never materializes the [Tq, Tk] score matrix in HBM. For the flagship
encoder (B=32, H=8, T=752, f32 scores) the XLA einsum path writes ~580 MB of
probabilities per batch; this kernel keeps them in VMEM. Written blockwise
so a future ring-attention axis can slot in (SURVEY §5.7), though long-form
audio stays out of parity scope.

Training support: jax.custom_vjp whose backward differentiates the reference
einsum attention at the same inputs — the exact gradient of softmax
attention, with the memory-heavy part only on the backward pass (which the
training step can afford; inference never runs it).

Layout: q/k/v [B, T, H, Dh] -> grid (B*H, Tq/BLOCK_Q); each program streams
K/V blocks with running max/denominator renormalization. Key-padding masks
come in as per-(batch*head) valid lengths in SMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 256


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, out_ref, *, scale, causal, tk_pad):
    """One (batch*head, q-block) program.

    len_ref: [B*H] scalar-prefetch int32 — valid key length per batch*head
    q_ref:   [1, BLOCK_Q, Dh] VMEM
    k_ref/v_ref: [1, Tk_pad, Dh] VMEM
    out_ref: [1, BLOCK_Q, Dh] VMEM
    """
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, Dh]
    kv_len = len_ref[pl.program_id(0)]
    qi = pl.program_id(1)
    num_kb = tk_pad // BLOCK_K
    dh = q_ref.shape[2]

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        k_pos = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), 1
        )
        mask = k_pos < kv_len
        if causal:
            q_pos = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 0
            )
            mask = mask & (q_pos >= k_pos)
        s = jnp.where(mask, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((BLOCK_Q, dh), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    # skip key blocks entirely past kv_len (and causal future blocks)
    last_kb = jnp.minimum(pl.cdiv(kv_len, BLOCK_K), num_kb)
    acc, m, l = jax.lax.fori_loop(0, last_kb, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def _flash_forward(q, k, v, kv_lengths, causal):
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    if kv_lengths.shape != (B,):
        # a shorter lens array would make the B*H grid read out-of-bounds
        # SMEM in the scalar prefetch — reject at trace time
        raise ValueError(
            f"kv_lengths shape {kv_lengths.shape} must be ({B},) to match q"
        )
    tq_pad = max(-(-Tq // BLOCK_Q) * BLOCK_Q, BLOCK_Q)
    tk_pad = max(-(-Tk // BLOCK_K) * BLOCK_K, BLOCK_K)
    dh_pad = max(-(-Dh // 128) * 128, 128)
    interpret = jax.default_backend() != "tpu"  # CPU tests run the interpreter
    scale = 1.0 / np.sqrt(Dh)
    lens_b = jnp.minimum(kv_lengths.astype(jnp.int32), Tk)

    # fold heads into batch: one transpose in, one out. (A copy-free
    # [B,T,H,D]-native grid was tried and rejected by Mosaic — the per-head
    # block dim of 1 lands in the sublane slot, which must be 8-divisible.)
    qp = jnp.pad(q, ((0, 0), (0, tq_pad - Tq), (0, 0), (0, dh_pad - Dh)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - Tk), (0, 0), (0, dh_pad - Dh)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - Tk), (0, 0), (0, dh_pad - Dh)))

    def bh(x, t):  # [B, T, H, D] -> [B*H, T, D]
        return x.transpose(0, 2, 1, 3).reshape(B * H, t, dh_pad)

    qb, kb_, vb = bh(qp, tq_pad), bh(kp, tk_pad), bh(vp, tk_pad)
    lens = jnp.repeat(lens_b, H, axis=0)

    grid = (B * H, tq_pad // BLOCK_Q)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens -> SMEM, available before the body
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
            pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i, lens: (b, 0, 0)),
            pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i, lens: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal, tk_pad=tk_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, dh_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * tq_pad * tk_pad * dh_pad,
            bytes_accessed=(qb.size + kb_.size + vb.size) * q.dtype.itemsize,
            transcendentals=B * H * tq_pad * tk_pad,
        ),
        interpret=interpret,
    )(lens, qb, kb_, vb)
    out = out.reshape(B, H, tq_pad, dh_pad).transpose(0, 2, 1, 3)
    return out[:, :Tq, :, :Dh]


def _packed_flash_kernel(len_ref, q_ref, k_ref, v_ref, out_ref, *, scale, causal, tk_pad):
    """One (batch, head, q-block) program on head-packed [B, T, H*Dh] inputs.

    len_ref: [B] scalar-prefetch int32 — valid key length per batch row
    q_ref:   [1, BLOCK_Q, dh] VMEM (head slice picked by the index map)
    k_ref/v_ref: [1, Tk_pad, dh] VMEM
    """
    q = q_ref[0].astype(jnp.float32) * scale
    kv_len = len_ref[pl.program_id(0)]
    qi = pl.program_id(2)
    num_kb = tk_pad // BLOCK_K
    dh = q_ref.shape[2]

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_pos = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), 1
        )
        mask = k_pos < kv_len
        if causal:
            q_pos = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 0
            )
            mask = mask & (q_pos >= k_pos)
        s = jnp.where(mask, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((BLOCK_Q, dh), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    last_kb = jnp.minimum(pl.cdiv(kv_len, BLOCK_K), num_kb)
    acc, m, l = jax.lax.fori_loop(0, last_kb, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "causal"))
def _flash_forward_packed(q, k, v, kv_lengths, num_heads, causal):
    """Head-packed flash forward: q/k/v stay [B, T, H*Dh] — the exact layout
    the qkv Dense produces — so attention costs ZERO transposes in or out.
    Heads are addressed by the BlockSpec index map slicing the last dim
    (Dh must be a multiple of 128 so head slices are lane-aligned).
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // num_heads
    if dh * num_heads != D or dh % 128 != 0:
        raise NotImplementedError("packed flash needs head_dim % 128 == 0")
    if kv_lengths.shape != (B,):
        raise ValueError(f"kv_lengths shape {kv_lengths.shape} != ({B},)")
    tq_pad = max(-(-Tq // BLOCK_Q) * BLOCK_Q, BLOCK_Q)
    tk_pad = max(-(-Tk // BLOCK_K) * BLOCK_K, BLOCK_K)
    interpret = jax.default_backend() != "tpu"
    scale = 1.0 / np.sqrt(dh)
    lens = jnp.minimum(kv_lengths.astype(jnp.int32), Tk)

    qp = jnp.pad(q, ((0, 0), (0, tq_pad - Tq), (0, 0))) if tq_pad != Tq else q
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - Tk), (0, 0))) if tk_pad != Tk else k
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - Tk), (0, 0))) if tk_pad != Tk else v

    grid = (B, num_heads, tq_pad // BLOCK_Q)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, dh), lambda b, h, i, lens: (b, i, h)),
            pl.BlockSpec((1, tk_pad, dh), lambda b, h, i, lens: (b, 0, h)),
            pl.BlockSpec((1, tk_pad, dh), lambda b, h, i, lens: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, dh), lambda b, h, i, lens: (b, i, h)),
    )
    out = pl.pallas_call(
        functools.partial(
            _packed_flash_kernel, scale=scale, causal=causal, tk_pad=tk_pad
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, tq_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * tq_pad * tk_pad * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=B * num_heads * tq_pad * tk_pad,
        ),
        interpret=interpret,
    )(lens, qp, kp, vp)
    return out[:, :Tq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_packed(q, k, v, kv_lengths, num_heads, causal):
    return _flash_forward_packed(q, k, v, kv_lengths, num_heads, causal)


def _fap_fwd(q, k, v, kv_lengths, num_heads, causal):
    return _flash_forward_packed(q, k, v, kv_lengths, num_heads, causal), (
        q, k, v, kv_lengths,
    )


def _fap_bwd(num_heads, causal, res, g):
    q, k, v, kv_lengths = res
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // num_heads

    def ref(q, k, v):
        out = _reference_attention(
            q.reshape(B, Tq, num_heads, dh),
            k.reshape(B, Tk, num_heads, dh),
            v.reshape(B, Tk, num_heads, dh),
            kv_lengths,
            causal,
        )
        return out.reshape(B, Tq, D)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_packed.defvjp(_fap_fwd, _fap_bwd)


def flash_attention_packed(
    q: jnp.ndarray,  # [B, Tq, H*Dh]
    k: jnp.ndarray,  # [B, Tk, H*Dh]
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention on head-PACKED layouts [B, T, H*Dh] (zero-transpose:
    consumes the qkv Dense outputs and produces the out-proj input as-is).
    Requires Dh % 128 == 0 (lane-aligned head slices); callers fall back to
    flash_attention / XLA einsum otherwise. Mask semantics match
    flash_attention (key-validity prefix masks only)."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    if kv_lengths is None:
        if mask is None:
            kv_lengths = jnp.full((B,), Tk, jnp.int32)
        else:
            if mask.ndim != 4 or mask.shape[1] != 1 or mask.shape[2] != 1:
                raise NotImplementedError("flash path needs a key-validity mask")
            m = jnp.broadcast_to(mask, (B, 1, 1, Tk))
            kv_lengths = jnp.sum(m[:, 0, 0, :].astype(jnp.int32), axis=-1)
    else:
        kv_lengths = jnp.broadcast_to(jnp.asarray(kv_lengths, jnp.int32), (B,))
    return _flash_attention_packed(q, k, v, kv_lengths, num_heads, causal)


def _reference_attention(q, k, v, kv_lengths, causal):
    """XLA einsum attention — the backward-path twin of the kernel."""
    dtype = q.dtype
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    Tk = k.shape[1]
    mask = jnp.arange(Tk)[None, None, None, :] < kv_lengths[:, None, None, None]
    if causal:
        Tq = q.shape[1]
        mask = mask & (
            jnp.arange(Tq)[None, None, :, None] >= jnp.arange(Tk)[None, None, None, :]
        )
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, kv_lengths, causal):
    return _flash_forward(q, k, v, kv_lengths, causal)


def _fa_fwd(q, k, v, kv_lengths, causal):
    return _flash_forward(q, k, v, kv_lengths, causal), (q, k, v, kv_lengths)


def _fa_bwd(causal, res, g):
    q, k, v, kv_lengths = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, kv_lengths, causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention over [B, T, H, Dh].

    Padding is expressed as `kv_lengths` [B]; a `mask` is accepted only in
    the key-validity form produced by models.layers.length_mask
    ([B, 1, 1, Tk], contiguous True prefix) and is converted to lengths.
    Dense [Tq, Tk] masks are unsupported — callers with those use the XLA
    path (models/layers.py falls back automatically).
    """
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    if kv_lengths is None:
        if mask is None:
            kv_lengths = jnp.full((B,), Tk, jnp.int32)
        else:
            if mask.ndim != 4 or mask.shape[1] != 1 or mask.shape[2] != 1:
                raise NotImplementedError("flash path needs a key-validity mask")
            # masks are often broadcast over batch ([1,1,1,Tk], e.g. from
            # decode_step); expand to q's batch BEFORE reducing or the
            # B*H Pallas grid reads out-of-bounds kv lengths
            m = jnp.broadcast_to(mask, (B, 1, 1, Tk))
            kv_lengths = jnp.sum(m[:, 0, 0, :].astype(jnp.int32), axis=-1)
    else:
        kv_lengths = jnp.broadcast_to(jnp.asarray(kv_lengths, jnp.int32), (B,))
    return _flash_attention(q, k, v, kv_lengths, causal)
