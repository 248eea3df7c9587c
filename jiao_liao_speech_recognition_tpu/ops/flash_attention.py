"""Blockwise (flash-style) attention as a Pallas TPU kernel.

Replaces the reference's CUDA attention kernels (torch SDPA,
/root/reference/requirements.txt:75) with an online-softmax blockwise kernel
that never materializes the [Tq, Tk] score matrix in HBM. Written blockwise
from the start so a future ring-attention axis can slot in (SURVEY §5.7),
though long-form audio stays out of parity scope.

Layout: q/k/v [B, T, H, Dh] -> grid (B*H, Tq/BLOCK_Q); each program streams
K/V blocks with running max/denominator renormalization.
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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale, causal):
    """One (batch*head, q-block) program; loops over k-blocks with online
    softmax. q_ref [BLOCK_Q, Dh], k_ref/v_ref [Tk, Dh], mask_ref [1, Tk]
    (True = valid key), out_ref [BLOCK_Q, Dh]."""
    q = q_ref[:, :].astype(jnp.float32) * scale
    tk = k_ref.shape[0]
    num_kb = tk // BLOCK_K
    qi = pl.program_id(1)

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [BQ, BK]
        kmask = mask_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K)]
        s = jnp.where(kmask[None, :], s, -1e30)
        if causal:
            q_pos = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 0
            )
            k_pos = kb * BLOCK_K + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 1
            )
            s = jnp.where(q_pos >= k_pos, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    dh = q_ref.shape[1]
    acc0 = jnp.zeros((BLOCK_Q, dh), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    out_ref[:, :] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def _flash_impl(q, k, v, kv_valid, causal):
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    # pad to block multiples
    tq_pad = -(-Tq // BLOCK_Q) * BLOCK_Q
    tk_pad = -(-Tk // BLOCK_K) * BLOCK_K
    dh_pad = max(-(-Dh // 128) * 128, 128)
    qp = jnp.pad(q, ((0, 0), (0, tq_pad - Tq), (0, 0), (0, dh_pad - Dh)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - Tk), (0, 0), (0, dh_pad - Dh)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - Tk), (0, 0), (0, dh_pad - Dh)))
    maskp = jnp.pad(kv_valid, ((0, 0), (0, tk_pad - Tk)))  # [B, Tk_pad] bool

    # [B, T, H, D] -> [B*H, T, D]
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * x.shape[2], x.shape[1], x.shape[3])

    qb, kb, vb = bh(qp), bh(kp), bh(vp)
    maskb = jnp.repeat(maskp, H, axis=0)  # [B*H, Tk_pad]

    scale = 1.0 / np.sqrt(Dh)
    grid = (B * H, tq_pad // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q, dh_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, dh_pad), q.dtype),
    )(qb, kb, vb, maskb)
    out = out.reshape(B, H, tq_pad, dh_pad).transpose(0, 2, 1, 3)
    return out[:, :Tq, :, :Dh]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, T, H, Dh]. `mask` must be a key-validity mask
    broadcastable from [B, 1, 1, Tk] (padding masks); dense [Tq, Tk] masks are
    not supported here — use the XLA path for those."""
    raise NotImplementedError("enabled after kernel-level validation on TPU")
