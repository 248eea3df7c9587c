"""Blockwise (flash-style) attention as a Pallas TPU kernel.

Replaces the reference's CUDA attention (torch SDPA,
/root/reference/requirements.txt:75) with an online-softmax blockwise kernel
that never materializes the [Tq, Tk] score matrix in HBM. For the flagship
encoder (B=32, H=8, T=752, f32 scores) the XLA einsum path writes ~580 MB of
probabilities per batch; this kernel keeps them in VMEM. Written blockwise
so a future ring-attention axis can slot in (SURVEY §5.7), though long-form
audio stays out of parity scope.

Training support: jax.custom_vjp with a blockwise Pallas BACKWARD — the
forward saves only the per-row log-sum-exp ([B*H, Tq] f32, ~0.5 MB at
large-v3 shapes) and the backward recomputes scores in VMEM to form
dQ/dK/dV, so the [B, H, Tq, Tk] probabilities are never materialized in
HBM in either direction. (The previous design differentiated an XLA einsum
reference in the backward, which re-built ~720 MB of logits+probs per
large-v3 encoder layer; at 32 layers that was pure HBM-bandwidth tax.)
Per-row softmax statistics ride lane-replicated [.., 128] tiles, the
layout Mosaic handles without (N, 1) stores.

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


def _flash_kernel_lse(
    len_ref, q_ref, k_ref, v_ref, out_ref, lse_ref, *, scale, causal, tk_pad
):
    """_flash_kernel + a log-sum-exp output for the Pallas backward.

    Same accumulation order as _flash_kernel, so the vjp-forward is
    bit-identical to the inference primal. lse_ref is [1, BLOCK_Q, 128]
    lane-replicated (per-row scalars stored as 128-wide tiles — Mosaic
    has no efficient (N, 1) store; the backward re-tiles them to BLOCK_K)."""
    q = q_ref[0].astype(jnp.float32) * scale
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
        acc_new = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((BLOCK_Q, dh), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    last_kb = jnp.minimum(pl.cdiv(kv_len, BLOCK_K), num_kb)
    acc, m, l = jax.lax.fori_loop(0, last_kb, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))  # [BLOCK_Q, 1]
    lse_ref[0] = jnp.broadcast_to(lse, (BLOCK_Q, 128))


@functools.partial(jax.jit, static_argnames=("causal", "with_lse"))
def _flash_forward(q, k, v, kv_lengths, causal, with_lse=False):
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
    in_specs = [
        pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
        pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i, lens: (b, 0, 0)),
        pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i, lens: (b, 0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens -> SMEM, available before the body
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
    )
    cost = pl.CostEstimate(
        flops=4 * B * H * tq_pad * tk_pad * dh_pad,
        bytes_accessed=(qb.size + kb_.size + vb.size) * q.dtype.itemsize,
        transcendentals=B * H * tq_pad * tk_pad,
    )
    if with_lse:
        grid_spec_lse = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_Q, 128), lambda b, i, lens: (b, i, 0)),
            ],
        )
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_kernel_lse, scale=scale, causal=causal, tk_pad=tk_pad
            ),
            grid_spec=grid_spec_lse,
            out_shape=[
                jax.ShapeDtypeStruct((B * H, tq_pad, dh_pad), q.dtype),
                jax.ShapeDtypeStruct((B * H, tq_pad, 128), jnp.float32),
            ],
            cost_estimate=cost,
            interpret=interpret,
        )(lens, qb, kb_, vb)
        out = out.reshape(B, H, tq_pad, dh_pad).transpose(0, 2, 1, 3)
        # compact residual: one lane of the replicated tile
        return out[:, :Tq, :, :Dh], lse[:, :, 0]
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal, tk_pad=tk_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, dh_pad), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(lens, qb, kb_, vb)
    out = out.reshape(B, H, tq_pad, dh_pad).transpose(0, 2, 1, 3)
    return out[:, :Tq, :, :Dh]


def _flash_bwd_dq_kernel(
    len_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref,
    *, scale, causal, tk_pad
):
    """One (batch*head, q-block) program: dQ = (P ∘ (dO Vᵀ − Δ)) K · scale.

    Streams K/V blocks like the forward; P is rebuilt from the saved
    log-sum-exp (exp(s − lse)) so no probabilities ever touch HBM.
    lse_ref/delta_ref: [1, BLOCK_Q, 128] lane-replicated f32."""
    kv_len = len_ref[pl.program_id(0)]
    qi = pl.program_id(1)
    dh = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    reps = BLOCK_K // 128
    # guard: rows with no valid keys carry lse ≈ -1e30; clamping makes
    # exp(s - lse) underflow to 0 instead of exp(0) = 1 on those rows
    lse_t = jnp.tile(jnp.maximum(lse_ref[0], -1e29), (1, reps))  # [BQ, BK]
    dlt_t = jnp.tile(delta_ref[0], (1, reps))
    num_kb = tk_pad // BLOCK_K

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        k_pos = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), 1
        )
        mask = k_pos < kv_len
        if causal:
            q_pos = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 0
            )
            mask = mask & (q_pos >= k_pos)
        p = jnp.where(mask, jnp.exp(s - lse_t), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        ds = p * (dp - dlt_t)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

    last_kb = jnp.minimum(pl.cdiv(kv_len, BLOCK_K), num_kb)
    if causal:
        last_kb = jnp.minimum(last_kb, pl.cdiv((qi + 1) * BLOCK_Q, BLOCK_K))
    dq = jax.lax.fori_loop(
        0, last_kb, body, jnp.zeros((BLOCK_Q, dh), jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    len_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dk_ref, dv_ref,
    *, scale, causal, tq_pad
):
    """One (batch*head, k-block) program:
    dV = Pᵀ dO;  dK = (P ∘ (dO Vᵀ − Δ))ᵀ Q · scale.

    Streams Q/dO blocks against a resident K/V block. Key-invalid columns
    zero out through the mask, so padded keys get exactly-zero grads.
    lse_ref/delta_ref: [1, tq_pad, 128] lane-replicated f32."""
    kv_len = len_ref[pl.program_id(0)]
    kj = pl.program_id(1)
    dh = q_ref.shape[2]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    k_pos = kj * BLOCK_K + jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_Q, BLOCK_K), 1
    )
    kmask = k_pos < kv_len
    reps = BLOCK_K // 128
    num_qb = tq_pad // BLOCK_Q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        lse_t = jnp.tile(
            jnp.maximum(lse_ref[0, pl.ds(qb * BLOCK_Q, BLOCK_Q), :], -1e29),
            (1, reps),
        )
        dlt_t = jnp.tile(delta_ref[0, pl.ds(qb * BLOCK_Q, BLOCK_Q), :], (1, reps))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = kmask
        if causal:
            q_pos = qb * BLOCK_Q + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 0
            )
            mask = mask & (q_pos >= k_pos)
        p = jnp.where(mask, jnp.exp(s - lse_t), 0.0)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BK, dh]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dlt_t)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        return dk_new, dv_new

    # causal: q-blocks strictly before this k-block are fully masked
    start_qb = (kj * BLOCK_K) // BLOCK_Q if causal else 0
    zeros = jnp.zeros((BLOCK_K, dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_qb, num_qb, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def _flash_backward(q, k, v, kv_lengths, out, lse, g, causal):
    """Blockwise flash backward on [B, T, H, Dh] layouts.

    lse: [B*H, tq_pad] f32 (compact residual from _flash_forward
    with_lse=True). Returns (dq, dk, dv) in the primal dtypes."""
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    tq_pad = max(-(-Tq // BLOCK_Q) * BLOCK_Q, BLOCK_Q)
    tk_pad = max(-(-Tk // BLOCK_K) * BLOCK_K, BLOCK_K)
    dh_pad = max(-(-Dh // 128) * 128, 128)
    interpret = jax.default_backend() != "tpu"
    scale = 1.0 / np.sqrt(Dh)
    lens_b = jnp.minimum(kv_lengths.astype(jnp.int32), Tk)

    def pad_fold(x, t, t_pad):  # [B, T, H, D] -> [B*H, t_pad, dh_pad]
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, dh_pad - Dh)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, t_pad, dh_pad)

    qb = pad_fold(q, Tq, tq_pad)
    kb_ = pad_fold(k, Tk, tk_pad)
    vb = pad_fold(v, Tk, tk_pad)
    dob = pad_fold(g, Tq, tq_pad)
    outb = pad_fold(out, Tq, tq_pad)
    lens = jnp.repeat(lens_b, H, axis=0)

    # Δ = rowsum(dO ∘ O): tiny elementwise pass, then lane-replicate the
    # per-row stats into the [.., 128] tiles the kernels consume (transient
    # — only the compact lse is a saved residual)
    delta = jnp.sum(
        dob.astype(jnp.float32) * outb.astype(jnp.float32), axis=-1
    )  # [B*H, tq_pad]
    lse_r = jnp.broadcast_to(lse[:, :, None], (B * H, tq_pad, 128))
    dlt_r = jnp.broadcast_to(delta[:, :, None], (B * H, tq_pad, 128))

    cost_q = pl.CostEstimate(
        flops=5 * B * H * tq_pad * tk_pad * dh_pad,
        bytes_accessed=(qb.size + kb_.size + vb.size + dob.size)
        * q.dtype.itemsize,
        transcendentals=B * H * tq_pad * tk_pad,
    )
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, causal=causal, tk_pad=tk_pad
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, tq_pad // BLOCK_Q),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_Q, 128), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_Q, 128), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, tk_pad, dh_pad), lambda b, i, lens: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, BLOCK_Q, dh_pad), lambda b, i, lens: (b, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, dh_pad), jnp.float32),
        cost_estimate=cost_q,
        interpret=interpret,
    )(lens, qb, dob, lse_r, dlt_r, kb_, vb)

    cost_kv = pl.CostEstimate(
        flops=8 * B * H * tq_pad * tk_pad * dh_pad,
        bytes_accessed=(qb.size + kb_.size + vb.size + dob.size)
        * q.dtype.itemsize,
        transcendentals=B * H * tq_pad * tk_pad,
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, causal=causal, tq_pad=tq_pad
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, tk_pad // BLOCK_K),
            in_specs=[
                pl.BlockSpec((1, tq_pad, dh_pad), lambda b, j, lens: (b, 0, 0)),
                pl.BlockSpec((1, tq_pad, dh_pad), lambda b, j, lens: (b, 0, 0)),
                pl.BlockSpec((1, tq_pad, 128), lambda b, j, lens: (b, 0, 0)),
                pl.BlockSpec((1, tq_pad, 128), lambda b, j, lens: (b, 0, 0)),
                pl.BlockSpec((1, BLOCK_K, dh_pad), lambda b, j, lens: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_K, dh_pad), lambda b, j, lens: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BLOCK_K, dh_pad), lambda b, j, lens: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_K, dh_pad), lambda b, j, lens: (b, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, tk_pad, dh_pad), jnp.float32),
            jax.ShapeDtypeStruct((B * H, tk_pad, dh_pad), jnp.float32),
        ],
        cost_estimate=cost_kv,
        interpret=interpret,
    )(lens, qb, dob, lse_r, dlt_r, kb_, vb)

    def unfold(x, t_pad, t):  # [B*H, t_pad, dh_pad] -> [B, t, H, Dh]
        x = x.reshape(B, H, t_pad, dh_pad).transpose(0, 2, 1, 3)
        return x[:, :t, :, :Dh]

    return (
        unfold(dq, tq_pad, Tq).astype(q.dtype),
        unfold(dk, tk_pad, Tk).astype(k.dtype),
        unfold(dv, tk_pad, Tk).astype(v.dtype),
    )


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
    # vjp-forward routes through the head-split lse kernel (the reshape is
    # free: heads are contiguous in the packed last dim). Identical block
    # sizes, loop order, and f32 accumulation as the packed primal kernel,
    # so primal and vjp-forward agree bitwise; training pays only the
    # fold/unfold transposes, which inference (the packed kernel's reason
    # to exist) never sees.
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // num_heads
    out4, lse = _flash_forward(
        q.reshape(B, Tq, num_heads, dh),
        k.reshape(B, Tk, num_heads, dh),
        v.reshape(B, Tk, num_heads, dh),
        kv_lengths,
        causal,
        with_lse=True,
    )
    return out4.reshape(B, Tq, D), (q, k, v, kv_lengths, out4, lse)


def _fap_bwd(num_heads, causal, res, g):
    q, k, v, kv_lengths, out4, lse = res
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // num_heads
    dq, dk, dv = _flash_backward(
        q.reshape(B, Tq, num_heads, dh),
        k.reshape(B, Tk, num_heads, dh),
        v.reshape(B, Tk, num_heads, dh),
        kv_lengths,
        out4,
        lse,
        g.reshape(B, Tq, num_heads, dh),
        causal,
    )
    return (
        dq.reshape(B, Tq, D),
        dk.reshape(B, Tk, D),
        dv.reshape(B, Tk, D),
        None,
    )


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
    out, lse = _flash_forward(q, k, v, kv_lengths, causal, with_lse=True)
    return out, (q, k, v, kv_lengths, out, lse)


def _fa_bwd(causal, res, g):
    q, k, v, kv_lengths, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, kv_lengths, out, lse, g, causal)
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
