"""Fully fused self-attention sublayer Pallas kernels (inference fast path).

y = x + out_proj(MHA(LayerNorm(x)))  computed in two kernels:

* ``fused_ln_kv`` — (k, v) = LayerNorm(x) @ (Wk, Wv) (+ bv): the only part
  of the sublayer with a cross-tile dependency (every query tile attends
  over all keys), so k/v are materialized once in HBM.
* ``fused_attention_sublayer`` — per (batch, query-tile) program:
  recompute LN on the x tile (cheap, saves writing/reading q), project q,
  then for each head take softmax(q_h k_h^T / sqrt(dh)) v_h against the
  VMEM-resident full-length k/v and accumulate the out-projection as
  y += out_h @ Wo[h*dh:(h+1)*dh, :] — the per-head partial sums make the
  head concat unnecessary — finishing with + bias + residual.

Versus the previous path (LN+QKV kernel -> head-packed flash -> XLA
out_proj+residual) this removes the q and attention-output HBM round
trips: the sublayer reads x and k/v and writes y, 7 full-tensor passes
per block instead of 13.

T_k is bounded by VMEM (k/v tiles resident): fine for the 30 s encoder
(T' = 750); the wrapper falls back to the reference XLA path when the
resident buffers would not fit. Softmax is computed directly per tile in
f32 (no online-flash running max needed — the whole row fits), key
validity masked from kv_lengths. Numerics mirror the module path:
f32 LN statistics and softmax, bf16 matmul operands, f32 MXU accumulation.

TPU-native replacement for the reference's fused CUDA attention
(torch 2.1 sdpa/inductor, /root/reference/requirements.txt:75).

Training never routes here (models/layers.py gates on deterministic
inference), but a custom_vjp with the reference XLA backward keeps
gradients correct if differentiated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_T = 256
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _ln_f32(x, g, bl, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps)) * g + bl


def _ln_kv_kernel(x_ref, g_ref, bl_ref, wk_ref, wv_ref, bv_ref, k_ref, v_ref, *, eps):
    x = x_ref[0]
    ln = _ln_f32(x, g_ref[0], bl_ref[0], eps).astype(x.dtype)
    dims = (((1,), (0,)), ((), ()))
    k_ref[0] = jax.lax.dot_general(
        ln, wk_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    v_ref[0] = jax.lax.dot_general(
        ln, wv_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype) + bv_ref[0]


def _attn_sublayer_kernel(
    lens_ref,  # scalar prefetch: [B] int32 kv lengths
    x_ref, g_ref, bl_ref, wq_ref, bq_ref, k_ref, v_ref, wo_ref, bo_ref,
    out_ref, *, eps, num_heads, t_pad
):
    """One (batch, query-tile) program of y = x + Wo(MHA(LN(x))) + bo.

    x_ref: [1, BLOCK_T, d]; k/v_ref: [1, t_pad, D] (resident full length);
    wq_ref: [d, D]; wo_ref: [D, d]; out_ref: [1, BLOCK_T, d].
    """
    b = pl.program_id(0)
    x = x_ref[0]
    ln = _ln_f32(x, g_ref[0], bl_ref[0], eps).astype(x.dtype)
    q = jax.lax.dot_general(
        ln, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bq_ref[0]

    D = q.shape[-1]
    dh = D // num_heads
    scale = np.float32(1.0 / np.sqrt(dh))
    kv_len = lens_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_T, t_pad), 1)
    neg = jnp.finfo(jnp.float32).min
    k_all = k_ref[0]
    v_all = v_ref[0]

    acc = jnp.zeros((BLOCK_T, wo_ref.shape[1]), jnp.float32)
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        # scores over the full key length, f32 (module-path softmax numerics)
        s = jax.lax.dot_general(
            q[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(col < kv_len, s, neg)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x.dtype), v_all[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        # per-head slice of the out projection: y = sum_h o_h @ Wo_h
        acc = acc + jax.lax.dot_general(
            o, wo_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = x + acc.astype(x.dtype) + bo_ref[0]


def attn_sublayer_fits_vmem(d: int, D: int, t_kv: int) -> bool:
    t_pad = -(-t_kv // BLOCK_T) * BLOCK_T
    tile = (
        2 * (d * D + D * d)                 # resident Wq + Wo bf16
        + 2 * 2 * 2 * t_pad * D             # double-buffered k/v bf16
        + 4 * BLOCK_T * t_pad               # f32 score tile
        + 4 * BLOCK_T * d                   # f32 LN/acc tile
        + 2 * 2 * 2 * BLOCK_T * d           # double-buffered x/y bf16
    )
    return tile <= _VMEM_BUDGET_BYTES


def _attn_sublayer_reference(x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps):
    """XLA twin — module-path numerics (models/layers.py MHA + residual)."""
    dt = x.dtype
    B, T, d = x.shape
    D = wq.shape[1]
    dh = D // num_heads
    ln = _ln_f32(x, g, bl, eps).astype(dt)
    dims = (((2,), (0,)), ((), ()))
    q = jax.lax.dot_general(ln, wq.astype(dt), dims,
                            preferred_element_type=jnp.float32).astype(dt) + bq.astype(dt)
    k = jax.lax.dot_general(ln, wk.astype(dt), dims,
                            preferred_element_type=jnp.float32).astype(dt)
    v = jax.lax.dot_general(ln, wv.astype(dt), dims,
                            preferred_element_type=jnp.float32).astype(dt) + bv.astype(dt)
    qh = q.reshape(B, T, num_heads, dh)
    kh = k.reshape(B, T, num_heads, dh)
    vh = v.reshape(B, T, num_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    mask = jnp.arange(T)[None, None, None, :] < kv_lengths[:, None, None, None]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                      preferred_element_type=jnp.float32).astype(dt)
    attn = attn.reshape(B, T, D)
    out = jax.lax.dot_general(attn, wo.astype(dt), dims,
                              preferred_element_type=jnp.float32).astype(dt) + bo.astype(dt)
    return x + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_attention_sublayer(
    x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps=1e-5
):
    """y = x + out_proj(MHA(LayerNorm(x))) in two VMEM kernels (see module
    docstring). x bf16 [B, T, d]; weights f32 (cast to bf16 like nn.Dense);
    kv_lengths int32 [B]; k unbiased (Whisper convention)."""
    return _fused_attn_fwd_impl(x, g, bl, wq, bq, wk, wv, bv, wo, bo,
                                kv_lengths, num_heads, eps)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps"))
def _fused_attn_fwd_impl(x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps):
    B, T, d = x.shape
    D = wq.shape[1]
    dh = D // num_heads
    whole_ok = dh % 128 == 0 and attn_sublayer_fits_vmem(d, D, T)
    if not whole_ok:
        # dh=64 heads (large-v3) and long-T/wide-D shapes: head-group-split
        # kernel with bounded VMEM; else the XLA reference path
        if attn_hsplit_supported(D, num_heads) and attn_hsplit_fits_vmem(d, D, T):
            return _fused_attn_hsplit_impl(
                x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps
            )
        return _attn_sublayer_reference(
            x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps
        )
    t_pad = max(-(-T // BLOCK_T) * BLOCK_T, BLOCK_T)
    interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0))) if t_pad != T else x
    xp = xp.astype(jnp.bfloat16)
    gf = g.astype(jnp.float32)[None, :]
    blf = bl.astype(jnp.float32)[None, :]
    lens = jnp.minimum(kv_lengths.astype(jnp.int32), T)

    shp = jax.ShapeDtypeStruct((B, t_pad, D), jnp.bfloat16)
    k, v = pl.pallas_call(
        functools.partial(_ln_kv_kernel, eps=np.float32(eps)),
        grid=(B, t_pad // BLOCK_T),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((d, D), lambda b, i: (0, 0)),
            pl.BlockSpec((d, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_T, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, BLOCK_T, D), lambda b, i: (b, i, 0)),
        ],
        out_shape=[shp, shp],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * t_pad * d * D,
            bytes_accessed=2 * (3 * B * t_pad * d + 2 * d * D),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp, gf, blf,
        wk.astype(jnp.bfloat16), wv.astype(jnp.bfloat16),
        bv.astype(jnp.bfloat16)[None, :],
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, t_pad // BLOCK_T),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i, lens: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i, lens: (0, 0)),
            pl.BlockSpec((d, D), lambda b, i, lens: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i, lens: (0, 0)),
            pl.BlockSpec((1, t_pad, D), lambda b, i, lens: (b, 0, 0)),
            pl.BlockSpec((1, t_pad, D), lambda b, i, lens: (b, 0, 0)),
            pl.BlockSpec((D, d), lambda b, i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i, lens: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_T, d), lambda b, i, lens: (b, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_sublayer_kernel,
            eps=np.float32(eps), num_heads=num_heads, t_pad=t_pad,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_pad, d), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * d * D + 4 * B * t_pad * t_pad * D
            + 2 * B * t_pad * D * d,
            bytes_accessed=2 * (2 * B * t_pad * d + 2 * B * t_pad * D),
            transcendentals=B * t_pad * t_pad * num_heads,
        ),
        interpret=interpret,
    )(
        lens, xp, gf, blf,
        wq.astype(jnp.bfloat16), bq.astype(jnp.bfloat16)[None, :],
        k, v,
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16)[None, :],
    )
    return out[:, :T, :].astype(x.dtype)


# ---------------------------------------------------------------------------
# Head-group-split variant: dh=64 heads (whisper-large-v3: d=1280, H=20) and
# long-T/wide-D cases where the resident-KV whole-D kernel exceeds VMEM.
#
# Heads are packed into 128-lane groups (G = 128//dh heads per group) and the
# grid gains a head-group axis: (batch, query-tile, group), group fastest.
# Per program only ONE group's K/V strip ([t_pad, 128]) and weight slices
# (Wq[:,g], Wo[g,:]) are resident, so VMEM stays bounded for any D; the
# out-projection partial sums accumulate across group steps in an f32 VMEM
# scratch (persistent across sequential grid iterations) and the residual is
# added on the last group. Per-head score/attend matmuls contract over dh
# (64): Mosaic pads the MXU contraction — ~2x on the score matmuls only
# (~9% of sublayer FLOPs at large-v3 shapes), a fair trade for fusing the
# whole sublayer. KV is produced directly in [B, groups, t_pad, 128] layout
# by _ln_kv_hsplit_kernel (no XLA transpose).
# ---------------------------------------------------------------------------


def _ln_kv_hsplit_kernel(
    x_ref, g_ref, bl_ref, wk_ref, wv_ref, bv_ref, k_ref, v_ref, *, eps
):
    """One (batch, time-tile, head-group) program of the grouped KV
    projection. wk/wv_ref: [d, gw] group slices; k/v_ref: [1,1,BLOCK_T,gw].
    LN is recomputed per group (VPU-cheap next to the matmuls)."""
    x = x_ref[0]
    ln = _ln_f32(x, g_ref[0], bl_ref[0], eps).astype(x.dtype)
    dims = (((1,), (0,)), ((), ()))
    k_ref[0, 0] = jax.lax.dot_general(
        ln, wk_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    v_ref[0, 0] = jax.lax.dot_general(
        ln, wv_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype) + bv_ref[0]


def _attn_sublayer_hsplit_kernel(
    lens_ref,  # scalar prefetch: [B] int32 kv lengths
    x_ref, g_ref, bl_ref, wq_ref, bq_ref, k_ref, v_ref, wo_ref, bo_ref,
    out_ref, acc_ref, *, eps, heads_per_group, n_groups, t_pad
):
    """One (batch, query-tile, head-group) program.

    x_ref: [1, BLOCK_T, d]; wq_ref: [d, gw] group slice; k/v_ref:
    [1, 1, t_pad, gw] resident group strip; wo_ref: [gw, d] slice;
    acc_ref: [BLOCK_T, d] f32 scratch accumulating the out projection
    across group steps; out written on the last group.
    """
    b = pl.program_id(0)
    hp = pl.program_id(2)
    x = x_ref[0]
    ln = _ln_f32(x, g_ref[0], bl_ref[0], eps).astype(x.dtype)
    q = jax.lax.dot_general(
        ln, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bq_ref[0]  # [BLOCK_T, gw]

    gw = q.shape[-1]
    dh = gw // heads_per_group
    scale = np.float32(1.0 / np.sqrt(dh))
    kv_len = lens_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_T, t_pad), 1)
    neg = jnp.finfo(jnp.float32).min
    k_g = k_ref[0, 0]
    v_g = v_ref[0, 0]

    @pl.when(hp == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    o_parts = []
    for h in range(heads_per_group):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k_g[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(col < kv_len, s, neg)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_parts.append(
            jax.lax.dot_general(
                p.astype(x.dtype), v_g[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    o = o_parts[0] if len(o_parts) == 1 else jnp.concatenate(o_parts, axis=1)
    acc_ref[...] += jax.lax.dot_general(
        o, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(hp == n_groups - 1)
    def _finish():
        out_ref[0] = x + acc_ref[...].astype(x.dtype) + bo_ref[0]


def _group_width(dh: int) -> int:
    """Heads are packed into 128-lane groups; dh must divide 128."""
    return 128


def attn_hsplit_supported(D: int, num_heads: int) -> bool:
    dh = D // num_heads
    return dh <= 128 and 128 % dh == 0 and D % 128 == 0


def attn_hsplit_fits_vmem(d: int, D: int, t_kv: int) -> bool:
    t_pad = -(-t_kv // BLOCK_T) * BLOCK_T
    gw = 128
    tile = (
        2 * 2 * 2 * (d * gw)               # double-buffered Wq + Wo slices
        + 2 * 2 * 2 * t_pad * gw           # double-buffered k/v group strips
        + 4 * BLOCK_T * t_pad              # f32 score tile
        + 4 * BLOCK_T * d                  # f32 acc scratch
        + 4 * BLOCK_T * d                  # f32 LN tile
        + 2 * 2 * 2 * BLOCK_T * d          # double-buffered x/y bf16
    )
    return tile <= _VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("num_heads", "eps"))
def _fused_attn_hsplit_impl(
    x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps
):
    B, T, d = x.shape
    D = wq.shape[1]
    gw = _group_width(D // num_heads)
    n_groups = D // gw
    heads_per_group = gw // (D // num_heads)
    t_pad = max(-(-T // BLOCK_T) * BLOCK_T, BLOCK_T)
    interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0))) if t_pad != T else x
    xp = xp.astype(jnp.bfloat16)
    gf = g.astype(jnp.float32)[None, :]
    blf = bl.astype(jnp.float32)[None, :]
    lens = jnp.minimum(kv_lengths.astype(jnp.int32), T)

    kv_shp = jax.ShapeDtypeStruct((B, n_groups, t_pad, gw), jnp.bfloat16)
    k4, v4 = pl.pallas_call(
        functools.partial(_ln_kv_hsplit_kernel, eps=np.float32(eps)),
        grid=(B, t_pad // BLOCK_T, n_groups),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i, hp: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i, hp: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i, hp: (0, 0)),
            pl.BlockSpec((d, gw), lambda b, i, hp: (0, hp)),
            pl.BlockSpec((d, gw), lambda b, i, hp: (0, hp)),
            pl.BlockSpec((1, gw), lambda b, i, hp: (0, hp)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BLOCK_T, gw), lambda b, i, hp: (b, hp, i, 0)),
            pl.BlockSpec((1, 1, BLOCK_T, gw), lambda b, i, hp: (b, hp, i, 0)),
        ],
        out_shape=[kv_shp, kv_shp],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * t_pad * d * D,
            bytes_accessed=2 * (3 * B * t_pad * d + 2 * d * D),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp, gf, blf,
        wk.astype(jnp.bfloat16), wv.astype(jnp.bfloat16),
        bv.astype(jnp.bfloat16)[None, :],
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, t_pad // BLOCK_T, n_groups),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i, hp, lens: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i, hp, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i, hp, lens: (0, 0)),
            pl.BlockSpec((d, gw), lambda b, i, hp, lens: (0, hp)),
            pl.BlockSpec((1, gw), lambda b, i, hp, lens: (0, hp)),
            pl.BlockSpec((1, 1, t_pad, gw), lambda b, i, hp, lens: (b, hp, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, gw), lambda b, i, hp, lens: (b, hp, 0, 0)),
            pl.BlockSpec((gw, d), lambda b, i, hp, lens: (hp, 0)),
            pl.BlockSpec((1, d), lambda b, i, hp, lens: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_T, d), lambda b, i, hp, lens: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((BLOCK_T, d), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_sublayer_hsplit_kernel,
            eps=np.float32(eps),
            heads_per_group=heads_per_group,
            n_groups=n_groups,
            t_pad=t_pad,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_pad, d), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * d * D + 4 * B * t_pad * t_pad * D
            + 2 * B * t_pad * D * d,
            bytes_accessed=2 * (2 * B * t_pad * d + 2 * B * t_pad * D),
            transcendentals=B * t_pad * t_pad * num_heads,
        ),
        interpret=interpret,
    )(
        lens, xp, gf, blf,
        wq.astype(jnp.bfloat16), bq.astype(jnp.bfloat16)[None, :],
        k4, v4,
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16)[None, :],
    )
    return out[:, :T, :].astype(x.dtype)


def _fattn_fwd(x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps):
    return _fused_attn_fwd_impl(
        x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths, num_heads, eps
    ), (x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths)


def _fattn_bwd(num_heads, eps, res, gout):
    x, g, bl, wq, bq, wk, wv, bv, wo, bo, kv_lengths = res
    _, vjp = jax.vjp(
        lambda *a: _attn_sublayer_reference(*a, kv_lengths, num_heads, eps),
        x, g, bl, wq, bq, wk, wv, bv, wo, bo,
    )
    return vjp(gout) + (None,)


fused_attention_sublayer.defvjp(_fattn_fwd, _fattn_bwd)


# ---------------------------------------------------------------------------
# WF-adapter variant: the TRAINING fast path (r4).
#
# WFDense computes y = x @ W + wf_scale * ((x @ A) * g) @ B per projection
# (models/adapters.py) — the effective weight is W + wf_scale * A diag(g) B.
# The forward FOLDS that effective weight in XLA (a [d,r]@[r,D] skinny matmul
# per projection, ~2 MFLOP at flagship shapes — once per step, not per
# token) and runs the unchanged fused kernels; the backward differentiates
# the FACTORED reference, so dA/dg/dB stay the cheap skinny contractions and
# the frozen-W cotangents remain DCE-able dead code under the training
# engine's stop_gradient masking (train/engine.py). Forward numerics differ
# from the module path only in bf16 rounding of (W + insert) vs
# (x@W + insert(x)); grads follow the factored semantics exactly
# (tests/test_fused_wf.py pins both).
# ---------------------------------------------------------------------------


def _fold_wf(w, f, wf_scale):
    """Effective weight W + wf_scale * A diag(g) B in f32."""
    return w + wf_scale * ((f["a"] * f["g"][None, :]) @ f["b"])


def _attn_sublayer_reference_wf(
    x, g, bl, base, wf, kv_lengths, num_heads, eps, wf_scale
):
    """XLA twin with the FACTORED WF inserts (module-path semantics:
    WFDense computes the frozen projection in bf16, then adds
    wf_scale * ((x@A)*g)@B evaluated in bf16)."""
    dt = x.dtype

    def insert(inp, name):
        f = wf[name]
        z = jnp.dot(inp, f["a"].astype(dt))
        z = z * f["g"].astype(dt)
        return wf_scale * jnp.dot(z, f["b"].astype(dt))

    ln = _ln_f32(x, g, bl, eps).astype(dt)
    dims = (((2,), (0,)), ((), ()))
    q = jax.lax.dot_general(ln, base["wq"].astype(dt), dims,
                            preferred_element_type=jnp.float32).astype(dt)
    q = q + base["bq"].astype(dt) + insert(ln, "q")
    k = jax.lax.dot_general(ln, base["wk"].astype(dt), dims,
                            preferred_element_type=jnp.float32).astype(dt)
    k = k + insert(ln, "k")
    v = jax.lax.dot_general(ln, base["wv"].astype(dt), dims,
                            preferred_element_type=jnp.float32).astype(dt)
    v = v + base["bv"].astype(dt) + insert(ln, "v")
    B, T, d = x.shape
    D = base["wq"].shape[1]
    dh = D // num_heads
    qh = q.reshape(B, T, num_heads, dh)
    kh = k.reshape(B, T, num_heads, dh)
    vh = v.reshape(B, T, num_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    mask = jnp.arange(T)[None, None, None, :] < kv_lengths[:, None, None, None]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                      preferred_element_type=jnp.float32).astype(dt)
    attn = attn.reshape(B, T, D)
    out = jax.lax.dot_general(attn, base["wo"].astype(dt), dims,
                              preferred_element_type=jnp.float32).astype(dt)
    out = out + base["bo"].astype(dt) + insert(attn, "o")
    return x + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention_sublayer_wf(
    x, g, bl, base, wf, num_heads, eps, wf_scale, kv_lengths
):
    """y = x + out_proj(MHA(LayerNorm(x))) with WF-adapter inserts on all
    four projections, fused for TRAINING forwards. base =
    {wq,bq,wk,wv,bv,wo,bo}; wf = {q|k|v|o: {a,g,b}} (WFDense param layout);
    kv_lengths int32 [B] (diff-arg position so custom_vjp sees a pytree of
    arrays; its cotangent is None)."""
    return _fused_attn_wf_fwd_impl(
        x, g, bl, base, wf, num_heads, eps, wf_scale, kv_lengths
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "wf_scale"))
def _fused_attn_wf_fwd_impl(
    x, g, bl, base, wf, num_heads, eps, wf_scale, kv_lengths
):
    return _fused_attn_fwd_impl(
        x, g, bl,
        _fold_wf(base["wq"], wf["q"], wf_scale), base["bq"],
        _fold_wf(base["wk"], wf["k"], wf_scale),
        _fold_wf(base["wv"], wf["v"], wf_scale), base["bv"],
        _fold_wf(base["wo"], wf["o"], wf_scale), base["bo"],
        kv_lengths, num_heads, eps,
    )


def _fattn_wf_fwd(x, g, bl, base, wf, num_heads, eps, wf_scale, kv_lengths):
    out = _fused_attn_wf_fwd_impl(
        x, g, bl, base, wf, num_heads, eps, wf_scale, kv_lengths
    )
    return out, (x, g, bl, base, wf, kv_lengths)


def _fattn_wf_bwd(num_heads, eps, wf_scale, res, gout):
    x, g, bl, base, wf, kv_lengths = res
    _, vjp = jax.vjp(
        lambda *a: _attn_sublayer_reference_wf(
            *a, kv_lengths, num_heads, eps, wf_scale
        ),
        x, g, bl, base, wf,
    )
    return vjp(gout) + (None,)


fused_attention_sublayer_wf.defvjp(_fattn_wf_fwd, _fattn_wf_bwd)
