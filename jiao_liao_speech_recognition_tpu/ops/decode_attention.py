"""Grouped-head Pallas decode attention over head-major KV caches.

AR decode attention is a pure HBM-streaming problem: Tq<=8 query rows
re-read the whole [B, H, Tk, dh] K/V cache every generated token, so the
kernel's only job is to stream cache bytes at memory speed. Two layout
facts dominate (measured on the v5e, examples/profile_int8_attn_kernel.py
and docs/PERFORMANCE.md):

- A grid of B*H single-head programs is catastrophically DMA-issue-bound
  (31x slower than grouped at whisper-large-v3 decode shapes): each grid
  step re-issues several ~100-200 KB DMAs and the pipeline never deepens.
  Grouping `hg` heads per program (grid=(B, H/hg), hg = the largest
  divisor of H whose tiles fit a VMEM budget) keeps the stream deep; the
  per-head loop unrolls at trace time.
- XLA's own batched-matvec attention over the same head-major layout runs
  ~2.5x off the streaming roofline for bf16 caches and does not stream
  int8 caches at all (it materializes a dequantized copy), so BOTH cache
  dtypes route here.

One kernel serves both dtypes: bf16 caches (plain decode / serving
without quantization) and int8 caches with per-key-position f32 scales
(ops/quant.quantize_kv — both attention contractions commute with a
per-position scale). The int8 entry point `ops.quant.int8_decode_attention`
delegates here.

Contract: keys are valid on the PREFIX [0, kv_lens[b]); Tk must be a
multiple of 128 (caches are stored kernel-ready, padded once at build
time — models/whisper.init_cache — because padding per decode step
re-copies the whole cache and erases the win).

Replaces the reference's cuDNN/cuBLAS decode attention
(/root/reference/requirements.txt:75) with a TPU-first design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one program's K/V tiles (+ scale rows when int8). 16 MB
# physical, but Pallas DOUBLE-BUFFERS every input block (the next grid
# step's tiles stream while this one computes), so the working set is 2x
# the block bytes plus q/out: 4 MB keeps bf16 caches at hg=10 for
# whisper-large-v3 shapes (8 MB compiled fine for int8's hg=20 but
# overflowed VMEM for bf16; hg=4/10/20 all measured the same speed —
# examples/profile_int8_attn_kernel.py).
_DECODE_ATTN_VMEM_BUDGET = 4 * 1024 * 1024

# grid granularity of the key horizon: caches must be stored with
# Tk % KERNEL_TK == 0 (padded ONCE at build time — per-step padding
# re-copies the whole cache and erases the streaming win)
KERNEL_TK = 128


def round_tk(t: int) -> int:
    """Key horizon rounded up to the kernel granularity (cache-build-time
    sizing for init_cache; see KERNEL_TK)."""
    return -(-t // KERNEL_TK) * KERNEL_TK


def pad_time_to_tk(a, time_axis: int):
    """Zero-pad `a` along `time_axis` to the kernel granularity (no-op when
    already aligned). Build-time only — never call per decode step."""
    t = a.shape[time_axis]
    t_pad = round_tk(t)
    if t_pad == t:
        return a
    pads = [(0, 0)] * a.ndim
    pads[time_axis] = (0, t_pad - t)
    return jnp.pad(a, pads)


def _per_head_bytes(Tk: int, dh: int, quantized: bool) -> int:
    return Tk * (2 * dh + 8) if quantized else Tk * (4 * dh)


def decode_attention_fits(Tk: int, dh: int, quantized: bool) -> bool:
    """True when even a single head's K/V tiles fit the VMEM budget — the
    dispatch gates consult this so oversized horizons fall back to the XLA
    path instead of failing the Mosaic compile at serve time."""
    return _per_head_bytes(Tk, dh, quantized) <= _DECODE_ATTN_VMEM_BUDGET


def _pick_head_group(H: int, per_head_bytes: int) -> int:
    """Largest divisor of H whose per-program tiles fit the VMEM budget."""
    best = 1
    for hg in range(1, H + 1):
        if H % hg == 0 and hg * per_head_bytes <= _DECODE_ATTN_VMEM_BUDGET:
            best = hg
    return best


def _attend_head(q, k_raw, v_raw, ks_row, vs_row, idx, length, scale):
    """One head's decode attention on VMEM-resident tiles.

    q [tq, dh] bf16; k_raw/v_raw [tk, dh] bf16 or int8 (int8 converts to
    bf16 here, in VMEM, so HBM streamed 1 byte/element); ks_row/vs_row
    [1, tk] f32 per-position scales or None (bf16 caches)."""
    kf = k_raw.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [tq, tk]
    s = s * (ks_row * scale) if ks_row is not None else s * scale
    # finfo.min (not -inf) keeps a zero-length row finite (uniform softmax)
    # instead of NaN from exp(-inf - -inf) — matching the mul-reduce
    # reference branch in models/layers._int8_cross_attention
    s = jnp.where(idx < length, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pv = (p * vs_row).astype(jnp.bfloat16) if vs_row is not None else p.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        pv, v_raw.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _grouped_kernel(len_ref, q_ref, k_ref, *rest, scale, hg, quantized):
    """One (batch, head-group) program.

    q_ref [1, hg, tq, dh] bf16; k/v refs [1, hg, tk, dh]; when quantized,
    scale refs [1, hg, 1, tk] f32 interleave as (k, ks, v, vs); len_ref
    [B] SMEM valid key lengths."""
    if quantized:
        ks_ref, v_ref, vs_ref, out_ref = rest
    else:
        (v_ref, out_ref), ks_ref, vs_ref = rest, None, None
    b = pl.program_id(0)
    length = len_ref[b]
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[2], k_ref.shape[2]), 1
    )
    for h in range(hg):
        out_ref[0, h] = _attend_head(
            q_ref[0, h],
            k_ref[0, h],
            v_ref[0, h],
            ks_ref[0, h] if quantized else None,
            vs_ref[0, h] if quantized else None,
            idx,
            length,
            scale,
        ).astype(out_ref.dtype)


def grouped_decode_attention(qh, k, v, kv_lens, k_scale=None, v_scale=None):
    """Decode-step attention over head-major KV caches on TPU.

    qh [B, H, Tq<=8, dh] (bf16/f32); k/v [B, H, Tk, dh] bf16 — or int8
    with k_scale/v_scale f32 [B, H, Tk] per-key-position scales; kv_lens
    int32 [B] valid PREFIX lengths. Tk % 128 == 0 (callers store caches
    kernel-ready; see module docstring). Returns [B, H, Tq, dh] f32.
    Head-major in, head-major out: blocks slice [B, H, ...] directly (no
    transpose), unlike the bf16 flash path's [B,T,H,D] layout."""
    B, H, Tq, dh = qh.shape
    Tk = k.shape[2]
    if Tk % KERNEL_TK != 0:
        raise ValueError(f"Tk must be 128-padded at cache build time, got {Tk}")
    quantized = k_scale is not None
    if not decode_attention_fits(Tk, dh, quantized):
        # dispatch gates check this first; a raw call with an oversized
        # horizon would otherwise fail deep in the Mosaic compile
        raise ValueError(
            f"one head's K/V tiles (Tk={Tk}, dh={dh}) exceed the VMEM "
            "budget; route this shape through the XLA path"
        )
    tq_pad = 8
    hg = _pick_head_group(H, _per_head_bytes(Tk, dh, quantized))
    scale = 1.0 / np.sqrt(dh)
    qb = jnp.pad(
        qh.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, tq_pad - Tq), (0, 0))
    )
    lens = jnp.minimum(kv_lens.astype(jnp.int32), Tk)
    blk4 = pl.BlockSpec((1, hg, tq_pad, dh), lambda b, h, lens: (b, h, 0, 0))
    kv_blk = pl.BlockSpec((1, hg, Tk, dh), lambda b, h, lens: (b, h, 0, 0))
    # scales carried as [B, H, 1, Tk]: a trailing (1, Tk) block shape is
    # "equal to the array dims" so it passes the Mosaic (8, 128)-
    # divisibility rule; a 2-D (1, Tk) block would not
    sc_blk = pl.BlockSpec((1, hg, 1, Tk), lambda b, h, lens: (b, h, 0, 0))
    if quantized:
        in_specs = [blk4, kv_blk, sc_blk, kv_blk, sc_blk]
        operands = (
            qb, k, k_scale.astype(jnp.float32)[:, :, None, :],
            v, v_scale.astype(jnp.float32)[:, :, None, :],
        )
        kv_bytes = 2 * B * H * Tk * (dh + 4)
    else:
        in_specs = [blk4, kv_blk, kv_blk]
        operands = (qb, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
        kv_bytes = 4 * B * H * Tk * dh
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hg),
        in_specs=in_specs,
        out_specs=blk4,
    )
    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel, scale=scale, hg=hg, quantized=quantized
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, tq_pad, dh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * tq_pad * Tk * dh,
            bytes_accessed=kv_bytes,
            transcendentals=B * H * tq_pad * Tk,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lens, *operands)
    return out[:, :, :Tq, :]
