"""Weight-only int8 quantization for HBM-bound autoregressive decode.

Whisper AR decode streams the ENTIRE decoder weight tree from HBM every
token (docs/PERFORMANCE.md: large-v3 runs at the HBM roofline — ~3.1 GB of
bf16 weights + KV caches per step). Halving the weight bytes halves the
dominant term, so a per-output-channel symmetric int8 representation of the
decoder Dense kernels buys up to ~1.5-2x tokens/s at small batch with no
retraining.

TPU-native division of labor: XLA:TPU cannot fuse a dtype-convert into a
dot operand read, so `x @ wq.astype(bf16)` would MATERIALIZE a bf16 copy of
the weights in HBM each step — erasing the entire win. The Pallas kernel
here dequantizes int8 tiles in VMEM instead: HBM only ever sees int8 bytes.
Per-output-channel scales commute out of the contraction
(x @ (wq * s[None, :]) == (x @ wq) * s), so the kernel accumulates plain
bf16 MXU tiles in f32 and applies the scale once at the end.

Replaces (beyond-parity) the reference's fp16-only inference stack
(/root/reference/requirements.txt:75 — torch 2.1 cu118, no quantization
pins). Serving entry point: ModelBundle.quantize() (models/bundle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import grouped_decode_attention, pad_time_to_tk

# rows beyond this take the XLA path: long-sequence (teacher-forced) calls
# are MXU-bound, where the one-off dequant materialization amortizes
MAX_KERNEL_ROWS = 64


def _pick_block(dim_pad: int, candidates) -> int:
    """Largest candidate dividing the padded dim: big tiles = few grid
    programs = deep DMA pipelining (the kernel is HBM-streaming-bound)."""
    for c in candidates:
        if dim_pad % c == 0:
            return c
    return candidates[-1]


def quantize_int8(w: jnp.ndarray):
    """Per-output-channel symmetric int8: w [d_in, d_out] float ->
    (q int8 [d_in, d_out], scale f32 [d_out]) with w ~= q * scale[None, :].
    Channels that are exactly zero keep scale 0 (dequantize to 0)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(w / safe[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kv(a: jnp.ndarray):
    """Per-position int8 for KV caches: a [..., T, dh] -> (q int8 same
    shape, scale f32 [..., T]) with a ~= q * scale[..., None]. Both
    attention contractions commute with a per-KEY-POSITION scale:
    logits[t] = (q_vec . K[t]) * sk[t] and out = (probs * sv) @ V, so the
    decode step can read int8 rows and fold the scales in elementwise —
    no dequantized copy of the cache ever exists in HBM (the read path
    uses broadcast-multiply + reduce, which XLA input-fuses over the int8
    arrays; a dot would re-materialize them in bf16)."""
    a = jnp.asarray(a)
    amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(
        jnp.round(a.astype(jnp.float32) / safe[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def int8_decode_attention(qh, kq, ks, vq, vs, kv_lens):
    """Decode-step attention over int8 head-major cross caches on TPU.

    qh [B, H, Tq<=8, dh] (bf16/f32); kq/vq int8 [B, H, Tk, dh]; ks/vs f32
    [B, H, Tk]; kv_lens int32 [B]. Returns [B, H, Tq, dh] f32.

    Thin shim over ops/decode_attention.grouped_decode_attention (the
    grouped-head streaming kernel; see that module for the layout story):
    128-pads Tk if the caller didn't — a no-op for caches stored
    kernel-ready by models/whisper.init_cache (scales 0 in padding)."""
    Tk = kq.shape[2]
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), Tk)
    kq, vq = pad_time_to_tk(kq, 2), pad_time_to_tk(vq, 2)
    ks, vs = pad_time_to_tk(ks, 2), pad_time_to_tk(vs, 2)
    return grouped_decode_attention(qh, kq, vq, kv_lens, k_scale=ks, v_scale=vs)


def _int8_logits_kernel(x_ref, q_ref, s_ref, out_ref):
    """One vocab-tile of tied-embedding logits: out = (x @ tile^T) * s.

    x_ref [R8, D] bf16; q_ref [TV, D] int8 (ROW-major — the same layout the
    embedding-lookup gather wants, so no [V, D] -> [D, V] transpose copy of
    the table ever exists); s_ref [1, TV] f32 per-vocab-row scales."""
    xf = x_ref[...]
    qf = q_ref[...].astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        xf, qf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R8, TV]
    out_ref[...] = s * s_ref[...]


def int8_tied_logits(x: jnp.ndarray, q_vd: jnp.ndarray, scale_v: jnp.ndarray):
    """Decode-step logits against a ROW-major int8 embedding table.

    x [R, D] (R = batch tokens this step), q_vd int8 [V, D] (the tied
    nn.Embed layout, quantized per vocab row), scale_v f32 [V].
    Returns f32 [R, V] == (x @ dequant(q_vd).T), streaming the table as
    int8: contraction runs over q_vd's LAST dim, so the MXU reads the
    row-major tile directly and no transposed copy is materialized.

    Reference semantics (off-TPU / long teacher-forced rows): dequantize
    to bf16 and matmul — see _int8_tied_logits_xla. Mirrors whisper's tied
    embedding head (HF modeling_whisper proj_out shares embed_tokens)."""
    R, D = x.shape
    if (
        jax.default_backend() != "tpu"
        or D % 128 != 0
        or R > MAX_KERNEL_ROWS
    ):
        return _int8_tied_logits_xla(x, q_vd, scale_v)
    return _int8_tied_logits_pallas(x, q_vd, scale_v)


def _int8_tied_logits_pallas(x, q_vd, scale_v):
    """The streaming kernel path (interpret mode off-TPU, for tests)."""
    R, D = x.shape
    V = q_vd.shape[0]
    r_pad = -(-R // 8) * 8
    # the table is padded to the tile anyway, so take a big tile outright:
    # 1024x1280 int8 = 1.3 MB/program (deep DMA pipelining, ~51 programs at
    # large-v3 V=51866) while staying well under VMEM with double buffering
    tv = min(1024, -(-V // 128) * 128)
    v_pad = -(-V // tv) * tv
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, r_pad - R), (0, 0)))
    qb = jnp.pad(q_vd, ((0, v_pad - V), (0, 0)))
    sb = jnp.pad(scale_v.astype(jnp.float32), (0, v_pad - V))[None, :]
    out = pl.pallas_call(
        _int8_logits_kernel,
        grid=(v_pad // tv,),
        in_specs=[
            pl.BlockSpec((r_pad, D), lambda v: (0, 0)),
            pl.BlockSpec((tv, D), lambda v: (v, 0)),
            pl.BlockSpec((1, tv), lambda v: (0, v)),
        ],
        out_specs=pl.BlockSpec((r_pad, tv), lambda v: (0, v)),
        out_shape=jax.ShapeDtypeStruct((r_pad, v_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * v_pad * D,
            bytes_accessed=v_pad * D + 4 * v_pad + 2 * r_pad * D,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xb, qb, sb)
    return out[:R, :V]


def _int8_tied_logits_xla(x, q_vd, scale_v):
    """Dequantize-and-matmul reference: correct everywhere; used off-TPU and
    for long teacher-forced / large-batch-beam rows where the MXU amortizes
    the one-off dequant. Dequantizes to BF16 (like _int8_matmul_xla) so the
    materialized copy is no bigger than the bf16 table the quantization
    replaces; accumulation stays f32 via preferred_element_type."""
    w = (q_vd.astype(jnp.float32) * scale_v[:, None].astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _int8_matmul_xla(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """Reference/fallback: dequantized bf16 matmul (materializes the bf16
    weights — correct everywhere, fast only where compute dominates)."""
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * scale).astype(x.dtype)


def _int8_gemv_kernel(x_ref, q_ref, s_ref, out_ref, acc_ref, *, n_in):
    j = pl.program_id(1)  # inner (fastest) grid dim: the contraction tiles

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 -> bf16 happens in VMEM; HBM traffic stays 1 byte/weight
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], q_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_in - 1)
    def _finish():
        out_ref[...] = (acc_ref[...] * s_ref[...]).astype(out_ref.dtype)


@jax.jit
def _int8_matmul_pallas(x2: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    rows, d_in = x2.shape
    d_out = q.shape[1]
    r_pad = max(8, -(-rows // 8) * 8)
    in_pad = -(-d_in // 256) * 256
    out_pad = -(-d_out // 256) * 256
    # whole-contraction IN tiles when they fit (d<=2560: ONE grid step per
    # out tile) and wide OUT tiles: the weight matrix streams exactly once
    # either way, but fewer/larger DMAs pipeline far better
    block_in = _pick_block(in_pad, (2560, 1280, 1024, 512, 256))
    block_out = _pick_block(out_pad, (1024, 512, 256))
    xp = jnp.pad(x2.astype(jnp.bfloat16), ((0, r_pad - rows), (0, in_pad - d_in)))
    qp = jnp.pad(q, ((0, in_pad - d_in), (0, out_pad - d_out)))
    sp = jnp.pad(scale.astype(jnp.float32), (0, out_pad - d_out))[None, :]
    n_in = in_pad // block_in
    out = pl.pallas_call(
        functools.partial(_int8_gemv_kernel, n_in=n_in),
        grid=(out_pad // block_out, n_in),
        in_specs=[
            pl.BlockSpec((r_pad, block_in), lambda o, j: (0, j)),
            pl.BlockSpec((block_in, block_out), lambda o, j: (j, o)),
            pl.BlockSpec((1, block_out), lambda o, j: (0, o)),
        ],
        out_specs=pl.BlockSpec((r_pad, block_out), lambda o, j: (0, o)),
        out_shape=jax.ShapeDtypeStruct((r_pad, out_pad), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((r_pad, block_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * in_pad * out_pad,
            bytes_accessed=in_pad * out_pad + 2 * r_pad * (in_pad + out_pad),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, qp, sp)
    return out[:rows, :d_out]


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """y = (x @ dequant(q, scale)) with streaming VMEM dequantization on
    TPU for short-row (decode-step) shapes. x [..., d_in] bf16/f32;
    q int8 [d_in, d_out]; scale f32 [d_out]. Returns x.dtype."""
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if jax.default_backend() != "tpu" or rows > MAX_KERNEL_ROWS:
        return _int8_matmul_xla(x, q, scale)
    x2 = x.reshape(rows, x.shape[-1])
    y = _int8_matmul_pallas(x2, q, scale)
    return y.reshape(*lead, q.shape[1]).astype(x.dtype)
