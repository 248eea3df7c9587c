"""Fused CTC-head matmul + argmax Pallas kernel for greedy decode.

Greedy CTC decode needs only argmax_v(head(x)) per frame — log_softmax is
monotonic, so argmax over logits equals argmax over log-probs. The XLA path
the training/beam stacks use materializes logits [B, T', V] f32 AND
log_probs [B, T', V] in HBM (~3.3 GB at the flagship's B=128, T'=750,
V=4336) before a separate argmax pass streams it all back. This kernel
computes the head matmul tile-by-tile and reduces to token ids entirely in
VMEM: HBM traffic drops to one read of x (~100 MB bf16), one read of the
weights (~4.5 MB, resident across grid steps), and a [B, T'] int32 write.

TPU-native replacement for the reference's CUDA argmax-over-log-probs
greedy path (SURVEY.md 3.2 "encoder → log_softmax → greedy argmax";
/root/reference/requirements.txt:75 — torch CUDA kernels).

The head weights stay resident in VMEM across the (batch-block, time-block)
grid because their BlockSpec index map is constant — Mosaic skips the
re-fetch. The vocab axis is processed in V_CHUNK-column slices with a
running (max, argmax) carry so the logits tile never exceeds
BLOCK_B*BLOCK_T x V_CHUNK. Blocks are [BLOCK_B, BLOCK_T] in (batch, time)
so the int32 output block satisfies the TPU (8, 128) tiling rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_B = 8
BLOCK_T = 128
V_CHUNK = 512
# full head weights + one logits tile + double-buffered x blocks must fit
# comfortably in the ~16 MB of VMEM; above this the caller falls back to XLA
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _head_argmax_kernel(x_ref, w_ref, b_ref, out_ref, *, v_chunks):
    """One (batch-block, time-block) program.

    x_ref: [BLOCK_B, BLOCK_T, d] VMEM   (compute-dtype activations)
    w_ref: [d, Vp] VMEM                 (bf16 head weights, grid-resident)
    b_ref: [1, Vp] VMEM                 (f32 bias; padding columns = -1e30)
    out_ref: [BLOCK_B, BLOCK_T] int32
    """
    rows = BLOCK_B * BLOCK_T
    x = x_ref[...].reshape(rows, x_ref.shape[2])

    # Static Python unroll over the vocab chunks — NOT lax.fori_loop: the
    # loop-carried (max, argmax) dependency serialized the chunk dots, and
    # unrolling lets Mosaic software-pipeline MXU matmuls against the VPU
    # reduction of the previous chunk. Measured 1.74x (4.86 -> 2.80 ms/iter
    # at flagship B=128/T'=750/V=4336, bit-identical ids;
    # examples/profile_head_kernel.py, 2026-08-19).
    m = jnp.full((rows, 1), -jnp.inf, jnp.float32)
    idx = jnp.zeros((rows, 1), jnp.int32)
    for c in range(v_chunks):
        w = w_ref[:, c * V_CHUNK : (c + 1) * V_CHUNK]
        b = b_ref[0, c * V_CHUNK : (c + 1) * V_CHUNK]
        logits = (
            jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b[None, :]
        )  # [rows, VC] f32
        local_m = jnp.max(logits, axis=1, keepdims=True)
        local_i = jnp.argmax(logits, axis=1, keepdims=True).astype(jnp.int32)
        upd = local_m > m  # strict: earlier chunks win ties, like jnp.argmax
        m = jnp.where(upd, local_m, m)
        idx = jnp.where(upd, local_i + c * V_CHUNK, idx)
    out_ref[...] = idx[:, 0].reshape(BLOCK_B, BLOCK_T)


@jax.jit
def fused_head_argmax(
    x: jnp.ndarray,       # [B, T, d] activations (compute dtype)
    kernel: jnp.ndarray,  # [d, V] f32 head weights
    bias: jnp.ndarray,    # [V] f32
) -> jnp.ndarray:
    """-> argmax token ids [B, T] int32, without materializing logits in HBM.

    Bit-matches `jnp.argmax(head(x), -1)` for the bf16-operand/f32-accum
    head (models/ctc_model.py::CTCHead): same operand casts, same
    accumulation dtype, first-occurrence tie-breaking.
    """
    B, T, d = x.shape
    V = kernel.shape[1]
    b_pad = max(-(-B // BLOCK_B) * BLOCK_B, BLOCK_B)
    t_pad = max(-(-T // BLOCK_T) * BLOCK_T, BLOCK_T)
    v_pad = max(-(-V // V_CHUNK) * V_CHUNK, V_CHUNK)
    tile_bytes = (
        2 * d * v_pad                       # resident bf16 weights
        + 4 * BLOCK_B * BLOCK_T * V_CHUNK   # logits tile
        + 2 * 2 * BLOCK_B * BLOCK_T * d     # double-buffered x blocks
    )
    if tile_bytes > _VMEM_BUDGET_BYTES:
        # vocab too large for a VMEM-resident head: XLA fallback
        logits = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            kernel.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    interpret = jax.default_backend() != "tpu"  # CPU tests run the interpreter
    xp = x
    if (b_pad, t_pad) != (B, T):
        xp = jnp.pad(x, ((0, b_pad - B), (0, t_pad - T), (0, 0)))
    wp = jnp.pad(kernel, ((0, 0), (0, v_pad - V))).astype(jnp.bfloat16)
    # -1e30 bias on padding columns keeps them out of the argmax
    bp = jnp.pad(bias.astype(jnp.float32), (0, v_pad - V), constant_values=-1e30)
    xp = xp.astype(jnp.bfloat16)

    grid = (b_pad // BLOCK_B, t_pad // BLOCK_T)
    out = pl.pallas_call(
        functools.partial(_head_argmax_kernel, v_chunks=v_pad // V_CHUNK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_B, BLOCK_T, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((d, v_pad), lambda b, i: (0, 0)),
            pl.BlockSpec((1, v_pad), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_B, BLOCK_T), lambda b, i: (b, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * t_pad * d * v_pad,
            bytes_accessed=xp.size * 2 + wp.size * 2 + 4 * b_pad * t_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, bp[None, :])
    return out[:B, :T]
