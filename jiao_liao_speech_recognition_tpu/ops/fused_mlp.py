"""Fused transformer-sublayer Pallas kernels (inference fast paths).

Two kernels, both tiling over (batch, time) with grid-resident weights
(constant BlockSpec index maps), used by models/layers.py::TransformerBlock:

* ``fused_ln_mlp_residual`` — y = x + fc2(gelu(fc1(LayerNorm(x)))): neither
  the LayerNorm output nor the [B, T, mlp_dim] hidden tensor (~200 MB bf16
  per flagship block at B=128 x 30 s) touches HBM; per sublayer the traffic
  drops to one read of x and one write of y. Measured 1.22x on the full
  flagship encoder (docs/PERFORMANCE.md).
* ``fused_ln_qkv`` — (q, k, v) = LayerNorm(x) @ (Wq, Wk, Wv) + biases, as
  three separate contiguous outputs feeding the head-packed flash kernel.
  (A packed [B, T, 3D] single-output variant measured SLOWER — the flash
  kernel's K/V block reads stride badly over the 3x-wide array — so the
  outputs stay separate.)

Numerics mirror the flax modules they replace (models/layers.py): f32
LayerNorm statistics, bf16 operands, f32 MXU accumulation rounded to bf16
before the bias add. GELU follows the model family's `gelu_form`: the
flagship CTC/joint family uses tanh-form on BOTH the module and kernel
paths (exact agreement in intent; tanh is hardware-cheap — +12% e2e RTFx
over erf), while Whisper keeps exact-form GELU (HF-checkpoint logit
parity) via an erf rational approximation in f32 (<=1.5e-7 abs — far
below one bf16 ulp; Mosaic TC can't lower erf directly, see
_erf_gelu_f32). bench.py's --parity mode asserts TPU-fused vs CPU-module
greedy TEXT equality end-to-end every round.

TPU-native replacement for the reference's fused CUDA epilogues
(torch 2.1 inductor fusions, /root/reference/requirements.txt:75).

Training never routes here (the fast paths are gated on deterministic
inference in models/layers.py), but custom_vjps with the reference XLA
backward keep gradients correct if a caller differentiates through them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_T = 256
# weights + hidden tile + double-buffered x/y tiles must fit in ~16 MB VMEM
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _tanh_gelu_f32(hf: jnp.ndarray) -> jnp.ndarray:
    """Tanh-form GELU 0.5*h*(1+tanh(sqrt(2/pi)*(h+0.044715 h^3))) — the
    form the flagship family computes on EVERY path (module + kernel), so
    fused-vs-module agreement is exact-in-intent. tanh lowers to a cheap
    hardware-assisted op on the VPU: measured +12% end-to-end RTFx over the
    erf rational form at B=128 x 30 s (45.0k vs 40.0k; an FMA-only deg-11
    Chebyshev erf measured WORSE than the rational form, 39.3k — generic
    polynomial work can't beat the tanh unit)."""
    # op order mirrors jax.nn.gelu(approximate=True) exactly (x * cdf with
    # x**3, not 0.5*x*(1+tanh) with x*x*x) so module and kernel paths agree
    # bit-for-bit wherever tanh itself does
    c = np.float32(np.sqrt(2.0 / np.pi))
    cdf = 0.5 * (1.0 + jnp.tanh(c * (hf + np.float32(0.044715) * (hf ** 3))))
    return hf * cdf


def _erf_gelu_f32(hf: jnp.ndarray) -> jnp.ndarray:
    """Exact-form GELU 0.5*h*(1+erf(h/sqrt(2))) for Mosaic, which can't
    lower erf/erfc directly. erf is the Abramowitz–Stegun 7.1.26 rational
    approximation (|abs err| <= 1.5e-7 in f32) — ~25x below one bf16 ulp at
    |gelu|~1, so after the kernel's bf16 cast this matches the module path's
    jax.nn.gelu(approximate=False) except for values within ~1e-7 of a bf16
    rounding boundary. (The tanh-form GELU sits 3e-3 away — a full bf16
    ulp — which is what kept TPU and CPU logits visibly apart; Whisper
    keeps this form because HF-checkpoint logit parity pins exact GELU.)"""
    x = hf * np.float32(1.0 / np.sqrt(2.0))
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + np.float32(0.3275911) * ax)
    poly = t * (
        np.float32(0.254829592)
        + t * (
            np.float32(-0.284496736)
            + t * (
                np.float32(1.421413741)
                + t * (np.float32(-1.453152027) + t * np.float32(1.061405429))
            )
        )
    )
    erf_ax = 1.0 - poly * jnp.exp(-ax * ax)
    erf = jnp.sign(x) * erf_ax
    return 0.5 * hf * (1.0 + erf)


def _gelu_f32(hf: jnp.ndarray, gelu_form: str) -> jnp.ndarray:
    """Kernel GELU dispatch. 'tanh': flagship family — matches the module
    path's jax.nn.gelu(approximate=True) and is ~12% faster end-to-end.
    'erf': Whisper family — matches jax.nn.gelu(approximate=False) to
    <=1.5e-7 (HF-checkpoint logit parity pins the exact form)."""
    if gelu_form == "tanh":
        return _tanh_gelu_f32(hf)
    if gelu_form == "erf":
        return _erf_gelu_f32(hf)
    raise ValueError(f"unknown gelu_form {gelu_form!r} (want 'tanh'|'erf')")


def mlp_fits_vmem(d: int, mlp: int) -> bool:
    tile = (
        2 * (d * mlp + mlp * d)          # resident bf16 weights
        + 4 * BLOCK_T * mlp              # f32 hidden tile
        + 2 * 2 * 2 * BLOCK_T * d        # double-buffered bf16 x/y tiles
    )
    return tile <= _VMEM_BUDGET_BYTES


def _mlp_reference(x, w1, b1, w2, b2, gelu_form="erf"):
    """XLA twin (same numerics contract) — backward path + fallback."""
    dt = x.dtype
    h = jax.lax.dot_general(
        x, w1.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1.astype(dt)
    h = jax.nn.gelu(
        h.astype(jnp.float32), approximate=gelu_form == "tanh"
    ).astype(dt)
    return jax.lax.dot_general(
        h, w2.astype(dt), (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b2.astype(dt)


# ---------------------------------------------------------------------------
# LN + MLP + residual: y = x + fc2(gelu(fc1(LayerNorm(x))))
#
# XLA materializes the LayerNorm output in HBM (the reduction blocks fusion
# into the fc1 matmul prologue), costing two extra full-tensor passes per
# block plus the residual's re-read of x. Fusing the whole pre-LN MLP
# sublayer reads x once and writes y once.
# ---------------------------------------------------------------------------


def _ln_mlp_res_kernel(
    x_ref, g_ref, bl_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, eps,
    gelu_form,
):
    """One (batch, time-block) program of y = x + MLP(LN(x)).

    x_ref: [1, BLOCK_T, d] bf16; g/bl: [1, d] f32 (LayerNorm scale/bias);
    w/b as in _mlp_kernel; out_ref: [1, BLOCK_T, d] bf16.
    """
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps)) * g_ref[0] + bl_ref[0]
    h = jax.lax.dot_general(
        ln.astype(x.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b1_ref[0]
    hf = h.astype(jnp.float32)
    h = _gelu_f32(hf, gelu_form).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]
    out_ref[0] = x + y


def _ln_mlp_reference(x, g, bl, w1, b1, w2, b2, eps, gelu_form="erf"):
    """XLA twin with flax nn.LayerNorm numerics (f32 stats, bf16 output)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = ((xc * jax.lax.rsqrt(var + eps)) * g + bl).astype(x.dtype)
    return x + _mlp_reference(ln, w1, b1, w2, b2, gelu_form)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_mlp_residual(x, g, bl, w1, b1, w2, b2, eps=1e-5, gelu_form="erf"):
    """y = x + fc2(gelu(fc1(LayerNorm(x)))) — the whole pre-LN MLP sublayer
    of TransformerBlock in one VMEM-resident kernel. x bf16 [B, T, d];
    g/bl f32 [d] LayerNorm params; weights f32 (cast to bf16 like nn.Dense).
    gelu_form 'tanh' (flagship: module path uses the same form — exact
    agreement in intent, ~12% faster) or 'erf' (Whisper: HF logit parity)."""
    return _fused_ln_mlp_fwd_impl(x, g, bl, w1, b1, w2, b2, eps, gelu_form)


@functools.partial(jax.jit, static_argnames=("eps", "gelu_form"))
def _fused_ln_mlp_fwd_impl(x, g, bl, w1, b1, w2, b2, eps, gelu_form="erf"):
    B, T, d = x.shape
    mlp = w1.shape[1]
    if not mlp_fits_vmem(d, mlp):
        # wide MLPs (large-v3: d=1280, mlp=5120): hidden-chunk-split kernel
        if mlp_csplit_fits_vmem(d, mlp):
            return _fused_ln_mlp_csplit_impl(
                x, g, bl, w1, b1, w2, b2, eps, gelu_form
            )
        return _ln_mlp_reference(x, g, bl, w1, b1, w2, b2, eps, gelu_form)
    t_pad = max(-(-T // BLOCK_T) * BLOCK_T, BLOCK_T)
    interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0))) if t_pad != T else x
    xp = xp.astype(jnp.bfloat16)
    gf = g.astype(jnp.float32)[None, :]
    blf = bl.astype(jnp.float32)[None, :]
    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)
    b1b = b1.astype(jnp.bfloat16)[None, :]
    b2b = b2.astype(jnp.bfloat16)[None, :]
    out = pl.pallas_call(
        functools.partial(
            _ln_mlp_res_kernel, eps=np.float32(eps), gelu_form=gelu_form
        ),
        grid=(B, t_pad // BLOCK_T),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((d, mlp), lambda b, i: (0, 0)),
            pl.BlockSpec((1, mlp), lambda b, i: (0, 0)),
            pl.BlockSpec((mlp, d), lambda b, i: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_T, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, d), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * t_pad * d * mlp,
            bytes_accessed=2 * (2 * B * t_pad * d + 2 * d * mlp),
            transcendentals=B * t_pad * mlp,
        ),
        interpret=interpret,
    )(xp, gf, blf, w1b, b1b, w2b, b2b)
    return out[:, :T, :].astype(x.dtype)


# ---------------------------------------------------------------------------
# Hidden-chunk-split LN+MLP+residual: wide-MLP shapes (whisper-large-v3:
# d=1280, mlp=5120) whose resident fc1/fc2 weights exceed VMEM. The hidden
# axis is cut into chunks; gelu distributes over the cut, and
# y = x + sum_c fc2_c(gelu(fc1_c(LN(x)))) accumulates across chunk grid
# steps in an f32 VMEM scratch (grid (batch, time-tile, chunk), chunk
# fastest). LN is recomputed per chunk — VPU-cheap next to the matmuls.
# ---------------------------------------------------------------------------

MLP_CHUNK = 512


def _ln_mlp_csplit_kernel(
    x_ref, g_ref, bl_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc_ref,
    *, eps, n_chunks, gelu_form
):
    c = pl.program_id(2)
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps)) * g_ref[0] + bl_ref[0]

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = jax.lax.dot_general(
        ln.astype(x.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b1_ref[0]
    h = _gelu_f32(h.astype(jnp.float32), gelu_form).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == n_chunks - 1)
    def _finish():
        # b2 does not distribute over chunks: added once at the end
        out_ref[0] = x + acc_ref[...].astype(x.dtype) + b2_ref[0]


def mlp_csplit_fits_vmem(d: int, mlp: int, chunk: int = MLP_CHUNK) -> bool:
    if mlp % chunk != 0:
        return False
    tile = (
        2 * 2 * 2 * (d * chunk)          # double-buffered fc1/fc2 chunk weights
        + 4 * BLOCK_T * chunk            # f32 hidden tile
        + 4 * BLOCK_T * d                # f32 acc scratch
        + 4 * BLOCK_T * d                # f32 LN tile
        + 2 * 2 * 2 * BLOCK_T * d        # double-buffered bf16 x/y tiles
    )
    return tile <= _VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("eps", "gelu_form"))
def _fused_ln_mlp_csplit_impl(x, g, bl, w1, b1, w2, b2, eps, gelu_form="erf"):
    B, T, d = x.shape
    mlp = w1.shape[1]
    chunk = MLP_CHUNK
    n_chunks = mlp // chunk
    t_pad = max(-(-T // BLOCK_T) * BLOCK_T, BLOCK_T)
    interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0))) if t_pad != T else x
    xp = xp.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(
            _ln_mlp_csplit_kernel, eps=np.float32(eps), n_chunks=n_chunks,
            gelu_form=gelu_form,
        ),
        grid=(B, t_pad // BLOCK_T, n_chunks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i, c: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i, c: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i, c: (0, 0)),
            pl.BlockSpec((d, chunk), lambda b, i, c: (0, c)),
            pl.BlockSpec((1, chunk), lambda b, i, c: (0, c)),
            pl.BlockSpec((chunk, d), lambda b, i, c: (c, 0)),
            pl.BlockSpec((1, d), lambda b, i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_T, d), lambda b, i, c: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BLOCK_T, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * t_pad * d * mlp,
            bytes_accessed=2 * (2 * B * t_pad * d + 2 * d * mlp),
            transcendentals=B * t_pad * mlp,
        ),
        interpret=interpret,
    )(
        xp,
        g.astype(jnp.float32)[None, :],
        bl.astype(jnp.float32)[None, :],
        w1.astype(jnp.bfloat16),
        b1.astype(jnp.bfloat16)[None, :],
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.bfloat16)[None, :],
    )
    return out[:, :T, :].astype(x.dtype)


def _flnm_fwd(x, g, bl, w1, b1, w2, b2, eps, gelu_form):
    return _fused_ln_mlp_fwd_impl(x, g, bl, w1, b1, w2, b2, eps, gelu_form), (
        x, g, bl, w1, b1, w2, b2,
    )


def _flnm_bwd(eps, gelu_form, res, gout):
    x, g, bl, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ln_mlp_reference(*a, eps, gelu_form),
        x, g, bl, w1, b1, w2, b2,
    )
    return vjp(gout)


fused_ln_mlp_residual.defvjp(_flnm_fwd, _flnm_bwd)


# ---------------------------------------------------------------------------
# WF-adapter variant: the TRAINING fast path (r4). Forward folds the
# effective weights W + wf_scale * A diag(g) B (skinny XLA matmuls, once per
# step) and runs the unchanged kernel; backward differentiates the FACTORED
# reference so dA/dg/dB stay cheap and frozen-W cotangents stay DCE-able
# dead code under stop_gradient masking. See
# ops/fused_attention.fused_attention_sublayer_wf for the full rationale.
# ---------------------------------------------------------------------------


def _fold_wf(w, f, wf_scale):
    return w + wf_scale * ((f["a"] * f["g"][None, :]) @ f["b"])


def _ln_mlp_reference_wf(x, g, bl, w1, b1, w2, b2, wf1, wf2, eps, gelu_form,
                         wf_scale):
    """Factored-insert twin of _ln_mlp_reference (WFDense semantics)."""
    dt = x.dtype

    def insert(inp, f):
        z = jnp.dot(inp, f["a"].astype(dt))
        z = z * f["g"].astype(dt)
        return wf_scale * jnp.dot(z, f["b"].astype(dt))

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = ((xc * jax.lax.rsqrt(var + eps)) * g + bl).astype(dt)
    h = jax.lax.dot_general(
        ln, w1.astype(dt), (((ln.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1.astype(dt) + insert(ln, wf1)
    h = jax.nn.gelu(
        h.astype(jnp.float32), approximate=gelu_form == "tanh"
    ).astype(dt)
    y = jax.lax.dot_general(
        h, w2.astype(dt), (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b2.astype(dt) + insert(h, wf2)
    return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_ln_mlp_residual_wf(
    x, g, bl, w1, b1, w2, b2, wf1, wf2, eps, gelu_form, wf_scale
):
    """y = x + fc2(gelu(fc1(LayerNorm(x)))) with WF inserts on fc1/fc2,
    fused for training forwards. wf1/wf2 = {a, g, b} (WFDense layout)."""
    return _fused_ln_mlp_wf_fwd_impl(
        x, g, bl, w1, b1, w2, b2, wf1, wf2, eps, gelu_form, wf_scale
    )


@functools.partial(
    jax.jit, static_argnames=("eps", "gelu_form", "wf_scale")
)
def _fused_ln_mlp_wf_fwd_impl(
    x, g, bl, w1, b1, w2, b2, wf1, wf2, eps, gelu_form, wf_scale
):
    return _fused_ln_mlp_fwd_impl(
        x, g, bl,
        _fold_wf(w1, wf1, wf_scale), b1,
        _fold_wf(w2, wf2, wf_scale), b2,
        eps, gelu_form,
    )


def _flnm_wf_fwd(x, g, bl, w1, b1, w2, b2, wf1, wf2, eps, gelu_form, wf_scale):
    out = _fused_ln_mlp_wf_fwd_impl(
        x, g, bl, w1, b1, w2, b2, wf1, wf2, eps, gelu_form, wf_scale
    )
    return out, (x, g, bl, w1, b1, w2, b2, wf1, wf2)


def _flnm_wf_bwd(eps, gelu_form, wf_scale, res, gout):
    x, g, bl, w1, b1, w2, b2, wf1, wf2 = res
    _, vjp = jax.vjp(
        lambda *a: _ln_mlp_reference_wf(*a, eps, gelu_form, wf_scale),
        x, g, bl, w1, b1, w2, b2, wf1, wf2,
    )
    return vjp(gout)


fused_ln_mlp_residual_wf.defvjp(_flnm_wf_fwd, _flnm_wf_bwd)


# ---------------------------------------------------------------------------
# LN + QKV projections: (q, k, v) = LN(x) @ (Wq, Wk, Wv) + biases
#
# Same motivation as the MLP sublayer: XLA materializes the LayerNorm output
# in HBM before the projection matmuls can read it. One kernel normalizes
# each [BLOCK_T, d] tile in VMEM and feeds all three resident projection
# weights, writing three separate contiguous outputs (contiguity matters:
# the flash kernel's K/V block reads stride badly over a packed [.., 3D]
# array — measured slower — so q/k/v stay separate arrays).
# Bias convention is Whisper's (models/layers.py): q and v biased, k not.
# ---------------------------------------------------------------------------


def _ln_qkv_kernel(
    x_ref, g_ref, bl_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
    q_ref, k_ref, v_ref, *, eps
):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = ((xc * jax.lax.rsqrt(var + eps)) * g_ref[0] + bl_ref[0]).astype(x.dtype)
    dims = (((1,), (0,)), ((), ()))
    q_ref[0] = jax.lax.dot_general(
        ln, wq_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype) + bq_ref[0]
    k_ref[0] = jax.lax.dot_general(
        ln, wk_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    v_ref[0] = jax.lax.dot_general(
        ln, wv_ref[...], dims, preferred_element_type=jnp.float32
    ).astype(x.dtype) + bv_ref[0]


def _ln_qkv_reference(x, g, bl, wq, bq, wk, wv, bv, eps):
    """XLA twin with flax LayerNorm + nn.Dense(dtype=bf16) numerics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = ((xc * jax.lax.rsqrt(var + eps)) * g + bl).astype(x.dtype)
    dt = x.dtype
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    q = jax.lax.dot_general(
        ln, wq.astype(dt), dims, preferred_element_type=jnp.float32
    ).astype(dt) + bq.astype(dt)
    k = jax.lax.dot_general(
        ln, wk.astype(dt), dims, preferred_element_type=jnp.float32
    ).astype(dt)
    v = jax.lax.dot_general(
        ln, wv.astype(dt), dims, preferred_element_type=jnp.float32
    ).astype(dt) + bv.astype(dt)
    return q, k, v


def qkv_fits_vmem(d: int, out: int) -> bool:
    tile = (
        2 * 3 * d * out                    # resident bf16 Wq/Wk/Wv
        + 4 * BLOCK_T * d                  # f32 LN tile
        + 2 * 2 * 4 * BLOCK_T * out        # double-buffered bf16 q/k/v/x tiles
    )
    return tile <= _VMEM_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_qkv(x, g, bl, wq, bq, wk, wv, bv, eps=1e-5):
    """(q, k, v) = projections of LayerNorm(x) in one VMEM kernel — the LN
    output never touches HBM. x bf16 [B, T, d]; g/bl f32 LayerNorm params;
    weights f32 [d, D] (cast to bf16 like nn.Dense); k is unbiased
    (Whisper convention, models/layers.py)."""
    return _fused_ln_qkv_fwd_impl(x, g, bl, wq, bq, wk, wv, bv, eps)


@functools.partial(jax.jit, static_argnames=("eps",))
def _fused_ln_qkv_fwd_impl(x, g, bl, wq, bq, wk, wv, bv, eps):
    B, T, d = x.shape
    D = wq.shape[1]
    if not qkv_fits_vmem(d, D):
        return _ln_qkv_reference(x, g, bl, wq, bq, wk, wv, bv, eps)
    t_pad = max(-(-T // BLOCK_T) * BLOCK_T, BLOCK_T)
    interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0))) if t_pad != T else x
    xp = xp.astype(jnp.bfloat16)
    shp = jax.ShapeDtypeStruct((B, t_pad, D), jnp.bfloat16)
    q, k, v = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=np.float32(eps)),
        grid=(B, t_pad // BLOCK_T),
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((1, d), lambda b, i: (0, 0)),
            pl.BlockSpec((d, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((d, D), lambda b, i: (0, 0)),
            pl.BlockSpec((d, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_T, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, BLOCK_T, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, BLOCK_T, D), lambda b, i: (b, i, 0)),
        ],
        out_shape=[shp, shp, shp],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * t_pad * d * D,
            bytes_accessed=2 * (4 * B * t_pad * d + 3 * d * D),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp,
        g.astype(jnp.float32)[None, :],
        bl.astype(jnp.float32)[None, :],
        wq.astype(jnp.bfloat16),
        bq.astype(jnp.bfloat16)[None, :],
        wk.astype(jnp.bfloat16),
        wv.astype(jnp.bfloat16),
        bv.astype(jnp.bfloat16)[None, :],
    )
    if t_pad != T:
        q, k, v = q[:, :T, :], k[:, :T, :], v[:, :T, :]
    return q, k, v


def _flq_fwd(x, g, bl, wq, bq, wk, wv, bv, eps):
    return _fused_ln_qkv_fwd_impl(x, g, bl, wq, bq, wk, wv, bv, eps), (
        x, g, bl, wq, bq, wk, wv, bv,
    )


def _flq_bwd(eps, res, gout):
    x, g, bl, wq, bq, wk, wv, bv = res
    _, vjp = jax.vjp(
        lambda *a: _ln_qkv_reference(*a, eps), x, g, bl, wq, bq, wk, wv, bv
    )
    return vjp(gout)


fused_ln_qkv.defvjp(_flq_fwd, _flq_bwd)


