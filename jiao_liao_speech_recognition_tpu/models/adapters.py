"""Adapter family: bottleneck baseline, WFAdapter, AttAdapter.

The reference paper's contribution (README.md:1): two novel adapters —
"WFAdapter (adapter with weight factorization)" and "AttAdapter (adapter
with attention)" — injected into a frozen pretrained backbone for
multi-dialect knowledge transfer, compared against conventional bottleneck
adapters. No peft in the reference lockfile => they are hand-written modules
(SURVEY.md C9-C11). TPU-native design notes:

* ``WFAdapter`` is a *fused low-rank insert*: the effective weight is
  W + A @ diag(g) @ B, evaluated as x@W + ((x@A)*g)@B so the frozen W matmul
  stays a single large MXU op and the insert adds two skinny matmuls — no
  materialized W', no extra HBM copy of the backbone weight.
* ``AttAdapter`` is a small residual attention block (few heads, low key
  dim) over the layer-normalized hidden states.
* ``BottleneckAdapter`` is the conventional down-project -> nonlinearity ->
  up-project residual adapter.

All adapter params live under a module name prefixed ``adapter_`` so the
training engine can derive the frozen-backbone/trainable mask purely from
the param tree (train/engine.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..utils.config import AdapterConfig  # re-export for models/__init__

ADAPTER_PREFIX = "adapter_"


def param_is_adapter(path: tuple) -> bool:
    """True if a flax param path (tuple of str keys) belongs to an adapter."""
    return any(isinstance(k, str) and k.startswith(ADAPTER_PREFIX) for k in path)


class BottleneckAdapter(nn.Module):
    """Conventional adapter: h + scale * up(act(down(LN(h)))) (SURVEY C11)."""

    cfg: AdapterConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = h.shape[-1]
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(h)
        z = nn.Dense(self.cfg.bottleneck_dim, dtype=self.dtype, name="down")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dropout(self.cfg.dropout)(z, deterministic=deterministic)
        z = nn.Dense(
            d,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,  # identity at init
            name="up",
        )(z)
        return h + self.cfg.scale * z


class WFAdapter(nn.Module):
    """Weight-factorized adapter: a fused low-rank insert on a frozen Dense.

    Called with the *input* of a backbone Dense layer and its frozen output;
    adds ((x @ A) * g) @ B, i.e. the effective weight becomes
    W + A @ diag(g) @ B with A in R^{d_in x r}, g in R^r, B in R^{r x d_out}.
    g is the weight-factorization gate: per-rank learned scales that let the
    model modulate each factor's contribution across dialects. B is
    zero-initialized so injection starts as the identity.
    """

    cfg: AdapterConfig
    features: int  # d_out of the wrapped Dense
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, frozen_out: jnp.ndarray) -> jnp.ndarray:
        r = self.cfg.wf_rank
        a = self.param(
            "a", nn.initializers.lecun_normal(), (x.shape[-1], r), jnp.float32
        )
        g = self.param("g", nn.initializers.ones, (r,), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (r, self.features), jnp.float32)
        z = jnp.dot(x, a.astype(self.dtype))
        z = z * g.astype(self.dtype)
        z = jnp.dot(z, b.astype(self.dtype))
        return frozen_out + self.cfg.scale * z


class AttAdapter(nn.Module):
    """Attention adapter: h + scale * out(MHA(LN(h))) with small head count
    and key dim — the paper's "adapter with attention" (README.md:1).

    Supports KV-cached incremental decode exactly like the backbone
    self-attention (kv_cache dict + cache_index), so the decoded function is
    the trained function: during teacher-forced training the adapter attends
    over the causal prefix, and during decode it attends over cached
    positions 0..pos rather than only the current token.
    """

    cfg: AdapterConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        import jax

        d = h.shape[-1]
        H, dk = self.cfg.att_num_heads, self.cfg.att_key_dim
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(h)
        # one merged projection instead of three d x (H*dk) slivers: a
        # single [d, 3*H*dk] MXU matmul feeds q/k/v (the adapter's matmuls
        # are small enough that launch + tiling overhead dominated as three
        # separate ops — docs/PERFORMANCE.md round-3 training table)
        qkv = nn.Dense(3 * H * dk, dtype=self.dtype, name="qkv_proj")(z)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        new_cache = None
        if kv_cache is not None:
            from .layers import update_cache_rows

            k = update_cache_rows(kv_cache["k"], k, cache_index, 1)
            v = update_cache_rows(kv_cache["v"], v, cache_index, 1)
            new_cache = {"k": k, "v": v}
        B, Tq = q.shape[0], q.shape[1]
        Tk = k.shape[1]
        from .layers import dot_product_attention

        # use_flash on the deterministic path: the forward never
        # materializes the [Tq, Tk] scores in HBM (ops/flash_attention.py
        # pads dk to the 128-lane width). TRAINING at short T keeps the
        # einsum path — the flash custom_vjp backward RECOMPUTES its
        # reference forward (remat semantics) while XLA's einsum backward
        # reuses saved softmax intermediates (same r4 finding as the
        # backbone attention, models/layers.py); long T keeps flash for
        # the quadratic activation memory.
        out = dot_product_attention(
            q.reshape(B, Tq, H, dk),
            k.reshape(B, Tk, H, dk),
            v.reshape(B, Tk, H, dk),
            mask,
            use_flash=deterministic or Tq >= 512,
        )
        out = out.reshape(B, Tq, H * dk)
        out = nn.Dense(
            d,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,  # identity at init
            name="out_proj",
        )(out)
        if self.cfg.dropout > 0:
            out = nn.Dropout(self.cfg.dropout)(out, deterministic=deterministic)
        y = h + self.cfg.scale * out
        if kv_cache is not None:
            return y, new_cache
        return y

    def cache_shape(self, batch: int, max_len: int):
        return (batch, max_len, self.cfg.att_num_heads * self.cfg.att_key_dim)


class AdapterSlot(nn.Module):
    """Injection point placed after attention / MLP sublayers.

    Dispatches on cfg.kind; `kind='wf'` is handled inside WFDense instead
    (it must wrap a Dense, not follow it), so a WF config makes this slot a
    no-op for the residual stream.
    """

    cfg: AdapterConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        if self.cfg.kind == "bottleneck":
            out = BottleneckAdapter(self.cfg, self.dtype, name=f"{ADAPTER_PREFIX}bn")(
                h, deterministic
            )
            return (out, kv_cache) if kv_cache is not None else out
        if self.cfg.kind == "att":
            return AttAdapter(self.cfg, self.dtype, name=f"{ADAPTER_PREFIX}att")(
                h, mask, deterministic, kv_cache=kv_cache, cache_index=cache_index
            )
        return (h, kv_cache) if kv_cache is not None else h


class WFDense(nn.Module):
    """Dense layer with an optional fused WFAdapter low-rank insert.

    Drop-in replacement for nn.Dense inside backbone blocks: when
    cfg.kind == 'wf', the adapter params ride alongside the frozen kernel.
    """

    features: int
    cfg: Optional[AdapterConfig] = None
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        params = self.variables.get("params", {})
        if not self.is_initializing() and "dense_q" in params:
            # int8-quantized serving tree (ModelBundle.quantize): the kernel
            # lives in HBM as int8 + per-output-channel f32 scales, streamed
            # and dequantized in VMEM (ops/quant.py). Replaces the "dense"
            # subtree wholesale; bias rides along unquantized.
            from ..ops.quant import int8_matmul

            dq = params["dense_q"]
            y = int8_matmul(x.astype(self.dtype), dq["kernel_q"], dq["scale"])
            if self.use_bias:
                y = y + dq["bias"].astype(self.dtype)
        else:
            y = nn.Dense(
                self.features,
                dtype=self.dtype,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                name="dense",
            )(x)
        if self.cfg is not None and self.cfg.kind == "wf":
            y = WFAdapter(
                self.cfg, self.features, self.dtype, name=f"{ADAPTER_PREFIX}wf"
            )(x, y)
        return y
