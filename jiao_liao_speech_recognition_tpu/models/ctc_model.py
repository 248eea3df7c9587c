"""Conv-subsampled transformer encoder with CTC head — the flagship model.

TPU-native counterpart of the reference's SpeechBrain-style transformer-CTC
acoustic model (SURVEY.md C8; BASELINE configs[0-1]): two stride-2 1-D convs
subsample the 100 Hz log-mel frames 4x (3000 -> 750 positions at 30 s), then
a pre-LN transformer encoder and a linear CTC head over the character vocab.
Adapters (WFAdapter / AttAdapter / bottleneck) inject per AdapterConfig.

Design: bf16 compute on the MXU, f32 params and logits; optional
jax.checkpoint on blocks for long-schedule fine-tunes; all shapes static
(padded/bucketed inputs, lengths carried separately).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.config import CTCModelConfig
from .layers import (
    TransformerBlock,
    banded_length_mask,
    length_mask,
    sinusoidal_positions,
)


class ConvSubsampler(nn.Module):
    """log2(factor) stride-2 Conv1d + GELU: [B, T, mels] -> [B, T//factor,
    d_model]. factor=4 (the SB-recipe default) gives the conv1/conv2 stack;
    other powers of two scale the stack.

    Stays nn.Conv on purpose: a shifted-matmul reformulation (pair-reshape
    views feeding [2*Cin, Cout] MXU matmuls) measured 0.48x on the v5e —
    XLA's strided-conv lowering already beats the extra pad/slice HBM
    traffic (examples/profile_conv_subsampler.py, 2026-08-19)."""

    d_model: int
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    factor: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = max(self.factor, 2).bit_length() - 1
        if (1 << n) != self.factor:
            raise ValueError(f"subsample_factor must be a power of 2, got {self.factor}")
        for i in range(n):
            feats = self.d_model if i == n - 1 else self.channels
            x = nn.Conv(
                feats, (3,), strides=(2,), padding=((1, 1),),
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.gelu(x, approximate=False)
        return x


class CTCEncoderModel(nn.Module):
    """Returns (log_probs [B, T', V] float32, output lengths [B])."""

    cfg: CTCModelConfig

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # [B, num_mels, T] log-mel
        feature_lengths: Optional[jnp.ndarray] = None,  # [B] valid frames
        deterministic: bool = True,
        head_mode: str = "log_probs",  # "log_probs" | "argmax_ids" (static)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, M, T = features.shape
        if T > cfg.max_frames:
            raise ValueError(
                f"input has {T} frames > max_frames={cfg.max_frames}; raise "
                "CTCModelConfig.max_frames or chunk the audio"
            )
        if feature_lengths is None:
            feature_lengths = jnp.full((B,), T, dtype=jnp.int32)

        x = features.transpose(0, 2, 1).astype(dtype)  # [B, T, M]
        x = ConvSubsampler(
            cfg.d_model, cfg.conv_channels, dtype, cfg.subsample_factor,
            name="subsample",
        )(x)
        t_out = x.shape[1]
        # ceil-division length propagation through the stride-2 convs (pad=1)
        out_lengths = feature_lengths
        f = cfg.subsample_factor
        while f > 1:
            out_lengths = (out_lengths + 1) // 2
            f //= 2

        if cfg.position_mode == "sinusoidal":
            x = x + sinusoidal_positions(t_out, cfg.d_model, dtype)[None, :, :]
        elif cfg.position_mode != "none":
            # "none": shift-invariant encoder (the conv subsampler carries
            # local order) — required for sliding-window streaming to match
            # training (serve/streaming.py)
            raise ValueError(f"unknown position_mode {cfg.position_mode!r}")
        if cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        L, R = cfg.attention_left_context, cfg.attention_right_context
        if L >= 0 or R >= 0:
            # streaming-matched band attention ([B,1,T,T] routes every
            # block to the general attention path; no lengths threaded —
            # the band carries structure lengths can't express)
            mask = banded_length_mask(out_lengths, t_out, L, R)
            attn_lens = None
        else:
            mask = length_mask(out_lengths, t_out)  # [B,1,1,T']
            attn_lens = out_lengths  # threaded alongside: fused paths
            # consume lengths, never infer them from the mask
        block = TransformerBlock
        if cfg.remat:
            # rematerialize each block on the backward pass (long fine-tune
            # schedules on big batches; SURVEY §1.b runtime notes)
            block = nn.remat(TransformerBlock, static_argnums=(5, 9))
        for i in range(cfg.num_layers):
            layer = block(
                cfg.d_model,
                cfg.num_heads,
                cfg.mlp_dim,
                dtype,
                cfg.dropout,
                cfg.adapter if cfg.adapter.kind != "none" else None,
                cfg.use_flash_attention,
                gelu_form=cfg.gelu_form,
                flash_train_min_q=cfg.flash_train_min_q,
                name=f"block_{i}",
            )
            # positional call keeps nn.remat static_argnums stable
            x = layer(
                x, mask, None, None, deterministic, None, None, None, False,
                None, attn_lens,
            )

        x = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="final_ln")(x)
        # CTC head: bf16 operands on the MXU with f32 accumulation — the
        # [B*T', d] x [d, V] head is the single largest matmul in the model
        # (V ~ 4.3k), and a full-f32 Dense runs at 1/4 MXU rate. Params stay
        # f32; tree layout matches nn.Dense(name="ctc_head").
        head = CTCHead(cfg.vocab_size, dtype, cfg.d_model, name="ctc_head")
        if head_mode == "argmax_ids":
            # greedy inference: log_softmax is monotonic, so the fused
            # matmul+argmax kernel yields the same ids with no [B,T,V] HBM
            # round-trips (ops/fused_head.py)
            return head.argmax_ids(x), out_lengths
        if head_mode != "log_probs":
            raise ValueError(f"unknown head_mode {head_mode!r}")
        logits = head(x)
        # log-softmax in f32 (CTC loss numerics, SURVEY §7 hard-part 2)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, out_lengths


class CTCHead(nn.Module):
    """Dense head computing compute-dtype operands -> f32-accumulated logits.

    setup-based (not @nn.compact) so `argmax_ids` can reuse the same
    kernel/bias params for the fused greedy-decode path; the param tree
    layout ("kernel"/"bias") matches nn.Dense.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    in_features: int = 512

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features),
            jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            self.kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y + self.bias

    def argmax_ids(self, x: jnp.ndarray) -> jnp.ndarray:
        """Fused matmul+argmax (greedy decode): never materializes the
        [B, T, V] logits in HBM (ops/fused_head.py). Off-TPU (CPU tests,
        CPU-JAX parity path) the Pallas interpreter would be far slower than
        plain XLA — and the kernel pads batch to BLOCK_B=8 — so gate on the
        backend like the layers.py fast paths and fall back to matmul+argmax."""
        import jax as _jax

        if _jax.default_backend() == "tpu":
            from ..ops.fused_head import fused_head_argmax

            return fused_head_argmax(x.astype(self.dtype), self.kernel, self.bias)
        return jnp.argmax(self(x), axis=-1).astype(jnp.int32)
