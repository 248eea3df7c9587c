"""Shared transformer building blocks (Flax), TPU-first conventions:

* params float32, compute bfloat16 (MXU-native), logits float32
* pre-LN residual blocks (matches both Whisper and SB transformer recipes)
* attention dispatches to the Pallas flash-attention kernel on TPU and to a
  fused-by-XLA einsum path elsewhere
* static shapes everywhere; padding communicated via boolean masks

Reference parity targets: WhisperEncoder/Decoder block structure
(SURVEY.md C7) and SpeechBrain TransformerASR encoder (SURVEY.md C8).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import AdapterConfig
from .adapters import AdapterSlot, WFDense


# decode KV-cache layout switch (models/whisper.py / models/joint.py
# init_cache): head-major [B, H, T, dh] at batch >= this, packed [B, T, d]
# below (measured crossover, docs/PERFORMANCE.md)
HEAD_MAJOR_MIN_BATCH = 16


def _on_tpu() -> bool:
    """Gate for the TPU-only fused fast paths (patchable in tests: the
    Pallas kernels themselves still pick interpret mode off the real
    backend, so forcing this True on CPU exercises the fused paths)."""
    return jax.default_backend() == "tpu"


def sinusoidal_positions(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard interleaved sin/cos table [length, dim] (Whisper layout:
    first half sin, second half cos)."""
    assert dim % 2 == 0
    log_timescale = np.log(10000.0) / (dim // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(dim // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(t), np.cos(t)], axis=1), dtype=dtype
    )


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[B, T, H, Dh] attention. mask: broadcastable to [B, H, Tq, Tk], True =
    attend. Softmax in f32 for stability regardless of compute dtype.
    kv_lengths: explicit [B] valid-key counts — the authoritative channel
    for key padding (callers that built `mask` from lengths should thread
    the lengths too; the flash kernel consumes lengths, not masks).

    The flash kernel only pays off for long query blocks: KV-cached decode
    steps (Tq=1) would be padded to a full BLOCK_Q of wasted MXU rows, so
    short queries take the XLA einsum path."""
    if kv_lengths is not None and mask is not None and mask.shape[-2] != 1:
        # a multi-row mask (band/causal) carries structure lengths can't
        # express; passing both would let flash drop the mask — refuse the
        # lengths and take the exact masked path below
        kv_lengths = None
    if use_flash and q.shape[1] >= 64 and jax.default_backend() == "tpu":
        from ..ops.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, mask, kv_lengths=kv_lengths)
        except NotImplementedError:
            pass
    if mask is None and kv_lengths is not None:
        mask = length_mask(jnp.asarray(kv_lengths, jnp.int32), k.shape[1])
    dtype = q.dtype
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32).astype(
        dtype
    )


def update_cache_rows(
    cache: jnp.ndarray, new: jnp.ndarray, index, time_axis: int
) -> jnp.ndarray:
    """Write one decode step's K/V rows into a cache at position `index`.

    `index` scalar -> lax.dynamic_update_slice (every batch row shares the
    position: the offline generate loops in decode/whisper_generate.py).
    `index` [B] vector -> per-row scatter: continuous-batching serving
    (serve/engine.py), where each slot sits at its OWN decode position
    because utterances join the batch mid-flight.

    Handles packed [B, T, ...] caches (time_axis=1), head-major
    [B, H, T, dh] caches and their [B, H, T] scale planes (time_axis=2).
    `new`'s time axis must have length 1 (one decode step)."""
    new = new.astype(cache.dtype)
    index = jnp.asarray(index, jnp.int32)
    if index.ndim == 0:
        starts = tuple(
            index if a == time_axis else 0 for a in range(cache.ndim)
        )
        return jax.lax.dynamic_update_slice(cache, new, starts)
    B = cache.shape[0]
    rows = jnp.arange(B)
    if time_axis == 1:
        return cache.at[rows, index].set(jnp.squeeze(new, 1))
    if time_axis == 2:
        H = cache.shape[1]
        return cache.at[rows[:, None], jnp.arange(H)[None, :], index[:, None]].set(
            jnp.squeeze(new, 2)
        )
    raise ValueError(f"unsupported cache time_axis {time_axis}")


def _int8_cross_attention(qh, kq, ks, vq, vs, kv_lens, mask, dtype, t_enc=None):
    """Decode-step attention over int8 cross caches (ops/quant.quantize_kv).

    qh [B, H, Tq, dh]; kq/vq int8 [B, H, Tk, dh]; ks/vs f32 [B, H, Tk]
    per-position scales. Tk may be 128-padded past the real encoder length
    `t_enc` (init_cache stores the caches kernel-ready; padded scales are 0).
    Scales commute with both contractions:
    logits[t] = (q . K[t]) * ks[t]; out = (p * vs) @ V.

    Validity contract: `kv_lens` [B] int32 valid-key counts (the caller's
    THREADED lengths — never inferred from a mask), or None with `mask` a
    key-validity mask broadcastable to [B, H, Tq, Tk] — then the exact
    mul-reduce path applies the mask directly (the streaming kernel only
    expresses contiguous lengths). Both None = all `t_enc` keys valid.

    On TPU this runs the Pallas decode-attention kernel
    (ops/quant.int8_decode_attention): the int8 tiles convert to bf16 in
    VMEM, so HBM streams 1 byte/element. (An XLA broadcast-multiply+reduce
    formulation was measured CATASTROPHICALLY slower — 839 -> 502 tok/s at
    large-v3 B=8 — XLA's loop fusion does not stream int8 at memory speed;
    and a plain einsum re-materializes the dequantized cache per step.)
    Off-TPU the mul-reduce form below is the reference semantics."""
    B, H, Tq, dh = qh.shape
    Tk = kq.shape[2]
    if t_enc is None:
        t_enc = Tk
    if kv_lens is None and mask is None:
        kv_lens = jnp.full((B,), min(t_enc, Tk), jnp.int32)
    if kv_lens is not None:
        kv_lens = jnp.broadcast_to(jnp.asarray(kv_lens, jnp.int32), (B,))
        if _on_tpu() and Tq <= 8:  # patchable gate: tests force this dispatch
            from ..ops.decode_attention import decode_attention_fits, round_tk
            from ..ops.quant import int8_decode_attention

            if decode_attention_fits(round_tk(Tk), dh, quantized=True):
                return int8_decode_attention(qh, kq, ks, vq, vs, kv_lens).astype(
                    dtype
                )
    scale = 1.0 / np.sqrt(dh)
    s = (
        jnp.sum(
            qh[:, :, :, None, :].astype(jnp.float32)
            * kq[:, :, None, :, :].astype(jnp.float32),
            axis=-1,
        )
        * ks[:, :, None, :]
        * scale
    )  # [B, H, Tq, Tk] f32
    if kv_lens is not None:
        pmask = (
            jnp.arange(Tk)[None, None, None, :] < kv_lens[:, None, None, None]
        )
    else:
        # general key-validity mask, False-padded out to the cache horizon
        pmask = jnp.pad(mask, ((0, 0),) * 3 + ((0, Tk - mask.shape[-1]),))
    s = jnp.where(pmask, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    pv = p * vs[:, :, None, :]
    o = jnp.sum(
        pv[:, :, :, :, None] * vq[:, :, None, :, :].astype(jnp.float32), axis=3
    )  # [B, H, Tq, dh]
    return o.astype(dtype)


class MultiHeadAttention(nn.Module):
    """MHA with optional cross-attention inputs and KV-cache decode step.

    Bias conventions are Whisper's (q/out/v biased, k unbiased) so imported
    reference weights map 1:1; harmless for from-scratch CTC training.
    """

    num_heads: int
    d_model: int
    dtype: jnp.dtype = jnp.bfloat16
    dropout: float = 0.0
    adapter: Optional[AdapterConfig] = None
    use_flash: bool = False
    # smallest Tq at which TRAINING (non-deterministic) attention routes to
    # the flash kernels; see the gate comment in __call__ for the measured
    # crossover. Inference always uses flash when eligible.
    flash_train_min_q: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        return_kv: bool = False,
        kv_lengths: Optional[jnp.ndarray] = None,
    ):
        """kv_lengths: explicit [B] (or scalar) count of valid keys — the
        authoritative channel for key padding on the decode fast paths.
        Callers that know the lengths (decode_step knows pos+1; encoders
        know feature lengths) MUST thread them to get the streaming
        kernels; a bare `mask` without lengths routes to the exact masked
        einsum path — lengths are never inferred by summing a mask, so a
        non-prefix mask can't be silently misread (r2 advisor hazard)."""
        dh = self.d_model // self.num_heads
        kv_in = x if kv is None else kv
        wf = self.adapter if (self.adapter and self.adapter.kind == "wf") else None
        if kv_cache is not None and kv_cache["k"].ndim == 4:
            # head-major decode cache [B, H, T_cache, dh]: XLA's batched
            # attention over the packed [B, T, H*dh] layout collapses to
            # ~180 GB/s effective at batch >= 16 (a per-step physical
            # relayout of the whole cache); the head-major formulation
            # streams K/V at memory speed (docs/PERFORMANCE.md).
            q = WFDense(self.d_model, wf, self.dtype, name="q_proj")(x)
            B, Tq = q.shape[0], q.shape[1]
            qh = q.reshape(B, Tq, self.num_heads, dh).transpose(0, 2, 1, 3)
            o = None
            if kv_cache is not None and kv is not None:
                # cross-attention: reuse the precomputed encoder K/V
                if "k_scale" in kv_cache:
                    # int8 cross cache (quantized serving bundle). The cache
                    # is 128-padded past the real encoder length; `kv` is the
                    # unpadded encoder output, so its static T is the valid
                    # horizon when the caller threads no lengths. Falls
                    # through to the shared out-proj tail below.
                    o = _int8_cross_attention(
                        qh, kv_cache["k"], kv_cache["k_scale"],
                        kv_cache["v"], kv_cache["v_scale"],
                        kv_lengths, mask, self.dtype,
                        t_enc=kv.shape[1],
                    ).astype(self.dtype)
                k4, v4 = kv_cache["k"], kv_cache["v"]
                new_cache = kv_cache
            else:
                k = WFDense(self.d_model, wf, self.dtype, use_bias=False, name="k_proj")(kv_in)
                v = WFDense(self.d_model, wf, self.dtype, name="v_proj")(kv_in)
                kh = k.reshape(B, Tq, self.num_heads, dh).transpose(0, 2, 1, 3)
                vh = v.reshape(B, Tq, self.num_heads, dh).transpose(0, 2, 1, 3)
                if "k_scale" in kv_cache:
                    # int8 SELF cache (quantized serving bundle): quantize
                    # the step's new K/V rows per key position and update
                    # cache + scale in place. The self cache re-streams from
                    # HBM every token while being written one row at a time,
                    # so int8 halves the dominant read for free (write cost
                    # is one [B, H, Tq] quantize + two row updates).
                    from ..ops.quant import quantize_kv

                    kq_new, ks_new = quantize_kv(kh)
                    vq_new, vs_new = quantize_kv(vh)
                    new_cache = {
                        "k": update_cache_rows(kv_cache["k"], kq_new, cache_index, 2),
                        "k_scale": update_cache_rows(
                            kv_cache["k_scale"], ks_new, cache_index, 2
                        ),
                        "v": update_cache_rows(kv_cache["v"], vq_new, cache_index, 2),
                        "v_scale": update_cache_rows(
                            kv_cache["v_scale"], vs_new, cache_index, 2
                        ),
                    }
                    o = _int8_cross_attention(
                        qh, new_cache["k"], new_cache["k_scale"],
                        new_cache["v"], new_cache["v_scale"],
                        kv_lengths, mask, self.dtype,
                    ).astype(self.dtype)
                    k4 = v4 = None
                else:
                    k4 = update_cache_rows(kv_cache["k"], kh, cache_index, 2)
                    v4 = update_cache_rows(kv_cache["v"], vh, cache_index, 2)
                    new_cache = {"k": k4, "v": v4}
            if o is None:
                # Validity contract: decode callers THREAD kv_lengths
                # explicitly (decode_step knows pos+1; cross callers know
                # enc_lengths) — that is what engages the streaming kernel.
                # A bare mask (single-row or not) takes the exact masked
                # einsum path: lengths are never inferred by summing an
                # assumed-prefix mask, so a future non-prefix key mask
                # cannot silently attend to the wrong positions. The mask's
                # Tm may be shorter than the cache's Tk (caches are
                # 128-padded at build time); positions past Tm are invalid.
                from ..ops.decode_attention import (
                    KERNEL_TK,
                    decode_attention_fits,
                    grouped_decode_attention,
                )

                Tk = k4.shape[2]
                if kv_lengths is not None:
                    kv_lens = jnp.broadcast_to(
                        jnp.asarray(kv_lengths, jnp.int32), (B,)
                    )
                elif mask is None:
                    kv_lens = jnp.full(
                        (B,),
                        min(kv.shape[1], Tk) if kv is not None else Tk,
                        jnp.int32,
                    )
                else:
                    kv_lens = None  # mask-only: exact masked path below
                if (
                    kv_lens is not None
                    and _on_tpu()
                    and Tq <= 8
                    and Tk % KERNEL_TK == 0
                    # f32 models keep the f32 einsum: the kernel streams
                    # bf16 and would silently downcast the cache
                    and k4.dtype == jnp.bfloat16
                    and decode_attention_fits(Tk, dh, quantized=False)
                ):
                    # grouped-head Pallas kernel: streams the bf16 cache at
                    # memory speed; XLA's batched matvec over the same
                    # layout measured ~2.5x off the streaming roofline
                    o = grouped_decode_attention(qh, k4, v4, kv_lens).astype(
                        self.dtype
                    )
                else:
                    scale = 1.0 / np.sqrt(dh)
                    s = jnp.einsum(
                        "bhqd,bhkd->bhqk", qh, k4, preferred_element_type=jnp.float32
                    ) * scale
                    if kv_lens is not None:
                        kmask = (
                            jnp.arange(Tk)[None, None, None, :]
                            < kv_lens[:, None, None, None]
                        )
                    else:
                        # general mask, False-padded out to the cache horizon
                        kmask = jnp.pad(
                            mask, ((0, 0),) * 3 + ((0, Tk - mask.shape[-1]),)
                        )
                    s = jnp.where(kmask, s, jnp.finfo(jnp.float32).min)
                    p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
                    o = jnp.einsum(
                        "bhqk,bhkd->bhqd", p, v4, preferred_element_type=jnp.float32
                    ).astype(self.dtype)
            out = o.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
            out = WFDense(self.d_model, wf, self.dtype, name="out_proj")(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
            return out, new_cache
        if return_kv:
            # cache-precompute mode: just the K/V projections of `kv_in`
            k = WFDense(self.d_model, wf, self.dtype, use_bias=False, name="k_proj")(kv_in)
            v = WFDense(self.d_model, wf, self.dtype, name="v_proj")(kv_in)
            return {"k": k, "v": v}
        q = WFDense(self.d_model, wf, self.dtype, name="q_proj")(x)
        new_cache = None
        if kv_cache is not None and kv is not None:
            # cross-attention during decode: reuse precomputed encoder K/V.
            # (int8 cross caches are ALWAYS head-major [B,H,T,dh] — their
            # read path never runs an einsum, so the packed-layout small-
            # batch advantage doesn't apply — and thus dispatch to the
            # 4-dim branch above.)
            k, v = kv_cache["k"], kv_cache["v"]
            new_cache = kv_cache
        else:
            k = WFDense(self.d_model, wf, self.dtype, use_bias=False, name="k_proj")(kv_in)
            v = WFDense(self.d_model, wf, self.dtype, name="v_proj")(kv_in)
            if kv_cache is not None:
                # self-attention decode step: write k/v at cache_index
                k = update_cache_rows(kv_cache["k"], k, cache_index, 1)
                v = update_cache_rows(kv_cache["v"], v, cache_index, 1)
                new_cache = {"k": k, "v": v}
        B, Tq = q.shape[0], q.shape[1]
        Tk = k.shape[1]
        out = None
        if kv_lengths is not None and mask is not None and mask.shape[-2] != 1:
            # multi-row masks (band/causal) carry structure lengths can't
            # express; drop the lengths so the kernels can't shadow the mask
            kv_lengths = None
        # TRAINING keeps the einsum path at short T: even with the blockwise
        # Pallas backward (ops/flash_attention._flash_backward — no HBM probs
        # in either direction), flash's bwd re-streams K/V and recomputes the
        # score blocks, while XLA's einsum backward reuses the saved softmax
        # intermediates that comfortably fit at short T — measured 12.07 vs
        # 13.18 ms/step on the flagship WF-adapter fine-tune (B=16 x 10 s,
        # T'=250). At long T the saved [B, H, T, T] probs explode
        # quadratically (large-v3 30 s: T=1500 -> ~0.7 GB/layer at B=4) and
        # flash wins: 16.17 vs 17.31 ms fwd+bwd at B=4 x T=1500 x H20/dh64,
        # and 2.26 vs 2.12 steps/s on the full large-v3 30 s fine-tune —
        # where the einsum path only fits at all because XLA's HBM-pressure
        # rematerializer starts compressing/recomputing activations. The
        # crossover is a config knob (flash_train_min_q) for re-tuning.
        use_flash_here = self.use_flash and (
            deterministic or Tq >= self.flash_train_min_q
        )
        if (
            use_flash_here
            and dh % 128 == 0
            and Tq >= 64  # decode steps (Tq=1) would pad to a wasted BLOCK_Q
            and jax.default_backend() == "tpu"
        ):
            # zero-transpose fast path: the Pallas kernel addresses heads by
            # lane-aligned slices of the packed [B, T, H*Dh] layout, so the
            # [B,T,H,Dh] reshape/transpose round-trips through HBM vanish
            from ..ops.flash_attention import flash_attention_packed

            try:
                out = flash_attention_packed(
                    q, k, v, self.num_heads, mask, kv_lengths=kv_lengths
                )
            except NotImplementedError:
                out = None
        if out is None:
            qh = q.reshape(B, Tq, self.num_heads, dh)
            kh = k.reshape(B, Tk, self.num_heads, dh)
            vh = v.reshape(B, Tk, self.num_heads, dh)
            out = dot_product_attention(
                qh, kh, vh, mask, use_flash=use_flash_here,
                kv_lengths=kv_lengths,
            )
            out = out.reshape(B, Tq, self.d_model)
        out = WFDense(self.d_model, wf, self.dtype, name="out_proj")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if new_cache is not None:
            return out, new_cache
        return out


class MLP(nn.Module):
    d_model: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    dropout: float = 0.0
    adapter: Optional[AdapterConfig] = None
    # 'erf' = exact GELU (Whisper: HF-checkpoint logit parity pins it);
    # 'tanh' = tanh-form (flagship family: same form on the fused TPU kernel
    # path, so fused-vs-module numerics agree in intent AND tanh is
    # hardware-cheap — measured +12% e2e RTFx, ops/fused_mlp.py)
    gelu_form: str = "erf"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        wf = self.adapter if (self.adapter and self.adapter.kind == "wf") else None
        h = WFDense(self.mlp_dim, wf, self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=self.gelu_form == "tanh")
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return WFDense(self.d_model, wf, self.dtype, name="fc2")(h)


class TransformerBlock(nn.Module):
    """Pre-LN block with adapter slots after attention and MLP sublayers."""

    d_model: int
    num_heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    dropout: float = 0.0
    adapter: Optional[AdapterConfig] = None
    use_flash: bool = False
    cross_attention: bool = False
    gelu_form: str = "erf"  # see MLP.gelu_form
    flash_train_min_q: int = 512  # see MultiHeadAttention.flash_train_min_q

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        enc: Optional[jnp.ndarray] = None,
        enc_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        self_cache: Optional[dict] = None,
        cross_cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        precompute_cross: bool = False,
        slot_caches: Optional[dict] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
        enc_kv_lengths: Optional[jnp.ndarray] = None,
    ):
        """kv_lengths / enc_kv_lengths: explicit valid-key counts for the
        self / cross attention (see MultiHeadAttention.kv_lengths). Callers
        that built `mask` / `enc_mask` from lengths should thread the
        lengths as well — the fused/streaming fast paths consume lengths
        and never infer them from a mask."""
        if precompute_cross:
            # K/V of the cross-attention for a given encoder output — used
            # once per utterance to build the decode cache
            return MultiHeadAttention(
                self.num_heads,
                self.d_model,
                self.dtype,
                self.dropout,
                self.adapter,
                self.use_flash,
                name="cross_attn",
            )(enc, kv=enc, return_kv=True)
        ad = self.adapter or AdapterConfig()
        fused_attn = False
        if (
            deterministic
            and self_cache is None
            and not self.is_initializing()
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and self.use_flash
            and x.ndim == 3
            and x.shape[1] >= 64  # decode steps (Tq=1) would pad to BLOCK_T
            # dh=128k heads take the whole-D kernels; dh in {64,32,...} pack
            # into 128-lane head groups (ops/fused_attention.py hsplit)
            and (
                (self.d_model // self.num_heads) % 128 == 0
                or 128 % (self.d_model // self.num_heads) == 0
            )
            # flash handles key-validity masks only; causal [.., T, T]
            # masks (decoder self-attention) take the module path
            and (
                mask is None
                or (mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1)
            )
            # the fused kernels consume per-example LENGTHS: a caller that
            # passes a key mask must thread kv_lengths alongside it (all
            # in-repo encoders do) or it keeps the exact module path —
            # lengths are never inferred by summing an assumed-prefix mask
            and (mask is None or kv_lengths is not None)
            and _on_tpu()
            # int8-quantized serving trees (ModelBundle.quantize) replace
            # "dense" with "dense_q"; the fused kernels read raw bf16 kernels
            and "dense" in self.variables["params"]["self_attn"]["q_proj"]
        ):
            # inference fast paths (ops/fused_attention.py, ops/fused_mlp.py;
            # parity with the module path in tests/test_fused_mlp.py /
            # tests/test_fused_attention.py / tests/test_fused_wf.py).
            # Params were created by the standard path during init; read
            # them from the bound scope.
            from ..ops.fused_attention import (
                attn_hsplit_fits_vmem,
                attn_hsplit_supported,
                attn_sublayer_fits_vmem,
                fused_attention_sublayer,
                fused_attention_sublayer_wf,
            )
            from ..ops.fused_mlp import fused_ln_qkv, qkv_fits_vmem
            from ..ops.flash_attention import flash_attention_packed

            p = self.variables["params"]
            sa = p["self_attn"]
            dh = self.d_model // self.num_heads
            if mask is None:
                kv_lens = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            else:
                # caller-threaded lengths (gate above guarantees presence)
                kv_lens = jnp.broadcast_to(
                    jnp.asarray(kv_lengths, jnp.int32), (x.shape[0],)
                )
            if (
                dh % 128 == 0
                and attn_sublayer_fits_vmem(self.d_model, self.d_model, x.shape[1])
            ) or (
                attn_hsplit_supported(self.d_model, self.num_heads)
                and attn_hsplit_fits_vmem(self.d_model, self.d_model, x.shape[1])
            ):
                # whole sublayer (LN -> q/k/v -> per-head softmax*V -> out
                # projection -> residual) in two VMEM kernels: only k/v are
                # materialized in HBM (every query tile needs all keys).
                # The impl picks whole-D vs head-group-split by dh/VMEM.
                if ad.kind == "wf":
                    # WF-adapted serving: the low-rank inserts fold into the
                    # effective weights in XLA (skinny matmuls, once per
                    # dispatch) and the unchanged kernels run — previously
                    # WF-adapted models were stuck on the module path
                    x = fused_attention_sublayer_wf(
                        x,
                        p["self_attn_ln"]["scale"], p["self_attn_ln"]["bias"],
                        {
                            "wq": sa["q_proj"]["dense"]["kernel"],
                            "bq": sa["q_proj"]["dense"]["bias"],
                            "wk": sa["k_proj"]["dense"]["kernel"],
                            "wv": sa["v_proj"]["dense"]["kernel"],
                            "bv": sa["v_proj"]["dense"]["bias"],
                            "wo": sa["out_proj"]["dense"]["kernel"],
                            "bo": sa["out_proj"]["dense"]["bias"],
                        },
                        {
                            n: {
                                "a": sa[f"{proj}_proj"]["adapter_wf"]["a"],
                                "g": sa[f"{proj}_proj"]["adapter_wf"]["g"],
                                "b": sa[f"{proj}_proj"]["adapter_wf"]["b"],
                            }
                            for n, proj in (
                                ("q", "q"), ("k", "k"), ("v", "v"),
                                ("o", "out"),
                            )
                        },
                        self.num_heads, 1e-5, float(ad.scale), kv_lens,
                    )
                else:
                    x = fused_attention_sublayer(
                        x,
                        p["self_attn_ln"]["scale"], p["self_attn_ln"]["bias"],
                        sa["q_proj"]["dense"]["kernel"], sa["q_proj"]["dense"]["bias"],
                        sa["k_proj"]["dense"]["kernel"],
                        sa["v_proj"]["dense"]["kernel"], sa["v_proj"]["dense"]["bias"],
                        sa["out_proj"]["dense"]["kernel"], sa["out_proj"]["dense"]["bias"],
                        kv_lens, self.num_heads,
                    )
                fused_attn = True
            elif ad.kind != "wf" and qkv_fits_vmem(self.d_model, self.d_model):
                # long-context fallback: fused LN+QKV kernel into the
                # head-packed flash kernel (online softmax), out-projection
                # with the residual fused into its epilogue by XLA
                q, k, v = fused_ln_qkv(
                    x,
                    p["self_attn_ln"]["scale"], p["self_attn_ln"]["bias"],
                    sa["q_proj"]["dense"]["kernel"], sa["q_proj"]["dense"]["bias"],
                    sa["k_proj"]["dense"]["kernel"],
                    sa["v_proj"]["dense"]["kernel"], sa["v_proj"]["dense"]["bias"],
                )
                try:
                    attn = flash_attention_packed(
                        q, k, v, self.num_heads, kv_lengths=kv_lens
                    )
                except NotImplementedError:
                    attn = None
                if attn is not None:
                    wo = sa["out_proj"]["dense"]["kernel"].astype(self.dtype)
                    bo = sa["out_proj"]["dense"]["bias"].astype(self.dtype)
                    x = x + (
                        jax.lax.dot_general(
                            attn, wo, (((2,), (0,)), ((), ()))
                        )
                        + bo
                    )
                    fused_attn = True
        if not fused_attn:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_ln")(x)
            attn_out = MultiHeadAttention(
                self.num_heads,
                self.d_model,
                self.dtype,
                self.dropout,
                self.adapter,
                self.use_flash,
                flash_train_min_q=self.flash_train_min_q,
                name="self_attn",
            )(h, mask=mask, deterministic=deterministic, kv_cache=self_cache,
              cache_index=cache_index, kv_lengths=kv_lengths)
            if self_cache is not None:
                attn_out, self_cache = attn_out
            x = x + attn_out
        if ad.kind != "none" and ad.after_attention:
            if slot_caches is not None:
                # KV-cached AttAdapter during incremental decode: the slot
                # attends over cached positions 0..pos, matching training
                x, c = AdapterSlot(ad, self.dtype, name="post_attn_slot")(
                    x, mask=mask, deterministic=deterministic,
                    kv_cache=slot_caches["post_attn"], cache_index=cache_index,
                )
                slot_caches = dict(slot_caches, post_attn=c)
            else:
                x = AdapterSlot(ad, self.dtype, name="post_attn_slot")(
                    x, mask=mask, deterministic=deterministic
                )
        if self.cross_attention:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="cross_attn_ln")(x)
            cross_out = MultiHeadAttention(
                self.num_heads,
                self.d_model,
                self.dtype,
                self.dropout,
                self.adapter,
                self.use_flash,
                flash_train_min_q=self.flash_train_min_q,
                name="cross_attn",
            )(h, kv=enc, mask=enc_mask, deterministic=deterministic,
              kv_cache=cross_cache, kv_lengths=enc_kv_lengths)
            if cross_cache is not None:
                cross_out, cross_cache = cross_out
            x = x + cross_out
        if (
            deterministic
            and not self.is_initializing()
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and x.ndim == 3
            and x.shape[1] >= 64  # decode steps (Tq=1) would pad to BLOCK_T
            and self.d_model % 128 == 0
            and self.mlp_dim % 128 == 0
            and _on_tpu()
            and "dense" in self.variables["params"]["mlp"]["fc1"]  # not int8
        ):
            # inference fast path: the whole pre-LN MLP sublayer
            # (LayerNorm -> fc1 -> GELU -> fc2 -> +residual) in one VMEM
            # kernel — neither the LN output nor the [B, T, mlp_dim] hidden
            # tensor touches HBM (ops/fused_mlp.py). Params were created by
            # the standard path during init; read them from the bound scope.
            from ..ops.fused_mlp import (
                fused_ln_mlp_residual,
                fused_ln_mlp_residual_wf,
                mlp_csplit_fits_vmem,
                mlp_fits_vmem,
            )

            if mlp_fits_vmem(self.d_model, self.mlp_dim) or mlp_csplit_fits_vmem(
                self.d_model, self.mlp_dim
            ):
                p = self.variables["params"]
                if ad.kind == "wf":
                    # WF-adapted serving: fold the fc1/fc2 inserts (see the
                    # attention gate above)
                    x = fused_ln_mlp_residual_wf(
                        x,
                        p["mlp_ln"]["scale"], p["mlp_ln"]["bias"],
                        p["mlp"]["fc1"]["dense"]["kernel"],
                        p["mlp"]["fc1"]["dense"]["bias"],
                        p["mlp"]["fc2"]["dense"]["kernel"],
                        p["mlp"]["fc2"]["dense"]["bias"],
                        {
                            "a": p["mlp"]["fc1"]["adapter_wf"]["a"],
                            "g": p["mlp"]["fc1"]["adapter_wf"]["g"],
                            "b": p["mlp"]["fc1"]["adapter_wf"]["b"],
                        },
                        {
                            "a": p["mlp"]["fc2"]["adapter_wf"]["a"],
                            "g": p["mlp"]["fc2"]["adapter_wf"]["g"],
                            "b": p["mlp"]["fc2"]["adapter_wf"]["b"],
                        },
                        1e-5,
                        self.gelu_form,
                        float(ad.scale),
                    )
                else:
                    x = fused_ln_mlp_residual(
                        x,
                        p["mlp_ln"]["scale"], p["mlp_ln"]["bias"],
                        p["mlp"]["fc1"]["dense"]["kernel"],
                        p["mlp"]["fc1"]["dense"]["bias"],
                        p["mlp"]["fc2"]["dense"]["kernel"],
                        p["mlp"]["fc2"]["dense"]["bias"],
                        1e-5,
                        self.gelu_form,
                    )
            else:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_ln")(x)
                x = x + MLP(
                    self.d_model, self.mlp_dim, self.dtype, self.dropout,
                    self.adapter, gelu_form=self.gelu_form, name="mlp",
                )(h, deterministic=deterministic)
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_ln")(x)
            x = x + MLP(
                self.d_model, self.mlp_dim, self.dtype, self.dropout,
                self.adapter, gelu_form=self.gelu_form, name="mlp",
            )(h, deterministic=deterministic)
        if ad.kind != "none" and ad.after_mlp:
            if slot_caches is not None:
                x, c = AdapterSlot(ad, self.dtype, name="post_mlp_slot")(
                    x, mask=mask, deterministic=deterministic,
                    kv_cache=slot_caches["post_mlp"], cache_index=cache_index,
                )
                slot_caches = dict(slot_caches, post_mlp=c)
            else:
                x = AdapterSlot(ad, self.dtype, name="post_mlp_slot")(
                    x, mask=mask, deterministic=deterministic
                )
        if self_cache is not None or cross_cache is not None:
            return x, self_cache, cross_cache, slot_caches
        return x


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, 1, 1, max_len] attention mask (True = valid)."""
    valid = jnp.arange(max_len)[None, :] < lengths[:, None]
    return valid[:, None, None, :]


def banded_length_mask(
    lengths: jnp.ndarray,
    max_len: int,
    left: int,
    right: int,
) -> jnp.ndarray:
    """Length mask restricted to a (left, right) context band around each
    query: [B, 1, T, T], True where key j is valid AND q-left <= j <= q+right
    (-1 = unbounded on that side). Streaming-matched training
    (CTCModelConfig.attention_left_context/right): note the [.., T, T] shape
    intentionally bypasses the prefix-mask fused/flash fast paths — banded
    attention takes the general XLA path."""
    mask = length_mask(lengths, max_len)  # [B,1,1,T]
    qi = jnp.arange(max_len)[:, None]
    ki = jnp.arange(max_len)[None, :]
    band = jnp.ones((max_len, max_len), bool)
    if left >= 0:
        band &= ki >= qi - left
    if right >= 0:
        band &= ki <= qi + right
    return mask & band[None, None, :, :]
