"""Whisper encoder-decoder backbone in Flax (SURVEY.md C7).

Structure matches the reference's transformers WhisperForConditionalGeneration
(verified in SURVEY: encoder = Conv1d(k3,p1) + Conv1d(k3,s2,p1) subsample ->
3000->1500 positions, fixed sinusoidal encoder positions, pre-LN blocks;
decoder = learned positions, causal self-attn + cross-attn blocks; logits
tied to the token embedding). Weight import from HF safetensors lives in
whisper_import.py; adapters inject exactly as in the CTC backbone.

TPU design: bf16 compute, KV caches updated with dynamic_update_slice
inside a lax.while_loop decode (no per-step host sync — SURVEY §7
hard-part 5); cache layout is batch-conditional (init_cache): packed
[B, T_max, d_model] at small batch, head-major [B, H, T_max, dh] at
batch >= layers.HEAD_MAJOR_MIN_BATCH where the packed layout's per-step
relayout costs ~3x decode throughput.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.config import WhisperConfig
from .layers import MultiHeadAttention, TransformerBlock, length_mask, sinusoidal_positions


class TiedEmbedding(nn.Module):
    """Whisper's tied token embedding + output head (the reference's HF
    WhisperForConditionalGeneration shares proj_out with embed_tokens).

    Drop-in for nn.Embed with the same param tree ({embedding [V, D] f32})
    and the same lookup/attend numerics, plus an int8 serving mode: when
    ModelBundle.quantize() has replaced the subtree with {embedding_q int8
    [V, D], scale f32 [V]} (per-vocab-row symmetric), lookups gather int8
    rows and dequantize per token, and attend streams the ROW-major table
    through ops/quant.int8_tied_logits — the [V, D] bf16 read per decode
    step (133 MB for large-v3) drops to int8 bytes with no transposed or
    dequantized copy of the table ever materializing in HBM."""

    num_embeddings: int
    features: int
    dtype: Any = jnp.bfloat16

    def _qtree(self):
        p = self.variables.get("params", {})
        if not self.is_initializing() and "embedding_q" in p:
            return p
        return None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        p = self._qtree()
        if p is not None:
            rows = jnp.take(p["embedding_q"], tokens, axis=0).astype(jnp.float32)
            s = jnp.take(p["scale"], tokens, axis=0).astype(jnp.float32)
            return (rows * s[..., None]).astype(self.dtype)
        emb = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        return jnp.take(emb, tokens, axis=0).astype(self.dtype)

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        """Logits against the (tied) table; x [..., D]. Callers always run
        __call__ first in the same apply, so the param exists by now."""
        p = self._qtree()
        if p is not None:
            from ..ops.quant import int8_tied_logits

            lead = x.shape[:-1]
            out = int8_tied_logits(
                x.reshape(-1, x.shape[-1]), p["embedding_q"], p["scale"]
            )
            return out.reshape(*lead, self.num_embeddings)
        emb = self.variables["params"]["embedding"]
        # nn.Embed.attend semantics: promote both operands to self.dtype
        return jnp.dot(x.astype(self.dtype), emb.T.astype(self.dtype))


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,  # [B, num_mels, T]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = mel.transpose(0, 2, 1).astype(dtype)  # [B, T, M]
        x = nn.Conv(cfg.d_model, (3,), padding=((1, 1),), dtype=dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, (3,), strides=(2,), padding=((1, 1),), dtype=dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        t = x.shape[1]
        if t > cfg.max_source_positions:
            raise ValueError(
                f"{t} encoder positions > max_source_positions="
                f"{cfg.max_source_positions} (Whisper's fixed receptive "
                "field, SURVEY §5.7); chunk the audio to 30 s"
            )
        x = x + sinusoidal_positions(t, cfg.d_model, dtype)[None]
        ad = cfg.adapter if cfg.adapter.kind != "none" else None
        block = TransformerBlock
        if cfg.remat:
            # rematerialize each encoder block on the backward pass: at the
            # 30 s window (T=1500) the per-block activations are ~150 MB at
            # B=8 x d=1280 — without this, B=8 fine-tuning exhausts HBM
            # even with flash attention (r4 measured). static_argnums match
            # ctc_model.py's positional-call protocol.
            block = nn.remat(TransformerBlock, static_argnums=(5, 9))
        for i in range(cfg.encoder_layers):
            layer = block(
                cfg.d_model, cfg.num_heads, cfg.mlp_dim, dtype, cfg.dropout,
                ad, cfg.use_flash_attention,
                flash_train_min_q=cfg.flash_train_min_q, name=f"block_{i}",
            )
            # positional call keeps nn.remat static_argnums stable
            x = layer(
                x, None, None, None, deterministic, None, None, None, False,
                None, None,
            )
        return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="ln_post")(x)


class WhisperDecoder(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.embed_tokens = TiedEmbedding(
            cfg.vocab_size, cfg.d_model, dtype=dtype, name="embed_tokens"
        )
        self.embed_positions = self.param(
            "embed_positions",
            nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model),
            jnp.float32,
        )
        ad = cfg.adapter if cfg.adapter.kind != "none" else None
        self.blocks = [
            TransformerBlock(
                cfg.d_model, cfg.num_heads, cfg.mlp_dim, dtype, cfg.dropout,
                ad, cfg.use_flash_attention, cross_attention=True,
                flash_train_min_q=cfg.flash_train_min_q, name=f"block_{i}",
            )
            for i in range(cfg.decoder_layers)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="ln")

    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, S]
        enc: jnp.ndarray,  # [B, T, d]
        enc_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, S = tokens.shape
        x = self.embed_tokens(tokens)
        x = x + self.embed_positions[:S].astype(dtype)[None]
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        enc_mask = (
            length_mask(enc_lengths, enc.shape[1]) if enc_lengths is not None else None
        )
        for blk in self.blocks:
            x = blk(x, mask=causal, enc=enc, enc_mask=enc_mask,
                    deterministic=deterministic, enc_kv_lengths=enc_lengths)
        x = self.ln(x)
        # tied output projection (Whisper convention)
        logits = self.embed_tokens.attend(x.astype(jnp.float32))
        return logits

    # ---------------------------------------------------------------- decode
    def init_cache(
        self,
        batch: int,
        enc: jnp.ndarray,
        max_len: Optional[int] = None,
        layout: Optional[str] = None,
    ) -> Dict:
        """Build per-layer KV caches: zeroed self caches [B, T_cache, d]
        plus cross-attention K/V precomputed ONCE from the encoder output —
        the reference recomputes nothing either (HF static cross cache), and
        skipping the per-step [B, T_enc, d] projections is worth ~2 matmuls
        x layers per generated token.

        T_cache = min(max_len, max_target_positions): the self caches are
        re-read end to end EVERY decode step, so sizing them to the actual
        decode horizon instead of the 448-position ceiling cuts real HBM
        traffic (decode_step derives its key mask from the cache shape).

        Backbone cache layout is batch-conditional (MultiHeadAttention
        dispatches on cache ndim): HEAD-MAJOR [B, H, T, dh] at batch >= 16,
        where XLA's batched attention over the packed [B, T, d] layout
        physically relayouts the whole cache every step (~3x decode
        slowdown; the one-time transpose of the cross K/V here is noise by
        comparison), and packed [B, T, d] below that, where the head-major
        einsums measure ~25% slower (docs/PERFORMANCE.md)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        t_cache = cfg.max_target_positions
        if max_len is not None:
            t_cache = min(max_len, t_cache)
        H = cfg.num_heads
        dh = cfg.d_model // H
        from . import layers as _layers  # late lookup: patchable in tests
        if layout is None:
            head_major = batch >= _layers.HEAD_MAJOR_MIN_BATCH
        elif layout in ("packed", "head_major"):
            # explicit override: the serving engine admits utterances one at
            # a time into a batch-`slots` cache, so its unit (batch=1)
            # caches must take the layout the SLOT COUNT picks, not what
            # batch=1 would
            head_major = layout == "head_major"
        else:
            raise ValueError(f"unknown cache layout {layout!r}")

        def _tree_quantized(node):
            if not isinstance(node, dict):
                return False
            return "dense_q" in node or any(
                _tree_quantized(v) for v in node.values()
            )

        # int8-quantized serving tree (ModelBundle.quantize) => also store
        # the cross AND self caches int8 with per-position scales: both are
        # re-read END TO END every decode step (cross is 2 GB bf16 for
        # large-v3 at B=8 — the dominant roofline term once the weights are
        # int8). Cross is quantized once per utterance below; self rows are
        # quantized as decode writes them (layers.MultiHeadAttention).
        int8_cross = _tree_quantized(self.variables.get("params", {}))
        caches = {}
        for i, blk in enumerate(self.blocks):
            cross = blk(None, enc=enc, precompute_cross=True)
            if head_major or int8_cross:
                # int8 cross caches are head-major at EVERY batch size: the
                # int8 read path is mul-reduce (no einsum), so the packed
                # layout's small-batch einsum advantage doesn't apply
                t_enc = cross["k"].shape[1]
                cross = {
                    n: a.reshape(batch, t_enc, H, dh).transpose(0, 2, 1, 3)
                    for n, a in cross.items()
                }
                if head_major and not int8_cross:
                    # store KERNEL-READY for the grouped decode-attention
                    # kernel (Tk % KERNEL_TK == 0): pad ONCE at build time —
                    # padding per step re-copies the whole cache. Padded
                    # keys are masked off (layers.py derives kv_lens from
                    # the enc length / mask, never from the cache shape).
                    from ..ops.decode_attention import pad_time_to_tk

                    cross = {
                        n: pad_time_to_tk(a, 2) for n, a in cross.items()
                    }
            # int8 SELF caches are batch-conditional like the layout: at
            # B >= 16 they are neutral-to-positive (866 vs 881 tok/s at
            # B=16) and unlock B=32 (bf16 caches exceed HBM; measured
            # 886 tok/s), but at B=8 the per-step quantize+row-update
            # overhead and the shallow (B, H/hg) DMA grid cost 1/3 of the
            # throughput (537 vs ~800) — small batches keep packed bf16
            # self + int8 cross, the measured optimum.
            int8_self = int8_cross and head_major
            if head_major:
                # round the self horizon to the kernel granularity
                # (decode_step's key mask derives from the cache shape, so
                # the padded tail is always masked off)
                from ..ops.decode_attention import round_tk

                t_self = round_tk(t_cache)
                self_shape = (batch, H, t_self, dh)
            else:
                t_self = t_cache
                self_shape = (batch, t_cache, cfg.d_model)
            if int8_cross:
                from ..ops.quant import quantize_kv

                kq, ks = quantize_kv(cross["k"])
                vq, vs = quantize_kv(cross["v"])
                # store KERNEL-READY: T padded to a 128-multiple at build
                # time (scales 0 in padding). Padding per step instead was
                # measured to erase the entire int8 win — it re-copies the
                # whole cache every token. The valid horizon isn't stored:
                # decode_step receives the unpadded encoder output every
                # step, so layers.py re-derives it statically (keeping every
                # cache leaf batch-major for beam-search gathers).
                from ..ops.decode_attention import pad_time_to_tk

                cross = {
                    "k": pad_time_to_tk(kq, 2),
                    "k_scale": pad_time_to_tk(ks, 2),
                    "v": pad_time_to_tk(vq, 2),
                    "v_scale": pad_time_to_tk(vs, 2),
                }
            if int8_self:
                # int8 SELF caches complete the all-int8 per-token HBM
                # read set (weights, cross K/V, logit table, self K/V):
                # the self cache is re-read end to end every decode step,
                # and rows are quantized per position as they are written
                # (layers.MultiHeadAttention). Zero scales = unwritten
                # rows dequantize to 0, matching the bf16 zero init.
                self_cache = {
                    "k": jnp.zeros(self_shape, jnp.int8),
                    "k_scale": jnp.zeros(self_shape[:-1], jnp.float32),
                    "v": jnp.zeros(self_shape, jnp.int8),
                    "v_scale": jnp.zeros(self_shape[:-1], jnp.float32),
                }
            else:
                self_cache = {
                    "k": jnp.zeros(self_shape, dtype),
                    "v": jnp.zeros(self_shape, dtype),
                }
            entry = {
                "self": self_cache,
                "cross": cross,
            }
            if cfg.adapter.kind == "att":
                # AttAdapter slots carry their own KV caches so decode
                # attends over the same prefix the trained function saw.
                # Horizon = t_self, NOT t_cache: the slots share decode_
                # step's key mask, which is sized to the (possibly
                # 128-rounded) self-cache horizon.
                ad_dim = cfg.adapter.att_num_heads * cfg.adapter.att_key_dim
                entry["slots"] = {
                    s: {
                        "k": jnp.zeros((batch, t_self, ad_dim), dtype),
                        "v": jnp.zeros((batch, t_self, ad_dim), dtype),
                    }
                    for s in ("post_attn", "post_mlp")
                }
            caches[f"block_{i}"] = entry
        return caches

    def decode_step(
        self,
        token: jnp.ndarray,  # [B, 1]
        pos: jnp.ndarray,  # int32 position: scalar, or [B] per-slot vector
        enc: jnp.ndarray,
        caches: Dict,
        enc_lengths: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict]:
        """One KV-cached decode step. `pos` is a scalar in the offline
        generate loops (every row decodes in lockstep); the continuous-
        batching serving engine (serve/engine.py) passes a [B] vector —
        each slot sits at its own position because utterances join the
        batch mid-flight — and every position-dependent op (pos-embed
        lookup, key mask, cache row writes) is per-row."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pos = jnp.asarray(pos, jnp.int32)
        x = self.embed_tokens(token)
        t_cache = caches["block_0"]["self"]["k"].shape[-2]
        if pos.ndim == 0:
            x = x + jax.lax.dynamic_slice(
                self.embed_positions, (pos, 0), (1, cfg.d_model)
            ).astype(dtype)[None]
            # mask: keys 0..pos valid, over the actual cache horizon
            kmask = jnp.arange(t_cache)[None, None, None, :] <= pos
        else:
            x = x + jnp.take(self.embed_positions, pos, axis=0).astype(dtype)[
                :, None, :
            ]
            kmask = (
                jnp.arange(t_cache)[None, None, None, :]
                <= pos[:, None, None, None]
            )
        enc_mask = (
            length_mask(enc_lengths, enc.shape[1]) if enc_lengths is not None else None
        )
        new_caches = {}
        for i, blk in enumerate(self.blocks):
            name = f"block_{i}"
            x, self_c, cross_c, slot_c = blk(
                x,
                mask=kmask,
                enc=enc,
                enc_mask=enc_mask,
                deterministic=True,
                self_cache=caches[name]["self"],
                cross_cache=caches[name].get("cross"),
                cache_index=pos,
                slot_caches=caches[name].get("slots"),
                # threaded decode lengths: keys 0..pos are valid (scalar pos
                # broadcasts; per-slot [B] pos gives per-row horizons). kmask
                # is kept for the adapter slots' exact path.
                kv_lengths=pos + 1,
                enc_kv_lengths=enc_lengths,
            )
            new_caches[name] = {"self": self_c, "cross": cross_c}
            if slot_c is not None:
                new_caches[name]["slots"] = slot_c
        x = self.ln(x)
        logits = self.embed_tokens.attend(x.astype(jnp.float32))
        return logits[:, 0], new_caches


class WhisperModel(nn.Module):
    """Teacher-forced forward: (mel, tokens) -> logits [B, S, V]."""

    cfg: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg, name="encoder")
        self.decoder = WhisperDecoder(self.cfg, name="decoder")

    def __call__(
        self,
        mel: jnp.ndarray,
        tokens: jnp.ndarray,
        enc_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        enc = self.encoder(mel, deterministic=deterministic)
        return self.decoder(tokens, enc, enc_lengths, deterministic=deterministic)

    def encode(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.encoder(mel, deterministic=deterministic)

    def decode(self, tokens, enc, enc_lengths=None, deterministic: bool = True):
        return self.decoder(tokens, enc, enc_lengths, deterministic=deterministic)

    def decode_step(self, token, pos, enc, caches, enc_lengths=None):
        return self.decoder.decode_step(token, pos, enc, caches, enc_lengths)

    def init_cache(
        self,
        batch: int,
        enc: jnp.ndarray,
        max_len: Optional[int] = None,
        layout: Optional[str] = None,
    ) -> Dict:
        return self.decoder.init_cache(batch, enc, max_len, layout)
