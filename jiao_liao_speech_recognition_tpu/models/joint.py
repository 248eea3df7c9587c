"""Joint CTC/attention transformer ASR model (SURVEY.md C8).

The reference's SpeechBrain pin ships the TransformerASR recipe family:
a conv-subsampled transformer encoder trained with BOTH a CTC head and an
attention (transformer) decoder under the hybrid loss
``ctc_weight * CTC + (1 - ctc_weight) * CE`` (speechbrain's classic
joint CTC/attention training, /root/reference/requirements.txt:71). This is
the TPU-native counterpart: the encoder trunk matches CTCEncoderModel
(Pallas flash attention, bf16 MXU compute), the decoder mirrors the
Whisper-style causal/cross-attention stack with KV-cached
``lax.while_loop`` decoding, and both heads share one encoder pass.

Token conventions: the CharTokenizer CTC blank (id 0) doubles as the
attention decoder's sos/eos — blank never appears inside label sequences,
so <0> ... tokens ... <0> is unambiguous and the two heads share one vocab.

Decoding (decode/joint_generate.py): attention greedy / beam with optional
CTC joint rescoring of finished hypotheses (ctc_weight * CTC prefix score +
attention log-prob), mirroring SpeechBrain's joint decoding semantics in a
statically-shaped, single-program form.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.config import JointModelConfig
from .ctc_model import CTCHead, ConvSubsampler
from .layers import (
    TransformerBlock,
    banded_length_mask,
    length_mask,
    sinusoidal_positions,
)


class JointCTCAttentionModel(nn.Module):
    """Hybrid CTC + attention model over one shared encoder.

    __call__ returns (ctc_log_probs [B,T',V], enc_lengths [B],
    dec_logits [B,S,V]) for the joint loss; `encode`/`init_cache`/
    `decode_step` expose the KV-cached AR decode interface used by
    decode/joint_generate.py.
    """

    cfg: JointModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        ad = cfg.adapter if cfg.adapter.kind != "none" else None
        block = TransformerBlock
        if cfg.remat:
            block = nn.remat(TransformerBlock, static_argnums=(5, 9))
        self.subsample = ConvSubsampler(
            cfg.d_model, cfg.conv_channels, dtype, cfg.subsample_factor,
            name="subsample",
        )
        self.enc_blocks = [
            block(
                cfg.d_model, cfg.num_heads, cfg.mlp_dim, dtype, cfg.dropout,
                ad, cfg.use_flash_attention, gelu_form=cfg.gelu_form,
                flash_train_min_q=cfg.flash_train_min_q,
                name=f"enc_block_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.enc_ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="enc_ln")
        self.ctc_head = CTCHead(cfg.vocab_size, dtype, cfg.d_model, name="ctc_head")
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=dtype, name="embed_tokens"
        )
        # decoder blocks stay un-rematted: target sequences are short (S <=
        # max_target_positions) and remat's positional-call protocol clashes
        # with the kwarg-rich cached decode path
        self.dec_blocks = [
            TransformerBlock(
                cfg.d_model, cfg.num_heads, cfg.mlp_dim, dtype, cfg.dropout,
                ad, cfg.use_flash_attention, cross_attention=True,
                gelu_form=cfg.gelu_form,
                flash_train_min_q=cfg.flash_train_min_q,
                name=f"dec_block_{i}",
            )
            for i in range(cfg.decoder_layers)
        ]
        self.dec_ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="dec_ln")

    # ---------------------------------------------------------------- encode
    def encode(
        self,
        features: jnp.ndarray,  # [B, num_mels, T] log-mel
        feature_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, M, T = features.shape
        if T > cfg.max_frames:
            raise ValueError(
                f"input has {T} frames > max_frames={cfg.max_frames}; raise "
                "JointModelConfig.max_frames or chunk the audio"
            )
        if feature_lengths is None:
            feature_lengths = jnp.full((B,), T, dtype=jnp.int32)
        x = features.transpose(0, 2, 1).astype(dtype)
        x = self.subsample(x)
        t_out = x.shape[1]
        out_lengths = feature_lengths
        f = cfg.subsample_factor
        while f > 1:
            out_lengths = (out_lengths + 1) // 2
            f //= 2
        if cfg.position_mode == "sinusoidal":
            x = x + sinusoidal_positions(t_out, cfg.d_model, dtype)[None]
        elif cfg.position_mode != "none":
            raise ValueError(f"unknown position_mode {cfg.position_mode!r}")
        L, R = cfg.attention_left_context, cfg.attention_right_context
        if L >= 0 or R >= 0:
            # streaming-matched band attention (see CTCModelConfig)
            mask = banded_length_mask(out_lengths, t_out, L, R)
            attn_lens = None
        else:
            mask = length_mask(out_lengths, t_out)
            attn_lens = out_lengths  # threaded: fused paths consume lengths
        for blk in self.enc_blocks:
            x = blk(
                x, mask, None, None, deterministic, None, None, None, False,
                None, attn_lens,
            )
        return self.enc_ln(x), out_lengths

    # ------------------------------------------------------------- CTC branch
    def ctc_log_probs(self, enc: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(self.ctc_head(enc), axis=-1)

    def ctc_argmax_ids(self, enc: jnp.ndarray) -> jnp.ndarray:
        """Fused matmul+argmax greedy path (ops/fused_head.py)."""
        return self.ctc_head.argmax_ids(enc)

    # -------------------------------------------------------- attention branch
    def decode_teacher(
        self,
        tokens: jnp.ndarray,  # [B, S]
        enc: jnp.ndarray,
        enc_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, S = tokens.shape
        if S > cfg.max_target_positions:
            raise ValueError(
                f"{S} target positions > max_target_positions="
                f"{cfg.max_target_positions}"
            )
        x = self.embed_tokens(tokens)
        x = x + sinusoidal_positions(S, cfg.d_model, dtype)[None]
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        enc_mask = (
            length_mask(enc_lengths, enc.shape[1]) if enc_lengths is not None else None
        )
        for blk in self.dec_blocks:
            x = blk(x, mask=causal, enc=enc, enc_mask=enc_mask,
                    deterministic=deterministic, enc_kv_lengths=enc_lengths)
        x = self.dec_ln(x)
        # tied output projection (shared input/output embedding)
        return self.embed_tokens.attend(x.astype(jnp.float32))

    # ------------------------------------------------------------- joint call
    def __call__(
        self,
        features: jnp.ndarray,
        feature_lengths: Optional[jnp.ndarray] = None,
        tokens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        enc, out_lengths = self.encode(features, feature_lengths, deterministic)
        ctc_lp = self.ctc_log_probs(enc)
        dec_logits = None
        if tokens is not None:
            dec_logits = self.decode_teacher(
                tokens, enc, out_lengths, deterministic
            )
        return ctc_lp, out_lengths, dec_logits

    # ------------------------------------------------------- KV-cached decode
    def init_cache(
        self, batch: int, enc: jnp.ndarray, max_len: Optional[int] = None
    ) -> Dict:
        """Zeroed self caches sized to the decode horizon + cross K/V
        precomputed once per utterance (same design as WhisperDecoder:
        models/whisper.py::init_cache)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        t_cache = cfg.max_target_positions
        if max_len is not None:
            t_cache = min(max_len, t_cache)
        H = cfg.num_heads
        dh = cfg.d_model // H
        # batch-conditional layout (see WhisperDecoder.init_cache): head-
        # major [B, H, T, dh] at batch >= 16, packed [B, T, d] below
        from . import layers as _layers  # late lookup: patchable in tests
        head_major = batch >= _layers.HEAD_MAJOR_MIN_BATCH
        caches = {}
        for i, blk in enumerate(self.dec_blocks):
            cross = blk(None, enc=enc, precompute_cross=True)
            if head_major:
                t_enc = cross["k"].shape[1]
                cross = {
                    n: a.reshape(batch, t_enc, H, dh).transpose(0, 2, 1, 3)
                    for n, a in cross.items()
                }
                # kernel-ready horizons (see WhisperDecoder.init_cache):
                # Tk % KERNEL_TK == 0 routes head-major decode attention
                # through the grouped streaming kernel; padded once at
                # build time, masked off via the derived prefix lengths
                from ..ops.decode_attention import pad_time_to_tk, round_tk

                cross = {n: pad_time_to_tk(a, 2) for n, a in cross.items()}
                t_self = round_tk(t_cache)
                self_shape = (batch, H, t_self, dh)
            else:
                t_self = t_cache
                self_shape = (batch, t_cache, cfg.d_model)
            entry = {
                "self": {
                    "k": jnp.zeros(self_shape, dtype),
                    "v": jnp.zeros(self_shape, dtype),
                },
                "cross": cross,
            }
            if cfg.adapter.kind == "att":
                ad_dim = cfg.adapter.att_num_heads * cfg.adapter.att_key_dim
                # horizon = t_self: the slots share decode_step's key mask,
                # sized to the (possibly 128-rounded) self-cache horizon
                entry["slots"] = {
                    s: {
                        "k": jnp.zeros((batch, t_self, ad_dim), dtype),
                        "v": jnp.zeros((batch, t_self, ad_dim), dtype),
                    }
                    for s in ("post_attn", "post_mlp")
                }
            caches[f"dec_block_{i}"] = entry
        return caches

    def decode_step(
        self,
        token: jnp.ndarray,  # [B, 1]
        pos: jnp.ndarray,  # scalar int32
        enc: jnp.ndarray,
        caches: Dict,
        enc_lengths: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = self.embed_tokens(token)
        pos_table = sinusoidal_positions(cfg.max_target_positions, cfg.d_model, dtype)
        x = x + jax.lax.dynamic_slice(pos_table, (pos, 0), (1, cfg.d_model))[None]
        t_cache = caches["dec_block_0"]["self"]["k"].shape[-2]
        kmask = jnp.arange(t_cache)[None, None, None, :] <= pos
        enc_mask = (
            length_mask(enc_lengths, enc.shape[1]) if enc_lengths is not None else None
        )
        new_caches = {}
        for i, blk in enumerate(self.dec_blocks):
            name = f"dec_block_{i}"
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
                # threaded decode lengths: keys 0..pos are valid (kmask is
                # kept for the adapter slots' exact path)
                kv_lengths=pos + 1,
                enc_kv_lengths=enc_lengths,
            )
            new_caches[name] = {"self": self_c, "cross": cross_c}
            if slot_c is not None:
                new_caches[name]["slots"] = slot_c
        x = self.dec_ln(x)
        logits = self.embed_tokens.attend(x.astype(jnp.float32))
        return logits[:, 0], new_caches
