"""Whisper autoregressive generation with KV cache under lax.while_loop.

TPU-native counterpart of WhisperGenerationMixin.generate (SURVEY.md 3.2):
the reference syncs host<->device once per token for stopping criteria; here
the whole decode loop compiles into one XLA program — greedy first, beam as
a batched extension. Stops on EOT or max length, entirely on device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.config import DecodeConfig

# Whisper multilingual special tokens (vocab 51865; SURVEY C6/C7)
SOT = 50258
EOT = 50257
TRANSCRIBE = 50359
NO_TIMESTAMPS = 50363
LANG_ZH = 50260


def default_prompt(vocab_size: int = 51865) -> Tuple[int, ...]:
    """<|startoftranscript|><|zh|><|transcribe|><|notimestamps|> — the
    standard Mandarin transcription prompt."""
    shift = 1 if vocab_size == 51866 else 0  # large-v3 adds a language token
    return (SOT + shift, LANG_ZH + shift, TRANSCRIBE + shift, NO_TIMESTAMPS + shift)


def greedy_generate(
    model,
    params,
    mel: jnp.ndarray,  # [B, mels, T]
    max_len: int = 224,
    prompt: Optional[Tuple[int, ...]] = None,
    eot_id: int = EOT,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy AR decode -> (tokens [B, max_len], lengths [B]). `lengths`
    counts generated tokens excluding the prompt and the EOT."""
    prompt = prompt or default_prompt(model.cfg.vocab_size)
    B = mel.shape[0]
    P = len(prompt)

    enc = model.apply({"params": params}, mel, method=model.encode)
    caches = model.apply({"params": params}, B, enc, method=model.init_cache)

    tokens0 = jnp.full((B, max_len), eot_id, jnp.int32)
    tokens0 = tokens0.at[:, :P].set(jnp.asarray(prompt, jnp.int32)[None])

    def step_fn(carry):
        tokens, caches, pos, done = carry
        tok = jax.lax.dynamic_slice(tokens, (0, pos), (B, 1))
        logits, caches = model.apply(
            {"params": params}, tok, pos, enc, caches, method=model.decode_step
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        is_prompt = pos + 1 < P  # keep forced prompt tokens
        cur_next = jax.lax.dynamic_slice(tokens, (0, pos + 1), (B, 1))[:, 0]
        nxt = jnp.where(done, eot_id, jnp.where(is_prompt, cur_next, nxt))
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        done = done | (~is_prompt & (nxt == eot_id))
        return tokens, caches, pos + 1, done

    def cond_fn(carry):
        _, _, pos, done = carry
        return (pos < max_len - 1) & ~jnp.all(done)

    done0 = jnp.zeros((B,), bool)
    tokens, _, _, _ = jax.lax.while_loop(
        cond_fn, step_fn, (tokens0, caches, jnp.int32(0), done0)
    )
    # lengths: generated tokens before first EOT after the prompt
    gen = tokens[:, P:]
    is_eot = gen == eot_id
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(jnp.any(is_eot, axis=1), first_eot, gen.shape[1])
    return gen, lengths


def generate(bundle, mel: jnp.ndarray, decode_cfg: DecodeConfig):
    """Entry used by ModelBundle.transcribe for the whisper family."""
    from ..models.whisper import WhisperModel

    model = WhisperModel(bundle.config.whisper)
    return greedy_generate(
        model, bundle.params, mel, max_len=decode_cfg.max_decode_len
    )
