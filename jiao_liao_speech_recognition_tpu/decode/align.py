"""Cross-attention forced alignment for the whisper family — per-token
timestamps without touching the model code.

The reference's stack exposes Whisper word timestamps through cross-attention
DTW (transformers 4.36 `generate(return_token_timestamps=True)`,
/root/reference/requirements.txt:81); this is the TPU-native equivalent. A
teacher-forced decoder pass with Flax ``capture_intermediates`` grabs each
block's cross-attention ``q_proj``/``k_proj`` outputs (module boundaries — no
flag threading through the hot paths, and the capture costs nothing in normal
inference), the attention probabilities are recomputed exactly from them
(softmax(q kᵀ/√dh), the same math the module applies), averaged over heads
and layers, and a monotonic DTW over each utterance's [tokens × encoder
frames] matrix yields contiguous per-token frame spans.

All-heads averaging (vs the HF per-checkpoint "alignment heads" lists):
from-scratch checkpoints carry no alignment-head metadata, and the average is
the convention-free baseline. One encoder frame = 2 mel hops = 20 ms.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _decoder_cross_qk(wcfg, params, mel, tokens):
    """Teacher-forced pass capturing cross-attention q/k per decoder block.

    Returns (q_layers, k_layers): lists of [B, S, d] / [B, T, d] f32 arrays,
    one per decoder layer. ``tokens`` is the full [B, S] sequence (prompt +
    generated); ``mel`` the [B, mels, frames] features the ids were decoded
    from (the encoder output is recomputed — one extra encoder forward, only
    on the timestamps path).
    """
    from ..models.whisper import WhisperModel

    model = WhisperModel(wcfg)

    def keep(mdl, _method):
        return mdl.name in ("q_proj", "k_proj")

    _, state = model.apply(
        {"params": params},
        mel,
        jnp.asarray(tokens, jnp.int32),
        capture_intermediates=keep,
        mutable=["intermediates"],
    )
    dec = state["intermediates"]["decoder"]
    q_layers, k_layers = [], []
    for i in range(wcfg.decoder_layers):
        blk = dec[f"block_{i}"]["cross_attn"]
        q_layers.append(np.asarray(blk["q_proj"]["__call__"][0], np.float32))
        k_layers.append(np.asarray(blk["k_proj"]["__call__"][0], np.float32))
    return q_layers, k_layers


def cross_attention_matrix(wcfg, params, mel, tokens) -> np.ndarray:
    """[B, S, T] f32 — teacher-forced cross-attention probabilities over the
    full encoder horizon. Averages ``wcfg.alignment_heads`` (the HF
    generation_config (layer, head) pairs, imported by whisper_import) when
    set; all heads of all layers otherwise (from-scratch checkpoints carry
    no alignment metadata)."""
    q_layers, k_layers = _decoder_cross_qk(wcfg, params, mel, tokens)
    H = wcfg.num_heads
    by_layer = {}
    for l, h in wcfg.alignment_heads:
        by_layer.setdefault(int(l), []).append(int(h))
    acc: Optional[np.ndarray] = None
    n = 0
    for i, (q, k) in enumerate(zip(q_layers, k_layers)):
        heads = by_layer.get(i) if by_layer else None
        if by_layer and not heads:
            continue
        B, S, d = q.shape
        T = k.shape[1]
        dh = d // H
        qh = q.reshape(B, S, H, dh)
        kh = k.reshape(B, T, H, dh)
        s = np.einsum("bshd,bthd->bhst", qh, kh) / np.sqrt(dh)
        s -= s.max(axis=-1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=-1, keepdims=True)
        if heads:
            p = p[:, heads]
        m = p.sum(axis=1)  # -> [B, S, T]
        n += p.shape[1]
        acc = m if acc is None else acc + m
    assert acc is not None and n, (
        "no cross-attention captured: empty decoder or alignment_heads "
        "referencing layers outside the model"
    )
    return acc / n


def dtw_spans(attn: np.ndarray) -> List[Tuple[int, int]]:
    """Monotonic DTW over one utterance's [S_tokens, T_frames] attention
    matrix. Moves are (token+1, frame+1) and (token, frame+1) — every token
    occupies >= 1 frame, frames advance strictly — maximizing the summed
    log-probability along the path. Returns one (start_frame, end_frame)
    half-open span per token, contiguous and non-overlapping."""
    S, T = attn.shape
    if S == 0:
        return []
    if T < S:  # degenerate: fewer frames than tokens — spread evenly
        edges = np.linspace(0, T, S + 1).astype(int)
        return [(int(edges[i]), int(max(edges[i + 1], edges[i] + 1))) for i in range(S)]
    logA = np.log(np.maximum(attn, 1e-12))
    NEG = -1e18
    # D[i, j]: best score of a path ending with token i at frame j
    D = np.full((S, T), NEG)
    ptr = np.zeros((S, T), np.uint8)  # 0 = stay on token row, 1 = came from row above
    D[0, 0] = logA[0, 0]
    for j in range(1, T):
        D[0, j] = D[0, j - 1] + logA[0, j]
    for i in range(1, S):
        # frame j must be >= token index i (each earlier token took a frame)
        for j in range(i, T - (S - 1 - i)):
            stay = D[i, j - 1]
            up = D[i - 1, j - 1]
            if up >= stay:
                D[i, j] = up + logA[i, j]
                ptr[i, j] = 1
            else:
                D[i, j] = stay + logA[i, j]
    # backtrack from (S-1, T-1)
    bounds = np.zeros(S, np.int64)  # first frame of each token
    i, j = S - 1, T - 1
    while i > 0:
        if ptr[i, j]:
            bounds[i] = j
            i -= 1
        j -= 1
    spans = []
    for t in range(S):
        start = int(bounds[t])
        end = int(bounds[t + 1]) if t + 1 < S else T
        spans.append((start, max(end, start + 1)))
    return spans


def whisper_token_spans(
    wcfg,
    params,
    mel,
    gen_ids: np.ndarray,  # [B, G] generated tokens (after the prompt)
    gen_lens: np.ndarray,  # [B] tokens before the first EOT
    prompt: Tuple[int, ...],
    eot: int,
    valid_frames: Optional[np.ndarray] = None,  # [B] encoder frames w/ audio
) -> List[List[Tuple[int, int]]]:
    """Per utterance, one (start_frame, end_frame) encoder-frame span per
    generated text token. Query rows are the tokens' own input positions
    (the transformers convention for token timestamps)."""
    B = gen_ids.shape[0]
    P = len(prompt)
    G = int(gen_lens.max()) if B else 0
    if G == 0:
        return [[] for _ in range(B)]
    tokens = np.full((B, P + G), eot, np.int64)
    tokens[:, :P] = np.asarray(prompt, np.int64)[None]
    tokens[:, P:] = gen_ids[:, :G]
    A = cross_attention_matrix(wcfg, params, mel, tokens)  # [B, P+G, T]
    T = A.shape[-1]
    out: List[List[Tuple[int, int]]] = []
    for b in range(B):
        n = int(gen_lens[b])
        if n == 0:
            out.append([])
            continue
        tv = T if valid_frames is None else max(int(valid_frames[b]), 1)
        out.append(dtw_spans(A[b, P : P + n, : min(tv, T)]))
    return out
