"""SentencePiece-style unigram tokenizer (SURVEY N9, reference
requirements.txt:64).

The reference's SpeechBrain transformer recipes tokenize with a
sentencepiece unigram model; the CTC path here has used a char vocab (the
survey's sanctioned alternative). This module closes N9 fully: a unigram
LM over subword pieces with

* **Viterbi encode** — best segmentation argmax_seg sum log p(piece), a
  left-to-right DP over the sentence with a max-piece-length scan (the
  exact algorithm sentencepiece uses at inference);
* **EM training** — seed candidates from frequent substrings, then
  iterate: E-step computes expected piece counts with forward-backward
  over each sentence's segmentation lattice, M-step re-estimates piece
  log-probabilities, and pruning drops the lowest-expected-count pieces
  until the target vocab size (the sentencepiece unigram trainer's
  structure, compacted);
* **SP-format interop** — load/save of the TSV ``piece<TAB>logprob``
  vocab dump (``spm_export_vocab`` format).

Id space matches CharTokenizer: 0 = CTC blank, 1 = unk, pieces from 2.
Training-side utility; encode is host-side (text -> label ids happens in
the data pipeline, not on device).
"""

from __future__ import annotations

import json
import math
from collections import Counter, defaultdict
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Tuple

BLANK = "<blank>"
UNK = "<unk>"
_UNK_PENALTY = -16.0  # unknown-char fallback score (well below any piece)


class UnigramTokenizer:
    """Unigram-LM subword tokenizer with Viterbi segmentation."""

    def __init__(self, pieces: Sequence[str], logprobs: Sequence[float]):
        if len(pieces) != len(logprobs):
            raise ValueError("pieces and logprobs must align")
        if list(pieces[:2]) != [BLANK, UNK]:
            pieces = [BLANK, UNK] + list(pieces)
            logprobs = [0.0, _UNK_PENALTY] + list(logprobs)
        self.vocab: List[str] = list(pieces)
        self.logprobs: List[float] = [float(x) for x in logprobs]
        self.to_id: Dict[str, int] = {p: i for i, p in enumerate(self.vocab)}
        self.max_len = max((len(p) for p in self.vocab[2:]), default=1)

    # -- construction --------------------------------------------------------
    @classmethod
    def train(
        cls,
        texts: Iterable[str],
        vocab_size: int = 1024,
        max_piece_len: int = 4,
        em_iters: int = 4,
        seed_factor: int = 4,
    ) -> "UnigramTokenizer":
        """EM-train a unigram vocab on `texts` (whitespace stripped, the
        Mandarin convention used by CharTokenizer)."""
        sents = ["".join(t.split()) for t in texts]
        sents = [s for s in sents if s]
        if not sents:
            return cls([BLANK, UNK], [0.0, _UNK_PENALTY])
        chars = sorted({c for s in sents for c in s})
        # seed candidates: all substrings up to max_piece_len, scored by
        # frequency * length; singles always kept for coverage
        sub_counts: Counter = Counter()
        for s in sents:
            n = len(s)
            for i in range(n):
                for l in range(2, min(max_piece_len, n - i) + 1):
                    sub_counts[s[i : i + l]] += 1
        n_multi = max(vocab_size * seed_factor - len(chars), 0)
        seeds = [
            p for p, c in sorted(
                sub_counts.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0])
            )[:n_multi]
            if c >= 2
        ]
        pieces = list(chars) + seeds
        total0 = float(sum(len(s) for s in sents))
        logp = {
            p: math.log((sub_counts.get(p, 1) * len(p) + 1) / (2 * total0))
            for p in pieces
        }
        target_multi = max(vocab_size - 2 - len(chars), 0)

        for it in range(em_iters):
            counts = cls._e_step(sents, logp, max_piece_len)
            # M-step
            total = sum(counts.values()) or 1.0
            logp = {
                p: math.log(max(counts.get(p, 0.0), 1e-12) / total)
                for p in logp
            }
            # prune multi-char pieces toward the target (geometric schedule)
            multi = [p for p in logp if len(p) > 1]
            if len(multi) > target_multi:
                keep_n = max(
                    target_multi, int(len(multi) * 0.6)
                ) if it < em_iters - 1 else target_multi
                ranked = sorted(multi, key=lambda p: -counts.get(p, 0.0))
                kept = set(ranked[:keep_n])
                logp = {
                    p: lp for p, lp in logp.items()
                    if len(p) == 1 or p in kept
                }
        final = sorted(logp)  # deterministic order
        return cls(
            [BLANK, UNK] + final,
            [0.0, _UNK_PENALTY] + [logp[p] for p in final],
        )

    @staticmethod
    def _e_step(
        sents: List[str], logp: Dict[str, float], max_len: int
    ) -> Dict[str, float]:
        """Expected piece counts via forward-backward over each sentence's
        segmentation lattice (log domain)."""
        counts: Dict[str, float] = defaultdict(float)
        for s in sents:
            n = len(s)
            alpha = [-math.inf] * (n + 1)
            alpha[0] = 0.0
            spans: List[List[Tuple[int, str, float]]] = [[] for _ in range(n + 1)]
            # the l==1 unk fallback below keeps every position reachable,
            # so alpha[i] is finite for all i once position i-1 is processed
            for i in range(n):
                for l in range(1, min(max_len, n - i) + 1):
                    p = s[i : i + l]
                    lp = logp.get(p)
                    if lp is None:
                        if l == 1:
                            lp = _UNK_PENALTY  # per-char unk fallback
                        else:
                            continue
                    spans[i + l].append((i, p, lp))
                    cand = alpha[i] + lp
                    alpha[i + l] = (
                        cand if alpha[i + l] == -math.inf
                        else max(alpha[i + l], cand)
                        + math.log1p(math.exp(-abs(alpha[i + l] - cand)))
                    )
            z = alpha[n]
            if z == -math.inf:
                continue
            beta = [-math.inf] * (n + 1)
            beta[n] = 0.0
            for j in range(n, 0, -1):
                for (i, p, lp) in spans[j]:
                    if beta[j] == -math.inf:
                        continue
                    cand = beta[j] + lp
                    beta[i] = (
                        cand if beta[i] == -math.inf
                        else max(beta[i], cand)
                        + math.log1p(math.exp(-abs(beta[i] - cand)))
                    )
            for j in range(1, n + 1):
                for (i, p, lp) in spans[j]:
                    if alpha[i] == -math.inf or beta[j] == -math.inf:
                        continue
                    gamma = alpha[i] + lp + beta[j] - z
                    if gamma > -30.0 and p in logp:
                        counts[p] += math.exp(gamma)
        return counts

    @classmethod
    def load(cls, path: str | Path) -> "UnigramTokenizer":
        """JSON (this module's save format) or SP-format TSV
        ``piece<TAB>logprob`` (spm_export_vocab)."""
        text = Path(path).read_text(encoding="utf-8")
        if text.lstrip().startswith("{"):
            obj = json.loads(text)
            return cls(obj["pieces"], obj["logprobs"])
        pieces, logprobs = [], []
        for line in text.splitlines():
            if not line.strip():
                continue
            piece, _, lp = line.partition("\t")
            pieces.append(piece)
            logprobs.append(float(lp) if lp else _UNK_PENALTY)
        return cls(pieces, logprobs)

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(
                {"type": "unigram", "pieces": self.vocab,
                 "logprobs": self.logprobs},
                fh, ensure_ascii=False,
            )

    def save_sp_vocab(self, path: str | Path) -> None:
        """spm_export_vocab-compatible TSV dump."""
        with open(path, "w", encoding="utf-8") as fh:
            for p, lp in zip(self.vocab, self.logprobs):
                fh.write(f"{p}\t{lp:.6f}\n")

    # -- codec ----------------------------------------------------------------
    @property
    def blank_id(self) -> int:
        return 0

    @property
    def unk_id(self) -> int:
        return 1

    def __len__(self) -> int:
        return len(self.vocab)

    def encode(self, text: str) -> List[int]:
        """Viterbi best segmentation -> piece ids (unk for novel chars)."""
        s = "".join(text.split())
        n = len(s)
        best = [-math.inf] * (n + 1)
        back: List[Tuple[int, int]] = [(-1, -1)] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == -math.inf:
                continue
            hi = min(self.max_len, n - i)
            for l in range(1, hi + 1):
                pid = self.to_id.get(s[i : i + l])
                if pid is None or pid < 2:
                    if l == 1:
                        pid, lp = 1, _UNK_PENALTY
                    else:
                        continue
                else:
                    lp = self.logprobs[pid]
                cand = best[i] + lp
                if cand > best[i + l]:
                    best[i + l] = cand
                    back[i + l] = (i, pid)
        ids: List[int] = []
        j = n
        while j > 0:
            i, pid = back[j]
            ids.append(pid)
            j = i
        return ids[::-1]

    def decode(self, ids: Sequence[int]) -> str:
        out = "".join(
            self.vocab[i] for i in ids if 2 <= i < len(self.vocab)
        )
        return out.replace("▁", " ").strip()
