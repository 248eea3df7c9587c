"""Character tokenizer for the Mandarin CTC path.

The reference's CTC recipe class uses a char (or sentencepiece) vocab
(SURVEY.md C6; sentencepiece pinned at /root/reference/requirements.txt:64).
Mandarin CTC at character level needs no subword model, so the native
tokenizer here is a char vocab built from the training corpus; id 0 is the
CTC blank. (The C++ runtime accelerates the BPE path — native/bpe.cpp; char
encode/decode is dict lookups and stays pure Python.)

Whisper's multilingual BPE is handled separately by
models/whisper_import.py via the HF tokenizer files.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, List, Sequence

BLANK = "<blank>"
UNK = "<unk>"


class CharTokenizer:
    """id 0 = CTC blank, id 1 = unk, then sorted corpus characters."""

    def __init__(self, vocab: Sequence[str]):
        if list(vocab[:2]) != [BLANK, UNK]:
            vocab = [BLANK, UNK] + [v for v in vocab if v not in (BLANK, UNK)]
        self.vocab: List[str] = list(vocab)
        self.to_id: Dict[str, int] = {c: i for i, c in enumerate(self.vocab)}

    # -- construction ------------------------------------------------------
    @classmethod
    def build(cls, texts: Iterable[str]) -> "CharTokenizer":
        chars = sorted({c for t in texts for c in t if not c.isspace()})
        return cls([BLANK, UNK] + chars)

    @classmethod
    def load(cls, path: str | Path) -> "CharTokenizer":
        with open(path, encoding="utf-8") as fh:
            return cls(json.load(fh)["vocab"])

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump({"vocab": self.vocab}, fh, ensure_ascii=False)

    # -- codec -------------------------------------------------------------
    @property
    def blank_id(self) -> int:
        return 0

    @property
    def unk_id(self) -> int:
        return 1

    def __len__(self) -> int:
        return len(self.vocab)

    def encode(self, text: str) -> List[int]:
        return [self.to_id.get(c, 1) for c in text if not c.isspace()]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(
            self.vocab[i] for i in ids if 0 <= i < len(self.vocab) and i > 1
        )
