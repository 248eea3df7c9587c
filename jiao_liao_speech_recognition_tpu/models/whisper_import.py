"""Import reference Whisper weights from HF safetensors checkpoints.

The reference stores weights in safetensors / HF hub layout
(/root/reference/requirements.txt:61,23; SURVEY.md C18/N11). This module
contains (a) a from-scratch pure-numpy safetensors reader — the format is an
8-byte little-endian header length, a JSON tensor index {name: {dtype,
shape, data_offsets}}, then raw row-major buffers — and (b) the name/layout
mapping from transformers WhisperForConditionalGeneration state dicts onto
this framework's Flax tree (torch [out,in] linears transpose to [in,out]
kernels; conv [out,in,k] -> [k,in,out]).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Dict

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially below
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def read_safetensors(path: str | Path) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into {name: numpy array} without any
    third-party dependency. bfloat16 tensors are upcast to float32."""
    raw = Path(path).read_bytes()
    (hlen,) = struct.unpack("<Q", raw[:8])
    header = json.loads(raw[8 : 8 + hlen].decode("utf-8"))
    base = 8 + hlen
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        buf = raw[base + start : base + end]
        shape = meta["shape"]
        dt = meta["dtype"]
        if dt == "BF16":
            u16 = np.frombuffer(buf, dtype=np.uint16)
            u32 = u16.astype(np.uint32) << 16
            arr = u32.view(np.float32)
        else:
            arr = np.frombuffer(buf, dtype=_DTYPES[dt])
        out[name] = arr.reshape(shape).copy()
    return out


def write_safetensors(path: str | Path, tensors: Dict[str, np.ndarray]) -> None:
    """Minimal safetensors writer (export / test fixtures)."""
    header: Dict[str, Any] = {}
    bufs = []
    offset = 0
    dmap = {v: k for k, v in _DTYPES.items() if v is not None}
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        b = arr.tobytes()
        header[name] = {
            "dtype": dmap[arr.dtype.type],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(b)],
        }
        bufs.append(b)
        offset += len(b)
    hjson = json.dumps(header).encode("utf-8")
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(hjson)))
        fh.write(hjson)
        for b in bufs:
            fh.write(b)


# ---------------------------------------------------------------------------
# HF Whisper -> Flax tree mapping
# ---------------------------------------------------------------------------


def _linear(sd, prefix, has_bias=True):
    out = {"dense": {"kernel": sd[f"{prefix}.weight"].T}}
    if has_bias and f"{prefix}.bias" in sd:
        out["dense"]["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _attn(sd, prefix):
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj", has_bias=False),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _block(sd, prefix, cross: bool):
    blk = {
        "self_attn": _attn(sd, f"{prefix}.self_attn"),
        "self_attn_ln": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.fc1"),
            "fc2": _linear(sd, f"{prefix}.fc2"),
        },
        "mlp_ln": _ln(sd, f"{prefix}.final_layer_norm"),
    }
    if cross:
        blk["cross_attn"] = _attn(sd, f"{prefix}.encoder_attn")
        blk["cross_attn_ln"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
    return blk


def hf_state_dict_to_flax(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Map a transformers Whisper state dict onto the WhisperModel tree.

    Accepts both `model.encoder...` (WhisperForConditionalGeneration) and
    `encoder...` (WhisperModel) key styles.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model.") :]: v for k, v in sd.items() if k.startswith("model.")}

    enc: Dict[str, Any] = {
        "conv1": {
            "kernel": sd["encoder.conv1.weight"].transpose(2, 1, 0),
            "bias": sd["encoder.conv1.bias"],
        },
        "conv2": {
            "kernel": sd["encoder.conv2.weight"].transpose(2, 1, 0),
            "bias": sd["encoder.conv2.bias"],
        },
        "ln_post": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        enc[f"block_{i}"] = _block(sd, f"encoder.layers.{i}", cross=False)

    dec: Dict[str, Any] = {
        "embed_tokens": {"embedding": sd["decoder.embed_tokens.weight"]},
        "embed_positions": sd["decoder.embed_positions.weight"],
        "ln": _ln(sd, "decoder.layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        dec[f"block_{i}"] = _block(sd, f"decoder.layers.{i}", cross=True)

    return {"encoder": enc, "decoder": dec}


def load_hf_generation_constraints(path: str | Path) -> Dict[str, tuple]:
    """Read generation_config.json (HF layout) for the decode-time token
    constraints transformers' generate() applies by default: suppress_tokens
    (masked every step) and begin_suppress_tokens (first generated step).
    Returns {} entries when absent so callers can cfg-merge unconditionally.
    """
    p = Path(path)
    gc = p / "generation_config.json" if p.is_dir() else None
    out = {"suppress_ids": (), "begin_suppress_ids": ()}
    if gc is not None and gc.exists():
        data = json.loads(gc.read_text(encoding="utf-8"))
        out["suppress_ids"] = tuple(int(t) for t in data.get("suppress_tokens") or ())
        out["begin_suppress_ids"] = tuple(
            int(t) for t in data.get("begin_suppress_tokens") or ()
        )
    return out


def whisper_config_from_hf(path: str | Path):
    """Build a WhisperConfig from an HF checkpoint directory's config.json
    (+ generation_config.json decode constraints when present), so
    `import-whisper` needs no preset guessing: every shape field comes from
    the checkpoint itself."""
    from ..utils.config import WhisperConfig

    p = Path(path)
    data = json.loads((p / "config.json").read_text(encoding="utf-8"))
    heads = data.get("encoder_attention_heads", 6)
    if data.get("decoder_attention_heads", heads) != heads:
        raise ValueError("asymmetric encoder/decoder head counts unsupported")
    ffn = data.get("encoder_ffn_dim", 4 * data.get("d_model", 384))
    if data.get("decoder_ffn_dim", ffn) != ffn:
        raise ValueError("asymmetric encoder/decoder ffn dims unsupported")
    gc = load_hf_generation_constraints(p)
    return WhisperConfig(
        name=Path(data.get("_name_or_path", "") or "whisper_imported").name
        or "whisper_imported",
        vocab_size=data.get("vocab_size", 51865),
        num_mels=data.get("num_mel_bins", 80),
        d_model=data.get("d_model", 384),
        encoder_layers=data.get("encoder_layers", 4),
        decoder_layers=data.get("decoder_layers", 4),
        num_heads=heads,
        mlp_dim=ffn,
        max_source_positions=data.get("max_source_positions", 1500),
        max_target_positions=data.get("max_target_positions", 448),
        suppress_ids=gc["suppress_ids"],
        begin_suppress_ids=gc["begin_suppress_ids"],
    )


def import_hf_checkpoint(src: str | Path, out: str | Path) -> "Any":
    """HF Whisper checkpoint directory -> a ModelBundle checkpoint directory
    loadable by `load(checkpoint=out)` / `transcribe --checkpoint out`.

    Copies the HF BPE tokenizer files (vocab.json/merges.txt/
    added_tokens.json/tokenizer.json) alongside so the bundle loads the
    byte-level BPE tokenizer (data/bpe.py) instead of a char vocab.
    Returns the saved ModelBundle."""
    import shutil

    from ..utils.config import ExperimentConfig, FrontendConfig
    from .bundle import ModelBundle

    src = Path(src)
    wcfg = whisper_config_from_hf(src)
    config = ExperimentConfig(
        model_family="whisper",
        whisper=wcfg,
        frontend=FrontendConfig(num_mels=wcfg.num_mels),
    )
    params = load_hf_whisper(src, wcfg)
    tokenizer = None
    if (src / "vocab.json").exists() and (src / "merges.txt").exists():
        from ..data.bpe import ByteLevelBPE

        tokenizer = ByteLevelBPE.from_hf_dir(src)
    bundle = ModelBundle(config=config, params=params, tokenizer=tokenizer)
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    from ..train.checkpoints import save_params
    from ..utils.config import save_yaml

    save_yaml(config, str(out / "config.yaml"))
    save_params(str(out), params)
    for name in ("vocab.json", "merges.txt", "added_tokens.json", "tokenizer.json"):
        if (src / name).exists():
            shutil.copy(src / name, out / name)
    return bundle


def load_hf_whisper(path: str | Path, cfg) -> Dict:
    """Load an HF Whisper checkpoint directory or .safetensors file into a
    Flax param tree matching models.whisper.WhisperModel."""
    p = Path(path)
    if p.is_dir():
        files = sorted(p.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no .safetensors under {p}")
        sd: Dict[str, np.ndarray] = {}
        for f in files:
            sd.update(read_safetensors(f))
    else:
        sd = read_safetensors(p)
    import jax.numpy as jnp
    import jax

    tree = hf_state_dict_to_flax(sd, cfg)
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), tree)
