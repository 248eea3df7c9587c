"""Checkpointing: orbax for full train state, safetensors import/export.

Reference mechanisms (SURVEY.md §5.4): safetensors weights + HF hub layout,
accelerate/SB checkpointer for optimizer/scheduler/RNG. Here: orbax
checkpoints hold {params, opt_state, PRNG key, step, data-iterator state} so
a restarted job resumes exactly; a small adapter-only artifact mirrors the
reference's tiny per-dialect adapter checkpoints; and a pure-numpy
safetensors reader/writer (utils side) imports reference Whisper weights
(SURVEY N11).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(path: str) -> Path:
    p = Path(path).resolve()
    p.mkdir(parents=True, exist_ok=True)
    return p


def save_params(path: str, params: Any) -> None:
    """Save a param pytree with orbax StandardCheckpointer."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_ckpt_dir(path) / "params", params, force=True)
    ckpt.wait_until_finished()


def restore_params(path: str, template: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(Path(path).resolve() / "params", template)


class TrainCheckpointer:
    """Step-indexed train-state checkpoints with retention + exact resume.

    Layout: <dir>/<step>/state (orbax) and <dir>/<step>/extra.json
    (data-iterator state + metadata, host-side).
    """

    def __init__(self, directory: str, keep: int = 3):
        self.dir = _ckpt_dir(directory)
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any, extra: Optional[Dict] = None) -> None:
        """Save one step. Multi-host: the orbax array save is itself a
        collective (every process writes its addressable shards, the primary
        writes metadata); host-side extras and retention gc are primary-only,
        fenced by barriers so no host reads/writes a dir mid-delete."""
        from ..parallel import multihost as mh

        d = self.dir / f"{step:08d}"
        self._ckpt.save(d / "state", state, force=True)
        self._ckpt.wait_until_finished()
        mh.barrier("ckpt_save")
        if mh.is_primary():
            (d / "extra.json").write_text(json.dumps(extra or {}))
            self._gc()
        mh.barrier("ckpt_gc")

    def latest_step(self) -> Optional[int]:
        steps = sorted(
            int(p.name) for p in self.dir.iterdir() if p.is_dir() and p.name.isdigit()
        )
        return steps[-1] if steps else None

    def restore(self, template: Any, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None, None
        d = self.dir / f"{step:08d}"
        state = self._ckpt.restore(d / "state", template)
        extra = json.loads((d / "extra.json").read_text()) if (d / "extra.json").exists() else {}
        return step, state, extra

    def _gc(self) -> None:
        steps = sorted(
            int(p.name) for p in self.dir.iterdir() if p.is_dir() and p.name.isdigit()
        )
        for s in steps[: -self.keep]:
            import shutil

            shutil.rmtree(self.dir / f"{s:08d}", ignore_errors=True)


def save_adapter_only(path: str, params: Any) -> None:
    """Write the tiny adapter-only artifact (flattened npz): the reference's
    per-dialect adapter checkpoint equivalent (SURVEY §5.4)."""
    from ..models.adapters import param_is_adapter

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kpath, leaf in flat:
        keys = tuple(getattr(k, "key", getattr(k, "idx", str(k))) for k in kpath)
        if param_is_adapter(keys):
            out["/".join(map(str, keys))] = np.asarray(leaf)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, **out)


def load_adapter_only(path: str, params: Any) -> Any:
    """Merge an adapter-only npz back into a full param tree."""
    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    updates = {}
    for kpath, leaf in flat:
        keys = "/".join(
            str(getattr(k, "key", getattr(k, "idx", str(k)))) for k in kpath
        )
        if keys in data:
            updates[keys] = data[keys]

    def _replace(kpath, leaf):
        keys = "/".join(
            str(getattr(k, "key", getattr(k, "idx", str(k)))) for k in kpath
        )
        return updates.get(keys, leaf)

    return jax.tree_util.tree_map_with_path(_replace, params)
