"""Device mesh + sharding rules (SURVEY.md §5.8).

Axes:
  data  — batch sharding (the reference's DDP equivalent; gradient psum
          falls out of pjit instead of an NCCL all-reduce)
  fsdp  — parameter/optimizer sharding for large backbones (ZeRO-3-style;
          absent in the reference, TPU-native addition per SURVEY §2.3)
  model — tensor parallelism for whisper-large matmuls (optional)

Collectives ride ICI within a slice; the mesh builder orders axes so `data`
maps to the slowest-varying (DCN-adjacent) dimension when multi-slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.config import MeshConfig


def build_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'fsdp', 'model') mesh over the available devices.

    data_axis=-1 means "all devices not claimed by fsdp/model".
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fsdp = max(cfg.fsdp_axis, 1)
    model = max(cfg.model_axis, 1)
    if n % (fsdp * model) != 0:
        raise ValueError(f"{n} devices not divisible by fsdp*model={fsdp * model}")
    data = cfg.data_axis if cfg.data_axis > 0 else n // (fsdp * model)
    if data * fsdp * model != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{model} != {n} devices; fix MeshConfig"
        )
    arr = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(arr, cfg.axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data' (and 'fsdp' for the input
    pipeline, since fsdp groups also consume distinct batch shards)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def param_sharding(mesh: Mesh, params: Any) -> Any:
    """FSDP-style parameter sharding rules.

    Policy: shard the largest axis of every >=2D param over 'fsdp' when its
    size is divisible by the axis length (XLA re-gathers per-layer); smaller
    params replicate. 'model' axis sharding (TP) is layered on in
    parallel/tp_rules.py for the whisper-large decoder.
    """
    fsdp_n = mesh.shape["fsdp"]

    def rule(p):
        if p.ndim < 2 or fsdp_n == 1:
            return NamedSharding(mesh, P())
        shape = p.shape
        axis = int(np.argmax(shape))
        if shape[axis] % fsdp_n == 0:
            spec = [None] * p.ndim
            spec[axis] = "fsdp"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with leading-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
