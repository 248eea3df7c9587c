"""Multi-dialect knowledge-transfer schedules (SURVEY.md 3.4; BASELINE
configs[3]).

The paper's training strategy (README.md:1): start from a pretrained
multilingual backbone, adapt on neighboring-dialect corpora (larger data),
then fine-tune the adapters on low-resource Jiao-Liao with the backbone
frozen throughout adapter stages. Each stage is one engine run with its own
manifests and trainable mask; `sequential` runs stages in order carrying
params forward, `joint` mixes corpora by weight inside one stage.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax

from ..utils.config import DialectStage, ExperimentConfig
from ..data.manifest import Manifest, read_manifest
from ..data.pipeline import BatchIterator, mix_manifests
from ..data.tokenizer import CharTokenizer


def build_stage_manifest(stage: DialectStage) -> Manifest:
    manifests = {p: read_manifest(p) for p in stage.manifests}
    if len(manifests) == 1:
        return next(iter(manifests.values()))
    weights = None
    if stage.mix_weights is not None:
        weights = {p: w for p, w in zip(stage.manifests, stage.mix_weights)}
    return mix_manifests(manifests, weights)


def run_stages(config: ExperimentConfig, params=None, tokenizer=None, resume: bool = False):
    """Run config.stages sequentially, carrying params across stages.

    Each stage runs through the SAME production loop as run_experiment
    (engine.train_loop): mesh-sharded state, prefetch, per-stage checkpoints
    under <checkpoint_dir>/stage_<i>_<name>, metrics logging, and SIGTERM
    checkpoint-and-exit. With resume=True, completed stages fast-forward
    from their final checkpoints and the in-progress stage resumes exactly
    (data-iterator state included), so a preemption mid-transfer loses
    nothing (SURVEY 3.4 / §5.3-4).

    Returns (final_params, tokenizer, per-stage metric dicts). The tokenizer
    is built over the union of all stage texts so the CTC vocab is stable
    across the whole transfer schedule.
    """
    from pathlib import Path

    from ..models.bundle import ModelBundle
    from ..parallel.mesh import build_mesh_for_batch
    from ..utils.logging import MetricsLogger
    from .engine import train_loop

    assert config.stages, "run_stages needs config.stages"
    stage_manifests = [build_stage_manifest(s) for s in config.stages]
    if tokenizer is None:
        texts = [t for m in stage_manifests for t in m.texts()]
        tokenizer = CharTokenizer.build(texts)
    if config.model_family == "ctc":
        config.ctc_model.vocab_size = len(tokenizer)
    elif config.model_family == "joint":
        config.joint.vocab_size = len(tokenizer)
    if params is None:
        params = ModelBundle._init_params(config, seed=config.train.seed)

    mesh = build_mesh_for_batch(config.mesh, config.data.batch_size)
    base_dir = Path(config.train.checkpoint_dir)
    from ..parallel import multihost as mh

    # stage-level metrics are primary-process-only under multi-host SPMD
    # (train_loop itself also nulls non-primary loggers)
    logger = (
        MetricsLogger(config.train.metrics_path, use_wandb=config.train.use_wandb)
        if mh.is_primary()
        else None
    )
    history = []
    for si, (stage, manifest) in enumerate(zip(config.stages, stage_manifests)):
        stage_cfg = dataclasses.replace(
            config,
            train=dataclasses.replace(
                config.train, train_adapters_only=stage.train_adapters_only
            ),
        )
        stage_cfg.train.optimizer = dataclasses.replace(
            config.train.optimizer, total_steps=stage.steps
        )
        stage_dir = str(base_dir / f"stage_{si}_{stage.name or 'stage'}")
        state, info = train_loop(
            stage_cfg, manifest, tokenizer, params,
            mesh=mesh, resume=resume, checkpoint_dir=stage_dir, logger=logger,
        )
        params = state.params
        history.append({"stage": stage.name, **info["last_metrics"]})
        if logger is not None:
            logger.log(stage.steps, stage=stage.name, stage_index=si, **info["last_metrics"])
            if info["terminated"]:
                logger.log(stage.steps, event="sigterm_stage_exit", stage=stage.name)
        if info["terminated"]:
            break
    if logger is not None:
        logger.close()
    return params, tokenizer, history
