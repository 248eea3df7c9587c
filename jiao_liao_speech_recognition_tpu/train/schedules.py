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


def run_stages(config: ExperimentConfig, params=None, tokenizer=None):
    """Run config.stages sequentially, carrying params across stages.

    Returns (final_params, tokenizer, per-stage metric dicts). The tokenizer
    is built over the union of all stage texts so the CTC vocab is stable
    across the whole transfer schedule.
    """
    from ..models.bundle import ModelBundle
    from .engine import (
        TrainState,
        batch_to_device,
        build_train_setup,
        init_state,
    )

    assert config.stages, "run_stages needs config.stages"
    stage_manifests = [build_stage_manifest(s) for s in config.stages]
    if tokenizer is None:
        texts = [t for m in stage_manifests for t in m.texts()]
        tokenizer = CharTokenizer.build(texts)
    if config.model_family == "ctc":
        config.ctc_model.vocab_size = len(tokenizer)
    if params is None:
        params = ModelBundle._init_params(config, seed=config.train.seed)

    history = []
    for stage, manifest in zip(config.stages, stage_manifests):
        stage_cfg = dataclasses.replace(
            config,
            train=dataclasses.replace(
                config.train, train_adapters_only=stage.train_adapters_only
            ),
        )
        stage_cfg.train.optimizer = dataclasses.replace(
            config.train.optimizer, total_steps=stage.steps
        )
        model, loss_fn, tx, jitted_step = build_train_setup(stage_cfg, params)
        state = init_state(stage_cfg, tx, params, config.train.seed)
        it = BatchIterator(manifest, tokenizer, config.data)
        metrics = {}
        for _ in range(stage.steps):
            batch = batch_to_device(next(it), tokenizer, config.model_family)
            state, metrics = jitted_step(state, batch)
        params = state.params
        history.append(
            {"stage": stage.name, **{k: float(v) for k, v in metrics.items()}}
        )
    return params, tokenizer, history
