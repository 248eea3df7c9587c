"""Tensor-parallel whisper training step on the virtual mesh: TP+DP
sharded step == single-device step, and kernels really shard over 'model'."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jiao_liao_speech_recognition_tpu.models.bundle import ModelBundle
from jiao_liao_speech_recognition_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    replicated,
)
from jiao_liao_speech_recognition_tpu.parallel.tp_rules import tp_param_sharding
from jiao_liao_speech_recognition_tpu.train.engine import (
    build_train_setup,
    init_state,
)
from jiao_liao_speech_recognition_tpu.utils.config import (
    ExperimentConfig,
    MeshConfig,
    OptimizerConfig,
    SpecAugmentConfig,
    WhisperConfig,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual CPU devices"
)

CFG = ExperimentConfig(
    model_family="whisper",
    whisper=WhisperConfig(
        vocab_size=64, d_model=64, encoder_layers=1, decoder_layers=1,
        num_heads=4, mlp_dim=128, max_target_positions=32, dtype="float32",
        use_flash_attention=False, max_source_positions=64,
    ),
    specaugment=SpecAugmentConfig(enabled=False),
)


def _batch(rng, B=8, samples=8000, V=64, S=5):
    from jiao_liao_speech_recognition_tpu.data.pipeline import Batch
    from jiao_liao_speech_recognition_tpu.train.engine import batch_to_device

    host = Batch(
        audio=rng.randn(B, samples).astype(np.float32) * 0.1,
        audio_lengths=np.full((B,), samples, np.int32),
        labels=rng.randint(3, V, (B, S)).astype(np.int32),
        label_lengths=np.full((B,), S, np.int32),
        texts=[""] * B,
        bucket_seconds=0.5,
    )
    return batch_to_device(host, family="whisper", whisper_prompt=(1, 2), eot_id=0)


def test_tp_sharding_rules():
    mesh = build_mesh(MeshConfig(model_axis=2), jax.devices())
    params = ModelBundle._init_params(CFG)
    sh = tp_param_sharding(mesh, params)
    flat = jax.tree_util.tree_leaves_with_path(sh)
    specs = {
        "/".join(str(getattr(k, "key", k)) for k in kp): s.spec for kp, s in flat
    }
    col = [k for k, s in specs.items() if tuple(s) == (None, "model")]
    row = [k for k, s in specs.items() if tuple(s) == ("model", None)]
    assert any("fc1" in k for k in col)
    assert any("q_proj" in k for k in col)
    assert any("fc2" in k for k in row)
    assert any("out_proj" in k for k in row)
    assert any("embedding" in k for k in row)


def test_tp_step_matches_single_device(rng):
    cfg = dataclasses.replace(CFG)
    cfg.train.optimizer = OptimizerConfig(
        learning_rate=1e-3, warmup_steps=0, total_steps=5, schedule="constant"
    )
    batch = _batch(rng)

    params = ModelBundle._init_params(cfg)
    _, _, tx, step = build_train_setup(cfg, params)
    st = init_state(cfg, tx, params)
    st1, m1 = step(st, batch)

    params2 = ModelBundle._init_params(cfg)
    mesh = build_mesh(MeshConfig(model_axis=2), jax.devices())  # data=4, model=2
    _, _, tx2, step2 = build_train_setup(cfg, params2, mesh)
    st2 = init_state(cfg, tx2, params2)
    psh = tp_param_sharding(mesh, st2.params)
    st2 = st2.replace(
        params=jax.tree_util.tree_map(jax.device_put, st2.params, psh),
        opt_state=jax.device_put(st2.opt_state, replicated(mesh)),
        step=jax.device_put(st2.step, replicated(mesh)),
        rng=jax.device_put(st2.rng, replicated(mesh)),
    )
    bsh = batch_sharding(mesh)
    st2, m2 = step2(st2, {k: jax.device_put(v, bsh) for k, v in batch.items()})

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2e-5
    d = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(), st1.params, st2.params
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4
