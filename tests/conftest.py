"""Test harness config: force JAX onto CPU with 8 virtual devices BEFORE jax
imports, so pjit/shard_map multi-chip paths are exercised without TPU
hardware (SURVEY.md §4.3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's site customization pins JAX_PLATFORMS to the TPU plugin
# before test code runs; config.update is the override that sticks.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_wav(rng):
    """1.3 s of deterministic band-limited noise + tone at 16 kHz."""
    t = np.arange(int(16000 * 1.3)) / 16000.0
    wav = 0.3 * np.sin(2 * np.pi * 440.0 * t) + 0.05 * rng.randn(len(t))
    return wav.astype(np.float32)
