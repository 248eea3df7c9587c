"""Test harness config: force JAX onto CPU with 8 virtual devices BEFORE jax
imports, so pjit/shard_map multi-chip paths are exercised without TPU
hardware (SURVEY.md §4.3).

On-chip tier: `JL_TPU_TESTS=1 pytest tests/ -m tpu -q` keeps the real TPU
backend and runs only @pytest.mark.tpu tests — real-lowering parity checks
for every fused Pallas kernel (tests/test_tpu_tier.py), so a Mosaic/XLA
regression turns a test red instead of surfacing as a bench-day surprise.
Default (CPU) runs auto-skip tpu-marked tests."""

import os

TPU_TIER = os.environ.get("JL_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TIER:
    # The environment's site customization pins JAX_PLATFORMS to the TPU
    # plugin before test code runs; config.update is the override that
    # sticks.
    jax.config.update("jax_platforms", "cpu")
    cache_dir = "/tmp/jl_xla_cache_cpu"
else:
    cache_dir = "/tmp/jl_xla_cache"  # share the bench's TPU compile cache

# Persistent XLA compile cache: the suite is compile-bound (21 min cold
# on this 1-core host, dominated by hundreds of small jit compiles), and
# the cache makes warm reruns skip nearly all of it. Safe across tests —
# the cache key hashes the computation + platform + device layout.
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default runs skip @pytest.mark.heavy (the multi-minute XLA:CPU mesh
    compiles and subprocess multihost runs) so the edit-test loop stays
    fast. They are NOT optional: run `JL_HEAVY=1 pytest tests/ -q` (or
    `-m heavy`) before committing parallel/train changes.

    @pytest.mark.tpu tests need the real chip: skipped unless JL_TPU_TESTS=1
    (and, symmetrically, everything else assumes CPU-8 — run the tpu tier
    with `-m tpu` so CPU-pinned tests don't run against the chip)."""
    if not TPU_TIER:
        skip_tpu = pytest.mark.skip(
            reason="on-chip tier: JL_TPU_TESTS=1 pytest tests/ -m tpu"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip_tpu)
    if os.environ.get("JL_HEAVY"):
        return
    if config.getoption("-m") and "heavy" in config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="heavy (compile-minutes): set JL_HEAVY=1 or -m heavy to run"
    )
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    """Build the C++ host libs BEFORE collection so test_flac/test_bpe/...
    run against real native code on a fresh checkout (their module-level
    skipifs see the built libs; no silent skips). Fails LOUDLY if the
    toolchain is present but the build breaks; only a missing compiler
    leaves the libs absent (and those tests skipped)."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cxx = os.environ.get("CXX", "g++")
    if shutil.which(cxx) is None:
        return  # no toolchain: native tests fall back to their own skips
    # serialize across pytest-xdist workers: every worker runs this hook,
    # and concurrent `make` invocations race on the .so outputs
    import fcntl

    native_dir = os.path.join(root, "native")
    with open(os.path.join(native_dir, ".build.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        r = subprocess.run(
            ["make", "-C", native_dir], capture_output=True, text=True
        )
    if r.returncode != 0:
        raise pytest.UsageError(
            f"native build failed (rc={r.returncode}):\n{r.stdout}\n{r.stderr}"
        )


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_wav(rng):
    """1.3 s of deterministic band-limited noise + tone at 16 kHz."""
    t = np.arange(int(16000 * 1.3)) / 16000.0
    wav = 0.3 * np.sin(2 * np.pi * 440.0 * t) + 0.05 * rng.randn(len(t))
    return wav.astype(np.float32)
