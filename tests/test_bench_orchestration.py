"""bench.py orchestration guarantees (r4 verdict item 1: the round scored
null because one OOMing section killed the single end-of-run JSON print).

These tests drive the REAL orchestrator — `python bench.py` as a
subprocess — against jax-free selftest sections (bench.py JL_BENCH_ONLY /
JL_BENCH_INDUCE_FAIL hooks), proving:

  1. a cumulative JSON line is printed after EVERY section, so the driver's
     last-parseable-line always reflects the furthest point reached;
  2. an artificially induced section OOM / timeout / crash nulls only that
     section's fields — completed sections' numbers survive;
  3. an induced OOM routes through the allocate-probe backoff loop;
  4. an exhausted global deadline skips sections (recorded in
     "sections_skipped") instead of blowing the driver's wall clock;
  5. `--section` dispatches only registered names (no arbitrary-global
     invocation).
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _run_bench(env_extra=None, args=(), timeout=120):
    env = dict(os.environ)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, BENCH, *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


def _json_lines(stdout: str):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_cumulative_emission_every_section():
    r = _run_bench({"JL_BENCH_ONLY": "bench_selftest_ok,bench_selftest_extra"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    # skeleton + one line per section + the final sections_wedged line
    assert len(lines) == 4
    # skeleton carries the full schema with nulls
    assert lines[0]["value"] is None
    assert lines[0]["metric"] == "rtfx"
    assert "adapter_finetune_steps_per_sec" in lines[0]
    assert "tpu_tier_ok" in lines[0]
    # first section's field appears in line 2, second only in line 3
    assert lines[1]["selftest_ok"] == 1.0
    assert "selftest_extra" not in lines[1]
    assert lines[2]["selftest_ok"] == 1.0
    assert lines[2]["selftest_extra"] == 2.0
    assert lines[3]["sections_wedged"] == []


def test_partial_json_survives_induced_crash():
    """The demonstrated partial-JSON line under an induced section failure
    (r4 verdict item 1 'Done =' clause)."""
    r = _run_bench({
        "JL_BENCH_ONLY": "bench_selftest_ok,bench_selftest_extra",
        "JL_BENCH_INDUCE_FAIL": "bench_selftest_extra:crash",
    })
    assert r.returncode == 0
    last = _json_lines(r.stdout)[-1]
    assert last["selftest_ok"] == 1.0  # completed section survived
    assert "selftest_extra" not in last  # failed section nulled, not fatal
    assert "induced crash" in r.stderr


def test_partial_json_survives_induced_timeout():
    r = _run_bench({
        "JL_BENCH_ONLY": "bench_selftest_extra,bench_selftest_ok",
        "JL_BENCH_INDUCE_FAIL": "bench_selftest_extra:timeout",
        # generous enough for child-python startup on a loaded 1-core host;
        # the induced hang sleeps ~forever so any value stays fast
        "JL_BENCH_TIMEOUT_OVERRIDE_S": "15",
    })
    assert r.returncode == 0
    last = _json_lines(r.stdout)[-1]
    assert "timed out" in r.stderr
    assert last["selftest_ok"] == 1.0  # later section still ran


def test_induced_oom_routes_through_probe_and_retries():
    r = _run_bench({
        "JL_BENCH_ONLY": "bench_selftest_extra,bench_selftest_ok",
        "JL_BENCH_INDUCE_FAIL": "bench_selftest_extra:oom",
        # tiny probe + near-zero backoff so the test stays fast; the probe
        # subprocess runs on this env's CPU backend
        "JL_BENCH_PROBE_MB": "1",
        "JL_BENCH_OOM_BACKOFF": "0.05,0.05",
    }, timeout=240)
    assert r.returncode == 0
    assert "device OOM — probing for HBM reclaim" in r.stderr
    # retried once (two child failures logged), then moved on
    assert r.stderr.count("RESOURCE_EXHAUSTED") >= 2
    last = _json_lines(r.stdout)[-1]
    assert last["selftest_ok"] == 1.0


def test_init_wedge_detected_and_retried_cheaply():
    """r5: a device child whose connect wedges at init (no INIT_OK marker)
    is killed after JL_BENCH_INIT_TIMEOUT_S — not the full section budget —
    and retried in a fresh process; the failure nulls only that section.
    The induced hang fires before _setup's device touch, so this test never
    dials a backend."""
    r = _run_bench({
        "JL_BENCH_ONLY": "bench_selftest_device,bench_selftest_ok",
        "JL_BENCH_INDUCE_FAIL": "bench_selftest_device:timeout",
        "JL_BENCH_INIT_TIMEOUT_S": "6",
        "JL_BENCH_WEDGE_RETRIES": "1",
        "JL_BENCH_ASSUME_ALIVE": "1",
        "JL_BENCH_WEDGE_PASSES": "0",
    }, timeout=180)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "relay wedged this connect" in r.stderr
    assert "fresh-process connect retry 1/1" in r.stderr
    last = _json_lines(r.stdout)[-1]
    assert "selftest_device" not in last  # wedged section nulled
    assert last["selftest_ok"] == 1.0  # later section unaffected
    assert last["sections_wedged"] == ["bench_selftest_device"]


def test_wedge_recovery_pass_retries_wedged_sections():
    """A wedge-nulled section is re-attempted breadth-first after the main
    pass while the deadline allows."""
    r = _run_bench({
        "JL_BENCH_ONLY": "bench_selftest_device,bench_selftest_ok",
        "JL_BENCH_INDUCE_FAIL": "bench_selftest_device:timeout",
        "JL_BENCH_INIT_TIMEOUT_S": "5",
        "JL_BENCH_WEDGE_RETRIES": "0",
        "JL_BENCH_WEDGE_PASSES": "2",
        "JL_BENCH_ASSUME_ALIVE": "1",
    }, timeout=180)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wedge-recovery pass 1/2" in r.stderr
    assert "wedge-recovery pass 2/2" in r.stderr
    last = _json_lines(r.stdout)[-1]
    assert last["sections_wedged"] == ["bench_selftest_device"]
    assert last["selftest_ok"] == 1.0


def test_deadline_skips_sections_and_still_emits():
    r = _run_bench(
        {"JL_BENCH_ONLY": "bench_selftest_ok,bench_selftest_extra"},
        args=("--deadline-s", "0"),
    )
    assert r.returncode == 0
    last = _json_lines(r.stdout)[-1]
    assert last["sections_skipped"] == [
        "bench_selftest_ok", "bench_selftest_extra"
    ]
    assert "selftest_ok" not in last


def test_oom_mention_mid_log_does_not_trigger_retry():
    """ADVICE r4: only a RESOURCE_EXHAUSTED in the stderr TAIL is treated
    as a device OOM — a warning mid-log must not buy a probe + re-run."""
    sys.path.insert(0, os.path.dirname(BENCH))
    try:
        import bench

        mid = (
            "W0 something RESOURCE_EXHAUSTED in a warning\n"
            + "\n".join(f"frame {i}" for i in range(30))
            + "\nValueError: unrelated\n"
        )
        assert not bench._stderr_tail_has_oom(mid)
        tail = "\n".join(f"frame {i}" for i in range(30)) + (
            "\njax.errors.JaxRuntimeError: RESOURCE_EXHAUSTED: "
            "TPU backend error (ResourceExhausted).\n"
        )
        assert bench._stderr_tail_has_oom(tail)
    finally:
        sys.path.pop(0)


def test_section_child_rejects_unknown_name():
    """ADVICE r4: `--section main` must not recurse into main() (or invoke
    any other arbitrary global)."""
    r = subprocess.run(
        [sys.executable, BENCH, "--section", "main"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2
    assert "unknown section" in r.stderr


def test_overfit_params_roundtrip_flatten_unflatten():
    """The disk overfit cache rebuilds the exact nested param tree."""
    sys.path.insert(0, os.path.dirname(BENCH))
    try:
        import numpy as np

        import bench

        tree = {"enc": {"layer_0": {"w": np.ones((2, 3)), "b": np.zeros(3)},
                        "ln": {"g": np.full(4, 2.0)}},
                "head": {"w": np.arange(6.0).reshape(2, 3)}}
        flat = bench._flatten_params(tree)
        rebuilt = bench._unflatten_params(flat)
        assert set(rebuilt) == {"enc", "head"}
        np.testing.assert_array_equal(
            rebuilt["enc"]["layer_0"]["w"], tree["enc"]["layer_0"]["w"]
        )
        np.testing.assert_array_equal(rebuilt["head"]["w"], tree["head"]["w"])
        np.testing.assert_array_equal(
            rebuilt["enc"]["ln"]["g"], tree["enc"]["ln"]["g"]
        )
    finally:
        sys.path.pop(0)
