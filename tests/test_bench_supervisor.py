"""The driver-artifact guarantee: bench.py must emit one JSON line even when
the TPU backend hangs or dies (round 2 lost its headline artifact to an
uncaught FailedPrecondition; the observed failure mode was a hang that no
in-process handler can catch — VERDICT.md Weak #1/#2)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

# every test here spawns supervised subprocess trees with deliberate
# deadlines — ~2 min of wall time by design (VERDICT r3 weak #7)
pytestmark = pytest.mark.slow


def _run_supervisor(extra_args, env_overrides, timeout=120):
    env = dict(os.environ)
    # the pytest conftest exports JAX_PLATFORMS=cpu for the fake mesh;
    # leaking it into the supervisor's children would disarm the
    # BENCH_FORCE_FAIL hook (it treats JAX_PLATFORMS=cpu as the fallback
    # attempt) and change which platform the default attempts run on
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, BENCH] + extra_args,
        capture_output=True, text=True, env=env, timeout=timeout,
    )


def _last_json_line(stdout: str):
    lines = [ln for ln in stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, f"no JSON line in stdout: {stdout!r}"
    return json.loads(lines[-1])


def test_forced_hang_still_emits_artifact():
    """All three attempts hang -> supervisor kills each at its deadline and
    still prints a parseable JSON artifact with the failure reasons."""
    proc = _run_supervisor(
        ["--selftest-hang"],
        {"BENCH_DEADLINE_S": "2", "BENCH_CPU_DEADLINE_S": "2"},
    )
    assert proc.returncode == 1
    rec = _last_json_line(proc.stdout)
    assert rec["value"] is None
    assert rec["failed"] is True
    assert len(rec["failures"]) == 4
    assert all("hang" in f["reason"] for f in rec["failures"])
    # the hung children were killed (no orphans holding the pipe open is
    # implied by communicate() returning; rc asserts the supervisor path)


def test_worker_crash_falls_back_and_labels_platform():
    """Default-platform attempts die at startup (worker-honored
    BENCH_FORCE_FAIL hook — injected at a layer no sitecustomize / healthy
    TPU plugin can undo, unlike the round-3 JAX_PLATFORMS poisoning) -> the
    CPU fallback disarms the hook and produces a real measurement labeled
    platform=cpu with the TPU failure reasons attached."""
    proc = _run_supervisor(
        [],
        {
            "BENCH_FORCE_FAIL": "exit",
            "BENCH_DEADLINE_S": "20",
            "BENCH_CPU_DEADLINE_S": "720",
            # lightest real measurement: the CPU fallback runs the fused
            # solver in Pallas interpreter mode, which is slow under the
            # full suite's CPU contention
            "BENCH_REPS": "1",
            "BENCH_ROUNDS": "1",
        },
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["platform"] == "cpu"
    assert len(rec["tpu_failures"]) == 3
    assert all("rc=7" in f["reason"] for f in rec["tpu_failures"])
    assert rec["metric"].startswith("BA iterations/s")


def test_worker_hang_falls_back_and_labels_platform():
    """Default-platform attempts HANG (BENCH_FORCE_FAIL=hang) -> each is
    killed at its deadline, then the CPU fallback (hook disarmed) still
    lands the real measurement."""
    proc = _run_supervisor(
        [],
        {
            "BENCH_FORCE_FAIL": "hang",
            "BENCH_DEADLINE_S": "2",
            "BENCH_CPU_DEADLINE_S": "720",
            "BENCH_REPS": "1",
            "BENCH_ROUNDS": "1",
        },
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["platform"] == "cpu"
    assert len(rec["tpu_failures"]) == 3
    assert all("hang" in f["reason"] for f in rec["tpu_failures"])
