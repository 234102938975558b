"""CI guard for the driver contract (`__graft_entry__.py`) — VERDICT r4 #1/#8.

The r4 failure mode was "works in the builder's hands, times out in the
driver's": the dryrun grew past the driver's budget and the parent's
`jax.devices()` probe initialized the axon tunnel backend. These tests pin
both properties:

  * fast tier: the parent's re-exec decision is made from os.environ ONLY
    (no jax backend init, subprocess mocked), and `entry()` returns a
    jittable (fn, args) pair whose abstract evaluation preserves shape.
  * slow tier: the full 8-device child finishes under 200 s wall-clock on
    this 1-core host (warm via the repo-committed .jax_dryrun_cache).
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as ge  # noqa: E402


def test_env_decision_is_env_only(monkeypatch):
    """With a non-cpu env the parent must choose re-exec WITHOUT touching
    jax (the axon backend probe cost ~100 s and hung when the relay was
    down — VERDICT r4 weak #1)."""
    calls = {}

    def fake_run(cmd, **kw):
        calls["cmd"] = cmd
        calls["env"] = kw.get("env", {})
        calls["timeout"] = kw.get("timeout")

        class P:
            returncode = 0

        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("XLA_FLAGS", "")
    ge.dryrun_multichip(8)
    assert calls, "expected a re-exec subprocess on a non-cpu env"
    assert calls["cmd"][-1] == "8"
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert "xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
    # The child PYTHONPATH must drop any sitecustomize dirs (repo only).
    assert calls["env"]["PYTHONPATH"] == REPO
    # Budget: the child must be killed well inside any driver timeout.
    assert calls["timeout"] is not None and calls["timeout"] <= 300


@pytest.mark.parametrize(
    "platforms,flags,n,expect",
    [
        ("cpu", "--xla_force_host_platform_device_count=8", 8, True),
        ("cpu", "--xla_force_host_platform_device_count=8", 2, True),
        ("cpu", "--xla_force_host_platform_device_count=4", 8, False),
        ("cpu", "", 8, False),
        ("axon", "--xla_force_host_platform_device_count=8", 8, False),
        ("", "--xla_force_host_platform_device_count=8", 8, False),
    ],
)
def test_env_has_cpu_mesh_matrix(monkeypatch, platforms, flags, n, expect):
    monkeypatch.setenv("JAX_PLATFORMS", platforms)
    monkeypatch.setenv("XLA_FLAGS", flags)
    assert ge._env_has_cpu_mesh(n) is expect


def test_entry_returns_jittable_pair():
    """entry() must give (fn, args) that abstractly evaluates (no compile)
    to an output of the input image shape — the driver compile-checks this
    single-chip."""
    import jax

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == args[1].shape and out.dtype == args[1].dtype


@pytest.mark.slow
def test_full_dryrun_child_under_budget():
    """The exact child the driver's parent spawns must finish < 200 s here
    (warm compile cache; cold measured 146 s on this host, 2026-08-20)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ge._DRYRUN_XLA_FLAGS.format(n=8)
    env["PYTHONPATH"] = REPO
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=240,
    )
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in proc.stdout
    assert wall < 200, f"dryrun child took {wall:.0f}s (budget 200s)"
