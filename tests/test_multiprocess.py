"""2-process jax.distributed correctness test (VERDICT r2 #3).

Spawns two fresh interpreters, each with 4 virtual CPU devices, that form
one 8-device mesh via `jax.distributed.initialize` and execute the four
branches that are unreachable single-process: dist init, sampler rank
sharding, `make_array_from_process_local_data` batch assembly, a train
step whose gradient all-reduce crosses the process boundary, and
`process_allgather` validation aggregation. See
`scripts/multiproc_worker.py` for the checks; reference topology:
`basicsr/utils/dist_util.py:10-57` + `data_sampler.py:6-48`.
"""

import pytest

pytestmark = pytest.mark.slow  # full tier: pytest -m ""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    num_procs, local_devices = 2, 4
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = REPO  # drop any sitecustomize that pre-imports jax
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(num_procs), str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(num_procs)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    for pid, out in enumerate(outs):
        assert f"MULTIPROC WORKER {pid} OK" in out, out[-2000:]
    # The post-psum loss must be identical across processes.
    losses = sorted(
        line.split("loss=")[1].strip()
        for out in outs for line in out.splitlines() if "loss=" in line
    )
    assert len(set(losses)) == 1, losses

    # Both processes took the device_cache fallback branch.
    for out in outs:
        assert "device_cache multi-process fallback ok" in out

    # --- 10-step loss-trajectory parity vs single-process (VERDICT r3 #7).
    traj = {}
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if "LOSSES10" in ln]
        assert line, out[-2000:]
        traj[pid] = [float(v) for v in line[0].split("LOSSES10")[1].split()]
    assert traj[0] == traj[1], (traj[0], traj[1])

    ref = _single_process_trajectory(steps=10)
    # Same math, different grad-reduction summation order across the
    # process boundary -> fp drift only.
    import numpy as np

    np.testing.assert_allclose(traj[0], ref, rtol=2e-4, atol=1e-6)


def _single_process_trajectory(steps):
    """The worker's phase-6 batches replayed on the parent's own 8-device
    (single-process) mesh — mirrors scripts/multiproc_worker.py."""
    import jax
    import numpy as np

    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba
    from wavemamba_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from wavemamba_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    cfg = WaveMambaConfig(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                          scan_chunk=16)
    tcfg = TrainConfig(
        scheduler={"type": "CosineAnnealingRestartCyclicLR",
                   "periods": [10, 100], "restart_weights": [1.0, 1.0],
                   "eta_mins": [5e-4, 1e-7]},
        ema_decay=0.999,
    )
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharding = batch_sharding(mesh)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, create_train_state(params, tcfg))
    step = make_train_step(cfg, tcfg, mesh)
    rs42 = np.random.RandomState(42)
    losses = []
    for _ in range(steps):
        lq = jax.device_put(rs42.rand(8, 16, 16, 3).astype(np.float32), sharding)
        gt = jax.device_put(rs42.rand(8, 16, 16, 3).astype(np.float32), sharding)
        state, m = step(state, lq, gt)
        losses.append(float(m["total"]))
    return losses
