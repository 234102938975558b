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
