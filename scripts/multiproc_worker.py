"""Worker for the 2-process distributed correctness test (VERDICT r2 #3).

Each process owns 4 virtual CPU devices; together they form one 8-device
'data' mesh spanning two jax processes — the same topology as the
reference's 2-node DDP (`basicsr/utils/dist_util.py:10-57`). Exercises the
four branches that only execute multi-process:

  1. `parallel/dist.initialize` (jax.distributed handshake)
  2. `EnlargedSampler` rank sharding (`basicsr/data/data_sampler.py:6-48`)
  3. `device_prefetch`'s `make_array_from_process_local_data` assembly
  4. one train step with the cross-process gradient all-reduce, plus
     validation aggregation via `process_allgather`
     (`basicsr/models/base_model.py:103-117` ~ runner._aggregate_val_results)

Usage: multiproc_worker.py <coordinator> <num_procs> <pid>
Prints "MULTIPROC WORKER <pid> OK" on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(coordinator: str, num_procs: int, pid: int) -> None:
    import jax

    from wavemamba_tpu.parallel import dist

    # --- 1. multi-process init through the framework's own entry point.
    dist.initialize(coordinator_address=coordinator, num_processes=num_procs,
                    process_id=pid)
    print(f"[{pid}] dist initialized", flush=True)
    rank, world = dist.get_dist_info()
    assert (rank, world) == (pid, num_procs), (rank, world)
    assert jax.process_count() == num_procs
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == num_procs * n_local, (n_global, n_local)
    assert dist.is_master() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp

    # --- 2. sampler sharding: disjoint, covering, deterministic.
    from wavemamba_tpu.data import EnlargedSampler

    n_img, ratio = 10, 2
    shards = []
    for r in range(num_procs):
        s = EnlargedSampler(n_img, num_procs, r, ratio)
        s.set_epoch(3)
        shards.append(list(iter(s)))
    mine = EnlargedSampler(n_img, num_procs, pid, ratio)
    mine.set_epoch(3)
    assert list(iter(mine)) == shards[pid], "sampler not deterministic by rank"
    flat = [i for sh in shards for i in sh]
    assert len(flat) == n_img * ratio, (len(flat), n_img * ratio)
    assert set(flat) <= set(range(n_img))

    print(f"[{pid}] sampler ok", flush=True)
    # --- 3. device_prefetch with a sharding: the multi-process branch
    # assembles the global batch from process-local data.
    from wavemamba_tpu.data.loader import device_prefetch
    from wavemamba_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()  # all 8 global devices
    assert mesh.devices.size == n_global
    sharding = batch_sharding(mesh)

    local_b = n_local  # one image per local device
    rs = np.random.RandomState(100 + pid)
    batches = [
        {"lq": rs.rand(local_b, 16, 16, 3).astype(np.float32),
         "gt": rs.rand(local_b, 16, 16, 3).astype(np.float32)}
        for _ in range(2)
    ]
    got = list(device_prefetch(iter(batches), sharding))
    assert len(got) == 2
    gb = got[0]["lq"]
    assert gb.shape[0] == local_b * num_procs, gb.shape  # GLOBAL batch
    assert gb.sharding.is_fully_addressable is False or num_procs == 1
    # Each process's rows must round-trip exactly.
    local_rows = [s.data for s in gb.addressable_shards]
    ref = batches[0]["lq"]
    stacked = np.concatenate([np.asarray(x) for x in local_rows], axis=0)
    np.testing.assert_array_equal(np.sort(stacked, axis=None),
                                  np.sort(ref, axis=None))

    print(f"[{pid}] prefetch assembly ok", flush=True)
    # --- 4. one REAL train step over the cross-process mesh (grad psum
    # crosses the process boundary), tiny shapes.
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba
    from wavemamba_tpu.parallel.mesh import replicate
    from wavemamba_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    # Smallest config that still exercises every block type: two jax
    # processes compile simultaneously on this sandbox's single host core,
    # so compile time dominates the test budget.
    cfg = WaveMambaConfig(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                          scan_chunk=16)
    tcfg = TrainConfig(
        scheduler={"type": "CosineAnnealingRestartCyclicLR",
                   "periods": [10, 100], "restart_weights": [1.0, 1.0],
                   "eta_mins": [5e-4, 1e-7]},
        ema_decay=0.999,
    )
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, create_train_state(params, tcfg))
    step = make_train_step(cfg, tcfg, mesh)

    data = {"lq": np.random.RandomState(7).rand(local_b, 16, 16, 3).astype(np.float32),
            "gt": np.random.RandomState(8).rand(local_b, 16, 16, 3).astype(np.float32)}
    batch = next(iter(device_prefetch(iter([data]), sharding)))
    print(f"[{pid}] compiling train step...", flush=True)
    state, metrics = step(state, batch["lq"], batch["gt"])
    loss = float(metrics["total"])
    assert np.isfinite(loss), metrics

    # The loss is a global (post-psum) scalar: identical on every process.
    from jax.experimental import multihost_utils

    losses = np.asarray(multihost_utils.process_allgather(np.array([loss])))
    assert losses.shape[0] == num_procs
    np.testing.assert_allclose(losses.ravel(), np.full(num_procs, loss),
                               rtol=1e-6)

    # --- validation aggregation across processes (process_allgather path).
    from wavemamba_tpu.runner import RestorationModel

    local_vals = {"psnr": [10.0 + pid, 20.0 + pid]}  # proc0: 10,20; proc1: 11,21
    avg = RestorationModel._aggregate_val_results(local_vals, num_shards=num_procs)
    expect = np.mean([10.0 + r for r in range(num_procs)]
                     + [20.0 + r for r in range(num_procs)])
    np.testing.assert_allclose(avg["psnr"], expect, rtol=1e-12)

    # --- 5. cache_on_device fallback branch: the device-resident loader
    # must REFUSE multi-process (pipelines/train.py then falls back to the
    # threaded host loader — the branch the r3 verdict asked to execute).
    from wavemamba_tpu.data.device_cache import DeviceCachedLoader

    class _TrainDS:
        opt = {"phase": "train", "gt_size": 16, "scale": 1}

        def __len__(self):
            return 4

    try:
        DeviceCachedLoader(_TrainDS(), batch_size=n_global, mesh=mesh)
    except ValueError as e:
        assert "single-process" in str(e), e
        print(f"[{pid}] device_cache multi-process fallback ok", flush=True)
    else:
        raise AssertionError("DeviceCachedLoader accepted a multi-process run")

    # --- 6. 10-step training trajectory (VERDICT r3 #7): the parent test
    # re-runs the SAME batches single-process on its own 8-device mesh and
    # asserts loss parity step by step. Batch row order must match
    # device_prefetch's assembly: process p owns rows [p*local_b, ...).
    import time

    params2 = init_wavemamba(jax.random.PRNGKey(0), cfg)
    state2 = replicate(mesh, create_train_state(params2, tcfg))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params2))
    rs42 = np.random.RandomState(42)
    losses10, step_ts, host_ts = [], [], []
    for _ in range(10):
        t0 = time.perf_counter()
        lq_g = rs42.rand(n_global, 16, 16, 3).astype(np.float32)
        gt_g = rs42.rand(n_global, 16, 16, 3).astype(np.float32)
        local = {"lq": lq_g[pid * local_b:(pid + 1) * local_b],
                 "gt": gt_g[pid * local_b:(pid + 1) * local_b]}
        b = next(iter(device_prefetch(iter([local]), sharding)))
        t1 = time.perf_counter()
        state2, m2 = step(state2, b["lq"], b["gt"])
        losses10.append(float(m2["total"]))  # host sync fences the step
        step_ts.append(time.perf_counter() - t1)
        host_ts.append(t1 - t0)
    assert all(np.isfinite(losses10)), losses10
    # Overhead-structure datapoints for BENCH_NOTES (grad psum moves the
    # full f32 grad tree across the process boundary every step).
    print(f"[{pid}] TRAIN10 psum_mb={n_params * 4 / 2**20:.2f} "
          f"host_ms={np.median(host_ts) * 1e3:.1f} "
          f"step_ms={np.median(step_ts) * 1e3:.1f}", flush=True)
    print(f"[{pid}] LOSSES10 " + " ".join(f"{l:.6f}" for l in losses10),
          flush=True)

    print(f"MULTIPROC WORKER {pid} OK loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
