import os

import numpy as np
import pytest

from wavemamba_tpu.data.loader import EnlargedSampler, ThreadedLoader, _collate
from wavemamba_tpu.utils.options import (
    apply_force_yml,
    dict2str,
    parse_options,
    yaml_load,
)
from wavemamba_tpu.utils.registry import Registry


def test_registry():
    reg = Registry("test")

    @reg.register()
    def thing():
        return 1

    assert reg.get("thing") is thing
    assert "thing" in reg
    with pytest.raises(KeyError):
        reg.get("missing")
    with pytest.raises(KeyError):
        reg.register(thing)  # duplicate


def test_force_yml_overrides():
    opt = {"train": {"optim_g": {"lr": 5e-4}}, "name": "x"}
    apply_force_yml(opt, ["train:optim_g:lr=1e-5", "name=hello"])
    assert opt["train"]["optim_g"]["lr"] == 1e-5
    assert opt["name"] == "hello"
    apply_force_yml(opt, ["train:optim_g:lr=true"])
    assert opt["train"]["optim_g"]["lr"] is True


def test_parse_options_debug_and_paths(tmp_path):
    cfg = tmp_path / "o.yml"
    cfg.write_text(
        "name: exp1\nmanual_seed: 3\nscale: 1\n"
        "datasets:\n  train:\n    name: t\n    type: PairedImageDataset\n"
        "train:\n  total_iter: 100\nval:\n  val_freq: 10\n"
        "logger:\n  print_freq: 5\n  save_checkpoint_freq: 10\n"
    )
    opt, parsed = parse_options(str(tmp_path), is_train=True,
                                args=["-opt", str(cfg), "--debug"])
    assert opt["name"].startswith("debug_")
    assert opt["train"]["total_iter"] == 24  # debug clamp
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["scale"] == 1
    assert opt["path"]["models"].endswith("models")
    assert "debug_exp1" in opt["path"]["experiments_root"]
    assert dict2str(opt)  # formats without crashing


def test_enlarged_sampler_rank_partition():
    s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=2)
    s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=2)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 10  # ceil(10*2/2)
    assert all(0 <= i < 10 for i in i0 + i1)
    # different epoch -> different permutation
    s0.set_epoch(4)
    assert list(s0) != i0


class _SquareDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "path": f"p{i}"}


def test_threaded_loader_batches_and_error_propagation():
    loader = ThreadedLoader(_SquareDataset(), batch_size=4, num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["x"].shape == (4, 2, 2)
    assert isinstance(batches[0]["path"], list)

    class _Broken(_SquareDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(ThreadedLoader(_Broken(), batch_size=2, num_workers=2))


def test_torch_export_roundtrip():
    """params -> reference state dict -> params must be identity."""
    import jax

    from wavemamba_tpu.convert.torch_export import params_to_state_dict
    from wavemamba_tpu.convert.torch_import import convert_state_dict
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba

    cfg = WaveMambaConfig(wf=16, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1))
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    sd = params_to_state_dict(params)
    assert all(isinstance(k, str) for k in sd)
    back = convert_state_dict(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_file_client_memcached_gated():
    """memcached backend is registered (`file_client.py:22-55`) and fails
    with a clear ImportError when no client library is installed."""
    import pytest

    from wavemamba_tpu.utils.file_client import FileClient

    assert "memcached" in FileClient._backends
    try:
        import mc  # noqa: F401
        has_client = True
    except ImportError:
        try:
            import pymemcache  # noqa: F401
            has_client = True
        except ImportError:
            has_client = False
    if not has_client:
        with pytest.raises(ImportError, match="memcached backend requires"):
            FileClient("memcached")


def test_color_converters_match_reference():
    """All four MATLAB-parity color converters match the reference's
    `basicsr/utils/matlab_functions.py:181-304` bit-for-bit on uint8 and to
    1e-5 on float32 — including the y_only=True 2-D (HW) return shape that
    np.dot's axis consumption produces there."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_matlab", "/root/reference/basicsr/utils/matlab_functions.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from wavemamba_tpu.utils import color

    rs = np.random.RandomState(0)
    u8 = rs.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    f32 = rs.rand(17, 23, 3).astype(np.float32)
    # valid YCbCr inputs for the inverse direction
    y8 = ref.rgb2ycbcr(u8)
    yf = ref.rgb2ycbcr(f32)

    for img in (u8, f32):
        for name in ("rgb2ycbcr", "bgr2ycbcr"):
            a = getattr(color, name)(img)
            b = getattr(ref, name)(img)
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_allclose(a, b, atol=0 if img.dtype == np.uint8 else 2e-5)
            ay = getattr(color, name)(img, y_only=True)
            by = getattr(ref, name)(img, y_only=True)
            assert ay.shape == by.shape == img.shape[:2]
            np.testing.assert_allclose(ay, by, atol=0 if img.dtype == np.uint8 else 2e-5)
    for img in (y8, yf):
        for name in ("ycbcr2rgb", "ycbcr2bgr"):
            a = getattr(color, name)(img)
            b = getattr(ref, name)(img)
            assert a.shape == b.shape and a.dtype == b.dtype
            # uint8: rounding of values within 1e-3 of .5 may differ by 1 LSB
            if img.dtype == np.uint8:
                assert int(np.max(np.abs(a.astype(int) - b.astype(int)))) <= 1
            else:
                np.testing.assert_allclose(a, b, atol=2e-5)


def test_to_y_channel_restores_channel_axis():
    """to_y_channel returns HW1 float in [0, 255] (comput_psnr_ssim.py:375-385)
    even now that bgr2ycbcr(y_only=True) returns the reference's 2-D map."""
    from wavemamba_tpu.utils.color import to_y_channel

    img = np.random.RandomState(1).randint(0, 256, (9, 11, 3)).astype(np.float64)
    y = to_y_channel(img)
    assert y.shape == (9, 11, 1)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 255.0


def test_check_resume_points_at_saved_snapshot_names(capsys):
    """check_resume (misc.py:137-168 in the reference) rewrites every
    pretrain_network_* to the resume iteration's snapshot — named as
    save_network writes them (Orbax dir `net_g_<iter>`, no suffix) so the
    rewritten path loads with load_network."""
    from wavemamba_tpu.utils.misc import check_resume

    opt = {
        "path": {"models": "/exp/models", "resume_state": "/exp/states/3000",
                 "pretrain_network_g": "ckpt/old.pth"},
        "network_g": {"type": "WaveMamba"},
        "network_d": {"type": "WaveMamba"},
        "ignore_resume_networks": ["network_d"],
    }
    check_resume(opt, 3000)
    assert opt["path"]["pretrain_network_g"] == "/exp/models/net_g_3000"
    assert opt["path"].get("pretrain_network_d") is None  # ignored network
    assert "ignored during resuming" in capsys.readouterr().out

    # no resume_state -> untouched
    opt2 = {"path": {"models": "/m", "pretrain_network_g": "keep.pth"},
            "network_g": {}}
    check_resume(opt2, 500)
    assert opt2["path"]["pretrain_network_g"] == "keep.pth"


def test_profiler_trace_and_step_timer(tmp_path):
    """Observability layer (SURVEY §5): `trace` captures a real XLA trace
    on CPU (a *.trace.json.gz appears, consumable by scripts/trace_topops.py)
    and StepTimer fences + summarizes."""
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.utils import profiler

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    float(f(x))  # compile outside the trace
    with profiler.trace(str(tmp_path)):
        with profiler.annotate("matmul_step"):
            float(f(x))
    import glob as g
    assert g.glob(str(tmp_path) + "/**/*.trace.json.gz", recursive=True)

    t = profiler.StepTimer()
    for _ in range(3):
        with t.step(result_fn=lambda: float(f(x))):
            r = f(x)  # noqa: F841
    s = t.summary()
    assert s["n"] == 3 and s["min_s"] > 0 and s["p50_s"] >= s["min_s"]
