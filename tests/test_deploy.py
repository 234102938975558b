"""AOT deployment artifacts (wavemamba_tpu/deploy.py): a .wmx archive must
round-trip through jax.export serialization bit-exactly, pad/crop like the
reference's 128-padding contract, and serve a folder end-to-end through the
CLI without importing the model source."""

import importlib.util
import os

import cv2
import numpy as np
import pytest


def _export_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "export_model.py")
    spec = importlib.util.spec_from_file_location("export_model", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def _tiny(tmp_path):
    import jax

    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba

    cfg = WaveMambaConfig(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                          scan_chunk=16)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_export_roundtrip_bit_exact(tmp_path):
    import jax.numpy as jnp

    from wavemamba_tpu.deploy import export_model, load_exported
    from wavemamba_tpu.models.wavemamba import wavemamba_apply

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    manifest = export_model(params, cfg, [(32, 32), (64, 32)], str(path),
                            platforms=("cpu",))
    assert manifest["n_params"] > 0
    model = load_exported(str(path))
    assert model.shapes == [(32, 32), (64, 32)]

    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    want = np.asarray(wavemamba_apply(params, cfg, jnp.asarray(x)))
    got = model(x)
    # Same math, but the exported module is a distinct HLO program, so XLA
    # may reassociate fusions: f32 reorder noise only (measured 2.4e-7).
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_exported_pad_crop_matches_direct(tmp_path):
    import jax.numpy as jnp

    from wavemamba_tpu.deploy import _reflect_pad, export_model, load_exported
    from wavemamba_tpu.models.wavemamba import wavemamba_apply

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",))
    model = load_exported(str(path))

    # 20x26 input rides the 32x32 program via reflect pad, crops back.
    x = np.random.RandomState(1).rand(1, 20, 26, 3).astype(np.float32)
    got = model(x)
    assert got.shape == (1, 20, 26, 3)
    want = np.asarray(
        wavemamba_apply(params, cfg, jnp.asarray(_reflect_pad(x, 32, 32))))
    np.testing.assert_allclose(got, want[:, :20, :26], atol=2e-6)


def test_exported_shape_and_batch_errors(tmp_path):
    from wavemamba_tpu.deploy import export_model, load_exported

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",))
    model = load_exported(str(path))
    with pytest.raises(ValueError, match="exceeds every exported shape"):
        model(np.zeros((1, 48, 48, 3), np.float32))
    with pytest.raises(ValueError, match="batch"):
        model(np.zeros((2, 16, 16, 3), np.float32))


def test_export_cli_serves_folder(tmp_path):
    """export -> run: the serving path touches only deploy.py + img io."""
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig  # noqa: F401
    from wavemamba_tpu.train.checkpoint import save_network

    cfg, params = _tiny(tmp_path)
    models_dir = tmp_path / "models"
    save_network(params, str(models_dir), "net_g", 1)

    cli = _export_cli()
    art = tmp_path / "m.wmx"
    cli(["export", "-w", str(models_dir / "net_g_1"), "-o", str(art),
         "--shapes", "32x32", "--platforms", "cpu",
         "--wf", "8", "--n_l_blocks", "1", "1", "1",
         "--n_h_blocks", "1", "1", "1"])
    assert art.exists()

    in_dir = tmp_path / "lq"
    os.makedirs(in_dir)
    rs = np.random.RandomState(0)
    for name, (h, w) in [("a.png", (20, 26)), ("b.png", (32, 32))]:
        cv2.imwrite(str(in_dir / name), rs.randint(0, 255, (h, w, 3), np.uint8))
    out_dir = tmp_path / "served"
    cli(["run", "-a", str(art), "-i", str(in_dir), "-o", str(out_dir)])
    assert sorted(os.listdir(out_dir)) == ["a.png", "b.png"]
    assert cv2.imread(str(out_dir / "a.png")).shape == (20, 26, 3)


def test_export_swaps_pallas_for_portable_lowering(tmp_path):
    from wavemamba_tpu.deploy import export_model, load_exported
    import dataclasses

    cfg, params = _tiny(tmp_path)
    cfg = dataclasses.replace(cfg, scan_impl="pallas_fused")
    path = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",))
    model = load_exported(str(path))
    assert model.manifest["config"]["scan_impl"] == "par"
    out = model(np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32))
    assert np.isfinite(out).all()


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_exported_tile_program_matches_tiled_apply(tmp_path):
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.deploy import export_model, load_exported
    from wavemamba_tpu.models.tiling import tiled_apply
    from wavemamba_tpu.models.wavemamba import wavemamba_apply

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    # Whole-frame bucket 32x32 + a 16px tile program (ext 16+2*8=32).
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",),
                 tile={"size": 16, "pad": 8, "batch": 4})
    model = load_exported(str(path))
    assert model.manifest["tile"]["size"] == 16

    # 40x56 exceeds the 32x32 bucket -> whole-frame path refuses, tiled works.
    x = np.random.RandomState(3).rand(1, 40, 56, 3).astype(np.float32)
    with pytest.raises(ValueError, match="exceeds every exported shape"):
        model(x)
    got = model.tiled(x)
    assert got.shape == x.shape

    fwd = jax.jit(lambda z: wavemamba_apply(params, cfg, z))
    want = np.asarray(tiled_apply(fwd, x, tile_size=16, tile_pad=8,
                                  pad_multiple=8, tile_batch=4))
    np.testing.assert_allclose(got, want, atol=2e-6)

    # An artifact exported without a tile program refuses .tiled loudly.
    m2_path = tmp_path / "m2.wmx"
    export_model(params, cfg, [(32, 32)], str(m2_path), platforms=("cpu",))
    with pytest.raises(ValueError, match="without a tile program"):
        load_exported(str(m2_path)).tiled(x)


def test_tpu_pinned_export_builds_on_cpu_host(tmp_path):
    """--allow_custom_calls keeps the Pallas kernels: Mosaic LOWERING is
    host-side, so the TPU-only artifact must build without a TPU attached
    (it compiles on the serving chip at load)."""
    import dataclasses

    from wavemamba_tpu.deploy import export_model

    cfg, params = _tiny(tmp_path)
    cfg = dataclasses.replace(cfg, scan_impl="pallas_fused",
                              compute_dtype="bfloat16", scan_dtype="bfloat16")
    path = tmp_path / "m.wmx"
    manifest = export_model(params, cfg, [(32, 32)], str(path),
                            allow_custom_calls=True)
    assert manifest["platforms"] == ["tpu"]
    assert manifest["config"]["scan_impl"] == "pallas_fused"
    assert path.exists()


def test_mesh_sharded_tile_program(tmp_path):
    """mesh_devices=4: the tile program runs sharded over a 4-device 'data'
    mesh (params replicated, tile batch split) and matches the single-device
    tiled result."""
    import jax

    from wavemamba_tpu.deploy import export_model, load_exported
    from wavemamba_tpu.models.tiling import tiled_apply
    from wavemamba_tpu.models.wavemamba import wavemamba_apply

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",),
                 tile={"size": 16, "pad": 8, "batch": 4}, mesh_devices=4)
    model = load_exported(str(path))
    assert model.manifest["mesh_devices"] == 4

    x = np.random.RandomState(7).rand(1, 40, 56, 3).astype(np.float32)
    got = model.tiled(x)

    fwd = jax.jit(lambda z: wavemamba_apply(params, cfg, z))
    want = np.asarray(tiled_apply(fwd, x, tile_size=16, tile_pad=8,
                                  pad_multiple=8, tile_batch=4))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_mesh_export_validation(tmp_path):
    from wavemamba_tpu.deploy import export_model

    cfg, params = _tiny(tmp_path)
    with pytest.raises(ValueError, match="shards the tile program"):
        export_model(params, cfg, [(32, 32)], str(tmp_path / "x.wmx"),
                     platforms=("cpu",), mesh_devices=2)
    with pytest.raises(ValueError, match="must divide"):
        export_model(params, cfg, [(32, 32)], str(tmp_path / "x.wmx"),
                     platforms=("cpu",),
                     tile={"size": 16, "pad": 8, "batch": 3}, mesh_devices=2)


def test_checksum_guards_weight_payload(tmp_path):
    import json
    import zipfile

    from wavemamba_tpu.deploy import export_model, load_exported

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",))
    load_exported(str(path))  # intact artifact loads

    # Corrupt one weight value; the loader must refuse.
    import io as _io

    bad = tmp_path / "bad.wmx"
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(bad, "w") as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "params.npz":
                with np.load(_io.BytesIO(data)) as npz:
                    arrs = {k: npz[k].copy() for k in npz.files}
                arrs["p000000"].flat[0] += 1.0
                buf = _io.BytesIO()
                np.savez(buf, **arrs)
                data = buf.getvalue()
            zout.writestr(name, data)
    with pytest.raises(ValueError, match="checksum"):
        load_exported(str(bad))


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_uint8_io_matches_save_path_quantization(tmp_path):
    """io_dtype='uint8' bakes the byte<->float conversion into the program:
    the served bytes must equal batch2img's quantization of the float
    program's output (same clip/scale/round math, just on device)."""
    from wavemamba_tpu.deploy import export_model, load_exported

    cfg, params = _tiny(tmp_path)
    f32_path, u8_path = tmp_path / "f32.wmx", tmp_path / "u8.wmx"
    export_model(params, cfg, [(32, 32)], str(f32_path), platforms=("cpu",),
                 tile={"size": 16, "pad": 8, "batch": 4})
    export_model(params, cfg, [(32, 32)], str(u8_path), platforms=("cpu",),
                 tile={"size": 16, "pad": 8, "batch": 4}, io_dtype="uint8")
    m32, m8 = load_exported(str(f32_path)), load_exported(str(u8_path))
    assert m8.io_dtype == "uint8" and m32.io_dtype == "float32"

    rs = np.random.RandomState(11)
    bytes_in = rs.randint(0, 256, (1, 20, 26, 3), np.uint8)
    got = m8(bytes_in)
    assert got.dtype == np.uint8
    want_f = m32(bytes_in.astype(np.float32) / 255.0)
    want = np.round(np.clip(want_f, 0, 1) * 255.0).astype(np.uint8)
    # Same math; reassociated fusions can flip a borderline .5 by one code.
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1

    # Float [0,1] input is quantized host-side to the same program dtype.
    np.testing.assert_array_equal(m8(bytes_in.astype(np.float32) / 255.0), got)

    # Tiled path serves bytes end to end too.
    big = rs.randint(0, 256, (1, 40, 56, 3), np.uint8)
    got_t = m8.tiled(big)
    assert got_t.dtype == np.uint8 and got_t.shape == big.shape
    want_t = np.round(
        np.clip(m32.tiled(big.astype(np.float32) / 255.0), 0, 1) * 255.0
    ).astype(np.uint8)
    assert int(np.abs(got_t.astype(int) - want_t.astype(int)).max()) <= 1


@pytest.mark.slow  # compile-heavy; full tier
def test_dispatch_fetch_matches_call(tmp_path):
    """ExportedModel.dispatch: two in-flight dispatches fetch the same
    results as blocking calls (the pipelined serving loop's contract)."""
    from wavemamba_tpu.deploy import export_model, load_exported

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",))
    model = load_exported(str(path))

    rs = np.random.RandomState(5)
    xs = [rs.rand(1, 20, 26, 3).astype(np.float32) for _ in range(2)]
    handles = [model.dispatch(x) for x in xs]  # both in flight
    for x, h in zip(xs, handles):
        np.testing.assert_array_equal(h.fetch(), model(x))


def test_uint8_mesh_tile_program(tmp_path):
    """uint8 I/O composes with the mesh-sharded tile program: bytes are
    sharded over the 'data' axis and the result matches the single-device
    uint8 tiled path exactly (same program, same quantization)."""
    import jax

    from wavemamba_tpu.deploy import export_model, load_exported

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    cfg, params = _tiny(tmp_path)
    single, meshed = tmp_path / "s.wmx", tmp_path / "m.wmx"
    tile = {"size": 16, "pad": 8, "batch": 4}
    export_model(params, cfg, [(32, 32)], str(single), platforms=("cpu",),
                 tile=tile, io_dtype="uint8")
    export_model(params, cfg, [(32, 32)], str(meshed), platforms=("cpu",),
                 tile=tile, mesh_devices=4, io_dtype="uint8")

    x = np.random.RandomState(9).randint(0, 256, (1, 40, 56, 3), np.uint8)
    got = load_exported(str(meshed)).tiled(x)
    want = load_exported(str(single)).tiled(x)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # compile-heavy; full tier
def test_export_cli_uint8_serves_folder(tmp_path):
    """export --io uint8 -> run: bytes-only serving through the CLI."""
    from wavemamba_tpu.train.checkpoint import save_network

    cfg, params = _tiny(tmp_path)
    models_dir = tmp_path / "models"
    save_network(params, str(models_dir), "net_g", 1)

    cli = _export_cli()
    art = tmp_path / "m8.wmx"
    cli(["export", "-w", str(models_dir / "net_g_1"), "-o", str(art),
         "--shapes", "32x32", "--platforms", "cpu", "--io", "uint8",
         "--wf", "8", "--n_l_blocks", "1", "1", "1",
         "--n_h_blocks", "1", "1", "1"])

    in_dir = tmp_path / "lq"
    os.makedirs(in_dir)
    cv2.imwrite(str(in_dir / "a.png"),
                np.random.RandomState(0).randint(0, 255, (20, 26, 3), np.uint8))
    out_dir = tmp_path / "served"
    cli(["run", "-a", str(art), "-i", str(in_dir), "-o", str(out_dir)])
    assert cv2.imread(str(out_dir / "a.png")).shape == (20, 26, 3)


def test_inference_cli_accepts_wmx_artifact(tmp_path, capsys):
    """inference.py -w model.wmx serves from the artifact (with GT metrics),
    so artifact fidelity is measurable through the same CLI as checkpoints."""
    from wavemamba_tpu.deploy import export_model

    cfg, params = _tiny(tmp_path)
    art = tmp_path / "m.wmx"
    export_model(params, cfg, [(128, 128)], str(art), platforms=("cpu",))

    in_dir, gt_dir = tmp_path / "lq", tmp_path / "gt"
    os.makedirs(in_dir); os.makedirs(gt_dir)
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (40, 48, 3), np.uint8)
    cv2.imwrite(str(in_dir / "a.png"), (img * 0.2).astype(np.uint8))
    cv2.imwrite(str(gt_dir / "a.png"), img)

    from inference import main as infer_main

    out_dir = tmp_path / "out"
    infer_main(["-i", str(in_dir), "-g", str(gt_dir), "-w", str(art),
                "-o", str(out_dir)])
    out = capsys.readouterr().out
    assert "psnr" in out and "avg psnr" in out
    assert cv2.imread(str(out_dir / "a.png")).shape == (40, 48, 3)


def test_tpu_pinned_artifact_fails_clearly_on_cpu_host(tmp_path):
    """Serving a TPU-pinned (allow_custom_calls) artifact on a CPU-only
    host must raise a ValueError naming the platform mismatch and the
    remedy — not a Mosaic stack trace (VERDICT r3 #9)."""
    import dataclasses

    import numpy as np
    import pytest

    from wavemamba_tpu.deploy import export_model, load_exported

    cfg, params = _tiny(tmp_path)
    cfg = dataclasses.replace(cfg, scan_impl="pallas_fused",
                              compute_dtype="bfloat16", scan_dtype="bfloat16")
    path = tmp_path / "pinned.wmx"
    export_model(params, cfg, [(32, 32)], str(path), allow_custom_calls=True)
    model = load_exported(str(path))  # loading for inspection is fine
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    with pytest.raises(ValueError, match="lowered for platform.*'cpu'"):
        model(x)


def test_loader_warns_on_jax_version_drift(tmp_path, caplog):
    """The manifest records the exporting jax version; loading under a
    different one logs a warning so deserialize failures / numeric drift
    are attributable (VERDICT r3 #9)."""
    import json
    import logging
    import zipfile

    import numpy as np

    from wavemamba_tpu.deploy import export_model, load_exported

    cfg, params = _tiny(tmp_path)
    path = tmp_path / "drift.wmx"
    export_model(params, cfg, [(32, 32)], str(path), platforms=("cpu",))

    # Rewrite the manifest with a different jax_version.
    with zipfile.ZipFile(str(path), "r") as zf:
        names = zf.namelist()
        payload = {n: zf.read(n) for n in names}
    manifest = json.loads(payload["manifest.json"])
    manifest["jax_version"] = "0.0.1-ancient"
    payload["manifest.json"] = json.dumps(manifest).encode()
    drifted = tmp_path / "drifted.wmx"
    with zipfile.ZipFile(str(drifted), "w") as zf:
        for n in names:
            zf.writestr(n, payload[n])

    with caplog.at_level(logging.WARNING, logger="wavemamba_tpu"):
        model = load_exported(str(drifted))
    assert any("0.0.1-ancient" in r.message for r in caplog.records)
    # Still serves (forward-compatible), and a same-version load is silent.
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    assert model(x).shape == x.shape
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="wavemamba_tpu"):
        load_exported(str(path))
    assert not [r for r in caplog.records if "exported with jax" in r.message]


def test_compile_cache_survives_process_restart(tmp_path):
    """load(compile_cache=DIR): the first serving process writes each
    program's compiled executable into DIR; a later process serving the
    same artifact loads the binary instead of recompiling (the 4K bucket
    compile is ~163 s — the cache is how restarts amortize it). Runs both
    servers as fresh interpreters so the cache, not this process's jit
    cache, is what carries the executable across."""
    import subprocess
    import sys
    import textwrap

    from wavemamba_tpu.deploy import export_model

    cfg, params = _tiny(tmp_path)
    art = tmp_path / "m.wmx"
    export_model(params, cfg, [(32, 32)], str(art), platforms=("cpu",))
    cache = tmp_path / "xla_cache"

    script = textwrap.dedent("""
        import sys
        import numpy as np
        from wavemamba_tpu.deploy import load_exported
        model = load_exported(sys.argv[1], compile_cache=sys.argv[2])
        x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
        y = model(x)
        assert y.shape == x.shape and np.isfinite(y).all()
        print("SERVE OK")
    """)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)

    def serve():
        return subprocess.run(
            [sys.executable, "-c", script, str(art), str(cache)],
            env=env, cwd=repo, capture_output=True, text=True, timeout=600)

    r1 = serve()
    assert r1.returncode == 0, r1.stdout + r1.stderr
    entries = sorted(os.listdir(cache))
    assert entries, "first serve wrote nothing into the compilation cache"

    r2 = serve()
    assert r2.returncode == 0, r2.stdout + r2.stderr
    # A hit compiles nothing, so the restarted process adds no entries.
    assert sorted(os.listdir(cache)) == entries


def test_export_cli_target_tpu_builds_pinned_fast_preset(tmp_path):
    """--fast --target tpu on a CPU build host must bake the TPU fast()
    preset (pallas_fused + bf16) instead of sniffing the CPU backend and
    silently degrading to fast_xla (the 4K AOT-export path, VERDICT r3 #5)."""
    import json
    import zipfile

    from wavemamba_tpu.train.checkpoint import save_network

    cfg, params = _tiny(tmp_path)
    models_dir = tmp_path / "models"
    save_network(params, str(models_dir), "net_g", 1)

    cli = _export_cli()
    art = tmp_path / "pinned.wmx"
    cli(["export", "-w", str(models_dir / "net_g_1"), "-o", str(art),
         "--shapes", "32x32", "--fast", "--target", "tpu",
         "--allow_custom_calls", "--io", "uint8",
         "--wf", "8", "--n_l_blocks", "1", "1", "1",
         "--n_h_blocks", "1", "1", "1"])
    with zipfile.ZipFile(str(art)) as zf:
        manifest = json.loads(zf.read("manifest.json"))
    assert manifest["config"]["scan_impl"] == "pallas_fused"
    assert manifest["config"]["compute_dtype"] == "bfloat16"
    assert manifest["platforms"] == ["tpu"]
    assert manifest["io_dtype"] == "uint8"
