"""AOT deployment artifacts for serving WaveMamba without model code.

The reference ships weights-only ``.pth`` files and rebuilds the
architecture in Python at load time (`inference_wavemamba.py:67-106`);
its deployment unit is therefore "the repo". The TPU-native deployment
unit is a *compiled program*: this module serializes the jitted forward
to StableHLO via :mod:`jax.export` — one archive holding the weights and
one AOT-lowered program per static input shape — so a serving host needs
only jax + this loader (not the model source, converter, or config
system) and pays zero retrace cost. StableHLO serialization is
forward-compatible across jax releases, which also makes the artifact a
pin against framework drift.

Archive layout (a single ``.wmx`` zip)::

    manifest.json          versioning, config echo, shapes, platforms
    params.npz             flat weight list, index-ordered (p000000, ...)
    programs/{H}x{W}.bin   serialized jax.export.Exported per bucket

Programs take ``(flat_params_tuple, x)`` with the weights as a flat
positional tuple in ``jax.tree_util.tree_flatten`` order — the tree
structure never needs to be reconstructed at load time.

By default the export lowers for both ``cpu`` and ``tpu`` so an artifact
built on a CPU host serves on either; the Pallas scan kernels are
swapped for the fully-parallel XLA lowering (parity-tested against the
kernels) because Mosaic custom calls are neither portable nor
version-stable inside a serialized program. ``allow_custom_calls=True``
keeps the configured Pallas impl and restricts the artifact to TPU;
Mosaic *lowering* is host-side, so even these TPU-pinned artifacts can
be built on a CPU-only host (the kernels compile on the serving TPU at
load time).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import json
import zipfile

import numpy as np

FORMAT_VERSION = 1
# XLA lowering used when Pallas impls are configured: the fully-parallel
# scan, the same choice as WaveMambaConfig.fast_xla() (0.563 s vs chunked's
# 0.77 s @1080p on v5e, BENCH_NOTES.md). Bit-parity default configs
# (scan_impl='chunked') are exported unchanged.
_PORTABLE_SCAN = "par"


def enable_compilation_cache(cache_dir):
    """Point jax's persistent compilation cache at ``cache_dir``.

    A ``.wmx`` artifact amortizes EXPORT (tracing + StableHLO lowering),
    but each serving process still pays one XLA compile per program on
    its first call (163 s for the 4K bucket through this sandbox's
    tunnel, BENCH_NOTES.md). The persistent cache keys the compiled
    executable on the (deserialized) HLO + compile options + backend, so
    every process after the first loads the binary from ``cache_dir``
    instead — call this before the first program call, or pass
    ``compile_cache=`` to :meth:`ExportedModel.load`.

    Thresholds are zeroed so even small bucket programs are cached (the
    defaults skip compiles under 1 s, which would silently exclude tile
    programs on fast hosts).
    """
    import os

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _clean_config(cfg):
    """Config echo for the manifest: serializable fields only."""
    d = dataclasses.asdict(cfg)
    d.pop("scan_mesh", None)  # process-local object, not serializable
    for k, v in list(d.items()):
        if isinstance(v, tuple):
            d[k] = list(v)
    return d


def _params_digest(flat):
    h = hashlib.sha256()
    for p in flat:
        h.update(np.ascontiguousarray(np.asarray(p)).tobytes())
    return h.hexdigest()


def _tile_ext(tile_size, tile_pad, pad_multiple):
    """The fixed padded tile shape used by ``models.tiling.tiled_apply``."""
    ext = tile_size + 2 * tile_pad
    return ext + (-ext) % pad_multiple


def export_model(params, cfg, shapes, out_path, *, batch=1,
                 platforms=("cpu", "tpu"), allow_custom_calls=False,
                 tile=None, mesh_devices=1, io_dtype="float32"):
    """Serialize ``wavemamba_apply(params, cfg, x)`` for each ``(H, W)``.

    Args:
        params: weight pytree (as loaded by ``train.checkpoint.load_network``).
        cfg: ``WaveMambaConfig``. Pallas scan impls are replaced by the
            portable XLA lowering unless ``allow_custom_calls``.
        shapes: iterable of ``(H, W)`` static input shapes. Callers pad to
            a multiple of 128 like the reference; this is not re-checked
            (tiles only need x8).
        out_path: destination ``.wmx`` file.
        batch: static batch dimension baked into every program.
        platforms: lowering targets. With ``allow_custom_calls`` the
            default narrows to ``("tpu",)``.
        allow_custom_calls: keep Mosaic custom calls (TPU-only artifact).
        tile: optional ``{"size": 240, "pad": 16, "batch": 8,
            "pad_multiple": 8}`` — additionally export one fixed-shape tile
            program so the artifact serves frames LARGER than any whole-frame
            bucket via ``ExportedModel.tiled`` (the ≥8K path; whole-frame is
            higher-fidelity up to 4K, see BENCH_NOTES.md "tiled-vs-whole").
        mesh_devices: >1 exports the TILE program sharded over a
            ``('data',)`` mesh — params replicated, the tile batch split
            across chips (the multi-chip serving story; matches
            ``models.tiling.tiled_apply_mesh``). The build host needs that
            many jax devices: on a CPU-only host use
            ``XLA_FLAGS=--xla_force_host_platform_device_count=N``; the
            logical device assignment re-binds to the serving host's chips
            at load. Serving requires exactly ``mesh_devices`` devices.
        io_dtype: ``"float32"`` (default) or ``"uint8"``. uint8 moves the
            byte<->float conversion onto the device: programs take uint8
            pixels and return uint8 pixels, quantized EXACTLY like the
            save path (clip to [0,1], *255, round-half-even — the math of
            ``utils.img_util.batch2img``), so serving fidelity is
            unchanged while host<->device pixel traffic shrinks 8x (f32
            1080p round trip is ~48 MB/frame; measured 3.1 s/frame over
            this sandbox's ~16 MB/s tunnel, BENCH_NOTES.md).
    """
    import jax
    import jax.export
    import jax.numpy as jnp

    from wavemamba_tpu.models.wavemamba import wavemamba_apply

    if cfg.scan_impl.startswith("pallas") and not allow_custom_calls:
        cfg = dataclasses.replace(cfg, scan_impl=_PORTABLE_SCAN)
    if io_dtype not in ("float32", "uint8"):
        raise ValueError(f"io_dtype must be 'float32' or 'uint8', got {io_dtype!r}")
    disabled = ()
    if allow_custom_calls:
        if platforms == ("cpu", "tpu"):
            platforms = ("tpu",)
        disabled = (jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),)

    flat, _ = jax.tree_util.tree_flatten(params)
    flat = tuple(jnp.asarray(p) for p in flat)

    @jax.jit
    def fwd(flat_params, x):
        tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), list(flat_params))
        if io_dtype == "uint8":
            y = wavemamba_apply(tree, cfg, x.astype(jnp.float32) / 255.0)
            # batch2img's exact quantization, on device (round is
            # half-to-even in both numpy and XLA).
            return jnp.round(jnp.clip(y, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return wavemamba_apply(tree, cfg, x)

    x_dtype = jnp.uint8 if io_dtype == "uint8" else jnp.float32

    param_specs = tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in flat)
    exporter = jax.export.export(
        fwd, platforms=list(platforms), disabled_checks=list(disabled))

    shapes = [tuple(map(int, s)) for s in shapes]
    if tile is not None:
        tile = {"size": int(tile.get("size", 240)),
                "pad": int(tile.get("pad", 16)),
                "batch": int(tile.get("batch", 8)),
                "pad_multiple": int(tile.get("pad_multiple", 8))}
    mesh_devices = int(mesh_devices)
    if mesh_devices > 1:
        if tile is None:
            raise ValueError("mesh_devices > 1 shards the tile program; "
                             "pass tile=... as well")
        if tile["batch"] % mesh_devices:
            raise ValueError(f"tile batch {tile['batch']} must divide over "
                             f"{mesh_devices} devices")
        if len(jax.devices()) < mesh_devices:
            raise ValueError(
                f"export host has {len(jax.devices())} jax devices, "
                f"need {mesh_devices} (CPU hosts: set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={mesh_devices})")
    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "model": "WaveMamba",
        "config": _clean_config(cfg),
        "batch": int(batch),
        "shapes": [list(s) for s in shapes],
        "tile": tile,
        "mesh_devices": mesh_devices,
        "io_dtype": io_dtype,
        "platforms": list(platforms),
        "n_params": len(flat),
        "param_bytes": int(sum(p.size * p.dtype.itemsize for p in flat)),
        "params_sha256": _params_digest(flat),
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("manifest.json", json.dumps(manifest, indent=1))
        buf = io.BytesIO()
        np.savez(buf, **{f"p{i:06d}": np.asarray(p) for i, p in enumerate(flat)})
        zf.writestr("params.npz", buf.getvalue())
        for H, W in shapes:
            x_spec = jax.ShapeDtypeStruct((batch, H, W, cfg.in_chn), x_dtype)
            exp = exporter(param_specs, x_spec)
            zf.writestr(f"programs/{H}x{W}.bin", exp.serialize())
        if tile is not None:
            ext = _tile_ext(tile["size"], tile["pad"], tile["pad_multiple"])
            x_spec = jax.ShapeDtypeStruct(
                (tile["batch"], ext, ext, cfg.in_chn), x_dtype)
            t_param_specs = param_specs
            if mesh_devices > 1:
                from jax.sharding import Mesh, NamedSharding, PartitionSpec

                mesh = Mesh(np.array(jax.devices()[:mesh_devices]), ("data",))
                repl = NamedSharding(mesh, PartitionSpec())
                split = NamedSharding(mesh, PartitionSpec("data"))
                t_param_specs = tuple(
                    jax.ShapeDtypeStruct(p.shape, p.dtype, sharding=repl)
                    for p in flat)
                x_spec = jax.ShapeDtypeStruct(
                    x_spec.shape, x_spec.dtype, sharding=split)
            zf.writestr("programs/tile.bin",
                        exporter(t_param_specs, x_spec).serialize())
    return manifest


class ExportedModel:
    """A loaded ``.wmx`` artifact: pad → run the right program → crop."""

    def __init__(self, manifest, flat_params, programs, tile_program=None):
        self.manifest = manifest
        self._flat = flat_params
        self._programs = programs  # {(H, W): jax.export.Exported}
        self._tile_program = tile_program
        self._placed = None  # mesh-replicated params, built on first tiled()
        self.shapes = sorted(programs)
        self.io_dtype = manifest.get("io_dtype", "float32")

    @classmethod
    def load(cls, path, compile_cache=None):
        import jax
        import jax.export

        if compile_cache is not None:
            enable_compilation_cache(compile_cache)
        with zipfile.ZipFile(path, "r") as zf:
            manifest = json.loads(zf.read("manifest.json"))
            if manifest["format_version"] > FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {manifest['format_version']} is newer "
                    f"than this loader ({FORMAT_VERSION})")
            built_with = manifest.get("jax_version")
            if built_with and built_with != jax.__version__:
                # StableHLO keeps old artifacts loadable on newer jax, but
                # record the drift — deserialize failures or numeric
                # deviations should be attributable at a glance.
                import logging

                logging.getLogger("wavemamba_tpu").warning(
                    "%s was exported with jax %s; this host runs jax %s "
                    "(StableHLO is forward-compatible, but re-export to "
                    "clear this warning)", path, built_with, jax.__version__)
            with np.load(io.BytesIO(zf.read("params.npz"))) as npz:
                flat = tuple(npz[f"p{i:06d}"] for i in range(manifest["n_params"]))
            want = manifest.get("params_sha256")
            if want is not None and _params_digest(flat) != want:
                raise ValueError(
                    f"{path}: weight payload does not match the manifest "
                    "checksum — corrupt or tampered artifact")
            programs = {}
            for H, W in manifest["shapes"]:
                exp = jax.export.deserialize(zf.read(f"programs/{H}x{W}.bin"))
                programs[(H, W)] = exp
            tile_program = None
            if manifest.get("tile") is not None:
                tile_program = jax.export.deserialize(zf.read("programs/tile.bin"))
        return cls(manifest, flat, programs, tile_program)

    def _shape_for(self, h, w):
        fits = [(H, W) for H, W in self.shapes if H >= h and W >= w]
        if not fits:
            raise ValueError(
                f"input {h}x{w} exceeds every exported shape {self.shapes}; "
                "re-export with a larger bucket or tile the input")
        return min(fits, key=lambda s: s[0] * s[1])

    def _to_io(self, x):
        """Convert host pixels to the artifact's program dtype (uint8
        artifacts accept float [0,1] too — quantized with the save path's
        exact math, so nothing is lost relative to writing a PNG)."""
        x = np.asarray(x)
        if self.io_dtype == "uint8":
            if x.dtype == np.uint8:
                return x
            return np.round(np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)
        return np.asarray(x, np.float32)

    def __call__(self, x):
        """Enhance ``(B, h, w, C)``; returns the same spatial shape.

        float32 artifacts take/return float32 in [0, 1]; uint8 artifacts
        take uint8 (or float [0,1], quantized host-side) and return uint8
        — the byte<->float conversion runs on the device, so only bytes
        cross the host link. ``B`` must equal the exported batch; spatial
        dims reflect-pad up to the smallest exported program that fits
        (the reference's own 128-padding contract,
        `inference_wavemamba.py:28-36`) and crop back.
        """
        return self.dispatch(x).fetch()

    def _check_platform(self):
        """TPU-pinned artifacts (``allow_custom_calls``) carry Mosaic
        custom calls that only a TPU backend can execute; fail up front
        with the remedy instead of a Mosaic stack trace mid-call."""
        import jax

        plats = self.manifest.get("platforms") or []
        backend = jax.default_backend()
        if plats and backend not in plats:
            raise ValueError(
                f"artifact was lowered for platform(s) {plats}; this host's "
                f"jax backend is '{backend}'. Serve it on a matching device, "
                "or re-export without allow_custom_calls for a portable "
                "(cpu+tpu) artifact.")

    def dispatch(self, x):
        """Like ``__call__`` but WITHOUT fetching: pads, enqueues the
        program (JAX dispatch is async) and returns a handle whose
        ``.fetch()`` yields the cropped numpy result. A serving loop that
        dispatches frame i+1 before fetching frame i overlaps device
        compute with the result transfer and the host's decode/encode work
        (used by ``scripts/export_model.py run``; same overlap that takes
        the official bench from 227 to 202 ms/frame, BENCH_NOTES.md)."""
        self._check_platform()
        x = self._to_io(x)
        b, h, w, _ = x.shape
        if b != self.manifest["batch"]:
            raise ValueError(f"batch {b} != exported batch {self.manifest['batch']}")
        H, W = self._shape_for(h, w)
        if (h, w) != (H, W):
            x = _reflect_pad(x, H, W)
        return _Pending(self._programs[(H, W)].call(self._flat, x), h, w)

    def tiled(self, x):
        """Enhance ``(1, h, w, C)`` of any size through the fixed-shape tile
        program (requires ``tile=...`` at export). Prefer whole-frame
        programs up to 4K: SS2D's receptive field is frame-global, so tiles
        trade fidelity for unbounded size (BENCH_NOTES.md)."""
        if self._tile_program is None:
            raise ValueError("artifact was exported without a tile program")
        self._check_platform()
        from wavemamba_tpu.models.tiling import tiled_apply

        t = self.manifest["tile"]
        x = self._to_io(x)
        n_mesh = self.manifest.get("mesh_devices", 1)
        if n_mesh > 1:
            import jax
            import jax.numpy as jnp
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            devs = jax.devices()
            if len(devs) < n_mesh:
                raise ValueError(
                    f"tile program was exported for {n_mesh} devices; "
                    f"this host has {len(devs)}")
            mesh = Mesh(np.array(devs[:n_mesh]), ("data",))
            repl = NamedSharding(mesh, PartitionSpec())
            split = NamedSharding(mesh, PartitionSpec("data"))
            if self._placed is None:
                self._placed = tuple(jax.device_put(jnp.asarray(p), repl)
                                     for p in self._flat)
            placed = self._placed

            def fn(chunk):
                xb = jax.device_put(jnp.asarray(np.asarray(chunk)), split)
                return self._tile_program.call(placed, xb)
        else:
            fn = lambda chunk: self._tile_program.call(  # noqa: E731
                self._flat, np.asarray(chunk))
        return np.asarray(tiled_apply(
            fn, x, tile_size=t["size"],
            tile_pad=t["pad"], pad_multiple=t["pad_multiple"],
            tile_batch=t["batch"]))


class _Pending:
    """Handle for a dispatched-but-unfetched program call."""

    def __init__(self, y, h, w):
        self._y, self._h, self._w = y, h, w

    def fetch(self):
        return np.asarray(self._y)[:, : self._h, : self._w]


def _reflect_pad(x, H, W):
    """Bottom/right reflect pad, re-reflecting when the pad exceeds the
    extent (matches ``models.wavemamba.pad_to_multiple``)."""
    b, h, w, c = x.shape
    return np.pad(x, ((0, 0), (0, H - h), (0, W - w), (0, 0)), mode="reflect")


def load_exported(path, compile_cache=None):
    return ExportedModel.load(path, compile_cache=compile_cache)
