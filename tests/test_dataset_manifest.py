"""Frozen-val-set machinery (VERDICT r4 #3).

`scripts/make_proc_dataset.py` is fully seeded, so a MANIFEST.json carrying
the generator invocation + per-file sha256 pins a procedural distribution
across rounds. These tests pin (a) the generator's bit-exact determinism
against recorded hashes, and (b) the manifest write/verify round-trip
including tamper detection.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from dataset_manifest import build_manifest, verify, write  # noqa: E402

# sha256 of every file from `make_proc_dataset.py --bsrgan --n-train 1
# --n-val 1 --size 64 --seed 3`, recorded 2026-08-20. A mismatch means the
# generator no longer reproduces frozen datasets bit-exactly — a breaking
# change for cross-round PSNR comparability (treat like a format break).
_PINNED = {
    "train/gt/00000.png": "ed8461ce8c237be57e74a8d1b6c8884e1d7a338af7843bc671198cd6bef9925c",
    "train/input/00000.png": "8a1483553448518acf0186b8336c7af28ca07ee8ccc8143c559d12d23103aca0",
    "val/gt/00001.png": "92ef35b93a7604856819925d5e32bfddf677dced12749913b094f331c25ec4a0",
    "val/input/00001.png": "fe4bdd81418a144109e48979c0c15aaaf3d3d4eaa08070f58540662e17a11eaa",
}


def _generate(out):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_proc_dataset.py"),
         "--out", str(out), "--bsrgan", "--n-train", "1", "--n-val", "1",
         "--size", "64", "--seed", "3"],
        check=True, capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""},
    )


def test_generator_is_bit_exact_against_pins(tmp_path):
    _generate(tmp_path / "ds")
    got = build_manifest(str(tmp_path / "ds"))["files"]
    assert got == _PINNED


def test_manifest_roundtrip_and_tamper_detection(tmp_path, capsys):
    ds = tmp_path / "ds"
    _generate(ds)
    write(str(ds), generator_args="--bsrgan --n-train 1 --n-val 1 --size 64 --seed 3")
    m = json.load(open(ds / "MANIFEST.json"))
    assert m["n_files"] == 4 and "--seed 3" in m["generator_args"]
    assert verify(str(ds))
    assert verify(str(ds), split="val")
    # tamper with one val pixel file -> verify must fail
    p = ds / "val" / "input" / "00001.png"
    with open(p, "ab") as fh:
        fh.write(b"\0")
    assert not verify(str(ds))
    assert not verify(str(ds), split="val")
    assert verify(str(ds), split="train")


def test_shipped_xl_val_manifest_verifies():
    """The checked-in XL val distribution (runs 006/007/008 report against
    it) must match its frozen manifest."""
    root = os.path.join(REPO, "datasets", "proc_llie_bsrgan_xl")
    if not os.path.exists(os.path.join(root, "MANIFEST.json")):
        import pytest

        pytest.skip("XL dataset not present on this host")
    assert verify(root, split="val")
