"""Regression-test the on-hardware smoke script itself (VERDICT r2 #10).

`scripts/tpu_smoke.py` is the only thing standing between a Mosaic lowering
regression and a silent ship — and its round-2 bug (a wrong reference
closure, commit c6d927f) showed the smoke's own assertions need CI
coverage. The Pallas wrappers auto-interpret on non-TPU backends
(`ops/scan_pallas._resolve_interpret`), so running `main()` here executes
the exact smoke checks (same shapes, same tolerances, same reference
closures) with the kernels in interpret mode.
"""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.slow  # full tier: pytest -m ""


def _load_smoke():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "tpu_smoke.py")
    spec = importlib.util.spec_from_file_location("tpu_smoke", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_smoke_checks_pass_in_interpret_mode(capsys):
    smoke = _load_smoke()
    smoke.main()
    out = capsys.readouterr().out
    assert "TPU SMOKE OK" in out
