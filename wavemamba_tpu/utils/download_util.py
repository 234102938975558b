"""Model/file download helpers (`basicsr/utils/download_util.py:11-99`).

This environment is zero-egress: downloads are gated. `load_file_from_url`
resolves against a local weights cache (`WM_WEIGHTS_DIR`, default
`~/.cache/wavemamba_tpu`) and only attempts a network fetch if the file is
absent AND egress is available."""

from __future__ import annotations

import os
from urllib.parse import urlparse


def weights_dir():
    return os.environ.get(
        "WM_WEIGHTS_DIR", os.path.join(os.path.expanduser("~"), ".cache", "wavemamba_tpu")
    )


def load_file_from_url(url, model_dir=None, progress=True, file_name=None):
    model_dir = model_dir or weights_dir()
    os.makedirs(model_dir, exist_ok=True)
    filename = file_name or os.path.basename(urlparse(url).path)
    cached = os.path.abspath(os.path.join(model_dir, filename))
    if os.path.exists(cached):
        return cached
    try:
        from urllib.request import urlretrieve

        print(f'Downloading: "{url}" to {cached}\n', flush=True)
        urlretrieve(url, cached)
        return cached
    except Exception as e:
        raise FileNotFoundError(
            f"{filename} is not in the local weights cache ({model_dir}) and "
            f"could not be downloaded (offline environment?): {e}"
        ) from e


def sizeof_fmt(size, suffix="B"):
    from wavemamba_tpu.utils.misc import sizeof_fmt as f

    return f(size, suffix)
