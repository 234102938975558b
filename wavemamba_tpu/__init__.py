"""wavemamba_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Wave-Mamba (ACM MM 2024) — ultra-high-definition low-light
image enhancement via a wavelet state-space U-Net.

Layout is NHWC throughout (TPU-native); the checkpoint converter handles the
NCHW/OIHW layouts of the reference PyTorch checkpoints.

Reference behavior map: see SURVEY.md at the repo root. Citations in
docstrings are `path:line` into the reference repo (read-only mount).
"""

__version__ = "0.1.0"
