from setuptools import find_packages, setup

setup(
    name="wavemamba_tpu",
    version="0.1.0",
    description="TPU-native (JAX/XLA/Pallas) Wave-Mamba framework: "
    "UHD low-light image enhancement with wavelet state-space models",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "optax", "orbax-checkpoint", "numpy", "pyyaml"],
    extras_require={
        "data": ["opencv-python", "lmdb"],
        "torch-convert": ["torch"],
    },
)
