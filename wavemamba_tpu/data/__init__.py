from wavemamba_tpu.data.loader import (
    EnlargedSampler,
    ThreadedLoader,
    build_dataloader,
    build_dataset,
    device_prefetch,
)
from wavemamba_tpu.data.paired_image_dataset import PairedImageDataset, SingleImageDataset

__all__ = [
    "EnlargedSampler",
    "ThreadedLoader",
    "build_dataset",
    "build_dataloader",
    "device_prefetch",
    "PairedImageDataset",
    "SingleImageDataset",
]
