from wavemamba_tpu.ops.haar import dwt2, iwt2, iwt2_cat
from wavemamba_tpu.ops.scan import selective_scan, selective_scan_chunked, selective_scan_ref

__all__ = [
    "dwt2",
    "iwt2",
    "iwt2_cat",
    "selective_scan",
    "selective_scan_chunked",
    "selective_scan_ref",
]
