"""Metric factory — replaces the pyiqa-backed metric creation in the
reference model layer (`femasr_model.py:33-39`): YAML-declared metrics with
crop_border / test_y_channel options and better-higher/lower direction for
best-model tracking (`base_model.py:50-83`)."""

from wavemamba_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim

# direction: True if higher is better.
METRIC_DIRECTION = {"psnr": True, "ssim": True, "lpips": False}


def build_metric(opt: dict):
    """opt: {'type': 'psnr'|'ssim'|'lpips', ...kwargs} -> fn(img, img2) -> float.

    img/img2: HWC numpy, uint8 [0,255] BGR or float [0,1].
    """
    opt = dict(opt)
    name = opt.pop("type").lower()
    opt.pop("better", None)
    if name == "psnr":
        return lambda a, b: calculate_psnr(a, b, **opt)
    if name == "ssim":
        return lambda a, b: calculate_ssim(a, b, **opt)
    if name == "lpips":
        import numpy as np

        import jax.numpy as jnp

        from wavemamba_tpu.metrics.lpips import load_lpips_params, lpips

        path = opt.pop("weights_path", None)
        if path is None:
            raise ValueError(
                "lpips metric needs 'weights_path' (pretrained AlexNet+LPIPS "
                "state dict); no network egress is assumed."
            )
        params = load_lpips_params(path)

        def fn(a, b):
            # uint8 BGR HWC -> RGB NHWC in [-1, 1] (reference protocol:
            # inference_wavemamba.py:118-119).
            def cvt(x):
                x = np.asarray(x)
                if x.dtype == np.uint8:
                    x = x.astype(np.float32) / 255.0
                x = x[..., ::-1].copy()  # BGR -> RGB
                return jnp.asarray(x[None] * 2.0 - 1.0)

            return float(lpips(params, cvt(a), cvt(b))[0])

        return fn
    raise KeyError(f"Unknown metric type {name!r}")


__all__ = ["calculate_psnr", "calculate_ssim", "build_metric", "METRIC_DIRECTION"]
