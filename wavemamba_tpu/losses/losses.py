"""Training losses (NHWC, pure functions) — parity with `basicsr/losses/`.

Reference citations (path:line into /root/reference):
  * l1/mse/charbonnier + weighted reduction   losses/losses.py:16-28, loss_util.py:5-95
  * L1Loss/MSELoss/CharbonnierLoss classes    losses/losses.py:44-158
  * PSNRLoss (NAFNet-style)                   losses/losses.py:99-125
  * WeightedTVLoss                            losses/losses.py:161-187
  * FFTLoss (L1 on stacked rfft2 real/imag)   losses/losses.py:299-313
  * GANLoss (vanilla/lsgan/wgan/_softplus/hinge) losses/losses.py:315-417
  * MultiScaleGANLoss                         losses/losses.py:420-445
  * r1 / path-regularize / gradient penalties losses/losses.py:448-513
  * GANFeatLoss                               losses/losses.py:516-549
  * SSIM training loss (Gaussian window 11/1.5) models/cal_ssim.py:7-74

All functions take `(pred, target)` NHWC float arrays in [0, 1]-ish range and
return scalars (or unreduced arrays for reduction='none').
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _reduce(x, weight, reduction):
    if weight is not None:
        x = x * weight
    if reduction == "none":
        return x
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "mean":
        if weight is None:
            return jnp.mean(x)
        # Weighted mean semantics from loss_util.weight_reduce_loss: when the
        # weight broadcasts over channels, normalize by weight-sum per element.
        return jnp.sum(x) / jnp.maximum(jnp.sum(weight) * (x.size / weight.size), 1e-12)
    raise ValueError(f"Unsupported reduction mode: {reduction}")


def l1_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    return loss_weight * _reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    return loss_weight * _reduce((pred - target) ** 2, weight, reduction)


def charbonnier_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean", eps=1e-12):
    return loss_weight * _reduce(jnp.sqrt((pred - target) ** 2 + eps), weight, reduction)


def psnr_loss(pred, target, loss_weight=1.0, to_y=False):
    """NAFNet PSNR loss: mean over batch of 10/ln(10) * ln(mse + 1e-8).

    Minimizing it maximizes PSNR. `to_y` applies the BT.601 Y transform the
    reference uses (`losses/losses.py:110-121`). pred/target NHWC in [0,1].
    """
    if to_y:
        coef = jnp.asarray([65.481, 128.553, 24.966], pred.dtype)
        pred = (jnp.sum(pred * coef, axis=-1, keepdims=True) + 16.0) / 255.0
        target = (jnp.sum(target * coef, axis=-1, keepdims=True) + 16.0) / 255.0
    scale = 10.0 / math.log(10.0)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return loss_weight * scale * jnp.mean(jnp.log(mse + 1e-8))


def weighted_tv_loss(pred, weight=None, loss_weight=1.0, reduction="mean"):
    """Anisotropic TV via L1 of neighbour differences (NHWC)."""
    if reduction not in ("mean", "sum"):
        raise ValueError(f"Unsupported reduction mode: {reduction}")
    yw = None if weight is None else weight[:, :-1, :, :]
    xw = None if weight is None else weight[:, :, :-1, :]
    y_diff = l1_loss(pred[:, :-1], pred[:, 1:], yw, loss_weight, reduction)
    x_diff = l1_loss(pred[:, :, :-1], pred[:, :, 1:], xw, loss_weight, reduction)
    return y_diff + x_diff


def fft_loss(pred, target, loss_weight=1.0, reduction="mean"):
    """L1 between stacked real/imag of 2-D rFFT over the spatial dims.

    The reference applies `torch.fft.rfft2` to NCHW (i.e. over H, W); we
    transform over axes (1, 2) of NHWC — identical spectra.
    """
    pf = jnp.fft.rfft2(pred.astype(jnp.float32), axes=(1, 2))
    tf = jnp.fft.rfft2(target.astype(jnp.float32), axes=(1, 2))
    ps = jnp.stack([pf.real, pf.imag], axis=-1)
    ts = jnp.stack([tf.real, tf.imag], axis=-1)
    return l1_loss(ps, ts, None, loss_weight, reduction)


# ---------------------------------------------------------------------------
# GAN losses.


def gan_loss(pred, target_is_real, gan_type="vanilla", real_label_val=1.0,
             fake_label_val=0.0, loss_weight=1.0, is_disc=False):
    """Generator/discriminator GAN loss. `loss_weight` applies only to the
    generator branch (reference semantics, `losses/losses.py:406-417`)."""
    if gan_type == "wgan":
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    elif gan_type == "wgan_softplus":
        loss = jnp.mean(jax.nn.softplus(-pred)) if target_is_real else jnp.mean(jax.nn.softplus(pred))
    elif gan_type == "hinge":
        if is_disc:
            p = -pred if target_is_real else pred
            loss = jnp.mean(jax.nn.relu(1.0 + p))
        else:
            loss = -jnp.mean(pred)
    else:
        target = jnp.full_like(pred, real_label_val if target_is_real else fake_label_val)
        if gan_type == "vanilla":  # BCE-with-logits
            loss = jnp.mean(
                jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
            )
        elif gan_type == "lsgan":
            loss = jnp.mean((pred - target) ** 2)
        else:
            raise NotImplementedError(f"GAN type {gan_type} is not implemented.")
    return loss if is_disc else loss * loss_weight


def multi_scale_gan_loss(preds, target_is_real, **kw):
    """Average `gan_loss` over a list of (lists of) predictions
    (`losses/losses.py:420-445`: uses the last tensor of nested lists)."""
    total = 0.0
    for p in preds:
        if isinstance(p, (list, tuple)):
            p = p[-1]
        total = total + gan_loss(p, target_is_real, **kw)
    return total / len(preds)


def r1_penalty(disc_fn, real_img):
    """R1 gradient penalty: E[||grad D(x)||^2] (`losses/losses.py:448-464`)."""
    grad = jax.grad(lambda x: jnp.sum(disc_fn(x)))(real_img)
    return jnp.sum(grad**2) / real_img.shape[0]


def gradient_penalty_loss(disc_fn, real_data, fake_data, key, weight=None):
    """WGAN-GP interpolation penalty (`losses/losses.py:487-513`)."""
    alpha = jax.random.uniform(key, (real_data.shape[0], 1, 1, 1))
    interp = alpha * real_data + (1.0 - alpha) * fake_data
    grad = jax.grad(lambda x: jnp.sum(disc_fn(x)))(interp)
    if weight is not None:
        grad = grad * weight
    norm = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2, 3)) + 1e-12)
    gp = jnp.mean((norm - 1.0) ** 2)
    if weight is not None:
        gp = gp / jnp.maximum(jnp.mean(weight), 1e-12)
    return gp


def g_path_regularize(gen_fn, latents, mean_path_length, key, decay=0.01):
    """StyleGAN2 path-length regularizer (`losses/losses.py:467-484`).

    gen_fn: latents -> NHWC image. Returns (penalty, path_lengths, path_mean).
    """
    img_shape = jax.eval_shape(gen_fn, latents).shape
    noise = jax.random.normal(key, img_shape) / math.sqrt(img_shape[1] * img_shape[2])
    grad = jax.grad(lambda z: jnp.sum(gen_fn(z) * noise))(latents)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=-1), axis=-1) + 1e-12)
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, path_lengths, path_mean


def gan_feat_loss(pred_fake_feats, pred_real_feats, criterion="l1", loss_weight=1.0):
    """Discriminator feature-matching loss (`losses/losses.py:516-549`)."""
    fn = {"l1": l1_loss, "l2": mse_loss, "charbonnier": charbonnier_loss}[criterion]
    num_d = len(pred_fake_feats)
    total = 0.0
    for fake_feats, real_feats in zip(pred_fake_feats, pred_real_feats):
        for f, r in zip(fake_feats[:-1], real_feats[:-1]):  # exclude final logits
            total = total + fn(f, jax.lax.stop_gradient(r)) / num_d
    return total * loss_weight


# ---------------------------------------------------------------------------
# Differentiable SSIM (training-loss ingredient for UHDModel;
# `basicsr/models/cal_ssim.py:7-74`: window 11, sigma 1.5, per-channel).


def _gaussian_window(size=11, sigma=1.5):
    g = jnp.exp(-((jnp.arange(size, dtype=jnp.float32) - size // 2) ** 2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred, target, window_size=11, sigma=1.5):
    """Mean SSIM over NHWC batch, differentiable; matches cal_ssim.SSIM
    (data range 1, C1=0.01^2, C2=0.03^2, SAME padding)."""
    c = pred.shape[-1]
    win = _gaussian_window(window_size, sigma).astype(pred.dtype)
    kernel = jnp.broadcast_to(win[:, :, None, None], (window_size, window_size, 1, c))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            ),
            feature_group_count=c,
        )

    mu1, mu2 = blur(pred), blur(target)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(pred * pred) - mu1_sq
    s2 = blur(target * target) - mu2_sq
    s12 = blur(pred * target) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def ssim_loss(pred, target, loss_weight=1.0):
    """1 - SSIM, as used by UHDModel (`models/uhdfour_model.py:164-175`)."""
    return loss_weight * (1.0 - ssim(pred, target))


def uhd_loss(out, out8, gt, fft_weight=0.0):
    """UHDModel composite loss (`basicsr/models/uhdfour_model.py:157-186`):
    L1(out, gt) + 0.0004*(1 - SSIM(out, gt)) + 0.1*L1(out8, gt downscaled
    1/8 bilinear) [+ FFT]. out/out8/gt: NHWC."""
    import jax.image

    gt8 = jax.image.resize(
        gt, (gt.shape[0], gt.shape[1] // 8, gt.shape[2] // 8, gt.shape[3]), "bilinear"
    )
    l_l1 = l1_loss(out, gt)
    l_l1_8 = l1_loss(out8, gt8)
    l_ssim = 1.0 - ssim(out, gt)
    total = l_l1 + 0.0004 * l_ssim + 0.1 * l_l1_8
    metrics = {"l_l1": l_l1, "l_ssim": l_ssim, "l_l1_8": l_l1_8}
    if fft_weight:
        l_fft = fft_loss(out, gt, loss_weight=fft_weight)
        total = total + l_fft
        metrics["l_freq"] = l_fft
    metrics["l_pix"] = total
    return total, metrics
