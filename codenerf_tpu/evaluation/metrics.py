"""Image-quality metrics, computed in JAX (no host round-trips in eval).

PSNR convention matches the reference: ``-10 * log10(mse)`` over float-[0,1]
images (``src/optimizer.py:178-184``). NOTE the reference averages PSNR from
the MEAN OF PER-CHUNK MSE MEANS (``loss_per_img`` list, equal 2048-ray
chunks, ``src/optimizer.py:117-125``) — with equal chunk sizes that equals
the whole-image MSE, so a plain mean is parity-exact.

SSIM reimplements skimage's ``structural_similarity`` exactly as the
reference invokes it (``compute_ssim(gen, gt, multichannel=True)``,
``src/optimizer.py:168-173``): uniform 7x7 filter, K1=0.01, K2=0.03,
unbiased covariance normalization (N/(N-1) with N=49), border crop of
(win-1)/2, per-channel SSIM averaged over channels. Because the reference
omits ``data_range`` on float images, skimage silently assumes a dynamic
range of 2.0 (float dtype range [-1, 1]); that quirk inflates reported SSIM
and must be reproduced for parity, so ``data_range`` DEFAULTS TO 2.0 here.
Pass ``data_range=1.0`` for the physically correct number.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_WIN = 7
_K1 = 0.01
_K2 = 0.03


def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def reference_psnr_mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Whole-image MSE in float32 (equals the reference's mean of equal-chunk
    MSEs)."""
    return jnp.mean((pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2)


def _uniform_filter_valid(x: jnp.ndarray) -> jnp.ndarray:
    """7x7 mean filter, VALID windows only: (H, W) -> (H-6, W-6).

    skimage's uniform_filter uses border padding, but structural_similarity
    then crops (win-1)/2 borders — exactly the VALID region — so computing
    VALID directly is both exact and cheaper.
    """
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (_WIN, _WIN), (1, 1), "VALID"
    )
    return s / float(_WIN * _WIN)


def _ssim_single_channel(x: jnp.ndarray, y: jnp.ndarray,
                         data_range: float) -> jnp.ndarray:
    np_ = float(_WIN * _WIN)
    cov_norm = np_ / (np_ - 1.0)  # unbiased, skimage default
    ux = _uniform_filter_valid(x)
    uy = _uniform_filter_valid(y)
    uxx = _uniform_filter_valid(x * x)
    uyy = _uniform_filter_valid(y * y)
    uxy = _uniform_filter_valid(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (_K1 * data_range) ** 2
    c2 = (_K2 * data_range) ** 2
    a1, a2 = 2.0 * ux * uy + c1, 2.0 * vxy + c2
    b1, b2 = ux * ux + uy * uy + c1, vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def ssim(img0: jnp.ndarray, img1: jnp.ndarray,
         data_range: float = 2.0) -> jnp.ndarray:
    """Mean SSIM of two (H, W, 3) or (H, W) float images.

    ``data_range`` defaults to 2.0 to match the reference's (buggy) skimage
    invocation — see module docstring.
    """
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)
    if img0.ndim == 2:
        return _ssim_single_channel(img0, img1, data_range)
    per_channel = jax.vmap(
        lambda a, b: _ssim_single_channel(a, b, data_range),
        in_axes=-1,
    )(img0, img1)
    return jnp.mean(per_channel)
