"""Quality metrics: PSNR, SSIM, VFID (Frechet distance over I3D features).

Reproduces reference core/metrics.py semantics:

- PSNR on [0, 255] float64 (metrics.py:20-36).
- SSIM matching scikit-image 0.16 `measure.compare_ssim` with
  data_range=255, multichannel=True, win_size=65 (metrics.py:39-54):
  uniform filter, sample covariance, per-channel average, border-cropped
  mean. The border crop keeps only fully-interior windows, so the uniform
  filter reduces to 'valid' box means — computed with
  scipy.ndimage.uniform_filter cropped to the interior (separable running
  box sums; measured faster here than a summed-area table) over all 5
  statistics and all channels in one vectorized pass.
- VFID: Frechet distance between sets of 1024-d I3D features
  (metrics.py:86-151); the stable sqrtm fallback is kept.
- calculate_epe kept for API parity (metrics.py:12-17).
"""

import numpy as np
from scipy import linalg


def calculate_epe(flow1, flow2):
    """End-point error between two (..., 2) flow arrays."""
    return float(np.sqrt(((np.asarray(flow1) - np.asarray(flow2)) ** 2
                          ).sum(-1)).mean())


def calculate_psnr(img1, img2):
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _box_mean_valid(a, win):
    """Box means over all fully-inside window positions.

    a: (..., H, W) float64. Returns (..., H-win+1, W-win+1) — the
    uniform-filter box mean restricted to interior windows (which never
    touch the boundary, so the filter's edge mode is irrelevant). One
    batched ndimage call over all leading axes; measured ~10x faster on
    this class of host than a numpy summed-area table (ndimage's separable
    C passes beat numpy's allocation-heavy cumsum/slice arithmetic).
    """
    from scipy.ndimage import uniform_filter
    pad = (win - 1) // 2
    f = uniform_filter(a, size=[1] * (a.ndim - 2) + [win, win])
    return f[..., pad:-pad, pad:-pad]


def _ssim_interior(x, y, win_size, data_range, k1=0.01, k2=0.03):
    """SSIM map over interior windows; x, y: (..., H, W) float64.

    Returns the mean over the window positions, per leading index.
    """
    npix = win_size ** 2
    cov_norm = npix / (npix - 1)          # sample covariance
    stats = np.stack([x, y, x * x, y * y, x * y])
    ux, uy, uxx, uyy, uxy = _box_mean_valid(stats, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s.mean(axis=(-2, -1))


def _ssim_channel(x, y, win_size, data_range, k1=0.01, k2=0.03):
    return float(_ssim_interior(x.astype(np.float64), y.astype(np.float64),
                                win_size, data_range, k1, k2))


def calculate_ssim(img1, img2, data_range=255, win_size=65,
                   multichannel=True):
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if multichannel and img1.ndim == 3:
        # (C, H, W): all channels (and all 5 stats) in one vectorized pass
        x = np.ascontiguousarray(np.moveaxis(img1, -1, 0))
        y = np.ascontiguousarray(np.moveaxis(img2, -1, 0))
        return float(_ssim_interior(x, y, win_size, data_range).mean())
    return float(_ssim_interior(img1, img2, win_size, data_range))


def calc_psnr_and_ssim(img1, img2):
    """Per-frame PSNR + SSIM on [0, 255] images (metrics.py:39-54)."""
    return calculate_psnr(img1, img2), calculate_ssim(img1, img2)


def calculate_vfid(real_activations, fake_activations):
    """real/fake_activations: list of 1-D feature vectors."""
    m1 = np.mean(real_activations, axis=0)
    m2 = np.mean(fake_activations, axis=0)
    s1 = np.cov(real_activations, rowvar=False)
    s2 = np.cov(fake_activations, rowvar=False)
    return calculate_frechet_distance(m1, s1, m2, s2)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component "
                             f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) -
                 2 * np.trace(covmean))
