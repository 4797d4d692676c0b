"""Metric tests: PSNR, SSIM (vs brute-force oracle), Frechet (analytic)."""

import numpy as np
import pytest

from e2fgvi_tpu.eval import metrics


def test_psnr_known_values():
    a = np.zeros((8, 8), np.float64)
    b = np.full((8, 8), 10.0)
    want = 20 * np.log10(255 / 10.0)
    assert abs(metrics.calculate_psnr(a, b) - want) < 1e-9
    assert metrics.calculate_psnr(a, a) == float("inf")


def _ssim_bruteforce(x, y, win, data_range=255):
    """Literal sliding-window SSIM with sample covariance (the definition
    skimage 0.16 implements with a uniform filter)."""
    h, w = x.shape
    pad = (win - 1) // 2
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for i in range(pad, h - pad):
        for j in range(pad, w - pad):
            wx = x[i - pad: i + pad + 1, j - pad: j + pad + 1]
            wy = y[i - pad: i + pad + 1, j - pad: j + pad + 1]
            ux, uy = wx.mean(), wy.mean()
            vx = wx.var(ddof=1)
            vy = wy.var(ddof=1)
            vxy = ((wx - ux) * (wy - uy)).sum() / (win * win - 1)
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2)) /
                        ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_ssim_matches_bruteforce(rng):
    x = rng.uniform(0, 255, (24, 30)).astype(np.float64)
    y = (x + rng.normal(0, 12, x.shape)).clip(0, 255)
    got = metrics._ssim_channel(x, y, win_size=7, data_range=255)
    want = _ssim_bruteforce(x, y, 7)
    # the border crop keeps only fully-interior windows, so both
    # formulations compute identical statistics
    assert abs(got - want) < 1e-9
    assert abs(metrics.calculate_ssim(
        np.stack([x] * 3, -1), np.stack([x] * 3, -1), win_size=7) - 1.0) \
        < 1e-9


def test_frechet_analytic():
    # identical Gaussians -> 0; mean shift d -> |d|^2
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (5000, 4))
    b = a + np.array([1.0, 0, 0, 0])
    d0 = metrics.calculate_vfid(list(a), list(a))
    d1 = metrics.calculate_vfid(list(a), list(b))
    assert abs(d0) < 1e-6
    assert abs(d1 - 1.0) < 0.05


def test_epe():
    f1 = np.zeros((4, 4, 2))
    f2 = np.ones((4, 4, 2))
    assert abs(metrics.calculate_epe(f1, f2) - np.sqrt(2)) < 1e-9
