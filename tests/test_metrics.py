"""PSNR/SSIM metric correctness (videosd_tpu/ops/metrics.py).

SSIM is validated against a naive direct sliding-window implementation of
Wang et al. 2004 (Gaussian window, population statistics) — the same
convention as the original MATLAB code — plus closed-form special cases.
"""

from __future__ import annotations

import numpy as np
import pytest

from videosd_tpu.ops.metrics import _gaussian_kernel, psnr, ssim


def test_psnr_identity_is_inf():
    x = np.random.default_rng(0).integers(0, 256, (32, 32, 3), np.uint8)
    assert psnr(x, x) == float("inf")


def test_psnr_uniform_offset_closed_form():
    x = np.full((64, 64), 100.0)
    y = x + 5.0
    expect = 10.0 * np.log10(255.0**2 / 25.0)
    assert abs(psnr(x, y) - expect) < 1e-9


def test_psnr_shape_mismatch_raises():
    with pytest.raises(ValueError):
        psnr(np.zeros((4, 4)), np.zeros((4, 5)))


def test_ssim_identity_is_one():
    x = np.random.default_rng(1).integers(0, 256, (48, 40, 3), np.uint8)
    assert abs(ssim(x, x) - 1.0) < 1e-12


def test_ssim_constant_images_closed_form():
    # zero variance/covariance everywhere -> luminance term only
    a, b = 120.0, 140.0
    x = np.full((32, 32), a)
    y = np.full((32, 32), b)
    c1 = (0.01 * 255.0) ** 2
    expect = (2 * a * b + c1) / (a * a + b * b + c1)
    assert abs(ssim(x, y) - expect) < 1e-9


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (64, 64))
    vals = []
    for amp in (2.0, 10.0, 40.0):
        y = np.clip(x + rng.normal(0, amp, x.shape), 0, 255)
        vals.append(ssim(x, y))
    assert vals[0] > vals[1] > vals[2]
    assert vals[0] > 0.9


def _ssim_naive(a, b, win=11, sigma=1.5, L=255.0):
    """Direct O(HW*win^2) reference implementation."""
    k1d = _gaussian_kernel(win, sigma)
    w = np.outer(k1d, k1d)
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    H, W = a.shape
    vals = []
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            pa = a[i : i + win, j : j + win]
            pb = b[i : i + win, j : j + win]
            mu_a = (w * pa).sum()
            mu_b = (w * pb).sum()
            va = (w * pa * pa).sum() - mu_a**2
            vb = (w * pb * pb).sum() - mu_b**2
            cov = (w * pa * pb).sum() - mu_a * mu_b
            vals.append(
                ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
            )
    return float(np.mean(vals))


def test_ssim_matches_naive_reference():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 255, (24, 26))
    b = np.clip(a + rng.normal(0, 12.0, a.shape), 0, 255)
    assert abs(ssim(a, b) - _ssim_naive(a, b)) < 1e-10


def test_ssim_multichannel_is_channel_mean():
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 255, (20, 20, 3))
    b = np.clip(a + rng.normal(0, 8.0, a.shape), 0, 255)
    per_ch = np.mean([ssim(a[..., c], b[..., c]) for c in range(3)])
    assert abs(ssim(a, b) - per_ch) < 1e-12
