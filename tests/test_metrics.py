"""PSNR/SSIM metrics (pixel.cpp ssim_4x4x2_core/ssim_end_4 behavior)."""

import numpy as np
import jax.numpy as jnp

from x265_tpu.ops.metrics import (psnr, ssim_plane, ssim_plane_j,
                                  ssim_to_db)


def test_psnr_identity_and_scale():
    a = np.arange(64 * 64, dtype=np.int32).reshape(64, 64) % 256
    assert psnr(a, a) > 99
    b = np.clip(a + 4, 0, 255)
    p = psnr(a, b)
    assert 35 < p < 37      # MSE ~16 -> ~36.1 dB


def test_ssim_bounds_and_ordering():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (72, 96)).astype(np.int32)
    assert ssim_plane(a, a) > 0.9999
    small = np.clip(a + rng.integers(-3, 3, a.shape), 0, 255)
    big = np.clip(a + rng.integers(-30, 30, a.shape), 0, 255)
    s_small = ssim_plane(a, small)
    s_big = ssim_plane(a, big)
    assert 0 < s_big < s_small < 1.0
    assert ssim_to_db(s_small) > ssim_to_db(s_big)


def test_ssim_device_matches_oracle():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 64)).astype(np.int32)
    b = np.clip(a + rng.integers(-10, 10, a.shape), 0, 255)
    sj = float(ssim_plane_j(jnp.asarray(a), jnp.asarray(b)))
    sn = ssim_plane(a, b)
    assert abs(sj - sn) < 1e-4


def test_version_strings():
    from x265_tpu.version import build_info_str, version_str
    assert version_str()
    assert "x265_tpu" in build_info_str()
