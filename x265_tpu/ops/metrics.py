"""Quality metrics: PSNR and SSIM (x265 ssim_4x4x2_core/ssim_end_4
behavior, source/common/pixel.cpp:769-860; framefilter.cpp:654 wiring).

x265 computes SSIM on 4x4 blocks over a half-pixel-shifted grid with
integer accumulators, then the per-block correlation terms feed the
float `ssim_end` combiner. The JAX version evaluates every block of
the frame at once; the numpy oracle mirrors x265's formulation for
tests. PSNR follows the standard MSE definition (framefilter.cpp
computes it from the per-row SSD accumulators).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def psnr(ref: np.ndarray, rec: np.ndarray, bit_depth: int = 8) -> float:
    maxv = (1 << bit_depth) - 1
    mse = np.mean((ref.astype(np.float64) - rec.astype(np.float64)) ** 2)
    if mse <= 0:
        return 99.99
    return float(10.0 * np.log10(maxv * maxv / mse))


def psnr_yuv(ref, rec, bit_depth: int = 8) -> tuple[float, float, float]:
    """(Y, Cb, Cr) PSNRs of two (y, cb, cr) plane triples."""
    return tuple(psnr(a, b, bit_depth) for a, b in zip(ref, rec))


# --- SSIM (x265 pixel.cpp ssim_4x4x2_core + ssim_end_4 behavior) -------------

def _ssim_end_1(s1, s2, ss, s12, bit_depth: int):
    """The float combiner over 4x4-block sums (pixel.cpp ssim_end_1):
    operates on sums of 2x2 neighbouring block statistics (64 px)."""
    pixel_max = (1 << bit_depth) - 1
    ssim_c1 = 0.01 * 0.01 * pixel_max * pixel_max * 64
    ssim_c2 = 0.03 * 0.03 * pixel_max * pixel_max * 64 * 63 / 64
    vars_ = ss * 64 - s1 * s1 - s2 * s2
    covar = s12 * 64 - s1 * s2
    return ((2 * s1 * s2 + ssim_c1) * (2 * covar + ssim_c2) /
            ((s1 * s1 + s2 * s2 + ssim_c1) * (vars_ + ssim_c2)))


def ssim_plane(ref: np.ndarray, rec: np.ndarray,
               bit_depth: int = 8) -> float:
    """Plane SSIM, x265 formulation: per-4x4-block integer sums on a
    half-block-shifted grid, combined 2x2 (64-px neighbourhoods); the
    frame score averages the interior blocks (framefilter.cpp:700)."""
    h, w = ref.shape
    bh, bw = h // 4, w // 4
    a = ref[:bh * 4, :bw * 4].astype(np.int64).reshape(bh, 4, bw, 4)
    b = rec[:bh * 4, :bw * 4].astype(np.int64).reshape(bh, 4, bw, 4)
    s1 = a.sum((1, 3)).astype(np.float64)
    s2 = b.sum((1, 3)).astype(np.float64)
    ss = ((a * a).sum((1, 3)) + (b * b).sum((1, 3))).astype(np.float64)
    s12 = (a * b).sum((1, 3)).astype(np.float64)
    # 2x2 neighbourhood sums (the "+1 block" window)
    q1 = s1[:-1, :-1] + s1[:-1, 1:] + s1[1:, :-1] + s1[1:, 1:]
    q2 = s2[:-1, :-1] + s2[:-1, 1:] + s2[1:, :-1] + s2[1:, 1:]
    qs = ss[:-1, :-1] + ss[:-1, 1:] + ss[1:, :-1] + ss[1:, 1:]
    q12 = s12[:-1, :-1] + s12[:-1, 1:] + s12[1:, :-1] + s12[1:, 1:]
    vals = _ssim_end_1(q1, q2, qs, q12, bit_depth)
    return float(vals.mean())


def ssim_plane_j(ref: jnp.ndarray, rec: jnp.ndarray,
                 bit_depth: int = 8) -> jnp.ndarray:
    """Device SSIM: the whole plane's 4x4 statistics in one pass."""
    h, w = ref.shape
    bh, bw = h // 4, w // 4
    a = ref[:bh * 4, :bw * 4].astype(jnp.float32).reshape(bh, 4, bw, 4)
    b = rec[:bh * 4, :bw * 4].astype(jnp.float32).reshape(bh, 4, bw, 4)
    s1 = a.sum((1, 3))
    s2 = b.sum((1, 3))
    ss = (a * a).sum((1, 3)) + (b * b).sum((1, 3))
    s12 = (a * b).sum((1, 3))
    q1 = s1[:-1, :-1] + s1[:-1, 1:] + s1[1:, :-1] + s1[1:, 1:]
    q2 = s2[:-1, :-1] + s2[:-1, 1:] + s2[1:, :-1] + s2[1:, 1:]
    qs = ss[:-1, :-1] + ss[:-1, 1:] + ss[1:, :-1] + ss[1:, 1:]
    q12 = s12[:-1, :-1] + s12[:-1, 1:] + s12[1:, :-1] + s12[1:, 1:]
    return jnp.mean(_ssim_end_1(q1, q2, qs, q12, bit_depth))


def ssim_to_db(ssim: float) -> float:
    """x265 reports SSIM in dB: -10*log10(1-ssim) (encoder.cpp)."""
    return float(-10.0 * np.log10(max(1.0 - ssim, 1e-10)))
