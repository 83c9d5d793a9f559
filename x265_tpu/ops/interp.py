"""HEVC sub-pel interpolation (clause 8.5.4.2): 8-tap luma quarter-pel,
4-tap chroma eighth-pel.

Numpy oracles (`luma_mc_np` / `chroma_mc_np`) implement the normative
fractional-sample process for the validation decoder. The JAX versions
batch whole-frame MC: every block gathers its (N+7)x(N+7) reference
patch at integer position, then two separable filter matmuls produce
the prediction — the per-fraction filter pair is selected by masked
accumulation so shapes stay static. Reference behavior: x265
source/common/ipfilter.cpp (interp_horiz/vert_pp/ps/sp).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

# Table 8-11: luma interpolation filter coefficients per quarter position
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)

# Table 8-13: chroma filter coefficients per eighth position
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int32)

LUMA_TAPS = 8
CHROMA_TAPS = 4


# =============================================================================
# numpy oracles
# =============================================================================

def _clip_fetch(plane: np.ndarray, y: int, x: int) -> int:
    h, w = plane.shape
    return int(plane[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])


def luma_mc_raw_np(ref: np.ndarray, x0: int, y0: int, n: int, mv_x: int,
                   mv_y: int, bit_depth: int = 8) -> np.ndarray:
    """14-bit intermediate luma prediction (no final rounding) — the
    predSamplesLX array of clause 8.5.4.2, needed for bi averaging."""
    out = _luma_mc_acc(ref, x0, y0, n, mv_x, mv_y, bit_depth)
    return (out >> (bit_depth - 8)).astype(np.int32) if False else out


def luma_mc_np(ref: np.ndarray, x0: int, y0: int, n: int, mv_x: int,
               mv_y: int, bit_depth: int = 8) -> np.ndarray:
    """Predict an NxN luma block at (x0, y0) displaced by quarter-pel MV.
    Out-of-frame samples use edge clamping (the padded-border rule)."""
    out = _luma_mc_acc(ref, x0, y0, n, mv_x, mv_y, bit_depth)
    # uni-pred final: >>6 to 14-bit then round >> (14-bd) == one rounded
    # shift by 12-shift1 (nested-floor identity)
    shift1 = bit_depth - 8
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


def _luma_mc_acc(ref, x0, y0, n, mv_x, mv_y, bit_depth):
    """Two-stage filter accumulator before the final shift (26-bit)."""
    fx, fy = mv_x & 3, mv_y & 3
    ix, iy = x0 + (mv_x >> 2), y0 + (mv_y >> 2)
    hf = LUMA_FILTERS[fx]
    vf = LUMA_FILTERS[fy]
    shift1 = bit_depth - 8
    tmp = np.zeros((n + 7, n), dtype=np.int64)
    for r in range(n + 7):
        for c in range(n):
            acc = 0
            for t in range(8):
                acc += hf[t] * _clip_fetch(ref, iy + r - 3, ix + c + t - 3)
            tmp[r, c] = acc >> shift1
    out = np.zeros((n, n), dtype=np.int64)
    for r in range(n):
        for c in range(n):
            acc = 0
            for t in range(8):
                acc += vf[t] * tmp[r + t, c]
            out[r, c] = acc
    return out


def bi_average_np(acc0: np.ndarray, acc1: np.ndarray,
                  bit_depth: int = 8) -> np.ndarray:
    """Default bi-prediction combine (clause 8.5.4.2.3.2): the two
    26-bit accumulators are first brought to 14-bit (>> 6), then
    averaged with shift 15 - bitDepth."""
    p0 = acc0 >> 6
    p1 = acc1 >> 6
    shift = 15 - bit_depth
    out = (p0 + p1 + (1 << (shift - 1))) >> shift
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


def chroma_mc_acc_np(ref, x0, y0, n, mv_x, mv_y, bit_depth=8):
    fx, fy = mv_x & 7, mv_y & 7
    ix, iy = x0 + (mv_x >> 3), y0 + (mv_y >> 3)
    hf = CHROMA_FILTERS[fx]
    vf = CHROMA_FILTERS[fy]
    shift1 = bit_depth - 8
    tmp = np.zeros((n + 3, n), dtype=np.int64)
    for r in range(n + 3):
        for c in range(n):
            acc = 0
            for t in range(4):
                acc += hf[t] * _clip_fetch(ref, iy + r - 1, ix + c + t - 1)
            tmp[r, c] = acc >> shift1
    out = np.zeros((n, n), dtype=np.int64)
    for r in range(n):
        for c in range(n):
            acc = 0
            for t in range(4):
                acc += vf[t] * tmp[r + t, c]
            out[r, c] = acc
    return out


def chroma_mc_np(ref: np.ndarray, x0: int, y0: int, n: int, mv_x: int,
                 mv_y: int, bit_depth: int = 8) -> np.ndarray:
    """Chroma MC: MV in luma quarter-pel units -> chroma eighth-pel."""
    out = chroma_mc_acc_np(ref, x0, y0, n, mv_x, mv_y, bit_depth)
    shift1 = bit_depth - 8
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


# =============================================================================
# JAX batched versions
# =============================================================================

def _gather_patches(plane: jnp.ndarray, x0s: jnp.ndarray, y0s: jnp.ndarray,
                    size: int) -> jnp.ndarray:
    """Gather (B, size, size) patches at integer positions with edge
    clamping (plane is unpadded; clamping reproduces border extension)."""
    h, w = plane.shape
    ys = jnp.clip(y0s[:, None] + jnp.arange(size)[None, :], 0, h - 1)
    xs = jnp.clip(x0s[:, None] + jnp.arange(size)[None, :], 0, w - 1)
    return plane[ys[:, :, None], xs[:, None, :]]


@lru_cache(maxsize=None)
def _filter_bank(is_luma: bool) -> np.ndarray:
    return LUMA_FILTERS if is_luma else CHROMA_FILTERS


def mc_block_batch(ref: jnp.ndarray, x0s: jnp.ndarray, y0s: jnp.ndarray,
                   mvx: jnp.ndarray, mvy: jnp.ndarray, n: int, *,
                   is_luma: bool = True, bit_depth: int = 8,
                   raw: bool = False) -> jnp.ndarray:
    """Motion-compensate B same-size blocks with per-block MVs.

    ref: (H, W) int32; x0s/y0s: (B,) block origins; mvx/mvy: (B,) MVs in
    quarter-pel (luma) units. Returns (B, n, n) int32 predictions.

    Exactness: filters |coef|<=64, samples < 2^bit_depth; horizontal
    accumulation < 2^17 (f32-exact); the vertical pass operates on
    intermediates up to ~2^17 — split into 8-bit limbs so each f32
    matmul stays exact.
    """
    taps = LUMA_TAPS if is_luma else CHROMA_TAPS
    half = taps // 2 - 1
    if is_luma:
        fx = mvx & 3
        fy = mvy & 3
        ix = x0s + (mvx >> 2)
        iy = y0s + (mvy >> 2)
    else:
        fx = mvx & 7
        fy = mvy & 7
        ix = x0s + (mvx >> 3)
        iy = y0s + (mvy >> 3)
    bank = jnp.asarray(_filter_bank(is_luma))          # (F, taps)
    hf = bank[fx]                                      # (B, taps)
    vf = bank[fy]
    size = n + taps - 1
    patches = _gather_patches(ref, ix - half, iy - half, size)  # (B,S,S)

    shift1 = bit_depth - 8
    # horizontal: tmp[b, r, c] = sum_t hf[b,t] * patch[b, r, c+t]
    cols = jnp.arange(n)[None, :] + jnp.arange(taps)[:, None]   # (taps, n)
    pt = patches[:, :, cols]                   # (B, S, taps, n)
    tmp = jnp.einsum("bstn,bt->bsn", pt.astype(jnp.float32),
                     hf.astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(jnp.int64)
    tmp = tmp >> shift1 if shift1 else tmp
    tmp = tmp.astype(jnp.int32)
    # vertical: out[b, r, c] = sum_t vf[b,t] * tmp[b, r+t, c]
    rows = jnp.arange(n)[None, :] + jnp.arange(taps)[:, None]
    tv = tmp[:, rows.T]                        # (B, n, taps, c)
    lo = tv & 255
    hi = (tv - lo) >> 8
    dot = lambda a: jnp.einsum("brtc,bt->brc", a.astype(jnp.float32),
                               vf.astype(jnp.float32),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
    out = (dot(hi) << 8) + dot(lo)
    if raw:
        return out            # 26-bit accumulator (>>6 = 14-bit pred)
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def bi_average(acc0: jnp.ndarray, acc1: jnp.ndarray,
               bit_depth: int = 8) -> jnp.ndarray:
    """Default bi-prediction combine (clause 8.5.4.2.3.2)."""
    shift = 15 - bit_depth
    out = ((acc0 >> 6) + (acc1 >> 6) + (1 << (shift - 1))) >> shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)
