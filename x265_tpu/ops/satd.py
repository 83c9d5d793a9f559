"""SATD / SA8D cost kernels (Hadamard-transformed SAD).

Reference behavior: x265 source/common/pixel.cpp (satd_4x4/satd_8x8/
sa8d_8x8 C kernels; asm in source/common/x86/pixel-a.asm). TPU-first
formulation: the Hadamard transform is two small matmuls (H @ D @ H^T),
batched over thousands of blocks at once, so the whole 35-mode intra
sweep reduces to one (B*35)-deep batch on the MXU.

Note x265's sa8d convention: sa8d_8x8 = (satd_hadamard8 + 2) >> 2,
satd_4x4-based satd = sum per 4x4 halved (>>1). We reproduce those
normalizations so costs are comparable with the reference's lambda
tables.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def hadamard(n: int) -> np.ndarray:
    if n == 1:
        return np.array([[1]], dtype=np.int32)
    h = hadamard(n // 2)
    return np.block([[h, h], [h, -h]]).astype(np.int32)


def satd4_np(a: np.ndarray, b: np.ndarray) -> int:
    """4x4 SATD, x265 normalization ((sum+1)>>1)."""
    h = hadamard(4)
    d = (a.astype(np.int64) - b.astype(np.int64))
    t = h @ d @ h.T
    return int((np.abs(t).sum() + 1) >> 1)


def sa8d_np(a: np.ndarray, b: np.ndarray) -> int:
    """8x8 SA8D, x265 normalization ((sum+2)>>2)."""
    h = hadamard(8)
    d = (a.astype(np.int64) - b.astype(np.int64))
    t = h @ d @ h.T
    return int((np.abs(t).sum() + 2) >> 2)


def sa8d_block_np(a: np.ndarray, b: np.ndarray) -> int:
    """SA8D of an NxN block (N multiple of 8) = sum of 8x8 sa8d."""
    n = a.shape[-1]
    total = 0
    for y in range(0, n, 8):
        for x in range(0, n, 8):
            total += sa8d_np(a[y:y + 8, x:x + 8], b[y:y + 8, x:x + 8])
    return total


# --- JAX batched ---------------------------------------------------------------

def _fwht_last(x: jnp.ndarray) -> jnp.ndarray:
    """Fast Walsh-Hadamard (Sylvester order) along the last axis —
    log2(n) add/sub stages on the VPU instead of batched tiny matmuls,
    which the MXU pads to 128x128 tiles at ~0.4%% utilization."""
    n = x.shape[-1]
    if n == 1:
        return x
    a = _fwht_last(x[..., : n // 2])
    b = _fwht_last(x[..., n // 2:])
    return jnp.concatenate([a + b, a - b], axis=-1)


def _hadamard_2d(d: jnp.ndarray) -> jnp.ndarray:
    """H @ D @ H^T for (..., n, n) via separable butterflies (integer)."""
    t = _fwht_last(d)
    t = _fwht_last(jnp.swapaxes(t, -1, -2))
    return jnp.swapaxes(t, -1, -2)


def satd4_batch(diff: jnp.ndarray) -> jnp.ndarray:
    """diff: (..., 4, 4) int32 -> (...,) int32 SATD (x265 norm)."""
    t = _hadamard_2d(diff.astype(jnp.int32))
    s = jnp.sum(jnp.abs(t), axis=(-2, -1))
    return (s + 1) >> 1


def sa8d_batch(diff: jnp.ndarray) -> jnp.ndarray:
    """diff: (..., 8, 8) int32 -> (...,) int32 SA8D (x265 norm)."""
    t = _hadamard_2d(diff.astype(jnp.int32))
    s = jnp.sum(jnp.abs(t), axis=(-2, -1))
    return (s + 2) >> 2


def sa8d_nxn_batch(diff: jnp.ndarray, n: int) -> jnp.ndarray:
    """diff: (..., N, N) -> (...,) sum of 8x8 SA8Ds (N multiple of 8)."""
    if n == 4:
        return satd4_batch(diff)
    if n == 8:
        return sa8d_batch(diff)
    m = n // 8
    lead = diff.shape[:-2]
    d = diff.reshape(*lead, m, 8, m, 8)
    d = jnp.swapaxes(d, -3, -2)          # (..., m, m, 8, 8)
    return jnp.sum(sa8d_batch(d), axis=(-2, -1))


# --- lanes-last variants (block batch in the trailing/lane axis) -------------

def _fwht_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Walsh-Hadamard butterflies along an arbitrary axis."""
    n = x.shape[axis]
    if n == 1:
        return x
    a = _fwht_axis(jax.lax.slice_in_dim(x, 0, n // 2, axis=axis), axis)
    b = _fwht_axis(jax.lax.slice_in_dim(x, n // 2, n, axis=axis), axis)
    return jnp.concatenate([a + b, a - b], axis=axis)


def sa8d_nxn_lanes(diff: jnp.ndarray, n: int) -> jnp.ndarray:
    """diff: (N, N, B) int32 -> (B,) SA8D/SATD with blocks in the LANE
    axis — the TPU-native layout for small-block cost sweeps (a
    (B, 8, 8) batch puts 8-wide rows in the 128-lane dimension at 6%
    occupancy; (8, 8, B) is fully dense)."""
    if n == 4:
        t = _fwht_axis(_fwht_axis(diff, 0), 1)
        return (jnp.abs(t).sum((0, 1)) + 1) >> 1
    m = n // 8
    b = diff.shape[-1]
    d = diff.reshape(m, 8, m, 8, b)
    t = _fwht_axis(_fwht_axis(d, 1), 3)
    s = (jnp.abs(t).sum((1, 3)) + 2) >> 2      # (m, m, B)
    return s.sum((0, 1)) if m > 1 else s[0, 0]
