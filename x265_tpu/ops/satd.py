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
#
# The Hadamard stages run as f32 dot_generals on the MXU: H entries are
# +-1 so every product is exact, |H8 @ D @ H8| <= 2^17 and the 64-term
# abs-sum <= 2^23 — all below f32's 2^24 integer-exact range (2^10
# input diffs, i.e. up to 10-bit video). The earlier VPU butterfly
# recursion (concat of slice halves over tiny sublane axes) forced
# T(1,128) layouts and cost ~7 ms/frame in the P scan; the dot form
# streams at MXU rate.

@lru_cache(maxsize=None)
def _sa8d_kron_np(n: int) -> np.ndarray:
    """The whole 2-D Hadamard as ONE matrix over raster-flattened
    blocks: rows = (subblock, u*8+v) outputs, cols = n*n pixels. For
    n>8 the per-8x8-subblock structure is baked in, so a single
    (64*m^2, n^2) @ (n^2, B) matmul transforms every subblock of every
    block — K and M are MXU-sized instead of K=8."""
    if n == 4:
        h = hadamard(4)
        return np.kron(h, h).astype(np.float32)
    h = hadamard(8)
    hh = np.kron(h, h)                       # (u*8+v, i*8+j)
    m = n // 8
    k = np.zeros((m * m * 64, n * n), np.float32)
    for sy in range(m):
        for sx in range(m):
            r0 = (sy * m + sx) * 64
            for i in range(8):
                for j in range(8):
                    col = (sy * 8 + i) * n + (sx * 8 + j)
                    k[r0:r0 + 64, col] = hh[:, i * 8 + j]
    return k


def _sa8d_kron(n: int) -> jnp.ndarray:
    return jnp.asarray(_sa8d_kron_np(n))


def satd4_batch(diff: jnp.ndarray) -> jnp.ndarray:
    """diff: (..., 4, 4) int32 -> (...,) int32 SATD (x265 norm)."""
    lead = diff.shape[:-2]
    flat = diff.reshape(-1, 16)
    t = jax.lax.dot_general(_sa8d_kron(4), flat.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.sum(jnp.abs(t), axis=0).astype(jnp.int32)
    return ((s + 1) >> 1).reshape(lead)


def sa8d_batch(diff: jnp.ndarray) -> jnp.ndarray:
    """diff: (..., 8, 8) int32 -> (...,) int32 SA8D (x265 norm)."""
    lead = diff.shape[:-2]
    flat = diff.reshape(-1, 64)
    t = jax.lax.dot_general(_sa8d_kron(8), flat.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.sum(jnp.abs(t), axis=0).astype(jnp.int32)
    return ((s + 2) >> 2).reshape(lead)


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

def sa8d_nxn_lanes(diff: jnp.ndarray, n: int) -> jnp.ndarray:
    """diff: (N, N, B) int32 -> (B,) SA8D/SATD with blocks in the LANE
    axis — the TPU-native layout for small-block cost sweeps. ONE
    (64*m^2, n^2) @ (n^2, B) MXU matmul does every Hadamard of every
    subblock (f32 is exact: inputs <= 2^10, 64-term +-1 sums <= 2^17,
    abs-sums <= 2^23 < 2^24)."""
    b = diff.shape[-1]
    flat = diff.reshape(n * n, b).astype(jnp.float32)
    t = jnp.dot(_sa8d_kron(n), flat,
                preferred_element_type=jnp.float32)
    if n == 4:
        s = jnp.abs(t).sum(0).astype(jnp.int32)
        return (s + 1) >> 1
    m2 = (n // 8) ** 2
    if m2 == 1:
        s = jnp.abs(t).sum(0).astype(jnp.int32)
        return (s + 2) >> 2
    s = jnp.abs(t).reshape(m2, 64, b).sum(1).astype(jnp.int32)
    return ((s + 2) >> 2).sum(0)
