"""HEVC integer transforms + quantization.

Numpy oracle functions (suffix `_np`) are the bit-exact references,
written from H.265 clauses 8.6.3/8.6.4 (inverse is normative) and the
HM/x265 forward formulation (reference: x265 source/common/dct.cpp —
partialButterfly* behavior, source/common/quant.cpp quant/dequant).

JAX versions are batched over TUs and keep integer exactness on the MXU
by splitting operands into 8-bit limbs: a bf16 multiply of values that
fit in 8 bits with f32 accumulation is exact, so each limb matmul is
exact and the int32 recombination reproduces the integer result.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..common.tables import (
    DCT_MATRICES, DST4, QUANT_SCALES, INV_QUANT_SCALES,
    MAX_TR_DYNAMIC_RANGE, QUANT_SHIFT, transform_shift,
)


# =============================================================================
# numpy oracles
# =============================================================================

def _rshift_round(x: np.ndarray, shift: int) -> np.ndarray:
    return (x + (1 << (shift - 1))) >> shift


def _fwd_matrix(size: int, dst: bool) -> np.ndarray:
    return DST4 if dst else DCT_MATRICES[size]


def dct_np(resi: np.ndarray, bit_depth: int = 8, dst: bool = False) -> np.ndarray:
    """Forward transform of one NxN int residual block -> int32 coeffs."""
    n = resi.shape[-1]
    log2n = n.bit_length() - 1
    t = _fwd_matrix(n, dst).astype(np.int64)
    s1 = log2n + bit_depth - 9
    s2 = log2n + 6
    x = resi.astype(np.int64)
    m1 = _rshift_round(t @ x.T, s1)            # (T @ X^T) >> s1
    m2 = _rshift_round(t @ m1.T, s2)           # (T @ M1^T) >> s2
    return m2.astype(np.int32)


def idct_np(coef: np.ndarray, bit_depth: int = 8, dst: bool = False) -> np.ndarray:
    """Normative inverse transform (clause 8.6.4) -> int residual."""
    n = coef.shape[-1]
    t = _fwd_matrix(n, dst).astype(np.int64)
    s2 = 20 - bit_depth
    c = coef.astype(np.int64)
    m1 = np.clip(_rshift_round(t.T @ c, 7), -32768, 32767)
    r = np.clip(_rshift_round(t.T @ m1.T, s2), -32768, 32767)
    return r.T.astype(np.int32)


def quant_np(coef: np.ndarray, qp: int, bit_depth: int = 8,
             intra: bool = True) -> np.ndarray:
    """Scalar quantization (encoder side, x265 quant.cpp lineage)."""
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    add = (171 if intra else 85) << (qbits - 9)
    scale = int(QUANT_SCALES[rem])
    level = (np.abs(coef.astype(np.int64)) * scale + add) >> qbits
    level = np.clip(level, 0, 32767)
    return (np.sign(coef) * level).astype(np.int32)


def dequant_np(level: np.ndarray, qp: int, bit_depth: int = 8) -> np.ndarray:
    """Normative dequantization (clause 8.6.3, flat scaling list)."""
    n = level.shape[-1]
    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    shift = bit_depth + log2n - 9
    scale = int(INV_QUANT_SCALES[rem]) << per
    v = (level.astype(np.int64) * scale + (1 << (shift - 1))) >> shift
    return np.clip(v, -32768, 32767).astype(np.int32)


# =============================================================================
# JAX batched versions
# =============================================================================

def _split_limbs(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x (int32) -> (hi, lo) with x == hi*256 + lo, lo in [0,256)."""
    lo = jnp.bitwise_and(x, 255)
    hi = jnp.right_shift(x - lo, 8)
    return hi, lo


def _exact_matmul_tx(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched integer t @ x[b] exactly, via 8-bit limb decomposition.

    t: (n, n) int32 with |t| < 128 (bf16-exact); x: (b, n, m) int32 with
    |x| < 2^16 (so hi-limb magnitude < 256 stays bf16-exact and each
    limb accumulation stays below 2^24). Returns (b, n, m) int32.

    The batch is FLATTENED into one (n, n) @ (n, b*m) dot: XLA lowers a
    batched einsum into b tiny MXU matmuls (each padded to 128x128),
    which is ~100x slower than a single wide dot.
    """
    b, n, m = x.shape
    tf = t.astype(jnp.float32)
    hi, lo = _split_limbs(x)

    def dot(a):
        wide = jnp.swapaxes(a, 0, 1).reshape(n, b * m).astype(jnp.float32)
        y = jnp.dot(tf, wide, preferred_element_type=jnp.float32)
        return jnp.swapaxes(y.reshape(n, b, m), 0, 1)

    hi_d = dot(hi).astype(jnp.int32)
    lo_d = dot(lo).astype(jnp.int32)
    return (hi_d << 8) + lo_d


def _rshift_round_j(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return (x + (1 << (shift - 1))) >> shift


def dct_batch(resi: jnp.ndarray, size: int, bit_depth: int = 8,
              dst: bool = False) -> jnp.ndarray:
    """Forward transform of (B, N, N) int32 residual blocks."""
    log2n = size.bit_length() - 1
    t = jnp.asarray(_fwd_matrix(size, dst), dtype=jnp.int32)
    s1 = log2n + bit_depth - 9
    s2 = log2n + 6
    # m1[b] = (t @ x[b]^T) >> s1 ; x^T via transposing the batch dims
    xt = jnp.swapaxes(resi, -1, -2)
    m1 = _rshift_round_j(_exact_matmul_tx(t, xt), s1)
    m2 = _rshift_round_j(_exact_matmul_tx(t, jnp.swapaxes(m1, -1, -2)), s2)
    return m2


def idct_batch(coef: jnp.ndarray, size: int, bit_depth: int = 8,
               dst: bool = False) -> jnp.ndarray:
    """Normative inverse transform of (B, N, N) int32 coeff blocks."""
    t = jnp.asarray(_fwd_matrix(size, dst).T.copy(), dtype=jnp.int32)
    s2 = 20 - bit_depth
    m1 = jnp.clip(_rshift_round_j(_exact_matmul_tx(t, coef), 7), -32768, 32767)
    r = jnp.clip(_rshift_round_j(
        _exact_matmul_tx(t, jnp.swapaxes(m1, -1, -2)), s2), -32768, 32767)
    return jnp.swapaxes(r, -1, -2)


def quant_batch(coef: jnp.ndarray, size: int, qp, bit_depth: int = 8,
                intra: bool = True) -> jnp.ndarray:
    """Quantize (B, N, N) int32 coeffs. size is static; qp may be a
    python int or a traced scalar (per-frame rate control)."""
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    add = jnp.left_shift(jnp.int32(171 if intra else 85), qbits - 9)
    scale = jnp.take(jnp.asarray(QUANT_SCALES), rem)
    # abs(coef) <= 32767, scale <= 26214 -> product < 2^31: int32 safe
    a = jnp.abs(coef)
    level = jnp.right_shift(a * scale + add, qbits)
    level = jnp.clip(level, 0, 32767)
    return jnp.sign(coef) * level


def dequant_batch(level: jnp.ndarray, size: int, qp,
                  bit_depth: int = 8) -> jnp.ndarray:
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    per, rem = qp // 6, qp % 6
    shift = bit_depth + log2n - 9
    scale = jnp.left_shift(jnp.take(jnp.asarray(INV_QUANT_SCALES), rem), per)
    v = (level * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(v, -32768, 32767)
