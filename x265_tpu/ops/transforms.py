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

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..common.tables import (
    DCT_MATRICES, DST4, QUANT_SCALES, INV_QUANT_SCALES,
    MAX_TR_DYNAMIC_RANGE, QUANT_SHIFT, scan_order, transform_shift,
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
             intra: bool = True, with_rem: bool = False):
    """Scalar quantization (encoder side, x265 quant.cpp lineage).
    with_rem additionally returns the sub-step rounding remainder
    deltaU (x265 quant.cpp:230), used by sign-bit hiding to pick the
    cheapest parity adjustment."""
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    add = (171 if intra else 85) << (qbits - 9)
    scale = int(QUANT_SCALES[rem])
    a = np.abs(coef.astype(np.int64)) * scale
    level = (a + add) >> qbits
    level = np.clip(level, 0, 32767)
    out = (np.sign(coef) * level).astype(np.int32)
    if not with_rem:
        return out
    # signed remainder vs the chosen level, WITHOUT the rounding offset
    # (HM/x265 deltaU): >0 means the true value is above level*step
    # (raising is good), <0 means rounding overshot (lowering is good)
    delta_u = ((a - (level << qbits)) >> (qbits - 8)).astype(np.int32)
    return out, delta_u


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
    # bf16 operands are exact here (|t| < 128, limbs in [-256, 255],
    # both <= 2^8; MXU accumulates in f32 and every partial sum stays
    # below 32*127*256 < 2^24) and run at 4x the f32 MXU rate
    tf = t.astype(jnp.bfloat16)
    hi, lo = _split_limbs(x)

    def dot(a):
        wide = jnp.swapaxes(a, 0, 1).reshape(n, b * m) \
            .astype(jnp.bfloat16)
        y = jnp.dot(tf, wide, preferred_element_type=jnp.float32)
        return jnp.swapaxes(y.reshape(n, b, m), 0, 1)

    hi_d = dot(hi).astype(jnp.int32)
    lo_d = dot(lo).astype(jnp.int32)
    return (hi_d << 8) + lo_d


def _rshift_round_j(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return (x + (1 << (shift - 1))) >> shift


# =============================================================================
# lanes-layout variants: blocks live as (N, N, B) with the batch in the
# 128-lane axis. The block-major (B, N, N) forms put an 8..32-wide
# minor dim in the lanes (6-25% occupancy) and need a wide transpose
# around every matmul stage; these contract sublane axes directly with
# dot_general and keep every elementwise stage fully lane-dense.
# =============================================================================

def _exact_dot_axis(t: jnp.ndarray, x: jnp.ndarray,
                    axis: int) -> jnp.ndarray:
    """Exact integer t @ x contracting x's `axis`, bf16 limbs on the
    MXU (same exactness envelope as _exact_matmul_tx). Output dims:
    (t.rows,) + x dims with `axis` removed."""
    tb = t.astype(jnp.bfloat16)
    hi, lo = _split_limbs(x)

    def dot(a):
        return jax.lax.dot_general(
            tb, a.astype(jnp.bfloat16), (((1,), (axis,)), ((), ())),
            preferred_element_type=jnp.float32)

    return (dot(hi).astype(jnp.int32) << 8) + dot(lo).astype(jnp.int32)


def dct_lanes(resi: jnp.ndarray, size: int, bit_depth: int = 8,
              dst: bool = False, lowpass: bool = False) -> jnp.ndarray:
    """Forward transform of (N, N, B) lanes blocks -> (N, N, B) coeffs
    ([row, col] = [vertical, horizontal] frequency, matching
    dct_batch's block order).

    lowpass (x265 --lowpass-dct, lowpassdct.cpp): for N >= 8,
    approximate the transform with a half-size DCT of the 2x2-averaged
    residual placed in the low band (high bands zero), DC replaced by
    the scaled whole-block sum. Encoder-side only — the emitted
    coefficients decode through the normative inverse transform."""
    log2n = size.bit_length() - 1
    if lowpass and size >= 8:
        r = resi.astype(jnp.int32)
        s2x2 = r[0::2, 0::2] + r[0::2, 1::2] + r[1::2, 0::2] + \
            r[1::2, 1::2]
        half = dct_lanes(s2x2 >> 2, size // 2, bit_depth)
        total = r.sum(axis=(0, 1))
        # DC = block sum scaled to the full-size DCT's DC domain
        # (lowpassdct.cpp: <<1 / >>1 / >>3 for N=8/16/32 at 8-bit)
        exp = 7 - 2 * log2n - (bit_depth - 8)
        dc = jnp.left_shift(total, exp) if exp >= 0 else \
            jnp.right_shift(total, -exp)
        out = jnp.zeros(resi.shape, jnp.int32)
        out = out.at[:size // 2, :size // 2].set(half)
        out = out.at[0, 0].set(dc)
        return out
    t = jnp.asarray(_fwd_matrix(size, dst), dtype=jnp.int32)
    s1 = log2n + bit_depth - 9
    s2 = log2n + 6
    m1 = _rshift_round_j(_exact_dot_axis(t, resi, 1), s1)   # (i, r, B)
    m2 = _rshift_round_j(_exact_dot_axis(t, m1, 1), s2)     # (u, i, B)
    return m2


def idct_lanes(coef: jnp.ndarray, size: int, bit_depth: int = 8,
               dst: bool = False) -> jnp.ndarray:
    """Inverse transform of (N, N, B) lanes coeff blocks."""
    t = jnp.asarray(_fwd_matrix(size, dst).T.copy(), dtype=jnp.int32)
    s2 = 20 - bit_depth
    m1 = jnp.clip(_rshift_round_j(_exact_dot_axis(t, coef, 0), 7),
                  -32768, 32767)                            # (k, i, B)
    r = jnp.clip(_rshift_round_j(_exact_dot_axis(t, m1, 1), s2),
                 -32768, 32767)                             # (j, k, B)
    return jnp.swapaxes(r, 0, 1)                            # (k, j, B)


def quant_lanes(coef: jnp.ndarray, size: int, qp, bit_depth: int = 8,
                intra: bool = True, with_rem: bool = False):
    """quant_batch for (N, N, B) lanes blocks; (B,) qp broadcasts over
    the lane axis."""
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if qp.ndim == 1:
        qp = qp[None, None, :]
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    add = jnp.left_shift(jnp.int32(171 if intra else 85), qbits - 9)
    scale = jnp.take(jnp.asarray(QUANT_SCALES), rem)
    a = jnp.abs(coef) * scale
    level = jnp.right_shift(a + add, qbits)
    level = jnp.clip(level, 0, 32767)
    out = jnp.sign(coef) * level
    if not with_rem:
        return out
    delta_u = jnp.right_shift(a - jnp.left_shift(level, qbits),
                              qbits - 8)
    return out, delta_u


def dequant_lanes(level: jnp.ndarray, size: int, qp,
                  bit_depth: int = 8) -> jnp.ndarray:
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if qp.ndim == 1:
        qp = qp[None, None, :]
    per, rem = qp // 6, qp % 6
    shift = bit_depth + log2n - 9
    scale = jnp.left_shift(jnp.take(jnp.asarray(INV_QUANT_SCALES), rem),
                           per)
    v = (level * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(v, -32768, 32767)


def sign_hide_lanes(coefs: jnp.ndarray, size: int, scan_sel: int,
                    delta_u: jnp.ndarray) -> jnp.ndarray:
    """sign_hide_batch for (N, N, B) lanes blocks (uniform scan only —
    the fused P path always codes inter TUs in diag scan)."""
    assert isinstance(scan_sel, int)
    n = size
    b = coefs.shape[-1]
    ncgs = max(n // 4, 1)

    def to_cg(a):
        return a.reshape(ncgs, 4, ncgs, 4, b).transpose(0, 2, 1, 3, 4) \
            .reshape(ncgs * ncgs, 16, b)

    lv = to_cg(coefs)
    du = to_cg(delta_u)
    rank = jnp.asarray(_cg_rank(scan_sel))[None, :, None]   # (1, 16, 1)
    nzm = lv != 0
    first = jnp.min(jnp.where(nzm, rank, 16), axis=1)       # (ncg2, B)
    last = jnp.max(jnp.where(nzm, rank, -1), axis=1)
    hidden = (last - first) > 3
    sumabs = jnp.abs(lv).sum(1)
    firstval = jnp.sum(jnp.where(rank == first[:, None], lv, 0), axis=1)
    neg = (firstval < 0).astype(jnp.int32)
    fix = hidden & ((sumabs & 1) != neg)

    big = jnp.int32(1 << 24)
    is_end = (rank == first[:, None]) | (rank == last[:, None])
    can_lower = nzm & (jnp.abs(lv) < 32768) & \
        ((jnp.abs(lv) >= 2) | ~is_end)
    can_raise = nzm & (jnp.abs(lv) < 32767)
    lower_cost = jnp.where(can_lower, du, big)
    raise_cost = jnp.where(can_raise, -du, big)
    key_l = lower_cost * 64 + rank
    key_r = raise_cost * 64 + 32 + rank
    kmin = jnp.minimum(key_l.min(1), key_r.min(1))          # (ncg2, B)
    sel_l = key_l == kmin[:, None]
    sel_r = key_r == kmin[:, None]
    sel = sel_l | sel_r
    tgt = jnp.sum(jnp.where(sel, lv, 0), axis=1)
    d = jnp.sum(jnp.where(sel_l, -1, jnp.where(sel_r, 1, 0)), axis=1)
    newv = tgt + jnp.where(tgt > 0, d, -d)
    lv = jnp.where(fix[:, None] & sel, newv[:, None], lv)
    return lv.reshape(ncgs, ncgs, 4, 4, b).transpose(0, 2, 1, 3, 4) \
        .reshape(n, n, b)


def rdoq_lanes(tcoef: jnp.ndarray, size: int, qp, lam2: float,
               bit_depth: int = 8, with_rem: bool = False):
    """rdoq_batch for (N, N, B) lanes blocks."""
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if qp.ndim == 1:
        qp = qp[None, None, :]
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    scale = jnp.take(jnp.asarray(QUANT_SCALES), rem)
    a = jnp.abs(tcoef) * scale
    l_up = jnp.clip(jnp.right_shift(a + jnp.left_shift(1, qbits - 1),
                                    qbits), 0, 32767)

    af = a.astype(jnp.float32)
    step = jnp.exp2(qbits.astype(jnp.float32))
    tgain = jnp.exp2(jnp.float32(2 * (15 - bit_depth - log2n)))
    norm = scale.astype(jnp.float32) ** 2 * tgain

    def dist(lq):
        e = af - lq.astype(jnp.float32) * step
        return e * e / norm

    def bits_of(lq):
        return jnp.where(lq > 0,
                         2.0 + 2.0 * _bitlen_j(lq).astype(jnp.float32),
                         0.0)

    cand = [jnp.zeros_like(l_up), jnp.maximum(l_up - 1, 0), l_up]
    costs = [dist(c) + lam2 * bits_of(c) for c in cand]
    best = jnp.argmin(jnp.stack(costs), axis=0)
    newlv = jnp.where(best == 0, 0,
                      jnp.where(best == 1, jnp.maximum(l_up - 1, 0),
                                l_up))

    d_gain = dist(jnp.zeros_like(newlv)) - dist(newlv)
    r_gain = bits_of(newlv)
    if size > 4:
        g = size // 4
        b = newlv.shape[-1]

        def by_cg(x):
            return x.reshape(g, 4, g, 4, b).sum(axis=(1, 3))

        dd, rr = by_cg(d_gain), by_cg(r_gain)
        kill = (dd <= lam2 * (rr + 2.0)) & (rr > 0)
        kill = jnp.repeat(jnp.repeat(kill, 4, axis=0), 4, axis=1)
        newlv = jnp.where(kill, 0, newlv)
        d_gain = jnp.where(kill, 0.0, d_gain)
        r_gain = jnp.where(kill, 0.0, r_gain)

    dd_tu = d_gain.sum(axis=(0, 1))
    rr_tu = r_gain.sum(axis=(0, 1))
    kill_tu = (dd_tu <= lam2 * (rr_tu + 2.0)) & (rr_tu > 0)
    newlv = jnp.where(kill_tu[None, None, :], 0, newlv)
    out = jnp.sign(tcoef) * newlv
    if not with_rem:
        return out
    delta_u = jnp.right_shift(a - jnp.left_shift(newlv, qbits),
                              qbits - 8)
    return out, delta_u


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
                intra: bool = True, with_rem: bool = False):
    """Quantize (B, N, N) int32 coeffs. size is static; qp may be a
    python int, a traced scalar (per-frame rate control), or a (B,)
    vector (per-CU dQP from AQ/cuTree). with_rem additionally returns
    the deltaU rounding remainders."""
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if qp.ndim == 1:
        qp = qp[:, None, None]     # broadcast per-block over (B, N, N)
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    add = jnp.left_shift(jnp.int32(171 if intra else 85), qbits - 9)
    scale = jnp.take(jnp.asarray(QUANT_SCALES), rem)
    # abs(coef) <= 32767, scale <= 26214 -> product < 2^31: int32 safe
    a = jnp.abs(coef) * scale
    level = jnp.right_shift(a + add, qbits)
    level = jnp.clip(level, 0, 32767)
    out = jnp.sign(coef) * level
    if not with_rem:
        return out
    # signed remainder WITHOUT the rounding offset (HM/x265 deltaU)
    delta_u = jnp.right_shift(a - jnp.left_shift(level, qbits),
                              qbits - 8)
    return out, delta_u


# =============================================================================
# sign-bit hiding (encoder-side parity enforcement; x265 quant.cpp:247
# signBitHidingHDQ behavior, decoder rule clause 7.4.9.11/9.3.4.3)
# =============================================================================

@lru_cache(maxsize=None)
def _cg_perm(scan_idx: int) -> np.ndarray:
    """Raster position (0..15) per within-CG scan position."""
    xy = scan_order(scan_idx, 2)
    return (xy[:, 1] * 4 + xy[:, 0]).astype(np.int32)


def sign_hide_np(blk: np.ndarray, scan_idx: int,
                 delta_u: np.ndarray) -> np.ndarray:
    """Enforce the hidden-sign parity on one quantized NxN block: in
    every 4x4 CG where lastSigScanPos - firstSigScanPos > 3, the sign
    of the coefficient at firstSigScanPos is inferred by the decoder
    from sum-of-abs-levels parity. When the parity disagrees, adjust
    one |level| by +-1, choosing the position/direction with minimal
    rounding-error cost from the quant remainders (x265
    signBitHidingHDQ, quant.cpp:247): lowering costs deltaU, raising
    costs -deltaU. Levels of 1 at the first/last significant position
    may not be lowered (that would move the inferred position)."""
    n = blk.shape[-1]
    out = blk.copy()
    perm = _cg_perm(scan_idx)
    for cy in range(max(n // 4, 1)):
        for cx in range(max(n // 4, 1)):
            sl = (slice(cy * 4, cy * 4 + 4), slice(cx * 4, cx * 4 + 4))
            cg = out[sl].reshape(-1)
            lv = cg[perm].copy()
            du = delta_u[sl].reshape(-1)[perm]
            nz = np.nonzero(lv)[0]
            if len(nz) == 0 or nz[-1] - nz[0] <= 3:
                continue
            first, last = nz[0], nz[-1]
            neg = 1 if lv[first] < 0 else 0
            if (int(np.abs(lv).sum()) & 1) == neg:
                continue
            big = 1 << 30
            sig = lv != 0
            can_lower = sig & (np.abs(lv) < 32768) & \
                ((np.abs(lv) >= 2) |
                 ((np.arange(16) != first) & (np.arange(16) != last)))
            can_raise = sig & (np.abs(lv) < 32767)
            lower_cost = np.where(can_lower, du, big)
            raise_cost = np.where(can_raise, -du, big)
            costs = np.concatenate([lower_cost, raise_cost])
            k = int(np.argmin(costs))
            pos, d = (k, -1) if k < 16 else (k - 16, 1)
            lv[pos] += d if lv[pos] > 0 else -d
            cg[perm] = lv
            out[sl] = cg.reshape(4, 4)
    return out


@lru_cache(maxsize=None)
def _cg_rank(scan_idx: int) -> np.ndarray:
    """Scan position (0..15) per raster position — inverse of _cg_perm."""
    return np.argsort(_cg_perm(scan_idx)).astype(np.int32)


def sign_hide_batch(coefs: jnp.ndarray, size: int, scan_sel,
                    delta_u: jnp.ndarray) -> jnp.ndarray:
    """Batched sign-hiding parity fix (see sign_hide_np). coefs /
    delta_u: (B, N, N); scan_sel: per-block scan index (B,) int32 in
    {0, 1, 2} (traced) or a python int for a uniform scan.

    Rank formulation: everything stays in RASTER order; the scan enters
    only as a per-position rank constant, so there is no per-block
    permutation gather or argsort (those dominated the P-frame quant
    stage at ~25 ms/frame on TPU)."""
    b = coefs.shape[0]
    n = size
    ncgs = max(n // 4, 1)

    def to_cg(a):
        return a.reshape(b, ncgs, 4, ncgs, 4).transpose(0, 1, 3, 2, 4) \
            .reshape(b, ncgs * ncgs, 16)

    lv = to_cg(coefs)                         # raster order within CG
    du = to_cg(delta_u)
    ranks = jnp.asarray(np.stack([_cg_rank(s) for s in range(3)]))
    if isinstance(scan_sel, int):
        rank = jnp.broadcast_to(ranks[scan_sel], (b, 16))[:, None, :]
    else:
        rank = ranks[scan_sel][:, None, :]    # (B, 1, 16)
    nzm = lv != 0
    first = jnp.min(jnp.where(nzm, rank, 16), axis=-1)   # min scan rank
    last = jnp.max(jnp.where(nzm, rank, -1), axis=-1)
    hidden = (last - first) > 3
    sumabs = jnp.abs(lv).sum(-1)
    firstval = jnp.sum(jnp.where(rank == first[..., None], lv, 0),
                       axis=-1)
    neg = (firstval < 0).astype(jnp.int32)
    fix = hidden & ((sumabs & 1) != neg)

    # |deltaU| < 256, so costs fit in 9 bits signed; pack
    # (cost, lower-before-raise, scan rank) into one lexicographic key
    # so equal-cost ties resolve exactly like the scan-ordered oracle
    # (sign_hide_np / x265 quant.cpp:316 minPos scan)
    big = jnp.int32(1 << 24)
    is_end = (rank == first[..., None]) | (rank == last[..., None])
    can_lower = nzm & (jnp.abs(lv) < 32768) & \
        ((jnp.abs(lv) >= 2) | ~is_end)
    can_raise = nzm & (jnp.abs(lv) < 32767)
    lower_cost = jnp.where(can_lower, du, big)
    raise_cost = jnp.where(can_raise, -du, big)
    key_l = lower_cost * 64 + rank
    key_r = raise_cost * 64 + 32 + rank
    kmin = jnp.minimum(key_l.min(-1), key_r.min(-1))   # (B, ncg*ncg)
    sel_l = key_l == kmin[..., None]
    sel_r = key_r == kmin[..., None]    # disjoint: keys are unique
    sel = sel_l | sel_r
    tgt = jnp.sum(jnp.where(sel, lv, 0), axis=-1)
    d = jnp.sum(jnp.where(sel_l, -1, jnp.where(sel_r, 1, 0)), axis=-1)
    newv = tgt + jnp.where(tgt > 0, d, -d)
    lv = jnp.where(fix[..., None] & sel, newv[..., None], lv)
    return lv.reshape(b, ncgs, ncgs, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(b, n, n)


def dequant_batch(level: jnp.ndarray, size: int, qp,
                  bit_depth: int = 8) -> jnp.ndarray:
    """Dequantize; qp may be a scalar or a (B,) per-block vector."""
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if qp.ndim == 1:
        qp = qp[:, None, None]
    per, rem = qp // 6, qp % 6
    shift = bit_depth + log2n - 9
    scale = jnp.left_shift(jnp.take(jnp.asarray(INV_QUANT_SCALES), rem), per)
    v = (level * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(v, -32768, 32767)


# =============================================================================
# RDOQ-lite: batched rate-distortion optimized quantization
# (the vectorizable core of x265 rdoQuant, quant.cpp:610-1425). The
# key behavior replicated: RDOQ quantizes WITHOUT the dead zone
# (round-half) and then decides {level, level-1, 0} per coefficient by
# lambda2-scaled cost, so marginal coefficients the dead zone would
# drop are KEPT when their distortion saving is worth the bits — plus
# group (coded_sub_block_flag) and TU (cbf) zeroing. The sequential
# context trellis is replaced by static-context bit estimates, which
# keeps the whole TU batch one tensor op.
# =============================================================================

def _bitlen_j(a: jnp.ndarray) -> jnp.ndarray:
    f = a.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
    return jnp.where(a > 0, e + 1, 0)


def rdoq_batch(tcoef: jnp.ndarray, size: int, qp, lam2: float,
               bit_depth: int = 8,
               with_rem: bool = False):
    """RD-quantize (B, N, N) transform coefficients directly (replaces
    quant_batch when RDOQ is on). qp scalar or (B,) vector.

    Distortion is measured in the levelDouble domain (|coef|*scale)
    and normalized to pixel SSE via the transform gain
    2^(15 - bitDepth - log2N) and the quant scale (the rdoq errScale
    analog), so lambda2 applies directly. with_rem additionally
    returns deltaU remainders for sign-bit hiding."""
    log2n = size.bit_length() - 1
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if qp.ndim == 1:
        qp = qp[:, None, None]
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    scale = jnp.take(jnp.asarray(QUANT_SCALES), rem)
    a = jnp.abs(tcoef) * scale                          # levelDouble, i32
    # round-half quantization (f = 0.5; no dead zone): the RD decision
    # below replaces the heuristic rounding bias
    l_up = jnp.clip(jnp.right_shift(a + jnp.left_shift(1, qbits - 1),
                                    qbits), 0, 32767)

    af = a.astype(jnp.float32)
    step = jnp.exp2(qbits.astype(jnp.float32))
    tgain = jnp.exp2(jnp.float32(2 * (15 - bit_depth - log2n)))
    norm = scale.astype(jnp.float32) ** 2 * tgain

    def dist(lq):
        e = af - lq.astype(jnp.float32) * step
        return e * e / norm

    # static-context bit estimate: sig + greater1/2 + sign + golomb
    def bits_of(lq):
        return jnp.where(lq > 0,
                         2.0 + 2.0 * _bitlen_j(lq).astype(jnp.float32),
                         0.0)

    cand = [jnp.zeros_like(l_up), jnp.maximum(l_up - 1, 0), l_up]
    costs = [dist(c) + lam2 * bits_of(c) for c in cand]
    best = jnp.argmin(jnp.stack(costs), axis=0)
    newlv = jnp.where(best == 0, 0,
                      jnp.where(best == 1, jnp.maximum(l_up - 1, 0),
                                l_up))

    # --- CG-level pass (coded_sub_block_flag, quant.cpp:1140): zero a
    # whole 4x4 group when its levels + the sub-block flag cost more
    # than the distortion of dropping them
    d_gain = dist(jnp.zeros_like(newlv)) - dist(newlv)
    r_gain = bits_of(newlv)
    if size > 4:
        g = size // 4
        b = newlv.shape[0]

        def by_cg(x):
            return x.reshape(b, g, 4, g, 4).sum(axis=(2, 4))

        dd, rr = by_cg(d_gain), by_cg(r_gain)
        kill = (dd <= lam2 * (rr + 2.0)) & (rr > 0)
        kill = jnp.repeat(jnp.repeat(kill, 4, axis=1), 4, axis=2)
        newlv = jnp.where(kill, 0, newlv)
        d_gain = jnp.where(kill, 0.0, d_gain)
        r_gain = jnp.where(kill, 0.0, r_gain)

    # --- TU-level pass (cbf + last-position savings)
    dd_tu = d_gain.sum(axis=(1, 2))
    rr_tu = r_gain.sum(axis=(1, 2))
    kill_tu = (dd_tu <= lam2 * (rr_tu + 2.0)) & (rr_tu > 0)
    newlv = jnp.where(kill_tu[:, None, None], 0, newlv)
    out = jnp.sign(tcoef) * newlv
    if not with_rem:
        return out
    delta_u = jnp.right_shift(a - jnp.left_shift(newlv, qbits),
                              qbits - 8)
    return out, delta_u
