"""Batched intra mode + depth decision (the TPU analysis pass).

TPU-first recast of x265's recursive compressIntraCU (reference:
source/encoder/analysis.cpp:514, search.cpp estIntraPredQT:1509): instead
of walking a quadtree per CTU and pruning candidate modes, evaluate ALL
35 modes for ALL blocks of every CU size densely on the MXU, then pick
depths bottom-up by cost comparison. Decisions use original-pixel
references (like x265's rd-level<=4 sa8d decisions); the conformant
reconstruction pass re-predicts from decoded samples.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..common.tables import lambda_from_qp, lambda2_from_qp
from ..ops.intra import intra_pred_all_modes
from ..ops.satd import sa8d_nxn_batch

# approximate signalling cost (bits) per mode: MPM-favoured modes cheap
_MODE_BITS = np.full(35, 6.0)
_MODE_BITS[[0, 1, 10, 26]] = 2.0

# SATD-preselected candidate modes carried into the full-RD stage (the
# x265 intraModeNumFast analog, search.cpp:2048: medium keeps the SATD
# top list short and RD-checks only those)
_RD_K = 3


def extract_blocks(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """(H, W) -> (B, n, n) raster-ordered non-overlapping blocks."""
    h, w = plane.shape
    by, bx = h // n, w // n
    return plane.reshape(by, n, bx, n).transpose(0, 2, 1, 3).reshape(-1, n, n)


def gather_refs_orig(plane: np.ndarray, n: int) -> np.ndarray:
    """Canonical refs R[0..4n] for every n-block, from original pixels.

    Availability here is simply 'inside the picture' — this feeds the
    non-normative analysis pass only. Vectorized substitution = forward
    fill over the canonical axis. Returns (B, 4n+1) int32.
    """
    h, w = plane.shape
    by, bx = h // n, w // n
    x0 = (np.arange(bx) * n)[None, :, None]       # (1, bx, 1)
    y0 = (np.arange(by) * n)[:, None, None]       # (by, 1, 1)
    i = np.arange(4 * n + 1)[None, None, :]       # canonical index
    # positions per canonical index
    left = i < 2 * n
    corner = i == 2 * n
    xs = np.where(left, x0 - 1, np.where(corner, x0 - 1, x0 + (i - 2 * n - 1)))
    ys = np.where(left, y0 + (2 * n - 1 - i), np.where(corner, y0 - 1, y0 - 1))
    avail = (xs >= 0) & (ys >= 0) & (xs < w) & (ys < h)
    vals = plane[np.clip(ys, 0, h - 1), np.clip(xs, 0, w - 1)].astype(np.int64)
    vals = np.where(avail, vals, 0)
    # forward fill (substitution, clause 8.4.4.2.2 analog)
    idx = np.where(avail, i, -1)
    filled_idx = np.maximum.accumulate(idx, axis=-1)
    any_avail = avail.any(axis=-1, keepdims=True)
    first = np.argmax(avail, axis=-1)
    first_val = np.take_along_axis(vals, first[..., None], axis=-1)
    out = np.take_along_axis(vals, np.clip(filled_idx, 0, 4 * n), axis=-1)
    out = np.where(filled_idx >= 0, out, first_val)
    out = np.where(any_avail, out, 128)
    return out.reshape(by * bx, 4 * n + 1).astype(np.int32)


@partial(jax.jit, static_argnames=("n", "bit_depth"))
def _mode_costs(blocks: jnp.ndarray, refs: jnp.ndarray, n: int,
                lam_bits: jnp.ndarray, bit_depth: int = 8) -> tuple[jnp.ndarray,
                                                                    jnp.ndarray]:
    """SATD + lambda*bits over all 35 modes. Returns (best_mode, best_cost)."""
    preds = intra_pred_all_modes(refs, n, is_luma=True, bit_depth=bit_depth)
    diff = preds - blocks[:, None, :, :]
    costs = sa8d_nxn_batch(diff, n)                 # (B, 35)
    costs = costs + lam_bits[None, :].astype(jnp.int32)
    best = jnp.argmin(costs, axis=1)
    return best.astype(jnp.int32), jnp.min(costs, axis=1)


@lru_cache(maxsize=None)
def _ref_index_tables(h: int, w: int, n: int):
    """Static gather indices + availability for gather_refs_device."""
    by, bx = h // n, w // n
    x0 = (np.arange(bx) * n)[None, :, None]
    y0 = (np.arange(by) * n)[:, None, None]
    i = np.arange(4 * n + 1)[None, None, :]
    left = i < 2 * n
    corner = i == 2 * n
    xs = np.where(left, x0 - 1, np.where(corner, x0 - 1, x0 + (i - 2 * n - 1)))
    ys = np.where(left, y0 + (2 * n - 1 - i), np.where(corner, y0 - 1, y0 - 1))
    avail = (xs >= 0) & (ys >= 0) & (xs < w) & (ys < h)
    flat = (np.clip(ys, 0, h - 1) * w + np.clip(xs, 0, w - 1))
    return (flat.reshape(by * bx, -1).astype(np.int32),
            avail.reshape(by * bx, -1))


def gather_refs_device(plane: jnp.ndarray, n: int,
                       bit_depth: int = 8) -> jnp.ndarray:
    """Device version of gather_refs_orig: (H, W) -> (B, 4n+1) int32."""
    h, w = plane.shape
    flat_idx, avail_np = _ref_index_tables(h, w, n)
    vals = jnp.take(plane.reshape(-1), jnp.asarray(flat_idx))
    avail = jnp.asarray(avail_np)
    k = 4 * n + 1
    iota = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    idx = jnp.where(avail, iota, -1)
    filled = jax.lax.cummax(idx, axis=1)
    first = jnp.argmax(avail, axis=1)
    firstval = jnp.take_along_axis(vals, first[:, None], axis=1)
    out = jnp.take_along_axis(vals, jnp.clip(filled, 0, k - 1), axis=1)
    out = jnp.where(filled >= 0, out, firstval)
    any_avail = jnp.any(avail, axis=1, keepdims=True)
    return jnp.where(any_avail, out, 1 << (bit_depth - 1)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n", "bit_depth"))
def analyze_size_device(plane: jnp.ndarray, n: int, lam_bits: jnp.ndarray,
                        bit_depth: int = 8):
    """Fully on-device mode decision for one CU size over the frame."""
    blocks = extract_blocks(plane, n)
    refs = gather_refs_device(plane, n, bit_depth)
    preds = intra_pred_all_modes(refs, n, is_luma=True, bit_depth=bit_depth)
    diff = preds - blocks[:, None, :, :]
    costs = sa8d_nxn_batch(diff, n) + lam_bits[None, :].astype(jnp.int32)
    return jnp.argmin(costs, axis=1).astype(jnp.int32), jnp.min(costs, axis=1)


def _bitlen_f(a: jnp.ndarray) -> jnp.ndarray:
    """Integer bit length via the float32 exponent (exact < 2^24)."""
    f = a.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
    return jnp.where(a > 0, e + 1, 0)


def _rd_mode_size(plane: jnp.ndarray, n: int, qp_j: jnp.ndarray,
                  lam_bits: jnp.ndarray, lam2: jnp.ndarray,
                  abc: jnp.ndarray, mode_bits: jnp.ndarray,
                  bit_depth: int):
    """Full-RD intra mode decision for one CU/TU size over the frame:
    SATD over all 35 modes preselects _RD_K candidates per block, each
    candidate is then actually transformed/quantized/reconstructed and
    priced as recon SSE + lambda2 * (coefficient-bits proxy + mode
    bits) — the estIntraPredQT discipline (search.cpp:2048,1509) recast
    as a dense batch. Returns (best_mode (B,), rd_cost (B,) f32)."""
    from ..ops.transforms import (dct_batch, dequant_batch, idct_batch,
                                  quant_batch)
    blocks = extract_blocks(plane, n)
    refs = gather_refs_device(plane, n, bit_depth)
    preds = intra_pred_all_modes(refs, n, is_luma=True,
                                 bit_depth=bit_depth)     # (B, 35, n, n)
    b = blocks.shape[0]
    satd = sa8d_nxn_batch(preds - blocks[:, None], n) + \
        lam_bits[None, :].astype(jnp.int32)
    _, idx = jax.lax.top_k(-satd, _RD_K)                  # (B, K)
    # candidate select via one-hot matmul ((B, 35) gathers serialize)
    oh = (idx[..., None] ==
          jax.lax.broadcasted_iota(jnp.int32, (b, _RD_K, 35), 2))
    cand = jnp.einsum(
        "bkm,bmp->bkp", oh.astype(jnp.float32),
        preds.reshape(b, 35, n * n).astype(jnp.float32),
        preferred_element_type=jnp.float32)
    cand = cand.astype(jnp.int32).reshape(b * _RD_K, n, n)
    resi = (blocks[:, None] - cand.reshape(b, _RD_K, n, n)) \
        .reshape(b * _RD_K, n, n)
    dst = n == 4                       # DST-VII for 4x4 luma intra TBs
    tc = dct_batch(resi, n, bit_depth, dst=dst)
    lv = quant_batch(tc, n, qp_j, bit_depth, intra=True)
    cbf = jnp.any(lv != 0, axis=(1, 2))
    r = idct_batch(dequant_batch(lv, n, qp_j, bit_depth), n, bit_depth,
                   dst=dst)
    maxv = (1 << bit_depth) - 1
    rec = jnp.where(cbf[:, None, None], jnp.clip(cand + r, 0, maxv),
                    cand)
    org = jnp.broadcast_to(blocks[:, None], (b, _RD_K, n, n)) \
        .reshape(b * _RD_K, n, n)
    d = (rec - org).astype(jnp.float32)
    sse = (d * d).sum(axis=(1, 2))
    a = jnp.abs(lv)
    nnz = (a > 0).sum(axis=(1, 2)).astype(jnp.float32)
    slog = _bitlen_f(a).sum(axis=(1, 2)).astype(jnp.float32)
    cbits = jnp.where(nnz > 0, abc[0] * nnz + abc[1] * slog + abc[2],
                      0.0)
    mbits = jnp.take(mode_bits, idx).reshape(-1)          # (B*K,)
    if n == 4:
        # four coherent 4x4 PUs mostly hit each other's MPMs — the
        # average signalled cost is far below the flat per-mode table
        # (x265 prices this with real MPM-aware fracBits)
        mbits = mbits * 0.5
    cost = (sse + lam2 * (cbits + mbits)).reshape(b, _RD_K)
    k = jnp.argmin(cost, axis=1)
    best_mode = jnp.take_along_axis(idx, k[:, None], 1)[:, 0]
    best_cost = jnp.min(cost, axis=1)
    return best_mode.astype(jnp.int32), best_cost


@partial(jax.jit, static_argnames=("h", "w", "ctu", "bit_depth",
                                   "intra_nxn"))
def _analyze_gop_jit(planes: jnp.ndarray, lam_bits: jnp.ndarray,
                     lam_split: jnp.ndarray, lam_nxn: jnp.ndarray,
                     qp_j: jnp.ndarray, lam2: jnp.ndarray,
                     abc: jnp.ndarray, mode_bits2: jnp.ndarray, *,
                     h: int, w: int, ctu: int, bit_depth: int,
                     intra_nxn: bool = False):
    """Fused mode+depth decision for a GOP: planes (F, Hp, Wp) padded to
    CTU multiples; (h, w) = real (8-aligned) coded size. Mode AND depth
    decisions are full-RD (recon SSE + lambda2 * bits; _rd_mode_size).
    Returns depth8/mode8 (F, Hp/8, Wp/8) + nxn8/mode4 on the padded
    grid."""
    nf, hp, wp = planes.shape
    planes = planes.astype(jnp.int32)
    sizes = [8, 16, 32]

    def per_size(n):
        def one(pl):
            return _rd_mode_size(pl, n, qp_j, lam_bits, lam2, abc,
                                 mode_bits2, bit_depth)
        m, c = jax.vmap(one)(planes)
        by, bx = hp // n, wp // n
        m = m.reshape(nf, by, bx)
        c = c.reshape(nf, by, bx)
        # blocks extending past the coded frame can't be chosen whole
        ys = jax.lax.broadcasted_iota(jnp.int32, (by, bx), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (by, bx), 1)
        over = ((ys + 1) * n > h) | ((xs + 1) * n > w)
        c = jnp.where(over[None], jnp.inf, c)
        return m, c

    mode = {}
    cost = {}
    for n in sizes:
        mode[n], cost[n] = per_size(n)

    def children_sum(c):
        f, cy, cx = c.shape
        return c.reshape(f, cy // 2, 2, cx // 2, 2).sum(axis=(2, 4))

    # PART_NxN alternative at min CU: four 4x4 PU/TUs (search.cpp:2166)
    if intra_nxn:
        mode4, cost4 = per_size(4)
        cost_nxn = children_sum(cost4) + lam_nxn
        use_nxn = cost_nxn < cost[8]
        eff8 = jnp.where(use_nxn, cost_nxn, cost[8])
    else:
        mode4 = None
        use_nxn = jnp.zeros_like(cost[8], dtype=bool)
        eff8 = cost[8]

    # out-of-frame children cost 0 (the tree doesn't recurse there)
    agg8 = jnp.where(jnp.isinf(eff8), 0.0, eff8)
    child16 = children_sum(agg8) + lam_split
    keep16 = cost[16] <= child16
    agg16 = jnp.where(keep16, cost[16], child16)
    agg16 = jnp.where(jnp.isinf(agg16), 0.0, agg16)
    child32 = children_sum(agg16) + lam_split
    keep32 = cost[32] <= child32

    def up(x, k):
        return jnp.repeat(jnp.repeat(x, k, axis=1), k, axis=2)

    k32 = up(keep32, 4)
    k16 = up(keep16, 2)
    depth8 = jnp.where(k32, 0, jnp.where(k16, 1, 2)).astype(jnp.uint8)
    if intra_nxn:
        nxn8 = ((~k32) & (~k16) & use_nxn)
        # PU0's mode represents the CU (chroma DM source, clause 8.4.3)
        m8eff = jnp.where(nxn8, mode4[:, ::2, ::2], mode[8])
    else:
        nxn8 = jnp.zeros_like(depth8, dtype=bool)
        m8eff = mode[8]
    mode8 = jnp.where(k32, up(mode[32], 4),
                      jnp.where(k16, up(mode[16], 2),
                                m8eff)).astype(jnp.uint8)
    if intra_nxn:
        mode4_out = jnp.where(up(nxn8, 2), mode4,
                              up(mode8.astype(jnp.int32), 2)
                              ).astype(jnp.uint8)
    else:
        mode4_out = up(mode8.astype(jnp.int32), 2).astype(jnp.uint8)
    return depth8, mode8, nxn8, mode4_out


# chroma candidate list (clause 8.4.3): planar/ver/hor/dc; an entry
# equal to the luma mode is replaced by angular-34
CHROMA_CAND = np.array([0, 26, 10, 1], dtype=np.int32)


@partial(jax.jit, static_argnames=("n", "bit_depth"))
def _chroma_costs_device(cbp: jnp.ndarray, crp: jnp.ndarray, n: int,
                         bit_depth: int = 8) -> jnp.ndarray:
    """Joint cb+cr SATD of all 35 chroma prediction modes per n-block
    (orig-pixel references, like the luma analysis). Returns (B, 35)."""
    cb = cbp.astype(jnp.int32)
    cr = crp.astype(jnp.int32)
    costs = 0
    for pl in (cb, cr):
        blocks = extract_blocks(pl, n)
        refs = gather_refs_device(pl, n, bit_depth)
        preds = intra_pred_all_modes(refs, n, is_luma=False,
                                     bit_depth=bit_depth)
        costs = costs + sa8d_nxn_batch(preds - blocks[:, None], n)
    return costs


@partial(jax.jit, static_argnames=("bit_depth",))
def _chroma_modes_jit(cbp: jnp.ndarray, crp: jnp.ndarray,
                      depth8: jnp.ndarray, mode8: jnp.ndarray,
                      lam: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Fully on-device chroma mode decision (one dispatch, downloads
    one uint8 map instead of 3x(n8y,n8x,35) cost tensors). Planes must
    be padded to 16-multiples (CTU/2). Semantics == the numpy
    composition in analyze_chroma_modes."""
    n8y, n8x = depth8.shape
    cost8 = []
    for n in (32, 16, 8):             # depth 0, 1, 2
        cn = n // 2
        c = _chroma_costs_device(cbp, crp, cn, bit_depth)
        hc, wc = cbp.shape
        c = c.reshape(hc // cn, wc // cn, 35)
        s = n // 8
        c = jnp.repeat(jnp.repeat(c, s, 0), s, 1)[:n8y, :n8x]
        cost8.append(c)
    allc = jnp.stack(cost8)                        # (3, n8y, n8x, 35)
    c8 = jnp.take_along_axis(
        allc, depth8[None, ..., None].astype(jnp.int32), 0)[0]
    m = mode8.astype(jnp.int32)
    cand = jnp.broadcast_to(jnp.asarray(CHROMA_CAND), (n8y, n8x, 4))
    cand = jnp.where(cand == m[..., None], 34, cand)
    dm_cost = jnp.take_along_axis(c8, m[..., None], -1)[..., 0] + lam
    cand_cost = jnp.take_along_axis(c8, cand, -1) + lam * 3
    bj = jnp.argmin(cand_cost, -1)
    best_cc = jnp.take_along_axis(cand_cost, bj[..., None], -1)[..., 0]
    best_cm = jnp.take_along_axis(cand, bj[..., None], -1)[..., 0]
    return jnp.where(dm_cost <= best_cc, m, best_cm).astype(jnp.uint8)


def analyze_chroma_gop(orig_cb: np.ndarray, orig_cr: np.ndarray,
                       depth8: np.ndarray, mode8: np.ndarray, qp: int,
                       bit_depth: int = 8) -> np.ndarray:
    """GOP-batched device chroma mode decision: orig_cb/cr (F, H/2,
    W/2), depth8/mode8 (F, n8y, n8x). Returns cmode8 (F, n8y, n8x)."""
    nf, h2, w2 = orig_cb.shape
    lam = jnp.float32(lambda_from_qp(qp))
    hp = (h2 + 15) // 16 * 16
    wp = (w2 + 15) // 16 * 16
    if hp != h2 or wp != w2:
        orig_cb = np.pad(orig_cb, ((0, 0), (0, hp - h2), (0, wp - w2)),
                         mode="edge")
        orig_cr = np.pad(orig_cr, ((0, 0), (0, hp - h2), (0, wp - w2)),
                         mode="edge")

    def one(cb, cr, d8, m8):
        return _chroma_modes_jit(cb, cr, d8, m8, lam, bit_depth)

    out = jax.vmap(one)(jnp.asarray(orig_cb.astype(np.int32)),
                        jnp.asarray(orig_cr.astype(np.int32)),
                        jnp.asarray(depth8.astype(np.int32)),
                        jnp.asarray(mode8.astype(np.int32)))
    return np.asarray(out)


def analyze_chroma_modes(orig_cb: np.ndarray, orig_cr: np.ndarray,
                         depth8: np.ndarray, mode8: np.ndarray, qp: int,
                         bit_depth: int = 8) -> np.ndarray:
    """Chroma intra mode decision per chosen CU (x265
    estIntraPredChromaQT analog, search.cpp:1698): DM vs the 4-entry
    candidate list, SATD + signalling bits. Returns cmode8 (n8y, n8x)
    uint8 of ACTUAL chroma prediction modes."""
    h2, w2 = orig_cb.shape
    n8y, n8x = depth8.shape
    lam = lambda_from_qp(qp)
    cost8 = []
    for n in (32, 16, 8):             # depth 0, 1, 2
        cn = n // 2
        hp = (h2 + cn - 1) // cn * cn
        wp = (w2 + cn - 1) // cn * cn
        pcb = np.pad(orig_cb, ((0, hp - h2), (0, wp - w2)), mode="edge")
        pcr = np.pad(orig_cr, ((0, hp - h2), (0, wp - w2)), mode="edge")
        c = np.asarray(_chroma_costs_device(
            jnp.asarray(pcb.astype(np.int32)),
            jnp.asarray(pcr.astype(np.int32)), cn, bit_depth))
        c = c.reshape(hp // cn, wp // cn, 35)
        s = n // 8
        cost8.append(np.repeat(np.repeat(c, s, 0), s, 1)[:n8y, :n8x])
    allc = np.stack(cost8)                        # (3, n8y, n8x, 35)
    c8 = np.take_along_axis(
        allc, depth8[None, ..., None].astype(np.int64), 0)[0]
    m = mode8.astype(np.int64)
    cand = np.broadcast_to(CHROMA_CAND, (n8y, n8x, 4)).copy() \
        .astype(np.int64)
    cand = np.where(cand == m[..., None], 34, cand)
    dm_cost = np.take_along_axis(c8, m[..., None], -1)[..., 0] + lam * 1
    cand_cost = np.take_along_axis(c8, cand, -1) + lam * 3
    bj = cand_cost.argmin(-1)
    best_cc = np.take_along_axis(cand_cost, bj[..., None], -1)[..., 0]
    best_cm = np.take_along_axis(cand, bj[..., None], -1)[..., 0]
    return np.where(dm_cost <= best_cc, m, best_cm).astype(np.uint8)


def analyze_intra_gop(orig_y: np.ndarray, qp: int, ctu_size: int = 32,
                      bit_depth: int = 8, intra_nxn: bool = False
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
    """GOP analysis: orig_y (F, H, W) 8-aligned planes. Returns
    (depth8, mode8, nxn8, mode4): depth/mode on the (F, H/8, W/8) grid,
    nxn8 bool (PART_NxN at min CU), mode4 (F, H/4, W/4) per-PU modes."""
    nf, h, w = orig_y.shape
    lam = lambda_from_qp(qp)
    lam2 = lambda2_from_qp(qp)
    hp = (h + ctu_size - 1) // ctu_size * ctu_size
    wp = (w + ctu_size - 1) // ctu_size * ctu_size
    if hp == h and wp == w:
        pl = orig_y                      # no host copy
    else:
        pl = np.pad(orig_y, ((0, 0), (0, hp - h), (0, wp - w)),
                    mode="edge")
    lam_bits = jnp.asarray(np.round(lam * _MODE_BITS).astype(np.int32))
    # depth/NxN aggregation runs in the RD domain (SSE + lambda2*bits)
    lam_split = jnp.float32(lam2 * 4.0)  # split flag + smaller-CU tax
    lam_nxn = jnp.float32(lam2 * 8.0)    # part bit + 3 extra PU headers
    from ..common.bit_calib import calib_for_qp
    cal = calib_for_qp(qp)
    abc = jnp.asarray([float(cal[0]), float(cal[1]), float(cal[2])],
                      jnp.float32)
    mode_bits2 = jnp.asarray(_MODE_BITS.astype(np.float32))
    src_dt = np.uint8 if bit_depth == 8 else np.uint16
    d8, m8, nxn8, m4 = _analyze_gop_jit(
        jnp.asarray(pl.astype(src_dt)), lam_bits, lam_split, lam_nxn,
        jnp.int32(qp), jnp.float32(lam2), abc, mode_bits2,
        h=h, w=w, ctu=ctu_size, bit_depth=bit_depth, intra_nxn=intra_nxn)
    return (np.asarray(d8)[:, :h // 8, :w // 8],
            np.asarray(m8)[:, :h // 8, :w // 8],
            np.asarray(nxn8)[:, :h // 8, :w // 8],
            np.asarray(m4)[:, :h // 4, :w // 4])


def analyze_intra_frame(orig_y: np.ndarray, qp: int, ctu_size: int = 32,
                        bit_depth: int = 8, intra_nxn: bool = False
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """Dense mode+depth decision. orig_y already padded to 8-multiples.

    Returns (depth8, mode8, nxn8, mode4): depth/mode over the 8x8
    min-CU grid; nxn8 marks PART_NxN CUs whose four 4x4 PU modes live
    in mode4 (H/4, W/4).

    Single-frame wrapper over analyze_intra_gop (the full-RD device
    decision); the numpy fallback below is kept for ctu_size > 32
    callers only (none today — intra analysis caps at 32)."""
    if ctu_size <= 32:
        d8, m8, nxn8, m4 = analyze_intra_gop(
            orig_y[None], qp, ctu_size, bit_depth, intra_nxn=intra_nxn)
        return (d8[0].astype(np.uint8), m8[0].astype(np.uint8),
                nxn8[0], m4[0].astype(np.uint8))
    h, w = orig_y.shape
    lam = lambda_from_qp(qp)
    sizes = [8, 16, 32] if ctu_size == 32 else [8, 16, 32, 64]
    sizes = [s for s in sizes if s <= ctu_size]
    if intra_nxn:
        sizes = [4] + sizes
    best_mode: dict[int, np.ndarray] = {}
    best_cost: dict[int, np.ndarray] = {}
    plane_j = jnp.asarray(orig_y.astype(np.int32))
    lam_bits = jnp.asarray(np.round(lam * _MODE_BITS).astype(np.int32))
    for n in sizes:
        if h % n or w % n:
            # handle ragged edges by evaluating on an edge-padded plane
            hp = (h + n - 1) // n * n
            wp = (w + n - 1) // n * n
            pl = np.pad(orig_y, ((0, hp - h), (0, wp - w)), mode="edge")
        else:
            hp, wp, pl = h, w, orig_y
        mode, cost = analyze_size_device(jnp.asarray(pl.astype(np.int32)), n,
                                         lam_bits, bit_depth)
        by, bx = hp // n, wp // n
        m = np.asarray(mode).reshape(by, bx)
        c = np.asarray(cost).reshape(by, bx).astype(np.float64)
        # blocks that extend past the real (padded-to-8) frame can't be
        # chosen whole: force split by making them infinitely expensive
        if hp != h or wp != w:
            ny, nx = np.meshgrid(np.arange(by), np.arange(bx), indexing="ij")
            over = ((ny + 1) * n > h) | ((nx + 1) * n > w)
            c = np.where(over, np.inf, c)
        best_mode[n] = m
        best_cost[n] = c

    # PART_NxN alternative at min CU (search.cpp:2166): four 4x4 PUs
    n8y, n8x = h // 8, w // 8
    nxn_map = np.zeros((best_cost[8].shape), dtype=bool)
    if intra_nxn:
        c4 = best_cost[4]
        cost_nxn = c4.reshape(c4.shape[0] // 2, 2, c4.shape[1] // 2, 2) \
            .sum(axis=(1, 3)) + lam * 8.0
        cost_nxn = cost_nxn[:best_cost[8].shape[0],
                            :best_cost[8].shape[1]]
        nxn_map = cost_nxn < best_cost[8]
        best_cost[8] = np.where(nxn_map, cost_nxn, best_cost[8])

    # bottom-up depth choice; split overhead ~ (split flag + extra CU
    # headers) * lambda
    split_bits = 6.0
    depth_map: dict[int, np.ndarray] = {}   # per size: 0 = keep, 1 = split
    agg_cost = best_cost[8]
    for n in [s for s in sizes if s > 8]:
        by, bx = best_cost[n].shape
        # pad child grid to 2*by x 2*bx; missing children (outside the
        # picture) cost 0 — the quadtree simply doesn't recurse there
        cy, cx = agg_cost.shape
        padded = np.zeros((by * 2, bx * 2))
        padded[:cy, :cx] = agg_cost
        child = padded.reshape(by, 2, bx, 2).sum(axis=(1, 3)) \
            + lam * split_bits
        keep = best_cost[n] <= child
        depth_map[n] = ~keep
        agg_cost = np.where(keep, best_cost[n], child)

    # materialize depth8/mode8 (+ nxn8/mode4) on the min-CU grids
    depth8 = np.zeros((n8y, n8x), dtype=np.uint8)
    mode8 = np.zeros((n8y, n8x), dtype=np.uint8)
    nxn8 = np.zeros((n8y, n8x), dtype=bool)
    mode4 = np.zeros((h // 4, w // 4), dtype=np.uint8)
    log2_ctu = ctu_size.bit_length() - 1

    def fill(n: int, yb: int, xb: int) -> None:
        """Resolve the choice for block (yb, xb) of size n."""
        if yb * n >= h or xb * n >= w:
            return
        if n > 8 and depth_map[n][yb, xb]:
            half = n // 2
            for sy in range(2):
                for sx in range(2):
                    fill(half, yb * 2 + sy, xb * 2 + sx)
        else:
            s = n // 8
            d = log2_ctu - (n.bit_length() - 1)
            depth8[yb * s:(yb + 1) * s, xb * s:(xb + 1) * s] = d
            if n == 8 and nxn_map[yb, xb]:
                nxn8[yb, xb] = True
                mode4[yb * 2:yb * 2 + 2, xb * 2:xb * 2 + 2] = \
                    best_mode[4][yb * 2:yb * 2 + 2, xb * 2:xb * 2 + 2]
                mode8[yb, xb] = best_mode[4][yb * 2, xb * 2]  # PU0 (DM)
            else:
                m = best_mode[n][yb, xb]
                depthm = mode4[yb * s * 2:(yb + 1) * s * 2,
                               xb * s * 2:(xb + 1) * s * 2]
                depthm[:] = m
                mode8[yb * s:(yb + 1) * s, xb * s:(xb + 1) * s] = m

    top = sizes[-1]
    for yb in range((h + top - 1) // top):
        for xb in range((w + top - 1) // top):
            fill(top, yb, xb)
    return depth8, mode8, nxn8, mode4
