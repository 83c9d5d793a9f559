"""Lookahead v2: device lowres pipeline + AQ + cuTree -> per-CTU QP.

TPU-first recast of x265's lookahead quality machinery:
  - per-16x16 AC-energy adaptive quantization, modes 1-3
    (reference behavior: slicetype.cpp:444 calcAdaptiveQuantFrame,
     acEnergyCu/acEnergyVar slicetype.cpp:45-95)
  - half-res (lowres) planes with per-8x8-block intra SATD estimate
    (slicetype.cpp:696 lowresIntraEstimate -- here the full 35-mode
    batched predictor scores every block at once) and inter SATD via
    a dense full search (slicetype.cpp:3216 estimateCUCost's
    HEX+qpel recast as an all-candidate sweep)
  - cuTree temporal propagation as a backward lax.scan with a
    bilinear scatter-add along the motion field
    (slicetype.cpp:2538 cuTree, :2641 estimateCUPropagate,
     pixel.cpp:914 estimateCUPropagateCost, :2750 cuTreeFinish)

Everything runs in ONE jit dispatch per GOP; the host receives only
the per-CTU QP offset maps and per-frame cost totals (for scene-cut
and rate-control seeding).

The 16x16 full-res AQ grid and the 8x8 lowres cost grid coincide, so
no resampling is needed between the stages (x265 keeps the same
equivalence: lowres 8x8 block == full-res 16x16 block).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.intra import intra_pred_all_modes
from ..ops.satd import sa8d_batch


# =============================================================================
# AQ: per-16x16 AC energy -> qp offsets (calcAdaptiveQuantFrame)
# =============================================================================

def _block_var(plane: jnp.ndarray, n: int, shift: int) -> jnp.ndarray:
    """acEnergyVar analog: per nxn block, ssd - sum^2 >> shift."""
    h, w = plane.shape
    by, bx = h // n, w // n
    # float32 accumulation (x64 is off on TPU); the ~2^-24 relative
    # rounding is immaterial for an energy heuristic
    p = plane[:by * n, :bx * n].astype(jnp.float32)
    blk = p.reshape(by, n, bx, n)
    s = blk.sum(axis=(1, 3))
    ssd = (blk * blk).sum(axis=(1, 3))
    return ssd - s * s * (1.0 / (1 << shift))


def aq_offsets(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
               aq_mode: int, aq_strength: float, bit_depth: int
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-16x16-block qpAqOffset + invQscaleFactor (Q8).

    Modes: 1 = variance, 2 = auto-variance, 3 = auto-variance-biased
    (slicetype.cpp:530-600, qgSize 32/64 constants: modeOne 14.427,
    modeTwo 11)."""
    e = _block_var(y, 16, 8) + _block_var(cb, 8, 6) + _block_var(cr, 8, 6)
    if aq_mode == 1:
        strength = aq_strength * 1.0397
        adj = strength * (jnp.log2(jnp.maximum(e, 1.0)) -
                          (14.427 + 2.0 * (bit_depth - 8)))
    else:
        corr = 1.0 / (1 << (2 * (bit_depth - 8)))
        t = jnp.power(e * corr + 1.0, 0.1)
        avg = jnp.mean(t)
        avg2 = jnp.mean(t * t)
        strength = aq_strength * avg
        avg_c = avg - 0.5 * (avg2 - 11.0) / avg
        adj = strength * (t - avg_c)
        if aq_mode == 3:
            adj = adj + aq_strength * (1.0 - 11.0 / (t * t))
    # x265_exp2fix8 analog (common.cpp:96): Q8 qp->qscale factor
    invq = jnp.clip(jnp.round(256.0 * jnp.exp2(-adj / 6.0)), 0.0, 65535.0)
    return adj, invq


# =============================================================================
# lowres costs: per-8x8-block intra SATD + inter SATD/MV vs prev frame
# =============================================================================

def lowres_plane(y: jnp.ndarray) -> jnp.ndarray:
    """Half-res by 2x2 box filter (frameInitLowres analog,
    primitives.frameInitLowres / mc-a2.asm)."""
    h, w = y.shape
    p = y[:h // 2 * 2, :w // 2 * 2].astype(jnp.int32)
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] +
            p[1::2, 1::2] + 2) >> 2


def _lowres_blocks(lw: jnp.ndarray, n: int = 8):
    h, w = lw.shape
    by, bx = h // n, w // n
    blk = lw[:by * n, :bx * n].reshape(by, n, bx, n) \
        .transpose(0, 2, 1, 3).reshape(-1, n, n)
    return blk, by, bx


def lowres_intra_cost(lw: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Per-8x8 lowres block 35-mode intra SATD estimate.

    The reference scores all 35 modes serially per block
    (slicetype.cpp:696); here one batched gather builds every block's
    canonical reference vector and one matmul predicts all modes of
    all blocks (ops/intra.py), scored by SA8D."""
    n = 8
    blk, by, bx = _lowres_blocks(lw, n)
    h, w = lw.shape
    x0 = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    y0 = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    # canonical refs [L[2N-1]..L[0], corner, T[0]..T[2N-1]] with clamped
    # (edge-substituted) neighbor gathers
    ks = jnp.arange(2 * n, dtype=jnp.int32)
    ly = jnp.clip(y0[:, None] + (2 * n - 1 - ks)[None, :], 0, h - 1)
    lx = jnp.clip(x0[:, None] - 1, 0, w - 1)
    left = lw[ly, jnp.broadcast_to(lx, ly.shape)]
    ty = jnp.clip(y0[:, None] - 1, 0, h - 1)
    tx = jnp.clip(x0[:, None] + ks[None, :], 0, w - 1)
    top = lw[jnp.broadcast_to(ty, tx.shape), tx]
    corner = lw[jnp.clip(y0 - 1, 0, h - 1), jnp.clip(x0 - 1, 0, w - 1)]
    refs = jnp.concatenate([left, corner[:, None], top], axis=1)
    preds = intra_pred_all_modes(refs, n, is_luma=True,
                                 bit_depth=bit_depth)   # (B, 35, 8, 8)
    costs = sa8d_batch(blk[:, None] - preds)            # (B, 35)
    # mode-bits penalty analog (lowres intra adds a fixed penalty)
    best = jnp.min(costs, axis=1) + 5
    return best.reshape(by, bx).astype(jnp.float32)


def lowres_inter_cost(lw_cur: jnp.ndarray, lw_ref: jnp.ndarray,
                      radius: int = 12):
    """Per-8x8 block full-pel full search on lowres planes: SAD sweep
    over every candidate (fori-rolled dynamic_slice), then SA8D at the
    winner so intra/inter costs share a scale. Returns
    (cost (by,bx) f32, mv (by,bx,2) i32 in QPEL units)."""
    n = 8
    h, w = lw_cur.shape
    blk, by, bx = _lowres_blocks(lw_cur, n)
    cur = lw_cur[:by * n, :bx * n].astype(jnp.int32)
    pad = jnp.pad(lw_ref.astype(jnp.int32),
                  ((radius, radius), (radius, radius)), mode="edge")
    ncand = (2 * radius + 1) ** 2

    def body(i, state):
        best_cost, best_mv = state
        dy = i // (2 * radius + 1) - radius
        dx = i % (2 * radius + 1) - radius
        sh = jax.lax.dynamic_slice(pad, (dy + radius, dx + radius),
                                   (h, w))[:by * n, :bx * n]
        ad = jnp.abs(cur - sh)
        sad = ad.reshape(by, n, bx, n).sum(axis=(1, 3))
        cost = sad + 2 * (jnp.abs(dx) + jnp.abs(dy))
        better = cost < best_cost
        best_cost = jnp.where(better, cost, best_cost)
        mv = jnp.stack([dx, dy]).astype(jnp.int32)
        best_mv = jnp.where(better[..., None], mv[None, None], best_mv)
        return best_cost, best_mv

    init = (jnp.full((by, bx), 1 << 30, jnp.int32),
            jnp.zeros((by, bx, 2), jnp.int32))
    _, mv = jax.lax.fori_loop(0, ncand, body, init)

    # SA8D at the winning MV (gather, clamped)
    x0 = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    y0 = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    mvf = mv.reshape(-1, 2)
    ys = jnp.clip(y0[:, None] + mvf[:, 1:2] + jnp.arange(n)[None, :],
                  0, h - 1)
    xs = jnp.clip(x0[:, None] + mvf[:, 0:1] + jnp.arange(n)[None, :],
                  0, w - 1)
    patch = lw_ref.astype(jnp.int32)[ys[:, :, None], xs[:, None, :]]
    satd = sa8d_batch(blk - patch).reshape(by, bx).astype(jnp.float32)
    mvb = jnp.abs(mvf[:, 0]) + jnp.abs(mvf[:, 1])
    cost = satd + mvb.reshape(by, bx).astype(jnp.float32)
    return cost, mv * 4     # qpel units (8px block == 32 qpel)


# =============================================================================
# cuTree: backward propagation + finish
# =============================================================================

def _scatter_bilinear(amount: jnp.ndarray, mv: jnp.ndarray) -> jnp.ndarray:
    """Scatter `amount` along the motion field into the reference
    frame's block grid with bilinear weights (estimateCUPropagate's
    CLIP_ADD quad, slicetype.cpp:2704-2739). mv is qpel; one block is
    32 qpel units."""
    by, bx = amount.shape
    gx = jnp.broadcast_to(jnp.arange(bx, dtype=jnp.int32)[None, :],
                          (by, bx))
    gy = jnp.broadcast_to(jnp.arange(by, dtype=jnp.int32)[:, None],
                          (by, bx))
    cux = gx + (mv[..., 0] >> 5)
    cuy = gy + (mv[..., 1] >> 5)
    fx = (mv[..., 0] & 31).astype(jnp.float32)
    fy = (mv[..., 1] & 31).astype(jnp.float32)
    out = jnp.zeros(by * bx, jnp.float32)
    for dy in (0, 1):
        wy = fy if dy else 32.0 - fy
        for dx in (0, 1):
            wx = fx if dx else 32.0 - fx
            tx = cux + dx
            ty = cuy + dy
            valid = (tx >= 0) & (tx < bx) & (ty >= 0) & (ty < by)
            contrib = amount * wy * wx * (1.0 / 1024.0) * valid
            idx = jnp.clip(ty, 0, by - 1) * bx + jnp.clip(tx, 0, bx - 1)
            out = out.at[idx.reshape(-1)].add(contrib.reshape(-1))
    return out.reshape(by, bx)


def cutree_propagate_ippp(intra_c: jnp.ndarray, inter_c: jnp.ndarray,
                          mvs: jnp.ndarray) -> jnp.ndarray:
    """Backward cuTree over an IPPP chain: frame f's propagate pool
    flows into frame f-1 along the motion field. intra_c/inter_c:
    (F, by, bx) f32; mvs: (F, by, bx, 2) i32 qpel (frame f vs f-1;
    index 0 unused). Returns propagateCost (F, by, bx) f32.

    invQscaleFactor weighting (Q8) is applied by the caller inside
    the propagate amount; here costs arrive pre-weighted (the
    reference weights inside primitives.propagateCost)."""
    f = intra_c.shape[0]

    def body(pc_cur, xs):
        ic, ec_raw, mv = xs
        ec = jnp.minimum(ic, ec_raw)
        denom = jnp.maximum(ic, 1.0)
        amount = (pc_cur + ic) * (ic - ec) / denom
        pc_prev = _scatter_bilinear(amount, mv)
        return pc_prev, pc_cur

    # iterate f-1 .. 1; carry enters as pc[f-1] = 0
    xs = (intra_c[:0:-1], inter_c[:0:-1], mvs[:0:-1])
    pc0, pcs_rev = jax.lax.scan(body, jnp.zeros_like(intra_c[0]), xs)
    # pcs_rev[i] = pc of frame (F-1-i); prepend pc0 for frame 0
    pcs = jnp.concatenate([pc0[None], pcs_rev[::-1]], axis=0)
    return pcs


def cutree_finish(intra_c: jnp.ndarray, pc: jnp.ndarray,
                  invq: jnp.ndarray, aq_off: jnp.ndarray,
                  qcomp: float) -> jnp.ndarray:
    """qpCuTreeOffset = qpAqOffset - strength * log2((ic+pc)/ic) with
    ic scaled by invQscaleFactor (cuTreeFinish else-branch,
    slicetype.cpp:2850-2885); strength = 5*(1-qcomp)."""
    strength = 5.0 * (1.0 - qcomp)
    ic = intra_c * invq * (1.0 / 256.0)
    ratio = jnp.where(ic > 0,
                      jnp.log2(ic + pc) - jnp.log2(jnp.maximum(ic, 1e-9)),
                      0.0)
    return aq_off - strength * ratio


# =============================================================================
# the fused GOP lookahead
# =============================================================================

@partial(jax.jit, static_argnames=("aq_mode", "cutree", "bit_depth",
                                   "ctu"))
def _lookahead_gop_j(ys, cbs, crs, aq_strength, qcomp, *, aq_mode: int,
                     cutree: bool, bit_depth: int, ctu: int):
    f, h, w = ys.shape
    n16y, n16x = h // 16, w // 16

    def per_frame_aq(args):
        y, cb, cr = args
        return aq_offsets(y, cb, cr, aq_mode if aq_mode else 2,
                          aq_strength, bit_depth)

    if aq_mode:
        aq, invq = jax.vmap(lambda y, cb, cr: aq_offsets(
            y, cb, cr, aq_mode, aq_strength, bit_depth))(
                ys.astype(jnp.int32), cbs.astype(jnp.int32),
                crs.astype(jnp.int32))
    else:
        aq = jnp.zeros((f, n16y, n16x), jnp.float32)
        invq = jnp.full((f, n16y, n16x), 256.0, jnp.float32)

    lws = jax.vmap(lowres_plane)(ys.astype(jnp.int32))
    intra_c = jax.vmap(lambda p: lowres_intra_cost(p, bit_depth))(lws)
    # inter: frame k vs k-1 (index 0 gets its own intra cost => no gain)
    inter_c_t, mvs_t = jax.vmap(lowres_inter_cost)(lws[1:], lws[:-1])
    inter_c = jnp.concatenate([intra_c[:1], inter_c_t], axis=0)
    mvs = jnp.concatenate([jnp.zeros((1,) + inter_c_t.shape[1:] + (2,),
                                     jnp.int32)[..., :2], mvs_t], axis=0) \
        if f > 1 else jnp.zeros((f, h // 16, w // 16, 2), jnp.int32)

    if cutree and f > 1:
        # weight the intra pool by invQscale inside the propagate amount
        # (primitives.propagateCost: propagateIntra = intra * invq / 256)
        pcs = cutree_propagate_ippp(intra_c * invq * (1.0 / 256.0),
                                    inter_c * invq * (1.0 / 256.0), mvs)
        # un-scale: propagate pool is already in weighted units; finish
        # consumes ic weighted the same way
        off16 = cutree_finish(intra_c, pcs, invq, aq, qcomp)
    else:
        off16 = aq

    # per-CTU offsets: average the 16x16 offsets under each CTU
    k = ctu // 16
    ncty, nctx = n16y // k, n16x // k
    off_ctu = off16[:, :ncty * k, :nctx * k] \
        .reshape(f, ncty, k, nctx, k).mean(axis=(2, 4))
    # frame cost totals for scene-cut / RC seeding
    fr_intra = intra_c.sum(axis=(1, 2))
    fr_inter = inter_c.sum(axis=(1, 2))
    return off_ctu, off16, fr_intra, fr_inter


def lookahead_gop(ys: np.ndarray, cbs: np.ndarray, crs: np.ndarray,
                  cfg, qcomp: float = 0.6):
    """Host wrapper: (F, H, W) planes (16-aligned) -> per-CTU QP offset
    maps (F, ncty, nctx) f32 + per-frame lowres cost totals."""
    off_ctu, off16, fi, fe = _lookahead_gop_j(
        jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs),
        jnp.float32(cfg.aq_strength), jnp.float32(qcomp),
        aq_mode=int(cfg.aq_mode), cutree=bool(cfg.cutree),
        bit_depth=cfg.bit_depth, ctu=cfg.ctu_size)
    return (np.asarray(off_ctu), np.asarray(off16), np.asarray(fi),
            np.asarray(fe))
