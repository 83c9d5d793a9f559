"""Device SAO: stats + parameter decision + apply, fully traced.

In-graph version of ops/sao.py (reference behavior: x265
source/encoder/sao.cpp calcSaoStatsCu/rdoSaoUnitCu/applyPixelOffsets)
so SAO can live INSIDE the fused GOP scan — SAO is an in-loop filter,
its output is the reference for the next frame, so it must run on
device between frames of a fused chain. All stats are whole-plane
tensor reductions (per-CTU reshape sums); the per-CTU decision is a
vectorized argmin over 4 EO classes + 32 BO windows + OFF.

The decision mirrors ops/sao.py's distortion/bits model; any choice is
conformant (parameters are signalled), so parity with the host path is
not bit-required — the contract is encoder recon == decoder recon for
the SAME parameters, which apply_sao_t guarantees against
apply_sao_component_np by construction (identical arithmetic).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

EO_SHIFTS = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))


def _shifted(p: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """p shifted by (dy, dx) with zero fill (border handled by masks)."""
    return jnp.roll(p, (-dy, -dx), axis=(0, 1))


def eo_cat_all(rec: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel EO category for all 4 classes: (4, H, W) int32 in 0..4
    (0 = unclassified / border), plus validity masks (4, H, W)."""
    h, w = rec.shape
    cats = []
    valids = []
    yy, xx = jnp.mgrid[0:h, 0:w]
    for cls in range(4):
        dy0, dx0, dy1, dx1 = EO_SHIFTS[cls]
        n0 = _shifted(rec, dy0, dx0)
        n1 = _shifted(rec, dy1, dx1)
        s0 = jnp.sign(rec - n0)
        s1 = jnp.sign(rec - n1)
        edge = s0 + s1
        cat = jnp.where(edge == -2, 1,
                        jnp.where(edge == -1, 2,
                                  jnp.where(edge == 1, 3,
                                            jnp.where(edge == 2, 4, 0))))
        valid = ((yy + dy0 >= 0) & (yy + dy0 < h) & (xx + dx0 >= 0) &
                 (xx + dx0 < w) & (yy + dy1 >= 0) & (yy + dy1 < h) &
                 (xx + dx1 >= 0) & (xx + dx1 < w))
        cats.append(jnp.where(valid, cat, 0))
        valids.append(valid)
    return jnp.stack(cats), jnp.stack(valids)


def _ctu_sum(a: jnp.ndarray, ncty: int, nctx: int, ctu: int) -> jnp.ndarray:
    """Per-CTU sums; plane must already be padded to CTU multiples."""
    return a.reshape(ncty, ctu, nctx, ctu).sum(axis=(1, 3))


def _pad_ctu(p: jnp.ndarray, ctu: int):
    h, w = p.shape
    hp = (h + ctu - 1) // ctu * ctu
    wp = (w + ctu - 1) // ctu * ctu
    return jnp.pad(p, ((0, hp - h), (0, wp - w))), hp // ctu, wp // ctu


def sao_stats_t(orig: jnp.ndarray, rec: jnp.ndarray, ctu: int,
                bit_depth: int):
    """EO sums/counts (4, 4, ncty, nctx) + BO sums/counts (32, ...)."""
    h, w = orig.shape
    diff = (orig - rec).astype(jnp.int32)
    cats, _ = eo_cat_all(rec)
    dpad, ncty, nctx = _pad_ctu(diff, ctu)
    eo_sum = []
    eo_cnt = []
    for cls in range(4):
        cpad, _, _ = _pad_ctu(cats[cls], ctu)
        for k in range(4):
            m = (cpad == k + 1).astype(jnp.int32)
            eo_sum.append(_ctu_sum(dpad * m, ncty, nctx, ctu))
            eo_cnt.append(_ctu_sum(m, ncty, nctx, ctu))
    eo_sum = jnp.stack(eo_sum).reshape(4, 4, ncty, nctx)
    eo_cnt = jnp.stack(eo_cnt).reshape(4, 4, ncty, nctx)

    band = rec >> (bit_depth - 5)
    bpad, _, _ = _pad_ctu(band, ctu)
    # valid-pixel mask for the padding region (pad pixels -> band 32,
    # never matches)
    bpad = jnp.where(_pad_ctu(jnp.ones((h, w), jnp.int32), ctu)[0] > 0,
                     bpad, 32)

    def one_band(b):
        m = (bpad == b).astype(jnp.int32)
        return (_ctu_sum(dpad * m, ncty, nctx, ctu),
                _ctu_sum(m, ncty, nctx, ctu))

    bo = jax.vmap(one_band)(jnp.arange(32))
    return eo_sum, eo_cnt, bo[0], bo[1]


def _best_offset_t(s, c, sign: int, max_off: int):
    o = jnp.where(c > 0, jnp.round(s / jnp.maximum(c, 1)), 0) \
        .astype(jnp.int32)
    if sign > 0:
        o = jnp.clip(o, 0, max_off)
    elif sign < 0:
        o = jnp.clip(o, -max_off, 0)
    else:
        o = jnp.clip(o, -max_off, max_off)
    dd = (c * o * o - 2 * o * s).astype(jnp.float32)
    return o, dd


def choose_sao_t(orig: jnp.ndarray, rec: jnp.ndarray, ctu: int, qp: int,
                 bit_depth: int, lam: float) -> jnp.ndarray:
    """Per-CTU SAO decision for one plane -> (ncty, nctx, 6) int32
    [type, class_or_band, o0..o3]. Mirrors ops/sao.choose_sao_params."""
    max_off = (1 << (min(bit_depth, 10) - 5)) - 1
    eo_sum, eo_cnt, bsum, bcnt = sao_stats_t(orig, rec, ctu, bit_depth)
    ncty, nctx = eo_sum.shape[2:]

    best_cost = jnp.zeros((ncty, nctx), jnp.float32)      # OFF = 0
    params = jnp.zeros((ncty, nctx, 6), jnp.int32)

    for cls in range(4):
        offs = []
        dd = jnp.zeros((ncty, nctx), jnp.float32)
        for k in range(4):
            sign = 1 if k < 2 else -1
            o, d = _best_offset_t(eo_sum[cls, k], eo_cnt[cls, k], sign,
                                  max_off)
            offs.append(o)
            dd = dd + d
        offs = jnp.stack(offs)                            # (4, ncty, nctx)
        bits = 2 + jnp.abs(offs).sum(axis=0) + 2
        cost = dd + lam * bits
        better = cost < best_cost
        cand = jnp.concatenate([
            jnp.full((1, ncty, nctx), 2, jnp.int32),
            jnp.full((1, ncty, nctx), cls, jnp.int32),
            offs.astype(jnp.int32)]).transpose(1, 2, 0)
        params = jnp.where(better[..., None], cand, params)
        best_cost = jnp.where(better, cost, best_cost)

    bo, bdd = _best_offset_t(bsum, bcnt, 0, max_off)      # (32, ...)
    for pos in range(32):
        ks = [(pos + k) & 31 for k in range(4)]
        dd = bdd[ks[0]] + bdd[ks[1]] + bdd[ks[2]] + bdd[ks[3]]
        offs = jnp.stack([bo[k] for k in ks])
        bits = 2 + jnp.abs(offs).sum(axis=0) + \
            (offs != 0).sum(axis=0) + 5
        cost = dd + lam * bits
        better = cost < best_cost
        cand = jnp.concatenate([
            jnp.full((1, ncty, nctx), 1, jnp.int32),
            jnp.full((1, ncty, nctx), pos, jnp.int32),
            offs.astype(jnp.int32)]).transpose(1, 2, 0)
        params = jnp.where(better[..., None], cand, params)
        best_cost = jnp.where(better, cost, best_cost)
    return params


def choose_sao_chroma_t(orig_cb, rec_cb, orig_cr, rec_cr, ctu, qp,
                        bit_depth, lam):
    """Joint cb/cr decision (shared type + EO class, per-component
    offsets/positions). Mirrors ops/sao.choose_sao_chroma."""
    max_off = (1 << (min(bit_depth, 10) - 5)) - 1
    s_cb = sao_stats_t(orig_cb, rec_cb, ctu, bit_depth)
    s_cr = sao_stats_t(orig_cr, rec_cr, ctu, bit_depth)
    ncty, nctx = s_cb[0].shape[2:]
    best_cost = jnp.zeros((ncty, nctx), jnp.float32)
    p_cb = jnp.zeros((ncty, nctx, 6), jnp.int32)
    p_cr = jnp.zeros((ncty, nctx, 6), jnp.int32)

    for cls in range(4):
        offs_cb, offs_cr = [], []
        dd = jnp.zeros((ncty, nctx), jnp.float32)
        for k in range(4):
            sign = 1 if k < 2 else -1
            o, d = _best_offset_t(s_cb[0][cls, k], s_cb[1][cls, k], sign,
                                  max_off)
            offs_cb.append(o)
            dd = dd + d
            o, d = _best_offset_t(s_cr[0][cls, k], s_cr[1][cls, k], sign,
                                  max_off)
            offs_cr.append(o)
            dd = dd + d
        offs_cb = jnp.stack(offs_cb)
        offs_cr = jnp.stack(offs_cr)
        bits = 2 + 2 + jnp.abs(offs_cb).sum(axis=0) + \
            jnp.abs(offs_cr).sum(axis=0)
        cost = dd + lam * bits
        better = cost < best_cost

        def cand(cls_v, offs):
            return jnp.concatenate([
                jnp.full((1, ncty, nctx), 2, jnp.int32),
                jnp.full((1, ncty, nctx), cls_v, jnp.int32),
                offs.astype(jnp.int32)]).transpose(1, 2, 0)

        p_cb = jnp.where(better[..., None], cand(cls, offs_cb), p_cb)
        p_cr = jnp.where(better[..., None], cand(cls, offs_cr), p_cr)
        best_cost = jnp.where(better, cost, best_cost)

    bo_cb, bd_cb = _best_offset_t(s_cb[2], s_cb[3], 0, max_off)
    bo_cr, bd_cr = _best_offset_t(s_cr[2], s_cr[3], 0, max_off)

    def best_window(bo, bdd):
        cost = jnp.full((ncty, nctx), jnp.inf, jnp.float32)
        pos_b = jnp.zeros((ncty, nctx), jnp.int32)
        offs_b = jnp.zeros((4, ncty, nctx), jnp.int32)
        for p in range(32):
            ks = [(p + k) & 31 for k in range(4)]
            dd = bdd[ks[0]] + bdd[ks[1]] + bdd[ks[2]] + bdd[ks[3]]
            o = jnp.stack([bo[k] for k in ks])
            bits = jnp.abs(o).sum(axis=0) + (o != 0).sum(axis=0) + 5
            c = dd + lam * bits
            better = c < cost
            cost = jnp.where(better, c, cost)
            pos_b = jnp.where(better, p, pos_b)
            offs_b = jnp.where(better[None], o, offs_b)
        return cost, pos_b, offs_b

    c_cb, pos_cb, o_cb = best_window(bo_cb, bd_cb)
    c_cr, pos_cr, o_cr = best_window(bo_cr, bd_cr)
    cost = c_cb + c_cr + lam * 2
    better = cost < best_cost

    def bo_cand(pos, offs):
        return jnp.concatenate([
            jnp.full((1, ncty, nctx), 1, jnp.int32),
            pos[None].astype(jnp.int32),
            offs.astype(jnp.int32)]).transpose(1, 2, 0)

    p_cb = jnp.where(better[..., None], bo_cand(pos_cb, o_cb), p_cb)
    p_cr = jnp.where(better[..., None], bo_cand(pos_cr, o_cr), p_cr)
    return p_cb, p_cr


def apply_sao_t(rec: jnp.ndarray, params: jnp.ndarray, ctu: int,
                bit_depth: int) -> jnp.ndarray:
    """Apply per-CTU SAO params to one plane (traced). Identical
    arithmetic to ops/sao.apply_sao_component_np."""
    h, w = rec.shape
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 5
    ncty, nctx = params.shape[:2]

    def px(a):
        """(ncty, nctx, ...) -> per-pixel broadcast, cropped to (h, w)."""
        r = jnp.repeat(jnp.repeat(a, ctu, 0), ctu, 1)
        return r[:h, :w]

    typ = px(params[..., 0])
    clsband = px(params[..., 1])
    offs = px(params[..., 2:6])                     # (h, w, 4)

    cats, _ = eo_cat_all(rec)                       # (4, h, w)
    cls_idx = jnp.clip(clsband, 0, 3)
    cat = jnp.take_along_axis(cats, cls_idx[None], axis=0)[0]
    eo_add = jnp.zeros((h, w), jnp.int32)
    for k in range(4):
        eo_add = eo_add + jnp.where(cat == k + 1, offs[..., k], 0)

    band = rec >> shift
    band_rel = (band - clsband) & 31
    bo_add = jnp.zeros((h, w), jnp.int32)
    for k in range(4):
        bo_add = bo_add + jnp.where(band_rel == k, offs[..., k], 0)

    add = jnp.where(typ == 2, eo_add, jnp.where(typ == 1, bo_add, 0))
    return jnp.clip(rec + add, 0, maxv)
