"""B-frame encoding: two-list ME + bi-prediction, fully parallel recon.

Like the P path (inter_frame.py), B reconstruction has no intra-frame
dependency; the per-CU choice among PRED_L0 / PRED_L1 / PRED_BI is a
dense argmin over SATD costs (the x265 analog: checkBidir2Nx2N,
analysis.cpp:3145). Final MVs and pred flags are fixed before entropy
coding, so merge/AMVP signalling stays pure bookkeeping.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream.syntax import FrameBSyntax
from ..common.params import EncoderConfig
from ..common.tables import chroma_qp, lambda_from_qp
from ..ops.interp import mc_block_batch, bi_average
from ..ops.me import motion_search_frame
from ..ops.satd import sa8d_nxn_batch
from ..ops.transforms import (dct_batch, idct_batch, quant_batch,
    dequant_batch, sign_hide_batch)
from .intra_recon import ReconFrame


@partial(jax.jit, static_argnames=("n", "bit_depth"))
def _bi_cost_size(orig_y, ref0_y, ref1_y, mv0grid, mv1grid, *, n: int,
                  bit_depth: int):
    """SATD of the bi prediction for every n-block (both MV grids)."""
    h, w = orig_y.shape
    by, bx = h // n, w // n
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    ob = orig_y.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
        .reshape(-1, n, n).astype(jnp.int32)
    a0 = mc_block_batch(ref0_y, x0s, y0s, mv0grid[..., 0].reshape(-1),
                        mv0grid[..., 1].reshape(-1), n, is_luma=True,
                        bit_depth=bit_depth, raw=True)
    a1 = mc_block_batch(ref1_y, x0s, y0s, mv1grid[..., 0].reshape(-1),
                        mv1grid[..., 1].reshape(-1), n, is_luma=True,
                        bit_depth=bit_depth, raw=True)
    pred = bi_average(a0, a1, bit_depth)
    return sa8d_nxn_batch(ob - pred, n).reshape(by, bx)


@partial(jax.jit, static_argnames=("n", "bit_depth", "sign_hiding"))
def _b_recon_size(orig_y, orig_cb, orig_cr, r0y, r0cb, r0cr, r1y, r1cb,
                  r1cr, mv0grid, mv1grid, pfgrid, qp, qpc, *, n: int,
                  bit_depth: int, sign_hiding: bool = False):
    """Dense recon for every n-block with per-block pred choice."""
    h, w = orig_y.shape
    by, bx = h // n, w // n
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    pf = pfgrid.reshape(-1)
    maxv = (1 << bit_depth) - 1

    def blocks_of(plane, nn):
        bby, bbx = plane.shape[0] // nn, plane.shape[1] // nn
        return plane.reshape(bby, nn, bbx, nn).transpose(0, 2, 1, 3) \
            .reshape(-1, nn, nn).astype(jnp.int32)

    def to_plane(blocks, nn, hh, ww):
        bby, bbx = hh // nn, ww // nn
        return blocks.reshape(bby, bbx, nn, nn).transpose(0, 2, 1, 3) \
            .reshape(hh, ww)

    def one_plane(orig, ref0, ref1, nn, x0, y0, qqp, is_luma):
        m0x = mv0grid[..., 0].reshape(-1)
        m0y = mv0grid[..., 1].reshape(-1)
        m1x = mv1grid[..., 0].reshape(-1)
        m1y = mv1grid[..., 1].reshape(-1)
        a0 = mc_block_batch(ref0, x0, y0, m0x, m0y, nn, is_luma=is_luma,
                            bit_depth=bit_depth, raw=True)
        a1 = mc_block_batch(ref1, x0, y0, m1x, m1y, nn, is_luma=is_luma,
                            bit_depth=bit_depth, raw=True)
        shift1 = bit_depth - 8
        tshift = 12 - shift1

        def uni(acc):
            return jnp.clip((acc + (1 << (tshift - 1))) >> tshift, 0, maxv)

        pred = jnp.where((pf == 3)[:, None, None],
                         bi_average(a0, a1, bit_depth),
                         jnp.where((pf == 1)[:, None, None], uni(a0),
                                   uni(a1)))
        ob = blocks_of(orig, nn)
        resi = ob - pred
        if sign_hiding:
            coefs, du = quant_batch(dct_batch(resi, nn, bit_depth), nn,
                                    qqp, bit_depth, intra=False,
                                    with_rem=True)
            coefs = sign_hide_batch(coefs, nn, 0, du)
        else:
            coefs = quant_batch(dct_batch(resi, nn, bit_depth), nn, qqp,
                                bit_depth, intra=False)
        cbf = jnp.any(coefs != 0, axis=(1, 2))
        r = idct_batch(dequant_batch(coefs, nn, qqp, bit_depth), nn,
                       bit_depth)
        rec = jnp.where(cbf[:, None, None], jnp.clip(pred + r, 0, maxv),
                        pred)
        coefs = jnp.where(cbf[:, None, None], coefs, 0)
        return rec, coefs

    rec_y, cf_y = one_plane(orig_y, r0y, r1y, n, x0s, y0s, qp, True)
    cn = n >> 1
    rec_cb, cf_cb = one_plane(orig_cb, r0cb, r1cb, cn, x0s // 2, y0s // 2,
                              qpc, False)
    rec_cr, cf_cr = one_plane(orig_cr, r0cr, r1cr, cn, x0s // 2, y0s // 2,
                              qpc, False)
    return (to_plane(rec_y, n, h, w), to_plane(cf_y, n, h, w),
            to_plane(rec_cb, cn, h // 2, w // 2),
            to_plane(cf_cb, cn, h // 2, w // 2),
            to_plane(rec_cr, cn, h // 2, w // 2),
            to_plane(cf_cr, cn, h // 2, w // 2))


def encode_b_frame_arrays(orig_y, orig_cb, orig_cr, ref0: ReconFrame,
                          ref1: ReconFrame, cfg: EncoderConfig,
                          poc: int, poc_refs: tuple[int, int],
                          qp: int | None = None
                          ) -> tuple[FrameBSyntax, ReconFrame]:
    h, w = orig_y.shape
    hp = (h + 31) // 32 * 32
    wp = (w + 31) // 32 * 32

    def padp(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    oy = padp(orig_y, hp, wp)
    ocb = padp(orig_cb, hp // 2, wp // 2)
    ocr = padp(orig_cr, hp // 2, wp // 2)
    refs = []
    for r in (ref0, ref1):
        refs.append((padp(r.y, hp, wp), padp(r.cb, hp // 2, wp // 2),
                     padp(r.cr, hp // 2, wp // 2)))
    real_h, real_w = h, w
    h, w = hp, wp
    qp = cfg.qp if qp is None else qp
    qpc = chroma_qp(qp)
    lam = lambda_from_qp(qp)
    sizes = [8, 16, 32]

    f0 = motion_search_frame(oy, refs[0][0], qp, sizes=tuple(sizes),
                             bit_depth=cfg.bit_depth)
    f1 = motion_search_frame(oy, refs[1][0], qp, sizes=tuple(sizes),
                             bit_depth=cfg.bit_depth)
    oyj = jnp.asarray(oy.astype(np.int32))
    r0j = [jnp.asarray(p.astype(np.int32)) for p in refs[0]]
    r1j = [jnp.asarray(p.astype(np.int32)) for p in refs[1]]

    # per-size pred choice: L0 / L1 / BI by SATD + signalling cost
    choice = {}
    cost = {}
    for n in sizes:
        c0 = f0[n][1].astype(np.float64)
        c1 = f1[n][1].astype(np.float64)
        cbi = np.asarray(_bi_cost_size(
            oyj, r0j[0], r1j[0], jnp.asarray(f0[n][0]),
            jnp.asarray(f1[n][0]), n=n,
            bit_depth=cfg.bit_depth)).astype(np.float64)
        c0 = c0 + lam * 2
        c1 = c1 + lam * 2
        cbi = cbi + lam * (2 + 8)     # two MVDs
        stack = np.stack([c0, c1, cbi])
        choice[n] = np.argmin(stack, axis=0).astype(np.int32)   # 0/1/2
        cost[n] = stack.min(axis=0)
        by, bx = cost[n].shape
        ys, xs = np.meshgrid(np.arange(by), np.arange(bx), indexing="ij")
        over = ((ys + 1) * n > real_h) | ((xs + 1) * n > real_w)
        cost[n] = np.where(over, np.inf, cost[n])

    agg = np.where(np.isinf(cost[8]), 0, cost[8])
    ch16 = agg.reshape(cost[16].shape[0], 2, cost[16].shape[1], 2) \
        .sum(axis=(1, 3)) + lam * 4.0
    keep16 = cost[16] <= ch16
    agg16 = np.where(keep16, cost[16], ch16)
    agg16 = np.where(np.isinf(agg16), 0, agg16)
    ch32 = agg16.reshape(cost[32].shape[0], 2, cost[32].shape[1], 2) \
        .sum(axis=(1, 3)) + lam * 4.0
    keep32 = cost[32] <= ch32

    n8y, n8x = h // 8, w // 8
    k32 = np.repeat(np.repeat(keep32, 4, 0), 4, 1)[:n8y, :n8x]
    k16 = np.repeat(np.repeat(keep16, 2, 0), 2, 1)[:n8y, :n8x]
    depth8 = np.where(k32, 0, np.where(k16, 1, 2)).astype(np.uint8)

    def up(a, k):
        return np.repeat(np.repeat(a, k, 0), k, 1)[:n8y, :n8x]

    def up_mv(mv, k):
        return np.repeat(np.repeat(mv, k, 0), k, 1)[:n8y, :n8x]

    ch8 = np.where(k32, up(choice[32], 4),
                   np.where(k16, up(choice[16], 2), choice[8][:n8y, :n8x]))
    pf8 = np.where(ch8 == 0, 1, np.where(ch8 == 1, 2, 3)).astype(np.uint8)
    mv0_8 = np.where(k32[..., None], up_mv(f0[32][0], 4),
                     np.where(k16[..., None], up_mv(f0[16][0], 2),
                              f0[8][0][:n8y, :n8x])).astype(np.int32)
    mv1_8 = np.where(k32[..., None], up_mv(f1[32][0], 4),
                     np.where(k16[..., None], up_mv(f1[16][0], 2),
                              f1[8][0][:n8y, :n8x])).astype(np.int32)
    # unused lists carry zero MVs (canonical form for signalling)
    mv0_8 = np.where((pf8[..., None] & 1) != 0, mv0_8, 0)
    mv1_8 = np.where((pf8[..., None] & 2) != 0, mv1_8, 0)
    mv8 = np.stack([mv0_8, mv1_8], axis=2)        # (n8y, n8x, 2, 2)

    planes = {}
    for n in sizes:
        by, bx = h // n, w // n
        s = n // 8
        g0 = mv8[::s, ::s, 0][:by, :bx]
        g1 = mv8[::s, ::s, 1][:by, :bx]
        gpf = pf8[::s, ::s][:by, :bx]
        planes[n] = _b_recon_size(
            oyj, jnp.asarray(ocb.astype(np.int32)),
            jnp.asarray(ocr.astype(np.int32)), r0j[0], r0j[1], r0j[2],
            r1j[0], r1j[1], r1j[2], jnp.asarray(g0), jnp.asarray(g1),
            jnp.asarray(gpf.astype(np.int32)), jnp.int32(qp),
            jnp.int32(qpc), n=n, bit_depth=cfg.bit_depth,
            sign_hiding=cfg.sign_hiding)

    rec_y = np.zeros((h, w), np.int32)
    cf_y = np.zeros((h, w), np.int32)
    rec_cb = np.zeros((h // 2, w // 2), np.int32)
    cf_cb = np.zeros((h // 2, w // 2), np.int32)
    rec_cr = np.zeros((h // 2, w // 2), np.int32)
    cf_cr = np.zeros((h // 2, w // 2), np.int32)
    for d, n in {0: 32, 1: 16, 2: 8}.items():
        m8 = depth8 == d
        mpx = np.repeat(np.repeat(m8, 8, 0), 8, 1)
        mpx_c = np.repeat(np.repeat(m8, 4, 0), 4, 1)
        py, pcy, pcb, pccb, pcr, pccr = [np.asarray(p) for p in planes[n]]
        rec_y = np.where(mpx, py, rec_y)
        cf_y = np.where(mpx, pcy, cf_y)
        rec_cb = np.where(mpx_c, pcb, rec_cb)
        cf_cb = np.where(mpx_c, pccb, cf_cb)
        rec_cr = np.where(mpx_c, pcr, rec_cr)
        cf_cr = np.where(mpx_c, pccr, cf_cr)

    rh, rw = real_h, real_w
    syn = FrameBSyntax(depth8=depth8[:rh // 8, :rw // 8],
                       mv8=mv8[:rh // 8, :rw // 8],
                       pf8=pf8[:rh // 8, :rw // 8],
                       coeff_y=cf_y[:rh, :rw],
                       coeff_cb=cf_cb[:rh // 2, :rw // 2],
                       coeff_cr=cf_cr[:rh // 2, :rw // 2],
                       poc=poc, poc_refs=poc_refs)
    return syn, ReconFrame(rec_y[:rh, :rw], rec_cb[:rh // 2, :rw // 2],
                           rec_cr[:rh // 2, :rw // 2])
