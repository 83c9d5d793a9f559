"""P-frame encoding: dense ME + fully parallel MC reconstruction.

TPU-first observation: unlike intra, inter reconstruction has NO
intra-frame pixel dependency (prediction reads only the reference
picture), so the whole P frame reconstructs in one batched pass — no
wavefront. The serial part of x265's inter path (AMVP/merge context
from neighbour CUs, analysis.cpp compressInterCU) is sidestepped by
fixing each CU's final MV in the dense decision; merge/AMVP signalling
is then pure bookkeeping derived identically by encoder and decoder
from the same decoded MV field (common/mv_derive.py).

v1 scope: IPPP, one L0 reference, 2Nx2N inter CUs (no intra CUs inside
P frames yet), TU == CU.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream.syntax import FramePSyntax
from ..common.params import EncoderConfig
from ..common.tables import chroma_qp, lambda_from_qp
from ..ops.interp import mc_block_batch
from ..ops.me import motion_search_frame
from ..ops.transforms import dct_batch, idct_batch, quant_batch, dequant_batch
from .intra_recon import ReconFrame


@partial(jax.jit, static_argnames=("n", "bit_depth"))
def _mc_recon_size(orig_y, orig_cb, orig_cr, ref_y, ref_cb, ref_cr,
                   mvgrid, qp, qpc, *, n: int, bit_depth: int):
    """Dense MC + residual coding for every n-block of the frame.

    mvgrid: (by, bx, 2) qpel. Returns (recon_y, coeff_y, recon_cb,
    coeff_cb, recon_cr, coeff_cr) full planes for this block size.
    """
    h, w = orig_y.shape
    by, bx = h // n, w // n
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    mvx = mvgrid[..., 0].reshape(-1)
    mvy = mvgrid[..., 1].reshape(-1)

    def blocks_of(plane, nn):
        bby, bbx = plane.shape[0] // nn, plane.shape[1] // nn
        return plane.reshape(bby, nn, bbx, nn).transpose(0, 2, 1, 3) \
            .reshape(-1, nn, nn).astype(jnp.int32)

    def to_plane(blocks, nn, hh, ww):
        bby, bbx = hh // nn, ww // nn
        return blocks.reshape(bby, bbx, nn, nn).transpose(0, 2, 1, 3) \
            .reshape(hh, ww)

    maxv = (1 << bit_depth) - 1

    def one_plane(orig, ref, nn, x0, y0, qqp, is_luma):
        pred = mc_block_batch(ref, x0, y0, mvx, mvy, nn, is_luma=is_luma,
                              bit_depth=bit_depth)
        ob = blocks_of(orig, nn)
        resi = ob - pred
        coefs = quant_batch(dct_batch(resi, nn, bit_depth), nn, qqp,
                            bit_depth, intra=False)
        cbf = jnp.any(coefs != 0, axis=(1, 2))
        r = idct_batch(dequant_batch(coefs, nn, qqp, bit_depth), nn,
                       bit_depth)
        rec = jnp.where(cbf[:, None, None], jnp.clip(pred + r, 0, maxv),
                        pred)
        coefs = jnp.where(cbf[:, None, None], coefs, 0)
        return rec, coefs

    rec_y, cf_y = one_plane(orig_y, ref_y, n, x0s, y0s, qp, True)
    cn = n >> 1
    rec_cb, cf_cb = one_plane(orig_cb, ref_cb, cn, x0s // 2, y0s // 2,
                              qpc, False)
    rec_cr, cf_cr = one_plane(orig_cr, ref_cr, cn, x0s // 2, y0s // 2,
                              qpc, False)
    return (to_plane(rec_y, n, h, w), to_plane(cf_y, n, h, w),
            to_plane(rec_cb, cn, h // 2, w // 2),
            to_plane(cf_cb, cn, h // 2, w // 2),
            to_plane(rec_cr, cn, h // 2, w // 2),
            to_plane(cf_cr, cn, h // 2, w // 2))


def encode_p_frame_arrays(orig_y: np.ndarray, orig_cb: np.ndarray,
                          orig_cr: np.ndarray, ref: ReconFrame,
                          cfg: EncoderConfig, qp: int | None = None
                          ) -> tuple[FramePSyntax, ReconFrame]:
    """Full P-frame decision + reconstruction. Planes already padded to
    8-multiples (the coded size); internally everything runs on
    32-multiples and is cropped back."""
    h, w = orig_y.shape
    hp = (h + 31) // 32 * 32
    wp = (w + 31) // 32 * 32

    def padp(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    oy_np = padp(orig_y, hp, wp)
    ocb_np = padp(orig_cb, hp // 2, wp // 2)
    ocr_np = padp(orig_cr, hp // 2, wp // 2)
    ref_y = padp(ref.y, hp, wp)
    ref_cb = padp(ref.cb, hp // 2, wp // 2)
    ref_cr = padp(ref.cr, hp // 2, wp // 2)
    real_h, real_w = h, w
    h, w = hp, wp
    qp = cfg.qp if qp is None else qp
    qpc = chroma_qp(qp)
    lam = lambda_from_qp(qp)
    sizes = [8, 16, 32]
    fields = motion_search_frame(oy_np, ref_y, qp, sizes=tuple(sizes),
                                 bit_depth=cfg.bit_depth)

    # bottom-up depth decision on ME costs (+ per-CU header overhead)
    hdr_bits = {8: 6.0, 16: 6.0, 32: 6.0}
    cost = {n: fields[n][1].astype(np.float64) + lam * hdr_bits[n]
            for n in sizes}
    # partial blocks can't be chosen whole
    for n in sizes:
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

    n8y, n8x = h // 8, w // 8     # padded grid; cropped at the end
    k32 = np.repeat(np.repeat(keep32, 4, 0), 4, 1)[:n8y, :n8x]
    k16 = np.repeat(np.repeat(keep16, 2, 0), 2, 1)[:n8y, :n8x]
    depth8 = np.where(k32, 0, np.where(k16, 1, 2)).astype(np.uint8)

    def up_mv(mv, k):
        return np.repeat(np.repeat(mv, k, 0), k, 1)[:n8y, :n8x]

    mv8 = np.where(k32[..., None], up_mv(fields[32][0], 4),
                   np.where(k16[..., None], up_mv(fields[16][0], 2),
                            fields[8][0][:n8y, :n8x])).astype(np.int32)

    # dense MC recon per size, composed by depth masks
    oy = jnp.asarray(oy_np.astype(np.int32))
    ocb = jnp.asarray(ocb_np.astype(np.int32))
    ocr = jnp.asarray(ocr_np.astype(np.int32))
    ry = jnp.asarray(ref_y.astype(np.int32))
    rcb = jnp.asarray(ref_cb.astype(np.int32))
    rcr = jnp.asarray(ref_cr.astype(np.int32))

    # per-size MV grids with the FINAL mv8 values (so every size's dense
    # pass uses the chosen MV of the covering CU)
    planes = {}
    for n in sizes:
        by, bx = h // n, w // n
        s = n // 8
        grid = mv8[::s, ::s][:by, :bx]
        planes[n] = _mc_recon_size(oy, ocb, ocr, ry, rcb, rcr,
                                   jnp.asarray(grid), jnp.int32(qp),
                                   jnp.int32(qpc), n=n,
                                   bit_depth=cfg.bit_depth)

    sel8 = {0: k32, 1: k16}
    size_of_depth = {0: 32, 1: 16, 2: 8}
    rec_y = np.zeros((h, w), np.int32)
    cf_y = np.zeros((h, w), np.int32)
    rec_cb = np.zeros((h // 2, w // 2), np.int32)
    cf_cb = np.zeros((h // 2, w // 2), np.int32)
    rec_cr = np.zeros((h // 2, w // 2), np.int32)
    cf_cr = np.zeros((h // 2, w // 2), np.int32)
    for d, n in size_of_depth.items():
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

    # crop back to the coded (8-aligned) frame size
    rh, rw = real_h, real_w
    syn = FramePSyntax(depth8=depth8[:rh // 8, :rw // 8],
                       mv8=mv8[:rh // 8, :rw // 8],
                       coeff_y=cf_y[:rh, :rw],
                       coeff_cb=cf_cb[:rh // 2, :rw // 2],
                       coeff_cr=cf_cr[:rh // 2, :rw // 2])
    return syn, ReconFrame(rec_y[:rh, :rw], rec_cb[:rh // 2, :rw // 2],
                           rec_cr[:rh // 2, :rw // 2])
