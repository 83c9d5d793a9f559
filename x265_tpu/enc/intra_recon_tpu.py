"""Batched device wavefront intra reconstruction (JAX/XLA).

TPU-first replacement for x265's WPP row threads (reference:
source/encoder/frameencoder.cpp processRowEncoder): the frame's CTUs are
processed along anti-diagonals d = cx + 2*cy (the same 2:1 dependency
slope WPP uses); every CTU on a diagonal reconstructs concurrently as
one batch. Inside a CTU the z-scan is a STATICALLY UNROLLED 16-step
sweep over min-CU positions, with all three CU sizes evaluated masked —
control flow becomes tensor select, shapes stay static, the 35-mode
predictor and the transform pipeline run on the MXU.

Bit-exactness contract: this pass produces the identical recon and
coefficients as intra_recon.py's host oracle (asserted in tests), which
in turn equals the validation decoder's output.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream.syntax import FrameIntraSyntax
from ..common.params import EncoderConfig
from ..common.tables import chroma_qp
from ..ops.intra import intra_pred_all_modes
from ..ops.transforms import dct_batch, idct_batch, quant_batch, dequant_batch
from .intra_recon import ReconFrame

# ext tile geometry for a 32-CTU: 1 halo row/col on top/left, 2*CTU wide
# top halo for top-right references
EXT_H = 33
EXT_W = 65
CEXT_H = 17
CEXT_W = 33


def _zpos(p: int) -> tuple[int, int]:
    """z-order position p (0..15) -> (ox, oy) in 8px units * 8."""
    ox = ((p >> 2) & 1) * 16 + (p & 1) * 8
    oy = ((p >> 3) & 1) * 16 + ((p >> 1) & 1) * 8
    return ox, oy


def _ref_geometry(n: int, ox: int, oy: int, p: int, ctu: int = 32):
    """Static canonical-ref geometry for a CU of size n at (ox, oy).

    Returns (rx, ry, z_ok): arrays (4n+1,) of tile-relative coords and
    the static decode-order availability (picture-border checks are
    applied at runtime). `p` is the z index of the current min-block;
    the min-block size is ctu/4 (8 px luma, 4 px chroma).
    """
    k = 4 * n + 1
    bshift = (ctu // 4).bit_length() - 1    # 3 luma / 2 chroma
    rx = np.zeros(k, dtype=np.int32)
    ry = np.zeros(k, dtype=np.int32)
    for i in range(k):
        if i < 2 * n:
            rx[i], ry[i] = ox - 1, oy + (2 * n - 1 - i)
        elif i == 2 * n:
            rx[i], ry[i] = ox - 1, oy - 1
        else:
            rx[i], ry[i] = ox + (i - 2 * n - 1), oy - 1
    z_ok = np.zeros(k, dtype=bool)
    for i in range(k):
        x, y = int(rx[i]), int(ry[i])
        if y < 0:
            z_ok[i] = True          # top CTU row (or top-right CTU)
        elif x < 0:
            z_ok[i] = y < ctu       # left CTU column; below it: undecoded
        elif x >= ctu or y >= ctu:
            z_ok[i] = False         # right CTU (same row) / below: undecoded
        else:
            bz = _zindex(x >> bshift, y >> bshift)
            z_ok[i] = bz < p
    return rx, ry, z_ok


def _zindex(bx: int, by: int) -> int:
    """8x8 block (bx, by) -> z-scan index within the 32-CTU."""
    return (((by >> 1) & 1) << 3) | (((bx >> 1) & 1) << 2) | \
        ((by & 1) << 1) | (bx & 1)


def _substitute(refs: jnp.ndarray, avail: jnp.ndarray,
                bit_depth: int) -> jnp.ndarray:
    """Reference substitution (8.4.4.2.2) as a forward fill, batched."""
    b, k = refs.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    idx = jnp.where(avail, iota, -1)
    filled = jax.lax.cummax(idx, axis=1)
    first = jnp.argmax(avail, axis=1)
    firstval = jnp.take_along_axis(refs, first[:, None], axis=1)
    out = jnp.take_along_axis(refs, jnp.clip(filled, 0, k - 1), axis=1)
    out = jnp.where(filled >= 0, out, firstval)
    any_avail = jnp.any(avail, axis=1, keepdims=True)
    return jnp.where(any_avail, out, 1 << (bit_depth - 1))


def _process_cu(ext, cf_tile, orig_tile, x0s, y0s, modes, active,
                n, ox, oy, p, qp, bit_depth, w, h, is_luma, ctu):
    """Reconstruct one masked CU (size n at static (ox,oy)) for the batch.

    ext: (B, EH, EW) tile with halo; orig_tile: (B, ctu, ctu);
    modes: (B,) int32; active: (B,) bool. Returns updated (ext, cf_tile).
    """
    rx, ry, z_ok = _ref_geometry(n, ox, oy, p if is_luma else p, ctu)
    eh, ew = ext.shape[1], ext.shape[2]
    exti = (np.clip(ry + 1, 0, eh - 1) * ew +
            np.clip(rx + 1, 0, ew - 1)).astype(np.int32)
    b = ext.shape[0]
    flat = ext.reshape(b, -1)
    refs = jnp.take(flat, jnp.asarray(exti), axis=1)
    gx = x0s[:, None] + jnp.asarray(rx)[None, :]
    gy = y0s[:, None] + jnp.asarray(ry)[None, :]
    avail = jnp.asarray(z_ok)[None, :] & (gx >= 0) & (gy >= 0) & \
        (gx < w) & (gy < h)
    refs = _substitute(refs, avail, bit_depth)

    preds = intra_pred_all_modes(refs, n, is_luma=is_luma,
                                 bit_depth=bit_depth)     # (B,35,n,n)
    pred = jnp.take_along_axis(
        preds, modes[:, None, None, None], axis=1)[:, 0]  # (B,n,n)
    orig = orig_tile[:, oy:oy + n, ox:ox + n].astype(jnp.int32)
    resi = orig - pred
    coefs = quant_batch(dct_batch(resi, n, bit_depth), n, qp, bit_depth,
                        intra=True)
    cbf = jnp.any(coefs != 0, axis=(1, 2))
    r = idct_batch(dequant_batch(coefs, n, qp, bit_depth), n, bit_depth)
    maxv = (1 << bit_depth) - 1
    rec = jnp.where(cbf[:, None, None],
                    jnp.clip(pred + r, 0, maxv), pred)

    sel = active[:, None, None]
    cur = ext[:, oy + 1:oy + 1 + n, ox + 1:ox + 1 + n]
    ext = ext.at[:, oy + 1:oy + 1 + n, ox + 1:ox + 1 + n].set(
        jnp.where(sel, rec, cur))
    curc = cf_tile[:, oy:oy + n, ox:ox + n]
    cf_tile = cf_tile.at[:, oy:oy + n, ox:ox + n].set(
        jnp.where(sel, jnp.where(cbf[:, None, None], coefs, 0), curc))
    return ext, cf_tile


def _diag_step(rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr,
               x0s, y0s, dt, mt, org_y, org_cb, org_cr,
               *, qp: int, qpc: int, bit_depth: int, w: int, h: int,
               ctu: int = 32):
    """Process one CTU anti-diagonal batch.

    rec_*: halo-padded planes (+1 top/left, +EXT right/bottom margin).
    cf_*: coefficient planes (unpadded coords).
    x0s/y0s: (B,) CTU origins (luma); masked entries point far outside.
    dt/mt: (B, 4, 4) depth/mode tiles.
    """
    b = x0s.shape[0]
    half = ctu // 2

    # gather working tiles
    def g(plane, y0, x0, hh, ww):
        return jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            plane, (yy, xx), (hh, ww)))(y0, x0)

    ext_y = g(rec_y, y0s, x0s, EXT_H, EXT_W)
    ext_cb = g(rec_cb, y0s // 2, x0s // 2, CEXT_H, CEXT_W)
    ext_cr = g(rec_cr, y0s // 2, x0s // 2, CEXT_H, CEXT_W)
    oy_t = g(org_y, y0s, x0s, ctu, ctu)
    ocb_t = g(org_cb, y0s // 2, x0s // 2, half, half)
    ocr_t = g(org_cr, y0s // 2, x0s // 2, half, half)
    cfy_t = jnp.zeros((b, ctu, ctu), jnp.int32)
    cfcb_t = jnp.zeros((b, half, half), jnp.int32)
    cfcr_t = jnp.zeros((b, half, half), jnp.int32)

    cw, chh = w // 2, h // 2
    for p in range(16):
        ox, oy = _zpos(p)
        d = dt[:, oy >> 3, ox >> 3]
        m = mt[:, oy >> 3, ox >> 3].astype(jnp.int32)
        plans = [(8, ox, oy, d == 2)]
        if p % 4 == 0:
            plans.append((16, (ox >> 4) << 4, (oy >> 4) << 4, d == 1))
        if p == 0:
            plans.append((32, 0, 0, d == 0))
        for n, cox, coy, act in plans:
            ext_y, cfy_t = _process_cu(
                ext_y, cfy_t, oy_t, x0s, y0s, m, act, n, cox, coy, p,
                qp, bit_depth, w, h, True, ctu)
            cn = n >> 1
            ext_cb, cfcb_t = _process_cu(
                ext_cb, cfcb_t, ocb_t, x0s // 2, y0s // 2, m, act, cn,
                cox >> 1, coy >> 1, p, qpc, bit_depth, cw, chh, False,
                ctu // 2)
            ext_cr, cfcr_t = _process_cu(
                ext_cr, cfcr_t, ocr_t, x0s // 2, y0s // 2, m, act, cn,
                cox >> 1, coy >> 1, p, qpc, bit_depth, cw, chh, False,
                ctu // 2)

    # scatter tiles back (drop out-of-range = masked/pad CTUs)
    def scat(plane, tile, y0, x0, hh, ww, off):
        ys = y0[:, None, None] + off + \
            jax.lax.broadcasted_iota(jnp.int32, (b, hh, ww), 1)
        xs = x0[:, None, None] + off + \
            jax.lax.broadcasted_iota(jnp.int32, (b, hh, ww), 2)
        return plane.at[ys, xs].set(tile, mode="drop")

    rec_y = scat(rec_y, ext_y[:, 1:, 1:1 + ctu], y0s, x0s, ctu, ctu, 1)
    rec_cb = scat(rec_cb, ext_cb[:, 1:, 1:1 + half], y0s // 2, x0s // 2,
                  half, half, 1)
    rec_cr = scat(rec_cr, ext_cr[:, 1:, 1:1 + half], y0s // 2, x0s // 2,
                  half, half, 1)
    cf_y = scat(cf_y, cfy_t, y0s, x0s, ctu, ctu, 0)
    cf_cb = scat(cf_cb, cfcb_t, y0s // 2, x0s // 2, half, half, 0)
    cf_cr = scat(cf_cr, cfcr_t, y0s // 2, x0s // 2, half, half, 0)
    return rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr


@partial(jax.jit, static_argnames=("qp", "qpc", "bit_depth", "w", "h", "ctu"),
         donate_argnums=(0, 1, 2, 3, 4, 5))
def _recon_scan(rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr,
                x0a, y0a, dta, mta, org_y, org_cb, org_cr,
                *, qp: int, qpc: int, bit_depth: int, w: int, h: int,
                ctu: int = 32):
    """Whole-frame wavefront as one lax.scan over diagonals — a single
    device dispatch per frame (the x265 analog is the entire WPP frame
    compress, frameencoder.cpp:850-880)."""

    def body(carry, xs):
        ry, rcb, rcr, fy, fcb, fcr = carry
        x0s, y0s, dt, mt = xs
        out = _diag_step(ry, rcb, rcr, fy, fcb, fcr, x0s, y0s, dt, mt,
                         org_y, org_cb, org_cr, qp=qp, qpc=qpc,
                         bit_depth=bit_depth, w=w, h=h, ctu=ctu)
        return out, ()

    carry = (rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr)
    carry, _ = jax.lax.scan(body, carry, (x0a, y0a, dta, mta))
    return carry


def reconstruct_intra_frame_tpu(orig_y: np.ndarray, orig_cb: np.ndarray,
                                orig_cr: np.ndarray, depth8: np.ndarray,
                                mode8: np.ndarray, cfg: EncoderConfig
                                ) -> tuple[FrameIntraSyntax, ReconFrame]:
    assert cfg.ctu_size == 32, "device wavefront currently tuned for CTU32"
    h, w = orig_y.shape
    ctu = cfg.ctu_size
    ncx = (w + ctu - 1) // ctu
    ncy = (h + ctu - 1) // ctu
    qpc = chroma_qp(cfg.qp)

    # halo-padded recon planes: +1 top/left, + (EXT_W) right/bottom margin
    rec_y = jnp.zeros((h + 1 + EXT_H, w + 1 + EXT_W), jnp.int32)
    rec_cb = jnp.zeros((h // 2 + 1 + CEXT_H, w // 2 + 1 + CEXT_W), jnp.int32)
    rec_cr = jnp.zeros_like(rec_cb)
    cf_y = jnp.zeros((h, w), jnp.int32)
    cf_cb = jnp.zeros((h // 2, w // 2), jnp.int32)
    cf_cr = jnp.zeros((h // 2, w // 2), jnp.int32)
    # pad originals to CTU multiples: dynamic_slice clamps out-of-bounds
    # starts, which would silently shift the gather for partial CTUs
    def _pad_ctu(p: np.ndarray, mult: int) -> np.ndarray:
        ph = (p.shape[0] + mult - 1) // mult * mult
        pw = (p.shape[1] + mult - 1) // mult * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    org_y = jnp.asarray(_pad_ctu(orig_y, ctu).astype(np.int32))
    org_cb = jnp.asarray(_pad_ctu(orig_cb, ctu // 2).astype(np.int32))
    org_cr = jnp.asarray(_pad_ctu(orig_cr, ctu // 2).astype(np.int32))

    # per-CTU decision tiles
    n8 = ctu // 8
    dt_all = np.full((ncy, ncx, n8, n8), 2, dtype=np.int32)
    mt_all = np.ones((ncy, ncx, n8, n8), dtype=np.int32)
    n8y, n8x = depth8.shape
    for cy in range(ncy):
        for cx in range(ncx):
            ys, xs = cy * n8, cx * n8
            sy, sx = min(n8, n8y - ys), min(n8, n8x - xs)
            dt_all[cy, cx, :sy, :sx] = depth8[ys:ys + sy, xs:xs + sx]
            mt_all[cy, cx, :sy, :sx] = mode8[ys:ys + sy, xs:xs + sx]

    ndiag = (ncx - 1) + 2 * (ncy - 1) + 1
    # batch size: number of CTUs on the widest diagonal
    bmax = 0
    diags: list[list[tuple[int, int]]] = []
    for d in range(ndiag):
        cells = [(d - 2 * cy, cy) for cy in range(ncy)
                 if 0 <= d - 2 * cy < ncx]
        diags.append(cells)
        bmax = max(bmax, len(cells))

    far = 1 << 20
    x0a = np.full((ndiag, bmax), far, dtype=np.int32)
    y0a = np.full((ndiag, bmax), far, dtype=np.int32)
    dta = np.full((ndiag, bmax, n8, n8), 2, dtype=np.int32)
    mta = np.ones((ndiag, bmax, n8, n8), dtype=np.int32)
    for d, cells in enumerate(diags):
        for j, (cx, cy) in enumerate(cells):
            x0a[d, j] = cx * ctu
            y0a[d, j] = cy * ctu
            dta[d, j] = dt_all[cy, cx]
            mta[d, j] = mt_all[cy, cx]

    rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr = _recon_scan(
        rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr,
        jnp.asarray(x0a), jnp.asarray(y0a), jnp.asarray(dta),
        jnp.asarray(mta), org_y, org_cb, org_cr,
        qp=cfg.qp, qpc=qpc, bit_depth=cfg.bit_depth, w=w, h=h, ctu=ctu)

    ry = np.asarray(rec_y[1:h + 1, 1:w + 1])
    rcb = np.asarray(rec_cb[1:h // 2 + 1, 1:w // 2 + 1])
    rcr = np.asarray(rec_cr[1:h // 2 + 1, 1:w // 2 + 1])
    syn = FrameIntraSyntax(depth8=depth8, mode8=mode8,
                           coeff_y=np.asarray(cf_y),
                           coeff_cb=np.asarray(cf_cb),
                           coeff_cr=np.asarray(cf_cr))
    return syn, ReconFrame(ry, rcb, rcr)
