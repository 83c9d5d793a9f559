"""Batched device wavefront intra reconstruction (JAX/XLA).

TPU-first replacement for x265's WPP row threads + frame threads
(reference: source/encoder/frameencoder.cpp processRowEncoder and the
frame-parallelism contract in doc/reST/threading.rst:123-215): CTUs are
processed along anti-diagonals d = cx + 2*cy (the same 2:1 dependency
slope WPP uses), and a whole GOP of frames rides the SAME wavefront —
frames are independent, so batching them multiplies arithmetic
intensity per sequential step without adding steps. Inside a CTU the
z-scan is a statically unrolled 16-step sweep with all three CU sizes
evaluated masked; control flow becomes tensor select, shapes stay
static, prediction and transforms run on the MXU.

Bit-exactness contract: identical recon + coefficients to the
intra_recon.py host oracle (asserted in tests), which equals the
validation decoder's output.
"""

from __future__ import annotations

from functools import lru_cache, partial

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


def _zindex(bx: int, by: int) -> int:
    """min-block (bx, by) -> z-scan index within the CTU."""
    return (((by >> 1) & 1) << 3) | (((bx >> 1) & 1) << 2) | \
        ((by & 1) << 1) | (bx & 1)


def _ref_geometry(n: int, ox: int, oy: int, p: int, ctu: int = 32):
    """Static canonical-ref geometry for a CU of size n at (ox, oy).

    Returns (rx, ry, z_ok): (4n+1,) tile-relative coords and static
    decode-order availability (picture borders checked at runtime).
    `p` is the z index of the current min-block (ctu/4 px granularity).
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
            z_ok[i] = _zindex(x >> bshift, y >> bshift) < p
    return rx, ry, z_ok


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
    """Reconstruct one masked CU (size n at static (ox,oy)) per batch
    element. ext: (B, EH, EW) halo tile; orig_tile: (B, ctu, ctu);
    modes/active: (B,). Returns updated (ext, cf_tile)."""
    rx, ry, z_ok = _ref_geometry(n, ox, oy, p, ctu)
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


def _diag_step(rec_y, rec_c, cf_y, cf_c, f0s, x0s, y0s, dt, mt,
               org_y, org_c, *, qp: int, qpc: int, bit_depth: int,
               w: int, h: int, ctu: int = 32):
    """One CTU anti-diagonal across the whole frame batch.

    rec_y: (F, Hp, Wp) halo-padded luma; rec_c: (2F, Hp/2, Wp/2) halo-
    padded chroma (cb frames then cr frames). cf_*: coefficient planes.
    f0s/x0s/y0s: (B,) frame index + CTU origins; dt/mt: (B, 4, 4).
    """
    b = x0s.shape[0]
    half = ctu // 2

    def g(plane3, f0, y0, x0, hh, ww):
        return jax.vmap(lambda f, yy, xx: jax.lax.dynamic_slice(
            plane3, (f, yy, xx), (1, hh, ww))[0])(f0, y0, x0)

    nf = rec_y.shape[0]
    fc = jnp.concatenate([f0s, f0s + nf])            # chroma batch: cb|cr
    x0c = jnp.concatenate([x0s, x0s]) // 2
    y0c = jnp.concatenate([y0s, y0s]) // 2

    ext_y = g(rec_y, f0s, y0s, x0s, EXT_H, EXT_W)
    ext_c = g(rec_c, fc, y0c, x0c, CEXT_H, CEXT_W)
    oy_t = g(org_y, f0s, y0s, x0s, ctu, ctu)
    oc_t = g(org_c, fc, y0c, x0c, half, half)
    cfy_t = jnp.zeros((b, ctu, ctu), jnp.int32)
    cfc_t = jnp.zeros((2 * b, half, half), jnp.int32)

    cw, chh = w // 2, h // 2
    for p in range(16):
        ox, oy = _zpos(p)
        d = dt[:, oy >> 3, ox >> 3]
        m = mt[:, oy >> 3, ox >> 3].astype(jnp.int32)
        m2 = jnp.concatenate([m, m])
        plans = [(8, ox, oy, d == 2)]
        if p % 4 == 0:
            plans.append((16, (ox >> 4) << 4, (oy >> 4) << 4, d == 1))
        if p == 0:
            plans.append((32, 0, 0, d == 0))
        for n, cox, coy, act in plans:
            ext_y, cfy_t = _process_cu(
                ext_y, cfy_t, oy_t, x0s, y0s, m, act, n, cox, coy, p,
                qp, bit_depth, w, h, True, ctu)
            act2 = jnp.concatenate([act, act])
            ext_c, cfc_t = _process_cu(
                ext_c, cfc_t, oc_t, x0c * 1, y0c * 1, m2, act2, n >> 1,
                cox >> 1, coy >> 1, p, qpc, bit_depth, cw, chh, False,
                ctu // 2)

    def scat(plane3, tile, f0, y0, x0, hh, ww, off):
        bb = tile.shape[0]
        fs = f0[:, None, None] + jnp.zeros((bb, hh, ww), jnp.int32)
        ys = y0[:, None, None] + off + \
            jax.lax.broadcasted_iota(jnp.int32, (bb, hh, ww), 1)
        xs = x0[:, None, None] + off + \
            jax.lax.broadcasted_iota(jnp.int32, (bb, hh, ww), 2)
        return plane3.at[fs, ys, xs].set(tile, mode="drop")

    rec_y = scat(rec_y, ext_y[:, 1:, 1:1 + ctu], f0s, y0s, x0s,
                 ctu, ctu, 1)
    rec_c = scat(rec_c, ext_c[:, 1:, 1:1 + half], fc, y0c, x0c,
                 half, half, 1)
    cf_y = scat(cf_y, cfy_t, f0s, y0s, x0s, ctu, ctu, 0)
    cf_c = scat(cf_c, cfc_t, fc, y0c, x0c, half, half, 0)
    return rec_y, rec_c, cf_y, cf_c


@partial(jax.jit, static_argnames=("qp", "qpc", "bit_depth", "w", "h",
                                   "ctu"),
         donate_argnums=(0, 1, 2, 3))
def _recon_scan(rec_y, rec_c, cf_y, cf_c, f0s, x0a, y0a, dta, mta,
                org_y, org_c, qp, qpc, *, bit_depth: int,
                w: int, h: int, ctu: int = 32):
    # qp static here on purpose: the wavefront scan is the largest jit
    # in the encoder and dynamic-shift quantization costs ~2x on TPU;
    # intra frames are rare under rate control, so per-QP compiles are
    # cheap and cached
    """Whole-GOP wavefront as one lax.scan over diagonals — a single
    device dispatch for the batch (x265 analog: the entire WPP frame
    compress across all frame threads, frameencoder.cpp:850-880)."""

    def body(carry, xs):
        ry, rc, fy, fc = carry
        x0s, y0s, dt, mt = xs
        out = _diag_step(ry, rc, fy, fc, f0s, x0s, y0s, dt, mt,
                         org_y, org_c, qp=qp, qpc=qpc,
                         bit_depth=bit_depth, w=w, h=h, ctu=ctu)
        return out, ()

    carry = (rec_y, rec_c, cf_y, cf_c)
    carry, _ = jax.lax.scan(body, carry, (x0a, y0a, dta, mta))
    return carry


@lru_cache(maxsize=None)
def _wavefront_schedule(ncx: int, ncy: int, ctu: int):
    """Static (ndiag, bmax) CTU-origin schedule + tile gather indices."""
    ndiag = (ncx - 1) + 2 * (ncy - 1) + 1
    diags = []
    bmax = 0
    for d in range(ndiag):
        cells = [(d - 2 * cy, cy) for cy in range(ncy)
                 if 0 <= d - 2 * cy < ncx]
        diags.append(cells)
        bmax = max(bmax, len(cells))
    far = 1 << 20
    x0a = np.full((ndiag, bmax), far, np.int32)
    y0a = np.full((ndiag, bmax), far, np.int32)
    cell_idx = np.zeros((ndiag, bmax), np.int32)   # cy*ncx+cx (clamped)
    valid = np.zeros((ndiag, bmax), bool)
    for d, cells in enumerate(diags):
        for j, (cx, cy) in enumerate(cells):
            x0a[d, j] = cx * ctu
            y0a[d, j] = cy * ctu
            cell_idx[d, j] = cy * ncx + cx
            valid[d, j] = True
    return ndiag, bmax, x0a, y0a, cell_idx, valid


def reconstruct_intra_gop_tpu(orig_y: np.ndarray, orig_cb: np.ndarray,
                              orig_cr: np.ndarray, depth8: np.ndarray,
                              mode8: np.ndarray, cfg: EncoderConfig,
                              qp: int | None = None
                              ) -> tuple[list[FrameIntraSyntax],
                                         list[ReconFrame]]:
    """Reconstruct a batch of frames. orig_y: (F, H, W) padded planes;
    depth8/mode8: (F, n8y, n8x)."""
    assert cfg.ctu_size == 32, "device wavefront currently tuned for CTU32"
    nf, h, w = orig_y.shape
    ctu = cfg.ctu_size
    ncx = (w + ctu - 1) // ctu
    ncy = (h + ctu - 1) // ctu
    qp_frame = cfg.qp if qp is None else qp
    qpc = chroma_qp(qp_frame)

    rec_y = jnp.zeros((nf, h + 1 + EXT_H, w + 1 + EXT_W), jnp.int32)
    rec_c = jnp.zeros((2 * nf, h // 2 + 1 + CEXT_H, w // 2 + 1 + CEXT_W),
                      jnp.int32)
    cf_y = jnp.zeros((nf, h, w), jnp.int32)
    cf_c = jnp.zeros((2 * nf, h // 2, w // 2), jnp.int32)

    def _pad_ctu(p: np.ndarray, mult: int) -> np.ndarray:
        ph = (p.shape[1] + mult - 1) // mult * mult
        pw = (p.shape[2] + mult - 1) // mult * mult
        return np.pad(p, ((0, 0), (0, ph - p.shape[1]),
                          (0, pw - p.shape[2])), mode="edge")

    org_y = jnp.asarray(_pad_ctu(orig_y, ctu).astype(np.int32))
    org_c = jnp.asarray(_pad_ctu(
        np.concatenate([orig_cb, orig_cr]), ctu // 2).astype(np.int32))

    # per-CTU decision tiles (F, ncy*ncx, 4, 4), vectorized
    n8 = ctu // 8
    n8y, n8x = depth8.shape[1:]
    dpad = np.full((nf, ncy * n8, ncx * n8), 2, np.uint8)
    mpad = np.ones((nf, ncy * n8, ncx * n8), np.uint8)
    dpad[:, :n8y, :n8x] = depth8
    mpad[:, :n8y, :n8x] = mode8
    dt_all = dpad.reshape(nf, ncy, n8, ncx, n8).transpose(0, 1, 3, 2, 4) \
        .reshape(nf, ncy * ncx, n8, n8).astype(np.int32)
    mt_all = mpad.reshape(nf, ncy, n8, ncx, n8).transpose(0, 1, 3, 2, 4) \
        .reshape(nf, ncy * ncx, n8, n8).astype(np.int32)

    ndiag, bmax, x0a, y0a, cell_idx, valid = _wavefront_schedule(
        ncx, ncy, ctu)
    # batch layout: b = f * bmax + j
    x0b = np.broadcast_to(x0a[:, None, :], (ndiag, nf, bmax)) \
        .reshape(ndiag, nf * bmax)
    y0b = np.broadcast_to(y0a[:, None, :], (ndiag, nf, bmax)) \
        .reshape(ndiag, nf * bmax)
    f0s = np.broadcast_to(np.arange(nf, dtype=np.int32)[:, None],
                          (nf, bmax)).reshape(-1)
    dta = dt_all[:, cell_idx]                     # (F, ndiag, bmax, 4, 4)
    mta = mt_all[:, cell_idx]
    dta = np.where(valid[None, :, :, None, None], dta, 2) \
        .transpose(1, 0, 2, 3, 4).reshape(ndiag, nf * bmax, n8, n8)
    mta = np.where(valid[None, :, :, None, None], mta, 1) \
        .transpose(1, 0, 2, 3, 4).reshape(ndiag, nf * bmax, n8, n8)

    rec_y, rec_c, cf_y, cf_c = _recon_scan(
        rec_y, rec_c, cf_y, cf_c, jnp.asarray(f0s), jnp.asarray(x0b),
        jnp.asarray(y0b), jnp.asarray(dta), jnp.asarray(mta),
        org_y, org_c, qp=int(qp_frame), qpc=int(qpc),
        bit_depth=cfg.bit_depth, w=w, h=h, ctu=ctu)

    rec_y_np = np.asarray(rec_y[:, 1:h + 1, 1:w + 1])
    rec_c_np = np.asarray(rec_c[:, 1:h // 2 + 1, 1:w // 2 + 1])
    cf_y_np = np.asarray(cf_y)
    cf_c_np = np.asarray(cf_c)
    syns, recons = [], []
    for f in range(nf):
        syns.append(FrameIntraSyntax(
            depth8=depth8[f], mode8=mode8[f], coeff_y=cf_y_np[f],
            coeff_cb=cf_c_np[f], coeff_cr=cf_c_np[nf + f]))
        recons.append(ReconFrame(rec_y_np[f], rec_c_np[f],
                                 rec_c_np[nf + f]))
    return syns, recons


def reconstruct_intra_frame_tpu(orig_y: np.ndarray, orig_cb: np.ndarray,
                                orig_cr: np.ndarray, depth8: np.ndarray,
                                mode8: np.ndarray, cfg: EncoderConfig,
                                qp: int | None = None
                                ) -> tuple[FrameIntraSyntax, ReconFrame]:
    syns, recons = reconstruct_intra_gop_tpu(
        orig_y[None], orig_cb[None], orig_cr[None], depth8[None],
        mode8[None], cfg, qp)
    return syns[0], recons[0]
