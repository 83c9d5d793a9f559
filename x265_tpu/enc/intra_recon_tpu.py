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

Storage is CTU-TILED: recon/coefficients live as (num_tiles, ctu, ctu)
arrays so halo assembly is contiguous axis-0 gathers and each step's
write-back is a whole-tile scatter. The natural (F, H, W) plane layout
needed 2D pixel-index scatters, which serialize on the TPU's scatter
unit and dominated the wavefront's runtime.

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
from ..ops.transforms import (dct_batch, idct_batch, quant_batch,
                              dequant_batch, sign_hide_batch)
from .intra_recon import ReconFrame

# ext halo geometry (used by the multichip dry-run too)
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


def _ref_geometry(n: int, ox: int, oy: int, p: int, ctu: int = 32,
                  sub: int | None = None, bl: bool = False):
    """Static canonical-ref geometry for a CU of size n at (ox, oy).

    Returns (rx, ry, z_ok): (4n+1,) tile-relative coords and static
    decode-order availability (picture borders checked at runtime).
    `p` is the z index of the current min-block (ctu/4 px granularity).
    `sub` (0..3), when given, refines availability to the 4x4 sub-TU
    z position inside min-block p (the PART_NxN luma path, ctu=32).
    `bl`: expose the below-left column (y in [ctu, 2ctu)) as statically
    available — the CTU-64 top-left-quadrant case, where those samples
    belong to the already-decoded left CTU's bottom-right quadrant
    (masked per tile at runtime by bl_ok).
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
            z_ok[i] = y < ctu or bl  # left column; below-left: CTU-64 TL
        elif x >= ctu or y >= ctu:
            z_ok[i] = False         # right CTU (same row) / below: undecoded
        elif sub is None:
            z_ok[i] = _zindex(x >> bshift, y >> bshift) < p
        else:
            # 4x4-granularity z order within the min-block sequence
            z4 = _zindex(x >> 3, y >> 3) * 4 + \
                ((((y >> 2) & 1) << 1) | ((x >> 2) & 1))
            z_ok[i] = z4 < p * 4 + sub
    return rx, ry, z_ok


def _substitute(refs: jnp.ndarray, avail: jnp.ndarray,
                bit_depth: int) -> jnp.ndarray:
    """Reference substitution (8.4.4.2.2) as a forward fill, batched.

    Value-space log-shift propagation: positions keep the last
    available value at-or-before them; a leading unavailable run takes
    the first available value (the spec's wrap). The earlier
    index-compute + take_along_axis form serialized on TPU (~17
    ms/frame in the P scan's intra stage)."""
    b, k = refs.shape
    val, ok = jnp.where(avail, refs, 0), avail
    s = 1
    while s < k:                       # forward: last valid <= i
        val = jnp.where(ok, val, jnp.pad(val, ((0, 0), (s, 0)))[:, :k])
        ok = ok | jnp.pad(ok, ((0, 0), (s, 0)))[:, :k]
        s <<= 1
    bval, bok = val, ok
    s = 1
    while s < k:                       # backward: first valid > i
        bval = jnp.where(bok, bval,
                         jnp.pad(bval, ((0, 0), (0, s)))[:, s:])
        bok = bok | jnp.pad(bok, ((0, 0), (0, s)))[:, s:]
        s <<= 1
    out = jnp.where(ok, val, bval)
    any_avail = jnp.any(avail, axis=1, keepdims=True)
    return jnp.where(any_avail, out, 1 << (bit_depth - 1))


def _process_cu(ext, cf_tile, orig_tile, x0s, y0s, modes, active,
                n, ox, oy, p, qp, bit_depth, w, h, is_luma, ctu,
                sign_hiding=False, sub=None, tr_ok=None,
                bl_ok=None, extbl=None):
    """Reconstruct one masked CU (size n at static (ox,oy)) per batch
    element. ext: (B, ctu+1, 2*ctu+1) halo tile; orig_tile: (B, ctu,
    ctu); modes/active: (B,). tr_ok ((B,) bool): whether the tile's
    above-right neighbour is decoded — False for the bottom-right
    quadrant of a 64-CTU, whose z-scan successor owns those samples.
    bl_ok/extbl: CTU-64 top-left quadrants additionally see the left
    CTU's bottom-right quadrant as their below-left column; extbl
    (B, ctu) carries that tile's right column, appended to the flat
    halo for indexing. Returns updated (ext, cf_tile)."""
    rx, ry, z_ok = _ref_geometry(n, ox, oy, p, ctu, sub=sub,
                                 bl=extbl is not None)
    eh, ew = ext.shape[1], ext.shape[2]
    base = eh * ew
    exti = np.where(
        (rx == -1) & (ry >= ctu),
        base + np.clip(ry - ctu, 0, ctu - 1),
        np.clip(ry + 1, 0, eh - 1) * ew + np.clip(rx + 1, 0, ew - 1)
    ).astype(np.int32)
    b = ext.shape[0]
    flat = ext.reshape(b, -1)
    if extbl is not None:
        flat = jnp.concatenate([flat, extbl], axis=1)
    else:
        # below-left reads clamp into the halo (masked unavailable)
        exti = np.minimum(exti, base - 1)
    refs = jnp.take(flat, jnp.asarray(exti), axis=1)
    gx = x0s[:, None] + jnp.asarray(rx)[None, :]
    gy = y0s[:, None] + jnp.asarray(ry)[None, :]
    avail = jnp.asarray(z_ok)[None, :] & (gx >= 0) & (gy >= 0) & \
        (gx < w) & (gy < h)
    if tr_ok is not None:
        tr_region = jnp.asarray((ry < 0) & (rx >= ctu))
        avail = avail & (tr_ok[:, None] | ~tr_region[None, :])
    if extbl is not None:
        bl_region = jnp.asarray((rx == -1) & (ry >= ctu))
        blm = bl_ok[:, None] if bl_ok is not None else False
        avail = avail & (blm | ~bl_region[None, :])
    refs = _substitute(refs, avail, bit_depth)

    preds = intra_pred_all_modes(refs, n, is_luma=is_luma,
                                 bit_depth=bit_depth)     # (B,35,n,n)
    moh = (jnp.arange(preds.shape[1], dtype=jnp.int32)[None, :]
           == modes[:, None]).astype(preds.dtype)
    pred = (preds * moh[:, :, None, None]).sum(1)         # (B,n,n)
    orig = orig_tile[:, oy:oy + n, ox:ox + n].astype(jnp.int32)
    resi = orig - pred
    dst = is_luma and n == 4           # DST-IV for 4x4 luma intra TBs
    if sign_hiding:
        coefs, du = quant_batch(dct_batch(resi, n, bit_depth, dst=dst),
                                n, qp, bit_depth, intra=True,
                                with_rem=True)
        if (is_luma and n <= 8) or (not is_luma and n == 4):
            # mode-dependent scan (clause 7.4.9.11): luma 4x4/8x8 and
            # chroma 4x4 TBs use HOR/VER scans for near-vertical/
            # horizontal modes
            sel = jnp.where((modes >= 6) & (modes <= 14), 2,
                            jnp.where((modes >= 22) & (modes <= 30), 1,
                                      0)).astype(jnp.int32)
        else:
            sel = 0
        coefs = sign_hide_batch(coefs, n, sel, du)
    else:
        coefs = quant_batch(dct_batch(resi, n, bit_depth, dst=dst), n,
                            qp, bit_depth, intra=True)
    cbf = jnp.any(coefs != 0, axis=(1, 2))
    r = idct_batch(dequant_batch(coefs, n, qp, bit_depth), n, bit_depth,
                   dst=dst)
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


def _assemble_ext(tiles, ti, ti_top, ti_topright, ti_topleft, ti_left,
                  n: int):
    """Build (B, n+1, 2n+1) ext halo tiles from the tiled recon store.

    tiles: (T, n, n) with slot 0 a dummy zero tile for absent
    neighbours (availability masking makes those values moot)."""
    own = jnp.take(tiles, ti, axis=0)                    # (B, n, n)
    top = jnp.take(tiles, ti_top, axis=0)[:, -1, :]      # (B, n)
    topright = jnp.take(tiles, ti_topright, axis=0)[:, -1, :]
    topleft = jnp.take(tiles, ti_topleft, axis=0)[:, -1, -1]  # (B,)
    left = jnp.take(tiles, ti_left, axis=0)[:, :, -1]    # (B, n)
    b = own.shape[0]
    ext = jnp.zeros((b, n + 1, 2 * n + 1), jnp.int32)
    ext = ext.at[:, 0, 0].set(topleft)
    ext = ext.at[:, 0, 1:n + 1].set(top)
    ext = ext.at[:, 0, n + 1:].set(topright)
    ext = ext.at[:, 1:, 0].set(left)
    ext = ext.at[:, 1:, 1:n + 1].set(own)
    return ext


def _diag_step(rec_y, rec_c, cf_y, cf_c, idx, dt, mt, ct, nt, m4t,
               org_y, org_c, *, qp: int, qpc: int, bit_depth: int,
               w: int, h: int, ctu: int = 32, sign_hiding: bool = False,
               intra_nxn: bool = False):
    """One CTU anti-diagonal across the whole frame batch (tiled)."""
    half = ctu // 2
    x0s, y0s = idx["x0"], idx["y0"]
    b = x0s.shape[0]
    ext_y = _assemble_ext(rec_y, idx["self_y"], idx["top_y"],
                          idx["topright_y"], idx["topleft_y"],
                          idx["left_y"], ctu)
    ext_c = _assemble_ext(rec_c, idx["self_c"], idx["top_c"],
                          idx["topright_c"], idx["topleft_c"],
                          idx["left_c"], half)
    oy_t = jnp.take(org_y, idx["self_o"], axis=0)
    oc_t = jnp.take(org_c, idx["self_oc"], axis=0)
    cfy_t = jnp.zeros((b, ctu, ctu), jnp.int32)
    cfc_t = jnp.zeros((2 * b, half, half), jnp.int32)

    x0c = jnp.concatenate([x0s, x0s]) // 2
    y0c = jnp.concatenate([y0s, y0s]) // 2
    cw, chh = w // 2, h // 2
    tr = idx.get("tr_ok")
    tr = None if tr is None else (tr != 0)
    tr2 = None if tr is None else jnp.concatenate([tr, tr])
    bl = idx.get("bl_ok")
    use_bl = bl is not None and "belowleft_y" in idx
    if use_bl:
        bl = bl != 0
        bl2 = jnp.concatenate([bl, bl])
        extbl_y = jnp.take(rec_y, idx["belowleft_y"], axis=0)[:, :, -1]
        extbl_c = jnp.take(rec_c, idx["belowleft_c"], axis=0)[:, :, -1]
    else:
        bl = bl2 = extbl_y = extbl_c = None
    for p in range(16):
        ox, oy = _zpos(p)
        d = dt[:, oy >> 3, ox >> 3]
        m = mt[:, oy >> 3, ox >> 3].astype(jnp.int32)
        cm = ct[:, oy >> 3, ox >> 3].astype(jnp.int32)
        cm2 = jnp.concatenate([cm, cm])
        is_nxn = nt[:, oy >> 3, ox >> 3] != 0 if intra_nxn else None
        act8 = (d == 2) if not intra_nxn else ((d == 2) & ~is_nxn)
        plans = [(8, ox, oy, act8, d == 2)]
        if p % 4 == 0:
            k16 = d == 1
            plans.append((16, (ox >> 4) << 4, (oy >> 4) << 4, k16, k16))
        if p == 0:
            plans.append((32, 0, 0, d == 0, d == 0))
        for n, cox, coy, act, cact in plans:
            ext_y, cfy_t = _process_cu(
                ext_y, cfy_t, oy_t, x0s, y0s, m, act, n, cox, coy, p,
                qp, bit_depth, w, h, True, ctu, sign_hiding,
                tr_ok=tr, bl_ok=bl, extbl=extbl_y)
            cact2 = jnp.concatenate([cact, cact])
            ext_c, cfc_t = _process_cu(
                ext_c, cfc_t, oc_t, x0c, y0c, cm2, cact2, n >> 1,
                cox >> 1, coy >> 1, p, qpc, bit_depth, cw, chh, False,
                ctu // 2, sign_hiding, tr_ok=tr2, bl_ok=bl2,
                extbl=extbl_c)
        if intra_nxn:
            # PART_NxN: four 4x4 luma PU/TUs in z order, each predicting
            # from the previous sub-TUs' in-tile reconstruction
            act4 = (d == 2) & is_nxn
            for s, (sx, sy) in enumerate(((0, 0), (4, 0),
                                          (0, 4), (4, 4))):
                m4 = m4t[:, (oy + sy) >> 2, (ox + sx) >> 2] \
                    .astype(jnp.int32)
                ext_y, cfy_t = _process_cu(
                    ext_y, cfy_t, oy_t, x0s, y0s, m4, act4, 4, ox + sx,
                    oy + sy, p, qp, bit_depth, w, h, True, ctu,
                    sign_hiding, sub=s, tr_ok=tr, bl_ok=bl,
                    extbl=extbl_y)

    # whole-tile writes (axis-0 scatter; masked batch lanes target the
    # slot-0 dummy, which is never read as real data)
    rec_y = rec_y.at[idx["self_y"]].set(ext_y[:, 1:, 1:1 + ctu])
    rec_c = rec_c.at[idx["self_c"]].set(ext_c[:, 1:, 1:1 + half])
    cf_y = cf_y.at[idx["self_y"]].set(cfy_t)
    cf_c = cf_c.at[idx["self_c"]].set(cfc_t)
    return rec_y, rec_c, cf_y, cf_c


@partial(jax.jit, static_argnames=("qp", "qpc", "bit_depth", "w", "h",
                                   "ctu", "sign_hiding", "intra_nxn"),
         donate_argnums=(0, 1, 2, 3))
def _recon_scan(rec_y, rec_c, cf_y, cf_c, idxs, dta, mta, cta, nta,
                m4a, org_y, org_c, *, qp: int, qpc: int, bit_depth: int,
                w: int, h: int, ctu: int = 32, sign_hiding: bool = False,
                intra_nxn: bool = False):
    """Whole-GOP wavefront as one lax.scan over diagonals — a single
    device dispatch for the batch. qp static on purpose: this is the
    largest jit and dynamic-shift quant costs ~2x; intra frames are
    rare under rate control, so per-QP compiles are cheap and cached."""

    def body(carry, xs):
        ry, rc, fy, fc = carry
        idx, dt, mt, ct, nt, m4t = xs
        out = _diag_step(ry, rc, fy, fc, idx, dt, mt, ct, nt, m4t,
                         org_y, org_c, qp=qp, qpc=qpc,
                         bit_depth=bit_depth, w=w, h=h, ctu=ctu,
                         sign_hiding=sign_hiding, intra_nxn=intra_nxn)
        return out, ()

    carry = (rec_y, rec_c, cf_y, cf_c)
    carry, _ = jax.lax.scan(body, carry, (idxs, dta, mta, cta, nta, m4a))
    return carry


@partial(jax.jit, static_argnames=("nf", "ncy", "ncx", "ctu"))
def _tile_device(y2d, c2d, *, nf: int, ncy: int, ncx: int, ctu: int):
    """(F*Hp, Wp) planes -> (F*nct, ctu, ctu) tiles on device."""
    half = ctu // 2
    hp, wp = ncy * ctu, ncx * ctu
    y = y2d.reshape(nf, ncy, ctu, ncx, ctu).transpose(0, 1, 3, 2, 4) \
        .reshape(-1, ctu, ctu)
    c = c2d.reshape(2 * nf, ncy, half, ncx, half) \
        .transpose(0, 1, 3, 2, 4).reshape(-1, half, half)
    return y, c


@partial(jax.jit, static_argnames=("nf", "ncy", "ncx", "ctu", "bit_depth"))
def _finalize(rec_y, rec_c, cf_y, cf_c, *, nf: int, ncy: int, ncx: int,
              ctu: int, bit_depth: int):
    """Device-side untile + downcast for transfer: the tunnel's D2H
    speed is layout-sensitive (2D ~30-44 MB/s vs 3D-planar ~0.4 MB/s),
    so emit (F*Hp, Wp) 2D arrays in the smallest exact dtype."""
    half = ctu // 2
    nct = ncy * ncx
    hp, wp = ncy * ctu, ncx * ctu
    rdt = jnp.uint8 if bit_depth == 8 else jnp.uint16

    def untile(tiles, count, m):
        return tiles[1:1 + count].reshape(-1, ncy, ncx, m, m) \
            .transpose(0, 1, 3, 2, 4).reshape(count // nct * ncy * m,
                                              ncx * m)

    cfy2 = untile(cf_y, nf * nct, ctu).astype(jnp.int16)
    cfc2 = untile(cf_c, 2 * nf * nct, half).astype(jnp.int16)

    def cg_pack(plane2d):
        h2, w2 = plane2d.shape
        cg = plane2d.reshape(h2 // 4, 4, w2 // 4, 4) \
            .transpose(0, 2, 1, 3).reshape(-1, 16)
        nz = jnp.any(cg != 0, axis=1)
        return cg, jnp.packbits(nz)

    # nonzero-CG rows + bit-packed masks IN THIS PROGRAM (the P-path
    # two-transfer collect discipline: the D2H link runs ~30 MB/s with
    # ~45 ms latency per round trip)
    cg_y, nzp_y = cg_pack(cfy2)
    cg_c, nzp_c = cg_pack(cfc2)
    return (untile(rec_y, nf * nct, ctu).astype(rdt),
            untile(rec_c, 2 * nf * nct, half).astype(rdt),
            jnp.concatenate([cg_y, cg_c]),
            jnp.concatenate([nzp_y, nzp_c]))


@lru_cache(maxsize=None)
def _wavefront_schedule(ncx: int, ncy: int, ctu: int,
                        ctu_cfg: int | None = None):
    """Static wavefront: per step, the (cx, cy) cells on it.

    Raster order: anti-diagonals d = cx + 2*cy (the WPP slope). CTU-64
    z-order adds one dependency — a top-left quadrant needs the left
    CTU's bottom-right quadrant (its below-left tile) — so the
    schedule is the longest-path levelization of that DAG (~1.7x the
    steps of the raster wavefront)."""
    if ctu_cfg != 64:
        ndiag = (ncx - 1) + 2 * (ncy - 1) + 1
        diags = []
        bmax = 0
        for d in range(ndiag):
            cells = [(d - 2 * cy, cy) for cy in range(ncy)
                     if 0 <= d - 2 * cy < ncx]
            diags.append(cells)
            bmax = max(bmax, len(cells))
        return ndiag, bmax, diags

    def deps_of(cx, cy):
        q = (cy % 2) * 2 + (cx % 2)
        out = []
        for dx, dy in ((-1, 0), (0, -1), (-1, -1), (1, -1)):
            if q == 3 and (dx, dy) == (1, -1):
                continue          # BR quadrant: no above-right dep
            nx, ny = cx + dx, cy + dy
            if 0 <= nx < ncx and 0 <= ny < ncy:
                out.append((nx, ny))
        if q == 0:                # TL: below-left (left CTU's BR)
            nx, ny = cx - 1, cy + 1
            if 0 <= nx < ncx and 0 <= ny < ncy:
                out.append((nx, ny))
        return out

    tiles = [(cx, cy) for cy in range(ncy) for cx in range(ncx)]
    lev = {t: 0 for t in tiles}
    changed = True
    while changed:
        changed = False
        for t in tiles:
            v = 1 + max([lev[d] for d in deps_of(*t)], default=-1)
            if v != lev[t]:
                lev[t] = v
                changed = True
    ndiag = max(lev.values()) + 1
    diags = [[] for _ in range(ndiag)]
    for t in tiles:
        diags[lev[t]].append(t)
    bmax = max(len(c) for c in diags)
    return ndiag, bmax, diags


def reconstruct_intra_gop_tpu(orig_y: np.ndarray, orig_cb: np.ndarray,
                              orig_cr: np.ndarray, depth8: np.ndarray,
                              mode8: np.ndarray, cfg: EncoderConfig,
                              qp: int | None = None,
                              need_recon: bool = True,
                              cmode8: np.ndarray | None = None,
                              nxn8: np.ndarray | None = None,
                              mode4: np.ndarray | None = None,
                              return_device: bool = False):
    """Reconstruct a batch of frames. orig_y: (F, H, W) padded planes;
    depth8/mode8: (F, n8y, n8x); nxn8/mode4 carry PART_NxN decisions.
    Returns (syns, recons) — plus, when return_device, the device
    recon planes ((F*Hp, Wp) luma, (2F*Hp/2, Wp/2) chroma) so callers
    can keep the reference pictures device-resident."""
    assert cfg.ctu_size in (32, 64), "device wavefront: CTU 32/64"
    nf, h, w = orig_y.shape
    # the wavefront tile is 32 px regardless of SPS CTU size; for CTU
    # 64 the tiles are the z-scan quadrants (intra CUs cap at 32 — the
    # analysis never emits depth 0 at CTU 64 — so only availability
    # differs: tr_ok masks the bottom-right quadrant's above-right)
    ctu = 32
    ctu64 = cfg.ctu_size == 64
    half = ctu // 2
    ncx = (w + ctu - 1) // ctu
    ncy = (h + ctu - 1) // ctu
    nct = ncy * ncx
    qp_frame = cfg.qp if qp is None else qp
    qpc = chroma_qp(qp_frame)

    # tiled stores: slot 0 is the dummy tile for absent neighbours
    rec_y = jnp.zeros((nf * nct + 1, ctu, ctu), jnp.int32)
    rec_c = jnp.zeros((2 * nf * nct + 1, half, half), jnp.int32)
    cf_y = jnp.zeros((nf * nct + 1, ctu, ctu), jnp.int32)
    cf_c = jnp.zeros((2 * nf * nct + 1, half, half), jnp.int32)

    def _pad_ctu(p: np.ndarray, mult: int) -> np.ndarray:
        ph = (p.shape[1] + mult - 1) // mult * mult
        pw = (p.shape[2] + mult - 1) // mult * mult
        if ph == p.shape[1] and pw == p.shape[2]:
            return p
        return np.pad(p, ((0, 0), (0, ph - p.shape[1]),
                          (0, pw - p.shape[2])), mode="edge")

    # upload 2D uint planes (fast layout, no host transpose); tile on
    # device — host memcpy on this machine runs at ~100 MB/s
    src_dt = np.uint8 if cfg.bit_depth == 8 else np.uint16
    ypad = _pad_ctu(orig_y, ctu)
    cpad = _pad_ctu(np.concatenate([orig_cb, orig_cr]), half)
    if ypad.dtype != src_dt:
        ypad = ypad.astype(src_dt)
    if cpad.dtype != src_dt:
        cpad = cpad.astype(src_dt)
    hp0, wp0 = ypad.shape[1:]
    y2d = jnp.asarray(ypad.reshape(nf * hp0, wp0))
    c2d = jnp.asarray(cpad.reshape(2 * nf * (hp0 // 2), wp0 // 2))
    org_y, org_c = _tile_device(y2d, c2d, nf=nf, ncy=ncy, ncx=ncx,
                                ctu=ctu)

    # per-CTU decision tiles, vectorized
    n8 = ctu // 8
    n4 = ctu // 4
    n8y, n8x = depth8.shape[1:]
    use_nxn = nxn8 is not None and bool(np.any(nxn8))
    dpad = np.full((nf, ncy * n8, ncx * n8), 2, np.uint8)
    mpad = np.ones((nf, ncy * n8, ncx * n8), np.uint8)
    cpad2 = np.ones((nf, ncy * n8, ncx * n8), np.uint8)
    # tile-relative depth: at CTU 64 the SPS-relative depth is one
    # deeper than the 32-tile depth (forced split at 64)
    dpad[:, :n8y, :n8x] = np.maximum(depth8.astype(np.int32) - 1, 0) \
        if ctu64 else depth8
    mpad[:, :n8y, :n8x] = mode8
    cpad2[:, :n8y, :n8x] = mode8 if cmode8 is None else cmode8

    def tile_dec(pad, k):
        return pad.reshape(nf, ncy, k, ncx, k).transpose(0, 1, 3, 2, 4) \
            .reshape(nf, nct, k, k).astype(np.int32)

    dt_all = tile_dec(dpad, n8)
    mt_all = tile_dec(mpad, n8)
    ct_all = tile_dec(cpad2, n8)
    npad = np.zeros((nf, ncy * n8, ncx * n8), np.uint8)
    m4pad = np.ones((nf, ncy * n4, ncx * n4), np.uint8)
    if use_nxn:
        npad[:, :n8y, :n8x] = nxn8.astype(np.uint8)
        m4pad[:, :2 * n8y, :2 * n8x] = mode4
    nt_all = tile_dec(npad, n8)
    m4_all = tile_dec(m4pad, n4)

    ndiag, bmax, diags = _wavefront_schedule(
        ncx, ncy, ctu, cfg.ctu_size if ctu64 else None)
    sched = _gop_schedule(ncx, ncy, ctu, nf, n8,
                          ctu_cfg=cfg.ctu_size if ctu64 else None)
    idxs, dta_sel, mta_sel = sched
    dta = dt_all.reshape(nf * nct, n8, n8)[dta_sel]
    mta = mt_all.reshape(nf * nct, n8, n8)[mta_sel]
    cta = ct_all.reshape(nf * nct, n8, n8)[mta_sel]
    nta = nt_all.reshape(nf * nct, n8, n8)[mta_sel]
    m4a = m4_all.reshape(nf * nct, n4, n4)[mta_sel]
    # masked lanes (self_o == 0 marker handled via valid mask baked into
    # the schedule): force their decision tiles to all-CU8
    invalid = idxs["x0"] >= (1 << 20)
    dta = np.where(invalid[..., None, None], 2, dta)
    mta = np.where(invalid[..., None, None], 1, mta)
    cta = np.where(invalid[..., None, None], 1, cta)
    nta = np.where(invalid[..., None, None], 0, nta)

    idxs_j = {k: jnp.asarray(v) for k, v in idxs.items()}
    rec_y, rec_c, cf_y, cf_c = _recon_scan(
        rec_y, rec_c, cf_y, cf_c, idxs_j, jnp.asarray(dta),
        jnp.asarray(mta), jnp.asarray(cta), jnp.asarray(nta),
        jnp.asarray(m4a), org_y, org_c,
        qp=int(qp_frame), qpc=int(qpc),
        bit_depth=cfg.bit_depth, w=w, h=h, ctu=ctu,
        sign_hiding=cfg.sign_hiding, intra_nxn=use_nxn)

    # device-side untile + downcast, then 2D transfers (fast layout)
    hp, wp = ncy * ctu, ncx * ctu
    ry2, rc2, cg, nzp = _finalize(rec_y, rec_c, cf_y, cf_c, nf=nf,
                                  ncy=ncy, ncx=ncx, ctu=ctu,
                                  bit_depth=cfg.bit_depth)
    # two-transfer compact download: masks, then one combined row
    # gather; rows expand via the native CG scatter
    from ..native.entropy_native import expand_cgs_native
    from ..ops.compact import fetch_rows
    ncg_y = (nf * hp // 4) * (wp // 4)
    ncg_c = (2 * nf * (hp // 2) // 4) * ((wp // 2) // 4)
    nzh = np.asarray(nzp)                               # D2H #1
    mb_y = (ncg_y + 7) // 8
    idx_y = np.nonzero(np.unpackbits(nzh[:mb_y], count=ncg_y))[0] \
        .astype(np.int32)
    idx_c = np.nonzero(np.unpackbits(nzh[mb_y:],
                                     count=ncg_c))[0].astype(np.int32)
    vals = fetch_rows(cg, np.concatenate([idx_y, idx_c + ncg_y]))
    vals_y, vals_c = vals[:len(idx_y)], vals[len(idx_y):]

    def expand(vals_p, idx_p, fh, fw, ch, cw, n):
        ncxg = fw // 4
        per = (fh // 4) * ncxg
        bounds = np.searchsorted(idx_p, np.arange(n + 1) * per)
        return np.stack([
            expand_cgs_native(vals_p[bounds[i]:bounds[i + 1]],
                              idx_p[bounds[i]:bounds[i + 1]] - i * per,
                              ncxg, ch, cw).astype(np.int32)
            for i in range(n)])

    cfy_np = expand(vals_y, idx_y, hp, wp, h, w, nf)
    cfc_np = expand(vals_c, idx_c, hp // 2, wp // 2, h // 2, w // 2,
                    2 * nf)
    if need_recon:
        ry_np = np.asarray(ry2).reshape(nf, hp, wp)[:, :h, :w] \
            .astype(np.int32)
        rc_np = np.asarray(rc2).reshape(2 * nf, hp // 2, wp // 2) \
            [:, :h // 2, :w // 2].astype(np.int32)

    syns, recons = [], []
    for f in range(nf):
        syns.append(FrameIntraSyntax(
            depth8=depth8[f], mode8=mode8[f], coeff_y=cfy_np[f],
            coeff_cb=cfc_np[f], coeff_cr=cfc_np[nf + f],
            cmode8=None if cmode8 is None else cmode8[f],
            nxn8=None if nxn8 is None else nxn8[f],
            mode4=None if mode4 is None else mode4[f]))
        if need_recon:
            recons.append(ReconFrame(ry_np[f], rc_np[f], rc_np[nf + f]))
        else:
            recons.append(None)
    if return_device:
        return syns, recons, (ry2, rc2)
    return syns, recons


@lru_cache(maxsize=None)
def _gop_schedule(ncx: int, ncy: int, ctu: int, nf: int, n8: int,
                  ctu_cfg: int | None = None):
    """Static per-diagonal index arrays for the tiled wavefront.

    ctu_cfg: the SPS CTU size when it exceeds the 32-tile (CTU 64):
    tiles are the four z-scan quadrants of each 64-CTU, and the
    bottom-right quadrant's above-right neighbour is NOT yet decoded
    in bitstream order — tr_ok masks it (z-scan deps are a subset of
    the raster wavefront deps, so the schedule itself is unchanged)."""
    nct = ncy * ncx
    ndiag, bmax, diags = _wavefront_schedule(ncx, ncy, ctu, ctu_cfg)
    B = nf * bmax
    far = 1 << 20

    def tid(f, cy, cx):
        if cy < 0 or cx < 0 or cy >= ncy or cx >= ncx:
            return 0
        return 1 + f * nct + cy * ncx + cx

    names = ["x0", "y0", "self_y", "top_y", "topright_y", "topleft_y",
             "left_y", "belowleft_y", "self_o", "tr_ok", "bl_ok"]
    idxs = {k: np.zeros((ndiag, B), np.int32) for k in names}
    idxs["x0"][:] = far
    idxs["y0"][:] = far
    idxs["tr_ok"][:] = 1
    dsel = np.zeros((ndiag, B), np.int64)
    for d, cells in enumerate(diags):
        for f in range(nf):
            for j, (cx, cy) in enumerate(cells):
                bi = f * bmax + j
                idxs["x0"][d, bi] = cx * ctu
                idxs["y0"][d, bi] = cy * ctu
                idxs["self_y"][d, bi] = tid(f, cy, cx)
                idxs["top_y"][d, bi] = tid(f, cy - 1, cx)
                idxs["topright_y"][d, bi] = tid(f, cy - 1, cx + 1)
                idxs["topleft_y"][d, bi] = tid(f, cy - 1, cx - 1)
                idxs["left_y"][d, bi] = tid(f, cy, cx - 1)
                idxs["self_o"][d, bi] = f * nct + cy * ncx + cx
                if ctu_cfg == 64 and (cx & 1) and (cy & 1):
                    idxs["tr_ok"][d, bi] = 0
                if ctu_cfg == 64 and not (cx & 1) and not (cy & 1):
                    # TL quadrant: left CTU's BR (below-left tile) is
                    # decoded in z order and supplies the below-left
                    # reference column
                    idxs["belowleft_y"][d, bi] = tid(f, cy + 1, cx - 1)
                    idxs["bl_ok"][d, bi] = \
                        1 if tid(f, cy + 1, cx - 1) else 0
                dsel[d, bi] = f * nct + cy * ncx + cx
    for key_src, key_dst in (("self_y", "self_c"), ("top_y", "top_c"),
                             ("topright_y", "topright_c"),
                             ("topleft_y", "topleft_c"),
                             ("left_y", "left_c"),
                             ("belowleft_y", "belowleft_c")):
        base = idxs[key_src]
        cb_idx = np.where(base > 0, base, 0)
        cr_idx = np.where(base > 0, base + nf * nct, 0)
        idxs[key_dst] = np.concatenate([cb_idx, cr_idx], axis=1)
    oc = idxs["self_o"]
    idxs["self_oc"] = np.concatenate([oc, oc + nf * nct], axis=1)
    if ctu_cfg != 64:
        # the quadrant-availability machinery exists only for CTU 64;
        # dropping the keys keeps the CTU-32 program unchanged
        for k in ("tr_ok", "bl_ok", "belowleft_y", "belowleft_c"):
            idxs.pop(k, None)
    return idxs, dsel, dsel.copy()


def reconstruct_intra_frame_tpu(orig_y: np.ndarray, orig_cb: np.ndarray,
                                orig_cr: np.ndarray, depth8: np.ndarray,
                                mode8: np.ndarray, cfg: EncoderConfig,
                                qp: int | None = None,
                                cmode8: np.ndarray | None = None,
                                nxn8: np.ndarray | None = None,
                                mode4: np.ndarray | None = None
                                ) -> tuple[FrameIntraSyntax, ReconFrame]:
    syns, recons = reconstruct_intra_gop_tpu(
        orig_y[None], orig_cb[None], orig_cr[None], depth8[None],
        mode8[None], cfg, qp,
        cmode8=None if cmode8 is None else cmode8[None],
        nxn8=None if nxn8 is None else nxn8[None],
        mode4=None if mode4 is None else mode4[None])
    return syns[0], recons[0]
