"""Window-gathered motion estimation: one gather per size per frame.

The round-1 ME (ops/me.py) evaluated every diamond/subpel candidate
with a fresh per-block gather (`_sad_at`, `mc_block_batch`) — ~200
gathers per frame. TPU gathers serialize; the fused P-GOP scan spent
~7 s/frame in them. This module restructures ME so that per-block
random access happens exactly twice per size:

  1. gather a (B, W, W) integer search window around each block's
     coarse seed; every integer candidate is then a `dynamic_slice`
     of that tensor (static sizes, traced offsets — dense VPU work);
  2. gather a (B, n+8, n+8) sub-pel window around the best integer
     position; every quarter-pel candidate is then evaluated with an
     EXTENDED 9-tap filter bank (the integer part of the +-3/4-pel
     offset is folded into the filter's support) — einsums with
     per-block filter selection, no spatial gather at all.

Reference being recast: x265 source/encoder/motion.cpp
StarPatternSearch + subpelRefine; the normative interpolation matches
source/common/predict.cpp / ipfilter primitives (same filter taps as
ops/interp.py, proven spec-exact there).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .interp import LUMA_FILTERS
from .me import _mv_bits
from .satd import sa8d_nxn_batch, sa8d_nxn_lanes


def gather_windows(ref: jnp.ndarray, y0s: jnp.ndarray, x0s: jnp.ndarray,
                   w: int) -> jnp.ndarray:
    """Gather (B, w, w) windows with top-left (y0s, x0s), edge-clamped.
    The single per-block random access of the integer search."""
    h, ww = ref.shape
    ys = jnp.clip(y0s[:, None] + jnp.arange(w)[None, :], 0, h - 1)
    xs = jnp.clip(x0s[:, None] + jnp.arange(w)[None, :], 0, ww - 1)
    return ref[ys[:, :, None], xs[:, None, :]]


def gather_windows_ds(ref_pad: jnp.ndarray, pad: int, y0s: jnp.ndarray,
                      x0s: jnp.ndarray, w: int) -> jnp.ndarray:
    """Tile-granular window gather.

    ref_pad is the reference EDGE-PADDED by `pad` on every side;
    (y0s, x0s) are top-left positions in unpadded coordinates, and
    must satisfy -pad <= p and p + w <= dim + pad (callers bound their
    MV ranges so this holds; values then equal the edge-clamped
    element gather exactly).

    On TPU this is a Pallas kernel (aligned DMA + dynamic roll); the
    vmap(dynamic_slice) form XLA lowers to a serialized while loop of
    ~2 us/window — it was ~45 ms/frame of the fused P scan. Elsewhere
    (CPU tests) the vmap form is used."""
    if _on_tpu():
        return gather_windows_pallas(ref_pad, y0s + pad, x0s + pad, w)
    starts = jnp.stack([y0s + pad, x0s + pad], axis=1)

    def one(s):
        return jax.lax.dynamic_slice(ref_pad, (s[0], s[1]), (w, w))

    return jax.vmap(one)(starts)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _ceil_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def gather_windows_pallas(ref: jnp.ndarray, y0s: jnp.ndarray,
                          x0s: jnp.ndarray, w: int,
                          block: int = 8) -> jnp.ndarray:
    """(B, w, w) windows of `ref` at ARBITRARY offsets, as a Pallas
    TPU kernel. Mosaic DMA requires tile-aligned HBM offsets (rows to
    the 8-sublane tile, columns to the 128 lane), so each window is
    fetched as an aligned superset block and the sub-tile residual is
    resolved with dynamic lane/sublane rotates in registers — exact,
    and ~4.4x faster than the XLA while-loop lowering (2.7 ms vs 12 ms
    for 8160 36x36 windows on v5e).

    `block` windows are fetched per grid step so the K DMA latencies
    overlap. Offsets must be in-bounds: 0 <= y0 <= H - w."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, ww = ref.shape
    dt = ref.dtype
    ay = 8                         # sublane tile for 8/16/32-bit rows
    rh = _ceil_to(w, ay) + ay
    rw = _ceil_to(w, 128) + 128
    # generous zero-pad so aligned-down starts always fit the block
    hp2 = _ceil_to(max(h, h - w + rh), ay)
    wp2 = _ceil_to(max(ww, ww - w + rw), 128)
    refp = jnp.pad(ref, ((0, hp2 - h), (0, wp2 - ww)))

    b = y0s.shape[0]
    bp = _ceil_to(b, block)
    if bp != b:
        y0s = jnp.pad(y0s, (0, bp - b))
        x0s = jnp.pad(x0s, (0, bp - b))

    def kernel(ys_ref, xs_ref, ref_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)

        def src(idx):
            return ref_hbm.at[pl.ds((ys_ref[idx] // ay) * ay, rh),
                              pl.ds((xs_ref[idx] // 128) * 128, rw)]

        for k in range(block):
            idx = i * block + k
            pltpu.make_async_copy(src(idx), scratch.at[k],
                                  sems.at[k]).start()
        for k in range(block):
            idx = i * block + k
            pltpu.make_async_copy(src(idx), scratch.at[k],
                                  sems.at[k]).wait()
            dy = ys_ref[idx] % ay
            dx = xs_ref[idx] % 128
            v = scratch[k].astype(jnp.int32)
            v = pltpu.roll(v, (rh - dy) % rh, 0)
            v = pltpu.roll(v, (rw - dx) % rw, 1)
            out_ref[k] = v[:w, :w].astype(dt)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bp // block,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block, w, w),
                                   lambda i, ys, xs: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block, rh, rw), dt),
                            pltpu.SemaphoreType.DMA((block,))],
        ),
        out_shape=jax.ShapeDtypeStruct((bp, w, w), dt),
    )(y0s, x0s, refp)
    return out[:b] if bp != b else out


def _ext_bank9() -> np.ndarray:
    """9-tap extended luma filter bank for quarter-pel offsets
    d in [-3, 3]: d = 4*a + p with phase p = d & 3 and integer part
    a = d >> 2; the 8-tap phase filter is placed at tap positions
    t = a - 3 .. a + 4 inside a fixed t in [-4, 4] support."""
    bank = np.zeros((7, 9), np.int32)
    for i, d in enumerate(range(-3, 4)):
        p = d & 3
        a = d >> 2
        for k in range(8):
            t = a - 3 + k
            bank[i, t + 4] = LUMA_FILTERS[p][k]
    return bank


_EXT_BANK9 = _ext_bank9()


def interp_ext(win: jnp.ndarray, dxi: jnp.ndarray, dyi: jnp.ndarray,
               n: int, bit_depth: int = 8) -> jnp.ndarray:
    """Interpolate (B, n, n) predictions from sub-pel windows.

    win: (B, n+8, n+8) int32, sample (b, 4, 4) = block origin at the
    best integer MV. dxi/dyi: (B,) indices into the 9-tap extended
    bank (quarter-pel offset d + 3). Returns rounded predictions,
    bit-exact with ops.interp.mc_block_batch at mv = mvi*4 + d.

    Shifted-accumulation formulation: each tap is one integer
    multiply-add on a shifted (B, S, n) view — exact in int32 (taps
    <= 64, samples < 2^17: accumulation < 2^24) and never materializes
    the 9x (B, S, 9, n) expansion the einsum form needed.
    """
    bank = jnp.asarray(_EXT_BANK9)
    hf = bank[dxi]                               # (B, 9) int32
    vf = bank[dyi]
    shift1 = bit_depth - 8
    s = win.shape[1]
    tmp = jnp.zeros((win.shape[0], s, n), jnp.int32)
    for t in range(9):
        tmp = tmp + win[:, :, t:t + n] * hf[:, t, None, None]
    if shift1:
        tmp = tmp >> shift1
    out = jnp.zeros((win.shape[0], n, n), jnp.int32)
    for t in range(9):
        out = out + tmp[:, t:t + n, :] * vf[:, t, None, None]
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def interp_ext_lanes(win_t: jnp.ndarray, dxi: jnp.ndarray,
                     dyi: jnp.ndarray, n: int,
                     bit_depth: int = 8,
                     raw: bool = False) -> jnp.ndarray:
    """interp_ext in LANES-LAST layout: win_t (S, S, B), returns
    (n, n, B). Blocks live in the 128-lane axis, so every tap
    multiply-add runs at full VPU occupancy regardless of n.

    raw=True returns the pre-shift two-stage accumulator (the 26-bit
    value ops.interp._luma_mc_acc produces) — the bi-prediction
    combine (clause 8.5.4.2.3.2) averages THOSE, not rounded pels."""
    bank = jnp.asarray(_EXT_BANK9)
    hf = bank[dxi]                               # (B, 9)
    vf = bank[dyi]
    shift1 = bit_depth - 8
    s = win_t.shape[0]
    b = win_t.shape[2]
    tmp = jnp.zeros((s, n, b), jnp.int32)
    for t in range(9):
        tmp = tmp + win_t[:, t:t + n, :] * hf[None, None, :, t]
    if shift1:
        tmp = tmp >> shift1
    out = jnp.zeros((n, n, b), jnp.int32)
    for t in range(9):
        out = out + tmp[t:t + n, :, :] * vf[None, None, :, t]
    if raw:
        return out
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def interp_ext_lanes_multi(win_t: jnp.ndarray, dxi: jnp.ndarray,
                           dyi: jnp.ndarray, n: int,
                           bit_depth: int = 8,
                           raw: bool = False) -> jnp.ndarray:
    """interp_ext_lanes batched over a CANDIDATE axis: win_t (S, S, B)
    shared across candidates, dxi/dyi (K, B) per-candidate bank
    indices. Returns (K, n, n, B). One pass over the window serves all
    K candidates — the batched form of a qpel diamond round."""
    bank = jnp.asarray(_EXT_BANK9)
    hf = bank[dxi]                               # (K, B, 9)
    vf = bank[dyi]
    shift1 = bit_depth - 8
    s = win_t.shape[0]
    k, b = dxi.shape
    tmp = jnp.zeros((k, s, n, b), jnp.int32)
    for t in range(9):
        tmp = tmp + win_t[None, :, t:t + n, :] * hf[:, None, None, :, t]
    if shift1:
        tmp = tmp >> shift1
    out = jnp.zeros((k, n, n, b), jnp.int32)
    for t in range(9):
        out = out + tmp[:, t:t + n, :, :] * vf[:, None, None, :, t]
    if raw:
        return out
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def apply_weight_acc(raw: jnp.ndarray, w, o, denom: int,
                     bit_depth: int = 8) -> jnp.ndarray:
    """Normative explicit weighted sample prediction, uni case
    (clause 8.5.4.2.3.3), from the two-stage interpolation accumulator:
    the 14-bit intermediate is i = raw >> 6; the prediction is
    Clip(((w*i + 2^(log2WD-1)) >> log2WD) + (o << (bd-8))) with
    log2WD = denom + 14 - bitDepth. With neutral weights (w = 2^denom,
    o = 0) this equals the default rounding EXACTLY (nested-floor
    identity), so a weighted-pred stream with inferred weights decodes
    bit-identically to an unweighted one. w/o may be traced scalars."""
    log2wd = denom + 14 - bit_depth
    i = raw >> 6
    v = ((w * i + (1 << (log2wd - 1))) >> log2wd) + (o << (bit_depth - 8))
    return jnp.clip(v, 0, (1 << bit_depth) - 1)


def apply_weight_fullpel(s: jnp.ndarray, w, o, denom: int,
                         bit_depth: int = 8) -> jnp.ndarray:
    """Weighted prediction of FULL-PEL samples: algebraically equal to
    apply_weight_acc(s << (12 - (bd-8))) — the 2^(14-bd) intermediate
    scale cancels into the denom-only shift."""
    v = ((w * s + (1 << (denom - 1))) >> denom) + (o << (bit_depth - 8))
    return jnp.clip(v, 0, (1 << bit_depth) - 1)


def inverse_weight_plane(cur: jnp.ndarray, w, o, denom: int,
                         bit_depth: int = 8) -> jnp.ndarray:
    """Weight-compensate the CURRENT frame for the integer search:
    argmin over candidates of SAD(cur, weighted(ref)) is approximated
    by SAD(cur', ref) with cur' = (cur - o)*2^denom/w — one pass over
    the frame instead of weighting every candidate (the search analog
    of x265's weighted reference planes, reference.cpp:85)."""
    num = (cur - (o << (bit_depth - 8))) << denom
    w_safe = jnp.maximum(w, 1)
    v = (num + jnp.where(num >= 0, w_safe >> 1, -(w_safe >> 1))) // w_safe
    return jnp.clip(v, 0, (1 << bit_depth) - 1)


def sa8d_multi(diff: jnp.ndarray, n: int) -> jnp.ndarray:
    """SA8D over (K, n, n, B) candidate diffs -> (K, B): candidates
    fold into the lane axis so the butterflies stay dense."""
    k, _, _, b = diff.shape
    lanes = jnp.moveaxis(diff, 0, 2).reshape(n, n, k * b)
    return sa8d_nxn_lanes(lanes, n).reshape(k, b)


def int_search_vec(win_t: jnp.ndarray, cur_t: jnp.ndarray,
                   penx: jnp.ndarray, peny: jnp.ndarray, n: int,
                   side: int, lead: int = 4):
    """Integer full search over side x side candidates, one wavefront
    of `side` dx-candidates per fori step (13x fewer sequential device
    steps than the candidate-rolled loop; selection order-identical:
    ascending (dy, dx) raster with strict <). win_t: (S, S, B) window
    (any integer dtype — uint8/uint16 windows halve/quarter the read
    bandwidth); cur_t: (n, n, B) int32; penx/peny: (side, B) int32
    MV-bit penalties. Returns (best_cost (B,), best_i (B,)) with
    i = dy * side + dx."""
    b = cur_t.shape[-1]

    # the abs-diff runs at int16 (samples <= 12 bit, diffs fit) —
    # double VPU lane occupancy on the dominant elementwise tensor;
    # the reduction accumulates in int32
    cur16 = cur_t.astype(jnp.int16)

    def body(dy, state):
        best_cost, best_i = state
        row = jax.lax.dynamic_slice(
            win_t, (lead + dy, 0, 0),
            (n, win_t.shape[1], b))              # (n, S, B)
        cands = jnp.stack(
            [jax.lax.slice_in_dim(row, lead + dx, lead + dx + n, axis=1)
             for dx in range(side)])             # (side, n, n, B)
        ad = jnp.abs(cur16[None] - cands.astype(jnp.int16))
        sad = jnp.sum(ad, axis=(1, 2), dtype=jnp.int32)   # (side, B)
        cost = sad + penx + \
            jax.lax.dynamic_slice(peny, (dy, 0), (1, b))
        mi = jnp.argmin(cost, axis=0).astype(jnp.int32)
        mc = jnp.min(cost, axis=0)
        better = mc < best_cost
        i = dy * side + mi
        return (jnp.where(better, mc, best_cost),
                jnp.where(better, i, best_i))

    init = (jnp.full((b,), 1 << 30, jnp.int32),
            jnp.zeros((b,), jnp.int32))
    return jax.lax.fori_loop(0, side, body, init)


def int_search_vec_pair(win8_t: jnp.ndarray, cur8_t: jnp.ndarray,
                        penx8: jnp.ndarray, peny8: jnp.ndarray,
                        penx16: jnp.ndarray, peny16: jnp.ndarray,
                        by8: int, bx8: int, side: int, lead: int = 4):
    """Joint integer search for the 8-blocks AND their parent
    16-blocks from the 8-windows alone. The four 8-sub-windows of a
    16-region are cut from ONE parent window at the SAME seed, so the
    16-block SAD at window offset (dy, dx) is exactly the sum of its
    four 8-block SADs at (dy, dx) — the 16 search needs no second
    pass over pixels (selection identical to its own full search:
    same costs, same raster tie-break). Returns
    ((cost8, i8), (cost16, i16))."""
    b8 = cur8_t.shape[-1]
    by16, bx16 = by8 // 2, bx8 // 2
    b16 = by16 * bx16
    cur16 = cur8_t.astype(jnp.int16)

    def body(dy, state):
        bc8, bi8, bc16, bi16 = state
        row = jax.lax.dynamic_slice(
            win8_t, (lead + dy, 0, 0), (8, win8_t.shape[1], b8))
        cands = jnp.stack(
            [jax.lax.slice_in_dim(row, lead + dx, lead + dx + 8, axis=1)
             for dx in range(side)])             # (side, 8, 8, B8)
        ad = jnp.abs(cur16[None] - cands.astype(jnp.int16))
        sad8 = jnp.sum(ad, axis=(1, 2), dtype=jnp.int32)   # (side, B8)
        cost8 = sad8 + penx8 + \
            jax.lax.dynamic_slice(peny8, (dy, 0), (1, b8))
        mi = jnp.argmin(cost8, axis=0).astype(jnp.int32)
        mc = jnp.min(cost8, axis=0)
        better = mc < bc8
        bi8 = jnp.where(better, dy * side + mi, bi8)
        bc8 = jnp.where(better, mc, bc8)
        sad16 = sad8.reshape(side, by16, 2, bx16, 2).sum(axis=(2, 4)) \
            .reshape(side, b16)
        cost16 = sad16 + penx16 + \
            jax.lax.dynamic_slice(peny16, (dy, 0), (1, b16))
        mi = jnp.argmin(cost16, axis=0).astype(jnp.int32)
        mc = jnp.min(cost16, axis=0)
        better = mc < bc16
        bi16 = jnp.where(better, dy * side + mi, bi16)
        bc16 = jnp.where(better, mc, bc16)
        return bc8, bi8, bc16, bi16

    init = (jnp.full((b8,), 1 << 30, jnp.int32),
            jnp.zeros((b8,), jnp.int32),
            jnp.full((b16,), 1 << 30, jnp.int32),
            jnp.zeros((b16,), jnp.int32))
    bc8, bi8, bc16, bi16 = jax.lax.fori_loop(0, side, body, init)
    return (bc8, bi8), (bc16, bi16)


def me_size_windowed(cur: jnp.ndarray, ref_pad: jnp.ndarray,
                     seed_mv: jnp.ndarray, lam: jnp.ndarray, n: int,
                     radius: int = 6, bit_depth: int = 8,
                     pad: int | None = None):
    """Full ME for all n-blocks of the frame: integer full search of
    (2r+1)^2 candidates around per-block seeds, then two-round
    quarter-pel refinement. Returns (mv_qpel (B,2), cost (B,),
    pred (B,n,n)) — pred is the normative rounded prediction at the
    chosen MV (reusable as the MC output, saving the recon gather).

    ref_pad: reference plane edge-padded by `pad` >= 2*radius + 8 on
    every side (pad_ref helper); windows are then contiguous
    dynamic-slices, never clamped."""
    if pad is None:
        pad = 2 * radius + 8
    h, w = cur.shape
    assert ref_pad.shape == (h + 2 * pad, w + 2 * pad)
    by, bx = h // n, w // n
    b = by * bx
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    # lanes-last block layout: (n, n, B) keeps the large block axis in
    # the 128-lane dimension so SAD/SATD sweeps run dense on the VPU
    cur_t = cur.reshape(by, n, bx, n).transpose(1, 3, 0, 2) \
        .reshape(n, n, b).astype(jnp.int32)

    # clamp seeds so windows stay near-plane (bounds the padded-slice
    # range AND keeps the searchable area real)
    sx = jnp.clip(seed_mv[:, 0], -x0s - radius, (w - n) - x0s + radius)
    sy = jnp.clip(seed_mv[:, 1], -y0s - radius, (h - n) - y0s + radius)

    wlen = n + 2 * radius
    win = gather_windows_ds(ref_pad, pad, y0s + sy - radius,
                            x0s + sx - radius, wlen)
    win_t = jnp.transpose(win, (1, 2, 0))        # (wlen, wlen, B)

    side = 2 * radius + 1
    ncand = side * side

    # separable per-axis MV-bits penalty tables (side, B): computed
    # once instead of per candidate (169x fewer float log2s)
    offs = jnp.arange(side, dtype=jnp.int32) - radius

    def comp_bits(v):
        a = jnp.abs(v)
        return (2 * jnp.ceil(jnp.log2(a.astype(jnp.float32) + 1.0)) + 1) \
            .astype(jnp.int32)

    penx = lam * comp_bits((sx[None, :] + offs[:, None]) * 4)  # (side,B)
    peny = lam * comp_bits((sy[None, :] + offs[:, None]) * 4)

    del ncand
    best_cost, best_i = int_search_vec(win_t, cur_t, penx, peny, n,
                                       side, lead=0)
    mvx_i = sx + best_i % side - radius
    mvy_i = sy + best_i // side - radius

    # zero-MV candidate (dense, no gather): rescues blocks whose seed
    # drifted off static content; the AMVP-candidate analog of
    # motion.cpp:739
    ref = ref_pad[pad:pad + h, pad:pad + w]
    zero_t = ref.reshape(by, n, bx, n).transpose(1, 3, 0, 2) \
        .reshape(n, n, b).astype(jnp.int32)
    sad0 = jnp.sum(jnp.abs(cur_t - zero_t), axis=(0, 1))
    cost0 = sad0 + lam * _mv_bits(jnp.zeros_like(sx), jnp.zeros_like(sy))
    z = cost0 < best_cost
    mvx_i = jnp.where(z, 0, mvx_i)
    mvy_i = jnp.where(z, 0, mvy_i)

    # --- sub-pel window (second and last gather)
    swin = gather_windows_ds(ref_pad, pad, y0s + mvy_i - 4,
                             x0s + mvx_i - 4, n + 8)
    swin_t = jnp.transpose(swin, (1, 2, 0))      # (n+8, n+8, B)

    # --- quarter-pel refinement, step 2 then 1, offsets within [-3,3]
    dx = jnp.zeros((b,), jnp.int32)
    dy = jnp.zeros((b,), jnp.int32)
    pred = interp_ext_lanes(swin_t, dx + 3, dy + 3, n, bit_depth)
    scost = sa8d_nxn_lanes(cur_t - pred, n) + \
        lam * _mv_bits(mvx_i * 4, mvy_i * 4)
    best_pred = pred
    noff = jnp.asarray([(1, 0), (-1, 0), (0, 1), (0, -1),
                        (1, 1), (1, -1), (-1, 1), (-1, -1)], jnp.int32)
    for step in (2, 1):
        # one batched diamond round: all 8 neighbours of the current
        # best, evaluated in a single pass over the window
        cx = jnp.clip(dx[None, :] + noff[:, 0:1] * step, -3, 3)
        cy = jnp.clip(dy[None, :] + noff[:, 1:2] * step, -3, 3)
        p = interp_ext_lanes_multi(swin_t, cx + 3, cy + 3, n, bit_depth)
        c = sa8d_multi(cur_t[None] - p, n) + \
            lam * _mv_bits(mvx_i[None] * 4 + cx, mvy_i[None] * 4 + cy)
        mi = jnp.argmin(c, axis=0)
        mc = jnp.min(c, axis=0)
        better = mc < scost
        oh = (jnp.arange(c.shape[0], dtype=jnp.int32)[:, None]
              == mi[None]).astype(jnp.int32)
        scost = jnp.where(better, mc, scost)
        dx = jnp.where(better, (cx * oh).sum(0), dx)
        dy = jnp.where(better, (cy * oh).sum(0), dy)
        psel = (p * oh[:, None, None, :]).sum(0)
        best_pred = jnp.where(better[None, None, :], psel, best_pred)
    mvq = jnp.stack([mvx_i * 4 + dx, mvy_i * 4 + dy], axis=1)
    # back to block-major (B, n, n) for the recon stage contract
    pred_bm = jnp.transpose(best_pred, (2, 0, 1))
    return mvq, scost, pred_bm


def select_window_lanes(win_t: jnp.ndarray, offy: jnp.ndarray,
                        offx: jnp.ndarray, out: int,
                        nshift: int) -> jnp.ndarray:
    """Extract (out, out, B) sub-windows at per-block integer offsets
    from (S, S, B) windows WITHOUT a gather: one-hot masked sums over
    nshift static shifted slices per axis (measured ~28x faster than
    vmap(dynamic_slice) on TPU — gathers serialize, shifts are dense).
    offy/offx: (B,) in [0, nshift)."""
    s, _, b = win_t.shape
    # int16 accumulators: window samples are <= 12-bit pixels and the
    # one-hot masking adds exactly one term — double lane occupancy on
    # these wide masked sums (callers upcast for arithmetic)
    acc_dt = jnp.int16 if win_t.dtype.itemsize <= 2 else jnp.int32
    rows = jnp.zeros((out, s, b), acc_dt)
    for d in range(nshift):
        m = (offy == d)[None, None, :]
        rows = rows + jnp.where(m, win_t[d:d + out, :, :].astype(acc_dt),
                                acc_dt(0))
    cols = jnp.zeros((out, out, b), acc_dt)
    for d in range(nshift):
        m = (offx == d)[None, None, :]
        cols = cols + jnp.where(m, rows[:, d:d + out, :], acc_dt(0))
    return cols.astype(jnp.int32)


# =============================================================================
# whole-frame ME with SHARED per-16-region windows
# =============================================================================

def me_all_sizes(cur: jnp.ndarray, ref_pad: jnp.ndarray,
                 cmv16: jnp.ndarray, lam: jnp.ndarray, *,
                 radius: int = 6, pad: int, bit_depth: int = 8,
                 sizes=(8, 16, 32), want_raw: bool = False,
                 cur_search: jnp.ndarray | None = None,
                 wvec: jnp.ndarray | None = None,
                 weight_denom: int = 6,
                 ref_stride: int = 0,
                 ref16: jnp.ndarray | None = None,
                 ref32: jnp.ndarray | None = None,
                 cmv32: jnp.ndarray | None = None,
                 zero_planes: dict | None = None):
    """Dense ME for every block of every size with TWO plane gathers
    per frame (the gathers, not the math, dominate windowed ME on TPU):

      - one (n16 regions, 16+2r+8, ...) window per 16x16 region at that
        region's coarse seed, shared by the n=16 search AND the four
        n=8 searches inside it (their seeds are the same coarse MV);
      - one window per 32x32 block for n=32.

    Integer candidates are static slices of the window; the sub-pel
    window is a one-hot masked-shift selection (select_window_lanes);
    quarter-pel refinement runs on the extended filter bank. A dense
    zero-MV candidate (no gather) is compared at SATD level last.

    Multi-reference (x265 --ref N): ref_pad is the R references
    stacked vertically (R*(H+2pad), W+2pad) with ref_stride = H+2pad
    rows per segment; ref16/ref32 give each 16-region / 32-block its
    selected reference (from the coarse pass), cmv32 the ref-selected
    32-block seeds, and zero_planes[{16,32}] the dense selected-ref
    planes for the zero-MV candidates. Explicit weights (wvec) apply
    to reference 0 only — other references use the inferred-neutral
    weighted formula, which equals default rounding exactly.

    cur: (H, W) int32 (H, W multiples of 32); ref_pad edge-padded by
    `pad` >= 2*radius + 8; cmv16: (H//16, W//16, 2) full-pel coarse
    seeds. Returns ({n: (mv_qpel (B,2), cost (B,), pred (B,n,n))},
    {16: (sx, sy), 32: (sx, sy)} clamped per-region seeds — the chroma
    window stage derives its offsets from these).
    """
    h, w = cur.shape
    r = radius
    side = 2 * r + 1
    weighted = wvec is not None
    assert not (weighted and want_raw), \
        "raw accumulators are the unweighted contract (B path)"
    if weighted and cur_search is None:
        cur_search = inverse_weight_plane(cur.astype(jnp.int32), wvec[0],
                                          wvec[1], weight_denom,
                                          bit_depth)
    if cur_search is None:
        cur_search = cur

    def lanes_of(plane, n):
        bby, bbx = h // n, w // n
        return plane.reshape(bby, n, bbx, n).transpose(1, 3, 0, 2) \
            .reshape(n, n, bby * bbx).astype(jnp.int32)

    by16, bx16 = h // 16, w // 16
    b16 = by16 * bx16
    y16 = jnp.repeat(jnp.arange(by16, dtype=jnp.int32) * 16, bx16)
    x16 = jnp.tile(jnp.arange(bx16, dtype=jnp.int32) * 16, by16)
    # clamp seeds so the padded window slice stays in range
    sx16 = jnp.clip(cmv16[..., 0].reshape(-1), -(x16 + r + 4),
                    (w - 16) - x16 + r + 4)
    sy16 = jnp.clip(cmv16[..., 1].reshape(-1), -(y16 + r + 4),
                    (h - 16) - y16 + r + 4)
    wlen16 = 16 + 2 * r + 8
    roff16 = ref16 * ref_stride if ref16 is not None else 0
    w16 = gather_windows_ds(ref_pad, pad, y16 + sy16 - (r + 4) + roff16,
                            x16 + sx16 - (r + 4), wlen16)

    out = {}

    def pens_of(seedx, seedy):
        offs = jnp.arange(side, dtype=jnp.int32) - r

        def comp_bits(v):
            a = jnp.abs(v)
            return (2 * jnp.ceil(jnp.log2(a.astype(jnp.float32) + 1.0))
                    + 1).astype(jnp.int32)

        return (lam * comp_bits((seedx[None, :] + offs[:, None]) * 4),
                lam * comp_bits((seedy[None, :] + offs[:, None]) * 4))

    def run_size(win_t, cur_t, cur_st, seedx, seedy, x0s, y0s, n,
                 zero_plane=None, wmask=None, int_best=None):
        """win_t: (n+2r+8, n+2r+8, B) windows at seed-(r+4); cur_st is
        the (possibly weight-compensated) search current, cur_t the
        true current for the SATD/pred stages. zero_plane: dense
        selected-ref plane for the zero-MV candidate (None = slice of
        ref_pad, single-ref only); wmask: (B,) bool — weighted blocks
        (reference 0) when multi-ref narrows weightp's reach. Returns
        (mv_qpel, cost, pred (n,n,B))."""
        b = cur_t.shape[-1]
        if weighted and wmask is not None:
            # weight-compensated search current only where weighted
            cur_st = jnp.where(wmask[None, None, :], cur_st, cur_t)
        if int_best is None:
            penx, peny = pens_of(seedx, seedy)
            _, best_i = int_search_vec(win_t, cur_st, penx, peny, n,
                                       side, lead=4)
        else:
            _, best_i = int_best
        oy_i = best_i // side          # window offset in [0, 2r]
        ox_i = best_i % side
        mvx_i = seedx + ox_i - r
        mvy_i = seedy + oy_i - r

        # sub-pel window at the best integer position (masked shifts)
        swin_t = select_window_lanes(win_t, oy_i, ox_i, n + 8, side)

        total_shift = 12 - (bit_depth - 8)
        rnd_off = 1 << (total_shift - 1)
        maxv = (1 << bit_depth) - 1

        def rounded(acc):
            return jnp.clip((acc + rnd_off) >> total_shift, 0, maxv)

        if weighted:
            def wround(acc):
                wv = apply_weight_acc(acc, wvec[0], wvec[1],
                                      weight_denom, bit_depth)
                if wmask is None:
                    return wv
                return jnp.where(wmask[None, None, :], wv, rounded(acc))
        else:
            wround = rounded

        dx = jnp.zeros((b,), jnp.int32)
        dy = jnp.zeros((b,), jnp.int32)
        raw0 = interp_ext_lanes(swin_t, dx + 3, dy + 3, n, bit_depth,
                                raw=True)
        pred = wround(raw0)
        scost = sa8d_nxn_lanes(cur_t - pred, n) + \
            lam * _mv_bits(mvx_i * 4, mvy_i * 4)
        best_pred = pred
        best_raw = raw0
        noff = jnp.asarray([(1, 0), (-1, 0), (0, 1), (0, -1),
                            (1, 1), (1, -1), (-1, 1), (-1, -1)],
                           jnp.int32)
        for step in (2, 1):
            # batched diamond round (8 neighbours, one window pass)
            cx = jnp.clip(dx[None, :] + noff[:, 0:1] * step, -3, 3)
            cy = jnp.clip(dy[None, :] + noff[:, 1:2] * step, -3, 3)
            praw = interp_ext_lanes_multi(swin_t, cx + 3, cy + 3, n,
                                          bit_depth, raw=True)
            rnd = wround(praw)
            c = sa8d_multi(cur_t[None] - rnd, n) + \
                lam * _mv_bits(mvx_i[None] * 4 + cx,
                               mvy_i[None] * 4 + cy)
            mi = jnp.argmin(c, axis=0)
            mc = jnp.min(c, axis=0)
            better = mc < scost
            # one-hot candidate select: a (K, B) gather lowers to a
            # serialized loop on TPU; masked sum is dense VPU work
            oh = (jnp.arange(c.shape[0], dtype=jnp.int32)[:, None]
                  == mi[None]).astype(jnp.int32)
            scost = jnp.where(better, mc, scost)
            dx = jnp.where(better, (cx * oh).sum(0), dx)
            dy = jnp.where(better, (cy * oh).sum(0), dy)
            psel = (rnd * oh[:, None, None, :]).sum(0)
            best_pred = jnp.where(better[None, None, :], psel,
                                  best_pred)
            if want_raw:
                rsel = (praw * oh[:, None, None, :]).sum(0)
                best_raw = jnp.where(better[None, None, :], rsel,
                                     best_raw)
        mvqx = mvx_i * 4 + dx
        mvqy = mvy_i * 4 + dy

        # merge-candidate pass (checkMerge2Nx2N_rd0_4 analog,
        # analysis.cpp:2750): the left/top neighbours' refined MVs are
        # the batched proxy for the merge list — adopting one costs
        # ~2 bits instead of an MVD, so bias selection toward them.
        # Evaluated from the SAME window via masked shifts when the
        # candidate is in range.
        by, bx = h // n, w // n
        for axis, sh in ((1, 1), (0, 1)):      # left, top neighbours
            fx2 = mvqx.reshape(by, bx)
            fy2 = mvqy.reshape(by, bx)
            cqx = jnp.roll(fx2, sh, axis=axis).reshape(-1)
            cqy = jnp.roll(fy2, sh, axis=axis).reshape(-1)
            edge_ok = jnp.ones((by, bx), bool)
            if axis == 1:
                edge_ok = edge_ok.at[:, 0].set(False)
            else:
                edge_ok = edge_ok.at[0, :].set(False)
            ci_x = cqx >> 2
            ci_y = cqy >> 2
            offx2 = ci_x - (seedx - r)
            offy2 = ci_y - (seedy - r)
            valid = edge_ok.reshape(-1) & \
                (offx2 >= 0) & (offx2 <= 2 * r) & \
                (offy2 >= 0) & (offy2 <= 2 * r) & \
                ~((cqx == mvqx) & (cqy == mvqy))
            swc = select_window_lanes(win_t, jnp.clip(offy2, 0, 2 * r),
                                      jnp.clip(offx2, 0, 2 * r),
                                      n + 8, side)
            praw = interp_ext_lanes(swc, (cqx & 3) + 3, (cqy & 3) + 3,
                                    n, bit_depth, raw=True)
            p = wround(praw)
            c = sa8d_nxn_lanes(cur_t - p, n) + lam * 2
            c = jnp.where(valid, c, jnp.int32(1 << 30))
            better = c < scost
            scost = jnp.where(better, c, scost)
            mvqx = jnp.where(better, cqx, mvqx)
            mvqy = jnp.where(better, cqy, mvqy)
            best_pred = jnp.where(better[None, None, :], p, best_pred)
            if want_raw:
                best_raw = jnp.where(better[None, None, :], praw,
                                     best_raw)

        # dense zero-MV candidate (SATD level, no gather)
        ref = zero_plane if zero_plane is not None \
            else ref_pad[pad:pad + h, pad:pad + w]
        zero_t = ref.reshape(by, n, bx, n).transpose(1, 3, 0, 2) \
            .reshape(n, n, b).astype(jnp.int32)
        if weighted:
            zw = apply_weight_fullpel(zero_t, wvec[0], wvec[1],
                                      weight_denom, bit_depth)
            zero_t = zw if wmask is None else \
                jnp.where(wmask[None, None, :], zw, zero_t)
        zcost = sa8d_nxn_lanes(cur_t - zero_t, n) + lam * 2
        zwin = zcost < scost
        scost = jnp.where(zwin, zcost, scost)
        mvqx = jnp.where(zwin, 0, mvqx)
        mvqy = jnp.where(zwin, 0, mvqy)
        best_pred = jnp.where(zwin[None, None, :], zero_t, best_pred)
        if want_raw:
            # full-pel accumulator: sample << total_shift (26-bit scale)
            best_raw = jnp.where(zwin[None, None, :],
                                 zero_t << total_shift, best_raw)
        mvq = jnp.stack([mvqx, mvqy], axis=1)
        if want_raw:
            return mvq, scost, best_pred, best_raw
        return mvq, scost, best_pred

    def pack(res):
        if want_raw:
            mv, cost, pred, raw = res
            return (mv, cost, jnp.transpose(pred, (2, 0, 1)),
                    jnp.transpose(raw, (2, 0, 1)))
        mv, cost, pred = res
        return (mv, cost, jnp.transpose(pred, (2, 0, 1)))

    zp = zero_planes or {}
    wm16 = (ref16 == 0) if (weighted and ref16 is not None) else None
    int16_best = int8_best = None
    if 8 in sizes:
        by8, bx8 = h // 8, w // 8
        b8 = by8 * bx8
        # (28, 28) windows of the four 8-blocks = static slices of the
        # parent 16-region window (same seed); assemble in raster order
        w16r = w16.reshape(by16, bx16, wlen16, wlen16)
        wlen8 = 8 + 2 * r + 8
        subs = []
        for jj in (0, 1):
            row = []
            for ii in (0, 1):
                row.append(w16r[:, :, 8 * jj:8 * jj + wlen8,
                                8 * ii:8 * ii + wlen8])
            subs.append(row)
        # (by16, 2, bx16, 2, wlen8, wlen8) -> (B8, wlen8, wlen8)
        w8 = jnp.stack([jnp.stack(row, axis=2) for row in subs], axis=1) \
            .reshape(by8, bx8, wlen8, wlen8)
        w8_t = jnp.transpose(w8.reshape(b8, wlen8, wlen8), (1, 2, 0))
        cur8 = lanes_of(cur, 8)
        cur8s = cur8 if cur_search is cur else lanes_of(cur_search, 8)
        sx8 = jnp.repeat(jnp.repeat(sx16.reshape(by16, bx16), 2, 0),
                         2, 1).reshape(-1)
        sy8 = jnp.repeat(jnp.repeat(sy16.reshape(by16, bx16), 2, 0),
                         2, 1).reshape(-1)
        y8 = jnp.repeat(jnp.arange(by8, dtype=jnp.int32) * 8, bx8)
        x8 = jnp.tile(jnp.arange(bx8, dtype=jnp.int32) * 8, by8)
        wm8 = None
        if wm16 is not None:
            wm8 = jnp.repeat(jnp.repeat(wm16.reshape(by16, bx16), 2, 0),
                             2, 1).reshape(-1)
        if 16 in sizes:
            # ONE pass over pixels serves both grids: the 16 SAD at
            # each offset is the sum of its four 8 SADs (shared
            # windows + seeds; int_search_vec_pair docstring)
            cur8se = cur8s if wm8 is None else \
                jnp.where(wm8[None, None, :], cur8s, cur8)
            penx8, peny8 = pens_of(sx8, sy8)
            penx16, peny16 = pens_of(sx16, sy16)
            int8_best, int16_best = int_search_vec_pair(
                w8_t, cur8se, penx8, peny8, penx16, peny16, by8, bx8,
                side, lead=4)
        out[8] = pack(run_size(w8_t, cur8, cur8s, sx8, sy8, x8, y8, 8,
                               zero_plane=zp.get(16), wmask=wm8,
                               int_best=int8_best))

    if 16 in sizes:
        cur16 = lanes_of(cur, 16)
        cur16s = cur16 if cur_search is cur else lanes_of(cur_search, 16)
        w16_t = jnp.transpose(w16, (1, 2, 0))
        out[16] = pack(run_size(w16_t, cur16, cur16s, sx16, sy16, x16,
                                y16, 16, zero_plane=zp.get(16),
                                wmask=wm16, int_best=int16_best))

    if 32 in sizes:
        by32, bx32 = h // 32, w // 32
        b32 = by32 * bx32
        y32 = jnp.repeat(jnp.arange(by32, dtype=jnp.int32) * 32, bx32)
        x32 = jnp.tile(jnp.arange(bx32, dtype=jnp.int32) * 32, by32)
        # seed: the ref-selected coarse MV (multi-ref) or the coarse
        # MV at the 32-block centre
        if cmv32 is not None:
            s32 = cmv32.reshape(-1, 2)
        else:
            c16 = cmv16.reshape(by16, bx16, 2)
            s32 = c16[1::2, 1::2].reshape(-1, 2)
        sx32 = jnp.clip(s32[:, 0], -(x32 + r + 4),
                        (w - 32) - x32 + r + 4)
        sy32 = jnp.clip(s32[:, 1], -(y32 + r + 4),
                        (h - 32) - y32 + r + 4)
        wlen32 = 32 + 2 * r + 8
        roff32 = ref32 * ref_stride if ref32 is not None else 0
        w32 = gather_windows_ds(ref_pad, pad,
                                y32 + sy32 - (r + 4) + roff32,
                                x32 + sx32 - (r + 4), wlen32)
        w32_t = jnp.transpose(w32, (1, 2, 0))
        cur32 = lanes_of(cur, 32)
        cur32s = cur32 if cur_search is cur else lanes_of(cur_search, 32)
        wm32 = (ref32 == 0) if (weighted and ref32 is not None) else None
        out[32] = pack(run_size(w32_t, cur32, cur32s, sx32, sy32, x32,
                                y32, 32, zero_plane=zp.get(32),
                                wmask=wm32))
        seeds32 = (sx32, sy32)
    else:
        seeds32 = None

    return out, {16: (sx16, sy16), 32: seeds32}


def gather_zero(ref: jnp.ndarray, y0s: jnp.ndarray, x0s: jnp.ndarray,
                n: int) -> jnp.ndarray:
    """Co-located (zero-MV) blocks — a pure reshape, no gather."""
    h, w = ref.shape
    by, bx = h // n, w // n
    return ref.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
        .reshape(by * bx, n, n).astype(jnp.int32)


# =============================================================================
# windowed chroma MC (shared per-16-region windows, no per-block gather)
# =============================================================================

def interp_chroma_lanes(patch_t: jnp.ndarray, fx: jnp.ndarray,
                        fy: jnp.ndarray, cn: int,
                        bit_depth: int = 8,
                        raw: bool = False) -> jnp.ndarray:
    """4-tap chroma interpolation, lanes-last: patch_t (cn+3, cn+3, B)
    starting one sample above/left of the integer position; fx/fy (B,)
    in [0,8). Bit-exact with ops.interp.chroma_mc semantics.
    raw=True: pre-shift accumulator for the bi combine."""
    from .interp import CHROMA_FILTERS
    bank = jnp.asarray(CHROMA_FILTERS)
    hf = bank[fx]                                # (B, 4)
    vf = bank[fy]
    shift1 = bit_depth - 8
    s = patch_t.shape[0]
    b = patch_t.shape[2]
    tmp = jnp.zeros((s, cn, b), jnp.int32)
    for t in range(4):
        tmp = tmp + patch_t[:, t:t + cn, :] * hf[None, None, :, t]
    if shift1:
        tmp = tmp >> shift1
    out = jnp.zeros((cn, cn, b), jnp.int32)
    for t in range(4):
        out = out + tmp[t:t + cn, :, :] * vf[None, None, :, t]
    if raw:
        return out
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def seed_floor_off(seed: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Lowest chroma patch origin (relative to the block's chroma
    position) reachable by a luma MV in [4*(seed-r)-3, 4*(seed+r)+3]
    qpel: s0 = ((4*(seed-r) - 3) >> 3) - 1 (the -1 is the 4-tap lead)."""
    return ((4 * (seed - radius) - 3) >> 3) - 1


def gather_chroma_windows(cpad2: jnp.ndarray, pc: int,
                          reg_cy: jnp.ndarray, reg_cx: jnp.ndarray,
                          s0y: jnp.ndarray, s0x: jnp.ndarray,
                          wc: int, row_off=0) -> jnp.ndarray:
    """Gather (Breg, 2, wc, wc) stacked cb/cr windows with origin
    (reg + s0) in unpadded chroma coords — ONE slice covers both
    planes, halving the tile count. row_off: per-region extra row
    offset inside each component (multi-ref: ref * segment rows, when
    cpad2's middle axis stacks R reference segments)."""
    if _on_tpu():
        # flatten planes into rows: (2, X, Wc) -> (2*X, Wc); the
        # second half of the batch reads the cr plane
        b = reg_cy.shape[0]
        hc = cpad2.shape[1]
        ys = reg_cy + s0y + pc + row_off
        xs = reg_cx + s0x + pc
        flat = cpad2.reshape(2 * hc, cpad2.shape[2])
        win = gather_windows_pallas(flat,
                                    jnp.concatenate([ys, ys + hc]),
                                    jnp.concatenate([xs, xs]), wc)
        return jnp.stack([win[:b], win[b:]], axis=1)
    starts = jnp.stack([jnp.zeros_like(reg_cy),
                        reg_cy + s0y + pc + row_off,
                        reg_cx + s0x + pc], axis=1)

    def one(st):
        return jax.lax.dynamic_slice(cpad2, (st[0], st[1], st[2]),
                                     (2, wc, wc))

    return jax.vmap(one)(starts)


def chroma_mc_from_windows(win_b: jnp.ndarray, offy: jnp.ndarray,
                           offx: jnp.ndarray, fx: jnp.ndarray,
                           fy: jnp.ndarray, cn: int, nshift: int,
                           bit_depth: int = 8, raw: bool = False):
    """Chroma MC from per-BLOCK windows: win_b (B, 2, wc, wc); in-window
    patch offsets offy/offx (B,) in [0, nshift); eighth-pel fractions
    fx/fy (B,). Returns ((B,cn,cn) cb, (B,cn,cn) cr); raw=True gives
    pre-shift accumulators for the bi combine."""
    outs = []
    for plane in range(2):
        wt = jnp.transpose(win_b[:, plane], (1, 2, 0))
        patch = select_window_lanes(wt, offy, offx, cn + 3, nshift)
        outs.append(jnp.transpose(
            interp_chroma_lanes(patch, fx, fy, cn, bit_depth, raw=raw),
            (2, 0, 1)))
    return outs[0], outs[1]


def pad_ref(ref: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-pad a reference plane for tile-sliced window gathers
    (the reference-margin analog of x265 PicYuv padding)."""
    return jnp.pad(ref, ((pad, pad), (pad, pad)), mode="edge")


def mc_block_batch_ds(ref_pad: jnp.ndarray, pad: int, x0s: jnp.ndarray,
                      y0s: jnp.ndarray, mvx: jnp.ndarray,
                      mvy: jnp.ndarray, n: int, *, is_luma: bool = True,
                      bit_depth: int = 8) -> jnp.ndarray:
    """mc_block_batch with the patch gather done as contiguous
    dynamic-slice tiles from an edge-padded plane (same TPU rationale
    as gather_windows_ds). Bit-exact with ops.interp.mc_block_batch
    whenever the slice stays inside the padded plane — callers must
    bound |mv| accordingly (pad >= max int displacement + taps)."""
    from .interp import _filter_bank

    taps = 8 if is_luma else 4
    half = taps // 2 - 1
    if is_luma:
        fx = mvx & 3
        fy = mvy & 3
        ix = x0s + (mvx >> 2)
        iy = y0s + (mvy >> 2)
    else:
        fx = mvx & 7
        fy = mvy & 7
        ix = x0s + (mvx >> 3)
        iy = y0s + (mvy >> 3)
    bank = jnp.asarray(_filter_bank(is_luma))
    hf = bank[fx]                                # (B, taps) int32
    vf = bank[fy]
    size = n + taps - 1
    patches = gather_windows_ds(ref_pad, pad, iy - half, ix - half, size)

    # shifted integer accumulation (see interp_ext): exact in int32,
    # no (B, S, taps, n) materialization
    shift1 = bit_depth - 8
    b, s, _ = patches.shape
    tmp = jnp.zeros((b, s, n), jnp.int32)
    for t in range(taps):
        tmp = tmp + patches[:, :, t:t + n] * hf[:, t, None, None]
    if shift1:
        tmp = tmp >> shift1
    out = jnp.zeros((b, n, n), jnp.int32)
    for t in range(taps):
        out = out + tmp[:, t:t + n, :] * vf[:, t, None, None]
    total_shift = 12 - shift1
    out = (out + (1 << (total_shift - 1))) >> total_shift
    return jnp.clip(out, 0, (1 << bit_depth) - 1)
