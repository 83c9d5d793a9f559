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
from .satd import sa8d_nxn_batch


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
    """Tile-granular window gather: vmap(dynamic_slice) lowers to ONE
    gather HLO whose slices are contiguous (w, w) tiles — orders of
    magnitude faster on TPU than the element-indexed form above.

    ref_pad is the reference EDGE-PADDED by `pad` on every side;
    (y0s, x0s) are top-left positions in unpadded coordinates, and
    must satisfy -pad <= p and p + w <= dim + pad (callers bound their
    MV ranges so this holds; values then equal the edge-clamped
    element gather exactly)."""
    starts = jnp.stack([y0s + pad, x0s + pad], axis=1)

    def one(s):
        return jax.lax.dynamic_slice(ref_pad, (s[0], s[1]), (w, w))

    return jax.vmap(one)(starts)


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
    cur_blocks = cur.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
        .reshape(b, n, n).astype(jnp.int32)

    # clamp seeds so windows stay near-plane (bounds the padded-slice
    # range AND keeps the searchable area real)
    sx = jnp.clip(seed_mv[:, 0], -x0s - radius, (w - n) - x0s + radius)
    sy = jnp.clip(seed_mv[:, 1], -y0s - radius, (h - n) - y0s + radius)

    wlen = n + 2 * radius
    win = gather_windows_ds(ref_pad, pad, y0s + sy - radius,
                            x0s + sx - radius, wlen)

    side = 2 * radius + 1
    ncand = side * side

    # separable per-axis MV-bits penalty tables (B, side): computed
    # once instead of per candidate (169x fewer float log2s)
    offs = jnp.arange(side, dtype=jnp.int32) - radius

    def comp_bits(v):
        a = jnp.abs(v)
        return (2 * jnp.ceil(jnp.log2(a.astype(jnp.float32) + 1.0)) + 1) \
            .astype(jnp.int32)

    penx = lam * comp_bits((sx[:, None] + offs[None, :]) * 4)
    peny = lam * comp_bits((sy[:, None] + offs[None, :]) * 4)

    def int_body(i, state):
        best_cost, best_i = state
        dy = i // side
        dx = i % side
        cand = jax.lax.dynamic_slice(win, (0, dy, dx), (b, n, n))
        sad = jnp.sum(jnp.abs(cur_blocks - cand), axis=(1, 2))
        cost = sad + \
            jax.lax.dynamic_slice(penx, (0, dx), (b, 1))[:, 0] + \
            jax.lax.dynamic_slice(peny, (0, dy), (b, 1))[:, 0]
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, i, best_i))

    init = (jnp.full((b,), 1 << 30, jnp.int32),
            jnp.zeros((b,), jnp.int32))
    best_cost, best_i = jax.lax.fori_loop(0, ncand, int_body, init)
    mvx_i = sx + best_i % side - radius
    mvy_i = sy + best_i // side - radius

    # zero-MV candidate (dense, no gather): rescues blocks whose seed
    # drifted off static content; the AMVP-candidate analog of
    # motion.cpp:739
    ref = ref_pad[pad:pad + h, pad:pad + w]
    sad0 = jnp.sum(jnp.abs(cur_blocks - gather_zero(ref, y0s, x0s, n)),
                   axis=(1, 2))
    cost0 = sad0 + lam * _mv_bits(jnp.zeros_like(sx), jnp.zeros_like(sy))
    z = cost0 < best_cost
    mvx_i = jnp.where(z, 0, mvx_i)
    mvy_i = jnp.where(z, 0, mvy_i)

    # --- sub-pel window (second and last gather)
    swin = gather_windows_ds(ref_pad, pad, y0s + mvy_i - 4,
                             x0s + mvx_i - 4, n + 8)

    # --- quarter-pel refinement, step 2 then 1, offsets within [-3,3]
    dx = jnp.zeros((b,), jnp.int32)
    dy = jnp.zeros((b,), jnp.int32)
    pred = interp_ext(swin, dx + 3, dy + 3, n, bit_depth)
    scost = sa8d_nxn_batch(cur_blocks - pred, n) + \
        lam * _mv_bits(mvx_i * 4, mvy_i * 4)
    best_pred = pred
    neigh = [(1, 0), (-1, 0), (0, 1), (0, -1),
             (1, 1), (1, -1), (-1, 1), (-1, -1)]
    for step in (2, 1):
        for ox, oy in neigh:
            cx = jnp.clip(dx + ox * step, -3, 3)
            cy = jnp.clip(dy + oy * step, -3, 3)
            p = interp_ext(swin, cx + 3, cy + 3, n, bit_depth)
            c = sa8d_nxn_batch(cur_blocks - p, n) + \
                lam * _mv_bits(mvx_i * 4 + cx, mvy_i * 4 + cy)
            better = c < scost
            scost = jnp.where(better, c, scost)
            dx = jnp.where(better, cx, dx)
            dy = jnp.where(better, cy, dy)
            best_pred = jnp.where(better[:, None, None], p, best_pred)
    mvq = jnp.stack([mvx_i * 4 + dx, mvy_i * 4 + dy], axis=1)
    return mvq, scost, best_pred


def gather_zero(ref: jnp.ndarray, y0s: jnp.ndarray, x0s: jnp.ndarray,
                n: int) -> jnp.ndarray:
    """Co-located (zero-MV) blocks — a pure reshape, no gather."""
    h, w = ref.shape
    by, bx = h // n, w // n
    return ref.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
        .reshape(by * bx, n, n).astype(jnp.int32)


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
