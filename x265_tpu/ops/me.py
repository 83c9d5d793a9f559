"""Batched hierarchical motion estimation (TPU-first).

x265 searches one PU at a time with early-terminating pattern searches
(reference: source/encoder/motion.cpp StarPatternSearch/motionEstimate).
The TPU recast trades pruning for density: (1) a coarse full search at
1/4 resolution evaluates every candidate for every block simultaneously
as shifted whole-plane SAD sweeps; (2) per-size integer refinement runs
a fixed-iteration diamond pattern on full-res blocks, batched over the
frame; (3) quarter-pel refinement scores the 8 sub-pel neighbours with
the normative interpolation (ops/interp.py). Fixed iteration counts
keep shapes static under jit.

MVs are in quarter-pel units, per 8/16/32 block grids.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .interp import mc_block_batch
from .satd import sa8d_nxn_batch


def _downsample4(plane: jnp.ndarray) -> jnp.ndarray:
    """4x4 mean pool (integer: sum >> 4 == truncated float mean for
    non-negative pixels). The f32 .mean() form lowered to a strided
    reduce-window costing ~4.6 ms/frame; two row/column pair-sums stay
    in int32 on friendly layouts."""
    h, w = plane.shape
    p = plane[:h // 4 * 4, :w // 4 * 4].astype(jnp.int32)
    p = p[0::2, :] + p[1::2, :]
    p = p[0::2, :] + p[1::2, :]
    p = p[:, 0::2] + p[:, 1::2]
    p = p[:, 0::2] + p[:, 1::2]
    return p >> 4


def _mv_bits(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Approximate Exp-Golomb signalling cost of an MVD, in bits."""
    def one(v):
        a = jnp.abs(v)
        return 2 * jnp.ceil(jnp.log2(a.astype(jnp.float32) + 1.0)) + 1
    return (one(dx) + one(dy)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("radius", "blk"))
def coarse_search(cur4: jnp.ndarray, ref4: jnp.ndarray, radius: int = 8,
                  blk: int = 4):
    """Full search on 1/4-res planes: every (2r+1)^2 shift for every
    blk x blk block at once. Returns integer MVs (by, bx, 2) in 1/4-res
    pixel units."""
    h, w = cur4.shape
    hh, ww = h // blk * blk, w // blk * blk
    cur = cur4[:hh, :ww].astype(jnp.int32)
    by, bx = hh // blk, ww // blk
    best_cost = jnp.full((by, bx), 1 << 30, jnp.int32)
    best_mv = jnp.zeros((by, bx, 2), jnp.int32)
    pad = jnp.pad(ref4.astype(jnp.int32),
                  ((radius, radius), (radius, radius)), mode="edge")
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sh = jax.lax.dynamic_slice(pad, (dy + radius, dx + radius),
                                       (h, w))[:hh, :ww]
            ad = jnp.abs(cur - sh)
            sad = ad.reshape(by, blk, bx, blk).sum(axis=(1, 3))
            cost = sad + (jnp.abs(dx) + jnp.abs(dy))  # mild center bias
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            mv = jnp.array([dx, dy], jnp.int32)
            best_mv = jnp.where(better[..., None], mv[None, None], best_mv)
    return best_mv, best_cost


def _block_origins(h: int, w: int, n: int):
    by, bx = h // n, w // n
    ys = (np.arange(by) * n).repeat(bx)
    xs = np.tile(np.arange(bx) * n, by)
    return (jnp.asarray(xs.astype(np.int32)),
            jnp.asarray(ys.astype(np.int32)), by, bx)


def _sad_at(cur_blocks, ref, x0s, y0s, mvx_i, mvy_i, n):
    """Integer-MV SAD: gather ref block at (x0+mvx, y0+mvy), clamped."""
    h, w = ref.shape
    ys = jnp.clip(y0s[:, None] + mvy_i[:, None] + jnp.arange(n)[None, :],
                  0, h - 1)
    xs = jnp.clip(x0s[:, None] + mvx_i[:, None] + jnp.arange(n)[None, :],
                  0, w - 1)
    patch = ref[ys[:, :, None], xs[:, None, :]]
    return jnp.sum(jnp.abs(cur_blocks - patch), axis=(1, 2))


DIAMOND = [(1, 0), (-1, 0), (0, 1), (0, -1)]


@partial(jax.jit, static_argnames=("n", "iters", "bit_depth"))
def refine_size(cur: jnp.ndarray, ref: jnp.ndarray, seed_mv: jnp.ndarray,
                lam: jnp.ndarray, n: int, iters: int = 8,
                bit_depth: int = 8):
    """Integer diamond + quarter-pel refinement for all n-blocks.

    cur/ref: (H, W) planes; seed_mv: (B, 2) full-res integer MV seeds.
    Returns (mv_qpel (B, 2), cost (B,)) with SATD+lambda*bits costs.
    """
    h, w = cur.shape
    x0s, y0s, by, bx = _block_origins(h, w, n)
    cur_blocks = cur.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
        .reshape(-1, n, n).astype(jnp.int32)
    mvx = seed_mv[:, 0]
    mvy = seed_mv[:, 1]
    cost = _sad_at(cur_blocks, ref, x0s, y0s, mvx, mvy, n) + \
        lam * _mv_bits(mvx * 4, mvy * 4)
    # candidate seeds: zero + spatial-neighbour coarse seeds (left/top/
    # top-right on the block grid), the batched analog of x265's MVP
    # candidate list (motion.cpp:739)
    seeds2 = seed_mv.reshape(by, bx, 2)
    cands = [jnp.zeros_like(seeds2),
             jnp.roll(seeds2, 1, axis=1),      # left
             jnp.roll(seeds2, 1, axis=0),      # top
             jnp.roll(seeds2, (1, -1), axis=(0, 1))]  # top-right
    for cand in cands:
        cx = cand[..., 0].reshape(-1)
        cy = cand[..., 1].reshape(-1)
        c = _sad_at(cur_blocks, ref, x0s, y0s, cx, cy, n) + \
            lam * _mv_bits(cx * 4, cy * 4)
        better = c < cost
        cost = jnp.where(better, c, cost)
        mvx = jnp.where(better, cx, mvx)
        mvy = jnp.where(better, cy, mvy)
    # fixed-iteration diamond (integer pel), with a refined-neighbour
    # propagation round to rescue blocks seeded into far local minima
    def diamond(mvx, mvy, cost, rounds):
        for _ in range(rounds):
            for dx, dy in DIAMOND:
                cx = mvx + dx
                cy = mvy + dy
                c = _sad_at(cur_blocks, ref, x0s, y0s, cx, cy, n) + \
                    lam * _mv_bits(cx * 4, cy * 4)
                better = c < cost
                cost = jnp.where(better, c, cost)
                mvx = jnp.where(better, cx, mvx)
                mvy = jnp.where(better, cy, mvy)
        return mvx, mvy, cost

    mvx, mvy, cost = diamond(mvx, mvy, cost, iters)
    for _ in range(2):
        field = jnp.stack([mvx, mvy], axis=1).reshape(by, bx, 2)
        for sh, ax in [(1, 0), (-1, 0), (1, 1), (-1, 1)]:
            cand = jnp.roll(field, sh, axis=ax)
            cx = cand[..., 0].reshape(-1)
            cy = cand[..., 1].reshape(-1)
            c = _sad_at(cur_blocks, ref, x0s, y0s, cx, cy, n) + \
                lam * _mv_bits(cx * 4, cy * 4)
            better = c < cost
            cost = jnp.where(better, c, cost)
            mvx = jnp.where(better, cx, mvx)
            mvy = jnp.where(better, cy, mvy)
        mvx, mvy, cost = diamond(mvx, mvy, cost, 2)
    # sub-pel refinement (half then quarter), SATD-scored like --subme
    mvqx = mvx * 4
    mvqy = mvy * 4
    scost = sa8d_nxn_batch(
        cur_blocks - mc_block_batch(ref, x0s, y0s, mvqx, mvqy, n,
                                    is_luma=True, bit_depth=bit_depth),
        n) + lam * _mv_bits(mvqx, mvqy)
    for step in (2, 1):
        for dx, dy in DIAMOND + [(1, 1), (1, -1), (-1, 1), (-1, -1)]:
            cx = mvqx + dx * step
            cy = mvqy + dy * step
            pred = mc_block_batch(ref, x0s, y0s, cx, cy, n, is_luma=True,
                                  bit_depth=bit_depth)
            c = sa8d_nxn_batch(cur_blocks - pred, n) + \
                lam * _mv_bits(cx, cy)
            better = c < scost
            scost = jnp.where(better, c, scost)
            mvqx = jnp.where(better, cx, mvqx)
            mvqy = jnp.where(better, cy, mvqy)
    return jnp.stack([mvqx, mvqy], axis=1), scost


def motion_search_frame(cur_y: np.ndarray | jnp.ndarray,
                        ref_y: np.ndarray | jnp.ndarray, qp: int,
                        sizes=(8, 16, 32), bit_depth: int = 8):
    """Dense MV fields for every block size. Returns dict
    size -> (mv (by, bx, 2) int32 qpel, cost (by, bx) int32)."""
    from ..common.tables import lambda_from_qp
    cur = jnp.asarray(cur_y, dtype=jnp.int32)
    ref = jnp.asarray(ref_y, dtype=jnp.int32)
    h, w = cur.shape
    lam = jnp.int32(round(lambda_from_qp(qp)))
    cmv, _ = coarse_search(_downsample4(cur), _downsample4(ref))
    cby, cbx = cmv.shape[:2]
    out = {}
    for n in sizes:
        by, bx = h // n, w // n
        # seed: coarse MV at block center, scaled to full-res pixels
        iy = jnp.clip((jnp.arange(by) * n + n // 2) // 16, 0, cby - 1)
        ix = jnp.clip((jnp.arange(bx) * n + n // 2) // 16, 0, cbx - 1)
        seed = cmv[iy[:, None], ix[None, :]] * 4     # 1/4-res px -> px
        seed = seed.reshape(-1, 2)
        mv, cost = refine_size(cur, ref, seed, lam, n, bit_depth=bit_depth)
        out[n] = (np.asarray(mv).reshape(by, bx, 2),
                  np.asarray(cost).reshape(by, bx))
    return out
