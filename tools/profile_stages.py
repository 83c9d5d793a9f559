#!/usr/bin/env python
"""Per-stage timing of the CURRENT P scan body (single frame, jitted
standalone), with forced evaluation via a tiny D2H fetch (axon's
block_until_ready does not block on compute)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import synth_1080p  # noqa: E402
from x265_tpu.common.tables import chroma_qp, lambda_from_qp, \
    lambda2_from_qp  # noqa: E402
from x265_tpu.enc.pgop_tpu import (_coarse_search_rolled,  # noqa: E402
                                   _chroma_preds_windowed, _mc_recon_all,
                                   _intra_in_inter, _inter_bs_maps_t,
                                   deblock_luma_t, SIZES)
from x265_tpu.ops.me_win import me_all_sizes, pad_ref  # noqa: E402
from x265_tpu.ops.me import _downsample4  # noqa: E402


_sum = jax.jit(lambda xs: sum(jnp.sum(x.astype(jnp.int32) * 0 + 1) +
                              x.ravel()[0].astype(jnp.int32)
                              for x in xs))


def force(r):
    leaves = [x for x in jax.tree_util.tree_leaves(r)
              if hasattr(x, "ravel")]
    int(_sum(leaves))              # scalar D2H: 4 bytes


def t(fn, label, iters=3):
    r = fn()
    force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn())
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s}: {dt * 1000:7.1f} ms", flush=True)
    return r


def main():
    print("devices:", jax.devices(), flush=True)
    hp, wp = 1088, 1920
    qp, qpc = 32, int(chroma_qp(32))
    lam = float(lambda_from_qp(qp))
    lam2 = float(lambda2_from_qp(qp))
    me_range = 6
    pad_y = 2 * me_range + 8
    pad_c = me_range + 8

    f0, f1 = synth_1080p(0), synth_1080p(1, 2)

    def padp(p, ph, pw2):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw2 - p.shape[1])),
                      mode="edge")

    oy = jnp.asarray(padp(f0[0], hp, wp).astype(np.int32))
    ocb = jnp.asarray(padp(f0[1], hp // 2, wp // 2).astype(np.int32))
    ocr = jnp.asarray(padp(f0[2], hp // 2, wp // 2).astype(np.int32))
    ry = jnp.asarray(padp(f1[0], hp, wp).astype(np.int32))
    rcb = jnp.asarray(padp(f1[1], hp // 2, wp // 2).astype(np.int32))
    rcr = jnp.asarray(padp(f1[2], hp // 2, wp // 2).astype(np.int32))

    coarse = jax.jit(lambda c, r: _coarse_search_rolled(
        _downsample4(c), _downsample4(r)))
    cmv16 = t(lambda: coarse(oy, ry)[0], "coarse 1/4-res")[0] * 0
    cmv16 = coarse(oy, ry)[0] * 4

    ryp = jax.jit(lambda r: pad_ref(r, pad_y))(ry)
    me = jax.jit(lambda c, rp, s: me_all_sizes(
        c, rp, s, jnp.int32(round(lam)), radius=me_range, pad=pad_y,
        bit_depth=8, sizes=SIZES))
    meres, seeds = t(lambda: me(oy, ryp, cmv16), "me_all_sizes (8/16/32)")
    mvs = {n: meres[n][0] for n in SIZES}
    preds = {n: meres[n][2] for n in SIZES}

    cpad2 = jax.jit(lambda a, b: jnp.stack([pad_ref(a, pad_c),
                                            pad_ref(b, pad_c)]))(rcb, rcr)
    cp = jax.jit(lambda cp2, cb, cr, m8, m16, m32, s16x, s16y, s32x,
                 s32y: _chroma_preds_windowed(
                     cp2, pad_c, cb, cr, {8: m8, 16: m16, 32: m32},
                     {16: (s16x, s16y), 32: (s32x, s32y)}, me_range,
                     hp, wp, 8))
    cargs = (cpad2, rcb, rcr, mvs[8], mvs[16], mvs[32],
             seeds[16][0], seeds[16][1], seeds[32][0], seeds[32][1])
    cpreds = t(lambda: cp(*cargs), "chroma_preds_windowed")

    mc = jax.jit(lambda oy_, ocb_, ocr_, m8, m16, m32, p8, p16, p32,
                 c8b, c8r, c16b, c16r, c32b, c32r: _mc_recon_all(
                     oy_, ocb_, ocr_, {8: m8, 16: m16, 32: m32}, lam2,
                     qp, qpc, 8, True, 1080, 1920,
                     preds={8: p8, 16: p16, 32: p32},
                     cpreds={8: (c8b, c8r), 16: (c16b, c16r),
                             32: (c32b, c32r)}))
    margs = (oy, ocb, ocr, mvs[8], mvs[16], mvs[32],
             preds[8], preds[16], preds[32],
             cpreds[8][0], cpreds[8][1], cpreds[16][0], cpreds[16][1],
             cpreds[32][0], cpreds[32][1])
    out = t(lambda: mc(*margs), "mc_recon_all (3 sizes)")
    rec_y, cf_y, rec_cb, cf_cb, rec_cr, cf_cr, depth8, mv8 = out

    ii = jax.jit(lambda *a: _intra_in_inter(
        a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
        a[10], jnp.int32(round(lam)), qp, qpc, None, 32, 1080, 1920,
        8, True))
    iargs = (oy, ocb, ocr, rec_y, rec_cb, rec_cr, cf_y, cf_cb, cf_cr,
             depth8, meres[8][1])
    t(lambda: ii(*iargs), "intra_in_inter")

    dbl = jax.jit(lambda ry_, d8, m8, cf: deblock_luma_t(
        ry_[:1080, :1920], *_inter_bs_maps_t(
            d8[:135, :240], m8[:135, :240], cf[:1080, :1920], 32),
        qp, 8))
    t(lambda: dbl(rec_y, depth8, mv8, cf_y), "deblock luma")


if __name__ == "__main__":
    main()
