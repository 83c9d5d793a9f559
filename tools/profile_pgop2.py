#!/usr/bin/env python
"""Per-stage P-GOP profile with FORCED evaluation (reduce to scalar and
fetch — axon's block_until_ready does not actually block on compute)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x265_tpu.common.tables import chroma_qp, lambda2_from_qp  # noqa: E402
from x265_tpu.enc.pgop_tpu import (_coarse_search_rolled,  # noqa: E402
                                   _mc_recon_all, _inter_bs_maps_t,
                                   deblock_luma_t, SIZES)
from x265_tpu.ops.me_win import me_size_windowed, pad_ref  # noqa: E402
from x265_tpu.ops.me import _downsample4  # noqa: E402
from profile_pgop import synth  # noqa: E402


def force(x):
    return float(sum(jnp.sum(jnp.abs(r.astype(jnp.float32)))
                     for r in jax.tree_util.tree_leaves(x)))


def t(fn, label, n=2):
    fn()            # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.0f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    hp, wp = 1088, 1920
    f0 = synth(0)
    f1 = synth(1, 2)

    def pad(y):
        return np.pad(y, ((0, hp - 1080), (0, 0)), mode="edge")

    cur = jnp.asarray(pad(f0[0]).astype(np.int32))
    ref = jnp.asarray(pad(f1[0]).astype(np.int32))
    ocb = jnp.asarray(np.pad(f0[1], ((0, 4), (0, 0)), mode="edge")
                      .astype(np.int32))
    ocr = jnp.asarray(np.pad(f0[2], ((0, 4), (0, 0)), mode="edge")
                      .astype(np.int32))
    jax.block_until_ready((cur, ref, ocb, ocr))
    qp, qpc = 32, chroma_qp(32)
    lam2 = float(lambda2_from_qp(qp))

    coarse = jax.jit(lambda c, r: _coarse_search_rolled(
        _downsample4(c), _downsample4(r)))
    t(lambda: force(coarse(cur, ref)), "coarse")

    cmv, _ = coarse(cur, ref)
    cmv = jax.block_until_ready(cmv)
    cby, cbx = cmv.shape[:2]
    me_range = 6
    pad_y = 2 * me_range + 8
    pad_c = me_range + 8
    ref_pad = jax.jit(lambda r: pad_ref(r, pad_y))(ref)
    refc_pad = jax.jit(lambda r: pad_ref(r, pad_c))(ocb)
    jax.block_until_ready((ref_pad, refc_pad))
    mvs = {}
    for n in SIZES:
        by, bx = hp // n, wp // n
        iy = jnp.clip((jnp.arange(by) * n + n // 2) // 16, 0, cby - 1)
        ix = jnp.clip((jnp.arange(bx) * n + n // 2) // 16, 0, cbx - 1)
        seed = (cmv[iy[:, None], ix[None, :]] * 4).reshape(-1, 2)
        fn = jax.jit(lambda c, rp, s, n=n: me_size_windowed(
            c, rp, s, jnp.int32(26), n, radius=me_range, pad=pad_y))
        t(lambda: force(fn(cur, ref_pad, seed)), f"me_win n={n}", n=1)
        mvs[n] = fn(cur, ref_pad, seed)[0]

    mvs = {n: jax.block_until_ready(v) for n, v in mvs.items()}
    recon = jax.jit(lambda oy, ocb, ocr, ryp, rcbp, rcrp, m8, m16, m32:
                    _mc_recon_all(oy, ocb, ocr, ryp, rcbp, rcrp, pad_y,
                                  pad_c, {8: m8, 16: m16, 32: m32},
                                  lam2, qp, qpc, 8, True, 1088, 1920))
    args = (cur, ocb, ocr, ref_pad, refc_pad, refc_pad,
            mvs[8], mvs[16], mvs[32])
    t(lambda: force(recon(*args)), "mc_recon_all", n=1)
    out = recon(*args)
    rec_y, cf_y, depth8, mv8 = out[0], out[1], out[6], out[7]
    jax.block_until_ready((rec_y, cf_y, depth8, mv8))

    dbl = jax.jit(lambda ry, d8, m8, cf: deblock_luma_t(
        ry, *_inter_bs_maps_t(d8, m8, cf, 32), qp, 8))
    t(lambda: force(dbl(rec_y, depth8, mv8, cf_y)), "deblock_t", n=2)


if __name__ == "__main__":
    main()
