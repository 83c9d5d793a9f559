#!/usr/bin/env python
"""Amortized device timing of the production pipelines at 1080p:
queue N dispatches, sync once (the axon tunnel round trip is ~35 ms,
which swamps single-dispatch timings)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x265_tpu.common.tables import chroma_qp, lambda_from_qp, \
    lambda2_from_qp  # noqa: E402
from x265_tpu.enc.pgop_tpu import (_pgop_scan, _coarse_search_rolled,  # noqa: E402
                                   _mc_recon_all, SIZES)
from x265_tpu.ops.me_win import me_size_windowed, pad_ref  # noqa: E402
from x265_tpu.ops.me import _downsample4  # noqa: E402
from profile_pgop import synth  # noqa: E402


def t(fn, label, n=8):
    def sync(r):
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(r)))
    sync(fn())
    t0 = time.perf_counter()
    rs = [fn() for _ in range(n)]
    sync(rs[-1])
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(fn())
    rt = time.perf_counter() - t0
    per = max((dt0 - rt) / (n - 1), 0.0)
    print(f"{label}: {per*1000:.1f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    hp, wp = 1088, 1920
    qp, qpc = 32, chroma_qp(32)
    lam = jnp.int32(round(lambda_from_qp(qp)))
    lam2 = float(lambda2_from_qp(qp))
    me_range = 6
    pad_y = 2 * me_range + 8
    pad_c = me_range + 8

    def padp(y):
        return np.pad(y, ((0, hp - y.shape[0]), (0, 0)), mode="edge")

    f0, f1 = synth(0), synth(1, 2)
    cur = jnp.asarray(padp(f0[0]).astype(np.int32))
    ref = jnp.asarray(padp(f1[0]).astype(np.int32))
    curcb = jnp.asarray(padp(np.repeat(f0[1], 1, 0)).astype(np.int32)
                        [: hp // 2, : wp // 2])
    curcb = jnp.asarray(np.pad(f0[1], ((0, hp // 2 - 540), (0, 0)),
                               mode="edge").astype(np.int32))
    curcr = jnp.asarray(np.pad(f0[2], ((0, hp // 2 - 540), (0, 0)),
                               mode="edge").astype(np.int32))
    refcb = jnp.asarray(np.pad(f1[1], ((0, hp // 2 - 540), (0, 0)),
                               mode="edge").astype(np.int32))
    refcr = jnp.asarray(np.pad(f1[2], ((0, hp // 2 - 540), (0, 0)),
                               mode="edge").astype(np.int32))

    ry_pad = pad_ref(ref, pad_y)
    rcb_pad = pad_ref(refcb, pad_c)
    rcr_pad = pad_ref(refcr, pad_c)

    t(jax.jit(lambda: _coarse_search_rolled(_downsample4(cur),
                                            _downsample4(ref))),
      "coarse search")

    cmv, _ = jax.jit(lambda: _coarse_search_rolled(
        _downsample4(cur), _downsample4(ref)))()
    from x265_tpu.ops.me_win import me_all_sizes
    from x265_tpu.enc.pgop_tpu import _chroma_preds_windowed

    def mefn():
        return me_all_sizes(cur, ry_pad, cmv * 4, lam, radius=me_range,
                            pad=pad_y, sizes=SIZES)
    t(jax.jit(mefn), "me_all_sizes")
    meres, seeds = jax.jit(mefn)()
    mvs = {n: meres[n][0] for n in SIZES}
    preds = {n: meres[n][2] for n in SIZES}

    cpad2 = jnp.stack([rcb_pad, rcr_pad])

    def chfn():
        return _chroma_preds_windowed(cpad2, pad_c, refcb, refcr, mvs,
                                      seeds, me_range, hp, wp, 8)
    t(jax.jit(chfn), "chroma_preds_windowed")
    cpreds = jax.jit(chfn)()

    def mcall():
        return _mc_recon_all(cur, curcb, curcr, mvs, lam2, qp, qpc,
                             8, True, 1080, 1920, preds=preds,
                             cpreds=cpreds)
    t(jax.jit(mcall), "mc_recon_all")

    # full fused scan, per frame
    gop = 8
    oy = jnp.stack([cur] * gop).astype(jnp.uint8)
    ocb = jnp.stack([curcb] * gop).astype(jnp.uint8)
    ocr = jnp.stack([curcr] * gop).astype(jnp.uint8)
    qmaps = jnp.zeros((gop, hp // 32, wp // 32), jnp.int32)

    def scan():
        return _pgop_scan(ref, refcb, refcr, oy, ocb, ocr, qmaps,
                          qp=qp, qpc=qpc, bit_depth=8, real_h=1080,
                          real_w=1920, ctu=32, deblock=True, sao=False,
                          sign_hiding=True, me_range=me_range,
                          need_recon=False)
    def sync(r):
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(r)))
    sync(scan())
    t0 = time.perf_counter()
    for _ in range(3):
        r = scan()
    sync(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"pgop scan ({gop} frames): {dt*1000:.0f} ms "
          f"({dt/gop*1000:.0f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
