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
    cby, cbx = cmv.shape[:2]
    mvs, preds = {}, {}
    for n in SIZES:
        by, bx = hp // n, wp // n
        iy = jnp.clip((jnp.arange(by) * n + n // 2) // 16, 0, cby - 1)
        ix = jnp.clip((jnp.arange(bx) * n + n // 2) // 16, 0, cbx - 1)
        seed = (cmv[iy[:, None], ix[None, :]] * 4).reshape(-1, 2)

        def mefn(n=n, seed=seed):
            return me_size_windowed(cur, ry_pad, seed, lam, n,
                                    radius=me_range, pad=pad_y)
        t(jax.jit(mefn), f"me_win n={n}")
        mvs[n], _, preds[n] = jax.jit(mefn)()

    def mcall():
        return _mc_recon_all(cur, curcb, curcr, ry_pad, rcb_pad, rcr_pad,
                             pad_y, pad_c,
                             {n: mvs[n] for n in SIZES}, lam2, qp, qpc,
                             8, True, 1080, 1920, preds=preds)
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
