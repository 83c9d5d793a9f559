#!/usr/bin/env python
"""Stage-level profile of the fused P-GOP pipeline on the real device.

Times, separately: H2D upload, the full scan dispatch, D2H download,
host CABAC — and optionally per-stage sub-kernels (ME only, recon only)
to locate the bottleneck. Usage: python tools/profile_pgop.py [gop]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x265_tpu.common.params import EncoderConfig  # noqa: E402
from x265_tpu.common.tables import chroma_qp  # noqa: E402
from x265_tpu.enc.pgop_tpu import (_pgop_scan, _coarse_search_rolled,  # noqa: E402
                                   SIZES)
from x265_tpu.ops.me import _downsample4  # noqa: E402


def synth(seed, shift=0):
    rng = np.random.default_rng(seed)
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2 + (xx * yy >> 9)) % 256).astype(np.int32)
    y = np.clip(y + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
    if shift:
        y = np.roll(y, shift, axis=1)
    cb = np.clip(128 + (xx[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    cr = np.clip(128 - (yy[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    return y, cb, cr


def t(fn, label, n=3):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return r


def main():
    gop = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("devices:", jax.devices(), flush=True)
    cfg = EncoderConfig(width=1920, height=1080, qp=32, deblock=True,
                        sao=False)
    frames = [synth(i % 3, 2 * i) for i in range(gop)]
    h, w = cfg.height_padded, cfg.width_padded
    hp = (h + 31) // 32 * 32
    wp = (w + 31) // 32 * 32

    def padp(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge").astype(np.uint8)

    oy_h = np.stack([padp(np.pad(f[0], ((0, h - 1080), (0, 0)), mode="edge"), hp, wp)
                     for f in frames])
    ocb_h = np.stack([padp(np.pad(f[1], ((0, (h - 1080) // 2), (0, 0)), mode="edge"),
                           hp // 2, wp // 2) for f in frames])
    ocr_h = np.stack([padp(np.pad(f[2], ((0, (h - 1080) // 2), (0, 0)), mode="edge"),
                           hp // 2, wp // 2) for f in frames])

    t0 = time.perf_counter()
    oy = jnp.asarray(oy_h.reshape(gop * hp, wp)).reshape(gop, hp, wp)
    ocb = jnp.asarray(ocb_h.reshape(-1, wp // 2)).reshape(gop, hp // 2, wp // 2)
    ocr = jnp.asarray(ocr_h.reshape(-1, wp // 2)).reshape(gop, hp // 2, wp // 2)
    ry, rcb, rcr = oy[0], ocb[0], ocr[0]
    jax.block_until_ready((oy, ocb, ocr))
    print(f"H2D upload: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)

    qp, qpc = 32, chroma_qp(32)

    # --- ME sub-stages
    cur = oy[1].astype(jnp.int32)
    ref = oy[0].astype(jnp.int32)

    coarse = jax.jit(lambda c, r: _coarse_search_rolled(
        _downsample4(c), _downsample4(r)))
    t0c = time.perf_counter()
    cmv, _ = t(lambda: coarse(cur, ref), "coarse_search (per frame)")
    print(f"  (compile+first: {(time.perf_counter()-t0c):.1f} s)", flush=True)

    # --- full scan
    def run_scan():
        res, fr = _pgop_scan(ry, rcb, rcr, oy[1:], ocb[1:], ocr[1:],
                             qp=qp, qpc=qpc, bit_depth=8, real_h=h,
                             real_w=w, ctu=32, deblock=True, sao=False,
                             sign_hiding=True, me_range=6,
                             need_recon=False)
        return res

    t0c = time.perf_counter()
    res = run_scan()
    jax.block_until_ready(res)
    print(f"scan compile+first: {(time.perf_counter()-t0c):.1f} s",
          flush=True)
    t0c = time.perf_counter()
    res = run_scan()
    jax.block_until_ready(res)
    print(f"scan steady ({gop-1} frames): "
          f"{(time.perf_counter()-t0c)*1000:.1f} ms", flush=True)

    t0c = time.perf_counter()
    host = [np.asarray(r) for r in res]
    print(f"D2H download: {(time.perf_counter()-t0c)*1000:.1f} ms "
          f"({sum(a.nbytes for a in host)/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
