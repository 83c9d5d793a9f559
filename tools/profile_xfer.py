#!/usr/bin/env python
"""Discriminate compute vs transfer in the P-GOP scan on the device.

1. Run the scan, then reduce all outputs to ONE scalar on device and
   fetch it — the fetch time bounds true compute+tiny-transfer.
2. Time pure D2H of fresh device arrays with the same shapes/dtypes.
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
from x265_tpu.enc.pgop_tpu import _pgop_scan  # noqa: E402

from profile_pgop import synth  # noqa: E402


def main():
    gop = 8
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

    oy = jnp.asarray(np.stack(
        [padp(np.pad(f[0], ((0, h - 1080), (0, 0)), mode="edge"), hp, wp)
         for f in frames]).reshape(gop * hp, wp)).reshape(gop, hp, wp)
    ocb = jnp.asarray(np.stack(
        [padp(np.pad(f[1], ((0, (h - 1080) // 2), (0, 0)), mode="edge"),
              hp // 2, wp // 2) for f in frames]).reshape(-1, wp // 2)
    ).reshape(gop, hp // 2, wp // 2)
    ocr = jnp.asarray(np.stack(
        [padp(np.pad(f[2], ((0, (h - 1080) // 2), (0, 0)), mode="edge"),
              hp // 2, wp // 2) for f in frames]).reshape(-1, wp // 2)
    ).reshape(gop, hp // 2, wp // 2)
    jax.block_until_ready((oy, ocb, ocr))
    qp, qpc = 32, chroma_qp(32)

    def scan_sum():
        res, fr = _pgop_scan(oy[0], ocb[0], ocr[0], oy[1:], ocb[1:],
                             ocr[1:], qp=qp, qpc=qpc, bit_depth=8,
                             real_h=h, real_w=w, ctu=32, deblock=True,
                             sao=False, sign_hiding=True, me_range=6,
                             need_recon=False)
        s = sum(jnp.sum(jnp.abs(r.astype(jnp.float32))) for r in res)
        return s, res

    t0 = time.perf_counter()
    s, res = scan_sum()
    sv = float(s)          # forces full compute, fetches 4 bytes
    print(f"scan+reduce first (incl compile): "
          f"{time.perf_counter()-t0:.1f} s  sum={sv:.0f}", flush=True)

    t0 = time.perf_counter()
    s, res = scan_sum()
    sv = float(s)
    print(f"scan+reduce steady (7 frames): "
          f"{time.perf_counter()-t0:.2f} s", flush=True)

    # now pure transfer of the scan outputs themselves
    for i, r in enumerate(res):
        t0 = time.perf_counter()
        a = np.asarray(r)
        dt = time.perf_counter() - t0
        print(f"D2H res[{i}] {r.shape} {r.dtype} {a.nbytes/1e6:.1f} MB: "
              f"{dt*1000:.0f} ms ({a.nbytes/1e6/max(dt,1e-9):.1f} MB/s)",
              flush=True)

    # pure transfer of FRESH arrays with identical shapes (device zeros)
    for i, r in enumerate(res):
        z = jax.block_until_ready(jnp.zeros(r.shape, r.dtype))
        t0 = time.perf_counter()
        a = np.asarray(z)
        dt = time.perf_counter() - t0
        print(f"D2H zeros{list(r.shape)} {r.dtype}: {dt*1000:.0f} ms "
              f"({a.nbytes/1e6/max(dt,1e-9):.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
