#!/usr/bin/env python
"""Micro-profile of collect_pgop_tpu: D2H vs host expand costs."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_1080p
from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.enc.encoder import pad_plane
from x265_tpu.enc.pgop_tpu import submit_pgop_tpu
from x265_tpu.ops.compact import fetch_rows

cfg = EncoderConfig(width=1920, height=1080, qp=32, deblock=True, sao=False)
enc = IntraEncoder(cfg)
N = 8
frames = [synth_1080p(i % 3, shift=2 * i) for i in range(N + 1)]
r0 = enc.encode_frame(*frames[0], qp=cfg.qp - 3, use_device_recon=True,
                      need_recon=False)
ref = r0.device_ref
w, h = cfg.width_padded, cfg.height_padded
oy = np.stack([pad_plane(np.asarray(f[0]), h, w) for f in frames[1:]])
ocb = np.stack([pad_plane(np.asarray(f[1]), h // 2, w // 2) for f in frames[1:]])
ocr = np.stack([pad_plane(np.asarray(f[2]), h // 2, w // 2) for f in frames[1:]])

pend = submit_pgop_tpu(oy, ocb, ocr, ref, cfg, cfg.qp, need_recon=False,
                       me_range=cfg.me_range)
jax.block_until_ready(pend.res)
jax.block_until_ready(pend.cg)
jax.block_until_ready(pend.small)

# warm fetch path
_ = np.asarray(pend.cy_cgs[1])

for tag, cgs in (("cf_y", pend.cy_cgs), ("cf_c", pend.cc_cgs)):
    cg, nz = cgs
    t0 = time.perf_counter()
    nzh = np.asarray(nz)
    t_mask = time.perf_counter() - t0
    idx = np.nonzero(nzh)[0].astype(np.int32)
    t0 = time.perf_counter()
    vals = fetch_rows(cg, idx)
    t_rows = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = np.zeros((len(nzh), 16), np.int32)
    out[idx] = vals
    t_scatter = time.perf_counter() - t0
    t0 = time.perf_counter()
    ncgy = nzh.shape[0]
    dense = out.reshape(-1, 480 if tag == "cf_y" else 240, 4, 4) \
        .transpose(0, 2, 1, 3).reshape(-1, 1920 if tag == "cf_y" else 960)
    t_reshape = time.perf_counter() - t0
    print(f"{tag}: rows={len(idx)}/{len(nzh)}  mask={t_mask:.3f}s  "
          f"rows_dl={t_rows:.3f}s  scatter={t_scatter:.3f}s  "
          f"reshape={t_reshape:.3f}s")

# the small fields
for i, name in ((0, "depth8"), (1, "mv8"), (4, "sao"), (5, "intra8"),
                (6, "imode8")):
    t0 = time.perf_counter()
    a = np.asarray(pend.res[i])
    dt = time.perf_counter() - t0
    print(f"res[{i}] {name}: {a.nbytes/1e6:.1f} MB in {dt:.3f}s")

# host memcpy speed sanity
big = np.zeros((64 << 20,), np.uint8)
t0 = time.perf_counter()
big2 = big.copy()
print(f"host memcpy 64MB: {time.perf_counter() - t0:.3f}s")
