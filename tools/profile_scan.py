#!/usr/bin/env python
"""Ablation timing of the fused P-GOP scan on the TPU: which stage
dominates the ~190 ms/frame device time?"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_1080p
from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.enc.encoder import pad_plane
from x265_tpu.enc.pgop_tpu import _pgop_scan
from x265_tpu.common.tables import chroma_qp

cfg = EncoderConfig(width=1920, height=1080, qp=32, deblock=True, sao=False)
N = 8
frames = [synth_1080p(i % 3, shift=2 * i) for i in range(N + 1)]
w, h = cfg.width_padded, cfg.height_padded
hp = (h + 31) // 32 * 32
wp = (w + 31) // 32 * 32

oy = jnp.asarray(np.stack([np.pad(pad_plane(np.asarray(f[0]), h, w),
                                  ((0, hp - h), (0, wp - w)), mode="edge")
                           for f in frames[1:]]))
ocb = jnp.asarray(np.stack([np.pad(pad_plane(np.asarray(f[1]), h // 2, w // 2),
                                   ((0, (hp - h) // 2), (0, (wp - w) // 2)),
                                   mode="edge") for f in frames[1:]]))
ocr = jnp.asarray(np.stack([np.pad(pad_plane(np.asarray(f[2]), h // 2, w // 2),
                                   ((0, (hp - h) // 2), (0, (wp - w) // 2)),
                                   mode="edge") for f in frames[1:]]))
ry = oy[0]
rcb = ocb[0]
rcr = ocr[0]
qp_maps = jnp.zeros((N, hp // 32, wp // 32), jnp.int32)
seeds = jnp.zeros((N, hp // 16, wp // 16, 2), jnp.int32)

qp = 32
qpc = chroma_qp(qp)


def run(tag, iters=3, **kw):
    args = dict(qp=qp, qpc=int(qpc), bit_depth=8, real_h=h, real_w=w,
                ctu=32, deblock=True, sao=False, sign_hiding=True,
                me_range=cfg.me_range, need_recon=False, dqp=False,
                intra_ii=True, use_seeds=False, rdoq=False, psy_rd=0.0)
    args.update(kw)

    def force():
        r, c = _pgop_scan(ry, rcb, rcr, oy, ocb, ocr, qp_maps, seeds,
                          **args)
        # axon's block_until_ready does not block on compute; a small
        # D2H fetch of an output forces the whole dispatch
        np.asarray(r[0][0, 0, :4])

    force()                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        force()
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:32s}: {dt:.3f}s  ({dt / N * 1000:.0f} ms/frame)",
          flush=True)
    return dt


run("full (bench config)")
run("no intra_ii", intra_ii=False)
run("no deblock", intra_ii=False, deblock=False)
run("no signhide", intra_ii=False, deblock=False, sign_hiding=False)
run("sao on (for reference)", sao=True)
run("use_seeds (skip coarse)", use_seeds=True)
