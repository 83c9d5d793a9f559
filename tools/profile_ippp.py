#!/usr/bin/env python
"""Stage-level timing of the IPPP pipeline on the attached TPU.

Breaks one steady-state 8-frame P chunk into:
  submit   - H2D upload + building the dispatch (host)
  scan     - the fused device scan (block_until_ready on res)
  collect  - D2H download incl. CG compaction
  emit     - slice headers + native CABAC (host serial tail)
and times the I-frame path separately.
"""

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
from x265_tpu.enc.pgop_tpu import submit_pgop_tpu, collect_pgop_tpu

cfg = EncoderConfig(width=1920, height=1080, qp=32, deblock=True, sao=False)
enc = IntraEncoder(cfg)
N = 8
frames = [synth_1080p(i % 3, shift=2 * i) for i in range(N + 1)]

# I frame
r0 = enc.encode_frame(*frames[0], qp=cfg.qp - 3, use_device_recon=True,
                      need_recon=False)
t0 = time.perf_counter()
enc.frame_count = 1
r0 = enc.encode_frame(*frames[0], qp=cfg.qp - 3, use_device_recon=True,
                      need_recon=False)
t_i = time.perf_counter() - t0
ref = r0.device_ref

from x265_tpu.enc.encoder import pad_plane
w, h = cfg.width_padded, cfg.height_padded
oy = np.stack([pad_plane(np.asarray(f[0]), h, w) for f in frames[1:]])
ocb = np.stack([pad_plane(np.asarray(f[1]), h // 2, w // 2) for f in frames[1:]])
ocr = np.stack([pad_plane(np.asarray(f[2]), h // 2, w // 2) for f in frames[1:]])

# warm
pend = submit_pgop_tpu(oy, ocb, ocr, ref, cfg, cfg.qp, need_recon=False,
                       me_range=cfg.me_range)
syns, recons, _ = collect_pgop_tpu(pend)
_ = enc._emit_p_frames(syns, recons, cfg.qp)

for it in range(2):
    t0 = time.perf_counter()
    pend = submit_pgop_tpu(oy, ocb, ocr, ref, cfg, cfg.qp,
                           need_recon=False, me_range=cfg.me_range)
    t_submit = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(pend.res)
    t_scan = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(pend.cg)
    jax.block_until_ready(pend.small)
    t_cgs = time.perf_counter() - t0

    t0 = time.perf_counter()
    syns, recons, _ = collect_pgop_tpu(pend)
    t_collect = time.perf_counter() - t0

    t0 = time.perf_counter()
    enc.poc = 0
    res = enc._emit_p_frames(syns, recons, cfg.qp)
    t_emit = time.perf_counter() - t0
    tot = t_submit + t_scan + t_cgs + t_collect + t_emit
    print(f"iter {it}: I={t_i:.3f}s  submit={t_submit:.3f}  "
          f"scan={t_scan:.3f}  cgs={t_cgs:.3f}  collect={t_collect:.3f}  "
          f"emit={t_emit:.3f}  total(P chunk of {N})={tot:.3f}s  "
          f"-> {N / tot:.2f} P-fps unpipelined")
