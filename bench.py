#!/usr/bin/env python
"""Benchmark: 1080p all-intra encode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the driver's north star is x265 at medium preset on 8 CPU
cores for 1080p (BASELINE.md). x265's tree publishes no absolute fps
(SURVEY.md §6); until a measured x265 build lands in-repo we use
40 fps as the documented proxy for "x265 8-core 1080p medium"
(typical published figures for that configuration).

Pipeline measured end-to-end per frame: device intra analysis (all 35
modes x all CU sizes) + device wavefront reconstruction + native CABAC
slice coding + NAL packaging. This is a complete, decodable bitstream
per frame (the in-repo spec decoder verifies it in tests/).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from x265_tpu.common.params import EncoderConfig  # noqa: E402
from x265_tpu.enc import IntraEncoder  # noqa: E402

BASELINE_FPS = 40.0   # documented proxy: x265 medium, 8 cores, 1080p


def synth_1080p(seed: int):
    rng = np.random.default_rng(seed)
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2 + (xx * yy >> 9)) % 256).astype(np.int32)
    y = np.clip(y + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
    cb = np.clip(128 + (xx[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    cr = np.clip(128 - (yy[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    return y, cb, cr


def main() -> None:
    gop = int(os.environ.get("BENCH_GOP", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    cfg = EncoderConfig(width=1920, height=1080, qp=32)
    enc = IntraEncoder(cfg)
    frames = [synth_1080p(i % 3) for i in range(gop)]

    # recon stays on device: the bitstream is the product (x265 likewise
    # only dumps recon on --recon)
    enc.encode_gop(frames, need_recon=False)    # warmup / compile
    t0 = time.perf_counter()
    total_bits = 0
    for _ in range(iters):
        for res in enc.encode_gop(frames, need_recon=False):
            total_bits += res.bits
    dt = time.perf_counter() - t0
    fps = gop * iters / dt
    print(json.dumps({
        "metric": "intra_1080p_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
