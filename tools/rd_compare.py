#!/usr/bin/env python
"""RD comparison harness: this encoder vs the reference x265 binary.

Encodes the same clips over a QP ladder with both encoders, measures
(bitrate, PSNR) points and reports BD-rate (Bjontegaard delta rate,
piecewise-cubic log-rate integration) of ours vs x265. Negative
BD-rate = we need that % fewer bits for equal PSNR.

Usage:
  python tools/rd_compare.py [--frames 9] [--qps 24,28,32,36]
                             [--preset ultrafast] [--size 352x288]
x265 binary: $X265_BIN or /tmp/x265_build/x265.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if os.environ.get("RD_PLATFORM", "cpu") == "cpu":
    # the axon site hook overrides JAX_PLATFORMS; the config update is
    # what sticks (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

X265 = os.environ.get("X265_BIN", "/tmp/x265_build/x265")


def make_clip(nf: int, h: int, w: int, seed: int = 0):
    """Synthetic but video-like: textured gradient + pan + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 9)) % 256).astype(np.int32)
    tex = rng.integers(-12, 12, (h, w))
    frames = []
    for i in range(nf):
        y = np.clip(np.roll(base, 2 * i, axis=1) + tex, 0, 255) \
            .astype(np.uint8)
        cb = np.clip(128 + (xx[::2, ::2] >> 4) + i, 0, 255) \
            .astype(np.uint8)
        cr = np.clip(128 - (yy[::2, ::2] >> 4), 0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def psnr(a: np.ndarray, b: np.ndarray, maxv: int = 255) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(maxv * maxv / mse)


def clip_psnr(frames, recons) -> float:
    """Frame-average global PSNR over Y (weight 6/8) + Cb + Cr."""
    vals = []
    for (y, cb, cr), rec in zip(frames, recons):
        py = psnr(y, rec[0])
        pcb = psnr(cb, rec[1])
        pcr = psnr(cr, rec[2])
        vals.append((6 * py + pcb + pcr) / 8.0)
    return float(np.mean(vals))


def run_ours(frames, qp: int, w: int, h: int):
    from x265_tpu.common.params import EncoderConfig
    from x265_tpu.enc import IntraEncoder
    cfg = EncoderConfig(width=w, height=h, qp=qp, deblock=True,
                        sao=False)
    if os.environ.get("RD_ME_RANGE"):
        cfg.me_range = int(os.environ["RD_ME_RANGE"])
    if os.environ.get("RD_AQ"):           # AQ + cuTree (x265 defaults)
        cfg.aq_mode = int(os.environ.get("RD_AQ_MODE", "2"))
        cfg.cutree = os.environ.get("RD_CUTREE", "1") == "1"
    if os.environ.get("RD_RDOQ"):
        cfg.rdoq = True
    enc = IntraEncoder(cfg)
    if cfg.dqp_enabled:
        rs = enc.encode_sequence(frames)
        bits = sum(r.bits for r in rs)
        recons = [(np.asarray(r.recon.y), np.asarray(r.recon.cb),
                   np.asarray(r.recon.cr)) for r in rs]
        return bits, clip_psnr(frames, recons)
    r0 = enc.encode_frame(*frames[0], qp=max(qp - 3, 0))   # ipratio
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    bits = r0.bits + sum(r.bits for r in rs)
    recons = [(np.asarray(r.recon.y), np.asarray(r.recon.cb),
               np.asarray(r.recon.cr)) for r in [r0] + rs]
    return bits, clip_psnr(frames, recons)


def run_x265(frames, qp: int, w: int, h: int, preset: str):
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.yuv")
        out = os.path.join(td, "out.hevc")
        rec = os.path.join(td, "rec.yuv")
        with open(src, "wb") as f:
            for y, cb, cr in frames:
                f.write(y.tobytes())
                f.write(cb.tobytes())
                f.write(cr.tobytes())
        cmd = [X265, "--input", src, "--input-res", f"{w}x{h}",
               "--fps", "25", "--preset", preset, "--qp", str(qp),
               "--bframes", "0", "--ref", "1", "--no-scenecut",
               "--no-sao", "--keyint", "250", "--recon", rec,
               "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)
        bits = os.path.getsize(out) * 8
        recons = []
        ysz, csz = w * h, (w // 2) * (h // 2)
        with open(rec, "rb") as f:
            for _ in frames:
                y = np.frombuffer(f.read(ysz), np.uint8).reshape(h, w)
                cb = np.frombuffer(f.read(csz), np.uint8) \
                    .reshape(h // 2, w // 2)
                cr = np.frombuffer(f.read(csz), np.uint8) \
                    .reshape(h // 2, w // 2)
                recons.append((y, cb, cr))
        return bits, clip_psnr(frames, recons)


def bd_rate(r1, p1, r2, p2) -> float:
    """BD-rate of curve 2 vs curve 1 (%; negative = curve 2 better).
    Cubic-fit log-rate over the overlapping PSNR interval."""
    lr1, lr2 = np.log(r1), np.log(r2)
    f1 = np.polyfit(p1, lr1, 3)
    f2 = np.polyfit(p2, lr2, 3)
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    xs = np.linspace(lo, hi, 100)
    int1 = np.mean(np.polyval(f1, xs))
    int2 = np.mean(np.polyval(f2, xs))
    return float((np.exp(int2 - int1) - 1.0) * 100.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--qps", default="24,28,32,36")
    ap.add_argument("--preset", default="ultrafast")
    ap.add_argument("--size", default="352x288")
    ap.add_argument("--seeds", default="0,7")
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]

    bds = []
    for seed in seeds:
        frames = make_clip(args.frames, h, w, seed)
        ours_r, ours_p, ref_r, ref_p = [], [], [], []
        for qp in qps:
            b, p = run_ours(frames, qp, w, h)
            ours_r.append(b)
            ours_p.append(p)
            b, p = run_x265(frames, qp, w, h, args.preset)
            ref_r.append(b)
            ref_p.append(p)
            print(f"seed {seed} qp {qp}: ours {ours_r[-1]}b "
                  f"{ours_p[-1]:.2f}dB | x265 {ref_r[-1]}b "
                  f"{ref_p[-1]:.2f}dB", flush=True)
        bd = bd_rate(ref_r, ref_p, ours_r, ours_p)
        bds.append(bd)
        print(f"seed {seed}: BD-rate vs x265 --preset {args.preset}: "
              f"{bd:+.1f}%", flush=True)
    print(f"MEAN BD-rate vs x265 {args.preset}: "
          f"{float(np.mean(bds)):+.1f}%  (negative = ours better)")


if __name__ == "__main__":
    main()
