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


def _bilinear(img: np.ndarray, sy: np.ndarray, sx: np.ndarray):
    """Sample img at float coords (sy, sx), edge-clamped."""
    h, w = img.shape
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(sy - y0, 0, 1)
    fx = np.clip(sx - x0, 0, 1)
    a = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    b = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return a * (1 - fy) + b * fy


def _texture(h, w, seed, octaves=5):
    """Band-limited pseudo-natural texture: summed upsampled noise
    octaves (the 'real-texture pseudo-clip' family)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w))
    for o in range(octaves):
        sh, sw = max(h >> (octaves - 1 - o), 2), \
            max(w >> (octaves - 1 - o), 2)
        n = rng.standard_normal((sh, sw))
        yy, xx = np.mgrid[0:h, 0:w]
        img += _bilinear(n, yy * (sh - 1) / (h - 1),
                         xx * (sw - 1) / (w - 1)) * (1.6 ** o)
    img -= img.min()
    return (img * (220.0 / max(img.max(), 1e-9)) + 16).astype(np.float64)


def make_family(family: str, nf: int, h: int, w: int, seed: int = 0):
    """Clip families (the r04 VERDICT methodology ask): rigid pan,
    fast diagonal pan, fade, zoom, occlusion, grain, texture pan."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    mar = 8 * nf + 8      # covers the largest per-frame displacement
    base = _texture(h + mar, w + mar, seed + 1)
    cbase = _texture(h // 2 + mar, w // 2 + mar, seed + 2)
    tex = rng.integers(-8, 8, (h + mar, w + mar))

    def crop(i_y, i_x, extra=0):
        y = base[i_y:i_y + h, i_x:i_x + w] + tex[i_y:i_y + h,
                                                 i_x:i_x + w] + extra
        return np.clip(y, 0, 255).astype(np.uint8)

    def cr2(i):
        c = cbase[i:i + h // 2, i:i + w // 2]
        return np.clip(c, 0, 255).astype(np.uint8)

    def crc(i_y, i_x, off=0):
        """Chroma crop at HALF the luma displacement — 4:2:0 chroma
        rides the same motion field as luma."""
        c = cbase[i_y:i_y + h // 2, i_x + off:i_x + off + w // 2]
        return np.clip(c, 0, 255).astype(np.uint8)

    frames = []
    for i in range(nf):
        if family == "pan":
            y = crop(0, 2 * i)
            cb, cr = crc(0, i), crc(0, i, 3)
        elif family == "fastpan":
            y = crop(4 * i, 6 * i)
            cb, cr = crc(2 * i, 3 * i), crc(2 * i, 3 * i, 3)
        elif family == "fade":
            y = np.clip(crop(0, 2 * i).astype(np.float64)
                        * (1.0 - 0.04 * i) + 3 * i, 0, 255) \
                .astype(np.uint8)
            cb, cr = crc(0, i), crc(0, i, 3)
        elif family == "zoom":
            sc = 1.0 + 0.008 * i
            sy = (yy - h / 2) / sc + h / 2 + mar // 2
            sx = (xx - w / 2) / sc + w / 2 + mar // 2
            y = np.clip(_bilinear(base + tex, sy, sx), 0, 255) \
                .astype(np.uint8)
            cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
            csy = (cyy - h / 4) / sc + h / 4 + mar // 2
            csx = (cxx - w / 4) / sc + w / 4 + mar // 2
            cbp = np.clip(_bilinear(cbase, csy, csx), 0, 255) \
                .astype(np.uint8)
            cb, cr = cbp, np.clip(cbp.astype(np.int32) + 6, 0,
                                  255).astype(np.uint8)
        elif family == "occlusion":
            y = crop(0, 2 * i).copy()
            oy0 = h // 4 + 3 * i
            ox0 = w // 4 + 5 * i
            y[oy0:oy0 + h // 4, ox0:ox0 + w // 4] = \
                (40 + 10 * ((xx[:h // 4, :w // 4] >> 3) & 1)) \
                .astype(np.uint8)
            cb, cr = crc(0, i), crc(0, i, 3)
        elif family == "grain":
            g = np.random.default_rng(100 + i).integers(-18, 18, (h, w))
            y = np.clip(base[:h, :w] + g, 0, 255).astype(np.uint8)
            cb, cr = crc(0, 0), crc(0, 0, 3)
        else:                                  # texture (slow pan)
            y = crop(2 * i, 2 * i)
            cb, cr = crc(i, i), crc(i, i, 3)
        frames.append((y, cb, cr))
    return frames


def make_clip(nf: int, h: int, w: int, seed: int = 0):
    """Legacy single-family clip (rigid pan over a gradient+noise)."""
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


def clip_ssim_db(frames, recons) -> float:
    """Frame-average luma SSIM in dB (-10*log10(1-ssim)) — the metric
    AQ/psy tools can legitimately win on (VERDICT r04 weak #5)."""
    from x265_tpu.ops.metrics import ssim_plane, ssim_to_db
    vals = [ssim_to_db(ssim_plane(y.astype(np.int32),
                                  rec[0].astype(np.int32)))
            for (y, cb, cr), rec in zip(frames, recons)]
    return float(np.mean(vals))


def run_ours(frames, qp: int, w: int, h: int):
    from x265_tpu.common.params import EncoderConfig
    from x265_tpu.enc import IntraEncoder
    cfg = EncoderConfig(width=w, height=h, qp=qp, deblock=True,
                        sao=False)
    if os.environ.get("RD_REFS"):
        cfg.num_refs = int(os.environ["RD_REFS"])
    if os.environ.get("RD_CTU"):
        cfg.ctu_size = int(os.environ["RD_CTU"])
    if os.environ.get("RD_TMVP"):
        cfg.tmvp = os.environ["RD_TMVP"] == "1"
        cfg.max_merge = 3 if cfg.tmvp else cfg.max_merge
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
        return bits, clip_psnr(frames, recons), \
            clip_ssim_db(frames, recons)
    r0 = enc.encode_frame(*frames[0], qp=max(qp - 3, 0))   # ipratio
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    bits = r0.bits + sum(r.bits for r in rs)
    recons = [(np.asarray(r.recon.y), np.asarray(r.recon.cb),
               np.asarray(r.recon.cr)) for r in [r0] + rs]
    return bits, clip_psnr(frames, recons), \
        clip_ssim_db(frames, recons)


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
        # IPPP comparison config: B frames off (our measured path),
        # no scene cut; x265 keeps its preset's own refs/CTU/tools.
        # RD_X265_REF1=1 restores the historical 1-ref handicap.
        cmd = [X265, "--input", src, "--input-res", f"{w}x{h}",
               "--fps", "25", "--preset", preset, "--qp", str(qp),
               "--bframes", "0", "--no-scenecut",
               "--no-sao", "--keyint", "250", "--recon", rec,
               "-o", out]
        if os.environ.get("RD_X265_REF1"):
            cmd += ["--ref", "1"]
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
        return bits, clip_psnr(frames, recons), \
            clip_ssim_db(frames, recons)


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


FAMILIES = ("pan", "fastpan", "fade", "zoom", "occlusion", "grain",
            "texture")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--qps", default="24,28,32,36")
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--size", default="416x240")
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--json", default="", help="write per-family JSON")
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]
    fams = [f for f in args.families.split(",") if f]

    results = []
    for fam in fams:
        for seed in seeds:
            frames = make_family(fam, args.frames, h, w, seed)
            ours_r, ours_p, ours_s = [], [], []
            ref_r, ref_p, ref_s = [], [], []
            for qp in qps:
                b, p, sm = run_ours(frames, qp, w, h)
                ours_r.append(b)
                ours_p.append(p)
                ours_s.append(sm)
                b, p, sm = run_x265(frames, qp, w, h, args.preset)
                ref_r.append(b)
                ref_p.append(p)
                ref_s.append(sm)
                print(f"{fam} s{seed} qp {qp}: ours {ours_r[-1]}b "
                      f"{ours_p[-1]:.2f}dB | x265 {ref_r[-1]}b "
                      f"{ref_p[-1]:.2f}dB", flush=True)
            bd_p = bd_rate(ref_r, ref_p, ours_r, ours_p)
            bd_s = bd_rate(ref_r, ref_s, ours_r, ours_s)
            results.append({"family": fam, "seed": seed,
                            "bd_rate_psnr_pct": round(bd_p, 1),
                            "bd_rate_ssim_pct": round(bd_s, 1)})
            print(f"{fam} seed {seed}: BD-rate PSNR {bd_p:+.1f}% "
                  f"SSIM {bd_s:+.1f}%", flush=True)
    mean_p = float(np.mean([r["bd_rate_psnr_pct"] for r in results]))
    mean_s = float(np.mean([r["bd_rate_ssim_pct"] for r in results]))
    print(f"MEAN BD-rate vs x265 {args.preset} over "
          f"{len(fams)} families: PSNR {mean_p:+.1f}%  "
          f"SSIM {mean_s:+.1f}%  (negative = ours better)")
    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"preset": args.preset, "size": args.size,
                       "frames": args.frames, "qps": qps,
                       "results": results,
                       "mean_bd_psnr_pct": round(mean_p, 1),
                       "mean_bd_ssim_pct": round(mean_s, 1)}, f,
                      indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
