#!/usr/bin/env python
"""Calibrate the device RD bit model against the REAL CABAC.

The fused P-scan decides depths from `sse + lambda2 * est_bits` where
est_bits was, until round 4, built from uncalibrated constants
(VERDICT r03 weak #6: coeff bits = 1.4*nnz + 1.2*bitlen + 5.0, header
5.0, split 3.0). This tool encodes a diverse clip set over a QP ladder
on the CPU backend, extracts per-frame values of exactly the features
the device estimator can afford (nnz, bitlen-sum, coded-block count,
leaf count, split count, MVD-proxy bits), reads the ACTUAL slice bits
the native CABAC emitted, and solves least squares per QP. Output is
pasted into x265_tpu/common/bit_calib.py.

Reference for the role of the estimates: x265 bit-counting-mode RDO
(entropy.cpp:2217-2386) and rdcost.h:30-110; we regress against our
byte-exact CABAC instead of re-deriving per-context tables.

Usage: JAX_PLATFORMS=cpu python tools/calibrate_bits.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from x265_tpu.common.params import EncoderConfig  # noqa: E402
from x265_tpu.enc import IntraEncoder  # noqa: E402


def clips(nf=5, h=288, w=352):
    """Diverse motion/texture families (VERDICT r03 weak #6 asks for
    fade/occlusion/zoom/noise beyond the single pan family)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 9)) % 256).astype(np.int32)
    cb = np.clip(128 + (xx[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    cr = np.clip(128 - (yy[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    out = []

    rng = np.random.default_rng(0)
    tex = rng.integers(-12, 12, (h, w))

    # pan
    out.append([(np.clip(np.roll(base, 2 * i, axis=1) + tex, 0,
                         255).astype(np.uint8), cb, cr)
                for i in range(nf)])
    # fast pan + vertical
    out.append([(np.clip(np.roll(np.roll(base, 7 * i, axis=1), 3 * i,
                                 axis=0) + tex, 0, 255).astype(np.uint8),
                 cb, cr) for i in range(nf)])
    # fade (global luma ramp)
    out.append([(np.clip((base + tex) * (0.6 + 0.1 * i) + 20 * i, 0,
                         255).astype(np.uint8), cb, cr)
                for i in range(nf)])
    # noise (film grain: independent per frame)
    rng2 = np.random.default_rng(5)
    out.append([(np.clip(base + rng2.integers(-25, 25, (h, w)), 0,
                         255).astype(np.uint8), cb, cr)
                for i in range(nf)])
    # zoom-ish (block occlusion: moving square over pan)
    sq = []
    for i in range(nf):
        y = np.clip(np.roll(base, 2 * i, axis=1) + tex, 0,
                    255).astype(np.uint8).copy()
        y[80 + 6 * i:160 + 6 * i, 100 + 10 * i:200 + 10 * i] = 60
        sq.append((y, cb, cr))
    out.append(sq)
    return out


def bitlen(a):
    return np.where(a > 0, np.frexp(a.astype(np.float64))[1], 0)


def features_of(syn, mvd_est, h, w):
    """Per-frame feature vector mirroring the device estimator."""
    depth8 = np.asarray(syn.depth8)
    cf = [np.abs(np.asarray(syn.coeff_y)),
          np.abs(np.asarray(syn.coeff_cb)),
          np.abs(np.asarray(syn.coeff_cr))]
    n8y, n8x = depth8.shape
    nnz = slog = coded = 0.0
    nleaf = np.zeros(3)
    for d, n in ((0, 32), (1, 16), (2, 8)):
        m = depth8[::n // 8, ::n // 8] == d
        nleaf[d] = m.sum()
        for pi, plane in enumerate(cf):
            k = n if pi == 0 else n // 2
            ph, pw = plane.shape
            by, bx = ph // k, pw // k
            a = plane[:by * k, :bx * k].reshape(by, k, bx, k)
            bn = (a > 0).sum((1, 3))
            bs = bitlen(a).sum((1, 3))
            mm = m[:by, :bx]
            nnz += bn[mm].sum()
            slog += bs[mm].sum()
            coded += (bn[mm] > 0).sum()
    # split flags: a 32-node is split iff any covering depth>0;
    # a 16-node codes a split flag iff its 32-parent split
    d32 = depth8[::4, ::4]
    s32 = (depth8.reshape(n8y // 4, 4, n8x // 4, 4) > 0).any((1, 3))
    d16 = depth8[::2, ::2]
    s16 = (depth8.reshape(n8y // 2, 2, n8x // 2, 2) > 1).any((1, 3))
    s16 = s16 & np.repeat(np.repeat(s32, 2, 0), 2, 1)
    nsplit = s32.sum() + s16.sum()
    return np.array([nnz, slog, coded, nleaf.sum(), nsplit, mvd_est,
                     1.0])


def mvd_proxy(mv8, depth8):
    """Host mirror of pgop_tpu._mvd_bits_est on the per-size grids,
    summed over chosen leaves."""
    total = 0.0
    n8y, n8x = depth8.shape
    for d, n in ((0, 32), (1, 16), (2, 8)):
        k = n // 8
        grid = np.asarray(mv8)[::k, ::k].astype(np.float64)
        pred = np.roll(grid, 1, axis=1)
        pred[:, 0] = 0
        dd = np.abs(grid - pred)
        c = 1.0 + np.where(dd > 0, 2.0 + np.where(
            dd > 1, 2.0 * np.ceil(np.log2((dd - 1.0) / 2.0 + 1.0))
            + 2.0, 0.0), 0.0)
        per = c.sum(-1)
        m = depth8[::k, ::k] == d
        total += per[m].sum()
    return total


def cu_records(syn, cfg, qp):
    """Per-CU (features, actual_bits) via the native CABAC bit-counting
    harvest (entropy.cpp Cabac::pos256 deltas — the x265
    entropy.cpp:2217 bit-counting-mode analog). Features mirror the
    device estimator exactly: [nnz, slog, coded, 1 (leaf), mvd_proxy].
    Intra-in-inter CUs are excluded (their bits are priced by the
    intra mode model, not this one)."""
    from x265_tpu.bitstream.ctx_tables import init_states
    from x265_tpu.common.params import P_SLICE
    from x265_tpu.native.entropy_native import encode_slice_native
    w, h = cfg.width_padded, cfg.height_padded
    n8y, n8x = h // 8, w // 8
    harvest = np.zeros(n8y * n8x, np.int32)
    encode_slice_native(
        1, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr, w, h,
        cfg.log2_ctu, cfg.log2_min_cu, init_states(P_SLICE, qp),
        mv8=syn.mv8, max_merge=syn.max_merge,
        sign_hiding=cfg.sign_hiding, slice_qp=qp, mode8=syn.mode8,
        intra8=syn.intra8, tusplit8=syn.tusplit8,
        rqt_inter=cfg.rqt_inter, ref8=syn.ref8, num_ref=syn.num_ref,
        ref_pocs_l0=syn.ref_pocs, poc=syn.poc,
        cu_bits_out=harvest)
    bits8 = harvest.reshape(n8y, n8x) / 16.0
    depth8 = np.asarray(syn.depth8)
    cf = [np.asarray(syn.coeff_y), np.asarray(syn.coeff_cb),
          np.asarray(syn.coeff_cr)]
    mv8 = np.asarray(syn.mv8)
    rows, ys = [], []
    log2_ctu = cfg.log2_ctu
    for d in range(log2_ctu - 2):
        n = cfg.ctu_size >> d
        k = n // 8
        grid = mv8[::k, ::k].astype(np.float64)
        pred = np.roll(grid, 1, axis=1)
        pred[:, 0] = 0
        dd = np.abs(grid - pred)
        c = 1.0 + np.where(dd > 0, 2.0 + np.where(
            dd > 1, 2.0 * np.ceil(np.log2((dd - 1.0) / 2.0 + 1.0))
            + 2.0, 0.0), 0.0)
        mvd_per = c.sum(-1)
        dm = depth8[::k, ::k]
        for (gy, gx) in np.argwhere(dm == d):
            cy8, cx8 = gy * k, gx * k
            if cy8 + k > n8y or cx8 + k > n8x:
                continue
            if syn.intra8 is not None and syn.intra8[cy8, cx8]:
                continue
            nnz = slog = coded = 0.0
            for pi, plane in enumerate(cf):
                kk = n if pi == 0 else n // 2
                py0 = (cy8 * 8) >> (pi > 0)
                px0 = (cx8 * 8) >> (pi > 0)
                a = np.abs(plane[py0:py0 + kk, px0:px0 + kk])
                bn = (a > 0).sum()
                nnz += bn
                slog += bitlen(a).sum()
                coded += bn > 0
            rows.append([nnz, slog, coded, 1.0, mvd_per[gy, gx]])
            ys.append(bits8[cy8, cx8])
    return rows, ys


def main():
    qps = [20, 24, 28, 32, 36, 40, 44]
    data = {q: ([], []) for q in qps}
    split_pts = {q: ([], []) for q in qps}
    for ci, frames in enumerate(clips()):
        h, w = frames[0][0].shape
        for qp in qps:
            cfg = EncoderConfig(width=w, height=h, qp=qp, deblock=True,
                                sao=False)
            enc = IntraEncoder(cfg)
            r0 = enc.encode_frame(*frames[0], qp=max(qp - 3, 0))
            enc.ref = r0.recon
            enc.poc = 0
            rs = enc.encode_pgop(frames[1:])
            for r in rs:
                rows, ys = cu_records(r.syntax, cfg, qp)
                data[qp][0].extend(rows)
                data[qp][1].extend(ys)
                # split-flag cost: frame slice bits minus CU bits,
                # against the coded split-flag count
                fb = features_of(r.syntax,
                                 mvd_proxy(r.syntax.mv8,
                                           r.syntax.depth8), h, w)
                split_pts[qp][0].append(fb[4])
                split_pts[qp][1].append(r.bits - sum(ys))
            print(f"clip {ci} qp {qp}: "
                  f"{[r.bits for r in rs]}", flush=True)

    print("\n# paste into x265_tpu/common/bit_calib.py:")
    print("BIT_CALIB = {")
    for i, qp in enumerate(qps):
        # pool each QP with its neighbours for conditioning, and
        # decorrelate nnz/slog (corr ~0.95) by fitting
        # [nnz, slog - nnz] then mapping back
        rows, ys, sn, sy = [], [], [], []
        for q2 in qps[max(i - 1, 0):i + 2]:
            rows += data[q2][0]
            ys += data[q2][1]
            sn += split_pts[q2][0]
            sy += split_pts[q2][1]
        X = np.stack(rows).astype(np.float64)
        y = np.array(ys, np.float64)
        Xd = X.copy()
        Xd[:, 1] = X[:, 1] - X[:, 0]          # excess bitlen
        coef = _nnls(Xd, y)
        a, bcoef = coef[0] - coef[1], coef[1]
        A, B, C, H, M = a, bcoef, coef[2], coef[3], coef[4]
        # split-flag cost with an intercept absorbing the per-frame
        # overhead the CU harvest doesn't cover (slice header, CTU
        # terminators, intra-in-inter CUs)
        sn_a = np.array(sn, np.float64)
        sy_a = np.array(sy, np.float64)
        Xs = np.stack([sn_a, np.ones_like(sn_a)], axis=1)
        sol, *_ = np.linalg.lstsq(Xs, sy_a, rcond=None)
        S = max(float(sol[0]), 0.0)
        out = np.array([A, B, C, H, S, M, 0.0])
        pred = X @ np.array([A, B, C, H, M])
        err = np.abs(pred - y) / np.maximum(y, 1)
        print(f"    {qp}: ({', '.join(f'{c:.4f}' for c in out)}),"
              f"  # per-CU mean|err| {err.mean()*100:.1f}%")
    print("}")


def _nnls(X, y, iters: int = 60):
    """Projected-gradient non-negative least squares (no scipy dep):
    negative rates would invert the RD preference ordering."""
    n = X.shape[1]
    scale = np.sqrt((X * X).mean(axis=0)) + 1e-9
    Xs = X / scale
    w = np.full(n, 0.1)
    lr = 1.0 / (np.linalg.norm(Xs, 2) ** 2)
    for _ in range(iters * 50):
        g = Xs.T @ (Xs @ w - y)
        w = np.maximum(w - lr * g, 0.0)
    return w / scale


if __name__ == "__main__":
    main()
