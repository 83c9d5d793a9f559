#!/usr/bin/env python
"""Self-BD: ours with RDOQ vs ours without (no x265 runs). Negative
BD-rate = RDOQ saves bits at equal quality."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tools.rd_compare import make_clip, clip_psnr, bd_rate

def run(frames, qp, w, h, rdoq):
    from x265_tpu.common.params import EncoderConfig
    from x265_tpu.enc import IntraEncoder
    cfg = EncoderConfig(width=w, height=h, qp=qp, deblock=True,
                        sao=False, rdoq=rdoq)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0], qp=max(qp - 3, 0))
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    bits = r0.bits + sum(r.bits for r in rs)
    recons = [(np.asarray(r.recon.y), np.asarray(r.recon.cb),
               np.asarray(r.recon.cr)) for r in [r0] + rs]
    return bits, clip_psnr(frames, recons)

w, h, nf = 352, 288, 9
frames = make_clip(nf, h, w, seed=0)
pts_off, pts_on = [], []
for qp in (24, 28, 32, 36):
    b0, p0 = run(frames, qp, w, h, False)
    b1, p1 = run(frames, qp, w, h, True)
    print(f"qp {qp}: off {b0}b {p0:.2f}dB | rdoq {b1}b {p1:.2f}dB", flush=True)
    pts_off.append((b0, p0)); pts_on.append((b1, p1))
r_off = [p[0] for p in pts_off]; p_off = [p[1] for p in pts_off]
r_on = [p[0] for p in pts_on]; p_on = [p[1] for p in pts_on]
print(f"self BD-rate (rdoq vs off): {bd_rate(r_off, p_off, r_on, p_on):+.1f}%")
