"""RDOQ-lite (batched rate-distortion optimized quantization; the
vectorizable core of x265 rdoQuant, quant.cpp:610): per-coefficient
level choice among {level, level-1, 0} by lambda2-scaled cost.

Contract: levels only move toward zero, streams stay conformant
(decoder == encoder recon bit-exactly), and on noisy content at
moderate QP the optimized stream is smaller."""

import numpy as np
import jax.numpy as jnp

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder
from x265_tpu.ops.transforms import (dct_batch, quant_batch, rdoq_batch,
                                     dequant_np, idct_np)


def test_rdoq_levels_move_toward_zero_only():
    rng = np.random.default_rng(7)
    resi = rng.integers(-40, 40, (12, 8, 8)).astype(np.int32)
    tcoef = dct_batch(jnp.asarray(resi), 8)
    lv = quant_batch(tcoef, 8, 32, intra=False)
    out = rdoq_batch(lv, tcoef, 8, 32, lam2=80.0)
    lv_n, out_n = np.asarray(lv), np.asarray(out)
    assert np.all(np.abs(out_n) <= np.abs(lv_n))
    assert np.all(np.sign(out_n[out_n != 0]) ==
                  np.sign(lv_n[out_n != 0]))
    # at an enormous lambda everything should be zeroed
    allz = rdoq_batch(lv, tcoef, 8, 32, lam2=1e12)
    assert not np.asarray(allz).any()
    # at lambda ~ 0 nothing changes
    keep = rdoq_batch(lv, tcoef, 8, 32, lam2=1e-6)
    assert np.array_equal(np.asarray(keep), lv_n)


def test_rdoq_decisions_are_rd_sane():
    """Every level change must actually pay: the pixel-SSE increase
    stays below lambda2 * (a generous bound on the bits saved)."""
    rng = np.random.default_rng(11)
    resi = rng.integers(-25, 25, (6, 8, 8)).astype(np.int32)
    tcoef = dct_batch(jnp.asarray(resi), 8)
    lam2 = 120.0
    lv = np.asarray(quant_batch(tcoef, 8, 36, intra=False))
    out = np.asarray(rdoq_batch(jnp.asarray(lv), tcoef, 8, 36, lam2))
    for b in range(len(lv)):
        d_old = ((idct_np(dequant_np(lv[b], 36), 8) - resi[b]) ** 2).sum()
        d_new = ((idct_np(dequant_np(out[b], 36), 8) - resi[b]) ** 2).sum()
        nchanged = int((lv[b] != out[b]).sum())
        # 8 bits/coefficient is far above any real coding cost
        assert d_new - d_old <= lam2 * 8.0 * nchanged + 1e-6


def _noisy_frames(h=64, w=96, n=3, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256).astype(np.int32)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, 2 * i, axis=1) +
                    rng.integers(-14, 14, (h, w)), 0, 255).astype(np.uint8)
        cb = np.clip(120 + rng.integers(-10, 10, (h // 2, w // 2)),
                     0, 255).astype(np.uint8)
        cr = np.clip(135 + rng.integers(-10, 10, (h // 2, w // 2)),
                     0, 255).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def _encode(cfg, frames):
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0], use_device_recon=True)
    enc.ref = r0.device_ref if r0.device_ref is not None else r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    bs = r0.bitstream + b"".join(r.bitstream for r in rs)
    return bs, [r0] + list(rs)


def test_rdoq_pgop_roundtrip_and_smaller():
    frames = _noisy_frames()
    base_cfg = dict(width=96, height=64, qp=35, deblock=True,
                    sign_hiding=True)
    bs_off, _ = _encode(EncoderConfig(**base_cfg), frames)
    bs_on, rs = _encode(EncoderConfig(**base_cfg, rdoq=True), frames)
    dec = decode_annexb(bs_on)
    assert len(dec) == len(frames)
    for d, r in zip(dec, rs):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)
    assert len(bs_on) < len(bs_off), (len(bs_on), len(bs_off))
