"""RDOQ (batched rate-distortion optimized quantization; the
vectorizable core of x265 rdoQuant, quant.cpp:610): round-half
quantization with per-coefficient {level, level-1, 0} choice by
lambda2-scaled cost, plus CG/TU zeroing passes.

Contract: streams stay conformant (decoder == encoder recon
bit-exactly); at huge lambda everything zeroes; at tiny lambda the
result is plain round-half quantization."""

import numpy as np
import jax.numpy as jnp

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder
from x265_tpu.ops.transforms import (dct_batch, rdoq_batch, dequant_np,
                                     idct_np)


def test_rdoq_limits():
    rng = np.random.default_rng(7)
    resi = rng.integers(-40, 40, (12, 8, 8)).astype(np.int32)
    tcoef = dct_batch(jnp.asarray(resi), 8)
    # enormous lambda zeroes everything
    allz = rdoq_batch(tcoef, 8, 32, lam2=1e12)
    assert not np.asarray(allz).any()
    # tiny lambda == round-half quantization exactly
    out = np.asarray(rdoq_batch(tcoef, 8, 32, lam2=1e-6))
    from x265_tpu.common.tables import (QUANT_SCALES, QUANT_SHIFT,
                                        transform_shift)
    qbits = QUANT_SHIFT + 32 // 6 + transform_shift(3, 8)
    a = np.abs(np.asarray(tcoef)).astype(np.int64) * int(QUANT_SCALES[32 % 6])
    ref = np.sign(np.asarray(tcoef)) * np.minimum(
        (a + (1 << (qbits - 1))) >> qbits, 32767)
    assert np.array_equal(out, ref)


def test_rdoq_decisions_are_rd_sane():
    """Every deviation from round-half must pay: the pixel-SSE
    increase stays below lambda2 * (a generous bits bound)."""
    rng = np.random.default_rng(11)
    resi = rng.integers(-25, 25, (6, 8, 8)).astype(np.int32)
    tcoef = dct_batch(jnp.asarray(resi), 8)
    lam2 = 120.0
    base = np.asarray(rdoq_batch(tcoef, 8, 36, lam2=1e-6))   # round-half
    out = np.asarray(rdoq_batch(tcoef, 8, 36, lam2))
    assert np.all(np.abs(out) <= np.abs(base))
    for b in range(len(base)):
        d_rh = ((idct_np(dequant_np(base[b], 36), 8) - resi[b]) ** 2).sum()
        d_new = ((idct_np(dequant_np(out[b], 36), 8) - resi[b]) ** 2).sum()
        nchanged = int((base[b] != out[b]).sum())
        assert d_new - d_rh <= lam2 * 8.0 * nchanged + 1e-6


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


def test_rdoq_pgop_roundtrip():
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
    assert bs_on != bs_off     # the quantizer actually changed
