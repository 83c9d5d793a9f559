"""Lossless coding via cu_transquant_bypass (x265 --lossless,
param.cpp bLossless): PPS transquant_bypass_enabled_flag, the bypass
flag as the first CU syntax element (7.3.8.5), residual coded raw
(8.6.1), loop filters forced off. The decoded output must equal the
SOURCE bit-exactly."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _noisy(h=64, w=96, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 3 + yy * 2) % 256) +
                rng.integers(-20, 20, (h, w)), 0, 255).astype(np.uint8)
    cb = np.clip(120 + rng.integers(-15, 15, (h // 2, w // 2)),
                 0, 255).astype(np.uint8)
    cr = np.clip(135 + rng.integers(-15, 15, (h // 2, w // 2)),
                 0, 255).astype(np.uint8)
    return y, cb, cr


@pytest.mark.parametrize("native", [True, False])
def test_lossless_roundtrip_exact(native):
    y, cb, cr = _noisy()
    cfg = EncoderConfig(width=96, height=64, qp=32, lossless=True)
    enc = IntraEncoder(cfg)
    res = enc.encode_frame(y, cb, cr, use_native_cabac=native)
    assert np.array_equal(res.recon.y, y.astype(np.int32))
    d = decode_annexb(res.bitstream)[0]
    assert np.array_equal(d.y, y.astype(np.int32))
    assert np.array_equal(d.cb, cb.astype(np.int32))
    assert np.array_equal(d.cr, cr.astype(np.int32))


def test_lossless_compresses_structure():
    """Smooth content must compress well below raw size; noise must
    still round-trip (no compression guarantee)."""
    yy, xx = np.mgrid[0:64, 0:96]
    y = ((xx + yy) // 4 * 4 % 256).astype(np.uint8)
    c = np.full((32, 48), 128, np.uint8)
    cfg = EncoderConfig(width=96, height=64, qp=32, lossless=True)
    res = IntraEncoder(cfg).encode_frame(y, c, c)
    raw = 96 * 64 * 3 // 2
    assert len(res.bitstream) < raw // 2
    d = decode_annexb(res.bitstream)[0]
    assert np.array_equal(d.y, y.astype(np.int32))


def test_lossless_forces_filters_off():
    y, cb, cr = _noisy(seed=9)
    cfg = EncoderConfig(width=96, height=64, qp=32, lossless=True,
                        deblock=True, sao=True, sign_hiding=True)
    enc = IntraEncoder(cfg)
    res = enc.encode_frame(y, cb, cr)
    assert not cfg.deblock and not cfg.sao and not cfg.sign_hiding
    d = decode_annexb(res.bitstream)[0]
    assert np.array_equal(d.y, y.astype(np.int32))
    assert np.array_equal(d.cb, cb.astype(np.int32))
    assert np.array_equal(d.cr, cr.astype(np.int32))
