"""End-to-end all-intra conformance tests.

The validation decoder (written independently from the spec's decoding
clauses) parses the emitted Annex-B stream and reconstructs; tests
assert its output is bit-exact with the encoder's reconstruction —
the same contract x265's golden-bitstream regression suite enforces
(reference: source/test/regression-tests.txt:3-6).
"""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb


def synth_frame(w, h, seed=7):
    """Structured synthetic content: gradients + edges + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 255 // max(w - 1, 1) + yy * 64 // max(h - 1, 1)) % 256
    y[h // 4:h // 2, w // 4:w // 2] = 200
    y = np.clip(y + rng.integers(-8, 8, size=(h, w)), 0, 255)
    cb = np.clip(128 + (xx[::2, ::2] // 4) + rng.integers(-4, 4,
                 size=(h // 2, w // 2)), 0, 255)
    cr = np.clip(128 - (yy[::2, ::2] // 4) + rng.integers(-4, 4,
                 size=(h // 2, w // 2)), 0, 255)
    return (y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8))


@pytest.mark.parametrize("w,h,qp", [(64, 64, 32), (96, 64, 27), (64, 64, 40)])
def test_intra_roundtrip(w, h, qp):
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    enc = IntraEncoder(cfg)
    y, cb, cr = synth_frame(w, h)
    res = enc.encode_frame(y, cb, cr)
    frames = decode_annexb(res.bitstream)
    assert len(frames) == 1
    dec = frames[0]
    assert dec.qp == qp
    np.testing.assert_array_equal(dec.y, res.recon.y)
    np.testing.assert_array_equal(dec.cb, res.recon.cb)
    np.testing.assert_array_equal(dec.cr, res.recon.cr)
    # decisions decoded identically
    np.testing.assert_array_equal(dec.depth8, res.syntax.depth8)
    np.testing.assert_array_equal(dec.mode8, res.syntax.mode8)


def test_intra_nonaligned_size():
    """Width/height not CTU- or 16-multiples: forced boundary splits."""
    w, h = 72, 48   # multiples of 8 only
    cfg = EncoderConfig(width=w, height=h, qp=30)
    enc = IntraEncoder(cfg)
    y, cb, cr = synth_frame(w, h, seed=3)
    res = enc.encode_frame(y, cb, cr)
    dec = decode_annexb(res.bitstream)[0]
    np.testing.assert_array_equal(dec.y, res.recon.y)
    np.testing.assert_array_equal(dec.cb, res.recon.cb)
    np.testing.assert_array_equal(dec.cr, res.recon.cr)


def test_intra_quality():
    """Recon must be close to the source at moderate QP (sanity on the
    whole prediction/transform chain, not just self-consistency)."""
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=22)
    enc = IntraEncoder(cfg)
    y, cb, cr = synth_frame(w, h, seed=11)
    res = enc.encode_frame(y, cb, cr)
    mse = float(np.mean((res.recon.y.astype(np.float64) - y) ** 2))
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 38.0, f"luma PSNR too low: {psnr:.2f} dB"
