"""Main10 (10-bit) all-intra + IPPP conformance."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb


def synth10(w, h, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 9 + yy * 5) % 1024).astype(np.int32)
    y = np.clip(y + rng.integers(-24, 24, (h, w)), 0, 1023).astype(np.uint16)
    cb = np.full((h // 2, w // 2), 512, np.uint16)
    cr = np.full((h // 2, w // 2), 480, np.uint16)
    return y, cb, cr


def test_main10_intra_roundtrip():
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, bit_depth=10)
    enc = IntraEncoder(cfg)
    y, cb, cr = synth10(w, h, 21)
    res = enc.encode_frame(y, cb, cr)
    dec = decode_annexb(res.bitstream)[0]
    np.testing.assert_array_equal(dec.y, res.recon.y)
    np.testing.assert_array_equal(dec.cb, res.recon.cb)
    np.testing.assert_array_equal(dec.cr, res.recon.cr)
    mse = float(np.mean((res.recon.y.astype(np.float64) - y) ** 2))
    psnr = 10 * np.log10(1023 ** 2 / max(mse, 1e-9))
    assert psnr > 40


def test_main10_ippp_roundtrip():
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, bit_depth=10,
                        hash_sei=True)
    enc = IntraEncoder(cfg)
    f0 = synth10(w, h, 22)
    y1 = np.roll(f0[0], 2, axis=1)
    results = enc.encode_sequence([f0, (y1, f0[1], f0[2])])
    stream = b"".join(r.bitstream for r in results)
    decs = decode_annexb(stream)   # hash SEI self-check included
    for d, r in zip(decs, results):
        np.testing.assert_array_equal(d.y, r.recon.y)


def test_main10_hier_b_roundtrip():
    """Device B pipeline at 10 bits (raw 26-bit bi combine must stay
    exact with the deeper samples)."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:96]
    y = ((xx * 9 + yy * 7) % 1024).astype(np.uint16)
    c = np.full((32, 48), 512, np.uint16)
    cfg = EncoderConfig(width=96, height=64, qp=30, bit_depth=10,
                        bframes=2, num_refs=2, deblock=True)
    enc = IntraEncoder(cfg)
    frames = [(np.roll(y, 3 * i, 1), c, c) for i in range(5)]
    rs = enc.encode_hier_gop(frames)
    dec = decode_annexb(b"".join(r.bitstream for r in rs))
    by_poc = {d.poc: d for d in dec}
    for r in rs:
        d = by_poc[r.poc]
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
