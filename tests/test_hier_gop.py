"""Hierarchical-B GOP-8 (B-pyramid) round-trip: reference Bs, general
RPS, layer QP offsets — BASELINE config 3 structure."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _clip(nf, h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 4 + yy * 3) % 210 + 20).astype(np.int32)
    out = []
    for i in range(nf):
        y = np.clip(np.roll(base, i * 2, axis=1) +
                    rng.integers(-5, 5, (h, w)), 0, 255).astype(np.uint8)
        cb = np.clip(118 + (xx[::2, ::2] >> 5) + i, 0, 255) \
            .astype(np.uint8)
        cr = np.full((h // 2, w // 2), 132, np.uint8)
        out.append((y, cb, cr))
    return out


def test_gop8_pyramid_roundtrip():
    h, w = 64, 96
    frames = _clip(9, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=30, deblock=True, sao=False)
    enc = IntraEncoder(cfg)
    results = enc.encode_hier_gop(frames)
    assert len(results) == 9
    stream = b"".join(r.bitstream for r in results)
    dec = decode_annexb(stream)
    assert len(dec) == 9
    # decode order: layer-batched pyramid (the fused device B path
    # encodes each pyramid layer as one dispatch): I0, P8, then BREF
    # layer 1 (B4), BREF layer 2 (B2, B6), non-ref leaves (B1 B3 B5 B7)
    expect_pocs = [0, 8, 4, 2, 6, 1, 3, 5, 7]
    for df, r, poc in zip(dec, results, expect_pocs):
        assert df.poc == poc or poc == 0
        np.testing.assert_array_equal(df.y, r.recon.y,
                                      err_msg=f"poc {poc} y")
        np.testing.assert_array_equal(df.cb, r.recon.cb,
                                      err_msg=f"poc {poc} cb")
        np.testing.assert_array_equal(df.cr, r.recon.cr,
                                      err_msg=f"poc {poc} cr")


def test_gop5_pyramid_roundtrip():
    """Non-power-of-two mini-GOP (bisection handles any length)."""
    h, w = 64, 64
    frames = _clip(6, h, w, seed=13)
    cfg = EncoderConfig(width=w, height=h, qp=32, deblock=False,
                        sao=False)
    enc = IntraEncoder(cfg)
    results = enc.encode_hier_gop(frames)
    stream = b"".join(r.bitstream for r in results)
    dec = decode_annexb(stream)
    assert len(dec) == 6
    for df, r in zip(dec, results):
        np.testing.assert_array_equal(df.y, r.recon.y)
        np.testing.assert_array_equal(df.cb, r.recon.cb)
        np.testing.assert_array_equal(df.cr, r.recon.cr)
