"""Polyphase scaler (scaler.cpp analog) + ABR ladder runner
(abrEncApp analog)."""

import io
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

import numpy as np

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.ops.scaler import scale_frame, scale_plane


def test_scaler_constant_plane():
    p = np.full((64, 96), 57, np.uint8)
    out = scale_plane(p, 32, 48)
    assert out.shape == (32, 48)
    assert np.all(out == 57)       # DC preservation (kernel normalized)


def test_scaler_gradient_preserved():
    yy, xx = np.mgrid[0:64, 0:128]
    p = (xx * 2).astype(np.uint8)
    out = scale_plane(p, 32, 64)
    # gradient midpoints (away from borders) stay on the ramp
    expect = (np.arange(64) * 4 + 1)
    assert np.abs(out[16, 4:-4].astype(int) - expect[4:-4]).max() <= 3


def test_scaler_2x_downscale_antialias():
    # alternating columns: 2x downscale should average toward the mean,
    # not alias to one of the two values
    p = np.zeros((32, 64), np.uint8)
    p[:, 1::2] = 200
    out = scale_plane(p, 16, 32)
    assert 60 < out[8, 8:24].mean() < 140


def test_scale_frame_420_shapes():
    y = np.zeros((96, 160), np.uint8)
    cb = np.zeros((48, 80), np.uint8)
    cr = np.zeros((48, 80), np.uint8)
    sy, scb, scr = scale_frame((y, cb, cr), 80, 48)
    assert sy.shape == (48, 80)
    assert scb.shape == (24, 40)
    assert scr.shape == (24, 40)


def test_abr_ladder_two_rungs():
    from x265_tpu.abr import AbrEncoder, Rung
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:96, 0:128]
    base = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    cb = np.full((48, 64), 120, np.uint8)
    cr = np.full((48, 64), 135, np.uint8)
    cfg = EncoderConfig(width=128, height=96, qp=33, deblock=True)
    cfg.bframes = 0
    rungs = [Rung(128, 96, 0), Rung(64, 48, 0)]
    outs = [io.BytesIO(), io.BytesIO()]
    abr = AbrEncoder(rungs, cfg, outs)
    for i in range(3):
        abr.push_frame((np.roll(base, 2 * i, axis=1), cb, cr))
    d0 = decode_annexb(outs[0].getvalue())
    d1 = decode_annexb(outs[1].getvalue())
    assert len(d0) == len(d1) == 3
    assert d0[0].y.shape == (96, 128)
    assert d1[0].y.shape == (48, 64)
