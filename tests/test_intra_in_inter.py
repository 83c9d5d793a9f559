"""Intra CUs inside P frames (checkIntraInInter analog,
search.cpp:1291): occlusion-like content must trigger 8x8 intra CUs,
and the stream must round-trip bit-exactly through the independent
decoder (including bs==2 luma+chroma deblock at intra edges and dQP
interaction)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _frames_with_occlusion(h=64, w=96, seed=21):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 5 + yy * 3) % 256).astype(np.int32)
    base = np.clip(base + rng.integers(-6, 6, (h, w)), 0, 255) \
        .astype(np.uint8)
    cb = np.clip(110 + (xx[::2, ::2] >> 3), 0, 255).astype(np.uint8)
    cr = np.clip(140 - (yy[::2, ::2] >> 3), 0, 255).astype(np.uint8)
    f0 = (base, cb, cr)
    # frame 1: pan + a REVEALED region of brand-new smooth content
    y1 = np.roll(base, 4, axis=1).copy()
    gy, gx = np.mgrid[0:32, 0:40]
    y1[16:48, 24:64] = np.clip(40 + gy * 3 + gx, 0, 255)  # smooth ramp
    cb1 = cb.copy()
    cb1[8:24, 12:32] = 60
    cr1 = cr.copy()
    cr1[8:24, 12:32] = 190
    return [f0, (y1, cb1, cr1)]


def _encode(cfg, frames, qp_maps=None):
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0], use_device_recon=True)
    enc.ref = r0.device_ref if r0.device_ref is not None else r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:], qp_maps=qp_maps)
    return r0, rs


def test_intra_blocks_trigger_and_roundtrip():
    cfg = EncoderConfig(width=96, height=64, qp=30, deblock=True)
    frames = _frames_with_occlusion()
    r0, rs = _encode(cfg, frames)
    syn = rs[0].syntax
    assert syn.intra8 is not None and syn.intra8.any(), \
        "occlusion content should produce intra CUs in the P frame"
    # no two intra blocks are 8-adjacent (the parity independent set)
    i8 = syn.intra8.astype(int)
    pad = np.pad(i8, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nbr = pad[1 + dy:1 + dy + i8.shape[0],
                      1 + dx:1 + dx + i8.shape[1]]
            assert not np.any(i8 & nbr)
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert np.array_equal(dec[1].y, rs[0].recon.y)
    assert np.array_equal(dec[1].cb, rs[0].recon.cb)
    assert np.array_equal(dec[1].cr, rs[0].recon.cr)


def test_intra_in_inter_with_dqp():
    cfg = EncoderConfig(width=96, height=64, qp=30, deblock=True,
                        aq_mode=2)
    frames = _frames_with_occlusion(seed=22)
    qmaps = np.array([[[28, 33, 30], [35, 29, 31]]], np.int32)
    r0, rs = _encode(cfg, frames, qp_maps=qmaps)
    assert rs[0].syntax.intra8 is not None
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert np.array_equal(dec[1].y, rs[0].recon.y)
    assert np.array_equal(dec[1].cb, rs[0].recon.cb)
    assert np.array_equal(dec[1].cr, rs[0].recon.cr)


def test_intra_in_inter_off():
    cfg = EncoderConfig(width=96, height=64, qp=30,
                        intra_in_inter=False)
    frames = _frames_with_occlusion(seed=23)
    r0, rs = _encode(cfg, frames)
    assert rs[0].syntax.intra8 is None
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert np.array_equal(dec[1].y, rs[0].recon.y)
