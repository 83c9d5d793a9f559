"""Device-resident encode pipeline: I-frame filters on device, the
reference picture chained into the P GOP without host round-trips
(the frame-pipeline PicYuv-residency analog of frameencoder.cpp)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder

from test_inter_e2e import moving_sequence


def test_device_iframe_chained_pgop_roundtrip():
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, deblock=True, sao=True)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 4)
    r0 = enc.encode_frame(*frames[0], use_device_recon=True)
    assert r0.device_ref is not None
    enc.ref = r0.device_ref
    rs = enc.encode_pgop(frames[1:])
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    decs = decode_annexb(stream)
    assert len(decs) == 4
    np.testing.assert_array_equal(decs[0].y, r0.recon.y)
    np.testing.assert_array_equal(decs[0].cb, r0.recon.cb)
    np.testing.assert_array_equal(decs[0].cr, r0.recon.cr)
    for i, (d, r) in enumerate(zip(decs[1:], rs)):
        np.testing.assert_array_equal(d.y, r.recon.y, err_msg=f"P{i}")
        np.testing.assert_array_equal(d.cb, r.recon.cb, err_msg=f"P{i}")
        np.testing.assert_array_equal(d.cr, r.recon.cr, err_msg=f"P{i}")


def test_need_recon_false_skips_download():
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=32)
    enc = IntraEncoder(cfg)
    y = np.full((h, w), 100, np.uint8)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    r = enc.encode_frame(y, c, c, use_device_recon=True,
                         need_recon=False)
    assert r.recon is None and r.device_ref is not None
    # stream still decodes against the device recon
    d = decode_annexb(r.bitstream)[0]
    host = r.device_ref.to_recon()
    np.testing.assert_array_equal(d.y, host.y)
