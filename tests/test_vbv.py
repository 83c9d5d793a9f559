"""VBV/HRD: frame-level buffer model (the row re-encode replacement,
within x265's own VBV test tolerance — rate-control-tests.txt:7), HRD
signalling in the VUI, buffering period / pic timing SEIs, AUD."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc.ratecontrol import RateControl, qp_to_qscale


def test_vbv_clamps_qp_under_pressure():
    cfg = EncoderConfig(width=1920, height=1080, qp=32, rc_mode="abr",
                        bitrate=2000, vbv_bufsize=1000, vbv_maxrate=2000,
                        fps_num=25)
    rc = RateControl(cfg)
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (270, 480)).astype(np.uint8)
    # simulate: every frame costs 4x what the buffer can drain unless
    # qp rises; the controller must raise QP and never underflow hard
    qp = rc.frame_qp(True, rc.frame_complexity(y, None))
    # large-but-feasible I frame: at qp 51 the content still fits the
    # per-frame drain (beyond that only x265's emergency denoise helps)
    rc.frame_done(400_000, qp, 1e6, True)
    qps = [qp]
    for i in range(30):
        c = rc.frame_complexity(y, None)
        q = rc.frame_qp(False, c)
        qps.append(q)
        # frame bits follow the bits*qscale predictor
        bits = int(rc.bits_per_qscale / qp_to_qscale(q))
        rc.frame_done(bits, q, c, False)
    assert rc.vbv_underflows <= 1, "VBV must prevent repeated underflow"
    assert max(qps[1:]) > qps[0], "pressure must raise QP"


def test_vbv_relaxed_when_buffer_full():
    cfg = EncoderConfig(width=640, height=360, qp=32, rc_mode="abr",
                        bitrate=5000, vbv_bufsize=20000,
                        vbv_maxrate=10000)
    rc = RateControl(cfg)
    rc.bits_per_qscale = 1000.0      # tiny frames
    q0 = qp_to_qscale(30)
    assert rc._clip_vbv(q0, False) == q0   # no pressure: unchanged


def test_hrd_headers_and_seis_parse():
    from x265_tpu.bitstream.headers import write_sps
    from x265_tpu.bitstream.sei import (write_aud,
                                        write_buffering_period_sei,
                                        write_pic_timing_sei,
                                        write_recovery_point_sei,
                                        write_user_data_sei)
    from x265_tpu.decoder.decoder import parse_sps
    cfg = EncoderConfig(width=320, height=192, qp=32, vbv_bufsize=1000,
                        vbv_maxrate=2000)
    sps = write_sps(cfg)             # must not crash with HRD present
    s = parse_sps(sps)               # decoder ignores trailing VUI
    assert s.width == 320
    for t, rbsp in (write_aud(1),
                    write_buffering_period_sei(cfg, 9e5),
                    write_pic_timing_sei(cfg, 3),
                    write_recovery_point_sei(0),
                    write_user_data_sei(b"x265_tpu test")):
        assert len(rbsp) >= 1


def test_vbv_stream_decodes():
    """End-to-end: AUD + HRD SEIs in the stream must not break the
    decoder (it skips prefix SEI/AUD NALs)."""
    from x265_tpu.bitstream.nal import annexb_stream
    from x265_tpu.bitstream.sei import write_aud, write_pic_timing_sei
    from x265_tpu.decoder import decode_annexb
    from x265_tpu.enc import IntraEncoder
    cfg = EncoderConfig(width=64, height=64, qp=32, vbv_bufsize=500,
                        vbv_maxrate=1000, aud=True)
    yy, xx = np.mgrid[0:64, 0:64]
    y = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    enc = IntraEncoder(cfg)
    res = enc.encode_frame(y, c, c)
    pre = annexb_stream([write_aud(0), write_pic_timing_sei(cfg, 0)])
    dec = decode_annexb(pre + res.bitstream)
    assert np.array_equal(dec[0].y, res.recon.y)


def test_tunes_and_level_enforce():
    from x265_tpu.common.params import EncoderConfig
    cfg = EncoderConfig(width=352, height=288, qp=30, aq_mode=2,
                        cutree=True)
    cfg.apply_tune("grain")
    assert cfg.aq_mode == 0 and not cfg.cutree
    cfg.apply_tune("zerolatency")
    assert cfg.bframes == 0
    # level enforcement: 352x288 @25fps is level 2.0 -> 1500 kbps cap
    cfg.rc_mode = "abr"
    cfg.bitrate = 50000
    notes = cfg.enforce_level()
    assert notes and cfg.bitrate == 1500
