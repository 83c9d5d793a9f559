"""Rate control: ABR converges to target bitrate within tolerance,
per-frame QP streams stay conformant (decoder round-trip)."""

import numpy as np

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.enc.ratecontrol import RateControl
from x265_tpu.decoder import decode_annexb

from test_inter_e2e import moving_sequence


def test_abr_feedback_adjusts_qp():
    cfg = EncoderConfig(width=96, height=64, qp=32, rc_mode="abr",
                        bitrate=100, fps_num=25)
    rc = RateControl(cfg)
    qps = []
    for i in range(30):
        qp = rc.frame_qp(i == 0, complexity=5e4)
        # pretend every frame vastly overshoots: QP must rise
        rc.frame_done(bits=60000, qp=qp, complexity=5e4, is_intra=(i == 0))
        qps.append(qp)
    assert qps[-1] > qps[1] + 3, qps
    rc2 = RateControl(cfg)
    qps2 = []
    for i in range(30):
        qp = rc2.frame_qp(i == 0, complexity=5e4)
        rc2.frame_done(bits=50, qp=qp, complexity=5e4, is_intra=(i == 0))
        qps2.append(qp)
    assert qps2[-1] < qps2[1] - 3, qps2


def test_variable_qp_stream_conformant():
    """Per-frame QP changes ride slice_qp_delta; decode must stay
    bit-exact."""
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 4, seed=6)
    results = []
    qps = [34, 28, 31, 37]
    for i, (y, cb, cr) in enumerate(frames):
        if i == 0:
            r = enc.encode_frame(y, cb, cr, qp=qps[i])
            enc.ref = r.recon
        else:
            r = enc.encode_frame_p(y, cb, cr, qp=qps[i])
        results.append(r)
    stream = b"".join(r.bitstream for r in results)
    decs = decode_annexb(stream)
    for i, (d, r) in enumerate(zip(decs, results)):
        assert d.qp == qps[i]
        np.testing.assert_array_equal(d.y, r.recon.y, err_msg=f"frame {i}")


def test_two_pass_hits_target():
    """Pass-2 solver: recorded pass-1 stats -> QPs that hit the bit
    target under the bits~k/qscale model."""
    from x265_tpu.enc.ratecontrol import (TwoPassLog, TwoPassRateControl,
                                          qp_to_qscale)
    cfg = EncoderConfig(width=96, height=64, qp=32, rc_mode="abr",
                        bitrate=100, fps_num=25, fps_den=1)
    log = TwoPassLog("/tmp/test2pass.log")
    rng = np.random.default_rng(0)
    for i in range(50):
        t = "I" if i % 25 == 0 else "P"
        cplx = 3e4 if t == "I" else float(rng.uniform(5e3, 2e4))
        bits = int((60000 if t == "I" else 9000) * cplx / 2e4)
        log.record(t, 32, bits, cplx)
    log.write()
    log2 = TwoPassLog.read("/tmp/test2pass.log")
    rc2 = TwoPassRateControl(cfg, log2)
    est = 0.0
    for i in range(50):
        t, qp = rc2.frame_qp()
        est += log2.frames[i]["bits"] * qp_to_qscale(log2.frames[i]["qp"]) \
            / qp_to_qscale(qp) / (1.0 if t == "P" else 1.0)
    target = 100e3 / 25 * 50
    assert abs(est - target) / target < 0.25, (est, target)


def test_encoder_stats():
    cfg = EncoderConfig(width=64, height=64, qp=30, bframes=1, num_refs=2)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(64, 64, 3, seed=2)
    enc.encode_bgop(frames)
    st = enc.get_stats()
    assert st["frames"] == 3
    assert st["count_by_type"] == {"I": 1, "P": 1, "B": 1}
    assert st["kbps"] > 0 and 0 < st["avg_qp"] <= 51
