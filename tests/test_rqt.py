"""Inter RQT (TU tree depth 1; VERDICT r03 missing #1): 16/32 CUs may
code their residual as four sub-TUs. Device RD chooses per CU
(estimateResidualQT analog, search.cpp:3178); split_transform_flag /
per-TU cbf syntax (clause 7.3.8.8) must round-trip the independent
decoder bit-exactly, including the TU-edge deblocking it implies."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _busy_frames(n, h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 6)) % 256).astype(np.int32)
    tex = rng.integers(-30, 30, (h, w))
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, 3 * i, axis=1) + tex +
                    rng.integers(-8, 8, (h, w)), 0, 255).astype(np.uint8)
        c = np.clip(128 + (xx[::2, ::2] >> 3) +
                    rng.integers(-20, 20, (h // 2, w // 2)),
                    0, 255).astype(np.uint8)
        out.append((y, c, c.copy()))
    return out


def _roundtrip(cfg, frames):
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0], qp=max(cfg.qp - 3, 0))
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    stream = b"".join(r.bitstream for r in [r0] + rs)
    dec = decode_annexb(stream)
    for d, r in zip(dec, [r0] + rs):
        assert np.array_equal(d.y, np.asarray(r.recon.y))
        assert np.array_equal(d.cb, np.asarray(r.recon.cb))
        assert np.array_equal(d.cr, np.asarray(r.recon.cr))
    return rs, stream


def test_rqt_splits_chosen_and_decode_exact():
    cfg = EncoderConfig(width=192, height=128, qp=26, deblock=True,
                        sao=False)
    frames = _busy_frames(4, 128, 192)
    rs, _ = _roundtrip(cfg, frames)
    nsplit = sum(int(np.asarray(r.syntax.tusplit8).sum())
                 if r.syntax.tusplit8 is not None else 0 for r in rs)
    assert nsplit > 0, "busy low-QP content should pick TU splits"


def test_rqt_improves_rd_on_busy_content():
    """Split availability must not lose RD: encode with and without
    RQT at equal QP; the RQT stream should cost no more bits for
    PSNR at least as high (within noise)."""
    frames = _busy_frames(4, 128, 192)
    cfg_on = EncoderConfig(width=192, height=128, qp=26, deblock=True,
                           sao=False, rqt_inter=True)
    cfg_off = EncoderConfig(width=192, height=128, qp=26, deblock=True,
                            sao=False, rqt_inter=False)
    rs_on, st_on = _roundtrip(cfg_on, frames)
    rs_off, st_off = _roundtrip(cfg_off, frames)

    def sse(rs, fr):
        return sum(float(np.sum((np.asarray(r.recon.y).astype(np.int64)
                                 - f[0].astype(np.int64)) ** 2))
                   for r, f in zip(rs, fr[1:]))

    d_on, d_off = sse(rs_on, frames), sse(rs_off, frames)
    # RD combined check: split never chosen unless cost improves, so
    # allow tiny bit overhead (the per-CU flag) but demand the
    # distortion x rate product not regress
    assert len(st_on) * d_on <= len(st_off) * d_off * 1.02


def test_sps_signals_inter_tu_depth():
    from x265_tpu.decoder.decoder import parse_sps
    from x265_tpu.bitstream.headers import write_sps
    info = parse_sps(write_sps(
        EncoderConfig(width=64, height=64, qp=32, rqt_inter=False)))
    assert info.max_trafo_depth_inter == 0
    info2 = parse_sps(write_sps(
        EncoderConfig(width=64, height=64, qp=32, rqt_inter=True)))
    assert info2.max_trafo_depth_inter == 1


def test_lowpass_dct_decodes_and_saves_bits():
    """--lowpass-dct (lowpassdct.cpp analog): encoder-side approximate
    transform; streams stay conformant (decode-exact) and noisy
    content codes fewer bits at a small PSNR cost."""
    frames = _busy_frames(4, 128, 192, seed=9)
    cfg_on = EncoderConfig(width=192, height=128, qp=30, deblock=True,
                           lowpass_dct=True)
    cfg_off = EncoderConfig(width=192, height=128, qp=30, deblock=True)
    rs_on, st_on = _roundtrip(cfg_on, frames)
    rs_off, st_off = _roundtrip(cfg_off, frames)
    assert len(st_on) < len(st_off), \
        "lowpass DCT should drop high-band bits on noisy content"


def test_noise_reduction_denoises_and_decodes():
    """--nr-inter (denoiseDct, quant.cpp:744): encoder-side coefficient
    denoising accumulated across the GOP; streams decode exactly and
    grain content codes fewer bits."""
    frames = _busy_frames(6, 128, 192, seed=13)
    cfg_on = EncoderConfig(width=192, height=128, qp=28, deblock=True,
                           nr_inter=600)
    cfg_off = EncoderConfig(width=192, height=128, qp=28, deblock=True)
    rs_on, st_on = _roundtrip(cfg_on, frames)
    rs_off, st_off = _roundtrip(cfg_off, frames)
    assert len(st_on) < len(st_off), \
        "noise reduction should strip grain bits"
