"""PART_NxN intra (4x4 luma PUs/TUs with DST-IV): e2e conformance and
host-vs-device bit-exactness. Reference behavior: x265
source/encoder/search.cpp:2166 (checkIntra PART_NxN), clause 7.3.8.5
(two-loop PU mode signalling), 7.3.8.8 (implicit transform split)."""

import numpy as np
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder
from x265_tpu.enc.intra_analysis import analyze_intra_frame
from x265_tpu.enc.intra_recon import reconstruct_intra_frame
from x265_tpu.enc.encoder import pad_plane


def detail_frame(w, h, seed=3):
    """High-detail content that makes 4x4 PUs win: fine diagonal
    structure with varying orientation per region."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = 128 + 60 * np.sin(xx * 0.9 + (yy // 8) * 2.0) \
        * np.cos(yy * 0.7 + (xx // 16))
    y = np.clip(y + rng.integers(-6, 6, (h, w)), 0, 255)
    cb = np.clip(120 + (xx[::2, ::2] % 16) * 4, 0, 255)
    cr = np.clip(135 - (yy[::2, ::2] % 16) * 4, 0, 255)
    return (y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8))


def test_analysis_picks_some_nxn():
    y, _, _ = detail_frame(64, 64)
    d8, m8, nxn8, mode4 = analyze_intra_frame(y, 27, 32, 8,
                                              intra_nxn=True)
    assert nxn8.any(), "detail content should trigger PART_NxN"
    # the four PU modes of an NxN CU should not be all identical
    ys, xs = np.nonzero(nxn8)
    diverse = False
    for yy_, xx_ in zip(ys, xs):
        blk = mode4[yy_ * 2:yy_ * 2 + 2, xx_ * 2:xx_ * 2 + 2]
        if len(np.unique(blk)) > 1:
            diverse = True
            break
    assert diverse


@pytest.mark.parametrize("use_native", [False, True])
def test_nxn_e2e_roundtrip(use_native):
    """Stream with NxN CUs decodes bit-exact to the encoder recon,
    through both CABAC implementations."""
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=27, intra_nxn=True)
    enc = IntraEncoder(cfg)
    y, cb, cr = detail_frame(w, h)
    r = enc.encode_frame(y, cb, cr, use_native_cabac=use_native)
    assert r.syntax.nxn8 is not None and r.syntax.nxn8.any()
    d = decode_annexb(r.bitstream)[0]
    np.testing.assert_array_equal(d.y, r.recon.y)
    np.testing.assert_array_equal(d.cb, r.recon.cb)
    np.testing.assert_array_equal(d.cr, r.recon.cr)


def test_nxn_device_recon_matches_host():
    """Wavefront recon with NxN CUs == host oracle, bit-exact."""
    from x265_tpu.enc.intra_recon_tpu import reconstruct_intra_frame_tpu
    w, h, qp = 96, 64, 24
    cfg = EncoderConfig(width=w, height=h, qp=qp, intra_nxn=True)
    y, cb, cr = detail_frame(w, h, seed=3)
    wp, hp = cfg.width_padded, cfg.height_padded
    yp = pad_plane(y, hp, wp)
    cbp = pad_plane(cb, hp // 2, wp // 2)
    crp = pad_plane(cr, hp // 2, wp // 2)
    d8, m8, nxn8, mode4 = analyze_intra_frame(yp, qp, cfg.ctu_size,
                                              cfg.bit_depth,
                                              intra_nxn=True)
    assert nxn8.any()
    syn_h, rec_h = reconstruct_intra_frame(yp, cbp, crp, d8, m8, cfg,
                                           nxn8=nxn8, mode4=mode4)
    syn_d, rec_d = reconstruct_intra_frame_tpu(yp, cbp, crp, d8, m8, cfg,
                                               nxn8=nxn8, mode4=mode4)
    np.testing.assert_array_equal(syn_d.coeff_y, syn_h.coeff_y)
    np.testing.assert_array_equal(syn_d.coeff_cb, syn_h.coeff_cb)
    np.testing.assert_array_equal(syn_d.coeff_cr, syn_h.coeff_cr)
    np.testing.assert_array_equal(rec_d.y, rec_h.y)
    np.testing.assert_array_equal(rec_d.cb, rec_h.cb)
    np.testing.assert_array_equal(rec_d.cr, rec_h.cr)


def test_nxn_improves_quality_at_bitrate():
    """NxN on must not lose PSNR-per-bit vs off on detailed content."""
    w, h = 64, 64
    y, cb, cr = detail_frame(w, h, seed=5)
    out = {}
    for nxn in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=30, intra_nxn=nxn)
        r = IntraEncoder(cfg).encode_frame(y, cb, cr,
                                           use_native_cabac=False)
        mse = np.mean((r.recon.y.astype(np.int64) - y) ** 2)
        out[nxn] = (r.bits, mse)
    bits_off, mse_off = out[False]
    bits_on, mse_on = out[True]
    # either cheaper at no worse distortion, or better distortion at
    # no more bits (the analysis only picks NxN when RD-better)
    assert (bits_on <= bits_off * 1.02 and mse_on <= mse_off * 1.02) or \
        (mse_on < mse_off) or (bits_on < bits_off)
