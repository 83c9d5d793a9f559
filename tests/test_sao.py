"""SAO: e2e conformance + quality improvement sanity."""

import numpy as np
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb

from test_intra_e2e import synth_frame
from test_inter_e2e import moving_sequence


def test_sao_intra_roundtrip():
    w = h = 64
    cfg = EncoderConfig(width=w, height=h, qp=37, deblock=True, sao=True)
    enc = IntraEncoder(cfg)
    y, cb, cr = synth_frame(w, h, seed=17)
    res = enc.encode_frame(y, cb, cr)
    dec = decode_annexb(res.bitstream)[0]
    np.testing.assert_array_equal(dec.y, res.recon.y)
    np.testing.assert_array_equal(dec.cb, res.recon.cb)
    np.testing.assert_array_equal(dec.cr, res.recon.cr)


def test_sao_ippp_roundtrip():
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=35, deblock=True, sao=True,
                        hash_sei=True)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 3, seed=19)
    results = enc.encode_sequence(frames)
    decs = decode_annexb(b"".join(r.bitstream for r in results))
    for i, (d, r) in enumerate(zip(decs, results)):
        np.testing.assert_array_equal(d.y, r.recon.y, err_msg=f"frame {i}")
        np.testing.assert_array_equal(d.cb, r.recon.cb)
        np.testing.assert_array_equal(d.cr, r.recon.cr)


def test_sao_improves_quality():
    """At high QP, SAO recon must be closer to the source (that is its
    entire purpose) on at least the luma plane."""
    w = h = 96
    y, cb, cr = synth_frame(w, h, seed=23)
    mses = {}
    for sao in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=42, deblock=True, sao=sao)
        res = IntraEncoder(cfg).encode_frame(y, cb, cr)
        mses[sao] = float(np.mean((res.recon.y.astype(np.float64) - y) ** 2))
    assert mses[True] <= mses[False], mses
