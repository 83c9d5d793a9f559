"""WPP (entropy_coding_sync) substreams: per-CTU-row substreams with
the col-2 context fork, entry point offsets in the slice header, and
byte-aligned subsets (frameencoder.cpp:1509-1537, 1011-1100 behavior;
clauses 7.3.6.1 / 7.4.7.1 / 9.3.1)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig, I_SLICE, P_SLICE
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _frames(n, h=96, w=96, seed=31):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 5 + ((xx * yy) >> 5)) % 256).astype(np.int32)
    base = np.clip(base + rng.integers(-9, 9, (h, w)), 0, 255) \
        .astype(np.uint8)
    cb = np.clip(118 + (xx[::2, ::2] >> 3), 0, 255).astype(np.uint8)
    cr = np.clip(138 - (yy[::2, ::2] >> 3), 0, 255).astype(np.uint8)
    return [(np.roll(base, 3 * i, axis=1), cb, cr) for i in range(n)]


def test_wpp_intra_roundtrip_native_and_python():
    cfg = EncoderConfig(width=96, height=96, qp=31, wpp=True)
    f = _frames(1)[0]
    res_nat = IntraEncoder(cfg).encode_frame(*f)
    res_py = IntraEncoder(cfg).encode_frame(*f, use_native_cabac=False)
    assert res_nat.bitstream == res_py.bitstream, \
        "native and python WPP substreams must be bit-identical"
    dec = decode_annexb(res_nat.bitstream)[0]
    assert np.array_equal(dec.y, res_nat.recon.y)
    assert np.array_equal(dec.cb, res_nat.recon.cb)


def test_wpp_vs_nonwpp_same_recon():
    """WPP changes the stream layout but NOT the reconstruction
    (threading.rst:56: WPP costs <1% bitrate, same decisions here)."""
    f = _frames(1, seed=32)[0]
    a = IntraEncoder(EncoderConfig(width=96, height=96, qp=31,
                                   wpp=True)).encode_frame(*f)
    b = IntraEncoder(EncoderConfig(width=96, height=96, qp=31,
                                   wpp=False)).encode_frame(*f)
    assert np.array_equal(a.recon.y, b.recon.y)
    assert a.bitstream != b.bitstream


def test_wpp_ippp_roundtrip():
    cfg = EncoderConfig(width=96, height=96, qp=31, wpp=True,
                        deblock=True)
    frames = _frames(4, seed=33)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert len(dec) == 4
    for d, r in zip(dec, [r0] + rs):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)


def test_wpp_with_dqp_and_sao():
    cfg = EncoderConfig(width=96, height=96, qp=31, wpp=True, sao=True,
                        deblock=True, aq_mode=2)
    frames = _frames(3, seed=34)
    enc = IntraEncoder(cfg)
    rs = enc.encode_sequence(frames)
    dec = decode_annexb(b"".join(r.bitstream for r in rs))
    for d, r in zip(dec, rs):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)


def test_wpp_bframes_roundtrip():
    cfg = EncoderConfig(width=96, height=96, qp=31, wpp=True,
                        bframes=2, num_refs=2)
    frames = _frames(5, seed=35)
    enc = IntraEncoder(cfg)
    rs = enc.encode_hier_gop(frames)
    dec = decode_annexb(b"".join(r.bitstream for r in rs))
    by_poc = {d.poc: d for d in dec}
    for r in rs:
        d = by_poc[r.poc]
        assert np.array_equal(d.y, r.recon.y)
