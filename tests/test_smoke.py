"""Smoke e2e tier: ONE tiny decode-exact round trip per coding path
(the x265 smoke-tests.txt analog, source/test/smoke-tests.txt). The
full-size variants live in the `regression` tier modules; this file is
what keeps the default `pytest -q` run honest about end-to-end
integrity without the multi-minute compiles."""

import numpy as np

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder

H, W = 48, 64


def _frames(n, seed=0, pan=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (H, W + 2 * n * pan)).astype(np.uint8)
    cb = rng.integers(90, 170, (H // 2, W // 2 + n * pan)) \
        .astype(np.uint8)
    return [(base[:, pan * k:pan * k + W],
             cb[:, pan * k // 2:pan * k // 2 + W // 2],
             cb[:, (pan * k + 2) // 2:(pan * k + 2) // 2 + W // 2])
            for k in range(n)]


def _check(rs, stream):
    dec = decode_annexb(stream)
    assert len(dec) == len(rs)
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)
        np.testing.assert_array_equal(np.asarray(r.recon.cb), d.cb)
        np.testing.assert_array_equal(np.asarray(r.recon.cr), d.cr)


def _ippp(frames, **kw):
    cfg = EncoderConfig(width=W, height=H, qp=30, deblock=True,
                        sao=False, **kw)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = [r0] + enc.encode_pgop(frames[1:], need_recon=True)
    return rs, b"".join(r.bitstream for r in rs)


def test_smoke_intra():
    cfg = EncoderConfig(width=W, height=H, qp=30, deblock=True, sao=True)
    enc = IntraEncoder(cfg)
    r = enc.encode_frame(*_frames(1)[0])
    _check([r], r.bitstream)


def test_smoke_ippp_default_tools():
    """The bench/default operating point in miniature: multi-ref +
    TMVP + merge-3 + RQT + weightp + sign hiding + deblock."""
    rs, stream = _ippp(_frames(4), num_refs=2, tmvp=True, max_merge=3)
    _check(rs, stream)


def test_smoke_ctu64():
    rs, stream = _ippp(_frames(3, seed=2), ctu_size=64)
    _check(rs, stream)


def test_smoke_bframes():
    frames = _frames(5, seed=4)
    cfg = EncoderConfig(width=W, height=H, qp=30, deblock=False,
                        sao=False, bframes=4)
    enc = IntraEncoder(cfg)
    rs = enc.encode_hier_gop(frames)
    dec = decode_annexb(b"".join(r.bitstream for r in rs))
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)


def test_smoke_wpp():
    cfg = EncoderConfig(width=W, height=H, qp=30, deblock=True,
                        sao=False, wpp=True)
    enc = IntraEncoder(cfg)
    frames = _frames(3, seed=5)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = [r0] + enc.encode_pgop(frames[1:], need_recon=True)
    _check(rs, b"".join(r.bitstream for r in rs))
