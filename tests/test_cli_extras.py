"""App-layer extras: length-prefixed NAL output, frame duplication,
histogram scene-cut, CSV level 2 (x265 output/raw.cpp, encoder.cpp:172
and :1361, x265_csvlog analogs)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.bitstream.nal import (annexb_to_length_prefixed,
                                    split_annexb, split_length_prefixed)
from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _frames(n, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + 4 * n)).astype(np.uint8)
    cb = rng.integers(90, 170, (h // 2, w // 2 + 2 * n)).astype(np.uint8)
    return [(base[:, 2 * k:2 * k + w], cb[:, k:k + w // 2],
             cb[:, k + 1:k + 1 + w // 2]) for k in range(n)]


def test_length_prefixed_roundtrip():
    frames = _frames(3)
    cfg = EncoderConfig(width=64, height=48, qp=30, deblock=True)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = [r0] + enc.encode_pgop(frames[1:], need_recon=True)
    stream = b"".join(r.bitstream for r in rs)
    lp = annexb_to_length_prefixed(stream)
    assert lp != stream and len(lp) > 0
    # unit-for-unit identical payloads after the framing swap
    a = split_annexb(stream)
    b = split_length_prefixed(lp)
    assert len(a) == len(b)
    for (ta, ra, wa), (tb, rb, wb) in zip(a, b):
        assert ta == tb and wa == wb


def test_frame_dup_all_skip_copies_reference():
    frames = _frames(4)
    cfg = EncoderConfig(width=64, height=48, qp=30, deblock=True,
                        sao=False)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    r1 = enc.encode_pgop([frames[1]], need_recon=True)[0]
    rdup = enc.encode_dup_frame()
    assert rdup.bits < r1.bits / 4, "dup frame should be tiny"
    rs = [r0, r1, rdup] + enc.encode_pgop(frames[2:],
                                          need_recon=True)
    dec = decode_annexb(b"".join(r.bitstream for r in rs))
    assert len(dec) == len(rs)
    # the dup decodes to exactly the previous reconstruction
    np.testing.assert_array_equal(dec[2].y, dec[1].y)
    np.testing.assert_array_equal(dec[2].cb, dec[1].cb)
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)


def test_hist_scenecut_detects_cut():
    from x265_tpu.enc.lookahead import hist_scenecut
    rng = np.random.default_rng(1)
    a = rng.integers(0, 80, (48, 64)).astype(np.uint8)
    b = np.roll(a, 2, axis=1)          # pan: same histogram
    c = rng.integers(150, 255, (48, 64)).astype(np.uint8)  # cut
    assert not hist_scenecut(a, b)
    assert hist_scenecut(a, c)
