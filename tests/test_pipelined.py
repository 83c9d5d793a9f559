"""Pipelined P-GOP (submit/collect overlap) must produce bitstreams
IDENTICAL to the synchronous path — the determinism contract of x265's
frame threads (threading.rst:178: output invariant to pipeline depth)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _frames(n, h=64, w=96, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 6)) % 256).astype(np.int32)
    base = np.clip(base + rng.integers(-8, 8, (h, w)), 0, 255) \
        .astype(np.uint8)
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 132, np.uint8)
    return [(np.roll(base, 2 * i, axis=1), cb, cr) for i in range(n)]


def test_pipelined_matches_synchronous():
    cfg = EncoderConfig(width=96, height=64, qp=32, deblock=True)
    frames = _frames(7)

    enc_a = IntraEncoder(cfg)
    r0a = enc_a.encode_frame(*frames[0], use_device_recon=True)
    enc_a.ref = r0a.device_ref
    enc_a.poc = 0
    sync = enc_a.encode_pgop(frames[1:], need_recon=False)

    enc_b = IntraEncoder(cfg)
    r0b = enc_b.encode_frame(*frames[0], use_device_recon=True)
    enc_b.ref = r0b.device_ref
    enc_b.poc = 0
    piped = enc_b.encode_pgop_pipelined(frames[1:], chunk=2)

    assert r0a.bitstream == r0b.bitstream
    assert len(sync) == len(piped) == 6
    for a, b in zip(sync, piped):
        assert a.bitstream == b.bitstream


def test_pipelined_decodes():
    cfg = EncoderConfig(width=96, height=64, qp=32, deblock=True,
                        hash_sei=True)
    frames = _frames(5, seed=12)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0], use_device_recon=True)
    enc.ref = r0.device_ref
    enc.poc = 0
    rs = enc.encode_pgop_pipelined(frames[1:], chunk=2, need_recon=True)
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)   # hash SEI self-validates each frame
    assert len(dec) == 5
    for d, r in zip(dec[1:], rs):
        assert np.array_equal(d.y, r.recon.y)
