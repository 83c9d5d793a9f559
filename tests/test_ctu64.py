"""CTU 64 (x265 default maxCUSize, param.cpp:155): depth-0 64x64
inter CUs from the 32-level agree-merge, forced transform split,
intra frames via 32-tile z-quadrant wavefront."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _frames(n, h=128, w=192, seed=3, pan=2, noise=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + 2 * n * pan)).astype(np.int32)
    # smooth half: easy content where 64-CUs should win
    base[:, : (w + 2 * n * pan) // 2] //= 16
    cb = rng.integers(100, 156, (h // 2, w // 2 + n * pan)) \
        .astype(np.uint8)
    out = []
    for k in range(n):
        y = base[:, pan * k:pan * k + w]
        if noise:
            y = y + rng.integers(-noise, noise + 1, (h, w))
        out.append((np.clip(y, 0, 255).astype(np.uint8),
                    cb[:, pan * k // 2:pan * k // 2 + w // 2],
                    cb[:, (pan * k + 2) // 2:(pan * k + 2) // 2 + w // 2]))
    return out


def _roundtrip(frames, **kw):
    cfg = EncoderConfig(width=frames[0][0].shape[1],
                        height=frames[0][0].shape[0], qp=30,
                        ctu_size=64, deblock=True, sao=False, **kw)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:], need_recon=True)
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
    for r, d in zip([r0] + rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)
        np.testing.assert_array_equal(np.asarray(r.recon.cb), d.cb)
        np.testing.assert_array_equal(np.asarray(r.recon.cr), d.cr)
    return cfg, [r0] + rs, dec


def test_ctu64_roundtrip_and_depth0_used():
    frames = _frames(4)
    cfg, rs, dec = _roundtrip(frames)
    assert any((r.syntax.depth8 == 0).any() for r in rs[1:]), \
        "no 64x64 CU chosen on easy content"


def test_ctu64_intra_only_roundtrip():
    frames = _frames(2, noise=6)
    cfg = EncoderConfig(width=192, height=128, qp=28, ctu_size=64,
                        deblock=True)
    enc = IntraEncoder(cfg)
    rs = [enc.encode_frame(*f) for f in frames]
    dec = decode_annexb(b"".join(r.bitstream for r in rs))
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)
        np.testing.assert_array_equal(np.asarray(r.recon.cb), d.cb)


def test_ctu64_device_intra_decodes_exact():
    """The 32-tile z-quadrant wavefront (tr_ok masking) must produce a
    reconstruction the independent spec decoder reproduces exactly —
    the bottom-right quadrant's above-right samples are undecoded in
    z order, so a masking bug shows as a recon mismatch here."""
    frames = _frames(1, noise=8)
    cfg = EncoderConfig(width=192, height=128, qp=30, ctu_size=64)
    enc = IntraEncoder(cfg)
    r_dev = enc.encode_frame(*frames[0], use_device_recon=True)
    dec = decode_annexb(r_dev.bitstream)[0]
    np.testing.assert_array_equal(np.asarray(r_dev.recon.y), dec.y)
    np.testing.assert_array_equal(np.asarray(r_dev.recon.cb), dec.cb)
    np.testing.assert_array_equal(np.asarray(r_dev.recon.cr), dec.cr)


def test_ctu64_multiref_tmvp_roundtrip():
    frames = _frames(6, noise=3)
    cfg, rs, dec = _roundtrip(frames, num_refs=2, tmvp=True,
                              max_merge=3)


def test_ctu64_ragged_edge_roundtrip():
    # 104x72: not a multiple of 64 -> forced splits at the borders
    frames = _frames(3, h=72, w=104)
    _roundtrip(frames)
