"""Multi-reference P prediction (x265 --ref N, search.cpp:2354) and
temporal MVP (sps_temporal_mvp, clause 8.5.3.2.8): device ref
selection, syntax round trips, decoder DPB list, AMVP scaling."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _flicker_frames(n, h=64, w=96, seed=0):
    """Two alternating textures + noise: frame k matches frame k-2
    exactly, so reference 1 (distance 2) wins wherever the texture
    flips — the content multi-ref exists for (occlusion/strobe)."""
    rng = np.random.default_rng(seed)
    texa = rng.integers(0, 255, (h, w)).astype(np.uint8)
    texb = rng.integers(0, 255, (h, w)).astype(np.uint8)
    ca = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
    cb = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
    out = []
    for k in range(n):
        if k % 2 == 0:
            out.append((texa, ca, ca))
        else:
            out.append((texb, cb, cb))
    return out


def _pan_frames(n, h=64, w=96, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w * 2)).astype(np.uint8)
    cbase = rng.integers(90, 170, (h // 2, w)).astype(np.uint8)
    out = []
    for k in range(n):
        out.append((base[:, 2 * k:2 * k + w],
                    cbase[:, k:k + w // 2],
                    cbase[:, k + 3:k + 3 + w // 2]))
    return out


def _encode_ippp(frames, **cfg_kw):
    cfg = EncoderConfig(width=frames[0][0].shape[1],
                        height=frames[0][0].shape[0], qp=30,
                        deblock=True, sao=False, **cfg_kw)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:], need_recon=True)
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    return cfg, stream, [r0] + rs


def test_multiref_selects_older_ref_and_decodes_exact():
    frames = _flicker_frames(5)
    cfg, stream, rs = _encode_ippp(frames, num_refs=3)
    # the strobe content must actually use reference 1 (distance 2)
    used = [r.syntax.ref8 for r in rs[1:] if r.syntax.ref8 is not None]
    assert any((u > 0).any() for u in used), \
        "flicker content never picked an older reference"
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)
        np.testing.assert_array_equal(np.asarray(r.recon.cb), d.cb)
        np.testing.assert_array_equal(np.asarray(r.recon.cr), d.cr)


def test_multiref_beats_single_ref_on_strobe():
    frames = _flicker_frames(7)
    _, s1, _ = _encode_ippp(frames, num_refs=1)
    _, s3, _ = _encode_ippp(frames, num_refs=3)
    # same recon quality contract (both decode exactly); multi-ref
    # must shrink the stream decisively on strobe content
    assert len(s3) < 0.8 * len(s1), (len(s3), len(s1))


def test_multiref_pan_decodes_exact_with_weightp():
    frames = _pan_frames(6)
    cfg, stream, rs = _encode_ippp(frames, num_refs=2, weightp=True)
    dec = decode_annexb(stream)
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)
        np.testing.assert_array_equal(np.asarray(r.recon.cb), d.cb)


def test_tmvp_decodes_exact():
    frames = _pan_frames(6)
    cfg, stream, rs = _encode_ippp(frames, num_refs=2, tmvp=True,
                                   max_merge=3)
    dec = decode_annexb(stream)
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)
        np.testing.assert_array_equal(np.asarray(r.recon.cb), d.cb)
        np.testing.assert_array_equal(np.asarray(r.recon.cr), d.cr)


def test_tmvp_single_ref_decodes_exact():
    frames = _flicker_frames(5)
    cfg, stream, rs = _encode_ippp(frames, num_refs=1, tmvp=True,
                                   max_merge=3)
    dec = decode_annexb(stream)
    for r, d in zip(rs, dec):
        np.testing.assert_array_equal(np.asarray(r.recon.y), d.y)


def test_pipelined_multiref_matches_unpipelined():
    frames = _pan_frames(10)
    cfg, stream, rs = _encode_ippp(frames, num_refs=3)
    cfg2 = EncoderConfig(width=96, height=64, qp=30, deblock=True,
                         sao=False, num_refs=3)
    enc = IntraEncoder(cfg2)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs2 = enc.encode_pgop_pipelined(frames[1:], chunk=3,
                                    need_recon=False)
    stream2 = r0.bitstream + b"".join(r.bitstream for r in rs2)
    assert stream2 == stream
