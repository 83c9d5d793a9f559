"""Adaptive B placement (the slicetypePath analog, slicetype.cpp:2378;
VERDICT r03 missing #5): the lowres cost trellis should use full B
runs on clean motion but collapse to P runs on fades, where
bi-prediction from mismatched-brightness anchors is poor."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.enc.lookahead import Lookahead


def _pan(n, h=96, w=128):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 5)) % 256).astype(np.int32)
    return [np.clip(np.roll(base, 2 * i, axis=1), 0,
                    255).astype(np.uint8) for i in range(n)]


def _fade(n, h=96, w=128):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 5)) % 256).astype(np.int32)
    return [np.clip(base * (1.0 - 0.18 * i), 0, 255).astype(np.uint8)
            for i in range(n)]


def test_badapt_full_b_run_on_clean_pan():
    cfg = EncoderConfig(width=128, height=96, qp=32, bframes=3)
    la = Lookahead(cfg)
    ys = _pan(5)
    nb = la.plan_minigop(ys[0], ys[1:])
    assert nb == 3, f"clean pan should keep the full B run, got {nb}"


def test_badapt_collapses_on_fade():
    cfg = EncoderConfig(width=128, height=96, qp=32, bframes=3)
    la = Lookahead(cfg)
    ys = _fade(5)
    nb = la.plan_minigop(ys[0], ys[1:])
    assert nb <= 1, f"fade should collapse toward P runs, got {nb}"


def test_badapt_minigop_encode_decodes():
    """Adaptive flush path end to end: a mixed clip encoded with
    variable mini-GOP lengths must round-trip the decoder."""
    from x265_tpu.decoder import decode_annexb
    cfg = EncoderConfig(width=128, height=96, qp=32, bframes=2,
                        num_refs=2, deblock=True)
    ys = _pan(3) + _fade(4)
    c = np.full((48, 64), 128, np.uint8)
    frames = [(y, c, c.copy()) for y in ys]
    la = Lookahead(cfg)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    results = [r0]
    buf = list(frames[1:])
    anchor_y = frames[0][0]
    while buf:
        take = buf[:cfg.bframes + 1]
        nb = la.plan_minigop(anchor_y, [f[0] for f in take]) \
            if len(take) > 1 else 0
        chunk = take[:nb + 1]
        results.extend(enc.encode_minigop(chunk, qp=cfg.qp))
        anchor_y = chunk[-1][0]
        buf = buf[nb + 1:]
    stream = b"".join(r.bitstream for r in results)
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
