"""1080p-scale conformance tier (slow; VERDICT item 10): a full
1080p mixed GOP — ragged 1088-line padding geometry, deblock + SAO +
dQP + intra-in-inter, fused device pipelines — must decode bit-exactly
through the independent decoder. Run with -m slow."""

import os

import numpy as np
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _clip_1080p(n):
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:1080, 0:1920]
    base = ((xx * 3 + yy * 2 + ((xx * yy) >> 9)) % 256).astype(np.int32)
    base = np.clip(base + rng.integers(-10, 10, base.shape),
                   0, 255).astype(np.uint8)
    cb = np.clip(128 + (xx[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    cr = np.clip(128 - (yy[::2, ::2] >> 4), 0, 255).astype(np.uint8)
    return [(np.roll(base, 2 * i, axis=1), cb, cr) for i in range(n)]


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("RUN_1080P"),
                    reason="1080p tier: set RUN_1080P=1 (pure-Python "
                           "decode of 1080p frames takes minutes)")
def test_1080p_ippp_sao_dqp_decode_exact():
    cfg = EncoderConfig(width=1920, height=1080, qp=32, deblock=True,
                        sao=True, aq_mode=2, cutree=True)
    frames = _clip_1080p(3)
    enc = IntraEncoder(cfg)
    rs = enc.encode_sequence(frames)
    stream = b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert len(dec) == 3
    for d, r in zip(dec, rs):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)
