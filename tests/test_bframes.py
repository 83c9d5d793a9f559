"""B frames (IBPBP): bi-prediction round-trip conformance."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb

from test_inter_e2e import moving_sequence


@pytest.mark.parametrize("deblock", [False, True])
def test_ibpbp_roundtrip(deblock):
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, deblock=deblock,
                        bframes=1, num_refs=2)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 5, seed=41)
    results = enc.encode_bgop(frames)          # decode order
    stream = b"".join(r.bitstream for r in results)
    decs = decode_annexb(stream)
    assert len(decs) == 5
    for i, (d, r) in enumerate(zip(decs, results)):
        np.testing.assert_array_equal(d.y, r.recon.y,
                                      err_msg=f"decode-order frame {i}")
        np.testing.assert_array_equal(d.cb, r.recon.cb)
        np.testing.assert_array_equal(d.cr, r.recon.cr)
    # POCs: decode order I P B P B -> 0, 2, 1, 4, 3
    assert [d.poc for d in decs] == [0, 2, 1, 4, 3]


def test_b_frames_cheapest():
    """Bi-prediction on smooth motion: B frames should be the cheapest
    frame type."""
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, bframes=1, num_refs=2)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 5, seed=43)
    results = enc.encode_bgop(frames)
    # decode order: I P B P B
    i_bits = results[0].bits
    b_bits = [results[2].bits, results[4].bits]
    p_bits = [results[1].bits, results[3].bits]
    assert max(b_bits) < i_bits
    assert sum(b_bits) / 2 <= sum(p_bits) / 2 * 1.2, (b_bits, p_bits)


def test_b_with_sao_hash():
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=35, deblock=True, sao=True,
                        hash_sei=True, bframes=1, num_refs=2)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 3, seed=44)
    results = enc.encode_bgop(frames)
    decs = decode_annexb(b"".join(r.bitstream for r in results))
    for d, r in zip(decs, results):
        np.testing.assert_array_equal(d.y, r.recon.y)
