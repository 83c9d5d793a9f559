"""Fused P-GOP device pipeline: decode round-trip + parity with the
per-frame host path."""

import numpy as np
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _clip(nf, h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 5 + yy * 3) % 200 + 20).astype(np.int32)
    frames = []
    for i in range(nf):
        y = np.clip(np.roll(base, i * 3, axis=1) +
                    rng.integers(-6, 6, (h, w)), 0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.clip(100 + (xx[::2, ::2] >> 5) + i, 0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


@pytest.mark.parametrize("deblock,sao", [(False, False), (True, False),
                                         (True, True)])
def test_pgop_decode_roundtrip(deblock, sao):
    h, w = 64, 96
    cfg = EncoderConfig(width=w, height=h, qp=30, deblock=deblock,
                        sao=sao)
    enc = IntraEncoder(cfg)
    frames = _clip(5, h, w)
    r0 = enc.encode_frame(frames[0][0], frames[0][1], frames[0][2])
    enc.ref = r0.recon
    enc.poc = 0
    results = enc.encode_pgop(frames[1:])
    stream = r0.bitstream + b"".join(r.bitstream for r in results)
    dec = decode_annexb(stream)
    assert len(dec) == 5
    for i, df in enumerate(dec):
        rec = r0.recon if i == 0 else results[i - 1].recon
        np.testing.assert_array_equal(df.y, rec.y, err_msg=f"frame {i} y")
        np.testing.assert_array_equal(df.cb, rec.cb,
                                      err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(df.cr, rec.cr,
                                      err_msg=f"frame {i} cr")


def test_pgop_ragged_roundtrip():
    """Coded size not a 32-multiple: in-loop filters must act on the
    coded crop only (the 1088-padding path at 1080p)."""
    h, w = 40, 48
    cfg = EncoderConfig(width=w, height=h, qp=30, deblock=True, sao=True)
    enc = IntraEncoder(cfg)
    frames = _clip(4, h, w, seed=11)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    results = enc.encode_pgop(frames[1:])
    stream = r0.bitstream + b"".join(r.bitstream for r in results)
    dec = decode_annexb(stream)
    assert len(dec) == 4
    for i, df in enumerate(dec):
        rec = r0.recon if i == 0 else results[i - 1].recon
        np.testing.assert_array_equal(df.y, rec.y, err_msg=f"frame {i} y")
        np.testing.assert_array_equal(df.cb, rec.cb,
                                      err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(df.cr, rec.cr,
                                      err_msg=f"frame {i} cr")


def test_pgop_chain_matches_single_frame_calls():
    """One fused N-frame scan must be bit-exact with N chained
    single-frame dispatches (validates the scan's reference carry)."""
    h, w = 64, 64
    frames = _clip(3, h, w, seed=3)
    cfg = EncoderConfig(width=w, height=h, qp=32, deblock=True, sao=True)

    enc_a = IntraEncoder(cfg)
    r0 = enc_a.encode_frame(*frames[0])
    enc_a.ref = r0.recon
    enc_a.poc = 0
    fused = enc_a.encode_pgop(frames[1:])

    enc_b = IntraEncoder(cfg)
    r0b = enc_b.encode_frame(*frames[0])
    enc_b.ref = r0b.recon
    enc_b.poc = 0
    single = [enc_b.encode_frame_p(*f) for f in frames[1:]]

    for i, (a, b) in enumerate(zip(fused, single)):
        np.testing.assert_array_equal(a.syntax.depth8, b.syntax.depth8,
                                      err_msg=f"frame {i} depth8")
        np.testing.assert_array_equal(a.syntax.mv8, b.syntax.mv8,
                                      err_msg=f"frame {i} mv8")
        assert a.bitstream == b.bitstream, f"frame {i} stream differs"
