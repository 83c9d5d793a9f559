"""Per-CTU dQP (cu_qp_delta) round trips: encoder recon == decoder
output bit-exactly, with both CABAC implementations, deblock on/off.

Reference behavior: clause 7.3.8.10 (cu_qp_delta in the first cbf TU
of the QG), 8.6.1 (QP prediction — QG == CTU makes it the previous QG
in raster order), 8.7.2.5.3 (deblock edge QP averaging)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _frame(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2 + ((xx * yy) >> 6)) % 256).astype(np.uint8)
    y = np.clip(y.astype(np.int32) + rng.integers(-8, 8, (h, w)),
                0, 255).astype(np.uint8)
    cb = np.clip(128 + (xx[::2, ::2] >> 3), 0, 255).astype(np.uint8)
    cr = np.clip(128 - (yy[::2, ::2] >> 3), 0, 255).astype(np.uint8)
    return y, cb, cr


QP_MAP = np.array([[30, 34, 28], [36, 32, 26]], np.int32)


@pytest.mark.parametrize("native", [True, False])
def test_intra_dqp_roundtrip(native):
    cfg = EncoderConfig(width=96, height=64, qp=32, aq_mode=2)
    enc = IntraEncoder(cfg)
    y, cb, cr = _frame(64, 96)
    res = enc.encode_frame(y, cb, cr, qp_map=QP_MAP,
                           use_native_cabac=native)
    dec = decode_annexb(res.bitstream)[0]
    assert np.array_equal(dec.y, res.recon.y)
    assert np.array_equal(dec.cb, res.recon.cb)
    assert np.array_equal(dec.cr, res.recon.cr)


def test_intra_dqp_deblock_roundtrip():
    cfg = EncoderConfig(width=96, height=64, qp=32, aq_mode=2,
                        deblock=True)
    enc = IntraEncoder(cfg)
    y, cb, cr = _frame(64, 96, seed=4)
    res = enc.encode_frame(y, cb, cr, qp_map=QP_MAP)
    dec = decode_annexb(res.bitstream)[0]
    assert np.array_equal(dec.y, res.recon.y)
    assert np.array_equal(dec.cb, res.recon.cb)
    assert np.array_equal(dec.cr, res.recon.cr)


def test_intra_dqp_large_delta():
    """abs(delta) >= 5 exercises the EG0 suffix binarization."""
    cfg = EncoderConfig(width=96, height=64, qp=32, aq_mode=2)
    enc = IntraEncoder(cfg)
    y, cb, cr = _frame(64, 96, seed=5)
    qmap = np.array([[26, 40, 22], [45, 30, 51]], np.int32)
    res = enc.encode_frame(y, cb, cr, qp_map=qmap)
    dec = decode_annexb(res.bitstream)[0]
    assert np.array_equal(dec.y, res.recon.y)
    assert np.array_equal(dec.cb, res.recon.cb)
    assert np.array_equal(dec.cr, res.recon.cr)


def test_pgop_dqp_roundtrip():
    """Fused P-GOP with per-CTU QP maps: decoder output must match the
    device pipeline's recon bit-exactly (quant, deblock per-edge QP,
    effective-QP chaining for CTUs that code nothing)."""
    cfg = EncoderConfig(width=96, height=64, qp=32, aq_mode=2,
                        deblock=True)
    enc = IntraEncoder(cfg)
    f0 = _frame(64, 96, seed=7)
    r0 = enc.encode_frame(*f0, qp_map=np.full((2, 3), 32, np.int32))
    enc.ref = r0.recon
    enc.poc = 0
    pf = []
    for i in range(1, 4):
        y = np.roll(f0[0], 2 * i, axis=1)
        pf.append((y, f0[1], f0[2]))
    qmaps = np.stack([QP_MAP + i for i in range(3)])
    rs = enc.encode_pgop(pf, qp_maps=qmaps)
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    for d, r in zip(dec[1:], rs):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)


def test_encode_sequence_aq_cutree_roundtrip():
    """encode_sequence with aq-mode 2 + cuTree: the whole stream
    (I + fused P run, per-CTU dQP everywhere) decodes bit-exactly."""
    cfg = EncoderConfig(width=96, height=64, qp=34, aq_mode=2,
                        cutree=True, deblock=True)
    enc = IntraEncoder(cfg)
    base = _frame(64, 96, seed=8)
    frames = [(np.roll(base[0], 2 * i, axis=1), base[1], base[2])
              for i in range(4)]
    rs = enc.encode_sequence(frames)
    stream = b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    assert len(dec) == 4
    for d, r in zip(dec, rs):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)


def test_dqp_changes_quantization():
    """Lower-QP CTUs carry more bits / better fidelity."""
    cfg = EncoderConfig(width=96, height=64, qp=32, aq_mode=2)
    y, cb, cr = _frame(64, 96, seed=6)
    lo = IntraEncoder(cfg).encode_frame(
        y, cb, cr, qp_map=np.full((2, 3), 24, np.int32))
    hi = IntraEncoder(cfg).encode_frame(
        y, cb, cr, qp_map=np.full((2, 3), 44, np.int32))
    assert lo.bits > hi.bits
    err_lo = np.abs(lo.recon.y[:64, :96].astype(int) - y).mean()
    err_hi = np.abs(hi.recon.y[:64, :96].astype(int) - y).mean()
    assert err_lo < err_hi
