"""Native (C++) CABAC slice encoder must match the Python reference
byte-for-byte — the testbench-style golden contract x265 applies to its
asm kernels (reference: source/test/testharness.h)."""

import numpy as np
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder

from test_intra_e2e import synth_frame


@pytest.mark.parametrize("w,h,qp", [(64, 64, 32), (96, 64, 24), (72, 40, 38)])
def test_native_matches_python(w, h, qp):
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    y, cb, cr = synth_frame(w, h, seed=qp)
    enc_py = IntraEncoder(cfg)
    res_py = enc_py.encode_frame(y, cb, cr, use_native_cabac=False)
    enc_nat = IntraEncoder(cfg)
    res_nat = enc_nat.encode_frame(y, cb, cr, use_native_cabac=True)
    assert res_nat.bitstream == res_py.bitstream


def test_native_noise_content():
    """Dense-coefficient stress: random noise exercises every residual
    coding path (all CGs coded, escapes, rice adaptation)."""
    w, h, qp = 64, 64, 20
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    res_py = IntraEncoder(cfg).encode_frame(y, cb, cr, use_native_cabac=False)
    res_nat = IntraEncoder(cfg).encode_frame(y, cb, cr, use_native_cabac=True)
    assert res_nat.bitstream == res_py.bitstream
