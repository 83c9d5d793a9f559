"""CABAC engine round-trip tests.

The encoder uses the HM register formulation; the decoder is written
independently from the spec pseudo-code (9.3.4.3.x), so agreement on
randomized bin sequences is strong evidence of conformance.
"""

import random

import numpy as np

from x265_tpu.bitstream.cabac import (
    CabacEncoder, CabacDecoder, ContextSet, init_context,
    NEXT_MPS, NEXT_LPS, RANGE_TAB_LPS,
)
from x265_tpu.bitstream import BitWriter


def _random_session(seed, n_ctx=16, n_ops=2000, term_every=None):
    rng = random.Random(seed)
    init_vals = [rng.randrange(64, 240) for _ in range(n_ctx)]
    qp = rng.randrange(0, 52)

    ctx_e = ContextSet(n_ctx)
    ctx_e.init_from(qp, np.array(init_vals))
    ctx_d = ctx_e.copy()

    enc = CabacEncoder(ctx_e)
    ops = []
    for i in range(n_ops):
        kind = rng.random()
        if term_every and i % term_every == term_every - 1:
            ops.append(("trm", 0))
            enc.encode_terminate(0)
        elif kind < 0.6:
            c = rng.randrange(n_ctx)
            b = rng.randrange(2)
            ops.append(("bin", c, b))
            enc.encode_bin(c, b)
        elif kind < 0.8:
            b = rng.randrange(2)
            ops.append(("ep", b))
            enc.encode_bypass(b)
        else:
            n = rng.randrange(1, 20)
            v = rng.randrange(1 << n)
            ops.append(("eps", v, n))
            enc.encode_bypass_bins(v, n)
    ops.append(("trm", 1))
    enc.encode_terminate(1)
    bw = BitWriter()
    enc.finish_into(bw)
    bw.align_one()
    data = bw.get_bytes()

    dec = CabacDecoder(data, ctx_d)
    for op in ops:
        if op[0] == "bin":
            assert dec.decode_bin(op[1]) == op[2], op
        elif op[0] == "ep":
            assert dec.decode_bypass() == op[1], op
        elif op[0] == "eps":
            assert dec.decode_bypass_bins(op[2]) == op[1], op
        else:
            assert dec.decode_terminate() == op[1], op
    return data


def test_roundtrip_many_seeds():
    for seed in range(20):
        _random_session(seed)


def test_roundtrip_with_intermediate_terminates():
    for seed in range(5):
        _random_session(100 + seed, term_every=97)


def test_roundtrip_skewed_bins():
    # long runs of MPS drive states to saturation; carry-heavy streams
    for seed in range(5):
        rng = random.Random(seed)
        ctx_e = ContextSet(4)
        ctx_e.init_from(26, np.array([154, 200, 100, 64]))
        ctx_d = ctx_e.copy()
        enc = CabacEncoder(ctx_e)
        bins = []
        for _ in range(5000):
            c = rng.randrange(4)
            b = 0 if rng.random() < 0.95 else 1
            bins.append((c, b))
            enc.encode_bin(c, b)
        enc.encode_terminate(1)
        bw = BitWriter()
        enc.finish_into(bw)
        bw.align_one()
        dec = CabacDecoder(bw.get_bytes(), ctx_d)
        for c, b in bins:
            assert dec.decode_bin(c) == b
        assert dec.decode_terminate() == 1


def test_compression_sanity():
    # highly predictable source must compress far below 1 bit/bin
    ctx = ContextSet(1)
    ctx.init_from(26, np.array([154]))
    enc = CabacEncoder(ctx)
    n = 10000
    for _ in range(n):
        enc.encode_bin(0, 0)
    enc.encode_terminate(1)
    bw = BitWriter()
    enc.finish_into(bw)
    bw.align_one()
    assert len(bw.get_bytes()) * 8 < n * 0.1


def test_state_tables_consistency():
    # MPS transition increases pStateIdx monotonically up to 62
    for p in range(62):
        for mps in range(2):
            s = (p << 1) | mps
            assert NEXT_MPS[s] == ((p + 1) << 1) | mps
    # LPS ranges decrease with pStateIdx
    for q in range(4):
        col = RANGE_TAB_LPS[:63, q].astype(int)
        assert (np.diff(col) <= 0).all()


def test_init_context_bounds():
    for qp in range(0, 52):
        for iv in range(256):
            s = init_context(qp, iv)
            assert 0 <= s < 127


def test_frac_bits_counting_mode():
    ctx = ContextSet(1)
    ctx.init_from(26, np.array([154]))
    enc = CabacEncoder(ctx, counting=True)
    for _ in range(100):
        enc.encode_bin(0, 0)
    bits_skewed = enc.frac_bits
    enc2 = CabacEncoder(ContextSet(1), counting=True)
    enc2.ctx.init_from(26, np.array([154]))
    for i in range(100):
        enc2.encode_bin(0, i & 1)
    assert bits_skewed < enc2.frac_bits
    # bypass costs exactly 1 bit
    enc3 = CabacEncoder(ContextSet(0), counting=True)
    enc3.encode_bypass_bins(0x5A, 8)
    assert enc3.frac_bits == 8 * 32768
