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


def test_native_p_slice_matches_python():
    """Native P-slice (+deblock) CABAC must equal the Python reference."""
    import sys
    from test_inter_e2e import moving_sequence
    w, h = 96, 64
    frames = moving_sequence(w, h, 3, seed=77)
    from x265_tpu.bitstream.syntax import SliceSyntaxEncoder
    from x265_tpu.bitstream.ctx_tables import init_states
    from x265_tpu.native.entropy_native import encode_slice_native
    from x265_tpu.common.params import P_SLICE
    cfg = EncoderConfig(width=w, height=h, qp=31)
    enc = IntraEncoder(cfg)
    results = enc.encode_sequence(frames)
    # re-encode the last P frame's slice data natively, compare
    from x265_tpu.bitstream.syntax import FramePSyntax
    p_syns = [r.syntax for r in results if isinstance(r.syntax, FramePSyntax)]
    assert p_syns, "sequence produced no P frames"
    syn = p_syns[-1]
    se = SliceSyntaxEncoder(cfg, syn, P_SLICE, 31)
    cab = se.encode_slice_data()
    py_bytes = cab.finish()
    py_tail = cab._tail
    nat, tv, tb = encode_slice_native(
        1, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
        cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
        cfg.log2_min_cu, init_states(1, 31), mv8=syn.mv8,
        max_merge=syn.max_merge, sign_hiding=cfg.sign_hiding,
        intra8=syn.intra8, mode8=syn.mode8,
        tusplit8=syn.tusplit8, rqt_inter=cfg.rqt_inter)
    assert nat == py_bytes and (tv, tb) == py_tail


def test_native_sao_slice_matches_python():
    from x265_tpu.bitstream.syntax import SliceSyntaxEncoder
    from x265_tpu.bitstream.ctx_tables import init_states
    from x265_tpu.native.entropy_native import encode_slice_native
    from x265_tpu.common.params import I_SLICE
    from x265_tpu.ops.sao import choose_sao_params, choose_sao_chroma
    w = h = 96
    qp = 40
    cfg = EncoderConfig(width=w, height=h, qp=qp, deblock=True, sao=True)
    y, cb, cr = synth_frame(w, h, seed=31)
    # reproduce the encoder's internal state to get sao params + syntax
    enc = IntraEncoder(cfg)
    res = enc.encode_frame(y, cb, cr)
    # recompute sao params exactly as the encoder did is awkward; instead
    # just compare with arbitrary-but-valid params
    rng = np.random.default_rng(5)
    ncty, nctx = cfg.ctu_rows, cfg.ctu_cols
    def rand_params():
        p = np.zeros((ncty, nctx, 6), np.int32)
        p[..., 0] = rng.integers(0, 3, (ncty, nctx))
        p[..., 1] = rng.integers(0, 4, (ncty, nctx))
        for k in range(4):
            sign = 1 if k < 2 else -1
            p[..., 2 + k] = sign * rng.integers(0, 8, (ncty, nctx))
        band = p[..., 0] == 1
        p[..., 1] = np.where(band, rng.integers(0, 32, (ncty, nctx)),
                             p[..., 1])
        return p
    py_ = rand_params()
    pcb = rand_params()
    pcr = rand_params()
    pcr[..., 0] = pcb[..., 0]     # chroma shares type
    pcr[..., 1] = np.where(pcb[..., 0] == 2, pcb[..., 1], pcr[..., 1])
    sao = (py_, pcb, pcr)
    syn = res.syntax
    se = SliceSyntaxEncoder(cfg, syn, I_SLICE, qp, sao_params=sao)
    cab = se.encode_slice_data()
    py_bytes = cab.finish()
    nat, tv, tb = encode_slice_native(
        2, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
        cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
        cfg.log2_min_cu, init_states(I_SLICE, qp), mode8=syn.mode8,
        sign_hiding=cfg.sign_hiding, sao_params=sao, cmode8=syn.cmode8,
        nxn8=syn.nxn8, mode4=syn.mode4)
    assert nat == py_bytes and (tv, tb) == cab._tail
