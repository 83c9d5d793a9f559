"""Native B-slice CABAC must be bit-identical to the Python twin
(merge/AMVP derivation with POC scaling included)."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import B_SLICE, EncoderConfig
from x265_tpu.enc import IntraEncoder


def _frames(n, h=64, w=96, seed=41):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 230 + 10).astype(np.int32)
    base = np.clip(base + rng.integers(-7, 7, (h, w)), 0, 255) \
        .astype(np.uint8)
    cb = np.full((h // 2, w // 2), 123, np.uint8)
    cr = np.full((h // 2, w // 2), 133, np.uint8)
    return [(np.roll(base, 2 * i, axis=1), cb, cr) for i in range(n)]


def test_native_b_slice_matches_python():
    from x265_tpu.bitstream.ctx_tables import init_states
    from x265_tpu.bitstream.syntax import (FrameBSyntax,
                                           SliceSyntaxEncoder)
    from x265_tpu.native.entropy_native import encode_slice_native
    cfg = EncoderConfig(width=96, height=64, qp=32, bframes=2,
                        num_refs=2)
    enc = IntraEncoder(cfg)
    rs = enc.encode_hier_gop(_frames(5))
    b_syns = [r.syntax for r in rs
              if isinstance(r.syntax, FrameBSyntax)]
    assert b_syns, "hier GOP produced no B frames"
    for syn in b_syns:
        se = SliceSyntaxEncoder(cfg, syn, B_SLICE, 34)
        cab = se.encode_slice_data()
        py_bytes = cab.finish()
        py_tail = cab._tail
        mvb = syn.mv8.reshape(syn.mv8.shape[0], syn.mv8.shape[1], 4)
        nat, tv, tb = encode_slice_native(
            0, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
            cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
            cfg.log2_min_cu, init_states(0, 34),
            mvb=mvb, pf8=syn.pf8, poc=syn.poc, poc_refs=syn.poc_refs,
            max_merge=syn.max_merge, sign_hiding=cfg.sign_hiding,
            rqt_inter=cfg.rqt_inter)
        assert nat == py_bytes and (tv, tb) == py_tail
