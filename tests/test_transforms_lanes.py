"""Lanes-layout (N, N, B) residual-pipeline variants must match the
block-major (B, N, N) reference forms bit-exactly — the fused P scan
runs entirely in lanes layout for MXU/VPU lane occupancy."""

import numpy as np
import pytest

from x265_tpu.ops.transforms import (dct_batch, dct_lanes, dequant_batch,
                                     dequant_lanes, idct_batch,
                                     idct_lanes, quant_batch,
                                     quant_lanes, rdoq_batch, rdoq_lanes,
                                     sign_hide_batch, sign_hide_lanes)


def to_lanes(x):
    return np.moveaxis(x, 0, 2)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("qp", [22, 37])
def test_residual_pipeline_lanes_parity(n, qp):
    rng = np.random.default_rng(n * 100 + qp)
    b = 24
    resi = rng.integers(-255, 256, (b, n, n)).astype(np.int32)
    qpv = rng.integers(18, 46, (b,)).astype(np.int32)

    for q in (qp, qpv):
        tc = np.asarray(dct_batch(resi, n))
        tc_l = np.asarray(dct_lanes(to_lanes(resi), n))
        assert np.array_equal(to_lanes(tc), tc_l)

        lv, du = (np.asarray(a) for a in
                  quant_batch(tc, n, q, intra=False, with_rem=True))
        lv_l, du_l = (np.asarray(a) for a in
                      quant_lanes(tc_l, n, q, intra=False,
                                  with_rem=True))
        assert np.array_equal(to_lanes(lv), lv_l)
        assert np.array_equal(to_lanes(du), du_l)

        sh = np.asarray(sign_hide_batch(lv, n, 0, du))
        sh_l = np.asarray(sign_hide_lanes(lv_l, n, 0, du_l))
        assert np.array_equal(to_lanes(sh), sh_l)

        dq = np.asarray(dequant_batch(sh, n, q))
        dq_l = np.asarray(dequant_lanes(sh_l, n, q))
        assert np.array_equal(to_lanes(dq), dq_l)

        r = np.asarray(idct_batch(dq, n))
        r_l = np.asarray(idct_lanes(dq_l, n))
        assert np.array_equal(to_lanes(r), r_l)

        rq, rdu = (np.asarray(a) for a in
                   rdoq_batch(tc, n, q, 120.0, with_rem=True))
        rq_l, rdu_l = (np.asarray(a) for a in
                       rdoq_lanes(tc_l, n, q, 120.0, with_rem=True))
        assert np.array_equal(to_lanes(rq), rq_l)
        assert np.array_equal(to_lanes(rdu), rdu_l)
