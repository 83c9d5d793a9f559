"""Device wavefront recon must be bit-exact with the host spec oracle."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc.intra_analysis import analyze_intra_frame
from x265_tpu.enc.intra_recon import reconstruct_intra_frame
from x265_tpu.enc.intra_recon_tpu import reconstruct_intra_frame_tpu
from x265_tpu.enc.encoder import pad_plane

from test_intra_e2e import synth_frame


@pytest.mark.parametrize("w,h,qp", [(64, 64, 32), (96, 64, 26), (72, 40, 37)])
def test_device_recon_matches_host(w, h, qp):
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    y, cb, cr = synth_frame(w, h, seed=w + qp)
    wp, hp = cfg.width_padded, cfg.height_padded
    yp = pad_plane(y, hp, wp)
    cbp = pad_plane(cb, hp // 2, wp // 2)
    crp = pad_plane(cr, hp // 2, wp // 2)
    depth8, mode8, _, _ = analyze_intra_frame(yp, qp, cfg.ctu_size, cfg.bit_depth)

    syn_h, rec_h = reconstruct_intra_frame(yp, cbp, crp, depth8, mode8, cfg)
    syn_d, rec_d = reconstruct_intra_frame_tpu(yp, cbp, crp, depth8, mode8, cfg)

    np.testing.assert_array_equal(syn_d.coeff_y, syn_h.coeff_y)
    np.testing.assert_array_equal(syn_d.coeff_cb, syn_h.coeff_cb)
    np.testing.assert_array_equal(syn_d.coeff_cr, syn_h.coeff_cr)
    np.testing.assert_array_equal(rec_d.y, rec_h.y)
    np.testing.assert_array_equal(rec_d.cb, rec_h.cb)
    np.testing.assert_array_equal(rec_d.cr, rec_h.cr)


def test_gop_batch_matches_host():
    """A batch of distinct frames through one wavefront must equal the
    per-frame host oracle."""
    from x265_tpu.enc.intra_recon_tpu import reconstruct_intra_gop_tpu
    w, h, qp = 64, 64, 33
    cfg = EncoderConfig(width=w, height=h, qp=qp)
    ys, cbs, crs, d8s, m8s = [], [], [], [], []
    for f in range(3):
        y, cb, cr = synth_frame(w, h, seed=100 + f)
        d8, m8, _, _ = analyze_intra_frame(y, qp, cfg.ctu_size, cfg.bit_depth)
        ys.append(y); cbs.append(cb); crs.append(cr)
        d8s.append(d8); m8s.append(m8)
    syns, recons = reconstruct_intra_gop_tpu(
        np.stack(ys), np.stack(cbs), np.stack(crs),
        np.stack(d8s), np.stack(m8s), cfg)
    for f in range(3):
        syn_h, rec_h = reconstruct_intra_frame(ys[f], cbs[f], crs[f],
                                               d8s[f], m8s[f], cfg)
        np.testing.assert_array_equal(syns[f].coeff_y, syn_h.coeff_y)
        np.testing.assert_array_equal(syns[f].coeff_cb, syn_h.coeff_cb)
        np.testing.assert_array_equal(recons[f].y, rec_h.y)
        np.testing.assert_array_equal(recons[f].cb, rec_h.cb)
        np.testing.assert_array_equal(recons[f].cr, rec_h.cr)
