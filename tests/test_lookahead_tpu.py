"""Lookahead v2: AQ energy offsets, lowres costs, cuTree propagation.

Reference behaviors being checked (not bit-exactness — these are
pre-decision heuristics): slicetype.cpp:444 calcAdaptiveQuantFrame
(zero-mean offsets in auto-variance mode, flat blocks get negative
offsets), pixel.cpp:914 propagateCost (referenced blocks accumulate,
intra-cheap blocks propagate nothing), cuTreeFinish (referenced blocks
get lower QP).
"""

import numpy as np
import jax.numpy as jnp
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc.lookahead_tpu import (aq_offsets, cutree_finish,
                                        cutree_propagate_ippp,
                                        lookahead_gop, lowres_inter_cost,
                                        lowres_intra_cost, lowres_plane)


def _textured_frame(h, w, seed=0, flat_box=None):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    if flat_box:
        y0, x0, s = flat_box
        y[y0:y0 + s, x0:x0 + s] = 128
    return y


def test_aq_autovariance_flat_vs_textured():
    h, w = 64, 64
    y = _textured_frame(h, w, flat_box=(0, 0, 32))
    cb = np.full((h // 2, w // 2), 128, np.int32)
    cr = cb.copy()
    adj, invq = aq_offsets(jnp.asarray(y), jnp.asarray(cb),
                           jnp.asarray(cr), 2, 1.0, 8)
    adj = np.asarray(adj)
    # flat 16x16 blocks (top-left 2x2 of the 4x4 grid) get LOWER qp
    # than textured ones (auto-variance centres offsets near zero)
    assert adj[:2, :2].mean() < adj[2:, 2:].mean()
    assert abs(adj.mean()) < 1.5
    # invq is the Q8 2^(-adj/6) factor
    iv = np.asarray(invq)
    assert np.all(iv[adj < 0] >= 256)
    assert np.all(iv[adj > 0] <= 256)


def test_aq_variance_mode1_sign():
    h, w = 64, 64
    y = _textured_frame(h, w, flat_box=(0, 0, 32))
    cb = np.full((h // 2, w // 2), 128, np.int32)
    adj, _ = aq_offsets(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cb),
                        1, 1.0, 8)
    adj = np.asarray(adj)
    assert adj[0, 0] < adj[3, 3]    # flat block < textured block


def test_lowres_plane_box():
    y = np.arange(16 * 16, dtype=np.int32).reshape(16, 16)
    lw = np.asarray(lowres_plane(jnp.asarray(y)))
    assert lw.shape == (8, 8)
    assert lw[0, 0] == (y[0, 0] + y[1, 0] + y[0, 1] + y[1, 1] + 2) >> 2


def test_lowres_intra_cost_flat_is_cheap():
    h, w = 32, 32   # lowres of a 64x64
    lw = np.full((h, w), 100, np.int32)
    c = np.asarray(lowres_intra_cost(jnp.asarray(lw)))
    assert c.shape == (4, 4)
    assert np.all(c <= 6)           # flat: only the +5 penalty (and DC hit)
    rng = np.random.default_rng(0)
    lw2 = rng.integers(0, 256, (h, w)).astype(np.int32)
    c2 = np.asarray(lowres_intra_cost(jnp.asarray(lw2)))
    assert c2.mean() > 10 * c.mean()


def test_lowres_inter_translation_found():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    cur = np.roll(ref, (0, 3), axis=(0, 1))   # pan +3 px in x
    cost, mv = lowres_inter_cost(jnp.asarray(cur), jnp.asarray(ref))
    mv = np.asarray(mv)
    # interior blocks find (dx=-3, dy=0) in qpel (=-12)
    assert np.all(mv[2:-2, 2:-2, 0] == -12)
    assert np.all(mv[2:-2, 2:-2, 1] == 0)
    assert np.asarray(cost)[2:-2, 2:-2].max() <= 20


def test_cutree_propagates_to_referenced_blocks():
    f, by, bx = 3, 4, 4
    intra = np.full((f, by, bx), 1000.0, np.float32)
    inter = np.full((f, by, bx), 100.0, np.float32)   # strong prediction
    mvs = np.zeros((f, by, bx, 2), np.int32)
    pcs = np.asarray(cutree_propagate_ippp(
        jnp.asarray(intra), jnp.asarray(inter), jnp.asarray(mvs)))
    # frame 0 is referenced through the whole chain: largest pool;
    # last frame propagates nothing back into itself
    assert np.all(pcs[0] > pcs[1])
    assert np.all(pcs[-1] == 0)
    # offsets: referenced frame's blocks get NEGATIVE qp offset
    off = np.asarray(cutree_finish(
        jnp.asarray(intra[0]), jnp.asarray(pcs[0]),
        jnp.full((by, bx), 256.0, np.float32),
        jnp.zeros((by, bx), np.float32), 0.6))
    assert np.all(off < 0)


def test_cutree_no_propagation_when_inter_useless():
    f, by, bx = 3, 4, 4
    intra = np.full((f, by, bx), 1000.0, np.float32)
    inter = intra.copy()      # inter no better than intra: scene cuts
    mvs = np.zeros((f, by, bx, 2), np.int32)
    pcs = np.asarray(cutree_propagate_ippp(
        jnp.asarray(intra), jnp.asarray(inter), jnp.asarray(mvs)))
    assert np.all(pcs == 0)


def test_scatter_follows_motion():
    f, by, bx = 2, 4, 4
    intra = np.full((f, by, bx), 1000.0, np.float32)
    inter = np.full((f, by, bx), 0.0, np.float32)
    mvs = np.zeros((f, by, bx, 2), np.int32)
    # frame 1 block (0,0) references ref block (0,1): mv = +1 block in x
    mvs[1, 0, 0] = (32, 0)
    pcs = np.asarray(cutree_propagate_ippp(
        jnp.asarray(intra), jnp.asarray(inter), jnp.asarray(mvs)))
    assert pcs[0][0, 1] > 0
    # everyone else scatters to their own position
    assert pcs[0][0, 0] == 0


def test_lookahead_gop_end_to_end():
    cfg = EncoderConfig(width=64, height=64, qp=32, aq_mode=2,
                        aq_strength=1.0, cutree=True)
    f = 4
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    ys = np.stack([np.roll(base, 2 * i, axis=1) for i in range(f)])
    cbs = np.full((f, 32, 32), 128, np.uint8)
    crs = cbs.copy()
    off_ctu, off16, fi, fe = lookahead_gop(ys, cbs, crs, cfg)
    assert off_ctu.shape == (f, 2, 2)
    assert off16.shape == (f, 4, 4)
    # earlier frames are referenced more -> more negative offsets
    assert off_ctu[0].mean() < off_ctu[-1].mean() + 1e-5
    # frame inter cost is way below intra cost for a pan
    assert np.all(fe[1:] < 0.7 * fi[1:])


def test_lookahead_dqp_flag():
    cfg = EncoderConfig(width=64, height=64, aq_mode=0, cutree=False)
    assert not cfg.dqp_enabled
    cfg.aq_mode = 2
    assert cfg.dqp_enabled
