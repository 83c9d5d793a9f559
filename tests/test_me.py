"""Motion estimation: recovers known global/local translations."""

import numpy as np
import pytest

from x265_tpu.ops.me import motion_search_frame


def _textured(h, w, seed):
    """Band-limited texture: blurred noise, realistic autocorrelation."""
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 60, (h, w))
    k = np.ones(9) / 9.0
    for axis in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, img)
    img = img * 6 + 128
    img += rng.normal(0, 2, (h, w))
    return np.clip(img, 0, 255).astype(np.int32)


def test_global_translation_recovered():
    h, w = 96, 128
    ref = _textured(h + 32, w + 32, 3)
    dy, dx = 6, -10          # cur = ref shifted by (dx, dy)
    cur = ref[16 + dy:16 + dy + h, 16 + dx:16 + dx + w]
    refc = ref[16:16 + h, 16:16 + w]
    fields = motion_search_frame(cur, refc, qp=32)
    for n, (mv, cost) in fields.items():
        # interior blocks (border blocks clamp) must find (dx, dy)*4 qpel
        inner = mv[1:-1, 1:-1]
        expect = np.array([dx * 4, dy * 4])
        frac = np.mean(np.all(inner == expect, axis=-1))
        assert frac >= 0.9, f"size {n}: only {frac:.2f} found {expect}"


def test_zero_motion_on_static():
    h, w = 64, 96
    cur = _textured(h, w, 9)
    fields = motion_search_frame(cur, cur.copy(), qp=30)
    for n, (mv, cost) in fields.items():
        assert np.all(mv == 0), f"size {n} drifted on identical frames"
        # zero SATD + the zero-MVD signalling cost only
        assert np.all(cost < 64)
