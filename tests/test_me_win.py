"""Windowed ME: extended-filter interpolation must be bit-exact with
the normative per-block MC (ops.interp.mc_block_batch), and the search
must return predictions matching its own chosen MVs."""

import numpy as np
import pytest
import jax.numpy as jnp

from x265_tpu.ops.interp import mc_block_batch
from x265_tpu.ops.me_win import (gather_windows, interp_ext,
                                 me_size_windowed)


def _plane(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    p = ((xx * 7 + yy * 3 + (xx * yy >> 6)) % 256).astype(np.int32)
    return np.clip(p + rng.integers(-20, 20, (h, w)), 0, 255)


@pytest.mark.parametrize("d", [(-3, 2), (0, 0), (1, -1), (3, 3),
                               (-1, -3), (2, 0)])
def test_interp_ext_matches_mc_block_batch(d):
    h, w, n = 64, 64, 8
    ref = jnp.asarray(_plane(h, w, 1))
    by, bx = h // n, w // n
    b = by * bx
    rng = np.random.default_rng(3)
    mvi = rng.integers(-5, 5, (b, 2)).astype(np.int32)
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    dx, dy = d
    swin = gather_windows(ref, y0s + jnp.asarray(mvi[:, 1]) - 4,
                          x0s + jnp.asarray(mvi[:, 0]) - 4, n + 8)
    got = interp_ext(swin, jnp.full((b,), dx + 3), jnp.full((b,), dy + 3),
                     n)
    want = mc_block_batch(ref, x0s, y0s,
                          jnp.asarray(mvi[:, 0]) * 4 + dx,
                          jnp.asarray(mvi[:, 1]) * 4 + dy, n,
                          is_luma=True, bit_depth=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_interp_ext_mixed_offsets():
    """Per-block differing quarter-pel offsets (the search's state)."""
    h, w, n = 32, 64, 16
    ref = jnp.asarray(_plane(h, w, 5))
    by, bx = h // n, w // n
    b = by * bx
    rng = np.random.default_rng(9)
    mvi = rng.integers(-3, 3, (b, 2)).astype(np.int32)
    dq = rng.integers(-3, 4, (b, 2)).astype(np.int32)
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    swin = gather_windows(ref, y0s + jnp.asarray(mvi[:, 1]) - 4,
                          x0s + jnp.asarray(mvi[:, 0]) - 4, n + 8)
    got = interp_ext(swin, jnp.asarray(dq[:, 0]) + 3,
                     jnp.asarray(dq[:, 1]) + 3, n)
    want = mc_block_batch(ref, x0s, y0s,
                          jnp.asarray(mvi[:, 0] * 4 + dq[:, 0]),
                          jnp.asarray(mvi[:, 1] * 4 + dq[:, 1]), n,
                          is_luma=True, bit_depth=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("is_luma,n", [(True, 8), (False, 4),
                                       (False, 8)])
def test_mc_block_batch_ds_matches(is_luma, n):
    """Tile-sliced MC == element-gather MC for in-range MVs."""
    from x265_tpu.ops.me_win import mc_block_batch_ds, pad_ref
    h, w = 48, 64
    ref = jnp.asarray(_plane(h, w, 4))
    by, bx = h // n, w // n
    b = by * bx
    rng = np.random.default_rng(11)
    unit = 4 if is_luma else 8
    mvx = jnp.asarray(rng.integers(-5 * unit, 5 * unit, b, np.int32))
    mvy = jnp.asarray(rng.integers(-5 * unit, 5 * unit, b, np.int32))
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    want = mc_block_batch(ref, x0s, y0s, mvx, mvy, n, is_luma=is_luma,
                          bit_depth=8)
    got = mc_block_batch_ds(pad_ref(ref, 16), 16, x0s, y0s, mvx, mvy, n,
                            is_luma=is_luma, bit_depth=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_me_windowed_pred_matches_mv():
    """The returned prediction must equal normative MC at the returned
    MV — the contract that lets recon reuse the ME predictions."""
    h, w, n = 64, 96, 8
    cur = jnp.asarray(np.roll(_plane(h, w, 2), 3, axis=1))
    ref = jnp.asarray(_plane(h, w, 2))
    by, bx = h // n, w // n
    b = by * bx
    seeds = jnp.zeros((b, 2), jnp.int32)
    from x265_tpu.ops.me_win import pad_ref
    mvq, cost, pred = me_size_windowed(cur, pad_ref(ref, 20), seeds,
                                       jnp.int32(20), n, pad=20)
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    want = mc_block_batch(ref, x0s, y0s, mvq[:, 0], mvq[:, 1], n,
                          is_luma=True, bit_depth=8)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(want))
    # cur = ref rolled +3 px, so blocks match ref 3 px to the LEFT
    mv = np.asarray(mvq).reshape(by, bx, 2)
    inner = mv[1:-1, 2:-2]
    assert (inner[..., 0] == -12).mean() > 0.8
