"""Intra prediction: JAX batched matmul predictor vs spec-written oracle."""

import numpy as np
import pytest

from x265_tpu.ops import intra_np
from x265_tpu.ops.intra import (
    intra_pred_all_modes, intra_pred_single_mode, filter_refs_batch,
)


def rand_refs(rng, n, bit_depth=8, count=7):
    return rng.integers(0, 1 << bit_depth, size=(count, 4 * n + 1)).astype(np.int32)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_all_modes_vs_oracle(n, is_luma):
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    refs = rand_refs(rng, n)
    got = np.asarray(intra_pred_all_modes(jnp.asarray(refs), n, is_luma=is_luma))
    for b in range(refs.shape[0]):
        r = refs[b].astype(np.int64)
        rf = intra_np.filter_refs(r, n)
        for mode in range(35):
            want = intra_np.intra_pred_np(r, mode, n, is_luma=is_luma,
                                          filtered=rf)
            np.testing.assert_array_equal(
                got[b, mode], want, err_msg=f"n={n} mode={mode} b={b} luma={is_luma}")


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_single_mode_vs_oracle(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(100 + n)
    refs = rand_refs(rng, n, count=35)
    modes = np.arange(35, dtype=np.int32)
    got = np.asarray(intra_pred_single_mode(
        jnp.asarray(refs), jnp.asarray(modes), n, is_luma=True))
    for b in range(35):
        r = refs[b].astype(np.int64)
        rf = intra_np.filter_refs(r, n)
        want = intra_np.intra_pred_np(r, int(modes[b]), n, is_luma=True,
                                      filtered=rf)
        np.testing.assert_array_equal(got[b], want,
                                      err_msg=f"n={n} mode={modes[b]}")


def test_filter_refs_batch_matches_oracle():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    n = 8
    refs = rand_refs(rng, n, count=9)
    got = np.asarray(filter_refs_batch(jnp.asarray(refs)))
    for b in range(9):
        want = intra_np.filter_refs(refs[b].astype(np.int64), n)
        np.testing.assert_array_equal(got[b], want)


def test_reference_substitution():
    frame = np.arange(64 * 64, dtype=np.int32).reshape(64, 64) % 256
    n = 8
    # fully available interior block
    avail = np.ones(4 * n + 1, dtype=bool)
    r = intra_np.canonical_refs(frame, 16, 16, n, avail)
    assert r[2 * n] == frame[15, 15]           # corner
    assert r[2 * n + 1] == frame[15, 16]       # first top
    assert r[2 * n - 1] == frame[16, 15]       # first left
    assert r[0] == frame[31, 15]               # bottom-most left
    # nothing available -> mid gray
    r2 = intra_np.canonical_refs(frame, 0, 0, n, np.zeros(4 * n + 1, bool))
    assert (r2 == 128).all()
    # partial: only top available -> left filled from first available
    avail3 = np.zeros(4 * n + 1, bool)
    avail3[2 * n + 1:] = True
    r3 = intra_np.canonical_refs(frame, 16, 16, n, avail3)
    assert (r3[:2 * n + 1] == r3[2 * n + 1]).all()


def test_dc_flat_block():
    n = 8
    r = np.full(4 * n + 1, 100, dtype=np.int64)
    rf = intra_np.filter_refs(r, n)
    p = intra_np.intra_pred_np(r, 1, n, filtered=rf)
    assert (p == 100).all()
    # planar on flat refs is flat too
    p0 = intra_np.intra_pred_np(r, 0, n, filtered=rf)
    assert (p0 == 100).all()
    # pure vertical copies the top row
    p26 = intra_np.intra_pred_np(r, 26, n, filtered=rf)
    assert (p26 == 100).all()


def test_strong_smoothing_condition():
    n = 32
    r = np.linspace(0, 255, 4 * n + 1).astype(np.int64)  # perfectly linear
    assert intra_np.strong_smoothing_condition(r, n)
    r2 = r.copy()
    r2[3 * n] += 50
    assert not intra_np.strong_smoothing_condition(r2, n)
