"""Sub-pel interpolation: batched JAX MC vs numpy spec oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from x265_tpu.ops.interp import (luma_mc_np, chroma_mc_np, mc_block_batch)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_luma_mc_batch_vs_oracle(n):
    rng = np.random.default_rng(n)
    h, w = 96, 96
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    b = 24
    x0s = rng.integers(0, w - n, b)
    y0s = rng.integers(0, h - n, b)
    mvx = rng.integers(-30, 30, b)
    mvy = rng.integers(-30, 30, b)
    out = np.asarray(mc_block_batch(
        jnp.asarray(ref), jnp.asarray(x0s), jnp.asarray(y0s),
        jnp.asarray(mvx), jnp.asarray(mvy), n, is_luma=True))
    for i in range(b):
        exp = luma_mc_np(ref, int(x0s[i]), int(y0s[i]), n, int(mvx[i]),
                         int(mvy[i]))
        np.testing.assert_array_equal(out[i], exp, err_msg=f"block {i}")


@pytest.mark.parametrize("n", [4, 8, 16])
def test_chroma_mc_batch_vs_oracle(n):
    rng = np.random.default_rng(n + 50)
    h, w = 64, 64
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    b = 16
    x0s = rng.integers(0, w - n, b)
    y0s = rng.integers(0, h - n, b)
    mvx = rng.integers(-40, 40, b)
    mvy = rng.integers(-40, 40, b)
    out = np.asarray(mc_block_batch(
        jnp.asarray(ref), jnp.asarray(x0s), jnp.asarray(y0s),
        jnp.asarray(mvx), jnp.asarray(mvy), n, is_luma=False))
    for i in range(b):
        exp = chroma_mc_np(ref, int(x0s[i]), int(y0s[i]), n, int(mvx[i]),
                           int(mvy[i]))
        np.testing.assert_array_equal(out[i], exp, err_msg=f"block {i}")


def test_integer_mv_is_copy():
    """Zero fractional MV must reproduce the reference samples."""
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    out = np.asarray(mc_block_batch(
        jnp.asarray(ref), jnp.asarray([8]), jnp.asarray([8]),
        jnp.asarray([16]), jnp.asarray([-8]), 16, is_luma=True))
    np.testing.assert_array_equal(out[0], ref[6:22, 12:28])
