"""Transform/quant kernel tests: numpy oracle self-checks + JAX batched
kernels vs oracle (the testbench model from SURVEY.md §4.1)."""

import numpy as np
import pytest

from x265_tpu.ops import transforms as tx
from x265_tpu.common.tables import DCT_MATRICES, DST4


def rand_resi(rng, n, bit_depth=8):
    m = (1 << bit_depth) - 1
    return rng.integers(-m, m + 1, size=(n, n)).astype(np.int32)


def test_dct_matrices_near_orthogonal():
    for n, t in DCT_MATRICES.items():
        g = t.astype(np.int64) @ t.astype(np.int64).T
        off = g - np.diag(np.diag(g))
        # integer approximation: off-diagonal energy tiny vs diagonal
        assert np.abs(off).max() <= 0.01 * np.diag(g).min()
        assert (np.diag(g) > 0.9 * np.diag(g).mean()).all()


def test_dct_dc_value():
    # flat block: only DC nonzero; DC = v * 2^(...) per shift arithmetic
    v = 7
    for n in (4, 8, 16, 32):
        blk = np.full((n, n), v, dtype=np.int32)
        c = tx.dct_np(blk)
        assert c[0, 0] != 0
        z = c.copy()
        z[0, 0] = 0
        assert np.all(z == 0)


def test_dct_idct_roundtrip_np():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        for bd in (8, 10):
            x = rand_resi(rng, n, bd)
            c = tx.dct_np(x, bd)
            y = tx.idct_np(c, bd)
            # integer transforms are near-inverse on worst-case noise:
            # error scales with amplitude and transform size
            tol = max(2, ((1 << bd) * n) >> 10)
            assert np.abs(y - x).max() <= tol, (n, bd)


def test_dst_roundtrip_np():
    rng = np.random.default_rng(1)
    x = rand_resi(rng, 4, 8)
    c = tx.dct_np(x, 8, dst=True)
    y = tx.idct_np(c, 8, dst=True)
    assert np.abs(y - x).max() <= 2


def test_quant_dequant_np():
    rng = np.random.default_rng(2)
    for n in (4, 8, 16, 32):
        x = rand_resi(rng, n, 8)
        c = tx.dct_np(x, 8)
        for qp in (0, 10, 22, 37, 51):
            l = tx.quant_np(c, qp)
            d = tx.dequant_np(l, qp)
            # quantization step in coeff units ~ 2^((qp+4)/6) * 256/n
            step = 2 ** ((qp + 4) / 6.0) * 512 / n
            assert np.abs(d - c).max() <= step, (n, qp)


def test_quant_zero_preserving():
    z = np.zeros((8, 8), dtype=np.int32)
    assert np.all(tx.quant_np(z, 30) == 0)
    assert np.all(tx.dequant_np(z, 30) == 0)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bd", [8, 10])
def test_jax_dct_matches_oracle(n, bd):
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    batch = np.stack([rand_resi(rng, n, bd) for _ in range(9)])
    got = np.asarray(tx.dct_batch(jnp.asarray(batch), n, bd))
    want = np.stack([tx.dct_np(b, bd) for b in batch])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bd", [8, 10])
def test_jax_idct_matches_oracle(n, bd):
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    # worst-case 16-bit coefficients
    batch = rng.integers(-32768, 32768, size=(9, n, n)).astype(np.int32)
    got = np.asarray(tx.idct_batch(jnp.asarray(batch), n, bd))
    want = np.stack([tx.idct_np(b, bd) for b in batch])
    np.testing.assert_array_equal(got, want)


def test_jax_dst_matches_oracle():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    batch = np.stack([rand_resi(rng, 4, 8) for _ in range(17)])
    got = np.asarray(tx.dct_batch(jnp.asarray(batch), 4, 8, dst=True))
    want = np.stack([tx.dct_np(b, 8, dst=True) for b in batch])
    np.testing.assert_array_equal(got, want)
    coefs = rng.integers(-32768, 32768, size=(17, 4, 4)).astype(np.int32)
    got = np.asarray(tx.idct_batch(jnp.asarray(coefs), 4, 8, dst=True))
    want = np.stack([tx.idct_np(b, 8, dst=True) for b in coefs])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qp", [0, 17, 34, 51])
def test_jax_quant_dequant_matches_oracle(qp):
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    for n in (4, 32):
        x = np.stack([rand_resi(rng, n, 8) for _ in range(5)])
        c = np.stack([tx.dct_np(b, 8) for b in x])
        got_q = np.asarray(tx.quant_batch(jnp.asarray(c), n, qp))
        want_q = np.stack([tx.quant_np(b, qp) for b in c])
        np.testing.assert_array_equal(got_q, want_q)
        got_d = np.asarray(tx.dequant_batch(jnp.asarray(want_q), n, qp))
        want_d = np.stack([tx.dequant_np(b, qp) for b in want_q])
        np.testing.assert_array_equal(got_d, want_d)
