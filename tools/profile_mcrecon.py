#!/usr/bin/env python
"""Bisect _mc_recon_all: per-stage device times at 1080p."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from x265_tpu.ops.me_win import mc_block_batch_ds, pad_ref  # noqa: E402
from x265_tpu.ops.transforms import (dct_batch, idct_batch, quant_batch,  # noqa: E402
                                     dequant_batch, sign_hide_batch)
from profile_pgop import synth  # noqa: E402


def t(fn, label, n=10):
    """Queue n async dispatches, sync once: amortizes the ~35 ms
    tunnel round-trip so the per-iteration time is real compute."""
    def sync(r):
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(r)))
    sync(fn())                      # compile + warm
    t0 = time.perf_counter()
    rs = [fn() for _ in range(n)]
    sync(rs[-1])
    dt0 = time.perf_counter() - t0  # n dispatches + 1 round trip
    t0 = time.perf_counter()
    sync(fn())
    rt = time.perf_counter() - t0   # 1 dispatch + 1 round trip
    per = max((dt0 - rt) / (n - 1), 0.0)
    print(f"{label}: {per*1000:.1f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    hp, wp = 1088, 1920
    rng = np.random.default_rng(0)
    cur = jnp.asarray(np.pad(synth(0)[0], ((0, 8), (0, 0)), mode="edge")
                      .astype(np.int32))
    refp = jnp.asarray(np.pad(synth(1, 2)[0], ((0, 8), (0, 0)),
                              mode="edge").astype(np.int32))
    pad_y = 20
    ref_pad = pad_ref(refp, pad_y)
    cpad = pad_ref(refp[::2, ::2], 14)

    for n in (8, 16, 32):
        by, bx = hp // n, wp // n
        b = by * bx
        blocks = cur.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
            .reshape(b, n, n)
        resi = blocks - jnp.roll(blocks, 1, axis=0)
        mvx = jnp.asarray(rng.integers(-20, 20, b), jnp.int32)
        mvy = jnp.asarray(rng.integers(-20, 20, b), jnp.int32)
        x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by) // 2
        y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx) // 2

        cn = n // 2
        t(jax.jit(lambda: mc_block_batch_ds(cpad, 14, x0s, y0s, mvx, mvy,
                                            cn, is_luma=False)),
          f"chroma MC gather+interp n={cn}")
        t(jax.jit(partial(dct_batch, resi, n)), f"dct n={n}")
        qfn = jax.jit(lambda: quant_batch(dct_batch(resi, n), n, 32,
                                          intra=False, with_rem=True))
        t(qfn, f"dct+quant(rem) n={n}")
        cf, du = qfn()
        t(jax.jit(lambda: sign_hide_batch(cf, n, 0, du)),
          f"sign_hide n={n}")
        t(jax.jit(lambda: idct_batch(dequant_batch(cf, n, 32), n)),
          f"dequant+idct n={n}")
        sse = jax.jit(lambda: ((blocks - jnp.roll(blocks, 1, 0)) ** 2)
                      .astype(jnp.float32).sum((1, 2)))
        t(sse, f"sse n={n}")


if __name__ == "__main__":
    main()
