#!/usr/bin/env python
"""Bisect me_size_windowed n=8: integer loop vs qpel refinement."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x265_tpu.ops.me_win import (gather_windows_ds, interp_ext_lanes,  # noqa: E402
                                 pad_ref)
from x265_tpu.ops.satd import sa8d_nxn_lanes  # noqa: E402
from profile_pgop import synth  # noqa: E402


def t(fn, label, niter=10):
    def sync(r):
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(r)))
    sync(fn())
    t0 = time.perf_counter()
    rs = [fn() for _ in range(niter)]
    sync(rs[-1])
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(fn())
    rt = time.perf_counter() - t0
    per = max((dt0 - rt) / (niter - 1), 0.0)
    print(f"{label}: {per*1000:.1f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    hp, wp = 1088, 1920
    n, radius = 8, 6
    pad = 2 * radius + 8
    cur = jnp.asarray(np.pad(synth(0)[0], ((0, 8), (0, 0)), mode="edge")
                      .astype(np.int32))
    ref_pad = pad_ref(jnp.asarray(
        np.pad(synth(1, 2)[0], ((0, 8), (0, 0)), mode="edge")
        .astype(np.int32)), pad)
    by, bx = hp // n, wp // n
    b = by * bx
    y0s = jnp.repeat(jnp.arange(by, dtype=jnp.int32) * n, bx)
    x0s = jnp.tile(jnp.arange(bx, dtype=jnp.int32) * n, by)
    cur_t = cur.reshape(by, n, bx, n).transpose(1, 3, 0, 2) \
        .reshape(n, n, b)
    rng = np.random.default_rng(0)
    sx = jnp.asarray(rng.integers(-6, 6, b), jnp.int32)
    sy = jnp.asarray(rng.integers(-6, 6, b), jnp.int32)
    wlen = n + 2 * radius
    side = 2 * radius + 1

    t(jax.jit(lambda: gather_windows_ds(ref_pad, pad, y0s + sy - radius,
                                        x0s + sx - radius, wlen)),
      "window gather")
    win_t = jnp.transpose(jax.jit(lambda: gather_windows_ds(
        ref_pad, pad, y0s + sy - radius, x0s + sx - radius, wlen))(),
        (1, 2, 0))

    def int_loop():
        def body(i, state):
            bc, bi = state
            dy = i // side
            dx = i % side
            cand = jax.lax.dynamic_slice(win_t, (dy, dx, 0), (n, n, b))
            sad = jnp.sum(jnp.abs(cur_t - cand), axis=(0, 1))
            better = sad < bc
            return jnp.where(better, sad, bc), jnp.where(better, i, bi)
        init = (jnp.full((b,), 1 << 30, jnp.int32),
                jnp.zeros((b,), jnp.int32))
        return jax.lax.fori_loop(0, side * side, body, init)

    t(jax.jit(int_loop), f"int loop {side*side} cands")

    swin_t = jnp.transpose(jax.jit(lambda: gather_windows_ds(
        ref_pad, pad, y0s + sy - 4, x0s + sx - 4, n + 8))(), (1, 2, 0))
    dx0 = jnp.zeros((b,), jnp.int32)

    t(jax.jit(lambda: interp_ext_lanes(swin_t, dx0 + 3, dx0 + 3, n)),
      "interp_ext_lanes x1")
    t(jax.jit(lambda: sa8d_nxn_lanes(
        cur_t - interp_ext_lanes(swin_t, dx0 + 3, dx0 + 3, n), n)),
      "interp+sa8d x1")

    def qpel17():
        acc = jnp.zeros((b,), jnp.int32)
        for k in range(17):
            o = jnp.full((b,), k % 7, jnp.int32)
            p = interp_ext_lanes(swin_t, o, o, n)
            acc = acc + sa8d_nxn_lanes(cur_t - p, n)
        return acc
    t(jax.jit(qpel17), "qpel 17 rounds")


if __name__ == "__main__":
    main()
