"""Compact coefficient transfer: most quantized coefficients are zero,
and this machine's device->host link runs at ~30-45 MB/s, so dense
int16 coefficient planes dominate the download. Compaction keeps only
the nonzero 4x4 coefficient groups (the CG granularity of residual
coding, clause 7.3.8.11) plus their indices — typically a 5-20x
smaller transfer for P frames (x265 has no analog: its coefficients
never leave the core that produced them; this is the TPU equivalent
of keeping them NUMA-local, frameencoder.cpp's per-thread coeff
buffers).

Sort-based compaction (argsort over a validity key) is used instead of
a scatter: TPU scatters serialize, sorts are parallel.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cap",))
def compact_cgs(plane2d: jnp.ndarray, cap: int):
    """(H, W) int plane -> (vals (cap, 16) int16, idx (cap,) int32,
    total int32): the first `total` rows hold the nonzero 4x4 CGs in
    raster order. Rows past `total` are garbage; if total > cap the
    caller must fall back to the dense plane."""
    h, w = plane2d.shape
    ncy, ncx = h // 4, w // 4
    cg = plane2d.reshape(ncy, 4, ncx, 4).transpose(0, 2, 1, 3) \
        .reshape(ncy * ncx, 16)
    nz = jnp.any(cg != 0, axis=1)
    iota = jnp.arange(cg.shape[0], dtype=jnp.int32)
    key = jnp.where(nz, iota, jnp.int32(1 << 30))
    order = jnp.argsort(key)[:cap].astype(jnp.int32)
    vals = jnp.take(cg, order, axis=0).astype(jnp.int16)
    return vals, order, jnp.sum(nz.astype(jnp.int32))


def expand_cgs_np(vals: np.ndarray, idx: np.ndarray, total: int,
                  h: int, w: int) -> np.ndarray:
    """Inverse of compact_cgs on the host -> dense (h, w) int32."""
    ncy, ncx = h // 4, w // 4
    cg = np.zeros((ncy * ncx, 16), np.int32)
    t = int(total)
    cg[idx[:t]] = vals[:t]
    return cg.reshape(ncy, ncx, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(h, w)


def fetch_plane_compact(plane2d, cap_frac: int = 8) -> np.ndarray:
    """Download a device coefficient plane via CG compaction, with a
    dense fallback when the nonzero density exceeds the capacity."""
    h, w = plane2d.shape
    cap = max(4096, (h // 4) * (w // 4) // cap_frac)
    vals, idx, total = compact_cgs(plane2d, cap=cap)
    t = int(total)
    if t > cap:
        return np.asarray(plane2d).astype(np.int32)
    return expand_cgs_np(np.asarray(vals), np.asarray(idx), t, h, w)


# =============================================================================
# mask-directed compaction (v2): the argsort formulation above costs
# ~0.8 s per GOP-stacked plane on TPU (a 1M-key sort + a capacity-sized
# row gather). v2 downloads the tiny nonzero-CG bitmask instead, lets
# the HOST compute the row indices, and gathers exactly the nonzero
# rows — device work is one `any` reduction plus a t-row take.
# =============================================================================

@jax.jit
def cg_rows(plane2d: jnp.ndarray):
    """(H, W) plane -> ((ncg, 16) int16 CG rows, (ncg,) bool nonzero)."""
    h, w = plane2d.shape
    cg = plane2d.reshape(h // 4, 4, w // 4, 4).transpose(0, 2, 1, 3) \
        .reshape(-1, 16).astype(jnp.int16)
    return cg, jnp.any(cg != 0, axis=1)


@jax.jit
def cg_rows_packed(plane2d: jnp.ndarray):
    """cg_rows with the nonzero mask BIT-PACKED on device: the mask
    transfer drops 8x (the D2H link here runs ~30 MB/s, so a 1.5 MB
    bool mask costs real time)."""
    h, w = plane2d.shape
    cg = plane2d.reshape(h // 4, 4, w // 4, 4).transpose(0, 2, 1, 3) \
        .reshape(-1, 16).astype(jnp.int16)
    nz = jnp.any(cg != 0, axis=1)
    return cg, jnp.packbits(nz)


@partial(jax.jit, static_argnames=("rows",))
def _take_rows(cg: jnp.ndarray, idx: jnp.ndarray, *, rows: int):
    return jnp.take(cg, idx, axis=0)


def fetch_rows(cg: jnp.ndarray, idx_np: np.ndarray) -> np.ndarray:
    """Gather + download the given CG rows; idx padded to power-of-two
    buckets so the take jit compiles O(log) times, not per length."""
    t = len(idx_np)
    if t == 0:
        return np.zeros((0, 16), np.int16)
    bucket = 1 << max(t - 1, 1).bit_length()
    idx_pad = np.zeros(bucket, np.int32)
    idx_pad[:t] = idx_np
    vals = _take_rows(cg, jnp.asarray(idx_pad), rows=bucket)
    return np.asarray(vals)[:t]


def fetch_compact_v2(pending) -> np.ndarray:
    """pending: (cg, nz, h, w) from a prior cg_rows dispatch -> dense
    (h, w) int32 plane on the host."""
    cg, nz, h, w = pending
    nzh = np.asarray(nz)
    idx = np.nonzero(nzh)[0].astype(np.int32)
    vals = fetch_rows(cg, idx)
    out = np.zeros((len(nzh), 16), np.int32)
    out[idx] = vals
    return out.reshape(h // 4, w // 4, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(h, w)


def fetch_compact_frames(pending, fh: int, fw: int,
                         crop_h: int, crop_w: int) -> list[np.ndarray]:
    """pending: (cg, nz_packed, h, w) from cg_rows_packed over a stack
    of F frames laid out as (F*fh, fw) -> per-frame dense int16 planes
    cropped to (crop_h, crop_w), expanded by the native scatter
    (entropy.cpp expand_cgs) — no full-plane numpy rebuild.

    Total host+device cost is one packed-mask download, one row gather
    + download, and a ~2 ms/frame memset+scatter in C++."""
    from ..native.entropy_native import expand_cgs_native
    cg, nzp, h, w = pending
    f = h // fh
    ncx = w // 4
    cg_per_frame = (fh // 4) * ncx
    nzh = np.unpackbits(np.asarray(nzp), count=f * cg_per_frame)
    idx = np.nonzero(nzh)[0].astype(np.int32)
    vals = fetch_rows(cg, idx)
    planes = []
    bounds = np.searchsorted(idx, np.arange(f + 1) * cg_per_frame)
    for i in range(f):
        lo, hi = bounds[i], bounds[i + 1]
        planes.append(expand_cgs_native(
            vals[lo:hi], idx[lo:hi] - i * cg_per_frame, ncx,
            crop_h, crop_w))
    return planes
