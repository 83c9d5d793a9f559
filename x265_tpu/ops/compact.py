"""Compact coefficient transfer: most quantized coefficients are zero,
and this machine's device->host link runs at ~30 MB/s with ~45 ms of
latency per round trip, so dense int16 coefficient planes would
dominate the download. The production protocol (enc/pgop_tpu.py
collect, enc/intra_recon_tpu.py finalize) computes nonzero-4x4-CG rows
and bit-packed masks INSIDE the encode program, downloads the masks in
the bundled first transfer, and gathers exactly the nonzero rows here
in one second transfer (x265 has no analog: its coefficients never
leave the core that produced them; this is the TPU equivalent of
keeping them NUMA-local, frameencoder.cpp's per-thread coeff buffers).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


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
