"""Polyphase video scaler (the x265 ABR-ladder scaler analog,
source/common/scaler.{h,cpp} — an ffmpeg-derived separable polyphase
resampler used to feed lower ladder rungs, abrEncApp.cpp:938).

TPU-first formulation: a separable 4-tap polyphase filter where each
tap is a dense shifted multiply-add over the whole plane (the same
shifted-accumulation idiom as the MC interpolators) — no gathers. The
16-phase cubic bank matches the classic Catmull-Rom/bicubic shape used
for ladder downscales; for scale factors < 1 the kernel is stretched
by the scale ratio (anti-aliasing), like swscale's area-averaging
behavior for the common 2x rung steps.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

N_PHASES = 16
N_TAPS = 8


@lru_cache(maxsize=None)
def _bank(ratio_q8: int) -> np.ndarray:
    """(N_PHASES, N_TAPS) int16 filter bank, 7-bit normalized. ratio =
    out/in size as Q8; kernels widen by 1/ratio when downscaling."""
    ratio = min(ratio_q8 / 256.0, 1.0)
    bank = np.zeros((N_PHASES, N_TAPS), np.int32)

    def cubic(x):
        x = abs(x)
        if x < 1:
            return 1.5 * x ** 3 - 2.5 * x ** 2 + 1
        if x < 2:
            return -0.5 * x ** 3 + 2.5 * x ** 2 - 4 * x + 2
        return 0.0

    for p in range(N_PHASES):
        frac = p / N_PHASES
        w = np.array([cubic((t - (N_TAPS // 2 - 1) - frac) * ratio)
                      for t in range(N_TAPS)])
        w = w / w.sum()
        q = np.round(w * 128).astype(np.int32)
        q[N_TAPS // 2 - 1] += 128 - q.sum()     # exact normalization
        bank[p] = q
    return bank


def _resample_axis(plane: jnp.ndarray, out_len: int, axis: int,
                   bit_depth: int) -> jnp.ndarray:
    """Polyphase resample along one axis (shifted-tap accumulation)."""
    in_len = plane.shape[axis]
    if in_len == out_len:
        return plane
    ratio_q8 = max(int(round(out_len / in_len * 256)), 1)
    bank = _bank(ratio_q8)
    # source position of each output sample (center-aligned)
    pos = (np.arange(out_len) + 0.5) * in_len / out_len - 0.5
    base = np.floor(pos).astype(np.int32)
    phase = np.round((pos - base) * N_PHASES).astype(np.int32)
    base += phase // N_PHASES
    phase %= N_PHASES
    start = base - (N_TAPS // 2 - 1)
    # per-output-sample weights (out_len, N_TAPS)
    wts = bank[phase]
    pad = N_TAPS
    padded = jnp.moveaxis(plane, axis, 0)
    padded = jnp.pad(padded, [(pad, pad)] + [(0, 0)] *
                     (padded.ndim - 1), mode="edge")
    acc = jnp.zeros((out_len,) + padded.shape[1:], jnp.int32)
    idx0 = np.clip(start + pad, 0, in_len + 2 * pad - 1)
    for t in range(N_TAPS):
        rows = jnp.asarray(np.clip(idx0 + t, 0, in_len + 2 * pad - 1))
        w = jnp.asarray(wts[:, t].astype(np.int32))
        taps = jnp.take(padded, rows, axis=0)
        acc = acc + taps * w.reshape((-1,) + (1,) * (padded.ndim - 1))
    maxv = (1 << bit_depth) - 1
    out = jnp.clip((acc + 64) >> 7, 0, maxv)
    return jnp.moveaxis(out, 0, axis)


def scale_plane(plane, out_h: int, out_w: int,
                bit_depth: int = 8) -> np.ndarray:
    """Resample one plane to (out_h, out_w)."""
    p = jnp.asarray(np.asarray(plane).astype(np.int32))
    p = _resample_axis(p, out_w, 1, bit_depth)
    p = _resample_axis(p, out_h, 0, bit_depth)
    return np.asarray(p)


def scale_frame(frame, out_w: int, out_h: int,
                bit_depth: int = 8):
    """(y, cb, cr) 4:2:0 triple -> scaled triple."""
    y, cb, cr = frame
    return (scale_plane(y, out_h, out_w, bit_depth)
            .astype(np.asarray(y).dtype),
            scale_plane(cb, out_h // 2, out_w // 2, bit_depth)
            .astype(np.asarray(cb).dtype),
            scale_plane(cr, out_h // 2, out_w // 2, bit_depth)
            .astype(np.asarray(cr).dtype))
