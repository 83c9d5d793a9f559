"""Batched intra prediction for TPU (JAX).

TPU-first reformulation: instead of per-block scalar loops (reference:
x265 source/common/intrapred.cpp, `intra_pred_allangs` asm family), all
35 modes are expressed as ONE sparse linear map from the canonical
reference array R[4N+1] to the NxN prediction:

    pred[m] = (W[m] @ R + rnd[m]) >> shift[m]

with W precomputed per (size, mode). This turns the whole 35-mode sweep
over every block in a frame into a single MXU matmul. The few
non-linear spec details (DC/horizontal/vertical boundary filters on
luma < 32) are cheap masked fixups afterwards.

Integer exactness on the MXU: W entries <= 32 (bf16-exact), references
<= 2^bit_depth-1, accumulations < 2^24 -> f32 matmul is exact.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..common.tables import intra_angle, intra_inv_angle, intra_filter_flag


@lru_cache(maxsize=None)
def build_intra_tables(n: int):
    """Precompute the per-mode weight tensors for size n.

    Returns dict with:
      w        : (35, n*n, 4n+1) int32 weights
      use_filt : (35,) bool — mode reads the [1 2 1]-filtered reference
                 (luma only; chroma always uses unfiltered)
      rnd      : (35,) int32, shift: (35,) int32
    """
    c = 2 * n
    nref = 4 * n + 1
    log2n = n.bit_length() - 1
    w = np.zeros((35, n * n, nref), dtype=np.int32)
    rnd = np.zeros(35, dtype=np.int32)
    shift = np.zeros(35, dtype=np.int32)
    use_filt = np.array([intra_filter_flag(m, log2n) for m in range(35)])

    def lidx(s):  # L[s] = p[-1][s]
        return c - 1 - s

    def tidx(t):  # T[t] = p[t][-1]
        return c + 1 + t

    # planar
    rnd[0], shift[0] = n, log2n + 1
    for y in range(n):
        for x in range(n):
            p = y * n + x
            w[0, p, lidx(y)] += n - 1 - x
            w[0, p, tidx(n)] += x + 1
            w[0, p, tidx(x)] += n - 1 - y
            w[0, p, lidx(n)] += y + 1

    # DC (interior value everywhere; boundary fixup applied separately)
    rnd[1], shift[1] = n, log2n + 1
    for t in range(n):
        w[1, :, tidx(t)] = 1
        w[1, :, lidx(t)] = 1

    # angular
    for mode in range(2, 35):
        a = intra_angle(mode)
        rnd[mode], shift[mode] = 16, 5
        vertical = mode >= 18

        def refcan(xp):  # canonical index of ref[xp]
            if xp >= 0:
                xp = min(xp, 2 * n)
                return c + xp if vertical else c - xp
            inv = intra_inv_angle(mode)
            d = (xp * inv + 128) >> 8
            return c - d if vertical else c + d

        for y in range(n):
            for x in range(n):
                p = y * n + x
                u, v = (y, x) if vertical else (x, y)
                i = ((u + 1) * a) >> 5
                f = ((u + 1) * a) & 31
                w[mode, p, refcan(v + i + 1)] += 32 - f
                if f:
                    w[mode, p, refcan(v + i + 2)] += f

    return {
        "w": w, "use_filt": use_filt, "rnd": rnd, "shift": shift,
    }


def filter_refs_batch(r: jnp.ndarray) -> jnp.ndarray:
    """[1 2 1]/4 smoothing over (B, 4N+1) canonical refs (8.4.4.2.3)."""
    mid = (r[:, :-2] + 2 * r[:, 1:-1] + r[:, 2:] + 2) >> 2
    return jnp.concatenate([r[:, :1], mid, r[:, -1:]], axis=1)


def _exact_w_matmul(w: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(M, P, K) int weights x (B, K) refs -> (B, M, P) int32, exact.

    Weights <= 32 are bf16-exact; refs <= 1023 for 10-bit. Products sum
    over K <= 129 entries of <= 32*1023 -> < 2^22 per 128 accumulated
    terms... worst case DC at n=32: 64 taps * 32?? DC taps weight 1 ->
    64*1023 ~ 2^16. Planar: 4 taps * 32 * 1023 ~ 2^17. Safe < 2^24.
    """
    wf = w.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    out = jnp.einsum("mpk,bk->bmp", wf, rf, preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def intra_pred_all_modes(refs: jnp.ndarray, n: int, *, is_luma: bool = True,
                         bit_depth: int = 8) -> jnp.ndarray:
    """All 35 intra predictions for a batch of blocks.

    refs: (B, 4N+1) int32 canonical (already substituted) references.
    Returns (B, 35, N, N) int32 predictions (spec-exact incl. fixups).
    """
    tabs = build_intra_tables(n)
    w = jnp.asarray(tabs["w"])
    rnd = jnp.asarray(tabs["rnd"])[None, :, None]
    shift = jnp.asarray(tabs["shift"])[None, :, None]
    use_filt = jnp.asarray(tabs["use_filt"].astype(np.int32))[None, :, None]

    if is_luma:
        rfilt = filter_refs_batch(refs)
        acc_u = _exact_w_matmul(w, refs)
        acc_f = _exact_w_matmul(w, rfilt)
        acc = jnp.where(use_filt == 1, acc_f, acc_u)
    else:
        acc = _exact_w_matmul(w, refs)

    pred = (acc + rnd) >> shift            # (B, 35, N*N)
    b = refs.shape[0]
    pred = pred.reshape(b, 35, n, n)
    maxval = (1 << bit_depth) - 1

    if is_luma and n < 32:
        c = 2 * n
        # unfiltered ref pieces
        l_col = refs[:, c - 1:c - 1 - n:-1]        # L[0..n-1], (B, n)
        t_row = refs[:, c + 1:c + 1 + n]           # T[0..n-1]
        corner = refs[:, c]
        # DC boundary filter (8.4.4.2.5)
        dc = pred[:, 1, n - 1, n - 1]
        row0 = (t_row + 3 * dc[:, None] + 2) >> 2
        col0 = (l_col + 3 * dc[:, None] + 2) >> 2
        p00 = (l_col[:, 0] + 2 * dc + t_row[:, 0] + 2) >> 2
        dcp = pred[:, 1]
        dcp = dcp.at[:, 0, :].set(row0)
        dcp = dcp.at[:, :, 0].set(col0)
        dcp = dcp.at[:, 0, 0].set(p00)
        pred = pred.at[:, 1].set(dcp)
        # mode 10 (horizontal): first row; mode 26 (vertical): first col
        h_row = jnp.clip(l_col[:, :1] + ((t_row - corner[:, None]) >> 1), 0, maxval)
        v_col = jnp.clip(t_row[:, :1] + ((l_col - corner[:, None]) >> 1), 0, maxval)
        pred = pred.at[:, 10, 0, :].set(h_row)
        pred = pred.at[:, 26, :, 0].set(v_col)

    return jnp.clip(pred, 0, maxval)


def intra_pred_single_mode(refs: jnp.ndarray, modes: jnp.ndarray, n: int, *,
                           is_luma: bool = True, bit_depth: int = 8) -> jnp.ndarray:
    """Predict one chosen mode per block (for the reconstruction pass).

    refs: (B, 4N+1) int32; modes: (B,) int32. Returns (B, N, N) int32.
    """
    tabs = build_intra_tables(n)
    w_all = jnp.asarray(tabs["w"])                     # (35, P, K)
    rnd = jnp.asarray(tabs["rnd"])[modes][:, None]     # (B,1)
    shift = jnp.asarray(tabs["shift"])[modes][:, None]
    use_filt = jnp.asarray(tabs["use_filt"].astype(np.int32))[modes]

    w = w_all[modes]                                   # (B, P, K)
    src = refs
    if is_luma:
        rfilt = filter_refs_batch(refs)
        src = jnp.where((use_filt == 1)[:, None], rfilt, refs)
    acc = jnp.einsum("bpk,bk->bp", w.astype(jnp.float32),
                     src.astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    pred = (acc + rnd) >> shift
    b = refs.shape[0]
    pred = pred.reshape(b, n, n)
    maxval = (1 << bit_depth) - 1

    if is_luma and n < 32:
        c = 2 * n
        l_col = refs[:, c - 1:c - 1 - n:-1]
        t_row = refs[:, c + 1:c + 1 + n]
        corner = refs[:, c]
        is_dc = (modes == 1)[:, None]
        dc = pred[:, n - 1, n - 1]
        row0 = jnp.where(is_dc, (t_row + 3 * dc[:, None] + 2) >> 2, pred[:, 0, :])
        col0 = jnp.where(is_dc, (l_col + 3 * dc[:, None] + 2) >> 2, pred[:, :, 0])
        p00 = jnp.where(modes == 1,
                        (l_col[:, 0] + 2 * dc + t_row[:, 0] + 2) >> 2,
                        pred[:, 0, 0])
        ish = (modes == 10)[:, None]
        isv = (modes == 26)[:, None]
        h_row = jnp.clip(l_col[:, :1] + ((t_row - corner[:, None]) >> 1), 0, maxval)
        v_col = jnp.clip(t_row[:, :1] + ((l_col - corner[:, None]) >> 1), 0, maxval)
        row0 = jnp.where(ish, h_row, row0)
        col0 = jnp.where(isv, v_col, col0)
        pred = pred.at[:, 0, :].set(row0)
        pred = pred.at[:, :, 0].set(col0)
        pred = pred.at[:, 0, 0].set(jnp.where(ish[:, 0], h_row[:, 0],
                                    jnp.where(isv[:, 0], v_col[:, 0], p00)))
    return jnp.clip(pred, 0, maxval)
