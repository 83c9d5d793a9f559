"""Merge and AMVP candidate derivation (H.265 clauses 8.5.3.2.3-8.5.3.2.7).

Scope: P slices, single reference (refIdx 0), 2Nx2N PUs, no temporal
MVP (SPS signals sps_temporal_mvp_enabled_flag = 0), so no scaling and
no collocated storage. Reference behavior: x265
source/common/cudata.cpp getInterMergeCandidates/getNeighbourMV.

The MV field is stored per 8x8 cell (mv8: (n8y, n8x, 2), qpel); a cell
is "coded" if its block precedes the current CU in z-scan decode order.
Both the encoder syntax writer and (independently re-implemented) the
validation decoder derive candidates from their own decoded MV fields,
which are identical by construction.
"""

from __future__ import annotations

import numpy as np


def z_available(nx: int, ny: int, cux: int, cuy: int, w: int, h: int,
                log2_ctu: int) -> bool:
    """Is the min-block containing pixel (nx, ny) decoded before the CU
    at (cux, cuy)? (clause 6.4.1 z-scan availability, single slice)."""
    if nx < 0 or ny < 0 or nx >= w or ny >= h:
        return False
    tnx, tny = nx >> log2_ctu, ny >> log2_ctu
    tcx, tcy = cux >> log2_ctu, cuy >> log2_ctu
    if (tny, tnx) < (tcy, tcx):
        return True
    if (tny, tnx) > (tcy, tcx):
        return False
    # same CTU: compare z indices of the 8x8 cells
    return _z8(nx, ny, log2_ctu) < _z8(cux, cuy, log2_ctu)


def _z8(x: int, y: int, log2_ctu: int) -> int:
    """z index of the 8x8 cell containing (x, y) within its CTU."""
    bx = (x & ((1 << log2_ctu) - 1)) >> 3
    by = (y & ((1 << log2_ctu) - 1)) >> 3
    z = 0
    for b in range(log2_ctu - 3):
        z |= ((bx >> b) & 1) << (2 * b)
        z |= ((by >> b) & 1) << (2 * b + 1)
    return z


class MvField:
    """Per-8x8-cell motion info for one frame (P slice, L0, ref 0)."""

    def __init__(self, n8y: int, n8x: int) -> None:
        self.mv = np.zeros((n8y, n8x, 2), dtype=np.int32)
        self.is_inter = np.zeros((n8y, n8x), dtype=bool)

    def set_cu(self, x0: int, y0: int, size: int, mv: tuple[int, int],
               inter: bool = True) -> None:
        s = size >> 3
        self.mv[y0 >> 3:(y0 >> 3) + s, x0 >> 3:(x0 >> 3) + s] = mv
        self.is_inter[y0 >> 3:(y0 >> 3) + s, x0 >> 3:(x0 >> 3) + s] = inter

    def at(self, x: int, y: int) -> tuple[bool, tuple[int, int]]:
        cy, cx = y >> 3, x >> 3
        return (bool(self.is_inter[cy, cx]),
                (int(self.mv[cy, cx, 0]), int(self.mv[cy, cx, 1])))


def merge_candidates(field: MvField, x0: int, y0: int, size: int, w: int,
                     h: int, log2_ctu: int, max_cands: int = 2
                     ) -> list[tuple[int, int]]:
    """Spatial merge candidate list for a 2Nx2N PU (8.5.3.2.3), padded
    with zero candidates to max_cands."""
    n = size

    def get(nx, ny):
        if not z_available(nx, ny, x0, y0, w, h, log2_ctu):
            return None
        inter, mv = field.at(nx, ny)
        return mv if inter else None

    a1 = get(x0 - 1, y0 + n - 1)
    b1 = get(x0 + n - 1, y0 - 1)
    b0 = get(x0 + n, y0 - 1)
    a0 = get(x0 - 1, y0 + n)
    cands: list[tuple[int, int]] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    if len(cands) < 4:
        b2 = get(x0 - 1, y0 - 1)
        if b2 is not None and b2 != a1 and b2 != b1:
            cands.append(b2)
    cands = cands[:max_cands]
    while len(cands) < max_cands:
        cands.append((0, 0))
    return cands


def amvp_candidates(field: MvField, x0: int, y0: int, size: int, w: int,
                    h: int, log2_ctu: int) -> list[tuple[int, int]]:
    """AMVP predictor list (8.5.3.2.6): two entries.

    Same-reference, no-scaling case: mvpA = first available of A0, A1;
    mvpB = first available of B0, B1, B2; duplicate B dropped; zero
    fill."""
    n = size

    def get(nx, ny):
        if not z_available(nx, ny, x0, y0, w, h, log2_ctu):
            return None
        inter, mv = field.at(nx, ny)
        return mv if inter else None

    a = get(x0 - 1, y0 + n)
    if a is None:
        a = get(x0 - 1, y0 + n - 1)
    b = get(x0 + n, y0 - 1)
    if b is None:
        b = get(x0 + n - 1, y0 - 1)
    if b is None:
        b = get(x0 - 1, y0 - 1)
    cands: list[tuple[int, int]] = []
    if a is not None:
        cands.append(a)
    if b is not None and b != a:
        cands.append(b)
    while len(cands) < 2:
        cands.append((0, 0))
    return cands[:2]
