"""Frame-type decision: keyint + scene-cut detection (lookahead-lite).

Reference behavior: x265 source/encoder/slicetype.cpp scenecut
detection (:2229) compares the inter cost of a frame against its intra
cost — a frame whose best inter prediction is nearly as expensive as
coding it intra marks a scene change and forces an IDR. The full
lowres-ME lookahead with B-adapt trellis and cuTree (slicetype.cpp
:1405-2939) lands with the B-frame work; this module provides the
minimal decision pipeline the IPPP path needs.
"""

from __future__ import annotations

import numpy as np

from ..common.params import EncoderConfig


class Lookahead:
    # cut when inter cost exceeds (1 - scenecut/100) * intra cost;
    # x265 default --scenecut 40 -> factor 0.6 (slicetype.cpp:2229)
    SCENECUT_BIAS = 0.6

    def __init__(self, cfg: EncoderConfig) -> None:
        self.cfg = cfg
        self.keyint = max(cfg.keyint, 1)
        self.since_idr = 0
        self.prev_half: np.ndarray | None = None

    @staticmethod
    def _half(y: np.ndarray) -> np.ndarray:
        f = 4 if min(y.shape) >= 480 else 2
        return y[::f, ::f].astype(np.int32)

    @staticmethod
    def _intra_energy(h: np.ndarray) -> float:
        """Lowres gradient energy: the lowres intra-cost proxy."""
        gx = np.abs(np.diff(h, axis=1)).sum()
        gy = np.abs(np.diff(h, axis=0)).sum()
        return float(gx + gy) + 1.0

    @staticmethod
    def _inter_cost(h: np.ndarray, prev: np.ndarray) -> float:
        """Global-motion-compensated lowres SAD (the lookahead inter-cost
        proxy; x265 uses per-block lowres ME, slicetype.cpp:3216)."""
        best = np.inf
        hh, ww = h.shape
        for dy in (-4, -2, -1, 0, 1, 2, 4):
            for dx in (-4, -2, -1, 0, 1, 2, 4):
                c = h[max(dy, 0):hh + min(dy, 0), max(dx, 0):ww + min(dx, 0)]
                p = prev[max(-dy, 0):hh + min(-dy, 0),
                         max(-dx, 0):ww + min(-dx, 0)]
                sad = float(np.abs(c - p).mean())
                if sad < best:
                    best = sad
        return best * h.size

    def decide(self, y: np.ndarray) -> str:
        """Returns 'I' or 'P' for the next frame, updating state."""
        h = self._half(np.asarray(y))
        prev = self.prev_half
        self.prev_half = h
        if prev is None or self.since_idr >= self.keyint - 1:
            self.since_idr = 0
            return "I"
        inter = self._inter_cost(h, prev)
        intra = self._intra_energy(h)
        if inter > self.SCENECUT_BIAS * intra:
            self.since_idr = 0
            return "I"
        self.since_idr += 1
        return "P"
