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
    SCENECUT_BIAS = 0.4    # inter/intra cost ratio above which we cut

    def __init__(self, cfg: EncoderConfig) -> None:
        self.cfg = cfg
        self.keyint = max(cfg.keyint, 1)
        self.since_idr = 0
        self.prev_half: np.ndarray | None = None

    @staticmethod
    def _half(y: np.ndarray) -> np.ndarray:
        return y[::2, ::2].astype(np.int32)

    @staticmethod
    def _intra_energy(h: np.ndarray) -> float:
        """Half-res gradient energy: the lowres intra-cost proxy."""
        gx = np.abs(np.diff(h, axis=1)).sum()
        gy = np.abs(np.diff(h, axis=0)).sum()
        return float(gx + gy) + 1.0

    def decide(self, y: np.ndarray) -> str:
        """Returns 'I' or 'P' for the next frame, updating state."""
        h = self._half(np.asarray(y))
        prev = self.prev_half
        self.prev_half = h
        if prev is None or self.since_idr >= self.keyint - 1:
            self.since_idr = 0
            return "I"
        inter = float(np.abs(h - prev).sum())
        intra = self._intra_energy(h)
        if inter > self.SCENECUT_BIAS * intra:
            self.since_idr = 0
            return "I"
        self.since_idr += 1
        return "P"
