"""Frame-type decisions: keyint and scene-cut IDR insertion."""

import numpy as np

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc.lookahead import Lookahead


def _noise(seed, lo=0, hi=256):
    return np.random.default_rng(seed).integers(lo, hi, (64, 96)) \
        .astype(np.uint8)


def test_keyint_schedule():
    cfg = EncoderConfig(width=96, height=64, keyint=4)
    la = Lookahead(cfg)
    base = _noise(1)
    types = []
    for i in range(9):
        # tiny luma drift: clearly inter-predictable
        f = np.clip(base.astype(np.int32) + i, 0, 255).astype(np.uint8)
        types.append(la.decide(f))
    assert types == ["I", "P", "P", "P", "I", "P", "P", "P", "I"]


def _textured(seed):
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 50, (64, 96))
    k = np.ones(9) / 9.0
    for axis in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, img)
    return np.clip(img * 6 + 128, 0, 255).astype(np.uint8)


def test_scenecut_forces_idr():
    cfg = EncoderConfig(width=96, height=64, keyint=250)
    la = Lookahead(cfg)
    a, b = _textured(2), _textured(3)   # unrelated scenes
    assert la.decide(a) == "I"
    assert la.decide(np.clip(a.astype(np.int32) + 2, 0, 255)
                     .astype(np.uint8)) == "P"
    assert la.decide(b) == "I"          # hard cut detected
