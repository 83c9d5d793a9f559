"""End-to-end IPPP conformance: P-slice streams decode bit-exactly."""

import numpy as np
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb


def moving_sequence(w, h, n_frames, seed=4):
    """Textured background with a moving foreground square."""
    rng = np.random.default_rng(seed)
    bg = rng.normal(0, 50, (h + 64, w + 64))
    k = np.ones(7) / 7.0
    for axis in (0, 1):
        bg = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, bg)
    bg = np.clip(bg * 6 + 128, 0, 255)
    frames = []
    for t in range(n_frames):
        ox, oy = 8 + 3 * t, 12 + 2 * t     # global pan
        y = bg[oy:oy + h, ox:ox + w].copy()
        fx, fy = 10 + 5 * t, 20 + t        # moving square
        y[fy:fy + 16, fx:fx + 16] = 60 + 10 * t
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y.astype(np.uint8), cb, cr))
    return frames


@pytest.mark.parametrize("deblock", [False, True])
def test_ippp_roundtrip(deblock):
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, deblock=deblock)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 4)
    results = enc.encode_sequence(frames)
    stream = b"".join(r.bitstream for r in results)
    decs = decode_annexb(stream)
    assert len(decs) == 4
    for i, (d, r) in enumerate(zip(decs, results)):
        np.testing.assert_array_equal(d.y, r.recon.y, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(d.cb, r.recon.cb, err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(d.cr, r.recon.cr, err_msg=f"frame {i} cr")


def test_p_frames_cheaper_than_intra():
    """P frames on coherent motion must cost far fewer bits than the
    IDR frame (the whole point of the inter path)."""
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 3, seed=8)
    results = enc.encode_sequence(frames)
    i_bits = results[0].bits
    p_bits = [r.bits for r in results[1:]]
    assert max(p_bits) < i_bits * 0.6, (i_bits, p_bits)


def test_p_quality():
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=26)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(w, h, 3, seed=5)
    results = enc.encode_sequence(frames)
    for i, r in enumerate(results):
        src = frames[i][0].astype(np.float64)
        mse = float(np.mean((r.recon.y - src) ** 2))
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
        assert psnr > 34.0, f"frame {i}: {psnr:.2f} dB"
