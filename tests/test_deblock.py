"""Deblocking filter: JAX batched version vs numpy spec oracle, and the
end-to-end contract with deblock enabled."""

import numpy as np
import jax.numpy as jnp
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.common.tables import chroma_qp
from x265_tpu.ops.deblock import (deblock_frame, deblock_frame_np,
                                  deblock_luma, deblock_luma_np,
                                  deblock_chroma, deblock_chroma_np,
                                  edge_masks_from_depth)
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb

from test_intra_e2e import synth_frame


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_luma_jax_vs_oracle(qp):
    rng = np.random.default_rng(qp)
    h, w = 64, 96
    plane = rng.integers(0, 256, (h, w)).astype(np.int32)
    # mixed depth map -> mixed CU sizes
    depth8 = rng.integers(0, 3, (h // 8, w // 8)).astype(np.uint8)
    # legalize: make each 32-block's depths consistent quadtree choices
    for i in range(0, h // 8, 4):
        for j in range(0, w // 8, 4):
            d = depth8[i:i + 4, j:j + 4]
            if (d == 0).any():
                d[:] = 0 if rng.random() < 0.5 else np.maximum(d, 1)
            depth8[i:i + 4, j:j + 4] = d
    vm, hm = edge_masks_from_depth(depth8, 32)
    ref = deblock_luma_np(plane, vm * 2, hm * 2, qp)
    out = np.asarray(deblock_luma(jnp.asarray(plane), vm * 2, hm * 2, qp))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("qp", [25, 37])
def test_chroma_jax_vs_oracle(qp):
    rng = np.random.default_rng(qp + 1)
    h, w = 64, 96     # luma dims
    plane = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    depth8 = rng.integers(1, 3, (h // 8, w // 8)).astype(np.uint8)
    vm, hm = edge_masks_from_depth(depth8, 32)
    qpc = chroma_qp(qp)
    ref = deblock_chroma_np(plane, vm, hm, qpc)
    out = np.asarray(deblock_chroma(jnp.asarray(plane), vm, hm, qpc))
    np.testing.assert_array_equal(out, ref)


def test_e2e_with_deblock():
    """Decoder (independent oracle path) must match encoder recon with
    in-loop deblocking enabled and signalled in the PPS."""
    w, h, qp = 64, 64, 30
    cfg = EncoderConfig(width=w, height=h, qp=qp, deblock=True)
    enc = IntraEncoder(cfg)
    y, cb, cr = synth_frame(w, h, seed=9)
    res = enc.encode_frame(y, cb, cr)
    dec = decode_annexb(res.bitstream)[0]
    np.testing.assert_array_equal(dec.y, res.recon.y)
    np.testing.assert_array_equal(dec.cb, res.recon.cb)
    np.testing.assert_array_equal(dec.cr, res.recon.cr)


def test_deblock_changes_pixels():
    """Sanity: the filter actually fires on blocky content."""
    w = h = 64
    plane = np.zeros((h, w), dtype=np.int32)
    plane[:, 32:] = 40     # sharp CU-aligned step
    depth8 = np.zeros((8, 8), dtype=np.uint8)
    vm, hm = edge_masks_from_depth(depth8, 32)
    out = deblock_luma_np(plane, vm * 2, hm * 2, qp=37)
    assert (out != plane).any()
