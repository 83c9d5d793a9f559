"""Weighted prediction (P slices): formula identities, analysis, and
end-to-end conformance on a fade."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from x265_tpu.common.params import EncoderConfig  # noqa: E402
from x265_tpu.enc.weightp import (WeightParams, analyse_weights,  # noqa: E402
                                  analyse_gop_weights, WP_DENOM)
from x265_tpu.ops.me_win import (apply_weight_acc,  # noqa: E402
                                 apply_weight_fullpel)


def test_neutral_weight_equals_default_rounding():
    """w = 2^denom, o = 0 must reproduce the default uni-pred rounding
    EXACTLY (the nested-floor identity the whole design leans on)."""
    rng = np.random.default_rng(3)
    for bd in (8, 10):
        total_shift = 12 - (bd - 8)
        raw = jnp.asarray(rng.integers(-(1 << 22), 1 << 22, (512,)))
        neutral = apply_weight_acc(raw, 1 << WP_DENOM, 0, WP_DENOM, bd)
        default = jnp.clip((raw + (1 << (total_shift - 1))) >> total_shift,
                           0, (1 << bd) - 1)
        assert np.array_equal(np.asarray(neutral), np.asarray(default))


def test_fullpel_weight_matches_acc_weight():
    """Weighting full-pel samples directly == weighting their raw
    accumulator (s << total_shift)."""
    rng = np.random.default_rng(4)
    for bd in (8, 10):
        s = jnp.asarray(rng.integers(0, 1 << bd, (256,)))
        total_shift = 12 - (bd - 8)
        for w, o in ((80, -10), (40, 30), (64, 0), (100, 5)):
            a = apply_weight_fullpel(s, w, o, WP_DENOM, bd)
            b = apply_weight_acc(s << total_shift, w, o, WP_DENOM, bd)
            assert np.array_equal(np.asarray(a), np.asarray(b)), (w, o)


def test_analysis_detects_fade_and_ignores_static():
    rng = np.random.default_rng(5)
    base = rng.integers(40, 220, (64, 64)).astype(np.int32)
    c = np.full((32, 32), 128, np.uint8)
    bright = np.clip(base, 0, 255).astype(np.uint8)
    dark = np.clip(base * 0.6, 0, 255).astype(np.uint8)
    wp = analyse_weights((dark, c, c), (bright, c, c), 8)
    assert wp.luma_on
    assert wp.wy < (1 << WP_DENOM)           # darkening fade -> w < 1.0
    wp2 = analyse_weights((bright, c, c), (bright, c, c), 8)
    assert not wp2.luma_on and not wp2.chroma_on


def test_gop_weights_chaining():
    rng = np.random.default_rng(6)
    base = rng.integers(60, 200, (64, 64)).astype(np.float64)
    c = np.full((32, 32), 128, np.uint8)
    frames = [(np.clip(base * (1.0 - 0.15 * k), 0, 255).astype(np.uint8),
               c, c) for k in range(1, 4)]
    ref = (np.clip(base, 0, 255).astype(np.uint8), c, c)
    wps = analyse_gop_weights(frames, ref, 8)
    assert all(wp.luma_on for wp in wps)     # every step is a fade


def test_fade_e2e_decode_and_bits():
    """IPPP over a fade: weightp stream must decode bit-exact against
    the encoder recon and spend fewer bits than weightp=off."""
    from x265_tpu.enc import IntraEncoder
    from x265_tpu.decoder import decode_annexb
    rng = np.random.default_rng(7)
    h, w = 64, 64
    gy, gx = np.mgrid[0:h + 8, 0:w + 8]
    base = ((gx * 5 + gy * 3) % 200 + 28 +
            rng.integers(-8, 8, (h + 8, w + 8))).astype(np.float64)
    frames = []
    for k in range(4):
        scale = 1.0 - 0.18 * k
        y = np.clip(base[k:k + h, k:k + w] * scale, 0, 255) \
            .astype(np.uint8)
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append((y, cb, cr))

    def run(weightp):
        cfg = EncoderConfig(width=w, height=h, qp=30, deblock=True,
                            weightp=weightp)
        enc = IntraEncoder(cfg)
        r0 = enc.encode_frame(*frames[0])
        enc.ref = r0.recon
        enc.poc = 0
        rs = enc.encode_pgop(frames[1:])
        stream = r0.bitstream + b"".join(r.bitstream for r in rs)
        return stream, [r0] + rs

    stream_w, res_w = run(True)
    stream_u, res_u = run(False)
    dec = decode_annexb(stream_w)
    assert len(dec) == 4
    for d, r in zip(dec, res_w):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)
    p_bits_w = sum(r.bits for r in res_w[1:])
    p_bits_u = sum(r.bits for r in res_u[1:])
    assert p_bits_w < p_bits_u, (p_bits_w, p_bits_u)


def test_neutral_weightp_stream_matches_recon():
    """Static content: weightp on -> neutral weights; decode must still
    be bit-exact (table present, inferred weights)."""
    from x265_tpu.enc import IntraEncoder
    from x265_tpu.decoder import decode_annexb
    rng = np.random.default_rng(8)
    h, w = 64, 64
    gy, gx = np.mgrid[0:h, 0:w]
    y0 = ((gx * 3 + gy * 2) % 256).astype(np.int32)
    y0 = np.clip(y0 + rng.integers(-6, 6, (h, w)), 0, 255).astype(np.uint8)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    frames = [(np.roll(y0, k, axis=1), c, c) for k in range(3)]
    cfg = EncoderConfig(width=w, height=h, qp=32, weightp=True)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    for d, r in zip(dec, [r0] + rs):
        assert np.array_equal(d.y, r.recon.y)
