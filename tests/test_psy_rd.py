"""psy-rd: AC-energy preservation term in the leaf RDO (x265
rdcost.h:30 calcPsyRdCost; psy_cost_pp = SA8D minus DC). Contract:
streams stay conformant and textured content keeps more AC energy
(at more bits) than with psy off."""

import numpy as np

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder


def _textured(nf=3, h=64, w=96, seed=13):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.integers(-24, 24, (h, w))          # static grain
    base = ((xx * 2 + yy) % 200 + 20).astype(np.int32)
    out = []
    for i in range(nf):
        y = np.clip(np.roll(base + tex, 2 * i, axis=1), 0, 255) \
            .astype(np.uint8)
        c = np.full((h // 2, w // 2), 128, np.uint8)
        out.append((y, c, c))
    return out


def _encode(psy):
    frames = _textured()
    cfg = EncoderConfig(width=96, height=64, qp=37, deblock=True,
                        psy_rd=psy)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0], use_device_recon=True)
    enc.ref = r0.device_ref if r0.device_ref is not None else r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    bs = r0.bitstream + b"".join(r.bitstream for r in rs)
    return bs, [r0] + list(rs), frames


def _ac_energy(y):
    from x265_tpu.ops.satd import sa8d_np
    e = 0
    for by in range(y.shape[0] // 8):
        for bx in range(y.shape[1] // 8):
            b = y[by*8:by*8+8, bx*8:bx*8+8].astype(np.int64)
            e += sa8d_np(b, np.zeros_like(b)) - \
                (abs(int(b.sum())) >> 2)
    return e


def test_psy_rd_roundtrip_and_energy():
    bs_off, rs_off, frames = _encode(0.0)
    bs_on, rs_on, _ = _encode(2.0)
    dec = decode_annexb(bs_on)
    for d, r in zip(dec, rs_on):
        assert np.array_equal(d.y, r.recon.y)
        assert np.array_equal(d.cb, r.recon.cb)
        assert np.array_equal(d.cr, r.recon.cr)
    # decisions actually moved
    assert bs_on != bs_off
    # psy keeps at least as much AC energy in the P frames
    e_on = sum(_ac_energy(np.asarray(r.recon.y)) for r in rs_on[1:])
    e_off = sum(_ac_energy(np.asarray(r.recon.y)) for r in rs_off[1:])
    assert e_on >= e_off
