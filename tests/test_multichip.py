"""Production multi-chip: GOP chains sharded over an 8-device CPU mesh
must produce BIT-IDENTICAL decisions/coefficients to single-device
encoding of each chain (the determinism contract of
doc/reST/threading.rst:178-191 recast for mesh sharding)."""

import numpy as np
import pytest
import jax

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder


def _chain(h, w, nf, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * (3 + seed % 3) + yy * 2) % 200 + 25).astype(np.int32)
    frames = []
    for i in range(nf):
        y = np.clip(np.roll(base, i * 2, axis=1) +
                    rng.integers(-6, 6, (h, w)), 0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 120 + seed, np.uint8)
        cr = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, cb, cr))
    return frames


@pytest.mark.slow
def test_sharded_chains_bit_identical():
    n_dev = 8
    if jax.device_count() < n_dev:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    from x265_tpu.parallel import encode_chains_sharded, make_gop_mesh
    h, w = 64, 64
    nf = 2
    cfg = EncoderConfig(width=w, height=h, qp=30, deblock=True, sao=True)
    mesh = make_gop_mesh(n_dev)

    # per-chain I frames as initial references + P chains
    chains = []
    ref_planes = []
    seq_streams = []
    for ci in range(n_dev):
        frames = _chain(h, w, nf + 1, seed=ci)
        enc = IntraEncoder(cfg)
        r0 = enc.encode_frame(*frames[0])
        enc.ref = r0.recon
        enc.poc = 0
        rs = enc.encode_pgop(frames[1:])      # single-device reference
        seq_streams.append([r.bitstream for r in rs])
        chains.append((frames[1:], r0.recon))
        ref_planes.append(r0.recon)

    from x265_tpu.parallel.gop_sharding import encode_chains
    out, total_rate = encode_chains(chains, cfg, mesh=mesh)
    assert total_rate > 0

    # re-run CABAC on the sharded outputs; must equal the sequential
    # per-chain bitstreams byte for byte
    from x265_tpu.bitstream.ctx_tables import init_states
    from x265_tpu.bitstream.headers import write_slice_header
    from x265_tpu.common.params import P_SLICE
    from x265_tpu.native.entropy_native import encode_slice_native
    for ci, (syns, recons) in enumerate(out):
        for i, syn in enumerate(syns):
            sw = write_slice_header(cfg, P_SLICE, idr=False, poc=i + 1,
                                    ref_delta_poc=1,
                                    max_merge=syn.max_merge,
                                    slice_qp=cfg.qp)
            payload, tv, tb = encode_slice_native(
                1, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
                cfg.log2_min_cu, init_states(P_SLICE, cfg.qp),
                mv8=syn.mv8, max_merge=syn.max_merge,
                sign_hiding=cfg.sign_hiding, sao_params=syn.sao_params,
                intra8=syn.intra8, mode8=syn.mode8,
                tusplit8=getattr(syn, "tusplit8", None),
                rqt_inter=cfg.rqt_inter)
            sw.write_bytes(payload)
            if tb:
                sw.write(tv, tb)
            sw.align_one()
            from x265_tpu.bitstream.nal import NalUnitType, annexb_stream
            stream = annexb_stream([(NalUnitType.TRAIL_R, sw.get_bytes())])
            assert stream == seq_streams[ci][i], \
                f"chain {ci} frame {i}: sharded != single-device"
