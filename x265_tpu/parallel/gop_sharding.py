"""GOP-chain sharding over a device mesh — the production multi-chip path.

The x265 scale-out analog (SURVEY.md §2.5: frame pipeline / chunk
parallelism; doc/reST/threading.rst:123-215): independent IPPP chains
(separate keyint segments, or separate jobs of an ABR ladder) have no
cross-chain data dependency, so they shard perfectly across a mesh —
each device runs the COMPLETE fused P-GOP scan (enc/pgop_tpu._pgop_scan,
ME + leaf RDO + recon + in-loop filters) on its own chain, and a
rate-control all-reduce (`psum`, the rateControlStart serialization
analog, ratecontrol.cpp:1248) rides the ICI. Host CABAC then runs per
chain on the downloaded coefficients.

Determinism contract (threading.rst:178-191 analog): the sharded
bitstreams are BIT-IDENTICAL to encoding each chain on one device —
asserted in tests/test_multichip.py on an 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..common.params import EncoderConfig
from ..common.tables import chroma_qp
from ..enc.pgop_tpu import _pgop_scan


def make_gop_mesh(n_devices: int) -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    return Mesh(devices, axis_names=("gop",))


def encode_chains_sharded(oy: np.ndarray, ocb: np.ndarray,
                          ocr: np.ndarray, ref_y: np.ndarray,
                          ref_cb: np.ndarray, ref_cr: np.ndarray,
                          cfg: EncoderConfig, qp: int, mesh: Mesh,
                          me_range: int = 6):
    """Encode C independent P-chains, one per mesh device.

    oy/ocb/ocr: (C, F, Hp, Wp) uint planes padded to 32-multiples;
    ref_*: (C, Hp, Wp) initial references (each chain's I recon).
    Returns the per-chain stacked production outputs (depth8, mv8,
    coeff planes, SAO params, recon, final refs) plus the cross-mesh
    rate proxy from the RC all-reduce.
    """
    c, f, hp, wp = oy.shape
    n_dev = mesh.devices.size
    assert c == n_dev, "one chain per device (chunk parallelism unit)"
    qpc = chroma_qp(qp)
    real_h = cfg.height_padded
    real_w = cfg.width_padded

    def shard_body(ry, rcb, rcr, y, cb, cr):
        # local shapes: (1, ...) — one chain on this device
        qmaps = jnp.zeros((f, hp // cfg.ctu_size, wp // cfg.ctu_size),
                          jnp.int32)
        seeds = jnp.zeros((f, hp // 16, wp // 16, 2), jnp.int32)
        res, final_ref = _pgop_scan(
            ry[0], rcb[0], rcr[0], y[0], cb[0], cr[0], qmaps, seeds,
            qp=int(qp), qpc=int(qpc), bit_depth=cfg.bit_depth,
            real_h=real_h, real_w=real_w, ctu=cfg.ctu_size,
            deblock=cfg.deblock, sao=cfg.sao,
            sign_hiding=cfg.sign_hiding, me_range=me_range,
            need_recon=True, psy_rd=float(cfg.psy_rd),
            rqt=bool(getattr(cfg, "rqt_inter", False)))
        # rate-control all-reduce across the GOP mesh (ICI collective,
        # the rateControlStart serialization analog,
        # ratecontrol.cpp:1248): each device estimates its chain's
        # coded BITS with the CABAC-calibrated model the RD decisions
        # use (common/bit_calib.py), and the psum gives the fleet
        # total that the shared rate controller consumes
        from ..common.bit_calib import calib_for_qp
        a_, b_, c_ = (float(v) for v in calib_for_qp(int(qp))[:3])

        def est_bits(cf):
            a = jnp.abs(cf.astype(jnp.int32))
            nnz = jnp.sum((a > 0).astype(jnp.float32))
            f32 = a.astype(jnp.float32)
            e = (jax.lax.bitcast_convert_type(f32, jnp.int32) >> 23) \
                - 127
            slog = jnp.sum(jnp.where(a > 0, e + 1, 0)
                           .astype(jnp.float32))
            h2, w2 = cf.shape
            coded = jnp.sum(jnp.any(
                (cf != 0).reshape(h2 // 8, 8, w2 // 8, 8),
                axis=(1, 3)).astype(jnp.float32))
            return a_ * nnz + b_ * slog + c_ * coded

        rate = est_bits(res[2]) + est_bits(res[3])
        total_rate = jax.lax.psum(rate, axis_name="gop")
        # final_ref planes carry the R reference slots; slot 0 is the
        # most recent recon (the chaining contract)
        out = tuple(r[None] for r in res) + \
            tuple(p[0][None] for p in final_ref) + \
            (rate[None] if rate.ndim else rate.reshape(1),
             total_rate)
        return out

    n_out = 11 + 3 + 1  # res + final_ref triple + per-chain rate
    # check_rep off: the body is fully per-device (no cross-chain data
    # flow except the final psum), but its internal fori_loop carries
    # are built from constants the replication analysis rejects
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("gop"), P("gop"), P("gop"),
                  P("gop"), P("gop"), P("gop")),
        out_specs=tuple([P("gop")] * n_out) + (P(),),
        check_rep=False)

    with mesh:
        outs = jax.jit(sharded)(
            jnp.asarray(ref_y), jnp.asarray(ref_cb), jnp.asarray(ref_cr),
            jnp.asarray(oy), jnp.asarray(ocb), jnp.asarray(ocr))
        jax.block_until_ready(outs)
    res = outs[:11]
    final_ref = outs[11:14]
    chain_rates = np.asarray(outs[14]).reshape(-1)
    total_rate = float(outs[15])
    return res, final_ref, total_rate, chain_rates


def encode_chains(chains, cfg: EncoderConfig, qp: int | None = None,
                  mesh: Mesh | None = None):
    """High-level helper: chains = list of (frames, ref ReconFrame)
    where frames is a list of (y, cb, cr) display P frames. Encodes all
    chains sharded over the mesh and returns per-chain FramePSyntax
    lists + recon lists (same contract as enc.pgop_tpu.encode_pgop_tpu)."""
    from ..bitstream.syntax import FramePSyntax
    from ..enc.intra_recon import ReconFrame
    qp = cfg.qp if qp is None else qp
    c = len(chains)
    if mesh is None:
        mesh = make_gop_mesh(c)
    f = len(chains[0][0])
    h, w = cfg.height_padded, cfg.width_padded
    m = max(32, cfg.ctu_size)
    hp = (h + m - 1) // m * m
    wp = (w + m - 1) // m * m
    src_dt = np.uint8 if cfg.bit_depth == 8 else np.uint16

    def padp(p, ph, pw):
        return np.pad(np.asarray(p),
                      ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge").astype(src_dt)

    oy = np.stack([[padp(fr[0], hp, wp) for fr in frames]
                   for frames, _ in chains])
    ocb = np.stack([[padp(fr[1], hp // 2, wp // 2) for fr in frames]
                    for frames, _ in chains])
    ocr = np.stack([[padp(fr[2], hp // 2, wp // 2) for fr in frames]
                    for frames, _ in chains])
    ry = np.stack([padp(ref.y, hp, wp) for _, ref in chains])
    rcb = np.stack([padp(ref.cb, hp // 2, wp // 2) for _, ref in chains])
    rcr = np.stack([padp(ref.cr, hp // 2, wp // 2) for _, ref in chains])

    res, final_ref, total_rate, chain_rates = encode_chains_sharded(
        oy, ocb, ocr, ry, rcb, rcr, cfg, qp, mesh,
        me_range=cfg.me_range)

    depth8 = np.asarray(res[0])[:, :, :h // 8, :w // 8]
    mv8 = np.asarray(res[1]).astype(np.int32)[:, :, :h // 8, :w // 8]
    cf_y = np.asarray(res[2]).reshape(c, f, hp, wp)[:, :, :h, :w]
    cf_c = np.asarray(res[3]).reshape(c, 2 * f, hp // 2, wp // 2) \
        [:, :, :h // 2, :w // 2]
    sao_all = np.asarray(res[4]).astype(np.int32)
    intra8 = np.asarray(res[5])[:, :, :h // 8, :w // 8] != 0
    imode8 = np.asarray(res[6])[:, :, :h // 8, :w // 8]
    tusplit8 = np.asarray(res[7])[:, :, :h // 8, :w // 8]
    rec_y = np.asarray(res[9]).reshape(c, f, hp, wp)[:, :, :h, :w]
    rec_c = np.asarray(res[10]).reshape(c, 2 * f, hp // 2, wp // 2) \
        [:, :, :h // 2, :w // 2]

    out = []
    for ci in range(c):
        syns, recons = [], []
        for i in range(f):
            syn = FramePSyntax(
                depth8=depth8[ci, i].astype(np.uint8),
                mv8=mv8[ci, i],
                coeff_y=cf_y[ci, i].astype(np.int32),
                coeff_cb=cf_c[ci, i].astype(np.int32),
                coeff_cr=cf_c[ci, f + i].astype(np.int32))
            syn.sao_params = ((sao_all[ci, i, 0], sao_all[ci, i, 1],
                               sao_all[ci, i, 2]) if cfg.sao else None)
            if intra8[ci, i].any():
                syn.intra8 = intra8[ci, i]
                syn.mode8 = imode8[ci, i]
            if tusplit8[ci, i].any():
                syn.tusplit8 = tusplit8[ci, i]
            syns.append(syn)
            recons.append(ReconFrame(rec_y[ci, i].astype(np.int32),
                                     rec_c[ci, i].astype(np.int32),
                                     rec_c[ci, f + i].astype(np.int32)))
        out.append((syns, recons))
    return out, total_rate


def shared_rc_step(rc, total_rate_bits: float, n_frames: int,
                   qp: int) -> int:
    """Feed the mesh's all-reduced bit estimate into the shared rate
    controller and return the QP for the next GOP wave — the
    cross-chain rateControlStart/End serialization analog
    (ratecontrol.cpp:1248/2795) with ONE controller decision per wave
    instead of per-frame locks.

    rc: enc.ratecontrol.RateControl in abr mode. The estimate is the
    same CABAC-calibrated model the device RD uses, so the controller
    sees fleet-consistent numbers without waiting for host CABAC."""
    per_frame = total_rate_bits / max(n_frames, 1)
    for _ in range(n_frames):
        rc.frame_done(int(per_frame), qp, 1.0, False)
    return rc.frame_qp(False, rc.short_cplx_sum /
                       max(rc.short_cplx_count, 1e-9))
