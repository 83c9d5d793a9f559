"""Fused device B-frame pipeline: a LAYER of independent B frames as
one dispatch.

TPU-first recast of x265's B coding (analysis.cpp checkBidir2Nx2N
:3145, compressInterCU_rd0_4): every B frame of a pyramid layer
references only already-reconstructed pictures, so a layer batches as
one `lax.scan` with no carry — per frame, entirely on device:
windowed ME against BOTH references (ops/me_win.me_all_sizes with raw
26-bit accumulators), the normative bi combine (clause 8.5.4.2.3.2)
as a third candidate, per-size uni0/uni1/bi selection by SA8D+λbits,
dense residual coding, leaf-RDO depth decision, compose, deblock
(B boundary strengths) and SAO.

The host downloads decision fields + compacted coefficients; the
native B-slice CABAC (entropy.cpp code_cu_b) serializes each frame.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream.syntax import FrameBSyntax
from ..common.params import EncoderConfig
from ..common.tables import CHROMA_QP_LUT, chroma_qp, lambda_from_qp, \
    lambda2_from_qp
from ..ops.me import _downsample4
from ..ops.me_win import me_all_sizes, pad_ref
from ..ops.sao_tpu import apply_sao_t, choose_sao_chroma_t, choose_sao_t
from ..ops.satd import sa8d_nxn_lanes
from .intra_recon import ReconFrame, DeviceRef
from .pgop_tpu import (SIZES, _chroma_preds_windowed, _coarse_search_rolled,
                       _coeff_bits_est, _mvd_bits_est, _rd_depth_decision,
                       deblock_luma_t, quant_batch, dct_batch, idct_batch,
                       dequant_batch, sign_hide_batch, rdoq_batch)


def _bi_combine(raw0: jnp.ndarray, raw1: jnp.ndarray,
                bit_depth: int) -> jnp.ndarray:
    """Default weighted sample prediction, bi case (8.5.4.2.3.2):
    26-bit accumulators -> 14-bit intermediates -> averaged."""
    shift = 15 - bit_depth
    p = (raw0 >> 6) + (raw1 >> 6) + (1 << (shift - 1))
    return jnp.clip(p >> shift, 0, (1 << bit_depth) - 1)


def _chroma_raws(cpad2, pad_c, refcb, refcr, mvs, seeds, me_range, h, w,
                 bit_depth):
    """Windowed chroma MC per size returning RAW accumulators (the
    zero-MV dense path contributes sample << total_shift)."""
    raws = _chroma_preds_windowed(cpad2, pad_c, refcb, refcr, mvs,
                                  seeds, me_range, h, w, bit_depth,
                                  raw=True)
    return raws


def _bs_maps_b_t(depth8, mvb, pf8, cf_y, ctu: int):
    """Traced B boundary strengths (ops/deblock.inter_bs_maps_b
    recast): different pred flags or a full-pel MV difference on any
    used list, or coded coefficients."""
    n8y, n8x = depth8.shape
    nz8 = cf_y[:n8y * 8, :n8x * 8].reshape(n8y, 8, n8x, 8)
    nz8 = jnp.any(nz8 != 0, axis=(1, 3))

    def orpool(a, k):
        yy = a.shape[0] // k * k
        xx = a.shape[1] // k * k
        q = a[:yy, :xx].reshape(yy // k, k, xx // k, k).any(axis=(1, 3))
        r = jnp.repeat(jnp.repeat(q, k, 0), k, 1)
        return jnp.pad(r, ((0, a.shape[0] - r.shape[0]),
                           (0, a.shape[1] - r.shape[1])))

    cbf8 = jnp.where(depth8 == 0, orpool(nz8, 4),
                     jnp.where(depth8 == 1, orpool(nz8, 2), nz8))
    size = (ctu >> depth8).astype(jnp.int32)
    xs = (jnp.arange(n8x) * 8)[None, :]
    ys = (jnp.arange(n8y) * 8)[:, None]
    vmask = ((xs % size) == 0).at[:, 0].set(False)
    hmask = ((ys % size) == 0).at[0, :].set(False)

    def bs_of(cP, cQ, pfP, pfQ, mvP, mvQ):
        diff_pf = pfP != pfQ
        mvd = jnp.zeros(cP.shape, bool)
        for li in range(2):
            used = (pfP & (1 << li)) != 0
            d = (jnp.abs(mvP[..., li, 0] - mvQ[..., li, 0]) >= 4) | \
                (jnp.abs(mvP[..., li, 1] - mvQ[..., li, 1]) >= 4)
            mvd |= used & d
        return (cP | cQ | diff_pf | mvd).astype(jnp.int32)

    vbs = jnp.zeros((n8y, n8x), jnp.int32)
    vbs = vbs.at[:, 1:].set(bs_of(cbf8[:, :-1], cbf8[:, 1:],
                                  pf8[:, :-1], pf8[:, 1:],
                                  mvb[:, :-1], mvb[:, 1:])) * vmask
    hbs = jnp.zeros((n8y, n8x), jnp.int32)
    hbs = hbs.at[1:, :].set(bs_of(cbf8[:-1, :], cbf8[1:, :],
                                  pf8[:-1, :], pf8[1:, :],
                                  mvb[:-1, :], mvb[1:, :])) * hmask
    return vbs, hbs


@partial(jax.jit, static_argnames=("qp", "qpc", "bit_depth", "real_h",
                                   "real_w", "ctu", "deblock", "sao",
                                   "sign_hiding", "me_range", "dqp",
                                   "need_recon", "rdoq", "psy_rd"))
def _bframe_batch(r0y, r0cb, r0cr, r1y, r1cb, r1cr, oy_b, ocb_b, ocr_b,
                  qp_maps, *, qp: int, qpc: int, bit_depth: int,
                  real_h: int, real_w: int, ctu: int, deblock: bool,
                  sao: bool, sign_hiding: bool, me_range: int,
                  dqp: bool, need_recon: bool, rdoq: bool = False,
                  psy_rd: float = 0.0):
    """r*: (F, Hp, Wp) reference planes per frame (stacked); o*_b:
    (F, Hp, Wp) originals. All frames are independent (one pyramid
    layer); a no-carry scan serializes them on one device."""
    lam = float(lambda_from_qp(qp))
    lam2 = float(lambda2_from_qp(qp))
    hp, wp = oy_b.shape[1:]
    rh, rw = real_h, real_w
    total_shift = 12 - (bit_depth - 8)
    rnd_off = 1 << (total_shift - 1)
    maxv = (1 << bit_depth) - 1

    def body(carry, xs):
        ry0, rcb0, rcr0, ry1, rcb1, rcr1, oy8, ocb8, ocr8, qp_ctu = xs
        oy = oy8.astype(jnp.int32)
        ocb = ocb8.astype(jnp.int32)
        ocr = ocr8.astype(jnp.int32)
        h, w = oy.shape
        lam_i = jnp.int32(round(lam))
        pad_y = 2 * me_range + 8
        pad_c = me_range + 8

        me = {}
        craws = {}
        for li, (ry, rcb, rcr) in ((0, (ry0, rcb0, rcr0)),
                                   (1, (ry1, rcb1, rcr1))):
            ry = ry.astype(jnp.int32)
            rcb = rcb.astype(jnp.int32)
            rcr = rcr.astype(jnp.int32)
            cmv = _coarse_search_rolled(_downsample4(oy),
                                        _downsample4(ry))[0] * 4
            ry_pad = pad_ref(ry, pad_y)
            res, seeds = me_all_sizes(oy, ry_pad, cmv, lam_i,
                                      radius=me_range, pad=pad_y,
                                      bit_depth=bit_depth, sizes=SIZES,
                                      want_raw=True)
            me[li] = res
            cpad2 = jnp.stack([pad_ref(rcb, pad_c), pad_ref(rcr, pad_c)])
            mvs_l = {n: res[n][0] for n in SIZES}
            craws[li] = _chroma_preds_windowed(
                cpad2, pad_c, rcb, rcr, mvs_l, seeds, me_range, h, w,
                bit_depth, raw=True)

        def rounded(acc):
            return jnp.clip((acc + rnd_off) >> total_shift, 0, maxv)

        # per-size uni0/uni1/bi selection (checkBidir2Nx2N analog)
        def to_lanes(bm, n):
            return jnp.transpose(bm, (1, 2, 0))

        sel_pred = {}
        sel_cpred = {}
        pf_sz = {}
        mv_sz = {}
        for n in SIZES:
            by, bx = h // n, w // n
            ob = oy.reshape(by, n, bx, n).transpose(0, 2, 1, 3) \
                .reshape(-1, n, n).astype(jnp.int32)
            mv0, c0 = me[0][n][0], me[0][n][1]
            mv1, c1 = me[1][n][0], me[1][n][1]
            raw0, raw1 = me[0][n][3], me[1][n][3]
            bi = _bi_combine(raw0, raw1, bit_depth)
            cbi = sa8d_nxn_lanes(to_lanes(ob - bi, n), n) + \
                lam_i * (jnp.abs(mv0).sum(1) // 2 +
                         jnp.abs(mv1).sum(1) // 2 + 6)
            best = jnp.argmin(jnp.stack([c0, c1, cbi]), axis=0)
            pf = jnp.where(best == 0, 1, jnp.where(best == 1, 2, 3))
            pf_sz[n] = pf
            mv_sz[n] = jnp.stack([mv0, mv1], axis=1)    # (B, 2, 2)
            p0, p1 = me[0][n][2], me[1][n][2]
            sel_pred[n] = jnp.where((pf == 1)[:, None, None], p0,
                                    jnp.where((pf == 2)[:, None, None],
                                              p1, bi))
            cr0b, cr0r = craws[0][n]
            cr1b, cr1r = craws[1][n]
            cbp = jnp.where((pf == 1)[:, None, None], rounded(cr0b),
                            jnp.where((pf == 2)[:, None, None],
                                      rounded(cr1b),
                                      _bi_combine(cr0b, cr1b,
                                                  bit_depth)))
            crp = jnp.where((pf == 1)[:, None, None], rounded(cr0r),
                            jnp.where((pf == 2)[:, None, None],
                                      rounded(cr1r),
                                      _bi_combine(cr0r, cr1r,
                                                  bit_depth)))
            sel_cpred[n] = (cbp, crp)

        # residual coding at every size + leaf-RDO depth decision
        def qp_vecs(nn, by, bx):
            if not dqp:
                return qp, qpc
            iy = jnp.arange(by, dtype=jnp.int32) * nn // ctu
            ix = jnp.arange(bx, dtype=jnp.int32) * nn // ctu
            q = qp_ctu[iy[:, None], ix[None, :]].reshape(-1)
            qc = jnp.take(jnp.asarray(CHROMA_QP_LUT), jnp.clip(q, 0, 57))
            return q, qc

        def blocks_of(plane, nn):
            bby, bbx = plane.shape[0] // nn, plane.shape[1] // nn
            return plane.reshape(bby, nn, bbx, nn).transpose(0, 2, 1, 3) \
                .reshape(-1, nn, nn).astype(jnp.int32)

        def to_plane(blocks, nn, hh, ww):
            bby, bbx = hh // nn, ww // nn
            return blocks.reshape(bby, bbx, nn, nn) \
                .transpose(0, 2, 1, 3).reshape(hh, ww)

        def one_plane(orig, nn, qqp, pred):
            obk = blocks_of(orig, nn)
            resi = obk - pred
            tcoef = dct_batch(resi, nn, bit_depth)
            if rdoq:
                if sign_hiding:
                    coefs, du = rdoq_batch(tcoef, nn, qqp, lam2,
                                           bit_depth, with_rem=True)
                    coefs = sign_hide_batch(coefs, nn, 0, du)
                else:
                    coefs = rdoq_batch(tcoef, nn, qqp, lam2, bit_depth)
            elif sign_hiding:
                coefs, du = quant_batch(tcoef, nn, qqp, bit_depth,
                                        intra=False, with_rem=True)
                coefs = sign_hide_batch(coefs, nn, 0, du)
            else:
                coefs = quant_batch(tcoef, nn, qqp, bit_depth,
                                    intra=False)
            cbf = jnp.any(coefs != 0, axis=(1, 2))
            r = idct_batch(dequant_batch(coefs, nn, qqp, bit_depth), nn,
                           bit_depth)
            rec = jnp.where(cbf[:, None, None],
                            jnp.clip(pred + r, 0, maxv), pred)
            coefs = jnp.where(cbf[:, None, None], coefs, 0)
            return rec, coefs

        def blk_sum(plane, by, bx, k):
            return plane[:by * k, :bx * k].astype(jnp.float32) \
                .reshape(by, k, bx, k).sum((1, 3))

        planes = {}
        sse = {}
        bits = {}
        for n in SIZES:
            by, bx = h // n, w // n
            cn = n >> 1
            qn, qcn = qp_vecs(n, by, bx)
            rec_y, cf_y = one_plane(oy, n, qn, sel_pred[n])
            rec_cb, cf_cb = one_plane(ocb, cn, qcn, sel_cpred[n][0])
            rec_cr, cf_cr = one_plane(ocr, cn, qcn, sel_cpred[n][1])
            planes[n] = (to_plane(rec_y, n, h, w),
                         to_plane(cf_y, n, h, w),
                         to_plane(rec_cb, cn, h // 2, w // 2),
                         to_plane(cf_cb, cn, h // 2, w // 2),
                         to_plane(rec_cr, cn, h // 2, w // 2),
                         to_plane(cf_cr, cn, h // 2, w // 2))
            sse[n] = blk_sum((planes[n][0] - oy) ** 2, by, bx, n) + \
                blk_sum((planes[n][2] - ocb) ** 2, by, bx, cn) + \
                blk_sum((planes[n][4] - ocr) ** 2, by, bx, cn)
            pf = pf_sz[n]
            mvg0 = mv_sz[n][:, 0].reshape(by, bx, 2)
            mvg1 = mv_sz[n][:, 1].reshape(by, bx, 2)
            mvbits = jnp.where(
                (pf & 1).astype(bool).reshape(by, bx),
                _mvd_bits_est(mvg0), 0.0) + jnp.where(
                (pf & 2).astype(bool).reshape(by, bx),
                _mvd_bits_est(mvg1), 0.0)
            bits[n] = mvbits + \
                _coeff_bits_est(planes[n][1], by, bx, n) + \
                _coeff_bits_est(planes[n][3], by, bx, cn) + \
                _coeff_bits_est(planes[n][5], by, bx, cn)

        if psy_rd > 0:
            # lambda-scaled like the reference (rdcost.h calcPsyRdCost
            # (m_lambda * m_psyRd * psycost) >> 24) — see pgop_tpu
            from .pgop_tpu import _psy8_energy
            lam_psy = jnp.sqrt(jnp.float32(lam2))
            e_src = _psy8_energy(oy)
            for n in SIZES:
                de = jnp.abs(e_src - _psy8_energy(planes[n][0]))
                k = n // 8
                by, bx = h // n, w // n
                psy_n = de.reshape(by, k, bx, k).sum(axis=(1, 3))
                sse[n] = sse[n] + jnp.float32(psy_rd) * lam_psy * psy_n

        mvs_flat = {n: mv_sz[n].reshape(-1, 4) for n in SIZES}
        depth8, mv8x = _rd_depth_decision(sse, bits, mvs_flat, lam2,
                                          real_h, real_w, h, w)[:2]
        # mv8x carries the packed (mv0, mv1); expand pf likewise
        n8y, n8x = h // 8, w // 8
        rep = lambda a, k: jnp.repeat(jnp.repeat(a, k, 0), k, 1)
        pf_up = {n: rep(pf_sz[n].reshape(h // n, w // n),
                        n // 8)[:n8y, :n8x] for n in SIZES}
        pf8 = jnp.where(depth8 == 0, pf_up[32],
                        jnp.where(depth8 == 1, pf_up[16], pf_up[8])) \
            .astype(jnp.int32)
        mvb8 = mv8x.reshape(n8y, n8x, 2, 2)

        size_of_depth = {0: 32, 1: 16, 2: 8}
        out = [jnp.zeros_like(p) for p in planes[8]]
        for d, n in size_of_depth.items():
            m8 = depth8 == d
            mpx = jnp.repeat(jnp.repeat(m8, 8, 0), 8, 1)
            mpx_c = jnp.repeat(jnp.repeat(m8, 4, 0), 4, 1)
            ps = planes[n]
            for i, (mask, p) in enumerate(
                    [(mpx, ps[0]), (mpx, ps[1]), (mpx_c, ps[2]),
                     (mpx_c, ps[3]), (mpx_c, ps[4]), (mpx_c, ps[5])]):
                out[i] = jnp.where(mask, p, out[i])
        rec_y, cf_y, rec_cb, cf_cb, rec_cr, cf_cr = out

        ry_c = rec_y[:rh, :rw]
        rcb_c = rec_cb[:rh // 2, :rw // 2]
        rcr_c = rec_cr[:rh // 2, :rw // 2]
        if deblock:
            vbs, hbs = _bs_maps_b_t(depth8[:rh // 8, :rw // 8],
                                    mvb8[:rh // 8, :rw // 8],
                                    pf8[:rh // 8, :rw // 8],
                                    cf_y[:rh, :rw], ctu)
            ry_c = deblock_luma_t(ry_c, vbs, hbs, qp, bit_depth)
        ncty = (rh + ctu - 1) // ctu
        nctx = (rw + ctu - 1) // ctu
        if sao:
            lam2j = float(lambda2_from_qp(qp))
            p_y = choose_sao_t(oy[:rh, :rw], ry_c, ctu, qp, bit_depth,
                               lam2j)
            p_cb, p_cr = choose_sao_chroma_t(
                ocb[:rh // 2, :rw // 2], rcb_c,
                ocr[:rh // 2, :rw // 2], rcr_c, ctu // 2, qp,
                bit_depth, lam2j)
            ry_c = apply_sao_t(ry_c, p_y, ctu, bit_depth)
            rcb_c = apply_sao_t(rcb_c, p_cb, ctu // 2, bit_depth)
            rcr_c = apply_sao_t(rcr_c, p_cr, ctu // 2, bit_depth)
        else:
            p_y = jnp.zeros((ncty, nctx, 6), jnp.int32)
            p_cb = jnp.zeros((ncty, nctx, 6), jnp.int32)
            p_cr = jnp.zeros((ncty, nctx, 6), jnp.int32)

        rec_y = jnp.pad(ry_c, ((0, hp - rh), (0, wp - rw)), mode="edge")
        rec_cb = jnp.pad(rcb_c, ((0, (hp - rh) // 2),
                                 (0, (wp - rw) // 2)), mode="edge")
        rec_cr = jnp.pad(rcr_c, ((0, (hp - rh) // 2),
                                 (0, (wp - rw) // 2)), mode="edge")
        rdt = jnp.uint8 if bit_depth == 8 else jnp.uint16
        outs = (depth8.astype(jnp.uint8), mvb8.astype(jnp.int16),
                pf8.astype(jnp.uint8),
                cf_y.astype(jnp.int16), cf_cb.astype(jnp.int16),
                cf_cr.astype(jnp.int16),
                jnp.stack([p_y, p_cb, p_cr]).astype(jnp.int8),
                rec_y.astype(rdt), rec_cb.astype(rdt),
                rec_cr.astype(rdt))
        return carry, outs

    _, outs = jax.lax.scan(
        body, 0,
        (r0y, r0cb, r0cr, r1y, r1cb, r1cr, oy_b, ocb_b, ocr_b, qp_maps))
    f = oy_b.shape[0]
    cf_y2 = outs[3].reshape(f * hp, wp)
    cf_c2 = jnp.concatenate([outs[4], outs[5]]).reshape(
        2 * f * (hp // 2), wp // 2)
    rec_y2 = outs[7].reshape(f * hp, wp)
    rec_c2 = jnp.concatenate([outs[8], outs[9]]).reshape(
        2 * f * (hp // 2), wp // 2)
    return (outs[0], outs[1], outs[2], cf_y2, cf_c2, outs[6],
            rec_y2, rec_c2)


def encode_bframes_tpu(frames, ref0s, ref1s, cfg: EncoderConfig,
                       qp: int, qp_maps=None, mesh=None):
    """Encode a LAYER of independent B frames on device. With `mesh`,
    the layer FANS OUT across the device mesh (one shard of frames per
    device; a B layer's frames are independent given their references,
    so no collectives are needed) — the bonded-group fan-out analog of
    x265's frame threads on B batches (SURVEY.md §2.5).

    frames: list of (y, cb, cr) originals (coded size); ref0s/ref1s:
    lists of ReconFrame/DeviceRef (post-filter). Returns (syns list of
    FrameBSyntax, recons list of ReconFrame)."""
    from .encoder import pad_plane
    f = len(frames)
    h, w = cfg.height_padded, cfg.width_padded
    hp = (h + 31) // 32 * 32
    wp = (w + 31) // 32 * 32
    src_dt = np.uint8 if cfg.bit_depth == 8 else np.uint16

    def stack_frames(fr_list, idx, hh, ww):
        ph = hp if idx == 0 else hp // 2
        pw = wp if idx == 0 else wp // 2
        return np.stack([
            np.pad(pad_plane(np.asarray(fr[idx]), hh, ww),
                   ((0, ph - hh), (0, pw - ww)), mode="edge")
            for fr in fr_list]).astype(src_dt)

    oy = stack_frames(frames, 0, h, w)
    ocb = stack_frames(frames, 1, h // 2, w // 2)
    ocr = stack_frames(frames, 2, h // 2, w // 2)

    def stack_refs(refs, which):
        planes = []
        for r in refs:
            p = r.y if which == 0 else (r.cb if which == 1 else r.cr)
            p = np.asarray(p)
            hh = hp if which == 0 else hp // 2
            ww = wp if which == 0 else wp // 2
            planes.append(np.pad(p, ((0, hh - p.shape[0]),
                                     (0, ww - p.shape[1])),
                          mode="edge").astype(src_dt))
        return np.stack(planes)

    r0y = stack_refs(ref0s, 0)
    r0cb = stack_refs(ref0s, 1)
    r0cr = stack_refs(ref0s, 2)
    r1y = stack_refs(ref1s, 0)
    r1cb = stack_refs(ref1s, 1)
    r1cr = stack_refs(ref1s, 2)

    ctu = cfg.ctu_size
    ncty_p, nctx_p = hp // ctu, wp // ctu
    dqp = cfg.dqp_enabled
    if qp_maps is None and dqp:
        qp_maps = np.full((f, ncty_p, nctx_p), qp, np.int32)
    qmj = jnp.asarray(np.clip(qp_maps, 0, 51)) if dqp else \
        jnp.zeros((f, ncty_p, nctx_p), jnp.int32)

    kw = dict(
        qp=int(qp), qpc=int(chroma_qp(qp)), bit_depth=cfg.bit_depth,
        real_h=h, real_w=w, ctu=ctu, deblock=cfg.deblock, sao=cfg.sao,
        sign_hiding=cfg.sign_hiding, me_range=cfg.me_range, dqp=dqp,
        need_recon=True, rdoq=cfg.rdoq, psy_rd=float(cfg.psy_rd))
    args = (jnp.asarray(r0y), jnp.asarray(r0cb), jnp.asarray(r0cr),
            jnp.asarray(r1y), jnp.asarray(r1cb), jnp.asarray(r1cr),
            jnp.asarray(oy), jnp.asarray(ocb), jnp.asarray(ocr), qmj)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        n_dev = mesh.devices.size
        assert f % n_dev == 0, "B-layer frames must tile the mesh"
        fl = f // n_dev
        hc, wc = hp // 2, wp // 2

        def to_frame_major(cc, rows):
            # local chroma stacks are [cb frames..., cr frames...];
            # make the shard axis frame-major so the global concat
            # across devices keeps a consistent order
            return cc.reshape(2, fl, rows, wc).transpose(1, 0, 2, 3) \
                .reshape(fl * 2 * rows, wc)

        def body(*arrs):
            r = list(_bframe_batch(*arrs, **kw))
            r[4] = to_frame_major(r[4], hc)
            r[7] = to_frame_major(r[7], hc)
            return tuple(r)

        res = list(jax.jit(shard_map(
            body, mesh=mesh, in_specs=(P("gop"),) * 10,
            out_specs=(P("gop"),) * 8, check_rep=False))(*args))

        def from_frame_major(cc):
            return jnp.asarray(cc).reshape(f, 2, hc, wc) \
                .transpose(1, 0, 2, 3).reshape(2 * f * hc, wc)

        res[4] = from_frame_major(res[4])
        res[7] = from_frame_major(res[7])
        res = tuple(res)
    else:
        res = _bframe_batch(*args, **kw)

    depth8 = np.asarray(res[0])[:, :h // 8, :w // 8]
    mvb = np.asarray(res[1]).astype(np.int32)[:, :h // 8, :w // 8]
    pf8 = np.asarray(res[2])[:, :h // 8, :w // 8]
    cf_y = np.asarray(res[3]).reshape(f, hp, wp)[:, :h, :w]
    cf_c = np.asarray(res[4]).reshape(2 * f, hp // 2, wp // 2) \
        [:, :h // 2, :w // 2]
    sao_all = np.asarray(res[5]).astype(np.int32)
    rec_y = np.asarray(res[6]).reshape(f, hp, wp)[:, :h, :w]
    rec_c = np.asarray(res[7]).reshape(2 * f, hp // 2, wp // 2) \
        [:, :h // 2, :w // 2]

    ncty_c = (h + ctu - 1) // ctu
    nctx_c = (w + ctu - 1) // ctu
    syns, recons = [], []
    for i in range(f):
        syn = FrameBSyntax(
            depth8=depth8[i].astype(np.uint8),
            mv8=mvb[i], pf8=pf8[i].astype(np.uint8),
            coeff_y=cf_y[i].astype(np.int32),
            coeff_cb=cf_c[i].astype(np.int32),
            coeff_cr=cf_c[f + i].astype(np.int32))
        syn.sao_params = ((sao_all[i, 0], sao_all[i, 1], sao_all[i, 2])
                          if cfg.sao else None)
        if dqp:
            syn.qp_map = np.asarray(qmj)[i, :ncty_c, :nctx_c]
        syns.append(syn)
        recons.append(ReconFrame(rec_y[i].astype(np.int32),
                                 rec_c[i].astype(np.int32),
                                 rec_c[f + i].astype(np.int32)))
    return syns, recons
