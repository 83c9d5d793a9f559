"""Top-level encoder orchestration (the x265 Encoder::encode analog).

Current scope: all-intra CQP. Pipeline per frame:
  1. dense device analysis (intra_analysis.analyze_intra_frame)
  2. conformant reconstruction + coefficients (intra_recon)
  3. serial CABAC slice coding (bitstream.syntax)
  4. NAL packaging (bitstream.nal)
Reference call path being re-expressed: x265 source/encoder/encoder.cpp
Encoder::encode -> frameencoder.cpp compressFrame.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..bitstream.headers import write_vps, write_sps, write_pps, \
    write_slice_header
from ..bitstream.nal import NalUnitType, annexb_stream
from ..bitstream.syntax import SliceSyntaxEncoder, FrameIntraSyntax
from ..common.params import EncoderConfig, I_SLICE, P_SLICE
from .intra_analysis import (analyze_intra_frame, analyze_intra_gop,
                             analyze_chroma_modes, analyze_chroma_gop)
from .intra_recon import reconstruct_intra_frame, ReconFrame


def _narrow_ref_j(y, cb, cr, *, bd: int):
    """Crop-free narrow-dtype cast of a device reference triple (the
    DeviceRef storage dtype: pixels fit uint8/uint16, and narrow refs
    halve the scan's H2D-free reference reads). Jitted lazily so
    importing this module costs nothing."""
    import jax
    import jax.numpy as jnp
    global _narrow_ref_j_impl
    try:
        f = _narrow_ref_j_impl
    except NameError:
        from functools import partial

        @partial(jax.jit, static_argnames=("bd",))
        def f(y, cb, cr, *, bd):
            dt = jnp.uint8 if bd == 8 else jnp.uint16
            return y.astype(dt), cb.astype(dt), cr.astype(dt)
        _narrow_ref_j_impl = f
    return f(y, cb, cr, bd=bd)


def pad_plane(p: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate to the coded (padded) size."""
    ph, pw = h - p.shape[0], w - p.shape[1]
    if ph == 0 and pw == 0:
        return p
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def effective_qp_map(qp_map: np.ndarray, coeff_y: np.ndarray,
                     coeff_cb: np.ndarray, coeff_cr: np.ndarray,
                     ctu: int, slice_qp: int) -> np.ndarray:
    """The per-CTU QP a decoder will infer: a CTU that codes no
    residual never signals cu_qp_delta, so its QP is the predictor
    (previous QG in raster order; slice QP at the start). Used for
    the encoder-side deblock tc/beta lookups (clause 8.7.2.5.3)."""
    ncty, nctx = qp_map.shape
    eff = np.empty_like(qp_map)
    prev = slice_qp
    c = ctu // 2
    for ty in range(ncty):
        y0 = ty * ctu
        for tx in range(nctx):
            x0 = tx * ctu
            any_c = (coeff_y[y0:y0 + ctu, x0:x0 + ctu].any()
                     or coeff_cb[y0 // 2:y0 // 2 + c,
                                 x0 // 2:x0 // 2 + c].any()
                     or coeff_cr[y0 // 2:y0 // 2 + c,
                                 x0 // 2:x0 // 2 + c].any())
            prev = int(qp_map[ty, tx]) if any_c else prev
            eff[ty, tx] = prev
    return eff


@dataclass
class FrameStats:
    """Per-frame statistics record (the x265_frame_stats analog,
    x265.h:264-314): coding results + encode-latency telemetry (the
    m_row0WaitTime/wallTime analog, frameencoder.h:175)."""
    poc: int = 0
    ftype: str = "I"
    qp: int = 0
    bits: int = 0
    wall_time: float = 0.0        # seconds spent producing this frame
    cu_pct_by_depth: tuple = ()   # % of picture area per CU depth
    skip_pct: float = 0.0


@dataclass
class EncoderStats:
    """Global encode statistics (the x265_stats analog, x265.h:655)."""
    frame_count: int = 0
    total_bits: int = 0
    qp_sum: int = 0
    count_by_type: dict = field(default_factory=lambda: {"I": 0, "P": 0,
                                                         "B": 0})
    bits_by_type: dict = field(default_factory=lambda: {"I": 0, "P": 0,
                                                        "B": 0})
    total_wall: float = 0.0
    frames: list = field(default_factory=list)   # FrameStats records

    def add(self, ftype: str, bits: int, qp: int, *, poc: int = 0,
            wall_time: float = 0.0, syn=None) -> None:
        self.frame_count += 1
        self.total_bits += bits
        self.qp_sum += qp
        self.count_by_type[ftype] += 1
        self.bits_by_type[ftype] += bits
        self.total_wall += wall_time
        fs = FrameStats(poc=poc, ftype=ftype, qp=qp, bits=bits,
                        wall_time=wall_time)
        if syn is not None and getattr(syn, "depth8", None) is not None:
            d8 = np.asarray(syn.depth8)
            tot = max(d8.size, 1)
            fs.cu_pct_by_depth = tuple(
                round(float((d8 == d).sum()) * 100.0 / tot, 2)
                for d in range(3))
        self.frames.append(fs)

    def summary(self, fps: float = 25.0) -> dict:
        n = max(self.frame_count, 1)
        return {
            "frames": self.frame_count,
            "kbps": self.total_bits * fps / n / 1000.0,
            "avg_qp": self.qp_sum / n,
            "count_by_type": dict(self.count_by_type),
            "bits_by_type": dict(self.bits_by_type),
            "encode_fps": (self.frame_count / self.total_wall
                           if self.total_wall > 0 else 0.0),
        }


@dataclass
class FrameResult:
    bitstream: bytes            # Annex-B access unit (headers for frame 0)
    recon: ReconFrame | None
    syntax: FrameIntraSyntax
    bits: int = 0
    poc: int = 0                # display position within the GOP
    ftype: str = "I"
    device_ref: object = None   # DeviceRef when the recon stayed on device


class IntraEncoder:
    """All-intra HEVC encoder, CQP."""

    def __init__(self, cfg: EncoderConfig) -> None:
        cfg.validate()
        self.cfg = cfg
        self.frame_count = 0
        self.ref: ReconFrame | None = None   # last reference (post-filter)
        self.ref_avail = 1     # distinct references in self.ref (multi-
        #                        ref DPB depth grows 1/frame up to
        #                        cfg.num_refs; dpb.cpp:126 analog)
        self._last_p_syn = None  # previous P syn (TMVP collocated)
        self.last_src = None   # source planes of the last encoded frame
        #                        (weightp analysis compares SOURCES, the
        #                        lookahead-lowres discipline of
        #                        weightPrediction.cpp:222)
        self.poc = 0
        self.stats = EncoderStats()

    def reconfigure(self, **updates) -> int:
        """x265_encoder_reconfig analog: latch safe parameter changes
        for the NEXT frame; returns 0 on success, -1 if any update is
        not reconfigurable (nothing is applied then)."""
        try:
            self.cfg.reconfigure(**updates)
            return 0
        except (ValueError, NotImplementedError):
            return -1

    def get_stats(self) -> dict:
        """Encode-session summary (x265_encoder_get_stats analog)."""
        fps = self.cfg.fps_num / max(self.cfg.fps_den, 1)
        return self.stats.summary(fps)

    def _host_ref(self) -> ReconFrame:
        """self.ref as a host ReconFrame (downloads a DeviceRef)."""
        from .intra_recon import DeviceRef
        if isinstance(self.ref, DeviceRef):
            self.ref = self.ref.to_recon()
        return self.ref

    def headers(self) -> list[tuple[NalUnitType, bytes]]:
        cfg = self.cfg
        return [
            (NalUnitType.VPS, write_vps(cfg)),
            (NalUnitType.SPS, write_sps(cfg)),
            (NalUnitType.PPS, write_pps(cfg)),
        ]

    def encode_frame(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     *, use_device_recon: bool = False,
                     use_native_cabac: bool = True,
                     qp: int | None = None,
                     need_recon: bool = True,
                     qp_map: np.ndarray | None = None) -> FrameResult:
        """qp_map: per-CTU QP (ncty, nctx) from AQ/cuTree; when given,
        cu_qp_delta is signalled per CTU (cfg.dqp_enabled must be on so
        the PPS carries the flag). Currently drives the host recon
        path."""
        cfg = self.cfg
        t_start = time.perf_counter()
        qp = cfg.qp if qp is None else qp
        self.last_src = (y, cb, cr)
        if cfg.lossless:
            # transquant bypass: loop filters and parity tricks are
            # meaningless on exact residuals (x265 forces these off too)
            cfg.deblock = cfg.sao = cfg.sign_hiding = cfg.rdoq = False
            use_device_recon = False
        w, h = cfg.width_padded, cfg.height_padded
        yp = pad_plane(np.asarray(y), h, w)
        cbp = pad_plane(np.asarray(cb), h // 2, w // 2)
        crp = pad_plane(np.asarray(cr), h // 2, w // 2)
        device_ref = None
        if qp_map is None and cfg.dqp_enabled:
            # PPS signals cu_qp_delta: every slice must code deltas
            qp_map = np.full((cfg.ctu_rows, cfg.ctu_cols), qp, np.int32)
        if qp_map is not None:
            assert cfg.dqp_enabled, "qp_map needs cfg.aq_mode/cutree on"
            qp_map = np.clip(np.asarray(qp_map, np.int32), 0, 51)
            # lookahead maps come on the floor-16 grid; edge-extend to
            # the (ceil) CTU grid of ragged geometries (1088-line pads)
            ry, rx = cfg.ctu_rows, cfg.ctu_cols
            if qp_map.shape != (ry, rx):
                full = np.empty((ry, rx), np.int32)
                sy = min(qp_map.shape[0], ry)
                sx = min(qp_map.shape[1], rx)
                full[:sy, :sx] = qp_map[:sy, :sx]
                full[sy:, :sx] = full[sy - 1:sy, :sx]
                full[:, sx:] = full[:, sx - 1:sx]
                qp_map = full
            use_device_recon = False

        # CTU 64: intra CUs cap at 32 (x265 likewise analyses intra at
        # <=32; the 64 level exists for inter skip CUs) — analyse on
        # the 32 grid, then shift depth one level down the 64-tree
        actu = min(cfg.ctu_size, 32)
        dshift = 1 if cfg.ctu_size == 64 else 0
        if use_device_recon:
            # fused device analysis (2 dispatches total: luma + chroma)
            depth8, mode8, nxn8, mode4 = analyze_intra_gop(
                yp[None], qp, actu, cfg.bit_depth,
                intra_nxn=cfg.intra_nxn)
            depth8, mode8 = depth8[0] + dshift, mode8[0]
            nxn8, mode4 = nxn8[0], mode4[0]
            cmode8 = analyze_chroma_gop(cbp[None], crp[None],
                                        depth8[None] - dshift,
                                        mode8[None], qp,
                                        cfg.bit_depth)[0]
        else:
            depth8, mode8, nxn8, mode4 = analyze_intra_frame(
                yp, qp, actu, cfg.bit_depth,
                intra_nxn=cfg.intra_nxn)
            depth8 = depth8 + dshift
            cmode8 = analyze_chroma_modes(cbp, crp, depth8 - dshift,
                                          mode8, qp, cfg.bit_depth)
        sao_params = None
        if use_device_recon:
            # device pipeline: wavefront recon, in-loop filters and the
            # reference picture all stay on device; only syntax arrays
            # (and recon when requested) come back to the host
            import jax.numpy as jnp
            from .intra_recon import DeviceRef
            from .intra_recon_tpu import reconstruct_intra_gop_tpu
            syns, _, dev = reconstruct_intra_gop_tpu(
                yp[None], cbp[None], crp[None], depth8[None],
                mode8[None], cfg, qp, cmode8=cmode8[None],
                nxn8=nxn8[None], mode4=mode4[None], need_recon=False,
                return_device=True)
            syn = syns[0]
            ry2, rc2 = dev
            hp2, wp2 = ry2.shape[0], ry2.shape[1]
            dy = ry2[:h, :w].astype(jnp.int32)
            dcb = rc2[:h // 2, :w // 2].astype(jnp.int32)
            dcr = rc2[hp2 // 2:hp2 // 2 + h // 2, :w // 2] \
                .astype(jnp.int32)
            if cfg.deblock:
                from ..ops.deblock import deblock_frame
                dy, dcb, dcr = deblock_frame(dy, dcb, dcr, depth8,
                                             cfg.ctu_size, qp,
                                             cfg.bit_depth)
            if cfg.sao:
                from ..common.tables import lambda2_from_qp
                from ..ops.sao_tpu import (apply_sao_t,
                                           choose_sao_chroma_t,
                                           choose_sao_t)
                lam2 = float(lambda2_from_qp(qp))
                oyj = jnp.asarray(yp.astype(np.int32))
                ocbj = jnp.asarray(cbp.astype(np.int32))
                ocrj = jnp.asarray(crp.astype(np.int32))
                p_y_d = choose_sao_t(oyj, dy, cfg.ctu_size, qp,
                                     cfg.bit_depth, lam2)
                p_cb_d, p_cr_d = choose_sao_chroma_t(
                    ocbj, dcb, ocrj, dcr, cfg.ctu_size // 2, qp,
                    cfg.bit_depth, lam2)
                dy = apply_sao_t(dy, p_y_d, cfg.ctu_size, cfg.bit_depth)
                dcb = apply_sao_t(dcb, p_cb_d, cfg.ctu_size // 2,
                                  cfg.bit_depth)
                dcr = apply_sao_t(dcr, p_cr_d, cfg.ctu_size // 2,
                                  cfg.bit_depth)
                sao_params = (np.asarray(p_y_d), np.asarray(p_cb_d),
                              np.asarray(p_cr_d))
            device_ref = DeviceRef(*_narrow_ref_j(dy, dcb, dcr,
                                                  bd=cfg.bit_depth))
            if need_recon or cfg.hash_sei:
                recon = device_ref.to_recon()
            else:
                recon = None
        else:
            syn, recon = reconstruct_intra_frame(yp, cbp, crp, depth8,
                                                 mode8, cfg, qp,
                                                 cmode8=cmode8,
                                                 nxn8=nxn8, mode4=mode4,
                                                 qp_map=qp_map)
            if cfg.deblock:
                from ..ops.deblock import deblock_frame_np
                dqp = qp
                if qp_map is not None:
                    eff = effective_qp_map(qp_map, syn.coeff_y,
                                           syn.coeff_cb, syn.coeff_cr,
                                           cfg.ctu_size, qp)
                    k = cfg.ctu_size // 8
                    dqp = np.repeat(np.repeat(eff, k, 0), k, 1) \
                        [:h // 8, :w // 8]
                dy, dcb, dcr = deblock_frame_np(
                    recon.y, recon.cb, recon.cr, depth8, cfg.ctu_size,
                    dqp, cfg.bit_depth)
                recon = ReconFrame(dy, dcb, dcr)
            if cfg.sao:
                from ..ops.sao import (choose_sao_params,
                                       choose_sao_chroma,
                                       apply_sao_component_np)
                p_y = choose_sao_params(yp, recon.y, cfg.ctu_size, qp,
                                        cfg.bit_depth)
                p_cb, p_cr = choose_sao_chroma(cbp, recon.cb, crp,
                                               recon.cr,
                                               cfg.ctu_size // 2, qp,
                                               cfg.bit_depth)
                recon = ReconFrame(
                    apply_sao_component_np(recon.y, p_y, cfg.ctu_size,
                                           cfg.bit_depth),
                    apply_sao_component_np(recon.cb, p_cb,
                                           cfg.ctu_size // 2,
                                           cfg.bit_depth),
                    apply_sao_component_np(recon.cr, p_cr,
                                           cfg.ctu_size // 2,
                                           cfg.bit_depth))
                sao_params = (p_y, p_cb, p_cr)

        from ..bitstream.ctx_tables import init_states
        pre_data = b""
        if cfg.wpp:
            # WPP: per-row substreams + entry point offsets (counted in
            # escaped bytes, clause 7.4.7.1)
            from ..bitstream.nal import emulation_prevention
            if use_native_cabac:
                from ..native.entropy_native import \
                    encode_slice_wpp_native
                subs = encode_slice_wpp_native(
                    2, syn.depth8, syn.coeff_y, syn.coeff_cb,
                    syn.coeff_cr, w, h, cfg.log2_ctu, cfg.log2_min_cu,
                    init_states(I_SLICE, qp), mode8=syn.mode8,
                    sign_hiding=cfg.sign_hiding, cmode8=syn.cmode8,
                    sao_params=sao_params, nxn8=syn.nxn8,
                    mode4=syn.mode4, qp_map=qp_map, slice_qp=qp,
                    lossless=cfg.lossless)
            else:
                syntax = SliceSyntaxEncoder(cfg, syn, I_SLICE, qp,
                                            sao_params=sao_params,
                                            qp_map=qp_map)
                subs = syntax.encode_slice_data_wpp()
            escaped = [emulation_prevention(s) for s in subs]
            sw = write_slice_header(
                cfg, I_SLICE, idr=True, slice_qp=qp,
                num_entry_points=len(subs) - 1,
                entry_point_offsets=[len(e) for e in escaped[:-1]])
            pre_data = b"".join(escaped)
        elif use_native_cabac:
            from ..native.entropy_native import encode_slice_native
            sw = write_slice_header(cfg, I_SLICE, idr=True, slice_qp=qp)
            payload, tail_val, tail_bits = encode_slice_native(
                2, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                w, h, cfg.log2_ctu, cfg.log2_min_cu,
                init_states(I_SLICE, qp), mode8=syn.mode8,
                sign_hiding=cfg.sign_hiding, cmode8=syn.cmode8,
                sao_params=sao_params, nxn8=syn.nxn8, mode4=syn.mode4,
                qp_map=qp_map, slice_qp=qp, lossless=cfg.lossless)
            sw.write_bytes(payload)
            if tail_bits:
                sw.write(tail_val, tail_bits)
            sw.align_one()
        else:
            sw = write_slice_header(cfg, I_SLICE, idr=True, slice_qp=qp)
            syntax = SliceSyntaxEncoder(cfg, syn, I_SLICE, qp,
                                        sao_params=sao_params,
                                        qp_map=qp_map)
            cab = syntax.encode_slice_data()
            cab.finish_into(sw)
            sw.align_one()
        slice_rbsp = sw.get_bytes()

        nals: list[tuple] = []
        if self.frame_count == 0:
            nals.extend(self.headers())
        nals.append((NalUnitType.IDR_W_RADL, slice_rbsp, pre_data))
        if cfg.hash_sei:
            from ..bitstream.sei import write_picture_hash_sei
            nals.append(write_picture_hash_sei(recon.y, recon.cb, recon.cr,
                                               cfg.bit_depth,
                                               int(cfg.hash_sei)))
        stream = annexb_stream(nals)
        self.frame_count += 1
        self.ref_avail = 1           # IDR resets the reference DPB
        self._last_p_syn = None
        self.stats.add("I", len(stream) * 8, qp, poc=0, syn=syn,
                       wall_time=time.perf_counter() - t_start)
        return FrameResult(bitstream=stream, recon=recon, syntax=syn,
                           bits=len(stream) * 8, poc=0, ftype="I",
                           device_ref=device_ref)

    def encode_frame_p(self, y: np.ndarray, cb: np.ndarray,
                       cr: np.ndarray, qp: int | None = None,
                       poc_step: int = 1) -> FrameResult:
        """Encode one P frame against the previous reconstructed
        reference (IPPP low-delay). Thin wrapper over the fused
        device GOP path with a chain of length 1."""
        return self.encode_pgop([(y, cb, cr)], qp=qp,
                                poc_step=poc_step)[0]

    def _emit_b_frame(self, syn, recon, qp: int, poc: int, poc_refs,
                      is_ref: bool, rps_neg, rps_pos,
                      sao_params) -> FrameResult:
        """Slice header + native B CABAC + NAL packaging for one
        (already reconstructed) B frame."""
        from ..bitstream.ctx_tables import init_states
        from ..common.params import B_SLICE
        cfg = self.cfg
        bqp_map = syn.qp_map if getattr(syn, "qp_map", None) is not None \
            else (np.full((cfg.ctu_rows, cfg.ctu_cols), qp, np.int32)
                  if cfg.dqp_enabled else None)
        mvb = syn.mv8.reshape(syn.mv8.shape[0], syn.mv8.shape[1], 4)
        pre_data = b""
        if cfg.wpp:
            from ..bitstream.nal import emulation_prevention
            from ..native.entropy_native import encode_slice_wpp_native
            subs = encode_slice_wpp_native(
                0, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
                cfg.log2_min_cu, init_states(B_SLICE, qp), mvb=mvb,
                pf8=syn.pf8, poc=poc, poc_refs=poc_refs,
                max_merge=syn.max_merge, sign_hiding=cfg.sign_hiding,
                sao_params=sao_params, qp_map=bqp_map, slice_qp=qp,
                rqt_inter=cfg.rqt_inter)
            escaped = [emulation_prevention(s) for s in subs]
            sw = write_slice_header(
                cfg, B_SLICE, idr=False, poc=poc, slice_qp=qp,
                ref_delta_poc=poc - poc_refs[0],
                ref_delta_poc_after=poc_refs[1] - poc,
                max_merge=syn.max_merge, rps_neg=rps_neg,
                rps_pos=rps_pos, num_entry_points=len(subs) - 1,
                entry_point_offsets=[len(e) for e in escaped[:-1]])
            pre_data = b"".join(escaped)
        else:
            from ..native.entropy_native import encode_slice_native
            sw = write_slice_header(
                cfg, B_SLICE, idr=False, poc=poc, slice_qp=qp,
                ref_delta_poc=poc - poc_refs[0],
                ref_delta_poc_after=poc_refs[1] - poc,
                max_merge=syn.max_merge, rps_neg=rps_neg,
                rps_pos=rps_pos)
            payload, tail_val, tail_bits = encode_slice_native(
                0, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
                cfg.log2_min_cu, init_states(B_SLICE, qp), mvb=mvb,
                pf8=syn.pf8, poc=poc, poc_refs=poc_refs,
                max_merge=syn.max_merge, sign_hiding=cfg.sign_hiding,
                sao_params=sao_params, qp_map=bqp_map, slice_qp=qp,
                rqt_inter=cfg.rqt_inter)
            sw.write_bytes(payload)
            if tail_bits:
                sw.write(tail_val, tail_bits)
            sw.align_one()
        nal_type = NalUnitType.TRAIL_R if is_ref else NalUnitType.TRAIL_N
        nals = [(nal_type, sw.get_bytes(), pre_data)]
        if cfg.hash_sei:
            from ..bitstream.sei import write_picture_hash_sei
            nals.append(write_picture_hash_sei(recon.y, recon.cb, recon.cr,
                                               cfg.bit_depth,
                                               int(cfg.hash_sei)))
        stream = annexb_stream(nals)
        self.frame_count += 1
        self.stats.add("B", len(stream) * 8, qp, poc=poc, syn=syn)
        return FrameResult(bitstream=stream, recon=recon, syntax=syn,
                           bits=len(stream) * 8, poc=poc, ftype="B")

    def encode_frame_b(self, y: np.ndarray, cb: np.ndarray,
                       cr: np.ndarray, ref0: ReconFrame, ref1: ReconFrame,
                       poc: int, poc_refs: tuple[int, int],
                       qp: int | None = None, is_ref: bool = False,
                       rps_neg=None, rps_pos=None) -> FrameResult:
        """Encode one B frame between two references. is_ref marks a
        pyramid reference B (BREF); rps_neg/rps_pos give the general
        retention RPS for hierarchical GOPs."""
        from ..bitstream.ctx_tables import init_states
        from ..common.params import B_SLICE
        from .bi_frame import encode_b_frame_arrays
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        w, h = cfg.width_padded, cfg.height_padded
        yp = pad_plane(np.asarray(y), h, w)
        cbp = pad_plane(np.asarray(cb), h // 2, w // 2)
        crp = pad_plane(np.asarray(cr), h // 2, w // 2)
        syn, recon = encode_b_frame_arrays(yp, cbp, crp, ref0, ref1, cfg,
                                           poc, poc_refs, qp)
        if cfg.deblock:
            from ..ops.deblock import deblock_luma_np, inter_bs_maps_b
            vbs, hbs = inter_bs_maps_b(syn.depth8, syn.mv8, syn.pf8,
                                       syn.coeff_y, cfg.ctu_size)
            recon = ReconFrame(
                deblock_luma_np(recon.y, vbs, hbs, qp, cfg.bit_depth),
                recon.cb, recon.cr)
        sao_params = None
        if cfg.sao:
            from ..ops.sao import (choose_sao_params, choose_sao_chroma,
                                   apply_sao_component_np)
            p_y = choose_sao_params(yp, recon.y, cfg.ctu_size, qp,
                                    cfg.bit_depth)
            p_cb, p_cr = choose_sao_chroma(cbp, recon.cb, crp, recon.cr,
                                           cfg.ctu_size // 2, qp,
                                           cfg.bit_depth)
            recon = ReconFrame(
                apply_sao_component_np(recon.y, p_y, cfg.ctu_size,
                                       cfg.bit_depth),
                apply_sao_component_np(recon.cb, p_cb, cfg.ctu_size // 2,
                                       cfg.bit_depth),
                apply_sao_component_np(recon.cr, p_cr, cfg.ctu_size // 2,
                                       cfg.bit_depth))
            sao_params = (p_y, p_cb, p_cr)
        # with cu_qp_delta signalled in the PPS, B slices code uniform
        # (zero-delta) maps — the host B path quantizes at the slice QP
        bqp_map = None
        if cfg.dqp_enabled:
            bqp_map = np.full((cfg.ctu_rows, cfg.ctu_cols), qp, np.int32)
        syntax = SliceSyntaxEncoder(cfg, syn, B_SLICE, qp,
                                    sao_params=sao_params,
                                    qp_map=bqp_map)
        from ..bitstream.ctx_tables import init_states
        from ..common.params import B_SLICE as _B
        mvb = syn.mv8.reshape(syn.mv8.shape[0], syn.mv8.shape[1], 4)
        pre_data = b""
        if cfg.wpp:
            from ..bitstream.nal import emulation_prevention
            from ..native.entropy_native import encode_slice_wpp_native
            subs = encode_slice_wpp_native(
                0, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
                cfg.log2_min_cu, init_states(_B, qp), mvb=mvb,
                pf8=syn.pf8, poc=poc, poc_refs=poc_refs,
                max_merge=syn.max_merge, sign_hiding=cfg.sign_hiding,
                sao_params=sao_params, qp_map=bqp_map, slice_qp=qp,
                rqt_inter=cfg.rqt_inter)
            escaped = [emulation_prevention(s) for s in subs]
            sw = write_slice_header(
                cfg, B_SLICE, idr=False, poc=poc, slice_qp=qp,
                ref_delta_poc=poc - poc_refs[0],
                ref_delta_poc_after=poc_refs[1] - poc,
                max_merge=syn.max_merge, rps_neg=rps_neg,
                rps_pos=rps_pos, num_entry_points=len(subs) - 1,
                entry_point_offsets=[len(e) for e in escaped[:-1]])
            pre_data = b"".join(escaped)
        else:
            from ..native.entropy_native import encode_slice_native
            sw = write_slice_header(
                cfg, B_SLICE, idr=False, poc=poc, slice_qp=qp,
                ref_delta_poc=poc - poc_refs[0],
                ref_delta_poc_after=poc_refs[1] - poc,
                max_merge=syn.max_merge, rps_neg=rps_neg,
                rps_pos=rps_pos)
            payload, tail_val, tail_bits = encode_slice_native(
                0, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                cfg.width_padded, cfg.height_padded, cfg.log2_ctu,
                cfg.log2_min_cu, init_states(_B, qp), mvb=mvb,
                pf8=syn.pf8, poc=poc, poc_refs=poc_refs,
                max_merge=syn.max_merge, sign_hiding=cfg.sign_hiding,
                sao_params=sao_params, qp_map=bqp_map, slice_qp=qp,
                rqt_inter=cfg.rqt_inter)
            sw.write_bytes(payload)
            if tail_bits:
                sw.write(tail_val, tail_bits)
            sw.align_one()
        nal_type = NalUnitType.TRAIL_R if is_ref else NalUnitType.TRAIL_N
        nals = [(nal_type, sw.get_bytes(), pre_data)]
        if cfg.hash_sei:
            from ..bitstream.sei import write_picture_hash_sei
            nals.append(write_picture_hash_sei(recon.y, recon.cb, recon.cr,
                                               cfg.bit_depth,
                                               int(cfg.hash_sei)))
        stream = annexb_stream(nals)
        self.frame_count += 1
        self.stats.add("B", len(stream) * 8, qp, poc=poc, syn=syn)
        return FrameResult(bitstream=stream, recon=recon, syntax=syn,
                           bits=len(stream) * 8, poc=poc, ftype="B")

    def encode_bgop(self, frames) -> list[FrameResult]:
        """IBPBP: I, then alternating forward P references with one
        non-reference B between each pair (display order in, decode
        order out: results are in DECODE order; FrameResult.syntax.poc
        gives display position for B frames)."""
        results = []
        assert len(frames) >= 1
        r = self.encode_frame(*frames[0])
        self.ref = r.recon
        self.poc = 0
        results.append(r)
        i = 1
        while i < len(frames):
            if i + 1 < len(frames):
                # P at display i+1 (decode first), then B at display i
                prev_ref = self._host_ref()
                prev_poc = self.poc
                rp = self.encode_frame_p(*frames[i + 1], poc_step=2)
                rb = self.encode_frame_b(*frames[i], prev_ref, rp.recon,
                                         prev_poc + 1,
                                         (prev_poc, prev_poc + 2))
                results.extend([rp, rb])
                i += 2
            else:
                r = self.encode_frame_p(*frames[i])
                results.append(r)
                i += 1
        return results

    def encode_minigop(self, frames, qp: int | None = None,
                       device: bool = True) -> list[FrameResult]:
        """Encode one hierarchical mini-GOP against the current
        reference: frames are the NEXT len(frames) display pictures
        (self.poc+1 .. self.poc+L). The anchor P is coded first, then
        recursive-bisection Bs — batched PER PYRAMID LAYER through the
        fused device B pipeline (enc/bframe_tpu.py); interior Bs are
        reference BREFs. Returns results in DECODE order (layer order)
        and leaves self.ref at the anchor."""
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        L = len(frames)
        base = self.poc
        prev_ref = self._host_ref()
        rp = self.encode_frame_p(*frames[-1], qp=qp, poc_step=L)
        results = [rp]
        if L == 1:
            return results
        dpb = {base: prev_ref, base + L: rp.recon}

        sched: list[tuple[int, int, int, bool, int]] = []

        def bisect(lo: int, hi: int, layer: int) -> None:
            if hi - lo < 2:
                return
            mid = (lo + hi) // 2
            sched.append((mid, lo, hi, hi - lo > 2, layer))
            bisect(lo, mid, layer + 1)
            bisect(mid, hi, layer + 1)

        bisect(base, base + L, 1)
        # decode order = layer order (refs of layer k live in layers <k)
        order = sorted(sched, key=lambda e: (e[4], not e[3], e[0]))

        def rps_of(idx, poc, lo, hi):
            needed_later: set[int] = set()
            for _, l2, h2, _, _ in order[idx + 1:]:
                needed_later.update((l2, h2))
            retained = (set(dpb.keys()) & needed_later) | {lo, hi}
            rps_neg = sorted([(poc - p, p == lo)
                              for p in retained if p < poc])
            rps_pos = sorted([(p - poc, p == hi)
                              for p in retained if p > poc])
            return rps_neg, rps_pos

        if not device:
            for i, (poc, lo, hi, is_ref, layer) in enumerate(order):
                rps_neg, rps_pos = rps_of(i, poc, lo, hi)
                bqp = min(qp + (1 if is_ref else 2) + max(layer - 1, 0),
                          51)
                rb = self.encode_frame_b(
                    *frames[poc - base - 1], dpb[lo], dpb[hi], poc,
                    (lo, hi), qp=bqp, is_ref=is_ref, rps_neg=rps_neg,
                    rps_pos=rps_pos)
                if is_ref:
                    dpb[poc] = rb.recon
                results.append(rb)
            self.ref = rp.recon
            self.poc = base + L
            return results

        from .bframe_tpu import encode_bframes_tpu
        i = 0
        while i < len(order):
            # batch a run with the same (layer, is_ref) => same QP
            layer, is_ref = order[i][4], order[i][3]
            j = i
            while j < len(order) and order[j][4] == layer and \
                    order[j][3] == is_ref:
                j += 1
            group = order[i:j]
            bqp = min(qp + (1 if is_ref else 2) + max(layer - 1, 0), 51)
            gframes = [frames[e[0] - base - 1] for e in group]
            ref0s = [dpb[e[1]] for e in group]
            ref1s = [dpb[e[2]] for e in group]
            syns, recons = encode_bframes_tpu(gframes, ref0s, ref1s,
                                              cfg, bqp)
            for k, (poc, lo, hi, iref, lyr) in enumerate(group):
                rps_neg, rps_pos = rps_of(i + k, poc, lo, hi)
                syn = syns[k]
                syn.poc = poc
                syn.poc_refs = (lo, hi)
                rb = self._emit_b_frame(syn, recons[k], bqp, poc,
                                        (lo, hi), iref, rps_neg,
                                        rps_pos, syn.sao_params)
                if iref:
                    dpb[poc] = recons[k]
                results.append(rb)
            i = j
        self.ref = rp.recon
        self.poc = base + L
        return results

    def encode_hier_gop(self, frames, qp: int | None = None
                        ) -> list[FrameResult]:
        """Hierarchical-B GOP (the x265 B-pyramid / random-access
        structure, dpb.cpp:126): I at display 0 then one mini-GOP over
        the rest. QP ladder I: -3, P: 0, BREF: +1, B: +2+layer.
        Returns results in DECODE order."""
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        r0 = self.encode_frame(*frames[0], qp=max(qp - 3, 0))
        self.ref = r0.recon
        self.poc = 0
        results = [r0]
        if len(frames) > 1:
            results.extend(self.encode_minigop(frames[1:], qp=qp))
        return results

    def encode_sequence(self, frames) -> list[FrameResult]:
        """IPPP with keyint + scene-cut frame-type decisions; P runs
        are encoded through the fused GOP pipeline, with per-CTU QP
        maps from the device lookahead (AQ/cuTree) when enabled."""
        from .lookahead import Lookahead
        cfg = self.cfg
        la = Lookahead(cfg)
        types = [la.decide(np.asarray(f[0])) for f in frames]
        # CQP I-frame offset (x265 ipratio 1.4 ~= -3 QP, param.cpp):
        # a finer keyframe pays back across every frame that references
        # it; slice QP is signalled per slice so this is free syntax-wise
        qp_i = max(cfg.qp - 3, 0)
        results: list[FrameResult] = []
        i = 0
        while i < len(frames):
            # GOP = I frame + following P run
            j = i + 1
            while j < len(frames) and types[j] == "P":
                j += 1
            gop = frames[i:j]
            qp_maps = None
            if cfg.dqp_enabled:
                qp_maps = self.lookahead_qp_maps(gop)
            y, cb, cr = gop[0]
            r = self.encode_frame(
                y, cb, cr, qp=qp_i,
                use_device_recon=qp_maps is None,
                qp_map=None if qp_maps is None
                else np.clip(qp_maps[0] - 3, 0, 51))
            self.ref = r.device_ref if r.device_ref is not None \
                else r.recon
            self.poc = 0
            results.append(r)
            if len(gop) > 1:
                results.extend(self.encode_pgop_pipelined(
                    gop[1:], need_recon=True,
                    qp_maps=None if qp_maps is None else qp_maps[1:]))
            i = j
        return results

    def lookahead_qp_maps(self, gop_frames,
                          base_qp: int | None = None) -> np.ndarray:
        """Device lookahead over one GOP: AQ energy + cuTree -> per-CTU
        QP maps (F, ncty, nctx) around the base QP (slicetype.cpp:444,
        :2538 behavior; grid = floor(coded/16) reduced to CTUs)."""
        from .lookahead_tpu import lookahead_gop
        cfg = self.cfg
        base_qp = cfg.qp if base_qp is None else base_qp
        hp, wp = cfg.height_padded, cfg.width_padded
        h16 = hp // 16 * 16
        w16 = wp // 16 * 16
        ys = np.stack([pad_plane(np.asarray(g[0]), hp, wp)[:h16, :w16]
                       for g in gop_frames])
        cbs = np.stack([pad_plane(np.asarray(g[1]), hp // 2, wp // 2)
                        [:h16 // 2, :w16 // 2] for g in gop_frames])
        crs = np.stack([pad_plane(np.asarray(g[2]), hp // 2, wp // 2)
                        [:h16 // 2, :w16 // 2] for g in gop_frames])
        off_ctu, _, _, _ = lookahead_gop(ys, cbs, crs, cfg,
                                         qcomp=cfg.qcomp)
        return np.clip(np.round(base_qp + off_ctu), 0, 51).astype(np.int32)

    def encode_pgop(self, frames, qp: int | None = None,
                    need_recon: bool = True,
                    poc_step: int = 1,
                    qp_maps: np.ndarray | None = None,
                    seeds16: np.ndarray | None = None) -> list[FrameResult]:
        """Fused IPPP GOP: every P frame's ME + mode decision + MC +
        transform + recon + deblock runs as ONE device dispatch
        (lax.scan over the chain; enc/pgop_tpu.py), then per-frame
        native CABAC. The frame-pipeline analog of x265's N
        FrameEncoder threads (frameencoder.cpp:427)."""
        from ..bitstream.ctx_tables import init_states
        from ..native.entropy_native import encode_slice_native
        from .pgop_tpu import encode_pgop_tpu
        assert self.ref is not None, "no reference: encode an I frame first"
        if getattr(getattr(self.ref, "y", None), "ndim", 2) != 3:
            self.ref_avail = 1       # single plane = 1 distinct ref
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        w, h = cfg.width_padded, cfg.height_padded
        nf = len(frames)
        oy = np.stack([pad_plane(np.asarray(f[0]), h, w) for f in frames])
        ocb = np.stack([pad_plane(np.asarray(f[1]), h // 2, w // 2)
                        for f in frames])
        ocr = np.stack([pad_plane(np.asarray(f[2]), h // 2, w // 2)
                        for f in frames])
        want_recon = need_recon or cfg.hash_sei
        wps, wvecs = self._pgop_weights(frames)
        syns, recons, last_ref = encode_pgop_tpu(
            oy, ocb, ocr, self.ref, cfg, qp, need_recon=want_recon,
            me_range=cfg.me_range, qp_maps=qp_maps, seeds16=seeds16,
            weights=wvecs)
        self.ref = last_ref
        self.last_src = frames[-1]
        return self._emit_p_frames(syns, recons, qp, poc_step,
                                   weights_hdr=wps)

    def _pgop_weights(self, frames):
        """Per-frame weightp analysis for a P chunk (source-vs-source,
        weightPrediction.cpp:222 analog). Returns (WeightParams list or
        None, (F, 6) int32 vectors or None)."""
        cfg = self.cfg
        if not cfg.weightp:
            return None, None
        from .weightp import analyse_gop_weights
        wps = analyse_gop_weights(frames, self.last_src, cfg.bit_depth)
        wvecs = np.stack([wp.vec() for wp in wps])
        return wps, wvecs

    def _emit_p_frames(self, syns, recons, qp: int,
                       poc_step: int = 1,
                       weights_hdr=None) -> list[FrameResult]:
        """Slice headers + native CABAC + NAL packaging for a collected
        P chunk (the serial host tail of the pipeline)."""
        from ..bitstream.ctx_tables import init_states
        from ..native.entropy_native import encode_slice_native
        cfg = self.cfg
        w, h = cfg.width_padded, cfg.height_padded
        results = []
        R = max(getattr(cfg, "num_refs", 1), 1)
        tmvp_on = bool(getattr(cfg, "tmvp", False))
        for i, syn in enumerate(syns):
            recon = recons[i]
            sao_params = syn.sao_params
            self.poc += poc_step
            # --- multi-ref bookkeeping (dpb.cpp:126 analog): the DPB
            # holds min(R, frames since IDR) distinct references; the
            # scan's duplicate slots are unreachable by the tie rule
            # but clamp anyway (duplicates hold the same pixels, so a
            # clamped index references identical content)
            avail = max(1, min(R, self.ref_avail))
            syn.num_ref = avail
            syn.poc = self.poc
            syn.ref_pocs = tuple(self.poc - poc_step * (k + 1)
                                 for k in range(avail))
            syn.max_merge = max(syn.max_merge,
                                getattr(cfg, "max_merge", 2))
            if syn.ref8 is not None:
                syn.ref8 = np.minimum(
                    syn.ref8, avail - 1).astype(np.uint8)
                if not syn.ref8.any():
                    syn.ref8 = None
            col = None
            if tmvp_on and self._last_p_syn is not None:
                prev = self._last_p_syn
                syn.col_mv = prev.mv8
                syn.col_ref = prev.ref8 if prev.ref8 is not None \
                    else np.zeros_like(prev.depth8, np.uint8)
                syn.col_inter = np.ones_like(prev.depth8, bool) \
                    if prev.intra8 is None else ~prev.intra8
                syn.col_poc = prev.poc
                syn.col_ref_pocs = prev.ref_pocs or (prev.poc - 1,)
                col = (prev.mv8, syn.col_ref,
                       syn.col_inter.astype(np.uint8), prev.poc,
                       syn.col_ref_pocs)
            self.ref_avail = min(R, avail + 1)
            pre_data = b""
            if cfg.wpp:
                from ..bitstream.nal import emulation_prevention
                from ..native.entropy_native import \
                    encode_slice_wpp_native
                subs = encode_slice_wpp_native(
                    1, syn.depth8, syn.coeff_y, syn.coeff_cb,
                    syn.coeff_cr, w, h, cfg.log2_ctu, cfg.log2_min_cu,
                    init_states(P_SLICE, qp), mv8=syn.mv8,
                    max_merge=syn.max_merge,
                    sign_hiding=cfg.sign_hiding,
                    sao_params=sao_params, qp_map=syn.qp_map,
                    slice_qp=qp, mode8=syn.mode8, intra8=syn.intra8,
                    tusplit8=syn.tusplit8, rqt_inter=cfg.rqt_inter,
                    ref8=syn.ref8, num_ref=syn.num_ref,
                    ref_pocs_l0=syn.ref_pocs, poc=syn.poc,
                    tmvp=tmvp_on, col=col)
                escaped = [emulation_prevention(s) for s in subs]
                sw = write_slice_header(
                    cfg, P_SLICE, idr=False, poc=self.poc,
                    ref_delta_poc=poc_step, max_merge=syn.max_merge,
                    slice_qp=qp, num_entry_points=len(subs) - 1,
                    entry_point_offsets=[len(e) for e in escaped[:-1]],
                    weights=None if weights_hdr is None
                    else weights_hdr[i], num_ref=syn.num_ref,
                    tmvp=tmvp_on)
                pre_data = b"".join(escaped)
            else:
                sw = write_slice_header(cfg, P_SLICE, idr=False,
                                        poc=self.poc,
                                        ref_delta_poc=poc_step,
                                        max_merge=syn.max_merge,
                                        slice_qp=qp,
                                        weights=None if weights_hdr is
                                        None else weights_hdr[i],
                                        num_ref=syn.num_ref,
                                        tmvp=tmvp_on)
                payload, tail_val, tail_bits = encode_slice_native(
                    1, syn.depth8, syn.coeff_y, syn.coeff_cb,
                    syn.coeff_cr, w, h, cfg.log2_ctu, cfg.log2_min_cu,
                    init_states(P_SLICE, qp), mv8=syn.mv8,
                    max_merge=syn.max_merge,
                    sign_hiding=cfg.sign_hiding,
                    sao_params=sao_params, qp_map=syn.qp_map,
                    slice_qp=qp, mode8=syn.mode8, intra8=syn.intra8,
                    tusplit8=syn.tusplit8, rqt_inter=cfg.rqt_inter,
                    ref8=syn.ref8, num_ref=syn.num_ref,
                    ref_pocs_l0=syn.ref_pocs, poc=syn.poc,
                    tmvp=tmvp_on, col=col)
                sw.write_bytes(payload)
                if tail_bits:
                    sw.write(tail_val, tail_bits)
                sw.align_one()
            nals = [(NalUnitType.TRAIL_R, sw.get_bytes(), pre_data)]
            if cfg.hash_sei:
                from ..bitstream.sei import write_picture_hash_sei
                nals.append(write_picture_hash_sei(
                    recon.y, recon.cb, recon.cr, cfg.bit_depth,
                    int(cfg.hash_sei)))
            stream = annexb_stream(nals)
            self.frame_count += 1
            self.stats.add("P", len(stream) * 8, qp, poc=self.poc,
                           syn=syn)
            self._last_p_syn = syn     # TMVP collocated for the next P
            results.append(FrameResult(bitstream=stream, recon=recon,
                                       syntax=syn, bits=len(stream) * 8,
                                       poc=self.poc, ftype="P"))
        return results

    def encode_dup_frame(self, qp: int | None = None) -> FrameResult:
        """Encode a DUPLICATE frame as an all-skip P picture (the CFR
        frame-duplication analog, encoder.cpp:172-217): every CTU is a
        zero-MV skip CU, so the reconstruction equals the reference
        exactly at a few dozen bytes. Requires max_merge >= 2 (the
        zero merge candidate is always reachable then)."""
        from ..bitstream.syntax import FramePSyntax
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        assert self.ref is not None, "no reference to duplicate"
        w, h = cfg.width_padded, cfg.height_padded
        n8y, n8x = h // 8, w // 8
        syn = FramePSyntax(
            depth8=np.zeros((n8y, n8x), np.uint8),
            mv8=np.zeros((n8y, n8x, 2), np.int32),
            coeff_y=np.zeros((h, w), np.int32),
            coeff_cb=np.zeros((h // 2, w // 2), np.int32),
            coeff_cr=np.zeros((h // 2, w // 2), np.int32))
        from .intra_recon import DeviceRef
        recon = self.ref.to_recon() if isinstance(self.ref, DeviceRef) \
            else self.ref
        rs = self._emit_p_frames([syn], [recon], qp)
        # the duplicate occupies the newest DPB slot with the SAME
        # pixels; restart the multi-ref chain from it so the device
        # carry matches the decoder's reference list
        self.ref = recon
        self.ref_avail = 1
        return rs[0]

    def encode_pgop_pipelined(self, frames, qp: int | None = None,
                              chunk: int = 8, need_recon: bool = False,
                              qp_maps: np.ndarray | None = None,
                              poc_step: int = 1) -> list[FrameResult]:
        """Software-pipelined IPPP: submit device work for chunk k+1
        BEFORE collecting chunk k, so H2D upload + the fused scan of
        the next chunk overlap the D2H download + host CABAC of the
        previous one — the host-boundary analog of x265's N in-flight
        FrameEncoder threads (frameencoder.cpp:427). Reference chaining
        stays device-side (DeviceRef), so submission never blocks."""
        from .pgop_tpu import collect_pgop_tpu, submit_pgop_tpu
        assert self.ref is not None, "no reference: encode an I frame first"
        if getattr(getattr(self.ref, "y", None), "ndim", 2) != 3:
            self.ref_avail = 1       # single plane = 1 distinct ref
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        w, h = cfg.width_padded, cfg.height_padded
        want_recon = need_recon or cfg.hash_sei

        def stack(chunk_frames):
            oy = np.stack([pad_plane(np.asarray(f[0]), h, w)
                           for f in chunk_frames])
            ocb = np.stack([pad_plane(np.asarray(f[1]), h // 2, w // 2)
                            for f in chunk_frames])
            ocr = np.stack([pad_plane(np.asarray(f[2]), h // 2, w // 2)
                            for f in chunk_frames])
            return oy, ocb, ocr

        # pipeline order matters on this backend: the D2H link serves
        # ~30 MB/s and transfers QUEUE BEHIND already-submitted device
        # work, so chunk k's results are downloaded BEFORE chunk k+1's
        # scan is enqueued; only the serial host tail (CABAC + NAL)
        # overlaps the next chunk's device compute.
        results: list[FrameResult] = []
        pend_emit = None
        for s in range(0, len(frames), chunk):
            ck = frames[s:s + chunk]
            qmk = None if qp_maps is None else qp_maps[s:s + chunk]
            oy, ocb, ocr = stack(ck)
            wps, wvecs = self._pgop_weights(ck)
            pend = submit_pgop_tpu(oy, ocb, ocr, self.ref, cfg, qp,
                                   need_recon=want_recon,
                                   me_range=cfg.me_range, qp_maps=qmk,
                                   weights=wvecs)
            self.ref = pend.last_ref
            self.last_src = ck[-1]
            if pend_emit is not None:
                results.extend(self._emit_p_frames(
                    *pend_emit[:2], qp, poc_step,
                    weights_hdr=pend_emit[2]))
            syns, recons, _ = collect_pgop_tpu(pend)
            pend_emit = (syns, recons, wps)
        if pend_emit is not None:
            results.extend(self._emit_p_frames(
                *pend_emit[:2], qp, poc_step, weights_hdr=pend_emit[2]))
        return results

    def encode_gop(self, frames: list[tuple[np.ndarray, np.ndarray,
                                            np.ndarray]],
                   need_recon: bool = True) -> list[FrameResult]:
        """Encode a batch of frames through the GOP-batched device
        pipeline: fused analysis + one wavefront scan for all frames
        (the frame-threads analog, SURVEY.md §2.5), then per-frame
        native CABAC."""
        from ..bitstream.ctx_tables import init_states
        from ..native.entropy_native import encode_slice_native
        from .intra_recon_tpu import reconstruct_intra_gop_tpu
        cfg = self.cfg
        w, h = cfg.width_padded, cfg.height_padded
        nf = len(frames)
        dt = np.uint8 if cfg.bit_depth == 8 else np.uint16

        def stack(idx, hh, ww):
            out = np.empty((nf, hh, ww), dt)
            for i, f in enumerate(frames):
                p = np.asarray(f[idx])
                out[i, :p.shape[0], :p.shape[1]] = p
                if p.shape[0] < hh:
                    out[i, p.shape[0]:] = out[i, p.shape[0] - 1]
                if p.shape[1] < ww:
                    out[i, :, p.shape[1]:] = out[i, :, p.shape[1] - 1,
                                                 None]
            return out

        ys = stack(0, h, w)
        cbs = stack(1, h // 2, w // 2)
        crs = stack(2, h // 2, w // 2)
        depth8, mode8, nxn8, mode4 = analyze_intra_gop(
            ys, cfg.qp, cfg.ctu_size, cfg.bit_depth,
            intra_nxn=cfg.intra_nxn)
        cmode8 = analyze_chroma_gop(cbs, crs, depth8, mode8, cfg.qp,
                                    cfg.bit_depth)
        syns, recons = reconstruct_intra_gop_tpu(
            ys, cbs, crs, depth8, mode8, cfg, need_recon=need_recon,
            cmode8=cmode8, nxn8=nxn8, mode4=mode4)
        if cfg.deblock:
            import jax.numpy as jnp
            from ..ops.deblock import deblock_frame
            recons = [
                ReconFrame(*[np.asarray(p) for p in deblock_frame(
                    jnp.asarray(r.y), jnp.asarray(r.cb), jnp.asarray(r.cr),
                    depth8[f], cfg.ctu_size, cfg.qp, cfg.bit_depth)])
                for f, r in enumerate(recons)]
        results = []
        for f, syn in enumerate(syns):
            sw = write_slice_header(cfg, I_SLICE, idr=True)
            payload, tail_val, tail_bits = encode_slice_native(
                2, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
                w, h, cfg.log2_ctu, cfg.log2_min_cu,
                init_states(I_SLICE, cfg.qp), mode8=syn.mode8,
                sign_hiding=cfg.sign_hiding, cmode8=syn.cmode8,
                nxn8=syn.nxn8, mode4=syn.mode4)
            sw.write_bytes(payload)
            if tail_bits:
                sw.write(tail_val, tail_bits)
            sw.align_one()
            nals: list[tuple[NalUnitType, bytes]] = []
            if self.frame_count == 0:
                nals.extend(self.headers())
            nals.append((NalUnitType.IDR_W_RADL, sw.get_bytes()))
            stream = annexb_stream(nals)
            self.frame_count += 1
            results.append(FrameResult(bitstream=stream, recon=recons[f],
                                       syntax=syn, bits=len(stream) * 8))
        return results
