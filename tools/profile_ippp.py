#!/usr/bin/env python
"""End-to-end IPPP stage breakdown at 1080p: device scan vs transfers
vs host CABAC. Run on the TPU (default) to see the real pipeline."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x265_tpu.common.params import EncoderConfig  # noqa: E402
from x265_tpu.common.tables import chroma_qp  # noqa: E402
from x265_tpu.enc import IntraEncoder  # noqa: E402
from x265_tpu.enc.pgop_tpu import _pgop_scan  # noqa: E402
from bench import synth_1080p  # noqa: E402


def main():
    gop = int(os.environ.get("BENCH_GOP", "8"))
    print("devices:", jax.devices(), flush=True)
    cfg = EncoderConfig(width=1920, height=1080, qp=32, deblock=True,
                        sao=False)
    enc = IntraEncoder(cfg)
    frames = [synth_1080p(i % 3, shift=2 * i) for i in range(gop)]

    # --- I frame
    t0 = time.perf_counter()
    r0 = enc.encode_frame(*frames[0], qp=cfg.qp - 3,
                          use_device_recon=True)
    print(f"I frame (cold): {time.perf_counter()-t0:.2f}s", flush=True)
    enc.ref = r0.recon
    t0 = time.perf_counter()
    r0b = enc.encode_frame(*frames[0], qp=cfg.qp - 3,
                           use_device_recon=True)
    print(f"I frame (warm): {time.perf_counter()-t0:.2f}s", flush=True)

    # --- P GOP staged
    from x265_tpu.enc.encoder import pad_plane
    w, h = cfg.width_padded, cfg.height_padded
    pf = frames[1:]
    f = len(pf)
    oy = np.stack([pad_plane(np.asarray(x[0]), h, w) for x in pf])
    ocb = np.stack([pad_plane(np.asarray(x[1]), h // 2, w // 2)
                    for x in pf])
    ocr = np.stack([pad_plane(np.asarray(x[2]), h // 2, w // 2)
                    for x in pf])
    hp = (h + 31) // 32 * 32
    wp = (w + 31) // 32 * 32
    qp, qpc = cfg.qp, chroma_qp(cfg.qp)

    def upload():
        def padp(p, ph, pw):
            pads = ((0, 0), (0, ph - p.shape[-2]), (0, pw - p.shape[-1]))
            if p.ndim == 2:
                pads = pads[1:]
            return np.pad(p, pads, mode="edge").astype(np.uint8)
        j = (jnp.asarray(padp(oy, hp, wp).reshape(f * hp, wp))
             .reshape(f, hp, wp),
             jnp.asarray(padp(ocb, hp // 2, wp // 2)
                         .reshape(f * (hp // 2), wp // 2))
             .reshape(f, hp // 2, wp // 2),
             jnp.asarray(padp(ocr, hp // 2, wp // 2)
                         .reshape(f * (hp // 2), wp // 2))
             .reshape(f, hp // 2, wp // 2),
             jnp.asarray(padp(np.asarray(enc.ref.y)[None], hp, wp)[0]),
             jnp.asarray(padp(np.asarray(enc.ref.cb)[None],
                              hp // 2, wp // 2)[0]),
             jnp.asarray(padp(np.asarray(enc.ref.cr)[None],
                              hp // 2, wp // 2)[0]))
        jax.block_until_ready(j)
        return j

    t0 = time.perf_counter()
    oyj, ocbj, ocrj, ry, rcb, rcr = upload()
    print(f"H2D upload+pad: {time.perf_counter()-t0:.2f}s", flush=True)

    def dispatch():
        return _pgop_scan(ry, rcb, rcr, oyj, ocbj, ocrj, qp=qp, qpc=qpc,
                          bit_depth=8, real_h=h, real_w=w, ctu=32,
                          deblock=True, sao=False, sign_hiding=True,
                          me_range=cfg.me_range, need_recon=False)

    res, fin = dispatch()          # compile+warm
    _ = [np.asarray(r) for r in res]
    t0 = time.perf_counter()
    res, fin = dispatch()
    # force via tiny reduction fetch (axon block_until_ready caveat)
    s = float(jnp.sum(res[0].astype(jnp.int32)))
    print(f"device scan ({f} P frames): {time.perf_counter()-t0:.2f}s",
          flush=True)

    t0 = time.perf_counter()
    host = [np.asarray(r) for r in res]
    print(f"D2H results: {time.perf_counter()-t0:.2f}s "
          f"({sum(r.nbytes for r in host)/1e6:.1f} MB)", flush=True)
    for i, r in enumerate(host):
        print(f"  res[{i}]: {r.shape} {r.dtype} {r.nbytes/1e6:.2f} MB",
              flush=True)

    # --- full encode_pgop (includes syntax + native CABAC)
    enc2 = IntraEncoder(cfg)
    enc2.ref = r0.recon
    t0 = time.perf_counter()
    rs = enc2.encode_pgop(pf, need_recon=False)
    dt = time.perf_counter() - t0
    print(f"encode_pgop total: {dt:.2f}s -> {f/dt:.2f} fps (P only)",
          flush=True)

    # isolate CABAC: re-run syntax coding on host arrays
    from x265_tpu.bitstream.ctx_tables import init_states
    from x265_tpu.native.entropy_native import encode_slice_native
    t0 = time.perf_counter()
    nbytes = 0
    for r in rs:
        syn = r.syntax
        payload, tv, tb = encode_slice_native(
            1, syn.depth8, syn.coeff_y, syn.coeff_cb, syn.coeff_cr,
            w, h, cfg.log2_ctu, cfg.log2_min_cu, init_states(1, qp),
            mv8=syn.mv8, max_merge=syn.max_merge, sign_hiding=True)
        nbytes += len(payload)
    print(f"native CABAC x{f}: {time.perf_counter()-t0:.2f}s "
          f"({nbytes/1e3:.0f} kB)", flush=True)


if __name__ == "__main__":
    main()
