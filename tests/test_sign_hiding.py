"""Sign-bit hiding: kernel parity, decode round-trip, bit savings."""

import numpy as np

from x265_tpu.common.params import EncoderConfig
from x265_tpu.decoder import decode_annexb
from x265_tpu.enc import IntraEncoder
from x265_tpu.ops.transforms import sign_hide_np, sign_hide_batch


def test_sign_hide_batch_matches_oracle():
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    for scan in (0, 1, 2):
        blks = rng.integers(-6, 7, (40, 8, 8)).astype(np.int32)
        blks[rng.random((40, 8, 8)) < 0.5] = 0
        dus = rng.integers(-256, 256, (40, 8, 8)).astype(np.int32)
        ref = np.stack([sign_hide_np(b, scan, d)
                        for b, d in zip(blks, dus)])
        out = np.asarray(sign_hide_batch(jnp.asarray(blks), 8, scan,
                                         jnp.asarray(dus)))
        np.testing.assert_array_equal(out, ref, err_msg=f"scan {scan}")
        # parity invariant: every hidden CG satisfies the decoder rule
        for b in ref:
            from x265_tpu.ops.transforms import _cg_perm
            perm = _cg_perm(scan)
            for cy in range(2):
                for cx in range(2):
                    lv = b[cy * 4:cy * 4 + 4, cx * 4:cx * 4 + 4] \
                        .reshape(-1)[perm]
                    nz = np.nonzero(lv)[0]
                    if len(nz) and nz[-1] - nz[0] > 3:
                        neg = 1 if lv[nz[0]] < 0 else 0
                        assert (int(np.abs(lv).sum()) & 1) == neg


def test_sign_hide_tie_breaking_matches_oracle():
    """deltaU ties must resolve in scan order, lower-before-raise,
    exactly like the sequential oracle (x265 quant.cpp:316 scans in
    scan order; the batched rank formulation tie-breaks via a packed
    lexicographic key). Regression: raster-order argmin picked a
    different coefficient whenever costs tied."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    for scan in (0, 1, 2):
        blks = rng.integers(-4, 5, (60, 8, 8)).astype(np.int32)
        blks[rng.random((60, 8, 8)) < 0.45] = 0
        # tiny du alphabet -> ties everywhere
        dus = rng.integers(-1, 2, (60, 8, 8)).astype(np.int32)
        ref = np.stack([sign_hide_np(b, scan, d)
                        for b, d in zip(blks, dus)])
        out = np.asarray(sign_hide_batch(jnp.asarray(blks), 8, scan,
                                         jnp.asarray(dus)))
        np.testing.assert_array_equal(out, ref, err_msg=f"scan {scan}")


def _clip(nf, h, w, seed=21):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 7 + yy * 5) % 180 + 30).astype(np.int32)
    out = []
    for i in range(nf):
        y = np.clip(np.roll(base, i * 2, axis=1) +
                    rng.integers(-8, 8, (h, w)), 0, 255).astype(np.uint8)
        cb = np.clip(110 + (xx[::2, ::2] >> 5), 0, 255).astype(np.uint8)
        cr = np.full((h // 2, w // 2), 130, np.uint8)
        out.append((y, cb, cr))
    return out


def test_sign_hiding_decodes_and_hides_signs():
    """(a) Streams with SBH on decode bit-exact (fused + host I path);
    (b) with the SAME parity-enforced coefficients, CABAC with hiding
    codes strictly fewer bits (hidden CGs exist and skip one sign).
    Net RD benefit is a BD-rate property, checked by the rate-quality
    harness, not at equal QP here."""
    from dataclasses import replace
    from x265_tpu.bitstream.syntax import SliceSyntaxEncoder
    from x265_tpu.common.params import P_SLICE
    h, w = 64, 96
    frames = _clip(3, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=26, deblock=True,
                        sao=False, sign_hiding=True)
    enc = IntraEncoder(cfg)
    r0 = enc.encode_frame(*frames[0])
    enc.ref = r0.recon
    enc.poc = 0
    rs = enc.encode_pgop(frames[1:])
    stream = r0.bitstream + b"".join(r.bitstream for r in rs)
    dec = decode_annexb(stream)
    for i, df in enumerate(dec):
        rec = r0.recon if i == 0 else rs[i - 1].recon
        np.testing.assert_array_equal(df.y, rec.y)
        np.testing.assert_array_equal(df.cb, rec.cb)
        np.testing.assert_array_equal(df.cr, rec.cr)

    # same syntax, CABAC with vs without hiding: strictly fewer bits
    syn = rs[0].syntax
    on = SliceSyntaxEncoder(cfg, syn, P_SLICE, 26).encode_slice_data()
    cfg_off = replace(cfg, sign_hiding=False)
    off = SliceSyntaxEncoder(cfg_off, syn, P_SLICE, 26) \
        .encode_slice_data()
    assert len(on.finish()) < len(off.finish())
