"""Analysis save/load (encoder.cpp writeAnalysisFile/readAnalysisFile
analog): pass 1 saves decisions, pass 2 loads them as ME seeds and the
stream still decodes."""

import os
import tempfile
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

import numpy as np

from x265_tpu.cli import main as cli_main
from x265_tpu.decoder import decode_annexb


def _write_yuv(path, frames):
    with open(path, "wb") as f:
        for y, cb, cr in frames:
            f.write(y.tobytes())
            f.write(cb.tobytes())
            f.write(cr.tobytes())


def test_analysis_save_then_load():
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    frames = [(np.roll(base, 3 * i, axis=1), cb, cb) for i in range(4)]
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.yuv")
        _write_yuv(src, frames)
        out1 = os.path.join(td, "p1.hevc")
        out2 = os.path.join(td, "p2.hevc")
        npz = os.path.join(td, "analysis.npz")
        rc = cli_main([src, "--input-res", f"{w}x{h}", "-o", out1,
                       "-q", "32", "--preset", "ultrafast",
                       "--bframes", "0", "--analysis-save", npz])
        assert rc == 0 and os.path.exists(npz)
        rc = cli_main([src, "--input-res", f"{w}x{h}", "-o", out2,
                       "-q", "32", "--preset", "ultrafast",
                       "--bframes", "0", "--analysis-load", npz])
        assert rc == 0
        dec = decode_annexb(open(out2, "rb").read())
        assert len(dec) == 4
        # the reused-analysis encode should track pass 1 closely
        sz1 = os.path.getsize(out1)
        sz2 = os.path.getsize(out2)
        assert abs(sz1 - sz2) < 0.3 * sz1
