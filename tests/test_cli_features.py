"""CLI feature coverage: qpfile, zones, csv-log-level, tune flag,
ssim reporting (x265cli surface analogs)."""

import os
import tempfile
import pytest

# full e2e tier: runs in the nightly regression pass (pytest -m
# regression) — the default tier keeps the smoke e2e in test_smoke.py
pytestmark = pytest.mark.regression

import numpy as np

from x265_tpu.cli import main as cli_main
from x265_tpu.decoder import decode_annexb


def _yuv(path, n=4, h=64, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            f.write(np.roll(base, 2 * i, axis=1).tobytes())
            f.write(cb.tobytes())
            f.write(cb.tobytes())
    return w, h


def test_qpfile_and_zones_and_csv():
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.yuv")
        w, h = _yuv(src)
        qpf = os.path.join(td, "qp.txt")
        with open(qpf, "w") as f:
            f.write("0 I 30\n2 I 36\n")      # force IDR at frame 2
        out = os.path.join(td, "out.hevc")
        csvp = os.path.join(td, "s.csv")
        rc = cli_main([src, "--input-res", f"{w}x{h}", "-o", out,
                       "--preset", "ultrafast", "--bframes", "0",
                       "--qpfile", qpf, "--zones", "3,3,qp=45",
                       "--csv", csvp, "--csv-log-level", "1",
                       "--ssim"])
        assert rc == 0
        dec = decode_annexb(open(out, "rb").read())
        assert len(dec) == 4
        # frame 2 forced intra at qp 36; frame 3 zone qp 45
        rows = open(csvp).read().strip().splitlines()
        assert rows[0].startswith("poc,type,qp,bits,psnr_y,cu_pct_d0")
        recs = [r.split(",") for r in rows[1:]]
        assert recs[2][1] == "I" and recs[2][2] == "36"
        assert recs[3][2] == "45"


def test_hdr10_vui_and_seis():
    """--sar/--range/--colorprim/--transfer/--colormatrix/--chromaloc
    land in the SPS VUI; --master-display/--max-cll emit the HDR10
    static-metadata SEIs (D.2.28/D.2.35) on keyframes; the stream
    still decodes bit-exact."""
    from x265_tpu.bitstream.nal import split_annexb
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.yuv")
        w, h = _yuv(src, n=2)
        out = os.path.join(td, "out.hevc")
        rc = cli_main([src, "--input-res", f"{w}x{h}", "-o", out,
                       "--preset", "ultrafast", "--bframes", "0",
                       "--sar", "1:1", "--range", "full",
                       "--colorprim", "bt2020",
                       "--transfer", "smpte2084",
                       "--colormatrix", "bt2020nc", "--chromaloc", "2",
                       "--master-display",
                       "G(13250,34500)B(7500,3000)R(34000,16000)"
                       "WP(15635,16450)L(10000000,1)",
                       "--max-cll", "1000,400"])
        assert rc == 0
        bs = open(out, "rb").read()
        assert len(decode_annexb(bs)) == 2
        seis = [rb for t, rb, _ in split_annexb(bs) if int(t) == 39]
        ptypes = {rb[0] for rb in seis}
        assert {137, 144} <= ptypes
        # mastering display payload content round-trips
        md = next(rb for rb in seis if rb[0] == 137)
        body = md[2:]                       # type, size, payload
        import struct
        vals = struct.unpack(">8H2I", body[:24])
        assert vals == (13250, 34500, 7500, 3000, 34000, 16000,
                        15635, 16450, 10000000, 1)
