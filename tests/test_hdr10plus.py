"""HDR10+ (ST 2094-40) dynamic metadata: JSON -> per-frame T.35 SEI.
Reference behavior: x265 dynamicHDR10/metadataFromJson.cpp
fillMetadataArray + frameencoder.cpp:1105 SEI insertion."""

import json

import numpy as np

from x265_tpu.bitstream.hdr10plus import (frame_payload, load_payloads,
                                          parse_t35_seis, write_t35_sei)

LLC_FRAME = {
    "LuminanceParameters": {
        "AverageRGB": 1200,
        "MaxScl": [40000, 35000, 30000],
        "LuminanceDistributions": {
            "DistributionIndex": [1, 5, 10, 25, 50, 75, 90, 95, 99],
            "DistributionValues": [10, 200, 1000, 5000, 10000, 20000,
                                   30000, 40000, 65600],
        },
    },
    "BezierCurveData": {
        "KneePointX": 100, "KneePointY": 200,
        "Anchors": [102, 205, 307, 410, 512, 614, 717, 819, 922],
    },
    "TargetedSystemDisplayMaximumLuminance": 400,
}


def test_llc_payload_bit_layout():
    p = frame_payload(LLC_FRAME, llc=True)
    # header: B5 003C 0001, app id 4, app version 1 (LLC)
    assert p[:7] == bytes.fromhex("b5003c00010401")
    # num_windows(2)=1 then 27-bit target luminance 400 then flag 0:
    # bits 01 + 27 bits of 400 + 0 + first bit of maxscl[0]
    b = int.from_bytes(p[7:12], "big")
    assert (b >> 38) == 0b01                      # num_windows
    assert (b >> 11) & 0x7FFFFFF == 400           # monitor peak
    assert (b >> 10) & 1 == 0                     # actual_peak flag
    # maxscl[0] = 40000 -> 17-bit field; its top 10 bits close b
    assert b & 0x3FF == 40000 >> 7


def test_llc_payload_contents_roundtrip():
    p = frame_payload(LLC_FRAME, llc=True)
    # 9 percentiles with 17-bit value 65600 exercises the high bit
    assert len(p) > 30
    nal_type, rbsp = write_t35_sei(p)
    got = parse_t35_seis(rbsp)
    assert got == [p]


def test_legacy_payload_differs_only_in_version_field():
    legacy = {
        "LuminanceParameters": {
            "AverageRGB": 1200,
            "MaxScl0": 40000, "MaxScl1": 35000, "MaxScl2": 30000,
            "PercentileLuminance": {
                "NumberOfPercentiles": 9,
                **{f"PercentilePercentage{i}": v for i, v in
                   enumerate([1, 5, 10, 25, 50, 75, 90, 95, 99])},
                **{f"PercentileLuminance{i}": v for i, v in
                   enumerate([10, 200, 1000, 5000, 10000, 20000,
                              30000, 40000, 65600])},
            },
        },
        "BezierCurveData": {
            "KneePointX": 100, "KneePointY": 200, "NumberOfAnchors": 9,
            **{f"Anchor{i}": v for i, v in
               enumerate([102, 205, 307, 410, 512, 614, 717, 819, 922])},
        },
        "TargetedSystemDisplayMaximumLuminance": 400,
        "NumberOfWindows": 1,
        "LocalParameters": [],
    }
    pl = frame_payload(legacy, llc=False)
    pllc = frame_payload(LLC_FRAME, llc=True)
    # same fields -> identical bits except application_version (byte 6)
    assert pl[6] == 0 and pllc[6] == 1
    assert pl[:6] == pllc[:6] and pl[7:] == pllc[7:]


def test_local_window_bezier_curve():
    """Legacy multi-window frames source each local window's tone
    curve from LocalParameters[w-1].BezierCurveData
    (metadataFromJson.cpp:563-566), not the global frame curve."""
    local_curve = {
        "KneePointX": 7, "KneePointY": 9, "NumberOfAnchors": 2,
        "Anchor0": 11, "Anchor1": 13,
    }
    frame = {
        "LuminanceParameters": {"AverageRGB": 10,
                                "MaxScl0": 1, "MaxScl1": 2, "MaxScl2": 3,
                                "PercentileLuminance": {}},
        "BezierCurveData": {
            "KneePointX": 100, "KneePointY": 200, "NumberOfAnchors": 1,
            "Anchor0": 999,
        },
        "TargetedSystemDisplayMaximumLuminance": 400,
        "NumberOfWindows": 2,
        "LocalParameters": [{"WindowData": {}, "EllipseData": {},
                             "BezierCurveData": local_curve}],
    }
    p = frame_payload(frame, llc=False)
    bits = "".join(f"{b:08b}" for b in p)
    # global curve (window 0): flag 1, knee 100/200, 1 anchor = 999
    g = "1" + f"{100:012b}" + f"{200:012b}" + f"{1:04b}" + f"{999:010b}"
    # local curve (window 1): knee 7/9, anchors 11, 13
    l = "1" + f"{7:012b}" + f"{9:012b}" + f"{2:04b}" + \
        f"{11:010b}" + f"{13:010b}"
    i = bits.find(g)
    assert i >= 0
    assert bits[i + len(g):i + len(g) + len(l)] == l
    # dropping the local curve data yields tone_mapping_flag 0
    frame["LocalParameters"] = [{}]
    p2 = frame_payload(frame, llc=False)
    bits2 = "".join(f"{b:08b}" for b in p2)
    j = bits2.find(g)
    assert j >= 0 and bits2[j + len(g)] == "0"


def test_load_payloads_scene_info(tmp_path):
    f = tmp_path / "meta.json"
    f.write_text(json.dumps({"SceneInfo": [LLC_FRAME, LLC_FRAME]}))
    ps = load_payloads(str(f))
    assert len(ps) == 2 and ps[0] == ps[1]
    assert ps[0][0] == 0xB5


def test_cli_dhdr10_and_chunk(tmp_path):
    """--dhdr10-info attaches one T.35 SEI per frame; --chunk-start/
    --chunk-end bound the encoded frame range."""
    import subprocess
    import sys
    from x265_tpu.io.y4m import Y4MWriter
    src = tmp_path / "in.y4m"
    wtr = Y4MWriter(str(src), 64, 64, 25, 1, 8)
    yy, xx = np.mgrid[0:64, 0:64]
    for i in range(4):
        y = ((xx * 3 + yy * 2 + 7 * i) % 256).astype(np.uint8)
        c = np.full((32, 32), 128, np.uint8)
        wtr.write_frame(y, c, c)
    wtr.close()
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps({"SceneInfo": [LLC_FRAME] * 4}))
    out = tmp_path / "out.hevc"
    r = subprocess.run(
        [sys.executable, "-m", "x265_tpu.cli", str(src), "-o", str(out),
         "--qp", "32", "--dhdr10-info", str(meta),
         "--chunk-start", "2", "--chunk-end", "3"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    data = out.read_bytes()
    # chunk of 2 frames, each with one HDR10+ prefix SEI
    from x265_tpu.decoder import decode_annexb
    assert len(decode_annexb(data)) == 2
    want = frame_payload(LLC_FRAME, llc=True)
    assert data.count(want[:16]) == 2
