"""Bit writer / reader, Exp-Golomb, NAL emulation prevention tests.

Models x265's testbench style (reference: source/test/) — randomized
round-trips against independent re-implementations.
"""

import random

import pytest

from x265_tpu.bitstream import BitWriter, BitReader
from x265_tpu.bitstream.nal import (
    emulation_prevention, remove_emulation_prevention, wrap_nal,
    split_annexb, NalUnitType,
)


def test_bitwriter_basic():
    w = BitWriter()
    w.write(0b101, 3)
    w.write(0b11111, 5)
    assert w.get_bytes() == bytes([0b10111111])


def test_bitwriter_cross_byte():
    w = BitWriter()
    w.write(0x1234, 16)
    w.write(1, 1)
    w.align_zero()
    assert w.get_bytes() == bytes([0x12, 0x34, 0x80])


def test_ue_known_values():
    # ue(v) examples from the spec: 0->1, 1->010, 2->011, 3->00100
    for val, bits in [(0, "1"), (1, "010"), (2, "011"), (3, "00100"),
                      (4, "00101"), (5, "00110"), (6, "00111"), (7, "0001000")]:
        w = BitWriter()
        w.write_ue(val)
        w.align_zero()
        got = "".join(f"{b:08b}" for b in w.get_bytes())[: len(bits)]
        assert got == bits, val


def test_ue_se_roundtrip():
    rng = random.Random(42)
    vals_ue = [rng.randrange(0, 100000) for _ in range(500)]
    vals_se = [rng.randrange(-50000, 50000) for _ in range(500)]
    w = BitWriter()
    for v in vals_ue:
        w.write_ue(v)
    for v in vals_se:
        w.write_se(v)
    w.align_one()
    r = BitReader(w.get_bytes())
    for v in vals_ue:
        assert r.read_ue() == v
    for v in vals_se:
        assert r.read_se() == v


def test_emulation_prevention():
    cases = [
        (b"\x00\x00\x00", b"\x00\x00\x03\x00"),
        (b"\x00\x00\x01", b"\x00\x00\x03\x01"),
        (b"\x00\x00\x02", b"\x00\x00\x03\x02"),
        (b"\x00\x00\x03", b"\x00\x00\x03\x03"),
        (b"\x00\x00\x04", b"\x00\x00\x04"),
        (b"\x00\x00\x00\x00\x00", b"\x00\x00\x03\x00\x00\x03\x00"),
        (b"\xff\x00\x00\x01\xff", b"\xff\x00\x00\x03\x01\xff"),
    ]
    for rbsp, ebsp in cases:
        assert emulation_prevention(rbsp) == ebsp
        assert remove_emulation_prevention(ebsp) == rbsp


def test_emulation_prevention_random_roundtrip():
    rng = random.Random(7)
    for _ in range(200):
        rbsp = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in
                     range(rng.randrange(0, 64)))
        assert remove_emulation_prevention(emulation_prevention(rbsp)) == rbsp


def test_nal_wrap_and_split():
    rbsp1 = b"\x42\x00\x00\x01\x99"
    rbsp2 = b"\x00\x00\x00\x00"
    stream = (wrap_nal(NalUnitType.SPS, rbsp1) +
              wrap_nal(NalUnitType.PPS, rbsp2, long_start_code=False))
    units = split_annexb(stream)
    assert [t for t, _, _ in units] == [int(NalUnitType.SPS),
                                        int(NalUnitType.PPS)]
    assert units[0][1] == rbsp1
    assert units[1][1] == rbsp2


def test_more_rbsp_data():
    w = BitWriter()
    w.write_ue(5)
    w.align_one()
    r = BitReader(w.get_bytes())
    assert r.more_rbsp_data()
    r.read_ue()
    assert not r.more_rbsp_data()
