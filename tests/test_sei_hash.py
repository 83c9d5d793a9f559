"""Decoded-picture-hash SEI: streams are self-validating."""

import numpy as np
import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder
from x265_tpu.decoder import decode_annexb

from test_inter_e2e import moving_sequence


def test_hash_sei_verifies():
    cfg = EncoderConfig(width=64, height=64, qp=31, hash_sei=True)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(64, 64, 3, seed=12)
    results = enc.encode_sequence(frames)
    stream = b"".join(r.bitstream for r in results)
    decs = decode_annexb(stream)   # raises on hash mismatch
    assert len(decs) == 3


def test_hash_sei_detects_corruption():
    cfg = EncoderConfig(width=64, height=64, qp=31, hash_sei=True)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(64, 64, 2, seed=13)
    results = enc.encode_sequence(frames)
    stream = bytearray(b"".join(r.bitstream for r in results))
    # flip a bit inside the first slice payload (well past the headers)
    stream[len(stream) // 2] ^= 0x10
    with pytest.raises(Exception):
        decode_annexb(bytes(stream))


def test_crc_matches_bit_oracle():
    from x265_tpu.bitstream.sei import picture_crc, _crc16_bits
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    c = rng.integers(0, 256, (8, 12)).astype(np.uint8)
    for d, p in zip(picture_crc(y, c, c, 8), (y, c, c)):
        ref = _crc16_bits(p, 8)
        assert d == bytes([(ref >> 8) & 0xFF, ref & 0xFF])
    y10 = rng.integers(0, 1024, (8, 8)).astype(np.uint16)
    ref = _crc16_bits(y10, 10)
    assert picture_crc(y10, y10, y10, 10)[0] == \
        bytes([(ref >> 8) & 0xFF, ref & 0xFF])


def test_checksum_matches_scalar_oracle():
    from x265_tpu.bitstream.sei import picture_checksum
    rng = np.random.default_rng(8)
    p = rng.integers(0, 1024, (16, 16)).astype(np.uint16)
    for bd in (8, 10):
        v = 0
        for yy in range(16):
            for xx in range(16):
                m = ((xx & 0xFF) ^ (yy & 0xFF) ^ (xx >> 8) ^ (yy >> 8)) & 0xFF
                v = (v + ((int(p[yy, xx]) & 0xFF) ^ m)) & 0xFFFFFFFF
                if bd > 8:
                    v = (v + ((int(p[yy, xx]) >> 8) ^ m)) & 0xFFFFFFFF
        assert picture_checksum(p, p, p, bd)[0] == v.to_bytes(4, "big")


@pytest.mark.parametrize("htype", [2, 3])
def test_hash_sei_crc_checksum_roundtrip(htype):
    """x265 --hash 2 (CRC) and 3 (checksum) streams self-validate."""
    cfg = EncoderConfig(width=64, height=64, qp=31, hash_sei=htype)
    enc = IntraEncoder(cfg)
    frames = moving_sequence(64, 64, 2, seed=htype)
    results = enc.encode_sequence(frames)
    stream = b"".join(r.bitstream for r in results)
    decs = decode_annexb(stream)   # raises on hash mismatch
    assert len(decs) == 2
