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
