"""SEI messages (Annex D). Currently: decoded_picture_hash (MD5).

Reference behavior: x265 source/encoder/sei.{h,cpp} SEIDecodedPictureHash
and source/common/md5.cpp; frameencoder.cpp:1167 computes the hash over
the cropped decoded picture. The hash makes every emitted stream
self-validating: any conformant decoder (including ours) can verify its
reconstruction against the encoder's.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .bitwriter import BitWriter
from .nal import NalUnitType

SEI_DECODED_PICTURE_HASH = 132


def picture_md5(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                bit_depth: int = 8) -> list[bytes]:
    """Per-plane MD5 over raster samples (little-endian 16-bit when
    bit depth > 8), clause D.3.19."""
    out = []
    for p in (y, cb, cr):
        if bit_depth > 8:
            data = np.ascontiguousarray(p.astype("<u2")).tobytes()
        else:
            data = np.ascontiguousarray(p.astype(np.uint8)).tobytes()
        out.append(hashlib.md5(data).digest())
    return out


def write_picture_hash_sei(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                           bit_depth: int = 8) -> tuple[NalUnitType, bytes]:
    """Build the suffix-SEI NAL (type, rbsp) for the decoded picture."""
    hashes = picture_md5(y, cb, cr, bit_depth)
    payload = bytes([0]) + b"".join(hashes)   # hash_type = 0 (MD5)
    w = BitWriter()
    w.write(SEI_DECODED_PICTURE_HASH, 8)      # payload_type
    size = len(payload)
    while size >= 255:
        w.write(255, 8)
        size -= 255
    w.write(size, 8)                          # payload_size
    w.write_bytes(payload)
    w.align_one()                             # rbsp trailing
    return NalUnitType.SUFFIX_SEI, w.get_bytes()


def parse_picture_hash_sei(rbsp: bytes) -> list[bytes] | None:
    """Parse a suffix SEI rbsp; returns the 3 MD5 digests if present."""
    i = 0
    while i < len(rbsp) - 1:
        ptype = 0
        while rbsp[i] == 255:
            ptype += 255
            i += 1
        ptype += rbsp[i]
        i += 1
        size = 0
        while rbsp[i] == 255:
            size += 255
            i += 1
        size += rbsp[i]
        i += 1
        if ptype == SEI_DECODED_PICTURE_HASH:
            payload = rbsp[i:i + size]
            if payload[0] != 0:
                return None       # only MD5 handled
            return [payload[1 + 16 * k:1 + 16 * (k + 1)] for k in range(3)]
        i += size
    return None
