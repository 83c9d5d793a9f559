"""x265_encoder_reconfig analog + config validation honesty
(encoder.cpp:2284; VERDICT r04 weak #8)."""

import pytest

from x265_tpu.common.params import EncoderConfig
from x265_tpu.enc import IntraEncoder


def _cfg(**kw):
    return EncoderConfig(width=64, height=48, qp=32, **kw)


def test_reconfigure_safe_fields():
    enc = IntraEncoder(_cfg())
    assert enc.reconfigure(qp=28, me_range=6, psy_rd=1.0) == 0
    assert enc.cfg.qp == 28 and enc.cfg.me_range == 6


def test_reconfigure_rejects_header_changes():
    enc = IntraEncoder(_cfg())
    assert enc.reconfigure(ctu_size=64) == -1
    assert enc.reconfigure(width=128) == -1
    assert enc.reconfigure(sao=True) == -1
    assert enc.cfg.ctu_size == 32      # nothing applied


def test_validate_rejects_unimplemented():
    with pytest.raises(ValueError):
        _cfg(bit_depth=12).validate()
    with pytest.raises(NotImplementedError):
        _cfg(ctu_size=16).validate()    # inter paths need CTU >= 32
    _cfg(ctu_size=16, keyint=1).validate()  # all-intra CTU16 is fine
    with pytest.raises(ValueError):
        _cfg(num_refs=0).validate()
    with pytest.raises(ValueError):
        _cfg(max_merge=6).validate()
