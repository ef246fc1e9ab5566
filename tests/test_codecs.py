import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from riot_ray.codecs import (
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_varbyte,
)


def test_varbyte_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 + 5], dtype=np.uint64)
    assert np.array_equal(decode_varbyte(encode_varbyte(vals)), vals)


def test_varbyte_empty():
    assert encode_varbyte(np.empty(0, np.uint64)) == b""
    assert decode_varbyte(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varbyte(encode_varbyte(vals)), vals)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=100))
def test_delta_roundtrip(xs):
    vals = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(vals)), vals)
