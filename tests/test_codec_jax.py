"""Full-device JAX codec backend vs the reference binary (small inputs --
the lax.while_loop ROLZ stages are the correctness path, not the fast path).
"""

import pytest

from libzling_tpu import codec

from .conftest import ref_decode, ref_encode
from .test_spec_vs_reference import _mixed_blob


@pytest.mark.parametrize("level", [0, 2, 4])
def test_encode_bitexact(reference_binary, level):
    data = _mixed_blob(20000, seed=level)
    expect = ref_encode(reference_binary, data, level)
    got = codec.encode(data, level)
    assert got == expect
    assert ref_decode(reference_binary, got) == data


def test_decode_reference_stream(reference_binary):
    data = _mixed_blob(40000, seed=11)
    stream = ref_encode(reference_binary, data, 3)
    assert codec.decode(stream) == data


def test_roundtrip_edge_cases(reference_binary):
    for data in (b"", b"x", b"xy", b"aaaa" * 200):
        expect = ref_encode(reference_binary, data, 1)
        assert codec.encode(data, 1) == expect
        assert codec.decode(expect) == data


def test_decode_corrupt():
    stream = codec.encode(b"hello world hello world " * 50, 2)
    with pytest.raises(ValueError):
        codec.decode(stream[:-3])
