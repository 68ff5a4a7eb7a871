"""Native C++ engine: bit-exact with the reference binary and the spec."""

import random

import pytest

from libzling_tpu import spec
from libzling_tpu.native import engine

from .conftest import ref_decode, ref_encode
from .test_spec_vs_reference import CASES, _mixed_blob


@pytest.mark.parametrize("level", [0, 2, 4])
def test_small_cases_bitexact(reference_binary, level):
    for data in CASES:
        expect = ref_encode(reference_binary, data, level)
        assert engine.encode(data, level) == expect
        assert engine.decode(expect) == data


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4])
def test_mixed_blob_bitexact(reference_binary, level):
    data = _mixed_blob(200000, seed=level)
    expect = ref_encode(reference_binary, data, level)
    got = engine.encode(data, level)
    assert got == expect
    assert engine.decode(got) == data
    assert ref_decode(reference_binary, got) == data


def test_incompressible(reference_binary):
    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(500000))
    for level in (0, 4):
        assert engine.encode(data, level) == ref_encode(reference_binary, data, level)


@pytest.mark.parametrize("level", [0, 4])
def test_multiblock_mtf_carry(reference_binary, level):
    # >16MB input crosses the block boundary: buckets reset but the MTF
    # tables must carry over (SURVEY.md section 0.3) -- the key cross-block
    # dependency.  ~20MB of compressible text-like data.
    data = (_mixed_blob(1 << 20, seed=42) * 20)[: (1 << 24) + (1 << 22)]
    expect = ref_encode(reference_binary, data, level)
    got = engine.encode(data, level)
    assert got == expect
    assert engine.decode(got) == data


def test_matches_spec_exactly():
    data = _mixed_blob(50000, seed=77)
    for level in range(5):
        assert engine.encode(data, level) == spec.encode(data, level)


def test_corrupt_streams_rejected():
    stream = engine.encode(b"hello world hello world hello", 1)
    with pytest.raises(ValueError):
        engine.decode(bytes([2]) + stream[1:])
    with pytest.raises(ValueError):
        engine.decode(stream[:-3])
    # bit flips in the payload must error or round-trip-fail, never hang
    rng = random.Random(1)
    data = _mixed_blob(30000, seed=9)
    stream = engine.encode(data, 2)
    for _ in range(50):
        i = rng.randrange(13, len(stream))
        bad = bytearray(stream)
        bad[i] ^= 1 << rng.randrange(8)
        try:
            out = engine.decode(bytes(bad))
        except ValueError:
            continue
        # a flip that still decodes must at least preserve framing
        assert isinstance(out, bytes)


def test_empty():
    assert engine.encode(b"", 0) == b""
    assert engine.decode(b"") == b""
