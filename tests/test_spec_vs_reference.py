"""Golden tests: the executable spec must be bit-exact with the reference binary."""

import random

import pytest

from libzling_tpu import spec

from .conftest import ref_decode, ref_encode


def _mixed_blob(n: int, seed: int) -> bytes:
    """Text-ish + runs + random, to hit literals, words, matches and RLE."""
    rng = random.Random(seed)
    out = bytearray()
    words = [b"the ", b"zling ", b"rolz ", b"compress", b"data", b" of ", b"\n"]
    while len(out) < n:
        r = rng.random()
        if r < 0.5:
            out += rng.choice(words)
        elif r < 0.7:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 300)
        elif r < 0.9 and len(out) > 16:
            start = rng.randrange(len(out))
            out += out[start:start + rng.randrange(1, 400)]
        else:
            out += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
    return bytes(out[:n])


CASES = [
    b"",
    b"a",
    b"ab",
    b"abc",
    b"aaaaaaa",
    b"a" * 1000,
    bytes(range(256)) * 4,
    b"to be or not to be, that is the question" * 30,
]


@pytest.mark.parametrize("level", [0, 2, 4])
def test_small_cases_bitexact(reference_binary, level):
    for data in CASES:
        expect = ref_encode(reference_binary, data, level)
        got = spec.encode(data, level)
        assert got == expect, f"stream mismatch for {data[:20]!r} at level {level}"
        assert spec.decode(expect) == data


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4])
def test_mixed_blob_bitexact(reference_binary, level):
    data = _mixed_blob(60000, seed=level + 100)
    expect = ref_encode(reference_binary, data, level)
    got = spec.encode(data, level)
    assert got == expect
    assert spec.decode(expect) == data
    assert ref_decode(reference_binary, got) == data


def test_incompressible_adaptive_level(reference_binary):
    # random data trips the adaptive level-drop path (libzling.cpp:261-266)
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(300000))
    for level in (0, 3):
        expect = ref_encode(reference_binary, data, level)
        got = spec.encode(data, level)
        assert got == expect
        assert spec.decode(got) == data


def test_multi_chunk_bitexact(reference_binary):
    # >262144 tokens of mostly literals forces multiple ROLZ chunks per block
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(300000)) + _mixed_blob(100000, 3)
    expect = ref_encode(reference_binary, data, 1)
    got = spec.encode(data, 1)
    assert got == expect


def test_decode_rejects_corrupt_flag():
    stream = spec.encode(b"hello world, hello world", 0)
    bad = bytes([2]) + stream[1:]
    with pytest.raises(ValueError):
        spec.decode(bad)
