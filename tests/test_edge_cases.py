"""Boundary goldens: exact block sizes, chunk-cap regions, pathological data."""

import random

import pytest

from libzling_tpu import pipeline
from libzling_tpu.native import engine
from libzling_tpu.tables import BLOCK_SIZE_IN

from .conftest import ref_decode, ref_encode
from .test_spec_vs_reference import _mixed_blob


@pytest.mark.parametrize("size", [BLOCK_SIZE_IN - 1, BLOCK_SIZE_IN, BLOCK_SIZE_IN + 1])
def test_exact_block_boundary(reference_binary, size):
    data = (_mixed_blob(1 << 20, seed=size & 7) * 17)[:size]
    expect = ref_encode(reference_binary, data, 1)
    assert pipeline.encode(data, 1) == expect
    assert pipeline.decode(expect) == data


def test_chunk_boundary_with_matches(reference_binary):
    # random prefix (1 token/byte) pushes the token count toward the chunk
    # cap, then repetitive data puts 2-token matches at the boundary region;
    # sweep alignments so some seed lands matches exactly at the cap
    rng = random.Random(3)
    noise = bytes(rng.randrange(256) for _ in range(262100))
    for pad in range(0, 96, 7):
        data = noise[: 262000 + pad] + b"abcdefgh" * 4000
        expect = ref_encode(reference_binary, data, 2)
        got = engine.encode(data, 2)
        assert got == expect, f"pad={pad}"
        assert engine.decode(got) == data


def test_all_byte_values_and_runs(reference_binary):
    cases = [
        bytes(range(256)) * 600,              # cycling alphabet
        b"\x00" * 500000,                     # zero run
        b"\xff" * 500000,                     # 0xff run
        bytes([0, 255]) * 250000,             # alternating extremes
        b"ab" * 300000,                       # 2-byte period (word-MRU heavy)
        b"abc" * 200000,                      # 3-byte period
    ]
    for i, data in enumerate(cases):
        expect = ref_encode(reference_binary, data, 4)
        assert engine.encode(data, 4) == expect, f"case {i}"
        assert engine.decode(expect) == data, f"case {i}"


def test_sentinel_edge_tail_matchable(reference_binary):
    # data whose final ~275 bytes are highly matchable: exercises the
    # no-match tail region (encoder stops inserting, SURVEY section 8)
    base = _mixed_blob(4096, seed=9)
    data = base + base[:300]
    for level in (0, 4):
        expect = ref_encode(reference_binary, data, level)
        assert engine.encode(data, level) == expect


@pytest.mark.parametrize("level", [5, 6])
def test_extended_levels_beat_reference(reference_binary, level):
    # e5/e6 are framework extensions: deeper search than the reference's
    # best level, still decodable by the reference binary
    data = _mixed_blob(400000, seed=1)
    ref_best = ref_encode(reference_binary, data, 4)
    stream = pipeline.encode(data, level)
    assert len(stream) < len(ref_best)
    assert ref_decode(reference_binary, stream) == data
    assert pipeline.decode(stream) == data
    # spec agrees with the native engine on extended levels
    from libzling_tpu import spec

    small = _mixed_blob(30000, seed=2)
    assert spec.encode(small, level) == engine.encode(small, level)
