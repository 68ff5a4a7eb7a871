"""Block-parallel pipeline: bit-exact with the reference, races and fuzz."""

import random

import pytest

from libzling_tpu import pipeline
from libzling_tpu.native import engine

from .conftest import ref_decode, ref_encode
from .test_spec_vs_reference import CASES, _mixed_blob


@pytest.mark.parametrize("level", [0, 2, 4])
def test_small_cases(reference_binary, level):
    for data in CASES:
        expect = ref_encode(reference_binary, data, level)
        assert pipeline.encode(data, level) == expect
        assert pipeline.decode(expect) == data


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4])
def test_blob_bitexact(reference_binary, level):
    data = _mixed_blob(150000, seed=level + 30)
    expect = ref_encode(reference_binary, data, level)
    assert pipeline.encode(data, level) == expect
    assert pipeline.decode(expect) == data


def test_multiblock(reference_binary):
    data = (_mixed_blob(1 << 20, seed=8) * 20)[: (1 << 24) + (1 << 21)]
    expect = ref_encode(reference_binary, data, 3)
    assert pipeline.encode(data, 3) == expect
    assert pipeline.decode(expect) == data


def test_adaptive_level_mispredict(reference_binary):
    # alternating compressible / incompressible 300 KB spans force repeated
    # level drops and recoveries -> exercises the re-tokenize fallback
    rng = random.Random(13)
    parts = []
    for i in range(6):
        if i % 2:
            parts.append(bytes(rng.randrange(256) for _ in range(300000)))
        else:
            parts.append(_mixed_blob(300000, seed=i))
    data = b"".join(parts)
    for level in (0, 3):
        expect = ref_encode(reference_binary, data, level)
        assert pipeline.encode(data, level) == expect
        assert pipeline.decode(expect) == data


def test_fuzz_roundtrip(reference_binary):
    rng = random.Random(99)
    for trial in range(10):
        n = rng.randrange(0, 200000)
        style = rng.random()
        if style < 0.4:
            data = _mixed_blob(n, seed=trial) if n else b""
        elif style < 0.7:
            data = bytes(rng.randrange(256) for _ in range(n))
        else:
            data = bytes([rng.randrange(4)]) * n
        level = rng.randrange(5)
        expect = ref_encode(reference_binary, data, level)
        got = pipeline.encode(data, level)
        assert got == expect, f"trial {trial} n={n} level={level}"
        assert pipeline.decode(got) == data
        assert engine.decode(got) == data


def test_repeated_calls_state_isolation():
    # stream-global MTF state must reset between encode() calls
    data = _mixed_blob(50000, seed=4)
    a = pipeline.encode(data, 2)
    b = pipeline.encode(data, 2)
    assert a == b
    assert pipeline.decode(a) == data
    assert pipeline.decode(a) == data


def test_corrupt_rejected():
    s = pipeline.encode(b"some compressible data some compressible data", 1)
    with pytest.raises(ValueError):
        pipeline.decode(s[:-4])
    with pytest.raises(ValueError):
        pipeline.decode(bytes([9]) + s[1:])
