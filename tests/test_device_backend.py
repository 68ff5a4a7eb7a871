"""Golden tests for the device decode backend (entropy + resolve kernels).

Runs both Pallas kernels in interpreter mode on the CPU backend with small
slab/flush sizes; compiled-mode validation on the real v5e is done by
tools/bench_device.py.  Streams are built with the executable spec's chunk
primitives so multi-chunk blocks and multi-block MTF carry are covered with
KB-sized inputs (a real 262,143-token chunk is far too slow to interpret).
"""

from __future__ import annotations

import numpy as np
import pytest

from libzling_tpu import device, spec
from libzling_tpu.tables import SENTINEL_LEN

KPARAMS = dict(slab_words=256, flush_tokens=128, max_tokens=4096,
               slab_tokens=256)


def _make_stream(pieces, level=1, max_tokens=300) -> bytes:
    """Frame each piece as one input_block, chunks capped at max_tokens.

    Small blocks/chunks are format-valid (the reference decoder accepts any
    encpos splits); the MTF tables carry across blocks exactly as in the
    full-size stream (SURVEY.md section 0.3).
    """
    enc = spec.RolzEncoder()
    out = bytearray()
    for piece in pieces:
        buf = bytearray(piece) + bytearray(SENTINEL_LEN)
        ilen = len(piece)
        enc.reset()
        pos = 0
        while pos < ilen:
            tokens, pos = enc.encode_chunk(level, buf, ilen, pos, max_tokens)
            payload = spec.huffman_encode_chunk(tokens)
            out.append(1)
            out.extend(pos.to_bytes(4, "big"))
            out.extend(len(tokens).to_bytes(4, "big"))
            out.extend(len(payload).to_bytes(4, "big"))
            out.extend(payload)
        out.append(0)
    return bytes(out)


def test_multichunk_multiblock_roundtrip():
    rng = np.random.default_rng(5)
    pieces = [
        (b"the quick brown fox jumps over the lazy dog. " * 60),
        b"ab" * 700 + b"X" * 300,                      # overlap copies
        bytes(rng.integers(0, 256, 1200, dtype=np.uint8)),  # literals
        (b"zlQ" * 500) + b"the quick brown fox",       # word-MRU heavy
    ]
    stream = _make_stream(pieces, level=1, max_tokens=300)
    data = b"".join(pieces)
    assert spec.decode(stream) == data  # the stream itself is conforming
    got = device.decode(stream, interpret=True, **KPARAMS)
    assert got == data


def test_single_long_match_chain():
    # long runs produce max-length (259-byte) overlapping matches; cover
    # BOTH decode layouts (fused default + the two-kernel pipeline)
    data = b"A" * 900 + b"B" + b"A" * 900
    stream = _make_stream([data], level=0, max_tokens=4000)
    assert spec.decode(stream) == data
    assert device.decode(stream, interpret=True, **KPARAMS) == data
    assert device.decode(stream, interpret=True, fused=False, **KPARAMS) == data


def test_real_spec_stream():
    # a stream produced by the unmodified spec encoder (single chunk)
    data = (b"compression is the art of prediction " * 40)[:1400]
    stream = spec.encode(data, level=2)
    assert device.decode(stream, interpret=True, **KPARAMS) == data


def _craft_raw_chunk(tokens, encpos):
    payload = spec.huffman_encode_chunk(tokens)
    out = bytearray([1])
    out.extend(encpos.to_bytes(4, "big"))
    out.extend(len(tokens).to_bytes(4, "big"))
    out.extend(len(payload).to_bytes(4, "big"))
    out.extend(payload)
    out.append(0)
    return bytes(out)


def test_rejects_matchidx_zero():
    # self-copy (idx 0) hangs the reference decoder; ours must reject
    stream = _craft_raw_chunk([65, 66, 258, 0], 6)
    with pytest.raises(ValueError):
        device.decode(stream, interpret=True, **KPARAMS)


def test_rejects_never_written_ring_slot():
    # idx points at a ring slot no token ever wrote -> src == 0
    stream = _craft_raw_chunk([65, 66, 67, 258, 9], 7)
    with pytest.raises(ValueError):
        device.decode(stream, interpret=True, **KPARAMS)


def test_rejects_encpos_mismatch():
    stream = _craft_raw_chunk([65, 66, 67], 9)  # claims 9, decodes 3
    with pytest.raises(ValueError):
        device.decode(stream, interpret=True, **KPARAMS)


def test_api_tpu_backend_roundtrip():
    # the "tpu" backend through the public API (decode via both kernels)
    import libzling_tpu as z

    data = (b"public api tpu backend " * 50)[:1000]
    stream = z.encode(data, 1)
    assert z.decode(stream, backend="tpu") == data


def test_api_tpu_backend_encode():
    # encode(backend="tpu"): the Pallas tokenizer lane on a 1-device mesh at
    # canonical geometry produces the canonical stream (interpreted on CPU)
    import libzling_tpu as z

    rng = np.random.default_rng(5)
    data = (b"tpu encode lane through the public api " * 40
            + bytes(rng.integers(0, 256, 500, dtype=np.uint8)))
    stream = z.encode(data, 0, backend="tpu")
    assert stream == spec.encode(data, 0)
    assert z.decode(stream, backend="tpu") == data


def test_fused_decode_matches():
    # the single-pass fused kernel must agree with the two-kernel pipeline
    rng = np.random.default_rng(31)
    pieces = [
        (b"fused decode pass " * 80),
        b"xy" * 500 + bytes(rng.integers(0, 256, 700, dtype=np.uint8)),
    ]
    stream = _make_stream(pieces, level=1, max_tokens=300)
    data = b"".join(pieces)
    assert device.decode(stream, interpret=True, fused=True) == data


def test_fused_decode_rejects_corrupt():
    stream = _craft_raw_chunk([65, 66, 258, 0], 6)
    with pytest.raises(ValueError):
        device.decode(stream, interpret=True, fused=True)
