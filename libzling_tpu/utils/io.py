"""Stream I/O abstraction and progress hooks.

The analog of the reference's L1 layer (src/libzling_utils.h:48-87):
``ByteSource``/``ByteSink`` mirror Inputter/Outputter, ``CodecHooks`` mirrors
ActionHandler (on_init / on_block / on_done).  ``stream_encode`` and
``stream_decode`` run block-group-bounded: memory in flight is one 64 MB
input group plus its compressed output, regardless of stream size, using the
pipeline's carry API (the MTF state is the only cross-group state).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import BinaryIO, Callable

from .. import pipeline
from ..tables import BLOCK_SIZE_HUFFMAN, BLOCK_SIZE_IN

_GROUP = 4 * BLOCK_SIZE_IN
_GROUP_BLOCKS = 4          # decode: max decoded input_blocks in flight
_DEC_READ = 8 << 20        # decode: compressed read granularity


class ByteSource:
    """Abstract byte source (Inputter analog)."""

    def read(self, n: int) -> bytes:
        raise NotImplementedError

    def at_end(self) -> bool:
        raise NotImplementedError


class ByteSink:
    """Abstract byte sink (Outputter analog)."""

    def write(self, data: bytes) -> int:
        raise NotImplementedError


class FileSource(ByteSource):
    def __init__(self, f: BinaryIO):
        self._f = f
        self._peek: bytes = b""
        self.total_read = 0

    def read(self, n: int) -> bytes:
        out = self._peek[:n]
        self._peek = self._peek[n:]
        if len(out) < n:
            out += self._f.read(n - len(out))
        self.total_read += len(out)
        return out

    def at_end(self) -> bool:
        if self._peek:
            return False
        self._peek = self._f.read(1)
        return not self._peek


class FileSink(ByteSink):
    def __init__(self, f: BinaryIO):
        self._f = f
        self.total_written = 0

    def write(self, data: bytes) -> int:
        self._f.write(data)
        self.total_written += len(data)
        return len(data)


@dataclass
class CodecHooks:
    """Observability seam (ActionHandler analog, src/libzling_utils.h:64-87).

    on_block fires once per 16 MB input block, as the reference does
    (src/libzling.cpp:282,418), with (bytes_in_so_far, bytes_out_so_far).
    """

    on_init: Callable[[], None] | None = None
    on_block: Callable[[int, int], None] | None = None
    on_done: Callable[[int, int, float], None] | None = None


def _per_block_sizes(span: bytes) -> list[tuple[int, int]]:
    """(decoded_bytes, stream_bytes) of every complete input_block in span."""
    out = []
    pos, block_start, last_encpos = 0, 0, 0
    n = len(span)
    while pos < n:
        flag = span[pos]
        pos += 1
        if flag == 0:
            out.append((last_encpos, pos - block_start))
            block_start = pos
            last_encpos = 0
            continue
        last_encpos = int.from_bytes(span[pos:pos + 4], "big")
        olen = int.from_bytes(span[pos + 8:pos + 12], "big")
        pos += 12 + olen
    return out


def stream_encode(src: ByteSource, dst: ByteSink, level: int = 0,
                  backend: str = "auto", hooks: CodecHooks | None = None) -> tuple[int, int]:
    """Block-group-bounded streaming encode.  Returns (bytes_in, bytes_out)."""
    del backend  # streaming always uses the pipeline (carry API)
    t0 = time.time()
    if hooks and hooks.on_init:
        hooks.on_init()
    enc = pipeline.ParallelEncoder()
    carry = None
    n_in = n_out = 0
    while not src.at_end():
        group = src.read(_GROUP)
        if not group:
            break
        part, carry = enc.encode_with_carry(group, level, carry)
        dst.write(part)
        if hooks and hooks.on_block:
            # per-16MB-block granularity, as the reference ActionHandler
            bi, bo = n_in, n_out
            for dec_bytes, strm_bytes in _per_block_sizes(part):
                bi += dec_bytes
                bo += strm_bytes
                hooks.on_block(bi, bo)
        n_in += len(group)
        n_out += len(part)
    if hooks and hooks.on_done:
        hooks.on_done(n_in, n_out, time.time() - t0)
    return n_in, n_out


def _take_block_spans(buf: bytearray, at_end: bool,
                      max_blocks: int | None = None) -> bytes:
    """Pop complete input_block spans (through their stop flags) off buf.

    ``max_blocks`` caps how many complete blocks are taken per call: the
    decode direction must bound memory by DECODED size (a 64 MB compressed
    read of a highly-compressible stream can hold gigabytes of output), so
    the streaming loop pops small groups of blocks at a time.
    """
    pos = 0
    last_complete = 0
    n = len(buf)
    blocks = 0
    while pos < n:
        flag = buf[pos]
        pos += 1
        if flag == 0:
            last_complete = pos
            blocks += 1
            if max_blocks is not None and blocks >= max_blocks:
                break
            continue
        if flag != 1:
            raise ValueError("zling: corrupt stream (bad framing)")
        if pos + 12 > n:
            break
        olen = int.from_bytes(buf[pos + 8:pos + 12], "big")
        if olen > BLOCK_SIZE_HUFFMAN:
            raise ValueError("zling: corrupt stream (bad chunk header)")
        if pos + 12 + olen > n:
            break
        pos += 12 + olen
    if at_end and last_complete != n and pos >= n:
        raise ValueError("zling: truncated stream (missing stop flag)")
    out = bytes(buf[:last_complete])
    del buf[:last_complete]
    return out


def stream_decode(src: ByteSource, dst: ByteSink, backend: str = "auto",
                  hooks: CodecHooks | None = None) -> tuple[int, int]:
    """Block-group-bounded streaming decode.  Returns (bytes_in, bytes_out)."""
    del backend
    t0 = time.time()
    if hooks and hooks.on_init:
        hooks.on_init()
    dec = pipeline.ParallelDecoder()
    carry = None
    pending = bytearray()
    n_in = n_out = 0
    n_consumed = 0  # compressed bytes already handed to the decoder
    done = False
    while not done:
        chunk = src.read(_DEC_READ)
        n_in += len(chunk)
        pending.extend(chunk)
        done = src.at_end()
        while True:
            # pop at most one group's worth of DECODED blocks per call so
            # memory stays O(group) regardless of the compression ratio
            spans = _take_block_spans(pending, done, _GROUP_BLOCKS)
            if not spans:
                break
            part, carry = dec.decode_with_carry(spans, carry)
            dst.write(part)
            if hooks and hooks.on_block:
                bi = n_consumed
                bo = n_out
                for dec_bytes, strm_bytes in _per_block_sizes(spans):
                    bi += strm_bytes
                    bo += dec_bytes
                    hooks.on_block(bi, bo)
            n_consumed += len(spans)
            n_out += len(part)
    if pending:
        raise ValueError("zling: truncated stream (missing stop flag)")
    if hooks and hooks.on_done:
        hooks.on_done(n_in, n_out, time.time() - t0)
    return n_in, n_out
