"""Block-granular checkpoint/resume for long file codec jobs.

The zling format is resumable at 16 MB block boundaries given the carried
MTF state (SURVEY.md section 5: the container frames blocks with
continue/stop flags; the one piece of cross-block state is the 128 KB MTF
table set).  A checkpoint records (input offset, output offset, carry), so a
killed job resumes from the last completed block group instead of restarting.

Checkpoint file: JSON header line + raw carry bytes.
"""

from __future__ import annotations

import base64
import json
import os
import pathlib

from .. import pipeline
from ..tables import BLOCK_SIZE_IN

_GROUP = 4 * BLOCK_SIZE_IN  # blocks per checkpointed step (64 MB)


def _write_ckpt(path: pathlib.Path, kind: str, in_off: int, out_off: int,
                carry) -> None:
    if kind == "encode":
        blob = {"carry_mtf": base64.b64encode(carry[0]).decode(), "level_state": carry[1]}
    else:
        blob = {"carry_mtf": base64.b64encode(carry).decode()}
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps({"kind": kind, "in_off": in_off, "out_off": out_off, **blob}))
        f.flush()
        os.fsync(f.fileno())
    tmp.replace(path)


def _read_ckpt(path: pathlib.Path, kind: str):
    st = json.loads(path.read_text())
    if st.get("kind") != kind:
        raise ValueError(f"checkpoint kind mismatch: {st.get('kind')} != {kind}")
    mtf = base64.b64decode(st["carry_mtf"])
    carry = (mtf, st["level_state"]) if kind == "encode" else mtf
    return st["in_off"], st["out_off"], carry


def encode_file_resumable(src: str, dst: str, level: int = 0,
                          checkpoint: str | None = None) -> tuple[int, int]:
    """Compress src -> dst, checkpointing every 64 MB; resumes if the
    checkpoint exists.  Returns (bytes_in, bytes_out)."""
    if _GROUP % BLOCK_SIZE_IN:
        raise ValueError("checkpoint group size must be a multiple of the 16 MB block")
    ckpt = pathlib.Path(checkpoint or dst + ".ckpt")
    enc = pipeline.ParallelEncoder()
    in_off, out_off, carry = 0, 0, None
    if ckpt.exists():
        in_off, out_off, carry = _read_ckpt(ckpt, "encode")
    size = os.path.getsize(src)
    with open(src, "rb") as f, open(dst, "r+b" if in_off else "wb") as g:
        f.seek(in_off)
        g.seek(out_off)
        g.truncate()
        while in_off < size or (size == 0 and in_off == 0):
            chunk = f.read(_GROUP)
            if not chunk and in_off > 0:
                break
            part, carry = enc.encode_with_carry(chunk, level, carry)
            g.write(part)
            # the checkpoint must never claim data the OS hasn't persisted:
            # a crash between them would resume past a zero-filled hole
            g.flush()
            os.fsync(g.fileno())
            in_off += len(chunk)
            out_off += len(part)
            _write_ckpt(ckpt, "encode", in_off, out_off, carry)
            if len(chunk) < _GROUP:
                break
    ckpt.unlink(missing_ok=True)
    return in_off, out_off


def decode_file_resumable(src: str, dst: str,
                          checkpoint: str | None = None) -> tuple[int, int]:
    """Decompress src -> dst with block-group checkpoints.

    Scans the container framing to split the stream into whole-block spans
    (cheap header walk, no entropy work), then decodes spans with carried
    MTF state.  Returns (bytes_in, bytes_out)."""
    data = pathlib.Path(src).read_bytes()
    # split into block spans at stop flags
    spans = []
    pos = 0
    start = 0
    n = len(data)
    while pos < n:
        flag = data[pos]
        pos += 1
        if flag == 0:
            spans.append((start, pos))
            start = pos
            continue
        if flag != 1 or pos + 12 > n:
            raise ValueError("zling: corrupt stream (bad framing)")
        olen = int.from_bytes(data[pos + 8:pos + 12], "big")
        pos += 12 + olen
        if pos > n:
            raise ValueError("zling: corrupt stream (truncated)")
    if start != n:
        raise ValueError("zling: truncated stream (missing stop flag)")

    ckpt = pathlib.Path(checkpoint or dst + ".ckpt")
    dec = pipeline.ParallelDecoder()
    span_idx, out_off, carry = 0, 0, None
    if ckpt.exists():
        span_idx, out_off, carry = _read_ckpt(ckpt, "decode")
    group = 4
    with open(dst, "r+b" if span_idx else "wb") as g:
        g.seek(out_off)
        g.truncate()
        while span_idx < len(spans):
            batch = spans[span_idx: span_idx + group]
            blob = data[batch[0][0]: batch[-1][1]]
            part, carry = dec.decode_with_carry(blob, carry)
            g.write(part)
            g.flush()
            os.fsync(g.fileno())
            span_idx += len(batch)
            out_off += len(part)
            _write_ckpt(ckpt, "decode", span_idx, out_off, carry)
    ckpt.unlink(missing_ok=True)
    return n, out_off
