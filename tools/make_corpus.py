"""Deterministic enwik8-like benchmark corpus generator.

enwik8 is not redistributable inside this environment (no network egress), so
benchmarks use a synthetic stand-in: an order-3 byte-level Markov model seeded
from the text files in this repo, sampled with a fixed RNG.  The result has
entropy and match structure in the same regime as English text/markup -- the
reference binary compresses it to 31.1% at e0 / 28.9% at e4, almost exactly
its published enwik8 ratios (31.46% / 29.72%, reference README.md:23-27) --
and is reproducible from the seed, so `vs_baseline` comparisons are
apples-to-apples across runs.

The per-byte sampling loop runs in C (markov_gen.cpp, built on demand).

Usage: python tools/make_corpus.py SIZE_MB OUT_PATH [SEED]
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _seed_text() -> bytes:
    # stable inputs only, so the corpus is identical across rounds
    parts = []
    for name in ("SURVEY.md", "BASELINE.md"):
        p = REPO / name
        if p.exists():
            parts.append(p.read_bytes())
    ref = pathlib.Path("/root/reference/README.md")
    if ref.exists():
        parts.append(ref.read_bytes())
    return b"\n".join(parts)


def _sampler() -> ctypes.CDLL:
    src = REPO / "tools" / "markov_gen.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out_dir = REPO / "build" / "native"
    out_dir.mkdir(parents=True, exist_ok=True)
    lib = out_dir / f"libmarkov_{tag}.so"
    if not lib.exists():
        tmp = lib.with_suffix(f".tmp{os.getpid()}.so")
        subprocess.run(
            [os.environ.get("CXX", "g++"), "-O2", "-shared", "-fPIC", str(src), "-o", str(tmp)],
            check=True, capture_output=True,
        )
        tmp.replace(lib)
    dll = ctypes.CDLL(str(lib))
    dll.markov_sample.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_size_t,
    ]
    return dll


def make_corpus(size: int, seed: int = 20260817) -> bytes:
    text = _seed_text()
    data = np.frombuffer(text, dtype=np.uint8)

    # order-3 transition CDFs, flattened for the C sampler
    ctx = (data[:-3].astype(np.uint32) << 16) | (data[1:-2].astype(np.uint32) << 8) | data[2:-1]
    nxt = data[3:]
    order = np.lexsort((nxt, ctx))
    ctx_s, nxt_s = ctx[order], nxt[order]
    # collapse duplicate (ctx, sym) pairs into counts
    pair = (ctx_s.astype(np.uint64) << 8) | nxt_s
    uniq, counts = np.unique(pair, return_counts=True)
    u_ctx = (uniq >> 8).astype(np.uint32)
    syms = (uniq & 0xFF).astype(np.uint8)
    # offsets per context over the unique-pair arrays
    ctx_off = np.zeros((1 << 24) + 1, dtype=np.uint32)
    np.add.at(ctx_off, u_ctx + 1, 1)
    ctx_off = np.cumsum(ctx_off, dtype=np.uint32)
    # within-context cumulative counts
    cum = np.cumsum(counts, dtype=np.uint64)
    base = np.zeros(len(counts), dtype=np.uint64)
    starts = ctx_off[u_ctx]
    first = np.r_[True, u_ctx[1:] != u_ctx[:-1]]
    seg_base = np.where(first, np.r_[0, cum[:-1]], 0)
    base = np.maximum.accumulate(np.where(first, seg_base, 0))
    cum32 = (cum - base).astype(np.uint32)
    del starts

    fallback = np.ascontiguousarray(nxt)
    out = np.empty(size, dtype=np.uint8)
    out[:3] = data[:3]
    c0 = int(data[0]) << 16 | int(data[1]) << 8 | int(data[2])
    dll = _sampler()
    dll.markov_sample(
        ctx_off.ctypes.data, syms.ctypes.data, cum32.ctypes.data,
        fallback.ctypes.data, len(fallback),
        seed, c0, out[3:].ctypes.data, size - 3,
    )
    return out.tobytes()


def cached_corpus(size: int, seed: int = 20260817) -> pathlib.Path:
    """Generate (once) and cache a corpus under corpus/ (gitignored)."""
    path = REPO / "corpus" / f"markov_{size}_{seed}.bin"
    if not path.exists() or path.stat().st_size != size:
        path.parent.mkdir(exist_ok=True)
        path.write_bytes(make_corpus(size, seed))
    return path


def main() -> None:
    size = int(float(sys.argv[1]) * 1_000_000)
    out_path = pathlib.Path(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20260817
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(make_corpus(size, seed))
    print(f"{out_path}: {size} bytes (seed {seed})")


if __name__ == "__main__":
    main()
