"""Verify + benchmark the full on-device decode path on real hardware.

Encodes a corpus slice with the host pipeline, then decodes it with the
"tpu" backend (Pallas entropy kernel + Pallas ROLZ resolver, compiled on the
v5e), checks bit-exactness, and reports stage + end-to-end throughput.

Usage:  python tools/bench_device_decode.py [--mb 32] [--level 0]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / "build" / "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--split", action="store_true",
                    help="two-kernel pipeline instead of the fused default")
    ap.add_argument("--random", action="store_true",
                    help="incompressible corpus: all-literal units isolate "
                         "the literal-path cost")
    args = ap.parse_args()

    from tools.make_corpus import cached_corpus
    from libzling_tpu import container, device, pipeline

    if args.random:
        data = np.random.default_rng(0).integers(
            0, 256, args.mb * 1048576, dtype=np.uint8).tobytes()
    else:
        data = cached_corpus(100_000_000).read_bytes()[: args.mb * 1048576]
    stream = pipeline.encode(data, args.level)
    chunks, _ = container.parse(stream)
    n_tokens = sum(ch.rlen for ch in chunks)
    print(f"{len(data) / 1e6:.0f} MB -> {len(stream) / 1e6:.1f} MB stream",
          flush=True)

    t0 = time.perf_counter()
    out = device.decode(stream, interpret=False, fused=not args.split)
    print(f"first call (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)
    assert out == data, "device decode mismatch on first call"

    best = 1e9
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = device.decode(stream, interpret=False, fused=not args.split)
        best = min(best, time.perf_counter() - t0)
    assert out == data
    print(f"warm e2e: {best:.2f}s -> {len(data) / best / 1e6:.1f} MB/s "
          f"decode on {jax.devices()[0].device_kind}", flush=True)
    print(f"tokens: {n_tokens} -> {best / n_tokens * 1e9:.0f} ns/token e2e",
          flush=True)
    print("bit-exact PASS", flush=True)


if __name__ == "__main__":
    main()
