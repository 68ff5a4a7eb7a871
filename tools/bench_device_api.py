"""Standing compiled-mode golden gate + bench for the device encode lane.

Encodes the full bench corpus through the PUBLIC API's "tpu" backend
(api.encode -> device.encode -> mesh_encode(tokenizer="pallas") at the
canonical 16 MB / 262144-token geometry, reference src/libzling.cpp:70-71)
on the real chip, asserts the stream is byte-identical to the host pipeline
(itself golden-tested against the reference binary), and prints throughput.

This is the reference fuzz-harness discipline (test/fuzzy/libzling_fuzzy.py
runs the real binary end-to-end) applied to the compiled Pallas encode path:
interpreter-mode tests alone cannot catch a Mosaic lowering divergence.

Usage:  python tools/bench_device_api.py [--mb N] [--level L] [--repeats R]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / "build" / "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=100)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from tools.make_corpus import cached_corpus
    from libzling_tpu import api, pipeline

    data = cached_corpus(100_000_000).read_bytes()[: args.mb * 1048576]
    print(f"device encode (public API, tpu backend): {len(data)} bytes "
          f"e{args.level}", flush=True)

    t0 = time.perf_counter()
    stream = api.encode(data, level=args.level, backend="tpu")
    print(f"first call: {time.perf_counter() - t0:.1f}s", flush=True)

    host = pipeline.encode(data, args.level)
    assert stream == host, (
        "device-encoded stream != host pipeline (reference-golden)")
    print("bit-exact PASS", flush=True)

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        api.encode(data, level=args.level, backend="tpu")
        best = min(best, time.perf_counter() - t0)
    print(f"warm: {best:.2f}s -> {len(data) / best / 1e6:.2f} MB/s e2e "
          f"device encode", flush=True)


if __name__ == "__main__":
    main()
