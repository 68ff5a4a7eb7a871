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

    if args.split:
        return

    # kernel-only rate: tables + payload words staged on device once,
    # completion forced by the tiny status fetch (the axon platform's
    # block_until_ready does not synchronize); this is the deployment
    # number -- the e2e figure above includes ~1.3x the corpus size in
    # tunnel transfers
    from libzling_tpu.ops import decode_fused as fk
    from libzling_tpu.ops import resolve_kernel as rk

    len1, len2, bodies, rlens = container.unpack_length_tables(chunks)
    encpos = np.asarray([ch.encpos for ch in chunks], np.int32)
    C = len(chunks)
    new_block = np.zeros(C, np.int32)
    hbm_base = np.zeros(C, np.int32)
    _, block_sizes = container.parse(stream)
    burst = rk.FLUSH_ROWS * 128
    block_base_rows, acc = [], 0
    for size in block_sizes:
        block_base_rows.append(acc)
        acc += ((size + burst - 1) // burst + 1) * rk.FLUSH_ROWS
    out_words = (acc + rk.FLUSH_ROWS) * 128
    prev = -1
    for c, ch in enumerate(chunks):
        if ch.block_id != prev:
            new_block[c] = 1
            prev = ch.block_id
        hbm_base[c] = block_base_rows[ch.block_id]
    kargs = fk.prepare_fused(len1, len2, bodies, rlens.astype(np.int32),
                             encpos, new_block, hbm_base)
    kargs = jax.device_put(kargs)
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        _packed, status = fk._fused_call(*kargs, out_words=out_words)
        bad = np.asarray(status[:, 0, 2]).sum()
        times.append(time.perf_counter() - t0)
    assert bad == 0
    times.sort()
    kb = times[0]
    print(f"kernel: best {kb:.3f}s median {times[len(times)//2]:.3f}s -> "
          f"{len(data)/kb/1e6:.1f} MB/s ({kb/n_tokens*1e9:.0f} ns/token)",
          flush=True)


if __name__ == "__main__":
    main()
