"""Sweep the compiled tokenizer kernel's per-unit cost by (depth, lazy1,
lazy2) without recompiling (the schedule is runtime meta), attributing the
cost to walk steps / lazy probes on real corpus data.

Usage: python tools/sweep_tokenize.py [--mb 2]
"""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
from libzling_tpu.ops import tokenize_kernel as tk
from tools.make_corpus import cached_corpus

mb = 2
if "--mb" in sys.argv:
    mb = int(sys.argv[sys.argv.index("--mb") + 1])
if "--random" in sys.argv:
    # incompressible: hash chains stay shallow, checks rarely hit ->
    # isolates the literal + insert + cache-maintenance base cost
    data = np.random.default_rng(0).integers(
        0, 256, mb * 1048576, dtype=np.uint8).tobytes()
else:
    data = cached_corpus(100_000_000).read_bytes()[: mb * 1048576]

max_tokens, max_chunks, chunk_units = 262144, 16, 262144
ilen = len(data)
chunk_stride = ((chunk_units + tk.STAGE_UNITS - 1) // tk.STAGE_UNITS + 1) \
    * tk.STAGE_UNITS
block_rows = max(32, -(-(ilen + tk.SLAB_WORDS + 512) // 4096) * 32)
flat = np.zeros(block_rows * 128, np.uint8)
flat[:ilen] = np.frombuffer(data, np.uint8)
flat_d = jax.device_put(jnp.asarray(flat[None]))


def run(depth, l1, l2, reps=4):
    meta = np.zeros((1, 8, 256), np.int32)
    meta[0, 0, 0] = ilen
    meta[0, 0, 1] = max_tokens
    meta[0, 0, 2] = chunk_units
    meta[0, 3, :] = depth
    meta[0, 4, :] = l1
    meta[0, 5, :] = l2
    meta_d = jax.device_put(jnp.asarray(meta))
    _oa, _ob, stat = tk._tokenize_call(
        meta_d, flat_d, chunk_stride=chunk_stride, max_chunks=max_chunks,
        block_rows=block_rows)
    stat = np.asarray(stat)
    nu = int(stat[0, 0, :].sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _oa, _ob, stat = tk._tokenize_call(
            meta_d, flat_d, chunk_stride=chunk_stride, max_chunks=max_chunks,
            block_rows=block_rows)
        np.asarray(stat[0, 6, 2])
        best = min(best, time.perf_counter() - t0)
    return nu, best


print(f"corpus slice: {ilen} bytes", flush=True)
prev = None
for (d, l1, l2, tag) in [
        (1, 0, 0, "d1 (base + step0)"),
        (2, 0, 0, "d2 (+ step1)"),
        (2, 1, 0, "e0 (+ lazy1 d1)"),
        (3, 1, 0, "d3 (+ loop step)"),
        (4, 1, 0, "e1 (d4)"),
        (6, 2, 0, "e2"),
        (16, 4, 2, "e4"),
]:
    nu, best = run(d, l1, l2)
    ns = best / nu * 1e9
    delta = "" if prev is None else f"  (delta {ns - prev:+.0f} ns/unit)"
    print(f"{tag:22s}: {nu:8d} units  {best:6.3f}s  {ns:6.0f} ns/unit{delta}",
          flush=True)
    prev = ns

# counter snapshot at e0 (stat row 7: attempts, lvl0, lvl1, check0, check1,
# loop-entries, lazy1 calls, found)
meta = np.zeros((1, 8, 256), np.int32)
meta[0, 0, 0] = ilen
meta[0, 0, 1] = max_tokens
meta[0, 0, 2] = chunk_units
meta[0, 3, :], meta[0, 4, :], meta[0, 5, :] = 2, 1, 0
_oa, _ob, stat = tk._tokenize_call(
    jax.device_put(jnp.asarray(meta)), flat_d, chunk_stride=chunk_stride,
    max_chunks=max_chunks, block_rows=block_rows)
stat = np.asarray(stat)
names = ["attempt", "lvl0", "lvl1", "check0", "check1", "loop", "lazy1",
         "found"]
att = max(int(stat[0, 7, 0]), 1)
print("e0 counters:", {n: f"{int(stat[0,7,k])} ({int(stat[0,7,k])/att:.0%})"
                       for k, n in enumerate(names)}, flush=True)
