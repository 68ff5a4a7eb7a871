"""Verify + benchmark the Pallas ROLZ tokenizer on real hardware.

Tokenizes a corpus slice on the v5e (e0 schedule), times the warm call, and
checks unit-for-unit bit-exactness against the jitted oracle.

Usage:  python tools/bench_device_encode.py
"""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from libzling_tpu.ops import tokenize_kernel as tk
from libzling_tpu.ops import rolz as rops
import jax.numpy as jnp
from tools.make_corpus import cached_corpus

data = cached_corpus(100_000_000).read_bytes()[: 2 * 1048576]
max_tokens, max_chunks, chunk_units = 262144, 16, 262144
levels = np.zeros(max_chunks, np.int32)

t0 = time.perf_counter()
r = tk.tokenize_block(data, levels, max_tokens, max_chunks, chunk_units)
print(f"first call: {time.perf_counter()-t0:.1f}s", flush=True)
sym, idx, upos, kind, nunits, ntoks, encpos, n_chunks, err = r
print("chunks", n_chunks, "err", err, "encpos", encpos[:n_chunks].tolist(), flush=True)
tot_units = int(nunits[:n_chunks].sum())
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    tk.tokenize_block(data, levels, max_tokens, max_chunks, chunk_units)
    best = min(best, time.perf_counter() - t0)
print(f"warm: {best:.2f}s -> {tot_units/best/1e6:.2f} M units/s, "
      f"{len(data)/best/1e6:.2f} MB/s e0 tokenize", flush=True)

# kernel-only rate: inputs resident on device, completion forced by a tiny
# stat fetch (the axon platform's block_until_ready does not synchronize)
ilen = len(data)
chunk_stride = ((chunk_units + tk.STAGE_UNITS - 1) // tk.STAGE_UNITS + 1) \
    * tk.STAGE_UNITS
block_rows = max(32, -(-(ilen + tk.SLAB_WORDS + 512) // 4096) * 32)
meta = np.zeros((1, 8, 256), np.int32)
meta[0, 0, 0] = ilen
meta[0, 0, 1] = max_tokens
meta[0, 0, 2] = chunk_units
lv = tk._LEVEL_TABLE[levels[:max_chunks]]
meta[0, 3, :max_chunks] = lv[:, 0]
meta[0, 4, :max_chunks] = lv[:, 1]
meta[0, 5, :max_chunks] = lv[:, 2]
flat = np.zeros(block_rows * 128, np.uint8)
flat[:ilen] = np.frombuffer(data, np.uint8)
meta_d = jax.device_put(jnp.asarray(meta))
flat_d = jax.device_put(jnp.asarray(flat[None]))
times = []
for _ in range(5):
    t0 = time.perf_counter()
    _oa, _ob, stat = tk._tokenize_call(
        meta_d, flat_d, chunk_stride=chunk_stride, max_chunks=max_chunks,
        block_rows=block_rows)
    np.asarray(stat[0, 6, 2])  # force completion
    times.append(time.perf_counter() - t0)
times.sort()
kbest = times[0]
print(f"kernel: best {kbest:.3f}s median {times[len(times)//2]:.3f}s -> "
      f"{tot_units/kbest/1e6:.2f} M units/s, {len(data)/kbest/1e6:.2f} MB/s "
      f"({kbest/tot_units*1e9:.0f} ns/unit)", flush=True)

# bit-exactness vs the jitted oracle (slow on the XLA token loop): opt-in
# for the bench; covered by tests/test_tokenize_kernel.py and the standing
# device verification run
if "--verify" not in sys.argv:
    raise SystemExit(0)
buf = jnp.asarray(np.frombuffer(data + bytes(400), np.uint8))
state = rops.enc_state_init()
pos = jnp.int32(0)
for c in range(n_chunks):
    state, rsym, ridx, rupos, rkind, rnu, rnt, pos = rops.tokenize_chunk(
        state, buf, len(data), pos, jnp.int32(2), jnp.int32(1), jnp.int32(0),
        jnp.int32(max_tokens), chunk_units)
    assert int(rnu) == int(nunits[c]) and int(pos) == int(encpos[c]), c
    assert np.array_equal(np.asarray(rsym)[:int(rnu)], np.asarray(sym[c])[:int(rnu)]), c
    assert np.array_equal(np.asarray(ridx)[:int(rnu)], np.asarray(idx[c])[:int(rnu)]), c
print("bit-exact vs oracle PASS", flush=True)
