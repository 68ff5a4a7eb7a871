"""Bisect the canonical-geometry INTERNAL failure: run the pieces of
parallel_encode_step (pallas lane) one at a time at 16 MB / 262144-token
geometry on the real chip.

Stages (--stage N):
  1  tokenize_block_traced jitted alone (canonical shapes)
  2  1 + relabel_block kernel
  3  2 + valid mask + unit histograms (full step body, no shard_map)
  4  the real parallel_encode_step via shard_map on a D=1 mesh
  5  stage 4 invoked 3x (leak / repeat-invocation check)
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--offset-mb", type=int, default=0)
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--len", type=int, default=0, dest="length")
    ap.add_argument("--debug-flags", type=int, default=0,
                    help="1=cache off, 2=lazy prefetch off, 4=lazy off")
    args = ap.parse_args()

    from tools.make_corpus import cached_corpus
    from libzling_tpu.ops import relabel_kernel as rlk
    from libzling_tpu.ops import tokenize_kernel as tkk
    from libzling_tpu.ops import huffman as hops
    from libzling_tpu.ops import mtf as mops
    from libzling_tpu.tables import BLOCK_SIZE_IN, BLOCK_SIZE_ROLZ, SENTINEL_LEN

    block_size, max_tokens = BLOCK_SIZE_IN, BLOCK_SIZE_ROLZ
    chunk_units = min(max_tokens, block_size + 8)
    max_chunks = max(1, -(-block_size // max(1, max_tokens // 2))) + 1
    chunk_stride = ((chunk_units + 511) // 512 + 1) * 512
    pad = SENTINEL_LEN + 128
    print(f"geometry: block={block_size} max_tokens={max_tokens} "
          f"max_chunks={max_chunks} chunk_units={chunk_units}", flush=True)

    off = args.offset_mb * 1048576 + args.offset
    ln = min(args.length or block_size, block_size)
    data = cached_corpus(100_000_000).read_bytes()[off: off + ln]
    blk = np.frombuffer(data + bytes(block_size + pad - len(data)), np.uint8)
    levels = np.zeros(max_chunks, np.int32)

    dev = jax.devices()[0]

    def report(tag, t0):
        print(f"{tag}: {time.perf_counter() - t0:.1f}s", flush=True)
        try:
            st = dev.memory_stats()
            print(f"  mem: {st.get('bytes_in_use', 0)/1e9:.2f} GB in use, "
                  f"peak {st.get('peak_bytes_in_use', 0)/1e9:.2f} GB",
                  flush=True)
        except Exception:
            pass

    if args.stage == 1:
        dbg = args.debug_flags

        def tok1(b, n, lv):
            import libzling_tpu.ops.tokenize_kernel as tk
            chunk_stride2 = ((chunk_units + tk.STAGE_UNITS - 1)
                             // tk.STAGE_UNITS + 1) * tk.STAGE_UNITS
            B = b.shape[0]
            block_rows = max(32, -(-(B + tk.SLAB_WORDS + 512) // 4096) * 32)
            flat = jnp.zeros(block_rows * 128, jnp.int32).at[:B].set(
                b.astype(jnp.int32))
            ltab = jnp.asarray(tk._LEVEL_TABLE)
            lvp = ltab[jnp.clip(lv, 0, 6)]
            meta = jnp.zeros((1, 8, 256), jnp.int32)
            meta = meta.at[0, 0, 0].set(n).at[0, 0, 1].set(max_tokens) \
                .at[0, 0, 2].set(chunk_units)
            meta = meta.at[0, 3, :max_chunks].set(lvp[:, 0]) \
                .at[0, 4, :max_chunks].set(lvp[:, 1]) \
                .at[0, 5, :max_chunks].set(lvp[:, 2])
            _oa, _ob, stat = tk._tokenize_call(
                meta, flat[None], chunk_stride=chunk_stride2,
                max_chunks=max_chunks, block_rows=block_rows,
                debug_flags=dbg)
            return stat[0, 6, 0], stat[0, 6, 1]

        f = jax.jit(tok1)
        t0 = time.perf_counter()
        r = f(jnp.asarray(blk), jnp.int32(len(data)), jnp.asarray(levels))
        nc = int(r[0])
        report(f"stage1 tokenize dbg={dbg} (n_chunks={nc}, err={int(r[1])})",
               t0)
        return

    if args.stage == 2:
        r2s0, s2r0 = mops.initial_state()

        def f(b, n, lv, r2s, s2r):
            out = tkk.tokenize_block_traced(
                b, n, lv, max_tokens=max_tokens, max_chunks=max_chunks,
                chunk_units=chunk_units, return_packed=True)
            nunits, a_raw = out[4], out[9]
            a2, r2s, s2r = rlk.relabel_block(
                a_raw, nunits, r2s, s2r, chunk_stride=chunk_stride,
                max_chunks=max_chunks)
            return a2, r2s, s2r, out[7], out[8]

        g = jax.jit(f)
        t0 = time.perf_counter()
        r = g(jnp.asarray(blk), jnp.int32(len(data)), jnp.asarray(levels),
              r2s0, s2r0)
        nc = int(r[3])
        report(f"stage2 tokenize+relabel (n_chunks={nc}, err={int(r[4])})", t0)
        return

    if args.stage == 3:
        r2s0, s2r0 = mops.initial_state()

        def f(b, n, lv, r2s, s2r):
            out = tkk.tokenize_block_traced(
                b, n, lv, max_tokens=max_tokens, max_chunks=max_chunks,
                chunk_units=chunk_units, return_packed=True)
            sym, idx, nunits, a_raw = out[0], out[1], out[4], out[9]
            a2, r2s, s2r = rlk.relabel_block(
                a_raw, nunits, r2s, s2r, chunk_stride=chunk_stride,
                max_chunks=max_chunks)
            sym2 = a2.reshape(max_chunks, chunk_stride)[:, :chunk_units] & 1023
            valid = (jnp.arange(chunk_units)[None, :] < nunits[:, None])
            freq1, freq2 = jax.vmap(hops.unit_histograms)(sym2, idx, valid)
            return freq1, freq2, r2s, s2r, out[7], out[8]

        g = jax.jit(f)
        t0 = time.perf_counter()
        r = g(jnp.asarray(blk), jnp.int32(len(data)), jnp.asarray(levels),
              r2s0, s2r0)
        nc = int(r[4])
        report(f"stage3 full body (n_chunks={nc}, err={int(r[5])})", t0)
        return

    # stage 4/5: the real shard_map step
    from libzling_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(np.asarray(jax.devices()[:1]))
    r2s0, s2r0 = mops.initial_state()
    sched = np.zeros((1, max_chunks), np.int32)
    reps = 3 if args.stage == 5 else 1
    for i in range(reps):
        t0 = time.perf_counter()
        out = pmesh.parallel_encode_step(
            jnp.asarray(blk[None]), jnp.asarray([len(data)], np.int32),
            jnp.asarray(sched), r2s0, s2r0, mesh=mesh,
            max_tokens=max_tokens, max_chunks=max_chunks,
            chunk_units=chunk_units, tokenizer="pallas")
        nc = int(np.asarray(out[6])[0])
        report(f"stage4 shard_map step #{i} (n_chunks={nc})", t0)


if __name__ == "__main__":
    main()
