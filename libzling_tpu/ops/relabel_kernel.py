"""Pallas TPU kernel: sticky-MTF literal relabel over a tokenized block.

The reference applies MTF inline per literal (src/libzling_lz.cpp:112-117,
188); the framework tokenizes with RAW literal bytes and relabels as a
separate pass (SURVEY.md section 7.0 phase b).  The XLA formulation
(ops/mtf.py encode_relabel: stable-sort by context + a lockstep scan) is
fine on CPU but catastrophic on this TPU: the scan runs max-per-ctx-run
iterations with in-loop scatters, measured ~98 us/iteration -> ~51 s per
canonical 16 MB block (tools/ probe, round 3).  The MTF chain is a
byte-granular state machine, i.e. exactly what the scalar core + SMEM do
well: this kernel walks the unit stream once, ~15 cycles per unit plus ~30
per literal, ~0.2 s per 16 MB block.

I/O convention: the packed unit words produced by ops/tokenize_kernel.py
(sym | kind << 10 | (midx or literal-ctx) << 14, one chunk per
chunk_stride slot).  Literal units (kind 1) get their sym field replaced by
the MTF rank; everything else is copied through.  The 2x[256,256] MTF state
is carried packed 4-bytes-per-word (pack_state/unpack_state) so it rides in
one [1, 32768] array -- small enough to ppermute around the mesh ring
(parallel/mesh.py chain) and to DMA into SMEM here.

Bit-exactness oracle: ops/mtf.py encode_relabel_reference
(tests/test_relabel_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import MTF_NEXT

STATE_WORDS = 2 * 256 * 64    # r2s plane + s2r plane, 4 bytes per word
OSLAB = 512


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def pack_state(r2s, s2r):
    """[256,256] i32 x2 -> [1, STATE_WORDS] i32 (byte-per-entry, 4/word)."""

    def p(t):
        t = t.astype(jnp.int32).reshape(256, 64, 4)
        return (t[..., 0] | (t[..., 1] << 8) | (t[..., 2] << 16)
                | (t[..., 3] << 24)).reshape(-1)

    return jnp.concatenate([p(r2s), p(s2r)])[None]


def unpack_state(st):
    """Inverse of pack_state."""
    st = st.reshape(2, 256, 64)

    def u(t):
        b = jnp.stack([t & 255, _srl(t, 8) & 255, _srl(t, 16) & 255,
                       _srl(t, 24) & 255], -1)
        return b.reshape(256, 256)

    return u(st[0]), u(st[1])


def _relabel_kernel(meta_ref, a_hbm, state_hbm, nxt_ref,
                    aout_hbm, stout_hbm,
                    st_ref, islab_ref, oslab_ref,
                    sem_st, sem_i, sem_o,
                    *, chunk_stride: int, max_chunks: int, islab: int):
    cp = pltpu.make_async_copy(state_hbm, st_ref, sem_st)
    cp.start()
    cp.wait()

    S2R = 256 * 64  # word offset of the s2r plane

    def pget(base, idx):
        w = st_ref[0, base + _srl(idx, 2)]
        return _srl(w, (idx & 3) * 8) & 255

    def pput(base, idx, val):
        wi = base + _srl(idx, 2)
        sh = (idx & 3) * 8
        w = st_ref[0, wi]
        st_ref[0, wi] = (w & ~(255 << sh)) | (val << sh)

    def chunk_body(c, _):
        nu = meta_ref[0, c]
        cbase = c * chunk_stride

        def load_islab(src):
            cp = pltpu.make_async_copy(
                a_hbm.at[0, pl.ds(pl.multiple_of(cbase + src, 128), islab)],
                islab_ref.at[0, :], sem_i)
            cp.start()
            cp.wait()

        def flush_oslab(dst):
            cp = pltpu.make_async_copy(
                oslab_ref.at[0, :],
                aout_hbm.at[0, pl.ds(pl.multiple_of(cbase + dst, 128),
                                     OSLAB)], sem_o)
            cp.start()
            cp.wait()

        @pl.when(nu > 0)
        def _():
            load_islab(0)

        def ubody(carry):
            u, ioff = carry
            need = u - ioff >= islab
            nioff = jnp.minimum((u >> 7) << 7, chunk_stride - islab)

            @pl.when(need)
            def _():
                load_islab(nioff)

            ioff = jnp.where(need, nioff, ioff)
            w = islab_ref[0, u - ioff]

            @pl.when(((w >> 10) & 3) == 1)
            def _():
                sym = w & 255
                ctx = _srl(w, 14) & 255
                i = pget(S2R, ctx * 256 + sym)
                j = nxt_ref[0, i]
                other = pget(0, ctx * 256 + j)
                pput(0, ctx * 256 + i, other)
                pput(0, ctx * 256 + j, sym)
                pput(S2R, ctx * 256 + sym, j)
                pput(S2R, ctx * 256 + other, i)
                oslab_ref[0, u & (OSLAB - 1)] = (w & ~1023) | i

            @pl.when(((w >> 10) & 3) != 1)
            def _():
                oslab_ref[0, u & (OSLAB - 1)] = w

            do_flush = (u & (OSLAB - 1)) == OSLAB - 1

            @pl.when(do_flush)
            def _():
                flush_oslab(u - (OSLAB - 1))

            return u + 1, ioff

        u, _ioff = jax.lax.while_loop(lambda cr: cr[0] < nu, ubody,
                                      (jnp.int32(0), jnp.int32(0)))

        # tail flush: one full slab from the last boundary (the overshoot
        # stays inside this chunk's stride slot; consumers mask by nunits)
        @pl.when((u & (OSLAB - 1)) != 0)
        def _():
            flush_oslab((u >> 9) << 9)

        return 0

    jax.lax.fori_loop(0, max_chunks, chunk_body, 0)

    cp = pltpu.make_async_copy(st_ref, stout_hbm, sem_st)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "chunk_stride",
                                             "max_chunks"))
def _relabel_call(meta, a_flat, state, interpret: bool = False,
                  chunk_stride: int = 0, max_chunks: int = 0):
    islab = min(2048, chunk_stride)
    nxt = jnp.asarray(np.asarray(MTF_NEXT, np.int32)[None])
    kernel = pl.pallas_call(
        functools.partial(_relabel_kernel, chunk_stride=chunk_stride,
                          max_chunks=max_chunks, islab=islab),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, max_chunks * chunk_stride), jnp.int32),
            jax.ShapeDtypeStruct((1, STATE_WORDS), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, STATE_WORDS), jnp.int32),
            pltpu.SMEM((1, islab), jnp.int32),
            pltpu.SMEM((1, OSLAB), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    return kernel(meta, a_flat, state, nxt)


def relabel_block(a_flat, nunits, r2s, s2r, *, chunk_stride: int,
                  max_chunks: int, interpret: bool = False):
    """Relabel literal units in packed form (traced; jit/shard_map safe).

    a_flat [1, max_chunks*chunk_stride] packed units; nunits [max_chunks].
    Returns (a_flat', r2s', s2r').
    """
    meta = jnp.zeros((1, 256), jnp.int32).at[0, :max_chunks].set(
        nunits.astype(jnp.int32))
    st = pack_state(r2s, s2r)
    a2, st2 = _relabel_call(meta, a_flat, st, interpret=interpret,
                            chunk_stride=chunk_stride, max_chunks=max_chunks)
    r2s2, s2r2 = unpack_state(st2)
    return a2, r2s2, s2r2
