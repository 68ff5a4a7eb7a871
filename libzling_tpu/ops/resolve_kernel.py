"""Pallas TPU kernel: sequential ROLZ resolve (token stream -> bytes).

The zling resolve stage (reference src/libzling_lz.cpp:318-399) is a
byte-granular state machine whose contexts are *decoded content*: the ring
bucket and MTF table a token touches are keyed by the previous output byte,
so the stage is inherently serial for reference-format streams (DESIGN.md
section 4).  This kernel runs that serial chain on the TPU scalar core with
all hot state on-chip, shaped by the measured costs in DESIGN.md section 0:

  * vector->scalar transfers cost ~140 cycles each, so the kernel performs
    at most TWO per match (ring-source lookup, one combined tail-byte
    extract) and ZERO per literal/word;
  * match copies never round-trip through scalar registers: they are
    funnel-shift vector moves (two row loads + dynamic lane rolls + masked
    blend, ~100 cycles per 128 bytes), with overlapping copies handled by
    doubling passes that preserve the reference's forward-byte semantics
    (src/libzling_lz.cpp:91-104);
  * the 16 MB output block lives in VMEM as one byte per int32 lane
    ([131072+, 128] = 64 MB; fits v5e VMEM with the limit raised);
  * sequential output bytes accumulate in a register row and only touch
    VMEM when a 128-byte row fills or a match needs coherency;
  * the 256x4096 ring is VMEM with one-hot RMW inserts (writes are cheap);
    the sticky-MTF table, word-MRU, and ring heads live in SMEM;
  * finished rows DMA to HBM unpacked (one ranged flush per chunk); byte
    packing happens in XLA after the kernel.

Grid = one step per chunk, sequential on a core: ring state resets per 16 MB
block (meta new_block), the MTF table persists across the whole stream, the
word-MRU resets per chunk -- exactly the reference state lifetimes
(SURVEY.md section 0).

Bit-exactness: mirrors ops/rolz.py resolve_chunk (the jitted oracle) which
is golden-tested against the reference binary; corrupt streams (matchidx 0,
never-written ring slots, forward offsets) are rejected via the status
output, strictly stronger than the reference (SURVEY.md section 9.10).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import MATCH_MIN_LEN

SLAB_TOKENS = 2048            # token slab in SMEM (8 KB)
FLUSH_ROWS = 256              # rows per output DMA burst (32 KB)
# 16 MB block + match-copy overshoot + one full flush burst of slack (the
# final ranged DMA reads whole bursts past the last written row)
OUT_ROWS = 131072 + FLUSH_ROWS + 16
RING_ROWS = 8192 + 32         # 256 ctx * 32 rows + dummy scatter rows
MTF_WORDS = 257 * 256         # 256 contexts + 1 dummy scatter context


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _resolve_kernel(mtfnext_ref, meta_ref, mtf0_ref, tokens_ref,
                    out_hbm, status_ref, mtf_out,
                    mtf_ref, head_ref, mru_ref, slab_ref, pers_ref,
                    ring_ref, out_vmem,
                    sem_tok, sem_mtf, sem_out,
                    *, slab_tokens: int, tok_stride: int):
    c = pl.program_id(0)
    rlen = meta_ref[0, 0, 0]
    encpos = meta_ref[0, 0, 1]
    new_block = meta_ref[0, 0, 2]
    hbm_base = meta_ref[0, 0, 3]  # block ROW base in out_hbm [R,128]
    IOTA = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    @pl.when(c == 0)
    def _():
        cp = pltpu.make_async_copy(mtf0_ref, mtf_ref, sem_mtf)
        cp.start()
        cp.wait()

    @pl.when(new_block == 1)
    def _():
        zero = jnp.zeros((32, 128), jnp.int32)

        def zring(i, _):
            ring_ref[pl.ds(i * 32, 32), :] = zero
            return 0

        jax.lax.fori_loop(0, RING_ROWS // 32, zring, 0)

        def zhead(i, _):
            head_ref[0, i] = 0
            return 0

        jax.lax.fori_loop(0, 258, zhead, 0)
        pers_ref[0] = 0

    opos0 = pers_ref[0]

    def zmru(i, _):
        mru_ref[0, i] = 0
        return 0

    jax.lax.fori_loop(0, 516, zmru, 0)

    tok_base = c * tok_stride

    def load_slab(toff):
        src = pl.multiple_of(tok_base + toff, 128)
        cp = pltpu.make_async_copy(tokens_ref.at[0, pl.ds(src, slab_tokens)],
                                   slab_ref.at[0, :], sem_tok)
        cp.start()
        cp.wait()

    load_slab(0)

    def aligned_row(p):
        """[1,128] row whose lane 0 holds byte p (funnel shift of two rows)."""
        r0 = jnp.clip(_srl(p, 7), 0, OUT_ROWS - 2)
        sh = p & 127
        a = pltpu.roll(out_vmem[pl.ds(r0, 1), :], shift=-sh, axis=1)
        b = pltpu.roll(out_vmem[pl.ds(r0 + 1, 1), :], shift=-sh, axis=1)
        return jnp.where(IOTA < 128 - sh, a, b)

    def read_byte(p):
        return jnp.sum(jnp.where(IOTA == 0, aligned_row(p), 0))

    cur_row = out_vmem[pl.ds(_srl(opos0, 7), 1), :]
    l1_0 = jnp.where(opos0 >= 1, read_byte(jnp.maximum(opos0 - 1, 0)), 0)
    l2_0 = jnp.where(opos0 >= 2, read_byte(jnp.maximum(opos0 - 2, 0)), 0)

    def vec_copy(a, b, n):
        """out[b : b+n) = out[a : a+n); caller guarantees a + n <= b + 1 is
        NOT required -- only that all reads [a, a+n) are < b (non-overlap).
        n in [1, 260); touches up to 4 destination rows."""

        def body(k, _):
            rd = _srl(b, 7) + k
            lo = jnp.maximum(b - rd * 128, 0)
            hi = jnp.minimum(b + n - rd * 128, 128)

            @pl.when(hi > lo)
            def _():
                base = a - b + rd * 128
                sh = base & 127
                # base can be negative (src lane behind dst lane 0):
                # arithmetic shift floors correctly; clip each row index
                # separately so r0 = -1 still maps the vb lanes to row 0
                # (only out-of-mask lanes ever fall on a clipped row)
                r0 = base >> 7
                r0c = jnp.clip(r0, 0, OUT_ROWS - 1)
                r1c = jnp.clip(r0 + 1, 0, OUT_ROWS - 1)
                va = pltpu.roll(out_vmem[pl.ds(r0c, 1), :], shift=-sh, axis=1)
                vb = pltpu.roll(out_vmem[pl.ds(r1c, 1), :], shift=-sh, axis=1)
                merged = jnp.where(IOTA < 128 - sh, va, vb)
                drow = out_vmem[pl.ds(rd, 1), :]
                out_vmem[pl.ds(rd, 1), :] = jnp.where(
                    (IOTA >= lo) & (IOTA < hi), merged, drow)

            return 0

        jax.lax.fori_loop(0, _srl((b & 127) + n + 127, 7), body, 0)

    def body(carry):
        tpos, toff, opos, l1, l2, cur_row, bad = carry

        # token slab refill (a match consumes two tokens: keep t+1 resident)
        need = tpos + 1 >= toff + slab_tokens

        @pl.when(need)
        def _():
            load_slab((tpos >> 7) << 7)

        toff = jnp.where(need, (tpos >> 7) << 7, toff)
        t = slab_ref[0, tpos - toff]
        midx = slab_ref[0, tpos + 1 - toff]

        is_head = opos <= 1   # raw first-2-bytes (libzling_lz.cpp:327-328)
        is_lit = ~is_head & (t < 256)
        is_word = ~is_head & (t >= 256) & (t < 258)
        is_match = ~is_head & (t >= 258)
        ctx = l1

        # ---- ring head update; flush the staging row so the source-side
        # tail reads (and the copy) see every byte below opos -- harmless
        # for non-match units (lanes >= opos are rewritten before any
        # reader sees them).  Schedule ported from ops/decode_fused.py:
        # the ring-source lookup is an UNCONDITIONAL value-domain extract
        # with a clamped cell (a pl.when region's end forces its extracts
        # to complete, exposing the ~140-cycle transfer; a value's latency
        # overlaps the MTF/MRU SMEM work below -- measured 257 vs 315
        # ns/token on the fused kernel, DESIGN.md section -1).
        rctx = jnp.where(is_head, 256, ctx)
        h = (head_ref[0, rctx] + 1) & 4095
        head_ref[0, rctx] = h

        out_vmem[pl.ds(_srl(opos, 7), 1), :] = cur_row

        # lookup BEFORE the insert: cell (h - midx) != insert cell h for
        # every legal midx != 0 (midx == 0 is rejected as corrupt)
        ls = (h - jnp.where(is_match, midx, 1)) & 4095
        lrow = ring_ref[pl.ds(ctx * 32 + _srl(ls, 7), 1), :]
        srcv = jnp.sum(jnp.where(IOTA == (ls & 127), lrow, 0))

        rrow = jnp.where(is_head, RING_ROWS - 1, ctx * 32 + _srl(h, 7))
        row = ring_ref[pl.ds(rrow, 1), :]
        ring_ref[pl.ds(rrow, 1), :] = jnp.where(IOTA == (h & 127), opos, row)

        # ---- literal via sticky MTF (dummy context 256 when inactive)
        tl = jnp.where(is_lit, t, 0) & 255
        lit_byte = mtf_ref[0, ctx * 256 + tl]
        j = mtfnext_ref[0, tl]
        other = mtf_ref[0, ctx * 256 + j]
        mbase = jnp.where(is_lit, ctx, 256) * 256
        mtf_ref[0, mbase + tl] = other
        mtf_ref[0, mbase + j] = lit_byte

        # ---- word-MRU probe (chunk-local table)
        w = mru_ref[0, jnp.where(is_word, ctx * 2 + (t & 1), 514)]
        b0 = _srl(w, 8) & 255
        b1 = w & 255

        src = jnp.where(is_match, srcv, 1)

        bad = bad | (is_match & ((midx == 0) | (src == 0) | (src >= opos)
                                 | (tpos + 1 >= rlen)))

        # ---- emit: head/literal = 1 byte, word = 2 bytes (into cur_row)
        eb0 = jnp.where(is_head, t & 255, jnp.where(is_lit, lit_byte, b0))
        n_simple = jnp.where(is_match, 0, jnp.where(is_word, 2, 1))

        def put(cur_row, p, val, active):
            cur_row = jnp.where(active & (IOTA == (p & 127)), val, cur_row)
            full = active & ((p & 127) == 127)

            @pl.when(full)
            def _():
                out_vmem[pl.ds(_srl(p, 7), 1), :] = cur_row

            return jnp.where(full, 0, cur_row)

        cur_row = put(cur_row, opos, eb0, n_simple >= 1)
        cur_row = put(cur_row, opos + 1, b1, n_simple >= 2)

        # ---- match copy (vector funnel moves).  Overlapping copies
        # (delta < mlen) double the written prefix, which equals the
        # reference's forward byte-by-byte order.
        mlen = jnp.where(is_match & ~bad, t - 258 + MATCH_MIN_LEN, 0)

        delta = jnp.maximum(opos - src, 1)

        # tail bytes from the SOURCE side: out[opos+k] == out[src+k%delta]
        # for k >= 0, so bytes new_opos-3..-1 are already-written content at
        # src + (mlen-j)%delta.  Unconditional value-domain extracts issued
        # BEFORE the copy region so its vector work fills their latency
        # (ops/decode_fused.py scheme: destination-side read after the copy
        # measured 315 vs 257 ns/token).  One rem + two modular decrements
        # and ONE combined weighted reduction keep the issue cost down.
        pmax = OUT_ROWS * 128 - 1
        k1 = jax.lax.rem(mlen - 1, delta)
        k2 = jnp.where(k1 > 0, k1 - 1, delta - 1)
        k3 = jnp.where(k2 > 0, k2 - 1, delta - 1)
        p1 = jnp.clip(src + k1, 0, pmax)
        p2 = jnp.clip(src + k2, 0, pmax)
        p3 = jnp.clip(src + k3, 0, pmax)
        r1 = out_vmem[pl.ds(_srl(p1, 7), 1), :]
        r2 = out_vmem[pl.ds(_srl(p2, 7), 1), :]
        r3 = out_vmem[pl.ds(_srl(p3, 7), 1), :]
        comb = jnp.sum(jnp.where(IOTA == (p1 & 127), r1, 0)
                       + jnp.where(IOTA == (p2 & 127), r2 << 8, 0)
                       + jnp.where(IOTA == (p3 & 127), r3 << 16, 0))

        @pl.when(mlen > 0)
        def _():
            n0 = jnp.minimum(mlen, delta)
            vec_copy(src, opos, n0)

            def dbl(carryc):
                done = carryc
                n = jnp.minimum(mlen - done, done)
                vec_copy(opos, opos + done, n)
                return done + n

            jax.lax.while_loop(lambda d: d < mlen, dbl, n0)

        new_opos = opos + jnp.where(is_match, mlen, n_simple)

        packed_tail = jnp.where(is_match, comb, 0)
        cb1 = packed_tail & 255
        cb2 = _srl(packed_tail, 8) & 255
        cb3 = _srl(packed_tail, 16) & 255

        reload = out_vmem[
            pl.ds(jnp.where(is_match, _srl(new_opos, 7), 0), 1), :]
        cur_row = jnp.where(is_match, reload, cur_row)

        # ---- unified word-MRU push (libzling_lz.cpp:163-166,181-182,190-191)
        cu = jnp.where(is_lit, l2, jnp.where(is_match, cb3, ctx))
        wu = jnp.where(is_lit, ctx * 256 + lit_byte,
                       jnp.where(is_match, cb2 * 256 + cb1, w))
        old0 = mru_ref[0, cu * 2]
        push = is_lit | (is_word & ((t & 1) == 1)) | (is_match & (old0 != wu))
        pb = jnp.where(push, cu * 2, 514)
        mru_ref[0, pb + 1] = old0
        mru_ref[0, pb] = wu

        new_l1 = jnp.where(is_match, cb1, jnp.where(is_word, b1, eb0))
        new_l2 = jnp.where(is_match, cb2, jnp.where(is_word, b0, l1))

        bad = bad | (new_opos > encpos)
        tpos = tpos + 1 + is_match.astype(jnp.int32)

        # ---- literal fast loop (mirrors ops/decode_fused.py lit_body;
        # THREE copies must stay in sync -- see the note there): consecutive
        # literal tokens run a minimal body -- ring insert, MTF swap, one
        # byte store, word-MRU shift -- with ZERO vector->scalar transfers,
        # skipping the match/word scaffolding the full body pays.  The
        # pending token is peeked with its own slab refill so the loop
        # condition never reads past the resident slab.
        def peek(tpos, toff, bad):
            more = (tpos < rlen) & ~bad
            need = more & (tpos >= toff + slab_tokens)

            @pl.when(need)
            def _():
                load_slab((tpos >> 7) << 7)

            toff = jnp.where(need, (tpos >> 7) << 7, toff)
            tv = slab_ref[0, jnp.minimum(tpos - toff, slab_tokens - 1)]
            return toff, jnp.where(more, tv, -1)

        toff, pend = peek(tpos, toff, bad)

        def lit_cond(c):
            return (c[7] >= 0) & (c[7] < 256) & (c[2] >= 2) & ~c[6]

        def lit_body(c):
            tpos, toff, opos, l1, l2, cur_row, bad, t = c
            lctx = l1
            lh = (head_ref[0, lctx] + 1) & 4095
            head_ref[0, lctx] = lh
            lrow2 = lctx * 32 + _srl(lh, 7)
            row2 = ring_ref[pl.ds(lrow2, 1), :]
            ring_ref[pl.ds(lrow2, 1), :] = jnp.where(
                IOTA == (lh & 127), opos, row2)

            lb = mtf_ref[0, lctx * 256 + t]
            jj = mtfnext_ref[0, t]
            oth = mtf_ref[0, lctx * 256 + jj]
            mtf_ref[0, lctx * 256 + t] = oth
            mtf_ref[0, lctx * 256 + jj] = lb

            cur_row = jnp.where(IOTA == (opos & 127), lb, cur_row)
            full = (opos & 127) == 127

            @pl.when(full)
            def _():
                out_vmem[pl.ds(_srl(opos, 7), 1), :] = cur_row

            cur_row = jnp.where(full, 0, cur_row)

            old0 = mru_ref[0, l2 * 2]
            mru_ref[0, l2 * 2 + 1] = old0
            mru_ref[0, l2 * 2] = lctx * 256 + lb

            opos = opos + 1
            tpos = tpos + 1
            bad = bad | (opos > encpos)
            toff, t2 = peek(tpos, toff, bad)
            return (tpos, toff, opos, lb, lctx, cur_row, bad, t2)

        (tpos, toff, new_opos, new_l1, new_l2, cur_row, bad, _p) = \
            jax.lax.while_loop(lit_cond, lit_body,
                               (tpos, toff, new_opos, new_l1, new_l2,
                                cur_row, bad, pend))
        return tpos, toff, new_opos, new_l1, new_l2, cur_row, bad

    def cond(carry):
        return (carry[0] < rlen) & ~carry[6]

    tpos, _toff, opos, _l1, _l2, cur_row, bad = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(0), opos0, l1_0, l2_0, cur_row,
         jnp.bool_(False)))

    # flush the partial row, then DMA this chunk's rows to HBM (unpacked,
    # one byte per word; XLA packs after the kernel).  Bursts overshoot to a
    # FLUSH_ROWS boundary; the block's HBM region has matching slack and the
    # boundary rows are re-sent by the next chunk with newer content.
    out_vmem[pl.ds(_srl(opos, 7), 1), :] = cur_row

    @pl.when(opos > opos0)
    def _():
        r0 = (_srl(opos0, 7) >> 3) << 3  # sublane-tile aligned start
        rN = _srl(opos - 1, 7)

        def fbody(k, _):
            r = pl.multiple_of(r0 + k * FLUSH_ROWS, 8)
            dst = pl.multiple_of(hbm_base + r, 8)
            cp = pltpu.make_async_copy(
                out_vmem.at[pl.ds(r, FLUSH_ROWS), :],
                out_hbm.at[pl.ds(dst, FLUSH_ROWS), :],
                sem_out)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, (rN - r0) // FLUSH_ROWS + 1, fbody, 0)

    pers_ref[0] = opos
    status_ref[0, 0, 0] = opos
    status_ref[0, 0, 1] = tpos
    status_ref[0, 0, 2] = (bad | (opos != encpos)).astype(jnp.int32)
    status_ref[0, 0, 3] = opos0

    # export the final MTF state after the LAST chunk: the stream can then
    # be resolved in block-granular invocations with the state carried
    # between them (ring/head/out reset at block starts anyway) -- the
    # pipelined multi-device decode (parallel/decode_mesh.py) overlaps the
    # next group's sharded entropy decode with this group's resolve.
    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        cp = pltpu.make_async_copy(mtf_ref, mtf_out, sem_mtf)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "slab_tokens",
                                             "tok_stride", "out_words"))
def _resolve_call(mtfnext, meta, mtf0, tokens_flat, interpret: bool = False,
                  slab_tokens: int = SLAB_TOKENS, tok_stride: int = 0,
                  out_words: int = 0):
    C = meta.shape[0]
    kernel = pl.pallas_call(
        functools.partial(_resolve_kernel, slab_tokens=slab_tokens,
                          tok_stride=tok_stride),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((out_words // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((C, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, MTF_WORDS), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, MTF_WORDS), jnp.int32),
            pltpu.SMEM((1, 258), jnp.int32),
            pltpu.SMEM((1, 516), jnp.int32),
            pltpu.SMEM((1, slab_tokens), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.VMEM((RING_ROWS, 128), jnp.int32),
            pltpu.VMEM((OUT_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    unpacked, status, mtf_out = kernel(mtfnext, meta, mtf0, tokens_flat)
    # pack 4 bytes/word LE (vectorized XLA, off the scalar core)
    v = unpacked.reshape(-1, 4)
    packed = v[:, 0] | (v[:, 1] << 8) | (v[:, 2] << 16) | (v[:, 3] << 24)
    return packed, status, mtf_out


def initial_mtf_state() -> np.ndarray:
    """The kernel-layout initial MTF state ([1, MTF_WORDS] i32)."""
    from .mtf import initial_state

    r2s, _ = initial_state()
    mtf0 = np.zeros((1, MTF_WORDS), np.int32)
    mtf0[0, :65536] = np.asarray(r2s, np.int32).reshape(-1)
    return mtf0


def resolve_stream(tokens_flat, rlens, encpos, new_block, hbm_word_base,
                   tok_stride: int, out_words: int, interpret: bool = False,
                   slab_tokens: int = SLAB_TOKENS, mtf0=None):
    """Resolve all chunks of a stream on device.

    tokens_flat: [1, C * tok_stride] i32 device array (entropy-kernel output
    layout); rlens/encpos/new_block/hbm_word_base: per-chunk i32 metadata
    (hbm_word_base = the owning block's ROW base in the unpacked [R, 128]
    output, a multiple of FLUSH_ROWS with FLUSH_ROWS slack between blocks).
    out_words is the unpacked word count (one output byte per word,
    a FLUSH_ROWS*128 multiple).  mtf0 optionally carries the MTF state from
    a previous invocation (block-granular pipelined decode); the first
    chunk of this call must then start a new block.
    Returns (packed [out_words//4] i32 device array of LE-packed bytes,
    status [C, 8, 128]: [:,0,0]=opos, [:,0,1]=tokens consumed, [:,0,2]=bad,
    mtf_out [1, MTF_WORDS] exit MTF state for the next invocation).
    """
    from .mtf import _J_MTF_NEXT

    C = len(rlens)
    meta = np.zeros((C, 8, 128), np.int32)
    meta[:, 0, 0] = rlens
    meta[:, 0, 1] = encpos
    meta[:, 0, 2] = new_block
    meta[:, 0, 3] = hbm_word_base
    if mtf0 is None:
        mtf0 = jnp.asarray(initial_mtf_state())
    mtfnext = np.asarray(_J_MTF_NEXT(), np.int32).reshape(1, 256)
    return _resolve_call(
        jnp.asarray(mtfnext), jnp.asarray(meta), mtf0,
        tokens_flat, interpret=interpret, slab_tokens=slab_tokens,
        tok_stride=tok_stride, out_words=out_words)
