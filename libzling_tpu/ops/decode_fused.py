"""Pallas TPU kernel: fused chunk decode (Huffman bit-read + ROLZ resolve).

One pass over each chunk: the register bit-reader of ops/entropy_kernel.py
feeds the resolve state machine of ops/resolve_kernel.py directly, so the
intermediate token array (4 B/token in HBM) and the second scalar-core pass
disappear.  This is the fastest single-core decode layout; the SPLIT kernels
remain the multi-core layout (entropy chunks in parallel across cores, one
resolve chain) and the oracle this kernel is tested against.

All structural comments live in the two source kernels; this file composes
them (same reference citations: bit reader src/libzling.cpp:368-402, resolve
src/libzling_lz.cpp:318-399, state lifetimes SURVEY.md section 0).

Measured on the v5e (round 3, kernel-only, inputs device-resident): 257
ns/token = 11.5 MB/s on 32 MB markov e0; 143 ns/token = 7.0 MB/s on
all-literal (incompressible) streams via the literal-run fast loop.  The
body issues ~1 op/cycle with no stalls (DESIGN.md section -1), so gains
come from removing ops from the common path, not from rescheduling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import MATCH_MIN_LEN
from .entropy_kernel import LUT_BITS, build_chunk_tables
from ..tables import HUFFMAN_MAX_LEN_1
from .resolve_kernel import FLUSH_ROWS, MTF_WORDS, OUT_ROWS, RING_ROWS

PSLAB_WORDS = 2048            # payload-word slab in SMEM (8 KB)


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _fused_kernel(mtfnext_ref, meta_ref, order_ref, lut1_ref, lut2_ref,
                  mtf0_ref, words_ref,
                  out_hbm, status_ref,
                  mtf_ref, head_ref, mru_ref, pslab_ref, pers_ref,
                  ring_ref, out_vmem,
                  sem_in, sem_mtf, sem_out,
                  *, pslab_words: int):
    c = pl.program_id(0)
    n_words = meta_ref[0, 0, 0]
    rlen = meta_ref[0, 0, 1]
    word_base = meta_ref[0, 0, 2]
    encpos = meta_ref[0, 0, 3]
    new_block = meta_ref[0, 0, 4]
    hbm_base = meta_ref[0, 0, 5]
    end_bits = n_words * 32
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

    def load_pslab(woff):
        src = pl.multiple_of(word_base + woff, 128)
        cp = pltpu.make_async_copy(words_ref.at[0, pl.ds(src, pslab_words)],
                                   pslab_ref.at[0, :], sem_in)
        cp.start()
        cp.wait()

    load_pslab(0)

    def aligned_row(p):
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
        def body(k, _):
            rd = _srl(b, 7) + k
            lo = jnp.maximum(b - rd * 128, 0)
            hi = jnp.minimum(b + n - rd * 128, 128)

            @pl.when(hi > lo)
            def _():
                base = a - b + rd * 128
                sh = base & 127
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

    def decode_sym(wpos, woff, lo, hi, nbits, bad, active):
        """Decode ONE alphabet-1 symbol and consume its code length.

        The loop decodes AHEAD (symbol n+1 resolves during unit n), so every
        call is gated by ``active``: with active False no state changes and
        the stream is not overrun at emitted == rlen.  Matchidx bits are NOT
        consumed here -- the caller peeks them at offset 0 of the returned
        reader (a unit consumes <= 15 + 8 + 8 = 31 bits total and the refill
        keeps nbits >= 32 before the <= 15-bit consume, so >= 17 valid bits
        remain for the matchidx peek).  Returns
        (wpos, woff, lo, hi, nbits, t, bad).
        """
        need = active & (wpos >= woff + pslab_words)

        @pl.when(need)
        def _():
            load_pslab((wpos >> 7) << 7)

        woff = jnp.where(need, (wpos >> 7) << 7, woff)
        # clamp: with active False the frozen wpos can sit one word past the
        # slab (refills happen check-before-load); the value is discarded
        w = pslab_ref[0, jnp.minimum(wpos - woff, pslab_words - 1)]
        fill = active & (nbits < 32)
        lo = jnp.where(fill, lo | (w << nbits), lo)
        hi = jnp.where(fill, _srl(w, 32 - nbits), hi)
        wpos = wpos + fill.astype(jnp.int32)
        nbits = nbits + jnp.where(fill, 32, 0)

        e = lut1_ref[0, _srl(lo & 0xFFF, 9), lo & 0x1FF]

        @pl.when(active & (e < 0))
        def _():
            v = lo & 0x7FFF
            v = (_srl(v & 0xFF00, 8)) | ((v & 0x00FF) << 8)
            v = (_srl(v & 0xF0F0, 4)) | ((v & 0x0F0F) << 4)
            v = (_srl(v & 0xCCCC, 2)) | ((v & 0x3333) << 2)
            v = (_srl(v & 0xAAAA, 1)) | ((v & 0x5555) << 1)
            v15 = _srl(v, 1)
            packed = jnp.int32(-1)
            for ln in range(LUT_BITS + 1, HUFFMAN_MAX_LEN_1 + 1):
                top = _srl(v15, HUFFMAN_MAX_LEN_1 - ln)
                s = meta_ref[0, 1, ln]
                cnt = meta_ref[0, 2, ln]
                hit = (packed < 0) & (top >= s) & (top < s + cnt)
                pos = jnp.clip(
                    jnp.where(hit, meta_ref[0, 3, ln] + top - s, 0), 0, 1023)
                cand = order_ref[0, _srl(pos, 7), pos & 127]
                packed = jnp.where(hit, cand | (ln << 16), packed)
            pers_ref[1] = packed

        ev = jnp.where(e < 0, pers_ref[1], e)
        bad = bad | (active & (ev < 0))
        ev = jnp.maximum(ev, 0)
        t = ev & 0xFFFF
        hl = jnp.maximum(_srl(ev, 16) & 31, 1)
        lo2 = _srl(lo, hl) | (hi << (32 - hl))
        hi2 = _srl(hi, hl)
        lo = jnp.where(active, lo2, lo)
        hi = jnp.where(active, hi2, hi)
        nbits = nbits - jnp.where(active, hl, 0)
        bad = bad | (active & (wpos > n_words))
        return wpos, woff, lo, hi, nbits, t, bad

    def resolve_unit(carry):
        """Full resolve of one pending unit (head/literal/word/match)."""
        (wpos, woff, lo, hi, nbits, emitted, opos, l1, l2, cur_row,
         bad, t) = carry

        is_head = opos <= 1
        is_lit = ~is_head & (t < 256)
        is_word = ~is_head & (t >= 256) & (t < 258)
        is_match = ~is_head & (t >= 258)

        # matchidx (code2 + extra bits) peeked at offset 0: decode_sym
        # already consumed the alphabet-1 code length
        has_idx = is_match & (emitted + 1 < rlen)
        bad = bad | (is_match & ~has_idx)
        p2 = lo & 0xFF
        e2 = lut2_ref[0, _srl(p2, 7), p2 & 0x7F]
        bad = bad | (has_idx & (e2 < 0))
        e2 = jnp.maximum(e2, 0)
        hl2 = e2 & 0xFF
        blen = _srl(e2, 8) & 0xFF
        extra = _srl(lo, hl2) & ((jnp.int32(1) << blen) - 1)
        midx = _srl(e2, 16) + extra

        # ---- resolve the unit (ops/resolve_kernel.py logic, verbatim).
        # Schedule: the match path's two vector->scalar extract stages (ring
        # source, then the three source-side tail bytes) run as UNCONDITIONAL
        # value-domain extracts with clamped indices instead of pl.when
        # regions: a region's end forces its extracts to complete (measured,
        # DESIGN.md -1), while a value's ~140-cycle transfer overlaps every
        # independent op between issue and first use -- here the bit
        # consume/MTF/MRU SMEM work (ring source) and the puts + copy loop
        # (tail bytes).  Non-match units pay a few discarded vector reads;
        # most literals bypass this body through the fast loop anyway.
        ctx = l1
        rctx = jnp.where(is_head, 256, ctx)
        h = (head_ref[0, rctx] + 1) & 4095
        head_ref[0, rctx] = h

        # flush the staging row so the source-side tail reads (and the copy)
        # see every byte below opos; harmless for non-match units (bytes at
        # >= opos lanes are rewritten before any reader sees them)
        out_vmem[pl.ds(_srl(opos, 7), 1), :] = cur_row

        # ring-source extract, issued before the consume/MTF work; the
        # lookup cell (h - midx) differs from the insert cell h for every
        # legal midx != 0 (midx == 0 is rejected as corrupt)
        ls = (h - jnp.where(is_match, midx, 1)) & 4095
        lrow = ring_ref[pl.ds(ctx * 32 + _srl(ls, 7), 1), :]
        srcv = jnp.sum(jnp.where(IOTA == (ls & 127), lrow, 0))

        nc = jnp.where(has_idx, hl2 + blen, 0)
        # s=1 keeps the 32-s shift defined when nc == 0.  If has_idx is set
        # with nc == 0 (corrupt matchidx code, e2 < 0) the accumulator
        # shifts one bit while nbits is unchanged — dead state: `bad` is
        # already set on that path and the loop exits before any use.
        s = jnp.maximum(nc, 1)
        lo = jnp.where(has_idx, _srl(lo, s) | (hi << (32 - s)), lo)
        hi = jnp.where(has_idx, _srl(hi, s), hi)
        nbits = nbits - nc
        emitted = emitted + 1 + has_idx.astype(jnp.int32)

        rrow = jnp.where(is_head, RING_ROWS - 1, ctx * 32 + _srl(h, 7))
        row = ring_ref[pl.ds(rrow, 1), :]
        ring_ref[pl.ds(rrow, 1), :] = jnp.where(IOTA == (h & 127), opos, row)

        tl = jnp.where(is_lit, t, 0) & 255
        lit_byte = mtf_ref[0, ctx * 256 + tl]
        j = mtfnext_ref[0, tl]
        other = mtf_ref[0, ctx * 256 + j]
        mbase = jnp.where(is_lit, ctx, 256) * 256
        mtf_ref[0, mbase + tl] = other
        mtf_ref[0, mbase + j] = lit_byte

        wv = mru_ref[0, jnp.where(is_word, ctx * 2 + (t & 1), 514)]
        b0 = _srl(wv, 8) & 255
        b1 = wv & 255

        src = jnp.where(is_match, srcv, 1)
        bad = bad | (is_match & ((midx == 0) | (src == 0) | (src >= opos)))

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

        mlen = jnp.where(is_match & ~bad, t - 258 + MATCH_MIN_LEN, 0)

        delta = jnp.maximum(opos - src, 1)

        # tail bytes from the SOURCE side: out[opos+k] == out[src+k%delta]
        # for k >= 0 (an overlapping copy replicates the delta-period
        # pattern), and src + (mlen-j)%delta < opos is already-written
        # content.  Unconditional value-domain extracts (indices clamped
        # in-bounds for the non-match/corrupt cases, values then discarded)
        # issued right before the copy region so its vector work fills
        # their latency, consumed only after it.  A destination-side read
        # after the copy (the split kernel's scheme) measured 315 vs 257
        # ns/token here: the post-copy extract latency is exposed, while
        # these three overlap.  One rem + two modular decrements and ONE
        # combined weighted reduction keep the issue cost down.
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

            def dbl(done):
                n = jnp.minimum(mlen - done, done)
                vec_copy(opos, opos + done, n)
                return done + n

            jax.lax.while_loop(lambda d: d < mlen, dbl, n0)

        new_opos = opos + jnp.where(is_match, mlen, n_simple)

        reload = out_vmem[
            pl.ds(jnp.where(is_match, _srl(new_opos, 7), 0), 1), :]
        cur_row = jnp.where(is_match, reload, cur_row)

        bad = bad | (new_opos > encpos)
        # the comb-consuming tail (MRU push, l1/l2 context carries) is
        # DEFERRED to the caller, behind the next decode_sym: the tail
        # extract feeds the next unit's context, so every ctx-independent
        # op scheduled before its first use hides under the ~140-cycle
        # transfer (probe_scalar_cost --match: the tail wave is the match
        # body's dominant cost, +81 ns/token; the bit-reader is ctx-free)
        defer = (comb, is_match, is_lit, is_word, ctx, l1, lit_byte, wv,
                 b0, b1, eb0, t)
        return (wpos, woff, lo, hi, nbits, emitted, new_opos, l2, cur_row,
                bad, defer)

    def body(carry):
        (wpos, woff, lo, hi, nbits, emitted, opos, l2old, cur_row,
         bad, defer) = resolve_unit(carry)
        more = (emitted < rlen) & ~bad
        wpos, woff, lo, hi, nbits, t2, bad = decode_sym(
            wpos, woff, lo, hi, nbits, bad, more)
        pend = jnp.where(more, t2, -1)

        # deferred comb consumers (see resolve_unit): MRU push + carries
        (comb, is_match, is_lit, is_word, ctx, l1old, lit_byte, wv,
         b0, b1, eb0, t) = defer
        packed_tail = jnp.where(is_match, comb, 0)
        cb1 = packed_tail & 255
        cb2 = _srl(packed_tail, 8) & 255
        cb3 = _srl(packed_tail, 16) & 255
        cu = jnp.where(is_lit, l2old, jnp.where(is_match, cb3, ctx))
        wu = jnp.where(is_lit, ctx * 256 + lit_byte,
                       jnp.where(is_match, cb2 * 256 + cb1, wv))
        old0 = mru_ref[0, cu * 2]
        push = is_lit | (is_word & ((t & 1) == 1)) | (is_match & (old0 != wu))
        pb = jnp.where(push, cu * 2, 514)
        mru_ref[0, pb + 1] = old0
        mru_ref[0, pb] = wu
        l1 = jnp.where(is_match, cb1, jnp.where(is_word, b1, eb0))
        l2 = jnp.where(is_match, cb2, jnp.where(is_word, b0, l1old))

        # ---- literal fast loop.  Consecutive literal units (the majority
        # of units at every level) run a minimal body -- ring insert, MTF
        # swap, one byte store, word-MRU shift, decode-ahead -- skipping the
        # match/word scaffolding (matchidx decode, copy machinery, staging
        # reload) that the full body pays on every unit.  Semantics match
        # resolve_unit's is_lit branch exactly (reference
        # src/libzling_lz.cpp:327-337).
        # NOTE: this body exists in THREE places that must stay in sync --
        # here, ops/resolve_kernel.py lit_body, and the is_lit branches of
        # both kernels' full bodies; an MTF/MRU tweak applied to one copy
        # silently desyncs the backends (golden cross-check:
        # tests/test_device_backend.py runs split vs fused on the same
        # streams).
        def lit_cond(c):
            return (c[11] >= 0) & (c[11] < 256) & (c[6] >= 2) & ~c[10]

        def lit_body(c):
            (wpos, woff, lo, hi, nbits, emitted, opos, l1, l2, cur_row,
             bad, t) = c
            ctx = l1
            h = (head_ref[0, ctx] + 1) & 4095
            head_ref[0, ctx] = h
            rrow = ctx * 32 + _srl(h, 7)
            row = ring_ref[pl.ds(rrow, 1), :]
            ring_ref[pl.ds(rrow, 1), :] = jnp.where(
                IOTA == (h & 127), opos, row)

            lit_byte = mtf_ref[0, ctx * 256 + t]
            j = mtfnext_ref[0, t]
            other = mtf_ref[0, ctx * 256 + j]
            mtf_ref[0, ctx * 256 + t] = other
            mtf_ref[0, ctx * 256 + j] = lit_byte

            cur_row = jnp.where(IOTA == (opos & 127), lit_byte, cur_row)
            full = (opos & 127) == 127

            @pl.when(full)
            def _():
                out_vmem[pl.ds(_srl(opos, 7), 1), :] = cur_row

            cur_row = jnp.where(full, 0, cur_row)

            old0 = mru_ref[0, l2 * 2]
            mru_ref[0, l2 * 2 + 1] = old0
            mru_ref[0, l2 * 2] = ctx * 256 + lit_byte

            opos = opos + 1
            emitted = emitted + 1
            bad = bad | (opos > encpos)
            more = (emitted < rlen) & ~bad
            wpos, woff, lo, hi, nbits, t2, bad = decode_sym(
                wpos, woff, lo, hi, nbits, bad, more)
            t = jnp.where(more, t2, -1)
            return (wpos, woff, lo, hi, nbits, emitted, opos, lit_byte,
                    ctx, cur_row, bad, t)

        return jax.lax.while_loop(
            lit_cond, lit_body,
            (wpos, woff, lo, hi, nbits, emitted, opos, l1, l2, cur_row,
             bad, pend))

    def cond(carry):
        return (carry[11] >= 0) & ~carry[10]

    wpos0, woff0, lo0, hi0, nbits0, t0, bad0 = decode_sym(
        jnp.int32(2), jnp.int32(0), pslab_ref[0, 0], pslab_ref[0, 1],
        jnp.int32(64), jnp.bool_(False), rlen > 0)
    pend0 = jnp.where(rlen > 0, t0, -1)
    init = (wpos0, woff0, lo0, hi0, nbits0, jnp.int32(0), opos0, l1_0, l2_0,
            cur_row, bad0, pend0)
    (wpos, _woff, _lo, _hi, nbits, emitted, opos, _l1, _l2, cur_row,
     bad, _pend) = jax.lax.while_loop(cond, body, init)
    bad = bad | (wpos * 32 - nbits > end_bits)

    out_vmem[pl.ds(_srl(opos, 7), 1), :] = cur_row

    @pl.when(opos > opos0)
    def _():
        r0 = (_srl(opos0, 7) >> 3) << 3
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
    status_ref[0, 0, 1] = emitted
    status_ref[0, 0, 2] = (bad | (opos != encpos)).astype(jnp.int32)
    status_ref[0, 0, 3] = opos0


@functools.partial(jax.jit, static_argnames=("interpret", "pslab_words",
                                             "out_words"))
def _fused_call(mtfnext, meta, order1, lut1, lut2, mtf0, words,
                interpret: bool = False, pslab_words: int = PSLAB_WORDS,
                out_words: int = 0):
    C = meta.shape[0]
    kernel = pl.pallas_call(
        functools.partial(_fused_kernel, pslab_words=pslab_words),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 512), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((out_words // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((C, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, MTF_WORDS), jnp.int32),
            pltpu.SMEM((1, 258), jnp.int32),
            pltpu.SMEM((1, 516), jnp.int32),
            pltpu.SMEM((1, pslab_words), jnp.int32),
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
    unpacked, status = kernel(mtfnext, meta, order1, lut1, lut2, mtf0, words)
    v = unpacked.reshape(-1, 4)
    packed = v[:, 0] | (v[:, 1] << 8) | (v[:, 2] << 16) | (v[:, 3] << 24)
    return packed, status


def prepare_fused(len1, len2, payloads, rlens, encpos, new_block,
                  hbm_row_base, pslab_words: int = PSLAB_WORDS):
    """Stage the per-chunk tables + payload words on device (the host ships
    only length arrays and the packed payload bytes).  Returns the argument
    tuple for ``_fused_call``."""
    from .mtf import _J_MTF_NEXT, initial_state

    C = len(payloads)
    word_base = np.zeros(C, np.int32)
    n_words = np.zeros(C, np.int32)
    flat = []
    base = 0
    for i, p in enumerate(payloads):
        nb = (len(p) + 511) // 512 * 512 + 512
        flat.append(np.frombuffer(p + bytes(nb - len(p)), np.uint8))
        word_base[i] = base
        n_words[i] = len(p) // 4 + 2
        base += nb // 4
    flat.append(np.zeros(pslab_words * 4, np.uint8))
    words = np.concatenate(flat).view("<u4").astype(np.int32)

    meta, order1, lut1, lut2 = build_chunk_tables(
        jnp.asarray(np.asarray(len1, np.int32)),
        jnp.asarray(np.asarray(len2, np.int32)),
        jnp.asarray(n_words), jnp.asarray(word_base),
        jnp.asarray(np.asarray(rlens, np.int32)))
    meta = meta.at[:, 0, 3].set(jnp.asarray(np.asarray(encpos, np.int32)))
    meta = meta.at[:, 0, 4].set(jnp.asarray(np.asarray(new_block, np.int32)))
    meta = meta.at[:, 0, 5].set(
        jnp.asarray(np.asarray(hbm_row_base, np.int32)))

    r2s, _ = initial_state()
    mtf0 = np.zeros((1, MTF_WORDS), np.int32)
    mtf0[0, :65536] = np.asarray(r2s, np.int32).reshape(-1)
    mtfnext = np.asarray(_J_MTF_NEXT(), np.int32).reshape(1, 256)
    return (jnp.asarray(mtfnext), meta, order1, lut1, lut2,
            jnp.asarray(mtf0), jnp.asarray(words[None, :]))


def fused_decode(len1, len2, payloads, rlens, encpos, new_block,
                 hbm_row_base, out_words: int, interpret: bool = False,
                 pslab_words: int = PSLAB_WORDS):
    """Decode all chunks in one fused pass.

    len1/len2: [C,514]/[C,32] code lengths; payloads: per-chunk huffman
    bitstream bytes; rlens/encpos/new_block/hbm_row_base: per-chunk i32
    metadata (hbm_row_base = the owning block's ROW base in the unpacked
    [R,128] output).  Returns (packed LE-byte words [out_words//4] i32,
    status [C,8,128]: [:,0,0]=opos, [:,0,1]=tokens, [:,0,2]=bad).
    """
    args = prepare_fused(len1, len2, payloads, rlens, encpos, new_block,
                         hbm_row_base, pslab_words=pslab_words)
    return _fused_call(*args, interpret=interpret,
                       pslab_words=pslab_words, out_words=out_words)
