"""Pallas TPU kernel: per-chunk Huffman entropy decode.

The zling payload is a bit-serial stream (LSB-first canonical Huffman over
two alphabets, reference src/libzling.cpp:368-402).  XLA cannot run it fast:
measured on the v5e, *any* XLA gather runs at ~0.1 G elem/s, so both the
speculative segment decoder (ops/huffman.py) and pointer-doubling boundary
resolution are gather-bound ~1000x off the vector ceiling (DESIGN.md
sections 1, 3).  The TPU-native answer is the scalar core + SMEM, which this
kernel uses:

  * one grid step per chunk (chunks decode independently: each has its own
    tables, reference src/libzling.cpp:212-229) -- parallel across cores on
    real multi-core parts, serialized on the single-core bench chip;
  * the chunk's decode tables live in SMEM where data-dependent scalar
    indexing is legal and ~1 load/cycle: a 12-bit packed LUT (sym | len<<16)
    plus canonical tier tables for the rare 13..15-bit codes, and an 8-bit
    packed LUT for the matchidx alphabet (len | bitlen<<8 | base<<16);
  * the payload streams through SMEM in 16 KB slabs via async DMA from HBM;
    decoded tokens accumulate in an SMEM ring and flush to HBM in 8192-token
    DMA bursts at provably 128-aligned offsets (Mosaic requires alignment
    proofs for dynamic DMA offsets; see pl.multiple_of below).

Measured on the v5e: 10.3 M tok/s round 2 (two-unit unrolled loop); 11.1 M
tok/s round 3 on the superseded single-chain FOUR-unit unrolled loop.
The COMMITTED chunk-paired kernel measures **10.0 M tok/s (29.4 MB/s of
input) at 32 MB e0, all 44 chunks bit-exact compiled on the v5e**
(round 4; tools/bench_device.py) -- ~10% below the single-chain unroll on
this single-core part; its value is the pair axis for multi-core parts
and the mesh decode lane (parallel/decode_mesh.py).  ~50x the measured
XLA formulation either way.

Round-4 compile lesson: the original paired restructure kept the pair in
one (2, N) SMEM scratch and DMA'd single rows -- Mosaic REJECTS slicing
dim 0 of a (2, N) SMEM memref to size 1 ("must be aligned to tiling
(2)"), so the kernel had never actually compiled on hardware; interpret
-mode tests cannot catch this class.  The pair axis must be two separate
(1, N) scratch refs selected by the Python member index.  Any kernel
restructure MUST be followed by a compiled-mode device run before its
numbers are cited.

Table construction is jitted XLA on device (the host ships only the tiny
nibble-unpacked length arrays); the windows-to-symbol classification
mirrors ZlingMakeDecodeTable semantics
(reference src/libzling_huffman.cpp:114-153) without copying its code: we
classify every window value by canonical tier ranges instead of filling by
stride.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import (
    HUFFMAN_CODES_1,
    HUFFMAN_CODES_2,
    HUFFMAN_MAX_LEN_1,
    HUFFMAN_MAX_LEN_2,
    MATCHIDX_BASE,
    MATCHIDX_BLEN,
)

LUT_BITS = 12                 # fast-path window width for alphabet 1
SLAB_WORDS = 4096             # 16 KB payload slab in SMEM
FLUSH_TOKENS = 8192           # tokens per output DMA burst
OUT_PAD = 2 * FLUSH_TOKENS    # final-flush overshoot room per chunk
MAX_TOKENS = 262144           # chunk token budget (kBlockSizeRolz)


# ---------------------------------------------------------------------------
# device: packed table construction (vectorized over chunks, jitted)
# ---------------------------------------------------------------------------


def _bitrev(v: np.ndarray, bits: int) -> np.ndarray:
    v = v.astype(np.uint32)
    r = np.zeros_like(v)
    for _ in range(bits):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _canonical_tiers(lengths, max_len: int):
    """Per-chunk canonical code metadata (jnp, runs jitted on device).

    lengths: [C, n] i32.  Returns (start, count, base, order):
      start[C, L+1]: first MSB-first code value of each length tier;
      count[C, L+1]: symbols per tier;  base[C, L+1]: tier offset into order;
      order[C, n]: symbols sorted by (length, symbol id), zero-lengths last.
    """
    C, n = lengths.shape
    L = max_len
    onehot = (lengths[..., None] == jnp.arange(L + 1)).astype(jnp.int32)
    count = onehot.sum(axis=1).at[:, 0].set(0)
    starts = [jnp.zeros(C, jnp.int32)]
    c = jnp.zeros(C, jnp.int32)
    for l in range(1, L + 1):
        starts.append(c)
        c = (c + count[:, l]) * 2
    start = jnp.stack(starts, axis=1)
    base = jnp.cumsum(count, axis=1) - count
    key = jnp.where(lengths > 0, lengths, L + 1) * n + jnp.arange(n)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    return start, count, base, order


def _classify_windows(start, count, base, order, max_len: int, lut_bits: int):
    """LUT[C, 2**lut_bits] -> sym | len << 16 (or -1 for miss / longer code).

    A window w (LSB-first peek) decodes as the unique length l whose
    MSB-first tier range contains bitrev(w)'s top l bits.  (jnp, jitted.)
    """
    W = 1 << lut_bits
    v = jnp.asarray(_bitrev(np.arange(W, dtype=np.uint32), lut_bits)
                    .astype(np.int32))  # MSB view, compile-time constant
    lut = jnp.full((start.shape[0], W), -1, jnp.int32)
    found = jnp.zeros((start.shape[0], W), bool)
    for l in range(1, min(max_len, lut_bits) + 1):
        top = v >> (lut_bits - l)
        s = start[:, l][:, None]
        cnt = count[:, l][:, None]
        hit = (~found) & (top >= s) & (top < s + cnt)
        pos = jnp.clip(base[:, l][:, None] + top - s, 0, order.shape[1] - 1)
        sym = jnp.take_along_axis(order, pos, axis=1)
        lut = jnp.where(hit, sym | (l << 16), lut)
        found = found | hit
    return lut


@jax.jit
def build_chunk_tables(len1, len2, n_words, word_base, rlens):
    """Pack per-chunk decode tables for the kernel (device-side, jitted --
    the host contributes only the tiny nibble-unpacked length arrays).

    len1 [C, 514], len2 [C, 32]: code lengths from the chunk headers.
    n_words[C]: payload words incl. >=2 zero-padding words (the bit reader
    may legitimately peek past the last payload byte, reference sentinel
    semantics src/libzling.cpp:369-374).  word_base[C]: chunk start in the
    flat word array, multiples of 128.  rlens[C]: token counts.

    Returns (meta [C,8,128] i32, order1 [C,8,128] i32, lut1 [C,8,512] i32,
    lut2 [C,8,128] i32).
    """
    C = len1.shape[0]
    len1 = len1.astype(jnp.int32)
    len2 = len2.astype(jnp.int32)
    s1, c1, b1, o1 = _canonical_tiers(len1, HUFFMAN_MAX_LEN_1)
    lut1 = _classify_windows(s1, c1, b1, o1, HUFFMAN_MAX_LEN_1, LUT_BITS)

    s2, c2, b2, o2 = _canonical_tiers(len2, HUFFMAN_MAX_LEN_2)
    # full 8-bit LUT for alphabet 2 -> len2 | matchidx_bitlen << 8 | base << 16
    lut2sym = _classify_windows(s2, c2, b2, o2, HUFFMAN_MAX_LEN_2,
                                HUFFMAN_MAX_LEN_2)
    blen = jnp.asarray(np.asarray(MATCHIDX_BLEN, np.int32))
    mbase = jnp.asarray(np.asarray(MATCHIDX_BASE, np.int32))
    sym2 = jnp.clip(lut2sym & 0xFFFF, 0, 31)
    l2 = lut2sym >> 16
    lut2 = jnp.where(lut2sym >= 0,
                     l2 | (blen[sym2] << 8) | (mbase[sym2] << 16), -1)

    meta = jnp.zeros((C, 8, 128), jnp.int32)
    meta = meta.at[:, 0, 0].set(n_words.astype(jnp.int32))
    meta = meta.at[:, 0, 1].set(rlens.astype(jnp.int32))
    meta = meta.at[:, 0, 2].set(word_base.astype(jnp.int32))
    meta = meta.at[:, 1, 1:HUFFMAN_MAX_LEN_1 + 1].set(s1[:, 1:])
    meta = meta.at[:, 2, 1:HUFFMAN_MAX_LEN_1 + 1].set(c1[:, 1:])
    meta = meta.at[:, 3, 1:HUFFMAN_MAX_LEN_1 + 1].set(b1[:, 1:])

    order1 = jnp.zeros((C, 1024), jnp.int32).at[:, :HUFFMAN_CODES_1].set(o1)
    lut2p = jnp.full((C, 1024), -1, jnp.int32).at[:, :256].set(lut2)
    return (meta, order1.reshape(C, 8, 128),
            lut1.reshape(C, 8, 512), lut2p.reshape(C, 8, 128))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _decode_chunk_kernel(meta_ref, order_ref, lut1_ref, lut2_ref,
                         words_ref, out_ref, status_ref,
                         slab_a, slab_b, obuf_a, obuf_b, fb_ref,
                         sem_in, sem_out,
                         *, slab_words: int, flush_tokens: int,
                         out_tokens: int):
    # per-member slab/output buffers: Mosaic rejects DMA slices of a single
    # row out of a (2, N) SMEM memref ("slice shape along dimension 0 must
    # be aligned to tiling (2)"), so the pair axis is two separate (1, N)
    # scratch refs selected by the PYTHON member index k
    slabs = (slab_a, slab_b)
    obufs = (obuf_a, obuf_b)
    # Each grid step decodes a PAIR of chunks with their two serial
    # bit-reader chains interleaved: chunks are entropy-independent (own
    # tables and payload, reference src/libzling.cpp:212-229), and the unit
    # body's dependent SMEM-load chain (lut -> length -> shift -> next lut
    # address) leaves the scalar core stalled for roughly a third of each
    # unit -- the second chunk's independent chain fills those slots.
    # (Measured: 11.1 M tok/s single-chain 4-unit loop -> see DESIGN.md -1
    # for the paired number.)  All per-chunk refs carry a leading pair axis.
    c = pl.program_id(0)

    # The bit reader is a 64-bit accumulator in two 32-bit registers (lo, hi)
    # with `nbits` valid bits counted from lo's LSB (bits above nbits are
    # zero).  One unit consumes at most 15 + 8 + 8 = 31 bits, so topping up
    # to >= 32 bits once per unit keeps every peek inside lo.  The loop
    # starts with nbits = 64 and every refill restores nbits >= 32 before
    # consuming <= 31, so nbits >= 1 always: the nbits == 0 edge cases need
    # no selects.  Each pair member decodes TWO units per iteration
    # (4 units/iteration total, matching the single-chain unroll).

    def load_slab(k, word_base, woff):
        # woff is chunk-relative, 128-word aligned by construction
        src = pl.multiple_of(word_base + woff, 128)
        cp = pltpu.make_async_copy(words_ref.at[0, pl.ds(src, slab_words)],
                                   slabs[k].at[0, :], sem_in)
        cp.start()
        cp.wait()

    def one_unit(k, rlen, wpos, woff, lo, hi, nbits, emitted, obuf_n, bad,
                 active):
        # refill the accumulator (at most one word per unit)
        w = slabs[k][0, wpos - woff]
        fill = active & (nbits < 32)
        lo = jnp.where(fill, lo | (w << nbits), lo)
        hi = jnp.where(fill, _srl(w, 32 - nbits), hi)
        wpos = wpos + fill.astype(jnp.int32)
        nbits = nbits + jnp.where(fill, 32, 0)

        # alphabet-1 symbol via the 12-bit LUT; codes of 13..15 bits take
        # the canonical tier-compare fallback, branch-gated with pl.when so
        # the (rare) path costs the hot loop only a compare + one SMEM load
        e = lut1_ref[k, _srl(lo & 0xFFF, 9), lo & 0x1FF]

        @pl.when(active & (e < 0))
        def _():
            # reverse the 15-bit window to the MSB-first canonical view
            v = lo & 0x7FFF
            v = (_srl(v & 0xFF00, 8)) | ((v & 0x00FF) << 8)
            v = (_srl(v & 0xF0F0, 4)) | ((v & 0x0F0F) << 4)
            v = (_srl(v & 0xCCCC, 2)) | ((v & 0x3333) << 2)
            v = (_srl(v & 0xAAAA, 1)) | ((v & 0x5555) << 1)
            v15 = _srl(v, 1)
            packed = jnp.int32(-1)
            for l in range(LUT_BITS + 1, HUFFMAN_MAX_LEN_1 + 1):
                top = _srl(v15, HUFFMAN_MAX_LEN_1 - l)
                s = meta_ref[k, 1, l]
                cnt = meta_ref[k, 2, l]
                hit = (packed < 0) & (top >= s) & (top < s + cnt)
                pos = jnp.clip(jnp.where(hit, meta_ref[k, 3, l] + top - s, 0),
                               0, 1023)
                cand = order_ref[k, _srl(pos, 7), pos & 127]
                packed = jnp.where(hit, cand | (l << 16), packed)
            fb_ref[k] = packed

        ev = jnp.where(e < 0, fb_ref[k], e)
        bad = bad | (active & (ev < 0))
        ev = jnp.maximum(ev, 0)
        sym = ev & 0xFFFF
        l1 = jnp.maximum(_srl(ev, 16) & 31, 1)  # >=1 keeps shifts defined

        # matchidx (code2 + extra bits): peeked straight out of lo at
        # offsets l1 and l1+l2 (l1+l2+blen <= 31 < nbits)
        is_match = (sym >= 258) & (emitted + 1 < rlen)
        p2 = _srl(lo, l1) & 0xFF
        e2 = lut2_ref[k, _srl(p2, 7), p2 & 0x7F]
        bad = bad | (active & is_match & (e2 < 0))
        e2 = jnp.maximum(e2, 0)
        l2 = e2 & 0xFF
        blen = _srl(e2, 8) & 0xFF
        extra = _srl(lo, l1 + l2) & ((jnp.int32(1) << blen) - 1)
        idxtok = _srl(e2, 16) + extra

        # consume (1 <= nc <= 31) and emit; idxtok is written
        # unconditionally (obuf has slack) and kept only for matches
        nc = jnp.where(active, l1 + jnp.where(is_match, l2 + blen, 0), 1)
        lo2 = _srl(lo, nc) | (hi << (32 - nc))
        hi2 = _srl(hi, nc)
        lo = jnp.where(active, lo2, lo)
        hi = jnp.where(active, hi2, hi)
        nbits = nbits - jnp.where(active, nc, 0)
        obufs[k][0, obuf_n] = sym
        obufs[k][0, obuf_n + 1] = idxtok
        adv = jnp.where(active, 1 + is_match.astype(jnp.int32), 0)
        obuf_n = obuf_n + adv
        emitted = emitted + adv
        return wpos, lo, hi, nbits, emitted, obuf_n, bad

    def chunk_pre(k, n_words, rlen, word_base, out_base, st):
        """Per-iteration slab refill + output burst for pair member k."""
        wpos, woff, lo, hi, nbits, emitted, obuf_n, nflushed, bad = st

        # keep the slab covering the next TWO words (one refill per unit)
        need = wpos + 1 >= woff + slab_words

        @pl.when(need)
        def _():
            load_slab(k, word_base, (wpos >> 7) << 7)

        woff = jnp.where(need, (wpos >> 7) << 7, woff)

        # drain the token buffer in aligned bursts (up to 4 tokens/iter)
        do_flush = obuf_n >= flush_tokens

        @pl.when(do_flush)
        def _():
            # out is flat [1, C * out_tokens]: single-row slices of tiled 2-D
            # HBM arrays are not DMA-able (sublane tiling), flat offsets are
            dst = pl.multiple_of(out_base + nflushed * flush_tokens, 128)
            cp = pltpu.make_async_copy(obufs[k].at[0, pl.ds(0, flush_tokens)],
                                       out_ref.at[0, pl.ds(dst, flush_tokens)],
                                       sem_out)
            cp.start()
            cp.wait()
            # carry any leftover tokens (slots beyond obuf_n are garbage and
            # get overwritten or never read)
            for q in range(8):
                obufs[k][0, q] = obufs[k][0, flush_tokens + q]

        nflushed = nflushed + do_flush.astype(jnp.int32)
        obuf_n = jnp.where(do_flush, obuf_n - flush_tokens, obuf_n)
        return (wpos, woff, lo, hi, nbits, emitted, obuf_n, nflushed, bad)

    def chunk_units(k, n_words, rlen, st):
        wpos, woff, lo, hi, nbits, emitted, obuf_n, nflushed, bad = st
        for _ in range(2):
            active = (emitted < rlen) & ~bad
            wpos, lo, hi, nbits, emitted, obuf_n, bad = one_unit(
                k, rlen, wpos, woff, lo, hi, nbits, emitted, obuf_n, bad,
                active)
        # corrupt-stream overrun check, once per iteration: wpos grows by
        # <= 2 words here and the word buffer has >= a full trailing zero
        # slab, so a delayed detection never reads out of bounds
        bad = bad | (wpos > n_words)
        return (wpos, woff, lo, hi, nbits, emitted, obuf_n, nflushed, bad)

    n_words = [meta_ref[k, 0, 0] for k in range(2)]
    rlen = [meta_ref[k, 0, 1] for k in range(2)]
    word_base = [meta_ref[k, 0, 2] for k in range(2)]
    out_base = [(c * 2 + k) * out_tokens for k in range(2)]

    for k in range(2):
        load_slab(k, word_base[k], 0)

    def body(carry):
        sa, sb = carry[:9], carry[9:]
        sa = chunk_pre(0, n_words[0], rlen[0], word_base[0], out_base[0], sa)
        sb = chunk_pre(1, n_words[1], rlen[1], word_base[1], out_base[1], sb)
        # both members' unit chains sit in one straight-line block so the
        # scheduler interleaves their independent dependency chains
        sa = chunk_units(0, n_words[0], rlen[0], sa)
        sb = chunk_units(1, n_words[1], rlen[1], sb)
        return sa + sb

    def cond(carry):
        live_a = (carry[5] < rlen[0]) & ~carry[8]
        live_b = (carry[14] < rlen[1]) & ~carry[17]
        return live_a | live_b

    def init(k):
        return (jnp.int32(2), jnp.int32(0), slabs[k][0, 0], slabs[k][0, 1],
                jnp.int32(64), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.bool_(False))

    final = jax.lax.while_loop(cond, body, init(0) + init(1))

    for k in range(2):
        wpos, _woff, _lo, _hi, nbits, emitted, obuf_n, nflushed, bad = \
            final[9 * k: 9 * k + 9]
        bit_pos = wpos * 32 - nbits
        bad = bad | (bit_pos > n_words[k] * 32)

        # final flush: one full burst starting at the last aligned boundary
        # (trailing entries beyond obuf_n are garbage; out has OUT_PAD slack)
        @pl.when(obuf_n > 0)
        def _(k=k, nflushed=nflushed):
            dst = pl.multiple_of(out_base[k] + nflushed * flush_tokens, 128)
            cp = pltpu.make_async_copy(obufs[k].at[0, pl.ds(0, flush_tokens)],
                                       out_ref.at[0, pl.ds(dst, flush_tokens)],
                                       sem_out)
            cp.start()
            cp.wait()

        status_ref[k, 0, 0] = emitted
        status_ref[k, 0, 1] = bit_pos
        status_ref[k, 0, 2] = bad.astype(jnp.int32)
        status_ref[k, 0, 3] = nflushed


@functools.partial(jax.jit, static_argnames=(
    "interpret", "slab_words", "flush_tokens", "max_tokens"))
def _decode_call(meta, order1, lut1, lut2, words, interpret: bool = False,
                 slab_words: int = SLAB_WORDS, flush_tokens: int = FLUSH_TOKENS,
                 max_tokens: int = MAX_TOKENS):
    C = meta.shape[0]  # even (decode_chunks pads with an rlen=0 dummy)
    out_tokens = max_tokens + 2 * flush_tokens
    grid = (C // 2,)
    kernel = pl.pallas_call(
        functools.partial(_decode_chunk_kernel, slab_words=slab_words,
                          flush_tokens=flush_tokens, out_tokens=out_tokens),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 8, 512), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C * out_tokens), jnp.int32),
            jax.ShapeDtypeStruct((C, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, slab_words), jnp.int32),
            pltpu.SMEM((1, slab_words), jnp.int32),
            pltpu.SMEM((1, flush_tokens + 8), jnp.int32),
            pltpu.SMEM((1, flush_tokens + 8), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    tokens_flat, status = kernel(meta, order1, lut1, lut2, words)
    return tokens_flat.reshape(C, out_tokens), status


def pack_payload_words(payloads: list[bytes], slab_words: int = SLAB_WORDS,
                       total_words: int | None = None):
    """Lay chunk payloads into one flat word array for the kernel.

    Each chunk start is padded to 512 B so it is 128-word aligned, with one
    extra 512 B zero block per chunk (the bit reader legitimately peeks past
    the last payload byte, reference sentinel semantics
    src/libzling.cpp:369-374) and one trailing slab so the final slab DMA
    never reads out of bounds.  total_words (optional) zero-pads the result
    to a uniform length so callers can keep jit shapes stable across calls.
    Returns (words i32[Wtot], word_base i32[C], n_words i32[C]).
    """
    C = len(payloads)
    word_base = np.zeros(C, np.int32)
    n_words = np.zeros(C, np.int32)
    flat = []
    base = 0
    for i, p in enumerate(payloads):
        nb = (len(p) + 511) // 512 * 512 + 512
        flat.append(np.frombuffer(p + bytes(nb - len(p)), np.uint8))
        word_base[i] = base
        n_words[i] = len(p) // 4 + 2  # payload words + legal 8-byte overpeek
        base += nb // 4
    flat.append(np.zeros(slab_words * 4, np.uint8))
    words = np.concatenate(flat).view("<u4").astype(np.int32)
    if total_words is not None:
        if len(words) > total_words:
            raise ValueError("payloads exceed total_words")
        words = np.pad(words, (0, total_words - len(words)))
    return words, word_base, n_words


def decode_chunks(len1: np.ndarray, len2: np.ndarray, payloads: list[bytes],
                  rlens: np.ndarray, interpret: bool = False,
                  slab_words: int = SLAB_WORDS, flush_tokens: int = FLUSH_TOKENS,
                  max_tokens: int = MAX_TOKENS):
    """Decode all chunks' bitstreams to token arrays on device.

    len1/len2: [C, 514]/[C, 32] code lengths (headers already stripped).
    payloads: per-chunk bitstream bytes (without the 273-byte table header).
    Returns (tokens [C, MAX_TOKENS + OUT_PAD] i32 device array, status
    [C, 8, 128]: [c,0,0]=emitted, [c,0,1]=bits consumed, [c,0,2]=bad).
    """
    C = len(payloads)
    # the kernel decodes chunk PAIRS: pad odd counts with an rlen=0 dummy
    # (its member does nothing; results are sliced back to C below)
    len1 = np.asarray(len1, np.int32)
    len2 = np.asarray(len2, np.int32)
    rlens = np.asarray(rlens, np.int32)
    payloads = list(payloads)
    if C % 2:
        payloads.append(b"")
        len1 = np.concatenate([len1, len1[:1]])
        len2 = np.concatenate([len2, len2[:1]])
        rlens = np.concatenate([rlens, np.zeros(1, np.int32)])
    words, word_base, n_words = pack_payload_words(payloads, slab_words)

    meta, order1, lut1, lut2 = build_chunk_tables(
        jnp.asarray(len1), jnp.asarray(len2),
        jnp.asarray(n_words), jnp.asarray(word_base),
        jnp.asarray(rlens))
    tokens, status = _decode_call(
        meta, order1, lut1, lut2, jnp.asarray(words[None, :]),
        interpret=interpret, slab_words=slab_words,
        flush_tokens=flush_tokens, max_tokens=max_tokens)
    return tokens[:C], status[:C]
