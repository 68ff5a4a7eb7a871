"""Device-side ROLZ tokenizer and resolver (reference implementations).

These are bit-exact JAX ports of the format's ROLZ state machine
(src/libzling_lz.cpp:128-316 encoder, :318-399 decoder), expressed as
``lax.while_loop`` scans so the *entire* codec can run jitted on device and
shard over a mesh.  They are the correctness/compatibility path and the
substrate for the multi-chip dry-run; the throughput path for the sequential
stages is the native host engine (libzling_tpu/native), and Pallas kernels
with batch-speculative match finding are the planned replacement (SURVEY.md
section 7.2.1).

Conventions:
  * a "unit" is one alphabet-1 symbol; matches carry their ring index in a
    parallel array instead of a following token;
  * literal units store the RAW byte -- MTF relabeling is a separate pass
    (ops/mtf.py) because token boundaries never depend on MTF values;
  * unit kinds: 0 = raw block-head byte (bypasses MTF), 1 = literal,
    2 = word-MRU hit, 3 = match.

All state lives in explicit pytrees so chunk calls compose under jit/scan and
the block-parallel encoder can shard state per device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mtf import _J_MTF_NEXT
from ..tables import (
    BUCKET_ITEM_HASH,
    BUCKET_ITEM_SIZE,
    MATCH_MAX_LEN,
    MATCH_MIN_LEN,
    MATCH_MIN_LEN_ENABLE_LAZY,
)

KIND_RAW = 0
KIND_LITERAL = 1
KIND_WORD = 2
KIND_MATCH = 3

_NIL = 65535
_RING_MASK = BUCKET_ITEM_SIZE - 1
_LCP_WIN = 264  # >= MATCH_MAX_LEN + 4, window for vectorized common-length


class EncState(NamedTuple):
    """Per-block encoder bucket state (reset every 16 MB block)."""

    head: jnp.ndarray        # [256] i32
    hash_head: jnp.ndarray   # [256, 8192] i32 (65535 = nil)
    chain: jnp.ndarray       # [256, 4096] i32
    slot: jnp.ndarray        # [256, 4096] u32: pos | check << 24


def enc_state_init() -> EncState:
    return EncState(
        head=jnp.zeros(256, jnp.int32),
        hash_head=jnp.full((256, BUCKET_ITEM_HASH), _NIL, jnp.int32),
        chain=jnp.full((256, BUCKET_ITEM_SIZE), _NIL, jnp.int32),
        slot=jnp.zeros((256, BUCKET_ITEM_SIZE), jnp.uint32),
    )


class DecState(NamedTuple):
    """Per-block decoder ring state (MTF lives separately: it spans blocks)."""

    head: jnp.ndarray  # [256] i32
    ring: jnp.ndarray  # [256, 4096] i32 output positions


def dec_state_init() -> DecState:
    return DecState(
        head=jnp.zeros(256, jnp.int32),
        ring=jnp.zeros((256, BUCKET_ITEM_SIZE), jnp.int32),
    )


def _u32le(block, pos):
    b0 = block[pos].astype(jnp.uint32)
    b1 = block[pos + 1].astype(jnp.uint32)
    b2 = block[pos + 2].astype(jnp.uint32)
    b3 = block[pos + 3].astype(jnp.uint32)
    return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


def _hash4(block, pos):
    """HashContext (src/libzling_lz.cpp:55-57)."""
    h = _u32le(block, pos) + block[pos + 2].astype(jnp.uint32) * 137 \
        + block[pos + 3].astype(jnp.uint32) * 13337
    check = ((h // BUCKET_ITEM_HASH) % 256).astype(jnp.int32)
    slot = (h % BUCKET_ITEM_HASH).astype(jnp.int32)
    return check, slot


def _common_length(block, p1, p2):
    """GetCommonLength semantics (src/libzling_lz.cpp:66-89): exact common
    prefix capped at MATCH_MAX_LEN, but 0 unless the first 4 bytes all match.
    """
    w1 = jax.lax.dynamic_slice(block, (p1,), (_LCP_WIN,))
    w2 = jax.lax.dynamic_slice(block, (p2,), (_LCP_WIN,))
    neq = w1 != w2
    lcp = jnp.argmax(jnp.concatenate([neq, jnp.ones(1, jnp.bool_)])).astype(jnp.int32)
    return jnp.where(lcp >= MATCH_MIN_LEN, jnp.minimum(lcp, MATCH_MAX_LEN), 0)


def _match_and_update(state: EncState, block, pos, depth, lazy1, lazy2, do_insert):
    """MatchAndUpdate (src/libzling_lz.cpp:211-289), maskable.

    Inserts pos into its bucket when do_insert, then walks the hash chain.
    Returns (state', found, match_len, match_idx).
    """
    ctx = block[pos - 1].astype(jnp.int32)
    check, hslot = _hash4(block, pos)
    node0 = state.hash_head[ctx, hslot]

    head = jnp.where(do_insert, (state.head[ctx] + 1) & _RING_MASK, state.head[ctx])
    ctx_w = jnp.where(do_insert, ctx, 256)  # OOB -> dropped scatter
    new_chain = state.chain.at[ctx_w, head].set(node0, mode="drop")
    new_slot = state.slot.at[ctx_w, head].set(
        pos.astype(jnp.uint32) | check.astype(jnp.uint32) << 24, mode="drop")
    new_hash = state.hash_head.at[ctx_w, hslot].set(head, mode="drop")
    new_head = state.head.at[jnp.where(do_insert, ctx, 256)].set(head, mode="drop")
    state = EncState(new_head, new_hash, new_chain, new_slot)

    searchable = do_insert & (node0 != _NIL) & (node0 != head)

    def walk_body(i, carry):
        node, best_len, best_node, done = carry
        s = state.slot[ctx, node]
        offset = (s & 0xFFFFFF).astype(jnp.int32)
        node_check = (s >> 24).astype(jnp.int32)
        probe_ok = (node_check == check) & (
            block[pos + best_len] == block[offset + best_len])
        lcp = jnp.where(probe_ok & ~done, _common_length(block, pos, offset), 0)
        better = (lcp > best_len) & ~done
        best_node = jnp.where(better, node, best_node)
        best_len = jnp.where(better, lcp, best_len)
        done = done | (best_len == MATCH_MAX_LEN)
        nxt = state.chain[ctx, node]
        end = (nxt == _NIL) | (offset <= (state.slot[ctx, nxt] & 0xFFFFFF).astype(jnp.int32))
        done = done | end | (i + 1 >= depth)
        node = jnp.where(done, node, nxt)
        return node, best_len, best_node, done

    init = (jnp.where(searchable, node0, 0), jnp.int32(MATCH_MIN_LEN - 1),
            jnp.int32(0), ~searchable)
    _, best_len, best_node, _ = jax.lax.fori_loop(0, 16, walk_body, init)

    found = searchable & (best_len >= MATCH_MIN_LEN)

    def lazy_probe(p, maxlen, lazy_depth):
        lctx = block[p - 1].astype(jnp.int32)
        _, lslot = _hash4(block, p)
        lnode = state.hash_head[lctx, lslot]
        probe_at = maxlen - 3

        def lbody(i, carry):
            node, hit, done = carry
            s = state.slot[lctx, node]
            offset = (s & 0xFFFFFF).astype(jnp.int32)
            h = ~done & (_u32le(block, p + probe_at) == _u32le(block, offset + probe_at))
            hit = hit | h
            nxt = state.chain[lctx, node]
            end = (nxt == _NIL) | (offset <= (state.slot[lctx, nxt] & 0xFFFFFF).astype(jnp.int32))
            done = done | h | end | (i + 1 >= lazy_depth)
            node = jnp.where(done, node, nxt)
            return node, hit, done

        start_ok = lnode != _NIL
        _, hit, _ = jax.lax.fori_loop(
            0, 4, lbody, (jnp.where(start_ok, lnode, 0), jnp.bool_(False), ~start_ok))
        return hit

    do_lazy = found & (best_len < MATCH_MIN_LEN_ENABLE_LAZY)
    lazy_hit1 = jnp.where(do_lazy & (lazy1 > 0),
                          lazy_probe(pos + 1, best_len, lazy1), False)
    lazy_hit2 = jnp.where(do_lazy & (lazy2 > 0) & ~lazy_hit1,
                          lazy_probe(pos + 2, best_len, lazy2), False)
    found = found & ~lazy_hit1 & ~lazy_hit2
    match_idx = (state.head[ctx] - best_node) & _RING_MASK
    return state, found, best_len, match_idx


@functools.partial(jax.jit, static_argnames=("max_units",))
def tokenize_chunk(state: EncState, block, ilen, start, depth, lazy1, lazy2,
                   max_tokens, max_units: int):
    """Tokenize one ROLZ chunk (EncodeImpl, src/libzling_lz.cpp:139-195).

    block: [B] uint8, zero-padded by >= 275 bytes beyond ilen.
    Returns (state', sym [max_units] i32, idx, upos, kind, n_units, n_tokens,
    new_pos).  Literal syms carry RAW bytes (relabel with ops/mtf.py).
    """
    B = block.shape[0]
    del B
    sym = jnp.zeros(max_units, jnp.int32)
    idx = jnp.zeros(max_units, jnp.int32)
    upos = jnp.zeros(max_units, jnp.int32)
    kind = jnp.zeros(max_units, jnp.int32)
    word_mru = jnp.zeros((256, 2), jnp.int32)
    match_limit = ilen - MATCH_MAX_LEN - 16

    def emit(arrs, n, s, ix, p, k):
        sym, idx, upos, kind = arrs
        return (sym.at[n].set(s, mode="drop"), idx.at[n].set(ix, mode="drop"),
                upos.at[n].set(p, mode="drop"), kind.at[n].set(k, mode="drop"))

    def body(carry):
        ipos, n_units, n_tok, state, word_mru, arrs = carry

        is_head = ipos <= 1  # block-head raw bytes (libzling_lz.cpp:150-151)

        def head_case(args):
            ipos, n_units, n_tok, state, word_mru, arrs = args
            arrs = emit(arrs, n_units, block[ipos].astype(jnp.int32), 0, ipos, KIND_RAW)
            return ipos + 1, n_units + 1, n_tok + 1, state, word_mru, arrs

        def normal_case(args):
            ipos, n_units, n_tok, state, word_mru, arrs = args
            attempt = ipos < match_limit
            state, found, mlen, midx = _match_and_update(
                state, block, ipos, depth, lazy1, lazy2, attempt)

            # --- match branch
            ipos_m = ipos + mlen
            cm = block[ipos_m - 3].astype(jnp.int32)
            wm = block[ipos_m - 2].astype(jnp.int32) * 256 + block[ipos_m - 1].astype(jnp.int32)
            mru_differs = word_mru[cm, 0] != wm

            # --- word branch (only when no match)
            can_word = ~found & (ipos + 1 < ilen)
            cw = block[ipos - 1].astype(jnp.int32)
            ww = block[ipos].astype(jnp.int32) * 256 + block[ipos + 1].astype(jnp.int32)
            hit0 = can_word & (word_mru[cw, 0] == ww)
            hit1 = can_word & ~hit0 & (word_mru[cw, 1] == ww)

            # --- literal branch
            is_lit = ~found & ~hit0 & ~hit1
            ipos_l = ipos + 1

            # emission
            s = jnp.where(found, 258 + mlen - MATCH_MIN_LEN,
                          jnp.where(hit0, 256,
                                    jnp.where(hit1, 257, block[ipos].astype(jnp.int32))))
            k = jnp.where(found, KIND_MATCH,
                          jnp.where(hit0 | hit1, KIND_WORD, KIND_LITERAL))
            arrs = emit(arrs, n_units, s, jnp.where(found, midx, 0), ipos, k)

            new_ipos = jnp.where(found, ipos_m, jnp.where(hit0 | hit1, ipos + 2, ipos_l))
            new_ntok = n_tok + jnp.where(found, 2, 1)

            # word-MRU updates (libzling_lz.cpp:163-166,178-184,188-191):
            #   match: push (conditional on differing), word0: none,
            #   word1/literal: push unconditional at context block[new_ipos-3]
            cu = block[new_ipos - 3].astype(jnp.int32)
            wu = block[new_ipos - 2].astype(jnp.int32) * 256 + block[new_ipos - 1].astype(jnp.int32)
            do_push = jnp.where(found, mru_differs, ~hit0)
            cu_w = jnp.where(do_push, cu, 256)
            old0 = word_mru[cu, 0]
            word_mru = word_mru.at[cu_w, 1].set(old0, mode="drop")
            word_mru = word_mru.at[cu_w, 0].set(wu, mode="drop")
            return new_ipos, n_units + 1, new_ntok, state, word_mru, arrs

        return jax.lax.cond(is_head, head_case, normal_case,
                            (ipos, n_units, n_tok, state, word_mru, arrs))

    def cond(carry):
        ipos, n_units, n_tok, _, _, _ = carry
        in_input = ipos < ilen
        budget = jnp.where(ipos <= 1, n_tok < max_tokens, n_tok + 1 < max_tokens)
        return in_input & budget & (n_units < max_units)

    ipos, n_units, n_tok, state, _, arrs = jax.lax.while_loop(
        cond, body, (start, jnp.int32(0), jnp.int32(0), state, word_mru,
                     (sym, idx, upos, kind)))
    sym, idx, upos, kind = arrs
    return state, sym, idx, upos, kind, n_units, n_tok, ipos


@functools.partial(jax.jit, static_argnames=("max_out",))
def resolve_chunk(state: DecState, mtf_table, tokens, n_tokens, out, opos0, encpos,
                  max_out: int):
    """Decode one chunk of zling tokens into out (src/libzling_lz.cpp:318-376).

    mtf_table: [256, 256] rank->symbol (persists across blocks).
    tokens: [T] i32 zling stream (matchidx as following token).
    out: [max_out] uint8 output block buffer (padded by >= 275).
    Returns (state', mtf_table', out', opos', ok).
    """
    word_mru = jnp.zeros((256, 2), jnp.int32)
    T = tokens.shape[0]
    del T

    def ring_insert_get(state, out, pos, idx):
        ctx = out[pos - 1].astype(jnp.int32)
        head = (state.head[ctx] + 1) & _RING_MASK
        ring = state.ring.at[ctx, head].set(pos)
        new_head = state.head.at[ctx].set(head)
        src = ring[ctx, (head - idx) & _RING_MASK]
        return DecState(new_head, ring), src

    def body(carry):
        ipos, opos, state, mtf_table, word_mru, out, bad = carry
        t = tokens[ipos]

        is_head = opos <= 1

        def head_case(args):
            ipos, opos, state, mtf_table, word_mru, out, bad = args
            out = out.at[opos].set((t & 0xFF).astype(jnp.uint8))
            return ipos + 1, opos + 1, state, mtf_table, word_mru, out, bad

        def literal_case(args):
            ipos, opos, state, mtf_table, word_mru, out, bad = args
            ctx = out[opos - 1].astype(jnp.int32)
            c = mtf_table[ctx, t]
            j = _J_MTF_NEXT()[t]
            other = mtf_table[ctx, j]
            mtf_table = mtf_table.at[ctx, t].set(other).at[ctx, j].set(c)
            out = out.at[opos].set(c.astype(jnp.uint8))
            state, _ = ring_insert_get(state, out, opos, 0)
            opos = opos + 1
            cu = out[opos - 3].astype(jnp.int32)
            wu = out[opos - 2].astype(jnp.int32) * 256 + out[opos - 1].astype(jnp.int32)
            word_mru = word_mru.at[cu, 1].set(word_mru[cu, 0]).at[cu, 0].set(wu)
            return ipos + 1, opos, state, mtf_table, word_mru, out, bad

        def word_case(args):
            ipos, opos, state, mtf_table, word_mru, out, bad = args
            ctx = out[opos - 1].astype(jnp.int32)
            w = word_mru[ctx, t - 256]
            out = out.at[opos].set(((w >> 8) & 0xFF).astype(jnp.uint8))
            state, _ = ring_insert_get(state, out, opos, 0)
            out = out.at[opos + 1].set((w & 0xFF).astype(jnp.uint8))
            opos = opos + 2
            is257 = t == 257
            cu = jnp.where(is257, out[opos - 3].astype(jnp.int32), 256)
            wu = out[opos - 2].astype(jnp.int32) * 256 + out[opos - 1].astype(jnp.int32)
            word_mru = word_mru.at[cu, 1].set(word_mru[cu, 0], mode="drop")
            word_mru = word_mru.at[cu, 0].set(wu, mode="drop")
            return ipos + 1, opos, state, mtf_table, word_mru, out, bad

        def match_case(args):
            ipos, opos, state, mtf_table, word_mru, out, bad = args
            mlen = t - 258 + MATCH_MIN_LEN
            midx = tokens[jnp.minimum(ipos + 1, tokens.shape[0] - 1)]
            state, src = ring_insert_get(state, out, opos, midx)
            bad = bad | (midx == 0) | (src == 0) | (src >= opos) | (ipos + 1 >= n_tokens)
            # overlap-safe copy: with period d = opos - src, byte-by-byte
            # copy equals periodic repetition of the d bytes at src
            period = jnp.maximum(opos - src, 1)
            offs = jnp.arange(_LCP_WIN, dtype=jnp.int32) % period
            vals = out[jnp.clip(src + offs, 0, out.shape[0] - 1)]
            cur = jax.lax.dynamic_slice(out, (opos,), (_LCP_WIN,))
            merged = jnp.where(jnp.arange(_LCP_WIN) < mlen, vals, cur)
            out = jax.lax.dynamic_update_slice(out, merged, (opos,))
            opos = opos + mlen
            cu = out[opos - 3].astype(jnp.int32)
            wu = out[opos - 2].astype(jnp.int32) * 256 + out[opos - 1].astype(jnp.int32)
            differs = word_mru[cu, 0] != wu
            cu_w = jnp.where(differs, cu, 256)
            word_mru = word_mru.at[cu_w, 1].set(word_mru[cu, 0], mode="drop")
            word_mru = word_mru.at[cu_w, 0].set(wu, mode="drop")
            return ipos + 2, opos, state, mtf_table, word_mru, out, bad

        branch = jnp.where(is_head, 0,
                           jnp.where(t < 256, 1, jnp.where(t < 258, 2, 3)))
        ipos, opos, state, mtf_table, word_mru, out, bad = jax.lax.switch(
            branch, [head_case, literal_case, word_case, match_case], carry)
        bad = bad | (opos > encpos)
        return ipos, opos, state, mtf_table, word_mru, out, bad

    def cond(carry):
        ipos, opos, _, _, _, _, bad = carry
        return (ipos < n_tokens) & ~bad

    ipos, opos, state, mtf_table, _, out, bad = jax.lax.while_loop(
        cond, body, (jnp.int32(0), opos0, state, mtf_table, word_mru, out,
                     jnp.bool_(False)))
    ok = ~bad & (opos == encpos)
    return state, mtf_table, out, opos, ok
