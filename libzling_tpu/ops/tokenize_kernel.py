"""Pallas TPU kernel: ROLZ tokenizer (block bytes -> raw-literal units).

The encoder hot loop (reference MatchAndUpdate/EncodeImpl,
src/libzling_lz.cpp:139-316) as a scalar-core kernel: one call tokenizes one
input block as its full chunk sequence under a per-chunk level schedule,
emitting units in the ops/rolz.py convention (literal units carry RAW bytes;
MTF relabel is a separate pass -- SURVEY.md section 7.0 phase b), so the
output plugs into the same relabel/histogram/pack stages as the jitted
tokenizer and the mesh path.

Hardware mapping (costs measured in DESIGN.md section 0):

  * sequential byte context (hash input, probe bytes at ipos, word-MRU
    windows) streams through an SMEM slab with a 300-byte lookahead --
    effectively free;
  * the 256-bucket state (hash heads, chains, slot pos|check) lives in
    VMEM as one entry per int32 lane, updated with one-hot RMW blends
    (cheap) and read with one-hot reductions; independent fetches (a
    node's slot + chain link) are issued together so their ~140-cycle
    transfer latencies overlap (DESIGN.md section 0), but the walk is
    still a serial transfer chain -- measured ~2000 cycles/unit end to
    end, so round-3 work is a profiling pass plus cross-iteration
    software pipelining (DESIGN.md section 3.4a);
  * GetCommonLength runs on the VPU: both 264-byte windows are
    funnel-aligned from the VMEM block copy and compared in one shot with
    a single first-mismatch extract;
  * lazy probes use dynamic-depth while loops, so extended levels e5/e6
    (depth 48 / lazy 8) are exact -- unlike the jitted tokenizer's static
    fori bounds.

This is the correctness-complete on-device encode lane; block-level data
parallelism over the mesh is the scaling axis.

Bit-exactness oracle: ops/rolz.py tokenize_chunk (golden-tested against the
reference binary), matched unit-for-unit in tests/test_tokenize_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import (
    LEVEL_PARAMS,
    MATCH_MAX_LEN,
    MATCH_MIN_LEN,
    MATCH_MIN_LEN_ENABLE_LAZY,
)

HASH_ROWS = 256 * 64          # hash heads: 256 ctx x 8192 slots
RING_ROWS = 256 * 32          # chain / slot: 256 ctx x 4096 nodes
SLAB_WORDS = 2048             # sequential byte window in SMEM
LOOKAHEAD = 300               # bytes needed beyond ipos (match + lazy probes)
STAGE_UNITS = 512             # output units per DMA burst
CACHE_LINES = 16384           # SMEM chain cache (direct-mapped, SoA, 384 KB)
_NIL = 65535

_LEVEL_TABLE = np.asarray([LEVEL_PARAMS[l] for l in sorted(LEVEL_PARAMS)],
                          np.int32)


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _tokenize_kernel(meta_ref, blockf_hbm, block2d_hbm,
                     outa_hbm, outb_hbm, stat_ref,
                     slab_ref, stg_a, stg_b, head_ref, mru_ref, pers_ref,
                     ctag_ref, ccnt_ref, cs0_ref, cn1_ref, cs1_ref, cn2_ref,
                     hslab_ref, block_vmem, hash_ref, chain_ref, slot_ref,
                     hstage_vmem, sem_in, sem_blk, sem_oa, sem_ob, sem_hs,
                     *, chunk_stride: int, max_chunks: int, block_rows: int,
                     debug_flags: int = 0):
    # debug_flags (diagnostic builds only): 1 = chain cache off,
    # 2 = lazy-1 prefetch off, 4 = lazy probes off, 8 = vector-domain lazy
    # verdict off (fall back to the scalar want-compare probe)
    DBG_NO_CACHE = bool(debug_flags & 1)
    DBG_NO_PREFETCH = bool(debug_flags & 2)
    DBG_NO_LAZY = bool(debug_flags & 4)
    DBG_NO_MASK = bool(debug_flags & 8)
    ilen = meta_ref[0, 0, 0]
    max_tokens = meta_ref[0, 0, 1]
    chunk_units = meta_ref[0, 0, 2]
    IOTA = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    IOTAS = jax.lax.broadcasted_iota(jnp.int32, (SLAB_WORDS // 128, 128), 1)
    L_ROWS = 3  # 264-byte LCP window lives in 3 rows
    IOTA3 = jax.lax.broadcasted_iota(jnp.int32, (L_ROWS, 128), 1)
    ROW3 = jax.lax.broadcasted_iota(jnp.int32, (L_ROWS, 128), 0)
    POS3 = ROW3 * 128 + IOTA3

    # whole block into VMEM (the candidate-side random-access copy)
    cp = pltpu.make_async_copy(block2d_hbm, block_vmem, sem_blk)
    cp.start()
    cp.wait()

    # bucket state: reset per block (libzling_lz.cpp:197-209)
    def fill(ref, rows, val):
        v32 = jnp.full((32, 128), val, jnp.int32)

        def zz(i, _):
            ref[pl.ds(i * 32, 32), :] = v32
            return 0

        jax.lax.fori_loop(0, rows // 32, zz, 0)

    fill(hash_ref, HASH_ROWS, _NIL)
    fill(chain_ref, RING_ROWS, _NIL)
    fill(slot_ref, RING_ROWS, 0)

    # Pallas outputs are uninitialized: zero the stat block so chunk slots
    # never reached report nunits/ntoks/encpos = 0 (consumers mask on them)
    def zstat(i, _):
        stat_ref[0, i >> 8, i & 255] = 0
        return 0

    jax.lax.fori_loop(0, 8 * 256, zstat, 0)

    def zhead(i, _):
        head_ref[0, i] = 0
        return 0

    jax.lax.fori_loop(0, 258, zhead, 0)

    # chain-cache tags: invalidate per block (the SoA data words need no
    # init -- they are only read behind a tag hit)
    def zctag(i, _):
        ctag_ref[0, i] = -1
        return 0

    jax.lax.fori_loop(0, CACHE_LINES, zctag, 0)

    SROWS = SLAB_WORDS // 128

    def load_slab(soff):
        src = pl.multiple_of(soff, 128)
        cp = pltpu.make_async_copy(blockf_hbm.at[0, pl.ds(src, SLAB_WORDS)],
                                   slab_ref.at[0, :], sem_in)
        cp.start()
        # hash precompute, vector domain: the per-position hash4 values
        # (check | hslot << 8) for the whole slab window, computed from the
        # resident block copy and DMA'd to SMEM beside the byte slab.  The
        # scalar loop then reads ONE SMEM word where it used to run ~15 ops
        # of u32le + multiplies, at 2-3 call sites per unit; the vector
        # pass + 8 KB DMA amortize to ~ns/unit over the ~400 units a slab
        # refill covers (round-5; the kernel is issue-bound, DESIGN.md -3).
        # block_rows is sized with SLAB_WORDS + 512 bytes of zero slack
        # beyond ilen and soff <= ilen, so rows r0 .. r0+SROWS stay in
        # bounds without clipping (a clip would silently misalign the
        # precomputed values with their positions)
        r0 = _srl(soff, 7)
        w = block_vmem[pl.ds(r0, SROWS + 1), :]
        sh = [w[0:SROWS, :]]
        for k in (1, 2, 3):
            rk = pltpu.roll(w, shift=128 - k, axis=1)
            sh.append(jnp.where(IOTAS < 128 - k, rk[0:SROWS, :],
                                rk[1:SROWS + 1, :]))
        h = (sh[0] | (sh[1] << 8) | (sh[2] << 16) | (sh[3] << 24)) \
            + sh[2] * 137 + sh[3] * 13337
        hstage_vmem[:, :] = (_srl(h, 13) & 255) | ((h & 8191) << 8)
        cph = pltpu.make_async_copy(hstage_vmem, hslab_ref, sem_hs)
        cph.start()
        cp.wait()
        cph.wait()

    def sbyte(p, soff):
        return slab_ref[0, jnp.maximum(p, 0) - soff]

    def shash(p, soff):
        """(check, hslot) of position p from the precomputed hash slab."""
        q = p - soff
        hw = hslab_ref[_srl(q, 7), q & 127]
        return hw & 255, _srl(hw, 8)

    def funnel3(p):
        """[3,128] window whose element (0,0) is block byte p (p >= 0)."""
        r0 = jnp.clip(_srl(p, 7), 0, block_rows - 4)
        sh = p & 127
        w = pltpu.roll(block_vmem[pl.ds(r0, 4), :], shift=-sh, axis=1)
        return jnp.where(IOTA3 < 128 - sh, w[0:L_ROWS, :], w[1:L_ROWS + 1, :])


    def onehot(ref, row, lane):
        r = ref[pl.ds(row, 1), :]
        return jnp.sum(jnp.where(IOTA == lane, r, 0))

    def rmw(ref, row, lane, val):
        r = ref[pl.ds(row, 1), :]
        ref[pl.ds(row, 1), :] = jnp.where(IOTA == lane, val, r)

    def u32le_cand(p):
        """Little-endian u32 at block position p (candidate side, VMEM)."""
        r0 = jnp.clip(_srl(p, 7), 0, block_rows - 2)
        sh = p & 127
        a = pltpu.roll(block_vmem[pl.ds(r0, 1), :], shift=-sh, axis=1)
        b = pltpu.roll(block_vmem[pl.ds(r0 + 1, 1), :], shift=-sh, axis=1)
        w = jnp.where(IOTA < 128 - sh, a, b)
        return jnp.sum(jnp.where(
            IOTA == 0, w,
            jnp.where(IOTA == 1, w << 8,
                      jnp.where(IOTA == 2, w << 16,
                                jnp.where(IOTA == 3, w << 24, 0)))))

    def u32le_slab(p, soff):
        return (sbyte(p, soff) | (sbyte(p + 1, soff) << 8)
                | (sbyte(p + 2, soff) << 16) | (sbyte(p + 3, soff) << 24))

    match_limit = ilen - MATCH_MAX_LEN - 16

    # ---- SMEM chain cache -------------------------------------------------
    # Direct-mapped over the bucket key (ctx, hslot).  A line remembers the
    # key's newest insert: its unbounded per-ctx insert count (the node id is
    # count & 4095, so the line also serves the hash head without touching
    # VMEM), the node's slot word, its chain link, and a level-1 snapshot of
    # the linked node's (slot, chain).  Staleness is exact, not heuristic:
    # ring cell X written when the ctx count was c is overwritten by the
    # insert at count c + ((X - (c & 4095)) & 4095 or 4096), so a snapshot is
    # served only while the current count is below that.  Every find_match
    # inserts, so the per-ctx count is head_ref's unbounded value.

    def cache_line(key):
        return (key ^ _srl(key, 8)) & (CACHE_LINES - 1)

    def lazy_walk(p, probe_at, want, lctx, depth, start):
        """The shared chain walk of MatchLazy from node index >= 1.

        start = (i0, node_start, prev_off, hit0, done0)."""

        def lbody(carry):
            i, node, prev_off, hit, done = carry
            # slot and chain-link fetches are independent: issued together
            # they overlap to ~one transfer latency (DESIGN.md section 0)
            s = onehot(slot_ref, lctx * 32 + _srl(node, 7), node & 127)
            nxt_raw = onehot(chain_ref, lctx * 32 + _srl(node, 7),
                             node & 127)
            off = s & 0xFFFFFF
            stale = prev_off <= off
            h = ~stale & (u32le_cand(off + probe_at) == want)
            hit = hit | h
            done = done | stale | h | (i + 1 >= depth)
            nxt = jnp.where(done, node, nxt_raw)
            done = done | (nxt == _NIL)
            return i + 1, jnp.where(done, node, nxt), off, hit, done

        _, _, _, lhit, _ = jax.lax.while_loop(lambda c: ~c[4], lbody, start)
        return lhit

    def lazy_probe(p, maxlen, depth, soff, pre=None):
        """MatchLazy (libzling_lz.cpp:291-316), dynamic depth, cache-served.

        Read-only probe: on a tag hit the hash head and the first node's
        (slot, chain) come from the SMEM cache, so the common depth-1
        probes (e0-e1) cost one VMEM extract (the want-compare) total.

        pre: optionally (hit, lvl0_ok, cached node0, line, cells_ready)
        computed BEFORE the main walk, with the head / slot+chain transfers
        already issued into pers_ref[13] / [14..15] so their latency hides
        under the walk (the probe is read-only and sees exactly the
        post-insert table, so hoisting is semantics-free -- probed in
        round 2).  cells_ready marks that the tag-miss node's cells were
        already fetched from the LCP region (vector-verdict path)."""
        lctx = sbyte(p - 1, soff)
        if pre is None:
            _, lslot = shash(p, soff)
            key = lctx * 8192 + lslot
            line = cache_line(key)
            hit = ctag_ref[0, line] == key
            if DBG_NO_CACHE:
                hit = jnp.bool_(False)
            e_cnt = ccnt_ref[0, line]

            @pl.when(~hit)
            def _():
                pers_ref[13] = onehot(hash_ref, lctx * 64 + _srl(lslot, 7),
                                      lslot & 127)

            node0_c = e_cnt & 4095
            lvl0_ok = hit & ((head_ref[0, lctx] - e_cnt) < 4096)
            cells_ready = jnp.bool_(False)
            prefetched = False
        else:
            hit, lvl0_ok, node0_c, line, cells_ready = pre
            prefetched = True

        node0 = jnp.where(hit, node0_c, pers_ref[13])
        probe_at = maxlen - 3
        want = u32le_slab(p + probe_at, soff)
        start_ok = node0 != _NIL

        # step 0 unrolled: SMEM-served on a live hit; otherwise the fetch
        # either already happened (prefetched miss path) or issues here
        need_fetch = start_ok & ~lvl0_ok & ~cells_ready
        if prefetched:
            need_fetch = need_fetch & ~hit

        @pl.when(need_fetch)
        def _():
            pers_ref[14] = onehot(slot_ref, lctx * 32 + _srl(node0, 7),
                                  node0 & 127)
            pers_ref[15] = onehot(chain_ref, lctx * 32 + _srl(node0, 7),
                                  node0 & 127)

        s0 = jnp.where(lvl0_ok, cs0_ref[0, line], pers_ref[14])
        nxt0 = jnp.where(lvl0_ok, cn1_ref[0, line] & 0xFFFF, pers_ref[15])
        off0 = s0 & 0xFFFFFF
        hit0 = start_ok & (u32le_cand(off0 + probe_at) == want)
        done0 = ~start_ok | hit0 | (depth <= 1) | (nxt0 == _NIL)
        return lazy_walk(p, probe_at, want, lctx, depth,
                         (jnp.int32(1), jnp.where(done0, node0, nxt0), off0,
                          hit0, done0))

    # (round-5 probed and REVERTED: cross-unit software pipelining of this
    # front end -- running the next unit's hash/cache lookup + head/cell
    # transfers from the previous unit's tail.  A pl.when-region form
    # measured 1054 ns/unit and a region-free value-carried form 1106
    # vs 1010 without: the region end forces its extracts on the spot, and
    # the unconditional-extract form's ~3 extra transfers + 5 loop carries
    # per unit cost more issue than the ~140-cycle miss wave they hide.
    # The kernel is issue-bound; see DESIGN.md round-5.)

    def find_match(ipos, soff, depth, lazy1, lazy2):
        """MatchAndUpdate (libzling_lz.cpp:211-289): insert then walk.

        Restructured around the SMEM chain cache:
          * on a live tag hit the hash head, slot[node0], chain[node0] and
            a level-1 snapshot come from SMEM -- the whole depth-2 walk
            (e0) runs without a single VMEM extract;
          * the probe-byte filter (libzling_lz.cpp:248) is dropped: len >
            maxlen implies the probe byte matched, so evaluating the
            funnel LCP directly on every check-hit selects the same
            (maxnode, maxlen) and removes one dependent ~140-cycle
            extract per hit;
          * the maxlen == kMatchMaxLen early break (libzling_lz.cpp:
            254-256) is dropped: replacement needs strictly-greater
            length, impossible at the cap, so selection is unchanged and
            the LCP extract no longer feeds walk control;
        Writes (found, mlen, midx) to pers_ref[0..2]."""
        ctx = sbyte(ipos - 1, soff)
        check, hslot = shash(ipos, soff)
        hrow = ctx * 64 + _srl(hslot, 7)
        key = ctx * 8192 + hslot
        line = cache_line(key)
        hit = ctag_ref[0, line] == key
        if DBG_NO_CACHE:
            hit = jnp.bool_(False)
        e_cnt = ccnt_ref[0, line]
        e_s0 = cs0_ref[0, line]
        e_w1 = cn1_ref[0, line]
        e_s1 = cs1_ref[0, line]
        e_n2 = cn2_ref[0, line]
        e_n1 = e_w1 & 0xFFFF

        @pl.when(~hit)
        def _():
            pers_ref[8] = onehot(hash_ref, hrow, hslot & 127)

        node0 = jnp.where(hit, e_cnt & 4095, pers_ref[8])

        cnt_now = head_ref[0, ctx] + 1
        head_ref[0, ctx] = cnt_now
        head = cnt_now & 4095
        age = cnt_now - e_cnt
        lvl0_ok = hit & (age < 4096)
        lvl1_ok = lvl0_ok & (e_w1 >= (1 << 20)) & \
            (age < ((e_n1 - (e_cnt & 4095)) & 4095))

        # insert (reference order: head++, chain, slot, hash); the VMEM
        # cells stay authoritative -- they back every cache miss
        myslot = ipos | (check << 24)
        rmw(chain_ref, ctx * 32 + _srl(head, 7), head & 127, node0)
        rmw(slot_ref, ctx * 32 + _srl(head, 7), head & 127, myslot)
        rmw(hash_ref, hrow, hslot & 127, head)

        # refresh the line: level-0 is our own insert; level-1 is the old
        # level-0 exactly when that snapshot still equals cells[node0]
        ctag_ref[0, line] = key
        ccnt_ref[0, line] = cnt_now
        cs0_ref[0, line] = myslot
        cn1_ref[0, line] = node0 | jnp.where(lvl0_ok, 1 << 20, 0)
        cs1_ref[0, line] = jnp.where(lvl0_ok, e_s0, 0)
        cn2_ref[0, line] = jnp.where(lvl0_ok, e_n1, 0)

        searchable = (node0 != _NIL) & (node0 != head)

        # ---- lazy-probe-1 prefetch targets (the probe is read-only and
        # sees exactly the post-insert table, so its VMEM transfers can be
        # issued early -- lazy1 fires on ~80% of e0 units)
        lazy_on = lazy1 > 0
        if DBG_NO_PREFETCH:
            lazy_on = jnp.bool_(False)
        lctx1 = sbyte(ipos, soff)
        _, lslot1 = shash(ipos + 1, soff)
        lkey1 = lctx1 * 8192 + lslot1
        lline1 = cache_line(lkey1)
        lhit1 = ctag_ref[0, lline1] == lkey1
        if DBG_NO_CACHE:
            lhit1 = jnp.bool_(False)
        le_cnt1 = ccnt_ref[0, lline1]
        llvl0_1 = lhit1 & ((head_ref[0, lctx1] - le_cnt1) < 4096)
        lnode0_1 = le_cnt1 & 4095
        # the lazy line's snapshot words, for the vector-domain verdict
        le_s0_1 = cs0_ref[0, lline1]
        le_n1_1 = cn1_ref[0, lline1] & 0xFFFF

        # ---- ONE shared fetch region.  Separate pl.when regions SERIALIZE
        # independent extracts while extracts issued together overlap to
        # ~one ~140-cycle latency (DESIGN.md section 0) -- so every CELL
        # transfer whose address is known before any fetch resolves is
        # issued from this single region: walk step-0 cells (cache miss),
        # the lazy head / lazy node-0 cells, and walk step-1 cells when the
        # level-1 node is SMEM-known.  Results land in pers_ref slots via
        # dynamic-index writes (slot 4 is the discard slot).  The funnel
        # LCP extracts stay in their own later region: folding them in here
        # taxed every fetch-bearing unit with 3 window builds (measured
        # 1043 -> 1070 ns/unit, reverted).
        fetch0 = searchable & ~lvl0_ok
        done1_c = ~searchable | (depth < 2) | (e_n1 == _NIL)
        fetch1_c = lvl0_ok & ~lvl1_ok & ~done1_c
        need_lhead = lazy_on & ~lhit1
        need_lcell = lazy_on & lhit1 & ~llvl0_1
        # (a lazy-probe mismatch MASK precomputed here -- bit i = cand byte
        # i != src byte i, serving the probe's 4-byte test without any
        # extract -- was tried and REGRESSED 1037 -> 1054 ns/unit: the two
        # window builds + weighted reduction tax every region entry, while
        # the extract they replace was latency that mostly overlapped)

        @pl.when(fetch0 | need_lhead | need_lcell | fetch1_c)
        def _():
            n0 = jnp.where(fetch0, node0, 0)
            pers_ref[jnp.where(fetch0, 9, 4)] = onehot(
                slot_ref, ctx * 32 + _srl(n0, 7), n0 & 127)
            pers_ref[jnp.where(fetch0, 10, 4)] = onehot(
                chain_ref, ctx * 32 + _srl(n0, 7), n0 & 127)
            pers_ref[jnp.where(need_lhead, 13, 4)] = onehot(
                hash_ref, lctx1 * 64 + _srl(lslot1, 7), lslot1 & 127)
            ln = jnp.where(need_lcell, lnode0_1, 0)
            pers_ref[jnp.where(need_lcell, 14, 4)] = onehot(
                slot_ref, lctx1 * 32 + _srl(ln, 7), ln & 127)
            pers_ref[jnp.where(need_lcell, 15, 4)] = onehot(
                chain_ref, lctx1 * 32 + _srl(ln, 7), ln & 127)
            n1 = jnp.where(fetch1_c, e_n1, 0)
            pers_ref[jnp.where(fetch1_c, 11, 4)] = onehot(
                slot_ref, ctx * 32 + _srl(n1, 7), n1 & 127)
            pers_ref[jnp.where(fetch1_c, 12, 4)] = onehot(
                chain_ref, ctx * 32 + _srl(n1, 7), n1 & 127)

        s0 = jnp.where(lvl0_ok, e_s0, pers_ref[9])
        nxt0 = jnp.where(lvl0_ok, e_n1, pers_ref[10])

        @pl.when(fetch0)
        def _():
            # repair the line's level-1 from the fetched cells so the next
            # same-key lookup walks depth 2 from SMEM (writes only: cheap)
            cn1_ref[0, line] = node0 | (1 << 20)
            cs1_ref[0, line] = pers_ref[9]
            cn2_ref[0, line] = pers_ref[10]

        off0 = s0 & 0xFFFFFF
        check0 = searchable & ((_srl(s0, 24) & 255) == check)
        done1 = ~searchable | (depth < 2) | (nxt0 == _NIL)
        node1 = jnp.where(done1, node0, nxt0)

        fetch1 = ~done1 & ~lvl1_ok & ~fetch1_c

        @pl.when(fetch1)
        def _():
            pers_ref[11] = onehot(slot_ref, ctx * 32 + _srl(node1, 7),
                                  node1 & 127)
            pers_ref[12] = onehot(chain_ref, ctx * 32 + _srl(node1, 7),
                                  node1 & 127)

        s1 = jnp.where(lvl1_ok, e_s1, pers_ref[11])
        nxt1 = jnp.where(lvl1_ok, e_n2, pers_ref[12])
        off1 = s1 & 0xFFFFFF
        done1b = done1 | (off0 <= off1)
        check1 = ~done1b & ((_srl(s1, 24) & 255) == check)
        # deep-walk entry condition, known BEFORE the LCP region: the lazy
        # verdict below is only valid when no deeper node can change best_len
        done2 = done1b | (depth < 3) | (nxt1 == _NIL)

        # direct funnel LCP on check-hits.  ONE region for both steps: the
        # two min extracts are independent, and issuing them from the same
        # region lets their ~140-cycle transfer latencies overlap; when
        # only one step check-hits, the spare window build is wasted vector
        # issue -- measured cheaper than serializing (tools/sweep_tokenize)
        @pl.when(check0 | check1)
        def _():
            fip = funnel3(ipos)
            neq0 = fip != funnel3(jnp.where(check0, off0, 0))
            neq1 = fip != funnel3(jnp.where(check1, off1, 0))
            m0 = jnp.min(jnp.where(neq0, POS3, 999))
            m1 = jnp.min(jnp.where(neq1, POS3, 999))
            pers_ref[5] = m0
            pers_ref[6] = m1
            if not DBG_NO_MASK:
                # ---- speculative lazy step-0 verdict, vector domain ----
                # MatchLazy's node-0 test is `cand[off+pa .. +4) == src[p+1+
                # pa ..)` with pa = best_len - 3 (libzling_lz.cpp:291-316).
                # All its inputs exist HERE: best_len replicated as a
                # broadcast reduction of the same neq masks, the candidate
                # offset from the lazy cache line / wave-A cells, and the
                # byte windows as two more funnel builds.  The verdict
                # reduces to ONE extra scalar extract issued WITH the two
                # LCP extracts (independent extracts overlap, DESIGN.md
                # section 0) -- removing the whole dependent want-compare
                # wave from the common e0/e1 lazy path.
                lcp0v = jnp.where(check0, jnp.minimum(m0, MATCH_MAX_LEN), 0)
                lcp0v = jnp.where(lcp0v >= MATCH_MIN_LEN, lcp0v, 0)
                lcp1v = jnp.where(check1, jnp.minimum(m1, MATCH_MAX_LEN), 0)
                lcp1v = jnp.where(lcp1v >= MATCH_MIN_LEN, lcp1v, 0)
                bestv = jnp.maximum(jnp.int32(MATCH_MIN_LEN - 1), lcp0v)
                bestv = jnp.maximum(bestv, lcp1v)
                pav = bestv - 3
                loff = jnp.where(llvl0_1, le_s0_1, pers_ref[14]) & 0xFFFFFF
                neql = funnel3(ipos + 1) != funnel3(
                    jnp.where(lhit1, loff, 0))
                badv = (POS3 >= pav) & (POS3 < pav + 4) & neql
                pers_ref[16] = jnp.sum(badv.astype(jnp.int32))
                # lazy tag-miss: the node id arrived in wave A (pers 13);
                # fetch its cells NOW so the scalar fallback pays one
                # transfer wave instead of two (discard-slot pattern)
                ln_ok = lazy_on & ~lhit1 & (pers_ref[13] != _NIL)
                ln = jnp.where(ln_ok, pers_ref[13], 0)
                pers_ref[jnp.where(ln_ok, 14, 4)] = onehot(
                    slot_ref, lctx1 * 32 + _srl(ln, 7), ln & 127)
                pers_ref[jnp.where(ln_ok, 15, 4)] = onehot(
                    chain_ref, lctx1 * 32 + _srl(ln, 7), ln & 127)

        # hit-rate counters (stat row 7; reference debug-counter analog,
        # src/libzling_debug.h): attempts / cache levels / check hits
        stat_ref[0, 7, 0] += 1
        stat_ref[0, 7, 1] += lvl0_ok.astype(jnp.int32)
        stat_ref[0, 7, 2] += lvl1_ok.astype(jnp.int32)
        stat_ref[0, 7, 3] += check0.astype(jnp.int32)
        stat_ref[0, 7, 4] += check1.astype(jnp.int32)

        lcp0 = jnp.where(check0, jnp.minimum(pers_ref[5], MATCH_MAX_LEN), 0)
        lcp0 = jnp.where(lcp0 >= MATCH_MIN_LEN, lcp0, 0)
        lcp1 = jnp.where(check1, jnp.minimum(pers_ref[6], MATCH_MAX_LEN), 0)
        lcp1 = jnp.where(lcp1 >= MATCH_MIN_LEN, lcp1, 0)

        best_len = jnp.int32(MATCH_MIN_LEN - 1)
        best_node = jnp.int32(0)
        b0 = lcp0 > best_len
        best_len = jnp.where(b0, lcp0, best_len)
        best_node = jnp.where(b0, node0, best_node)
        b1 = lcp1 > best_len
        best_len = jnp.where(b1, lcp1, best_len)
        best_node = jnp.where(b1, node1, best_node)

        stat_ref[0, 7, 5] += (~done2).astype(jnp.int32)

        def wbody(carry):
            i, node, prev_off, best_len, best_node, done = carry
            # independent transfers overlap: fetch the slot AND the chain
            # link together instead of gating the link behind the verdict
            s = onehot(slot_ref, ctx * 32 + _srl(node, 7), node & 127)
            nxt_raw = onehot(chain_ref, ctx * 32 + _srl(node, 7),
                             node & 127)
            off = s & 0xFFFFFF
            done = done | (prev_off <= off)
            probe_ok = ~done & ((_srl(s, 24) & 255) == check)

            @pl.when(probe_ok)
            def _():
                neq = funnel3(ipos) != funnel3(off)
                pers_ref[6] = jnp.min(jnp.where(neq, POS3, 999))

            lcp = jnp.where(probe_ok,
                            jnp.minimum(pers_ref[6], MATCH_MAX_LEN), 0)
            lcp = jnp.where(lcp >= MATCH_MIN_LEN, lcp, 0)
            better = (lcp > best_len) & ~done
            best_node = jnp.where(better, node, best_node)
            best_len = jnp.where(better, lcp, best_len)
            done = done | (i + 1 >= depth)
            nxt = jnp.where(done, node, nxt_raw)
            done = done | (nxt == _NIL)
            return (i + 1, jnp.where(done, node, nxt), off, best_len,
                    best_node, done)

        _, _, _, best_len, best_node, _ = jax.lax.while_loop(
            lambda c: ~c[5], wbody,
            (jnp.int32(2), jnp.where(done2, node1, nxt1), off1, best_len,
             best_node, done2))

        found = searchable & (best_len >= MATCH_MIN_LEN)

        pers_ref[7] = 0
        lazy_gate = found & (best_len < MATCH_MIN_LEN_ENABLE_LAZY)
        if DBG_NO_LAZY:
            lazy_gate = jnp.bool_(False)

        # short-circuit exactly as the reference does (libzling_lz.cpp:
        # 271,276: `kLazyMatch1Depth > 0 && MatchLazy(...)`): probe 2 is
        # SKIPPED, not just ignored, when lazy2 == 0 or probe 1 hit --
        # a jnp.where here would execute both probes' extract chains on
        # every lazy-gated unit (probe_tokenize_cost.py)
        stat_ref[0, 7, 6] += (lazy_gate & (lazy1 > 0)).astype(jnp.int32)

        if DBG_NO_MASK or DBG_NO_PREFETCH:
            mask_ok = jnp.bool_(False)
            mask_hit = jnp.bool_(False)
            mask_done = jnp.bool_(False)
        else:
            # the in-region verdict is valid when the lazy node-0 offset was
            # known at region time (lazy tag hit) and the deep walk did not
            # run (done2 at entry => best_len unchanged since the region)
            mask_ok = lazy_on & lhit1 & done2
            mask_hit = pers_ref[16] == 0
            lnxt0 = jnp.where(llvl0_1, le_n1_1, pers_ref[15])
            # step-0 verdict settles the probe when it hit, when the probe
            # is depth-1 (e0/e1), or when the chain ends at node 0
            mask_done = mask_hit | (lazy1 <= 1) | (lnxt0 == _NIL)
        use_mask = lazy_gate & (lazy1 > 0) & mask_ok
        stat_ref[0, 7, 8] += use_mask.astype(jnp.int32)

        @pl.when(use_mask)
        def _():
            pers_ref[7] = mask_hit.astype(jnp.int32)

        @pl.when(use_mask & ~mask_done)
        def _():
            # mask said node-0 miss and the probe walks deeper (lazy1 > 1):
            # continue the chain from node 1 exactly as lazy_probe would
            loffs = jnp.where(llvl0_1, le_s0_1, pers_ref[14]) & 0xFFFFFF
            probe_at = best_len - 3
            want = u32le_slab(ipos + 1 + probe_at, soff)
            pers_ref[7] = lazy_walk(
                ipos + 1, probe_at, want, lctx1, lazy1,
                (jnp.int32(1), lnxt0, loffs, jnp.bool_(False),
                 jnp.bool_(False))).astype(jnp.int32)

        @pl.when(lazy_gate & (lazy1 > 0) & ~mask_ok)
        def _():
            pers_ref[7] = lazy_probe(
                ipos + 1, best_len, lazy1, soff,
                pre=None if DBG_NO_PREFETCH
                else (lhit1, llvl0_1, lnode0_1, lline1,
                      jnp.bool_(False) if DBG_NO_MASK
                      else (check0 | check1))).astype(jnp.int32)

        @pl.when(lazy_gate & (lazy2 > 0) & (pers_ref[7] == 0))
        def _():
            pers_ref[7] = lazy_probe(ipos + 2, best_len, lazy2,
                                     soff).astype(jnp.int32)

        found = found & (pers_ref[7] == 0)
        stat_ref[0, 7, 7] += found.astype(jnp.int32)
        pers_ref[0] = found.astype(jnp.int32)
        pers_ref[1] = best_len
        pers_ref[2] = (head - best_node) & 4095

    def flush_units(cidx, base_units):
        """DMA staged units to HBM at the chunk's stride slot."""
        dst = pl.multiple_of(cidx * chunk_stride + base_units, 128)
        cpa = pltpu.make_async_copy(stg_a.at[0, pl.ds(0, STAGE_UNITS)],
                                    outa_hbm.at[0, pl.ds(dst, STAGE_UNITS)],
                                    sem_oa)
        cpa.start()
        cpb = pltpu.make_async_copy(stg_b.at[0, pl.ds(0, STAGE_UNITS)],
                                    outb_hbm.at[0, pl.ds(dst, STAGE_UNITS)],
                                    sem_ob)
        cpb.start()
        cpa.wait()
        cpb.wait()

    def chunk_body(carry):
        ipos, cidx, err = carry
        depth = meta_ref[0, 3, cidx]
        lazy1 = meta_ref[0, 4, cidx]
        lazy2 = meta_ref[0, 5, cidx]

        def zmru(i, _):
            mru_ref[0, i] = 0
            return 0

        jax.lax.fori_loop(0, 516, zmru, 0)

        def unit_body(carry):
            ipos, soff, nu, nt, staged, err = carry

            # slab: keep [ipos-2, ipos+LOOKAHEAD) resident -- the word-MRU
            # update reads back to new_ipos-3 == ipos-2 on literal units, so
            # basing the slab at ipos-1 would index slab_ref[0,-1] whenever
            # a refill lands exactly on a 128-byte boundary
            need = ipos + LOOKAHEAD >= soff + SLAB_WORDS
            nsoff = jnp.maximum(((ipos - 2) >> 7) << 7, 0)

            @pl.when(need)
            def _():
                load_slab(nsoff)

            soff = jnp.where(need, nsoff, soff)

            do_flush = staged >= STAGE_UNITS

            @pl.when(do_flush)
            def _():
                flush_units(cidx, nu - staged)

            staged = jnp.where(do_flush, staged - STAGE_UNITS, staged)

            is_head = ipos <= 1
            attempt = ~is_head & (ipos < match_limit)

            @pl.when(attempt)
            def _():
                find_match(ipos, soff, depth, lazy1, lazy2)

            found = attempt & (pers_ref[0] != 0)
            mlen = pers_ref[1]
            midx = pers_ref[2]

            # exact reference semantics: the zero-initialized word-MRU DOES
            # match word 0x0000 (src/libzling_lz.cpp:147,172-185)
            ctx = sbyte(ipos - 1, soff)
            ww = sbyte(ipos, soff) * 256 + sbyte(ipos + 1, soff)
            can_word = ~is_head & ~found & (ipos + 1 < ilen)
            hit0 = can_word & (mru_ref[0, ctx * 2] == ww)
            hit1 = can_word & ~hit0 & (mru_ref[0, ctx * 2 + 1] == ww)
            is_lit = ~is_head & ~found & ~hit0 & ~hit1
            is_word = hit0 | hit1

            sym = jnp.where(
                found, 258 + mlen - MATCH_MIN_LEN,
                jnp.where(hit0, 256,
                          jnp.where(hit1, 257, sbyte(ipos, soff))))
            kind = jnp.where(is_head, 0,
                             jnp.where(is_lit, 1, jnp.where(is_word, 2, 3)))
            # bits 14+: match idx for matches, the literal's order-1 ctx for
            # literals (free bits there -- idx is 0) so the MTF relabel
            # kernel needs no side lookup into the block
            stg_a[0, staged] = sym | (kind << 10) \
                | (jnp.where(found, midx, jnp.where(is_lit, ctx, 0)) << 14)
            stg_b[0, staged] = ipos
            staged = staged + 1
            nu = nu + 1
            nt = nt + jnp.where(found, 2, 1)

            new_ipos = ipos + jnp.where(
                found, mlen, jnp.where(is_word, 2, 1))

            # word-MRU update (libzling_lz.cpp:163-166,178-191): match pushes
            # iff differing; word0 none; word1/literal push unconditionally
            cu = sbyte(new_ipos - 3, soff)
            wu = sbyte(new_ipos - 2, soff) * 256 + sbyte(new_ipos - 1, soff)
            old0 = mru_ref[0, cu * 2]
            push = jnp.where(found, old0 != wu, is_lit | hit1) & ~is_head
            pb = jnp.where(push, cu * 2, 514)
            mru_ref[0, pb + 1] = old0
            mru_ref[0, pb] = wu

            err = err | (new_ipos > ilen + MATCH_MAX_LEN)
            return new_ipos, soff, nu, nt, staged, err

        def unit_cond(carry):
            ipos, _soff, nu, nt, _staged, err = carry
            budget = jnp.where(ipos <= 1, nt < max_tokens, nt + 1 < max_tokens)
            return (ipos < ilen) & budget & (nu < chunk_units) & ~err

        soff0 = jnp.maximum(((ipos - 2) >> 7) << 7, 0)
        load_slab(soff0)
        ipos, _soff, nu, nt, staged, err = jax.lax.while_loop(
            unit_cond, unit_body,
            (ipos, soff0, jnp.int32(0), jnp.int32(0), jnp.int32(0), err))

        @pl.when(staged > 0)
        def _():
            flush_units(cidx, nu - staged)

        stat_ref[0, 0, cidx] = nu
        stat_ref[0, 1, cidx] = nt
        stat_ref[0, 2, cidx] = ipos
        return ipos, cidx + 1, err

    ipos, n_chunks, err = jax.lax.while_loop(
        lambda c: (c[0] < ilen) & (c[1] < max_chunks) & ~c[2],
        chunk_body, (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
    stat_ref[0, 6, 0] = n_chunks
    stat_ref[0, 6, 1] = err.astype(jnp.int32)
    stat_ref[0, 6, 2] = ipos


@functools.partial(jax.jit, static_argnames=("interpret", "chunk_stride",
                                             "max_chunks", "block_rows",
                                             "debug_flags"))
def _tokenize_call(meta, block_flat, interpret: bool = False,
                   chunk_stride: int = 0, max_chunks: int = 0,
                   block_rows: int = 0, debug_flags: int = 0):
    # the host lane ships bytes as u8 (4x less tunnel traffic); widen here
    block_flat = block_flat.astype(jnp.int32)
    block2d = block_flat.reshape(block_rows, 128)
    kernel = pl.pallas_call(
        functools.partial(_tokenize_kernel, chunk_stride=chunk_stride,
                          max_chunks=max_chunks, block_rows=block_rows,
                          debug_flags=debug_flags),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 8, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, max_chunks * chunk_stride), jnp.int32),
            jax.ShapeDtypeStruct((1, max_chunks * chunk_stride), jnp.int32),
            jax.ShapeDtypeStruct((1, 8, 256), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, SLAB_WORDS), jnp.int32),
            pltpu.SMEM((1, STAGE_UNITS + 8), jnp.int32),
            pltpu.SMEM((1, STAGE_UNITS + 8), jnp.int32),
            pltpu.SMEM((1, 258), jnp.int32),
            pltpu.SMEM((1, 516 + 2), jnp.int32),
            pltpu.SMEM((24,), jnp.int32),
            pltpu.SMEM((1, CACHE_LINES), jnp.int32),
            pltpu.SMEM((1, CACHE_LINES), jnp.int32),
            pltpu.SMEM((1, CACHE_LINES), jnp.int32),
            pltpu.SMEM((1, CACHE_LINES), jnp.int32),
            pltpu.SMEM((1, CACHE_LINES), jnp.int32),
            pltpu.SMEM((1, CACHE_LINES), jnp.int32),
            pltpu.SMEM((SLAB_WORDS // 128, 128), jnp.int32),
            pltpu.VMEM((block_rows, 128), jnp.int32),
            pltpu.VMEM((HASH_ROWS, 128), jnp.int32),
            pltpu.VMEM((RING_ROWS, 128), jnp.int32),
            pltpu.VMEM((RING_ROWS, 128), jnp.int32),
            pltpu.VMEM((SLAB_WORDS // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )
    return kernel(meta, block_flat, block2d)


def tokenize_block_traced(block_u8, ilen, levels, *, max_tokens: int,
                          max_chunks: int, chunk_units: int,
                          interpret: bool = False,
                          return_packed: bool = False):
    """Traced variant for use under jit/shard_map (mesh integration).

    block_u8: [B] u8 traced array (zero-padded); ilen traced i32; levels
    [max_chunks] traced i32 level ids.  Returns (sym, idx, upos, kind
    [max_chunks, chunk_units], nunits, ntoks, encpos [max_chunks],
    n_chunks, err) as traced arrays; with return_packed also the raw packed
    unit words [1, max_chunks * chunk_stride] (the MTF relabel kernel's
    input format).
    """
    assert max_chunks <= 256
    chunk_stride = ((chunk_units + STAGE_UNITS - 1) // STAGE_UNITS + 1) \
        * STAGE_UNITS
    B = block_u8.shape[0]
    block_rows = max(32, -(-(B + SLAB_WORDS + 512) // 4096) * 32)
    flat = jnp.zeros(block_rows * 128, jnp.int32)
    flat = flat.at[:B].set(block_u8.astype(jnp.int32))
    ltab = jnp.asarray(_LEVEL_TABLE)
    lv = ltab[jnp.clip(levels, 0, len(LEVEL_PARAMS) - 1)]  # [max_chunks, 3]
    meta = jnp.zeros((1, 8, 256), jnp.int32)
    meta = meta.at[0, 0, 0].set(ilen)
    meta = meta.at[0, 0, 1].set(max_tokens)
    meta = meta.at[0, 0, 2].set(chunk_units)
    meta = meta.at[0, 3, :max_chunks].set(lv[:, 0])
    meta = meta.at[0, 4, :max_chunks].set(lv[:, 1])
    meta = meta.at[0, 5, :max_chunks].set(lv[:, 2])
    outa, outb, stat = _tokenize_call(
        meta, flat[None], interpret=interpret, chunk_stride=chunk_stride,
        max_chunks=max_chunks, block_rows=block_rows)
    a = outa.reshape(max_chunks, chunk_stride)[:, :chunk_units]
    upos = outb.reshape(max_chunks, chunk_stride)[:, :chunk_units]
    sym = a & 1023
    kind = (a >> 10) & 3
    idx = jnp.where(kind == 3, (a >> 14) & 4095, 0)
    out = (sym, idx, upos, kind, stat[0, 0, :max_chunks],
           stat[0, 1, :max_chunks], stat[0, 2, :max_chunks],
           stat[0, 6, 0], stat[0, 6, 1])
    return out + (outa,) if return_packed else out


def tokenize_block(block: bytes | np.ndarray, levels, max_tokens: int,
                   max_chunks: int, chunk_units: int,
                   interpret: bool = False):
    """Tokenize one block on device (raw-literal units, rolz.py convention).

    block: the block's bytes; levels: [>=max_chunks] per-chunk level
    schedule (values 0..6).  max_chunks <= 256.  Returns (sym, idx, upos,
    kind [max_chunks, chunk_units] i32, nunits, ntoks, encpos [max_chunks],
    n_chunks, err).
    """
    assert max_chunks <= 256
    buf = np.frombuffer(bytes(block), np.uint8) if isinstance(block, (bytes, bytearray)) \
        else np.asarray(block, np.uint8)
    ilen = len(buf)
    chunk_stride = ((chunk_units + STAGE_UNITS - 1) // STAGE_UNITS + 1) \
        * STAGE_UNITS
    block_rows = max(32, -(-(ilen + SLAB_WORDS + 512) // 4096) * 32)
    meta = np.zeros((1, 8, 256), np.int32)
    meta[0, 0, 0] = ilen
    meta[0, 0, 1] = max_tokens
    meta[0, 0, 2] = chunk_units
    lv = _LEVEL_TABLE[np.asarray(levels, np.int32)[:max_chunks]]
    meta[0, 3, :max_chunks] = lv[:, 0]
    meta[0, 4, :max_chunks] = lv[:, 1]
    meta[0, 5, :max_chunks] = lv[:, 2]
    flat = np.zeros(block_rows * 128, np.uint8)
    flat[:ilen] = buf
    outa, outb, stat = _tokenize_call(
        jnp.asarray(meta), jnp.asarray(flat[None]),
        interpret=interpret, chunk_stride=chunk_stride,
        max_chunks=max_chunks, block_rows=block_rows)
    stat = np.asarray(stat)
    nc = max(int(stat[0, 6, 0]), 1)
    # fetch only the chunks actually produced (the full buffers are sized
    # for max_chunks; pulling them through the tunnel dominates e2e time)
    a = np.asarray(outa[0, : nc * chunk_stride]) \
        .reshape(nc, chunk_stride)[:, :chunk_units]
    b = np.asarray(outb[0, : nc * chunk_stride]) \
        .reshape(nc, chunk_stride)[:, :chunk_units]
    pad = ((0, max_chunks - nc), (0, 0))
    a = np.pad(a, pad)
    b = np.pad(b, pad)
    sym = a & 1023
    kind = (a >> 10) & 3
    idx = np.where(kind == 3, (a >> 14) & 4095, 0)
    return (sym, idx, b, kind, stat[0, 0, :max_chunks],
            stat[0, 1, :max_chunks], stat[0, 2, :max_chunks],
            int(stat[0, 6, 0]), int(stat[0, 6, 1]))
