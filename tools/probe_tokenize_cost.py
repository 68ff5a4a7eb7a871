"""Decompose the tokenizer kernel's per-unit cost on the v5e.

DESIGN.md section 2b: the Pallas ROLZ tokenizer measures ~1736 cyc/unit at
depth 1 while each extra walk step costs only ~330 cyc, leaving ~1400 cyc of
per-unit BASE unexplained.  This probe rebuilds the unit body as a stack of
toggleable layers and times each configuration, so the deltas attribute the
base cost to a concrete construct:

  lit            literal path only: slab byte reads, word-MRU check+update,
                 staging stores, carry arithmetic (all SMEM)
  +insert        hash4 + hash-head one-hot extract + 3 one-hot RMW inserts
  +walk(d1)      one-iteration while_loop walk (slot+chain extracts, scalar
                 verdict logic), probe pl.when regions REMOVED
  +whens(never)  the two pl.when vector regions (probe-byte extract, funnel
                 LCP) present but gates data-false -- lowering overhead only
  +whens(taken)  gates data-true every iteration -- full probe-path cost
  when-wrap      the insert+walk stack additionally wrapped in an always-true
                 pl.when (as `pl.when(attempt)` wraps find_match)
  serial3        three DEPENDENT one-hot extracts back to back (pure latency
                 chain: head -> slot -> probe byte)

Usage: python tools/probe_tokenize_cost.py [N_iters]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
GHZ = 0.94

HASH_ROWS = 256 * 64
RING_ROWS = 256 * 32
_NIL = 65535


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def build_kernel(*, insert, walk, whens, when_wrap, lazy="off"):
    """whens: 'off' | 'never' | 'taken' (only meaningful when walk).
    lazy: 'off' | 'never' | 'taken' | 'prefetch' -- the MatchLazy block
    (head extract -> d1 walk -> want compare) behind pl.when; 'prefetch'
    hoists the head + slot/chain extracts BEFORE the main walk so their
    latency overlaps the walk's own serial fetch chain."""

    def kernel(n_ref, o_ref, slab, stg, mru, head_ref, pers_ref,
               block_vmem, hash_ref, chain_ref, slot_ref):
        IOTA = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        # scratch is uninitialized: seed every structure the loop indexes by
        # a data-dependent value (one-time cost, amortized over N units)
        def init_smem(i, _):
            slab[0, i & 2047] = (i * 7 + 13) & 255
            mru[0, i % 518] = 0
            head_ref[0, i % 258] = 0
            return 0

        jax.lax.fori_loop(0, 2048, init_smem, 0)
        for k in range(8):
            pers_ref[k] = 0

        v32 = jnp.zeros((32, 128), jnp.int32)

        def init_vmem(i, _):
            hash_ref[pl.ds((i % (HASH_ROWS // 32)) * 32, 32), :] = v32 + _NIL
            chain_ref[pl.ds((i % (RING_ROWS // 32)) * 32, 32), :] = v32 + _NIL
            slot_ref[pl.ds((i % (RING_ROWS // 32)) * 32, 32), :] = v32
            return 0

        jax.lax.fori_loop(0, HASH_ROWS // 32, init_vmem, 0)
        block_vmem[pl.ds(0, 32), :] = v32 + 7
        block_vmem[pl.ds(32, 32), :] = v32 + 7
        block_vmem[pl.ds(64, 32), :] = v32 + 7
        block_vmem[pl.ds(96, 32), :] = v32 + 7
        L_ROWS = 3
        IOTA3 = jax.lax.broadcasted_iota(jnp.int32, (L_ROWS, 128), 1)
        ROW3 = jax.lax.broadcasted_iota(jnp.int32, (L_ROWS, 128), 0)
        POS3 = ROW3 * 128 + IOTA3

        def sbyte(p):
            return slab[0, p & 2047]

        def onehot(ref, row, lane):
            r = ref[pl.ds(row, 1), :]
            return jnp.sum(jnp.where(IOTA == lane, r, 0))

        def rmw(ref, row, lane, val):
            r = ref[pl.ds(row, 1), :]
            ref[pl.ds(row, 1), :] = jnp.where(IOTA == lane, val, r)

        def u32le_slab(p):
            return (sbyte(p) | (sbyte(p + 1) << 8)
                    | (sbyte(p + 2) << 16) | (sbyte(p + 3) << 24))

        def hash4(p):
            h = u32le_slab(p) + sbyte(p + 2) * 137 + sbyte(p + 3) * 13337
            return _srl(h, 13) & 255, h & 8191

        def funnel3(p):
            r0 = jnp.clip(_srl(p, 7), 0, 2048 // 128 - 4)
            sh = p & 127
            w = pltpu.roll(block_vmem[pl.ds(r0, 4), :], shift=-sh, axis=1)
            return jnp.where(IOTA3 < 128 - sh, w[0:L_ROWS, :],
                             w[1:L_ROWS + 1, :])

        def find_match(ipos):
            ctx = sbyte(ipos - 1)
            check, hslot = hash4(ipos)
            acc = jnp.int32(0)
            if insert:
                hrow = ctx * 64 + _srl(hslot, 7)
                node0 = onehot(hash_ref, hrow, hslot & 127) & 4095
                head = (head_ref[0, ctx] + 1) & 4095
                head_ref[0, ctx] = head
                rmw(chain_ref, ctx * 32 + _srl(head, 7), head & 127, node0)
                rmw(slot_ref, ctx * 32 + _srl(head, 7), head & 127,
                    ipos | (check << 24))
                rmw(hash_ref, hrow, hslot & 127, head)
            else:
                node0 = jnp.int32(ipos & 4095)
                head = node0
            acc = acc + node0

            if walk:
                searchable = (node0 != _NIL) & (node0 != head)
                # in the synthetic state node0 != head always (state is 0s,
                # head counts up), matching the real kernel's common path
                searchable = searchable | (slab[0, 2046] < 999)

                if lazy == "prefetch":
                    # hoist the lazy head + slot/chain fetches above the
                    # walk: independent of its serial chain, so their
                    # ~171-cyc latencies should hide under the walk
                    lctx = sbyte(ipos)
                    _, lslot = hash4(ipos + 1)
                    lnode0 = onehot(hash_ref, lctx * 64 + _srl(lslot, 7),
                                    lslot & 127) & 4095
                    ls = onehot(slot_ref, lctx * 32 + _srl(lnode0, 7),
                                lnode0 & 127)
                    lnxt = onehot(chain_ref, lctx * 32 + _srl(lnode0, 7),
                                  lnode0 & 127)

                def wbody(carry):
                    i, node, prev_off, best_len, best_node, done = carry
                    s = onehot(slot_ref, ctx * 32 + _srl(node, 7),
                               node & 127)
                    nxt_raw = onehot(chain_ref, ctx * 32 + _srl(node, 7),
                                     node & 127)
                    off = s & 0xFFFFFF
                    ncheck = _srl(s, 24) & 255
                    done = done | ((i > 0) & (prev_off <= off))
                    if whens == "off":
                        probe_gate = jnp.bool_(False)
                    elif whens == "never":
                        # data-false: slab values are bytes < 256
                        probe_gate = ~done & (slab[0, (off + i) & 2047] > 500)
                    else:  # taken
                        probe_gate = ~done & (slab[0, (off + i) & 2047] >= 0)

                    @pl.when(probe_gate)
                    def _():
                        pb = (off + best_len) & 1023
                        pers_ref[5] = onehot(block_vmem, _srl(pb, 7),
                                             pb & 127)

                    probe_ok = probe_gate & \
                        (pers_ref[5] == sbyte(ipos + best_len))
                    if whens == "taken":
                        probe_ok = probe_gate

                    @pl.when(probe_ok)
                    def _():
                        neq = funnel3(ipos & 1023) != funnel3(off & 1023)
                        pers_ref[6] = jnp.min(jnp.where(neq, POS3, 999))

                    lcp = jnp.where(probe_ok, jnp.minimum(pers_ref[6], 259),
                                    0)
                    lcp = jnp.where(lcp >= 4, lcp, 0)
                    better = (lcp > best_len) & ~done
                    best_node = jnp.where(better, node, best_node)
                    best_len = jnp.where(better, lcp, best_len)
                    done = done | (best_len == 259) | (i + 1 >= 1)
                    nxt = jnp.where(done, node, nxt_raw)
                    done = done | (nxt == _NIL)
                    return (i + 1, jnp.where(done, node, nxt), off,
                            best_len, best_node, done)

                r = jax.lax.while_loop(
                    lambda c: ~c[5], wbody,
                    (jnp.int32(0), jnp.where(searchable, node0, 0),
                     jnp.int32(0), jnp.int32(3), jnp.int32(0), ~searchable))
                acc = acc + r[3] + r[4]

                if lazy != "off":
                    best_len = r[3]
                    if lazy == "never":
                        lgate = slab[0, (acc + ipos) & 2047] > 500
                    else:
                        lgate = slab[0, (acc + ipos) & 2047] >= 0
                    pers_ref[7] = 0

                    @pl.when(lgate)
                    def _():
                        if lazy == "prefetch":
                            node, s, nxt = lnode0, ls, lnxt
                        else:
                            lctx = sbyte(ipos)
                            _, lslot = hash4(ipos + 1)
                            node = onehot(hash_ref,
                                          lctx * 64 + _srl(lslot, 7),
                                          lslot & 127) & 4095
                            s = onehot(slot_ref,
                                       lctx * 32 + _srl(node, 7),
                                       node & 127)
                            nxt = onehot(chain_ref,
                                         lctx * 32 + _srl(node, 7),
                                         node & 127)
                        probe_at = best_len - 3
                        want = u32le_slab(ipos + 1 + probe_at)
                        off = s & 0xFFFFFF
                        pp = (off + probe_at) & 1023
                        got = onehot(block_vmem, _srl(pp, 7), pp & 127)
                        pers_ref[7] = ((got == (want & 255))
                                       | (nxt == _NIL)).astype(jnp.int32)
                    acc = acc + pers_ref[7]

            pers_ref[0] = acc & 1
            pers_ref[1] = acc & 255
            pers_ref[2] = acc & 4095

        def body(carry):
            i, acc = carry
            ipos = 1 + (i & 1023)

            if when_wrap:
                @pl.when(slab[0, 2047] < 999)  # data-true always
                def _():
                    find_match(ipos)
            else:
                find_match(ipos)

            found = pers_ref[0] != 0
            mlen = pers_ref[1]
            midx = pers_ref[2]

            # literal path: word-MRU check + update, staging, carries
            ctx = sbyte(ipos - 1)
            ww = sbyte(ipos) * 256 + sbyte(ipos + 1)
            hit0 = ~found & (mru_ref_get(ctx * 2) == ww)
            hit1 = ~found & ~hit0 & (mru_ref_get(ctx * 2 + 1) == ww)
            is_lit = ~found & ~hit0 & ~hit1
            sym = jnp.where(found, 258 + mlen,
                            jnp.where(hit0, 256,
                                      jnp.where(hit1, 257, sbyte(ipos))))
            kind = jnp.where(is_lit, 1, jnp.where(hit0 | hit1, 2, 3))
            stg[0, i & 511] = sym | (kind << 10) | (midx << 14)
            new_ipos = ipos + jnp.where(found, mlen,
                                        jnp.where(hit0 | hit1, 2, 1))
            cu = sbyte(new_ipos - 3)
            wu = sbyte(new_ipos - 2) * 256 + sbyte(new_ipos - 1)
            old0 = mru_ref_get(cu * 2)
            push = jnp.where(found, old0 != wu, is_lit | hit1)
            pb = jnp.where(push, cu * 2, 514)
            mru[0, pb + 1] = old0
            mru[0, pb] = wu
            return i + 1, acc + sym

        def mru_ref_get(k):
            return mru[0, k]

        i, acc = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                    (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = acc

    return kernel


def run(name, kernel, n=N):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((1, 2048), jnp.int32),     # slab
            pltpu.SMEM((1, 520), jnp.int32),      # stg
            pltpu.SMEM((1, 518), jnp.int32),      # mru
            pltpu.SMEM((1, 258), jnp.int32),      # head
            pltpu.SMEM((8,), jnp.int32),          # pers
            pltpu.VMEM((1024 // 128 * 16, 128), jnp.int32),  # block (synthetic)
            pltpu.VMEM((HASH_ROWS, 128), jnp.int32),
            pltpu.VMEM((RING_ROWS, 128), jnp.int32),
            pltpu.VMEM((RING_ROWS, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    x = jax.jit(f)
    nn = jnp.full((1, 1), n, jnp.int32)
    t0 = time.perf_counter()
    r = np.asarray(x(nn))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(x(nn))
        best = min(best, time.perf_counter() - t0)
    per = best / n
    print(f"{name:26s} {per*1e9:8.1f} ns/unit  ({per*GHZ*1e9:7.1f} cyc)  "
          f"[compile {compile_s:.0f}s, r={r[0,0]}]", flush=True)
    return per * GHZ * 1e9


def serial3_kernel(n_ref, o_ref, slab, vm):
    IOTA = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def onehot(row, lane):
        r = vm[pl.ds(row, 1), :]
        return jnp.sum(jnp.where(IOTA == lane, r, 0))

    def body(carry):
        i, acc = carry
        a = onehot(i & 255, i & 127)
        b = onehot((a + i) & 255, a & 127)
        c = onehot((b + i) & 255, b & 127)
        return i + 1, acc + c

    i, acc = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                (jnp.int32(0), jnp.int32(0)))
    o_ref[0, 0] = acc


def main():
    print(f"N={N} iterations per variant", flush=True)

    # pure latency chain reference
    f = pl.pallas_call(
        serial3_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1, 2048), jnp.int32),
                        pltpu.VMEM((256, 128), jnp.int32)],
    )
    x = jax.jit(f)
    nn = jnp.full((1, 1), N, jnp.int32)
    np.asarray(x(nn))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(x(nn))
        best = min(best, time.perf_counter() - t0)
    print(f"{'serial3 (3 dep extracts)':26s} {best/N*1e9:8.1f} ns/unit  "
          f"({best/N*GHZ*1e9:7.1f} cyc)", flush=True)

    configs = [
        ("lit", dict(insert=False, walk=False, whens="off", when_wrap=False)),
        ("lit+insert", dict(insert=True, walk=False, whens="off",
                            when_wrap=False)),
        ("lit+insert+walk", dict(insert=True, walk=True, whens="off",
                                 when_wrap=False)),
        ("... +whens(never)", dict(insert=True, walk=True, whens="never",
                                   when_wrap=False)),
        ("... +whens(taken)", dict(insert=True, walk=True, whens="taken",
                                   when_wrap=False)),
        ("... when-wrapped", dict(insert=True, walk=True, whens="never",
                                  when_wrap=True)),
        ("... +lazy(never)", dict(insert=True, walk=True, whens="never",
                                  when_wrap=False, lazy="never")),
        ("... +lazy(taken)", dict(insert=True, walk=True, whens="never",
                                  when_wrap=False, lazy="taken")),
        ("... +lazy(prefetch)", dict(insert=True, walk=True, whens="never",
                                     when_wrap=False, lazy="prefetch")),
    ]
    prev = None
    for name, cfg in configs:
        cyc = run(name, build_kernel(**cfg))
        if prev is not None:
            print(f"{'':26s}   delta vs previous: {cyc - prev:+.0f} cyc",
                  flush=True)
        prev = cyc


if __name__ == "__main__":
    main()
