"""Measure per-iteration cost of scalar-core loop constructs on the v5e.

Each variant runs a while_loop of N iterations inside one pallas_call;
timing the warm call gives cycles/iteration (v5e scalar core ~0.94 GHz).
These numbers size the entropy-decode and resolve kernel budgets
(DESIGN.md section 3).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4_000_000
GHZ = 0.94


def run(name, kernel, *args, scratch=(), n=N):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=list(scratch),
    )
    x = jax.jit(f)
    t0 = time.perf_counter()
    r = np.asarray(x(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(x(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / n
    print(f"{name:28s} {per*1e9:8.1f} ns/iter  ({per*GHZ*1e9:6.1f} cyc)  "
          f"[compile {compile_s:.0f}s, result {r[0,0]}]", flush=True)


def main():
    nn = jnp.full((1, 1), N, jnp.int32)

    def v0(n_ref, o_ref):
        def body(c):
            i, a = c
            return i + 1, a + (i & 7)
        i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                  (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = a
    run("while 2-carry arith", v0, nn)

    def v1(n_ref, o_ref):
        def body(c):
            i, a, b, d, e, f, g, h, k = c
            a = a + (i & 7); b = b ^ i; d = d | (i & 1); e = e + (a & 3)
            f = f + (b & 1); g = g ^ (d + e); h = h + 1; k = k ^ h
            return i + 1, a, b, d, e, f, g, h, k
        r = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                               (jnp.int32(0),) * 9)
        o_ref[0, 0] = r[1]
    run("while 9-carry ~15 ops", v1, nn)

    def v2(n_ref, o_ref, s_ref):
        def body(c):
            i, a = c
            v = s_ref[0, i & 1023]
            w = s_ref[0, (i + a) & 1023]
            s_ref[0, (i + 1) & 1023] = v + w
            return i + 1, a + (v & 3)
        i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                  (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = a
    run("while + 2 smem ld + 1 st", v2, nn,
        scratch=[pltpu.SMEM((1, 1024), jnp.int32)])

    def v3(n_ref, o_ref, s_ref):
        def body(c):
            i, a = c
            v = s_ref[0, i & 1023]

            @pl.when(v > 100000)
            def _():
                s_ref[0, 1023] = v

            w = jnp.where(v > 100000, s_ref[0, 1023], v)
            return i + 1, a + (w & 3)
        i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                  (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = a
    run("while + rare pl.when", v3, nn,
        scratch=[pltpu.SMEM((1, 1024), jnp.int32)])

    def v4(n_ref, o_ref, vm):
        IOTA = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(c):
            i, a = c
            row = vm[pl.ds(i & 255, 1), :]
            v = jnp.sum(jnp.where(IOTA == (i & 127), row, 0))
            return i + 1, a + (v & 3)
        i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                  (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = a
    run("while + onehot vmem read", v4, nn,
        scratch=[pltpu.VMEM((256, 128), jnp.int32)], n=N)

    def v5(n_ref, o_ref, vm):
        IOTA = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(c):
            i, a = c
            row = vm[pl.ds(i & 255, 1), :]
            vm[pl.ds(i & 255, 1), :] = jnp.where(IOTA == (i & 127), a, row)
            return i + 1, a + 1
        i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                  (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = a
    run("while + onehot vmem rmw", v5, nn,
        scratch=[pltpu.VMEM((256, 128), jnp.int32)], n=N)

    def v6(n_ref, o_ref, vm):
        ROW4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
        LANE4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)

        def body(c):
            i, a, cur = c
            cur = jnp.where((ROW4 == (i & 3)) & (LANE4 == (i & 127)), a, cur)

            @pl.when((i & 511) == 511)
            def _():
                vm[pl.ds(((i >> 9) & 63) << 2, 4), :] = cur

            cur = jnp.where((i & 511) == 511, 0, cur)
            return i + 1, a + 1, cur
        i, a, cur = jax.lax.while_loop(
            lambda c: c[0] < n_ref[0, 0], body,
            (jnp.int32(0), jnp.int32(0), jnp.zeros((4, 128), jnp.int32)))
        o_ref[0, 0] = a + jnp.sum(cur[0, :1])
    run("while + vreg blend carry", v6, nn,
        scratch=[pltpu.VMEM((256, 128), jnp.int32)], n=N)


def main2():
    nn = jnp.full((1, 1), N, jnp.int32)

    # replica of the entropy-decode loop body (no DMAs, synthetic tables)
    def v10(n_ref, o_ref, slab, lut1, lut2, obuf, fb):
        def body(c):
            wpos, woff, lo, hi, nbits, emitted, obuf_n, nflushed, bad = c
            w = slab[0, wpos & 4095]
            fill = nbits < 32
            lo = jnp.where(fill, jnp.where(nbits == 0, w, lo | (w << nbits)), lo)
            hi = jnp.where(fill, jnp.where(nbits == 0, 0,
                           jax.lax.shift_right_logical(w, 32 - jnp.maximum(nbits, 1))), hi)
            wpos = wpos + fill.astype(jnp.int32)
            nbits = nbits + jnp.where(fill, 32, 0)
            e = lut1[0, jax.lax.shift_right_logical(lo & 0xFFF, 9), lo & 0x1FF]

            @pl.when(e < 0)
            def _():
                fb[0] = e & 7

            ev = jnp.where(e < 0, fb[0], e)
            bad = bad | (ev < 0)
            ev = jnp.maximum(ev, 0)
            sym = ev & 0xFFFF
            l1 = jnp.maximum(jax.lax.shift_right_logical(ev, 16) & 31, 1)
            is_match = (sym >= 258) & (emitted + 1 < n_ref[0, 0])
            p2 = jax.lax.shift_right_logical(lo, l1) & 0xFF
            e2 = lut2[0, jax.lax.shift_right_logical(p2, 7), p2 & 0x7F]
            bad = bad | (is_match & (e2 < 0))
            e2 = jnp.maximum(e2, 0)
            l2 = e2 & 0xFF
            blen = jax.lax.shift_right_logical(e2, 8) & 0xFF
            extra = jax.lax.shift_right_logical(lo, l1 + l2) & ((jnp.int32(1) << blen) - 1)
            idxtok = jax.lax.shift_right_logical(e2, 16) + extra
            nc = l1 + jnp.where(is_match, l2 + blen, 0)
            lo = jax.lax.shift_right_logical(lo, nc) | (hi << (32 - nc))
            hi = jax.lax.shift_right_logical(hi, nc)
            nbits = nbits - nc
            obuf[0, obuf_n & 8191] = sym
            obuf[0, (obuf_n + 1) & 8191] = idxtok
            adv = 1 + is_match.astype(jnp.int32)
            obuf_n = obuf_n + adv
            emitted = emitted + adv
            bad = bad | (wpos > n_ref[0, 0])
            return wpos, woff, lo, hi, nbits, emitted, obuf_n, nflushed, bad

        def cond(c):
            return (c[5] < n_ref[0, 0]) & ~c[8]

        r = jax.lax.while_loop(cond, body,
                               (jnp.int32(2), jnp.int32(0), jnp.int32(123456),
                                jnp.int32(777), jnp.int32(64), jnp.int32(0),
                                jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        o_ref[0, 0] = r[5]
    run("entropy body replica", v10, nn, scratch=[
        pltpu.SMEM((1, 4096), jnp.int32),
        pltpu.SMEM((1, 8, 512), jnp.int32),
        pltpu.SMEM((1, 8, 128), jnp.int32),
        pltpu.SMEM((1, 8192), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
    ])

    # replica + the two rare pl.when DMA regions, as in the real kernel
    def v11(n_ref, hbm, o_ref, slab, obuf, sem_in, sem_out):
        def body(c):
            i, a = c

            @pl.when((i & 8191) == 8191)
            def _():
                cp = pltpu.make_async_copy(
                    hbm.at[0, pl.ds(((i >> 13) & 63) * 4096, 4096)],
                    slab.at[0, :], sem_in)
                cp.start()
                cp.wait()

            @pl.when((i & 4095) == 4095)
            def _():
                cp = pltpu.make_async_copy(
                    obuf.at[0, :],
                    hbm.at[0, pl.ds(((i >> 12) & 63) * 8192, 8192)], sem_out)
                cp.start()
                cp.wait()

            v = slab[0, i & 4095]
            obuf[0, i & 8191] = v + a
            return i + 1, a + (v & 3)
        i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0, 0], body,
                                  (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = a

    f = pl.pallas_call(
        v11,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1, 4096), jnp.int32),
                        pltpu.SMEM((1, 8192), jnp.int32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    x = jax.jit(f)
    arr = jnp.zeros((1, 8192 * 64), jnp.int32)
    np.asarray(x(nn, arr))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(x(nn, arr))
        best = min(best, time.perf_counter() - t0)
    print(f"{'loop + rare DMA whens':28s} {best/N*1e9:8.1f} ns/iter "
          f"({best/N*GHZ*1e9:6.1f} cyc)", flush=True)

    # DMA costs (per-DMA): SMEM->HBM 32KB and HBM->SMEM 16KB
    ND = 2000

    def mk_dma(nwords, toward_hbm):
        def k(n_ref, hbm, o_ref, smem, sem):
            def body(i, _):
                if toward_hbm:
                    cp = pltpu.make_async_copy(
                        smem.at[0, :], hbm.at[0, pl.ds((i & 63) * nwords, nwords)], sem)
                else:
                    cp = pltpu.make_async_copy(
                        hbm.at[0, pl.ds((i & 63) * nwords, nwords)], smem.at[0, :], sem)
                cp.start()
                cp.wait()
                return 0
            jax.lax.fori_loop(0, n_ref[0, 0], body, 0)
            o_ref[0, 0] = 1
        return k

    for nwords, toward, label in ((8192, True, "dma smem->hbm 32KB"),
                                  (4096, False, "dma hbm->smem 16KB"),
                                  (128, True, "dma smem->hbm 512B")):
        def build(nwords=nwords, toward=toward):
            f = pl.pallas_call(
                mk_dma(nwords, toward),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.SMEM((1, nwords), jnp.int32),
                                pltpu.SemaphoreType.DMA],
            )
            x = jax.jit(f)
            arr = jnp.zeros((1, nwords * 64), jnp.int32)
            ncalls = jnp.full((1, 1), ND, jnp.int32)
            np.asarray(x(ncalls, arr))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(x(ncalls, arr))
                best = min(best, time.perf_counter() - t0)
            per = best / ND
            print(f"{label:28s} {per*1e6:8.2f} us/dma ({nwords*4/per/1e9:.2f} GB/s)",
                  flush=True)
        build()


if __name__ == "__main__":
    main()
    main2()
