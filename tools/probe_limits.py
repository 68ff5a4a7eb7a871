"""Probe v5e limits that gate the resolver-kernel design (compile-only).

Each probe compiles (but does not run) a tiny Pallas kernel, so a failed
probe cannot wedge the tunnel.  Records: VMEM scratch ceiling, SMEM scratch
ceiling, whether dynamic-shift pltpu.roll lowers, and whether a scalar
one-hot read of a VMEM row lowers.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def compiles(fn) -> str:
    try:
        fn()
        return "OK"
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        return f"FAIL: {msg}"


def probe_vmem(mb: int):
    rows = mb * 1024 * 1024 // 128

    def kernel(x_ref, o_ref, big):
        big[0, :] = x_ref[0, :]
        o_ref[0, 0] = big[0, 0]

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.uint8)],
        )
        jax.jit(f).lower(jnp.zeros((1, 128), jnp.uint8)).compile()

    return compiles(build)


def probe_smem(kb: int):
    n = kb * 1024 // 4

    def kernel(x_ref, o_ref, big):
        big[0, 0] = x_ref[0, 0]
        o_ref[0, 0] = big[0, n - 1]

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, n), jnp.int32)],
        )
        jax.jit(f).lower(jnp.zeros((1, 1), jnp.int32)).compile()

    return compiles(build)


def probe_dyn_roll():
    def kernel(x_ref, s_ref, o_ref):
        o_ref[0, :] = pltpu.roll(x_ref[0, :], shift=s_ref[0, 0], axis=0)

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(f).lower(jnp.zeros((1, 128), jnp.uint8),
                         jnp.zeros((1, 1), jnp.int32)).compile()

    return compiles(build)


def probe_dyn_roll2d():
    def kernel(x_ref, s_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], shift=s_ref[0, 0], axis=1)

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(f).lower(jnp.zeros((8, 128), jnp.int32),
                         jnp.zeros((1, 1), jnp.int32)).compile()

    return compiles(build)


def probe_onehot_read():
    """Scalar extraction from a VMEM row at a dynamic lane via one-hot sum."""

    def kernel(x_ref, i_ref, o_ref):
        lane = i_ref[0, 0]
        row = x_ref[i_ref[0, 1], :].astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
        o_ref[0, 0] = jnp.sum(jnp.where(iota == lane, row, 0))

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        jax.jit(f).lower(jnp.zeros((64, 128), jnp.uint8),
                         jnp.zeros((1, 2), jnp.int32)).compile()

    return compiles(build)


def probe_onehot_write():
    def kernel(x_ref, i_ref, o_ref):
        lane = i_ref[0, 0]
        row = o_ref[i_ref[0, 1], :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
        o_ref[i_ref[0, 1], :] = jnp.where(
            iota == lane, i_ref[0, 0].astype(jnp.uint8), row)

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(f).lower(jnp.zeros((64, 128), jnp.uint8),
                         jnp.zeros((1, 2), jnp.int32)).compile()

    return compiles(build)


def probe_scalar_while_vector_mix():
    """while_loop carrying scalars whose body does vector row RMW."""

    def kernel(x_ref, o_ref):
        def body(c):
            i, acc = c
            row = x_ref[i & 63, :].astype(jnp.int32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
            v = jnp.sum(jnp.where(iota == (i & 127), row, 0))
            return i + 1, acc + v

        _, acc = jax.lax.while_loop(lambda c: c[0] < 1000, body,
                                    (jnp.int32(0), jnp.int32(0)))
        o_ref[0, 0] = acc

    def build():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        jax.jit(f).lower(jnp.zeros((64, 128), jnp.uint8)).compile()

    return compiles(build)


def main():
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind,
          flush=True)
    for mb in (16, 24, 32, 48, 64, 96, 128):
        print(f"vmem {mb}MB: {probe_vmem(mb)}", flush=True)
    for kb in (64, 128, 256, 512, 1024):
        print(f"smem {kb}KB: {probe_smem(kb)}", flush=True)
    print("dyn roll 1d:", probe_dyn_roll(), flush=True)
    print("dyn roll 2d axis1:", probe_dyn_roll2d(), flush=True)
    print("one-hot read:", probe_onehot_read(), flush=True)
    print("one-hot write:", probe_onehot_write(), flush=True)
    print("scalar while + vector mix:", probe_scalar_while_vector_mix(), flush=True)


if __name__ == "__main__":
    main()
