"""Golden tests for the Pallas MTF relabel kernel (interpreter mode).

Oracle: ops/mtf.py encode_relabel_reference (the sequential NumPy port of
ZlingMTFEncoder, src/libzling_lz.cpp:112-117).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from libzling_tpu.ops import mtf as mops
from libzling_tpu.ops import relabel_kernel as rlk


def _pack_units(rng, max_chunks, chunk_units, nunits):
    """Random packed unit words in the tokenizer's convention."""
    chunk_stride = ((chunk_units + 511) // 512 + 1) * 512
    a = np.zeros((max_chunks, chunk_stride), np.int32)
    lits = []  # (ctx, raw) in stream order
    for c in range(max_chunks):
        for u in range(nunits[c]):
            kind = rng.choice([0, 1, 1, 1, 2, 3])
            if kind == 1:
                ctx = int(rng.integers(0, 256))
                raw = int(rng.integers(0, 256))
                a[c, u] = raw | (1 << 10) | (ctx << 14)
                lits.append((ctx, raw))
            elif kind == 3:
                a[c, u] = int(rng.integers(258, 514)) | (3 << 10) \
                    | (int(rng.integers(1, 4096)) << 14)
            else:
                a[c, u] = int(rng.integers(0, 256)) | (kind << 10)
    return a.reshape(1, -1), chunk_stride, lits


def test_relabel_kernel_matches_reference():
    rng = np.random.default_rng(5)
    max_chunks, chunk_units = 3, 700
    nunits = np.asarray([700, 0, 311], np.int32)
    a, chunk_stride, lits = _pack_units(rng, max_chunks, chunk_units, nunits)

    r2s, s2r = mops.initial_state()
    a2, r2s2, s2r2 = rlk.relabel_block(
        jnp.asarray(a), jnp.asarray(nunits), r2s, s2r,
        chunk_stride=chunk_stride, max_chunks=max_chunks, interpret=True)

    ranks, r2s_ref, s2r_ref = mops.encode_relabel_reference(
        np.asarray(r2s), np.asarray(s2r),
        [c for c, _ in lits], [b for _, b in lits])

    a2 = np.asarray(a2).reshape(max_chunks, chunk_stride)
    a0 = a.reshape(max_chunks, chunk_stride)
    k = 0
    for c in range(max_chunks):
        for u in range(nunits[c]):
            w0, w2 = int(a0[c, u]), int(a2[c, u])
            if (w0 >> 10) & 3 == 1:
                assert w2 == (w0 & ~1023) | int(ranks[k]), (c, u)
                k += 1
            else:
                assert w2 == w0, (c, u)
    assert k == len(lits)
    assert np.array_equal(np.asarray(r2s2), r2s_ref)
    assert np.array_equal(np.asarray(s2r2), s2r_ref)

    # carried state: a second block continues the chain exactly
    nunits_b = np.asarray([120, 64, 0], np.int32)
    b, _, lits_b = _pack_units(rng, max_chunks, chunk_units, nunits_b)
    b2, r2s3, s2r3 = rlk.relabel_block(
        jnp.asarray(b), jnp.asarray(nunits_b), r2s2, s2r2,
        chunk_stride=chunk_stride, max_chunks=max_chunks, interpret=True)
    ranks_b, r2s_ref2, _ = mops.encode_relabel_reference(
        r2s_ref, s2r_ref, [c for c, _ in lits_b], [x for _, x in lits_b])
    b2 = np.asarray(b2).reshape(max_chunks, chunk_stride)
    b0 = b.reshape(max_chunks, chunk_stride)
    k = 0
    for c in range(max_chunks):
        for u in range(nunits_b[c]):
            if (int(b0[c, u]) >> 10) & 3 == 1:
                assert int(b2[c, u]) & 1023 == int(ranks_b[k])
                k += 1
    assert np.array_equal(np.asarray(r2s3), r2s_ref2)


def test_state_pack_roundtrip():
    rng = np.random.default_rng(1)
    r2s = jnp.asarray(rng.integers(0, 256, (256, 256), dtype=np.int32))
    s2r = jnp.asarray(rng.integers(0, 256, (256, 256), dtype=np.int32))
    a, b = rlk.unpack_state(rlk.pack_state(r2s, s2r))
    assert np.array_equal(np.asarray(a), np.asarray(r2s))
    assert np.array_equal(np.asarray(b), np.asarray(s2r))
