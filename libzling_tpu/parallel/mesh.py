"""Block-data-parallel encode over a jax.sharding.Mesh.

The zling format's large-grain parallel axis is the 16 MB input block: ROLZ
bucket state resets at block boundaries (SURVEY.md section 0.2), so
tokenization shards cleanly.  The single cross-block dependency is the MTF
table chain (section 0.3) -- a sequence-parallel-shaped problem: tokenize
emits raw literals in parallel, then the 128 KB MTF state threads through the
blocks in order.  Here that carry is expressed as a wavefront inside
shard_map: D iterations over the block axis, each broadcasting the updated
state with a psum (on hardware this rides the ICI).

``parallel_encode_step`` is the jittable multi-chip "step" (the training-step
analog): tokenize + MTF wavefront + histograms + bit-pack, all under one
shard_map.  The host wrapper ``mesh_encode`` runs real streams through it and
assembles the container in block order; per-chunk exact Huffman lengths come
from the host between the two device stages.

Decode does not scale this way for reference-format streams: the resolve
stage's contexts are decoded content, and the MTF chain crosses blocks, so
decode parallelism is pipeline-style only (see pipeline.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import huffman as hops
from ..ops import mtf as mops
from ..ops import rolz as rops
from ..tables import (
    BLOCK_SIZE_HUFFMAN,
    HUFFMAN_CODES_1,
    HUFFMAN_CODES_2,
    HUFFMAN_MAX_LEN_1,
    HUFFMAN_MAX_LEN_2,
    LEVEL_PARAMS,
)

AXIS = "blocks"


def make_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def _tokenize_and_relabel(block, ilen, depth, lazy1, lazy2, r2s0, s2r0,
                          max_units: int):
    """Per-device tokenize (one chunk) + cross-device MTF wavefront.

    Runs inside shard_map; block/ilen are the device-local shard; r2s0/s2r0
    is the MTF state carried in from the previous block group.
    Returns (sym2, idx, valid, n_tok, encpos, r2s_final, s2r_final).
    """
    state = rops.enc_state_init()
    state, sym, idx, upos, kind, n_units, n_tok, pos = rops.tokenize_chunk(
        state, block, ilen, jnp.int32(0), depth, lazy1, lazy2,
        jnp.int32(max_units + 8), max_units)

    valid = jnp.arange(max_units) < n_units
    is_lit = valid & (kind == rops.KIND_LITERAL)
    lit_ctx = block[jnp.maximum(upos - 1, 0)].astype(jnp.int32)
    lit_raw = block[upos].astype(jnp.int32)

    # MTF wavefront: block b's literals see the state left by blocks 0..b-1.
    # Each iteration, block k relabels and the new state is psum-broadcast.
    D = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)

    def chain(k, carry):
        r2s, s2r, my_ranks = carry
        ranks_k, r2s_k, s2r_k = mops.encode_relabel(r2s, s2r, lit_ctx, lit_raw, is_lit)
        mine = me == k
        my_ranks = jnp.where(mine, ranks_k, my_ranks)
        r2s = jax.lax.psum(jnp.where(mine, r2s_k, 0), AXIS)
        s2r = jax.lax.psum(jnp.where(mine, s2r_k, 0), AXIS)
        return r2s, s2r, my_ranks

    r2s, s2r, ranks = jax.lax.fori_loop(
        0, D, chain, (r2s0, s2r0, jnp.zeros(max_units, jnp.int32)))
    sym2 = jnp.where(is_lit, ranks, sym)
    return sym2, idx, valid, n_tok, pos, r2s, s2r


@functools.partial(jax.jit, static_argnames=("mesh", "max_units", "out_words"))
def parallel_encode_step(blocks, ilens, depth, lazy1, lazy2, r2s0, s2r0, *,
                         mesh: Mesh, max_units: int, out_words: int):
    """Stage 1 of block-DP encode: everything before the Huffman tables.

    blocks: [D, B] uint8 (padded); ilens: [D] int32; r2s0/s2r0: carried MTF
    state (replicated).  Returns per-block (sym2 [D, U], idx [D, U],
    valid [D, U], n_tok [D], encpos [D], freq1 [D, 514], freq2 [D, 32]) plus
    the replicated MTF state after the whole group.
    """

    def step(block, ilen, r2s0, s2r0):
        sym2, idx, valid, n_tok, encpos, r2s, s2r = _tokenize_and_relabel(
            block[0], ilen[0], depth, lazy1, lazy2, r2s0, s2r0, max_units)
        freq1, freq2 = hops.unit_histograms(sym2, idx, valid)
        return (sym2[None], idx[None], valid[None], n_tok[None], encpos[None],
                freq1[None], freq2[None], r2s, s2r)

    return jax.shard_map(
        step, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS, None), P(AXIS), P(), P()),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS),
                   P(AXIS), P(AXIS, None), P(AXIS, None), P(), P()),
    )(blocks, ilens, r2s0, s2r0)


@functools.partial(jax.jit, static_argnames=("mesh", "out_words"))
def parallel_pack_step(sym2, idx, valid, len1, enc1, len2, enc2, *, mesh: Mesh,
                       out_words: int):
    """Stage 2: per-block bit-packing with that block's Huffman tables."""

    def step(sym2, idx, valid, len1, enc1, len2, enc2):
        words, bits = hops.pack_units(
            sym2[0], idx[0], valid[0], len1[0], enc1[0], len2[0], enc2[0], out_words)
        return words[None], bits[None]

    return jax.shard_map(
        step, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS, None),) * 7,
        out_specs=(P(AXIS, None), P(AXIS)),
    )(sym2, idx, valid, len1, enc1, len2, enc2)


def mesh_encode(data: bytes, level: int, mesh: Mesh | None = None,
                block_size: int = 1 << 17) -> bytes:
    """Encode a stream with blocks sharded over the mesh.

    Uses ``block_size``-byte framework blocks (any size <= 16 MB yields a
    valid, reference-decodable stream; smaller blocks trade a little ratio
    for more parallelism).  block_size <= 128 KB guarantees one ROLZ chunk
    per block (worst case one token per byte stays under the 262,144-token
    chunk cap), which keeps the step shape static.
    """
    if mesh is None:
        mesh = make_mesh()
    D = mesh.devices.size
    depth, lazy1, lazy2 = (jnp.int32(v) for v in LEVEL_PARAMS[level])
    max_units = block_size  # worst case one literal per byte
    out_words = BLOCK_SIZE_HUFFMAN // 4 + 16
    pad = 384

    nblocks = (len(data) + block_size - 1) // block_size
    out = bytearray()
    r2s, s2r = mops.initial_state()
    for group in range(0, nblocks, D):
        gblocks = []
        gilens = []
        for d in range(D):
            b = group + d
            blk = data[b * block_size: (b + 1) * block_size]
            gilens.append(len(blk))
            gblocks.append(np.frombuffer(
                blk + bytes(block_size + pad - len(blk)), np.uint8))
        blocks = jax.device_put(
            np.stack(gblocks), NamedSharding(mesh, P(AXIS, None)))
        ilens = jax.device_put(
            np.asarray(gilens, np.int32), NamedSharding(mesh, P(AXIS)))
        (sym2, idx, valid, n_tok, encpos, freq1, freq2, r2s, s2r) = \
            parallel_encode_step(
                blocks, ilens, depth, lazy1, lazy2, r2s, s2r, mesh=mesh,
                max_units=max_units, out_words=out_words)
        # host: exact per-block Huffman tables
        f1 = np.asarray(freq1)
        f2 = np.asarray(freq2)
        len1 = hops.exact_length_tables(f1, HUFFMAN_MAX_LEN_1)
        len2 = hops.exact_length_tables(f2, HUFFMAN_MAX_LEN_2)
        enc1 = hops.canonical_codes(jnp.asarray(len1), HUFFMAN_MAX_LEN_1)
        enc2 = hops.canonical_codes(jnp.asarray(len2), HUFFMAN_MAX_LEN_2)
        jl1 = jax.device_put(jnp.asarray(len1), NamedSharding(mesh, P(AXIS, None)))
        jl2 = jax.device_put(jnp.asarray(len2), NamedSharding(mesh, P(AXIS, None)))
        je1 = jax.device_put(enc1, NamedSharding(mesh, P(AXIS, None)))
        je2 = jax.device_put(enc2, NamedSharding(mesh, P(AXIS, None)))
        words, bits = parallel_pack_step(
            sym2, idx, valid, jl1, je1, jl2, je2, mesh=mesh, out_words=out_words)
        # host: ordered ragged gather + container framing
        words_np = np.asarray(words)
        bits_np = np.asarray(bits)
        ntok_np = np.asarray(n_tok)
        encpos_np = np.asarray(encpos)
        for d in range(D):
            if group + d >= nblocks or gilens[d] == 0:
                continue
            payload = hops.payload_from_words(
                words_np[d], int(bits_np[d]), len1[d], len2[d])
            out.append(1)
            out.extend(int(encpos_np[d]).to_bytes(4, "big"))
            out.extend(int(ntok_np[d]).to_bytes(4, "big"))
            out.extend(len(payload).to_bytes(4, "big"))
            out.extend(payload)
            out.append(0)
    return bytes(out)
