"""Golden tests for the Pallas ROLZ tokenizer kernel.

Interpreter mode on CPU; the oracle is ops/rolz.py tokenize_chunk (itself
golden-tested against the reference binary), driven chunk-by-chunk with the
same level schedule.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from libzling_tpu.ops import rolz as rops
from libzling_tpu.ops import tokenize_kernel as tk
from libzling_tpu.tables import SENTINEL_LEN


def _oracle(block: bytes, levels, max_tokens, max_chunks, chunk_units):
    buf = jnp.asarray(np.frombuffer(block + bytes(SENTINEL_LEN + 64), np.uint8))
    state = rops.enc_state_init()
    pos = jnp.int32(0)
    out = []
    ltab = tk._LEVEL_TABLE
    for c in range(max_chunks):
        if int(pos) >= len(block):
            break
        d, l1, l2 = (int(v) for v in ltab[int(levels[c])])
        state, sym, idx, upos, kind, nu, nt, pos = rops.tokenize_chunk(
            state, buf, len(block), pos, jnp.int32(d), jnp.int32(l1),
            jnp.int32(l2), jnp.int32(max_tokens), chunk_units)
        out.append((np.asarray(sym), np.asarray(idx), np.asarray(upos),
                    np.asarray(kind), int(nu), int(nt), int(pos)))
    return out


@pytest.mark.parametrize("level,seed,size", [(0, 3, 3000), (2, 7, 5000)])
def test_tokenize_kernel_matches_oracle(level, seed, size):
    rng = np.random.default_rng(seed)
    text = (b"the quick brown fox jumps over the lazy dog. " * 200)[: size // 2]
    data = text + bytes(rng.integers(0, 256, size - len(text), dtype=np.uint8))
    max_tokens, max_chunks, chunk_units = 700, 12, 700
    levels = np.full(max_chunks, level, np.int32)
    levels[1] = 0  # mixed schedule mid-block

    sym, idx, upos, kind, nunits, ntoks, encpos, n_chunks, err = \
        tk.tokenize_block(data, levels, max_tokens, max_chunks, chunk_units,
                          interpret=True)
    assert err == 0
    ref = _oracle(data, levels, max_tokens, max_chunks, chunk_units)
    assert n_chunks == len(ref)
    for c, (rsym, ridx, rupos, rkind, rnu, rnt, rpos) in enumerate(ref):
        assert int(nunits[c]) == rnu, f"chunk {c} nunits"
        assert int(ntoks[c]) == rnt, f"chunk {c} ntoks"
        assert int(encpos[c]) == rpos, f"chunk {c} encpos"
        assert np.asarray(sym[c])[:rnu].tolist() == rsym[:rnu].tolist(), c
        assert np.asarray(idx[c])[:rnu].tolist() == ridx[:rnu].tolist(), c
        assert np.asarray(upos[c])[:rnu].tolist() == rupos[:rnu].tolist(), c
        assert np.asarray(kind[c])[:rnu].tolist() == rkind[:rnu].tolist(), c


def test_tokenize_kernel_extended_level():
    # e5 (depth 24, lazy 6/3) exceeds the jitted tokenizer's static bounds;
    # validate against the executable spec instead
    from libzling_tpu import spec

    data = (b"abcabcabd" * 120) + b"the quick brown fox " * 30
    max_tokens, max_chunks, chunk_units = 4000, 4, 4000
    sym, idx, upos, kind, nunits, ntoks, encpos, n_chunks, err = \
        tk.tokenize_block(data, [5] * max_chunks, max_tokens, max_chunks,
                          chunk_units, interpret=True)
    assert err == 0 and n_chunks == 1
    enc = spec.RolzEncoder()
    buf = bytearray(data) + bytearray(400)
    tokens, pos = enc.encode_chunk(5, buf, len(data), 0, max_tokens)
    assert int(encpos[0]) == pos
    # reconstruct the kernel's token stream (raw literals -> spec applies MTF,
    # so compare only the structure: kinds, positions, match lens/idx)
    k_tok = []
    mtf = spec.RolzEncoder().mtf  # fresh MTF chain, applied in unit order
    for u in range(int(nunits[0])):
        s, kd, up = int(sym[0][u]), int(kind[0][u]), int(upos[0][u])
        if kd == 3:
            k_tok.append(s)
            k_tok.append(int(idx[0][u]))
        elif kd == 1:
            k_tok.append(mtf[buf[up - 1]].encode(buf[up]))
        else:
            k_tok.append(s)
    assert k_tok == tokens


def test_mesh_encode_with_pallas_tokenizer():
    # the kernel lane slots into the canonical mesh path: byte-identical
    # stream (tiny data: the kernel interprets per-unit on CPU)
    import jax
    from libzling_tpu import spec
    from libzling_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(11)
    data = (b"mesh pallas tokenizer lane " * 60
            + bytes(rng.integers(0, 256, 800, dtype=np.uint8)))
    mesh = pmesh.make_mesh(jax.devices()[:2])
    stream = pmesh.mesh_encode(data, level=1, mesh=mesh, block_size=1024,
                               max_tokens=400, tokenizer="pallas")
    ref = spec.encode(data, level=1, block_size=1024, max_tokens=400)
    assert stream == ref
