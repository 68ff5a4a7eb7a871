"""Device ROLZ tokenizer/resolver + MTF relabel vs the executable spec."""

import numpy as np
import pytest
import jax.numpy as jnp

from libzling_tpu import spec
from libzling_tpu.ops import mtf as mops
from libzling_tpu.ops import rolz as rops
from libzling_tpu.tables import LEVEL_PARAMS, SENTINEL_LEN

from .test_spec_vs_reference import _mixed_blob

MAX_UNITS = 65536


def _pad_block(data: bytes) -> jnp.ndarray:
    return jnp.asarray(
        np.frombuffer(data + bytes(SENTINEL_LEN + 64), dtype=np.uint8))


def _device_tokenize(data: bytes, level: int):
    """Full-block device tokenize + MTF relabel -> zling token list."""
    depth, lazy1, lazy2 = LEVEL_PARAMS[level]
    block = _pad_block(data)
    state = rops.enc_state_init()
    r2s, s2r = mops.initial_state()
    all_chunks = []
    pos = 0
    while pos < len(data):
        state, sym, idx, upos, kind, n_units, n_tok, pos_new = rops.tokenize_chunk(
            state, block, len(data), jnp.int32(pos), depth, lazy1, lazy2,
            jnp.int32(262144), MAX_UNITS)
        n_units = int(n_units)
        sym = np.asarray(sym[:n_units])
        idx = np.asarray(idx[:n_units])
        upos = np.asarray(upos[:n_units])
        kind = np.asarray(kind[:n_units])
        # MTF relabel of the literal units (device op)
        lit_mask = kind == rops.KIND_LITERAL
        blocknp = np.asarray(block)
        lit_ctx = blocknp[np.maximum(upos - 1, 0)][lit_mask]
        lit_raw = blocknp[upos][lit_mask]
        sym2 = sym.copy()
        if len(lit_ctx):
            ranks, r2s, s2r = mops.encode_relabel(
                r2s, s2r,
                jnp.asarray(lit_ctx, jnp.int32), jnp.asarray(lit_raw, jnp.int32),
                jnp.ones(len(lit_ctx), bool))
            sym2[lit_mask] = np.asarray(ranks[: len(lit_ctx)])
        # expand to zling token stream
        tokens = []
        for s, ix, k in zip(sym2, idx, kind):
            tokens.append(int(s))
            if k == rops.KIND_MATCH:
                tokens.append(int(ix))
        all_chunks.append((tokens, int(pos_new), int(n_tok)))
        pos = int(pos_new)
    return all_chunks


@pytest.mark.parametrize("level", [0, 2, 4])
def test_tokenize_matches_spec(level):
    data = _mixed_blob(30000, seed=level + 50)
    enc = spec.RolzEncoder()
    enc.reset()
    block = bytearray(data) + bytearray(SENTINEL_LEN)
    expect_tokens, expect_pos = enc.encode_chunk(level, block, len(data), 0)

    got_chunks = _device_tokenize(data, level)
    assert len(got_chunks) == 1
    got_tokens, got_pos, got_ntok = got_chunks[0]
    assert got_pos == expect_pos
    assert got_ntok == len(expect_tokens)
    assert got_tokens == expect_tokens


def test_tokenize_small_edge_cases():
    for data in (b"a", b"ab", b"abc", b"aaaaaaaaaaaaaaaa", bytes(300)):
        enc = spec.RolzEncoder()
        enc.reset()
        block = bytearray(data) + bytearray(SENTINEL_LEN)
        expect_tokens, expect_pos = enc.encode_chunk(0, block, len(data), 0)
        got_tokens, got_pos, _ = _device_tokenize(data, 0)[0]
        assert (got_tokens, got_pos) == (expect_tokens, expect_pos), data


@pytest.mark.parametrize("level", [0, 4])
def test_resolve_roundtrip(level):
    data = _mixed_blob(30000, seed=7)
    enc = spec.RolzEncoder()
    enc.reset()
    block = bytearray(data) + bytearray(SENTINEL_LEN)
    tokens, encpos = enc.encode_chunk(level, block, len(data), 0)

    state = rops.dec_state_init()
    r2s, _ = mops.initial_state()
    out = jnp.zeros(len(data) + SENTINEL_LEN + 64, jnp.uint8)
    toks = jnp.asarray(np.asarray(tokens, np.int32))
    state, r2s, out, opos, ok = rops.resolve_chunk(
        state, r2s, toks, jnp.int32(len(tokens)), out, jnp.int32(0),
        jnp.int32(encpos), out.shape[0])
    assert bool(ok)
    assert int(opos) == encpos
    assert bytes(np.asarray(out[:encpos])) == data[:encpos]


def test_resolve_rejects_corrupt():
    data = b"hello world hello world hello hello hello world" * 20
    enc = spec.RolzEncoder()
    enc.reset()
    block = bytearray(data) + bytearray(SENTINEL_LEN)
    tokens, encpos = enc.encode_chunk(1, block, len(data), 0)
    # corrupt a match index to 0 (self-copy: reference would hang)
    bad = list(tokens)
    for i, t in enumerate(bad):
        if t >= 258:
            bad[i + 1] = 0
            break
    state = rops.dec_state_init()
    r2s, _ = mops.initial_state()
    out = jnp.zeros(len(data) + SENTINEL_LEN + 64, jnp.uint8)
    _, _, _, _, ok = rops.resolve_chunk(
        state, r2s, jnp.asarray(np.asarray(bad, np.int32)),
        jnp.int32(len(bad)), out, jnp.int32(0), jnp.int32(encpos), out.shape[0])
    assert not bool(ok)


def test_mtf_relabel_matches_reference():
    rng = np.random.default_rng(3)
    L = 5000
    ctx = rng.integers(0, 256, L).astype(np.int32)
    # skew contexts like text (few hot contexts)
    ctx[rng.random(L) < 0.5] = 32
    raw = rng.integers(0, 256, L).astype(np.int32)
    r2s, s2r = mops.initial_state()
    expect, er2s, es2r = mops.encode_relabel_reference(r2s, s2r, ctx, raw)
    got, gr2s, gs2r = mops.encode_relabel(
        r2s, s2r, jnp.asarray(ctx), jnp.asarray(raw), jnp.ones(L, bool))
    assert np.asarray(got).tolist() == expect.tolist()
    assert np.array_equal(np.asarray(gr2s), er2s)
    assert np.array_equal(np.asarray(gs2r), es2r)
