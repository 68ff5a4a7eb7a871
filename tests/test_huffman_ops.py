"""Device Huffman ops vs the executable spec."""

import random

import numpy as np
import pytest

from libzling_tpu import spec
from libzling_tpu.ops import huffman as hops
from libzling_tpu.tables import (
    HUFFMAN_CODES_1,
    HUFFMAN_CODES_2,
    HUFFMAN_MAX_LEN_1,
    HUFFMAN_MAX_LEN_2,
    MATCHIDX_CODE,
)


def _random_freqs(rng, n, style):
    f = [0] * n
    if style == "zipf":
        for i in range(n):
            if rng.random() < 0.6:
                f[i] = int(rng.paretovariate(1.1))
    elif style == "sparse":
        for _ in range(rng.randrange(1, 5)):
            f[rng.randrange(n)] = rng.randrange(1, 1000)
    elif style == "uniform":
        f = [rng.randrange(0, 50) for _ in range(n)]
    elif style == "skewed":
        f = [rng.randrange(1, 10) for _ in range(n)]
        f[rng.randrange(n)] = 10**6
    return f


@pytest.mark.parametrize("alpha", [(HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1),
                                   (HUFFMAN_CODES_2, HUFFMAN_MAX_LEN_2)])
def test_exact_length_tables(alpha):
    n, maxlen = alpha
    rng = random.Random(1)
    freqs = [
        _random_freqs(rng, n, s)
        for s in ("zipf", "sparse", "uniform", "skewed") for _ in range(4)
    ]
    got = hops.exact_length_tables(np.asarray(freqs, np.uint32), maxlen)
    for i, f in enumerate(freqs):
        expect = spec.huffman_length_table(f, n, maxlen)
        assert got[i].tolist() == expect, f"case {i}"


@pytest.mark.parametrize("alpha", [(HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1),
                                   (HUFFMAN_CODES_2, HUFFMAN_MAX_LEN_2)])
def test_canonical_codes_and_lut(alpha):
    n, maxlen = alpha
    rng = random.Random(2)
    freqs = [_random_freqs(rng, n, s) for s in ("zipf", "sparse", "uniform", "skewed")]
    lengths = hops.exact_length_tables(np.asarray(freqs, np.uint32), maxlen)
    codes = np.asarray(hops.canonical_codes(lengths, maxlen))
    luts = np.asarray(hops.decode_lut(lengths, maxlen))
    for i in range(len(freqs)):
        ltab = lengths[i].tolist()
        expect_enc = spec.huffman_encode_table(ltab, n, maxlen)
        assert codes[i].tolist() == expect_enc, f"enc case {i}"
        expect_lut = spec.huffman_decode_table(ltab, expect_enc, n, maxlen)
        assert luts[i].tolist() == expect_lut, f"lut case {i}"


def _tokens_to_units(tokens):
    """zling token stream -> (sym, idx) unit arrays."""
    sym, idx = [], []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        sym.append(t)
        if t >= 258:
            i += 1
            idx.append(tokens[i])
        else:
            idx.append(0)
        i += 1
    return np.asarray(sym, np.int32), np.asarray(idx, np.int32)


def _example_token_stream(rng, n_units):
    """A structurally valid token stream with a realistic symbol mix."""
    tokens = []
    for _ in range(n_units):
        r = rng.random()
        if r < 0.55:
            tokens.append(rng.randrange(0, 40) if rng.random() < 0.8 else rng.randrange(256))
        elif r < 0.62:
            tokens.append(256 + rng.randrange(2))
        else:
            tokens.append(258 + min(int(rng.expovariate(0.05)), 255))
            tokens.append(rng.randrange(1, 4096))
    return tokens


def test_pack_units_matches_spec():
    rng = random.Random(3)
    for trial in range(4):
        tokens = _example_token_stream(rng, 3000)
        expect = spec.huffman_encode_chunk(tokens)
        sym, idx = _tokens_to_units(tokens)

        freq1, freq2 = hops.unit_histograms(sym, idx, np.ones(len(sym), bool))
        len1 = hops.exact_length_tables(np.asarray(freq1)[None], HUFFMAN_MAX_LEN_1)[0]
        len2 = hops.exact_length_tables(np.asarray(freq2)[None], HUFFMAN_MAX_LEN_2)[0]
        enc1 = np.asarray(hops.canonical_codes(len1, HUFFMAN_MAX_LEN_1))
        enc2 = np.asarray(hops.canonical_codes(len2, HUFFMAN_MAX_LEN_2))
        out_words = (len(expect) // 4) + 4
        words, total_bits = hops.pack_units(
            sym, idx, np.ones(len(sym), bool), len1, enc1, len2, enc2, out_words)
        got = hops.payload_from_words(
            np.asarray(words), int(total_bits), np.asarray(len1), np.asarray(len2))
        assert got == expect, f"trial {trial}"


def test_histogram_matches_spec_freqs():
    rng = random.Random(4)
    tokens = _example_token_stream(rng, 5000)
    sym, idx = _tokens_to_units(tokens)
    freq1, freq2 = hops.unit_histograms(sym, idx, np.ones(len(sym), bool))
    # recompute the reference way
    f1 = [0] * HUFFMAN_CODES_1
    f2 = [0] * HUFFMAN_CODES_2
    i = 0
    while i < len(tokens):
        f1[tokens[i]] += 1
        if tokens[i] >= 258:
            i += 1
            f2[int(MATCHIDX_CODE[tokens[i]])] += 1
        i += 1
    assert np.asarray(freq1).tolist() == f1
    assert np.asarray(freq2).tolist() == f2
