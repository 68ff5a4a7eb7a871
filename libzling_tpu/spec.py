"""Executable specification of the zling bitstream format.

A deliberately simple, scalar-sequential Python implementation of the codec,
bit-exact with the reference C++ library (richox/libzling).  It exists to be
*read* and to serve as the correctness oracle for the native engine and the
JAX/Pallas device kernels; it is not fast.

Format summary (reverse-engineered; see SURVEY.md section 8 and reference
citations on each function):

    stream       := input_block*
    input_block  := (0x01 chunk)* 0x00
    chunk        := encpos:u32be rlen:u32be olen:u32be payload[olen]
    payload      := nibble-packed length tables (273 B) ++ LSB-first huffbits

Tokens are u16 symbols: 0-255 MTF literals (first two bytes of each 16MB
block raw), 256/257 word-MRU hits, 258+L a match of length L+4 followed by a
4096-ary match index symbol.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .tables import (
    BLOCK_SIZE_HUFFMAN,
    BLOCK_SIZE_IN,
    BLOCK_SIZE_ROLZ,
    BUCKET_ITEM_HASH,
    BUCKET_ITEM_SIZE,
    FLAG_CHUNK_CONTINUE,
    FLAG_CHUNK_STOP,
    HUFFMAN_CODES_1,
    HUFFMAN_CODES_2,
    HUFFMAN_MAX_LEN_1,
    HUFFMAN_MAX_LEN_1_FAST,
    HUFFMAN_MAX_LEN_2,
    LEVEL_PARAMS,
    MATCH_MAX_LEN,
    MATCH_MIN_LEN,
    MATCH_MIN_LEN_ENABLE_LAZY,
    MATCHIDX_BASE,
    MATCHIDX_BLEN,
    MATCHIDX_CODE,
    MTF_INIT,
    MTF_NEXT,
    SENTINEL_LEN,
)

_MTF_INIT = MTF_INIT.tolist()
_MTF_NEXT = MTF_NEXT.tolist()
_MATCHIDX_CODE = MATCHIDX_CODE.tolist()
_MATCHIDX_BASE = MATCHIDX_BASE.tolist()
_MATCHIDX_BLEN = MATCHIDX_BLEN.tolist()


# ---------------------------------------------------------------------------
# Huffman table construction
# ---------------------------------------------------------------------------
#
# The reference builds the code-length table with a std::priority_queue of
# node pointers compared by weight only (src/libzling_huffman.cpp:41-112).
# Tie-breaking therefore depends on the exact array-heap mechanics of
# libstdc++'s make_heap/push_heap/pop_heap.  The three helpers below replicate
# those algorithms (bottom-up adjust_heap variant) so that equal-weight nodes
# are merged in the same order and produce identical code lengths.


def _heap_sift_up(heap: list[int], weight: list[int], hole: int, top: int, value: int) -> None:
    parent = (hole - 1) // 2
    while hole > top and weight[heap[parent]] > weight[value]:
        heap[hole] = heap[parent]
        hole = parent
        parent = (hole - 1) // 2
    heap[hole] = value


def _heap_adjust(heap: list[int], weight: list[int], hole: int, length: int, value: int) -> None:
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if weight[heap[second]] > weight[heap[second - 1]]:
            second -= 1
        heap[hole] = heap[second]
        hole = second
    if (length & 1) == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        heap[hole] = heap[second - 1]
        hole = second - 1
    _heap_sift_up(heap, weight, hole, top, value)


def _heap_make(heap: list[int], weight: list[int]) -> None:
    n = len(heap)
    if n < 2:
        return
    parent = (n - 2) // 2
    while True:
        value = heap[parent]
        _heap_adjust(heap, weight, parent, n, value)
        if parent == 0:
            return
        parent -= 1


def _heap_push(heap: list[int], weight: list[int], node: int) -> None:
    heap.append(node)
    if len(heap) > 1:
        _heap_sift_up(heap, weight, len(heap) - 1, 0, heap[-1])


def _heap_pop(heap: list[int], weight: list[int]) -> int:
    top = heap[0]
    last = len(heap) - 1
    if last > 0:
        value = heap[last]
        heap[last] = heap[0]
        _heap_adjust(heap, weight, 0, last, value)
    heap.pop()
    return top


def huffman_length_table(freq: list[int] | np.ndarray, max_codes: int, max_codelen: int) -> list[int]:
    """Frequencies -> length-limited code lengths.

    Bit-exact with ZlingMakeLengthTable (src/libzling_huffman.cpp:41-112):
    weights are ceil(freq / 2**scaling); the tree is built by repeatedly
    merging the two minimum-weight nodes from the heap; present symbols get
    length >= 1; if any length exceeds ``max_codelen`` the whole build is
    retried with scaling+1.
    """
    freq = list(freq)
    lengths = [0] * max_codes
    scaling = 0
    while True:
        # node storage: weight[], sym[], kids[]; leaves first in symbol order
        weight: list[int] = []
        sym: list[int] = []
        kids: list[tuple[int, int] | None] = []
        for i in range(max_codes):
            if freq[i] > 0:
                weight.append((freq[i] + (1 << scaling) - 1) >> scaling)
                sym.append(i)
                kids.append(None)
        if not weight:
            return lengths
        heap = list(range(len(weight)))
        _heap_make(heap, weight)
        while len(heap) > 1:
            min1 = _heap_pop(heap, weight)
            min2 = _heap_pop(heap, weight)
            weight.append(weight[min1] + weight[min2])
            sym.append(-1)
            kids.append((min1, min2))
            _heap_push(heap, weight, len(weight) - 1)
        # extract depths (iteratively; child1 first like the reference's
        # recursive extractor, though order does not affect the result)
        stack = [(heap[0], 0)]
        maxdepth = 0
        while stack:
            node, depth = stack.pop()
            if sym[node] >= 0:
                lengths[sym[node]] = max(depth, 1)
                maxdepth = max(maxdepth, max(depth, 1))
            else:
                c1, c2 = kids[node]  # type: ignore[misc]
                stack.append((c2, depth + 1))
                stack.append((c1, depth + 1))
        if maxdepth <= max_codelen:
            return lengths
        lengths = [0] * max_codes
        scaling += 1


def _bitrev16(x: int) -> int:
    x = ((x & 0xFF00) >> 8) | ((x & 0x00FF) << 8)
    x = ((x & 0xF0F0) >> 4) | ((x & 0x0F0F) << 4)
    x = ((x & 0xCCCC) >> 2) | ((x & 0x3333) << 2)
    x = ((x & 0xAAAA) >> 1) | ((x & 0x5555) << 1)
    return x


def huffman_encode_table(lengths: list[int], max_codes: int, max_codelen: int) -> list[int]:
    """Lengths -> bit-reversed LSB-first canonical codes.

    Bit-exact with ZlingMakeEncodeTable (src/libzling_huffman.cpp:114-138):
    canonical assignment shorter-codes-first then symbol order, then each code
    is 16-bit reversed and right-aligned to its length.
    """
    enc = [0] * max_codes
    code = 0
    for codelen in range(1, max_codelen + 1):
        for i in range(max_codes):
            if lengths[i] == codelen:
                enc[i] = code
                code += 1
        code *= 2
    for i in range(max_codes):
        enc[i] = (_bitrev16(enc[i]) >> (16 - lengths[i])) if lengths[i] > 0 else 0
    return enc


def huffman_decode_table(lengths: list[int], enc: list[int], max_codes: int, max_codelen: int) -> list[int]:
    """Lengths+codes -> flat LUT of size 2**max_codelen; 0xFFFF marks holes.

    Bit-exact with ZlingMakeDecodeTable (src/libzling_huffman.cpp:140-153).
    """
    table = [0xFFFF] * (1 << max_codelen)
    for c in range(max_codes):
        if 0 < lengths[c] <= max_codelen:
            for i in range(enc[c], 1 << max_codelen, 1 << lengths[c]):
                table[i] = c
    return table


# ---------------------------------------------------------------------------
# sticky move-to-front
# ---------------------------------------------------------------------------


class MtfEncoder:
    """Order-1 sticky MTF (src/libzling_lz.cpp:106-117).

    Promotion swaps rank i with rank MTF_NEXT[i] instead of moving to front.
    State persists across blocks for the whole stream (SURVEY.md section 0.3).
    """

    __slots__ = ("table", "index")

    def __init__(self) -> None:
        self.table = list(_MTF_INIT)           # rank -> symbol
        self.index = [0] * 256                 # symbol -> rank
        for i, c in enumerate(self.table):
            self.index[c] = i

    def encode(self, c: int) -> int:
        table, index = self.table, self.index
        i = index[c]
        j = _MTF_NEXT[i]
        s = table[j]
        index[c], index[s] = index[s], index[c]
        table[i], table[j] = table[j], table[i]
        return i


class MtfDecoder:
    __slots__ = ("table",)

    def __init__(self) -> None:
        self.table = list(_MTF_INIT)

    def decode(self, i: int) -> int:
        table = self.table
        c = table[i]
        j = _MTF_NEXT[i]
        table[i], table[j] = table[j], table[i]
        return c


# ---------------------------------------------------------------------------
# ROLZ tokenizer
# ---------------------------------------------------------------------------


def _hash_context(buf: bytearray, pos: int) -> int:
    """Little-endian u32 at pos plus weighted bytes (src/libzling_lz.cpp:55-57)."""
    w = buf[pos] | buf[pos + 1] << 8 | buf[pos + 2] << 16 | buf[pos + 3] << 24
    return (w + buf[pos + 2] * 137 + buf[pos + 3] * 13337) & 0xFFFFFFFF


def _common_length(buf: bytearray, p1: int, p2: int, maxlen: int) -> int:
    """Word-wise common-prefix length (src/libzling_lz.cpp:66-89).

    Returns 0 if the first four bytes differ anywhere, else the exact common
    prefix length capped at ``maxlen``.
    """
    if buf[p1:p1 + 4] != buf[p2:p2 + 4]:
        return 0
    n = 0
    while maxlen - n >= 4 and buf[p1 + n:p1 + n + 4] == buf[p2 + n:p2 + n + 4]:
        n += 4
    if maxlen - n >= 2 and buf[p1 + n:p1 + n + 2] == buf[p2 + n:p2 + n + 2]:
        n += 2
    if maxlen - n >= 1 and buf[p1 + n] == buf[p2 + n]:
        n += 1
    return n


class RolzEncoder:
    """Order-1 reduced-offset LZ match finder (src/libzling_lz.cpp:128-316).

    256 context buckets keyed by the previous raw byte; each bucket is a
    4096-slot circular ring of past token-start positions threaded into
    8192 hash chains.  ``reset()`` clears the buckets only; the MTF tables
    survive for the whole stream.
    """

    def __init__(self) -> None:
        self.offset = [[0] * BUCKET_ITEM_SIZE for _ in range(256)]
        self.suffix = [[65535] * BUCKET_ITEM_SIZE for _ in range(256)]
        self.hash = [[65535] * BUCKET_ITEM_HASH for _ in range(256)]
        self.head = [0] * 256
        self.mtf = [MtfEncoder() for _ in range(256)]

    def reset(self) -> None:
        # buckets only -- MTF state deliberately survives (libzling_lz.cpp:197-209)
        for c in range(256):
            ofs, sfx = self.offset[c], self.suffix[c]
            for i in range(BUCKET_ITEM_SIZE):
                ofs[i] = 0
                sfx[i] = 65535
            h = self.hash[c]
            for i in range(BUCKET_ITEM_HASH):
                h[i] = 65535
            self.head[c] = 0

    def _match_and_update(self, buf: bytearray, pos: int, depth: int,
                          lazy1: int, lazy2: int) -> tuple[int, int] | None:
        """Insert pos into its bucket, then search the chain (libzling_lz.cpp:211-289)."""
        maxlen = MATCH_MIN_LEN - 1
        maxnode = 0
        h = _hash_context(buf, pos)
        hash_check = (h // BUCKET_ITEM_HASH) % 256
        hash_slot = h % BUCKET_ITEM_HASH

        ctx = buf[pos - 1]
        ofs, sfx, hsh = self.offset[ctx], self.suffix[ctx], self.hash[ctx]
        node = hsh[hash_slot]

        # update before matching
        head = (self.head[ctx] + 1) & (BUCKET_ITEM_SIZE - 1)
        self.head[ctx] = head
        sfx[head] = hsh[hash_slot]
        ofs[head] = pos | hash_check << 24
        hsh[hash_slot] = head

        if node == 65535 or node == head:
            return None

        for _ in range(depth):
            offset = ofs[node] & 0xFFFFFF
            check = ofs[node] >> 24
            if check == hash_check and buf[pos + maxlen] == buf[offset + maxlen]:
                n = _common_length(buf, pos, offset, MATCH_MAX_LEN)
                if n > maxlen:
                    maxnode = node
                    maxlen = n
                    if maxlen == MATCH_MAX_LEN:
                        break
            node = sfx[node]
            if node == 65535 or offset <= (ofs[node] & 0xFFFFFF):
                break

        if maxlen >= MATCH_MIN_LEN:
            if maxlen < MATCH_MIN_LEN_ENABLE_LAZY:
                if lazy1 > 0 and self._match_lazy(buf, pos + 1, maxlen, lazy1):
                    return None
                if lazy2 > 0 and self._match_lazy(buf, pos + 2, maxlen, lazy2):
                    return None
            return maxlen, (head - maxnode) & (BUCKET_ITEM_SIZE - 1)
        return None

    def _match_lazy(self, buf: bytearray, pos: int, maxlen: int, depth: int) -> bool:
        """Probe whether pos could start a strictly longer match (libzling_lz.cpp:291-316)."""
        ctx = buf[pos - 1]
        ofs, sfx, hsh = self.offset[ctx], self.suffix[ctx], self.hash[ctx]
        node = hsh[_hash_context(buf, pos) % BUCKET_ITEM_HASH]
        if node == 65535:
            return False
        maxlen -= 3
        for _ in range(depth):
            offset = ofs[node] & 0xFFFFFF
            if buf[pos + maxlen:pos + maxlen + 4] == buf[offset + maxlen:offset + maxlen + 4]:
                return True
            node = sfx[node]
            if node == 65535 or offset <= (ofs[node] & 0xFFFFFF):
                break
        return False

    def encode_chunk(self, level: int, buf: bytearray, ilen: int, start: int,
                     max_tokens: int = BLOCK_SIZE_ROLZ) -> tuple[list[int], int]:
        """Tokenize one ROLZ chunk starting at ``start`` (libzling_lz.cpp:139-195).

        Returns (tokens, new_position).  ``buf`` must have SENTINEL_LEN slack
        beyond ``ilen``.
        """
        depth, lazy1, lazy2 = LEVEL_PARAMS[level]
        ipos = start
        tokens: list[int] = []
        word_mru0 = [0] * 256
        word_mru1 = [0] * 256

        if ipos == 0 and len(tokens) < max_tokens and ipos < ilen:
            tokens.append(buf[ipos])
            ipos += 1
        if ipos == 1 and len(tokens) < max_tokens and ipos < ilen:
            tokens.append(buf[ipos])
            ipos += 1

        match_limit = ilen - MATCH_MAX_LEN - 16  # attempt matches while ipos+275 < ilen
        while len(tokens) + 1 < max_tokens and ipos < ilen:
            if ipos < match_limit:
                m = self._match_and_update(buf, ipos, depth, lazy1, lazy2)
                if m is not None:
                    mlen, midx = m
                    tokens.append(258 + mlen - MATCH_MIN_LEN)
                    tokens.append(midx)
                    ipos += mlen
                    c = buf[ipos - 3]
                    w = buf[ipos - 2] << 8 | buf[ipos - 1]
                    if word_mru0[c] != w:
                        word_mru1[c] = word_mru0[c]
                        word_mru0[c] = w
                    continue
            if ipos + 1 < ilen:
                w = buf[ipos] << 8 | buf[ipos + 1]
                ctx = buf[ipos - 1]
                if word_mru0[ctx] == w:
                    tokens.append(256)
                    ipos += 2
                    continue
                if word_mru1[ctx] == w:
                    tokens.append(257)
                    ipos += 2
                    c = buf[ipos - 3]
                    word_mru1[c] = word_mru0[c]
                    word_mru0[c] = buf[ipos - 2] << 8 | buf[ipos - 1]
                    continue
            tokens.append(self.mtf[buf[ipos - 1]].encode(buf[ipos]))
            ipos += 1
            c = buf[ipos - 3]
            word_mru1[c] = word_mru0[c]
            word_mru0[c] = buf[ipos - 2] << 8 | buf[ipos - 1]
        return tokens, ipos


class RolzDecoder:
    """Token stream -> bytes (src/libzling_lz.cpp:318-399).

    The decoder bucket is just the position ring: one insert per token at the
    token's first output byte, keyed by the previous output byte.
    """

    def __init__(self) -> None:
        self.offset = [[0] * BUCKET_ITEM_SIZE for _ in range(256)]
        self.head = [0] * 256
        self.mtf = [MtfDecoder() for _ in range(256)]

    def reset(self) -> None:
        for c in range(256):
            ofs = self.offset[c]
            for i in range(BUCKET_ITEM_SIZE):
                ofs[i] = 0
            self.head[c] = 0

    def _ring_insert_and_get(self, buf: bytearray, pos: int, idx: int) -> int:
        ctx = buf[pos - 1]
        head = (self.head[ctx] + 1) & (BUCKET_ITEM_SIZE - 1)
        self.head[ctx] = head
        ofs = self.offset[ctx]
        ofs[head] = pos
        return ofs[(head - idx) & (BUCKET_ITEM_SIZE - 1)]

    def decode_chunk(self, tokens: list[int], buf: bytearray, encpos: int, start: int) -> int:
        """Decode one chunk of tokens into ``buf`` starting at ``start``.

        Returns the new output position; raises ValueError on corrupt input
        (including the idx==0 / forward-offset cases the reference mishandles,
        SURVEY.md section 9.10).
        """
        opos = start
        ipos = 0
        ilen = len(tokens)
        word_mru0 = [0] * 256
        word_mru1 = [0] * 256

        # first two bytes of a block are raw byte tokens; the reference stores
        # them through an unsigned char so out-of-range tokens truncate
        if opos == 0 and ipos < ilen:
            buf[opos] = tokens[ipos] & 0xFF
            opos += 1
            ipos += 1
        if opos == 1 and ipos < ilen:
            buf[opos] = tokens[ipos] & 0xFF
            opos += 1
            ipos += 1

        while ipos < ilen:
            t = tokens[ipos]
            if t < 256:
                buf[opos] = self.mtf[buf[opos - 1]].decode(t)
                ipos += 1
                self._ring_insert_and_get(buf, opos, 0)
                opos += 1
                c = buf[opos - 3]
                word_mru1[c] = word_mru0[c]
                word_mru0[c] = buf[opos - 2] << 8 | buf[opos - 1]
            elif t == 256:
                word = word_mru0[buf[opos - 1]]
                ipos += 1
                buf[opos] = (word >> 8) & 0xFF
                self._ring_insert_and_get(buf, opos, 0)
                opos += 1
                buf[opos] = word & 0xFF
                opos += 1
            elif t == 257:
                word = word_mru1[buf[opos - 1]]
                ipos += 1
                buf[opos] = (word >> 8) & 0xFF
                self._ring_insert_and_get(buf, opos, 0)
                opos += 1
                buf[opos] = word & 0xFF
                opos += 1
                c = buf[opos - 3]
                word_mru1[c] = word_mru0[c]
                word_mru0[c] = buf[opos - 2] << 8 | buf[opos - 1]
            else:
                mlen = t - 258 + MATCH_MIN_LEN
                if ipos + 1 >= ilen:
                    raise ValueError("zling: truncated match token pair")
                midx = tokens[ipos + 1]
                ipos += 2
                src = self._ring_insert_and_get(buf, opos, midx)
                # robustness: the reference hangs on idx==0 (self-copy) and
                # reads garbage on never-written ring slots; a valid encoder
                # can emit neither, so reject both (SURVEY.md section 9.10).
                if midx == 0 or src == 0 or src >= opos:
                    raise ValueError("zling: invalid match source offset")
                for k in range(mlen):
                    buf[opos + k] = buf[src + k]
                opos += mlen
                c = buf[opos - 3]
                w = buf[opos - 2] << 8 | buf[opos - 1]
                if word_mru0[c] != w:
                    word_mru1[c] = word_mru0[c]
                    word_mru0[c] = w
            if opos > encpos:
                raise ValueError("zling: output overruns encpos")

        if opos != encpos:
            raise ValueError("zling: output does not reach encpos")
        return opos


# ---------------------------------------------------------------------------
# chunk-level Huffman stage
# ---------------------------------------------------------------------------


def huffman_encode_chunk(tokens: list[int]) -> bytes:
    """Tokens -> chunk payload bytes (driver loop src/libzling.cpp:210-258)."""
    freq1 = [0] * HUFFMAN_CODES_1
    freq2 = [0] * HUFFMAN_CODES_2
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        freq1[t] += 1
        if t >= 258:
            i += 1
            freq2[_MATCHIDX_CODE[tokens[i]]] += 1
        i += 1
    len1 = huffman_length_table(freq1, HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1)
    len2 = huffman_length_table(freq2, HUFFMAN_CODES_2, HUFFMAN_MAX_LEN_2)
    enc1 = huffman_encode_table(len1, HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1)
    enc2 = huffman_encode_table(len2, HUFFMAN_CODES_2, HUFFMAN_MAX_LEN_2)

    out = bytearray()
    for i in range(0, HUFFMAN_CODES_1, 2):
        out.append(len1[i] * 16 + len1[i + 1])
    for i in range(0, HUFFMAN_CODES_2, 2):
        out.append(len2[i] * 16 + len2[i + 1])

    acc = 0
    nbits = 0
    i = 0
    while i < n:
        t = tokens[i]
        acc |= enc1[t] << nbits
        nbits += len1[t]
        if t >= 258:
            i += 1
            idx = tokens[i]
            code = _MATCHIDX_CODE[idx]
            acc |= enc2[code] << nbits
            nbits += len2[code]
            acc |= (idx - _MATCHIDX_BASE[code]) << nbits
            nbits += _MATCHIDX_BLEN[code]
        i += 1
        if nbits >= 32:
            out.extend((acc & 0xFFFFFFFF).to_bytes(4, "little"))
            acc >>= 32
            nbits -= 32
    while nbits > 0:
        out.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    return bytes(out)


def huffman_decode_chunk(payload: bytes, rlen: int) -> list[int]:
    """Chunk payload -> tokens (driver loop src/libzling.cpp:336-402)."""
    pos = 0
    len1 = [0] * HUFFMAN_CODES_1
    len2 = [0] * HUFFMAN_CODES_2
    buf = bytearray(payload) + bytearray(8)  # decoder may over-read 4 bytes
    for i in range(0, HUFFMAN_CODES_1, 2):
        len1[i] = buf[pos] >> 4
        len1[i + 1] = buf[pos] & 15
        pos += 1
    for i in range(0, HUFFMAN_CODES_2, 2):
        len2[i] = buf[pos] >> 4
        len2[i + 1] = buf[pos] & 15
        pos += 1
    enc1 = huffman_encode_table(len1, HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1)
    enc2 = huffman_encode_table(len2, HUFFMAN_CODES_2, HUFFMAN_MAX_LEN_2)
    dec1 = huffman_decode_table(len1, enc1, HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1)
    dec1_fast = huffman_decode_table(len1, enc1, HUFFMAN_CODES_1, HUFFMAN_MAX_LEN_1_FAST)
    dec2 = huffman_decode_table(len2, enc2, HUFFMAN_CODES_2, HUFFMAN_MAX_LEN_2)

    tokens: list[int] = []
    acc = 0
    nbits = 0
    i = 0
    while i < rlen:
        if nbits < 32:
            acc |= int.from_bytes(buf[pos:pos + 4], "little") << nbits
            pos += 4
            nbits += 32
        t = dec1_fast[acc & ((1 << HUFFMAN_MAX_LEN_1_FAST) - 1)]
        if t == 0xFFFF:
            t = dec1[acc & ((1 << HUFFMAN_MAX_LEN_1) - 1)]
        if t >= HUFFMAN_CODES_1:
            raise ValueError("zling: invalid huffman stream (bad code1)")
        acc >>= len1[t]
        nbits -= len1[t]
        tokens.append(t)
        i += 1
        if t >= 258:
            code = dec2[acc & ((1 << HUFFMAN_MAX_LEN_2) - 1)]
            if code >= HUFFMAN_CODES_2:
                raise ValueError("zling: invalid huffman stream (bad code2)")
            acc >>= len2[code]
            nbits -= len2[code]
            blen = _MATCHIDX_BLEN[code]
            bits = acc & ((1 << blen) - 1)
            acc >>= blen
            nbits -= blen
            idx = _MATCHIDX_BASE[code] + bits
            if idx >= BUCKET_ITEM_SIZE:
                raise ValueError("zling: invalid huffman stream (bad ex-bits)")
            tokens.append(idx)
            i += 1
    return tokens


# ---------------------------------------------------------------------------
# stream container
# ---------------------------------------------------------------------------


@dataclass
class EncodeStats:
    """Per-stream observability counters (the ActionHandler analog)."""

    blocks: int = 0
    chunks: int = 0
    tokens: int = 0
    level_drops: int = 0
    chunk_sizes: list[int] = field(default_factory=list)


def encode(data: bytes, level: int = 0, stats: EncodeStats | None = None,
           block_size: int = BLOCK_SIZE_IN,
           max_tokens: int = BLOCK_SIZE_ROLZ) -> bytes:
    """Compress ``data``; bit-exact with baidu::zling::Encode (src/libzling.cpp:174-291)
    at levels 0-4; levels 5-6 are framework extensions (deeper search,
    reference-decodable output).

    ``block_size``/``max_tokens`` shrink the input-block / ROLZ-chunk
    geometry (framework extension: any smaller geometry still yields a
    reference-decodable stream).  The defaults are the canonical reference
    constants; tests use small values to exercise multi-block/multi-chunk
    logic at spec speed, and parallel backends are validated byte-for-byte
    against this function at equal geometry.
    """
    if level not in LEVEL_PARAMS:
        raise ValueError("level must be 0..6")
    out = bytearray()
    enc = RolzEncoder()
    current_level = level
    for bstart in range(0, len(data), block_size):
        block = bytearray(data[bstart:bstart + block_size])
        ilen = len(block)
        block.extend(bytes(SENTINEL_LEN))
        enc.reset()
        encpos = 0
        while encpos < ilen:
            out.append(FLAG_CHUNK_CONTINUE)
            encpos_old = encpos
            tokens, encpos = enc.encode_chunk(current_level, block, ilen,
                                              encpos, max_tokens)
            payload = huffman_encode_chunk(tokens)
            olen = len(payload)
            # adaptive level drop for incompressible chunks (libzling.cpp:261-266)
            if 1.0 * olen / (encpos - encpos_old + 1) > 0.95:
                current_level = 0
                if stats is not None:
                    stats.level_drops += 1
            else:
                current_level = level
            out.extend(encpos.to_bytes(4, "big"))
            out.extend(len(tokens).to_bytes(4, "big"))
            out.extend(olen.to_bytes(4, "big"))
            out.extend(payload)
            if stats is not None:
                stats.chunks += 1
                stats.tokens += len(tokens)
                stats.chunk_sizes.append(olen)
        out.append(FLAG_CHUNK_STOP)
        if stats is not None:
            stats.blocks += 1
    return bytes(out)


def decode(data: bytes) -> bytes:
    """Decompress; mirror of baidu::zling::Decode (src/libzling.cpp:293-427)."""
    out = bytearray()
    dec = RolzDecoder()
    pos = 0
    n = len(data)
    while pos < n:
        dec.reset()
        decpos = 0
        block = bytearray(BLOCK_SIZE_IN + SENTINEL_LEN)
        while True:
            if pos >= n:
                raise ValueError("zling: truncated stream (missing stop flag)")
            flag = data[pos]
            pos += 1
            if flag == FLAG_CHUNK_STOP:
                break
            if flag != FLAG_CHUNK_CONTINUE:
                raise ValueError("zling: invalid chunk flag")
            if pos + 12 > n:
                raise ValueError("zling: truncated chunk header")
            encpos = int.from_bytes(data[pos:pos + 4], "big")
            rlen = int.from_bytes(data[pos + 4:pos + 8], "big")
            olen = int.from_bytes(data[pos + 8:pos + 12], "big")
            pos += 12
            if rlen > BLOCK_SIZE_ROLZ or olen > BLOCK_SIZE_HUFFMAN:
                raise ValueError("zling: invalid chunk size")
            if encpos > BLOCK_SIZE_IN:
                raise ValueError("zling: invalid encpos")
            if pos + olen > n:
                raise ValueError("zling: truncated chunk payload")
            payload = data[pos:pos + olen]
            pos += olen
            tokens = huffman_decode_chunk(payload, rlen)
            decpos = dec.decode_chunk(tokens, block, encpos, decpos)
        out.extend(block[:decpos])
    return bytes(out)
