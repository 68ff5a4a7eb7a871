"""The "tpu" backend: decode runs on the accelerator via Pallas kernels.

Two layouts (all codec compute on device; host only parses framing):

  fused (default): one scalar-core pass per chunk -- the Huffman bit-reader
      feeds the ROLZ resolve state machine directly (ops/decode_fused.py);
      no intermediate token array.  Fastest on single-core parts.
  split: chunk entropy decode (ops/entropy_kernel.py, grid over chunks --
      parallel across cores on multi-core parts) then the sequential
      resolve kernel (ops/resolve_kernel.py); tokens stay on device.

  [host]   parse container, nibble-unpack per-chunk length tables
  [host]   one packed-bytes fetch + per-block slicing at the end

For reference-format streams the resolve chain is serial (contexts are
decoded content, MTF crosses blocks -- DESIGN.md section 4), so this backend
is one execution lane; entropy decode parallelizes across cores on
multi-core parts.  On CPU (tests) both kernels run in Pallas interpreter
mode -- correct but slow, so keep test inputs small.
"""

from __future__ import annotations

import numpy as np

from . import container
from .ops import entropy_kernel as ek
from .ops import resolve_kernel as rk


def _auto_interpret() -> bool:
    """True when the device this computation will actually land on is not a
    TPU.  Checks ``jax.config.jax_default_device`` first so a surrounding
    ``with jax.default_device(cpu_dev):`` scope is honored — consulting only
    ``jax.default_backend()`` is the round-3 interpret-selection trap
    (ambient backend "tpu" while the target device is CPU)."""
    import jax

    dev = jax.config.jax_default_device
    if dev is None:
        dev = jax.devices()[0]
    return getattr(dev, "platform", None) != "tpu"


def encode(data: bytes, level: int = 0) -> bytes:
    """Encode on the accelerator: the Pallas ROLZ tokenizer runs on device
    (ops/tokenize_kernel.py) along with relabel/histogram/bit-pack; the host
    contributes only the exact Huffman length tables and container framing.

    This is the reference's one-call ``Encode`` (src/libzling.h:44) as the
    single-device case of the block-parallel mesh path, at the canonical
    16 MB / 262144-token geometry -- streams are byte-identical to
    ``spec.encode(data, level)``.
    """
    import jax

    from .parallel import mesh as pmesh
    from .tables import BLOCK_SIZE_IN, BLOCK_SIZE_ROLZ

    mesh = pmesh.make_mesh(np.asarray(jax.devices()[:1]))
    return pmesh.mesh_encode(data, level, mesh=mesh,
                             block_size=BLOCK_SIZE_IN,
                             max_tokens=BLOCK_SIZE_ROLZ, tokenizer="pallas")


def decode(data: bytes, interpret: bool | None = None, *,
           fused: bool = True,
           slab_words: int = ek.SLAB_WORDS,
           flush_tokens: int = ek.FLUSH_TOKENS,
           max_tokens: int = ek.MAX_TOKENS,
           slab_tokens: int = rk.SLAB_TOKENS) -> bytes:
    """Decode a zling stream on the TPU.  Bit-exact with spec.decode.

    The default single-pass fused kernel (bit-read + resolve in one loop,
    no intermediate token array) is the fastest single-core layout;
    fused=False selects the two-kernel pipeline, the multi-core layout.
    """
    if not data:
        return b""
    if interpret is None:
        interpret = _auto_interpret()
    chunks, block_sizes = container.parse(data)
    if not chunks:
        return b""
    len1, len2, bodies, rlens = container.unpack_length_tables(chunks)
    C = len(chunks)

    # per-chunk metadata: block starts + the owning block's output base in
    # the UNPACKED (byte-per-word) output, 128-aligned with flush-burst
    # slack between blocks (the ranged DMA overshoots to a burst boundary)
    encpos = np.asarray([ch.encpos for ch in chunks], np.int32)
    new_block = np.zeros(C, np.int32)
    hbm_base = np.zeros(C, np.int32)
    burst = rk.FLUSH_ROWS * 128
    block_base_rows: list[int] = []
    acc = 0
    for size in block_sizes:
        block_base_rows.append(acc)
        acc += ((size + burst - 1) // burst + 1) * rk.FLUSH_ROWS
    out_words = (acc + rk.FLUSH_ROWS) * 128
    prev_bid = -1
    for c, ch in enumerate(chunks):
        if ch.block_id != prev_bid:
            new_block[c] = 1
            prev_bid = ch.block_id
        hbm_base[c] = block_base_rows[ch.block_id]

    if fused:
        from .ops import decode_fused as fk

        packed, rstatus = fk.fused_decode(
            len1, len2, bodies, rlens.astype(np.int32), encpos, new_block,
            hbm_base, out_words, interpret=interpret)
        rst = np.asarray(rstatus)[:, 0, :]
        if rst[:, 2].any() or (rst[:, 1] != rlens).any():
            raise ValueError("zling: corrupt stream")
    else:
        tokens, status = ek.decode_chunks(
            len1, len2, bodies, rlens, interpret=interpret,
            slab_words=slab_words, flush_tokens=flush_tokens,
            max_tokens=max_tokens)
        st = np.asarray(status)
        if st[:, 0, 2].any() or (st[:, 0, 0] != rlens).any():
            raise ValueError("zling: corrupt stream (huffman)")

        tok_stride = max_tokens + 2 * flush_tokens
        tokens_flat = tokens.reshape(1, C * tok_stride)

        packed, rstatus, _mtf = rk.resolve_stream(
            tokens_flat, rlens.astype(np.int32), encpos, new_block, hbm_base,
            tok_stride, out_words, interpret=interpret,
            slab_tokens=slab_tokens)
        rst = np.asarray(rstatus)[:, 0, :]
        if rst[:, 2].any():
            raise ValueError("zling: corrupt stream (resolve)")

    raw = np.ascontiguousarray(np.asarray(packed)).view(np.uint8)
    parts = []
    for bid, size in enumerate(block_sizes):
        base = block_base_rows[bid] * 128
        parts.append(raw[base: base + size].tobytes())
    return b"".join(parts)
