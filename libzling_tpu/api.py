"""Public codec API with pluggable backends.

Backends:
  "spec"   -- pure-Python executable specification (slow, always available)
  "native" -- C++ host engine (block-parallel, bit-exact)
  "jax"    -- JAX device pipeline (jitted XLA ops + Pallas entropy decode)
  "tpu"    -- fully on-device codec: decode via the fused Pallas kernel,
              encode via the Pallas ROLZ tokenizer on a single-device mesh
              (libzling_tpu.device; canonical 16 MB geometry)
  "mesh"   -- multi-chip lane over the default jax Mesh: block-DP encode
              (parallel.mesh) and sharded-entropy pipelined decode
              (parallel.decode_mesh); canonical byte-identical streams
  "auto"   -- fastest available: native for host calls; use the
              ``libzling_tpu.codec`` module directly for device pipelines.
"""

from __future__ import annotations

import os
from typing import Callable

from . import spec

_BACKENDS_ENC: dict[str, Callable[[bytes, int], bytes]] = {}
_BACKENDS_DEC: dict[str, Callable[[bytes], bytes]] = {}


def _register_backends() -> None:
    _BACKENDS_ENC["spec"] = lambda d, lvl: spec.encode(d, lvl)
    _BACKENDS_DEC["spec"] = spec.decode
    try:
        from .native import engine as _native

        _BACKENDS_ENC["native"] = _native.encode
        _BACKENDS_DEC["native"] = _native.decode
    except Exception:  # pragma: no cover - native build unavailable
        pass
    try:
        from . import pipeline as _pipeline

        _BACKENDS_ENC["pipeline"] = _pipeline.encode
        _BACKENDS_DEC["pipeline"] = _pipeline.decode
    except Exception:  # pragma: no cover - native build unavailable
        pass
    try:
        from . import codec as _jax_codec

        _BACKENDS_ENC["jax"] = lambda d, lvl: _jax_codec.encode(d, lvl)
        _BACKENDS_DEC["jax"] = _jax_codec.decode
    except Exception:  # pragma: no cover - jax unavailable
        pass
    try:
        from . import device as _device

        _BACKENDS_ENC["tpu"] = _device.encode
        _BACKENDS_DEC["tpu"] = _device.decode
    except Exception:  # pragma: no cover - jax unavailable
        pass
    try:
        from .parallel import decode_mesh as _dmesh, mesh as _pmesh

        # multi-chip lane: encode block-DP over the default mesh, decode
        # with per-chunk entropy sharded over it (decode_mesh.py)
        _BACKENDS_ENC["mesh"] = lambda d, lvl: _pmesh.mesh_encode(d, lvl)
        _BACKENDS_DEC["mesh"] = _dmesh.mesh_decode
    except Exception:  # pragma: no cover - jax unavailable
        pass


_register_backends()


def _resolve(table: dict[str, Callable], backend: str) -> Callable:
    if backend == "auto":
        backend = os.environ.get("LIBZLING_TPU_BACKEND", "")
        if not backend:
            for name in ("pipeline", "native", "spec"):
                if name in table:
                    backend = name
                    break
    if backend not in table:
        raise ValueError(f"backend {backend!r} unavailable; have {sorted(table)}")
    return table[backend]


def encode(data: bytes, level: int = 0, backend: str = "auto") -> bytes:
    """Compress ``data`` into a zling-format stream at level 0..4."""
    return _resolve(_BACKENDS_ENC, backend)(bytes(data), level)


def decode(data: bytes, backend: str = "auto") -> bytes:
    """Decompress a zling-format stream."""
    return _resolve(_BACKENDS_DEC, backend)(bytes(data))


def encode_file(src: str, dst: str, level: int = 0, backend: str = "auto") -> tuple[int, int]:
    """Compress file ``src`` to ``dst``; returns (bytes_in, bytes_out)."""
    with open(src, "rb") as f:
        data = f.read()
    out = encode(data, level, backend)
    with open(dst, "wb") as f:
        f.write(out)
    return len(data), len(out)


def decode_file(src: str, dst: str, backend: str = "auto") -> tuple[int, int]:
    """Decompress file ``src`` to ``dst``; returns (bytes_in, bytes_out)."""
    with open(src, "rb") as f:
        data = f.read()
    out = decode(data, backend)
    with open(dst, "wb") as f:
        f.write(out)
    return len(data), len(out)
