"""ctypes binding for the native C++ engine (engine.cpp).

The shared library is compiled on first use into build/native/ (keyed by a
hash of the source) so the package needs no install step.  Persistent
encoder/decoder handles are kept per process: reusing the engine keeps its
~22 MB of ring/MTF state pages warm, which matters because first-touch page
faults dominate one-shot codec calls on virtualized hosts.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

_SRC = pathlib.Path(__file__).with_name("engine.cpp")
_REPO = pathlib.Path(__file__).resolve().parent.parent.parent
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_ENC_HANDLE = None
_DEC_HANDLE = None


def _build() -> pathlib.Path:
    # The match-loop debug counters are compiled OUT by default, matching
    # the reference's LIBZLING_DEBUG=0 (src/libzling_debug.h:38): measured
    # cost is ~7% on e0 encode (100.2 vs 107.4 MB/s, 100 MB markov).
    # ZLT_COUNTERS=1 builds with them in (bench.py collects counters from
    # such a run); the legacy ZLT_NOCNT=1 still forces them out.
    nocnt = not (os.environ.get("ZLT_COUNTERS", "") == "1"
                 and os.environ.get("ZLT_NOCNT", "") != "1")
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src + (b"nocnt" if nocnt else b"")).hexdigest()[:16]
    out_dir = _REPO / "build" / "native"
    out_dir.mkdir(parents=True, exist_ok=True)
    lib = out_dir / f"libzlt_{tag}.so"
    if lib.exists():
        return lib
    tmp = lib.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(tmp),
    ]
    if nocnt:
        cmd.insert(5, "-DZLT_NOCNT")
    subprocess.run(cmd, check=True, capture_output=True)
    tmp.replace(lib)
    return lib


def _lib() -> ctypes.CDLL:
    global _LIB, _ENC_HANDLE, _DEC_HANDLE
    with _LOCK:
        if _LIB is None:
            dll = ctypes.CDLL(str(_build()))
            dll.zlt_encoder_new.restype = ctypes.c_void_p
            dll.zlt_decoder_new.restype = ctypes.c_void_p
            dll.zlt_encode_with.restype = ctypes.c_longlong
            dll.zlt_encode_with.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ]
            dll.zlt_decode_with.restype = ctypes.c_longlong
            dll.zlt_decode_with.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ]
            dll.zlt_encode_bound.restype = ctypes.c_size_t
            dll.zlt_encode_bound.argtypes = [ctypes.c_size_t]
            dll.zlt_decoded_size.restype = ctypes.c_longlong
            dll.zlt_decoded_size.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            _ENC_HANDLE = dll.zlt_encoder_new()
            _DEC_HANDLE = dll.zlt_decoder_new()
            _LIB = dll
    return _LIB


def encode(data: bytes, level: int = 0) -> bytes:
    if not 0 <= level <= 6:
        raise ValueError("level must be 0..6")
    dll = _lib()
    cap = dll.zlt_encode_bound(len(data))
    out = (ctypes.c_uint8 * cap)()
    with _LOCK:
        n = dll.zlt_encode_with(_ENC_HANDLE, data, len(data), level, out, cap)
    if n < 0:
        raise RuntimeError(f"zlt_encode failed ({n})")
    return ctypes.string_at(out, n)


def decode(data: bytes) -> bytes:
    dll = _lib()
    size = dll.zlt_decoded_size(data, len(data))
    if size < 0:
        raise ValueError("zling: corrupt stream (bad framing)")
    out = (ctypes.c_uint8 * max(size, 1))()
    with _LOCK:
        n = dll.zlt_decode_with(_DEC_HANDLE, data, len(data), out, size)
    if n == -1:
        raise ValueError("zling: corrupt stream")
    if n < 0:
        raise RuntimeError(f"zlt_decode failed ({n})")
    return ctypes.string_at(out, n)


def encode_into(data, out, level: int = 0) -> int:
    """Encode into a caller-provided writable buffer; returns bytes written."""
    dll = _lib()
    buf = (ctypes.c_uint8 * len(out)).from_buffer(out)
    with _LOCK:
        n = dll.zlt_encode_with(_ENC_HANDLE, bytes(data), len(data), level, buf, len(out))
    if n < 0:
        raise RuntimeError(f"zlt_encode failed ({n})")
    return n


def decode_into(data, out) -> int:
    """Decode into a caller-provided writable buffer; returns bytes written."""
    dll = _lib()
    buf = (ctypes.c_uint8 * len(out)).from_buffer(out)
    with _LOCK:
        n = dll.zlt_decode_with(_DEC_HANDLE, bytes(data), len(data), buf, len(out))
    if n == -1:
        raise ValueError("zling: corrupt stream")
    if n < 0:
        raise RuntimeError(f"zlt_decode failed ({n})")
    return n
