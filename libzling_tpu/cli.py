"""Command-line interface, mirroring the reference demo (demo/zling.cpp).

    python -m libzling_tpu e[0-4] [source [target]]   compress (default e0)
    python -m libzling_tpu d      [source [target]]   decompress

Defaults to stdin/stdout like the reference (demo/zling.cpp:176-192); prints
per-call throughput to stderr (DemoActionHandler analog).  Extra flags:
``--backend`` picks spec / native / pipeline / jax / tpu / auto.
"""

from __future__ import annotations

import sys
import time
import zlib

from . import api

_USAGE = """\
usage: python -m libzling_tpu <command> [source [target]] [--backend B] [--checksum]
 commands:
  e, e0..e6   compress (level 0..4 match the reference; e5/e6 are deeper
              searches producing smaller, still reference-decodable streams)
  d           decompress
 backends: auto (default), pipeline, native, spec, jax, tpu (on-device decode)
"""


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    backend = "auto"
    checksum = False
    if "--backend" in argv:
        i = argv.index("--backend")
        backend = argv[i + 1]
        del argv[i:i + 2]
    if "--checksum" in argv:
        checksum = True
        argv.remove("--checksum")
    if not argv or argv[0] in ("-h", "--help"):
        sys.stderr.write(_USAGE)
        return 0 if argv else 1

    # validate the command BEFORE opening (and truncating) any target file
    cmd = argv[0]
    is_enc = cmd == "e" or (len(cmd) == 2 and cmd[0] == "e" and cmd[1] in "0123456")
    if not (is_enc or cmd == "d"):
        sys.stderr.write(_USAGE)
        return 1
    src = open(argv[1], "rb") if len(argv) > 1 else sys.stdin.buffer
    dst = open(argv[2], "wb") if len(argv) > 2 else sys.stdout.buffer

    try:
        data = src.read()
        t0 = time.time()
        if cmd == "d":
            out = api.decode(data, backend=backend)
            verb = "decode"
        else:
            level = int(cmd[1]) if len(cmd) == 2 else 0
            out = api.encode(data, level, backend=backend)
            verb = "encode"
        dt = time.time() - t0
        dst.write(out)
        mb = len(data) / 1e6
        sys.stderr.write(
            f"{verb}: {len(data)} => {len(out)} bytes, "
            f"time={dt:.3f} sec, speed={mb / max(dt, 1e-9):.3f} MB/sec\n")
        if checksum:
            # both directions hash the UNCOMPRESSED payload so an encode's
            # checksum can be compared with the matching decode's
            plain = data if verb == "encode" else out
            sys.stderr.write(f"adler32: {zlib.adler32(plain):#010x}\n")
        return 0
    except ValueError as e:
        sys.stderr.write(f"error: {e}\n")
        return 1
    finally:
        if src is not sys.stdin.buffer:
            src.close()
        if dst is not sys.stdout.buffer:
            dst.close()


if __name__ == "__main__":
    raise SystemExit(main())
