"""One REAL execution of mesh_encode at the canonical reference geometry
(kBlockSizeIn = 16777216, kBlockSizeRolz = 262144 --
/root/reference/src/libzling.cpp:70-71), asserting byte equality against the
host pipeline (itself golden-tested against the reference binary) and
recording throughput + device memory in MESH_CANONICAL_r03.json.

Modes:
  --tpu   D=1 on the real chip, Pallas tokenizer lane (default 64 MB)
  --cpu   8-device virtual CPU mesh, XLA lane (default 128 MB); run under
          JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8
          --xla_cpu_collective_timeout_seconds=7200
          --xla_cpu_collective_call_terminate_timeout_seconds=7200
          (warn_stuck_seconds is NOT a valid flag in this XLA build
          and check-fails the process at backend init)"
          (8 canonical 16 MB tokenize loops timeshare 2 vCPUs, so a device
          can sit in the ppermute carry chain for many minutes -- the
          default CPU collective timeout kills the run mid-group)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / "build" / "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ARTIFACT = REPO / "MESH_CANONICAL_r05.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mb", type=int, default=0)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=1,
                    help="encode N times, report the best (the tunnel's "
                         "program-load cost makes every fresh process's "
                         "first call 2-6 min regardless of the persistent "
                         "cache; deployment is a persistent process)")
    ap.add_argument("--probe", action="store_true",
                    help="per-stage wall-time attribution (adds sync "
                         "fetches; numbers are for attribution, the "
                         "un-probed run is the headline)")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the host-pipeline equality check (probe "
                         "iterations)")
    args = ap.parse_args()
    if args.probe:
        import os

        os.environ["ZLT_STAGE_PROBE"] = "1"

    from tools.make_corpus import cached_corpus
    from libzling_tpu import pipeline
    from libzling_tpu.parallel import mesh as pmesh
    from libzling_tpu.tables import BLOCK_SIZE_IN, BLOCK_SIZE_ROLZ

    if args.cpu:
        mode, tokenizer = "cpu8", "xla"
        devices = jax.devices("cpu")[:8]
        mb = args.mb or 128
    else:
        mode, tokenizer = "tpu1", "pallas"
        devices = jax.devices()[:1]
        mb = args.mb or 64
    mesh = pmesh.make_mesh(np.asarray(devices))
    data = cached_corpus(100_000_000).read_bytes()[: mb * 1048576]
    print(f"{mode}: {len(data)} bytes over {len(devices)} device(s), "
          f"block={BLOCK_SIZE_IN} max_tokens={BLOCK_SIZE_ROLZ} "
          f"tokenizer={tokenizer}", flush=True)

    dt = float("inf")
    for rep in range(max(1, args.repeats)):
        if args.probe:
            pmesh.STAGE_TIMES.clear()
        t0 = time.perf_counter()
        stream = pmesh.mesh_encode(data, args.level, mesh=mesh,
                                   block_size=BLOCK_SIZE_IN,
                                   max_tokens=BLOCK_SIZE_ROLZ,
                                   tokenizer=tokenizer)
        d = time.perf_counter() - t0
        dt = min(dt, d)
        print(f"mesh_encode[{rep}]: {d:.1f}s -> {len(data)/d/1e6:.2f} MB/s, "
              f"{len(stream)} bytes", flush=True)

    if args.probe and pmesh.STAGE_TIMES:
        tot = sum(pmesh.STAGE_TIMES.values())
        for k, v in sorted(pmesh.STAGE_TIMES.items(), key=lambda kv: -kv[1]):
            print(f"  stage {k:18s} {v:7.2f}s  {v / tot * 100:5.1f}%",
                  flush=True)

    byte_identical = None
    if not args.no_verify:
        ref = pipeline.encode(data, args.level)
        assert stream == ref, "canonical-geometry mesh stream != host pipeline"
        byte_identical = True
        print("byte-identical to the host pipeline (reference-golden) PASS",
              flush=True)

    mem = None
    try:
        stats = devices[0].memory_stats()
        mem = {k: int(v) for k, v in stats.items()
               if "bytes" in k and isinstance(v, (int, float))}
    except Exception:
        pass

    rec = {
        "mode": mode, "tokenizer": tokenizer, "bytes_in": len(data),
        "bytes_out": len(stream), "level": args.level,
        "block_size": BLOCK_SIZE_IN, "max_tokens": BLOCK_SIZE_ROLZ,
        "seconds": round(dt, 2), "mbps": round(len(data) / dt / 1e6, 3),
        "byte_identical": byte_identical, "device_memory": mem,
    }
    if args.probe and pmesh.STAGE_TIMES:
        rec["stages"] = {k: round(v, 2) for k, v in pmesh.STAGE_TIMES.items()}
        rec["probed"] = True
    doc = {}
    if ARTIFACT.exists():
        doc = json.loads(ARTIFACT.read_text())
    # per-(mode, level) records: round-5 coverage ask -- e0 AND the deep
    # walk + adaptive-drop path (e4) both at canonical geometry on hardware.
    # Probed no-verify runs (the bench's scaling-model source) get their own
    # key so they never clobber a verified byte_identical row.
    key = f"{mode}_e{args.level}"
    if args.no_verify:
        key += "_probe"
    doc[key] = rec
    ARTIFACT.write_text(json.dumps(doc, indent=1))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
