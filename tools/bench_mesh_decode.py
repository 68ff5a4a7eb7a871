"""Benchmark the multi-device decode lane (parallel/decode_mesh.py) on the
real chip: warm end-to-end rate, per-stage split (entropy / gather /
resolve), and the crossover device count where the sharded lane passes the
fused single-core kernel.  With --record, appends a verified row to
MESH_CANONICAL_r05.json (the decode-direction hardware artifact).

Usage: python tools/bench_mesh_decode.py [--mb 24] [--group-blocks 1]\n       [--level 0] [--record]
"""

import json, pathlib, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from libzling_tpu import pipeline
from libzling_tpu.parallel import decode_mesh, mesh as pmesh
from tools.make_corpus import cached_corpus

mb = int(sys.argv[sys.argv.index("--mb") + 1]) if "--mb" in sys.argv else 24
gb = int(sys.argv[sys.argv.index("--group-blocks") + 1]) \
    if "--group-blocks" in sys.argv else 1
level = int(sys.argv[sys.argv.index("--level") + 1]) \
    if "--level" in sys.argv else 0

data = cached_corpus(100_000_000).read_bytes()[: mb * 1048576]
stream = pipeline.encode(data, level)
print(f"{len(data)} -> {len(stream)} bytes e{level}", flush=True)

mesh = pmesh.make_mesh()
t0 = time.perf_counter()
out = decode_mesh.mesh_decode(stream, mesh=mesh, group_blocks=gb)
print(f"first call: {time.perf_counter()-t0:.1f}s", flush=True)
assert out == data, "mesh decode mismatch"

best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    out = decode_mesh.mesh_decode(stream, mesh=mesh, group_blocks=gb)
    best = min(best, time.perf_counter() - t0)
assert out == data
print(f"warm: {best:.2f}s -> {len(data)/best/1e6:.2f} MB/s mesh decode "
      f"({mb} MB, group_blocks={gb})", flush=True)

# stage split (serializes the pipeline on purpose)
probe: dict = {}
t0 = time.perf_counter()
decode_mesh.mesh_decode(stream, mesh=mesh, group_blocks=gb,
                        stage_probe=probe)
tot = time.perf_counter() - t0
ent, gat, res = (probe.get(k, 0.) for k in
                 ("entropy_s", "gather_s", "resolve_s"))
print(f"stages: entropy {ent:.2f}s, gather {gat:.2f}s, resolve {res:.2f}s "
      f"(probe total {tot:.2f}s; the gather segment carries ~0.5 s/group of "
      f"probe-sync overhead through the tunnel -- an ICI gather of the "
      f"token array is ~ms on real parts)", flush=True)
print(f"resolve-bound ceiling: {len(data)/res/1e6:.2f} MB/s "
      f"(= resolve standalone)", flush=True)
# crossover D: with entropy sharded D ways and overlapped with resolve,
# lane rate ~ bytes / max(resolve, entropy/D)
for d in (1, 2, 4, 8):
    rate = len(data) / max(res, ent / d) / 1e6
    print(f"  projected D={d} (overlapped): {rate:.2f} MB/s", flush=True)

if "--record" in sys.argv:
    art = pathlib.Path("/root/repo/MESH_CANONICAL_r05.json")
    doc = json.loads(art.read_text()) if art.exists() else {}
    doc[f"tpu1_decode_e{level}_{mb}MB"] = {
        "mode": "tpu1", "direction": "decode", "bytes_in": len(stream),
        "bytes_out": len(data), "group_blocks": gb,
        "seconds_warm_e2e": round(best, 2),
        "mbps_e2e": round(len(data) / best / 1e6, 2),
        "stage_entropy_s": round(ent, 2), "stage_resolve_s": round(res, 2),
        "mbps_resolve_bound": round(len(data) / res / 1e6, 2),
        "byte_identical": True,  # asserted against the encoded corpus above
    }
    art.write_text(json.dumps(doc, indent=1))
    print("recorded to", art, flush=True)
