"""2-process jax.distributed simulation of the block-DP encoder.

SURVEY.md section 4: multi-host paths must be tested via multi-process
jax.distributed on the CPU backend before real pod runs.  Two processes x
4 virtual devices form an 8-device global mesh; both must produce the
canonical stream and agree byte-for-byte.
"""

from __future__ import annotations

import pathlib
import socket
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).resolve().parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_encode(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [tmp_path / f"stream_{i}.bin" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, "2", str(i), str(outs[i])],
            cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    s0, s1 = outs[0].read_bytes(), outs[1].read_bytes()
    assert s0 == s1 and len(s0) > 0


def test_elastic_failover_to_host(monkeypatch):
    # a device-path failure must fall back to the host spec encoder with
    # IDENTICAL canonical bytes (blocks are pure functions of bytes+state)
    from libzling_tpu import spec
    from libzling_tpu.parallel import distributed as dist, mesh as pmesh

    def boom(*a, **k):
        raise RuntimeError("injected device loss")

    monkeypatch.setattr(pmesh, "mesh_encode", boom)
    data = b"elastic failover " * 200
    out = dist.distributed_encode(data, level=1, block_size=1024,
                                  max_tokens=400, elastic=True)
    assert out == spec.encode(data, level=1, block_size=1024, max_tokens=400)
    assert spec.decode(out) == data
