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


def _run_workers(outs, timeout: float):
    """Launch the 2-process run once; returns (ok, logs)."""
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, "2", str(i), str(outs[i])],
            cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
                q.wait()
            return False, ["TIMEOUT after %.0fs" % timeout] + logs
        logs.append(out.decode(errors="replace"))
    return all(p.returncode == 0 for p in procs), logs


def test_two_process_mesh_encode(tmp_path):
    # the suite's most environment-sensitive test: 2 jax.distributed
    # processes compiling an 8-device shard_map on a loaded 2-vCPU host.
    # One retry on failure/timeout (the first attempt populates the
    # persistent compile cache, so the retry is cheap), logs dumped either
    # way so a red run is diagnosable.
    outs = [tmp_path / f"stream_{i}.bin" for i in range(2)]
    ok, logs = _run_workers(outs, timeout=300)
    if not ok:
        # surface the first failure even when the retry passes: a
        # pass-after-retry must be visible in CI output, not swallowed by
        # captured stdout (advisor round 4)
        import warnings

        warnings.warn("multihost attempt 1 failed (retry passed?):\n"
                      + "\n".join(logs)[:2000], stacklevel=1)
        ok, logs = _run_workers(outs, timeout=300)
    assert ok, "\n".join(logs)
    s0, s1 = outs[0].read_bytes(), outs[1].read_bytes()
    assert s0 == s1 and len(s0) > 0


def test_elastic_group_recovery(monkeypatch):
    # a mid-stream device failure must re-encode ONLY the failed group from
    # its carried (MTF, level) snapshot: canonical bytes, completed groups'
    # device work kept, later groups back on the device path
    import numpy as np

    from libzling_tpu import spec
    from libzling_tpu.parallel import distributed as dist, mesh as pmesh
    from libzling_tpu.utils import metrics

    real = pmesh.parallel_encode_step
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected device loss")
        return real(*a, **k)

    monkeypatch.setattr(pmesh, "parallel_encode_step", flaky)
    metrics.registry.reset()
    rng = np.random.default_rng(3)
    data = (b"elastic group recovery " * 400
            + bytes(rng.integers(0, 256, 3000, dtype=np.uint8))) * 2
    out = dist.distributed_encode(data, level=1, block_size=1024,
                                  max_tokens=400, elastic=True)
    assert out == spec.encode(data, level=1, block_size=1024, max_tokens=400)
    assert spec.decode(out) == data
    snap = metrics.registry.snapshot()["counters"]
    assert snap.get("enc.group_failover") == 1
    assert calls["n"] >= 3  # the device path resumed after the failed group
