"""utils: stream I/O, checkpoint/resume, metrics, CLI."""

import io
import subprocess
import sys

import pytest

from libzling_tpu.utils import checkpoint, metrics
from libzling_tpu.utils.io import CodecHooks, FileSink, FileSource, stream_decode, stream_encode
from libzling_tpu.tables import BLOCK_SIZE_IN

from .test_spec_vs_reference import _mixed_blob


def test_stream_io_roundtrip():
    data = _mixed_blob(80000, seed=2)
    events = []
    hooks = CodecHooks(
        on_init=lambda: events.append("init"),
        on_block=lambda i, o: events.append(("block", i, o)),
        on_done=lambda i, o, t: events.append("done"),
    )
    enc_out = io.BytesIO()
    stream_encode(FileSource(io.BytesIO(data)), FileSink(enc_out), 2, hooks=hooks)
    dec_out = io.BytesIO()
    stream_decode(FileSource(io.BytesIO(enc_out.getvalue())), FileSink(dec_out))
    assert dec_out.getvalue() == data
    assert events[0] == "init" and events[-1] == "done"


def test_checkpoint_resume_encode_decode(tmp_path):
    data = (_mixed_blob(1 << 20, seed=5) * 20)[: BLOCK_SIZE_IN + (1 << 21)]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.zlg"
    n_in, n_out = checkpoint.encode_file_resumable(str(src), str(dst), level=1)
    assert n_in == len(data)

    # the resumable stream must equal the one-shot stream
    from libzling_tpu import pipeline

    assert dst.read_bytes() == pipeline.encode(data, 1)

    back = tmp_path / "back.bin"
    checkpoint.decode_file_resumable(str(dst), str(back))
    assert back.read_bytes() == data


def test_checkpoint_actually_resumes(tmp_path, monkeypatch):
    data = (_mixed_blob(1 << 20, seed=6) * 20)[: 2 * BLOCK_SIZE_IN + 1000]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.zlg"
    ckpt = tmp_path / "ck"

    # simulate a crash after the first checkpointed group
    calls = {"n": 0}
    orig = checkpoint._write_ckpt

    def crashing(path, kind, in_off, out_off, carry):
        orig(path, kind, in_off, out_off, carry)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    monkeypatch.setattr(checkpoint, "_write_ckpt", crashing)
    with pytest.raises(KeyboardInterrupt):
        checkpoint.encode_file_resumable(str(src), str(dst), 1, str(ckpt))
    monkeypatch.setattr(checkpoint, "_write_ckpt", orig)
    assert ckpt.exists()
    checkpoint.encode_file_resumable(str(src), str(dst), 1, str(ckpt))
    assert not ckpt.exists()

    from libzling_tpu import pipeline

    assert dst.read_bytes() == pipeline.encode(data, 1)


def test_metrics_registry():
    m = metrics.Metrics()
    m.count("blocks", 3)
    with m.timer("encode"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["blocks"] == 3
    assert "encode" in snap["timers"]
    assert "blocks" in m.report()


def test_cli_roundtrip(tmp_path):
    data = _mixed_blob(30000, seed=9)
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    enc = tmp_path / "x.zlg"
    dec = tmp_path / "x.out"
    r = subprocess.run(
        [sys.executable, "-m", "libzling_tpu", "e3", str(src), str(enc)],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "libzling_tpu", "d", str(enc), str(dec)],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == data
    assert b"speed=" in r.stderr


def test_cli_errors(tmp_path):
    bad = tmp_path / "bad.zlg"
    bad.write_bytes(b"\x07not a stream")
    r = subprocess.run(
        [sys.executable, "-m", "libzling_tpu", "d", str(bad)],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 1
    assert b"error:" in r.stderr
    r = subprocess.run([sys.executable, "-m", "libzling_tpu", "frobnicate"],
                       capture_output=True, cwd="/root/repo")
    assert r.returncode == 1
