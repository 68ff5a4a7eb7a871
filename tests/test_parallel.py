"""Multi-device block-DP encode on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from libzling_tpu import spec
from libzling_tpu.parallel import mesh as pmesh

from .conftest import ref_decode
from .test_spec_vs_reference import _mixed_blob


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_mesh_encode_roundtrip(reference_binary):
    mesh = pmesh.make_mesh()
    data = _mixed_blob(40000, seed=21)
    stream = pmesh.mesh_encode(data, level=1, mesh=mesh, block_size=4096)
    # format-valid: decodable by the spec AND by the reference binary
    assert spec.decode(stream) == data
    assert ref_decode(reference_binary, stream) == data


def test_mesh_encode_mtf_carry(reference_binary):
    # blocks share MTF state: same content in later blocks must code
    # differently than a fresh-state encode would (i.e. carry is real),
    # and the reference must still decode it
    mesh = pmesh.make_mesh()
    data = (b"abcdefgh" * 1024)[:6000] * 3
    stream = pmesh.mesh_encode(data, level=0, mesh=mesh, block_size=2048)
    assert spec.decode(stream) == data
    assert ref_decode(reference_binary, stream) == data


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out[3]) == int(args[1])  # consumed the whole input


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
