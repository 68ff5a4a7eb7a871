"""Generated constant tables must equal the reference's .inc data."""

import pathlib
import re

import numpy as np
import pytest

from libzling_tpu import tables

REF_TABLES = pathlib.Path("/root/reference/src/tables")


def _parse_inc(name: str) -> np.ndarray:
    path = REF_TABLES / name
    if not path.exists():
        pytest.skip("reference tables not available")
    text = "\n".join(line.split("//")[0] for line in path.read_text().splitlines())
    return np.asarray([int(v) for v in re.findall(r"\d+", text)])


def test_matchidx_blen():
    assert np.array_equal(tables.MATCHIDX_BLEN, _parse_inc("table_matchidx_blen.inc"))


def test_matchidx_base():
    assert np.array_equal(tables.MATCHIDX_BASE, _parse_inc("table_matchidx_base.inc"))


def test_matchidx_code():
    assert np.array_equal(tables.MATCHIDX_CODE, _parse_inc("table_matchidx_code.inc"))


def test_mtfinit():
    assert np.array_equal(tables.MTF_INIT, _parse_inc("table_mtfinit.inc"))


def test_mtfnext():
    assert np.array_equal(tables.MTF_NEXT, _parse_inc("table_mtfnext.inc"))


def test_matchidx_tables_consistent():
    # every idx in 0..4095 decodes back to itself via (code, base, extra bits)
    idx = np.arange(4096)
    code = tables.MATCHIDX_CODE[idx]
    base = tables.MATCHIDX_BASE[code]
    blen = tables.MATCHIDX_BLEN[code]
    extra = idx - base
    assert (extra >= 0).all()
    assert (extra < (1 << blen)).all()


def test_constants():
    assert tables.HUFFMAN_CODES_1 == 514
    assert tables.HUFFMAN_CODES_2 == 32
    assert tables.NUM_MATCHIDX_CODES == 32
