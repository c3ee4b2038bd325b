"""Index-construction parity: the serialized index must be byte-identical to
the reference's (golden md5 from the upstream test suite)."""

import os

import numpy as np

from tests.conftest import CACHE, GOLDEN, md5_file


def test_index_md5(trex1_index):
    # trex1_index fixture asserts the md5 on build; verify the cached file
    want = open(os.path.join(GOLDEN, "tRex1.idx.md5")).read().strip()
    assert md5_file(os.path.join(CACHE, "tRex1.idx")) == want


def test_index_roundtrip(trex1_index, tmp_path):
    from abismal_tpu.index.serialize import read_index, write_index

    p = tmp_path / "rt.idx"
    write_index(trex1_index, str(p))
    idx2 = read_index(str(p))
    assert idx2.cl.names == trex1_index.cl.names
    for name in ("counter", "counter_t", "counter_a", "index", "index_t",
                 "index_a", "genome_words"):
        assert np.array_equal(getattr(idx2, name), getattr(trex1_index, name))


def test_chrom_lookup(trex1_index):
    cl = trex1_index.cl
    assert cl.names[0] == "pad_start" and cl.names[-1] == "pad_end"
    assert cl.names[1:3] == ["chr1", "chr2"]
    ok, idx, off = cl.get_chrom_idx_and_offset_checked(32767 + 100, 100)
    assert ok and idx == 1 and off == 100
    # spanning a chromosome boundary is invalid
    ok, _, _ = cl.get_chrom_idx_and_offset_checked(32767 + 499999, 100)
    assert not ok
