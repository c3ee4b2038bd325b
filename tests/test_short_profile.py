"""ENABLE_SHORT (window_size=12) profile parity.

The reference's ./configure --enable-short build (configure.ac:69-73,
AbismalIndex.hpp:73-77) swaps window_size 20 -> 12 for short-read data;
here the equivalent is the ABISMAL_TPU_SHORT=1 import-time profile
(constants.py), which also rebuilds the native helper with -DABISMAL_SHORT.

Every md5 below was generated on 2026-08-19 by the upstream reference
binary compiled with -DENABLE_SHORT (EXTRA_FLAGS=-DENABLE_SHORT
tools/reference_oracle/build.sh): sim -single -seed 7 -n 400 -m 0.01
-b 0.98 on a 100 kb tRex1 slice, idx, then map.  The SAM hash includes the
@PG CL line, so the argv strings are fixed.

Runs in subprocesses because the profile is chosen at import time (like
the reference's compile-time flag).
"""

import hashlib
import os
import subprocess
import sys

import pytest

from tests.conftest import DATA

IDX_MD5 = "beef25d134774d3643a8883e0b300ffa"
FQ_MD5 = "19d85faf537931dfe7991c257224c258"
SAM_MD5 = "3558467b3eec7bf73610c9eedb6f6050"
MSTATS_MD5 = "2e6a4b91f1cd2d1c0fff373c37593a5a"


def _md5(p):
    return hashlib.md5(open(p, "rb").read()).hexdigest()


def _run(args, cwd):
    env = dict(os.environ, ABISMAL_TPU_SHORT="1", JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", "abismal_tpu.cli"] + args,
                       cwd=cwd, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.fixture(scope="module")
def short_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("short")
    os.makedirs(d / "tests")
    src = open(os.path.join(DATA, "tRex1.fa")).read().split("\n")
    seq = "".join(src[1:])[:100000]
    with open(d / "tests" / "g.fa", "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")
    return str(d)


def test_short_profile_sim_idx_map_parity(short_dir):
    _run(["sim", "-single", "-seed", "7", "-o", "tests/sr", "-n", "400",
          "-m", "0.01", "-b", "0.98", "tests/g.fa"], short_dir)
    assert _md5(os.path.join(short_dir, "tests/sr_1.fq")) == FQ_MD5

    _run(["idx", "tests/g.fa", "tests/g_short.idx"], short_dir)
    assert _md5(os.path.join(short_dir, "tests/g_short.idx")) == IDX_MD5

    _run(["map", "-s", "tests/sr.mstats", "-o", "tests/sr.sam", "-i",
          "tests/g_short.idx", "tests/sr_1.fq"], short_dir)
    assert _md5(os.path.join(short_dir, "tests/sr.sam")) == SAM_MD5
    assert _md5(os.path.join(short_dir, "tests/sr.mstats")) == MSTATS_MD5


def test_short_profile_rejected_by_default_build(short_dir, tmp_path):
    """A window-12 index must be refused by the default (window-20)
    profile, mirroring the reference's seed-parameter validation
    (AbismalIndex.cpp:988-1024)."""
    from abismal_tpu.index.serialize import read_index

    idx = os.path.join(short_dir, "tests", "g_short.idx")
    if not os.path.exists(idx):
        pytest.skip("parity test did not produce the index")
    with pytest.raises(Exception, match="[Ii]ncompatible|parameter"):
        read_index(idx)
