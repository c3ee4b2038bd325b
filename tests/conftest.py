import gzip
import hashlib
import os
import shutil

import pytest

# Device tests run on a virtual 8-device CPU mesh; the real-TPU path is
# exercised by bench.py / the driver, not by unit tests.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
DATA = os.path.join(HERE, "data")
CACHE = "/tmp/abismal_tpu_test_cache"


def md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def golden_path(name: str, tmpdir=CACHE) -> str:
    """Decompress tests/golden/<name>.gz into the cache dir and return the
    path."""
    os.makedirs(tmpdir, exist_ok=True)
    out = os.path.join(tmpdir, name)
    src = os.path.join(GOLDEN, name + ".gz")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        with gzip.open(src, "rb") as f, open(out, "wb") as g:
            shutil.copyfileobj(f, g)
    return out


@pytest.fixture(scope="session")
def trex1_fa() -> str:
    return os.path.join(DATA, "tRex1.fa")


@pytest.fixture(scope="session")
def trex1_index(trex1_fa):
    """Session-cached AbismalIndex for tRex1 (builds once, caches the
    serialized file on disk keyed by the golden md5)."""
    from abismal_tpu.index.build import create_index
    from abismal_tpu.index.serialize import read_index, write_index

    os.makedirs(CACHE, exist_ok=True)
    want_md5 = open(os.path.join(GOLDEN, "tRex1.idx.md5")).read().strip()
    cached = os.path.join(CACHE, "tRex1.idx")
    if not (os.path.exists(cached) and md5_file(cached) == want_md5):
        idx = create_index(trex1_fa)
        write_index(idx, cached)
        assert md5_file(cached) == want_md5, "index not byte-identical"
        return idx
    return read_index(cached)
