"""Benchmark on the attached accelerator.

Measures the steady-state throughput of the stage-1 device program (seed
hashing, bucket lookup + extension, popcount filtering, event compaction)
over realistic simulated WGBS reads against the tRex1 index, including the
device->host event-stream transfer.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; baseline is
the 1M 100bp SE reads/s/chip north-star target.  Each SE read is two units
(forward + reverse-complement strand), so reads/s = units/s / 2.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sim_reads(index, n_reads):
    """Simulated 100bp reads with 1% mutations + bisulfite conversion
    (deterministic)."""
    import tempfile

    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    genome = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "data", "tRex1.fa")
    d = tempfile.mkdtemp(prefix="abismal_bench_")
    simulate_reads(genome, SimConfig(
        output_prefix=os.path.join(d, "r"), n_reads=n_reads,
        mutation_rate=0.01, bs_conv=0.98, seed=1, single_end=True))
    lines = open(os.path.join(d, "r_1.fq"), "rb").read().splitlines()
    return [lines[4 * i + 1] for i in range(n_reads)]


def main():
    import __graft_entry__ as g
    from abismal_tpu.map.pipeline import (
        DeviceIndex, build_stage1, prepare_units,
    )
    from abismal_tpu.map.seeds import prep_read
    from abismal_tpu.utils.dna import revcomp_str

    index = g._tiny_index()
    dev = DeviceIndex(index)
    stage1, _ = build_stage1(128, dev.max_candidates, dev.n_index2,
                             dev.n_index3)

    unit_batch = int(os.environ.get("ABISMAL_BENCH_UNITS", "512"))
    n_iters = int(os.environ.get("ABISMAL_BENCH_ITERS", "10"))

    reads = _sim_reads(index, unit_batch // 2)
    units = []
    for r in reads:
        units.append(prep_read(r, False))
        units.append(prep_read(revcomp_str(r.decode()).encode(), True))
    preads, packed, wmask, lens = prepare_units(units, 128)
    is_ga = np.zeros(unit_batch, dtype=bool)
    is_ga[1::2] = True  # reverse-strand units use the G->A tables
    thr = ((2 * lens.astype(np.int64)) // 5).astype(np.int32)
    args = dev.tables() + (preads, packed, wmask, lens, is_ga, thr)

    # warmup: compile + the first host transfer (which establishes the
    # device->host data path)
    out = stage1(*args)
    _ = [np.asarray(x) for x in out]

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = stage1(*args)
        _ = [np.asarray(x) for x in out]
    dt = time.perf_counter() - t0

    reads_per_s = (unit_batch // 2) * n_iters / dt
    print(json.dumps({
        "metric": "stage1 seed+filter+transfer throughput, realistic 100bp "
                  "SE reads (tRex1 index, single chip)",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / 1_000_000.0, 4),
    }))


if __name__ == "__main__":
    main()
