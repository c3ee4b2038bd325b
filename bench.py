"""Benchmark: device throughput of the stage-1 seed/filter program (the
mapping pipeline's hot path) on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the north-star target of 1M 100bp SE reads/s/chip.  Each SE read
is two units (forward + reverse strand), so reads/s = units/s / 2.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import __graft_entry__ as g
    from abismal_tpu.map.pipeline import DeviceIndex, build_stage1

    index = g._tiny_index()
    dev = DeviceIndex(index)
    stage1, _ = build_stage1(128, dev.max_candidates, dev.n_index3)

    unit_batch = int(os.environ.get("ABISMAL_BENCH_UNITS", "2048"))
    n_iters = int(os.environ.get("ABISMAL_BENCH_ITERS", "10"))
    inputs = g._unit_inputs(index, unit_batch, seed=1)

    import jax

    args = dev.tables() + inputs
    # warmup / compile
    out = stage1(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = stage1(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    units_per_s = unit_batch * n_iters / dt
    reads_per_s = units_per_s / 2.0
    print(json.dumps({
        "metric": "stage1 seed+filter device throughput (100bp SE reads/s, "
                  "tRex1 index)",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / 1_000_000.0, 4),
    }))


if __name__ == "__main__":
    main()
