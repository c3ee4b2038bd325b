"""Stage-1 device program timing: steady-state per-batch wall time and
per-read throughput for the real accelerator, with variants to localize
the bottleneck (extension on/off, batch sizes).

Usage: python tools/profile_stage1.py [--units 1024] [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--trace", default="")
    a = ap.parse_args()

    import numpy as np
    import __graft_entry__ as g
    from abismal_tpu.map.pipeline import DeviceIndex, build_stage1, prepare_units
    from abismal_tpu.map.seeds import prep_read
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads
    import tempfile

    index = g._tiny_index()
    d = tempfile.mkdtemp(prefix="abismal_prof_")
    genome = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "tRex1.fa")
    simulate_reads(genome, SimConfig(
        output_prefix=os.path.join(d, "r"), n_reads=a.units,
        mutation_rate=0.01, bs_conv=0.98, seed=1, single_end=True))
    reads = []
    with open(os.path.join(d, "r_1.fq")) as f:
        lines = f.read().splitlines()
    for i in range(1, len(lines), 4):
        reads.append(lines[i].encode())

    dev = DeviceIndex(index)
    stage1, o_spec = build_stage1(128, dev.max_candidates, dev.n_index2,
                                  dev.n_index3)
    units = [prep_read(r, False) for r in reads[: a.units]]
    preads, lens = prepare_units(units, 128)
    is_ga = np.zeros(len(units), dtype=bool)
    thr = ((2 * lens.astype(np.int64)) // 5).astype(np.int32)
    args = (preads, lens, is_ga, thr)

    import jax

    # warmup/compile
    ev, cf = stage1(*dev.tables(), *args)
    jax.block_until_ready((ev, cf))

    if a.trace:
        with jax.profiler.trace(a.trace):
            for _ in range(3):
                out = stage1(*dev.tables(), *args)
            jax.block_until_ready(out)
        print("trace written to", a.trace)

    t0 = time.perf_counter()
    for _ in range(a.reps):
        out = stage1(*dev.tables(), *args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / a.reps
    print(f"units={a.units} noext={os.environ.get('ABISMAL_TPU_NOEXT', '0')} "
          f"cand={os.environ.get('ABISMAL_TPU_CAND_PER_UNIT', '384')}: "
          f"{dt * 1e3:.1f} ms/batch = {a.units / dt:.0f} units/s "
          f"= {a.units / dt / 2:.0f} SE reads/s")

    # host->device + device->host transfer cost alone
    t0 = time.perf_counter()
    for _ in range(a.reps):
        x = jax.device_put(preads)
        jax.block_until_ready(x)
        _ = np.asarray(ev)
    dt = (time.perf_counter() - t0) / a.reps
    print(f"transfer roundtrip (preads up + ev down): {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
