"""Hybrid-engine tuning on the attached chip: wall time, process CPU time
(host-side cost), and fallback rate for the device stage-1+2 engine at
several unit_batch / pipeline_depth settings, on the 10k-read bench
workload.  High CPU/wall means the engine competes with the native shard
in split mode; low means it is tunnel-latency-bound.

Usage: python tools/tune_hybrid.py [unit_batch[,unit_batch...]] [depth]
"""

import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batches = [int(x) for x in
               (sys.argv[1] if len(sys.argv) > 1 else "2048,4096").split(",")]
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import __graft_entry__ as g
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import (
        TpuNativeEngine,
        make_tpu_native_engine_factory,
    )
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    index = g._tiny_index()
    genome = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "tRex1.fa")
    d = tempfile.mkdtemp(prefix="abismal_tune_")
    n_reads = 10000
    simulate_reads(genome, SimConfig(
        output_prefix=os.path.join(d, "r"), n_reads=n_reads,
        mutation_rate=0.01, bs_conv=0.98, seed=1, single_end=True))
    fq = os.path.join(d, "r_1.fq")
    sam = os.path.join(d, "out.sam")
    cl = "map tune"
    threads = os.cpu_count() or 1

    if depth is not None:
        TpuNativeEngine.pipeline_depth = depth

    for ub in batches:
        factory = make_tpu_native_engine_factory(unit_batch=ub,
                                                 n_threads=threads)
        t0 = time.time()
        run_map(index, fq, None, sam, None, cl, engine_factory=factory,
                threads=threads)  # warmup: compile + transfers
        warm = time.time() - t0
        best = None
        for _i in range(3):
            ru0 = resource.getrusage(resource.RUSAGE_SELF)
            t0 = time.time()
            run_map(index, fq, None, sam, None, cl, engine_factory=factory,
                    threads=threads)
            dt = time.time() - t0
            ru1 = resource.getrusage(resource.RUSAGE_SELF)
            cpu = (ru1.ru_utime - ru0.ru_utime) + (ru1.ru_stime - ru0.ru_stime)
            if best is None or dt < best[0]:
                best = (dt, cpu)
        eng = factory(index, False, 0.1, 32, 3000)
        fb = getattr(eng, "n_fallback", 0) / max(1, getattr(eng, "n_units", 1))
        print(f"unit_batch={ub} depth={TpuNativeEngine.pipeline_depth}: "
              f"{n_reads/best[0]:.0f} reads/s  wall={best[0]:.2f}s "
              f"cpu={best[1]:.2f}s ({best[1]/best[0]*100:.0f}% of wall)  "
              f"warmup={warm:.0f}s  fallback={fb:.4f}", flush=True)


if __name__ == "__main__":
    main()
