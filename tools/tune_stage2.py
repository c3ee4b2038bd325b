"""Tunes the fused device stage-1+2 SE path on the attached chip: sweeps
unit_batch (and optionally ABISMAL_TPU_JOBS_PER_READ via env) on the 10k-read
tRex1 benchmark set, reporting md5-verified reads/s, the device fallback
fraction and per-stage wall time.

Usage: python tools/tune_stage2.py [unit_batch ...]
"""

import hashlib
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_SAM_MD5 = "8126d46074213ad3674181f4ea4f8bd1"


def main():
    import __graft_entry__ as g
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_tpu_native_engine_factory
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    batches = [int(a) for a in sys.argv[1:]] or [2048, 8192, 16384]
    index = g._tiny_index()
    genome = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "tRex1.fa")
    d = tempfile.mkdtemp(prefix="abismal_tune_")
    simulate_reads(genome, SimConfig(
        output_prefix=os.path.join(d, "r"), n_reads=10000,
        mutation_rate=0.01, bs_conv=0.98, seed=1, single_end=True))
    fq = os.path.join(d, "r_1.fq")
    sam = os.path.join(d, "out.sam")
    threads = os.cpu_count() or 1
    cl = ("map -s tests/reads.mstats -o tests/reads.sam -i tests/tRex1.idx "
          "tests/reads_1.fq")

    for ub in batches:
        fac = make_tpu_native_engine_factory(
            n_threads=threads, unit_batch=ub, device_stage2=True)
        t0 = time.perf_counter()
        run_map(index, fq, None, sam, None, cl, engine_factory=fac,
                threads=threads)
        warm = time.perf_counter() - t0
        eng = fac(index, False, 0.1, 32, 3000)
        best = 0.0
        for _ in range(5):
            eng.stage_time = {k: 0.0 for k in eng.stage_time}
            t0 = time.perf_counter()
            run_map(index, fq, None, sam, None, cl, engine_factory=fac,
                    threads=threads)
            dt = time.perf_counter() - t0
            ok = hashlib.md5(
                open(sam, "rb").read()).hexdigest() == GOLDEN_SAM_MD5
            if ok:
                best = max(best, 10000 / dt)
        fb = eng.n_fallback / max(1, eng.n_units)
        st = {k: round(v, 3) for k, v in eng.stage_time.items()}
        print(f"unit_batch={ub}: best={best:,.0f} reads/s  warm={warm:.1f}s "
              f"fallback={fb:.3f}  stages={st}", flush=True)


if __name__ == "__main__":
    main()
