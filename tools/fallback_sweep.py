"""Device-fallback sensitivity sweep (SURVEY north-star robustness):
measures the fused stage-1+2 fallback fraction vs mutation rate, read
length, and a repeat-rich genome, md5-verifying each run against the
exact host engine.  Writes one JSON line per config.

A fallback unit is remapped exactly on the host, so the fraction is a
throughput (not correctness) metric: a spike hands work back to the CPU.

Usage: python tools/fallback_sweep.py [n_reads] [out.json]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def repeat_genome(path, rng):
    """tRex1-sized genome with 30% tandem/segmental repeat content."""
    import numpy as np

    parts = [rng.choice(list("ACGT"), size=200_000)]
    unit = "".join(rng.choice(list("ACGT"), size=171))
    parts.append(np.array(list(unit * 800)))  # 137 kb tandem block
    seg = "".join(rng.choice(list("ACGT"), size=2000))
    for _ in range(60):  # 120 kb of diverged segmental duplications
        s = np.array(list(seg))
        mut = rng.random(len(s)) < 0.03
        s[mut] = rng.choice(list("ACGT"), size=int(mut.sum()))
        parts.append(s)
        parts.append(rng.choice(list("ACGT"), size=30))
    parts.append(rng.choice(list("ACGT"), size=400_000))
    seq = "".join("".join(p) for p in parts)
    with open(path, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")


def run_one(index, fq, lmax, threads):
    import hashlib

    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import (
        make_native_engine_factory, make_tpu_native_engine_factory,
    )

    d = tempfile.mkdtemp(prefix="abismal_fb_")
    sam_n = os.path.join(d, "n.sam")
    sam_t = os.path.join(d, "t.sam")
    run_map(index, fq, None, sam_n, None, "map",
            engine_factory=make_native_engine_factory(n_threads=threads),
            threads=threads)
    tf = make_tpu_native_engine_factory(n_threads=threads, lmax=lmax)
    run_map(index, fq, None, sam_t, None, "map", engine_factory=tf,
            threads=threads)
    eng = tf(index, False, 0.1, 32, 3000)
    ok = (hashlib.md5(open(sam_n, "rb").read()).hexdigest()
          == hashlib.md5(open(sam_t, "rb").read()).hexdigest())
    n_units = max(1, getattr(eng, "n_units", 1))
    return getattr(eng, "n_fallback", 0) / n_units, ok


def main():
    import numpy as np

    from abismal_tpu.index.build import create_index
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fallback_sweep.json"
    threads = os.cpu_count() or 1
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trex = os.path.join(here, "tests", "data", "tRex1.fa")

    rng = np.random.default_rng(9)
    d = tempfile.mkdtemp(prefix="abismal_fbg_")
    rep_fa = os.path.join(d, "rep.fa")
    repeat_genome(rep_fa, rng)

    results = []
    genomes = {"tRex1": (trex, None), "repeat30": (rep_fa, None)}
    idx_cache = {}
    for gname, (fa, _) in genomes.items():
        idx_cache[gname] = create_index(fa)

    def sweep(gname, mut, flen, lmax):
        fq_d = tempfile.mkdtemp(prefix="abismal_fbr_")
        simulate_reads(genomes[gname][0], SimConfig(
            output_prefix=os.path.join(fq_d, "r"), n_reads=n_reads,
            mutation_rate=mut, bs_conv=0.98, seed=3, single_end=True,
            read_length=flen, min_frag_len=flen,
            max_frag_len=max(flen, 250)))
        fb, ok = run_one(idx_cache[gname], os.path.join(fq_d, "r_1.fq"),
                         lmax, threads)
        rec = {"genome": gname, "mutation": mut, "read_len": flen,
               "lmax": lmax, "fallback_frac": round(fb, 5), "md5_ok": ok}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    for mut in (0.0, 0.01, 0.02, 0.03, 0.05):
        sweep("tRex1", mut, 100, 128)
    for flen in (150, 250):
        sweep("tRex1", 0.01, flen, 256)
    sweep("repeat30", 0.01, 100, 128)
    sweep("repeat30", 0.03, 100, 128)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
