"""hg38-scale index-build proof: generate a large synthetic multi-chromosome
genome (N runs, IUPAC codes, tandem repeats), build the index with the
upstream reference binary and with abismal-tpu's streaming native build,
and compare the serialized indexes byte for byte.  Optionally sims reads
and benches mapping against the large index.

Usage:
  python tools/scale_test.py --size 1000000000 --threads 4 \
      [--oracle /tmp/oracle/abismal] [--map 20000] [--skip-oracle]
"""

import argparse
import hashlib
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_genome(path: str, total: int, seed: int = 11) -> None:
    """Streaming synthetic genome: chromosomes of ~120 Mb with interior N
    runs, occasional IUPAC ambiguity codes, and tandem repeats."""
    import numpy as np

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    iupac = np.frombuffer(b"RYSWKM", dtype=np.uint8)
    chrom_len = 120_000_000
    written = 0
    ci = 0
    with open(path, "wb") as f:
        while written < total:
            n = int(min(chrom_len, total - written))
            ci += 1
            f.write(f">chr{ci}\n".encode())
            chunk_sz = 10_000_000
            for off in range(0, n, chunk_sz):
                m = min(chunk_sz, n - off)
                seq = bases[rng.integers(0, 4, size=m)]
                # sprinkle N runs (~1 per 2 Mb, 10..5000 bases)
                for _ in range(max(1, m // 2_000_000)):
                    s = int(rng.integers(0, max(1, m - 6000)))
                    ln = int(rng.integers(10, 5000))
                    seq[s : s + ln] = ord("N")
                # occasional IUPAC codes
                k = m // 1_000_000
                if k:
                    pos = rng.integers(0, m, size=k)
                    seq[pos] = iupac[rng.integers(0, 6, size=k)]
                # a tandem repeat region per chunk (big buckets)
                rep = np.frombuffer(b"ACGTACGTTTAGGC" * 1500, dtype=np.uint8)
                s = int(rng.integers(0, max(1, m - rep.shape[0])))
                seq[s : s + rep.shape[0]] = rep
                # 80-col fasta lines
                pad = (-m) % 80
                if pad:
                    seq = np.concatenate([seq, np.full(pad, ord("\n"),
                                                       np.uint8)])
                lines = seq.reshape(-1, 80)
                out = np.empty((lines.shape[0], 81), dtype=np.uint8)
                out[:, :80] = lines
                out[:, 80] = ord("\n")
                data = out.tobytes()
                if pad:
                    data = data[: -(pad + 1)] + b"\n"
                f.write(data)
            written += n


def md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 24), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1_000_000_000)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--dir", default="/tmp/abismal_scale")
    ap.add_argument("--oracle", default="/tmp/oracle/abismal")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--map", type=int, default=0,
                    help="simulate and map N reads against the built index")
    a = ap.parse_args()

    os.makedirs(a.dir, exist_ok=True)
    fa = os.path.join(a.dir, f"scale_{a.size}.fa")
    if not os.path.exists(fa):
        print(f"[generating {a.size / 1e9:.2f} Gb genome]", flush=True)
        t0 = time.monotonic()
        gen_genome(fa, a.size)
        print(f"[generated in {time.monotonic() - t0:.0f}s]", flush=True)

    ours = os.path.join(a.dir, "ours.idx")
    t0 = time.monotonic()
    from abismal_tpu.index.build import create_index
    from abismal_tpu.index.serialize import write_index

    idx = create_index(fa, verbose=True, n_threads=a.threads)
    t_build = time.monotonic() - t0
    write_index(idx, ours)
    print(f"[abismal-tpu native build: {t_build:.0f}s "
          f"({a.size / t_build / 1e6:.0f} Mb/s, {a.threads} threads)]",
          flush=True)
    ours_md5 = md5(ours)
    print(f"[ours md5: {ours_md5}]", flush=True)

    if not a.skip_oracle:
        if not os.path.exists(a.oracle):
            subprocess.run(
                ["bash", os.path.join(os.path.dirname(__file__),
                                      "reference_oracle", "build.sh"),
                 os.path.dirname(a.oracle)], check=True)
        ref = os.path.join(a.dir, "ref.idx")
        t0 = time.monotonic()
        subprocess.run([a.oracle, "idx", "-t", str(a.threads), fa, ref],
                       check=True)
        t_ref = time.monotonic() - t0
        ref_md5 = md5(ref)
        print(f"[reference build: {t_ref:.0f}s; md5: {ref_md5}]", flush=True)
        print("INDEX PARITY:", "OK" if ref_md5 == ours_md5 else "MISMATCH",
              flush=True)

    if a.map:
        from abismal_tpu.map.native_engine import (
            NativeMappingEngine, run_map_pipelined,
        )
        from abismal_tpu.sim.simreads import SimConfig, simulate_reads

        pre = os.path.join(a.dir, "r")
        simulate_reads(fa, SimConfig(
            output_prefix=pre, n_reads=a.map, mutation_rate=0.01,
            bs_conv=0.98, seed=1, single_end=True))
        sam = os.path.join(a.dir, "out.sam")
        eng = NativeMappingEngine(idx, n_threads=a.threads)
        t0 = time.monotonic()
        run_map_pipelined(eng, idx, pre + "_1.fq", None, sam, "scale bench")
        dt = time.monotonic() - t0
        print(f"[cold map: {a.map} reads in {dt:.1f}s = {a.map / dt:.0f} "
              f"reads/s, native engine, {a.threads} threads]", flush=True)
        t0 = time.monotonic()
        run_map_pipelined(eng, idx, pre + "_1.fq", None, sam, "scale bench")
        dt = time.monotonic() - t0
        print(f"[steady-state map: {a.map / dt:.0f} reads/s]", flush=True)
        n_fb = getattr(eng, "n_fallback", None)
        if n_fb is not None:
            print(f"[fallback units: {n_fb}]", flush=True)


if __name__ == "__main__":
    main()
