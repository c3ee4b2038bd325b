"""Dump the optimized HLO of the fused stage-1+2 program (for mapping
trace fusion names to source stages).  Writes /tmp/stage12_hlo.txt."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from tools.trace_ops import load_workload
    from abismal_tpu.map.pipeline import build_stage12

    unit_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    eng, per, args_np = load_workload(unit_batch)
    tables = eng.dev.tables()
    prog, _ = build_stage12(eng.lmax, eng.dev.max_candidates,
                            eng.dev.n_index2, eng.dev.n_index3, per,
                            ext_iters=eng.dev.ext_iters)
    lowered = prog.lower(*tables, *args_np)
    txt = lowered.compile().as_text()
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stage12_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
