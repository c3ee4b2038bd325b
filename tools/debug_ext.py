"""Debug harness: diff the device LCP-window seed extension against the
host oracle (_find_candidates_two/_find_candidates_three) per cell."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tests.test_extension as TE
from abismal_tpu.constants import KEY_WEIGHT, KEY_WEIGHT_THREE, WINDOW_SIZE
from abismal_tpu.index.build import create_index
from abismal_tpu.map.engine import strand_code
from abismal_tpu.map.pipeline import (
    DeviceIndex, _make_core, o_spec_for, prepare_units, auto_cand_budget,
)
from abismal_tpu.map.seeds import (
    SeedIndexView, _find_candidates_three, _find_candidates_two,
    get_conv_is_ga, prep_read,
)


def main():
    import tempfile

    d = tempfile.mkdtemp()
    fa = os.path.join(d, "ext.fa")
    seq, marks = TE._mk_genome(fa)
    index = create_index(fa)
    view = SeedIndexView(index)
    dev = DeviceIndex(index)

    rng = np.random.default_rng(1)
    reads = TE._reads_for(seq, marks, rng)
    B = 32
    reads = (reads + reads)[:B]
    lmax = 128
    sc = strand_code("+", False)
    a_rich = False
    units = [prep_read(r, a_rich) for r in reads]
    pnib, lens = prepare_units(units, lmax)
    is_ga_np = np.array([get_conv_is_ga(sc)] * len(units))

    cpu = auto_cand_budget(dev.n_index2, dev.n_index3, lmax)
    core, o_spec = _make_core(lmax, dev.max_candidates, dev.n_index2,
                              dev.n_index3, cpu, tp=False, cut="extdbg",
                              ext_iters=dev.ext_iters)
    import jax
    out = jax.jit(core)(*dev.tables(), pnib, lens, is_ga_np,
                        np.zeros(B, np.int32))
    out = {k: np.asarray(v) for k, v in out.items()}
    print("ext_fb:", out["ext_fb"].astype(int))

    max_c = index.max_candidates
    nbad = 0
    for i, u in enumerate(units):
        n = u.shape[0]
        lim = min(max(WINDOW_SIZE, n >> 1), o_spec)
        ga = bool(is_ga_np[i])
        for off in range(lim):
            # two-letter
            s, e = int(out["s2"][i, off]), int(out["e2"][i, off])
            if e - s > max_c:
                p, lo, hi = _find_candidates_two(view, u, off, n - off, s, e)
                dl2, ds, de = (int(out["l2"][i, off]), int(out["s2x"][i, off]),
                               int(out["e2x"][i, off]))
                if (p, lo, hi) != (dl2 - (KEY_WEIGHT - KEY_WEIGHT), ds, de) or dl2 != p:
                    if nbad < 20:
                        print(f"2L unit={i} off={off} host(p,lo,hi)="
                              f"({p},{lo},{hi}) dev=({dl2},{ds},{de}) "
                              f"init=({s},{e})")
                    nbad += 1
            # three-letter
            s, e = int(out["s3"][i, off]), int(out["e3"][i, off])
            if e - s > max_c:
                p, lo, hi = _find_candidates_three(view, u, off, n - off, s,
                                                   e, ga)
                dl3, ds, de = (int(out["l3"][i, off]), int(out["s3x"][i, off]),
                               int(out["e3x"][i, off]))
                if dl3 != p or ds != lo or de != hi:
                    if nbad < 20:
                        print(f"3L unit={i} off={off} host(p,lo,hi)="
                              f"({p},{lo},{hi}) dev=({dl3},{ds},{de}) "
                              f"init=({s},{e})")
                    nbad += 1
    print("nbad:", nbad)


if __name__ == "__main__":
    main()
