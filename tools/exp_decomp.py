"""Perf experiment: decomposed sub-blocks vs direction-sequencing barrier
on the big rae2822 extrusions (dev tool; round-5 verdict items 3-4).

Hypothesis: bounding the scheduler's working set per SUB-BLOCK (the
reference's own decomposition, parallel.cpp:95-178) beats the
whole-direction optimization_barrier at multi-million cells, and the
same-shape k-stacked group sweep cuts the hyperplane count per sweep.

    python tools/exp_decomp.py --nk 213 --nproc 4 [--seq 0|1] [--n 8]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import numpy as np
    return float(np.asarray(x).ravel()[0])


def main():
    import jax

    nk = 48
    nproc = 1
    n = 8
    seq = None
    argv = sys.argv
    if "--nk" in argv:
        nk = int(argv[argv.index("--nk") + 1])
    if "--nproc" in argv:
        nproc = int(argv[argv.index("--nproc") + 1])
    if "--n" in argv:
        n = int(argv[argv.index("--n") + 1])
    if "--seq" in argv:
        seq = argv[argv.index("--seq") + 1] != "0"

    from bench import _extruded_case
    t0 = time.perf_counter()
    big = _extruded_case(nk=nk, nproc=nproc)
    if seq is not None:
        big.cfg["seq_directions"] = seq
    print(f"setup {time.perf_counter() - t0:.1f}s; cells "
          f"{big.case.total_cells}; blocks "
          f"{[(b.ni, b.nj, b.nk) for b in big.case.blocks]}; "
          f"seq_directions={big.cfg['seq_directions']}", flush=True)

    bp, bcn, bcm = dict(big.prims), big.cons_n, big.cons_nm1
    bcfl = big.deck.cfl(0)
    t0 = time.perf_counter()
    ob = big._iterate(bp, bcn, bcm, bcfl, 0)
    jax.block_until_ready(ob[0])
    print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(2):
        ob = big._iterate(ob[0], bcn, bcm, bcfl, 0)
    jax.block_until_ready(ob[0])
    pb = ob[0]

    def window(m, pb):
        t0 = time.perf_counter()
        for _ in range(m):
            pb, bl2, *_ = big._iterate(pb, bcn, bcm, bcfl, 0)
        _sync(bl2)
        return time.perf_counter() - t0, pb, bl2

    rates = []
    for _ in range(3):
        t_lo, pb, _ = window(max(n // 4, 1), pb)
        t_hi, pb, bl2 = window(n + max(n // 4, 1), pb)
        rates.append(n / (t_hi - t_lo))
    rates.sort()
    import numpy as np
    assert np.all(np.isfinite(np.asarray(bl2))), "non-finite residuals"
    cells = big.case.total_cells
    print(json.dumps({
        "nk": nk, "nproc": nproc, "seq": big.cfg["seq_directions"],
        "iters_per_sec": round(rates[1], 3),
        "Mcell_iters_per_sec": round(rates[1] * cells / 1e6, 2),
        "spread": [round(rates[0], 3), round(rates[-1], 3)]}))


if __name__ == "__main__":
    main()
