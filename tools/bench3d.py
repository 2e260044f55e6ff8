"""Honest 3-D throughput: chunked production run on the extruded rae2822.

Repeated same-input dispatches can be elided/memoized by the device
tunnel, so free-running ``timeit`` loops over-report.  The only trusted
protocols on this link are (a) dependent chains whose carry feeds the
next call and (b) the chunked ``run()`` scan whose ``.tme`` rows divide
wall time per chunk dispatch (outputs fetched once at the end).  This
tool reports (b) — the same methodology as the headline production
number in bench.py.

    python tools/bench3d.py [--nk 48] [--iters 30] [--chunk 10]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nk = int(sys.argv[sys.argv.index("--nk") + 1]) if "--nk" in sys.argv \
        else 48
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) \
        if "--iters" in sys.argv else 30
    chunk = int(sys.argv[sys.argv.index("--chunk") + 1]) \
        if "--chunk" in sys.argv else 10

    from bench import _extruded_case
    solver = _extruded_case(nk=nk)
    cells = solver.case.total_cells
    import io
    real = sys.stdout
    sys.stdout = io.StringIO()
    try:
        solver.run(iterations=iters, write_files=False, chunk=chunk)
    finally:
        sys.stdout = real
    with open(solver.sim_root + ".tme") as f:
        rows = [float(ln.split()[1]) for ln in f.readlines()[1:]]
    size, _ = type(solver)._pick_chunk(iters, chunk)
    per_chunk = sorted(rows[c] for c in range(size, len(rows), size))
    med = per_chunk[len(per_chunk) // 2]
    print(json.dumps({
        "metric": "rae2822_3d_chunked_ms_per_iter",
        "cells": cells,
        "ms_per_iter": round(med * 1e3, 3),
        "iters_per_sec": round(1.0 / med, 3),
        "Mcell_iters_per_sec": round(cells / med / 1e6, 2),
        "spread_ms": [round(per_chunk[0] * 1e3, 3),
                      round(per_chunk[-1] * 1e3, 3)],
    }))


if __name__ == "__main__":
    main()
