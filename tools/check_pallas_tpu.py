"""On-TPU validation of the Pallas LU-SGS sweep kernels (all variants).

Runs one full nonlinear iteration of each case with the Pallas kernel
path and with the lax.scan path ON THE TPU and compares residual L2 —
covering the scalar (rae2822), block-matrix/blusgs (wallLaw, reference:
linearSolver.cpp:356-600) and multi-species (supersonicMixing, 3
species) kernels under real Mosaic compilation (VERDICT r2 #3).

Golden accuracy of the scan path is covered by the CPU regression
harness; kernel == scan on TPU closes the loop.

Usage:  python tools/check_pallas_tpu.py  [case ...]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ("wallLaw", "supersonicMixing", "rae2822")


def check(case):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from aither_tpu.solver.driver import Solver

    ref = f"/root/reference/testCases/{case}"
    wd = tempfile.mkdtemp(prefix=f"pallas_check_{case}_")
    for f in os.listdir(ref):
        shutil.copy(os.path.join(ref, f), wd)
    deck = os.path.join(wd, f"{case}.inp")

    t0 = time.time()
    s = Solver(deck, workdir=wd)
    cfl = jnp.asarray(s.deck.cfl(0), s.case.dtype)
    out = s._iterate(s.prims, s.cons_n, s.cons_nm1, cfl, 0)
    jax.block_until_ready(out[1])
    l2 = np.sqrt(np.asarray(out[1]))
    assert np.all(np.isfinite(l2)), f"{case}: non-finite pallas residual"

    s2 = Solver(deck, workdir=wd)
    s2.cfg["no_pallas"] = True
    out2 = s2._iterate(s2.prims, s2.cons_n, s2.cons_nm1, cfl, 0)
    l2b = np.sqrt(np.asarray(out2[1]))
    rel = float((np.abs(l2 - l2b)
                 / np.maximum(np.abs(l2b), 1e-30)).max())
    print(f"{case}: pallas vs scan max rel l2 diff {rel:.3e} "
          f"({time.time() - t0:.0f} s)")
    assert rel < 5e-4, f"{case}: pallas/scan divergence {rel}"


def main():
    import jax
    if jax.default_backend() == "cpu":
        print("needs a TPU backend; skipping")
        return 0
    for case in (sys.argv[1:] or CASES):
        check(case)
    print("PALLAS TPU CHECK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
