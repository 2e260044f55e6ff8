"""End-to-end regression tests against the reference golden residuals.

Mirrors the reference harness (reference: testCases/regressionTests.py):
run a case for a fixed iteration count, read the final line of the
``.resid`` file, and compare normalized L2 residuals per equation to golden
values at 1% relative tolerance, skipping per-case ignored indices.
"""

import os

import pytest

CASES = "/root/reference/testCases"

# case -> (iterations, goldens, ignored indices)
# goldens from the reference harness (see BASELINE.md)
EXPLICIT_CASES = {
    "supersonicWedge": (100, [4.1813e-01, 4.2549e-01, 3.6525e-01, 3.9971e-01,
                              4.0998e-01], {3}),
}


def run_and_compare(case, iters, goldens, ignored, tmp_path, tol=0.01):
    from aither_tpu.solver.driver import Solver
    deck = os.path.join(CASES, case, f"{case}.inp")
    solver = Solver(deck, workdir=str(tmp_path))
    solver.run(iterations=iters)
    resid_path = os.path.join(str(tmp_path), f"{case}.resid")
    with open(resid_path) as f:
        last = f.readlines()[-1].split()
    # columns: step, nl-iter, dt/cfl, then neq residuals
    neq = len(goldens)
    resids = [float(v) for v in last[3:3 + neq]]
    for i, (got, want) in enumerate(zip(resids, goldens)):
        if i in ignored:
            continue
        assert got == pytest.approx(want, rel=tol), (
            f"{case} eq {i}: {got} vs golden {want}")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
@pytest.mark.parametrize("case", sorted(EXPLICIT_CASES))
def test_explicit_regression(case, tmp_path):
    iters, goldens, ignored = EXPLICIT_CASES[case]
    run_and_compare(case, iters, goldens, ignored, tmp_path)
