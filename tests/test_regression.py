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

IMPLICIT_CASES = {
    "subsonicCylinder": (100, [1.8751e-01, 2.6727e-01, 3.1217e-01, 7.9662e-01,
                               1.8639e-01], {3}),
    "multiblockCylinder": (100, [2.0529e-01, 3.4540e-01, 5.0153e-01,
                                 1.0180e+00, 1.9997e-01], {3}),
    "shockTube": (100, [4.8537e-01, 4.5855e-01, 1.0000e+00, 1.0000e+00,
                        2.6434e-01], {2, 3}),
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


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
@pytest.mark.parametrize("case", sorted(IMPLICIT_CASES))
def test_implicit_regression(case, tmp_path):
    iters, goldens, ignored = IMPLICIT_CASES[case]
    run_and_compare(case, iters, goldens, ignored, tmp_path)
