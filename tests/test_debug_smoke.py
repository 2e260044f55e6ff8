"""All-case debug smoke: every official reference case, 1 iteration,
--debug physicality guards armed.

Mirrors the reference harness's `-b debug` sweep (reference:
testCases/regressionTests.py:216-223 — every regression case is also run
against the debug build, whose armed FP exceptions and MSG_ASSERT
physicality checks catch NaN/negative-state bugs that a normal run rides
through).  Here the analogue is Solver(debug=True): per-iteration
positivity/finiteness guards (driver.check_physicality) across every
physics combination the suite covers — euler/NS/RANS/LES, multiblock,
multigrid, chemistry, thermally perfect, wall law, dual time.
"""

import os
import shutil

import pytest

CASES_DIR = "/root/reference/testCases"

ALL_CASES = [
    "convectingVortex", "couette", "dissociation", "multiblockCylinder",
    "rae2822", "shockTube", "subsonicCylinder", "supersonicMixing",
    "supersonicWedge", "thermallyPerfect", "transonicBump",
    "turbFlatPlate", "uniformFlow", "viscousFlatPlate", "wallLaw",
]


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES_DIR),
                    reason="reference cases absent")
@pytest.mark.parametrize("case", ALL_CASES)
def test_debug_one_iteration(case, tmp_path):
    from aither_tpu.solver.driver import Solver
    src = os.path.join(CASES_DIR, case)
    for f in os.listdir(src):
        if os.path.isfile(os.path.join(src, f)):
            shutil.copy(os.path.join(src, f), tmp_path)
    deck = os.path.join(str(tmp_path), f"{case}.inp")
    solver = Solver(deck, workdir=str(tmp_path), debug=True)
    solver.run(iterations=1, write_files=False, chunk=0)
    resid = os.path.join(str(tmp_path), f"{case}.resid")
    with open(resid) as f:
        lines = [ln for ln in f.readlines()[1:] if ln.strip()]
    assert lines, f"{case}: no residual rows written"
    row = lines[-1].split()
    assert all(v == v for v in map(float, row[3:8]))  # finite check
