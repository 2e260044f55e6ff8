"""Nodal output parity against the reference binary.

Runs turbFlatPlate 10 iterations with ``outputNodalVariables: true`` through
BOTH the reference solver (built single-rank against tools/mpi_stub) and the
rebuild, then compares every variable of the nodal `.fun` file (and the
center file) value-by-value (VERDICT round-1 item #5; reference:
output.cpp:452-470 WriteNodeFun, procBlock.cpp:6607-6847 CellToNode).
"""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

from tests.conftest import REF_CASES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = "/tmp/aither_ref/aither"

VARS = ("density, vel_x, vel_y, vel_z, pressure, mach, temperature, sos, "
        "viscosity, turbulentViscosity, viscosityRatio, tke, sdr, f1, f2, "
        "dt, wallDistance, velGrad_ux, velGrad_uy, velGrad_vx, tempGrad_x, "
        "tempGrad_y, pressGrad_x, densityGrad_y, tkeGrad_x, omegaGrad_y, "
        "resid_mass, resid_mom_x, resid_energy, resid_tke, resid_sdr, cp, "
        "cv, energy, enthalpy")

# omega-equation quantities amplify 1-ulp state differences ~1e11x
# (documented at tests/test_regression.py turbFlatPlate tolerances), so
# everything touching sdr gets a looser bound; all else must agree to 1e-6
LOOSE = {"tke": 1e-4, "sdr": 1e-3, "resid_tke": 1e-3, "resid_sdr": 2e-2,
         "turbulentViscosity": 1e-3, "viscosityRatio": 1e-3,
         "tkeGrad_x": 1e-4, "temperature": 1e-6, "viscosity": 1e-6}

# y is the flat plate's dummy direction: every *_y derivative is exactly
# zero in exact arithmetic; omegaGrad_y's reference content is omega-
# amplified roundoff with a non-negligible scale, so it carries no signal
NOISE = {"omegaGrad_y"}


def _ensure_reference_binary():
    if os.path.isfile(REF_BIN):
        return True
    try:
        subprocess.run([os.path.join(REPO, "tools", "build_reference.sh")],
                       check=True, capture_output=True, timeout=580)
    except Exception:
        return False
    return os.path.isfile(REF_BIN)


def _prepare_deck(dstdir):
    case = os.path.join(REF_CASES, "turbFlatPlate")
    for f in os.listdir(case):
        shutil.copy(os.path.join(case, f), dstdir)
    deck = os.path.join(dstdir, "turbFlatPlate.inp")
    s = open(deck).read()
    s = re.sub(r"(?m)^iterations:.*$", "iterations: 10", s)
    s = re.sub(r"(?m)^outputFrequency:.*$", "outputFrequency: 10", s)
    s = re.sub(r"(?m)^outputVariables:.*$",
               f"outputVariables: <{VARS}>", s)
    s += "\noutputNodalVariables: true\n"
    with open(deck, "w") as f:
        f.write(s)
    return deck


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_CASES),
                    reason="reference cases absent")
def test_nodal_output_matches_reference(tmp_path):
    from aither_tpu.io.output import read_fun_file
    from aither_tpu.solver.driver import Solver

    if not _ensure_reference_binary():
        pytest.skip("reference binary unavailable")

    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()
    _prepare_deck(str(ref_dir))
    deck = _prepare_deck(str(my_dir))

    env = dict(os.environ, AITHER_INSTALL_DIRECTORY="/root/reference")
    subprocess.run([REF_BIN, "turbFlatPlate.inp"], cwd=str(ref_dir),
                   env=env, check=True, capture_output=True, timeout=580)

    Solver(deck, workdir=str(my_dir)).run(iterations=10, write_files=True)

    names = sorted(set(v.strip() for v in VARS.split(",")))
    for which in ("_10_center", "_10"):
        _, ref = read_fun_file(str(ref_dir / f"turbFlatPlate{which}.fun"))
        _, mine = read_fun_file(str(my_dir / f"turbFlatPlate{which}.fun"))
        assert len(ref) == len(mine) == 1
        for v, name in enumerate(names):
            if name in NOISE:
                continue
            r, m = ref[0][v], mine[0][v]
            scale = np.abs(r).max()
            if scale < 1e-13:      # roundoff-zero field (2D dummy dir)
                continue
            err = np.abs(r - m).max() / scale
            tol = LOOSE.get(name, 1e-6)
            assert err < tol, f"{which} {name}: relerr {err:.3e} > {tol}"
