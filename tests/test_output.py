"""Output writers: full variable set + wall data files (reference:
output.cpp:209-560)."""

import os
import shutil

import numpy as np
import pytest

CASES = "/root/reference/testCases"


def _read_fun(path):
    with open(path, "rb") as f:
        nb = np.fromfile(f, "<i4", 1)[0]
        dims = np.fromfile(f, "<i4", 4 * nb).reshape(nb, 4)
        blocks = []
        for d in dims:
            ni, nj, nk, nv = d
            blocks.append(np.fromfile(f, "<f8", ni * nj * nk * nv
                                      ).reshape(nv, nk, nj, ni))
        return dims, blocks


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
def test_fun_and_wall_output(tmp_path):
    """couette with gradient output variables and wall output: files parse,
    variables are alphabetically ordered and dimensional."""
    import re
    from aither_tpu.solver.driver import Solver
    for f in ("couette.inp", "couette.xyz"):
        shutil.copy(os.path.join(CASES, "couette", f), str(tmp_path))
    deck = os.path.join(str(tmp_path), "couette.inp")
    text = open(deck).read()
    text = re.sub(r"(?m)^outputFrequency:.*$", "outputFrequency: 5", text)
    text = re.sub(r"(?m)^restartFrequency:.*$", "restartFrequency: 5", text)
    text = re.sub(r"(?m)^outputVariables:.*\n(\s+.*\n)*",
                  "outputVariables: <density, vel_x, pressure, temperature, "
                  "velGrad_uy, tempGrad_x, mach, dt>\n", text, count=1)
    text = text.replace(
        "outputVariables:",
        "wallOutputVariables: <yplus, shearStress, heatFlux, "
        "frictionVelocity, temperature>\noutputVariables:", 1)
    open(deck, "w").write(text)
    solver = Solver(deck, workdir=str(tmp_path))
    solver.run(iterations=5, write_files=True)

    dims, blocks = _read_fun(os.path.join(str(tmp_path),
                                          "couette_5_center.fun"))
    assert dims[0][3] == 8
    names = sorted({"density", "vel_x", "pressure", "temperature",
                    "velGrad_uy", "tempGrad_x", "mach", "dt"})
    vals = dict(zip(names, blocks[0]))
    # dimensional sanity
    assert 0.5 < vals["density"].mean() < 5.0
    assert 5.0e4 < vals["pressure"].mean() < 5.0e5
    assert 200.0 < vals["temperature"].mean() < 400.0
    assert np.abs(vals["velGrad_uy"]).max() > 1.0e3  # wall-normal shear
    assert (vals["dt"] > 0).all()

    wdims, wblocks = _read_fun(os.path.join(str(tmp_path),
                                            "couette_5_wall_center.fun"))
    assert len(wdims) == 2 and wdims[0][3] == 5
    assert os.path.isfile(os.path.join(str(tmp_path),
                                       "couette_wall_center.xyz"))
