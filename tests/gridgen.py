"""Generated test cases that the reference suite lacks.

The reference testCases/ tree has no rotational-periodic or heat-flux
time-marched case, so these are built locally and their goldens come
from the locally-built reference binary (tools/build_reference.sh; same
protocol as the 4-proc and model-variant goldens in test_regression.py).
"""

import os

import numpy as np


ANNULAR_DECK = """\
# annular sector duct: rotational periodic connection end-to-end
# (reference: include/inputStates.hpp:391-432 periodic rotation,
#  boundaryConditions.cpp:2218-2240 patch::Transform/Rotate)
gridName: annularSector

equationSet: euler
timeIntegration: implicitEuler
cflStart: 50.0
cflMax: 50.0
faceReconstruction: thirdOrder
limiter: minmod
iterations: 100
outputFrequency: 100
restartFrequency: 0
outputVariables: <density, vel_x, vel_y, vel_z, pressure, mach>

referenceTemperature: 288.0
referenceDensity: 1.2256

# uniform CARTESIAN velocity with an off-axis x component: NOT a steady
# state of the sector (it impinges on the curved slip walls and crosses
# the rotational periodic faces with differing states), so the periodic
# rotation machinery is exercised by a live trajectory
initialConditions: <icState(tag=-1; pressure=101300; density=1.2256; velocity=[100, 0, 500])>

matrixSolver: lusgs
matrixRelaxation: 1.0

boundaryStates: <periodic(startTag=4; endTag=5; axis=[0, 0, 1]; point=[0, 0, 0]; rotation={rot}),
                 supersonicInflow(tag=1; pressure=101300; density=1.2256; velocity=[100, 0, 500])>

#-------------------------------------------------------------
boundaryConditions: 1
# Block 0 -- Dimensions: {nip} x {njp} x {nkp}
2 2 2
# i-surfaces (inner/outer radius)
  slipWall                0    0    0  {nj}    0  {nk}    0
  slipWall              {ni} {ni}    0  {nj}    0  {nk}    0
# j-surfaces (theta faces: rotational periodic)
  periodic                0  {ni}    0    0    0  {nk}    4
  periodic                0  {ni} {nj} {nj}    0  {nk}    5
# k-surfaces (axial inflow/outflow)
  supersonicInflow        0  {ni}    0  {nj}    0    0    1
  supersonicOutflow       0  {ni}    0  {nj}  {nk} {nk}   2
"""


def make_annular_sector(dirpath, ni=16, nj=12, nk=8, theta=np.pi / 6.0):
    """Annular sector about the z axis: r in [1, 2], theta in [0, theta],
    z in [0, 1].  i = radial, j = circumferential, k = axial.  Returns
    the deck path."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from aither_tpu.io.plot3d import write_p3d

    r = np.linspace(1.0, 2.0, ni + 1)
    th = np.linspace(0.0, theta, nj + 1)
    z = np.linspace(0.0, 1.0, nk + 1)
    R, TH, Z = np.meshgrid(r, th, z, indexing="ij")
    coords = np.stack([R * np.cos(TH), R * np.sin(TH), Z], axis=-1)
    os.makedirs(dirpath, exist_ok=True)
    write_p3d(os.path.join(dirpath, "annularSector.xyz"), [coords])
    deck = ANNULAR_DECK.format(ni=ni, nj=nj, nk=nk, nip=ni + 1,
                               njp=nj + 1, nkp=nk + 1, rot=repr(theta))
    path = os.path.join(dirpath, "annularSector.inp")
    with open(path, "w") as f:
        f.write(deck)
    return path


def make_annular_wale(dirpath, iterations=10):
    """The annular sector switched to largeEddySimulation + WALE with
    viscosityRatio output.  WALE's Sd operator vanishes for pure shear
    (turbulence.cpp:967-997), so no shear-driven trajectory can
    discriminate the model; the curved off-axis flow here produces a
    nonzero mut field whose ELEMENTWISE values are the discriminating
    quantity (compared against the reference binary's .fun output)."""
    import re
    deck = make_annular_sector(dirpath)
    t = open(deck).read()
    t = re.sub(r"(?m)^equationSet: euler$",
               "equationSet: largeEddySimulation\nturbulenceModel: wale", t)
    t = re.sub(r"(?m)^iterations:.*$", f"iterations: {iterations}", t)
    t = re.sub(r"(?m)^outputFrequency:.*$",
               f"outputFrequency: {iterations}", t)
    t = re.sub(r"(?m)^outputVariables:.*$",
               "outputVariables: <density, vel_x, vel_y, vel_z, pressure, "
               "viscosityRatio>", t)
    with open(deck, "w") as f:
        f.write(t)
    return deck


def make_heatflux_couette(dirpath, heat_flux=-100000.0, iterations=100):
    """The official couette case with the stationary wall switched from
    isothermal to constant heat flux (reference: ghostStates.cpp:193-240
    isConstantHeatFlux branch).  Strongly discriminating: at -1e5 W/m^2
    every residual moves 3-9x vs the isothermal run by iteration 100."""
    import re
    import shutil
    src = "/root/reference/testCases/couette"
    os.makedirs(dirpath, exist_ok=True)
    for f in ("couette.inp", "couette.xyz"):
        shutil.copy(os.path.join(src, f), dirpath)
    path = os.path.join(dirpath, "couette.inp")
    t = open(path).read()
    t = re.sub(r"(?m)^iterations:.*$", f"iterations: {iterations}", t)
    t = re.sub(r"(?m)^outputFrequency:.*$",
               f"outputFrequency: {iterations}", t)
    t = re.sub(r"(?m)^restartFrequency:.*$",
               f"restartFrequency: {iterations}", t)
    old = "viscousWall(tag=1; temperature=288)"
    assert old in t
    t = t.replace(old, f"viscousWall(tag=1; heatFlux={heat_flux:g})")
    with open(path, "w") as f:
        f.write(t)
    return path
