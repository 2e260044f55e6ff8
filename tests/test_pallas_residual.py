"""Parity of the fused viscous-residual Pallas march (pallas_residual)
against the reference JAX implementation (viscous.viscous_residual).

The kernel re-expresses the face-CV gradient / eddy-viscosity / viscous
flux math (reference: procBlock.cpp:1233-1879, :1190-1231) as a plane
march with in-plane shifts and a face carry; these tests run it in
Pallas interpreter mode (float64, CPU) on real cases and require the
full return set to match the materializing implementation.
"""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CASES = "/root/reference/testCases"


def _viscous_pair(case, tmp_path, patches=None):
    """(JAX-path outputs, march outputs) for one block of a real case."""
    import re
    from aither_tpu.solver.driver import Solver
    from aither_tpu.solver import step as step_mod
    from aither_tpu.solver import viscous as vis
    from aither_tpu.solver import pallas_residual as pres

    wd = str(tmp_path)
    os.makedirs(wd, exist_ok=True)
    src = os.path.join(CASES, case)
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), wd)
    deck = os.path.join(wd, f"{case}.inp")
    if patches:
        with open(deck) as f:
            text = f.read()
        for key, val in patches.items():
            line = f"{key}: {val}"
            if re.search(rf"(?m)^{key}:", text):
                text = re.sub(rf"(?m)^{key}:.*$", line, text)
            else:
                text = re.sub(r"(?m)^equationSet:.*$",
                              lambda mm: mm.group(0) + "\n" + line, text)
        with open(deck, "w") as f:
            f.write(text)
    solver = Solver(deck, workdir=wd)
    phys, cfg = solver.phys, solver.cfg
    cfg["pallas_interpret"] = True
    b = solver.case.blocks[0]
    assert pres.use_march(phys, cfg, b, solver.case.dtype,
                          for_prepack=True), "case must be in kernel scope"
    pres.ensure_static(phys, cfg, b, solver.case.dtype)

    prim = solver.prims[b.index]
    # realistic ghosts + a smooth perturbation so gradients are nonzero
    prim = step_mod.apply_boundary_ghosts(phys, b, prim)
    g = b.g
    shape = prim.shape[1:]
    ii, jj, kk = np.meshgrid(*[np.arange(n) for n in shape], indexing="ij")
    bump = 1.0 + 0.03 * np.sin(ii * 0.7) * np.cos(jj * 1.3) \
        * np.cos(kk * 0.9)
    prim = prim * jnp.asarray(bump)[None]
    prim = step_mod.apply_boundary_ghosts(phys, b, prim, viscous_pass=True,
                                          cfg=cfg, wall_data={})
    prim = step_mod.apply_edge_ghosts(phys, b, prim, viscous_pass=True)
    t_all = phys.temperature(prim[phys.ie], prim[:phys.ns])
    mf_all = prim[:phys.ns] / prim[:phys.ns].sum(axis=0)[None]
    mu_all = phys.viscosity(t_all, mf_all)

    want = vis.viscous_residual(phys, cfg, b, prim, t_all, mu_all,
                                wall_data={}, need_aux=False,
                                need_pgrad=False)
    got = pres.viscous_residual_march(phys, cfg, b, prim, t_all, mu_all)
    return want, got


def _check(want, got, is_rans):
    names = ("resid", "sr_flow", "sr_turb", "diag_flow", "diag_turb")
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(want[i]), rtol=1e-9,
            atol=1e-13, err_msg=name)
    ca_w, ca_g = want[5], got[5]
    keys = ["vel", "mut", "f1", "f2"] + (["tke", "omega"] if is_rans
                                         else [])
    for key in keys:
        np.testing.assert_allclose(
            np.asarray(ca_g[key]), np.asarray(ca_w[key]), rtol=1e-9,
            atol=1e-13, err_msg=f"cellavg[{key}]")


@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference absent")
def test_march_parity_laminar(tmp_path):
    """couette: laminar viscous, periodic+walls, 2-D block."""
    want, got = _viscous_pair("couette", tmp_path)
    _check(want, got, is_rans=False)


@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference absent")
def test_march_parity_sst(tmp_path):
    """turbFlatPlate: SST RANS (eddy viscosity + blending + turb flux)."""
    want, got = _viscous_pair("turbFlatPlate", tmp_path)
    _check(want, got, is_rans=True)


@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference absent")
def test_march_parity_rae2822(tmp_path):
    """rae2822: the flagship SST C-grid block (m = i march)."""
    want, got = _viscous_pair("rae2822", tmp_path)
    _check(want, got, is_rans=True)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference absent")
def test_march_parity_wilcox_and_wale(tmp_path):
    """kOmegaWilcox2006 (turbFlatPlate patched) and WALE (couette LES)."""
    want, got = _viscous_pair(
        "turbFlatPlate", tmp_path / "w",
        patches={"turbulenceModel": "kOmegaWilcox2006"})
    _check(want, got, is_rans=True)
    want, got = _viscous_pair(
        "couette", tmp_path / "l",
        patches={"equationSet": "largeEddySimulation",
                 "turbulenceModel": "wale"})
    _check(want, got, is_rans=False)
