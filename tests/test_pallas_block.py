"""Parity of the channel-first (Pallas-kernel) block-matrix math and of
the extended Pallas sweep paths (blusgs block solver, multi-species).

The Pallas LU-SGS kernel consumes the block off-diagonal / diagonal math
in channel-first form (no trailing (N, N) axes — block_jac.rows_matvec);
these tests pin that form to the assembled einsum form the lax.scan path
uses (reference: fluxJacobian.hpp:440-760, linearSolver.cpp:356-600), and
run whole iterations of the official blusgs (wallLaw) and multi-species
(supersonicMixing) cases through the kernel in Pallas interpreter mode
against the scan path.
"""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from aither_tpu.physics.models import Physics
from aither_tpu.solver import block_jac as bj
from aither_tpu.solver import implicit as imp

CASES = "/root/reference/testCases"


def _phys(ns=1, nturb=2):
    return Physics(
        ns=ns, neq=ns + 4 + nturb, thermo_model="caloricallyPerfect",
        n=tuple([2.5] * ns), R=tuple(np.linspace(0.9, 1.1, ns)),
        hf=tuple([0.0] * ns), s0=tuple([0.0] * ns),
        vib=tuple([()] * ns), turb_model="sst2003" if nturb else "none",
        visc_c1=tuple([1.458e-6] * ns), visc_s=tuple([110.4] * ns),
        cond_c1=tuple([2.495e-3] * ns), cond_s=tuple([194.0] * ns),
        molar_mass=tuple(np.linspace(0.028, 0.032, ns)),
        t_ref=288.0, mu_mix_ref=1.7894e-5, k_nondim=1.0,
        nondim_scaling=1e-4,
    )


def _rand_state(phys, shape, rng):
    q = rng.uniform(0.5, 1.5, (phys.neq,) + shape)
    q[phys.mx:phys.ie] = rng.uniform(-0.3, 0.3, (3,) + shape)
    return jnp.asarray(q)


@pytest.mark.parametrize("ns,nturb", [(1, 2), (3, 2), (3, 0)])
def test_rusanov_offdiag_channels_match_assembled(ns, nturb):
    rng = np.random.default_rng(7)
    phys = _phys(ns, nturb)
    shape = (5, 6)
    q = _rand_state(phys, shape, rng)
    du = jnp.asarray(rng.normal(size=(phys.neq,) + shape))
    n = rng.normal(size=(3,) + shape)
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    n = jnp.asarray(n)
    mag = jnp.asarray(rng.uniform(0.5, 2.0, shape))
    for positive in (True, False):
        jf, jt = bj.rusanov_flux_jacobian(phys, q, n, mag, positive)
        want = bj.block_matvec(jf, jt, du, phys)
        got = bj.rusanov_offdiag_matvec(phys, q, n, mag, positive, du)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("ns,nturb", [(1, 2), (3, 2)])
def test_tsl_offdiag_channels_match_assembled(ns, nturb):
    rng = np.random.default_rng(3)
    phys = _phys(ns, nturb)
    cfg = dict(viscous=True, turb_model="sst2003", diffusion="schmidt",
               schmidt=0.7, turb_schmidt=0.7, block_matrix=True)
    shape = (4, 5)
    q = _rand_state(phys, shape, rng)
    du = jnp.asarray(rng.normal(size=(phys.neq,) + shape))
    n = rng.normal(size=(3,) + shape)
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    n = jnp.asarray(n)
    mag = jnp.asarray(rng.uniform(0.5, 2.0, shape))
    dist = jnp.asarray(rng.uniform(0.1, 1.0, shape))
    mu = jnp.asarray(rng.uniform(0.5, 1.5, shape))
    mut = jnp.asarray(rng.uniform(0.0, 2.0, shape))
    f1 = jnp.asarray(rng.uniform(0.0, 1.0, shape))
    vgrad = jnp.asarray(rng.normal(size=(3, 3) + shape))
    for left in (True, False):
        vf, vt = bj.approx_tsl_jacobian(phys, cfg, q, mu, mut, f1, n, mag,
                                        dist, vgrad, left)
        want_f = np.einsum("xyab,bxy->axy", np.asarray(vf),
                           np.asarray(du[:phys.ns + 4]))
        got_f, got_t = bj.tsl_offdiag_matvec(phys, cfg, q, mu, mut, f1, n,
                                             mag, dist, vgrad, left, du)
        np.testing.assert_allclose(np.asarray(got_f), want_f,
                                   rtol=1e-11, atol=1e-13)
        if nturb:
            want_t = np.einsum("xyab,bxy->axy", np.asarray(vt),
                               np.asarray(du[phys.it:]))
            np.testing.assert_allclose(np.asarray(got_t), want_t,
                                       rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("ns,nturb", [(1, 2), (3, 2), (3, 0)])
def test_offdiagonal_block_channels_match(ns, nturb):
    """Full viscous block off-diagonal: channel form == assembled form."""
    rng = np.random.default_rng(11)
    phys = _phys(ns, nturb)
    cfg = dict(viscous=True, turb_model="sst2003" if nturb else "none",
               diffusion="schmidt", schmidt=0.7, turb_schmidt=0.7,
               block_matrix=True)
    shape = (4, 3)
    q = _rand_state(phys, shape, rng)
    du = jnp.asarray(rng.normal(size=(phys.neq,) + shape))
    n = rng.normal(size=(3,) + shape)
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    n = jnp.asarray(n)
    mag = jnp.asarray(rng.uniform(0.5, 2.0, shape))
    kw = dict(dist=jnp.asarray(rng.uniform(0.1, 1.0, shape)),
              mu=jnp.asarray(rng.uniform(0.5, 1.5, shape)),
              mut=jnp.asarray(rng.uniform(0.0, 2.0, shape)),
              f1=jnp.asarray(rng.uniform(0.0, 1.0, shape)),
              vgrad=jnp.asarray(rng.normal(size=(3, 3) + shape)))
    for positive in (True, False):
        want = imp.offdiagonal_block(phys, cfg, q, du, n, mag, positive,
                                     **kw)
        got = imp.offdiagonal_block_channels(phys, cfg, q, du, n, mag,
                                             positive, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("nturb", [0, 2])
def test_diag_mult_channels_match(nturb):
    rng = np.random.default_rng(5)
    phys = _phys(2, nturb)
    N = phys.ns + 4
    shape = (6, 7)
    inv_f = jnp.asarray(rng.normal(size=shape + (N, N)))
    inv_t = jnp.asarray(rng.normal(size=shape + (2, 2))) if nturb else None
    x = jnp.asarray(rng.normal(size=(phys.neq,) + shape))
    want = imp.diag_mult(phys, inv_f, inv_t, x)
    ch_f = jnp.moveaxis(inv_f.reshape(shape + (N * N,)), -1, 0)
    ch_t = (jnp.moveaxis(inv_t.reshape(shape + (4,)), -1, 0)
            if nturb else None)
    got = imp.diag_mult_channels(phys, ch_f, ch_t, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-14)


# ---------------------------------------------------------------------------
# whole-iteration parity: Pallas interpreter kernel vs lax.scan sweeps


def _iterate_once(case, tmp_path, sub, **cfg_over):
    from aither_tpu.solver.driver import Solver
    wd = os.path.join(str(tmp_path), sub)
    os.makedirs(wd, exist_ok=True)
    src = os.path.join(CASES, case)
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), wd)
    solver = Solver(os.path.join(wd, f"{case}.inp"), workdir=wd)
    solver.cfg.update(cfg_over)
    cfl = jnp.asarray(solver.deck.cfl(0), solver.case.dtype)
    prims, l2, linfs, mr, _ = solver._iterate(
        solver.prims, solver.cons_n, solver.cons_nm1, cfl, 0)
    return (np.sqrt(np.asarray(l2)), float(mr),
            {k: np.asarray(v) for k, v in prims.items()})


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference absent")
@pytest.mark.parametrize("case", ["wallLaw", "supersonicMixing"])
def test_pallas_sweep_iteration_parity(case, tmp_path):
    """One full nonlinear iteration of the official blusgs (wallLaw) and
    multi-species lusgs (supersonicMixing) cases: Pallas kernel
    (interpreter mode) vs lax.scan sweeps, f32.  The two paths share the
    offdiagonal/diag math but differ in layout, shift and accumulation
    structure, so agreement here validates the whole kernel packing."""
    l2_ref, mr_ref, prims_ref = _iterate_once(case, tmp_path, "scan",
                                              no_pallas=True)
    l2_pal, mr_pal, prims_pal = _iterate_once(case, tmp_path, "pallas",
                                              pallas_interpret=True)
    np.testing.assert_allclose(l2_pal, l2_ref, rtol=1e-10)
    assert mr_pal == pytest.approx(mr_ref, rel=1e-9, abs=1e-20)
    for k in prims_ref:
        np.testing.assert_allclose(prims_pal[k], prims_ref[k], rtol=1e-9,
                                   atol=1e-12)
