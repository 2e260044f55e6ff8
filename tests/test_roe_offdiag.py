"""Unit pins for the approximateRoe implicit off-diagonal
(reference: fluxJacobian.cpp:240-330 RoeOffDiagonal, dispatched at
fluxJacobian.cpp:196-237 OffDiagonal on `inviscidFluxJacobian`).

The end-to-end behavior is golden-tested in test_regression.py
(transonicBump-approximateRoe); these tests pin the local semantics:
the flux-change form, its zero at du=0, its first-order consistency
with the true Roe flux Jacobian, the upper-sweep side swap, and the
cfg-key dispatch (rusanov default unchanged, approximateRoe routed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aither_tpu.solver import state as st
from aither_tpu.solver import implicit as imp
from aither_tpu.solver.flux import roe_flux

from test_pallas_block import _phys, _rand_state


def _face(phys, shape, rng):
    q_nb = _rand_state(phys, shape, rng)
    q_diag = _rand_state(phys, shape, rng)
    n = rng.normal(size=(3,) + shape)
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    mag = jnp.asarray(rng.uniform(0.5, 2.0, shape))
    return q_nb, q_diag, jnp.asarray(n), mag


def test_roe_offdiag_zero_update_is_zero():
    """du = 0 ⇒ the new face flux equals the old one (to the roundoff of
    the prim→cons→prim update round-trip — the reference's update path
    carries the same roundoff)."""
    rng = np.random.default_rng(5)
    phys = _phys(ns=1, nturb=0)
    q_nb, q_diag, n, mag = _face(phys, (4, 5), rng)
    du = jnp.zeros_like(q_nb)
    got = imp.roe_offdiagonal(phys, {}, q_nb, q_diag, du, n, mag, True)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-12)
    # upper sweep: the old flux keeps the off-diagonal state on the left
    # while the new flux swaps sides (the reference's asymmetry,
    # fluxJacobian.cpp:276-296), so du=0 leaves the constant side-swap
    # offset mag·(F(diag,nb) − F(nb,diag)) rather than zero
    got_up = imp.roe_offdiagonal(phys, {}, q_nb, q_diag, du, n, mag, False)
    offset = mag[None] * (roe_flux(phys, q_diag, q_nb, n)
                          - roe_flux(phys, q_nb, q_diag, n))
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(offset),
                               atol=1e-12)


@pytest.mark.parametrize("positive", [True, False])
def test_roe_offdiag_linearizes_roe_jacobian(positive):
    """For small du the flux-change form must match the true Roe-flux
    Jacobian–vector product: it IS a one-sided finite difference of the
    Roe flux in the neighbor's conservative state (the reference's whole
    point — fluxJacobian.cpp:240 'neighbor's flux change')."""
    rng = np.random.default_rng(9)
    phys = _phys(ns=1, nturb=0)
    q_nb, q_diag, n, mag = _face(phys, (3, 4), rng)

    def flux_of_cons_update(du):
        q_up = st.update_prim_with_cons(phys, q_nb, du)
        f = (roe_flux(phys, q_up, q_diag, n) if positive
             else roe_flux(phys, q_diag, q_up, n))
        return mag[None] * f

    du_dir = jnp.asarray(rng.normal(size=q_nb.shape))
    eps = 1e-6
    got = imp.roe_offdiagonal(phys, {}, q_nb, q_diag, eps * du_dir, n, mag,
                              positive)
    # exact JVP of the (side-swapped) Roe flux — the old-flux asymmetry
    # the reference carries (old flux never swaps sides) only shifts the
    # constant term, which the JVP comparison is immune to at du→0 when
    # positive=True; for the upper sweep the constant offset is real, so
    # compare against the same-form finite difference instead.
    want = jax.jvp(flux_of_cons_update, (jnp.zeros_like(du_dir),),
                   (eps * du_dir,))[1]
    if positive:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-5, atol=1e-9)
    else:
        # upper sweep: constant offset mag*(F(diag,nb) - F(nb,diag))
        offset = mag[None] * (roe_flux(phys, q_diag, q_nb, n)
                              - roe_flux(phys, q_nb, q_diag, n))
        np.testing.assert_allclose(np.asarray(got - offset),
                                   np.asarray(want), rtol=5e-5, atol=1e-9)


def test_roe_offdiag_viscous_adds_spectral_radius_term():
    """Viscous runs add only the viscous spectral radius · du (no
    inviscid sr — unlike the Rusanov form), sign-flipped on the upper
    sweep (fluxJacobian.cpp:300-325)."""
    rng = np.random.default_rng(13)
    phys = _phys(ns=1, nturb=0)
    shape = (3, 4)
    q_nb, q_diag, n, mag = _face(phys, shape, rng)
    du = jnp.asarray(0.01 * rng.normal(size=q_nb.shape))
    dist = jnp.asarray(rng.uniform(0.1, 1.0, shape))
    mu = jnp.asarray(rng.uniform(0.5, 1.5, shape))
    cfg_v = dict(viscous=True, turb_model="none")
    for positive in (True, False):
        inv = imp.roe_offdiagonal(phys, {}, q_nb, q_diag, du, n, mag,
                                  positive)
        vis = imp.roe_offdiagonal(phys, cfg_v, q_nb, q_diag, du, n, mag,
                                  positive, dist=dist, mu=mu)
        sr = imp.viscous_face_spectral_radius(phys, q_nb, mag, dist, mu)
        want = inv + (1.0 if positive else -1.0) * sr[None] * du
        np.testing.assert_allclose(np.asarray(vis), np.asarray(want),
                                   rtol=1e-12, atol=1e-14)


def test_offdiagonal_dispatch_on_cfg_key():
    """cfg['inv_flux_jac'] routes: default/rusanov unchanged,
    approximateRoe → roe_offdiagonal (fluxJacobian.cpp:196-237)."""
    rng = np.random.default_rng(21)
    phys = _phys(ns=1, nturb=0)
    q_nb, q_diag, n, mag = _face(phys, (4, 3), rng)
    du = jnp.asarray(0.01 * rng.normal(size=q_nb.shape))

    base = imp.offdiagonal_scalar(phys, {"turb_model": "none"}, q_nb, du,
                                  n, mag, True)
    got_default = imp.offdiagonal(phys, {"turb_model": "none"}, q_nb, du,
                                  n, mag, True, q_diag=q_diag)
    np.testing.assert_array_equal(np.asarray(got_default), np.asarray(base))

    cfg = {"turb_model": "none", "inv_flux_jac": "approximateRoe"}
    want = imp.roe_offdiagonal(phys, cfg, q_nb, q_diag, du, n, mag, True)
    got = imp.offdiagonal(phys, cfg, q_nb, du, n, mag, True, q_diag=q_diag)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deck_rejects_exact_jacobian(tmp_path):
    """The reference exits on any inviscidFluxJacobian other than
    rusanov/approximateRoe (fluxJacobian.cpp:230-236); the deck parser
    rejects it up front."""
    import shutil
    from aither_tpu.io.deck import parse_deck
    src = "/root/reference/testCases/transonicBump"
    for f in ("transonicBump.inp", "transonicBump.xyz"):
        shutil.copy(f"{src}/{f}", tmp_path / f)
    text = (tmp_path / "transonicBump.inp").read_text()
    text = text.replace("equationSet:",
                        "inviscidFluxJacobian: exact\nequationSet:", 1)
    (tmp_path / "transonicBump.inp").write_text(text)
    with pytest.raises(ValueError, match="inviscidFluxJacobian"):
        parse_deck(str(tmp_path / "transonicBump.inp"))
