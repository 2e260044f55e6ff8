"""Inviscid flux functions, vectorized over faces.

All functions take left/right primitive states of shape (neq, ...) and a
unit face-normal array of shape (3, ...), returning the flux (neq, ...) per
unit area.  Math follows the reference formulas (reference:
include/inviscidFlux.hpp:128-562) re-expressed as array ops — exactly the
shape XLA fuses well on TPU (pure elementwise VPU work, no gathers).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics.models import Physics
from . import state as st

ENTROPY_FIX = 0.1  # Harten entropy fix threshold (inviscidFlux.hpp:298)


def physical_flux(phys: Physics, q, n):
    """F(q)·n per unit area (reference: inviscidFlux.hpp:128-159)."""
    vel = st.velocity(phys, q)
    vn = (vel * n).sum(axis=0)
    r = st.rho(phys, q)
    p = st.pressure(phys, q)
    h0 = st.enthalpy(phys, q)
    parts = [q[:phys.ns] * vn[None],
             (r * vn)[None] * vel + p[None] * n,
             (r * vn * h0)[None]]
    if phys.nturb:
        parts.append((r * vn)[None] * q[phys.it:])
    return jnp.concatenate(parts, axis=0)


def _entropy_fix(ws):
    return jnp.where(ws < ENTROPY_FIX,
                     0.5 * (ws * ws / ENTROPY_FIX + ENTROPY_FIX), ws)


def roe_flux(phys: Physics, ql, qr, n):
    """Roe flux-difference splitting with Harten entropy fix
    (reference: inviscidFlux.hpp:259-382, after Blazek 4.3.3)."""
    roe = st.roe_average(phys, ql, qr)
    rho_r = st.rho(phys, roe)
    mf_r = roe[:phys.ns] / rho_r[None]
    h_r = st.enthalpy(phys, roe)
    a_r = st.sos(phys, roe)
    vel_r = st.velocity(phys, roe)
    vn_r = (vel_r * n).sum(axis=0)

    delta = qr - ql
    dvel = delta[phys.mx:phys.mx + 3]
    dvn = (dvel * n).sum(axis=0)
    dp = delta[phys.ie]
    drho = delta[:phys.ns].sum(axis=0)

    a2 = a_r * a_r
    diss = jnp.zeros_like(ql)

    # left moving acoustic wave
    ws = _entropy_fix(jnp.abs(vn_r - a_r))
    strength = (dp - rho_r * a_r * dvn) / (2.0 * a2)
    wss = ws * strength
    diss = diss.at[:phys.ns].add(wss[None] * mf_r)
    diss = diss.at[phys.mx:phys.mx + 3].add(
        wss[None] * (vel_r - a_r[None] * n))
    diss = diss.at[phys.ie].add(wss * (h_r - a_r * vn_r))
    if phys.nturb:
        diss = diss.at[phys.it:].add(wss[None] * roe[phys.it:])

    # entropy wave (species) + shear wave
    ws = jnp.abs(vn_r)
    strength_s = -dp / a2
    diss = diss.at[:phys.ns].add(
        (ws * strength_s)[None] * mf_r + ws[None] * delta[:phys.ns])
    strength = drho - dp / a2
    wss = ws * strength
    diss = diss.at[phys.mx:phys.mx + 3].add(wss[None] * vel_r)
    diss = diss.at[phys.ie].add(wss * 0.5 * (vel_r * vel_r).sum(axis=0))
    # shear wave
    wss = ws * rho_r
    diss = diss.at[phys.mx:phys.mx + 3].add(wss[None] * (dvel - dvn[None] * n))
    diss = diss.at[phys.ie].add(
        wss * ((vel_r * dvel).sum(axis=0) - vn_r * dvn))

    # right moving acoustic wave
    ws = _entropy_fix(jnp.abs(vn_r + a_r))
    strength = (dp + rho_r * a_r * dvn) / (2.0 * a2)
    wss = ws * strength
    diss = diss.at[:phys.ns].add(wss[None] * mf_r)
    diss = diss.at[phys.mx:phys.mx + 3].add(
        wss[None] * (vel_r + a_r[None] * n))
    diss = diss.at[phys.ie].add(wss * (h_r + a_r * vn_r))
    if phys.nturb:
        diss = diss.at[phys.it:].add(wss[None] * roe[phys.it:])

    # turbulence waves
    if phys.nturb:
        ws = jnp.abs(vn_r)
        strength_t = (rho_r[None] * delta[phys.it:]
                      + roe[phys.it:] * drho[None]
                      - (dp / a2)[None] * roe[phys.it:])
        diss = diss.at[phys.it:].add(ws[None] * strength_t)

    fl = physical_flux(phys, ql, n)
    fr = physical_flux(phys, qr, n)
    return 0.5 * (fl + fr - diss)


def ausm_flux(phys: Physics, ql, qr, n):
    """AUSMPW+ flux (Kim, Kim & Rho 1998)
    (reference: inviscidFlux.hpp:384-481)."""
    vel_l = st.velocity(phys, ql)
    vel_r = st.velocity(phys, qr)
    vnl = (vel_l * n).sum(axis=0)
    vnr = (vel_r * n).sum(axis=0)
    sos_l = st.sos(phys, ql)
    sos_r = st.sos(phys, qr)
    sos_star = jnp.sqrt(sos_l * sos_r)

    vbar = 0.5 * (vnl + vnr)
    sos = jnp.where(
        vbar < 0.0, sos_star * sos_star / jnp.maximum(vnr, sos_star),
        jnp.where(vbar > 0.0,
                  sos_star * sos_star / jnp.maximum(vnl, sos_star), sos_star))

    ml = vnl / sos
    mr = vnr / sos

    m_plus = jnp.where(jnp.abs(ml) <= 1.0, 0.25 * (ml + 1.0) ** 2,
                       0.5 * (ml + jnp.abs(ml)))
    m_minus = jnp.where(jnp.abs(mr) <= 1.0, -0.25 * (mr - 1.0) ** 2,
                        0.5 * (mr - jnp.abs(mr)))
    p_plus = jnp.where(jnp.abs(ml) <= 1.0,
                       0.25 * (ml + 1.0) ** 2 * (2.0 - ml),
                       0.5 * (1.0 + jnp.sign(ml)))
    p_minus = jnp.where(jnp.abs(mr) <= 1.0,
                        0.25 * (mr - 1.0) ** 2 * (2.0 + mr),
                        0.5 * (1.0 - jnp.sign(mr)))

    pl = st.pressure(phys, ql)
    pr = st.pressure(phys, qr)
    ps = p_plus * pl + p_minus * pr
    w = 1.0 - jnp.minimum(pl / pr, pr / pl) ** 3
    fl_ = jnp.where(jnp.abs(ml) < 1.0, pl / ps - 1.0, 0.0)
    fr_ = jnp.where(jnp.abs(mr) < 1.0, pr / ps - 1.0, 0.0)

    mavg = m_plus + m_minus
    m_plus_bar = jnp.where(
        mavg >= 0.0, m_plus + m_minus * ((1.0 - w) * (1.0 + fr_) - fl_),
        m_plus * w * (1.0 + fl_))
    m_minus_bar = jnp.where(
        mavg >= 0.0, m_minus * w * (1.0 + fr_),
        m_minus + m_plus * ((1.0 - w) * (1.0 + fl_) - fr_))

    def side(q, mbar, psplit, vel):
        v = mbar * sos
        r = st.rho(phys, q)
        p = st.pressure(phys, q)
        h0 = st.enthalpy(phys, q)
        parts = [q[:phys.ns] * v[None],
                 (r * v)[None] * vel + (psplit * p)[None] * n,
                 (r * v * h0)[None]]
        if phys.nturb:
            parts.append((r * v)[None] * q[phys.it:])
        return jnp.concatenate(parts, axis=0)

    return (side(ql, m_plus_bar, p_plus, vel_l)
            + side(qr, m_minus_bar, p_minus, vel_r))


def rusanov_flux(phys: Physics, ql, qr, n, positive: bool):
    """Rusanov flux (reference: inviscidFlux.hpp:508-538)."""
    sr_l = jnp.abs((st.velocity(phys, ql) * n).sum(0)) + st.sos(phys, ql)
    sr_r = jnp.abs((st.velocity(phys, qr) * n).sum(0)) + st.sos(phys, qr)
    fac = -1.0 if positive else 1.0
    spec = fac * jnp.maximum(sr_l, sr_r)
    fl = physical_flux(phys, ql, n)
    fr = physical_flux(phys, qr, n)
    return 0.5 * (fl + fr - spec[None])


def inviscid_flux(phys: Physics, ql, qr, n, scheme: str):
    if scheme == "roe":
        return roe_flux(phys, ql, qr, n)
    if scheme == "ausm":
        return ausm_flux(phys, ql, qr, n)
    raise ValueError(f"unknown inviscid flux scheme {scheme!r}")
