"""White-Christoph law-of-the-wall, vectorized over wall-face slabs.

Replicates the reference wall-function treatment (reference:
src/wallLaw.cpp:31-290, include/wallLaw.hpp:34-121): given the
wall-adjacent interior state, wall distance, and outward unit normal,
iteratively solve for y+ with Ridder's method (reference:
include/utility.hpp:130-184, bracket [10, 1e4], tol 1e-8) on

    y+ = u+ + y+White - y0+ (1 + ku + (ku)^2/2 + (ku)^3/6)

and derive wall shear stress, heat flux, eddy viscosity, and the k/omega
wall values used by the ghost states (Nichols & Nelson 2004).

Everything here operates on (...)-shaped face slabs so the whole wall
patch solves as one vectorized fixed-iteration Ridder loop on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics.models import Physics
from . import state as st

YPLUS_LO = 1.0e1
YPLUS_HI = 1.0e4
RIDDER_TOL = 1.0e-8
RIDDER_ITERS = 60


def _wall_props(phys: Physics, t_wall, p_int, mf):
    """rhoW, muW, kW at the wall temperature (reference:
    wallLaw.cpp:239-246; EffectiveViscosity includes NondimScaling,
    transport.cpp:166-170)."""
    scaling = phys.nondim_scaling
    rho_w = phys.density_tp(t_wall, p_int, mf)
    mu_w = scaling * phys.viscosity(t_wall, mf)
    k_w = scaling * phys.conductivity(t_wall, mf)
    return rho_w, mu_w, k_w


def solve_wall_law(phys: Physics, cfg, interior, norm, wall_dist,
                   von_karmen=0.41, wall_const=5.5, t_wall=None,
                   heat_flux=None, vel_wall=(0.0, 0.0, 0.0)):
    """Solve the wall law on a slab of wall-adjacent interior states.

    interior: (neq, ...) wall-adjacent primitive states
    norm: (3, ...) outward unit normals; wall_dist: (...) distances.
    t_wall / heat_flux: isothermal or constant-heat-flux variants
    (reference: wallLaw.cpp:89-200); both None = adiabatic.

    Returns dict of face slabs: t, rho, mu, mut, u_star, yplus, tau (3,...),
    q (heat flux), tke, sdr, low_re (y+ < 10 switch mask).
    """
    ns = phys.ns
    mf = interior[:ns] / st.rho(phys, interior)[None]
    vw = jnp.asarray(vel_wall, interior.dtype)[:, None, None] \
        if interior.ndim == 3 else jnp.asarray(vel_wall, interior.dtype)
    vel = st.velocity(phys, interior) - vw
    vel_tan = vel - (vel * norm).sum(axis=0)[None] * norm
    u_tan = jnp.sqrt((vel_tan * vel_tan).sum(axis=0))
    u_tan = jnp.maximum(u_tan, 1.0e-30)
    t_int = st.temperature(phys, interior)
    p_int = st.pressure(phys, interior)
    cp = phys.mix(phys.species_cp(t_int), mf)
    # recovery factor = Pr^(1/3) with Pr = 4g/(9g-5) (reference:
    # wallLaw.cpp:287-290, thermodynamic.hpp:61-64)
    gam = phys.gamma(t_int, mf)
    pr = 4.0 * gam / (9.0 * gam - 5.0)
    rf = pr ** (1.0 / 3.0)
    yplus0 = jnp.exp(-von_karmen * wall_const)
    scaling = phys.nondim_scaling

    adiabatic = t_wall is None and heat_flux is None
    isothermal = t_wall is not None

    if adiabatic:
        tw = t_int + 0.5 * rf * u_tan * u_tan / cp
    elif isothermal:
        tw = jnp.broadcast_to(jnp.asarray(t_wall, u_tan.dtype), u_tan.shape)
    else:
        tw = t_int  # initial guess, updated in the residual function

    def fres(yplus, tw_c):
        """Wall-law residual at y+ (reference: wallLaw.cpp:54-65,110-124,
        166-179).  Returns (residual, state-dict)."""
        rho_w, mu_w, k_w = _wall_props(phys, tw_c, p_int, mf)
        uplus = wall_dist * rho_w * u_tan / (mu_w * yplus)
        u_star = u_tan / uplus
        tw_new = tw_c
        if adiabatic or isothermal:
            q_w = jnp.zeros_like(u_tan)
            gamma = rf * u_star * u_star / (2.0 * cp * tw_c)
            if isothermal:
                q_w = ((t_int / tw_c - 1.0 + gamma * uplus * uplus) / uplus
                       ) * (rho_w * tw_c * k_w * u_star) / mu_w
        else:
            q_w = jnp.broadcast_to(jnp.asarray(heat_flux, u_tan.dtype),
                                   u_tan.shape)
            tw_new = t_int + rf * u_star * u_star * uplus * uplus / (
                2.0 * cp + q_w * mu_w / (rho_w * k_w * u_star))
            rho_w, mu_w, k_w = _wall_props(phys, tw_new, p_int, mf)
            gamma = rf * u_star * u_star / (2.0 * cp * tw_new)
        beta = q_w * mu_w / (rho_w * tw_new * k_w * u_star)
        q = jnp.sqrt(beta * beta + 4.0 * gamma)
        phi = jnp.arcsin(-beta / q)
        yp_white = jnp.exp((von_karmen / jnp.sqrt(gamma)) * (
            jnp.arcsin(jnp.clip((2.0 * gamma * uplus - beta) / q,
                                -1.0, 1.0)) - phi)) * yplus0
        ku = von_karmen * uplus
        res = yplus - (uplus + yp_white
                       - yplus0 * (1.0 + ku + 0.5 * ku * ku
                                   + ku * ku * ku / 6.0))
        stv = dict(uplus=uplus, u_star=u_star, rho=rho_w, mu=mu_w, k=k_w,
                   tw=tw_new, q_w=q_w, gamma=gamma, beta=beta, qq=q,
                   yp_white=yp_white)
        return res, stv

    # vectorized Ridder on the bracket [10, 1e4]
    x1 = jnp.full_like(u_tan, YPLUS_LO)
    x2 = jnp.full_like(u_tan, YPLUS_HI)
    f1, _ = fres(x1, tw)
    f2, stv = fres(x2, tw)
    if not (adiabatic or isothermal):
        tw = stv["tw"]
    bracketed = jnp.sign(f1) != jnp.sign(f2)

    def ridder_body(_, carry):
        x1, f1, x2, f2, x4, done, tw_c = carry
        x3 = 0.5 * (x1 + x2)
        f3, stv3 = fres(x3, tw_c)
        if not (adiabatic or isothermal):
            tw_c = jnp.where(done, tw_c, stv3["tw"])
        denom = jnp.sqrt(jnp.abs(f3 * f3 - f1 * f2)) + 1.0e-300
        fac = jnp.sign(f1 - f2)
        x4n = x3 + (x3 - x1) * (fac * f3) / denom
        f4, _ = fres(x4n, tw_c)
        x4 = jnp.where(done, x4, x4n)
        # bracket update (reference: utility.hpp:164-175)
        c1 = jnp.sign(f4) != jnp.sign(f3)
        c2 = jnp.sign(f4) != jnp.sign(f1)
        nx1 = jnp.where(c1, x3, jnp.where(c2, x1, x4n))
        nf1 = jnp.where(c1, f3, jnp.where(c2, f1, f4))
        nx2 = jnp.where(c1, x4n, jnp.where(c2, x4n, x2))
        nf2 = jnp.where(c1, f4, jnp.where(c2, f4, f2))
        x1 = jnp.where(done, x1, nx1)
        f1 = jnp.where(done, f1, nf1)
        x2 = jnp.where(done, x2, nx2)
        f2 = jnp.where(done, f2, nf2)
        done = done | (jnp.abs(x2 - x1) <= RIDDER_TOL)
        return (x1, f1, x2, f2, x4, done, tw_c)

    import jax as _jax
    x4 = jnp.full_like(u_tan, YPLUS_HI)
    carry = (x1, f1, x2, f2, x4, ~bracketed, tw)
    x1, f1, x2, f2, x4, done, tw = _jax.lax.fori_loop(
        0, RIDDER_ITERS, ridder_body, carry)

    yplus = jnp.where(bracketed, x4, YPLUS_HI)
    _, s = fres(yplus, tw)

    # eddy viscosity from the wall law (reference: wallLaw.cpp:255-266)
    uplus, u_star = s["uplus"], s["u_star"]
    mu_w, rho_w, k_w, tw = s["mu"], s["rho"], s["k"], s["tw"]
    gamma, beta, qq, yp_white = s["gamma"], s["beta"], s["qq"], s["yp_white"]
    dyp_white = (2.0 * yp_white * von_karmen * jnp.sqrt(gamma) / qq
                 * jnp.sqrt(jnp.maximum(
                     1.0 - (2.0 * gamma * uplus - beta) ** 2 / (qq * qq),
                     0.0)))
    ku = von_karmen * uplus
    mu_int = scaling * phys.viscosity(t_int, mf)
    mut_w = mu_w * (1.0 + dyp_white
                    - von_karmen * yplus0 * (1.0 + ku + 0.5 * ku * ku)) \
        - mu_int
    mut_w = jnp.maximum(mut_w, 0.0)

    # k / omega wall values (reference: wallLaw.cpp:274-285)
    from .viscous import wall_beta, WILCOX, SST
    model = cfg["turb_model"]
    beta_star = WILCOX["beta_star"] if model == "kOmegaWilcox2006" \
        else SST["beta_star"]
    wi = scaling * 6.0 * mu_w / (wall_beta(model) * rho_w
                                 * wall_dist * wall_dist)
    wo = scaling * u_star / (jnp.sqrt(beta_star) * von_karmen * wall_dist)
    sdr_w = jnp.sqrt(wi * wi + wo * wo)
    tke_w = sdr_w * mut_w / st.rho(phys, interior) / scaling

    tau_mag = u_star * u_star * rho_w
    tau = tau_mag[None] * vel_tan / u_tan[None]

    return dict(t=tw, rho=rho_w, mu=mu_w, mut=mut_w, u_star=u_star,
                yplus=yplus, tau=tau, q=s["q_w"], tke=tke_w, sdr=sdr_w,
                low_re=yplus < 10.0)
