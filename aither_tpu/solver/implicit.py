"""Implicit linear solvers: LU-SGS (hyperplane wavefront) and DPLUR.

Reference semantics (reference: src/linearSolver.cpp:225-535,
src/procBlock.cpp:1056-1161 ImplicitLower/Upper, src/fluxJacobian.cpp
RusanovScalarOffDiagonal) with a TPU-native formulation:

 * The Gauss-Seidel recurrence couples cell (i,j,k) only to
   (i-1,j-1,k-1)-side neighbors on the forward sweep.  Skewing the block to
   hyperplane coordinates p = i+j+k turns the sweep into a first-order
   recurrence along p — implemented as one `lax.scan` whose carry is the
   previous hyperplane, with all in-plane work vectorized (the classic
   wavefront transform).  The trailing-side term uses the sweep-start du and
   is evaluated as one fused full-block pass outside the scan.
 * DPLUR is a Jacobi iteration: both sides evaluated at the old iterate,
   fully parallel (reference: linearSolver.cpp:472-535).

Scalar (LUSGS/DPLUR) approximate Jacobians only; the block-matrix variants
(BLUSGS/BDPLUR) build on the same structure with per-cell matrices.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.geometry import AX
from ..physics.models import Physics
from . import state as st
from .flux import physical_flux
from .sput import set_region


# ---------------------------------------------------------------------------
# scalar approximate off-diagonal (Rusanov):
#   0.5*|A|*(F(q+du) - F(q))·n  [turb zeroed]  ± specRad_face * du
#   (reference: fluxJacobian.cpp RusanovScalarOffDiagonal)


def face_spectral_radius(phys: Physics, q, n, mag, dist=None, mu=None,
                         mut=None, viscous=False):
    """0.5*|A|*(|v·n| + a) (+ viscous term)
    (reference: spectralRadius.hpp:66-80, 126-151)."""
    vel = st.velocity(phys, q)
    sr = 0.5 * mag * (jnp.abs((vel * n).sum(axis=0)) + st.sos(phys, q))
    if viscous:
        t = st.temperature(phys, q)
        r = st.rho(phys, q)
        mf = q[:phys.ns] / r[None]
        max_term = jnp.maximum(4.0 / (3.0 * r), phys.gamma(t, mf) / r)
        visc_term = phys.nondim_scaling * (
            mu / _prandtl(phys, t, mf)
            + (mut / phys.turb_prandtl() if mut is not None else 0.0))
        sr = sr + mag / dist * max_term * visc_term
    return sr


def _prandtl(phys, t, mf):
    g = phys.gamma(t, mf)
    return 4.0 * g / (9.0 * g - 5.0)


def offdiagonal_scalar(phys: Physics, cfg, q_nb, du_nb, n, mag, positive,
                       dist=None, mu=None, mut=None, f1=None):
    """Scalar Rusanov off-diagonal contribution of one neighbor."""
    q_up = st.update_prim_with_cons(phys, q_nb, du_nb)
    dflux = 0.5 * mag[None] * (physical_flux(phys, q_up, n)
                               - physical_flux(phys, q_nb, n))
    if phys.nturb:
        # concatenate instead of .at[].set: scatter has no Pallas lowering
        dflux = jnp.concatenate(
            [dflux[:phys.it], jnp.zeros_like(dflux[phys.it:])])
    sr = face_spectral_radius(phys, q_nb, n, mag, dist, mu, mut,
                              cfg.get("viscous", False))
    term = sr[None] * du_nb
    if phys.nturb:
        # turbulence inviscid face spectral radius (turbulence.cpp:112-120)
        vel = st.velocity(phys, q_nb)
        vn = (vel * n).sum(axis=0)
        sr_t = (0.5 * mag * jnp.abs(vn + jnp.abs(vn)) if positive
                else 0.5 * mag * jnp.abs(vn - jnp.abs(vn)))
        if cfg.get("viscous", False) and mut is not None:
            from .viscous import sigma_k
            r = st.rho(phys, q_nb)
            model = cfg["turb_model"]
            if model == "kOmegaWilcox2006":
                mutx = r * q_nb[phys.it] / q_nb[phys.it + 1]
                sk = sigma_k(model, 1.0)
            else:
                mutx = mut
                sk = sigma_k(model, f1)
            sr_t = sr_t + phys.nondim_scaling * (mag / dist) / r * (
                mu + sk * mutx)
        term = jnp.concatenate([term[:phys.it],
                                sr_t[None] * du_nb[phys.it:]])
    return dflux + term if positive else dflux - term


def offdiagonal_block(phys: Physics, cfg, q_nb, du_nb, n, mag, positive,
                      dist=None, mu=None, mut=None, f1=None, vgrad=None):
    """Block Rusanov off-diagonal: (J_rusanov(±) ∓ J_TSL)·du
    (reference: fluxJacobian.cpp RusanovBlockOffDiagonal)."""
    from . import block_jac as bj
    jf, jt = bj.rusanov_flux_jacobian(phys, q_nb, n, mag, positive)
    if cfg.get("viscous"):
        vf, vt = bj.approx_tsl_jacobian(phys, cfg, q_nb, mu, mut, f1, n, mag,
                                        dist, vgrad, left=positive)
        if positive:
            jf = jf - vf
            jt = None if jt is None else jt - vt
        else:
            jf = jf + vf
            jt = None if jt is None else jt + vt
    return bj.block_matvec(jf, jt, du_nb, phys)


def offdiagonal(phys: Physics, cfg, q_nb, du_nb, n, mag, positive, **kw):
    if cfg.get("block_matrix"):
        return offdiagonal_block(phys, cfg, q_nb, du_nb, n, mag, positive,
                                 **kw)
    kw.pop("vgrad", None)
    return offdiagonal_scalar(phys, cfg, q_nb, du_nb, n, mag, positive, **kw)


# ---------------------------------------------------------------------------
# static per-block implicit context


@dataclasses.dataclass
class ImplicitContext:
    """Per-block precomputed skew maps and masks."""

    nplanes: int
    # gather maps from padded (neq, NI, NJ, NK) to skewed (neq, P, J2, K2)
    skew_i: np.ndarray         # padded i index per skew slot
    skew_j: np.ndarray
    skew_k: np.ndarray
    skew_valid: np.ndarray     # True where the slot holds a physical cell
    unskew_p: np.ndarray       # (ni, nj, nk) plane index per cell
    unskew_j: np.ndarray
    unskew_k: np.ndarray
    # neighbor-contribution masks (ni, nj, nk) per direction/side
    mask_lower: dict
    mask_upper: dict


def _connection_face_mask(block, d: str, lower: bool):
    """cells whose face on (d, side) is a connection (ni,nj,nk boolean on
    the boundary layer, False elsewhere)."""
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    mask = np.zeros((block.ni, block.nj, block.nk), dtype=bool)
    for spec in block.surfaces:
        if spec.bc_type not in ("interblock", "periodic"):
            continue
        if spec.direction != d or spec.lower != lower:
            continue
        sl = [None, None, None]
        sl[AX[d]] = 0 if lower else dims[d] - 1
        taxes = [a for a in range(3) if a != AX[d]]
        for a, (lo, hi) in zip(taxes, spec.patch):
            sl[a] = slice(lo - block.g, hi - block.g)
        mask[tuple(sl)] = True
    return mask


def build_implicit_context(block) -> ImplicitContext:
    ni, nj, nk, g = block.ni, block.nj, block.nk, block.g
    P = ni + nj + nk          # p' = i+j+k+1, i in [-1, ni], j/k one ghost rim
    J2, K2 = nj + 2, nk + 2

    pp, jj, kk = np.meshgrid(np.arange(P), np.arange(J2), np.arange(K2),
                             indexing="ij")
    j = jj - 1
    k = kk - 1
    i = (pp - 1) - j - k
    valid_cell = (i >= 0) & (i < ni) & (j >= 0) & (j < nj) & (k >= 0) & (k < nk)
    in_padded = (i >= -g) & (i < ni + g)
    skew_i = np.where(in_padded, i + g, 0)
    skew_j = np.clip(j + g, 0, nj + 2 * g - 1)
    skew_k = np.clip(k + g, 0, nk + 2 * g - 1)

    ii, jj2, kk2 = np.meshgrid(np.arange(ni), np.arange(nj), np.arange(nk),
                               indexing="ij")
    unskew_p = ii + jj2 + kk2 + 1
    unskew_j = jj2 + 1
    unskew_k = kk2 + 1

    mask_lower, mask_upper = {}, {}
    for d in "ijk":
        ax = AX[d]
        idx = [ii, jj2, kk2][ax]
        dims = [ni, nj, nk][ax]
        conn_lo = _connection_face_mask(block, d, True)
        conn_hi = _connection_face_mask(block, d, False)
        mask_lower[d] = (idx > 0) | conn_lo
        mask_upper[d] = (idx < dims - 1) | conn_hi

    return ImplicitContext(
        nplanes=P, skew_i=skew_i, skew_j=skew_j, skew_k=skew_k,
        skew_valid=valid_cell, unskew_p=unskew_p, unskew_j=unskew_j,
        unskew_k=unskew_k, mask_lower=mask_lower, mask_upper=mask_upper)


def skew(ctx: ImplicitContext, arr, fill=0.0):
    """(neq, NI, NJ, NK) -> (neq, P, J2, K2)"""
    out = arr[:, ctx.skew_i, ctx.skew_j, ctx.skew_k]
    return out


def unskew(ctx: ImplicitContext, arr_skew):
    """(neq, P, J2, K2) -> (neq, ni, nj, nk)"""
    return arr_skew[:, ctx.unskew_p, ctx.unskew_j, ctx.unskew_k]


# ---------------------------------------------------------------------------
# full-block off-diagonal passes (normal layout)


def _neighbor_slices(block, d: str, side: str):
    """padded slices: (neighbor cells, shared faces) for each physical cell
    along direction d."""
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    cell = [slice(g, g + dims[dd]) for dd in "ijk"]
    nb = list(cell)
    face = list(cell)
    ax = AX[d]
    n = dims[d]
    if side == "lower":
        nb[ax] = slice(g - 1, g + n - 1)
        face[ax] = slice(g, g + n)        # lower face of each cell
    else:
        nb[ax] = slice(g + 1, g + n + 1)
        face[ax] = slice(g + 1, g + n + 1)  # upper face of each cell
    return tuple(nb), tuple(face)


def offdiag_sum(phys: Physics, cfg, block, ctx, prim, du, side: str,
                aux=None):
    """Sum of lower (or upper) off-diagonal contributions for every physical
    cell, in one vectorized pass (reference: procBlock::ImplicitLower/Upper)."""
    g = block.g
    total = 0.0
    positive = side == "lower"
    for d in "ijk":
        nb, face = _neighbor_slices(block, d, side)
        q_nb = prim[(slice(None),) + nb]
        du_nb = du[(slice(None),) + nb]
        nvec = block.geom[f"n_{d}"][(slice(None),) + face]
        mag = block.geom[f"mag_{d}"][face]
        kw = {}
        if cfg.get("viscous", False):
            kw = _viscous_offdiag_kw(phys, cfg, block, d, nb, face, aux)
        contrib = offdiagonal(phys, cfg, q_nb, du_nb, nvec, mag,
                              positive, **kw)
        mask = (ctx.mask_lower if positive else ctx.mask_upper)[d]
        total = total + jnp.where(jnp.asarray(mask)[None], contrib, 0.0)
    return total


def _viscous_offdiag_kw(phys, cfg, block, d, nb, face, aux):
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    cell = tuple(slice(g, g + dims[dd]) for dd in "ijk")
    center = block.geom["center"]
    c2c = center[(slice(None),) + cell] - center[(slice(None),) + nb]
    nvec = block.geom[f"n_{d}"][(slice(None),) + face]
    dist = jnp.abs((c2c * nvec).sum(axis=0))
    mu = aux["mu"][nb] if aux else None
    mut = aux["mut"][nb] if (aux and "mut" in aux) else None
    f1 = aux["f1"][nb] if (aux and "f1" in aux) else None
    out = dict(dist=dist, mu=mu, mut=mut, f1=f1)
    if aux and "vgrad" in aux:
        out["vgrad"] = aux["vgrad"][(slice(None), slice(None)) + nb]
    return out


# ---------------------------------------------------------------------------
# time terms (reference: procBlock.cpp:1000-1034)


def sol_delta_coeffs(block, dt, theta, zeta):
    g = block.g
    P = tuple(slice(g, g + n) for n in (block.ni, block.nj, block.nk))
    vol = block.geom["vol"][P]
    coeff_n = vol * (1.0 + zeta) / (dt * theta)
    coeff_nm1 = vol * zeta / (dt * theta)
    return coeff_n, coeff_nm1


def rhs_b(phys: Physics, block, cfg, prim, resid, cons_n, cons_nm1, dt,
          forcing=None):
    """b = -1/θ·R + forcing + ζV/(dtθ)(consN−consNm1) − (1+ζ)V/(dtθ)(cons−consN)
    (reference: linearSolver.cpp:56-76)."""
    g = block.g
    P = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
         slice(g, g + block.nk))
    theta, zeta = cfg["theta"], cfg["zeta"]
    coeff_n, coeff_nm1 = sol_delta_coeffs(block, dt, theta, zeta)
    b = -(1.0 / theta) * resid
    if cfg["multilevel_time"]:
        b = b + coeff_nm1[None] * (cons_n - cons_nm1)
    cons_m = st.cons_from_prim(phys, prim[P])
    b = b - coeff_n[None] * (cons_m - cons_n)
    if forcing is not None:
        b = b + forcing
    return b


def build_diagonal(phys: Physics, block, cfg, diag_flow, diag_turb, sr_max,
                   dt):
    """A = a*relax + (1+ζ)V/(dtθ) [+ max(specrad)/dualCFL]; returns (inv_flow,
    inv_turb) (reference: linearSolver.cpp:127-160)."""
    g = block.g
    P = tuple(slice(g, g + n) for n in (block.ni, block.nj, block.nk))
    vol = block.geom["vol"][P]
    theta, zeta = cfg["theta"], cfg["zeta"]
    diag_vol_time = vol * (1.0 + zeta) / (dt * theta)
    if cfg["dual_time_cfl"] > 0.0:
        diag_vol_time = diag_vol_time + sr_max / cfg["dual_time_cfl"]
    relax = cfg["matrix_relaxation"]
    inv_flow = 1.0 / (diag_flow * relax + diag_vol_time)
    inv_turb = None
    if phys.nturb:
        inv_turb = 1.0 / (diag_turb * relax + diag_vol_time)
    return inv_flow, inv_turb


def diag_mult(phys: Physics, inv_flow, inv_turb, x):
    """apply the (inverted) diagonal: scalar pair or block matrices,
    detected by rank."""
    if inv_flow.ndim == x.ndim + 1:  # block (..., N, N)
        from . import block_jac as bj
        return bj.block_matvec(inv_flow, inv_turb, x, phys)
    out = x * inv_flow[None]
    if phys.nturb and inv_turb is not None:
        out = jnp.concatenate([out[:phys.it],
                               x[phys.it:] * inv_turb[None]])
    return out


def build_block_diagonal(phys: Physics, block, cfg, diag_flow_blk,
                         diag_turb_blk, sr_max, dt):
    """Block A = relax*accumulated + ((1+ζ)V/(dtθ) [+ sr/dualCFL])·I, then
    batched inverse (reference: linearSolver.cpp:127-177)."""
    import jax.numpy as jnp
    g = block.g
    P = tuple(slice(g, g + n) for n in (block.ni, block.nj, block.nk))
    vol = block.geom["vol"][P]
    theta, zeta = cfg["theta"], cfg["zeta"]
    dvt = vol * (1.0 + zeta) / (dt * theta)
    if cfg["dual_time_cfl"] > 0.0:
        dvt = dvt + sr_max / cfg["dual_time_cfl"]
    relax = cfg["matrix_relaxation"]
    N = phys.ns + 4
    a_flow = diag_flow_blk * relax + dvt[..., None, None] * jnp.eye(
        N, dtype=diag_flow_blk.dtype)
    a_turb = None
    if phys.nturb and diag_turb_blk is not None:
        a_turb = diag_turb_blk * relax + dvt[..., None, None] * jnp.eye(
            2, dtype=diag_flow_blk.dtype)
    inv_flow = jnp.linalg.inv(a_flow)
    inv_turb = None if a_turb is None else jnp.linalg.inv(a_turb)
    return (a_flow, a_turb), (inv_flow, inv_turb)


def skew_from_physical_blk(ctx, mat):
    """(ni,nj,nk,N,N) -> (P,J2,K2,N,N) in skew slots (identity elsewhere so
    inverse application at invalid slots is benign)."""
    import jax.numpy as jnp
    N = mat.shape[-1]
    shape = ctx.skew_valid.shape
    out = jnp.zeros(shape + (N, N), mat.dtype) + jnp.eye(N, dtype=mat.dtype)
    return out.at[ctx.unskew_p, ctx.unskew_j, ctx.unskew_k].set(mat)


# ---------------------------------------------------------------------------
# DPLUR relaxation (reference: linearSolver.cpp:472-535)


def dplur_sweep(phys: Physics, cfg, block, ctx, prim, du_padded, b, inv_flow,
                inv_turb, aux=None):
    g = block.g
    P = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
         slice(g, g + block.nk))
    L = offdiag_sum(phys, cfg, block, ctx, prim, du_padded, "lower", aux)
    U = offdiag_sum(phys, cfg, block, ctx, prim, du_padded, "upper", aux)
    x = diag_mult(phys, inv_flow, inv_turb, b + L - U)
    return set_region(du_padded, P, x)


# ---------------------------------------------------------------------------
# LUSGS wavefront sweeps


def _skewed_neighbor_inputs(phys, cfg, block, ctx, prim, side: str,
                            aux=None):
    """Skewed per-direction neighbor states and face geometry used inside the
    scan.  For the forward sweep (side='lower') neighbor of slot (p,j,k) in
    direction d sits at plane p-1 with an in-plane shift for j/k."""
    g = block.g
    offs = -1 if side == "lower" else 1
    inputs = {}
    for d in "ijk":
        ax = AX[d]
        # neighbor gather: padded index of the neighbor cell per skew slot
        si = ctx.skew_i + (offs if ax == 0 else 0)
        sj = ctx.skew_j + (offs if ax == 1 else 0)
        sk = ctx.skew_k + (offs if ax == 2 else 0)
        si = np.clip(si, 0, prim.shape[1] - 1)
        sj = np.clip(sj, 0, prim.shape[2] - 1)
        sk = np.clip(sk, 0, prim.shape[3] - 1)
        q_nb = prim[:, si, sj, sk]
        # shared face: lower side -> cell's own face index; upper -> +1
        fi = ctx.skew_i + (1 if (ax == 0 and side == "upper") else 0)
        fj = ctx.skew_j + (1 if (ax == 1 and side == "upper") else 0)
        fk = ctx.skew_k + (1 if (ax == 2 and side == "upper") else 0)
        nvec_all = block.geom[f"n_{d}"]
        mag_all = block.geom[f"mag_{d}"]
        fi = np.clip(fi, 0, nvec_all.shape[1] - 1)
        fj = np.clip(fj, 0, nvec_all.shape[2] - 1)
        fk = np.clip(fk, 0, nvec_all.shape[3] - 1)
        nvec = nvec_all[:, fi, fj, fk]
        mag = mag_all[fi, fj, fk]
        # contribution mask skewed
        mask_n = (ctx.mask_lower if side == "lower" else ctx.mask_upper)[d]
        mask_pad = np.zeros(ctx.skew_valid.shape, dtype=bool)
        mask_pad[ctx.unskew_p, ctx.unskew_j, ctx.unskew_k] = mask_n
        kw = {}
        if cfg.get("viscous", False):
            kw = _skewed_viscous_kw(phys, cfg, block, ctx, d, si, sj, sk,
                                    fi, fj, fk, aux)
        inputs[d] = dict(q_nb=q_nb, n=nvec, mag=mag,
                         mask=jnp.asarray(mask_pad), **kw)
    return inputs


def _skewed_viscous_kw(phys, cfg, block, ctx, d, si, sj, sk, fi, fj, fk, aux):
    center = block.geom["center"]
    c_cell = center[:, ctx.skew_i, ctx.skew_j, ctx.skew_k]
    c_nb = center[:, si, sj, sk]
    nvec = block.geom[f"n_{d}"][:, fi, fj, fk]
    dist = jnp.abs(((c_cell - c_nb) * nvec).sum(axis=0))
    out = dict(dist=dist)
    out["mu"] = aux["mu"][si, sj, sk] if aux else None
    out["mut"] = aux["mut"][si, sj, sk] if (aux and "mut" in aux) else None
    out["f1"] = aux["f1"][si, sj, sk] if (aux and "f1" in aux) else None
    if aux and "vgrad" in aux:
        out["vgrad"] = aux["vgrad"][:, :, si, sj, sk]
    return out


def _plane_shift(plane, d: str):
    """in-plane shift of the carry for the j/k neighbor gathers: neighbor of
    (p, j, k) in j sits at (p-1, j-1, k) — shift the previous plane by +1."""
    if d == "i":
        return plane
    axis = 1 if d == "j" else 2
    return jnp.roll(plane, 1, axis=axis)


def _plane_shift_up(plane, d: str):
    if d == "i":
        return plane
    axis = 1 if d == "j" else 2
    return jnp.roll(plane, -1, axis=axis)


def lusgs_forward(phys: Physics, cfg, block, ctx, prim, du_padded, b_skew,
                  inv_flow_skew, inv_turb_skew, with_upper: bool, aux=None):
    """Forward LUSGS sweep as a scan over hyperplanes
    (reference: linearSolver.cpp:341-383)."""
    du_skew = skew(ctx, du_padded)
    valid = jnp.asarray(ctx.skew_valid)

    low = _skewed_neighbor_inputs(phys, cfg, block, ctx, prim, "lower", aux)
    U_term = 0.0
    if with_upper:
        U_full = offdiag_sum(phys, cfg, block, ctx, prim, du_padded, "upper",
                             aux)
        U_pad = jnp.zeros((phys.neq,) + ctx.skew_valid.shape, du_padded.dtype)
        U_skew = U_pad.at[:, ctx.unskew_p, ctx.unskew_j,
                          ctx.unskew_k].set(U_full)
        U_term = U_skew

    P = ctx.nplanes

    def body(carry, t):
        prev = carry  # previous plane (neq, J2, K2), already updated
        L = 0.0
        for d in "ijk":
            inp = low[d]
            du_nb = _plane_shift(prev, d)
            q_nb = jax.lax.dynamic_index_in_dim(inp["q_nb"], t, 1, False)
            n = jax.lax.dynamic_index_in_dim(inp["n"], t, 1, False)
            mag = jax.lax.dynamic_index_in_dim(inp["mag"], t, 0, False)
            mask = jax.lax.dynamic_index_in_dim(inp["mask"], t, 0, False)
            kw = {}
            if cfg.get("viscous", False):
                kw["dist"] = jax.lax.dynamic_index_in_dim(
                    inp["dist"], t, 0, False)
                for key in ("mu", "mut", "f1"):
                    kw[key] = (jax.lax.dynamic_index_in_dim(inp[key], t, 0,
                                                            False)
                               if inp.get(key) is not None else None)
                if inp.get("vgrad") is not None:
                    kw["vgrad"] = jax.lax.dynamic_index_in_dim(
                        inp["vgrad"], t, 2, False)
            contrib = offdiagonal(phys, cfg, q_nb, du_nb, n, mag,
                                  True, **kw)
            L = L + jnp.where(mask[None], contrib, 0.0)

        bt = jax.lax.dynamic_index_in_dim(b_skew, t, 1, False)
        ift = jax.lax.dynamic_index_in_dim(inv_flow_skew, t, 0, False)
        itt = (jax.lax.dynamic_index_in_dim(inv_turb_skew, t, 0, False)
               if inv_turb_skew is not None else None)
        rhs = bt + L
        if with_upper:
            rhs = rhs - jax.lax.dynamic_index_in_dim(U_term, t, 1, False)
        xnew = diag_mult(phys, ift, itt, rhs)
        vt = jax.lax.dynamic_index_in_dim(valid, t, 0, False)
        init = jax.lax.dynamic_index_in_dim(du_skew, t, 1, False)
        plane = jnp.where(vt[None], xnew, init)
        return plane, plane

    carry0 = du_skew[:, 0]
    from . import pallas_sweep as ps
    if ps.use_pallas(cfg, du_padded.dtype, phys.ns):
        packed, offs = ps.pack_sweep_inputs(
            phys, cfg, low, b_skew, U_term if with_upper else None, du_skew,
            valid, inv_flow_skew, inv_turb_skew, du_padded.dtype)
        planes = ps.sweep(phys, cfg, packed, offs, carry0, forward=True,
                          with_extra=with_upper)
    else:
        # unroll amortizes the TPU while-loop per-step overhead over
        # several hyperplanes (the planes are tiny; dispatch dominates)
        _, planes = jax.lax.scan(body, carry0, jnp.arange(1, P), unroll=8)
    # planes: (P-1, neq, J2, K2); prepend plane 0
    all_planes = jnp.concatenate([du_skew[:, :1],
                                  jnp.moveaxis(planes, 0, 1)], axis=1)
    x = unskew(ctx, all_planes)
    g = block.g
    Psl = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
           slice(g, g + block.nk))
    return set_region(du_padded, Psl, x)


def lusgs_backward(phys: Physics, cfg, block, ctx, prim, du_padded, b_skew,
                   inv_flow_skew, inv_turb_skew, with_lower: bool, aux=None):
    """Backward LUSGS sweep (reference: linearSolver.cpp:385-428)."""
    du_skew = skew(ctx, du_padded)
    valid = jnp.asarray(ctx.skew_valid)

    upp = _skewed_neighbor_inputs(phys, cfg, block, ctx, prim, "upper", aux)
    L_term = None
    if with_lower:
        L_full = offdiag_sum(phys, cfg, block, ctx, prim, du_padded, "lower",
                             aux)
        L_pad = jnp.zeros((phys.neq,) + ctx.skew_valid.shape, du_padded.dtype)
        L_term = L_pad.at[:, ctx.unskew_p, ctx.unskew_j,
                          ctx.unskew_k].set(L_full)

    P = ctx.nplanes

    def body(carry, t):
        nxt = carry  # next plane (t+1), already updated
        U = 0.0
        for d in "ijk":
            inp = upp[d]
            du_nb = _plane_shift_up(nxt, d)
            q_nb = jax.lax.dynamic_index_in_dim(inp["q_nb"], t, 1, False)
            n = jax.lax.dynamic_index_in_dim(inp["n"], t, 1, False)
            mag = jax.lax.dynamic_index_in_dim(inp["mag"], t, 0, False)
            mask = jax.lax.dynamic_index_in_dim(inp["mask"], t, 0, False)
            kw = {}
            if cfg.get("viscous", False):
                kw["dist"] = jax.lax.dynamic_index_in_dim(
                    inp["dist"], t, 0, False)
                for key in ("mu", "mut", "f1"):
                    kw[key] = (jax.lax.dynamic_index_in_dim(inp[key], t, 0,
                                                            False)
                               if inp.get(key) is not None else None)
                if inp.get("vgrad") is not None:
                    kw["vgrad"] = jax.lax.dynamic_index_in_dim(
                        inp["vgrad"], t, 2, False)
            contrib = offdiagonal(phys, cfg, q_nb, du_nb, n, mag,
                                  False, **kw)
            U = U + jnp.where(mask[None], contrib, 0.0)

        ift = jax.lax.dynamic_index_in_dim(inv_flow_skew, t, 0, False)
        itt = (jax.lax.dynamic_index_in_dim(inv_turb_skew, t, 0, False)
               if inv_turb_skew is not None else None)
        init = jax.lax.dynamic_index_in_dim(du_skew, t, 1, False)
        if with_lower:
            bt = jax.lax.dynamic_index_in_dim(b_skew, t, 1, False)
            Lt = jax.lax.dynamic_index_in_dim(L_term, t, 1, False)
            xnew = diag_mult(phys, ift, itt, bt + Lt - U)
        else:
            xnew = init - diag_mult(phys, ift, itt, U)
        vt = jax.lax.dynamic_index_in_dim(valid, t, 0, False)
        plane = jnp.where(vt[None], xnew, init)
        return plane, plane

    carry0 = du_skew[:, P - 1]
    from . import pallas_sweep as ps
    if ps.use_pallas(cfg, du_padded.dtype, phys.ns):
        packed, offs = ps.pack_sweep_inputs(
            phys, cfg, upp, b_skew if with_lower else None,
            L_term if with_lower else None, du_skew, valid, inv_flow_skew,
            inv_turb_skew, du_padded.dtype)
        planes_nat = ps.sweep(phys, cfg, packed, offs, carry0, forward=False,
                              with_extra=with_lower)
        all_planes = jnp.concatenate(
            [jnp.moveaxis(planes_nat, 0, 1), du_skew[:, P - 1:]], axis=1)
    else:
        _, planes = jax.lax.scan(body, carry0, jnp.arange(P - 2, -1, -1),
                                 unroll=8)
        all_planes = jnp.concatenate(
            [jnp.moveaxis(planes, 0, 1)[:, ::-1], du_skew[:, P - 1:]], axis=1)
    x = unskew(ctx, all_planes)
    g = block.g
    Psl = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
           slice(g, g + block.nk))
    return set_region(du_padded, Psl, x)


def skew_scalar(ctx, arr_padded):
    """(NI,NJ,NK) scalar -> (P, J2, K2)"""
    return arr_padded[ctx.skew_i, ctx.skew_j, ctx.skew_k]


def skew_from_physical(ctx, arr_phys):
    """embed physical-cell array (neq, ni,nj,nk) or (ni,nj,nk) into skew
    slots (zeros elsewhere)."""
    shape = ctx.skew_valid.shape
    if arr_phys.ndim == 4:
        out = jnp.zeros((arr_phys.shape[0],) + shape, arr_phys.dtype)
        return out.at[:, ctx.unskew_p, ctx.unskew_j,
                      ctx.unskew_k].set(arr_phys)
    out = jnp.ones(shape, arr_phys.dtype)
    return out.at[ctx.unskew_p, ctx.unskew_j, ctx.unskew_k].set(arr_phys)


def matrix_residual(phys: Physics, cfg, block, ctx, prim, du_padded, b,
                    a_flow, a_turb, aux=None, forcing=None):
    """forcing − (A·x − b) per cell (reference: linearSolver.cpp:45-100)."""
    g = block.g
    P = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
         slice(g, g + block.nk))
    x = du_padded[P]
    L = offdiag_sum(phys, cfg, block, ctx, prim, du_padded, "lower", aux)
    U = offdiag_sum(phys, cfg, block, ctx, prim, du_padded, "upper", aux)
    if a_flow.ndim == x.ndim + 1:  # block diagonal
        from . import block_jac as bj
        ax = bj.block_matvec(a_flow, a_turb, x, phys)
    else:
        ax = x * a_flow[None]
        if phys.nturb and a_turb is not None:
            ax = ax.at[phys.it:].set(x[phys.it:] * a_turb[None])
    axmb = ax - (L - U) - b
    if forcing is not None:
        return forcing - axmb
    return -axmb
