"""Viscous fluxes, face-CV Green-Gauss gradients, and turbulence models.

Reference semantics (reference: src/procBlock.cpp:1233-1879 CalcViscFluxI/J/K,
:5173-5955 CalcGradsI/J/K, src/viscousFlux.cpp, src/utility.cpp:59-130
VectorGradGG/ScalarGradGG, src/turbulence.cpp) re-expressed as fused slice
arithmetic over all faces of one direction at a time.

Gradients use the face-centered auxiliary control volume (odd/even-decoupling
-free): per face the CV spans the two adjacent cells; transverse CV faces
average 4 cells; each face gradient is also accumulated to the two adjacent
cells with weight 1/6 for use in source terms / BCs / output.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grid.geometry import AX
from ..physics.models import Physics
from . import state as st
from .reconstruction import central, central4

EPS = 1.0e-30


# ---------------------------------------------------------------------------
# turbulence model constants

WILCOX = dict(gamma=0.52, beta_star=0.09, sigma=0.5, sigma_star=0.6,
              sigma_d0=0.125, beta0=0.0708, clim=0.875, prt=8.0 / 9.0)
SST = dict(beta_star=0.09, sigma_k1=0.85, sigma_k2=1.0, sigma_w1=0.5,
           sigma_w2=0.856, beta1=0.075, beta2=0.0828, gamma1=5.0 / 9.0,
           gamma2=0.44, a1=0.31, prt=0.9, k_prod2dest=10.0)
DES = dict(cdes1=0.78, cdes2=0.61)
WALE = dict(cw=0.544)


def turb_prandtl(model: str) -> float:
    return WILCOX["prt"] if model == "kOmegaWilcox2006" else SST["prt"]


def wall_beta(model: str) -> float:
    return WILCOX["beta0"] if model == "kOmegaWilcox2006" else SST["beta1"]


def sigma_k(model: str, f1):
    if model == "kOmegaWilcox2006":
        return WILCOX["sigma_star"]
    return f1 * SST["sigma_k1"] + (1.0 - f1) * SST["sigma_k2"]


def sigma_w(model: str, f1):
    if model == "kOmegaWilcox2006":
        return WILCOX["sigma"]
    return f1 * SST["sigma_w1"] + (1.0 - f1) * SST["sigma_w2"]


def _strain(vgrad):
    """mean strain rate 0.5(G + Gᵀ); vgrad[a][b] = d v_b / d x_a"""
    return 0.5 * (vgrad + jnp.swapaxes(vgrad, 0, 1))


def _ddot_trans(a, b):
    """A : Bᵀ double dot = sum_ij A_ij B_ij (tensor.DoubleDotTrans)."""
    return (a * b).sum(axis=(0, 1))


def eddy_visc_and_blending(phys: Physics, model: str, q, vgrad, kgrad, wgrad,
                           mu, wall_dist, length):
    """(mut, f1, f2) at a point set (reference: turbulence.cpp:208-700)."""
    scaling = phys.nondim_scaling
    r = st.rho(phys, q)
    tke = q[phys.it]
    omega = q[phys.it + 1]
    if model == "kOmegaWilcox2006":
        ident = jnp.zeros_like(vgrad)
        for a in range(3):
            ident = ident.at[a, a].set(1.0)
        trace = vgrad[0, 0] + vgrad[1, 1] + vgrad[2, 2]
        s_hat = _strain(vgrad) - (trace / 3.0)[None, None] * ident
        omega_tilda = jnp.maximum(
            omega, scaling * WILCOX["clim"]
            * jnp.sqrt(2.0 * _ddot_trans(s_hat, s_hat) / WILCOX["beta_star"]))
        mut = r * tke / omega_tilda
        f1 = jnp.ones_like(mut)
        f2 = jnp.zeros_like(mut)
        return mut, f1, f2
    if model in ("sst2003", "sstdes"):
        alpha1 = scaling * jnp.sqrt(tke) / (
            SST["beta_star"] * omega * (wall_dist + EPS))
        alpha2 = scaling * scaling * 500.0 * mu / (
            (wall_dist + EPS) ** 2 * r * omega)
        cdkw = jnp.maximum(
            2.0 * r * SST["sigma_w2"] / omega * (kgrad * wgrad).sum(axis=0),
            1.0e-10)
        alpha3 = 4.0 * r * SST["sigma_w2"] * tke / (
            cdkw * (wall_dist + EPS) ** 2)
        f1 = jnp.tanh(jnp.minimum(jnp.maximum(alpha1, alpha2), alpha3) ** 4)
        f2 = jnp.tanh(jnp.maximum(2.0 * alpha1, alpha2) ** 2)
        sr = _strain(vgrad)
        mean_sr = jnp.sqrt(2.0 * _ddot_trans(sr, sr))
        mut = r * SST["a1"] * tke / jnp.maximum(
            SST["a1"] * omega, scaling * mean_sr * f2)
        return mut, f1, f2
    if model == "wale":
        sd = _wale_sigma_d(vgrad)
        sr = _strain(vgrad)
        num = _ddot_trans(sd, sd) ** 1.5
        den = (_ddot_trans(sr, sr) ** 2.5
               + _ddot_trans(sd, sd) ** 1.25 + EPS)
        # NOTE: the reference returns (cw*length)^2 * velGradTerm with NO
        # rho and NO 1/nondim-scaling factor (turbulence.cpp:967-990) —
        # unlike every RANS model's rho*k/omega-form mut — so in nondim
        # units its SGS viscosity is ~scaling x smaller than the
        # physically-scaled form.  Replicated verbatim for golden parity
        # (the couette-wale goldens sit within 1% of plain couette).
        mut = (WALE["cw"] * length) ** 2 * num / den
        return mut, jnp.ones_like(mut), jnp.zeros_like(mut)
    raise ValueError(f"unknown turbulence model {model!r}")


def _wale_sigma_d(vgrad):
    """traceless symmetric square of the velocity gradient (WALE)"""
    g2 = jnp.einsum("ab...,bc...->ac...", vgrad, vgrad)
    sym = 0.5 * (g2 + jnp.swapaxes(g2, 0, 1))
    trace = g2[0, 0] + g2[1, 1] + g2[2, 2]
    out = sym
    for a in range(3):
        out = out.at[a, a].add(-trace / 3.0)
    return out


def wilcox_beta(phys: Physics, q, vgrad):
    """beta = beta0 * FBeta with the guarded vortex-stretching invariant
    (reference: turbulence.cpp:199-230)."""
    w = WILCOX
    omega = q[phys.it + 1]
    trace = vgrad[0, 0] + vgrad[1, 1] + vgrad[2, 2]
    ident = jnp.zeros_like(vgrad)
    for a in range(3):
        ident = ident.at[a, a].set(1.0)
    vort = 0.5 * (vgrad - jnp.swapaxes(vgrad, 0, 1))
    strain_ki = 0.5 * (vgrad + jnp.swapaxes(vgrad, 0, 1)
                       - trace[None, None] * ident)
    num = 0.0
    scale = 0.0
    for a in range(3):
        for c in range(3):
            v2 = (vort[a, 0] * vort[0, c] + vort[a, 1] * vort[1, c]
                  + vort[a, 2] * vort[2, c])
            term = v2 * strain_ki[a, c]
            num = num + term
            scale = scale + jnp.abs(term)
    num = jnp.where(jnp.abs(num) <= 1.0e-10 * scale, 0.0, num)
    xw = jnp.abs(num / (w["beta_star"] * omega) ** 3)
    fbeta = (1.0 + 85.0 * xw) / (1.0 + 100.0 * xw)
    return w["beta0"] * fbeta


def turb_source(phys: Physics, model: str, q, vgrad, kgrad, wgrad, mut, f1,
                f2, width):
    """(src_k, src_w, src_spec_rad) per cell
    (reference: turbulence.cpp:244-320, 422-470, 560-610)."""
    scaling = phys.nondim_scaling
    inv_scaling = 1.0 / scaling
    r = st.rho(phys, q)
    tke = q[phys.it]
    omega = q[phys.it + 1]

    # Boussinesq Reynolds stress : velGrad
    lam = -2.0 / 3.0 * mut
    trace = vgrad[0, 0] + vgrad[1, 1] + vgrad[2, 2]
    ident = jnp.zeros_like(vgrad)
    for a in range(3):
        ident = ident.at[a, a].set(1.0)
    tau = (lam * trace - 2.0 / 3.0 * r * tke)[None, None] * ident \
        + mut[None, None] * (vgrad + jnp.swapaxes(vgrad, 0, 1))
    rs_ddot = _ddot_trans(tau, vgrad)

    if model == "kOmegaWilcox2006":
        w = WILCOX
        # beta = beta0 * FBeta; the vortex-stretching invariant needs a
        # cancellation guard (it is exactly zero in 2D flows and fused
        # arithmetic otherwise leaves amplified roundoff) — see wilcox_beta
        beta = wilcox_beta(phys, q, vgrad)
        tke_dest = inv_scaling * w["beta_star"] * r * tke * omega
        omg_dest = inv_scaling * beta * r * omega * omega
        tke_prod = jnp.maximum(scaling * rs_ddot, 0.0)
        omg_prod = jnp.maximum(w["gamma"] * omega / tke * tke_prod, 0.0)
        kdotw = (kgrad * wgrad).sum(axis=0)
        sigma_d = jnp.where(kdotw <= 0.0, 0.0, w["sigma_d0"])
        omg_cd = scaling * sigma_d * r / omega * kdotw
        src_k = tke_prod - tke_dest
        src_w = omg_prod - omg_dest + omg_cd
        src_rad = -2.0 * w["beta_star"] * omega * inv_scaling
        return src_k, src_w, src_rad

    if model in ("sst2003", "sstdes"):
        s = SST
        cdkw = jnp.maximum(
            2.0 * r * s["sigma_w2"] / omega * (kgrad * wgrad).sum(axis=0),
            1.0e-10)
        gamma = f1 * s["gamma1"] + (1.0 - f1) * s["gamma2"]
        beta = f1 * s["beta1"] + (1.0 - f1) * s["beta2"]
        if model == "sstdes":
            cdes = f1 * DES["cdes1"] + (1.0 - f1) * DES["cdes2"]
            tls = jnp.sqrt(tke) / (s["beta_star"] * omega) * scaling
            phi = jnp.maximum((1.0 - f2) * tls / (cdes * width), 1.0)
            # NOTE: the reference's DES tke destruction OMITS the beta*
            # prefactor plain SST applies — turbSstDes::CalcTurbSrc uses
            # invScaling * TkeDestruction(state, phi) = invScaling*rho*k*
            # omega*phi (turbulence.cpp:893-895) where turbKWSst uses
            # invScaling * betaStar * TkeDestruction(state)
            # (turbulence.cpp:744-746).  Replicated for golden parity.
            tke_dest = inv_scaling * r * tke * omega * phi
        else:
            tke_dest = inv_scaling * s["beta_star"] * r * tke * omega
        omg_dest = inv_scaling * beta * r * omega * omega
        tke_prod = jnp.maximum(
            jnp.minimum(scaling * rs_ddot, s["k_prod2dest"] * tke_dest), 0.0)
        omg_prod = jnp.maximum(gamma * r / mut * tke_prod, 0.0)
        omg_cd = scaling * (1.0 - f1) * cdkw
        src_k = tke_prod - tke_dest
        src_w = omg_prod - omg_dest + omg_cd
        if model == "sstdes":
            # spec rad from max |diag| of src jacobian with beta2.  NOTE
            # the reference forwards the raw CELL WIDTH as the phi
            # argument here (procBlock.cpp:6005-6007 passes
            # phi=MaxCellWidth into SrcSpecRad; turbulence.cpp:925-935
            # plugs it straight into TurbSrcJac's destruction
            # multiplier) — replicated for trajectory parity.
            j00 = -2.0 * s["beta_star"] * omega * width * inv_scaling
            j11 = -2.0 * s["beta2"] * omega * inv_scaling
            src_rad = -jnp.maximum(jnp.abs(j00), jnp.abs(j11))
        else:
            src_rad = -2.0 * s["beta_star"] * omega * inv_scaling
        return src_k, src_w, src_rad

    raise ValueError(f"no source terms for turbulence model {model!r}")


# ---------------------------------------------------------------------------
# gradients


def _face_slices(block, d):
    """padded slice tuples used in the face-CV gradient assembly along d."""
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    n = dims[d]
    # per-face cell offsets relative to face f (padded index g+f):
    #   cell "hi" = g+f, cell "lo" = g+f-1
    return g, dims, n


def face_cv_gradients(phys: Physics, block, prim, t_all, d: str,
                      is_rans: bool, multi_species: bool,
                      need_aux: bool = True, need_pgrad: bool = True,
                      need_mix: bool = True):
    """All face-centered-CV Green-Gauss gradients along direction d.

    Returns dict with 'vel' (3,3,nf...), 'temp' (3,nf...), optional 'tke',
    'omega', 'mix' (list), and — when ``need_aux``/``need_pgrad`` — 'rho' /
    'press', which feed only output fields and the LODI pressure-gradient
    carry.  Shapes trimmed to physical transverse extents, nf = n+1 faces
    along d."""
    g, dims, n = _face_slices(block, d)
    ax = 1 + AX[d]
    nf = n + 1

    d1, d2 = [x for x in "ijk" if x != d]

    def cells(off_d, off1=0, off2=0):
        """cell slab at (face-1+off_d) along d with transverse offsets
        (reads ghost neighbors at transverse boundaries)."""
        sl = [slice(None)] * 4
        sl[ax] = slice(g - 1 + off_d, g - 1 + off_d + nf)
        sl[1 + AX[d1]] = slice(g + off1, g + off1 + dims[d1])
        sl[1 + AX[d2]] = slice(g + off2, g + off2 + dims[d2])
        return prim[tuple(sl)]

    def tcells(off_d, off1=0, off2=0):
        sl = [slice(None)] * 3
        sl[ax - 1] = slice(g - 1 + off_d, g - 1 + off_d + nf)
        sl[AX[d1]] = slice(g + off1, g + off1 + dims[d1])
        sl[AX[d2]] = slice(g + off2, g + off2 + dims[d2])
        return t_all[tuple(sl)]

    # CV face areas --------------------------------------------------------
    geom = block.geom

    def fvec(dd, *offs):
        """area vector (unit*mag) of face array dd at given offsets; offs is
        (off_d, off_dd) where off_dd shifts along dd's own axis."""
        off_d, off_own = offs
        arr = geom[f"n_{dd}"] * geom[f"mag_{dd}"][None]
        sl = [slice(None)] * 4
        for a, x in enumerate("ijk"):
            if x == d and dd == d:
                sl[1 + a] = slice(g + off_d, g + off_d + nf)
            elif x == d:
                sl[1 + a] = slice(g - 1 + off_d, g - 1 + off_d + nf)
            elif x == dd:
                sl[1 + a] = slice(g + off_own, g + off_own + dims[x])
            else:
                sl[1 + a] = slice(g, g + dims[x])
        return arr[tuple(sl)]

    # normal-direction CV faces: avg of face f with f±1
    a_du = 0.5 * (fvec(d, 0, 0) + fvec(d, 1, 0))
    a_dl = 0.5 * (fvec(d, 0, 0) + fvec(d, -1, 0))
    # transverse CV faces: avg over the two cells (f-1, f) of their dd-faces
    a_1u = 0.5 * (fvec(d1, 1, 1) + fvec(d1, 0, 1))
    a_1l = 0.5 * (fvec(d1, 1, 0) + fvec(d1, 0, 0))
    a_2u = 0.5 * (fvec(d2, 1, 1) + fvec(d2, 0, 1))
    a_2l = 0.5 * (fvec(d2, 1, 0) + fvec(d2, 0, 0))

    # CV volume
    volp = geom["vol"]
    sl_lo = [slice(None)] * 3
    sl_hi = [slice(None)] * 3
    for a, x in enumerate("ijk"):
        if x == d:
            sl_lo[a] = slice(g - 1, g - 1 + nf)
            sl_hi[a] = slice(g, g + nf)
        else:
            sl_lo[a] = slice(g, g + dims[x])
            sl_hi[a] = slice(g, g + dims[x])
    vol_cv = 0.5 * (volp[tuple(sl_lo)] + volp[tuple(sl_hi)])

    # values on CV faces -----------------------------------------------------
    def face_vals(q_lo, q_hi, qs):
        """qs: function off->(array at cells with offsets)"""
        v_1u = 0.25 * (q_lo + q_hi + qs(1, 1, 0) + qs(0, 1, 0))
        v_1l = 0.25 * (q_lo + q_hi + qs(1, -1, 0) + qs(0, -1, 0))
        v_2u = 0.25 * (q_lo + q_hi + qs(1, 0, 1) + qs(0, 0, 1))
        v_2l = 0.25 * (q_lo + q_hi + qs(1, 0, -1) + qs(0, 0, -1))
        return v_1l, v_1u, v_2l, v_2u

    def grad_scalar(q_lo, q_hi, v1l, v1u, v2l, v2u):
        """Green-Gauss: Σ_faces v*A / vol (ScalarGradGG)."""
        num = (q_hi[None] * a_du - q_lo[None] * a_dl
               + v1u[None] * a_1u - v1l[None] * a_1l
               + v2u[None] * a_2u - v2l[None] * a_2l)
        return num / vol_cv[None]

    out = {}

    # velocity gradient: grad[a][b] = d v_b / d x_a
    vel_lo = cells(0)[phys.mx:phys.mx + 3]
    vel_hi = cells(1)[phys.mx:phys.mx + 3]

    def vel_at(od, o1, o2):
        return cells(od, o1, o2)[phys.mx:phys.mx + 3]

    v1l, v1u, v2l, v2u = face_vals(vel_lo, vel_hi, vel_at)
    vg = (vel_hi[None] * a_du[:, None] - vel_lo[None] * a_dl[:, None]
          + v1u[None] * a_1u[:, None] - v1l[None] * a_1l[:, None]
          + v2u[None] * a_2u[:, None] - v2l[None] * a_2l[:, None])
    out["vel"] = vg / vol_cv[None, None]      # (3, 3, nf, ...) [a][b]

    def scalar_grad_from(fn_lo, fn_hi, fn):
        v1l, v1u, v2l, v2u = face_vals(fn_lo, fn_hi, fn)
        return grad_scalar(fn_lo, fn_hi, v1l, v1u, v2l, v2u)

    if need_aux:
        rho_lo = cells(0)[:phys.ns].sum(axis=0)
        rho_hi = cells(1)[:phys.ns].sum(axis=0)
        out["rho"] = scalar_grad_from(
            rho_lo, rho_hi, lambda *o: cells(*o)[:phys.ns].sum(axis=0))

    if need_aux or need_pgrad:
        p_lo = cells(0)[phys.ie]
        p_hi = cells(1)[phys.ie]
        out["press"] = scalar_grad_from(p_lo, p_hi,
                                        lambda *o: cells(*o)[phys.ie])

    out["temp"] = scalar_grad_from(tcells(0), tcells(1), tcells)

    if is_rans:
        out["tke"] = scalar_grad_from(
            cells(0)[phys.it], cells(1)[phys.it],
            lambda *o: cells(*o)[phys.it])
        out["omega"] = scalar_grad_from(
            cells(0)[phys.it + 1], cells(1)[phys.it + 1],
            lambda *o: cells(*o)[phys.it + 1])
    if multi_species and need_mix:
        mix = []
        for ss in range(phys.ns):
            def mf(od, o1=0, o2=0, ss=ss):
                c = cells(od, o1, o2)
                return c[ss] / c[:phys.ns].sum(axis=0)
            mix.append(scalar_grad_from(mf(0), mf(1), mf))
        out["mix"] = mix
    return out


def _cellavg_keys(is_rans, need_aux, need_pgrad):
    """cell-average gradient fields accumulated per direction: 'vel' (+
    'tke'/'omega' for RANS) feed the turbulence sources / implicit path
    every iteration; 'temp'/'rho' feed only file output; 'press' feeds
    the LODI bc carry and output."""
    keys = ["vel"]
    if need_aux:
        keys += ["temp", "rho"]
    if need_aux or need_pgrad:
        keys.append("press")
    if is_rans:
        keys += ["tke", "omega"]
    return keys


# ---------------------------------------------------------------------------
# viscous flux assembly


def tau_normal(vgrad, n, mu_eff):
    """lambda*tr(G)*n + mu*(G+Gᵀ)·n (reference: utility.cpp:426-436).
    The 3x3 matvec is unrolled (not einsum) so the same code lowers
    inside Pallas kernels — Mosaic cannot lower the batched dot_general
    einsum produces."""
    lam = -2.0 / 3.0 * mu_eff
    trace = vgrad[0, 0] + vgrad[1, 1] + vgrad[2, 2]
    sym = vgrad + jnp.swapaxes(vgrad, 0, 1)
    matvec = jnp.stack([sym[a, 0] * n[0] + sym[a, 1] * n[1]
                        + sym[a, 2] * n[2] for a in range(3)])
    return lam[None] * trace[None] * n + mu_eff[None] * matvec


def _wall_face_mask(block, d: str, nf: int):
    """1.0 on faces belonging to a viscousWall boundary (for zeroing species
    diffusion, per the CalcWallFlux path), else 0.0; shape (nf, n1, n2)."""
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    taxes = [a for a in "ijk" if a != d]
    mask = np.zeros((nf, dims[taxes[0]], dims[taxes[1]]))
    for spec in block.surfaces:
        if spec.bc_type != "viscousWall" or spec.direction != d:
            continue
        f = 0 if spec.lower else dims[d]
        sl = tuple(slice(lo - block.g, hi - block.g) for lo, hi in spec.patch)
        mask[(f,) + sl] = 1.0
    # reorder to (..., nf at axis of d ...) caller handles via moveaxis
    return mask


def viscous_residual(phys: Physics, cfg, block, prim, t_all, mu_all,
                     wall_data=None, need_aux=True, need_pgrad=True):
    """Viscous flux residual contribution + gradients + eddy viscosity +
    viscous spectral radii (reference: procBlock.cpp:1233-1879).

    Returns (resid_v, sr_dt_flow, sr_dt_turb, diag_flow, diag_turb, cellavg)
    where resid_v must be ADDED to the inviscid residual (sign handled here)
    and cellavg holds 1/6-weighted cell gradients / mut / f1 / f2.
    ``need_aux=False`` drops the output-only gradient fields (see
    step.full_residual)."""
    g = block.g
    geom = block.geom
    dims = dict(i=block.ni, j=block.nj, k=block.nk)
    model = cfg["turb_model"]
    is_rans = phys.nturb > 0
    is_turb = cfg.get("turbulent", is_rans)
    multi = phys.ns > 1
    visc_coeff = cfg["viscous_cfl_coeff"]
    scaling = phys.nondim_scaling
    wd_all = geom["wall_dist"]

    shape_c = (block.ni, block.nj, block.nk)
    dtype = prim.dtype
    resid = jnp.zeros((phys.neq,) + shape_c, dtype)
    sr_flow = jnp.zeros(shape_c, dtype)
    sr_turb = jnp.zeros(shape_c, dtype)
    diag_flow = jnp.zeros(shape_c, dtype)
    diag_turb = jnp.zeros(shape_c, dtype)
    diag_flow_blk = diag_turb_blk = 0.0
    if cfg.get("block_matrix"):
        N = phys.ns + 4
        diag_flow_blk = jnp.zeros(shape_c + (N, N), dtype)
        if is_rans:
            diag_turb_blk = jnp.zeros(shape_c + (2, 2), dtype)
    ca_keys = _cellavg_keys(is_rans, need_aux, need_pgrad)
    cellavg = dict(
        mut=jnp.zeros(shape_c, dtype),
        f1=jnp.zeros(shape_c, dtype),
        f2=jnp.zeros(shape_c, dtype),
    )
    for key in ca_keys:
        lead = (3, 3) if key == "vel" else (3,)
        cellavg[key] = jnp.zeros(lead + shape_c, dtype)
    if multi and need_aux:
        cellavg["mix"] = [jnp.zeros((3,) + shape_c, dtype)
                          for _ in range(phys.ns)]

    P = tuple(slice(g, g + dims[dd]) for dd in "ijk")

    def _wall_slabs(d, wall_law_only):
        """(spec, face-array index tuple, sign) for viscousWall surfaces on
        axis d (reference: procBlock.cpp:1270-1305)."""
        out = []
        for spec in block.surfaces:
            if spec.bc_type != "viscousWall" or spec.direction != d:
                continue
            if wall_law_only and (
                    spec.data is None or not spec.data.wall_law
                    or wall_data is None or id(spec) not in wall_data):
                continue
            pos = 0 if spec.lower else dims[d]
            sl = [None, None, None]
            sl[AX[d]] = pos
            taxes = [a for a in range(3) if a != AX[d]]
            for a, (lo, hi) in zip(taxes, spec.patch):
                sl[a] = slice(lo - g, hi - g)
            out.append((spec, tuple(sl), 1.0 if spec.lower else -1.0))
        return out

    def _wall_law_slabs(d):
        return _wall_slabs(d, True)

    wall_out = {}

    for d in "ijk":
        ax = 1 + AX[d]
        n = dims[d]
        nf = n + 1
        d1, d2 = [x for x in "ijk" if x != d]

        grads = face_cv_gradients(
            phys, block, prim, t_all, d, is_rans, multi,
            need_aux=need_aux, need_pgrad=need_pgrad,
            need_mix=need_aux or cfg["diffusion"] != "none")

        def cellslab(arr, off_d, eqdim=True):
            sl = [slice(None)] * (4 if eqdim else 3)
            o = 1 if eqdim else 0
            sl[o + AX[d]] = slice(g - 1 + off_d, g - 1 + off_d + nf)
            sl[o + AX[d1]] = slice(g, g + dims[d1])
            sl[o + AX[d2]] = slice(g, g + dims[d2])
            return arr[tuple(sl)]

        w_all = geom[f"width_{d}"]
        w_lo = cellslab(w_all, 0, False)
        w_hi = cellslab(w_all, 1, False)
        q_lo = cellslab(prim, 0)
        q_hi = cellslab(prim, 1)
        mu_lo = cellslab(mu_all, 0, False)
        mu_hi = cellslab(mu_all, 1, False)
        wd_lo = cellslab(wd_all, 0, False)
        wd_hi = cellslab(wd_all, 1, False)

        if cfg["viscous_recon"] == "centralFourth":
            q2_lo = cellslab(prim, -1)
            q2_hi = cellslab(prim, 2)
            w2_lo = cellslab(w_all, -1, False)
            w2_hi = cellslab(w_all, 2, False)
            qf = central4(q2_lo, q_lo, q_hi, q2_hi, w2_lo, w_lo, w_hi, w2_hi,
                          turb_index=phys.it if is_rans else None)
            mu2_lo = cellslab(mu_all, -1, False)
            mu2_hi = cellslab(mu_all, 2, False)
            muf = central4(mu2_lo[None], mu_lo[None], mu_hi[None],
                           mu2_hi[None], w2_lo, w_lo, w_hi, w2_hi)[0]
        else:
            qf = central(q_lo, q_hi, w_lo, w_hi)
            muf = central(mu_lo[None], mu_hi[None], w_lo, w_hi)[0]
        wdf = central(wd_lo[None], wd_hi[None], w_lo, w_hi)[0]
        wdf = jnp.where((wdf < 0.0) & (wdf > -1.0e-10), 0.0, wdf)
        if is_rans:
            tmin = phys.turb_min()
            qf = qf.at[phys.it].set(jnp.maximum(qf[phys.it], tmin[0]))
            qf = qf.at[phys.it + 1].set(jnp.maximum(qf[phys.it + 1],
                                                    tmin[1]))

        vgrad = grads["vel"]
        tgrad = grads["temp"]

        wl_slabs = _wall_law_slabs(d)
        inv_scaling = 1.0 / scaling

        mutf = jnp.zeros_like(muf)
        f1f = jnp.zeros_like(muf)
        f2f = jnp.zeros_like(muf)
        if is_turb:
            length = 0.5 * (w_lo + w_hi)
            mutf, f1f, f2f = eddy_visc_and_blending(
                phys, model, qf, vgrad,
                grads.get("tke", jnp.zeros_like(tgrad)),
                grads.get("omega", jnp.zeros_like(tgrad)),
                muf, wdf, length)

        for spec, sl, sgn in wl_slabs:
            # wall-law faces use the wall viscosity / eddy viscosity and
            # f1 = f2 = 1 for spectral radii and Jacobians
            # (reference: procBlock.cpp:1286-1294)
            wv = wall_data[id(spec)]
            lr = wv["low_re"]
            muf = muf.at[sl].set(jnp.where(lr, muf[sl],
                                           inv_scaling * wv["mu"]))
            mutf = mutf.at[sl].set(jnp.where(lr, mutf[sl],
                                             inv_scaling * wv["mut"]))
            f1f = f1f.at[sl].set(jnp.where(lr, f1f[sl], 1.0))
            f2f = f2f.at[sl].set(jnp.where(lr, f2f[sl], 1.0))

        # face unit normals at physical faces
        fsl = [slice(None)] * 4
        fsl[ax] = slice(g, g + nf)
        fsl[1 + AX[d1]] = slice(g, g + dims[d1])
        fsl[1 + AX[d2]] = slice(g, g + dims[d2])
        nvec = geom[f"n_{d}"][tuple(fsl)]
        mag = geom[f"mag_{d}"][tuple(fsl[1:])]

        mu_s = scaling * muf
        mut_s = scaling * mutf

        flux = jnp.zeros((phys.neq,) + muf.shape, dtype)

        # species diffusion (zeroed at viscousWall faces)
        h_term = 0.0
        if multi and cfg["diffusion"] != "none":
            dcoeff = (mu_s / cfg["schmidt"]
                      + mut_s / cfg["turb_schmidt"])
            raw = [dcoeff * (grads["mix"][ss] * nvec).sum(axis=0)
                   for ss in range(phys.ns)]
            pos = sum(jnp.maximum(r_, 0.0) for r_ in raw)
            neg = sum(-jnp.minimum(r_, 0.0) for r_ in raw)
            pos_fac = jnp.where(pos > neg, neg / (pos + EPS), 1.0)
            neg_fac = jnp.where(neg > pos, pos / (neg + EPS), 1.0)
            tf = st.temperature(phys, qf)
            hs = phys.species_enthalpy(tf)
            wall = _reorder_face_mask(block, d, nf, dtype)
            h_term = jnp.zeros_like(muf)
            for ss in range(phys.ns):
                f_ss = raw[ss] * jnp.where(raw[ss] > 0.0, pos_fac, neg_fac)
                f_ss = f_ss * (1.0 - wall)
                flux = flux.at[ss].set(f_ss)
                h_term = h_term + f_ss * hs[ss]

        tau = tau_normal(vgrad, nvec, mu_s + mut_s)
        flux = flux.at[phys.mx:phys.mx + 3].set(tau)

        tf = st.temperature(phys, qf)
        mff = qf[:phys.ns] / st.rho(phys, qf)[None]
        k_eff = scaling * phys.conductivity(tf, mff)
        cp = phys.mix(phys.species_cp(tf), mff)
        kt = mut_s * cp / turb_prandtl(model) if is_turb else 0.0
        velf = st.velocity(phys, qf)
        flux = flux.at[phys.ie].set(
            (tau * velf).sum(axis=0) + (k_eff + kt) * (tgrad * nvec).sum(axis=0)
            + h_term)

        if is_rans:
            mutt = mut_s
            if model == "kOmegaWilcox2006":
                # unlimited eddy viscosity for turb diffusion
                mutt = scaling * st.rho(phys, qf) * qf[phys.it] / qf[phys.it + 1]
            flux = flux.at[phys.it].set(
                (mu_s + sigma_k(model, f1f) * mutt)
                * (grads["tke"] * nvec).sum(axis=0))
            flux = flux.at[phys.it + 1].set(
                (mu_s + sigma_w(model, f1f) * mutt)
                * (grads["omega"] * nvec).sum(axis=0))

        for spec, sl, sgn in wl_slabs:
            # prescribed wall-law shear stress / heat flux / turb diffusion
            # (reference: viscousFlux.cpp:213-252; tau sign flipped on upper
            # surfaces, wallLaw.cpp:83-85)
            wv = wall_data[id(spec)]
            lr = wv["low_re"]
            esl = (slice(None),) + sl
            vel_wall = jnp.asarray(spec.data.velocity, flux.dtype)
            tau_w = sgn * wv["tau"]
            flux = flux.at[(slice(phys.mx, phys.mx + 3),) + sl].set(
                jnp.where(lr[None], flux[(slice(phys.mx, phys.mx + 3),) + sl],
                          tau_w))
            e_wl = (tau_w * vel_wall[:, None, None]).sum(axis=0) + wv["q"]
            flux = flux.at[(phys.ie,) + sl].set(
                jnp.where(lr, flux[(phys.ie,) + sl], e_wl))
            if is_rans:
                kgn = (grads["tke"] * nvec).sum(axis=0)[sl]
                wgn = (grads["omega"] * nvec).sum(axis=0)[sl]
                tk_wl = (wv["mu"] + sigma_k(model, 1.0) * wv["mut"]) * kgn
                tw_wl = (wv["mu"] + sigma_w(model, 1.0) * wv["mut"]) * wgn
                flux = flux.at[(phys.it,) + sl].set(
                    jnp.where(lr, flux[(phys.it,) + sl], tk_wl))
                flux = flux.at[(phys.it + 1,) + sl].set(
                    jnp.where(lr, flux[(phys.it + 1,) + sl], tw_wl))

        # wall data for every viscousWall surface (reference:
        # procBlock.cpp:1340-1380 CalcWallFlux storage; wall-law surfaces
        # keep the wall-law solve's values, wallData.hpp:40-115)
        for spec, sl, sgn in _wall_slabs(d, False):
            esl = (slice(None),) + sl
            qw_f = qf[esl]
            rho_f = st.rho(phys, qw_f)
            t_f = st.temperature(phys, qw_f)
            tau_f = tau[esl]
            tau_mag = jnp.sqrt((tau_f * tau_f).sum(axis=0))
            ustar = jnp.sqrt(tau_mag / rho_f)
            mu_f = mu_s[sl]
            mut_f = mut_s[sl]
            kt_f = kt[sl] if is_turb else 0.0
            qflux = (k_eff[sl] + kt_f) * (tgrad * nvec).sum(axis=0)[sl]
            # wall distance of the boundary-adjacent cell
            acell = g if spec.lower else g + dims[d] - 1
            asl = [None, None, None]
            asl[AX[d]] = acell
            taxes = [a2 for a2 in range(3) if a2 != AX[d]]
            for a2, (plo, phi) in zip(taxes, spec.patch):
                asl[a2] = slice(plo, phi)
            ydist = wd_all[tuple(asl)]
            entry = dict(tau=tau_f, q=qflux, rho=rho_f, t=t_f, mu=mu_f,
                         mut=mut_f, u_star=ustar,
                         yplus=ydist * ustar * rho_f / (mu_f + mut_f),
                         tke=qw_f[phys.it] if is_rans else None,
                         sdr=qw_f[phys.it + 1] if is_rans else None)
            if (wall_data is not None and id(spec) in wall_data
                    and spec.data is not None and spec.data.wall_law):
                wv = wall_data[id(spec)]
                lr = wv["low_re"]
                for key, wl_key in (("tau", "tau"), ("q", "q"),
                                    ("rho", "rho"), ("t", "t"), ("mu", "mu"),
                                    ("mut", "mut"), ("u_star", "u_star"),
                                    ("yplus", "yplus"), ("tke", "tke"),
                                    ("sdr", "sdr")):
                    if entry[key] is None:
                        continue
                    wlv = wv[wl_key]
                    if key == "tau":
                        wlv = sgn * wlv
                        entry[key] = jnp.where(lr[None], entry[key], wlv)
                    elif wl_key in ("tke", "sdr") and not is_rans:
                        pass
                    else:
                        entry[key] = jnp.where(lr, entry[key], wlv)
            wall_out[id(spec)] = entry

        fa = flux * mag[None]
        lo = [slice(None)] * 4
        hi = [slice(None)] * 4
        lo[ax] = slice(0, n)
        hi[ax] = slice(1, n + 1)
        # viscous fluxes subtract where inviscid adds (procBlock.cpp:1395)
        resid = resid - (fa[tuple(hi)] - fa[tuple(lo)])

        if cfg.get("block_matrix"):
            # TSL viscous block diagonal (procBlock.cpp:1414-1470): cell gets
            # +TSL(right) at its lower face, -TSL(left) at its upper face
            from . import block_jac as bj
            center = geom["center"]
            csl_lo = [slice(None)] * 4
            csl_hi = [slice(None)] * 4
            for a2, dd2 in enumerate("ijk"):
                if dd2 == d:
                    csl_lo[1 + a2] = slice(g - 1, g - 1 + nf)
                    csl_hi[1 + a2] = slice(g, g + nf)
                else:
                    csl_lo[1 + a2] = slice(g, g + dims[dd2])
                    csl_hi[1 + a2] = slice(g, g + dims[dd2])
            c2c = center[tuple(csl_hi)] - center[tuple(csl_lo)]
            dist_f = jnp.abs((c2c * nvec).sum(axis=0))
            jl_f, jl_t = bj.approx_tsl_jacobian(
                phys, cfg, qf, muf, mutf, f1f, nvec, mag, dist_f, vgrad,
                left=True)
            jr_f, jr_t = bj.approx_tsl_jacobian(
                phys, cfg, qf, muf, mutf, f1f, nvec, mag, dist_f, vgrad,
                left=False)
            flo3v, fhi3v = _face_lohi(AX[d], n)
            diag_flow_blk = diag_flow_blk + jr_f[flo3v] - jl_f[fhi3v]
            if is_rans:
                diag_turb_blk = diag_turb_blk + jr_t[flo3v] - jl_t[fhi3v]

        # cell-average gradient/mut accumulation (1/6 per face)
        sixth = 1.0 / 6.0
        flo3, fhi3 = _face_lohi(AX[d], n)
        for key in ca_keys:
            garr = grads[key]
            cellavg[key] = cellavg[key] + sixth * (
                garr[(Ellipsis,) + flo3] + garr[(Ellipsis,) + fhi3])
        if multi and need_aux:
            for ss in range(phys.ns):
                garr = grads["mix"][ss]
                cellavg["mix"][ss] = cellavg["mix"][ss] + sixth * (
                    garr[(Ellipsis,) + flo3] + garr[(Ellipsis,) + fhi3])
        for key, farr in (("mut", mutf), ("f1", f1f), ("f2", f2f)):
            cellavg[key] = cellavg[key] + sixth * (farr[flo3] + farr[fhi3])

        # viscous spectral radius (cell): uses mut at the cell's lower face
        cell_q = prim[(slice(None),) + P]
        cell_mu = mu_all[P]
        cell_t = t_all[P]
        mut_lo_face = mutf[flo3]
        f1_lo_face = f1f[flo3]
        fmag = 0.5 * (mag[flo3] + mag[fhi3])
        r_c = st.rho(phys, cell_q)
        mf_c = cell_q[:phys.ns] / r_c[None]
        gam = phys.gamma(cell_t, mf_c)
        max_term = jnp.maximum(4.0 / (3.0 * r_c), gam / r_c)
        prand = 4.0 * gam / (9.0 * gam - 5.0)
        visc_term = scaling * (cell_mu / prand
                               + (mut_lo_face / turb_prandtl(model)
                                  if is_turb else 0.0))
        vol_c = geom["vol"][P]
        vsr = max_term * visc_term * fmag * fmag / vol_c
        sr_flow = sr_flow + visc_coeff * vsr
        diag_flow = diag_flow + 2.0 * vsr
        if is_rans:
            if model == "kOmegaWilcox2006":
                mut_nolim = r_c * cell_q[phys.it] / cell_q[phys.it + 1]
                tvsr = scaling * (fmag * fmag / vol_c) / r_c * (
                    cell_mu + sigma_k(model, 1.0) * mut_nolim)
            else:
                tvsr = scaling * (fmag * fmag / vol_c) / r_c * (
                    cell_mu + sigma_k(model, f1_lo_face) * mut_lo_face)
            sr_turb = sr_turb + visc_coeff * tvsr
            diag_turb = diag_turb + 2.0 * tvsr

        from .step import seq_barrier
        (prim, t_all, mu_all, resid, sr_flow, sr_turb, diag_flow, diag_turb,
         diag_flow_blk, diag_turb_blk, cellavg, wall_out) = seq_barrier(
            cfg, (prim, t_all, mu_all, resid, sr_flow, sr_turb, diag_flow,
                  diag_turb, diag_flow_blk, diag_turb_blk, cellavg,
                  wall_out))

    cellavg["wall_out"] = wall_out
    return (resid, sr_flow, sr_turb, diag_flow, diag_turb, cellavg,
            diag_flow_blk, diag_turb_blk)


def _face_lohi(axd, n):
    """3-tuples selecting the lower/upper face of each cell along spatial
    axis `axd` (0..2); apply to the last 3 array dims."""
    lo = [slice(None)] * 3
    hi = [slice(None)] * 3
    lo[axd] = slice(0, n)
    hi[axd] = slice(1, n + 1)
    return tuple(lo), tuple(hi)


def _reorder_face_mask(block, d, nf, dtype):
    """viscousWall face mask shaped like per-face scalars (axes in ijk order
    with nf along d)."""
    m = _wall_face_mask(block, d, nf)  # (nf, t1, t2) with t in ijk order
    order = [AX[d]] + [AX[x] for x in "ijk" if x != d]
    inv = np.argsort(order)
    m = np.transpose(m, inv)
    return jnp.asarray(m, dtype)
