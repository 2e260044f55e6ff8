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


def viscous_face_spectral_radius(phys: Physics, q, mag, dist, mu, mut=None):
    """Viscous face spectral radius |A|/d · max(4/3ρ, γ/ρ)·(μ/Pr + μt/Prt)
    (reference: spectralRadius.hpp:126-151 ViscFaceSpectralRadius)."""
    t = st.temperature(phys, q)
    r = st.rho(phys, q)
    mf = q[:phys.ns] / r[None]
    max_term = jnp.maximum(4.0 / (3.0 * r), phys.gamma(t, mf) / r)
    visc_term = phys.nondim_scaling * (
        mu / _prandtl(phys, t, mf)
        + (mut / phys.turb_prandtl() if mut is not None else 0.0))
    return mag / dist * max_term * visc_term


def face_spectral_radius(phys: Physics, q, n, mag, dist=None, mu=None,
                         mut=None, viscous=False):
    """0.5*|A|*(|v·n| + a) (+ viscous term)
    (reference: spectralRadius.hpp:66-80, 126-151)."""
    vel = st.velocity(phys, q)
    sr = 0.5 * mag * (jnp.abs((vel * n).sum(axis=0)) + st.sos(phys, q))
    if viscous:
        sr = sr + viscous_face_spectral_radius(phys, q, mag, dist, mu, mut)
    return sr


def _prandtl(phys, t, mf):
    g = phys.gamma(t, mf)
    return 4.0 * g / (9.0 * g - 5.0)


def _turb_viscous_face_sr(phys: Physics, cfg, q_nb, mag, dist, mu, mut, f1):
    """Turbulence-equation viscous face spectral radius |A|/d·(μ+σk·μt)/ρ
    (reference: turbulence.cpp ViscFaceSpecRad per model)."""
    from .viscous import sigma_k
    r = st.rho(phys, q_nb)
    model = cfg["turb_model"]
    if model == "kOmegaWilcox2006":
        mutx = r * q_nb[phys.it] / q_nb[phys.it + 1]
        sk = sigma_k(model, 1.0)
    else:
        mutx = mut
        sk = sigma_k(model, f1)
    return phys.nondim_scaling * (mag / dist) / r * (mu + sk * mutx)


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
            sr_t = sr_t + _turb_viscous_face_sr(phys, cfg, q_nb, mag, dist,
                                                mu, mut, f1)
        term = jnp.concatenate([term[:phys.it],
                                sr_t[None] * du_nb[phys.it:]])
    return dflux + term if positive else dflux - term


def roe_offdiagonal(phys: Physics, cfg, q_nb, q_diag, du_nb, n, mag,
                    positive, dist=None, mu=None, mut=None, f1=None):
    """approximateRoe off-diagonal: the change in the Roe face flux caused
    by the neighbor's update, with the diagonal cell's state held fixed
    (reference: fluxJacobian.cpp:240-330 RoeOffDiagonal).

    Semantics replicated exactly, including the reference's asymmetry: the
    old flux always has the off-diagonal state on the left, while the new
    flux swaps sides for the upper (positive=False) sweep.

    Viscous term: the reference's OffDiagonal call site (fluxJacobian.cpp
    :226-230) passes (mu, mut, f1, dist) into RoeOffDiagonal's
    (mu, mut, dist, f1) parameters — f1 and the projected cell-to-cell
    distance are SWAPPED, so the viscous spectral radius divides by f1.
    For laminar flows f1 is 0 and the reference dies on a floating-point
    exception (verified: viscousFlatPlate + approximateRoe traps on this
    host); for SST, F1→0 away from walls with the same failure mode.  The
    swap is an upstream bug with no runnable behavior to match, so this
    implementation uses the correct argument order; inviscid behavior
    (the only configuration the reference can actually run) is replicated
    bit-for-bit and golden-tested.
    """
    from .flux import roe_flux
    old = roe_flux(phys, q_nb, q_diag, n)
    q_up = st.update_prim_with_cons(phys, q_nb, du_nb)
    new = (roe_flux(phys, q_up, q_diag, n) if positive
           else roe_flux(phys, q_diag, q_up, n))
    dflux = mag[None] * (new - old)
    if not cfg.get("viscous", False):
        return dflux
    # viscous-only spectral radius (no inviscid part, unlike Rusanov's)
    sr = viscous_face_spectral_radius(phys, q_nb, mag, dist, mu, mut)
    term = sr[None] * du_nb
    if phys.nturb:
        sr_t = _turb_viscous_face_sr(phys, cfg, q_nb, mag, dist, mu, mut, f1)
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


def offdiagonal(phys: Physics, cfg, q_nb, du_nb, n, mag, positive,
                q_diag=None, **kw):
    """Off-diagonal dispatch on inviscidFluxJacobian (reference:
    fluxJacobian.cpp:196-237 OffDiagonal)."""
    if cfg.get("inv_flux_jac", "rusanov") == "approximateRoe":
        # always the flux-change form with the roe method, scalar and
        # block solvers alike (reference: fluxJacobian.cpp:226 comment)
        kw.pop("vgrad", None)
        return roe_offdiagonal(phys, cfg, q_nb, q_diag, du_nb, n, mag,
                               positive, **kw)
    if cfg.get("block_matrix"):
        return offdiagonal_block(phys, cfg, q_nb, du_nb, n, mag, positive,
                                 **kw)
    kw.pop("vgrad", None)
    return offdiagonal_scalar(phys, cfg, q_nb, du_nb, n, mag, positive, **kw)


def offdiagonal_block_channels(phys: Physics, cfg, q_nb, du_nb, n, mag,
                               positive, dist=None, mu=None, mut=None,
                               f1=None, vgrad=None):
    """Channel-first block off-diagonal — same math as offdiagonal_block
    (rusanov ∓ TSL, then ·du) expressed as unrolled row matvecs with the
    plane axes last, the form the Pallas sweep kernel consumes."""
    from . import block_jac as bj
    y = bj.rusanov_offdiag_matvec(phys, q_nb, n, mag, positive, du_nb)
    if cfg.get("viscous"):
        vf, vt = bj.tsl_offdiag_matvec(phys, cfg, q_nb, mu, mut, f1, n,
                                       mag, dist, vgrad, left=positive,
                                       du=du_nb)
        s = -1.0 if positive else 1.0
        parts = [y[:phys.ns + 4] + s * vf]
        if phys.nturb:
            parts.append(y[phys.it:] + s * vt)
        y = jnp.concatenate(parts, axis=0)
    return y


def offdiagonal_channels(phys: Physics, cfg, q_nb, du_nb, n, mag, positive,
                         **kw):
    """Dispatch used inside the Pallas sweep kernel body.  approximateRoe
    never reaches here: use_pallas() gates the kernel off for it (the Roe
    off-diagonal needs the diagonal state, which the packed sweep stream
    does not carry)."""
    if cfg.get("block_matrix"):
        return offdiagonal_block_channels(phys, cfg, q_nb, du_nb, n, mag,
                                          positive, **kw)
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
    # block dims for the shear-based skew transforms
    g: int = 0
    dims: tuple = (0, 0, 0)
    block: object = None
    # lazily built static skewed face geometry per sweep side
    _static_nbr: dict = dataclasses.field(default_factory=dict)
    # prepacked static pallas-sweep operands (group-lead contexts only);
    # offsets live in _static_offs (python ints — trace structure, never
    # passed through jit)
    _static_packed: dict = dataclasses.field(default_factory=dict)
    _static_offs: dict = dataclasses.field(default_factory=dict)


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
        unskew_k=unskew_k, mask_lower=mask_lower, mask_upper=mask_upper,
        g=g, dims=(ni, nj, nk), block=block)


# ---------------------------------------------------------------------------
# shear-based skew transforms.
#
# The hyperplane map S[p, a, b] = A[p-1-(a-1)-(b-1) + g, a-1+g, b-1+g] is a
# double shear, expressible as pad + reshape (the classic wavefront /
# diagonal-reindex trick) instead of a gather — TPU gathers over a 3-D
# operand serialize (~1 ms for the rae2822 block; 18 of them dominated the
# iteration), while the shear is a bandwidth-bound relayout.
# Out-of-range slots (|i| beyond the ghost padding) become `fill`; every
# consumer masks those slots (skew_valid / mask channels), exactly as it
# masked the clamped-gather garbage before.
#
# SCALE NOTE (round-5, tools/shear_bench.py): at 5M cells the flatten
# trick's per-row lane rotation runs at only ~12 GB/s standalone
# (17.5 of an 18.3 ms 7-channel shear; a plain copy does 584 GB/s).  A
# stack-of-static-diagonal-slices formulation is 5x faster STANDALONE
# (6.7 ms) but made the full 5M iteration 1.7x SLOWER in context
# (459 -> 790 ms, barrier-insensitive — the A-operand concat graph
# wrecks XLA's scheduling of the surrounding program), so the flatten
# form stays.  At <= 1.13M cells the two are a wash in context.


def _shear_sub(x, d0, dA, Q, fill):
    """out[..., q@d0, ..., a@dA, ...] = x[..., q - a, ..., a, ...] for
    q in [0, Q); out-of-range reads give `fill`."""
    n0 = x.shape[d0]
    A = x.shape[dA]
    L = Q + A
    x = jnp.moveaxis(x, (dA, d0), (-2, -1))       # (..., A, n0)
    pads = [(0, 0)] * (x.ndim - 1) + [(0, L - n0)]
    x = jnp.pad(x, pads, constant_values=fill)     # (..., A, L)
    flat = x.reshape(x.shape[:-2] + (A * L,))
    flat = flat[..., :A * (L - 1)]
    out = flat.reshape(x.shape[:-2] + (A, L - 1))[..., :Q]
    return jnp.moveaxis(out, (-2, -1), (dA, d0))


def _shear_add(x, d0, dA, Q, fill):
    """out[..., q@d0, ..., a@dA, ...] = x[..., q + a, ..., a, ...]"""
    n0 = x.shape[d0]
    A = x.shape[dA]
    L = max(n0, Q + A - 1)
    x = jnp.moveaxis(x, (dA, d0), (-2, -1))
    pads = [(0, 0)] * (x.ndim - 1) + [(0, L - n0)]
    x = jnp.pad(x, pads, constant_values=fill)     # (..., A, L)
    flat = x.reshape(x.shape[:-2] + (A * L,))
    pads = [(0, 0)] * (flat.ndim - 1) + [(0, A)]
    flat = jnp.pad(flat, pads, constant_values=fill)   # (..., A*(L+1))
    out = flat.reshape(x.shape[:-2] + (A, L + 1))[..., :Q]
    return jnp.moveaxis(out, (-2, -1), (dA, d0))


def shear_skew(arr, g, dims, fill=0.0):
    """padded (..., ni+2g, nj+2g, nk+2g) -> skewed (..., P, J2, K2)."""
    ni, nj, nk = dims
    P = ni + nj + nk
    arr = jnp.asarray(arr)
    # crop the in-plane rim to the one ghost layer the skew carries
    x = arr[..., :, g - 1:g + nj + 1, g - 1:g + nk + 1]
    nd = x.ndim
    d_i, d_j, d_k = nd - 3, nd - 2, nd - 1
    # i_pad = (p + 1 + g) - a - b: shear over b, then over a, then shift
    Q = P + g + 2
    y = _shear_sub(x, d_i, d_k, Q, fill)
    z = _shear_sub(y, d_i, d_j, Q, fill)
    sl = [slice(None)] * nd
    sl[d_i] = slice(1 + g, 1 + g + P)
    return z[tuple(sl)]


def shear_unskew(s, dims):
    """skewed (..., P, J2, K2) -> physical (..., ni, nj, nk):
    U[i,j,k] = S[i+j+k+1, j+1, k+1]."""
    ni, nj, nk = dims
    nd = s.ndim
    d_p, d_j, d_k = nd - 3, nd - 2, nd - 1
    sl = [slice(None)] * nd
    sl[d_j] = slice(1, 1 + nj)
    sl[d_k] = slice(1, 1 + nk)
    x = s[tuple(sl)]
    y = _shear_add(x, d_p, d_k, ni + nj + 1, 0.0)
    z = _shear_add(y, d_p, d_j, ni + 1, 0.0)
    sl = [slice(None)] * nd
    sl[d_p] = slice(1, 1 + ni)
    return z[tuple(sl)]


def skew(ctx: ImplicitContext, arr, fill=0.0):
    """(neq, NI, NJ, NK) -> (neq, P, J2, K2)"""
    return shear_skew(arr, ctx.g, ctx.dims, fill)


def skew_gather(ctx: ImplicitContext, arr):
    """gather-based reference implementation (tests only)."""
    return arr[..., ctx.skew_i, ctx.skew_j, ctx.skew_k]


def unskew(ctx: ImplicitContext, arr_skew):
    """(neq, P, J2, K2) -> (neq, ni, nj, nk)"""
    return shear_unskew(arr_skew, ctx.dims)


def unskew_gather(ctx: ImplicitContext, arr_skew):
    return arr_skew[..., ctx.unskew_p, ctx.unskew_j, ctx.unskew_k]


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
    cell = (slice(None),) + tuple(
        slice(g, g + nn) for nn in (block.ni, block.nj, block.nk))
    q_diag = prim[cell]
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
                              positive, q_diag=q_diag, **kw)
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


def diag_mult_channels(phys: Physics, inv_flow_ch, inv_turb_ch, x):
    """Block diag_mult with the inverted blocks streamed as channels:
    inv_flow_ch (N*N, ...) row-major, inv_turb_ch (4, ...) — the Pallas
    kernel form (no trailing matrix axes)."""
    N = phys.ns + 4
    yf = [sum(inv_flow_ch[i * N + j] * x[j] for j in range(N))
          for i in range(N)]
    out = jnp.stack(yf)
    if phys.nturb and inv_turb_ch is not None:
        yt = jnp.stack(
            [inv_turb_ch[0] * x[phys.it] + inv_turb_ch[1] * x[phys.it + 1],
             inv_turb_ch[2] * x[phys.it] + inv_turb_ch[3] * x[phys.it + 1]])
        out = jnp.concatenate([out, yt], axis=0)
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
    """(ni,nj,nk,N,N) -> (P,J2,K2,N,N) in skew slots (identity at the
    ghost rim so inverse application at invalid slots is benign; shear
    fill zones are masked by every consumer)."""
    N = mat.shape[-1]
    ni, nj, nk = ctx.dims
    g = ctx.g
    eye = jnp.broadcast_to(jnp.eye(N, dtype=mat.dtype),
                           (ni + 2 * g, nj + 2 * g, nk + 2 * g, N, N))
    from .sput import set_region
    P = (slice(g, g + ni), slice(g, g + nj), slice(g, g + nk))
    pad = set_region(eye, P, mat)
    pad = jnp.moveaxis(pad, (-2, -1), (0, 1))
    out = shear_skew(pad, g, ctx.dims, 0.0)
    return jnp.moveaxis(out, (0, 1), (-2, -1))


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


def _static_neighbor_geom(ctx, block, side: str, viscous: bool, dtype):
    """Skewed face geometry + masks per direction for one sweep side.
    These are constants per block, so the (slow on device) index gathers
    run ONCE on the host with numpy and the results are cached on the
    context."""
    key = (side, viscous, np.dtype(dtype).name)
    if key in ctx._static_nbr:
        return ctx._static_nbr[key]
    offs = -1 if side == "lower" else 1
    from .case import host_geom
    shape = host_geom(block, "vol").shape
    center = host_geom(block, "center")
    out = {}
    for d in "ijk":
        ax = AX[d]
        si = np.clip(ctx.skew_i + (offs if ax == 0 else 0), 0, shape[0] - 1)
        sj = np.clip(ctx.skew_j + (offs if ax == 1 else 0), 0, shape[1] - 1)
        sk = np.clip(ctx.skew_k + (offs if ax == 2 else 0), 0, shape[2] - 1)
        fi = ctx.skew_i + (1 if (ax == 0 and side == "upper") else 0)
        fj = ctx.skew_j + (1 if (ax == 1 and side == "upper") else 0)
        fk = ctx.skew_k + (1 if (ax == 2 and side == "upper") else 0)
        nvec_all = host_geom(block, f"n_{d}")
        mag_all = host_geom(block, f"mag_{d}")
        fi = np.clip(fi, 0, nvec_all.shape[1] - 1)
        fj = np.clip(fj, 0, nvec_all.shape[2] - 1)
        fk = np.clip(fk, 0, nvec_all.shape[3] - 1)
        mask_n = (ctx.mask_lower if side == "lower" else ctx.mask_upper)[d]
        mask_pad = np.zeros(ctx.skew_valid.shape, dtype=bool)
        mask_pad[ctx.unskew_p, ctx.unskew_j, ctx.unskew_k] = mask_n
        ent = dict(n=nvec_all[:, fi, fj, fk].astype(dtype),
                   mag=mag_all[fi, fj, fk].astype(dtype),
                   mask=mask_pad)
        if viscous:
            c_cell = center[:, ctx.skew_i, ctx.skew_j, ctx.skew_k]
            c_nb = center[:, si, sj, sk]
            ent["dist"] = np.abs(((c_cell - c_nb) * ent["n"]).sum(
                axis=0)).astype(dtype)
        out[d] = ent
    ctx._static_nbr[key] = out
    return out


def skewed_state_slab(phys, cfg, block, ctx, prim, aux=None):
    """One UNSHIFTED skewed stream of the per-cell state channels the
    sweeps read (prim + viscous aux), as (arr, names, counts) with
    arr: (C, P, J2, K2).

    The neighbor state of slot (p, j, k) in ANY of the three directions
    lives in this slab at the previous (lower side) / next (upper side)
    hyperplane with the same in-plane shift the du carry already uses
    (_plane_shift): stepping -1 in i, j or k always steps the plane index
    p = i+j+k by exactly one.  One stream therefore replaces the three
    per-direction sheared copies the sweeps used to carry — 3x less HBM
    traffic and relayout work.  The wrap/clamp slots where the roll-based
    shift differs from the old clamped gather are exactly the slots whose
    contribution the face masks discard (same safety argument as the K2
    block-stacking note below)."""
    viscous = cfg.get("viscous", False)
    parts = [prim]
    names = ["q_nb"]
    if viscous:
        for kk2 in ("mu", "mut", "f1"):
            if aux and aux.get(kk2) is not None:
                parts.append(aux[kk2][None])
                names.append(kk2)
        if aux and aux.get("vgrad") is not None:
            parts.append(aux["vgrad"].reshape((9,) + prim.shape[1:]))
            names.append("vgrad")
    stacked = jnp.concatenate(parts, axis=0)
    sk = shear_skew(stacked, block.g, ctx.dims, 0.0)
    return sk, names, [p.shape[0] for p in parts]


def _slab_kwargs(cfg, slab_plane, names, counts, d, forward, static_d, t):
    """offdiagonal() inputs for direction d: in-plane shift of one
    neighbor-plane slab (the du-carry shift) + channel split, plus the
    static face geometry indexed at plane t."""
    shift = _plane_shift if forward else _plane_shift_up
    sh = shift(slab_plane, d)
    q_nb = None
    kw = {}
    pos = 0
    for nm, c in zip(names, counts):
        v = sh[pos:pos + c]
        pos += c
        if nm == "q_nb":
            q_nb = v
        elif nm == "vgrad":
            kw["vgrad"] = v.reshape((3, 3) + v.shape[1:])
        else:
            kw[nm] = v[0]
    n = jax.lax.dynamic_index_in_dim(static_d["n"], t, 1, False)
    mag = jax.lax.dynamic_index_in_dim(static_d["mag"], t, 0, False)
    mask = jax.lax.dynamic_index_in_dim(static_d["mask"], t, 0, False)
    if cfg.get("viscous", False):
        kw["dist"] = jax.lax.dynamic_index_in_dim(static_d["dist"], t, 0,
                                                  False)
        for kk2 in ("mu", "mut", "f1"):
            kw.setdefault(kk2, None)
    return q_nb, kw, n, mag, mask


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


def offdiag_lagged_skew(phys: Physics, cfg, prep, du_skew, side: str):
    """Lagged opposite-side off-diagonal term, computed ENTIRELY in skew
    space (neq, P, J2, K2), vectorized over all hyperplanes.

    The sweeps' lagged terms (U during forward, L during backward —
    linearSolver.cpp:341-428 uses the PREVIOUS sweep's du there) have no
    recurrence: they read the fully-materialized du_skew at the
    neighboring plane with the same in-plane shifts the carry uses.  The
    old path evaluated them in physical layout (offdiag_sum) and then
    relayouted through skew_from_physical — 6 full-field passes + 6
    shear relayouts per nonlinear iteration; at multi-million cells the
    relayouts alone were ~18 ms each.  All operands here (state slab,
    per-side face geometry) already exist in prep, so this is one fused
    elementwise pass.  Values at invalid skew slots are garbage by
    construction and discarded by the sweeps' `valid` masks / the face
    masks, exactly as the scan body's own contributions are."""
    slab, names, counts = prep["slab"]
    geom = prep[side]
    up = side == "upper"
    # neighbor plane: p+1 (upper) / p-1 (lower); edge planes clamp —
    # their slots are masked
    if up:
        slab_nb = jnp.concatenate([slab[:, 1:], slab[:, -1:]], axis=1)
        du_nb_p = jnp.concatenate([du_skew[:, 1:], du_skew[:, -1:]], axis=1)
    else:
        slab_nb = jnp.concatenate([slab[:, :1], slab[:, :-1]], axis=1)
        du_nb_p = jnp.concatenate([du_skew[:, :1], du_skew[:, :-1]], axis=1)
    q_diag = slab[:counts[0]]

    def bulk_shift(arr, d):
        # same roll as the per-plane carry shift, axes offset by the P axis
        if d == "i":
            return arr
        axis = 2 if d == "j" else 3
        return jnp.roll(arr, -1 if up else 1, axis=axis)

    total = 0.0
    for d in "ijk":
        sh = bulk_shift(slab_nb, d)
        du_nb = bulk_shift(du_nb_p, d)
        q_nb = None
        kw = {}
        pos = 0
        for nm, c in zip(names, counts):
            v = sh[pos:pos + c]
            pos += c
            if nm == "q_nb":
                q_nb = v
            elif nm == "vgrad":
                kw["vgrad"] = v.reshape((3, 3) + v.shape[1:])
            else:
                kw[nm] = v[0]
        if cfg.get("viscous", False):
            kw["dist"] = geom[d]["dist"]
            for kk2 in ("mu", "mut", "f1"):
                kw.setdefault(kk2, None)
        contrib = offdiagonal(phys, cfg, q_nb, du_nb, geom[d]["n"],
                              geom[d]["mag"], not up, q_diag=q_diag, **kw)
        mask = geom[d]["mask"]
        total = total + jnp.where(jnp.asarray(mask)[None], contrib, 0.0)
    return total


# ---------------------------------------------------------------------------
# same-shape block stacking along the k axis.
#
# Every skewed sweep array carries the plane layout (..., P, J2, K2); the
# k axis is pure data parallelism for the wavefront recurrence, so B
# same-shape blocks concatenate along it and sweep as ONE scan / pallas
# call (B x fewer sequential plane steps than per-block sweeps — the
# planes are tiny and latency-bound).  Safety of the circular in-plane
# k-shift at the strip boundaries: the only wrapped reads land in rim
# slots (k=0 / k=K2-1), whose computed values are always discarded by the
# `valid` mask (plane = where(valid, xnew, init)), and every in-range
# slot reads k +/- 1 within its own strip.  (VERDICT round-1 item #9.)


def _cat_k(parts, blk_mat=False):
    """Concatenate per-block skewed arrays along the K2 axis; None and
    python scalars pass through (must then be identical across blocks)."""
    if len(parts) == 1 or parts[0] is None or not hasattr(parts[0], "ndim"):
        return parts[0]
    ax = parts[0].ndim - (3 if blk_mat else 1)
    return jnp.concatenate(parts, axis=ax)


def _group_static_geom(cfg, items, side, dtype):
    """Per-direction static face geometry (n/mag/mask[/dist]) for one
    sweep side, stacked along K2 across the group's blocks."""
    viscous = cfg.get("viscous", False)
    statics = [_static_neighbor_geom(it["ctx"], it["block"], side, viscous,
                                     dtype) for it in items]
    out = {}
    for d in "ijk":
        out[d] = {k2: _cat_k([jnp.asarray(s[d][k2]) for s in statics])
                  for k2 in statics[0][d]}
    return out


def _split_k(planes, k2, n):
    """(neq, P, J2, n*K2) -> n arrays (neq, P, J2, K2)."""
    if n == 1:
        return [planes]
    return [planes[..., b * k2:(b + 1) * k2] for b in range(n)]


def _group_key(cfg, items, side, dtype):
    return (side, bool(cfg.get("viscous", False)), np.dtype(dtype).name,
            tuple(it["block"].index for it in items))


def prepack_group_static(phys, cfg, blocks, ctxs, dtype):
    """Build + cache the packed static pallas-sweep operand for a
    same-shape block group.  Runs at init with concrete device arrays so
    the per-call path never relayouts geometry (the packed array is then
    bound as a jit argument by the driver)."""
    from . import pallas_sweep as ps
    viscous = bool(cfg.get("viscous", False))
    ctx0 = ctxs[0]
    valid = _cat_k([jnp.asarray(c.skew_valid) for c in ctxs])
    for side in ("lower", "upper"):
        statics = [_static_neighbor_geom(c, b, side, viscous, dtype)
                   for c, b in zip(ctxs, blocks)]
        nbr = {d: {k2: _cat_k([s[d][k2] for s in statics])
                   for k2 in statics[0][d]} for d in "ijk"}
        key = (side, viscous, np.dtype(dtype).name,
               tuple(b.index for b in blocks))
        packed, offs = ps.pack_static_sweep(phys, cfg, nbr, valid, dtype,
                                            side)
        if packed is not None:      # None = plane too large for the kernel
            ctx0._static_packed[key] = packed
            ctx0._static_offs[key] = offs


def _group_static_packed(phys, cfg, items, side, nbr_stacked, valid, dtype):
    """Prepacked static operand if the driver prepared one; otherwise
    pack inline (constants fold when geometry is closed over)."""
    from . import pallas_sweep as ps
    ctx0 = items[0]["ctx"]
    key = _group_key(cfg, items, side, dtype)
    if key in ctx0._static_offs:
        return ctx0._static_packed[key], ctx0._static_offs[key]
    return ps.pack_static_sweep(phys, cfg, nbr_stacked, valid, dtype, side)


def prepare_group_sweep(phys: Physics, cfg, items, sides=("lower", "upper")):
    """Iteration-invariant sweep inputs for one same-shape block group.

    Everything here depends only on (prim, aux, b, inv) — fixed across
    the 2*matrixSweeps sweep calls of one nonlinear iteration — so the
    driver computes it ONCE per relaxation and every sweep call reuses
    it; per sweep only the du skew and the lagged opposite-side term are
    rebuilt.  (Previously each of the 8 sweep calls re-sheared three
    per-direction copies of the state channels and re-packed the whole
    pallas operand.)"""
    ctx0 = items[0]["ctx"]
    blk = cfg.get("block_matrix", False)
    dtype = items[0]["b"].dtype
    prep = dict(
        K2=ctx0.skew_valid.shape[-1],
        P=ctx0.nplanes,
        valid=_cat_k([jnp.asarray(it["ctx"].skew_valid) for it in items]),
        b=_cat_k([it["b"] for it in items]),
        inv_f=_cat_k([it["inv_f"] for it in items], blk_mat=blk),
        inv_t=_cat_k([it["inv_t"] for it in items], blk_mat=blk),
    )
    slabs = [skewed_state_slab(phys, cfg, it["block"], it["ctx"],
                               it["prim"], it["aux"]) for it in items]
    prep["slab"] = (_cat_k([s[0] for s in slabs]), slabs[0][1], slabs[0][2])
    from . import pallas_sweep as ps
    prep["pallas"] = ps.use_pallas(cfg, dtype, phys)
    for side in sides:
        geom = _group_static_geom(cfg, items, side, dtype)
        prep[side] = geom
        if prep["pallas"]:
            q = ps.plane_chunk(prep["P"], ps.stream_channels(phys, cfg),
                               prep["valid"].shape[-1] // ps.shard_count(cfg),
                               prep["valid"].shape[-2], dtype,
                               block_matrix=blk)
            if q == 0 and not cfg.get("pallas_interpret"):
                # plane too large for the kernel's VMEM stack — the scan
                # path amortizes fine at this size (per-plane compute is
                # no longer dispatch-bound)
                prep["pallas"] = False
                continue
            q = max(q, 1)
            packed_s, offs_s = _group_static_packed(phys, cfg, items, side,
                                                    geom, prep["valid"],
                                                    dtype)
            packed_i, offs_i, nbr_sub = ps.pack_invariant_sweep(
                phys, cfg, prep["slab"], prep["b"], prep["inv_f"],
                prep["inv_t"], dtype, side, q)
            prep["pallas_" + side] = (packed_s, offs_s, packed_i, offs_i,
                                      nbr_sub, q)
    return prep


def lusgs_forward(phys: Physics, cfg, block, ctx, prim, du_padded, b_skew,
                  inv_flow_skew, inv_turb_skew, with_upper: bool, aux=None):
    """Forward LUSGS sweep for one block (single-item group)."""
    item = dict(block=block, ctx=ctx, prim=prim, du=du_padded, b=b_skew,
                inv_f=inv_flow_skew, inv_t=inv_turb_skew, aux=aux)
    return lusgs_forward_group(phys, cfg, [item], with_upper)[0]


def lusgs_forward_group(phys: Physics, cfg, items, with_upper: bool,
                        prep=None):
    """Forward LUSGS sweep as a scan over hyperplanes, batched over a
    group of same-shape blocks stacked along the k axis
    (reference: linearSolver.cpp:341-383)."""
    if prep is None:
        prep = prepare_group_sweep(
            phys, cfg, items,
            sides=("lower", "upper") if with_upper else ("lower",))
    K2, P = prep["K2"], prep["P"]
    du_skew = _cat_k([skew(it["ctx"], it["du"]) for it in items])
    if with_upper:
        # lagged U from the previous sweep's du, evaluated in skew space
        # (one fused pass; no physical-layout round trip)
        U_term = offdiag_lagged_skew(phys, cfg, prep, du_skew, "upper")
    else:
        U_term = 0.0
    low = prep["lower"]
    valid, b_skew = prep["valid"], prep["b"]
    inv_flow_skew, inv_turb_skew = prep["inv_f"], prep["inv_t"]
    slab, names, counts = prep["slab"]

    def body(carry, t):
        prev = carry  # previous plane (neq, J2, K2), already updated
        slab_nb = jax.lax.dynamic_index_in_dim(slab, t - 1, 1, False)
        q_diag = jax.lax.dynamic_index_in_dim(slab, t, 1,
                                              False)[:counts[0]]
        L = 0.0
        for d in "ijk":
            du_nb = _plane_shift(prev, d)
            q_nb, kw, n, mag, mask = _slab_kwargs(cfg, slab_nb, names,
                                                  counts, d, True, low[d], t)
            contrib = offdiagonal(phys, cfg, q_nb, du_nb, n, mag,
                                  True, q_diag=q_diag, **kw)
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
    if prep["pallas"]:
        packed_s, offs_s, packed_i, offs_i, nbr_sub, q = prep["pallas_lower"]
        packed_w, offs_w = ps.pack_sweep_step(
            du_skew, U_term if with_upper else None, du_skew.dtype)
        planes = ps.sweep(phys, cfg, packed_s, offs_s, packed_i, offs_i,
                          nbr_sub, packed_w, offs_w, carry0, q,
                          forward=True, with_extra=with_upper)
    else:
        # unroll amortizes the TPU while-loop per-step overhead over
        # several hyperplanes (the planes are tiny; dispatch dominates)
        _, planes = jax.lax.scan(body, carry0, jnp.arange(1, P), unroll=8)
    # planes: (P-1, neq, J2, B*K2); prepend plane 0
    all_planes = jnp.concatenate([du_skew[:, :1],
                                  jnp.moveaxis(planes, 0, 1)], axis=1)
    outs = []
    for it, pl_b in zip(items, _split_k(all_planes, K2, len(items))):
        block, ctx = it["block"], it["ctx"]
        x = unskew(ctx, pl_b)
        g = block.g
        Psl = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
               slice(g, g + block.nk))
        outs.append(set_region(it["du"], Psl, x))
    return outs


def lusgs_backward(phys: Physics, cfg, block, ctx, prim, du_padded, b_skew,
                   inv_flow_skew, inv_turb_skew, with_lower: bool, aux=None):
    """Backward LUSGS sweep for one block (single-item group)."""
    item = dict(block=block, ctx=ctx, prim=prim, du=du_padded, b=b_skew,
                inv_f=inv_flow_skew, inv_t=inv_turb_skew, aux=aux)
    return lusgs_backward_group(phys, cfg, [item], with_lower)[0]


def lusgs_backward_group(phys: Physics, cfg, items, with_lower: bool,
                         prep=None):
    """Backward LUSGS sweep, batched over a group of same-shape blocks
    stacked along the k axis (reference: linearSolver.cpp:385-428)."""
    if prep is None:
        prep = prepare_group_sweep(
            phys, cfg, items,
            sides=("upper", "lower") if with_lower else ("upper",))
    K2, P = prep["K2"], prep["P"]
    du_skew = _cat_k([skew(it["ctx"], it["du"]) for it in items])
    if with_lower:
        L_term = offdiag_lagged_skew(phys, cfg, prep, du_skew, "lower")
    else:
        L_term = None
    upp = prep["upper"]
    valid, b_skew = prep["valid"], prep["b"]
    inv_flow_skew, inv_turb_skew = prep["inv_f"], prep["inv_t"]
    slab, names, counts = prep["slab"]

    def body(carry, t):
        nxt = carry  # next plane (t+1), already updated
        slab_nb = jax.lax.dynamic_index_in_dim(slab, t + 1, 1, False)
        q_diag = jax.lax.dynamic_index_in_dim(slab, t, 1,
                                              False)[:counts[0]]
        U = 0.0
        for d in "ijk":
            du_nb = _plane_shift_up(nxt, d)
            q_nb, kw, n, mag, mask = _slab_kwargs(cfg, slab_nb, names,
                                                  counts, d, False, upp[d], t)
            contrib = offdiagonal(phys, cfg, q_nb, du_nb, n, mag,
                                  False, q_diag=q_diag, **kw)
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
    if prep["pallas"]:
        packed_s, offs_s, packed_i, offs_i, nbr_sub, q = prep["pallas_upper"]
        packed_w, offs_w = ps.pack_sweep_step(
            du_skew, L_term if with_lower else None, du_skew.dtype)
        planes_proc = ps.sweep(phys, cfg, packed_s, offs_s, packed_i, offs_i,
                               nbr_sub, packed_w, offs_w, carry0, q,
                               forward=False, with_extra=with_lower)
        # processing order is P-2..0; reverse to natural plane order
        all_planes = jnp.concatenate(
            [jnp.moveaxis(planes_proc, 0, 1)[:, ::-1], du_skew[:, P - 1:]],
            axis=1)
    else:
        _, planes = jax.lax.scan(body, carry0, jnp.arange(P - 2, -1, -1),
                                 unroll=8)
        all_planes = jnp.concatenate(
            [jnp.moveaxis(planes, 0, 1)[:, ::-1], du_skew[:, P - 1:]], axis=1)
    outs = []
    for it, pl_b in zip(items, _split_k(all_planes, K2, len(items))):
        block, ctx = it["block"], it["ctx"]
        x = unskew(ctx, pl_b)
        g = block.g
        Psl = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
               slice(g, g + block.nk))
        outs.append(set_region(it["du"], Psl, x))
    return outs


def skew_scalar(ctx, arr_padded):
    """(NI,NJ,NK) scalar -> (P, J2, K2)"""
    return shear_skew(arr_padded, ctx.g, ctx.dims)


def _embed_physical(ctx, arr_phys, fill):
    """physical-cell array -> padded array with `fill` in ghosts."""
    ni, nj, nk = ctx.dims
    g = ctx.g
    pads = [(0, 0)] * (arr_phys.ndim - 3) + [(g, g)] * 3
    return jnp.pad(jnp.asarray(arr_phys), pads, constant_values=fill)


def skew_from_physical(ctx, arr_phys):
    """embed physical-cell array (neq, ni,nj,nk) or (ni,nj,nk) into skew
    slots (zeros / ones elsewhere — both benign: non-valid slots are
    masked by every consumer)."""
    fill = 0.0 if arr_phys.ndim == 4 else 1.0
    return shear_skew(_embed_physical(ctx, arr_phys, fill), ctx.g, ctx.dims,
                      fill)


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
