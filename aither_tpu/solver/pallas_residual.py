"""Fused viscous-residual Pallas kernel: the "hot loop 2" fusion.

``viscous_residual`` (viscous.py) materializes ~18 face-sized gradient
fields per direction in HBM (written once, read by the flux assembly and
the cell-average accumulation) — on the 1.13M-cell rae2822 extrusion
that is ~2 GB of HBM round-trips per iteration, the single largest cost
of the residual (reference hot loop: procBlock.cpp:1233-1879
CalcViscFluxI/J/K with the face-CV gradient stencil of :1190-1231).

This kernel computes the SAME math with zero face-sized HBM traffic:
one march along the block's longest axis; at every step the kernel holds
a 3-plane window of the primitive state in VMEM and computes, for the
cell plane at the window center, ALL THREE directions' face-CV
gradients, eddy viscosity, viscous fluxes, spectral radii, and 1/6
cell-average accumulations — emitting one packed cell plane.  Marching
faces hand their values to the next step through a VMEM carry (the same
sequential-grid carry pattern as pallas_sweep.py).  Transverse planes
are flattened to the lane dimension; in-plane neighbor access is a lane
shift whose wrap garbage lands only in ghost rings the caller slices
away.

Face geometry (the six CV area vectors, volumes, interpolation
coefficients, wall distance at faces) is precomputed once per case into
a packed (steps, C, rows, cols) array stored in ``block.geom`` so it
rides the driver's geometry jit arguments instead of inlining into
executables.

Plane layout: transverse planes stay 2-D — one transverse axis on
sublanes, the other on lanes (orientation chosen per case to minimize
(8, 128) tile padding).  An in-plane neighbor access is then a sublane
roll or a lane roll confined to one lane tile whenever the lane-axis
extent is <= 128 — unlike the earlier flattened-lane layout whose
every neighbor access was a dynamic rotate across ceil(T/128) lane
tiles (Mosaic compile blew up past ~10 tiles).  Wrap garbage still
lands only in ghost rings the caller slices away.

Exactness: every formula mirrors viscous.py expression-for-expression
(same operand order), pinned by tests/test_pallas_residual.py
interpreter-mode parity against viscous_residual on real cases.

Scope (fallback to viscous.py otherwise): single species, scalar
(non-block-matrix) solver, central viscous reconstruction, no wall-law
surfaces, no LODI pressure-gradient carry, caloricallyPerfect thermo,
need_aux=False (the per-iteration hot path; the output path re-evaluates
through the reference JAX implementation).

Compiled-mode use is gated by ``use_march`` (measured status note
there); cfg["pallas_march"] forces it on for experimentation and
cfg["no_pallas"] forces it off.  The interpreter-mode parity tests
(tests/test_pallas_residual.py) pin the math against viscous.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid.geometry import AX
from ..physics.models import Physics
from . import state as st
from .viscous import SST, WALE, WILCOX, sigma_k, sigma_w, turb_prandtl
from .reconstruction import _lagrange_coeff

EPS = 1.0e-30

# conservative plane-channel margin for Mosaic's VMEM-stack temporaries
# in the unrolled 3-direction face math (same budgeting idea as
# pallas_sweep.plane_chunk), on top of the statically known pipeline
# buffers counted in use_march
TEMP_CH = 260


def plane_dims(block):
    """((rows, cols), orient): the 2-D transverse-plane layout.

    orient "ab" puts axis a on sublanes / b on lanes, "ba" the swap;
    chosen to minimize the (8, 128) f32 tile-padding footprint."""
    m, a, b = march_axes(block)
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    g = block.g
    A2, B2 = dims[a] + 2 * g, dims[b] + 2 * g

    def padded(r, c):
        return (-(-r // 8) * 8) * (-(-c // 128) * 128)

    if padded(A2, B2) <= padded(B2, A2):
        return (A2, B2), "ab"
    return (B2, A2), "ba"


def march_axes(block):
    """(m, a, b): march along the longest grid dim, transverse axes in
    ijk order."""
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    m = max("ijk", key=lambda d: (dims[d], d))
    a, b = [d for d in "ijk" if d != m]
    return m, a, b


def use_march(phys: Physics, cfg, block, dtype, for_prepack=False) -> bool:
    if cfg.get("no_pallas") or cfg.get("no_pallas_march") \
            or not cfg.get("viscous"):
        return False
    if not for_prepack and getattr(block, "_vmarch_meta", None) is None:
        # statics are prepacked at Solver init from concrete geometry;
        # blocks without them (e.g. coarse MG levels) use the JAX path
        return False
    if phys.ns != 1 or cfg.get("block_matrix"):
        return False
    if cfg.get("need_pgrad"):
        return False
    if cfg["viscous_recon"] == "centralFourth":
        return False
    if phys.thermo_model == "thermallyPerfect":
        return False
    for spec in block.surfaces:
        if (spec.bc_type == "viscousWall" and spec.data is not None
                and spec.data.wall_law):
            return False
    m, a, b = march_axes(block)
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    if dims[m] < 2:
        return False
    itemsize = np.dtype(dtype).itemsize
    if cfg.get("pallas_interpret"):
        return True
    # Compiled-mode status (measured, TPU v5e, 2-D plane layout): the
    # kernel compiles fast now (25 s on rae2822 2-D, 88 s on the nk=24
    # extrusion vs the old flattened-lane layout's unbounded Mosaic
    # compiles) and matches the JAX path to f32 roundoff, but does NOT
    # beat it: 2.83 vs 2.85 ms on rae2822 2-D, 5.51 vs 3.71 ms on the
    # 0.57M-cell extrusion — the ~15 us/grid-step pipeline floor of the
    # serial march exceeds what the avoided HBM traffic buys at these
    # sizes.  Opt-in via cfg["pallas_march"] for experimentation.
    if not cfg.get("pallas_march"):
        return False
    if dtype != jnp.float32:
        return False
    # VMEM budget: statically known pipeline buffers + TEMP_CH margin
    # for Mosaic's kernel temporaries must fit in ~16M of VMEM
    (rows, cols), _ = plane_dims(block)
    plane_bytes = (-(-rows // 8) * 8) * (-(-cols // 128) * 128) * itemsize
    neq = phys.neq
    is_rans = phys.nturb > 0
    cs = 3 * (6 * 3 + 3 + 7) + 5            # statics channels (see prepack)
    cout = neq + 4 + 9 + (6 if is_rans else 0) + 3
    cc = neq + 9 + (6 if is_rans else 0) + 3
    fixed = 2 * (cs + cout) + 4 * (neq + 2) + cc
    if (fixed + TEMP_CH) * plane_bytes > 15 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# static prepack


def prepack_march_static(phys: Physics, cfg, block, dtype):
    """Packed per-step face/cell geometry: (nsteps, Cs, rows, cols) with
    nsteps = nm + g + 1; step p carries the m-face f=p-g channels and the
    emission channels of cell c=p-g-1 (in-plane face arrays + cell
    fields).  All values equal viscous_residual's (full-padded-plane
    versions; ghost-ring entries are unused garbage)."""
    m, a, b = march_axes(block)
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    nm, na, nb = dims[m], dims[a], dims[b]
    A2, B2 = na + 2 * g, nb + 2 * g
    T = A2 * B2
    nsteps = nm + g + 1
    geom = block.geom

    def to_mab(arr, vec=False):
        x = np.asarray(arr)
        off = 1 if vec else 0
        perm = tuple(range(off)) + tuple(off + AX[d] for d in (m, a, b))
        return np.transpose(x, perm)

    A_ = {d: to_mab(np.asarray(geom[f"n_{d}"])
                    * np.asarray(geom[f"mag_{d}"])[None], vec=True)
          for d in (m, a, b)}
    mag = {d: to_mab(geom[f"mag_{d}"]) for d in (m, a, b)}
    vol = to_mab(geom["vol"])
    wd = to_mab(geom["wall_dist"])
    width = {d: to_mab(geom[f"width_{d}"]) for d in (m, a, b)}

    fields = {}

    def zeros(k):
        return np.zeros((nsteps, k, A2, B2), np.float64)

    def central_cc(w_lo, w_hi):
        c = _lagrange_coeff([w_lo[None], w_hi[None]], 1, 0, 0)
        return np.asarray(c[0])[0], np.asarray(c[1])[0]

    names = ("adu", "adl", "a1u", "a1l", "a2u", "a2l", "vcv", "n", "mag",
             "c0", "c1", "wdf", "len")
    kk = dict(adu=3, adl=3, a1u=3, a1l=3, a2u=3, a2l=3, vcv=1, n=3,
              mag=1, c0=1, c1=1, wdf=1, len=1)
    for r in ("m", "a", "b"):
        for nmc in names:
            fields[f"{r}_{nmc}"] = zeros(kk[nmc])
    for nmc in ("c_vol", "c_fmag_m", "c_fmag_a", "c_fmag_b", "c_wmax"):
        fields[nmc] = zeros(1)

    own_axis = {a: -2, b: -1}

    def faces_lo_hi(dd, plane3):
        """(lower-face, upper-face) arrays indexed by cell position along
        dd's own in-plane axis; plane3 = A_[dd][:, m_idx] (3, A?, B?)."""
        ax = own_axis[dd]
        n_t = plane3.shape[ax]
        lo = plane3.take(range(0, n_t - 1), axis=ax)
        hi = plane3.take(range(1, n_t), axis=ax)
        return lo, hi

    # ---- m-face group (face f = p - g; valid p in [g, g+nm])
    m_t1, m_t2 = [d for d in "ijk" if d != m]   # == (a, b)
    for p in range(g, g + nm + 1):
        f = p - g
        mf = g + f
        Am = A_[m]
        fields["m_adu"][p] = 0.5 * (Am[:, mf] + Am[:, mf + 1])
        fields["m_adl"][p] = 0.5 * (Am[:, mf] + Am[:, mf - 1])
        for slot, dd in (("1", m_t1), ("2", m_t2)):
            lo_f, hi_f = faces_lo_hi(dd, None) if False else (None, None)
            ax = own_axis[dd]
            # fvec(dd, off_d, off_own): m planes p-1+off_d; own-axis face
            # index (cell t) + off_own
            Ad_lo = A_[dd][:, p - 1]
            Ad_hi = A_[dd][:, p]
            n_t = Ad_lo.shape[ax]
            lo_l = Ad_lo.take(range(0, n_t - 1), axis=ax)
            lo_u = Ad_lo.take(range(1, n_t), axis=ax)
            hi_l = Ad_hi.take(range(0, n_t - 1), axis=ax)
            hi_u = Ad_hi.take(range(1, n_t), axis=ax)
            fields[f"m_a{slot}u"][p] = 0.5 * (hi_u + lo_u)
            fields[f"m_a{slot}l"][p] = 0.5 * (hi_l + lo_l)
        fields["m_vcv"][p] = (0.5 * (vol[p - 1] + vol[p]))[None]
        nmag = mag[m][mf]
        fields["m_n"][p] = A_[m][:, mf] / np.where(nmag == 0.0, 1.0, nmag)
        fields["m_mag"][p] = nmag[None]
        c_hi, c_lo = central_cc(width[m][p - 1], width[m][p])
        fields["m_c0"][p] = c_hi[None]
        fields["m_c1"][p] = c_lo[None]
        wdf = c_hi * wd[p] + c_lo * wd[p - 1]
        wdf = np.where((wdf < 0.0) & (wdf > -1.0e-10), 0.0, wdf)
        fields["m_wdf"][p] = wdf[None]
        fields["m_len"][p] = (0.5 * (width[m][p - 1] + width[m][p]))[None]

    # ---- in-plane face groups (valid p in [g+1, g+nm]; face arrays are
    # indexed by the hi-cell padded position q along the own axis)
    for r, dd in (("a", a), ("b", b)):
        ax = own_axis[dd]
        t1, t2 = [x for x in "ijk" if x != dd]
        for p in range(g + 1, g + nm + 1):
            mc = p - 1
            here_lo, here_hi = faces_lo_hi(dd, A_[dd][:, mc])
            fields[f"{r}_adu"][p] = 0.5 * (here_lo + here_hi)
            prv = np.roll(here_lo, 1, axis=ax)
            fields[f"{r}_adl"][p] = 0.5 * (here_lo + prv)
            for slot, tt in (("1", t1), ("2", t2)):
                if tt == m:
                    up = A_[m][:, mc + 1]
                    lo = A_[m][:, mc]
                else:
                    lo, up = faces_lo_hi(tt, A_[tt][:, mc])
                fields[f"{r}_a{slot}u"][p] = 0.5 * (
                    up + np.roll(up, 1, axis=ax))
                fields[f"{r}_a{slot}l"][p] = 0.5 * (
                    lo + np.roll(lo, 1, axis=ax))
            vc = vol[mc]
            fields[f"{r}_vcv"][p] = (
                0.5 * (np.roll(vc, 1, axis=ax) + vc))[None]
            nmag_lo, _ = faces_lo_hi(dd, A_[dd][:, mc])
            mag_lo = mag[dd][mc].take(
                range(0, mag[dd][mc].shape[ax] - 1), axis=ax)
            fields[f"{r}_n"][p] = nmag_lo / np.where(mag_lo == 0.0, 1.0,
                                                     mag_lo)
            fields[f"{r}_mag"][p] = mag_lo[None]
            w_hi = width[dd][mc]
            w_lo = np.roll(w_hi, 1, axis=ax)
            c_hi, c_lo = central_cc(w_lo, w_hi)
            fields[f"{r}_c0"][p] = c_hi[None]
            fields[f"{r}_c1"][p] = c_lo[None]
            wd_hi = wd[mc]
            wd_lo = np.roll(wd_hi, 1, axis=ax)
            wdf = c_hi * wd_hi + c_lo * wd_lo
            wdf = np.where((wdf < 0.0) & (wdf > -1.0e-10), 0.0, wdf)
            fields[f"{r}_wdf"][p] = wdf[None]
            fields[f"{r}_len"][p] = (0.5 * (w_lo + w_hi))[None]

    # ---- cell group (cell c = p-g-1)
    for p in range(g + 1, g + nm + 1):
        mc = p - 1
        fields["c_vol"][p] = vol[mc][None]
        fields["c_fmag_m"][p] = (0.5 * (mag[m][mc - g + g]
                                        + mag[m][mc + 1]))[None] \
            if False else (0.5 * (mag[m][mc] + mag[m][mc + 1]))[None]
        for r, dd in (("a", a), ("b", b)):
            ax = own_axis[dd]
            md = mag[dd][mc]
            n_t = md.shape[ax]
            lo = md.take(range(0, n_t - 1), axis=ax)
            hi = md.take(range(1, n_t), axis=ax)
            fields[f"c_fmag_{r}"][p] = (0.5 * (lo + hi))[None]
        fields["c_wmax"][p] = np.maximum(
            np.maximum(width[m][mc], width[a][mc]), width[b][mc])[None]

    offs = {}
    parts = []
    c0 = 0
    for name in sorted(fields):
        arr = fields[name]
        offs[name] = (c0, arr.shape[1])
        c0 += arr.shape[1]
        parts.append(arr)
    pack = np.concatenate(parts, axis=1)        # (nsteps, Cs, A2, B2)
    (rows, cols), orient = plane_dims(block)
    if orient == "ba":
        pack = pack.swapaxes(-2, -1)
    meta = dict(m=m, a=a, b=b, offs=offs, nsteps=nsteps, A2=A2, B2=B2,
                T=T, Cs=c0, rows=rows, cols=cols, orient=orient)
    return jnp.asarray(pack.astype(np.dtype(dtype))), meta


def ensure_static(phys, cfg, block, dtype):
    if getattr(block, "_vmarch_meta", None) is None:
        pack, meta = prepack_march_static(phys, cfg, block, dtype)
        block.geom["vmarch_pack"] = pack
        block._vmarch_meta = meta
    return block._vmarch_meta


# ---------------------------------------------------------------------------
# kernel math (channel planes: (rows, cols) or (k, rows, cols) arrays)


def _sh(x, shift, axis):
    """value[q] = x[q - shift] along plane ``axis`` (-1 lanes, -2
    sublanes) — np.roll semantics via the TPU rotate primitive (a
    slice+concat formulation produces unaligned vector concatenates
    Mosaic rejects); wrap garbage lands only in ghost rings the caller
    slices away.  With the 2-D plane layout a lane roll touches only
    ceil(cols/128) tiles and a sublane roll is a cheap vreg shuffle."""
    if shift == 0:
        return x
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis=x.ndim + axis)


def _eddy_wilcox_ch(phys, vg, q_it, q_it1, rho_f):
    """kOmegaWilcox2006 branch of viscous.eddy_visc_and_blending,
    channel form (no .at[].set)."""
    scaling = phys.nondim_scaling
    w = WILCOX
    trace = vg[0][0] + vg[1][1] + vg[2][2]
    dd = 0.0
    for A in range(3):
        for B in range(3):
            s = 0.5 * (vg[A][B] + vg[B][A]) - (
                trace / 3.0 if A == B else 0.0)
            dd = dd + s * s
    omega_tilda = jnp.maximum(
        q_it1, scaling * w["clim"] * jnp.sqrt(2.0 * dd / w["beta_star"]))
    mut = rho_f * q_it / omega_tilda
    return mut, jnp.ones_like(mut), jnp.zeros_like(mut)


def _eddy_sst_ch(phys, vg, kg, wg, q_it, q_it1, rho_f, muf, wdf):
    """sst2003/sstdes branch of viscous.eddy_visc_and_blending."""
    scaling = phys.nondim_scaling
    s = SST
    alpha1 = scaling * jnp.sqrt(q_it) / (
        s["beta_star"] * q_it1 * (wdf + EPS))
    alpha2 = scaling * scaling * 500.0 * muf / (
        (wdf + EPS) ** 2 * rho_f * q_it1)
    kdotw = kg[0] * wg[0] + kg[1] * wg[1] + kg[2] * wg[2]
    cdkw = jnp.maximum(2.0 * rho_f * s["sigma_w2"] / q_it1 * kdotw, 1.0e-10)
    alpha3 = 4.0 * rho_f * s["sigma_w2"] * q_it / (cdkw * (wdf + EPS) ** 2)
    f1 = jnp.tanh(jnp.minimum(jnp.maximum(alpha1, alpha2), alpha3) ** 4)
    f2 = jnp.tanh(jnp.maximum(2.0 * alpha1, alpha2) ** 2)
    dd = 0.0
    for A in range(3):
        for B in range(3):
            sr = 0.5 * (vg[A][B] + vg[B][A])
            dd = dd + sr * sr
    mean_sr = jnp.sqrt(2.0 * dd)
    mut = rho_f * s["a1"] * q_it / jnp.maximum(
        s["a1"] * q_it1, scaling * mean_sr * f2)
    return mut, f1, f2


def _eddy_wale_ch(vg, length):
    """wale branch (reference form: no rho, no 1/scaling —
    turbulence.cpp:967-990, see viscous.eddy_visc_and_blending)."""
    g2 = [[sum(vg[A][C] * vg[C][B] for C in range(3)) for B in range(3)]
          for A in range(3)]
    tr = g2[0][0] + g2[1][1] + g2[2][2]
    sdd = 0.0
    srr = 0.0
    for A in range(3):
        for B in range(3):
            sd = 0.5 * (g2[A][B] + g2[B][A]) - (tr / 3.0 if A == B else 0.0)
            sdd = sdd + sd * sd
            sr = 0.5 * (vg[A][B] + vg[B][A])
            srr = srr + sr * sr
    num = sdd ** 1.5
    den = srr ** 2.5 + sdd ** 1.25 + EPS
    mut = (WALE["cw"] * length) ** 2 * num / den
    return mut, jnp.ones_like(mut), jnp.zeros_like(mut)


def _face_pass(phys, cfg, cells, tcells, mucells, S, is_turb, is_rans):
    """One direction's face computation at every face of a plane.

    ``cells(off_d, o1, o2)`` mirrors viscous.face_cv_gradients' accessor
    (cell state at the face's lo/hi cell with transverse offsets);
    tcells/mucells the temperature/viscosity analogues.  S holds this
    direction's static channels.  Returns the per-face dict the cell
    emission consumes.  Mirrors viscous.viscous_residual's face section
    for ns == 1 (no diffusion, no wall law)."""
    scaling = phys.nondim_scaling
    model = cfg["turb_model"]
    q_lo = cells(0)
    q_hi = cells(1)
    c0 = S["c0"][0]
    c1 = S["c1"][0]
    qf = c0 * q_hi + c1 * q_lo
    if is_rans:
        tmin = phys.turb_min()
        qf = jnp.concatenate([
            qf[:phys.it],
            jnp.maximum(qf[phys.it:phys.it + 1], tmin[0]),
            jnp.maximum(qf[phys.it + 1:phys.it + 2], tmin[1])], axis=0)
    muf = c0 * mucells(1) + c1 * mucells(0)

    adu, adl = S["adu"], S["adl"]
    a1u, a1l = S["a1u"], S["a1l"]
    a2u, a2l = S["a2u"], S["a2l"]
    vcv = S["vcv"][0]

    def face_vals(q_lo_x, q_hi_x, qs):
        v_1u = 0.25 * (q_lo_x + q_hi_x + qs(1, 1, 0) + qs(0, 1, 0))
        v_1l = 0.25 * (q_lo_x + q_hi_x + qs(1, -1, 0) + qs(0, -1, 0))
        v_2u = 0.25 * (q_lo_x + q_hi_x + qs(1, 0, 1) + qs(0, 0, 1))
        v_2l = 0.25 * (q_lo_x + q_hi_x + qs(1, 0, -1) + qs(0, 0, -1))
        return v_1l, v_1u, v_2l, v_2u

    def grad_scalar(q_lo_x, q_hi_x, qs):
        v1l, v1u, v2l, v2u = face_vals(q_lo_x, q_hi_x, qs)
        return [(q_hi_x * adu[comp] - q_lo_x * adl[comp]
                 + v1u * a1u[comp] - v1l * a1l[comp]
                 + v2u * a2u[comp] - v2l * a2l[comp]) / vcv
                for comp in range(3)]

    vel_lo = q_lo[phys.mx:phys.mx + 3]
    vel_hi = q_hi[phys.mx:phys.mx + 3]

    def vel_at(od, o1, o2):
        return cells(od, o1, o2)[phys.mx:phys.mx + 3]

    v1l, v1u, v2l, v2u = face_vals(vel_lo, vel_hi, vel_at)
    # vg[A][B] = d v_B / d x_A
    vg = [[(vel_hi[B] * adu[A] - vel_lo[B] * adl[A]
            + v1u[B] * a1u[A] - v1l[B] * a1l[A]
            + v2u[B] * a2u[A] - v2l[B] * a2l[A]) / vcv
           for B in range(3)] for A in range(3)]
    tg = grad_scalar(tcells(0), tcells(1), tcells)
    kg = wg = None
    if is_rans:
        kg = grad_scalar(q_lo[phys.it], q_hi[phys.it],
                         lambda *o: cells(*o)[phys.it])
        wg = grad_scalar(q_lo[phys.it + 1], q_hi[phys.it + 1],
                         lambda *o: cells(*o)[phys.it + 1])

    wdf = S["wdf"][0]
    length = S["len"][0]
    rho_f = qf[:phys.ns].sum(axis=0)
    mutf = jnp.zeros_like(muf)
    f1f = jnp.zeros_like(muf)
    f2f = jnp.zeros_like(muf)
    if is_turb:
        if model == "kOmegaWilcox2006":
            mutf, f1f, f2f = _eddy_wilcox_ch(
                phys, vg, qf[phys.it], qf[phys.it + 1], rho_f)
        elif model in ("sst2003", "sstdes"):
            mutf, f1f, f2f = _eddy_sst_ch(
                phys, vg, kg, wg, qf[phys.it], qf[phys.it + 1], rho_f,
                muf, wdf)
        elif model == "wale":
            mutf, f1f, f2f = _eddy_wale_ch(vg, length)
        else:
            raise ValueError(f"unsupported turbulence model {model!r}")

    nvec = S["n"]
    mag = S["mag"][0]
    mu_s = scaling * muf
    mut_s = scaling * mutf

    # tau_normal (viscous.tau_normal), channel form: same ops/order
    mu_eff = mu_s + mut_s
    lam = -2.0 / 3.0 * mu_eff
    trace_v = vg[0][0] + vg[1][1] + vg[2][2]
    tau = [lam * trace_v * nvec[A] + mu_eff * (
        (vg[A][0] + vg[0][A]) * nvec[0]
        + (vg[A][1] + vg[1][A]) * nvec[1]
        + (vg[A][2] + vg[2][A]) * nvec[2]) for A in range(3)]

    tf = st.temperature(phys, qf)
    mff = qf[:phys.ns] / rho_f[None]
    k_eff = scaling * phys.conductivity(tf, mff)
    cp = phys.mix(phys.species_cp(tf), mff)
    kt = mut_s * cp / turb_prandtl(model) if is_turb else 0.0
    velf = st.velocity(phys, qf)
    tgn = tg[0] * nvec[0] + tg[1] * nvec[1] + tg[2] * nvec[2]
    e_flux = (tau[0] * velf[0] + tau[1] * velf[1] + tau[2] * velf[2]
              + (k_eff + kt) * tgn)

    parts = [jnp.zeros((phys.ns,) + qf.shape[1:], qf.dtype),
             jnp.stack(tau), e_flux[None]]
    if is_rans:
        mutt = mut_s
        if model == "kOmegaWilcox2006":
            mutt = scaling * rho_f * qf[phys.it] / qf[phys.it + 1]
        kgn = kg[0] * nvec[0] + kg[1] * nvec[1] + kg[2] * nvec[2]
        wgn = wg[0] * nvec[0] + wg[1] * nvec[1] + wg[2] * nvec[2]
        parts.append(((mu_s + sigma_k(model, f1f) * mutt) * kgn)[None])
        parts.append(((mu_s + sigma_w(model, f1f) * mutt) * wgn)[None])
    flux = jnp.concatenate(parts, axis=0)
    fa = flux * mag[None]
    return dict(fa=fa, vg=vg, kg=kg, wg=wg, mutf=mutf, f1f=f1f, f2f=f2f)


def _cell_specrad(phys, cfg, cell_q, cell_t, cell_mu, mut_lo, f1_lo, fmag,
                  vol_c, is_turb, is_rans):
    """Per-direction viscous spectral-radius / diagonal contributions
    (viscous.viscous_residual cell section, identical operand order)."""
    scaling = phys.nondim_scaling
    model = cfg["turb_model"]
    visc_coeff = cfg["viscous_cfl_coeff"]
    r_c = cell_q[:phys.ns].sum(axis=0)
    mf_c = cell_q[:phys.ns] / r_c[None]
    gam = phys.gamma(cell_t, mf_c)
    max_term = jnp.maximum(4.0 / (3.0 * r_c), gam / r_c)
    prand = 4.0 * gam / (9.0 * gam - 5.0)
    visc_term = scaling * (cell_mu / prand
                           + (mut_lo / turb_prandtl(model)
                              if is_turb else 0.0))
    vsr = max_term * visc_term * fmag * fmag / vol_c
    out = dict(sr_flow=visc_coeff * vsr, diag_flow=2.0 * vsr,
               sr_turb=None, diag_turb=None)
    if is_rans:
        if model == "kOmegaWilcox2006":
            mut_nolim = r_c * cell_q[phys.it] / cell_q[phys.it + 1]
            tvsr = scaling * (fmag * fmag / vol_c) / r_c * (
                cell_mu + sigma_k(model, 1.0) * mut_nolim)
        else:
            tvsr = scaling * (fmag * fmag / vol_c) / r_c * (
                cell_mu + sigma_k(model, f1_lo) * mut_lo)
        out["sr_turb"] = visc_coeff * tvsr
        out["diag_turb"] = 2.0 * tvsr
    return out


def _carry_layout(phys, is_rans):
    neq = phys.neq
    names = [("fa", neq), ("vg", 9)]
    if is_rans:
        names += [("kg", 3), ("wg", 3)]
    names += [("mutf", 1), ("f1f", 1), ("f2f", 1)]
    offs = {}
    c = 0
    for nm_, k in names:
        offs[nm_] = (c, k)
        c += k
    return offs, c


def _pack_face(face, offs):
    parts = []
    for name in offs:
        if name == "fa":
            parts.append(face["fa"])
        elif name == "vg":
            parts.append(jnp.stack([face["vg"][A][B]
                                    for A in range(3) for B in range(3)]))
        elif name in ("kg", "wg"):
            parts.append(jnp.stack(face[name]))
        else:
            parts.append(face[name][None])
    return jnp.concatenate(parts, axis=0)


def viscous_residual_march(phys: Physics, cfg, block, prim, t_all, mu_all):
    """Drop-in for viscous.viscous_residual(..., need_aux=False,
    need_pgrad=False) on the supported scope — same return tuple."""
    meta = ensure_static(phys, cfg, block, prim.dtype)
    m, a, b = meta["m"], meta["a"], meta["b"]
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    nm, na, nb = dims[m], dims[a], dims[b]
    A2, B2 = meta["A2"], meta["B2"]
    rows, cols, orient = meta["rows"], meta["cols"], meta["orient"]
    nsteps = meta["nsteps"]
    offs_s = meta["offs"]
    Cs = meta["Cs"]
    neq = phys.neq
    dtype = prim.dtype
    is_rans = phys.nturb > 0
    is_turb = cfg.get("turbulent", is_rans)
    sixth = 1.0 / 6.0

    perm = (0, 1 + AX[m], 1 + AX[a], 1 + AX[b])

    def to_planes(x):
        """(M2, k?, A2, B2) -> (nsteps, k?, rows, cols)."""
        if orient == "ba":
            x = jnp.swapaxes(x, -2, -1)
        return x[:nsteps]

    prim_m = to_planes(jnp.moveaxis(jnp.transpose(prim, perm), 1, 0))
    sperm = tuple(x - 1 for x in perm[1:])
    t_m = to_planes(jnp.transpose(t_all, sperm)[:, None])
    mu_m = to_planes(jnp.transpose(mu_all, sperm)[:, None])
    statics = block.geom["vmarch_pack"]

    carry_offs, Cc = _carry_layout(phys, is_rans)
    ca_keys = (["vel"] + (["tke", "omega"] if is_rans else [])
               + ["mut", "f1", "f2"])
    out_offs, Cout = {}, 0
    for name, k in ([("resid", neq), ("sr_flow", 1), ("sr_turb", 1),
                     ("diag_flow", 1), ("diag_turb", 1), ("vel", 9)]
                    + ([("tke", 3), ("omega", 3)] if is_rans else [])
                    + [("mut", 1), ("f1", 1), ("f2", 1)]):
        out_offs[name] = (Cout, k)
        Cout += k

    ax_of = {a: -2, b: -1} if orient == "ab" else {a: -1, b: -2}

    def sh_inplane(axis_letter, x, o):
        """in-plane neighbor: source offset +o along the axis."""
        return _sh(x, -o, ax_of[axis_letter])

    def kernel(prim_ref, t_ref, mu_ref, s_ref, out_ref,
               w_prim, w_t, w_mu, carry):
        p = pl.program_id(0)
        fresh = prim_ref[0]
        t_fresh = t_ref[0]
        mu_fresh = mu_ref[0]
        S = s_ref[0]

        def stat(name):
            o, k = offs_s[name]
            return S[o:o + k]

        def sdir(r):
            return {key: stat(f"{r}_{key}") for key in
                    ("adu", "adl", "a1u", "a1l", "a2u", "a2l", "vcv",
                     "n", "mag", "c0", "c1", "wdf", "len")}

        @pl.when(p >= g)
        def _mface():
            # m-face f = p-g between cell planes p-1 (w1) and p (fresh);
            # transverse CV slots = (a, b), both in-plane
            def cells(off_d, o1=0, o2=0):
                x = w_prim[1] if off_d == 0 else fresh
                if o1:
                    x = sh_inplane(a, x, o1)
                if o2:
                    x = sh_inplane(b, x, o2)
                return x

            def tcells(off_d, o1=0, o2=0):
                x = w_t[1, 0] if off_d == 0 else t_fresh[0]
                if o1:
                    x = sh_inplane(a, x, o1)
                if o2:
                    x = sh_inplane(b, x, o2)
                return x

            def mucells(off_d):
                return w_mu[1, 0] if off_d == 0 else mu_fresh[0]

            face = _face_pass(phys, cfg, cells, tcells, mucells,
                              sdir("m"), is_turb, is_rans)

            @pl.when(p >= g + 1)
            def _emit():
                def cget(name):
                    o, k = carry_offs[name]
                    return carry[o:o + k]

                cell_q = w_prim[1]
                cell_t = w_t[1, 0]
                cell_mu = w_mu[1, 0]
                vol_c = stat("c_vol")[0]

                acc = {}

                def add(name, v):
                    acc[name] = acc[name] + v if name in acc else v

                def accum_dir(fa_lo, fa_hi, g_lo, g_hi, mut_lo, f1_lo,
                              fmag):
                    add("resid", -(fa_hi - fa_lo))
                    for key in ca_keys:
                        add(key, sixth * (g_lo[key] + g_hi[key]))
                    sp = _cell_specrad(phys, cfg, cell_q, cell_t,
                                       cell_mu, mut_lo, f1_lo, fmag,
                                       vol_c, is_turb, is_rans)
                    add("sr_flow", sp["sr_flow"])
                    add("diag_flow", sp["diag_flow"])
                    if is_rans:
                        add("sr_turb", sp["sr_turb"])
                        add("diag_turb", sp["diag_turb"])

                def gdict(face_d, shift=None):
                    out = {"vel": jnp.stack(
                        [face_d["vg"][A][B]
                         for A in range(3) for B in range(3)])}
                    if is_rans:
                        out["tke"] = jnp.stack(face_d["kg"])
                        out["omega"] = jnp.stack(face_d["wg"])
                    out["mut"] = face_d["mutf"][None]
                    out["f1"] = face_d["f1f"][None]
                    out["f2"] = face_d["f2f"][None]
                    if shift is not None:
                        out = {k2: shift(v) for k2, v in out.items()}
                    return out

                def gdict_carry():
                    names = {"vel": "vg", "tke": "kg", "omega": "wg",
                             "mut": "mutf", "f1": "f1f", "f2": "f2f"}
                    return {key: cget(names[key]) for key in ca_keys}

                # m direction (carry face c, fresh face c+1)
                accum_dir(cget("fa"), face["fa"], gdict_carry(),
                          gdict(face), cget("mutf")[0], cget("f1f")[0],
                          stat("c_fmag_m")[0])

                # in-plane directions: face arrays indexed by the
                # hi-cell position q (lower face of cell q = entry q,
                # upper = entry q+1 -> shift with source offset +1)
                for r, dd in (("a", a), ("b", b)):
                    t1, t2 = [x for x in "ijk" if x != dd]

                    def plane(m_off, kind):
                        if kind == "q":
                            return (w_prim[0], w_prim[1], fresh)[m_off + 1]
                        if kind == "t":
                            return (w_t[0, 0], w_t[1, 0],
                                    t_fresh[0])[m_off + 1]
                        return (w_mu[0, 0], w_mu[1, 0],
                                mu_fresh[0])[m_off + 1]

                    def make_cells(kind):
                        def cells2(off_d, o1=0, o2=0):
                            offm = 0
                            shifts = []
                            for tt, o in ((t1, o1), (t2, o2)):
                                if o == 0:
                                    continue
                                if tt == m:
                                    offm = o
                                else:
                                    shifts.append((tt, o))
                            x = plane(offm, kind)
                            # own-axis: face at q reads cell q-1+off_d
                            x = sh_inplane(dd, x, off_d - 1)
                            for tt, o in shifts:
                                x = sh_inplane(tt, x, o)
                            return x
                        return cells2

                    cells2 = make_cells("q")
                    tcells2 = make_cells("t")
                    mu2 = make_cells("mu")
                    face_d = _face_pass(
                        phys, cfg, cells2, tcells2,
                        lambda off_d: mu2(off_d), sdir(r),
                        is_turb, is_rans)
                    up = lambda x: sh_inplane(dd, x, +1)
                    g_lo = gdict(face_d)
                    g_hi = gdict(face_d, shift=up)
                    accum_dir(face_d["fa"], up(face_d["fa"]),
                              g_lo, g_hi, face_d["mutf"], face_d["f1f"],
                              stat(f"c_fmag_{r}")[0])

                parts = [acc["resid"], acc["sr_flow"][None],
                         (acc["sr_turb"][None] if is_rans
                          else jnp.zeros((1, rows, cols), dtype)),
                         acc["diag_flow"][None],
                         (acc["diag_turb"][None] if is_rans
                          else jnp.zeros((1, rows, cols), dtype)),
                         acc["vel"]]
                if is_rans:
                    parts += [acc["tke"], acc["omega"]]
                parts += [acc["mut"], acc["f1"], acc["f2"]]
                out_ref[0] = jnp.concatenate(parts, axis=0)

            carry[...] = _pack_face(face, carry_offs)

        w_prim[0] = w_prim[1]
        w_prim[1] = fresh
        w_t[0] = w_t[1]
        w_t[1] = t_fresh
        w_mu[0] = w_mu[1]
        w_mu[1] = mu_fresh

    blk = lambda p: (p, 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, neq, rows, cols), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, cols), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, cols), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cs, rows, cols), blk,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Cout, rows, cols), blk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, Cout, rows, cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, neq, rows, cols), dtype),
            pltpu.VMEM((2, 1, rows, cols), dtype),
            pltpu.VMEM((2, 1, rows, cols), dtype),
            pltpu.VMEM((Cc, rows, cols), dtype),
        ],
        interpret=bool(cfg.get("pallas_interpret", False)),
    )(prim_m, t_m, mu_m, statics)

    # steps g+1..g+nm hold cells 0..nm-1 in marcher (m, a, b) order
    planes = out[g + 1:g + 1 + nm]             # (nm, Cout, rows, cols)
    if orient == "ba":
        planes = jnp.swapaxes(planes, -2, -1)  # (nm, Cout, A2, B2)
    planes = planes[:, :, g:g + na, g:g + nb]
    planes = jnp.moveaxis(planes, 0, 1)        # (Cout, nm, na, nb)

    inv = [0, 0, 0]
    for pos, d in enumerate((m, a, b)):
        inv[AX[d]] = pos

    def to_ijk(x):
        lead = x.ndim - 3
        return jnp.transpose(x, tuple(range(lead))
                             + tuple(lead + i for i in inv))

    def take(name):
        o, k = out_offs[name]
        return to_ijk(planes[o:o + k])

    resid = take("resid")
    sr_flow = take("sr_flow")[0]
    sr_turb = take("sr_turb")[0]
    diag_flow = take("diag_flow")[0]
    diag_turb = take("diag_turb")[0]
    vel9 = take("vel")
    cellavg = dict(
        vel=vel9.reshape((3, 3) + vel9.shape[1:]),
        mut=take("mut")[0], f1=take("f1")[0], f2=take("f2")[0],
        wall_out={},
    )
    if is_rans:
        cellavg["tke"] = take("tke")
        cellavg["omega"] = take("omega")
    return (resid, sr_flow, sr_turb, diag_flow, diag_turb, cellavg,
            0.0, 0.0)
