"""Geometric multigrid (FAS) for the implicit linear solve.

Replicates the reference's agglomeration multigrid (reference:
src/mgSolution.cpp:131-244 CycleAtLevel / Relax, src/gridLevel.cpp:440-640
Coarsen / Restriction / Prolongation, src/procBlock.cpp:6471-6607
GetCoarseMeshAndBCs, include/gridLevel.hpp:160-215 BlockProlongation):

- coarsening keeps every other node plus all boundary-surface indices;
  boundary surface extents are remapped to the kept-index positions
- fine->coarse state/update restriction is volume-weighted; the matrix
  residual restriction is a plain sum
- the coarse forcing is (A_c x_c - b_c) + restrict(f - (A_f x_f - b_f))
- prolongation converts the coarse correction to nodal values (interior
  cells only, with the reference's corner/edge/interior 1, 1/2, 1/8
  normalization) and trilinearly interpolates to fine cell centers
- V cycles recurse once per level, W cycles twice; pre/post relaxation
  uses max(matrixSweeps/2, 1) sweeps, the coarsest level the full count

Host-side setup produces static index maps; the cycle itself is pure
traced array code (scatter-adds for restriction, gathers for
prolongation), so the whole multigrid iteration lives in one jit.
"""

from __future__ import annotations

from . import case as case_mod

import dataclasses

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side coarsening


def _is_surface_boundary(bc, d: str, ind: int) -> bool:
    """(reference: boundaryConditions.cpp:1227-1248)"""
    lo = {"i": "imin", "j": "jmin", "k": "kmin"}[d]
    hi = {"i": "imax", "j": "jmax", "k": "kmax"}[d]
    return any(getattr(s, lo) == ind or getattr(s, hi) == ind
               for s in bc.surfaces)


def _kept_indices(bc, d: str, nnode: int):
    """fine node indices kept on the coarse mesh
    (reference: procBlock.cpp:6477-6529)."""
    kept = []
    since_last = 0
    for ii in range(nnode):
        if _is_surface_boundary(bc, d, ii):
            kept.append(ii)
            since_last = 0
        elif since_last > 0:
            kept.append(ii)
            since_last = 0
        else:
            since_last += 1
    return kept


def _remap_surfaces(bc, kept):
    """Remap surface node extents to coarse indices (BoundarySurface is
    frozen, so rebuild)."""
    import dataclasses as dc
    maps = {d: {old: new for new, old in enumerate(kept[d])} for d in "ijk"}
    surfs = [dc.replace(s, imin=maps["i"][s.imin], imax=maps["i"][s.imax],
                        jmin=maps["j"][s.jmin], jmax=maps["j"][s.jmax],
                        kmin=maps["k"][s.kmin], kmax=maps["k"][s.kmax])
             for s in bc.surfaces]
    return dc.replace(bc, num_i=len(kept["i"]), num_j=len(kept["j"]),
                      num_k=len(kept["k"]), surfaces=surfs)


@dataclasses.dataclass
class LevelMap:
    """fine->coarse transfer data for one block."""

    ci: np.ndarray          # (ni,nj,nk) coarse cell index per fine cell
    cj: np.ndarray
    ck: np.ndarray
    volfac: np.ndarray      # (ni,nj,nk) fine volume / coarse-cell sum
    prolong: np.ndarray     # (7, ni,nj,nk) trilinear coefficients
    node_factor: np.ndarray  # (cni+1, cnj+1, cnk+1) cell->node normalization


def _lin_coeff(x0, x1, x):
    d = x1 - x0
    den = (d * d).sum()
    return ((x - x0) * d).sum() / den if den > 0.0 else 0.0


def _trilinear_coeffs(nodes8, x):
    """(reference: utility.cpp:633-659)"""
    c = np.zeros(7)
    c[0] = _lin_coeff(nodes8[0], nodes8[4], x)
    x04 = nodes8[0] + c[0] * (nodes8[4] - nodes8[0])
    c[1] = _lin_coeff(nodes8[1], nodes8[5], x)
    x15 = nodes8[1] + c[1] * (nodes8[5] - nodes8[1])
    c[2] = _lin_coeff(nodes8[2], nodes8[6], x)
    x26 = nodes8[2] + c[2] * (nodes8[6] - nodes8[2])
    c[3] = _lin_coeff(nodes8[3], nodes8[7], x)
    x37 = nodes8[3] + c[3] * (nodes8[7] - nodes8[3])
    c[4] = _lin_coeff(x04, x15, x)
    x0415 = x04 + c[4] * (x15 - x04)
    c[5] = _lin_coeff(x26, x37, x)
    x2637 = x26 + c[5] * (x37 - x26)
    c[6] = _lin_coeff(x0415, x2637, x)
    return c


def coarsen_case(case):
    """Build the next-coarser Case + transfer maps from `case`
    (reference: gridLevel::Coarsen)."""
    from .case import assemble_case

    deck = case.deck
    coarse_grids = []
    coarse_bcs = []
    maps = []
    for b, (nodes, bc) in enumerate(zip(case.grids, case.bcs)):
        kept = {d: _kept_indices(bc, d, nodes.shape[a])
                for a, d in enumerate("ijk")}
        cn = nodes[np.ix_(kept["i"], kept["j"], kept["k"])]
        coarse_grids.append(cn)
        coarse_bcs.append(_remap_surfaces(bc, kept))

        # fine cell -> coarse cell map (reference: procBlock.cpp:6545-6585)
        def cell_map(kept_d, n_f):
            out = np.empty(n_f, dtype=np.int64)
            arr = np.asarray(kept_d)
            for f in range(n_f):
                c = int(np.searchsorted(arr, f, side="right"))
                if c != 0:
                    c -= 1
                out[f] = c
            return out

        ni, nj, nk = (nodes.shape[0] - 1, nodes.shape[1] - 1,
                      nodes.shape[2] - 1)
        mi = cell_map(kept["i"], ni)
        mj = cell_map(kept["j"], nj)
        mk = cell_map(kept["k"], nk)
        ci = np.broadcast_to(mi[:, None, None], (ni, nj, nk)).copy()
        cj = np.broadcast_to(mj[None, :, None], (ni, nj, nk)).copy()
        ck = np.broadcast_to(mk[None, None, :], (ni, nj, nk)).copy()

        # volume weighting factor
        g = case.blocks[b].g
        vol = case_mod.host_geom(case.blocks[b], "vol")[
            g:g + ni, g:g + nj, g:g + nk]
        cni = len(kept["i"]) - 1
        cnj = len(kept["j"]) - 1
        cnk = len(kept["k"]) - 1
        volsum = np.zeros((cni, cnj, cnk))
        np.add.at(volsum, (ci, cj, ck), vol)
        volfac = vol / volsum[ci, cj, ck]

        # prolongation coefficients from fine centers in coarse node cells
        centers = case_mod.host_geom(case.blocks[b], "center")
        centers = np.moveaxis(centers, 0, -1)[g:g + ni, g:g + nj, g:g + nk]
        prolong = np.zeros((7, ni, nj, nk))
        for fi in range(ni):
            for fj in range(nj):
                for fk in range(nk):
                    i0, j0, k0 = ci[fi, fj, fk], cj[fi, fj, fk], ck[fi, fj, fk]
                    n8 = [cn[i0, j0, k0], cn[i0 + 1, j0, k0],
                          cn[i0, j0 + 1, k0], cn[i0 + 1, j0 + 1, k0],
                          cn[i0, j0, k0 + 1], cn[i0 + 1, j0, k0 + 1],
                          cn[i0, j0 + 1, k0 + 1], cn[i0 + 1, j0 + 1, k0 + 1]]
                    prolong[:, fi, fj, fk] = _trilinear_coeffs(
                        n8, centers[fi, fj, fk])

        # cell->node normalization (reference: utility.hpp:306-330 without
        # ghosts: corner nodes x1, edge nodes x1/2, all others x1/8)
        nf = np.full((cni + 1, cnj + 1, cnk + 1), 0.125)
        ext_i = np.isin(np.arange(cni + 1), [0, cni])
        ext_j = np.isin(np.arange(cnj + 1), [0, cnj])
        ext_k = np.isin(np.arange(cnk + 1), [0, cnk])
        n_ext = (ext_i[:, None, None].astype(int)
                 + ext_j[None, :, None].astype(int)
                 + ext_k[None, None, :].astype(int))
        nf[n_ext == 2] = 0.5
        nf[n_ext == 3] = 1.0
        maps.append(LevelMap(ci=ci, cj=cj, ck=ck, volfac=volfac,
                             prolong=prolong, node_factor=nf))

    total = sum((gr.shape[0] - 1) * (gr.shape[1] - 1) * (gr.shape[2] - 1)
                for gr in coarse_grids)
    coarse = assemble_case(deck, case.phys, coarse_grids, coarse_bcs,
                           case.dtype, None, total)
    return coarse, maps


def build_levels(case, n_levels: int):
    """[finest ... coarsest] cases + per-transition maps."""
    levels = [case]
    transfer = []
    for _ in range(n_levels - 1):
        coarse, maps = coarsen_case(levels[-1])
        levels.append(coarse)
        transfer.append(maps)
    return levels, transfer


# ---------------------------------------------------------------------------
# traced transfer operators


def restrict_weighted(fine, lm: LevelMap, coarse_shape):
    """Volume-weighted restriction of an interior (neq, ni,nj,nk) field."""
    out = jnp.zeros((fine.shape[0],) + coarse_shape, fine.dtype)
    return out.at[:, lm.ci, lm.cj, lm.ck].add(lm.volfac[None] * fine)


def restrict_sum(fine, lm: LevelMap, coarse_shape):
    """Plain-sum restriction (for the matrix residual forcing term)."""
    out = jnp.zeros((fine.shape[0],) + coarse_shape, fine.dtype)
    return out.at[:, lm.ci, lm.cj, lm.ck].add(fine)


def prolong(coarse_corr, lm: LevelMap):
    """Coarse interior correction (neq, cni,cnj,cnk) -> fine interior via
    cell->node conversion + trilinear interpolation
    (reference: gridLevel.hpp:160-215)."""
    neq, cni, cnj, cnk = coarse_corr.shape
    nodes = jnp.zeros((neq, cni + 1, cnj + 1, cnk + 1), coarse_corr.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                nodes = nodes.at[:, di:di + cni, dj:dj + cnj,
                                 dk:dk + cnk].add(coarse_corr)
    nodes = nodes * jnp.asarray(lm.node_factor)[None]
    ci, cj, ck = lm.ci, lm.cj, lm.ck
    d = [nodes[:, ci + a, cj + b, ck + c]
         for c in (0, 1) for b in (0, 1) for a in (0, 1)]
    # d ordering: index = a + 2b + 4c -> reference d0..d7 with
    # d0=(0,0,0) d1=(1,0,0) d2=(0,1,0) d3=(1,1,0) d4..d7 same with k+1
    co = jnp.asarray(lm.prolong)

    def lin(a, b, c):
        return (1.0 - c) * a + c * b

    d04 = lin(d[0], d[4], co[0][None])
    d15 = lin(d[1], d[5], co[1][None])
    d26 = lin(d[2], d[6], co[2][None])
    d37 = lin(d[3], d[7], co[3][None])
    d0415 = lin(d04, d15, co[4][None])
    d2637 = lin(d26, d37, co[5][None])
    return lin(d0415, d2637, co[6][None])
