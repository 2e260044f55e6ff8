"""The jitted solver step: ghost fill, halo swaps, residual, update.

TPU-first structure: everything here is pure array code over padded
equation-major blocks; the per-surface/per-connection loops unroll at trace
time into static slice updates, so one jit compilation covers the whole
multi-block iteration (reference call stack: gridLevel::GetBoundaryConditions
+ CalcResidual + UpdateBlocks; SURVEY.md §3.2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grid.geometry import AX
from ..grid.connections import orient_to_first, orient_to_second
from ..physics.models import Physics
from . import bc as bc_mod
from . import state as st
from .reconstruction import reconstruct_faces
from .flux import inviscid_flux
from .sput import set_region, merge_regions

RK4_ALPHA = (0.25, 1.0 / 3.0, 0.5, 1.0)  # low-storage RK4 (procBlock.cpp:941)


# ---------------------------------------------------------------------------
# ghost-state assignment


def _cell_indices(g, n, lower: bool, layer: int):
    """(gcell, icell, acell) padded indices per ghost layer
    (reference: procBlock.cpp:2470-2500)."""
    if lower:
        gcell = g - layer
        icell = min(g + layer - 1, g + n - 1)
        acell = g
    else:
        gcell = g + n + layer - 1
        icell = max(g + n - layer, g)
        acell = g + n - 1
    return gcell, icell, acell


def _plane(arr, axis, idx, patch):
    """index plane `idx` on `axis` (1-based spatial axis within an
    equation-major array), patch slices elsewhere."""
    out = [slice(None)] * arr.ndim
    out[axis] = idx
    taxes = [a for a in range(arr.ndim - 3, arr.ndim) if a != axis]
    out[taxes[0]] = slice(*patch[0])
    out[taxes[1]] = slice(*patch[1])
    return tuple(out)


def boundary_normal(geom, spec, g, n):
    """Outward unit normal on the boundary faces of a surface patch: (3, ...)."""
    d = spec.direction
    normals = geom[f"n_{d}"]
    bnd = g if spec.lower else g + n
    idx = _plane(normals, 1 + spec.axis, bnd, spec.patch)
    nvec = normals[idx]
    return -nvec if spec.lower else nvec


def apply_boundary_ghosts(phys: Physics, block, prim, viscous_pass=False,
                          cfg=None, wall_data=None,
                          bc_aux=None, cons_n=None):
    """Assign ghost states for all non-connection surfaces
    (reference: procBlock.cpp:2449-2563).  For the inviscid pass
    viscousWall degrades to slipWall; the viscous pass re-does viscousWall
    surfaces with the full wall model (interior = mirrored cell,
    wall-distance and wall kinematic viscosity from the adjacent cell)."""
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    # every ghost value below reads PHYSICAL cells only (src/acell are
    # interior indices, _cell_indices), so all (layer, surface) writes are
    # independent — collected and merged in ONE fused pass instead of a
    # chain of full-array copies (see sput.merge_regions)
    updates = []
    for layer in range(1, g + 1):
        for spec in block.surfaces:
            if spec.bc_type in ("interblock", "periodic"):
                continue
            bct = spec.bc_type
            if bct == "viscousWall" and not viscous_pass:
                bct = "slipWall"
            if viscous_pass and spec.bc_type != "viscousWall":
                continue
            n = dims[spec.direction]
            ax = 1 + spec.axis
            gcell, icell, acell = _cell_indices(g, n, spec.lower, layer)
            norm = boundary_normal(block.geom, spec, g, n)
            kw = {}
            if bct == "viscousWall":
                src = icell
                apl = _plane(prim, ax, acell, spec.patch)
                adj = prim[apl]
                kw["wall_dist"] = block.geom["wall_dist"][
                    _plane(block.geom["wall_dist"], ax - 1, acell, spec.patch)]
                # wall kinematic viscosity from the adjacent cells only —
                # same values as slicing a full-field mu (elementwise), but
                # saves a padded-array temperature+Sutherland pass per
                # iteration (the full fields are computed once AFTER the
                # viscous ghost fill, full_residual)
                rho_adj = st.rho(phys, adj)
                t_adj = phys.temperature(adj[phys.ie], adj[:phys.ns])
                mu_adj = phys.viscosity(t_adj, adj[:phys.ns] / rho_adj[None])
                kw["nu_w"] = mu_adj / rho_adj
                if spec.data is not None and spec.data.wall_law:
                    kw["cfg"] = cfg
                    if layer == 1 and wall_data is not None:
                        # wall data stored at layer 1 only
                        # (reference: procBlock.cpp:6288-6291)
                        wv = {}
                        kw["wvars_out"] = wv
                        wall_data[id(spec)] = wv
            else:
                src = icell if bct == "slipWall" else acell
                if (bct in ("inlet", "pressureOutlet") and spec.data is not None
                        and spec.data.nonreflecting and bc_aux is not None):
                    # LODI data at the adjacent cell: time-n state, previous
                    # iteration's dt and gradients, patch Mach statistics
                    # (reference: procBlock.cpp:2504-2516, 6236-6262)
                    ppatch = tuple(slice(lo - g, hi - g) for lo, hi in
                                   spec.patch)
                    apos = 0 if spec.lower else n - 1
                    isl = [None, None, None]
                    isl[spec.axis] = apos
                    taxes = [a2 for a2 in range(3) if a2 != spec.axis]
                    for a2, ps in zip(taxes, ppatch):
                        isl[a2] = ps
                    isl = tuple(isl)
                    from . import state as _st
                    cn = cons_n[(slice(None),) + isl]
                    state_n = _st.prim_from_cons(phys, cn)
                    adj = prim[_plane(prim, ax, acell, spec.patch)]
                    vn_a = (st.velocity(phys, adj) * norm).sum(axis=0)
                    mach_a = vn_a / st.sos(phys, adj)
                    kw["state_n"] = state_n
                    kw["dt"] = bc_aux["dt"][isl]
                    kw["max_mach"] = mach_a.max()
                    kw["avg_mach"] = mach_a.mean()
                    kw["pgrad"] = bc_aux["pgrad"][(slice(None),) + isl]
                    kw["vgrad"] = bc_aux["vgrad"][
                        (slice(None), slice(None)) + isl]
            interior = prim[_plane(prim, ax, src, spec.patch)]
            ghost = bc_mod.ghost_state(phys, bct, interior, norm, spec.data,
                                       layer, **kw)
            updates.append((_plane(prim, ax, gcell, spec.patch), ghost))
    return merge_regions(prim, updates)


# direction-2/3 pairs for the edge pass (procBlock edge convention:
# i-line -> d2=j, d3=k; j-line -> d2=k, d3=i; k-line -> d2=i, d3=j)
EDGE_DIRS = {"i": ("j", "k"), "j": ("k", "i"), "k": ("i", "j")}


def _surface_bc_grid(block, d: str, lower: bool):
    """host-side map of bc type over a block face: array (n1, n2) of small
    ints (0=other, 1=slipWall-like wall) in the face's transverse axes order."""
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    taxes = [a for a in "ijk" if a != d]
    shape = (dims[taxes[0]], dims[taxes[1]])
    out = np.zeros(shape, dtype=np.int8)
    types = np.empty(shape, dtype=object)
    types[:] = "none"
    for spec in block.surfaces:
        if spec.direction != d or spec.lower != lower:
            continue
        sl = tuple(slice(lo - block.g, hi - block.g) for lo, hi in spec.patch)
        bct = spec.bc_type
        types[sl] = bct
        out[sl] = 1 if bct in ("slipWall", "viscousWall") else 0
    return out, types


def apply_edge_ghosts(phys: Physics, block, prim, viscous_pass=False):
    """Corner/edge ghost states (reference: procBlock.cpp:2565-2804 inviscid,
    :2806-3049 viscous): wall surfaces extend their reflection into the
    corner; otherwise equal layers average and unequal layers copy from the
    deeper direction.  The viscous pass treats only viscousWall corners."""
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}

    # One merged write per (layer3, layer2) pair: within a pair the 3
    # edge directions x 4 corners write disjoint double-ghost cell sets
    # (ghost in exactly the pair's two dims) and read only cells from
    # earlier pairs / the surface pass, so the 12 line writes fuse into
    # one pass (sput.merge_regions) instead of 12 full-array copies.
    # Pair order (1,1),(1,2),(2,1),(2,2) preserves the read-after-write
    # dependencies of the original per-corner loop.
    for layer3 in range(1, g + 1):
        for layer2 in range(1, g + 1):
            updates = []
            for d in "ijk":
                d2, d3 = EDGE_DIRS[d]
                ax1, ax2, ax3 = 1 + AX[d], 1 + AX[d2], 1 + AX[d3]
                max2, max3 = dims[d2], dims[d3]
                n1 = dims[d]
                line = slice(g, g + n1)
                for upper2 in (False, True):
                    for upper3 in (False, True):
                        if upper2:
                            p2 = g + max2 + layer2 - 2
                            c2 = p2 + 1
                        else:
                            p2 = g + 1 - layer2
                            c2 = p2 - 1
                        if upper3:
                            p3 = g + max3 + layer3 - 2
                            c3 = p3 + 1
                        else:
                            p3 = g + 1 - layer3
                            c3 = p3 - 1

                        def sl(i2, i3):
                            out = [slice(None)] * prim.ndim
                            out[ax1] = line
                            out[ax2] = i2
                            out[ax3] = i3
                            return tuple(out)

                        s_d2 = prim[sl(p2, c3)]   # toward direction 2
                        s_d3 = prim[sl(c2, p3)]   # toward direction 3

                        norm2 = _edge_face_normal(block, d, d2, d3, upper2,
                                                  upper3, c3, which=2)
                        norm3 = _edge_face_normal(block, d, d2, d3, upper2,
                                                  upper3, c2, which=3)
                        ghost_w2 = bc_mod.slip_wall(phys, s_d2, norm2,
                                                    None, layer2)
                        ghost_w3 = bc_mod.slip_wall(phys, s_d3, norm3,
                                                    None, layer3)

                        if layer2 == layer3:
                            normal = 0.5 * (s_d2 + s_d3)
                        elif layer2 > layer3:
                            normal = s_d3
                        else:
                            normal = s_d2

                        if viscous_pass:
                            # reference viscous edge pass
                            # (procBlock.cpp:2925-2960): a slipWall surface
                            # extends its reflection over a mixed corner;
                            # viscousWall/viscousWall corners use the
                            # average/copy rules; others are untouched
                            s2 = _wall_mask(block, d2, not upper2, d, upper3,
                                            ("slipWall",))
                            s3 = _wall_mask(block, d3, not upper3, d, upper2,
                                            ("slipWall",))
                            v2 = _wall_mask(block, d2, not upper2, d, upper3,
                                            ("viscousWall",))
                            v3 = _wall_mask(block, d3, not upper3, d, upper2,
                                            ("viscousWall",))
                            ghost = jnp.where(
                                (s2 & ~s3)[None], ghost_w2,
                                jnp.where((~s2 & s3)[None], ghost_w3,
                                          jnp.where((v2 & v3)[None], normal,
                                                    prim[sl(c2, c3)])))
                        else:
                            # inviscid pass: slipWall OR viscousWall counts
                            # as a wall and extends a slip reflection
                            # (procBlock.cpp:2674-2710)
                            w2 = _wall_mask(block, d2, not upper2, d, upper3,
                                            ("slipWall", "viscousWall"))
                            w3 = _wall_mask(block, d3, not upper3, d, upper2,
                                            ("slipWall", "viscousWall"))
                            ghost = jnp.where(
                                (w2 & ~w3)[None], ghost_w2,
                                jnp.where((~w2 & w3)[None], ghost_w3, normal))
                        updates.append((sl(c2, c3), ghost))
            prim = merge_regions(prim, updates)
    return prim


def _wall_data(block, dface: str, lower: bool):
    """BCData of the first viscousWall surface on a block face side."""
    for spec in block.surfaces:
        if (spec.bc_type == "viscousWall" and spec.direction == dface
                and spec.lower == lower):
            return spec.data
    from .bc import BCData
    return BCData()


def _wall_mask(block, dface: str, lower: bool, dline: str, upper_other: bool,
               wall_types=("slipWall", "viscousWall")):
    """Boolean mask over the edge line: True where the bounding surface in
    `dface` direction is a wall at the corner position."""
    _, types = _surface_bc_grid(block, dface, lower)
    taxes = [a for a in "ijk" if a != dface]
    li = taxes.index(dline)
    oi = 1 - li
    other_dim = types.shape[oi]
    oidx = other_dim - 1 if upper_other else 0
    line_vals = np.take(types, oidx, axis=oi)
    mask = np.isin(line_vals.astype(str), wall_types)
    return jnp.asarray(mask)


def _edge_face_normal(block, d, d2, d3, upper2, upper3, other_idx, which):
    """Outward unit normal of the wall face bounding an edge corner, along
    the edge line (3, n1)."""
    g = block.g
    dims = {"i": block.ni, "j": block.nj, "k": block.nk}
    if which == 2:
        dface, upper, dother = d2, upper2, d3
    else:
        dface, upper, dother = d3, upper3, d2
    normals = block.geom[f"n_{dface}"]
    fidx = g + dims[dface] if upper else g
    out = [slice(None)] * 4
    out[1 + AX[dface]] = fidx
    out[1 + AX[d]] = slice(g, g + dims[d])
    out[1 + AX[dother]] = other_idx
    nvec = normals[tuple(out)]
    return nvec if upper else -nvec


# ---------------------------------------------------------------------------
# interblock / periodic halo swap


def swap_connection_states(phys: Physics, blocks, prims, conn, g):
    """Swap ghost slabs across one connection (both directions)
    (reference: multiArray3d.hpp:790-870 SwapSliceLocal)."""
    return swap_all_connection_states(phys, blocks, prims, [conn], g)


def swap_all_connection_states(phys: Physics, blocks, prims, conns, g):
    """Ghost-slab swaps for ``conns`` with one fused write per block.

    Within one connection the two sides' writes are independent of each
    other's reads: side 2's donor rows are INTERIOR in side 1's
    direction (didx indexes physical rows) while side 1 writes only
    ghost rows of that direction — so both sides' (layer) slab writes
    merge into one pass per block (sput.merge_regions) instead of a
    chain of full-array copies.  ACROSS connections ordering matters
    (a later connection's transversely-extended donor slab may read an
    earlier connection's corner writes, exactly as the reference's
    sequential SwapSlice loop does, gridLevel.cpp:299-313) — callers
    must pass one connection at a time unless the connections are known
    disjoint."""
    updates = {}
    for conn in conns:
        for acceptor, donor, to_first, border in (
                (conn.first, conn.second, True, conn.border_first),
                (conn.second, conn.first, False, conn.border_second)):
            blk_a = blocks[acceptor.block]
            blk_d = blocks[donor.block]
            dims_a = {"i": blk_a.ni, "j": blk_a.nj, "k": blk_a.nk}
            dims_d = {"i": blk_d.ni, "j": blk_d.nj, "k": blk_d.nk}
            n_a = dims_a[acceptor.direction]
            n_d = dims_d[donor.direction]

            # extended patch slices (padded), trimmed where the patch
            # borders another connection (those corners belong to the
            # neighbor's swap)
            ea = [g, g, g, g]
            for idx in range(4):
                if border[idx]:
                    ea[idx] = 0
            a1 = slice(g + acceptor.d1_range[0] - ea[0],
                       g + acceptor.d1_range[1] + ea[1])
            a2 = slice(g + acceptor.d2_range[0] - ea[2],
                       g + acceptor.d2_range[1] + ea[3])
            # donor slices fully extended, then cropped after orienting
            d1 = slice(g + donor.d1_range[0] - g, g + donor.d1_range[1] + g)
            d2 = slice(g + donor.d2_range[0] - g, g + donor.d2_range[1] + g)

            donor_prim = prims[donor.block]
            planes = []
            for layer in range(1, g + 1):
                if donor.lower:
                    didx = g + layer - 1
                else:
                    didx = g + n_d - layer
                idx = [slice(None)] * 4
                idx[1 + AX[donor.direction]] = didx
                idx[1 + AX[donor.d1]] = d1
                idx[1 + AX[donor.d2]] = d2
                plane = donor_prim[tuple(idx)]
                # canonical order (neq, d1_donor, d2_donor)
                rem = [a for a in range(3) if a != AX[donor.direction]]
                if rem.index(AX[donor.d1]) != 0:
                    plane = jnp.swapaxes(plane, 1, 2)
                orient = orient_to_first if to_first else orient_to_second
                plane = orient(plane, conn.orientation, 1, 2,
                               conn.second.direction)
                planes.append(plane)

            rem_a = [a for a in range(3) if a != AX[acceptor.direction]]
            d1_first_a = rem_a.index(AX[acceptor.d1]) == 0
            # crop the oriented plane to the (maybe trimmed) acceptor extent
            full1 = acceptor.d1_range[1] - acceptor.d1_range[0] + 2 * g
            lo1, hi1 = g - ea[0], full1 - (g - ea[1])
            full2 = acceptor.d2_range[1] - acceptor.d2_range[0] + 2 * g
            lo2, hi2 = g - ea[2], full2 - (g - ea[3])
            for layer in range(1, g + 1):
                if acceptor.lower:
                    gidx = g - layer
                else:
                    gidx = g + n_a + layer - 1
                plane = planes[layer - 1][:, lo1:hi1, lo2:hi2]
                if not d1_first_a:
                    plane = jnp.swapaxes(plane, 1, 2)
                idx = [slice(None)] * 4
                idx[1 + AX[acceptor.direction]] = gidx
                idx[1 + AX[acceptor.d1]] = a1
                idx[1 + AX[acceptor.d2]] = a2
                updates.setdefault(acceptor.block, []).append(
                    (tuple(idx), plane))
    out = dict(prims)
    for bi, ups in updates.items():
        out[bi] = merge_regions(out[bi], ups)
    return out


def apply_all_bcs(phys: Physics, case, prims, bc_aux=None, cons_n=None):
    """Full ghost update: boundary surfaces, connection swaps, edges
    (reference ordering: procBlock::GetBoundaryConditions →
    gridLevel.cpp:287-370).  bc_aux/cons_n feed the nonreflecting (LODI)
    BCs with previous-iteration dt/gradients and the time-n state."""
    prims = {b.index: apply_boundary_ghosts(
        phys, b, prims[b.index],
        bc_aux=None if bc_aux is None else bc_aux.get(b.index),
        cons_n=None if cons_n is None else cons_n.get(b.index))
        for b in case.blocks}
    g = case.blocks[0].g
    for conn in case.connections:
        prims = swap_connection_states(phys, case.blocks, prims, conn, g)
    prims = {b.index: apply_edge_ghosts(phys, b, prims[b.index])
             for b in case.blocks}
    return prims


# ---------------------------------------------------------------------------
# residual + spectral radius


def inviscid_residual(phys: Physics, deck_cfg, block, prim):
    """Net inviscid outflux per physical cell + inviscid spectral radii
    (flow & turbulence) (reference: procBlock.cpp:384-824)."""
    g = block.g
    geom = block.geom
    dims = dict(i=block.ni, j=block.nj, k=block.nk)
    resid = jnp.zeros((phys.neq, block.ni, block.nj, block.nk), prim.dtype)
    specrad = jnp.zeros((block.ni, block.nj, block.nk), prim.dtype)
    specrad_turb = jnp.zeros((block.ni, block.nj, block.nk), prim.dtype)
    diag_flow_blk = diag_turb_blk = 0.0
    if deck_cfg.get("block_matrix"):
        N = phys.ns + 4
        diag_flow_blk = jnp.zeros(
            (block.ni, block.nj, block.nk, N, N), prim.dtype)
        if phys.nturb:
            diag_turb_blk = jnp.zeros(
                (block.ni, block.nj, block.nk, 2, 2), prim.dtype)

    P = [slice(g, g + dims[d]) for d in "ijk"]

    for d in "ijk":
        ax = 1 + AX[d]
        n = dims[d]
        # restrict transverse extents to physical cells; keep ghosts along d
        tsl = [slice(None)] * 4
        for a, dd in enumerate("ijk"):
            if dd != d:
                tsl[1 + a] = slice(g, g + dims[dd])
        prim_d = prim[tuple(tsl)]
        widths = geom[f"width_{d}"][tuple(tsl[1:])]
        ql, qr = reconstruct_faces(prim_d, widths, ax, g, n,
                                   deck_cfg["recon"], deck_cfg["kappa"],
                                   deck_cfg["limiter"])
        # physical faces slice of normals/mags
        fidx = [slice(None)] * 4
        for a, dd in enumerate("ijk"):
            fidx[1 + a] = slice(g, g + dims[dd] + (1 if dd == d else 0))
        nvec = geom[f"n_{d}"][tuple(fidx)]
        mag = geom[f"mag_{d}"][tuple(fidx[1:])]
        flux = inviscid_flux(phys, ql, qr, nvec, deck_cfg["flux"]) * mag[None]

        lo = [slice(None)] * 4
        hi = [slice(None)] * 4
        lo[ax] = slice(0, n)
        hi[ax] = slice(1, n + 1)
        resid = resid + flux[tuple(hi)] - flux[tuple(lo)]

        if deck_cfg.get("block_matrix"):
            # block-diagonal accumulation at reconstructed face states
            # (reference: procBlock.cpp:450-495)
            from . import block_jac as bj
            jf_pos, jt_pos = bj.rusanov_flux_jacobian(phys, ql, nvec, mag,
                                                      True)
            jf_neg, jt_neg = bj.rusanov_flux_jacobian(phys, qr, nvec, mag,
                                                      False)
            flo3 = tuple(lo[1:])
            fhi3 = tuple(hi[1:])
            diag_flow_blk = diag_flow_blk + jf_pos[fhi3] - jf_neg[flo3]
            if phys.nturb:
                diag_turb_blk = diag_turb_blk + jt_pos[fhi3] - jt_neg[flo3]

        # inviscid cell spectral radius (spectralRadius.hpp:43-64)
        cell = prim[tuple([slice(None)] + P)]
        nl = nvec[tuple(lo)]
        nh = nvec[tuple(hi)]
        navg = 0.5 * (nl + nh)
        navg = navg / jnp.sqrt((navg * navg).sum(axis=0))[None]
        fmag = 0.5 * (mag[tuple(lo[1:])] + mag[tuple(hi[1:])])
        vel = st.velocity(phys, cell)
        a = st.sos(phys, cell)
        vn = jnp.abs((vel * navg).sum(axis=0))
        specrad = specrad + (vn + a) * fmag
        if phys.nturb:
            # turbulence inviscid spectral radius (turbulence.cpp:100-110)
            specrad_turb = specrad_turb + vn * fmag

        (prim, resid, specrad, specrad_turb, diag_flow_blk,
         diag_turb_blk) = seq_barrier(
            deck_cfg, (prim, resid, specrad, specrad_turb, diag_flow_blk,
                       diag_turb_blk))

    return resid, specrad, specrad_turb, diag_flow_blk, diag_turb_blk


def seq_barrier(cfg, tree):
    """Direction-sequencing barrier for the i/j/k flux passes.

    The three direction passes are data-independent until the residual
    accumulation, so XLA's scheduler may keep all three passes' large
    temporaries (reconstructed face states, face fluxes, face gradients)
    live at once.  On small grids that overlap is free bandwidth; past a
    few million cells the iteration's temp buffer grows toward the HBM
    capacity and the scheduler degrades into a low-overlap,
    low-throughput ordering (measured: 736 -> 464 achieved GB/s going
    from 1.1M to 5.0M cells, flat bytes/cell).  Threading the loop-
    carried values through ``lax.optimization_barrier`` after each pass
    serializes the passes, bounding peak temp memory at one pass's
    working set.  Enabled via cfg['seq_directions'] (driver: on for
    >= 2M-cell cases, env override AITHER_SEQ_DIRECTIONS)."""
    if not cfg.get("seq_directions"):
        return tree
    import jax

    flat, treedef = jax.tree.flatten(tree)
    is_arr = [hasattr(x, "shape") and hasattr(x, "dtype") for x in flat]
    arrs = [x for x, a in zip(flat, is_arr) if a]
    if not arrs:
        return tree
    arrs = list(jax.lax.optimization_barrier(tuple(arrs)))
    out = [arrs.pop(0) if a else x for x, a in zip(flat, is_arr)]
    return jax.tree.unflatten(treedef, out)


def full_residual(phys: Physics, cfg, block, prim, need_aux=True):
    """Residual + spectral radii + diagonal terms for one block:
    inviscid fluxes, viscous fluxes, turbulence sources
    (reference: procBlock.cpp:6111-6147 CalcResidualNoSource + :5956
    CalcSrcTerms).

    ``need_aux=False`` (the per-iteration hot path) skips cell-average
    gradient fields consumed only by file output (temp/rho gradients,
    species-fraction gradients, and — unless the case has nonreflecting
    LODI surfaces, ``cfg["need_pgrad"]`` — the pressure gradient); the
    reference stores them on the block every iteration
    (procBlock.hpp:100-121) but only reads them at output time, and the
    output path (driver.write_output) re-evaluates with need_aux=True."""
    from . import viscous as vis

    (resid, sr_flow, sr_turb, diag_flow_blk,
     diag_turb_blk) = inviscid_residual(phys, cfg, block, prim)
    diag_flow = sr_flow
    diag_turb = sr_turb
    cellavg = None
    aux = None

    if cfg.get("viscous"):
        # viscousWall ghosts (wall viscosity computed plane-locally inside
        # the ghost pass), then the aux fields ONCE on the filled state
        wall_data = {}
        prim = apply_boundary_ghosts(phys, block, prim, viscous_pass=True,
                                     cfg=cfg, wall_data=wall_data)
        prim = apply_edge_ghosts(phys, block, prim, viscous_pass=True)
        t_all = phys.temperature(prim[phys.ie], prim[:phys.ns])
        mf_all = prim[:phys.ns] / prim[:phys.ns].sum(axis=0)[None]
        mu_all = phys.viscosity(t_all, mf_all)

        from . import pallas_residual as pres
        if not need_aux and pres.use_march(phys, cfg, block, prim.dtype):
            # fused Pallas march: same math, no face-sized HBM traffic
            (rv, vsr_f, vsr_t, vdiag_f, vdiag_t, cellavg, vblk_f,
             vblk_t) = pres.viscous_residual_march(phys, cfg, block,
                                                   prim, t_all, mu_all)
        else:
            (rv, vsr_f, vsr_t, vdiag_f, vdiag_t, cellavg, vblk_f,
             vblk_t) = vis.viscous_residual(
                 phys, cfg, block, prim, t_all, mu_all,
                 wall_data=wall_data, need_aux=need_aux,
                 need_pgrad=cfg.get("need_pgrad", True))
        resid = resid + rv
        sr_flow = sr_flow + vsr_f
        sr_turb = sr_turb + vsr_t
        diag_flow = diag_flow + vdiag_f
        diag_turb = diag_turb + vdiag_t
        if cfg.get("block_matrix"):
            diag_flow_blk = diag_flow_blk + vblk_f
            if phys.nturb:
                diag_turb_blk = diag_turb_blk + vblk_t

        # padded aux arrays for implicit off-diagonal Jacobians
        g = block.g
        P = tuple(slice(g, g + n) for n in (block.ni, block.nj, block.nk))
        mut_pad = set_region(jnp.zeros_like(mu_all), P, cellavg["mut"])
        f1_pad = set_region(jnp.zeros_like(mu_all), P, cellavg["f1"])
        aux = {"mu": mu_all, "mut": mut_pad, "f1": f1_pad,
               "vel_grad": cellavg["vel"], "cellavg": cellavg}
        if "press" in cellavg:
            aux["press_grad"] = cellavg["press"]

    if phys.chemistry is not None:
        # reacting chemistry source terms (reference: procBlock.cpp:5956-6000,
        # source.cpp:44-57, chemistry.cpp:81-176)
        from ..physics import chemistry as chem_mod
        g = block.g
        P = tuple(slice(g, g + n) for n in (block.ni, block.nj, block.nk))
        cell_q = prim[(slice(None),) + P]
        vol = block.geom["vol"][P]
        t_cell = st.temperature(phys, cell_q)
        src, srad = chem_mod.source_terms(phys, phys.chemistry,
                                          cell_q[:phys.ns], t_cell)
        # residual -= src * vol (source on the RHS)
        resid = resid.at[:phys.ns].add(-src * vol[None])
        # spectral radius / diagonal: subtract (negative) destruction term
        sr_flow = sr_flow - srad * vol
        diag_flow = diag_flow - srad * vol
        if cfg.get("block_matrix"):
            cjac = chem_mod.source_jacobian(phys, phys.chemistry,
                                            cell_q[:phys.ns], t_cell, src)
            diag_flow_blk = diag_flow_blk - cjac * vol[..., None, None]

    if phys.nturb and cfg.get("viscous"):
        g = block.g
        P = tuple(slice(g, g + n) for n in (block.ni, block.nj, block.nk))
        cell_q = prim[(slice(None),) + P]
        vol = block.geom["vol"][P]
        width = jnp.maximum(jnp.maximum(block.geom["width_i"][P],
                                        block.geom["width_j"][P]),
                            block.geom["width_k"][P])
        src_k, src_w, src_rad = vis.turb_source(
            phys, cfg["turb_model"], cell_q, cellavg["vel"], cellavg["tke"],
            cellavg["omega"], cellavg["mut"], cellavg["f1"], cellavg["f2"],
            width)
        # residual -= src * vol (sources on the RHS; procBlock.cpp:6020)
        resid = resid.at[phys.it].add(-src_k * vol)
        resid = resid.at[phys.it + 1].add(-src_w * vol)
        # spectral radius / diagonal: subtract (negative) source jacobian
        sr_turb = sr_turb - src_rad * vol
        diag_turb = diag_turb - src_rad * vol
        if cfg.get("block_matrix"):
            from . import block_jac as bj
            from .viscous import WILCOX, SST
            model = cfg["turb_model"]
            f1c = cellavg["f1"]
            if model == "kOmegaWilcox2006":
                # beta from FBeta already folded into src_rad path; use the
                # TurbSrcJac form with the same beta as CalcTurbSrc
                beta = vis.wilcox_beta(phys, cell_q, cellavg["vel"])
            else:
                beta = f1c * SST["beta1"] + (1.0 - f1c) * SST["beta2"]
            phi_des = 1.0
            if model == "sstdes":
                from .viscous import DES
                cdes = f1c * DES["cdes1"] + (1.0 - f1c) * DES["cdes2"]
                tls = jnp.sqrt(cell_q[phys.it]) / (
                    SST["beta_star"] * cell_q[phys.it + 1]) \
                    * phys.nondim_scaling
                phi_des = jnp.maximum(
                    (1.0 - cellavg["f2"]) * tls / (cdes * width), 1.0)
            sjac = bj.turb_src_jacobian(phys, cfg, cell_q, vol, beta, phi_des)
            diag_turb_blk = diag_turb_blk - sjac

    if cfg.get("block_matrix"):
        aux = dict(aux or {})
        aux["diag_flow_blk"] = diag_flow_blk
        aux["diag_turb_blk"] = diag_turb_blk if phys.nturb else None
        if cellavg is not None:
            g2 = block.g
            vg_pad = jnp.zeros((3, 3) + prim.shape[1:], prim.dtype)
            P2 = tuple(slice(g2, g2 + n) for n in (block.ni, block.nj,
                                                   block.nk))
            aux["vgrad"] = set_region(
                vg_pad, (slice(None), slice(None)) + P2, cellavg["vel"])

    return resid, sr_flow, sr_turb, diag_flow, diag_turb, cellavg, prim, aux


def local_dt(deck_cfg, geom, specrad, g, dims, cfl):
    """Local or global time step (reference: procBlock.cpp:6397-6420
    CalcBlockTimeStep/CalcCellDt)."""
    P = tuple(slice(g, g + n) for n in dims)
    vol = geom["vol"][P]
    if deck_cfg["dt"] > 0.0:
        return jnp.full_like(vol, deck_cfg["dt_nondim"])
    return cfl * vol / specrad


def explicit_euler_update(phys: Physics, block, prim, resid, dt):
    """(reference: procBlock.cpp:866-899)"""
    g = block.g
    P = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
         slice(g, g + block.nk))
    interior = prim[P]
    cons = st.cons_from_prim(phys, interior)
    vol = block.geom["vol"][P[1:]]
    cons = cons - (dt / vol)[None] * resid
    return set_region(prim, P, st.prim_from_cons(phys, cons))


def rk4_update(phys: Physics, block, prim, cons_n, resid, dt, stage):
    """low-storage RK4 stage (reference: procBlock.cpp:927-950)"""
    g = block.g
    P = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
         slice(g, g + block.nk))
    vol = block.geom["vol"][P[1:]]
    cons = cons_n - (dt / vol)[None] * RK4_ALPHA[stage] * resid
    return set_region(prim, P, st.prim_from_cons(phys, cons))


def implicit_update(phys: Physics, block, prim, du):
    """(reference: procBlock.cpp:902-925)"""
    g = block.g
    P = (slice(None), slice(g, g + block.ni), slice(g, g + block.nj),
         slice(g, g + block.nk))
    interior = prim[P]
    return set_region(prim, P, st.update_prim_with_cons(phys, interior, du))


def residual_norms(resid):
    """per-equation sum of squares + (max value, flat location)
    (reference: procBlock.cpp:826-864 UpdateBlock accumulation)."""
    l2 = (resid * resid).sum(axis=(1, 2, 3))
    flat = resid.reshape(resid.shape[0], -1)
    linf = flat.max()
    loc = jnp.argmax(flat)
    return l2, linf, loc
