"""Case construction: deck + grid -> device-ready per-block solver context.

Host-side setup (runs once).  Produces:
  * static per-block metadata (dims, ghost layers, BC surface specs),
  * device geometry arrays,
  * initial primitive state,
  * connection specs for interblock/periodic halo swaps.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np

from ..io.deck import Deck, parse_deck
from ..io.plot3d import read_p3d
from ..grid.geometry import (BlockGeometry, build_block_geometry,
                             finalize_block_geometry, AX)
from ..grid import connections as conn_mod
from ..physics.models import Physics
from .bc import BCData, make_bc_data


@dataclasses.dataclass(frozen=True)
class SurfaceSpec:
    """Static description of one boundary surface on a padded block."""

    bc_type: str
    direction: str            # i/j/k
    lower: bool
    tag: int
    # padded cell ranges in the two transverse axes, ordered by axis number
    patch: tuple              # ((lo, hi), (lo, hi))
    data: Any = None          # BCData or None

    @property
    def axis(self):
        return AX[self.direction]


@dataclasses.dataclass
class Block:
    """One block's solver context."""

    index: int
    parent: int               # parent block in the original grid
    ni: int
    nj: int
    nk: int
    g: int
    geom: dict                # device arrays (jnp) keyed by name
    surfaces: list            # list[SurfaceSpec]
    prim0: Any                # initial padded primitive array (numpy)
    geom_host: dict = None    # numpy mirror of geom (host consumers read
    #                           this instead of fetching device arrays —
    #                           a full-array fetch through a tunneled
    #                           device costs seconds)

    @property
    def shape(self):
        return (self.ni + 2 * self.g, self.nj + 2 * self.g,
                self.nk + 2 * self.g)


@dataclasses.dataclass
class Case:
    deck: Deck
    phys: Physics
    blocks: list
    connections: list
    total_cells: float
    dtype: Any

    @property
    def num_blocks(self):
        return len(self.blocks)


def _surface_specs(deck: Deck, bc, g: int) -> list:
    specs = []
    for s in bc.surfaces:
        rng = s.ranges()
        ax = AX[s.direction]
        patch = tuple((g + lo, g + hi) for a, (lo, hi) in enumerate(rng)
                      if a != ax)
        data = None
        if s.bc_type not in ("interblock", "periodic", "slipWall"):
            try:
                data = make_bc_data(deck.bc_data(s.tag), deck)
            except KeyError:
                data = BCData()
        specs.append(SurfaceSpec(bc_type=s.bc_type, direction=s.direction,
                                 lower=s.is_lower, tag=s.tag, patch=patch,
                                 data=data))
    return specs


def _initial_prim(deck: Deck, phys: Physics, block_idx: int,
                  shape, centers=None, workdir=None) -> np.ndarray:
    """Nondimensional initial condition (reference: primitive.cpp:41-66);
    file-based ICs take each cell's nearest cloud-point state
    (reference: procBlock.cpp:280-320)."""
    ic = deck.ic_for_block(block_idx)
    if "file" in ic:
        import os
        from ..io.cloud import load_cloud, nearest_states
        fname = ic["file"]
        for d in filter(None, (workdir, os.getcwd())):
            cand = os.path.join(d, fname)
            if os.path.isfile(cand):
                fname = cand
                break
        pts, states = load_cloud(fname, deck, phys)
        return nearest_states(pts, states, centers)
    a, r = deck.a_ref, deck.r_ref
    rho = ic["density"] / r
    vel = [v / a for v in ic["velocity"]]
    p = ic["pressure"] / (r * a * a)
    mf = [0.0] * phys.ns
    mfm = ic.get("massFractions")
    if mfm:
        for name, frac in mfm.items():
            mf[deck.species_index(name)] = frac
    else:
        mf[0] = 1.0

    prim = np.zeros((phys.neq,) + shape)
    for s in range(phys.ns):
        prim[s] = rho * mf[s]
    prim[phys.mx] = vel[0]
    prim[phys.my] = vel[1]
    prim[phys.mz] = vel[2]
    prim[phys.ie] = p
    if phys.nturb:
        ti = ic.get("turbulenceIntensity", 0.01)
        evr = ic.get("eddyViscosityRatio", 0.01)
        vmag2 = sum(v * v for v in vel)
        tke = 1.5 * (ti * ti) * vmag2
        import jax
        import jax.numpy as jnp
        # scalar freestream state: run the few dozen eager physics ops on
        # the host CPU backend — through a tunneled accelerator each one
        # is a compile+dispatch round-trip (~50 s total measured)
        # local_devices, not devices: under multi-controller JAX the
        # global list can start with another process's device, and
        # placing this tiny computation there makes the result
        # non-addressable here
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            q = jnp.asarray(prim[:, :1, :1, :1])
            tt = phys.temperature(q[phys.ie], q[:phys.ns])
            mu = float(phys.viscosity(tt, q[:phys.ns] / rho)[0, 0, 0])
        omega = rho * tke / (evr * mu)
        tmin = phys.turb_min()
        prim[phys.it] = max(tke, tmin[0])
        prim[phys.it + 1] = max(omega, tmin[1])
    return prim


def swap_geometry(geos: list, conns: list, g: int):
    """Interblock geometry swap: fill each side's ghost geometry from the
    partner's interior (reference: procBlock.cpp:3167+ PutGeomSlice via
    gridLevel.cpp:68-73).  Cell-centered quantities swap the full
    ghost-extended slab; face quantities are rebuilt from swapped centers
    where needed (here: widths come from face centers, so we swap vol,
    center, and per-direction face areas/centers for the slab interior)."""
    for c in conns:
        if not c.is_interblock:
            # periodic geometry ghosts mirror like a normal boundary; the
            # reference treats periodic geometry via the normal ghost path
            continue
        for acceptor, donor, swap_dir in ((c.first, c.second, "to_first"),
                                          (c.second, c.first, "to_second")):
            _swap_geom_one(geos, c, acceptor, donor, swap_dir, g)


def _slab_indexer(side, g, n_dir, ghost: bool, layers: int):
    """Padded index arrays along the patch-normal direction.

    ghost=True: the ghost slab of the acceptor, ordered layer 1..layers
    (nearest boundary first).  ghost=False: donor interior cells ordered
    layer 1..layers."""
    if side.lower:
        if ghost:
            return [g - el for el in range(1, layers + 1)]
        return [g + el - 1 for el in range(1, layers + 1)]
    if ghost:
        return [g + n_dir + el - 1 for el in range(1, layers + 1)]
    return [g + n_dir - el for el in range(1, layers + 1)]


def _patch_slices(side, g, extend: int):
    """Padded slices in the patch's d1/d2 axes, extended by `extend`."""
    d1lo, d1hi = side.d1_range
    d2lo, d2hi = side.d2_range
    return (slice(g + d1lo - extend, g + d1hi + extend),
            slice(g + d2lo - extend, g + d2hi + extend))


def _swap_geom_one(geos, c, acceptor, donor, direction, g, pairs=None):
    from ..grid.connections import orient_to_first, orient_to_second, AX as CAX
    ga = geos[acceptor.block]
    gd = geos[donor.block]
    n_a = {"i": ga.ni, "j": ga.nj, "k": ga.nk}[acceptor.direction]
    n_d = {"i": gd.ni, "j": gd.nj, "k": gd.nk}[donor.direction]
    ghost_idx = _slab_indexer(acceptor, g, n_a, True, g)
    donor_idx = _slab_indexer(donor, g, n_d, False, g)
    # trim the ghost-extended corners on sides where the patch borders
    # another surface on the same block face: those ghosts belong to that
    # surface's BC assignment (reference: multiArray3d.hpp:899-913 adjS/adjE
    # via the connection border flags / PutGeomSlice zero-volume protocol)
    border = (c.border_first if direction == "to_first" else c.border_second)
    ea = [0 if border[n] else g for n in range(4)]
    a_sl = (slice(g + acceptor.d1_range[0] - ea[0],
                  g + acceptor.d1_range[1] + ea[1]),
            slice(g + acceptor.d2_range[0] - ea[2],
                  g + acceptor.d2_range[1] + ea[3]))
    d_sl = _patch_slices(donor, g, g)
    orient = (orient_to_first if direction == "to_first" else orient_to_second)

    def _idx(side, d3, d1, d2):
        out = [None, None, None]
        out[CAX[side.direction]] = d3
        out[CAX[side.d1]] = d1
        out[CAX[side.d2]] = d2
        return tuple(out)

    def _d1_first(side):
        rem = [a for a in range(3) if a != CAX[side.direction]]
        return rem.index(CAX[side.d1]) == 0

    def take(arr, d3, d1, d2, side):
        """extract plane with axes canonically ordered (d1, d2, ...)"""
        plane = arr[_idx(side, d3, d1, d2)]
        if not _d1_first(side):
            plane = np.swapaxes(plane, 0, 1)
        return plane

    # cell quantities: per layer, extract donor plane, reorient, insert.
    # widths permute axes under the orientation: acceptor-normal width comes
    # from donor-normal width, acceptor-d1 width from donor-d1 (or d2 when
    # the orientation swaps in-plane axes), etc.
    swap12 = c.orientation in (2, 4, 5, 7)
    if pairs is None:
        width_map = {
            acceptor.direction: donor.direction,
            acceptor.d1: donor.d2 if swap12 else donor.d1,
            acceptor.d2: donor.d1 if swap12 else donor.d2,
        }
        pairs = [("vol", "vol"), ("center", "center")]
        for d_acc, d_don in width_map.items():
            pairs.append((f"width_{d_acc}", f"width_{d_don}"))

    full1 = acceptor.d1_range[1] - acceptor.d1_range[0] + 2 * g
    lo1, hi1 = g - ea[0], full1 - (g - ea[1])
    full2 = acceptor.d2_range[1] - acceptor.d2_range[0] + 2 * g
    lo2, hi2 = g - ea[2], full2 - (g - ea[3])

    for el in range(g):
        for name_a, name_d in pairs:
            arr_a = getattr(ga, name_a)
            arr_d = getattr(gd, name_d)
            if arr_a is None or arr_d is None:
                continue
            plane = take(arr_d, donor_idx[el], d_sl[0], d_sl[1], donor)
            # plane axes canonical (d1_donor, d2_donor, ...); reorient into
            # the acceptor patch's frame, then crop to the trimmed extent
            plane = orient(plane, c.orientation, 0, 1, c.second.direction)
            plane = plane[lo1:hi1, lo2:hi2]
            if not _d1_first(acceptor):
                plane = np.swapaxes(plane, 0, 1)
            arr_a[_idx(acceptor, ghost_idx[el], a_sl[0], a_sl[1])] = plane


def viscous_wall_face_centers(deck: Deck, geos: list,
                              bcs=None) -> np.ndarray:
    """face centers of all viscousWall boundary faces across blocks
    (reference: utility.cpp:310 GetViscousFaceCenters)."""
    pts = []
    for geo, bc in zip(geos, bcs if bcs is not None else deck.bcs):
        g = geo.g
        dims = {"i": geo.ni, "j": geo.nj, "k": geo.nk}
        for s in bc.surfaces:
            if s.bc_type != "viscousWall":
                continue
            fc = geo.fc(s.direction)
            idx = [None, None, None]
            rng = s.ranges()
            for a, dd in enumerate("ijk"):
                if dd == s.direction:
                    idx[a] = g + s.face_index
                else:
                    lo, hi = rng[a]
                    idx[a] = slice(g + lo, g + hi)
            pts.append(fc[tuple(idx)].reshape(-1, 3))
    if not pts:
        return np.zeros((0, 3))
    return np.concatenate(pts, axis=0)


def compute_wall_distance(geo: BlockGeometry, bc, wall_pts: np.ndarray):
    """Wall distance (reference: procBlock.cpp:6030-6110 CalcWallDistance):
    exact nearest viscous-face distance for physical cells; non-edge ghosts
    take the NEGATIVE mirrored value across viscousWall boundaries and the
    boundary-adjacent value elsewhere (connection ghosts are overwritten by
    the halo swap afterwards)."""
    g = geo.g
    geo.wall_dist = np.full(geo.vol.shape, 1.0e10)
    if wall_pts.shape[0] == 0:
        return
    P = geo.phys_slice()
    centers = geo.center[P].reshape(-1, 3)
    from ..utils.native import nearest_neighbors
    _, out = nearest_neighbors(wall_pts, centers)
    geo.wall_dist[P] = out.reshape((geo.ni, geo.nj, geo.nk))

    dims = {"i": geo.ni, "j": geo.nj, "k": geo.nk}
    for surf in bc.surfaces:
        d = surf.direction
        ax = AX[d]
        n = dims[d]
        rng = surf.ranges()
        patch = [None, None, None]
        for a in range(3):
            if a != ax:
                lo, hi = rng[a]
                patch[a] = slice(g + lo, g + hi)
        for layer in range(1, g + 1):
            idx = list(patch)
            if surf.is_lower:
                gcell, mirror, acell = g - layer, g + layer - 1, g
            else:
                gcell = g + n + layer - 1
                mirror, acell = g + n - layer, g + n - 1
            idx[ax] = gcell
            src = list(patch)
            if surf.bc_type == "viscousWall":
                src[ax] = mirror
                geo.wall_dist[tuple(idx)] = -geo.wall_dist[tuple(src)]
            else:
                src[ax] = acell
                geo.wall_dist[tuple(idx)] = geo.wall_dist[tuple(src)]


def build_case(deck_path: str, dtype=None, nproc: int = 1) -> Case:
    """Build the solver Case.  nproc > 1 decomposes the grid into
    device-slot sub-blocks exactly as the reference's decomposition does
    (reference: main.cpp:121-148, parallel.cpp:44-178) so that decomposed
    runs reproduce the reference's per-processor-count convergence."""
    import os as _os
    workdir = _os.path.dirname(_os.path.abspath(deck_path))
    import jax.numpy as jnp
    deck = parse_deck(deck_path).finalize()
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # honors jax_enable_x64
    phys = Physics.from_deck(deck)
    g = deck.num_ghosts

    case_dir = os.path.dirname(os.path.abspath(deck_path))
    grid_path = os.path.join(case_dir, deck["gridName"] + ".xyz")
    grids = read_p3d(grid_path, deck.l_ref)
    total_cells = sum((b.shape[0] - 1) * (b.shape[1] - 1) * (b.shape[2] - 1)
                      for b in grids)

    bcs = deck.bcs
    parents = None
    decomp = None
    if nproc > 1:
        from ..parallel.decompose import decompose
        grids, bcs, decomp = decompose(grids, bcs, nproc,
                                       method=deck["decompositionMethod"])
        parents = decomp.parent

    case = assemble_case(deck, phys, grids, bcs, dtype, workdir,
                         total_cells, parents=parents)
    case.decomp = decomp
    return case


def assemble_case(deck, phys, grids, bcs, dtype, workdir,
                  total_cells, parents=None) -> Case:
    """Build a Case from node arrays + block BCs (shared by the fine grid
    and the multigrid coarse levels, reference: gridLevel::Coarsen)."""
    g = deck.num_ghosts
    conns = conn_mod.find_connections(bcs, grids, deck.bc_states,
                                      l_ref=deck.l_ref)

    # boundary ghost pass -> exact interblock ghost geometry from donor
    # nodes -> edge pass + widths (matching the reference ordering:
    # AssignGhostCellsGeom -> SwapGeomSlice -> AssignGhostCellsGeomEdge)
    from ..grid.ghost_nodes import fill_interblock_geometry
    from ..grid.geometry import finalize_block_geometry
    geos = []
    for b, (nodes, bc) in enumerate(zip(grids, bcs)):
        geos.append(build_block_geometry(nodes, bc, g, finalize=False))
    fill_interblock_geometry(geos, conns, grids, g)
    for geo in geos:
        finalize_block_geometry(geo)

    if deck.is_viscous:
        wall_pts = viscous_wall_face_centers(deck, geos, bcs=bcs)
        for geo, bc in zip(geos, bcs):
            compute_wall_distance(geo, bc, wall_pts)
        # connection ghosts take the donor's interior wall distance
        # (reference: gridLevel::SwapWallDist)
        for c in conns:
            for acceptor, donor, swap_dir in (
                    (c.first, c.second, "to_first"),
                    (c.second, c.first, "to_second")):
                _swap_geom_one(geos, c, acceptor, donor, swap_dir, g,
                               pairs=[("wall_dist", "wall_dist")])

    if parents is None:
        parents = list(range(len(geos)))
    blocks = []
    for b, geo in enumerate(geos):
        prim0 = _initial_prim(deck, phys, parents[b], geo.shape,
                              centers=geo.center, workdir=workdir)
        geom, geom_host = _device_geometry(geo, dtype)
        blocks.append(Block(index=b, parent=parents[b], ni=geo.ni, nj=geo.nj,
                            nk=geo.nk, g=g, geom=geom, geom_host=geom_host,
                            surfaces=_surface_specs(deck, bcs[b], g),
                            prim0=prim0.astype(dtype)))

    case = Case(deck=deck, phys=phys, blocks=blocks, connections=conns,
                total_cells=total_cells, dtype=dtype)
    case.grids = grids
    case.bcs = bcs
    return case


def _device_geometry(geo: BlockGeometry, dtype):
    """Build the geometry dict twice from the same host arrays: device
    (jnp) for the compute path, and a numpy mirror for host consumers
    (sweep constants, output, multigrid coarsening) so they never fetch
    device arrays back across a (possibly tunneled) transport."""
    import jax.numpy as jnp

    def unit_and_mag(fa):
        mag = np.sqrt((fa * fa).sum(axis=-1))
        unit = np.where(mag[..., None] > 0.0, fa / np.where(
            mag[..., None] > 0.0, mag[..., None], 1.0), 0.0)
        # move xyz axis first: (3, ...)
        return (np.moveaxis(unit, -1, 0), mag)

    n_i, mag_i = unit_and_mag(geo.fa_i)
    n_j, mag_j = unit_and_mag(geo.fa_j)
    n_k, mag_k = unit_and_mag(geo.fa_k)
    host = dict(
        vol=geo.vol,
        center=np.moveaxis(geo.center, -1, 0),
        n_i=n_i, mag_i=mag_i, n_j=n_j, mag_j=mag_j, n_k=n_k, mag_k=mag_k,
        fc_i=np.moveaxis(geo.fc_i, -1, 0),
        fc_j=np.moveaxis(geo.fc_j, -1, 0),
        fc_k=np.moveaxis(geo.fc_k, -1, 0),
        width_i=geo.width_i, width_j=geo.width_j,
        width_k=geo.width_k,
        wall_dist=geo.wall_dist if geo.wall_dist is not None
        else np.full_like(geo.vol, 1.0e10),
    )
    host = {k: np.asarray(v, dtype=dtype) for k, v in host.items()}
    device = {k: jnp.asarray(v) for k, v in host.items()}
    return device, host


def host_geom(block: Block, key: str) -> np.ndarray:
    """Host (numpy) view of a block geometry array.  Prefers the numpy
    mirror; falls back to a device fetch for Blocks built without one."""
    gh = block.geom_host
    if gh is not None and key in gh:
        return gh[key]
    return np.asarray(block.geom[key])
