"""SPMD slab decomposition of a block over a ``jax.sharding.Mesh``.

The reference scales by cutting blocks into sub-blocks and exchanging ghost
slabs over MPI (reference: src/parallel.cpp:40-140 decomposition,
src/procBlock.cpp SwapStateSlice / the interblock connection machinery).
Here the same domain decomposition is recast TPU-first: the padded block
state is sharded along one grid axis across the mesh, every shard runs the
identical solver program under ``shard_map``, and the g-layer halos ride the
ICI via ``jax.lax.ppermute`` — once per nonlinear step for the state and
once per DPLUR sweep for the implicit update.

Boundary handling stays uniform across shards (single SPMD program): both
decomposition faces of every shard are marked as connection faces for the
implicit masks, and the domain-end shards simply receive boundary-condition
halo values (and zero du halos, which makes the off-diagonal contribution
vanish there exactly as the reference's boundary mask does).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..solver import step as step_mod
from ..solver import implicit as imp
from ..solver import state as st
from ..solver.case import Block, SurfaceSpec

AX = dict(i=0, j=1, k=2)

_BOX_DECK = """\
gridName: box
equationSet: euler
timeIntegration: implicitEuler
matrixSolver: dplur
matrixSweeps: {sweeps}
cflStart: 5.0
cflMax: 5.0
faceReconstruction: thirdOrder
limiter: vanAlbada
iterations: 10
outputFrequency: 10

referenceTemperature: 288.0
referenceDensity: 1.2256

initialConditions: <icState(tag=-1; pressure=101300; density=1.2256; velocity=[680.0, 0, 0])>

boundaryStates: <supersonicInflow(tag=1; pressure=101300; density=1.2256; velocity=[680.0, 0, 0]; massFractions=[air=1.0])>

boundaryConditions: 1
2 2 2
#i_surfaces
   supersonicInflow    0     0    0  {nj}    0  {nk}    1
   supersonicOutflow  {ni}  {ni}  0  {nj}    0  {nk}    2
#j_surfaces
   slipWall            0  {ni}    0    0    0  {nk}    0
   slipWall            0  {ni}  {nj}  {nj}   0  {nk}    0
#k_surfaces
   slipWall            0  {ni}    0  {nj}    0    0    0
   slipWall            0  {ni}    0  {nj}  {nk}  {nk}   0
"""


def build_box_case(tmpdir, ni=32, nj=8, nk=8, sweeps=2):
    """Write a uniform-flow box grid + deck and build a Solver for it."""
    from ..io.plot3d import write_p3d
    from ..solver.driver import Solver

    x, y, z = np.meshgrid(np.arange(ni + 1, dtype=np.float64),
                          np.arange(nj + 1, dtype=np.float64),
                          np.arange(nk + 1, dtype=np.float64), indexing="ij")
    write_p3d(os.path.join(tmpdir, "box.xyz"),
                 [np.stack([x, y, z], axis=-1)])
    deck = _BOX_DECK.format(ni=ni, nj=nj, nk=nk, sweeps=sweeps)
    path = os.path.join(tmpdir, "box.inp")
    with open(path, "w") as f:
        f.write(deck)
    return Solver(path, workdir=tmpdir)


def _shard_surfaces(nj, nk, g):
    """Surface list for one slab: both i-faces are connection faces (the
    halo plays the donor), transverse faces are slip walls."""
    tpatch = ((g, nj + g), (g, nk + g))
    return [
        SurfaceSpec("interblock", "i", True, 0, tpatch),
        SurfaceSpec("interblock", "i", False, 0, tpatch),
        SurfaceSpec("slipWall", "j", True, 0, ((g, nj + g), (g, nk + g))),
        SurfaceSpec("slipWall", "j", False, 0, ((g, nj + g), (g, nk + g))),
        SurfaceSpec("slipWall", "k", True, 0, ((g, nj + g), (g, nk + g))),
        SurfaceSpec("slipWall", "k", False, 0, ((g, nj + g), (g, nk + g))),
    ]


def stack_shard_geometry(block, n_shards):
    """Slice the global padded geometry into per-shard slabs along i and
    stack them on a leading shard axis (the mesh-sharded operand)."""
    g = block.g
    ni_l = block.ni // n_shards
    assert ni_l * n_shards == block.ni, "ni must divide the mesh size"
    out = {}
    for key, arr in block.geom.items():
        a = np.asarray(arr)
        ax = 1 if key.startswith(("n_", "fc_", "center")) else 0
        # i-face arrays carry one extra face along i
        extra = 1 if key.endswith("_i") and not key.startswith("width") else 0
        slabs = [np.take(a, np.arange(s * ni_l, s * ni_l + ni_l + 2 * g
                                      + extra), axis=ax)
                 for s in range(n_shards)]
        out[key] = np.stack(slabs, axis=0)
    return out, ni_l


def make_sharded_step(solver, mesh, axis="x"):
    """Build the jitted SPMD implicit step: state sharded along i over the
    mesh, halo exchange via ppermute, DPLUR sweeps with du halo exchange."""
    phys = solver.phys
    cfg = dict(solver.cfg)
    gb = solver.case.blocks[0]
    g = gb.g
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    geom_stack, ni_l = stack_shard_geometry(gb, n)
    nj, nk = gb.nj, gb.nk
    surfaces = _shard_surfaces(nj, nk, g)
    tmpl = Block(index=0, parent=0, ni=ni_l, nj=nj, nk=nk, g=g,
                 geom={}, surfaces=surfaces, prim0=None)
    ctx = imp.build_implicit_context(tmpl)
    cfl = float(solver.deck.cfl(0))
    sweeps = cfg["matrix_sweeps"]
    fwd = [(s, s + 1) for s in range(n - 1)]
    bwd = [(s + 1, s) for s in range(n - 1)]
    freestream = jnp.asarray(
        np.asarray(gb.prim0)[:, g, g, g], solver.case.dtype)

    PI = (slice(None), slice(g, g + ni_l), slice(g, g + nj),
          slice(g, g + nk))

    def halo_fill(pad, interior, left_bc, right_bc):
        """i-halos from neighbours via ICI; domain ends take BC values."""
        idx = lax.axis_index(axis)
        from_left = lax.ppermute(interior[:, -g:], axis, fwd)
        from_right = lax.ppermute(interior[:, :g], axis, bwd)
        left = jnp.where(idx == 0, left_bc, from_left)
        right = jnp.where(idx == n - 1, right_bc, from_right)
        pad = pad.at[:, :g, g:g + nj, g:g + nk].set(left)
        return pad.at[:, g + ni_l:, g:g + nj, g:g + nk].set(right)

    def body(prim_int, cons_n_int, geom_loc):
        geom = {k: v[0] for k, v in geom_loc.items()}
        blk = Block(index=0, parent=0, ni=ni_l, nj=nj, nk=nk, g=g,
                    geom=geom, surfaces=surfaces, prim0=None)
        shp = (phys.neq, ni_l + 2 * g, nj + 2 * g, nk + 2 * g)
        pad = jnp.broadcast_to(
            freestream[:, None, None, None], shp).astype(prim_int.dtype)
        pad = pad.at[PI].set(prim_int)
        # supersonic inflow: freestream ghosts; outflow: extrapolate
        inflow = jnp.broadcast_to(freestream[:, None, None, None],
                                  (phys.neq, g, nj, nk))
        outflow = jnp.repeat(prim_int[:, -1:], g, axis=1)
        pad = halo_fill(pad, prim_int, inflow, outflow)
        # slip walls transverse: mirrored layers (normal velocity flips)
        sgn_j = jnp.ones((phys.neq,), pad.dtype).at[phys.ns + 1].set(-1.0)
        sgn_k = jnp.ones((phys.neq,), pad.dtype).at[phys.ns + 2].set(-1.0)
        mir = jnp.flip(pad[:, :, g:2 * g, :], 2) * sgn_j[:, None, None, None]
        pad = pad.at[:, :, :g, :].set(mir)
        mir = jnp.flip(pad[:, :, g + nj - g:g + nj, :], 2) \
            * sgn_j[:, None, None, None]
        pad = pad.at[:, :, g + nj:, :].set(mir)
        mir = jnp.flip(pad[:, :, :, g:2 * g], 3) * sgn_k[:, None, None, None]
        pad = pad.at[:, :, :, :g].set(mir)
        mir = jnp.flip(pad[:, :, :, g + nk - g:g + nk], 3) \
            * sgn_k[:, None, None, None]
        pad = pad.at[:, :, :, g + nk:].set(mir)

        (resid, sr_f, sr_t, dg_f, dg_t, _, prim_v,
         aux) = step_mod.full_residual(phys, cfg, blk, pad)
        sr = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f
        dt = step_mod.local_dt(cfg, geom, sr, g, (ni_l, nj, nk), cfl)
        inv_f, inv_t = imp.build_diagonal(phys, blk, cfg, dg_f, dg_t, sr, dt)
        b = imp.rhs_b(phys, blk, cfg, prim_v, resid, cons_n_int, 0.0, dt)
        du = jnp.zeros(shp, pad.dtype)
        du = du.at[PI].set(imp.diag_mult(phys, inv_f, inv_t, b))
        zero_halo = jnp.zeros((phys.neq, g, nj, nk), pad.dtype)
        for _ in range(sweeps):
            du = halo_fill(du, du[PI], zero_halo, zero_halo)
            du = imp.dplur_sweep(phys, cfg, blk, ctx, prim_v, du, b,
                                 inv_f, inv_t, aux=aux)
        new_pad = step_mod.implicit_update(phys, blk, prim_v, du[PI])
        l2 = lax.psum((resid * resid).sum(axis=(1, 2, 3)), axis)
        return new_pad[PI], st.cons_from_prim(phys, new_pad[PI]), l2

    spec_state = P(None, axis, None, None)
    spec_geom = {k: P(axis) for k in geom_stack}
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_state, spec_state, spec_geom),
                   out_specs=(spec_state, spec_state, P()))
    return jax.jit(fn), geom_stack, ni_l


def dryrun_parity(n_devices, ni=None, nj=8, nk=8):
    """Perturbed-field parity: one sharded implicit step over an n-device
    mesh must reproduce the single-block solver iteration to 1e-10 (the
    meaningful version of the multi-chip dry run — a broken ppermute halo
    exchange cannot deliver this)."""
    import tempfile

    from ..solver import state as st2
    from ..solver.driver import Solver  # noqa: F401 (Solver built below)

    ni = ni if ni is not None else 4 * n_devices
    devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, have {len(devs)}")
    mesh = Mesh(np.asarray(devs), ("x",))
    with tempfile.TemporaryDirectory() as tmp:
        solver = build_box_case(tmp, ni=ni, nj=nj, nk=nk)
        gb = solver.case.blocks[0]
        g = gb.g
        prim = np.array(gb.prim0)
        ii, jj, kk = np.meshgrid(np.arange(gb.ni), np.arange(gb.nj),
                                 np.arange(gb.nk), indexing="ij")
        bump = 0.02 * np.exp(-((ii - ni / 2.0) ** 2 + (jj - nj / 2.0) ** 2
                               + (kk - nk / 2.0) ** 2) / 18.0)
        P = (slice(None), slice(g, g + gb.ni), slice(g, g + gb.nj),
             slice(g, g + gb.nk))
        prim[P] *= (1.0 + bump)[None]

        # single-device iteration (production path)
        prims = {0: jnp.asarray(prim)}
        cons_n = {0: st2.cons_from_prim(solver.phys, prims[0][P])}
        cfl = solver.deck.cfl(0)
        new_prims, _, _, _, _ = solver._iterate(prims, cons_n, {0: 0.0},
                                                cfl, 0)
        want = np.asarray(new_prims[0])[P]

        # sharded step over the mesh
        step_fn, geom_stack, _ = make_sharded_step(solver, mesh)
        interior = jnp.asarray(prim)[P]
        geom_dev = {k: jnp.asarray(v, solver.case.dtype)
                    for k, v in geom_stack.items()}
        with mesh:
            got, _, l2 = step_fn(
                interior, st2.cons_from_prim(solver.phys, interior), geom_dev)
        got = np.asarray(jax.device_get(got))
        err = float(np.abs(got - want).max())
        if not np.isfinite(got).all() or err > 1e-10:
            raise RuntimeError(
                f"sharded != single-device: max abs err {err:.3e}")
        return err


def run_spmd_steps(n_devices, steps=1, ni=32, nj=8, nk=8, devices=None):
    """End-to-end: build the box case, shard it over an n-device mesh, and
    advance `steps` implicit DPLUR iterations.  Returns final resid L2."""
    import tempfile

    devs = devices if devices is not None else jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devs)}")
    mesh = Mesh(np.asarray(devs), ("x",))
    with tempfile.TemporaryDirectory() as tmp:
        solver = build_box_case(tmp, ni=ni, nj=nj, nk=nk)
        step_fn, geom_stack, ni_l = make_sharded_step(solver, mesh)
        gb = solver.case.blocks[0]
        g = gb.g
        interior = jnp.asarray(
            np.asarray(gb.prim0)[:, g:g + gb.ni, g:g + gb.nj, g:g + gb.nk],
            solver.case.dtype)
        cons_n = st.cons_from_prim(solver.phys, interior)
        geom_dev = {k: jnp.asarray(v, solver.case.dtype)
                    for k, v in geom_stack.items()}
        with mesh:
            prim, cons, l2 = step_fn(interior, cons_n, geom_dev)
            for _ in range(steps - 1):
                prim, cons, l2 = step_fn(prim, cons, geom_dev)
        l2 = np.asarray(jax.device_get(l2))
        if not np.all(np.isfinite(l2)):
            raise RuntimeError(f"non-finite sharded residual: {l2}")
        return l2
