"""Device-mesh sharding of real multi-block cases.

TPU-first equivalent of the reference's rank decomposition (reference:
src/parallel.cpp:95-178 CubicDecomposition, src/procBlock.cpp:3050-3123
halo swaps over MPI): instead of assigning whole sub-blocks to ranks and
hand-coding point-to-point ghost exchanges, every block's grid axes are
sharded over a ``jax.sharding.Mesh`` and the SAME jitted multi-block
iteration (``Solver._iteration``) runs as one SPMD program.  XLA's GSPMD
partitioner inserts the halo collective-permutes for the stencil slices
and the reduction collectives that the reference implements by hand —
the "annotate shardings, let XLA insert collectives" recipe.

The device count is factored into prime-sized mesh axes; each block maps
every mesh axis onto one of its padded grid dims such that the dim is
evenly divisible (jax requires even shards), preferring the longest dims
so the halo surface stays minimal.  Blocks that cannot accommodate an
axis simply replicate over it — the program stays a single SPMD
computation either way.
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _prime_factors(n: int):
    out = []
    d = 2
    while n > 1:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    return out


def make_mesh(n_devices: int, devices=None) -> Mesh:
    """A mesh with one axis per prime factor of ``n_devices`` (maximum
    flexibility when matching axes to per-block grid dims)."""
    devs = devices if devices is not None else jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, have {len(devs)}")
    factors = _prime_factors(n_devices) or [1]
    names = tuple(f"d{i}" for i in range(len(factors)))
    arr = np.asarray(devs).reshape(tuple(factors))
    return Mesh(arr, names)


def block_spec(block, mesh: Mesh) -> P:
    """PartitionSpec (eq, i, j, k) for one block's padded state array:
    assign each mesh axis to a grid dim it divides, preferring more total
    shards, then larger dims (smaller halo-to-volume ratio)."""
    dims = (block.ni + 2 * block.g, block.nj + 2 * block.g,
            block.nk + 2 * block.g)
    names = list(mesh.axis_names)
    sizes = [mesh.shape[a] for a in names]

    best_assign, best_score = (None,) * len(names), (-1, -1.0)
    for assign in itertools.product((0, 1, 2, None), repeat=len(names)):
        prods = [1, 1, 1]
        for a, s in zip(assign, sizes):
            if a is not None:
                prods[a] *= s
        if any(dims[d] % prods[d] for d in range(3)):
            continue
        nshard = prods[0] * prods[1] * prods[2]
        # prefer cutting the longest dims: larger min local extent
        min_local = min(dims[d] / prods[d] for d in range(3))
        score = (nshard, min_local)
        if score > best_score:
            best_score, best_assign = score, assign
    entries = [[], [], []]
    for a, name in zip(best_assign, names):
        if a is not None:
            entries[a].append(name)
    def ent(e):
        if not e:
            return None
        return e[0] if len(e) == 1 else tuple(e)
    return P(None, ent(entries[0]), ent(entries[1]), ent(entries[2]))


def _leaf_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_solver_inputs(solver, mesh, prims, cons_n, cons_nm1, bc_aux):
    """Place the iteration inputs on the mesh: primitive state sharded per
    block_spec, everything else replicated (XLA's propagation shards the
    downstream compute from the state's sharding)."""
    repl = _leaf_sharding(mesh)
    s_prims = {}
    for b in solver.case.blocks:
        spec = block_spec(b, mesh)
        s_prims[b.index] = jax.device_put(prims[b.index],
                                          NamedSharding(mesh, spec))
    put_repl = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), repl), t)
    return s_prims, put_repl(cons_n), put_repl(cons_nm1), put_repl(bc_aux)


def perturbed_prims(solver, amp=0.02):
    """Deterministic smooth multiplicative bump on every block's interior
    (a uniform field would let a broken halo exchange pass the parity
    check)."""
    import jax.numpy as jnp
    out = {}
    for b in solver.case.blocks:
        g = b.g
        prim = np.array(solver.prims[b.index])
        ii, jj, kk = np.meshgrid(np.arange(b.ni), np.arange(b.nj),
                                 np.arange(b.nk), indexing="ij")
        sig2 = max(b.ni, b.nj, b.nk) ** 2 / 16.0
        bump = amp * np.exp(-((ii - b.ni / 2.0) ** 2
                              + (jj - b.nj / 2.0) ** 2
                              + (kk - b.nk / 2.0) ** 2) / sig2)
        sl = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
              slice(g, g + b.nk))
        prim[sl] *= (1.0 + bump)[None]
        out[b.index] = jnp.asarray(prim, solver.case.dtype)
    return out


def sharded_parity(solver, n_devices, devices=None, atol=1e-10,
                   perturb=0.02):
    """Run ONE full nonlinear iteration of ``solver`` twice — on the
    default single device and jitted over an ``n_devices`` mesh with the
    block state sharded — and return the max abs difference of the updated
    primitive fields.  Raises if it exceeds ``atol``."""
    from ..solver.sput import safe_updates

    mesh = make_mesh(n_devices, devices=devices)
    prims = perturbed_prims(solver, amp=perturb)
    cfl = jax.numpy.asarray(solver.deck.cfl(0), solver.case.dtype)

    # fresh jit so the trace happens inside safe-update mode (the
    # pad+select write formulation that XLA's SPMD partitioner handles
    # correctly; see solver/sput.py); both runs share the one trace, so
    # the comparison isolates the cross-device collectives
    jitted = jax.jit(solver._iteration, static_argnames=("stage",))
    with safe_updates():
        want, _, _, _, _ = jitted(dict(prims), solver.cons_n,
                                  solver.cons_nm1, cfl, stage=0,
                                  bc_aux=solver.bc_aux)

        s_prims, s_cons_n, s_cons_nm1, s_bc_aux = shard_solver_inputs(
            solver, mesh, prims, solver.cons_n, solver.cons_nm1,
            solver.bc_aux)
        s_cfl = jax.device_put(cfl, _leaf_sharding(mesh))
        got, l2, _, _, _ = jitted(s_prims, s_cons_n, s_cons_nm1,
                                  s_cfl, stage=0, bc_aux=s_bc_aux)

    err = 0.0
    for b in solver.case.blocks:
        w = np.asarray(jax.device_get(want[b.index]))
        h = np.asarray(jax.device_get(got[b.index]))
        err = max(err, float(np.abs(w - h).max()))
    if not np.isfinite(err) or err > atol:
        raise RuntimeError(
            f"sharded != single-device on {solver.sim_root}: "
            f"max abs err {err:.3e} > {atol:g}")
    return err
