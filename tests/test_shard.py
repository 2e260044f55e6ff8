"""Device-mesh sharding of real cases (aither_tpu/parallel/shard.py).

The TPU-native analogue of the reference's MPI domain decomposition
(reference: src/parallel.cpp:95-178, procBlock.cpp:3050-3123): block state
sharded over a jax.sharding.Mesh, one SPMD program, XLA-inserted halo
collectives.  Tests run on the 8-device virtual CPU mesh from conftest.
"""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REF_CASES


def test_box_sharded_parity(tmp_path):
    """Perturbed-field parity on the implicit DPLUR box over 8 devices."""
    from aither_tpu.parallel.spmd import build_box_case
    from aither_tpu.parallel.shard import sharded_parity
    solver = build_box_case(str(tmp_path), ni=16, nj=8, nk=8)
    err = sharded_parity(solver, 8)
    assert err < 1e-10


def test_safe_updates_equivalence(tmp_path):
    """The pad+select write formulation (sput.safe_updates) is numerically
    identical to the default .at[].set path on a full iteration."""
    from aither_tpu.parallel.spmd import build_box_case
    from aither_tpu.parallel.shard import perturbed_prims
    from aither_tpu.solver.sput import safe_updates
    solver = build_box_case(str(tmp_path), ni=16, nj=8, nk=8)
    prims = perturbed_prims(solver)
    cfl = jnp.asarray(solver.deck.cfl(0), solver.case.dtype)
    base, _, _, _, _ = solver._iterate(dict(prims), solver.cons_n,
                                       solver.cons_nm1, cfl, stage=0,
                                       bc_aux=solver.bc_aux)
    jitted = jax.jit(solver._iteration, static_argnames=("stage",))
    with safe_updates():
        safe, _, _, _, _ = jitted(dict(prims), solver.cons_n,
                                  solver.cons_nm1, cfl, stage=0,
                                  bc_aux=solver.bc_aux)
    for k in base:
        assert float(jnp.abs(base[k] - safe[k]).max()) == 0.0


def test_block_spec_assignment():
    """Mesh axes map onto grid dims they divide; blocks that cannot host an
    axis replicate over it."""
    from aither_tpu.parallel.shard import make_mesh, block_spec
    from aither_tpu.solver.case import Block

    mesh = make_mesh(8)
    b = Block(index=0, parent=0, ni=368, nj=64, nk=1, g=2, geom={},
              surfaces=[], prim0=None)
    spec = block_spec(b, mesh)
    # (372, 68, 5): 4 ways on i, 2 on j, k replicated
    sizes = {n: mesh.shape[n] for n in mesh.axis_names}
    dims = (372, 68, 5)
    total = 1
    for d, entry in enumerate(spec[1:]):
        if entry is None:
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        prod = int(np.prod([sizes[n] for n in names]))
        assert dims[d] % prod == 0
        total *= prod
    assert total == 8

    # a block too small to shard at all replicates everywhere
    tiny = Block(index=0, parent=0, ni=3, nj=3, nk=3, g=2, geom={},
                 surfaces=[], prim0=None)
    assert all(e is None for e in block_spec(tiny, mesh))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_CASES),
                    reason="reference cases absent")
def test_rae2822_sharded_parity(tmp_path):
    """The flagship: full viscous SST LU-SGS iteration of rae2822 (C-grid
    interblock connection) sharded over the 8-device mesh matches the
    single-device iteration to 1e-10 (VERDICT round-1 item #2)."""
    from aither_tpu.solver.driver import Solver
    from aither_tpu.parallel.shard import sharded_parity
    ref = os.path.join(REF_CASES, "rae2822")
    for f in os.listdir(ref):
        shutil.copy(os.path.join(ref, f), str(tmp_path))
    solver = Solver(os.path.join(str(tmp_path), "rae2822.inp"),
                    workdir=str(tmp_path))
    err = sharded_parity(solver, 8)
    assert err < 1e-10


def test_sharded_production_run(tmp_path):
    """A full production run() with state sharded over the 8-device mesh
    (enable_sharding / --shard) reproduces the single-device residual
    history — the multi-chip path is the SAME program, partitioned."""
    from aither_tpu.solver.driver import Solver
    ref = os.path.join(REF_CASES, "subsonicCylinder")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        os.mkdir(d)
        for f in os.listdir(ref):
            shutil.copy(os.path.join(ref, f), d)

    def resid(workdir, shard):
        s = Solver(os.path.join(workdir, "subsonicCylinder.inp"),
                   workdir=workdir)
        if shard:
            s.enable_sharding(8)
        s.run(iterations=4, write_files=False)
        rows = []
        with open(os.path.join(workdir, "subsonicCylinder.resid")) as f:
            for line in f.readlines()[1:]:
                rows.append([float(v) for v in line.split()[2:10]])
        return np.asarray(rows)

    a = resid(d1, shard=False)
    b = resid(d2, shard=True)
    np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-12)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_CASES),
                    reason="reference cases absent")
def test_multigrid_sharded_run(tmp_path):
    """FAS W-cycle multigrid x mesh sharding (VERDICT r2 #5): the official
    transonicBump config (3-level agglomeration MG + DPLUR) runs with
    every level's block state sharded over the 8-device mesh and
    reproduces the single-device residual history.  Exercises the
    restriction/prolongation transfers and coarse-level sweeps under the
    GSPMD partitioner (reference: gridLevel.cpp:440-536 coarsening,
    mgSolution.cpp:160-244 CycleAtLevel)."""
    from aither_tpu.solver.driver import Solver
    ref = os.path.join(REF_CASES, "transonicBump")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        os.mkdir(d)
        for f in os.listdir(ref):
            shutil.copy(os.path.join(ref, f), d)

    def resid(workdir, shard):
        s = Solver(os.path.join(workdir, "transonicBump.inp"),
                   workdir=workdir)
        assert len(s.mg_cases) == 3  # deck requests 3 multigrid levels
        if shard:
            s.enable_sharding(8)
        s.run(iterations=3, write_files=False)
        rows = []
        with open(os.path.join(workdir, "transonicBump.resid")) as f:
            for line in f.readlines()[1:]:
                rows.append([float(v) for v in line.split()[2:10]])
        return np.asarray(rows)

    a = resid(d1, shard=False)
    b = resid(d2, shard=True)
    # .resid prints 5 significant digits: parsed histories quantize at
    # ~1e-4 relative, so a ~1e-9 real drift crossing a rounding boundary
    # shows as one print-ulp — compare at 2 print-ulps.  Column 4 is the
    # z-momentum of a 2-D case: reduction-order roundoff noise, dropped
    # (the regression suite ignores eq 3 for the same reason).
    keep = [c for c in range(a.shape[1]) if c != 4]
    np.testing.assert_allclose(b[:, keep], a[:, keep], rtol=2e-4,
                               atol=1e-12)


def test_decomposed_sharded_run(tmp_path):
    """--nproc and --shard compose: a decomposed (really split) case runs
    with its sub-block state sharded over the mesh and reproduces the
    unsharded decomposed residual history."""
    from aither_tpu.solver.driver import Solver
    ref = os.path.join(REF_CASES, "subsonicCylinder")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        os.mkdir(d)
        for f in os.listdir(ref):
            shutil.copy(os.path.join(ref, f), d)

    def resid(workdir, shard):
        s = Solver(os.path.join(workdir, "subsonicCylinder.inp"),
                   workdir=workdir, nproc=2)
        assert s.case.decomp.splits
        if shard:
            s.enable_sharding(8)
        s.run(iterations=3, write_files=False)
        rows = []
        with open(os.path.join(workdir, "subsonicCylinder.resid")) as f:
            for line in f.readlines()[1:]:
                rows.append([float(v) for v in line.split()[2:10]])
        return np.asarray(rows)

    a = resid(d1, shard=False)
    b = resid(d2, shard=True)
    np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-12)
