"""shard_map-wrapped Pallas LU-SGS sweeps in sharded production runs.

VERDICT r4 item 5: ``enable_sharding`` used to force ``no_pallas`` because
a bare pallas_call is not partitionable.  The group sweep stacks
same-shape blocks along K2 with block k-boundaries masked, so sharding
stacked-K2 at block boundaries is exact — each device runs the Pallas
kernel on its local blocks inside a shard_map island
(pallas_sweep.sweep).  These tests prove the sharded+kernel iteration
reproduces the plain decomposed iteration to roundoff on the virtual
8-device CPU mesh (kernel in interpret mode).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp


_DECK = """\
gridName: box
equationSet: euler
timeIntegration: implicitEuler
matrixSolver: lusgs
matrixSweeps: 2
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
   supersonicInflow    0     0    0   8    0   8    1
   supersonicOutflow  16    16    0   8    0   8    2
#j_surfaces
   slipWall            0  16    0    0    0   8    0
   slipWall            0  16    8    8    0   8    0
#k_surfaces
   slipWall            0  16    0    8    0    0    0
   slipWall            0  16    0    8    8    8    0
"""


def _build(tmpdir, nproc):
    from aither_tpu.io.plot3d import write_p3d
    from aither_tpu.solver.driver import Solver

    os.makedirs(tmpdir, exist_ok=True)
    ni, nj, nk = 16, 8, 8
    x, y, z = np.meshgrid(np.arange(ni + 1, dtype=np.float64),
                          np.arange(nj + 1, dtype=np.float64),
                          np.arange(nk + 1, dtype=np.float64), indexing="ij")
    write_p3d(os.path.join(tmpdir, "box.xyz"),
              [np.stack([x, y, z], axis=-1)])
    path = os.path.join(tmpdir, "box.inp")
    with open(path, "w") as f:
        f.write(_DECK)
    return Solver(path, workdir=tmpdir, nproc=nproc)


def _perturb(solver):
    out = {}
    rng = np.random.default_rng(7)
    for b in solver.case.blocks:
        g = b.g
        prim = np.array(b.prim0)
        P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
             slice(g, g + b.nk))
        prim[P] *= 1.0 + 0.01 * rng.random(prim[P].shape)
        out[b.index] = jnp.asarray(prim, solver.case.dtype)
    return out


def _advance(solver, prims, n=2):
    cfl = jnp.asarray(solver.deck.cfl(0), solver.case.dtype)
    l2s = []
    for _ in range(n):
        prims, l2, _, _, _ = solver._iterate(prims, solver.cons_n,
                                             solver.cons_nm1, cfl, 0)
    return prims, np.asarray(jax.device_get(l2))


def test_sharded_pallas_sweep_parity(tmp_path):
    """Sharded run with the shard_map'd Pallas sweep (interpret mode)
    matches the plain decomposed scan-path iteration to roundoff."""
    # the cubic decomposition of the box into 4 yields two same-shape
    # groups of 2 blocks each -> shard each group over a 2-device mesh
    nproc, ndev = 4, 2
    base = _build(str(tmp_path / "a"), nproc)
    # the decomposed box must form shard-splittable same-shape groups
    groups = base._sweep_groups(0)
    assert all(len(g) % ndev == 0 for g in groups), \
        [len(g) for g in groups]
    prims0 = _perturb(base)
    want_prims, want_l2 = _advance(base, dict(prims0))

    sh = _build(str(tmp_path / "b"), nproc)
    sh.cfg["pallas_interpret"] = True   # kernel path on the CPU mesh
    sh.enable_sharding(ndev)
    assert sh.cfg.get("sweep_shard_mesh") is not None
    assert "no_pallas" not in sh.cfg or not sh.cfg["no_pallas"]
    got_prims, got_l2 = _advance(sh, {k: jnp.asarray(v)
                                      for k, v in prims0.items()})

    assert np.allclose(want_l2, got_l2, rtol=1e-12), (want_l2, got_l2)
    for k in want_prims:
        err = float(jnp.abs(want_prims[k] - got_prims[k]).max())
        assert err < 1e-10, (k, err)


def test_sharding_fallback_without_divisible_groups(tmp_path):
    """A case whose sweep groups cannot split into whole blocks per
    device falls back to the scan path (no_pallas) instead of mis-
    sharding the kernel."""
    base = _build(str(tmp_path), 1)     # one block, 8 devices
    base.enable_sharding(8)
    assert base.cfg.get("sweep_shard_mesh") is None
    assert base.cfg.get("no_pallas") is True
