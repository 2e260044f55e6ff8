"""SPMD slab-decomposition consistency: the sharded implicit step over an
8-device mesh must reproduce the single-block solver iteration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    from aither_tpu.parallel.spmd import build_box_case
    tmp = tmp_path_factory.mktemp("spmd")
    return build_box_case(str(tmp), ni=32, nj=8, nk=8)


def _perturbed_interior(solver):
    gb = solver.case.blocks[0]
    g = gb.g
    prim = np.array(gb.prim0)
    ii, jj, kk = np.meshgrid(np.arange(gb.ni), np.arange(gb.nj),
                             np.arange(gb.nk), indexing="ij")
    bump = 0.02 * np.exp(-((ii - 16.0) ** 2 + (jj - 4.0) ** 2
                           + (kk - 4.0) ** 2) / 18.0)
    P = (slice(g, g + gb.ni), slice(g, g + gb.nj), slice(g, g + gb.nk))
    prim[(slice(None),) + P] *= (1.0 + bump)[None]
    return prim


def test_sharded_step_matches_single_block(box):
    from aither_tpu.parallel.spmd import make_sharded_step
    from aither_tpu.solver import state as st
    from jax.sharding import Mesh

    solver = box
    gb = solver.case.blocks[0]
    g = gb.g
    prim = _perturbed_interior(solver)
    P = (slice(None), slice(g, g + gb.ni), slice(g, g + gb.nj),
         slice(g, g + gb.nk))

    # single-block iteration (reference path)
    prims = {0: jnp.asarray(prim)}
    cons_n = {0: st.cons_from_prim(solver.phys, prims[0][P])}
    cons_nm1 = {0: 0.0}
    cfl = solver.deck.cfl(0)
    new_prims, l2, linfs, mr, _aux = solver._iteration(prims, cons_n, cons_nm1,
                                                 cfl, 0)
    want = np.asarray(new_prims[0])[P]

    # sharded step over an 8-device mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("x",))
    step_fn, geom_stack, ni_l = make_sharded_step(solver, mesh)
    interior = jnp.asarray(prim)[P]
    geom_dev = {k: jnp.asarray(v, solver.case.dtype)
                for k, v in geom_stack.items()}
    with mesh:
        got, cons, l2s = step_fn(interior,
                                 st.cons_from_prim(solver.phys, interior),
                                 geom_dev)
    got = np.asarray(jax.device_get(got))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_uniform_flow_invariant_under_sharding():
    from aither_tpu.parallel.spmd import run_spmd_steps
    l2 = run_spmd_steps(8, steps=2, ni=32, nj=8, nk=8)
    assert np.all(l2 < 1e-20)
