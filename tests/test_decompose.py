"""Block decomposition: cubic load balancing, surface splitting with
C-grid handling, dependent splits, and split-vs-unsplit solver parity
(reference: parallel.cpp:95-178, boundaryConditions.cpp:1267-1706)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

CASES = "/root/reference/testCases"
needs_cases = pytest.mark.skipif(not os.path.isdir(CASES),
                                 reason="reference cases absent")


def _load(case):
    from aither_tpu.io.deck import parse_deck
    from aither_tpu.io.plot3d import read_p3d
    d = parse_deck(os.path.join(CASES, case, f"{case}.inp"))
    grids = read_p3d(os.path.join(CASES, case, d["gridName"] + ".xyz"), 1.0)
    return d, grids


@needs_cases
def test_rae2822_cgrid_split():
    """Splitting the C-grid at i=184 must break the wake seam across the
    two halves with retagged partners (reference 2-proc decomposition)."""
    from aither_tpu.parallel.decompose import decompose
    d, grids = _load("rae2822")
    g2, b2, dec = decompose(grids, d.bcs, 2)
    assert dec.splits == [(0, 1, "i", 184)]
    assert dec.rank == [1, 0] and dec.parent == [0, 0]
    assert [tuple(np.array(g.shape[:3]) - 1) for g in g2] == \
        [(184, 64, 1), (184, 64, 1)]

    def surf(bi, bc_type, **kw):
        for s in b2[bi].surfaces:
            if s.bc_type == bc_type and all(
                    getattr(s, k) == v for k, v in kw.items()):
                return s
        raise AssertionError(f"no {bc_type} {kw} on block {bi}")

    # new interface pair at the cut
    assert surf(0, "interblock", imin=184, imax=184).tag == 1001
    assert surf(1, "interblock", imin=0, imax=0).tag == 2000
    # wake seam: lower half partners the upper block and vice versa
    assert surf(0, "interblock", jmin=0, jmax=0).tag == 3001
    assert surf(1, "interblock", jmin=0, jmax=0, imin=152).tag == 3000
    # the viscous wall is split at the cut
    assert surf(0, "viscousWall", imin=32, imax=184)
    assert surf(1, "viscousWall", imin=0, imax=152)


@needs_cases
def test_walllaw_dependent_split():
    """Splitting block 1 at k=8 must dependent-split block 0's interblock
    surface into two partner-tagged pieces."""
    from aither_tpu.parallel.decompose import decompose
    d, grids = _load("wallLaw")
    g2, b2, dec = decompose(grids, d.bcs, 2)
    assert dec.splits == [(1, 2, "k", 8)]
    ib0 = sorted((s.kmin, s.kmax, s.tag) for s in b2[0].surfaces
                 if s.bc_type == "interblock")
    assert ib0 == [(0, 8, 1001), (8, 50, 1002)]
    ib1 = [(s.tag, s.kmin, s.kmax) for s in b2[1].surfaces
           if s.bc_type == "interblock"]
    ib2 = [(s.tag, s.kmin, s.kmax) for s in b2[2].surfaces
           if s.bc_type == "interblock"]
    assert (5002, 8, 8) in ib1   # new cut-plane surface on the lower half
    assert (6001, 0, 0) in ib2   # and its partner on the upper half


@needs_cases
def test_whole_block_send_no_split():
    """Multi-block grids balance by moving whole blocks when possible."""
    from aither_tpu.parallel.decompose import decompose
    d, grids = _load("uniformFlow")
    g2, b2, dec = decompose(grids, d.bcs, 2)
    assert not dec.splits
    assert len(g2) == len(grids)
    loads = dec.loads(g2)
    assert max(loads) / (sum(loads) / 2) <= 1.1


def test_split_vs_unsplit_parity(tmp_path):
    """One implicit DPLUR iteration on the decomposed case must equal the
    unsplit case to roundoff — DPLUR sweeps are order-independent, so the
    only coupling is the halo swap, which delivers exact donor values."""
    from aither_tpu.parallel.spmd import build_box_case
    from aither_tpu.solver.driver import Solver
    from aither_tpu.solver import state as st

    tmp = str(tmp_path)
    s1 = build_box_case(tmp, ni=32, nj=8, nk=8)
    s2 = Solver(os.path.join(tmp, "box.inp"), workdir=tmp, nproc=2)
    assert s2.case.num_blocks == 2

    b = s1.case.blocks[0]
    g = b.g
    rng = np.random.default_rng(7)
    prim = np.array(b.prim0)
    P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
         slice(g, g + b.nk))
    prim[P] *= 1.0 + 0.02 * rng.random((s1.phys.neq, b.ni, b.nj, b.nk))

    s1.prims = {0: jnp.asarray(prim)}
    cons_n1 = s1.store_old_solution()
    cfl = s1.deck.cfl(0)
    out1, _, _, _, _ = s1._iterate(s1.prims, cons_n1, {0: 0.0}, cfl, 0)
    want = np.asarray(out1[0])[P]

    # scatter the same field into the two sub-blocks
    (blk, new_blk, d, ind) = s2.case.decomp.splits[0]
    lo, hi = s2.case.blocks
    p_lo = np.array(lo.prim0)
    p_up = np.array(hi.prim0)
    p_lo[:, g:g + lo.ni, g:g + lo.nj, g:g + lo.nk] = \
        prim[:, g:g + ind, g:g + b.nj, g:g + b.nk]
    p_up[:, g:g + hi.ni, g:g + hi.nj, g:g + hi.nk] = \
        prim[:, g + ind:g + b.ni, g:g + b.nj, g:g + b.nk]
    s2.prims = {0: jnp.asarray(p_lo), 1: jnp.asarray(p_up)}
    cons_n2 = s2.store_old_solution()
    out2, _, _, _, _ = s2._iterate(s2.prims, cons_n2, {0: 0.0, 1: 0.0},
                                   cfl, 0)
    got = np.concatenate([
        np.asarray(out2[0])[:, g:g + lo.ni, g:g + lo.nj, g:g + lo.nk],
        np.asarray(out2[1])[:, g:g + hi.ni, g:g + hi.nj, g:g + hi.nk],
    ], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
