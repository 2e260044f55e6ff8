"""File output and restart for DECOMPOSED runs must use the original
block structure (reference: output.cpp:595,1089-1166 Recombine;
parallel.hpp:137-154 DecompArray re-splits restarts on read)."""

import os
import shutil

import numpy as np
import pytest

CASES = "/root/reference/testCases"
needs_cases = pytest.mark.skipif(not os.path.isdir(CASES),
                                 reason="reference cases absent")


def test_join_split_roundtrip():
    """split_cell_arrays . join_cell_arrays == identity over a chained
    split history (including re-splitting an already split block)."""
    from aither_tpu.parallel.decompose import (join_cell_arrays,
                                               split_cell_arrays)
    rng = np.random.default_rng(7)
    parent = [rng.normal(size=(5, 12, 8, 6)), rng.normal(size=(5, 4, 4, 4))]
    splits = [(0, 2, "i", 5), (0, 3, "j", 3), (2, 4, "k", 2)]
    subs = split_cell_arrays(splits, parent)
    assert len(subs) == 5
    assert subs[0].shape == (5, 5, 3, 6)
    back = join_cell_arrays(splits, subs)
    assert len(back) == 2
    for a, b in zip(parent, back):
        np.testing.assert_array_equal(a, b)


def _copy_case(case, dst):
    for f in os.listdir(os.path.join(CASES, case)):
        shutil.copy(os.path.join(CASES, case, f), dst)


@needs_cases
def test_decomposed_initial_output_matches(tmp_path):
    """Grid/flow files written from a 2-slot decomposed run at the initial
    state are byte-identical to the undecomposed run's (same state, same
    parent block structure)."""
    from aither_tpu.solver.driver import Solver
    d1 = tmp_path / "p1"
    d2 = tmp_path / "p2"
    for d in (d1, d2):
        d.mkdir()
        _copy_case("subsonicCylinder", str(d))
    s1 = Solver(str(d1 / "subsonicCylinder.inp"), workdir=str(d1),
                nproc=1)
    s2 = Solver(str(d2 / "subsonicCylinder.inp"), workdir=str(d2),
                nproc=2)
    assert len(s2.case.blocks) == 2 and s2.case.decomp.splits
    for s in (s1, s2):
        s.write_grid_center()
        s.write_output(0)
    for name in os.listdir(str(d1)):
        if not (name.endswith(".fun") or name.endswith("_center.xyz")):
            continue
        with open(str(d1 / name), "rb") as f:
            a = f.read()
        with open(str(d2 / name), "rb") as f:
            b = f.read()
        assert a == b, f"{name} differs between 1-proc and decomposed run"


@needs_cases
def test_decomposed_restart_roundtrip(tmp_path):
    """A decomposed run writes restarts in the ORIGINAL block structure;
    both a decomposed and an undecomposed solver can resume from it with
    state equal to the writer's (up to the dimensional f8 roundtrip)."""
    from aither_tpu.io.restart import read_restart
    from aither_tpu.parallel.decompose import join_cell_arrays
    from aither_tpu.solver.driver import Solver
    tmp = str(tmp_path)
    _copy_case("subsonicCylinder", tmp)
    deck = os.path.join(tmp, "subsonicCylinder.inp")
    s2 = Solver(deck, workdir=tmp, nproc=2)
    s2.run(iterations=10, write_files=False)
    s2.write_restart(10)
    rst = os.path.join(tmp, "subsonicCylinder_10.rst")
    assert os.path.isfile(rst)

    # parent structure on disk: one block with the undecomposed dims
    rec = read_restart(rst)
    assert len(rec["blocks"]) == 1
    g = s2.case.blocks[0].g
    splits = s2.case.decomp.splits
    interiors = [np.asarray(s2.prims[b.index])[
        :, g:g + b.ni, g:g + b.nj, g:g + b.nk] for b in s2.case.blocks]
    joined = join_cell_arrays(splits, interiors)
    assert rec["blocks"][0].shape[1:] == joined[0].shape[1:]

    # decomposed resume: state round-trips through the parent-structure
    # file and the forward re-split
    s2b = Solver(deck, workdir=tmp, nproc=2, restart_path=rst)
    for b in s2.case.blocks:
        a = np.asarray(s2.prims[b.index])[:, g:g + b.ni, g:g + b.nj,
                                          g:g + b.nk]
        c = np.asarray(s2b.prims[b.index])[:, g:g + b.ni, g:g + b.nj,
                                           g:g + b.nk]
        np.testing.assert_allclose(c, a, rtol=1e-12, atol=1e-14)

    # cross-proc-count resume (the reference's restart contract)
    s1b = Solver(deck, workdir=tmp, nproc=1, restart_path=rst)
    b0 = s1b.case.blocks[0]
    c = np.asarray(s1b.prims[b0.index])[:, g:g + b0.ni, g:g + b0.nj,
                                        g:g + b0.nk]
    np.testing.assert_allclose(c, joined[0], rtol=1e-12, atol=1e-14)
    assert s1b.iteration_start == 10


@needs_cases
def test_decomposed_rank_global_position_fields(tmp_path):
    """`rank` / `globalPosition` output variables carry the REAL
    decomposition map (reference: output.cpp:278-283 SplitBlockNumber ->
    decomposition::Rank / procBlock::GlobalPos), recombined into the
    parent block layout."""
    import re
    from aither_tpu.io.output import read_fun_file
    from aither_tpu.solver.driver import Solver
    tmp = str(tmp_path)
    _copy_case("subsonicCylinder", tmp)
    deck = os.path.join(tmp, "subsonicCylinder.inp")
    s = open(deck).read()
    s = re.sub(r"(?m)^outputVariables:.*$",
               "outputVariables: <density, rank, globalPosition>", s)
    with open(deck, "w") as f:
        f.write(s)
    s2 = Solver(deck, workdir=tmp, nproc=2)
    assert len(s2.case.blocks) == 2 and s2.case.decomp.splits
    s2.write_output(0)
    _, blocks = read_fun_file(os.path.join(tmp,
                                           "subsonicCylinder_0_center.fun"))
    assert len(blocks) == 1                 # parent layout on disk
    # variable order in the file = deck.output_variables (sorted):
    # [density, globalPosition, rank]
    names = s2.deck.output_variables
    rank = blocks[0][names.index("rank")]
    gpos = blocks[0][names.index("globalPosition")]
    decomp = s2.case.decomp
    (lo, up, d, ind) = decomp.splits[0]
    ax = "ijk".index(d)
    sl_lo = [slice(None)] * 3
    sl_lo[ax] = slice(0, ind)
    sl_up = [slice(None)] * 3
    sl_up[ax] = slice(ind, None)
    np.testing.assert_array_equal(rank[tuple(sl_lo)],
                                  float(decomp.rank[lo]))
    np.testing.assert_array_equal(rank[tuple(sl_up)],
                                  float(decomp.rank[up]))
    np.testing.assert_array_equal(gpos[tuple(sl_lo)], float(lo))
    np.testing.assert_array_equal(gpos[tuple(sl_up)], float(up))
    # the two halves land on different device slots
    assert decomp.rank[lo] != decomp.rank[up]


@needs_cases
def test_undecomposed_rank_global_position(tmp_path):
    """nproc=1 multi-block case: rank stays 0 everywhere, globalPosition
    is the block's index in the global vector."""
    import re
    from aither_tpu.io.output import read_fun_file
    from aither_tpu.solver.driver import Solver
    tmp = str(tmp_path)
    _copy_case("multiblockCylinder", tmp)
    deck = os.path.join(tmp, "multiblockCylinder.inp")
    s = open(deck).read()
    s = re.sub(r"(?m)^outputVariables:.*$",
               "outputVariables: <density, rank, globalPosition>", s)
    with open(deck, "w") as f:
        f.write(s)
    s1 = Solver(deck, workdir=tmp, nproc=1)
    s1.write_output(0)
    _, blocks = read_fun_file(
        os.path.join(tmp, "multiblockCylinder_0_center.fun"))
    assert len(blocks) > 1
    names = s1.deck.output_variables
    ri, gi = names.index("rank"), names.index("globalPosition")
    for bi, blk in enumerate(blocks):
        np.testing.assert_array_equal(blk[ri], 0.0)
        np.testing.assert_array_equal(blk[gi], float(bi))
