"""Debug physicality mode: the analogue of the reference's armed FP
exceptions + MSG_ASSERT density/pressure guards (reference:
main.cpp:78-82, macros.hpp.in:32-37, procBlock.cpp:434-437)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def box_solver(tmp_path_factory):
    from aither_tpu.parallel.spmd import build_box_case
    tmp = tmp_path_factory.mktemp("debug")
    return build_box_case(str(tmp), ni=8, nj=4, nk=4)


def test_healthy_state_passes(box_solver):
    box_solver.check_physicality(0, 0, np.ones(5))


def test_seeded_nan_aborts_with_location(box_solver):
    s = box_solver
    b = s.case.blocks[0]
    g = b.g
    saved = s.prims[0]
    s.prims = dict(s.prims)
    s.prims[0] = saved.at[s.phys.ie, g + 3, g + 1, g + 2].set(jnp.nan)
    with pytest.raises(FloatingPointError, match=r"pressure.*\(3, 1, 2\)"):
        s.check_physicality(7, 0)
    s.prims[0] = saved


def test_negative_density_aborts(box_solver):
    s = box_solver
    b = s.case.blocks[0]
    g = b.g
    saved = s.prims[0]
    s.prims = dict(s.prims)
    s.prims[0] = saved.at[0, g, g, g].set(-1.0)
    with pytest.raises(FloatingPointError, match="density"):
        s.check_physicality(0, 0)
    s.prims[0] = saved


def test_nonfinite_residual_aborts(box_solver):
    with pytest.raises(FloatingPointError, match="non-finite residual"):
        box_solver.check_physicality(0, 0, np.array([1.0, np.nan, 1.0]))
