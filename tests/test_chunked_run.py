"""Chunked production path: chunk planning (single scan shape + per-step
ragged tail), .resid parity between the chunked and per-step paths, and
the device-side debug physicality guard carried through the scan
(reference: main.cpp:231-302 host loop; MSG_ASSERT guards,
procBlock.cpp:434-437)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aither_tpu.solver.driver import Solver


def test_pick_chunk_plan_single_scan_shape():
    """For every iteration count 1..200 and several caps the plan uses
    exactly ONE scan shape: full chunks of `size` plus a per-step tail
    shorter than the cap; `chunk` is a ceiling (ADVICE r2)."""
    for chunk in (2, 8, 16, 24):
        for iterations in range(1, 201):
            size, tail = Solver._pick_chunk(iterations, chunk)
            assert 1 <= size <= max(1, min(chunk, iterations))
            assert 0 <= tail < size or (tail < chunk)
            assert (iterations - tail) % size == 0
            assert iterations - tail >= size  # at least one full chunk


def test_pick_chunk_prefers_divisors():
    # bench's 96/24 must stay 24 (ADVICE r2: cap was silently raised)
    assert Solver._pick_chunk(96, 24) == (24, 0)
    assert Solver._pick_chunk(10, 2) == (2, 0)
    # prime count: full chunks + ragged tail, not a second scan shape
    size, tail = Solver._pick_chunk(97, 16)
    assert size == 16 and tail == 1


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    from aither_tpu.parallel.spmd import build_box_case
    tmp = tmp_path_factory.mktemp("chunked")
    return build_box_case(str(tmp), ni=8, nj=4, nk=4)


def _resid_rows(root):
    with open(root + ".resid") as f:
        rows = []
        for ln in f.readlines()[1:]:
            rows.append([float(t) for t in ln.split()])
    return np.asarray(rows)


def test_tail_parity_with_per_step(tmp_path):
    """23 iterations at cap 8 runs 2 full chunks + 7 tail steps; the
    .resid content must match the pure per-step path."""
    from aither_tpu.parallel.spmd import build_box_case
    (tmp_path / "a").mkdir(exist_ok=True)
    (tmp_path / "b").mkdir(exist_ok=True)
    s1 = build_box_case(str(tmp_path / "a"), ni=8, nj=4, nk=4)
    s1.run(iterations=23, chunk=8)
    r1 = _resid_rows(s1.sim_root)
    s2 = build_box_case(str(tmp_path / "b"), ni=8, nj=4, nk=4)
    s2.run(iterations=23, chunk=0)  # per-step path
    r2 = _resid_rows(s2.sim_root)
    assert r1.shape == r2.shape
    np.testing.assert_allclose(r1, r2, rtol=1e-9, atol=1e-300)


def test_debug_chunked_guard_aborts_with_location(box):
    s = box
    s.debug = True
    g = s.case.blocks[0].g
    saved = dict(s.prims)
    s.prims = dict(s.prims)
    s.prims[0] = s.prims[0].at[s.phys.ie, g + 3, g + 1, g + 2].set(jnp.nan)
    try:
        # the NaN propagates through the first scanned iteration; the
        # packed guard must abort with SOME field + cell location
        with pytest.raises(FloatingPointError,
                           match=r"non-physical \w+ .*block 0, cell \("):
            s.run(iterations=4, chunk=4)
        # the guard came from the CHUNKED scan, not a per-step fallback
        assert hasattr(s, "_chunk_jit")
    finally:
        s.prims = saved
        s.debug = False
        if hasattr(s, "_chunk_jit"):
            del s._chunk_jit


def test_debug_chunked_clean_run(tmp_path):
    """Debug mode no longer forces the per-step path (VERDICT r2 #7):
    a healthy run completes through the chunked scan with the guard on."""
    from aither_tpu.parallel.spmd import build_box_case
    s = build_box_case(str(tmp_path), ni=8, nj=4, nk=4)
    s.debug = True
    s.run(iterations=8, chunk=4)
    assert hasattr(s, "_chunk_jit")
    rows = _resid_rows(s.sim_root)
    assert rows.shape[0] == 8 * s.deck["nonlinearIterations"]
