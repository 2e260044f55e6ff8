"""Roofline accounting for one solver iteration on TPU v5e.

Uses XLA's own per-executable cost model (flops + bytes accessed) for the
jitted nonlinear iteration and relates the measured iteration rate to the
chip's HBM bandwidth and MXU peak — the reference has no such accounting
(its perf story is an open TODO, /root/reference/README.md:38); on TPU the
hot loops (procBlock.cpp:384-824 flux, :1233-1879 viscous) are
bandwidth-bound stencils, so % of HBM roofline is the number that matters.
"""

import jax.numpy as jnp

# TPU v5e, one chip
HBM_BYTES_PER_S = 819e9
PEAK_BF16_FLOPS = 197e12


def iteration_cost(solver):
    """XLA cost analysis (flops, bytes accessed) of one compiled
    nonlinear iteration.  AOT-lowers the same entry point run() uses;
    the jit cache makes this cheap when it was already compiled."""
    args = (solver._geo_args, solver.prims, solver.cons_n,
            solver.cons_nm1,
            jnp.asarray(solver.deck.cfl(0), solver.case.dtype))
    lowered = solver._iterate_geo.lower(*args, stage=0,
                                        bc_aux=solver.bc_aux)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def roofline_report(solver, iters_per_sec):
    """One JSON-able dict: achieved vs roofline at the measured rate.

    The cost model counts each HLO op's accesses BEFORE fusion, so its
    byte count is an upper bound on true HBM traffic; when the achieved
    "bandwidth" computed from it exceeds the chip's physical peak, the
    executable is provably fusing away at least the excess (reported as
    ``min_fused_fraction``).  ``hbm_ceiling_iters_per_sec`` is the
    speed of light IF every cost-model byte hit HBM — the real ceiling
    is higher by exactly the fused fraction."""
    flops, nbytes = iteration_cost(solver)
    achieved_bw = nbytes * iters_per_sec
    achieved_fl = flops * iters_per_sec
    out = {
        "metric": "roofline_v5e",
        "cells": solver.case.total_cells,
        "flops_per_iter": flops,
        "cost_model_bytes_per_iter": nbytes,
        "arithmetic_intensity": round(flops / nbytes, 3) if nbytes else 0.0,
        "cost_model_GBps_at_rate": round(achieved_bw / 1e9, 1),
        "pct_hbm_roofline_upper": round(
            100.0 * achieved_bw / HBM_BYTES_PER_S, 1),
        "achieved_GFLOPs": round(achieved_fl / 1e9, 1),
        "pct_bf16_peak": round(100.0 * achieved_fl / PEAK_BF16_FLOPS, 2),
    }
    if achieved_bw > HBM_BYTES_PER_S:
        out["min_fused_fraction"] = round(
            1.0 - HBM_BYTES_PER_S / achieved_bw, 3)
    if nbytes:
        out["hbm_ceiling_iters_per_sec"] = round(HBM_BYTES_PER_S / nbytes, 1)
    return out


if __name__ == "__main__":
    import json
    import sys
    from aither_tpu.solver.driver import Solver

    solver = Solver(sys.argv[1])
    print(json.dumps(roofline_report(solver, float(sys.argv[2])
                                     if len(sys.argv) > 2 else 1.0)))
