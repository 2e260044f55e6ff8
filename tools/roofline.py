"""Roofline accounting for one solver iteration on TPU v5e.

Relates the measured iteration rate to (a) XLA's per-executable cost
model and (b) a MEASURED HBM bandwidth ceiling — the reference has no
such accounting (its perf story is an open TODO,
/root/reference/README.md:38); on TPU the hot loops
(procBlock.cpp:384-824 flux, :1233-1879 viscous) are bandwidth-bound
stencils, so % of the HBM roofline is the number that matters.

Cost-model semantics, VALIDATED AT RUNTIME on this stack
(``validate_cost_model``) rather than assumed:

* ``bytes accessed`` of a compiled executable is **post-fusion**: a
  fused triad (add+mul) reports exactly 3N*w bytes, not the 6N*w a
  pre-fusion count would give.  (Round-3 called this a "pre-fusion
  upper bound" — measured: wrong.)
* **while/scan bodies are counted ONCE**, not per trip (a 16-trip triad
  chain reports ~2.3x one body, not 16x).  For this solver that is a
  small bias: the straight-line residual dominates the byte count, and
  each sweep's scan trips touch disjoint planes whose union is the
  one-slab traffic the single count already reports.
* Buffers the TPU keeps resident in VMEM (e.g. small scan carries) are
  still counted as accesses, so the cost-model bytes can slightly
  OVERCOUNT true HBM traffic.

``measure_bandwidth`` measures the practical HBM ceiling with a scan-
chained triad whose 3x256 MB working set cannot be VMEM-resident; the
K-difference timing cancels the dispatch/fetch round-trip of the
tunneled device (which makes single-dispatch timing meaningless —
measured: a 26 TB/s "result" from naive block_until_ready timing).
Measured on this chip: 681 GB/s (83% of the 819 GB/s nameplate).
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


def validate_cost_model(n=1 << 20):
    """Self-check of the two cost-model facts the report relies on.
    Returns {"post_fusion": bool, "loop_body_counted_once": bool}."""
    import jax

    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 2.0, jnp.float32)

    def bytes_of(fn):
        ca = jax.jit(fn).lower(a, b).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("bytes accessed", 0.0))

    triad = bytes_of(lambda a, b: a + b * 1.5)
    post_fusion = abs(triad - 3 * n * 4) < 0.1 * n * 4

    def chain(a, b):
        return jax.lax.scan(lambda c, _: (c + b * 1.5, None), a, None,
                            length=16)[0]
    chained = bytes_of(chain)
    body_once = chained < 8 * 3 * n * 4   # 16 bodies would be 16x

    return {"post_fusion": bool(post_fusion),
            "loop_body_counted_once": bool(body_once)}


def measure_bandwidth(n=64 * 1024 * 1024, k_lo=8, k_hi=40, reps=4):
    """Measured triad bandwidth (GB/s) on the live device.

    3 arrays x 256 MB (default) force every trip through HBM (a 64 MB
    carry is provably kept VMEM-resident by XLA: it 'measures' 2.2 TB/s);
    timing the DIFFERENCE between a k_hi-trip and a k_lo-trip chain
    cancels the constant dispatch + fetch round-trip of the tunnel."""
    import time
    import jax

    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 2.0, jnp.float32)

    def chain(k):
        def f(a, b):
            return jax.lax.scan(lambda c, _: (c + b * 1.5, None), a, None,
                                length=k)[0]
        return jax.jit(f)

    def timed(k):
        f = chain(k)
        y = f(a, b)
        float(y[0])                     # force completion + fetch
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            y = f(a, b)
            float(y[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    nbytes = (k_hi - k_lo) * 3 * n * 4
    return nbytes / (t_hi - t_lo) / 1e9


def roofline_report(solver, iters_per_sec, measure=True):
    """One JSON-able dict: achieved vs roofline at the measured rate.

    ``post_fusion_bytes_per_iter`` is XLA's executable-level count —
    validated post-fusion (see module docstring), biased low by
    loop-bodies-counted-once and high by VMEM-resident carries.
    ``implied_GBps`` = that byte count at the measured rate;
    ``measured_GBps_peak`` is the live triad measurement.  When the
    implied bandwidth reaches/exceeds the measured practical peak, the
    executable is AT the HBM roofline (the excess being exactly the
    VMEM-resident fraction)."""
    flops, nbytes = iteration_cost(solver)
    achieved_bw = nbytes * iters_per_sec
    achieved_fl = flops * iters_per_sec
    out = {
        "metric": "roofline_v5e",
        "cells": solver.case.total_cells,
        "flops_per_iter": flops,
        "post_fusion_bytes_per_iter": nbytes,
        "arithmetic_intensity": round(flops / nbytes, 3) if nbytes else 0.0,
        "implied_GBps": round(achieved_bw / 1e9, 1),
        "pct_hbm_nameplate": round(100.0 * achieved_bw / HBM_BYTES_PER_S, 1),
        "achieved_GFLOPs": round(achieved_fl / 1e9, 1),
        "pct_bf16_peak": round(100.0 * achieved_fl / PEAK_BF16_FLOPS, 2),
    }
    if nbytes:
        out["hbm_ceiling_iters_per_sec"] = round(HBM_BYTES_PER_S / nbytes, 1)
    if measure:
        try:
            out["cost_model_validated"] = validate_cost_model()
            peak = measure_bandwidth()
            out["measured_GBps_peak"] = round(peak, 1)
            out["pct_of_measured_peak"] = round(
                100.0 * achieved_bw / (peak * 1e9), 1)
        except Exception as e:  # measurement must never break the bench
            out["measurement_error"] = repr(e)[:160]
    return out


if __name__ == "__main__":
    import json
    import sys
    from aither_tpu.solver.driver import Solver

    solver = Solver(sys.argv[1])
    print(json.dumps(roofline_report(solver, float(sys.argv[2])
                                     if len(sys.argv) > 2 else 1.0)))
