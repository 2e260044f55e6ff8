"""Headline benchmark: RAE2822 transonic-airfoil RANS throughput on TPU.

Metric (BASELINE.json): rae2822 implicit RANS iterations/sec on one chip.
Baseline: the reference C++ solver (noisystreet/aither) built single-rank
with g++ -O3 -march=native -std=c++14 -DNDEBUG, run on this machine's host
CPU: 60 iterations of testCases/rae2822 in 53.286 s = 1.1261 iters/sec
(timings from the reference's own <sim>.tme log, logFileManager.cpp:37-43).

Accuracy gate first: 20 fresh iterations must hit the reference's golden
normalized-L2 residuals (regressionTests.py:401-403, 1-proc variant) at 1%
relative tolerance before any throughput is reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import shutil
import sys
import tempfile
import time

REF_CASE = "/root/reference/testCases/rae2822"
BASELINE_ITERS_PER_SEC = 60.0 / 53.286
# goldens (regressionTests.py:401-403); index 3 (mom-z) is 2D roundoff noise
GOLDENS = [5.5618e-01, 6.6813e-01, 5.3620e-01, None, 4.9726e-01,
           2.5769e-09, 3.4032e-10]
WARMUP = 4
TIMED = 30


def main():
    import jax

    workdir = tempfile.mkdtemp(prefix="aither_bench_")
    for f in os.listdir(REF_CASE):
        shutil.copy(os.path.join(REF_CASE, f), workdir)
    deck = os.path.join(workdir, "rae2822.inp")

    from aither_tpu.solver.driver import Solver

    # accuracy gate (device default platform; f32 on TPU); route the
    # solver's residual log to stderr so stdout carries only the JSON line
    gate = Solver(deck, workdir=workdir)
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        gate.run(iterations=20, write_files=False)
    finally:
        sys.stdout = real_stdout
    with open(os.path.join(workdir, "rae2822.resid")) as f:
        last = f.readlines()[-1].split()
    resids = [float(v) for v in last[3:3 + len(GOLDENS)]]
    for i, (got, want) in enumerate(zip(resids, GOLDENS)):
        if want is None:
            continue
        if abs(got - want) > 0.01 * abs(want):
            print(f"ACCURACY GATE FAILED eq {i}: {got} vs {want}",
                  file=sys.stderr)
            print(json.dumps({"metric": "rae2822_rans_iters_per_sec",
                              "value": 0.0, "unit": "iters/sec",
                              "vs_baseline": 0.0}))
            return 1

    # device-kernel throughput: steady-state implicit iterations (4 LU-SGS
    # sweeps each), residual norms computed on device every iteration
    solver = Solver(deck, workdir=workdir)
    prims, cons_n, cons_nm1 = dict(solver.prims), solver.cons_n, \
        solver.cons_nm1
    cfl = solver.deck.cfl(0)
    out = solver._iterate(prims, cons_n, cons_nm1, cfl, 0)
    jax.block_until_ready(out[0])
    for _ in range(WARMUP):
        out = solver._iterate(out[0], cons_n, cons_nm1, cfl, 0)
    jax.block_until_ready(out[0])

    p = out[0]
    t0 = time.perf_counter()
    for _ in range(TIMED):
        p, l2, linfs, mr, _aux = solver._iterate(p, cons_n, cons_nm1, cfl, 0)
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0
    kernel_ips = TIMED / dt

    # production throughput: the full run() path — store_old_solution,
    # residual decode + .resid/.tme logging, exactly what the reference's
    # .tme timings include (logFileManager.cpp:37-43).  run() executes in
    # device-side chunks of CHUNK steps; the first chunk carries the scan
    # compile, so steady state = mean per-step .tme time from the second
    # chunk on.
    CHUNK = 24
    prod = Solver(deck, workdir=workdir)
    sys.stdout = sys.stderr
    try:
        prod.run(iterations=2 * CHUNK, write_files=False, chunk=CHUNK)
    finally:
        sys.stdout = real_stdout
    with open(os.path.join(workdir, "rae2822.tme")) as f:
        rows = [float(ln.split()[1]) for ln in f.readlines()[1:]]
    prod_ips = 1.0 / (sum(rows[CHUNK:]) / len(rows[CHUNK:]))

    # headline = production path (apples-to-apples with the reference's
    # .tme-derived baseline); kernel-only number reported alongside
    print(json.dumps({"metric": "rae2822_rans_kernel_iters_per_sec",
                      "value": round(kernel_ips, 3), "unit": "iters/sec",
                      "vs_baseline":
                      round(kernel_ips / BASELINE_ITERS_PER_SEC, 2)}),
          file=sys.stderr)
    print(json.dumps({"metric": "rae2822_rans_iters_per_sec",
                      "value": round(prod_ips, 3), "unit": "iters/sec",
                      "vs_baseline":
                      round(prod_ips / BASELINE_ITERS_PER_SEC, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
