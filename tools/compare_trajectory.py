"""Residual-trajectory comparison: rebuild vs locally-built reference.

Justifies regression tolerances for roundoff-chaotic cases by running BOTH
solvers on the same deck and reporting per-iteration relative differences
of every residual column (see tests/test_regression.py convectingVortex /
thermallyPerfect comments).

Usage:
    python tools/compare_trajectory.py <case> [iterations]

Requires the reference binary (tools/build_reference.sh -> /tmp/aither_ref).
"""

import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_BIN = "/tmp/aither_ref/aither"
CASES = "/root/reference/testCases"


def prep(case, dst, iters):
    src = os.path.join(CASES, case)
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), dst)
    deck = os.path.join(dst, f"{case}.inp")
    s = open(deck).read()
    s = re.sub(r"(?m)^iterations:.*$", f"iterations: {iters}", s)
    s = re.sub(r"(?m)^outputFrequency:.*$", f"outputFrequency: {iters}", s)
    with open(deck, "w") as f:
        f.write(s)
    return deck


def rows(path):
    return [ln.split() for ln in open(path)
            if ln.strip() and not ln.startswith("Step")]


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "convectingVortex"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    if not os.path.isfile(REF_BIN):
        subprocess.run([os.path.join(REPO, "tools", "build_reference.sh")],
                       check=True)

    ref_dir = tempfile.mkdtemp(prefix="traj_ref_")
    my_dir = tempfile.mkdtemp(prefix="traj_mine_")
    prep(case, ref_dir, iters)
    deck = prep(case, my_dir, iters)

    env = dict(os.environ, AITHER_INSTALL_DIRECTORY="/root/reference")
    subprocess.run([REF_BIN, f"{case}.inp"], cwd=ref_dir, env=env,
                   check=True, capture_output=True)

    from aither_tpu.solver.driver import Solver
    import io
    so, sys.stdout = sys.stdout, io.StringIO()
    try:
        Solver(deck, workdir=my_dir).run(iterations=iters)
    finally:
        sys.stdout = so

    ours = rows(os.path.join(my_dir, f"{case}.resid"))
    ref = rows(os.path.join(ref_dir, f"{case}.resid"))
    neq = len(ref[0]) - 10  # step, nl, cfl/dt, [neq], 5 loc, max, matrix
    print(f"{'step':>5} {'nl':>3}  " +
          " ".join(f"{'eq' + str(e):>9}" for e in range(neq)))
    worst = [0.0] * neq
    for o, r in zip(ours, ref):
        errs = [abs(float(o[3 + e]) - float(r[3 + e]))
                / (abs(float(r[3 + e])) + 1e-300) for e in range(neq)]
        worst = [max(w, e) for w, e in zip(worst, errs)]
        if max(errs) > 1e-4 or o is ours[-1]:
            print(f"{o[0]:>5} {o[1]:>3}  " +
                  " ".join(f"{e:9.2e}" for e in errs))
    print("worst per equation:", " ".join(f"{w:.2e}" for w in worst))


if __name__ == "__main__":
    main()
