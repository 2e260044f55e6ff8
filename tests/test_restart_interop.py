"""Reference-binary restart interoperability (round-4 verdict missing #1).

The actual byte-compat contract of the ``.rst`` format (reference:
src/output.cpp:591-754 WriteRestart, :756-900 ReadRestart): a restart
written by ONE implementation must resume in the OTHER and still hit the
reference's own 100-iteration shockTube goldens — the same
convergence-history-equivalence criterion the reference's restart
regression uses (testCases/regressionTests.py:292-299).

Both directions are covered:
  * reference binary writes shockTube_50.rst  -> aither_tpu resumes 50
  * aither_tpu writes shockTube_50.rst        -> reference binary resumes 50

Requires the locally-built reference binary (tools/build_reference.sh;
built on demand and cached at /tmp/aither_ref).
"""

import os
import re
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CASES = "/root/reference/testCases"
REF_BIN = "/tmp/aither_ref/aither"

# official shockTube goldens at 100 iterations (regressionTests.py:279-283);
# eqs 2/3 (mom-y/z of the 1-D case) are normalization placeholders
GOLDENS = [4.8537e-01, 4.5855e-01, None, None, 2.6434e-01]


def _reference_binary():
    if not os.path.isfile(REF_BIN):
        subprocess.run([os.path.join(REPO, "tools", "build_reference.sh")],
                       check=True, capture_output=True)
    return REF_BIN


def _prep(dst, iterations):
    src = os.path.join(CASES, "shockTube")
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), dst)
    deck = os.path.join(dst, "shockTube.inp")
    s = open(deck).read()
    s = re.sub(r"(?m)^iterations:.*$", f"iterations: {iterations}", s)
    with open(deck, "w") as f:
        f.write(s)
    return deck


def _run_reference(workdir, *args):
    env = dict(os.environ, AITHER_INSTALL_DIRECTORY="/root/reference")
    subprocess.run([_reference_binary(), "shockTube.inp", *args],
                   cwd=workdir, env=env, check=True, capture_output=True)


def _check_goldens(resid_path):
    with open(resid_path) as f:
        last = f.readlines()[-1].split()
    assert int(last[0]) == 99, f"resume did not reach step 99: {last[:2]}"
    resids = [float(v) for v in last[3:8]]
    for i, (got, want) in enumerate(zip(resids, GOLDENS)):
        if want is not None:
            assert got == pytest.approx(want, rel=0.01), (
                f"eq {i}: {got} vs golden {want}")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
def test_reference_writes_we_resume(tmp_path):
    """reference binary 50 iters -> .rst -> aither_tpu 50 more -> 100-iter
    goldens (reads the reference's true on-disk bytes, not our own)."""
    from aither_tpu.solver.driver import Solver
    wd = str(tmp_path)
    deck = _prep(wd, 50)
    _run_reference(wd)
    rst = os.path.join(wd, "shockTube_50.rst")
    assert os.path.isfile(rst), "reference did not write the restart"
    # fresh dir for the resume so the .resid holds only our rows
    resume = os.path.join(wd, "resume")
    _prep(resume, 50)
    shutil.copy(rst, resume)
    solver = Solver(os.path.join(resume, "shockTube.inp"), workdir=resume,
                    restart_path=os.path.join(resume, "shockTube_50.rst"))
    solver.run(iterations=50)
    _check_goldens(os.path.join(resume, "shockTube.resid"))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
def test_we_write_reference_resumes(tmp_path):
    """aither_tpu 50 iters -> .rst -> reference binary 50 more -> 100-iter
    goldens (the reference's own ReadRestart parses our bytes)."""
    from aither_tpu.solver.driver import Solver
    wd = str(tmp_path)
    deck = _prep(wd, 50)
    Solver(deck, workdir=wd).run(iterations=50, write_files=True)
    rst = os.path.join(wd, "shockTube_50.rst")
    assert os.path.isfile(rst)
    resume = os.path.join(wd, "resume")
    _prep(resume, 50)
    shutil.copy(rst, resume)
    _run_reference(resume, "shockTube_50.rst")
    _check_goldens(os.path.join(resume, "shockTube.resid"))
