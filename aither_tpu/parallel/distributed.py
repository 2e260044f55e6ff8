"""Multi-process (multi-host) runtime: one case across many controllers.

Reference counterpart: the MPI runtime —
  * ``src/main.cpp:121-177``      rank 0 reads the deck + grid, broadcasts
  * ``src/parallel.cpp:188-320``  MPI datatypes + scatter of decomposed
                                  procBlocks to ranks
  * ``src/procBlock.cpp:4043-4663`` hand-packed ghost-exchange buffers

TPU-first redesign (multi-controller JAX, ``jax.distributed``): every
process runs the SAME program.  Process 0 reads the case files and
broadcasts their raw bytes (``multihost_utils.broadcast_one_to_all`` —
the collective rides the fabric ``jax.distributed`` set up); every
process materializes the case in a private workdir and builds identical
geometry; the solver state is then sharded over the GLOBAL device mesh
(`Solver.enable_sharding`), so the jitted iteration is one SPMD program
and XLA's GSPMD partitioner inserts the halo collective-permutes —
cross-host over DCN where the mesh crosses hosts, over ICI inside a
slice.  There are no hand-packed exchange buffers to maintain at all;
the reference's scatter step becomes a sharding annotation.

On a real pod each host's process is started by the cluster launcher and
``initialize()`` picks its coordinates from the TPU environment; for
single-host testing ``launch_local`` spawns N OS processes with a
virtual CPU mesh (the same mechanism the test suite and the driver
dry-run use).
"""

from __future__ import annotations

import os
import pickle
import socket
import subprocess
import sys

import numpy as np


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None):
    """Join the multi-controller job (reference: MPI_Init,
    ``src/main.cpp:121-130``).  Must run before any other jax use in the
    process.  With no arguments jax auto-detects cluster coordinates
    (TPU pod metadata / cluster env vars)."""
    import jax
    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=int(num_processes),
                  process_id=int(process_id))
    if local_device_ids is not None:
        kw.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kw)


def global_put(x, sharding):
    """Place a host-local array as a global array on a sharding that may
    span non-addressable devices.  Every process must hold the SAME host
    value (true by construction here: the case bytes are broadcast, the
    geometry is computed identically everywhere) — the multi-controller
    analogue of the reference's MPI scatter, except no data moves: each
    process materializes exactly its addressable shards."""
    import jax
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def distribute_case(workdir, src_dir=None):
    """Rank-0-reads-the-grid protocol (reference: ``main.cpp:121-163`` —
    only ROOT touches the filesystem for inputs).  Process 0 reads every
    file in ``src_dir`` and broadcasts {name: bytes}; all processes
    (including 0) materialize them in their private ``workdir``.  Two
    broadcasts: a length scalar first, because the collective needs a
    shape agreed on all processes before the payload can move."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        if src_dir is None:
            raise ValueError("process 0 needs src_dir")
        payload = pickle.dumps({
            name: open(os.path.join(src_dir, name), "rb").read()
            for name in sorted(os.listdir(src_dir))
            if os.path.isfile(os.path.join(src_dir, name))})
        buf = np.frombuffer(payload, dtype=np.uint8)
    else:
        buf = np.zeros(0, dtype=np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(
        np.int64(buf.size)))
    if buf.size != n:
        buf = np.zeros(n, dtype=np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    files = pickle.loads(buf.tobytes())
    os.makedirs(workdir, exist_ok=True)
    for name, data in files.items():
        with open(os.path.join(workdir, name), "wb") as f:
            f.write(data)
    return workdir


def run_distributed(deck_path, iterations=None, write_files=False,
                    chunk=16, n_devices=None, **solver_kw):
    """Build the solver in every process and run it sharded over the
    global device mesh.  Every process traces/compiles the same SPMD
    program; residual logs land in each process's workdir (identical
    content — the residuals are global reductions, replicated by GSPMD).
    Returns the Solver."""
    import jax
    from ..solver.driver import Solver
    solver = Solver(deck_path, **solver_kw)
    solver.enable_sharding(n_devices or len(jax.devices()))
    solver.run(iterations=iterations, write_files=write_files, chunk=chunk)
    return solver


_BARRIER_SEQ = [0]


def barrier_sync(tag: str, timeout_ms: int = 1_800_000) -> None:
    """Hold every process at a coordination-service barrier (plain gRPC
    through the jax.distributed coordinator — NOT a device collective).

    Used between compiling and first-executing a cross-process program:
    Gloo establishes its TCP pairs lazily at the first collective with a
    hard ~30 s connect/KV timeout, so a process that starts executing
    while a peer is still compiling (e.g. one loads a persisted
    executable and the other recompiles) kills the whole job.  The
    reference has the same structural point in MPI_Barrier after setup
    (main.cpp:225).  Barrier ids must be unique per use; every process
    calls these in the same program order, so a counter suffix agrees
    globally."""
    import jax
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is None:
        return
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(f"aither_{tag}_{_BARRIER_SEQ[0]}", timeout_ms)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_local(n_procs, local_devices, case_dir, deck_name,
                 out_root, iterations, chunk=16, timeout=3600):
    """Single-host test launcher: ``n_procs`` OS processes with
    ``local_devices`` virtual CPU devices each (the production analogue
    is the cluster launcher starting one process per TPU host).  Only
    rank 0 is told where the case lives — the others receive it over the
    broadcast, proving the rank-0-reads protocol.  Returns the per-rank
    workdirs; raises on any nonzero exit."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # native float64 so the parity comparison against the single-process
    # run is meaningful (same as tests/conftest.py); production TPU jobs
    # launch through a cluster launcher, not this helper
    env["JAX_ENABLE_X64"] = "1"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
        + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("_AITHER_DRYRUN_CHILD", None)
    workdirs = [os.path.join(out_root, f"rank{i}") for i in range(n_procs)]
    procs = []
    for i in range(n_procs):
        cmd = [sys.executable, "-m", "aither_tpu.parallel.distributed",
               "--coordinator", f"localhost:{port}",
               "--num-procs", str(n_procs), "--proc-id", str(i),
               "--deck", deck_name, "--workdir", workdirs[i],
               "--iterations", str(iterations), "--chunk", str(chunk),
               "--platform", "cpu"]
        if i == 0:
            cmd += ["--case-dir", case_dir]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
    if any(p.returncode != 0 for p in procs):
        raise RuntimeError(
            "distributed run failed:\n" + "\n".join(
                f"--- rank {i} (rc={p.returncode}) ---\n{o[-4000:]}"
                for i, (p, o) in enumerate(zip(procs, outs))))
    return workdirs


def _main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="one process of a multi-controller aither_tpu job "
                    "(reference: one MPI rank of `mpirun -np N aither`)")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on a TPU pod — "
                         "auto-detected)")
    ap.add_argument("--num-procs", type=int, default=None)
    ap.add_argument("--proc-id", type=int, default=None)
    ap.add_argument("--case-dir", default=None,
                    help="case directory; required on process 0 only")
    ap.add_argument("--deck", required=True,
                    help="deck file name inside the case directory")
    ap.add_argument("--workdir", required=True,
                    help="this process's private working directory")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--write-files", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="pin jax_platforms (the launcher passes 'cpu' "
                         "for the virtual-mesh test path; the environment "
                         "may preload a tunneled TPU platform that would "
                         "otherwise win over JAX_PLATFORMS)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    initialize(args.coordinator, args.num_procs, args.proc_id)
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    os.makedirs(args.workdir, exist_ok=True)
    distribute_case(args.workdir, src_dir=args.case_dir)
    solver = run_distributed(
        os.path.join(args.workdir, args.deck),
        iterations=args.iterations, write_files=args.write_files,
        chunk=args.chunk, workdir=args.workdir)
    print(f"proc {jax.process_index()}/{jax.process_count()}: "
          f"{solver.sim_root} done over {len(jax.devices())} devices")


if __name__ == "__main__":
    _main()
