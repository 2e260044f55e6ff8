"""Command-line entry point, mirroring the reference's invocation
(reference: src/main.cpp:55-319):

    python -m aither_tpu input.inp [restart.rst]

Runs the full time-marching loop with residual logging to <sim>.resid /
<sim>.tme and function/restart output at the deck's frequencies.

Device/precision flags (instead of mpirun ranks):
    --platform {tpu,cpu}   JAX platform (default: leave to JAX)
    --x64                  enable float64 (default on CPU; TPU runs f32)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="aither-tpu",
        description="TPU-native multi-block structured compressible "
                    "CFD solver")
    parser.add_argument("input", help="input deck (.inp)")
    parser.add_argument("restart", nargs="?", default=None,
                        help="restart file (.rst) to resume from")
    parser.add_argument("--platform", default=None,
                        choices=("tpu", "cpu", "axon"))
    parser.add_argument("--x64", action="store_true", default=None,
                        help="force float64 computation")
    parser.add_argument("--no-x64", dest="x64", action="store_false")
    parser.add_argument("--iterations", type=int, default=None,
                        help="override deck iteration count")
    parser.add_argument("--no-files", action="store_true",
                        help="skip .fun/.rst output")
    parser.add_argument("--nproc", type=int, default=1,
                        help="decompose the grid into this many device "
                             "slots (reference: mpirun -np N)")
    parser.add_argument("--debug", action="store_true", default=None,
                        help="per-iteration physicality checks (analogue "
                             "of the reference's FP-exception trapping); "
                             "unset defers to AITHER_DEBUG=1")
    parser.add_argument("--shard", type=int, default=0, metavar="N",
                        help="shard block state over an N-device mesh "
                             "(XLA GSPMD halo collectives over ICI; the "
                             "reference's MPI rank parallelism)")
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    platform = jax.devices()[0].platform
    use_x64 = args.x64 if args.x64 is not None else platform == "cpu"
    if use_x64:
        jax.config.update("jax_enable_x64", True)

    print(f"aither-tpu running on {jax.devices()} "
          f"(dtype: {'float64' if use_x64 else 'float32'})")

    from .solver.driver import Solver
    solver = Solver(args.input, restart_path=args.restart,
                    nproc=args.nproc, debug=args.debug)
    if args.shard:
        solver.enable_sharding(args.shard)
    solver.run(iterations=args.iterations, write_files=not args.no_files)
    print("Program Complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
