"""Time-marching driver: the reference main loop re-hosted around one jitted
multi-block iteration (reference: src/main.cpp:231-302, logFileManager.cpp,
output.cpp:1007-1089 residual normalization)."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import step as step_mod
from . import state as st
from .case import Case, build_case

EPS = 1.0e-30


class Solver:
    def __init__(self, deck_path: str, dtype=None, workdir=None):
        self.case = build_case(deck_path, dtype=dtype)
        self.deck = self.case.deck
        self.phys = self.case.phys
        deck = self.deck
        self.workdir = workdir or os.getcwd()
        sim_root = os.path.splitext(os.path.basename(deck_path))[0]
        self.sim_root = os.path.join(self.workdir, sim_root)

        a_ref, l_ref = deck.a_ref, deck.l_ref
        self.cfg = dict(
            recon={"constant": "constant", "weno": "weno",
                   "wenoZ": "wenoZ"}.get(deck["faceReconstruction"], "muscl"),
            kappa=deck.kappa,
            limiter=deck["limiter"],
            flux=deck["inviscidFlux"],
            dt=deck["timeStep"],
            dt_nondim=deck["timeStep"] * a_ref / l_ref,
            time_integration=deck["timeIntegration"],
        )
        self.prims = {b.index: jnp.asarray(b.prim0) for b in self.case.blocks}
        self._iterate = jax.jit(self._iteration, static_argnames=("stage",))
        self.l2_first = None
        self.iteration_start = 0

    # -- one nonlinear iteration (jitted) -----------------------------------
    def _iteration(self, prims, cons_n, cfl, stage: int):
        phys = self.phys
        case = self.case
        prims = step_mod.apply_all_bcs(phys, case, prims)
        new_prims = {}
        l2 = jnp.zeros(phys.neq, self.case.dtype)
        linfs = []
        for b in case.blocks:
            prim = prims[b.index]
            resid, specrad = step_mod.inviscid_residual(
                phys, self.cfg, b, prim)
            dims = (b.ni, b.nj, b.nk)
            dt = step_mod.local_dt(self.cfg, b.geom, specrad, b.g, dims, cfl)
            ti = self.cfg["time_integration"]
            if ti == "explicitEuler":
                prim = step_mod.explicit_euler_update(phys, b, prim, resid,
                                                      dt)
            elif ti == "rk4":
                prim = step_mod.rk4_update(phys, b, prim, cons_n[b.index],
                                           resid, dt, stage)
            else:
                raise NotImplementedError(
                    f"implicit integration {ti} handled in ImplicitSolver")
            new_prims[b.index] = prim
            bl2, blinf, bloc = step_mod.residual_norms(resid)
            l2 = l2 + bl2
            linfs.append((blinf, bloc))
        return new_prims, l2, linfs

    def store_old_solution(self):
        """conserved state at time n (reference: mgSolution.cpp:103)."""
        phys = self.phys
        out = {}
        for b in self.case.blocks:
            g = b.g
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            out[b.index] = st.cons_from_prim(phys, self.prims[b.index][P])
        return out

    # -- logging (reference format) ------------------------------------------
    def _open_logs(self, restart=False):
        mode = "a" if restart else "w"
        self.resid_file = open(self.sim_root + ".resid", mode)
        self.time_file = open(self.sim_root + ".tme", "w")
        self._print_headers(self.resid_file)
        self.time_file.write(f"{'Step':<7}{'Iter-Time':<16}{'Sim-Time':<16}\n")

    def _print_headers(self, f):
        deck = self.deck
        cols = [f"{'Step':<7}", f"{'NL-Iter':<8}"]
        cols.append(f"{'Time-Step' if deck['timeStep'] > 0 else 'CFL':<12}")
        for name in ("Res-Mass", "Res-Mom-X", "Res-Mom-Y", "Res-Mom-Z",
                     "Res-Energy"):
            cols.append(f"{name:<12}")
        if deck.is_rans:
            cols.append(f"{'Res-Tke':<12}")
            cols.append(f"{'Res-Omega':<12}")
        for name in ("Max-Eqn", "Max-Blk", "Max-I", "Max-J", "Max-K"):
            cols.append(f"{name:<8}")
        cols.append(f"{'Max-Res':<12}")
        cols.append(f"{'Res-Matrix':<12}")
        f.write("".join(cols) + "\n")

    def _update_l2_first(self, l2, nn, mm):
        """First-iteration normalization, re-maxed over the first 5 steps
        (reference: output.cpp:1028-1046)."""
        ns = self.phys.ns
        if nn == 0 and mm == 0 and self.iteration_start == 0:
            self.l2_first = l2.copy()
        elif nn < 5 and mm == 0 and self.iteration_start == 0:
            if l2[:ns].sum() > self.l2_first[:ns].sum():
                self.l2_first[:ns] = l2[:ns]
            self.l2_first[ns:] = np.maximum(self.l2_first[ns:], l2[ns:])

    def _write_residuals(self, nn, mm, cfl, l2, linf_val, linf_loc,
                         matrix_resid=0.0):
        deck = self.deck
        self._update_l2_first(l2, nn, mm)
        first = self.l2_first
        ns = self.phys.ns
        res_mass = (l2[:ns].sum() + EPS) / (first[:ns].sum() + EPS)
        res = (l2 + EPS) / (first + EPS)
        parts = [f"{nn:<7d}{mm:<8d}"]
        lead = deck["timeStep"] if deck["timeStep"] > 0 else cfl
        parts.append(f"{lead:<12.4e}")
        vals = [res_mass, res[self.phys.mx], res[self.phys.my],
                res[self.phys.mz], res[self.phys.ie]]
        if deck.is_rans:
            vals += [res[self.phys.it], res[self.phys.it + 1]]
        parts += [f"{v:<12.4e}" for v in vals]
        eqn, blk, iloc, jloc, kloc = linf_loc
        parts += [f"{eqn:<8d}{blk:<8d}{iloc:<8d}{jloc:<8d}{kloc:<8d}"]
        parts += [f"{linf_val:<12.4e}{matrix_resid:<12.4e}"]
        line = "".join(parts)
        self.resid_file.write(line + "\n")
        print(line)

    def _decode_linf(self, linfs):
        best = (-np.inf, 0, 0)
        for bi, (v, loc) in enumerate(linfs):
            v = float(v)
            if v > best[0]:
                best = (v, bi, int(loc))
        v, bi, loc = best
        b = self.case.blocks[bi]
        ncell = b.nj * b.nk
        eqn, rem = divmod(loc, b.ni * ncell)
        i, rem = divmod(rem, ncell)
        j, k = divmod(rem, b.nk)
        return v, (eqn + 1, b.parent, i, j, k)

    # -- main loop -----------------------------------------------------------
    def run(self, iterations=None):
        deck = self.deck
        iterations = iterations or deck["iterations"]
        self._open_logs()
        sim_start = time.perf_counter()
        nl_iters = deck["nonlinearIterations"]

        for nn in range(iterations):
            iter_start = time.perf_counter()
            cfl = deck.cfl(nn)
            cons_n = (self.store_old_solution()
                      if self.cfg["time_integration"] == "rk4" else
                      {b.index: 0.0 for b in self.case.blocks})
            for mm in range(nl_iters):
                prims, l2, linfs = self._iterate(
                    self.prims, cons_n, jnp.asarray(cfl, self.case.dtype),
                    stage=mm)
                self.prims = prims
                l2 = np.sqrt(np.asarray(l2))
                linf_val, linf_loc = self._decode_linf(linfs)
                self._write_residuals(nn + self.iteration_start, mm, cfl, l2,
                                      linf_val, linf_loc)
            now = time.perf_counter()
            self.time_file.write(
                f"{nn:<7d}{now - iter_start:<16.6e}{now - sim_start:<16.6e}\n")
        self.resid_file.close()
        self.time_file.close()
        return self


def run_case(deck_path: str, **kw):
    solver = Solver(deck_path, **kw)
    return solver.run()
