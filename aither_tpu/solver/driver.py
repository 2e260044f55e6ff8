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
from . import implicit as imp
from .case import Case, build_case

EPS = 1.0e-30


class Solver:
    def __init__(self, deck_path: str, dtype=None, workdir=None,
                 restart_path=None):
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
            theta=deck.theta,
            zeta=deck.zeta,
            multilevel_time=deck.is_multilevel_in_time,
            dual_time_cfl=deck["dualTimeCFL"],
            matrix_relaxation=deck["matrixRelaxation"],
            matrix_solver=deck["matrixSolver"],
            matrix_sweeps=deck["matrixSweeps"],
            matrix_init=deck.matrix_requires_initialization(),
            viscous=deck.is_viscous,
            implicit=deck.is_implicit,
            block_matrix=deck.is_block_matrix,
            turbulent=deck.is_turbulent,
            turb_model=deck["turbulenceModel"],
            viscous_recon=deck["viscousFaceReconstruction"],
            viscous_cfl_coeff=deck.viscous_cfl_coefficient(),
            diffusion=deck["diffusionModel"],
            schmidt=deck["schmidtNumber"],
            turb_schmidt=0.7,
        )
        self.prims = {b.index: jnp.asarray(b.prim0) for b in self.case.blocks}
        self.is_restart = restart_path is not None
        self.l2_first = None
        self.iteration_start = 0
        if self.is_restart:
            self._load_restart(restart_path)
        if deck.is_implicit:
            self.ictx = {b.index: imp.build_implicit_context(b)
                         for b in self.case.blocks}
        self._iterate = jax.jit(self._iteration, static_argnames=("stage",))
        self.cons_n = self.store_old_solution()
        self.cons_nm1 = (dict(self.cons_n) if deck.is_multilevel_in_time
                         else {b.index: 0.0 for b in self.case.blocks})
        if self.is_restart and getattr(self, "_restart_nm1", None) is not None:
            from ..io.restart import cons_from_restart
            for b in self.case.blocks:
                self.cons_nm1[b.index] = jnp.asarray(cons_from_restart(
                    self._restart_nm1[b.index], self.phys, self.deck,
                    mu_ref=self.phys.mu_mix_ref), self.case.dtype)

    # -- one nonlinear iteration (jitted) -----------------------------------
    def _iteration(self, prims, cons_n, cons_nm1, cfl, stage: int):
        phys = self.phys
        case = self.case
        prims = step_mod.apply_all_bcs(phys, case, prims)
        residuals, specrads, diags, dts = {}, {}, {}, {}
        auxs = {}
        for b in case.blocks:
            (resid, sr_f, sr_t, dg_f, dg_t, _, prim_v,
             aux) = step_mod.full_residual(phys, self.cfg, b, prims[b.index])
            prims[b.index] = prim_v  # includes viscous-wall ghosts
            auxs[b.index] = aux
            residuals[b.index] = resid
            sr_max = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f
            specrads[b.index] = sr_max
            diags[b.index] = (dg_f, dg_t)
            dts[b.index] = step_mod.local_dt(self.cfg, b.geom, sr_max, b.g,
                                             (b.ni, b.nj, b.nk), cfl)

        matrix_resid = jnp.zeros((), self.case.dtype)
        new_prims = {}
        if self.cfg["implicit"]:
            new_prims, matrix_resid = self._implicit_update(
                prims, residuals, specrads, diags, dts, cons_n, cons_nm1,
                auxs)
        else:
            for b in case.blocks:
                prim = prims[b.index]
                ti = self.cfg["time_integration"]
                if ti == "explicitEuler":
                    prim = step_mod.explicit_euler_update(
                        phys, b, prim, residuals[b.index], dts[b.index])
                elif ti == "rk4":
                    prim = step_mod.rk4_update(phys, b, prim, cons_n[b.index],
                                               residuals[b.index],
                                               dts[b.index], stage)
                new_prims[b.index] = prim

        l2 = jnp.zeros(phys.neq, self.case.dtype)
        linfs = []
        for b in case.blocks:
            bl2, blinf, bloc = step_mod.residual_norms(residuals[b.index])
            l2 = l2 + bl2
            linfs.append((blinf, bloc))
        return new_prims, l2, linfs, matrix_resid

    # -- implicit path (reference: mgSolution::ImplicitUpdate) ---------------
    def _implicit_update(self, prims, residuals, specrads, diags, dts,
                         cons_n, cons_nm1, auxs):
        phys = self.phys
        case = self.case
        cfg = self.cfg
        g = case.blocks[0].g

        inv_diag, a_diag, bs = {}, {}, {}
        dus = {}
        for b in case.blocks:
            dt = dts[b.index]
            if cfg["block_matrix"]:
                aux = auxs[b.index]
                (af, at), (inv_flow, inv_turb) = imp.build_block_diagonal(
                    phys, b, cfg, aux["diag_flow_blk"], aux["diag_turb_blk"],
                    specrads[b.index], dt)
                inv_diag[b.index] = (inv_flow, inv_turb)
                a_diag[b.index] = (af, at)
            else:
                inv_flow, inv_turb = imp.build_diagonal(
                    phys, b, cfg, diags[b.index][0], diags[b.index][1],
                    specrads[b.index], dt)
                inv_diag[b.index] = (inv_flow, inv_turb)
                a_diag[b.index] = (1.0 / inv_flow,
                                   None if inv_turb is None
                                   else 1.0 / inv_turb)
            bs[b.index] = imp.rhs_b(phys, b, cfg, prims[b.index],
                                    residuals[b.index], cons_n[b.index],
                                    cons_nm1[b.index], dt)
            shape = (phys.neq,) + b.shape
            du = jnp.zeros(shape, self.case.dtype)
            if cfg["matrix_init"]:
                x0 = imp.diag_mult(phys, inv_flow, inv_turb, bs[b.index])
                P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                     slice(g, g + b.nk))
                du = du.at[P].set(x0)
            dus[b.index] = du

        def swap(d):
            for conn in case.connections:
                d = step_mod.swap_connection_states(phys, case.blocks, d,
                                                    conn, g)
            return d

        solver = cfg["matrix_solver"]
        sweeps = cfg["matrix_sweeps"]
        def inv_skews(b):
            ctx = self.ictx[b.index]
            fn = (imp.skew_from_physical_blk if cfg["block_matrix"]
                  else imp.skew_from_physical)
            if_skew = fn(ctx, inv_diag[b.index][0])
            it_skew = (fn(ctx, inv_diag[b.index][1])
                       if inv_diag[b.index][1] is not None else None)
            return if_skew, it_skew

        if solver in ("lusgs", "blusgs"):
            for sweep in range(sweeps):
                dus = swap(dus)
                with_extra = sweep > 0 or cfg["matrix_init"]
                for b in case.blocks:
                    ctx = self.ictx[b.index]
                    b_skew = imp.skew_from_physical(ctx, bs[b.index])
                    if_skew, it_skew = inv_skews(b)
                    dus[b.index] = imp.lusgs_forward(
                        phys, cfg, b, ctx, prims[b.index], dus[b.index],
                        b_skew, if_skew, it_skew, with_extra,
                        aux=auxs[b.index])
                dus = swap(dus)
                for b in case.blocks:
                    ctx = self.ictx[b.index]
                    b_skew = imp.skew_from_physical(ctx, bs[b.index])
                    if_skew, it_skew = inv_skews(b)
                    dus[b.index] = imp.lusgs_backward(
                        phys, cfg, b, ctx, prims[b.index], dus[b.index],
                        b_skew, if_skew, it_skew, with_extra,
                        aux=auxs[b.index])
        elif solver in ("dplur", "bdplur"):
            for sweep in range(sweeps):
                dus = swap(dus)
                for b in case.blocks:
                    ctx = self.ictx[b.index]
                    dus[b.index] = imp.dplur_sweep(
                        phys, cfg, b, ctx, prims[b.index], dus[b.index],
                        bs[b.index], *inv_diag[b.index],
                        aux=auxs[b.index])
        else:
            raise ValueError(f"unknown matrix solver {solver!r}")

        dus = swap(dus)
        mr_sum = jnp.zeros((), self.case.dtype)
        mr_count = 0
        new_prims = {}
        for b in case.blocks:
            ctx = self.ictx[b.index]
            mr = imp.matrix_residual(phys, cfg, b, ctx, prims[b.index],
                                     dus[b.index], bs[b.index],
                                     a_diag[b.index][0], a_diag[b.index][1],
                                     aux=auxs[b.index])
            mr_sum = mr_sum + (mr * mr).sum()
            # reference divides by the padded array size (ghost entries are
            # zero): mgSolution.cpp:199-207 accumulates over the full
            # multiarray3d
            mr_count += (phys.neq * (b.ni + 2 * g) * (b.nj + 2 * g)
                         * (b.nk + 2 * g))
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            new_prims[b.index] = step_mod.implicit_update(
                phys, b, prims[b.index], dus[b.index][P])
        return new_prims, mr_sum / mr_count

    # -- restart / output -----------------------------------------------------
    def _interior(self, prim, b):
        g = b.g
        return prim[:, g:g + b.ni, g:g + b.nj, g:g + b.nk]

    def _load_restart(self, path):
        """Resume from a reference-compatible .rst file
        (reference: output.cpp:756-900 ReadRestart)."""
        from ..io.restart import read_restart, prim_from_restart
        rec = read_restart(path)
        self.iteration_start = rec["iteration"]
        self.l2_first = np.asarray(rec["l2_first"]).copy()
        for b in self.case.blocks:
            prim = prim_from_restart(rec["blocks"][b.index], self.phys,
                                     self.deck, mu_ref=self.phys.mu_mix_ref)
            g = b.g
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            self.prims[b.index] = self.prims[b.index].at[P].set(
                jnp.asarray(prim, self.case.dtype))
        if rec["blocks_nm1"] is not None and self.deck.is_multilevel_in_time:
            from ..io.restart import prim_from_restart as _pfr
            self._restart_nm1 = rec["blocks_nm1"]
        else:
            self._restart_nm1 = None

    def write_restart(self, iteration):
        from ..io.restart import write_restart
        prims = [np.asarray(self._interior(self.prims[b.index], b))
                 for b in self.case.blocks]
        cons_nm1 = None
        if self.deck.is_multilevel_in_time:
            cons_nm1 = [np.asarray(self.cons_nm1[b.index])
                        for b in self.case.blocks]
        l2_first = (self.l2_first if self.l2_first is not None
                    else np.zeros(self.phys.neq))
        path = f"{self.sim_root}_{iteration}.rst"
        write_restart(path, self.deck, self.phys, iteration, l2_first, prims,
                      cons_nm1, mu_ref=self.phys.mu_mix_ref)

    def write_output(self, iteration):
        from ..io import output as out_mod
        deck = self.deck
        prims = [np.asarray(self._interior(self.prims[b.index], b))
                 for b in self.case.blocks]
        auxs = []
        for b in self.case.blocks:
            g = b.g
            P = tuple(slice(g, g + n) for n in (b.ni, b.nj, b.nk))
            auxs.append({"wall_dist": np.asarray(b.geom["wall_dist"][P])})
        names = deck.output_variables
        out_mod.write_fun_file(f"{self.sim_root}_{iteration}.fun", names,
                               prims, self.phys, deck, auxs)
        out_mod.write_meta(f"{self.sim_root}_center.p3d", self.sim_root,
                           deck["gridName"], iteration, names)

    def write_grid_center(self):
        from ..io import output as out_mod
        centers = []
        for b in self.case.blocks:
            g = b.g
            P = tuple(slice(g, g + n) for n in (b.ni, b.nj, b.nk))
            c = np.asarray(b.geom["center"])[(slice(None),) + P]
            centers.append(np.moveaxis(c, 0, -1))
        grid_root = os.path.join(self.workdir, self.deck["gridName"])
        out_mod.write_cell_center(f"{grid_root}_center.xyz", centers,
                                  self.deck.l_ref)

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
        if nn == 0 and mm == 0 and not self.is_restart:
            self.l2_first = l2.copy()
        elif nn < 5 and mm == 0 and not self.is_restart:
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
    def run(self, iterations=None, write_files=False):
        deck = self.deck
        iterations = iterations or deck["iterations"]
        self._open_logs(restart=self.is_restart)
        sim_start = time.perf_counter()
        nl_iters = deck["nonlinearIterations"]
        if write_files:
            self.write_grid_center()
            self.write_output(self.iteration_start)

        multilevel = self.cfg["multilevel_time"]
        total_dof = self.case.total_cells * self.phys.neq
        for nn in range(iterations):
            iter_start = time.perf_counter()
            cfl = deck.cfl(nn)
            # store time-n (and initialize n-1) solution
            # (reference: mgSolution.cpp:103-114)
            self.cons_n = self.store_old_solution()
            if multilevel and nn == 0 and self.iteration_start == 0:
                self.cons_nm1 = dict(self.cons_n)
            rk4 = self.cfg["time_integration"] == "rk4"
            for mm in range(nl_iters):
                prims, l2, linfs, matrix_resid = self._iterate(
                    self.prims, self.cons_n, self.cons_nm1,
                    jnp.asarray(cfl, self.case.dtype),
                    stage=mm if rk4 else 0)
                self.prims = prims
                l2 = np.sqrt(np.asarray(l2))
                linf_val, linf_loc = self._decode_linf(linfs)
                mr = float(matrix_resid)
                mr = np.sqrt(mr / total_dof) if mr > 0 else 0.0
                self._write_residuals(nn + self.iteration_start, mm, cfl, l2,
                                      linf_val, linf_loc, mr)
                if multilevel and mm == nl_iters - 1:
                    self.cons_nm1 = dict(self.cons_n)
            it_global = nn + self.iteration_start
            if write_files and deck["outputFrequency"] > 0 \
                    and (nn + 1) % deck["outputFrequency"] == 0:
                self.write_output(it_global + 1)
            if write_files and deck["restartFrequency"] > 0 \
                    and (nn + 1) % deck["restartFrequency"] == 0:
                self.write_restart(it_global + 1)
            now = time.perf_counter()
            self.time_file.write(
                f"{nn:<7d}{now - iter_start:<16.6e}{now - sim_start:<16.6e}\n")
        self.resid_file.close()
        self.time_file.close()
        return self


def run_case(deck_path: str, **kw):
    solver = Solver(deck_path, **kw)
    return solver.run()
