"""Time-marching driver: the reference main loop re-hosted around one jitted
multi-block iteration (reference: src/main.cpp:231-302, logFileManager.cpp,
output.cpp:1007-1089 residual normalization)."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from . import step as step_mod
from . import state as st_mod
from . import state as st
from . import implicit as imp
from . import case as case_mod
from .case import Case, build_case
from .sput import set_region

EPS = 1.0e-30


class Solver:
    def __init__(self, deck_path: str, dtype=None, workdir=None,
                 restart_path=None, nproc: int = 1, debug=None):
        # debug mode: per-iteration physicality checks, the analogue of the
        # reference's armed FP exceptions + MSG_ASSERT guards
        # (reference: main.cpp:78-82, macros.hpp.in:32-37,
        # procBlock.cpp:434-437)
        if debug is None:
            debug = os.environ.get("AITHER_DEBUG", "0") not in ("0", "")
        self.debug = bool(debug)
        self._deck_path = deck_path
        self._dtype_arg = dtype
        # every executable goes through the (possibly tunneled) device
        # compiler; persist compiles across processes
        from ..utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.case = build_case(deck_path, dtype=dtype, nproc=nproc)
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
            inv_flux_jac=deck["inviscidFluxJacobian"],
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
        # direction-sequencing barrier for large grids (see
        # step.seq_barrier): bounds the iteration's temp memory at one
        # direction pass's working set, which keeps XLA's scheduler in
        # its high-overlap regime near HBM capacity
        seq_env = os.environ.get("AITHER_SEQ_DIRECTIONS")
        self.cfg["seq_directions"] = (
            seq_env not in ("0", "") if seq_env is not None
            else self.case.total_cells >= 2_000_000)
        # the LODI (nonreflecting) BCs are the only per-iteration consumer
        # of the cell pressure gradient (bc_aux carry); without them the
        # hot path skips its accumulation entirely (see step.full_residual)
        self.cfg["need_pgrad"] = any(
            spec.data is not None
            and getattr(spec.data, "nonreflecting", False)
            for b in self.case.blocks for spec in b.surfaces)
        self.prims = {b.index: jnp.asarray(b.prim0) for b in self.case.blocks}
        self.is_restart = restart_path is not None
        self.l2_first = None
        self.iteration_start = 0
        if self.is_restart:
            self._load_restart(restart_path)
        self.mg_nlevels = deck["multigridLevels"] if deck.is_implicit else 1
        self.mg_cycle_index = 2 if deck["multigridCycle"] == "W" else 1
        self.mg_cases = [self.case]
        self.mg_maps = []
        if deck.is_implicit:
            if self.mg_nlevels > 1:
                from . import multigrid as mg
                self.mg_cases, self.mg_maps = mg.build_levels(
                    self.case, self.mg_nlevels)
            self.mg_ictx = [
                {b.index: imp.build_implicit_context(b) for b in c.blocks}
                for c in self.mg_cases]
            self.ictx = self.mg_ictx[0]
        # prepack the fused viscous-march statics (pallas_residual) from
        # concrete geometry BEFORE geo args snapshot the geom dicts
        from . import pallas_residual as pres
        for b in self.case.blocks:
            if pres.use_march(self.phys, self.cfg, b, self.case.dtype,
                              for_prepack=True):
                pres.ensure_static(self.phys, self.cfg, b, self.case.dtype)
        self._geo_args = self._build_geo_args()
        self._iterate_geo = jax.jit(self._iteration_with_geo,
                                    static_argnames=("stage",))

        def _iterate(prims, cons_n, cons_nm1, cfl, stage, bc_aux=None):
            with self._trace_ctx():
                return self._iterate_geo(self._geo_args, prims, cons_n,
                                         cons_nm1, cfl, stage=stage,
                                         bc_aux=bc_aux)
        self._iterate = _iterate
        self.bc_aux = self._zero_bc_aux()
        self.cons_n = self.store_old_solution()
        self.cons_nm1 = (dict(self.cons_n) if deck.is_multilevel_in_time
                         else {b.index: 0.0 for b in self.case.blocks})
        if self.is_restart and getattr(self, "_restart_nm1", None) is not None:
            from ..io.restart import cons_from_restart
            for b in self.case.blocks:
                self.cons_nm1[b.index] = jnp.asarray(cons_from_restart(
                    self._restart_nm1[b.index], self.phys, self.deck,
                    mu_ref=self.phys.mu_mix_ref), self.case.dtype)

    # -- geometry as jit arguments -------------------------------------------
    # Block geometry and the implicit contexts' static skewed face arrays
    # are per-case tensors of up to hundreds of MB on large grids; closed
    # over, XLA inlines them as constants into EVERY executable (and this
    # environment ships them with each remote compile).  They are instead
    # passed as jit arguments: the traced entry points temporarily bind
    # the argument pytrees onto the blocks/contexts for the trace.

    def _build_geo_args(self):
        geoms = [{b.index: b.geom for b in c.blocks}
                 for c in self.mg_cases]
        statics = None
        if self.deck.is_implicit and \
                self.cfg["matrix_solver"] in ("lusgs", "blusgs"):
            statics = []
            for lvl, c in enumerate(self.mg_cases):
                d = {}
                for b in c.blocks:
                    ctx = self.mg_ictx[lvl][b.index]
                    for side in ("lower", "upper"):
                        imp._static_neighbor_geom(
                            ctx, b, side, self.cfg["viscous"],
                            self.case.dtype)
                    # device-resident leaves: numpy here would re-upload
                    # the whole pytree on every call
                    ctx._static_nbr = jax.tree_util.tree_map(
                        jnp.asarray, ctx._static_nbr)
                for grp in self._sweep_groups(lvl):
                    ctxs = [self.mg_ictx[lvl][b.index] for b in grp]
                    imp.prepack_group_static(self.phys, self.cfg, grp, ctxs,
                                             self.case.dtype)
                for b in c.blocks:
                    ctx = self.mg_ictx[lvl][b.index]
                    d[b.index] = (ctx._static_nbr, ctx._static_packed)
                statics.append(d)
        return (geoms, statics)

    @contextmanager
    def _bound_geometry(self, geo_args):
        geoms, statics = geo_args
        saved_g, saved_s = [], []
        for lvl, case in enumerate(self.mg_cases):
            for b in case.blocks:
                saved_g.append((b, b.geom))
                b.geom = geoms[lvl][b.index]
        if statics is not None:
            for lvl in range(len(self.mg_cases)):
                for bi, ctx in self.mg_ictx[lvl].items():
                    saved_s.append((ctx, ctx._static_nbr,
                                    ctx._static_packed))
                    ctx._static_nbr, ctx._static_packed = statics[lvl][bi]
        try:
            yield
        finally:
            for b, gm in saved_g:
                b.geom = gm
            for ctx, nbr_, pk_ in saved_s:
                ctx._static_nbr = nbr_
                ctx._static_packed = pk_

    def _iteration_with_geo(self, geo_args, prims, cons_n, cons_nm1, cfl,
                            stage: int, bc_aux=None):
        with self._bound_geometry(geo_args):
            return self._iteration(prims, cons_n, cons_nm1, cfl, stage,
                                   bc_aux=bc_aux)

    # -- multi-device production runs ----------------------------------------
    def enable_sharding(self, n_devices=None, mesh=None):
        """Shard every block's state over a device mesh for all
        subsequent iterations — the production multi-chip path (XLA's
        GSPMD partitioner inserts the halo collectives the reference
        implements by hand over MPI, procBlock.cpp:3050-3123).  Call
        before run(); retraces under the SPMD-safe update formulation
        (solver/sput.py).

        A bare pallas_call is not partitionable across devices, but the
        LU-SGS sweep kernel survives sharding when every same-shape
        sweep group splits into WHOLE blocks per device: the group sweep
        stacks blocks along K2 with block k-boundaries masked, so
        sharding stacked-K2 with shard boundaries ON block boundaries is
        mathematically exact, and each device runs the Pallas sweep on
        its local blocks inside a shard_map island
        (pallas_sweep.sweep).  When the group shapes don't permit that
        (or the case isn't lusgs/blusgs) all kernels fall back to the
        partitionable scan formulation."""
        from ..parallel.shard import make_mesh, block_spec
        from jax.sharding import NamedSharding, PartitionSpec
        self.shard_mesh = mesh or make_mesh(
            n_devices or len(jax.devices()))
        nd = int(self.shard_mesh.size)
        sweep_shardable = (
            self.deck.is_implicit
            and self.cfg["matrix_solver"] in ("lusgs", "blusgs")
            and all(len(grp) % nd == 0
                    for lvl in range(len(self.mg_cases))
                    for grp in self._sweep_groups(lvl)))
        if sweep_shardable:
            self.cfg["sweep_shard_mesh"] = self.shard_mesh
            self.cfg["no_pallas_march"] = True
            # prepacked sweep statics embed the q-plane padding, which
            # now derives from the per-device K2 — rebuild them
            for lvl in range(len(self.mg_cases)):
                for ctx in self.mg_ictx[lvl].values():
                    if hasattr(ctx, "_static_packed"):
                        ctx._static_packed = {}
                        ctx._static_offs = {}
            self._geo_args = self._build_geo_args()
        else:
            self.cfg["no_pallas"] = True
        repl = NamedSharding(self.shard_mesh, PartitionSpec())
        put_repl = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), repl), t)
        for b in self.case.blocks:
            spec = block_spec(b, self.shard_mesh)
            self.prims[b.index] = jax.device_put(
                self.prims[b.index], NamedSharding(self.shard_mesh, spec))
        self.cons_n = put_repl(self.cons_n)
        self.cons_nm1 = put_repl(self.cons_nm1)
        self.bc_aux = put_repl(self.bc_aux)
        self._geo_args = put_repl(self._geo_args)
        # drop executables traced for the single-device formulation
        if hasattr(self, "_chunk_jit"):
            del self._chunk_jit
        self._iterate_geo = jax.jit(self._iteration_with_geo,
                                    static_argnames=("stage",))
        return self

    def _trace_ctx(self):
        from .sput import safe_updates
        from contextlib import nullcontext
        return (safe_updates() if getattr(self, "shard_mesh", None)
                else nullcontext())

    def _zero_bc_aux(self):
        out = {}
        for b in self.case.blocks:
            shp = (b.ni, b.nj, b.nk)
            out[b.index] = dict(
                dt=jnp.zeros(shp, self.case.dtype),
                pgrad=jnp.zeros((3,) + shp, self.case.dtype),
                vgrad=jnp.zeros((3, 3) + shp, self.case.dtype))
        return out

    # -- one nonlinear iteration (jitted) -----------------------------------
    def _iteration(self, prims, cons_n, cons_nm1, cfl, stage: int,
                   bc_aux=None):
        phys = self.phys
        case = self.case
        if bc_aux is None:
            bc_aux = self._zero_bc_aux()
        prims = step_mod.apply_all_bcs(phys, case, prims, bc_aux=bc_aux,
                                       cons_n=cons_n)
        residuals, specrads, diags, dts = {}, {}, {}, {}
        auxs = {}
        for b in case.blocks:
            (resid, sr_f, sr_t, dg_f, dg_t, _, prim_v,
             aux) = step_mod.full_residual(phys, self.cfg, b, prims[b.index],
                                           need_aux=False)
            prims[b.index] = prim_v  # includes viscous-wall ghosts
            auxs[b.index] = aux
            residuals[b.index] = resid
            sr_max = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f
            specrads[b.index] = sr_max
            diags[b.index] = (dg_f, dg_t)
            dts[b.index] = step_mod.local_dt(self.cfg, b.geom, sr_max, b.g,
                                             (b.ni, b.nj, b.nk), cfl)

        # connection swaps of eddy viscosity / f1 / velocity gradients so
        # the implicit off-diagonals see donor values at connection ghosts
        # (reference: gridLevel.cpp:343-395 SwapEddyViscAndGradients +
        # SwapTurbVars, procBlock.cpp:3057-3084)
        if (self.cfg["implicit"] and self.cfg["viscous"]
                and case.connections and auxs[case.blocks[0].index]):
            g = case.blocks[0].g
            keys = ["mut"] + (["f1"] if phys.nturb else [])
            for key in keys:
                field = {bi: auxs[bi][key][None] for bi in auxs}
                for conn in case.connections:
                    field = step_mod.swap_connection_states(
                        phys, case.blocks, field, conn, g)
                for bi in auxs:
                    auxs[bi][key] = field[bi][0]
            if self.cfg["block_matrix"]:
                field = {bi: auxs[bi]["vgrad"].reshape(
                    (9,) + auxs[bi]["vgrad"].shape[2:]) for bi in auxs}
                for conn in case.connections:
                    field = step_mod.swap_connection_states(
                        phys, case.blocks, field, conn, g)
                for bi in auxs:
                    auxs[bi]["vgrad"] = field[bi].reshape(
                        (3, 3) + field[bi].shape[1:])

        matrix_resid = jnp.zeros((), self.case.dtype)
        new_prims = {}
        if self.cfg["implicit"]:
            new_prims, matrix_resid = self._implicit_update(
                prims, residuals, specrads, diags, dts, cons_n, cons_nm1,
                auxs, cfl)
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
        # carry dt / gradients for next iteration's nonreflecting BCs
        new_bc_aux = {}
        for b in case.blocks:
            aux = auxs[b.index] or {}
            zero = self._zero_bc_aux()[b.index]
            new_bc_aux[b.index] = dict(
                dt=dts[b.index],
                pgrad=aux.get("press_grad", zero["pgrad"]),
                vgrad=aux.get("vel_grad", zero["vgrad"]))
        return new_prims, l2, linfs, matrix_resid, new_bc_aux

    # -- implicit path (reference: mgSolution::ImplicitUpdate) ---------------
    def _setup_linear(self, lvl, prims, residuals, specrads, diags, dts,
                      auxs, cons_n, cons_nm1, matrix_init):
        """Diagonal (+inverse), rhs b, and initial update per block
        (reference: linearSolver::AddDiagonalTerms / Invert /
        InitializeMatrixUpdate).  The main diagonal is only zeroed after the
        whole multigrid cycle (mgSolution.cpp:236-239 ResetDiagonal), so a
        coarse level revisited within a W cycle ACCUMULATES its diagonal on
        top of the previous visit's relaxed value — replicated via the
        per-level carry."""
        phys, cfg = self.phys, self.cfg
        case = self.mg_cases[lvl]
        g = case.blocks[0].g
        carry = self._mg_diag_carry.get(lvl)
        inv_diag, a_diag, bs, dus = {}, {}, {}, {}
        for b in case.blocks:
            dt = dts[b.index]
            if cfg["block_matrix"]:
                aux = auxs[b.index]
                dfb, dtb = aux["diag_flow_blk"], aux["diag_turb_blk"]
                if carry is not None:
                    dfb = dfb + carry[b.index][0]
                    if dtb is not None and carry[b.index][1] is not None:
                        dtb = dtb + carry[b.index][1]
                (af, at), (inv_flow, inv_turb) = imp.build_block_diagonal(
                    phys, b, cfg, dfb, dtb, specrads[b.index], dt)
                inv_diag[b.index] = (inv_flow, inv_turb)
                a_diag[b.index] = (af, at)
            else:
                df, dtu = diags[b.index]
                if carry is not None:
                    df = df + carry[b.index][0]
                    if dtu is not None and carry[b.index][1] is not None:
                        dtu = dtu + carry[b.index][1]
                inv_flow, inv_turb = imp.build_diagonal(
                    phys, b, cfg, df, dtu,
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
            if matrix_init:
                x0 = imp.diag_mult(phys, inv_flow, inv_turb, bs[b.index])
                P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                     slice(g, g + b.nk))
                du = set_region(du, P, x0)
            dus[b.index] = du
        self._mg_diag_carry[lvl] = a_diag
        return inv_diag, a_diag, bs, dus

    def _swap_level(self, lvl, d):
        case = self.mg_cases[lvl]
        g = case.blocks[0].g
        for conn in case.connections:
            d = step_mod.swap_connection_states(self.phys, case.blocks, d,
                                                conn, g)
        return d

    def _relax(self, lvl, st, sweeps):
        """LU-SGS / DPLUR relaxation sweeps at one grid level
        (reference: lusgs::Relax / dplur::Relax)."""
        phys, cfg = self.phys, self.cfg
        case = self.mg_cases[lvl]
        solver = cfg["matrix_solver"]
        prims, auxs = st["prims"], st["auxs"]
        inv_diag, dus = st["inv_diag"], st["dus"]
        forcing = st.get("forcing")
        bs_eff = {bi: st["bs"][bi] + (forcing[bi] if forcing else 0.0)
                  for bi in st["bs"]}

        def inv_skews(b):
            ctx = self.mg_ictx[lvl][b.index]
            fn = (imp.skew_from_physical_blk if cfg["block_matrix"]
                  else imp.skew_from_physical)
            if_skew = fn(ctx, inv_diag[b.index][0])
            it_skew = (fn(ctx, inv_diag[b.index][1])
                       if inv_diag[b.index][1] is not None else None)
            return if_skew, it_skew

        if solver in ("lusgs", "blusgs"):
            # batch same-shape blocks through ONE wavefront sweep (k-axis
            # stacking, implicit.lusgs_*_group): B x fewer sequential
            # hyperplane steps and one traced sweep body per shape
            groups = self._sweep_groups(lvl)

            def sweep_items(grp):
                out = []
                for b in grp:
                    ctx = self.mg_ictx[lvl][b.index]
                    if_skew, it_skew = inv_skews(b)
                    out.append(dict(
                        block=b, ctx=ctx, prim=prims[b.index],
                        du=dus[b.index],
                        b=imp.skew_from_physical(ctx, bs_eff[b.index]),
                        inv_f=if_skew, inv_t=it_skew, aux=auxs[b.index]))
                return out

            # everything except du and the lagged opposite-side term is
            # invariant across the sweeps — shear/pack it ONCE
            g_items = [sweep_items(grp) for grp in groups]
            preps = [imp.prepare_group_sweep(phys, cfg, its)
                     for its in g_items]

            for sweep in range(sweeps):
                dus = self._swap_level(lvl, dus)
                with_extra = sweep > 0 or cfg["matrix_init"] or lvl > 0
                for grp, its, prep in zip(groups, g_items, preps):
                    for it, b in zip(its, grp):
                        it["du"] = dus[b.index]
                    res = imp.lusgs_forward_group(phys, cfg, its,
                                                  with_extra, prep)
                    for b, du in zip(grp, res):
                        dus[b.index] = du
                dus = self._swap_level(lvl, dus)
                for grp, its, prep in zip(groups, g_items, preps):
                    for it, b in zip(its, grp):
                        it["du"] = dus[b.index]
                    res = imp.lusgs_backward_group(phys, cfg, its,
                                                   with_extra, prep)
                    for b, du in zip(grp, res):
                        dus[b.index] = du
        elif solver in ("dplur", "bdplur"):
            for sweep in range(sweeps):
                dus = self._swap_level(lvl, dus)
                for b in case.blocks:
                    ctx = self.mg_ictx[lvl][b.index]
                    dus[b.index] = imp.dplur_sweep(
                        phys, cfg, b, ctx, prims[b.index], dus[b.index],
                        bs_eff[b.index], *inv_diag[b.index],
                        aux=auxs[b.index])
        else:
            raise ValueError(f"unknown matrix solver {solver!r}")
        st["dus"] = self._swap_level(lvl, dus)
        return st

    def _sweep_groups(self, lvl):
        """Same-shape block groups for batched LU-SGS sweeps (stable
        order; blocks with a unique shape form singleton groups)."""
        cache = getattr(self, "_sweep_group_cache", None)
        if cache is None:
            cache = self._sweep_group_cache = {}
        if lvl not in cache:
            by_shape = {}
            for b in self.mg_cases[lvl].blocks:
                by_shape.setdefault((b.ni, b.nj, b.nk, b.g), []).append(b)
            cache[lvl] = list(by_shape.values())
        return cache[lvl]

    def _matrix_resid_field(self, lvl, st):
        """f - (A x - b) per block (reference: linearSolver::Residual)."""
        phys, cfg = self.phys, self.cfg
        case = self.mg_cases[lvl]
        forcing = st.get("forcing")
        out = {}
        for b in case.blocks:
            ctx = self.mg_ictx[lvl][b.index]
            out[b.index] = imp.matrix_residual(
                phys, cfg, b, ctx, st["prims"][b.index], st["dus"][b.index],
                st["bs"][b.index], st["a_diag"][b.index][0],
                st["a_diag"][b.index][1], aux=st["auxs"][b.index],
                forcing=forcing[b.index] if forcing else None)
        return out

    def _level_state(self, lvl, prims_int, cfl):
        """BCs + residual + time step on a coarse level from restricted
        interior states (reference: gridLevel::Restriction midsection)."""
        phys, cfg = self.phys, self.cfg
        case = self.mg_cases[lvl]
        g = case.blocks[0].g
        prims = {}
        for b in case.blocks:
            pad = jnp.asarray(b.prim0, self.case.dtype)
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            prims[b.index] = set_region(pad, P, prims_int[b.index])
        prims = step_mod.apply_all_bcs(phys, case, prims)
        residuals, specrads, dts, auxs, diags = {}, {}, {}, {}, {}
        cons_n = {}
        for b in case.blocks:
            (resid, sr_f, sr_t, dg_f, dg_t, _, prim_v,
             aux) = step_mod.full_residual(phys, cfg, b, prims[b.index],
                                           need_aux=False)
            prims[b.index] = prim_v
            auxs[b.index] = aux
            residuals[b.index] = resid
            sr_max = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f
            specrads[b.index] = sr_max
            diags[b.index] = (dg_f, dg_t)
            dts[b.index] = step_mod.local_dt(cfg, b.geom, sr_max, b.g,
                                             (b.ni, b.nj, b.nk), cfl)
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            cons_n[b.index] = st_mod.cons_from_prim(phys, prims[b.index][P])
        return prims, residuals, specrads, diags, dts, auxs, cons_n

    def _restrict_level(self, lvl, st, resid_field, cfl):
        """Build the coarse-level solve state (reference:
        gridLevel::Restriction)."""
        from . import multigrid as mg
        phys, cfg = self.phys, self.cfg
        fine = self.mg_cases[lvl]
        coarse = self.mg_cases[lvl + 1]
        maps = self.mg_maps[lvl]
        gf = fine.blocks[0].g
        gc = coarse.blocks[0].g

        prims_c_int, dus_c, force_r = {}, {}, {}
        for b in fine.blocks:
            lm = maps[b.index]
            cb = coarse.blocks[b.index]
            cshape = (cb.ni, cb.nj, cb.nk)
            Pf = (slice(None), slice(gf, gf + b.ni), slice(gf, gf + b.nj),
                  slice(gf, gf + b.nk))
            prims_c_int[b.index] = mg.restrict_weighted(
                st["prims"][b.index][Pf], lm, cshape)
            du_c = jnp.zeros((phys.neq,) + cb.shape, self.case.dtype)
            Pc = (slice(None), slice(gc, gc + cb.ni), slice(gc, gc + cb.nj),
                  slice(gc, gc + cb.nk))
            du_c = set_region(du_c, Pc, mg.restrict_weighted(
                st["dus"][b.index][Pf], lm, cshape))
            dus_c[b.index] = du_c
            force_r[b.index] = mg.restrict_sum(resid_field[b.index], lm,
                                               cshape)
        dus_c = self._swap_level(lvl + 1, dus_c)

        (prims_c, residuals_c, specrads_c, diags_c, dts_c, auxs_c,
         cons_n_c) = self._level_state(lvl + 1, prims_c_int, cfl)
        inv_diag_c, a_diag_c, bs_c, _ = self._setup_linear(
            lvl + 1, prims_c, residuals_c, specrads_c, diags_c, dts_c,
            auxs_c, cons_n_c, cons_n_c, matrix_init=False)

        cs = dict(prims=prims_c, auxs=auxs_c, inv_diag=inv_diag_c,
                  a_diag=a_diag_c, bs=bs_c, dus=dus_c, forcing=None)
        # forcing = (A_c x_c - b_c) + restrict(fine matrix residual)
        neg_axmb = self._matrix_resid_field(lvl + 1, cs)
        self._mg_trace("axmb", lvl + 1, {bi: -neg_axmb[bi] for bi in neg_axmb})
        self._mg_trace("force_r", lvl + 1, force_r)
        cs["forcing"] = {bi: -neg_axmb[bi] + force_r[bi] for bi in neg_axmb}
        return cs

    def _mg_trace(self, stage, lvl, d):
        tr = getattr(self, "_mg_trace_log", None)
        if tr is not None:
            tr.append((stage, lvl, {k: v for k, v in d.items()}))

    def _mg_cycle(self, lvl, st, cfl):
        """FAS V/W cycle (reference: mgSolution::CycleAtLevel)."""
        from . import multigrid as mg
        sweeps = self.cfg["matrix_sweeps"]
        if lvl == self.mg_nlevels - 1:
            return self._relax(lvl, st, sweeps)
        pre = max(sweeps // 2, 1)
        st = self._relax(lvl, st, pre)
        self._mg_trace("prerelax", lvl, st["dus"])
        resid_field = self._matrix_resid_field(lvl, st)
        cs = self._restrict_level(lvl, st, resid_field, cfl)
        self._mg_trace("postrestrict", lvl + 1, cs["dus"])
        self._mg_trace("forcing", lvl + 1, cs["forcing"])
        du_c0 = dict(cs["dus"])
        for _ in range(self.mg_cycle_index):
            cs = self._mg_cycle(lvl + 1, cs, cfl)
        # prolong the coarse correction to the fine update
        fine = self.mg_cases[lvl]
        coarse = self.mg_cases[lvl + 1]
        maps = self.mg_maps[lvl]
        gf = fine.blocks[0].g
        gc = coarse.blocks[0].g
        for b in fine.blocks:
            cb = coarse.blocks[b.index]
            Pc = (slice(None), slice(gc, gc + cb.ni), slice(gc, gc + cb.nj),
                  slice(gc, gc + cb.nk))
            corr = (cs["dus"][b.index] - du_c0[b.index])[Pc]
            fine_corr = mg.prolong(corr, maps[b.index])
            Pf = (slice(None), slice(gf, gf + b.ni), slice(gf, gf + b.nj),
                  slice(gf, gf + b.nk))
            st["dus"][b.index] = set_region(st["dus"][b.index], Pf,
                                            fine_corr, add=True)
        self._mg_trace("corr", lvl + 1,
                       {bi: cs["dus"][bi] - du_c0[bi] for bi in du_c0})
        self._mg_trace("postprolong", lvl, st["dus"])
        st["dus"] = self._swap_level(lvl, st["dus"])
        return self._relax(lvl, st, pre)

    def _implicit_update(self, prims, residuals, specrads, diags, dts,
                         cons_n, cons_nm1, auxs, cfl):
        phys = self.phys
        case = self.case
        cfg = self.cfg
        g = case.blocks[0].g
        self._mg_diag_carry = {}
        inv_diag, a_diag, bs, dus = self._setup_linear(
            0, prims, residuals, specrads, diags, dts, auxs, cons_n,
            cons_nm1, matrix_init=cfg["matrix_init"])
        st = dict(prims=prims, auxs=auxs, inv_diag=inv_diag, a_diag=a_diag,
                  bs=bs, dus=dus, forcing=None)

        if self.mg_nlevels == 1:
            st = self._relax(0, st, cfg["matrix_sweeps"])
        else:
            st = self._mg_cycle(0, st, cfl)
        dus = st["dus"]

        mr_sum = jnp.zeros((), self.case.dtype)
        mr_count = 0
        new_prims = {}
        mrf = self._matrix_resid_field(0, st)
        for b in case.blocks:
            mr = mrf[b.index]
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
        decomp = getattr(self.case, "decomp", None)
        if decomp is not None and decomp.splits:
            # restart files carry the ORIGINAL block structure; re-apply
            # the decomposition's splits (reference: parallel.hpp:137-154
            # DecompArray on ReadRestart)
            from ..parallel.decompose import split_cell_arrays
            rec["blocks"] = split_cell_arrays(decomp.splits, rec["blocks"])
            if rec["blocks_nm1"] is not None:
                rec["blocks_nm1"] = split_cell_arrays(decomp.splits,
                                                      rec["blocks_nm1"])
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

    def _sync_output_view(self):
        """For decomposed runs, push the current state (recombined into
        the ORIGINAL block structure) onto a parent-layout Solver so all
        file output matches the reference's Recombine semantics
        (reference: output.cpp:595,1089-1166; restart bit-compat across
        proc counts depends on this).  Returns self when not decomposed."""
        decomp = getattr(self.case, "decomp", None)
        if decomp is None or not decomp.splits:
            return self
        from ..parallel.decompose import join_cell_arrays
        if getattr(self, "_parent_view", None) is None:
            self._parent_view = Solver(self._deck_path, dtype=self._dtype_arg,
                                       workdir=self.workdir, nproc=1,
                                       debug=False)
        view = self._parent_view
        splits = decomp.splits
        g = self.case.blocks[0].g

        def interior(arr, b):
            return np.asarray(arr)[..., g:g + b.ni, g:g + b.nj, g:g + b.nk]

        def joined(fn, axes=(1, 2, 3)):
            return join_cell_arrays(
                splits, [np.asarray(fn(b)) for b in self.case.blocks], axes)

        prim_j = joined(lambda b: interior(self.prims[b.index], b))
        prev = getattr(self, "_prev_prims", None) or self.prims
        prev_j = joined(lambda b: interior(prev[b.index], b))
        consn_j = joined(lambda b: self.cons_n[b.index])
        multilevel = self.cfg["multilevel_time"]
        nm1_j = (joined(lambda b: self.cons_nm1[b.index])
                 if multilevel else None)
        dt_j = joined(lambda b: self.bc_aux[b.index]["dt"], axes=(0, 1, 2))
        pg_j = joined(lambda b: self.bc_aux[b.index]["pgrad"])
        vg_j = joined(lambda b: self.bc_aux[b.index]["vgrad"],
                      axes=(2, 3, 4))

        dt_ = view.case.dtype
        prev_pads = {}
        for i, vb in enumerate(view.case.blocks):
            P = (slice(None), slice(g, g + vb.ni), slice(g, g + vb.nj),
                 slice(g, g + vb.nk))
            view.prims[vb.index] = view.prims[vb.index].at[P].set(
                jnp.asarray(prim_j[i], dt_))
            prev_pads[vb.index] = jnp.asarray(view.prims[vb.index]).at[P].set(
                jnp.asarray(prev_j[i], dt_))
            view.cons_n[vb.index] = jnp.asarray(consn_j[i], dt_)
            if multilevel:
                view.cons_nm1[vb.index] = jnp.asarray(nm1_j[i], dt_)
            view.bc_aux[vb.index] = dict(
                dt=jnp.asarray(dt_j[i], dt_),
                pgrad=jnp.asarray(pg_j[i], dt_),
                vgrad=jnp.asarray(vg_j[i], dt_))
        # refresh ghosts: the BC pass is a pure function of interior state
        # (+ bc_aux / cons_n), so this reproduces the last iteration's
        # ghost values in the parent layout
        view.prims = step_mod.apply_all_bcs(view.phys, view.case,
                                            view.prims, bc_aux=view.bc_aux,
                                            cons_n=view.cons_n)
        view._prev_prims = prev_pads
        view.l2_first = self.l2_first
        view.iteration_start = self.iteration_start
        # recombined per-cell decomposition debug fields: owning rank and
        # owning block's global position (reference: output.cpp:278-283
        # SplitBlockNumber -> Rank()/GlobalPos()); constant per split
        # block, joined back into the parent layout like every output
        # field
        rank_j = joined(lambda b: np.full(
            (b.ni, b.nj, b.nk), float(decomp.rank[b.index])), axes=(0, 1, 2))
        gpos_j = joined(lambda b: np.full(
            (b.ni, b.nj, b.nk), float(b.index)), axes=(0, 1, 2))
        view._decomp_fields = {
            vb.index: (rank_j[i], gpos_j[i])
            for i, vb in enumerate(view.case.blocks)}
        return view

    def write_restart(self, iteration):
        view = self._sync_output_view()
        if view is not self:
            return view.write_restart(iteration)
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
        view = self._sync_output_view()
        if view is not self:
            return view.write_output(iteration)
        from ..io import output as out_mod
        deck = self.deck
        phys = self.phys
        prims = [np.asarray(self._interior(self.prims[b.index], b))
                 for b in self.case.blocks]
        # derived fields (gradients / residual / dt / eddy viscosity / wall
        # data) come from one residual evaluation at the current state; the
        # reference stores the equivalents on the block during the last
        # iteration (procBlock.hpp:100-121)
        names = list(deck.output_variables)
        need_fields = any(
            n.endswith(("Grad_x", "Grad_y", "Grad_z")) or
            n.startswith(("velGrad_", "resid_")) or
            n in ("dt", "f1", "f2", "turbulentViscosity", "viscosityRatio")
            for n in names)
        wall_names = deck.wall_output_variables \
            if hasattr(deck, "wall_output_variables") else []
        nodal = bool(deck["outputNodalVariables"])
        auxs = []
        wall_blocks = []
        prim_pads = {}
        aux_pads = {}
        # aux fields evaluate at the PRE-update state (what the reference
        # stored during the last iteration); the state itself is current.
        base = getattr(self, "_prev_prims", None) or self.prims
        full_prims = step_mod.apply_all_bcs(phys, self.case, dict(base),
                                            bc_aux=self.bc_aux,
                                            cons_n=self.cons_n)
        dfields = getattr(self, "_decomp_fields", None)
        decomp = getattr(self.case, "decomp", None)
        for b in self.case.blocks:
            g = b.g
            P = tuple(slice(g, g + n) for n in (b.ni, b.nj, b.nk))
            aux = {"wall_dist": case_mod.host_geom(b, "wall_dist")[P]}
            if dfields is not None:       # recombined decomposed run
                aux["rank"], aux["globalPosition"] = dfields[b.index]
            else:                         # undecomposed: constants per block
                rk = decomp.rank[b.index] if decomp is not None else 0
                aux["rank"] = np.full((b.ni, b.nj, b.nk), float(rk))
                aux["globalPosition"] = np.full((b.ni, b.nj, b.nk),
                                                float(b.index))
            # current padded state: updated interior + the ghost values
            # assigned during the last iteration's BC pass — exactly the
            # reference's state_ at output time (ghosts are not refreshed
            # after UpdateBlocks)
            prim_pads[b.index] = np.asarray(self.prims[b.index])
            aux_pads[b.index] = np.asarray(full_prims[b.index])
            if (need_fields or wall_names or nodal) and (
                    self.cfg["viscous"] or self.cfg["implicit"]):
                (resid, sr_f, sr_t, _, _, _, prim_v,
                 full_aux) = step_mod.full_residual(phys, self.cfg, b,
                                                    full_prims[b.index])
                aux_pads[b.index] = np.asarray(prim_v)
                # the reference outputs the temperature / viscosity FIELDS
                # stored during the iteration (pre-update state), not
                # values recomputed from the written state
                # (procBlock.cpp:306-310 UpdateAuxillaryVariables)
                P4 = (slice(None),) + P
                t_int = np.asarray(phys.temperature(
                    prim_v[phys.ie][P], prim_v[:phys.ns][P4]))
                aux["temperature"] = t_int
                if self.cfg["viscous"]:
                    rho_int = np.asarray(prim_v[:phys.ns][P4]).sum(axis=0)
                    aux["viscosity"] = np.asarray(phys.viscosity(
                        jnp.asarray(t_int),
                        jnp.asarray(np.asarray(prim_v[:phys.ns][P4])
                                    / rho_int)))
                sr = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f
                cfl = self.deck.cfl(max(iteration - 1, 0))
                aux["dt"] = np.asarray(step_mod.local_dt(
                    self.cfg, b.geom, sr, g, (b.ni, b.nj, b.nk), cfl))
                aux["resid"] = np.asarray(resid)
                if full_aux and "cellavg" in full_aux:
                    ca = full_aux["cellavg"]
                    aux["cellavg"] = {k: np.asarray(v) for k, v in ca.items()
                                      if k not in ("wall_out", "mix")}
                    aux["mut"] = aux["cellavg"]["mut"]
                    aux["f1"] = aux["cellavg"]["f1"]
                    aux["f2"] = aux["cellavg"]["f2"]
                    if wall_names:
                        for spec in b.surfaces:
                            if spec.bc_type != "viscousWall":
                                continue
                            wd = ca["wall_out"].get(id(spec))
                            if wd is None:
                                continue
                            fc = self._wall_face_centers(b, spec)
                            wall_blocks.append((b.index, spec, fc, wd))
            auxs.append(aux)
        out_mod.write_fun_file(f"{self.sim_root}_{iteration}_center.fun",
                               names, prims, self.phys, deck, auxs)
        out_mod.write_meta(f"{self.sim_root}_center.p3d", self.sim_root,
                           deck["gridName"], iteration, names)
        if wall_names and wall_blocks:
            out_mod.write_wall_files(self.sim_root, deck["gridName"],
                                     iteration, self.case, wall_blocks,
                                     wall_names)
        if nodal:
            self._write_nodal(iteration, names, prim_pads, aux_pads, auxs)

    def _write_nodal(self, iteration, names, prim_pads, aux_pads, auxs):
        """Nodal .fun output: cell data interpolated to grid nodes
        (reference: output.cpp:452-470 WriteNodeFun,
        procBlock.cpp:6607-6847 CellToNode).  The nodal file indexes the
        ORIGINAL node grid (<gridName>.xyz), so ParaView overlays it on the
        input mesh directly (reference: WriteMeta(inp, iter, false)).

        Semantics replicated from the reference:
          * state: CURRENT state with the ghost values of the last BC pass
            + 3-D corner fill, averaged 1/8 (CellToNode of state_);
          * temperature/viscosity/mut/f1/f2: the fields stored during the
            last iteration, i.e. evaluated at the PRE-update state
            (aux_pads); mut/f1/f2 first-layer boundary ghosts carry the
            reference's single sixth-weighted face contribution
            (procBlock.cpp:1402-1441);
          * gradients: computed FRESH from the current state's faces and
            scattered with 1/12-1/8-1/5-1/3 node weights (CellToNode calls
            CalcGradsI/J/K on the output state);
          * residual/dt: no-ghost ignore-edge weighting."""
        from ..io import output as out_mod
        from . import viscous as vis
        phys, deck = self.phys, self.deck
        nodal_prims, nodal_auxs = [], []
        for b in self.case.blocks:
            g = b.g
            dims = (b.ni, b.nj, b.nk)
            pad = out_mod.assign_corner_ghosts(prim_pads[b.index], g)
            nprim = out_mod.cell_to_node_state(pad, g)
            aux_in = auxs[b.index]
            apad = aux_pads[b.index]
            naux = {}
            t_aux = np.asarray(phys.temperature(
                jnp.asarray(apad[phys.ie]), jnp.asarray(apad[:phys.ns])))
            naux["temperature"] = out_mod.cell_to_node_state(t_aux, g)
            if self.cfg["viscous"]:
                rho_pad = apad[:phys.ns].sum(axis=0)
                mu_pad = np.asarray(phys.viscosity(
                    jnp.asarray(t_aux),
                    jnp.asarray(apad[:phys.ns] / rho_pad)))
                naux["viscosity"] = out_mod.cell_to_node_state(mu_pad, g)
            naux["wall_dist"] = out_mod.cell_to_node_ghost_ignore_edge(
                case_mod.host_geom(b, "wall_dist"), g)
            if "dt" in aux_in:
                naux["dt"] = out_mod.cell_to_node_noghost_ignore_edge(
                    aux_in["dt"])
            if "resid" in aux_in:
                naux["resid"] = out_mod.cell_to_node_noghost_ignore_edge(
                    aux_in["resid"])
            for k in ("rank", "globalPosition"):
                if k in aux_in:
                    naux[k] = out_mod.cell_to_node_noghost_ignore_edge(
                        aux_in[k])
            for k in ("mut", "f1", "f2"):
                if k not in aux_in:
                    continue
                # the reference never accumulates these into ghost cells
                # (procBlock.cpp:1392/1427 guards), so boundary nodes
                # average against zeros — replicated exactly
                padk = np.zeros(pad.shape[1:], aux_in[k].dtype)
                P = tuple(slice(g, g + n) for n in dims)
                padk[P] = aux_in[k]
                naux[k] = out_mod.cell_to_node_state(padk, g)
            if self.cfg["viscous"]:
                # fresh face gradients at the written (current) state;
                # the temperature gradient reads the STORED temperature
                # field (reference: CalcGradsI/J/K use temperature_, which
                # holds the pre-update evaluation)
                fg = {}
                for d in "ijk":
                    fg[d] = {k2: np.asarray(v) for k2, v in
                             vis.face_cv_gradients(
                                 phys, b, jnp.asarray(pad),
                                 jnp.asarray(t_aux), d,
                                 phys.nturb > 0, phys.ns > 1).items()
                             if k2 != "mix"}
                ca = {}
                for key in ("vel", "temp", "rho", "press", "tke", "omega"):
                    if key in fg["i"]:
                        ca[key] = out_mod.face_grads_to_node(
                            {d: fg[d][key] for d in fg}, dims)
                naux["cellavg"] = ca
            nodal_prims.append(nprim)
            nodal_auxs.append(naux)
        out_mod.write_fun_file(f"{self.sim_root}_{iteration}.fun", names,
                               nodal_prims, phys, deck, nodal_auxs)
        out_mod.write_meta(f"{self.sim_root}.p3d", self.sim_root,
                           deck["gridName"], iteration, names,
                           is_center=False)

    def _wall_face_centers(self, b, spec):
        """face centers (n1, n2, 3) of a viscousWall surface patch."""
        g = b.g
        d = spec.direction
        fc = case_mod.host_geom(b, f"fc_{d}")
        pos = g if spec.lower else g + {"i": b.ni, "j": b.nj,
                                        "k": b.nk}[d]
        sl = [slice(None)] * 4
        sl[1 + spec.axis] = pos
        taxes = [a for a in range(3) if a != spec.axis]
        for a, (lo, hi) in zip(taxes, spec.patch):
            sl[1 + a] = slice(lo, hi)
        out = fc[tuple(sl)]
        return np.moveaxis(out, 0, -1)

    def write_grid_center(self):
        view = self._sync_output_view()
        if view is not self:
            return view.write_grid_center()
        from ..io import output as out_mod
        centers = []
        for b in self.case.blocks:
            g = b.g
            P = tuple(slice(g, g + n) for n in (b.ni, b.nj, b.nk))
            c = case_mod.host_geom(b, "center")[(slice(None),) + P]
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

    def check_physicality(self, nn, mm, l2=None):
        """Debug-mode guard: densities/pressures must stay positive and
        residual norms finite, else abort with the offending location
        (reference: MSG_ASSERT physicality asserts in hot loops,
        procBlock.cpp:434-437/896-897, and armed FP exceptions,
        main.cpp:78-82)."""
        phys = self.phys
        if l2 is not None and not np.all(np.isfinite(l2)):
            raise FloatingPointError(
                f"non-finite residual L2 {l2} at iteration {nn} "
                f"nonlinear-iter {mm}")
        for b in self.case.blocks:
            g = b.g
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            q = np.asarray(self.prims[b.index][P])
            fields = [("density", q[:phys.ns].sum(axis=0)),
                      ("pressure", q[phys.ie])]
            if phys.nturb:
                fields.append(("tke", q[phys.it]))
            for name, f in fields:
                bad = ~np.isfinite(f) | (f <= 0.0 if name != "tke"
                                         else ~np.isfinite(f))
                if bad.any():
                    loc = np.unravel_index(int(np.argmax(bad)), f.shape)
                    raise FloatingPointError(
                        f"non-physical {name} {f[loc]:.6e} at iteration "
                        f"{nn} nonlinear-iter {mm}, block {b.parent}, "
                        f"cell {tuple(int(x) for x in loc)}")

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

    # -- chunked device-side stepping ----------------------------------------
    def _physicality_stats(self, prims):
        """Device-side physicality minima — min density/pressure (+ flat
        argmin location) and, for RANS, min tke, per block, in a fixed
        (block, field) order.  Carried through the chunked scan so debug
        mode guards the production path without leaving the device
        (reference: MSG_ASSERT guards, procBlock.cpp:434-437)."""
        phys = self.phys
        mins, locs = [], []
        for b in self.case.blocks:
            g = b.g
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            q = prims[b.index][P]
            fields = [q[:phys.ns].sum(axis=0), q[phys.ie]]
            if phys.nturb:
                fields.append(q[phys.it])
            for f in fields:
                flat = f.reshape(-1)
                # jnp.argmin lands on the first NaN if any (NaN propagates
                # through min), so the location always points at the
                # offending cell
                mins.append(jnp.min(flat))
                locs.append(jnp.argmin(flat))
        return jnp.stack(mins), jnp.stack(locs).astype(jnp.int32)

    def _pack_outputs(self, l2, linfs, mr, prims):
        """Pack one nonlinear iteration's log outputs (and in debug mode
        the physicality minima) into ONE float + ONE int vector.  On the
        tunneled device every pytree leaf fetched costs a round trip, so
        the whole run's logging must collapse to a handful of buffers:
        layout [l2(neq) | linf-val(nb) | mr | dbg-min(nb*nf)], int side
        [linf-loc(nb) | dbg-loc(nb*nf)]."""
        ft = self.case.dtype
        f = [jnp.asarray(l2, ft).reshape(-1),
             jnp.stack([v for v, _ in linfs]).astype(ft),
             jnp.reshape(jnp.asarray(mr, ft), (1,))]
        i = [jnp.stack([loc for _, loc in linfs]).astype(jnp.int32)]
        if self.debug:
            mins, locs = self._physicality_stats(prims)
            f.append(mins.astype(ft))
            i.append(locs)
        return jnp.concatenate(f), jnp.concatenate(i)

    def _chunk_body(self, carry, cfl):
        """One full time step — store-old-solution + all nonlinear
        iterations — traced on device and scanned over a chunk of steps
        (the reference's per-iteration host loop, main.cpp:231-302,
        becomes one XLA while loop; only logging stays on host)."""
        prims, _, cons_nm1, bc_aux = carry
        phys = self.phys
        cons_n = {}
        for b in self.case.blocks:
            g = b.g
            P = (slice(None), slice(g, g + b.ni), slice(g, g + b.nj),
                 slice(g, g + b.nk))
            cons_n[b.index] = st.cons_from_prim(phys, prims[b.index][P])
        rk4 = self.cfg["time_integration"] == "rk4"
        nl_iters = self.deck["nonlinearIterations"]
        ys = []
        for mm in range(nl_iters):
            prims, l2, linfs, mr, bc_aux = self._iteration(
                prims, cons_n, cons_nm1, cfl, stage=mm if rk4 else 0,
                bc_aux=bc_aux)
            ys.append(self._pack_outputs(l2, linfs, mr, prims))
        new_nm1 = cons_n if self.cfg["multilevel_time"] else cons_nm1
        ys = (jnp.stack([f for f, _ in ys]), jnp.stack([i for _, i in ys]))
        return (prims, cons_n, new_nm1, bc_aux), ys

    def _run_chunk(self, prims, cons_n, cons_nm1, bc_aux, cfls):
        """Scan ``len(cfls)`` full time steps in one dispatch.  Returns the
        final (prims, cons_n, cons_nm1, bc_aux) and the per-step outputs."""
        if not hasattr(self, "_chunk_jit"):
            def scan_steps(geo_args, carry, cfls):
                with self._bound_geometry(geo_args):
                    return jax.lax.scan(self._chunk_body, carry, cfls)
            self._chunk_jit = jax.jit(scan_steps)
            if jax.process_count() > 1:
                # multi-controller: compile FIRST, then hold every
                # process at a coordination-service barrier before any
                # execution, and keep calling the compiled object.  A
                # process must never start the scan's cross-process
                # collectives while a peer is still compiling — Gloo's
                # lazy TCP/KV setup has a hard ~30 s timeout, and
                # compile skew between processes is unbounded (one may
                # load a persisted executable while another recompiles).
                # Compiles are STAGGERED: rank 0 compiles first and seeds
                # the persistent compilation cache; the other ranks then
                # load the identical SPMD executable from the cache
                # instead of redundantly optimizing the same program —
                # on a shared host (the driver's virtual-mesh dryrun)
                # this removes N-1 concurrent full compiles.
                from ..parallel.distributed import barrier_sync
                if jax.process_index() > 0:
                    barrier_sync("chunk_stagger")
                with self._trace_ctx():
                    self._chunk_exec = self._chunk_jit.lower(
                        self._geo_args, (prims, cons_n, cons_nm1, bc_aux),
                        cfls).compile()
                if jax.process_index() == 0:
                    barrier_sync("chunk_stagger")
                barrier_sync("chunk_compiled")
        with self._trace_ctx():
            fn = getattr(self, "_chunk_exec", None) or self._chunk_jit
            carry, ys = fn(
                self._geo_args, (prims, cons_n, cons_nm1, bc_aux), cfls)
        return carry + (ys,)

    def _log_chunk_outputs(self, nn0, cfls, fpack, ipack, per, simtime,
                           total_dof):
        """Write the .resid/.tme rows for one completed chunk from the
        packed HOST arrays (identical content to the per-step path).
        ``per`` is the chunk-average per-iteration wall time, ``simtime``
        the chunk's completion time relative to run start."""
        neq = self.phys.neq
        nb = len(self.case.blocks)
        for s in range(len(cfls)):
            for mm in range(fpack.shape[1]):
                fv, iv = fpack[s, mm], ipack[s, mm]
                l2 = np.sqrt(fv[:neq])
                linf_host = [(fv[neq + bi], iv[bi]) for bi in range(nb)]
                linf_val, linf_loc = self._decode_linf(linf_host)
                mr = float(fv[neq + nb])
                mr = np.sqrt(mr / total_dof) if mr > 0 else 0.0
                self._write_residuals(nn0 + s, mm, float(cfls[s]), l2,
                                      linf_val, linf_loc, mr)
                if self.debug:
                    self._check_packed_phys(fv, iv, nn0 + s, mm, l2)
            self.time_file.write(
                f"{nn0 + s - self.iteration_start:<7d}{per:<16.6e}"
                f"{simtime:<16.6e}\n")

    def _check_packed_phys(self, fv, iv, nn, mm, l2):
        """Host-side decode of the packed physicality minima: abort with
        the offending field/block/cell exactly like the per-step
        ``check_physicality`` (reference: procBlock.cpp:434-437).  Field
        violations are reported before the residual-norm check — the
        reference's in-loop asserts fire before residuals are summed."""
        neq = self.phys.neq
        nb = len(self.case.blocks)
        names = ["density", "pressure"] + (["tke"] if self.phys.nturb
                                           else [])
        off_f, off_i = neq + nb + 1, nb
        k = 0
        for b in self.case.blocks:
            for name in names:
                v = float(fv[off_f + k])
                bad = not np.isfinite(v) or (name != "tke" and v <= 0.0)
                if bad:
                    loc = np.unravel_index(int(iv[off_i + k]),
                                           (b.ni, b.nj, b.nk))
                    raise FloatingPointError(
                        f"non-physical {name} {v:.6e} at iteration {nn} "
                        f"nonlinear-iter {mm}, block {b.parent}, "
                        f"cell {tuple(int(x) for x in loc)}")
                k += 1
        if not np.all(np.isfinite(l2)):
            raise FloatingPointError(
                f"non-finite residual L2 {l2} at iteration {nn} "
                f"nonlinear-iter {mm}")

    @staticmethod
    def _pick_chunk(iterations, chunk):
        """Chunk plan ``(size, tail)``.  ``chunk`` is a CEILING on the
        scan length (callers bound per-dispatch work with it).  Prefer
        the largest divisor of ``iterations`` within the cap, so every
        chunk reuses ONE compiled scan; when no decent divisor exists
        (prime/awkward counts) run full ``chunk``-step scans plus a
        short tail executed on the per-step path — never a silently
        compiled second scan shape."""
        cap = max(1, min(chunk, iterations))
        best = max(d for d in range(1, cap + 1) if iterations % d == 0)
        if 2 * best >= cap:
            return best, 0
        return cap, iterations % cap

    def _run_chunked(self, iterations, chunk):
        """Chunked main loop, transport-insensitive: chunks are enqueued
        back-to-back (async dispatch keeps the device busy), each chunk's
        completion is timestamped with a data-free ``block_until_ready``
        on its carry, and the packed per-step outputs stay ON DEVICE
        until the loop ends — one concatenate + one two-leaf fetch for
        the WHOLE run.  On the tunneled device a per-chunk pytree fetch
        cost ~2-3 s against ~60 ms of compute (round-2 verdict #1); this
        path pays transport once per run, so the recorded .tme rows
        reflect the machine.  In debug mode outputs are instead fetched
        per chunk so physicality violations abort promptly.  File
        content is identical to the per-step path."""
        deck = self.deck
        size, tail = self._pick_chunk(iterations, chunk)
        sim_start = time.perf_counter()
        if (self.cfg["multilevel_time"] and self.iteration_start == 0):
            self.cons_nm1 = dict(self.store_old_solution())
        prims, cons_n, cons_nm1, bc_aux = (self.prims, self.cons_n,
                                           self.cons_nm1, self.bc_aux)
        total_dof = self.case.total_cells * self.phys.neq
        done = []               # (nn0, cfls, ys, per, simtime)
        prev = None             # (nn0, cfls, ys, carry_leaf)
        t_prev = sim_start
        nn = 0

        def finish(prev, t_prev):
            p_nn0, p_cfls, p_ys, p_leaf = prev
            jax.block_until_ready(p_leaf)
            t_done = time.perf_counter()
            per = (t_done - t_prev) / len(p_cfls)
            if self.debug:
                f_h, i_h = jax.device_get(p_ys)
                self._log_chunk_outputs(p_nn0, p_cfls, f_h, i_h, per,
                                        t_done - sim_start, total_dof)
            else:
                done.append((p_nn0, p_cfls, p_ys, per, t_done - sim_start))
            return t_done

        while nn < iterations - tail:
            cfls = np.asarray([deck.cfl(nn + s) for s in range(size)],
                              dtype=self.case.dtype)
            prims, cons_n, cons_nm1, bc_aux, ys = self._run_chunk(
                prims, cons_n, cons_nm1, bc_aux, jnp.asarray(cfls))
            if prev is not None:
                t_prev = finish(prev, t_prev)
            prev = (nn + self.iteration_start, cfls, ys,
                    prims[self.case.blocks[0].index])
            nn += size
        finish(prev, t_prev)
        if done:
            f_all, i_all = jax.device_get(
                (jnp.concatenate([d[2][0] for d in done]),
                 jnp.concatenate([d[2][1] for d in done])))
            row = 0
            for p_nn0, p_cfls, _ys, per, simtime in done:
                n = len(p_cfls)
                self._log_chunk_outputs(p_nn0, p_cfls,
                                        f_all[row:row + n],
                                        i_all[row:row + n], per, simtime,
                                        total_dof)
                row += n
        self.prims, self.cons_n = prims, cons_n
        self.cons_nm1, self.bc_aux = cons_nm1, bc_aux
        # ragged tail (prime/awkward iteration counts): a few per-step
        # iterations on the already-jitted single-step executable instead
        # of compiling a second scan shape
        rk4 = self.cfg["time_integration"] == "rk4"
        nl_iters = deck["nonlinearIterations"]
        multilevel = self.cfg["multilevel_time"]
        for s in range(tail):
            nn_g = iterations - tail + s
            iter_start = time.perf_counter()
            cfl = deck.cfl(nn_g)
            self.cons_n = self.store_old_solution()
            for mm in range(nl_iters):
                prims, l2, linfs, mr_, self.bc_aux = self._iterate(
                    self.prims, self.cons_n, self.cons_nm1,
                    jnp.asarray(cfl, self.case.dtype),
                    stage=mm if rk4 else 0, bc_aux=self.bc_aux)
                self.prims = prims
                l2 = np.sqrt(np.asarray(l2))
                linf_val, linf_loc = self._decode_linf(linfs)
                mr = float(mr_)
                mr = np.sqrt(mr / total_dof) if mr > 0 else 0.0
                self._write_residuals(nn_g + self.iteration_start, mm, cfl,
                                      l2, linf_val, linf_loc, mr)
                if self.debug:
                    self.check_physicality(nn_g + self.iteration_start, mm,
                                           l2)
                if multilevel and mm == nl_iters - 1:
                    self.cons_nm1 = dict(self.cons_n)
            now = time.perf_counter()
            self.time_file.write(
                f"{nn_g:<7d}{now - iter_start:<16.6e}"
                f"{now - sim_start:<16.6e}\n")

    # -- main loop -----------------------------------------------------------
    def run(self, iterations=None, write_files=False, chunk=16):
        deck = self.deck
        iterations = iterations or deck["iterations"]
        self._open_logs(restart=self.is_restart)
        sim_start = time.perf_counter()
        nl_iters = deck["nonlinearIterations"]
        if write_files:
            self.write_grid_center()
            self.write_output(self.iteration_start)

        # chunked scan path: identical arithmetic, one dispatch per chunk.
        # File-writing runs need the pre-update state for aux output ->
        # per-step path.  Debug mode DOES run chunked (guarded by packed
        # device-side physicality minima, checked per chunk).
        if chunk and chunk > 1 and not write_files:
            self._run_chunked(iterations, chunk)
            self.resid_file.close()
            self.time_file.close()
            return self

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
                # pre-update state retained so output-time aux fields
                # (gradients / dt / mut / residual) reproduce the
                # reference's, which stores them during the iteration —
                # i.e. evaluated BEFORE the last update (procBlock holds
                # them on the block, procBlock.hpp:100-121)
                self._prev_prims = self.prims
                prims, l2, linfs, matrix_resid, self.bc_aux = self._iterate(
                    self.prims, self.cons_n, self.cons_nm1,
                    jnp.asarray(cfl, self.case.dtype),
                    stage=mm if rk4 else 0, bc_aux=self.bc_aux)
                self.prims = prims
                l2 = np.sqrt(np.asarray(l2))
                linf_val, linf_loc = self._decode_linf(linfs)
                mr = float(matrix_resid)
                mr = np.sqrt(mr / total_dof) if mr > 0 else 0.0
                self._write_residuals(nn + self.iteration_start, mm, cfl, l2,
                                      linf_val, linf_loc, mr)
                if self.debug:
                    self.check_physicality(nn + self.iteration_start, mm, l2)
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
