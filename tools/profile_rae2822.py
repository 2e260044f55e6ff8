"""Dissect one rae2822 TPU iteration into its phases (dev tool).

Times each jitted phase of Solver._iteration separately with real inputs so
optimization effort goes where the milliseconds are.  Run on the TPU:
    python tools/profile_rae2822.py           # 23k-cell 2-D case
    python tools/profile_rae2822.py --nk 48   # 1.13M-cell 3-D extrusion
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from aither_tpu.solver.driver import Solver
    from aither_tpu.solver import step as step_mod
    from aither_tpu.solver import implicit as imp

    nk = 0
    if "--nk" in sys.argv:
        nk = int(sys.argv[sys.argv.index("--nk") + 1])
    if nk:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import _extruded_case
        solver = _extruded_case(nk=nk)
    else:
        ref = "/root/reference/testCases/rae2822"
        workdir = tempfile.mkdtemp(prefix="aither_prof_")
        for f in os.listdir(ref):
            shutil.copy(os.path.join(ref, f), workdir)
        solver = Solver(os.path.join(workdir, "rae2822.inp"),
                        workdir=workdir)
    print(f"cells: {solver.case.total_cells}")
    phys, cfg, case = solver.phys, solver.cfg, solver.case
    b = case.blocks[0]
    g = b.g
    cfl = jnp.asarray(solver.deck.cfl(0), case.dtype)
    prims = dict(solver.prims)
    cons_n, cons_nm1 = solver.cons_n, solver.cons_nm1

    t_all, _ = timeit(solver._iterate, prims, cons_n, cons_nm1, cfl, 0)
    print(f"full _iterate:        {t_all:8.3f} ms")

    bcs = jax.jit(lambda p: step_mod.apply_all_bcs(
        phys, case, p, bc_aux=solver.bc_aux, cons_n=cons_n))
    t_bc, prims_bc = timeit(bcs, prims)
    print(f"apply_all_bcs:        {t_bc:8.3f} ms")

    fr = jax.jit(lambda p: step_mod.full_residual(phys, cfg, b, p[b.index], need_aux=False))
    t_fr, fr_out = timeit(fr, prims_bc)
    print(f"full_residual:        {t_fr:8.3f} ms")
    resid, sr_f, sr_t, dg_f, dg_t, _, prim_v, aux = fr_out

    sr = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f

    def setup(resid, sr, dg_f, dg_t, prim_v, aux):
        dt = step_mod.local_dt(cfg, b.geom, sr, g, (b.ni, b.nj, b.nk), cfl)
        inv_f, inv_t = imp.build_diagonal(phys, b, cfg, dg_f, dg_t, sr, dt)
        bb = imp.rhs_b(phys, b, cfg, prim_v, resid, cons_n[b.index],
                       cons_nm1[b.index], dt)
        return dt, inv_f, inv_t, bb
    t_su, (dt, inv_f, inv_t, bb) = timeit(jax.jit(setup), resid, sr, dg_f,
                                          dg_t, prim_v, aux)
    print(f"dt/diag/rhs:          {t_su:8.3f} ms")

    ctx = solver.ictx[b.index]
    du = jnp.zeros((phys.neq,) + b.shape, case.dtype)

    def skews(bb, inv_f, inv_t):
        b_skew = imp.skew_from_physical(ctx, bb)
        if_skew = imp.skew_from_physical(ctx, inv_f)
        it_skew = (imp.skew_from_physical(ctx, inv_t)
                   if inv_t is not None else None)
        return b_skew, if_skew, it_skew
    t_sk, (b_skew, if_skew, it_skew) = timeit(jax.jit(skews), bb, inv_f,
                                              inv_t)
    print(f"skew transforms:      {t_sk:8.3f} ms")

    fwd = jax.jit(lambda p, du: imp.lusgs_forward(
        phys, cfg, b, ctx, p, du, b_skew, if_skew, it_skew, False, aux=aux))
    t_f, du_f = timeit(fwd, prim_v, du)
    print(f"lusgs_forward:        {t_f:8.3f} ms")

    bwd = jax.jit(lambda p, du: imp.lusgs_backward(
        phys, cfg, b, ctx, p, du, b_skew, if_skew, it_skew, False, aux=aux))
    t_b, _ = timeit(bwd, prim_v, du_f)
    print(f"lusgs_backward:       {t_b:8.3f} ms")

    swap = jax.jit(lambda d: step_mod.swap_connection_states(
        phys, case.blocks, d, case.connections[0], g))
    t_sw, _ = timeit(swap, {b.index: du_f})
    print(f"du connection swap:   {t_sw:8.3f} ms")

    mr = jax.jit(lambda p, du: imp.matrix_residual(
        phys, cfg, b, ctx, p, du, bb, 1.0 / if_skew if if_skew is not None
        else None, None, aux=aux))
    try:
        t_mr, _ = timeit(jax.jit(lambda p, du: imp.matrix_residual(
            phys, cfg, b, ctx, p, du, bb,
            1.0 / inv_f, None if inv_t is None else 1.0 / inv_t, aux=aux)),
            prim_v, du_f)
        print(f"matrix_residual:      {t_mr:8.3f} ms")
    except Exception as e:
        print("matrix_residual: skipped", e)

    upd = jax.jit(lambda p, du: step_mod.implicit_update(
        phys, b, p, du[(slice(None), slice(g, g + b.ni),
                        slice(g, g + b.nj), slice(g, g + b.nk))]))
    t_u, _ = timeit(upd, prim_v, du_f)
    print(f"implicit_update:      {t_u:8.3f} ms")

    norms = jax.jit(step_mod.residual_norms)
    t_n, _ = timeit(norms, resid)
    print(f"residual_norms:       {t_n:8.3f} ms")


if __name__ == "__main__":
    main()
