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


def _fetch(out):
    """Fetch-sync: block_until_ready has been observed to return before
    the tunneled device finishes (see bench._sync) — fetch ONE element
    (sliced on device first: fetching a whole leaf would pull megabytes
    through the tunnel) of the smallest leaf so the timing window
    provably covers the compute."""
    import jax
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and getattr(x, "size", 0)]
    if leaves:
        x = min(leaves, key=lambda a: a.size)
        float(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, n=20, **kw):
    """K-difference fetch-synced timing (bench.py methodology): time an
    n-call and a 3n-call window, each ended by a host fetch, and report
    (t_hi - t_lo) / (2n) — the constant fetch round-trip cancels."""
    out = fn(*args, **kw)
    _fetch(out)

    def window(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args, **kw)
        _fetch(o)
        return time.perf_counter() - t0, o

    t_lo, out = window(n)
    t_hi, out = window(3 * n)
    return (t_hi - t_lo) / (2 * n) * 1e3, out


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
    geo = solver._geo_args

    def jit_geo(f):
        """jit a phase with geometry passed as an ARGUMENT (driver
        _bound_geometry) — closing over multi-million-cell geom arrays
        inlines them into the compile payload (tunnel HTTP 413)."""
        def wrapped(geo_args, *a):
            with solver._bound_geometry(geo_args):
                return f(*a)
        jf = jax.jit(wrapped)
        call = lambda *a: jf(geo, *a)
        call._jf = jf
        return call

    def cost_str(fn, *args):
        """post-fusion bytes + flops of the compiled phase (XLA cost
        analysis; same semantics as tools/roofline.iteration_cost)."""
        try:
            jf = getattr(fn, "_jf", None)
            ca = (jf.lower(geo, *args) if jf is not None
                  else solver._iterate_geo.lower(
                      geo, *args, stage=0)).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return (f"  {float(ca.get('bytes accessed', 0)) / 1e9:7.2f} GB"
                    f"  {float(ca.get('flops', 0)) / 1e9:7.2f} GF")
        except Exception as e:
            return f"  cost? {e!r}"[:60]

    t_all, _ = timeit(solver._iterate, prims, cons_n, cons_nm1, cfl, 0)
    print(f"full _iterate:        {t_all:8.3f} ms"
          + cost_str(None, prims, cons_n, cons_nm1, cfl), flush=True)

    bcs = jit_geo(lambda p: step_mod.apply_all_bcs(
        phys, case, p, bc_aux=solver.bc_aux, cons_n=cons_n))
    t_bc, prims_bc = timeit(bcs, prims)
    print(f"apply_all_bcs:        {t_bc:8.3f} ms" + cost_str(bcs, prims),
          flush=True)

    fr = jit_geo(lambda p: step_mod.full_residual(
        phys, cfg, b, p[b.index], need_aux=False))
    t_fr, fr_out = timeit(fr, prims_bc)
    print(f"full_residual:        {t_fr:8.3f} ms" + cost_str(fr, prims_bc),
          flush=True)
    resid, sr_f, sr_t, dg_f, dg_t, _, prim_v, aux = fr_out

    sr = jnp.maximum(sr_f, sr_t) if phys.nturb else sr_f

    def setup(resid, sr, dg_f, dg_t, prim_v, aux):
        dt = step_mod.local_dt(cfg, b.geom, sr, g, (b.ni, b.nj, b.nk), cfl)
        inv_f, inv_t = imp.build_diagonal(phys, b, cfg, dg_f, dg_t, sr, dt)
        bb = imp.rhs_b(phys, b, cfg, prim_v, resid, cons_n[b.index],
                       cons_nm1[b.index], dt)
        return dt, inv_f, inv_t, bb
    su = jit_geo(setup)
    t_su, (dt, inv_f, inv_t, bb) = timeit(su, resid, sr, dg_f,
                                          dg_t, prim_v, aux)
    print(f"dt/diag/rhs:          {t_su:8.3f} ms"
          + cost_str(su, resid, sr, dg_f, dg_t, prim_v, aux), flush=True)

    ctx = solver.ictx[b.index]
    du = jnp.zeros((phys.neq,) + b.shape, case.dtype)

    def skews(bb, inv_f, inv_t):
        b_skew = imp.skew_from_physical(ctx, bb)
        if_skew = imp.skew_from_physical(ctx, inv_f)
        it_skew = (imp.skew_from_physical(ctx, inv_t)
                   if inv_t is not None else None)
        return b_skew, if_skew, it_skew
    sk = jit_geo(skews)
    t_sk, (b_skew, if_skew, it_skew) = timeit(sk, bb, inv_f, inv_t)
    print(f"skew transforms:      {t_sk:8.3f} ms" + cost_str(sk, bb, inv_f,
                                                             inv_t),
          flush=True)

    # device arrays must be ARGS, not closures — closed-over concrete
    # arrays embed as constants in the payload (tunnel HTTP 413 at 5M)
    fwd = jit_geo(lambda p, du, bs, ifs, its, ax: imp.lusgs_forward(
        phys, cfg, b, ctx, p, du, bs, ifs, its, False, aux=ax))
    t_f, du_f = timeit(fwd, prim_v, du, b_skew, if_skew, it_skew, aux)
    print(f"lusgs_forward:        {t_f:8.3f} ms"
          + cost_str(fwd, prim_v, du, b_skew, if_skew, it_skew, aux),
          flush=True)

    bwd = jit_geo(lambda p, du, bs, ifs, its, ax: imp.lusgs_backward(
        phys, cfg, b, ctx, p, du, bs, ifs, its, False, aux=ax))
    t_b, _ = timeit(bwd, prim_v, du_f, b_skew, if_skew, it_skew, aux)
    print(f"lusgs_backward:       {t_b:8.3f} ms"
          + cost_str(bwd, prim_v, du_f, b_skew, if_skew, it_skew, aux),
          flush=True)

    def prep_only(p, bs, ifs, its, ax):
        items = [dict(block=b, ctx=ctx, prim=p, du=None, b=bs,
                      inv_f=ifs, inv_t=its, aux=ax)]
        pr = imp.prepare_group_sweep(phys, cfg, items)
        return pr["slab"][0], pr["b"], pr["valid"]
    pr_fn = jit_geo(prep_only)
    t_pr, _ = timeit(pr_fn, prim_v, b_skew, if_skew, it_skew, aux)
    print(f"prepare_group_sweep:  {t_pr:8.3f} ms"
          + cost_str(pr_fn, prim_v, b_skew, if_skew, it_skew, aux),
          flush=True)

    if case.connections:
        swap = jit_geo(lambda d: step_mod.swap_connection_states(
            phys, case.blocks, d, case.connections[0], g))
        t_sw, _ = timeit(swap, {b.index: du_f})
        print(f"du connection swap:   {t_sw:8.3f} ms", flush=True)

    try:
        t_mr, _ = timeit(jit_geo(lambda p, du, bb_, if_, it_, ax:
                                 imp.matrix_residual(
            phys, cfg, b, ctx, p, du, bb_,
            1.0 / if_, None if it_ is None else 1.0 / it_, aux=ax)),
            prim_v, du_f, bb, inv_f, inv_t, aux)
        print(f"matrix_residual:      {t_mr:8.3f} ms", flush=True)
    except Exception as e:
        print("matrix_residual: skipped", e)

    upd = jit_geo(lambda p, du: step_mod.implicit_update(
        phys, b, p, du[(slice(None), slice(g, g + b.ni),
                        slice(g, g + b.nj), slice(g, g + b.nk))]))
    t_u, _ = timeit(upd, prim_v, du_f)
    print(f"implicit_update:      {t_u:8.3f} ms", flush=True)

    norms = jit_geo(step_mod.residual_norms)
    t_n, _ = timeit(norms, resid)
    print(f"residual_norms:       {t_n:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
