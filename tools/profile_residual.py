"""Dissect full_residual into its sub-phases on the TPU (dev tool).

Times reconstruction, inviscid flux, face-CV gradients, viscous flux and
sources separately on the rae2822 case (optionally the 3-D extrusion) so
the hot-loop fusion work (reference: procBlock.cpp:384-824 inviscid,
:1233-1879 viscous) targets the real milliseconds.

    python tools/profile_residual.py --nk 48
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
    from aither_tpu.solver import viscous as vis
    from aither_tpu.solver import state as st
    from aither_tpu.solver.reconstruction import reconstruct_faces
    from aither_tpu.solver.flux import inviscid_flux
    from aither_tpu.grid.geometry import AX

    nk = 0
    if "--nk" in sys.argv:
        nk = int(sys.argv[sys.argv.index("--nk") + 1])
    if nk:
        from bench import _extruded_case
        solver = _extruded_case(nk=nk)
    else:
        ref = "/root/reference/testCases/rae2822"
        workdir = tempfile.mkdtemp(prefix="aither_profres_")
        for f in os.listdir(ref):
            shutil.copy(os.path.join(ref, f), workdir)
        solver = Solver(os.path.join(workdir, "rae2822.inp"),
                        workdir=workdir)
    print(f"cells: {solver.case.total_cells}")
    phys, cfg = solver.phys, solver.cfg
    b = solver.case.blocks[0]
    g = b.g
    prims = dict(solver.prims)
    prim = step_mod.apply_boundary_ghosts(phys, b, prims[b.index])
    prim = jax.block_until_ready(jax.jit(lambda p: p * 1.0)(prim))
    geom = b.geom
    dims = dict(i=b.ni, j=b.nj, k=b.nk)

    t, _ = timeit(jax.jit(
        lambda p: step_mod.full_residual(phys, cfg, b, p, need_aux=False)), prim)
    print(f"full_residual:            {t:8.3f} ms")

    t, _ = timeit(jax.jit(
        lambda p: step_mod.inviscid_residual(phys, cfg, b, p)), prim)
    print(f"  inviscid_residual:      {t:8.3f} ms")

    for d in "ijk":
        ax = 1 + AX[d]
        n = dims[d]
        tsl = [slice(None)] * 4
        for a, dd in enumerate("ijk"):
            if dd != d:
                tsl[1 + a] = slice(g, g + dims[dd])
        widths = geom[f"width_{d}"][tuple(tsl[1:])]

        def recon(p, tsl=tuple(tsl), widths=widths, ax=ax, n=n):
            return reconstruct_faces(p[tsl], widths, ax, g, n,
                                     cfg["recon"], cfg["kappa"],
                                     cfg["limiter"])
        t, (ql, qr) = timeit(jax.jit(recon), prim)
        print(f"  recon {d}:               {t:8.3f} ms")

        fidx = [slice(None)] * 4
        for a, dd in enumerate("ijk"):
            fidx[1 + a] = slice(g, g + dims[dd] + (1 if dd == d else 0))
        nvec = geom[f"n_{d}"][tuple(fidx)]
        mag = geom[f"mag_{d}"][tuple(fidx[1:])]

        def flux_only(ql, qr, nvec=nvec, mag=mag):
            return inviscid_flux(phys, ql, qr, nvec, cfg["flux"]) * mag[None]
        ql = jax.block_until_ready(ql)
        qr = jax.block_until_ready(qr)
        t, _ = timeit(jax.jit(flux_only), ql, qr)
        print(f"  roe flux {d}:            {t:8.3f} ms")

    # viscous path pieces
    def aux_fields(p):
        t_all = phys.temperature(p[phys.ie], p[:phys.ns])
        mf_all = p[:phys.ns] / p[:phys.ns].sum(axis=0)[None]
        mu_all = phys.viscosity(t_all, mf_all)
        return t_all, mu_all
    t, (t_all, mu_all) = timeit(jax.jit(aux_fields), prim)
    print(f"  t/mu fields:            {t:8.3f} ms")
    t_all = jax.block_until_ready(t_all)
    mu_all = jax.block_until_ready(mu_all)

    t, _ = timeit(jax.jit(
        lambda p, t_, m_: vis.viscous_residual(
            phys, cfg, b, p, t_, m_, need_aux=False,
            need_pgrad=cfg.get("need_pgrad", True))),
        prim, t_all, mu_all)
    print(f"  viscous_residual:       {t:8.3f} ms")

    is_rans = phys.nturb > 0
    multi = phys.ns > 1
    for d in "ijk":
        t, grads = timeit(jax.jit(
            lambda p, t_, d=d: vis.face_cv_gradients(
                phys, b, p, t_, d, is_rans, multi)), prim, t_all)
        print(f"  face_cv_gradients {d}:   {t:8.3f} ms")

    if is_rans:
        d = "i"
        grads = jax.block_until_ready(jax.jit(
            lambda p, t_: vis.face_cv_gradients(phys, b, p, t_, d,
                                                is_rans, multi))(prim, t_all))
        # face states for eddy viscosity
        from aither_tpu.solver.reconstruction import central

        def eddy(p, m_, grads):
            nf = dims[d] + 1
            def cellslab(arr, off_d, eqdim=True):
                sl = [slice(None)] * (4 if eqdim else 3)
                o = 1 if eqdim else 0
                d1, d2 = [x for x in "ijk" if x != d]
                sl[o + AX[d]] = slice(g - 1 + off_d, g - 1 + off_d + nf)
                sl[o + AX[d1]] = slice(g, g + dims[d1])
                sl[o + AX[d2]] = slice(g, g + dims[d2])
                return arr[tuple(sl)]
            w_all = geom[f"width_{d}"]
            w_lo = cellslab(w_all, 0, False)
            w_hi = cellslab(w_all, 1, False)
            qf = central(cellslab(p, 0), cellslab(p, 1), w_lo, w_hi)
            muf = central(cellslab(m_, 0, False)[None],
                          cellslab(m_, 1, False)[None], w_lo, w_hi)[0]
            wd = geom["wall_dist"]
            wdf = central(cellslab(wd, 0, False)[None],
                          cellslab(wd, 1, False)[None], w_lo, w_hi)[0]
            return vis.eddy_visc_and_blending(
                phys, cfg["turb_model"], qf, grads["vel"], grads["tke"],
                grads["omega"], muf, wdf, 0.5 * (w_lo + w_hi))
        t, _ = timeit(jax.jit(eddy), prim, mu_all, grads)
        print(f"  eddy visc (i faces):    {t:8.3f} ms")


if __name__ == "__main__":
    main()
