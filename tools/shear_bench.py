"""Micro-benchmark the shear skew/unskew relayouts on the live TPU.

The skew (implicit.shear_skew) is the physical->hyperplane relayout under
every LU-SGS sweep input.  At 5M cells the full solver spends most of its
non-residual time in these relayouts (measured 44x off the HBM roofline),
so this tool times the formulation standalone against plain copies and
transposes of the same data:
    python tools/shear_bench.py 368 64 213     # the 5M extrusion block
    python tools/shear_bench.py 368 64 48      # the 1.13M block

Round-5 findings (recorded in the implicit.py shear section): the
flatten-trick shear is ~12 GB/s standalone at 5M (the pad+reshape forces
a per-row lane rotation); a stack-of-static-diagonal-slices rewrite hit
60.8 GB/s standalone (5x) but made the FULL 5M iteration 1.7x slower
(459 -> 790 ms, optimization_barrier-insensitive) — the 215-operand
concat graph degrades XLA's scheduling of the whole program — and
compile-OOMed when stacked along the minor axis (every (...,1) slice
temp pads to a 128-lane tile).  Standalone wins here do NOT compose;
check the full iteration before swapping formulations.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _sync(x):
    import jax
    float(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, n=10):
    out = fn(*args)
    _sync(out)

    def window(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        _sync(o)
        return time.perf_counter() - t0

    t_lo = window(n)
    t_hi = window(3 * n)
    return (t_hi - t_lo) / (2 * n) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aither_tpu.solver import implicit as imp

    ni, nj, nk = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (368, 64, 213)
    g = 2
    C = 7
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (C, ni + 2 * g, nj + 2 * g, nk + 2 * g)), jnp.float32)
    dims = (ni, nj, nk)
    P = ni + nj + nk
    nbytes = x.size * 4
    print(f"block {ni}x{nj}x{nk} ({ni*nj*nk/1e6:.2f}M cells), "
          f"{C}ch f32 = {nbytes/1e6:.0f} MB")

    skew = jax.jit(lambda a: imp.shear_skew(a, g, dims))
    t = timeit(skew, x)
    sk = skew(x)
    print(f"shear_skew:     {t:8.3f} ms  "
          f"({(x.size + sk.size) * 4 / t / 1e6:6.1f} GB/s eff)")

    unskew = jax.jit(lambda s: imp.shear_unskew(s, dims))
    t = timeit(unskew, sk)
    print(f"shear_unskew:   {t:8.3f} ms")

    # reference points: pure copy and pure transpose of the same data
    cp = jax.jit(lambda a: a + 1.0)
    t = timeit(cp, x)
    print(f"copy (a+1):     {t:8.3f} ms  ({2*nbytes/t/1e6:6.1f} GB/s)")

    tr = jax.jit(lambda a: jnp.swapaxes(a, 1, 3).copy())
    t = timeit(tr, x)
    print(f"transpose i<->k:{t:8.3f} ms  ({2*nbytes/t/1e6:6.1f} GB/s)")

    tr2 = jax.jit(lambda a: jnp.moveaxis(a, (3, 1), (-2, -1)).copy())
    t = timeit(tr2, x)
    print(f"moveaxis(k,i)last:{t:6.3f} ms  ({2*nbytes/t/1e6:6.1f} GB/s)")

    # the two component shears of shear_skew, separately
    xx = x[..., :, g - 1:g + nj + 1, g - 1:g + nk + 1]
    Q = P + g + 2
    s1 = jax.jit(lambda a: imp._shear_sub(a, 1, 3, Q, 0.0))
    t = timeit(s1, xx)
    y = s1(xx)
    print(f"shear over k:   {t:8.3f} ms   out {y.shape}")
    s2 = jax.jit(lambda a: imp._shear_sub(a, 1, 2, Q, 0.0))
    t = timeit(s2, y)
    print(f"shear over j:   {t:8.3f} ms")


if __name__ == "__main__":
    main()
