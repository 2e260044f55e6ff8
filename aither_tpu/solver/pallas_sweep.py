"""Pallas TPU kernel for the LU-SGS hyperplane sweeps.

The XLA `lax.scan` formulation of the wavefront recurrence round-trips a
dozen tiny (J2, K2) intermediates through HBM on every hyperplane, costing
~6-7 us per plane on small planes (the rae2822 block has 433 planes x 8
sweeps per iteration).  This kernel runs the whole sweep on-core: the grid
dimension walks the hyperplanes sequentially, each step's packed inputs
(one (C, J2, K2) slab) are auto-double-buffered into VMEM by the BlockSpec
pipeline, the carry plane lives in a VMEM scratch buffer that persists
across grid steps, and all the off-diagonal flux math stays in registers /
VMEM.  The math is exactly the scan body's (implicit.py lusgs_forward /
lusgs_backward; reference: linearSolver.cpp:341-428) — same `offdiagonal`
and `diag_mult` functions traced into the kernel.

Used for the scalar (lusgs) solver in float32 on TPU; the lax.scan path
remains for CPU/float64 and the block-matrix solvers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_plane(arr, kind):
    """normalize a plane-indexed input to (P, k, J2, K2)"""
    if kind == "eqfirst":        # (neq, P, J2, K2)
        return jnp.moveaxis(arr, 0, 1)
    if kind == "plain":          # (P, J2, K2)
        return arr[:, None]
    raise ValueError(kind)


def _pack(fields, dtype):
    """fields: name -> (array, kind); returns ((P, C, J2, K2), offs)."""
    parts, offs = [], {}
    c = 0
    for name, (arr, kind) in fields.items():
        a = _norm_plane(jnp.asarray(arr).astype(dtype), kind)
        offs[name] = (c, a.shape[1])
        c += a.shape[1]
        parts.append(a)
    return jnp.concatenate(parts, axis=1), offs


def shard_count(cfg) -> int:
    """Number of sweep shards when the stacked-K2 axis is shard_map'd
    over a device mesh (cfg['sweep_shard_mesh'], set by
    driver.enable_sharding).  The per-device kernel sees K2/n planes, so
    every VMEM-budget decision (plane_chunk) must use the LOCAL width."""
    mesh = cfg.get("sweep_shard_mesh")
    return int(mesh.size) if mesh is not None else 1


def stream_channels(phys, cfg):
    """Total streamed channels per plane across the three operands —
    computable identically at init-time prepack and at sweep time, so
    both agree on the q-plane block size."""
    neq, N = phys.neq, phys.ns + 4
    viscous = bool(cfg.get("viscous", False))
    blk = bool(cfg.get("block_matrix", False))
    turb = phys.nturb > 0
    slab = neq + (1 if viscous else 0) + (2 if viscous and turb else 0) \
        + (9 if viscous and blk else 0)
    inv = (N * N if blk else 1) + ((4 if blk else 1) if turb else 0)
    per_dir = 5 + (1 if viscous else 0)
    static = 3 * per_dir + 1
    work = 2 * neq
    return slab + neq + inv + static + work


def plane_chunk(P, C, K2, J2, dtype, block_matrix=False):
    """Planes per grid step: amortize the per-step pipeline overhead of
    the wavefront (each plane's compute is tiny) while keeping the
    double-buffered operand blocks comfortably inside VMEM."""
    # C is the TOTAL streamed channel count (stream_channels — the only
    # number both the init-time prepack and the sweep call can agree on).
    # Multi-plane blocks pay off when planes are tiny (per-step pipeline
    # overhead dominates); for big planes the per-plane compute already
    # covers the overhead and the q-times-larger unrolled kernel only
    # strains the compiler.
    import numpy as np
    itemsize = np.dtype(dtype).itemsize
    bytes_per_plane = C * K2 * J2 * itemsize
    # Mosaic allocates the body's temporaries on the VMEM stack (~16M
    # scoped limit); the unrolled off-diagonal math costs ~400 (scalar) /
    # ~2600 (block N*N matvecs + TSL rows) channel-equivalents per plane
    # step (measured: scalar 18.8M at q=1 on a 13.5k-point plane; block
    # 16.4M at q=8 on a 208-point plane).
    temp_ch = 2600 if block_matrix else 400
    est = temp_ch * K2 * J2 * itemsize
    if est > 12 * 1024 * 1024:
        return 0        # plane too large for the kernel — use the scan path
    # Above this volume the kernel buys nothing: the earlier >50-min
    # Mosaic compiles were the concat-formulated in-plane shifts (with
    # pltpu.roll the SST 7-eq sweep on the 1.13M-cell extrusion compiles
    # in ~52 s), but measured head-to-head there the kernel TIES the
    # lax.scan wavefront (10.2 vs 10.1 ms standalone forward sweep) and
    # q>1 chunking is ~20% SLOWER — at big planes both paths sit on the
    # same ~21 us/hyperplane serialization floor, so the scan path wins
    # on compile time.  The kernel pays off where dispatch overhead
    # dominates: tiny planes, many steps (every 2-D case).
    if C * K2 * J2 > 150_000:
        return 0
    q = 8
    while q > 1 and (q * bytes_per_plane > 512 * 1024
                     or q * est > 8 * 1024 * 1024):
        q //= 2
    return q


def _arrange(packed, side, q):
    """Slice the P planes into sweep processing order (forward consumes
    lower-side inputs for planes 1..P-1, backward upper-side for planes
    P-2..0) and pad to a multiple of the q-plane grid block."""
    P = packed.shape[0]
    arr = packed[1:] if side == "lower" else packed[:P - 1][::-1]
    pad = (-(P - 1)) % q
    if pad:
        cfgs = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, cfgs)
    return arr


def pack_static_sweep(phys, cfg, nbr, valid, dtype, side):
    """Per-sweep-side face geometry / mask channels — constant per case,
    packed ONCE (driver prepacks at init so no per-call relayout) and fed
    to the kernel as a separate operand, pre-transposed to the kernel's
    (q-padded P, Cs, K2, J2) processing-order layout."""
    fields = {}
    for d in "ijk":
        inp = nbr[d]
        fields[f"n_{d}"] = (inp["n"], "eqfirst")
        fields[f"mag_{d}"] = (inp["mag"], "plain")
        fields[f"mask_{d}"] = (jnp.asarray(inp["mask"]).astype(dtype),
                               "plain")
        if cfg.get("viscous", False):
            fields[f"dist_{d}"] = (inp["dist"], "plain")
    fields["valid"] = (jnp.asarray(valid).astype(dtype), "plain")
    packed, offs = _pack(fields, dtype)
    P, Cs, J2, K2 = packed.shape
    q = plane_chunk(P, stream_channels(phys, cfg), K2 // shard_count(cfg),
                    J2, dtype,
                    block_matrix=bool(cfg.get("block_matrix", False)))
    if q == 0:
        if cfg.get("pallas_interpret"):
            q = 1                # interpreter has no VMEM limits
        else:
            return None, None    # plane too large — scan path only
    return _arrange(jnp.swapaxes(packed, 2, 3), side, q), offs


def pack_invariant_sweep(phys, cfg, slab, b_skew, inv_flow_skew,
                         inv_turb_skew, dtype, side, q):
    """Iteration-invariant sweep channels, packed + arranged ONCE per
    relaxation (implicit.prepare_group_sweep) and reused by all
    2*matrixSweeps kernel calls.

    The state slab (prim + mu/mut/f1) is stored at the NEIGHBOR plane —
    P-shifted at pack time — so the kernel derives all three directions'
    neighbor states from ONE stream via the same in-plane shifts the du
    carry uses, instead of streaming three sheared copies.  Returns
    (packed, offs, nbr_sub) where nbr_sub maps slab channel names to
    (offset, count) WITHIN the "nbr" field."""
    arr, names, counts = slab
    blk = bool(cfg.get("block_matrix", False))
    # the scalar solver never consumes vgrad (offdiagonal pops it); the
    # block solver's TSL Jacobian does
    if "vgrad" in names and not blk:
        assert names[-1] == "vgrad"
        arr = arr[:sum(counts[:-1])]
        names, counts = names[:-1], counts[:-1]
    if side == "lower":      # row t carries the slab at plane t-1
        arr = jnp.concatenate([arr[:, :1], arr[:, :-1]], axis=1)
    else:                    # row t carries the slab at plane t+1
        arr = jnp.concatenate([arr[:, 1:], arr[:, -1:]], axis=1)
    fields = {"nbr": (arr, "eqfirst"), "b": (b_skew, "eqfirst")}
    if blk:
        # (P, J2, K2, N, N) block inverses -> N*N leading channels
        fields["inv_f"] = (_blk_to_channels(inv_flow_skew), "eqfirst")
        if inv_turb_skew is not None:
            fields["inv_t"] = (_blk_to_channels(inv_turb_skew), "eqfirst")
    else:
        fields["inv_f"] = (inv_flow_skew, "plain")
        if inv_turb_skew is not None:
            fields["inv_t"] = (inv_turb_skew, "plain")
    packed, offs = _pack(fields, dtype)
    nbr_sub, pos = {}, 0
    for nm, c in zip(names, counts):
        nbr_sub[nm] = (pos, c)
        pos += c
    return _arrange(jnp.swapaxes(packed, 2, 3), side, q), offs, nbr_sub


def _blk_to_channels(mat_skew):
    """(P, J2, K2, N, M) skewed block matrices -> (N*M, P, J2, K2)
    row-major channels (the kernel's diag_mult_channels layout)."""
    P, J2, K2, N, M = mat_skew.shape
    return jnp.moveaxis(mat_skew.reshape(P, J2, K2, N * M), -1, 0)


def pack_sweep_step(du_skew, extra_term, dtype):
    """Per-sweep channels (current update + lagged opposite-side term) in
    RAW (P, C, J2, K2) layout; sweep() arranges them."""
    fields = {"du0": (du_skew, "eqfirst")}
    if extra_term is not None:
        fields["extra"] = (extra_term, "eqfirst")
    return _pack(fields, dtype)


def _get(chunk, offs, name, squeeze=False):
    if name not in offs:
        return None
    o, k = offs[name]
    v = chunk[o:o + k]
    return v[0] if squeeze else v


def _shift(plane, d, up):
    """in-plane neighbor shift (implicit.py _plane_shift semantics; roll
    implemented as concatenate for Mosaic).  Planes are transposed to
    (neq, K2, J2) inside the kernel so the long J2 axis rides the 128-lane
    dimension: j-shifts act on axis 2, k-shifts on axis 1."""
    if d == "i":
        return plane
    ax = 2 if d == "j" else 1
    if up:
        lo = jax.lax.slice_in_dim(plane, 1, plane.shape[ax], axis=ax)
        hi = jax.lax.slice_in_dim(plane, 0, 1, axis=ax)
    else:
        lo = jax.lax.slice_in_dim(plane, plane.shape[ax] - 1, plane.shape[ax],
                                  axis=ax)
        hi = jax.lax.slice_in_dim(plane, 0, plane.shape[ax] - 1, axis=ax)
    return jnp.concatenate([lo, hi], axis=ax)


def sweep(phys, cfg, packed_s, offs_s, packed_i, offs_i, nbr_sub,
          packed_w, offs_w, carry0, q, forward: bool, with_extra: bool):
    """Run one whole LU-SGS sweep as a single pallas_call.

    packed_s: (q-padded P, Cs, K2, J2) static geometry channels and
    packed_i: (q-padded P, Ci, K2, J2) iteration-invariant channels
    (neighbor-plane state slab, rhs, diagonal), both already in
    processing order (prepared once per relaxation); packed_w:
    (P, Cw, J2, K2) RAW per-sweep channels (du0 [, extra]); carry0: the
    boundary plane (neq, J2, K2).  Returns the updated planes
    (P-1, neq, J2, K2) in PROCESSING order (forward: planes 1..P-1;
    backward: planes P-2..0).  The grid walks q-plane blocks with an
    unrolled in-kernel recurrence, amortizing the per-step pipeline
    overhead of the tiny planes.  The three directions' neighbor states
    come from in-plane shifts of the ONE streamed slab (the du-carry
    shifts), not three separate streams."""
    from . import implicit as imp

    P, Cw, J2, K2 = packed_w.shape
    Cs = packed_s.shape[1]
    Ci = packed_i.shape[1]
    neq = phys.neq
    dtype = packed_w.dtype
    side = "lower" if forward else "upper"
    # transpose so the long plane axis is the TPU lane dimension, then
    # processing order + q padding (static/invariant come pre-arranged)
    packed_w = _arrange(jnp.swapaxes(packed_w, 2, 3), side, q)
    carry0 = jnp.swapaxes(carry0, 1, 2)       # (neq, K2, J2)
    Pq = packed_w.shape[0]
    assert packed_s.shape[0] == Pq == packed_i.shape[0], (
        packed_s.shape, packed_i.shape, packed_w.shape)

    def body(chunk_s, chunk_i, chunk_w, prev):
        def _get(name, squeeze=False):
            if name in offs_w:
                o, k = offs_w[name]
                v = chunk_w[o:o + k]
            elif name in offs_i:
                o, k = offs_i[name]
                v = chunk_i[o:o + k]
            elif name in offs_s:
                o, k = offs_s[name]
                v = chunk_s[o:o + k]
            else:
                return None
            return v[0] if squeeze else v
        slab = _get("nbr")
        oq, kq = nbr_sub["q_nb"]
        blk = bool(cfg.get("block_matrix", False))
        acc = 0.0
        for d in "ijk":
            du_nb = _shift(prev, d, up=not forward)
            sh = _shift(slab, d, up=not forward)
            kw = {}
            if cfg.get("viscous", False):
                kw["dist"] = _get(f"dist_{d}", True)
                for key in ("mu", "mut", "f1"):
                    kw[key] = (sh[nbr_sub[key][0]] if key in nbr_sub
                               else None)
                if blk and "vgrad" in nbr_sub:
                    ov, kv = nbr_sub["vgrad"]
                    kw["vgrad"] = sh[ov:ov + kv].reshape(
                        (3, 3) + sh.shape[1:])
            contrib = imp.offdiagonal_channels(
                phys, cfg, sh[oq:oq + kq], du_nb, _get(f"n_{d}"),
                _get(f"mag_{d}", True), forward, **kw)
            mask = _get(f"mask_{d}", True) > 0.5
            acc = acc + jnp.where(mask[None], contrib, 0.0)

        def dmul(x):
            if blk:
                return imp.diag_mult_channels(phys, _get("inv_f"),
                                              _get("inv_t"), x)
            return imp.diag_mult(phys, _get("inv_f", True),
                                 _get("inv_t", True), x)

        if forward:
            rhs = _get("b") + acc
            if with_extra:
                rhs = rhs - _get("extra")
            xnew = dmul(rhs)
        else:
            if with_extra:
                xnew = dmul(_get("b") + _get("extra") - acc)
            else:
                xnew = _get("du0") - dmul(acc)
        vt = _get("valid", True) > 0.5
        return jnp.where(vt[None], xnew, _get("du0"))

    def kernel(static_ref, inv_ref, step_ref, carry0_ref, out_ref, carry):
        p = pl.program_id(0)
        prev = jnp.where(p == 0, carry0_ref[...], carry[...])
        for t in range(q):
            prev = body(static_ref[t], inv_ref[t], step_ref[t], prev)
            out_ref[t] = prev
        carry[...] = prev

    blk = lambda p: (p, 0, 0, 0)

    def invoke(s_, i_, w_, c0_):
        # BlockSpec shapes from the OPERANDS so the same call body works
        # per-device inside shard_map (local K2 = stacked K2 / n_shards)
        K2l = w_.shape[2]
        return pl.pallas_call(
            kernel,
            grid=(Pq // q,),
            in_specs=[
                pl.BlockSpec((q, Cs, K2l, J2), blk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q, Ci, K2l, J2), blk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q, Cw, K2l, J2), blk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((neq, K2l, J2), lambda p: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((q, neq, K2l, J2), blk,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Pq, neq, K2l, J2), dtype),
            scratch_shapes=[pltpu.VMEM((neq, K2l, J2), dtype)],
            interpret=bool(cfg.get("pallas_interpret", False)),
        )(s_, i_, w_, c0_)

    mesh = cfg.get("sweep_shard_mesh")
    if mesh is not None:
        # shard_map island: each device sweeps ITS whole blocks of the
        # stacked-K2 axis (driver.enable_sharding guarantees shard
        # boundaries land on block k-boundaries, where the in-plane
        # k-shift contributions are already masked out) — the one way a
        # pallas_call partitions across a mesh (VERDICT r4 item 5)
        from jax.sharding import PartitionSpec
        try:
            from jax import shard_map as _smap
        except ImportError:            # older jax
            from jax.experimental.shard_map import shard_map as _smap
        ax = tuple(mesh.axis_names)
        sp4 = PartitionSpec(None, None, ax, None)
        sp3 = PartitionSpec(None, ax, None)
        invoke = _smap(invoke, mesh=mesh, in_specs=(sp4, sp4, sp4, sp3),
                       out_specs=sp4, check_vma=False)
    out = invoke(packed_s, packed_i, packed_w, carry0)
    return jnp.swapaxes(out[:P - 1], 2, 3)


def use_pallas(cfg, dtype, phys=None) -> bool:
    """Pallas sweeps run for both the scalar (lusgs) and block-matrix
    (blusgs) solvers, any species count, in float32 on the TPU backend.
    thermallyPerfect is excluded: its temperature inversion is a Ridder
    while_loop per point (models.py:263-306), unprofitable in-kernel.
    ``cfg["pallas_interpret"]`` forces the kernel path in interpreter
    mode (CPU parity tests)."""
    if cfg.get("no_pallas"):
        return False
    if cfg.get("inv_flux_jac", "rusanov") != "rusanov":
        # the Roe off-diagonal needs the diagonal cell's state, which the
        # packed sweep stream does not carry — scan path only
        return False
    if phys is not None and phys.thermo_model == "thermallyPerfect":
        return False
    if cfg.get("pallas_interpret"):
        return True        # interpreter runs any dtype (CPU parity tests)
    if dtype != jnp.float32:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
