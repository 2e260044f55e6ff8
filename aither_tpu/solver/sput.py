"""Sharding-safe padded-array updates.

XLA's SPMD partitioner (exercised via either the Shardy or the GSPMD
pipeline; observed on the jax 0.9 CPU backend with a forced multi-device
host platform) miscompiles certain chains of dynamic-update-slice ops when
an update plane lies along a sharded axis: the update is applied at the
local offset of EVERY shard instead of being masked to the owning shard,
corrupting the first row of the non-owning shards.  Minimal reproduction
(2 devices, x sharded on dim 1):

    x = x.at[:, 2:34, 1, 2:10].set(2.0 * x[:, 2:34, 2, 2:10])
    x = x.at[:, 0, 2:10, 2:10].set(c)        # plane 0 also lands at i=18

``safe_updates()`` switches every padded-state write routed through
``set_region`` from ``x.at[idx].set(v)`` to an equivalent ``lax.pad`` +
``jnp.where`` with a constant mask, which partitions correctly.  The DUS
form stays the default for single-device runs (less memory traffic, fuses
better); the sharded runner (aither_tpu/parallel/shard.py) traces its jit
under the safe mode.  Both forms are semantically identical — covered by
tests/test_shard.py equivalence assertions.
"""

from __future__ import annotations

import contextlib

import numpy as np

import jax.numpy as jnp
from jax import lax

_SAFE = False


def safe_updates_enabled() -> bool:
    return _SAFE


@contextlib.contextmanager
def safe_updates(on: bool = True):
    """Trace-time switch: inside this context, set_region uses the
    pad+select formulation (wrap the first CALL of a fresh jit — tracing
    happens then, not at jax.jit construction)."""
    global _SAFE
    old = _SAFE
    _SAFE = on
    try:
        yield
    finally:
        _SAFE = old


def _normalize(idx, shape):
    """Index tuple -> per-dim (lo, hi, is_scalar), extended to full rank."""
    out = []
    for d, ix in enumerate(idx):
        if isinstance(ix, slice):
            lo, hi, step = ix.indices(shape[d])
            if step != 1:
                raise ValueError("set_region requires unit-stride slices")
            out.append((lo, hi, False))
        else:
            ii = int(ix)
            if ii < 0:
                ii += shape[d]
            out.append((ii, ii + 1, True))
    while len(out) < len(shape):
        d = len(out)
        out.append((0, shape[d], False))
    return out


def _select_region(arr, idx, value):
    """``arr.at[idx].set(value)`` as a fusable select: the value is
    lax.pad-ded to full shape and merged under a mask built as the AND of
    per-dimension 1-D indicator constants (an outer product — no full-
    shape mask constant is ever materialized)."""
    if not isinstance(idx, tuple):
        idx = (idx,)
    norm = _normalize(idx, arr.shape)
    region = tuple(hi - lo for lo, hi, _ in norm)
    val = jnp.asarray(value, arr.dtype)
    for d, (lo, hi, is_sc) in enumerate(norm):
        if is_sc and val.ndim < len(norm):
            val = jnp.expand_dims(val, d)
    val = jnp.broadcast_to(val, region)
    pads = [(lo, arr.shape[d] - hi, 0) for d, (lo, hi, _) in enumerate(norm)]
    full = lax.pad(val, jnp.zeros((), arr.dtype), pads)
    mask = None
    for d, (lo, hi, _) in enumerate(norm):
        if lo == 0 and hi == arr.shape[d]:
            continue
        m1 = np.zeros(arr.shape[d], bool)
        m1[lo:hi] = True
        shape = [1] * len(norm)
        shape[d] = arr.shape[d]
        m = jnp.asarray(m1.reshape(shape))
        mask = m if mask is None else mask & m
    if mask is None:
        return full
    return jnp.where(mask, full, arr)


def merge_regions(arr, updates):
    """Apply many region writes as ONE fused elementwise pass.

    ``updates``: list of (idx, value) with static scalar/slice indices;
    later writes win on overlap (sequential .at[].set semantics).  A
    chain of ``arr.at[idx].set(v)`` ops whose values read ``arr`` forces
    XLA to materialize a full copy per write (the pending read pins the
    old buffer); ghost-cell assignment issues dozens of such tiny writes
    per block, which dominated apply_all_bcs on the 1.13M-cell case
    (13 ms of a 47 ms iteration).  Select chains fuse — the whole merge
    compiles to a single pass over the array — and the constant-mask
    formulation is inherently safe under SPMD sharding (same form as
    safe_updates)."""
    for idx, value in updates:
        arr = _select_region(arr, idx, value)
    return arr


def set_region(arr, idx, value, add: bool = False):
    """``arr.at[idx].set(value)`` (or ``.add``) with static scalar/slice
    indices, in a form safe under SPMD sharding when safe mode is on."""
    if not isinstance(idx, tuple):
        idx = (idx,)
    if not _SAFE:
        return arr.at[idx].add(value) if add else arr.at[idx].set(value)
    norm = _normalize(idx, arr.shape)
    region = tuple(hi - lo for lo, hi, _ in norm)
    val = jnp.asarray(value, arr.dtype)
    # callers pass value shaped like arr[idx] (scalar dims dropped);
    # reinsert them, then broadcast to the exact region shape
    for d, (lo, hi, is_sc) in enumerate(norm):
        if is_sc and val.ndim < len(norm):
            val = jnp.expand_dims(val, d)
    val = jnp.broadcast_to(val, region)
    pads = [(lo, arr.shape[d] - hi, 0) for d, (lo, hi, _) in enumerate(norm)]
    full = lax.pad(val, jnp.zeros((), arr.dtype), pads)
    if add:
        return arr + full
    # mask broadcasts: size-1 on dims the region fully covers
    mshape = tuple(1 if (lo == 0 and hi == arr.shape[d]) else arr.shape[d]
                   for d, (lo, hi, _) in enumerate(norm))
    mask = np.zeros(mshape, bool)
    msl = tuple(slice(None) if m == 1 else slice(lo, hi)
                for m, (lo, hi, _) in zip(mshape, norm))
    mask[msl] = True
    return jnp.where(jnp.asarray(mask), full, arr)
