"""Plot3D solution output: cell-center grids, .fun function files, .p3d
ParaView meta files (reference: src/output.cpp:55-1005).

All binary files are raw little-endian (no Fortran markers), dimensional
values, i-fastest ordering, matching the reference writers so ParaView
workflows used with the reference work unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _write_block_dims(f, dims, num_vars=0):
    f.write(np.int32(len(dims)).tobytes())
    for d in dims:
        rec = list(d[:3]) + ([num_vars] if num_vars > 0 else [])
        f.write(np.asarray(rec, dtype="<i4").tobytes())


def write_cell_center(path, centers, l_ref):
    """centers: list of (ni, nj, nk, 3) cell-center arrays (nondim)."""
    with open(path, "wb") as f:
        _write_block_dims(f, [c.shape[:3] for c in centers])
        for c in centers:
            for n in range(3):
                f.write(np.ascontiguousarray(
                    (c[..., n] * l_ref).transpose(2, 1, 0),
                    dtype="<f8").tobytes())


def variable_field(name, prim, phys, deck, aux=None):
    """dimensional output field for one variable from nondim primitives
    (reference: output.cpp:209-439)."""
    a, r, t_ref, l_ref = (deck.a_ref, deck.r_ref, deck.t_ref, deck.l_ref)
    ns = phys.ns
    rho = prim[:ns].sum(axis=0)
    mf = prim[:ns] / rho

    def temperature():
        return phys.temperature(prim[phys.ie], prim[:ns])

    if name == "density":
        return rho * r
    if name == "vel_x":
        return prim[phys.mx] * a
    if name == "vel_y":
        return prim[phys.my] * a
    if name == "vel_z":
        return prim[phys.mz] * a
    if name == "pressure":
        return prim[phys.ie] * r * a * a
    if name == "temperature":
        return temperature() * t_ref
    if name == "mach":
        vel = prim[phys.mx:phys.mx + 3]
        vmag = np.sqrt((vel * vel).sum(axis=0))
        return vmag / np.asarray(phys.sos(prim[phys.ie], prim[:ns]))
    if name == "sos":
        return np.asarray(phys.sos(prim[phys.ie], prim[:ns])) * a
    if name == "viscosity":
        mu = np.asarray(phys.viscosity(temperature(), mf))
        return mu * phys.mu_mix_ref
    if name == "tke":
        return prim[phys.it] * a * a
    if name == "sdr":
        return prim[phys.it + 1] * a * a * r / phys.mu_mix_ref
    if name == "wallDistance" and aux is not None and "wall_dist" in aux:
        return aux["wall_dist"] * l_ref
    if name == "turbulentViscosity" and aux is not None and "mut" in aux:
        return aux["mut"] * phys.mu_mix_ref
    if name == "viscosityRatio" and aux is not None and "mut" in aux:
        mu = np.asarray(phys.viscosity(temperature(), mf))
        return aux["mut"] / mu
    if name.startswith("mf_"):
        sp = name[3:]
        idx = deck.species_index(sp)
        return np.asarray(mf[idx])
    if name == "rank":
        return np.zeros_like(np.asarray(rho))
    if name == "globalPosition":
        return np.zeros_like(np.asarray(rho))
    if aux is not None and name in aux:
        return aux[name]
    # gradient components etc. not yet exported -> zeros
    return np.zeros_like(np.asarray(rho))


def write_fun_file(path, var_names, blocks_prim, phys, deck, aux_blocks=None):
    """blocks_prim: list of (neq, ni, nj, nk) nondim interior primitives."""
    var_names = list(var_names)
    with open(path, "wb") as f:
        _write_block_dims(f, [b.shape[1:] for b in blocks_prim],
                          num_vars=len(var_names))
        for bi, prim in enumerate(blocks_prim):
            aux = aux_blocks[bi] if aux_blocks else None
            for name in var_names:
                field = np.asarray(variable_field(name, np.asarray(prim),
                                                  phys, deck, aux))
                f.write(np.ascontiguousarray(
                    field.transpose(2, 1, 0), dtype="<f8").tobytes())


def write_meta(path, sim_root, grid_name, iteration, var_names,
               time_accurate=False, dt=0.0, output_frequency=1,
               is_center=True):
    """ParaView .p3d meta file (reference: output.cpp:903-1005)."""
    fend = "_center" if is_center else ""
    entry = {
        "time": iteration,
        "xyz": f"{grid_name}{fend}.xyz",
        "function": f"{os.path.basename(sim_root)}_{iteration}{fend}.fun",
    }
    meta = {
        "auto-detect-format": True,
        "format": "binary",
        "language": "C",
        "filenames": [entry],
        "function-names": list(var_names),
    }
    with open(path, "w") as f:
        json.dump(meta, f, indent=1)
