"""Physics model bundle: static configuration + pure JAX functions.

TPU-first re-design of the reference's virtual-dispatch model classes
(reference: include/physicsModels.hpp, eos.hpp, thermodynamic.hpp,
transport.hpp): model choice is *static* (baked into jit via closure), and
all pointwise closures are vectorized functions over equation-major arrays.

Array convention throughout the solver: ``prim`` / ``cons`` have shape
``(neq, ...)`` with equations ordered ``[rho_s..., u, v, w, p, turb...]``
(primitive) / ``[rho_s..., rho*u, rho*v, rho*w, rho*E, rho*q...]``
(conserved), matching varArray's index map (reference: varArray.hpp:44-103).
Everything is nondimensional: velocity/aRef, rho/rhoRef, p/(rhoRef*aRef^2),
T/TRef (reference: main.cpp:109-116, inputStates.cpp:464-473).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from . import chemistry as _chem
from .fluid import Fluid


def _mole_fractions_py(molar_mass, mf):
    moles = [m / mm for m, mm in zip(mf, molar_mass)]
    tot = sum(moles)
    return [m / tot for m in moles]


def _wilke_visc_py(mu, molar_mass, x):
    """host-side Wilke mix (reference: transport.cpp:72-93)"""
    mix = 0.0
    ns = len(mu)
    for i in range(ns):
        denom = 0.0
        for j in range(ns):
            denom += x[j] / math.sqrt(1.0 + molar_mass[i] / molar_mass[j]) * (
                1.0 + math.sqrt(mu[i] / mu[j])
                * (molar_mass[j] / molar_mass[i]) ** 0.25) ** 2
        mix += x[i] * mu[i] / denom
    return 4.0 / math.sqrt(2.0) * mix


@dataclasses.dataclass(frozen=True)
class Physics:
    """Static physics configuration (hashable; safe inside jit closures).

    All per-species values are nondimensional.
    """

    ns: int
    neq: int
    # thermodynamics
    thermo_model: str                 # 'caloricallyPerfect' | 'thermallyPerfect'
    n: tuple                          # DoF/2 per species
    R: tuple                          # nondim gas constant per species
    hf: tuple                         # nondim heat of formation per species
    s0: tuple                         # nondim ref entropy per species
    vib: tuple                        # tuple of tuples: nondim vib temps
    # transport (sutherland): dimensional coefficients; nondim viscosity is
    # mu(T*tRef)/muMixRef (reference: transport.cpp:29-66,103-117)
    visc_c1: tuple = ()
    visc_s: tuple = ()
    cond_c1: tuple = ()
    cond_s: tuple = ()
    molar_mass: tuple = ()            # dimensional molar masses (for Wilke)
    t_ref: float = 1.0
    mu_mix_ref: float = 1.0           # Wilke mix viscosity at tRef
    k_nondim: float = 1.0             # aRef^2 * muMixRef / tRef
    nondim_scaling: float = 1.0       # muMixRef / (rhoRef aRef lRef)
    # turbulence
    turb_model: str = "none"
    # diffusion
    diffusion_model: str = "none"
    schmidt: float = 0.9
    turb_schmidt: float = 0.9
    # chemistry
    chem_model: str = "frozen"
    freezing_temperature: float = 0.0
    chemistry: Any = None             # Chemistry config (reacting) or None

    # ---- index helpers ------------------------------------------------------
    @property
    def mx(self):
        return self.ns

    @property
    def my(self):
        return self.ns + 1

    @property
    def mz(self):
        return self.ns + 2

    @property
    def ie(self):
        return self.ns + 3

    @property
    def it(self):
        return self.ns + 4

    @property
    def nturb(self):
        return self.neq - self.ns - 4

    @property
    def is_rans(self):
        return self.nturb > 0

    # ---- construction --------------------------------------------------------
    @staticmethod
    def from_deck(deck) -> "Physics":
        t_ref, r_ref, l_ref, a_ref = (deck.t_ref, deck.r_ref, deck.l_ref,
                                      deck.a_ref)
        fluids = [f.nondimensionalize(t_ref, r_ref, a_ref, l_ref)
                  for f in deck._fluid_props]
        # reference entropy of cpg model (thermodynamic.cpp:27-57)
        s0 = []
        for fl in fluids:
            v = fl.ref_s - fl.gas_constant * (fl.n + 1.0) * math.log(fl.ref_t)
            if deck["thermodynamicModel"] == "thermallyPerfect":
                # NOTE: the reference subtracts the raw vibrational sum,
                # NOT scaled by R (thermodynamic.cpp:50-57) — replicated
                # for Gibbs/chemistry parity
                for tv in fl.vib_temps:
                    v -= (tv / ((math.exp(tv / fl.ref_t) - 1.0) * fl.ref_t)
                          - math.log(1.0 - math.exp(-tv / fl.ref_t)))
            s0.append(v)
        # dimensional species viscosities at tRef, Wilke-mixed over the
        # reference mixture (reference: transport.cpp:29-66)
        raw = deck._fluid_props
        mu_spec_ref = [f.visc_c1 * t_ref ** 1.5 / (t_ref + f.visc_s)
                       for f in raw]
        if len(raw) == 1:
            mu_mix_ref = mu_spec_ref[0]
        else:
            x = _mole_fractions_py([f.molar_mass for f in raw],
                                   deck.mixture_ref)
            mu_mix_ref = _wilke_visc_py(mu_spec_ref,
                                        [f.molar_mass for f in raw], x)
        return Physics(
            ns=deck.num_species,
            neq=deck.num_equations,
            thermo_model=deck["thermodynamicModel"],
            n=tuple(f.n for f in fluids),
            R=tuple(f.gas_constant for f in fluids),
            hf=tuple(f.heat_of_formation for f in fluids),
            s0=tuple(s0),
            vib=tuple(f.vib_temps for f in fluids),
            visc_c1=tuple(f.visc_c1 for f in raw),
            visc_s=tuple(f.visc_s for f in raw),
            cond_c1=tuple(f.cond_c1 for f in raw),
            cond_s=tuple(f.cond_s for f in raw),
            molar_mass=tuple(f.molar_mass for f in raw),
            t_ref=t_ref,
            mu_mix_ref=mu_mix_ref,
            k_nondim=a_ref * a_ref * mu_mix_ref / t_ref,
            nondim_scaling=mu_mix_ref / (r_ref * a_ref * l_ref),
            turb_model=deck["turbulenceModel"],
            diffusion_model=deck["diffusionModel"],
            schmidt=deck["schmidtNumber"],
            chem_model=deck["chemistryModel"],
            freezing_temperature=deck["freezingTemperature"],
            chemistry=_chem.from_deck(deck, search_dirs=(os.getcwd(),)),
        )

    # ---- per-species constant arrays (numpy; become jit constants) ----------
    # NOTE: per-species math below unrolls over species with PYTHON FLOAT
    # constants (stack/sum of scalar-scaled slices) instead of broadcasting
    # an (ns,1,..) constant array: array constants captured in a Pallas
    # kernel body are rejected by Mosaic ("pass them as inputs"), while
    # scalar literals inline fine — and XLA constant-folds both forms
    # identically outside kernels.
    def _sum_species(self, coeffs, arr):
        """sum_i coeffs[i] * arr[i] with scalar-literal coefficients."""
        out = 0.0
        for i in range(self.ns):
            out = out + float(coeffs[i]) * arr[i]
        return out

    def _stack_species(self, fn):
        """(ns, ...) array from a per-species scalar-literal closure."""
        return jnp.stack([fn(i) for i in range(self.ns)])

    # ---- thermodynamics ------------------------------------------------------
    def species_cv(self, t):
        """cv per species at temperature t: (ns, *t.shape)."""
        ones = jnp.ones_like(t)
        if self.thermo_model == "thermallyPerfect":
            vib = self._vib_cpcv(t)
            return self._stack_species(
                lambda i: self.R[i] * self.n[i] * ones + self.R[i] * vib[i])
        return self._stack_species(lambda i: self.R[i] * self.n[i] * ones)

    def species_cp(self, t):
        ones = jnp.ones_like(t)
        if self.thermo_model == "thermallyPerfect":
            vib = self._vib_cpcv(t)
            return self._stack_species(
                lambda i: self.R[i] * (self.n[i] + 1.0) * ones
                + self.R[i] * vib[i])
        return self._stack_species(
            lambda i: self.R[i] * (self.n[i] + 1.0) * ones)

    def _vib_cpcv(self, t):
        """sum over vib modes of (tv/sinh(tv))^2, tv = theta/(2T)
        (reference: thermodynamic.hpp:129-140)."""
        out = []
        for ss in range(self.ns):
            acc = jnp.zeros_like(t)
            for theta in self.vib[ss]:
                tv = theta / (2.0 * t)
                acc = acc + (tv / jnp.sinh(tv)) ** 2
            out.append(acc)
        return jnp.stack(out)

    def _vib_energy(self, t):
        """sum over vib modes of theta/(exp(theta/T)-1)
        (reference: thermodynamic.hpp:142-148)."""
        out = []
        for ss in range(self.ns):
            acc = jnp.zeros_like(t)
            for theta in self.vib[ss]:
                acc = acc + theta / (jnp.exp(theta / t) - 1.0)
            out.append(acc)
        return jnp.stack(out)

    def species_energy(self, t):
        """specific internal energy per species (thermodynamic.hpp:102-104,
        163-166)."""
        if self.thermo_model == "thermallyPerfect":
            # note cv here must be the cpg part only
            vib = self._vib_energy(t)
            return self._stack_species(
                lambda i: self.hf[i] + self.R[i] * self.n[i] * t
                + self.R[i] * vib[i])
        cv = self.species_cv(t)
        return self._stack_species(lambda i: self.hf[i] + cv[i] * t)

    def species_enthalpy(self, t):
        if self.thermo_model == "thermallyPerfect":
            vib = self._vib_energy(t)
            return self._stack_species(
                lambda i: self.hf[i] + self.R[i] * (self.n[i] + 1.0) * t
                + self.R[i] * vib[i])
        return self._stack_species(
            lambda i: self.hf[i] + self.R[i] * (self.n[i] + 1.0) * t)

    def mix(self, per_species, mf):
        return (per_species * mf).sum(axis=0)

    def gamma(self, t, mf):
        return (self.mix(self.species_cp(t), mf)
                / self.mix(self.species_cv(t), mf))

    def temperature_from_energy(self, e, mf):
        """Invert e(T, mf) for T (reference: thermodynamic.cpp:101-131)."""
        if self.thermo_model == "caloricallyPerfect":
            hf_mix = self._sum_species(self.hf, mf)
            cv_mix = self._sum_species(
                [r * n for r, n in zip(self.R, self.n)], mf)
            return (e - hf_mix) / cv_mix
        # thermally perfect: Ridder's method on [1e-8, 1e4] at tol 1e-8,
        # T = the final evaluation point, exactly as the reference
        # (thermodynamic.cpp:132-141, utility.hpp:130-184).  Matching the
        # reference's stopping point keeps cross-implementation state
        # trajectories pinned (the residual operator amplifies state
        # differences, so a different-but-equally-valid root would drift
        # the goldens).
        import jax

        def fres(t):
            return e - self.mix(self.species_energy(t), mf)

        lo, hi, tol = 1.0e-8, 1.0e4, 1.0e-8
        x1 = jnp.full_like(e, lo)
        x2 = jnp.full_like(e, hi)
        f1 = fres(x1)
        f2 = fres(x2)
        bracketed = jnp.sign(f1) != jnp.sign(f2)

        def body(_, carry):
            x1, f1, x2, f2, x4, done = carry
            x3 = 0.5 * (x1 + x2)
            f3 = fres(x3)
            denom = jnp.sqrt(jnp.abs(f3 * f3 - f1 * f2)) + 1.0e-300
            x4n = x3 + (x3 - x1) * (jnp.sign(f1 - f2) * f3) / denom
            f4 = fres(x4n)
            x4 = jnp.where(done, x4, x4n)
            c1 = jnp.sign(f4) != jnp.sign(f3)
            c2 = jnp.sign(f4) != jnp.sign(f1)
            nx1 = jnp.where(c1, x3, jnp.where(c2, x1, x4n))
            nf1 = jnp.where(c1, f3, jnp.where(c2, f1, f4))
            nx2 = jnp.where(c1, x4n, jnp.where(c2, x4n, x2))
            nf2 = jnp.where(c1, f4, jnp.where(c2, f4, f2))
            x1 = jnp.where(done, x1, nx1)
            f1 = jnp.where(done, f1, nf1)
            x2 = jnp.where(done, x2, nx2)
            f2 = jnp.where(done, f2, nf2)
            done = done | (jnp.abs(x2 - x1) <= tol) | (f3 == 0.0) \
                | (f4 == 0.0)
            return (x1, f1, x2, f2, x4, done)

        carry = (x1, f1, x2, f2, jnp.full_like(e, hi), ~bracketed)
        *_, x4, _done = jax.lax.fori_loop(0, 64, body, carry)
        return jnp.where(bracketed, x4, hi)

    # ---- equation of state (ideal gas) --------------------------------------
    def temperature(self, p, rho_s):
        """T = p / sum(rho_s R_s)  (reference: eos.cpp:96-105)."""
        return p / self._sum_species(self.R, rho_s)

    def pressure_rt(self, rho_s, t):
        return self._sum_species(self.R, rho_s) * t

    def density_tp(self, t, p, mf):
        return p / (self._sum_species(self.R, mf) * t)

    def sos(self, p, rho_s):
        """speed of sound = sqrt(gamma p / rho) (reference: eos.cpp:82-94)."""
        rho = rho_s.sum(axis=0)
        mf = rho_s / rho
        t = self.temperature(p, rho_s)
        return jnp.sqrt(self.gamma(t, mf) * p / rho)

    # ---- transport (sutherland + Wilke mixing) -------------------------------
    def species_viscosity(self, t):
        """nondim Sutherland viscosity per species: mu(T*tRef)/muMixRef
        (reference: transport.cpp:103-109)."""
        td = t * self.t_ref
        return self._stack_species(
            lambda i: (self.visc_c1[i] * td ** 1.5
                       / (td + self.visc_s[i])) / self.mu_mix_ref)

    def species_conductivity(self, t):
        """nondim conductivity: k(T*tRef)/(aRef^2 muMixRef / tRef)
        (reference: transport.cpp:111-117)."""
        td = t * self.t_ref
        return self._stack_species(
            lambda i: (self.cond_c1[i] * td ** 1.5
                       / (td + self.cond_s[i])) / self.k_nondim)

    def mole_fractions(self, mf):
        moles = self._stack_species(
            lambda i: mf[i] / self.molar_mass[i])
        return moles / moles.sum(axis=0)

    def viscosity(self, t, mf):
        """Wilke's mixing rule for viscosity (transport.cpp:72-93)."""
        mu = self.species_viscosity(t)
        if self.ns == 1:
            return mu[0]
        x = self.mole_fractions(mf)
        mm = self.molar_mass
        mix = jnp.zeros_like(t)
        for i in range(self.ns):
            denom = jnp.zeros_like(t)
            for j in range(self.ns):
                denom = denom + x[j] / math.sqrt(1.0 + mm[i] / mm[j]) * (
                    1.0 + jnp.sqrt(mu[i] / mu[j])
                    * (mm[j] / mm[i]) ** 0.25) ** 2
            mix = mix + x[i] * mu[i] / denom
        return 4.0 / math.sqrt(2.0) * mix

    def conductivity(self, t, mf):
        """0.5*(weighted + harmonic mole-fraction average)
        (transport.cpp:95-106)."""
        k = self.species_conductivity(t)
        if self.ns == 1:
            return k[0]
        x = self.mole_fractions(mf)
        weighted = (x * k).sum(axis=0)
        harmonic = 1.0 / (x / k).sum(axis=0)
        return 0.5 * (weighted + harmonic)

    def effective_conductivity(self, t, mf):
        return self.nondim_scaling * self.conductivity(t, mf)

    def turb_prandtl(self):
        """(reference: turbulence.hpp:70, 462, 578)"""
        return 8.0 / 9.0 if self.turb_model == "kOmegaWilcox2006" else 0.9

    def turb_min(self):
        """minimum allowed turbulence values (reference:
        turbulence.hpp:72-77)."""
        return (1.0e-20, 1.0e-20)
