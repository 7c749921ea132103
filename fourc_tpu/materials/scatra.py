"""Scalar-transport materials.

ref: src/mat scatra (diffusivity/reaction), scatra_reaction (coupled
multi-scalar reactions), ion / newman / electrode (electrochemistry).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from fourc_tpu.materials.base import Material, register_material


@register_material("scatra")
@dataclass
class ScatraMat(Material):
    """Linear diffusion + optional linear reaction: d phi/dt + u.grad phi
    = div(D grad phi) - reacoeff * phi.

    diffusivity may be a SCALAR or a principal-value list [d1, d2(, d3)]
    with `diff_angle` rotating the principal frame in the xy-plane —
    anisotropic conduction (ref: the scatra_ele anisotropic diffusion
    manager, src/scatra_ele/4C_scatra_ele_calc.cpp diffusion tensor; used
    e.g. for fiber-aligned cardiac conduction)."""

    kind = "scatra"
    diffusivity: object
    reacoeff: float = 0.0
    density: float = 1.0
    # storage scaling of d phi/dt — porosity for transport through porous
    # media (poroelast_scatra; ref src/scatra_ele poro variants pull this
    # from the coupled poro material)
    capacity: float = 1.0
    diff_angle: float = 0.0  # principal-frame rotation (xy-plane, rad)

    def diff(self, phi=None):
        if isinstance(self.diffusivity, (list, tuple)):
            import numpy as np

            d = [float(v) for v in self.diffusivity]
            dim = len(d)
            D = np.diag(d)
            if self.diff_angle:
                c, s = np.cos(self.diff_angle), np.sin(self.diff_angle)
                R = np.eye(dim)
                R[0, 0], R[0, 1], R[1, 0], R[1, 1] = c, -s, s, c
                D = R @ D @ R.T
            return jnp.asarray(D)
        return float(self.diffusivity)

    def reaction(self, phi):
        return self.reacoeff * phi


@register_material("matlist")
@register_material("matlist_reactions")
@dataclass
class MatListReactions(Material):
    """K-species scalar transport with coupled reaction terms.

    Counterpart of the reference's MAT_matlist_reactions holding
    MAT_scatra species + MAT_scatra_reaction entries
    (ref: src/mat/4C_mat_list_reactions.cpp,
    src/mat/4C_mat_scatra_reaction.cpp — COUPLING simple_multiplicative
    with STOICH / ROLE / REACCOEFF / DISTRFUNCT).

    species:   [{diffusivity, capacity}, ...]   (the MATIDS sub-materials)
    reactions: [{stoich: [K], reaccoeff, role: [K], distrfunct: fid|0}]

    Reaction-rate semantics (simple/power multiplicative): the rate of
    reaction r is  k_r * d_r(x) * prod_{k: role_k != 0} phi_k^{role_k}
    and it contributes  stoich_i * rate  to d phi_i / dt.  ROLE marks the
    participating scalars (exponent 1 for simple_multiplicative; the
    power-multiplicative coupling uses the role value as exponent, which
    this single formula covers).
    """

    kind = "scatra_multi"
    species: list
    reactions: list = field(default_factory=list)

    @property
    def nspec(self):
        return len(self.species)

    def diff_list(self):
        return [float(s.get("diffusivity", 0.0)) for s in self.species]

    def capacity_list(self):
        return [float(s.get("capacity", 1.0)) for s in self.species]

    def reaction_gp(self, phi, xg, functions, t=0.0):
        """R(phi, x): (..., K) -> (..., K), in the residual convention
        rhoc*phidot + R(phi) = 0, i.e. R_i = -sum_r stoich_i * rate_r."""
        K = self.nspec
        out = jnp.zeros_like(phi)
        for rx in self.reactions:
            rate = jnp.full(phi.shape[:-1], float(rx["reaccoeff"]), phi.dtype)
            fid = int(rx.get("distrfunct", 0) or 0)
            if fid:
                fn = functions.get(fid)
                rate = rate * fn(xg, t, component=0)
            for k, role in enumerate(rx.get("role", [0] * K)):
                if role:
                    p = phi[..., k]
                    rate = rate * (p if float(role) == 1.0
                                   else p ** float(role))
            for i, s in enumerate(rx.get("stoich", [0] * K)):
                if s:
                    out = out.at[..., i].add(-float(s) * rate)
        return out


@register_material("soret")
@dataclass
class SoretMat(Material):
    """Thermodiffusive scalar: Fickian diffusion + Soret thermal drift
    j = -D (grad c + S_T c grad T)  (ref: src/mat/4C_mat_soret.* used by
    the sti module)."""

    kind = "scatra"
    diffusivity: float
    soret: float = 0.0  # S_T thermal-diffusion coefficient
    reacoeff: float = 0.0
    density: float = 1.0
    capacity: float = 1.0

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return self.reacoeff * phi


@register_material("scatra_reaction")
@dataclass
class ScatraReaction(Material):
    """Nonlinear reaction term r(phi) given as a symbolic expression of
    `phi` (ref: scatra_reaction coupling REACSTART/power-law forms reduced
    to an expression here)."""

    kind = "scatra"
    diffusivity: float
    reaction_expr: str = "0"
    density: float = 1.0
    _fn: object = field(default=None, repr=False)

    def __post_init__(self):
        from fourc_tpu.core.functions import SymbolicExpression

        object.__setattr__(self, "_fn", SymbolicExpression(self.reaction_expr))

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return -self._fn(phi=phi, x=0.0, y=0.0, z=0.0, t=0.0)


@register_material("ion")
@dataclass
class IonMat(Material):
    """Ion species for electrochemistry (Nernst-Planck).

    ref: src/mat/4C_mat_ion.*: diffusivity, valence, (optional) ELIM."""

    kind = "scatra"
    diffusivity: float
    valence: float = 0.0
    density: float = 1.0

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return 0.0 * phi


@register_material("newman")
@dataclass
class NewmanMat(Material):
    """Binary concentrated electrolyte (Newman model) for the
    diffusion-conduction elch formulation.

    ref: src/mat/4C_mat_newman.* — concentration-dependent diffusivity
    D(c), ionic conductivity kappa(c), transference number t+, and
    thermodynamic factor (1 + dln f/dln c).  The c-dependent properties
    are symbolic expressions of `c` lowered to jax at deck-parse time.
    """

    kind = "elch_diffcond"
    diffusivity: object = 1.0        # float or expression of c
    conductivity: object = 1.0       # float or expression of c
    transference: float = 0.5        # cation transference number t+
    thermfac: object = 1.0           # 1 + dln f / dln c
    valence: float = 1.0
    c0: float = 1.0
    density: float = 1.0
    temperature: float = 298.0
    faraday: float = 96485.3329
    gas_constant: float = 8.314462
    _fns: dict = field(default=None, repr=False)

    @property
    def frt(self):
        return self.faraday / (self.gas_constant * self.temperature)

    def __post_init__(self):
        from fourc_tpu.core.functions import SymbolicExpression

        fns = {}
        for name in ("diffusivity", "conductivity", "thermfac"):
            v = getattr(self, name)
            if isinstance(v, str):
                fns[name] = SymbolicExpression(v)
        object.__setattr__(self, "_fns", fns)

    def _eval(self, name, c):
        fn = self._fns.get(name)
        if fn is None:
            return getattr(self, name) + 0.0 * c
        return fn(c=c, x=0.0, y=0.0, z=0.0, t=0.0)

    def diff_c(self, c):
        return self._eval("diffusivity", c)

    def kappa_c(self, c):
        return self._eval("conductivity", c)

    def thermfac_c(self, c):
        return self._eval("thermfac", c)


@register_material("electrode")
@dataclass
class ElectrodeMat(Material):
    """Intercalation electrode (solid active material).

    ref: src/mat/4C_mat_electrode.* — lithium diffusion D(c) in the solid,
    electronic conductivity sigma, saturation concentration c_max, and the
    half-cell open-circuit potential U(x) with x = c/c_max (expression of
    `x`; the reference offers polynomial/Redlich-Kister/csv forms).
    """

    kind = "elch_diffcond"
    diffusivity: object = 1.0        # float or expression of c
    conductivity: float = 1.0        # electronic sigma (constant)
    c_max: float = 1.0
    ocp: object = 0.0                # expression of x = c/c_max
    c0: float = 0.0
    density: float = 1.0
    _fns: dict = field(default=None, repr=False)

    def __post_init__(self):
        from fourc_tpu.core.functions import SymbolicExpression

        fns = {}
        if isinstance(self.diffusivity, str):
            fns["diffusivity"] = SymbolicExpression(self.diffusivity)
        if isinstance(self.ocp, str):
            fns["ocp"] = SymbolicExpression(self.ocp)
        object.__setattr__(self, "_fns", fns)

    def diff_c(self, c):
        fn = self._fns.get("diffusivity")
        if fn is None:
            return self.diffusivity + 0.0 * c
        return fn(c=c, x=0.0, y=0.0, z=0.0, t=0.0)

    def kappa_c(self, c):
        return self.conductivity + 0.0 * c

    def ocp_x(self, x):
        fn = self._fns.get("ocp")
        if fn is None:
            return self.ocp + 0.0 * x
        return fn(x=x, y=0.0, z=0.0, t=0.0)
