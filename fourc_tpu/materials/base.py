"""Material base classes + registry."""

from __future__ import annotations

import jax
import jax.numpy as jnp

MATERIAL_REGISTRY: dict[str, type] = {}


def register_material(name):
    def deco(cls):
        MATERIAL_REGISTRY[name.lower()] = cls
        cls.deck_name = name.lower()
        return cls

    return deco


def make_material(spec: dict):
    """Create a material from a deck spec: {"type": name, **params}.

    Analog of Mat::factory dispatch on input material id
    (ref: 4C_mat_material_factory.cpp:188).
    """
    spec = {k.lower(): v for k, v in spec.items()}
    # YAML 1.1 quirk: "1e-3" (no dot) parses as a string — coerce numerics
    for k, v in spec.items():
        if isinstance(v, str):
            try:
                spec[k] = float(v)
            except ValueError:
                pass
    typ = str(spec.pop("type")).lower()
    try:
        cls = MATERIAL_REGISTRY[typ]
    except KeyError:
        raise KeyError(
            f"unknown material type {typ!r}; known: {sorted(MATERIAL_REGISTRY)}"
        ) from None
    return cls.from_deck(spec)


class Material:
    """Base for all materials. Parameters are plain python floats, so they
    are folded into the jitted kernels as compile-time constants."""

    history_shape: tuple = ()  # per-GP internal-variable state, () = none

    @classmethod
    def from_deck(cls, params: dict):
        return cls(**params)

    def init_history(self, ngp_total: int):
        import numpy as np

        if not self.history_shape:
            return None
        return jnp.zeros((ngp_total,) + tuple(self.history_shape))


class HyperelasticMaterial(Material):
    """Finite-strain material defined by a strain-energy density psi(C).

    Subclasses implement ``psi(C)`` (right Cauchy-Green (3,3) -> scalar).
    PK2 stress defaults to 2*dpsi/dC via AD (ref interface:
    4C_mat_so3_material.hpp:45 evaluate(defgrd, glstrain) -> stress, cmat;
    here cmat is implicit in jvp through pk2).

    Batch convention (the TPU-fast path): ``pk2``/``stress_small`` accept
    C/eps of shape (3, 3) OR element-last batches (3, 3, M).  Hot materials
    override them with leading-index closed forms (ops/common.py *l helpers)
    that handle both shapes identically; this AD default vmaps over the
    last axis.
    """

    kind = "solid"

    def psi(self, C):
        raise NotImplementedError

    def pk2(self, C):
        if C.ndim == 2:
            return 2.0 * jax.grad(self.psi)(C)
        return jax.vmap(lambda c: 2.0 * jax.grad(self.psi)(c),
                        in_axes=-1, out_axes=-1)(C)

    def pk2_from_E(self, E):
        """PK2 from the Green-Lagrange strain (the reference's So3Material
        input, ref: 4C_mat_so3_material.hpp:45 evaluate(defgrd, glstrain)).

        E is computed WITHOUT forming C - I, so stable overrides of this
        method avoid the f32 cancellation that plagues C-based forms at
        small strains (~1e-3 relative error at 1% strain in f32).  Default:
        evaluate the C-based law at C = 2E + I.
        """
        eye = jnp.eye(3, dtype=E.dtype).reshape((3, 3) + (1,) * (E.ndim - 2))
        return self.pk2(2.0 * E + eye)

    def cauchy(self, F):
        """Cauchy stress from deformation gradient (for output)."""
        C = F.T @ F
        S = self.pk2(C)
        J = jnp.linalg.det(F)
        return (F @ S @ F.T) / J

    # KINEM linear path: evaluate the same law at C = I + 2 eps (exact for
    # SVK; consistent small-strain limit otherwise) — mirrors the
    # reference's use of So3Material for both kinematics.
    def stress_small(self, eps):
        eye = jnp.eye(3, dtype=eps.dtype).reshape((3, 3) + (1,) * (eps.ndim - 2))
        return self.pk2(2.0 * eps + eye)

    def psi_small(self, eps):
        return self.psi(2.0 * eps + jnp.eye(3))


class SmallStrainMaterial(Material):
    """Small-strain material: sigma(eps), eps = sym grad u."""

    kind = "solid_small"

    def psi_small(self, eps):
        raise NotImplementedError

    def stress_small(self, eps):
        if eps.ndim == 2:
            return jax.grad(self.psi_small)(eps)
        return jax.vmap(lambda e: jax.grad(self.psi_small)(e),
                        in_axes=-1, out_axes=-1)(eps)


class BeamSection(Material):
    """Beam cross-section + elastic constants.

    Counterpart of the reference's beam constitutive input (ref:
    src/mat/4C_mat_beam_elasthyper.* — MAT_BeamReissnerElastHyper with
    YOUNG/SHEARMOD/DENS/CROSSAREA/SHEARCORR/MOMIN...).
    """

    kind = "beam"

    def __init__(self, youngs, nue=0.3, density=0.0, area=1.0, iyy=1.0,
                 izz=1.0, torsion_j=None, shear_area=0.0,
                 formulation="linear"):
        # formulation: "linear" (exact-stiffness Timoshenko small rotations)
        # or "reissner" (geometrically exact Simo-Reissner, ref beam3r)
        self.formulation = str(formulation)
        self.youngs = float(youngs)
        self.nue = float(nue)
        self.density = float(density)
        self.area = float(area)
        self.iyy = float(iyy)
        self.izz = float(izz)
        self.torsion_j = float(torsion_j if torsion_j is not None else iyy + izz)
        self.shear_area = float(shear_area)  # 0 = Euler-Bernoulli

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


register_material("beam_elastic")(BeamSection)


class HistoryMaterial(Material):
    """Finite/small-strain material with per-GP internal variables.

    ``evaluate(C_or_eps, h) -> (stress, h_new)``; the time integrator
    threads the history pytree through the step (the analog of the
    reference's element history pack/unpack,
    ref: solid_3D_ele/4C_solid_3D_ele_calc.cpp:100-108).
    """

    kind = "solid_history"

    def evaluate(self, C, h):
        raise NotImplementedError
