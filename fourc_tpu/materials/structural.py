"""Section 'materials' for the small structural element zoo.

These carry the per-element-type parameters the reference stores in the
element definitions of truss3 / torsion3 / rigidsphere (ref: src/truss3,
src/torsion3, src/rigidsphere) — here they are regular registry materials
so decks reference them like any other MAT id, and BeamField dispatches
the element kernel on the material kind (ops/truss.py).
"""

from __future__ import annotations

from fourc_tpu.materials.base import Material, register_material


class TrussSection(Material):
    """Nonlinear (Green-strain) truss: axial stiffness EA only.

    (ref: src/truss3 MAT_LinElast1D usage — YOUNG + cross-section)
    """

    kind = "truss"

    def __init__(self, youngs, area=1.0, density=0.0):
        self.youngs = float(youngs)
        self.area = float(area)
        self.density = float(density)

    @property
    def ea(self):
        return self.youngs * self.area

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


register_material("truss")(TrussSection)


class TorsionSpring(Material):
    """3-node torsion spring: stiffness k against segment-angle change.

    bend_potential: "quadratic" (k/2 theta^2) or "cosine" (k (1-cos theta))
    (ref: src/torsion3 SPRING_QUADRATIC / SPRING_COSINE).
    """

    kind = "torsion_spring"

    def __init__(self, stiffness, bend_potential="quadratic", density=0.0):
        self.stiffness = float(stiffness)
        self.bend_potential = str(bend_potential)
        self.density = float(density)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


register_material("torsion_spring")(TorsionSpring)


class RigidSphere(Material):
    """Point mass/sphere with radius (ref: src/rigidsphere).

    Contributes lumped mass + rotational inertia; the radius drives
    Stokes drag in Brownian dynamics and the contact/binding radius in
    beam-interaction models.
    """

    kind = "rigidsphere"

    def __init__(self, radius, density=0.0):
        self.radius = float(radius)
        self.density = float(density)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


register_material("rigidsphere")(RigidSphere)


class KLShellMaterial(Material):
    """Kirchhoff-Love NURBS shell section: SVK plane stress + thickness
    (ref: src/shell_kl_nurbs — 4C_shell_kl_nurbs.* element parameters)."""

    kind = "klshell"

    def __init__(self, youngs, nue, thickness, density=0.0):
        self.youngs = float(youngs)
        self.nue = float(nue)
        self.thickness = float(thickness)
        self.density = float(density)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


register_material("kl_shell")(KLShellMaterial)
