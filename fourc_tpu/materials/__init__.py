"""Material library.

Counterpart of the reference's ``Mat::factory`` + ``So3Material`` interface
(ref: src/mat/4C_mat_material_factory.cpp:188, 4C_mat_so3_material.hpp:45-48).
Materials are pure functions ``(C, params) -> S`` (PK2 stress from right
Cauchy-Green); consistent tangents come from jax AD instead of hand-coded
cmat — the Newton operator differentiates through the whole residual with
``jvp``, so no 6x6 material tangent is ever materialised.
"""

from fourc_tpu.materials.base import MATERIAL_REGISTRY, Material, make_material  # noqa: F401
from fourc_tpu.materials import elastic, elasthyper, small_strain, thermal, fluid, scatra, plasticity, viscoelastic, poro, multiscale, myocard, growth, structural, muscle, mixture  # noqa: F401
