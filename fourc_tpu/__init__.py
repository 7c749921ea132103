"""fourc_tpu — a TPU-native multiphysics finite-element framework.

A from-scratch re-design of the capabilities of 4C ("Comprehensive
Computational Community Code", reference: sebproell/4C) for TPU hardware:

- element evaluation is batched by cell type into dense MXU-friendly
  quadrature kernels (vmap/Pallas) instead of per-element virtual dispatch
  (ref: src/core/fem/src/discretization/4C_fem_discretization_evaluate.cpp:65)
- sparse assembly is a sorted segment-sum scatter with a precomputed
  permutation (ref: 4C_linalg_sparsematrix.cpp:426 "sum into global")
- Newton/Krylov solvers run jit-compiled on device with lax.while_loop,
  no host round-trips inside the time step
  (ref: Belos/NOX usage, 4C_linear_solver_method_iterative.cpp:109)
- distribution is a jax.sharding.Mesh over which node/element arrays are
  sharded; ghost exchange is compiled gather/ppermute instead of MPI
  (ref: core/rebalance + Epetra import/export)

Layout:
  core/       mesh ("Discretization"), cell-type zoo, quadrature, dof maps,
              conditions, symbolic space-time functions, grid generator
  linalg/     sparse operators, Krylov solvers, preconditioners (incl. GMG)
  materials/  material library (hyperelastic / small strain / thermal / fluid)
  ops/        batched element kernels per physics (+ pallas/ hot kernels)
  physics/    time integrators + nonlinear solvers per field, coupled drivers
  parallel/   mesh partitioning, sharding and halo exchange
  io/         YAML input decks, RESULT DESCRIPTION tests, checkpointing, VTU
  app/        command line driver (analog of apps/global_full)
"""

__version__ = "0.1.0"

from fourc_tpu.core import cells  # noqa: F401
