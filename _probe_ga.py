import sys, time
import jax, jax.numpy as jnp
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics.solid import _make_genalpha_step_host

n = int(sys.argv[1]) if len(sys.argv) > 1 else 72
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="genalpha",
                        genalpha=ps.GenAlphaParams(rho_inf=0.9),
                        precond="gmg", host_newton=True)
params.newton.max_iter = 2
params.newton.lin_maxiter = 50
params.newton.lin_rtol = 1e-2
dbc = [DirichletBC(disc.node_sets["zmin"], [1,1,1],[0,0,0])]
neu = [NeumannBC(disc.face_sets["zmax"], [1,0,0],[50.0,0,0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu)
state = ps.compute_initial_state(f, ps.init_state(f))
step = ps.make_step(f, dt=0.02)
t0=time.time(); state, stats = step(state); jax.block_until_ready(state["d"])
print("step1 ok", time.time()-t0, {k: float(v) for k,v in stats.items()}, flush=True)
t0=time.time(); state, stats = step(state); jax.block_until_ready(state["d"])
print("step2 ok", time.time()-t0, flush=True)
