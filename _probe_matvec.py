import os, sys, time
import jax, jax.numpy as jnp
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps

n = int(sys.argv[1]) if len(sys.argv) > 1 else 72
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="statics")
dbc = [DirichletBC(disc.node_sets["zmin"], [1,1,1],[0,0,0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc)
ndof = disc.n_nodes*3
print("ndof", ndof, flush=True)
u = jnp.zeros((ndof,), jnp.float32)

def res(u):
    return f.internal_force(u)[0]

print("== forward ==", flush=True)
r = jax.jit(f.hoister.jit(lambda u: res(u)))  # hoisted
t0=time.time(); y = r(u); y.block_until_ready(); print("fwd compile+run", time.time()-t0, flush=True)
t0=time.time(); y = r(u); y.block_until_ready(); print("fwd run", time.time()-t0, flush=True)

print("== jvp ==", flush=True)
def mv(u, v):
    return jax.jvp(res, (u,), (v,))[1]
m = f.hoister.jit(mv)
v = jnp.ones((ndof,), jnp.float32)
t0=time.time(); y = m(u, v); y.block_until_ready(); print("jvp compile+run", time.time()-t0, flush=True)
t0=time.time(); y = m(u, v); y.block_until_ready(); print("jvp run", time.time()-t0, flush=True)
print("OK", float(jnp.linalg.norm(y)), flush=True)
