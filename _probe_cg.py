import sys, time
import jax, jax.numpy as jnp
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps
from fourc_tpu.linalg import solvers as ls
from fourc_tpu.linalg.precond import jacobi

n = int(sys.argv[1]) if len(sys.argv) > 1 else 72
maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 10
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="statics")
dbc = [DirichletBC(disc.node_sets["zmin"], [1,1,1],[0,0,0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc)
ndof = disc.n_nodes*3
mask = f.dbc.free_mask
u = jnp.zeros((ndof,), jnp.float32)
b = jnp.where(mask, jnp.ones((ndof,), jnp.float32), 0.0)

def cg_prog(u, b):
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: f.internal_force(x)[0], (u,), (vm,))
        return jnp.where(mask, jv, v)
    M = jacobi(jnp.ones((ndof,), jnp.float32))
    res = ls.cg(A, b, M=M, tol=1e-6, maxiter=maxiter)
    return res.x, res.iters, res.resnorm

prog = f.hoister.jit(cg_prog)
t0=time.time(); x, its, rn = prog(u, b); x.block_until_ready()
print("cg jacobi compile+run", time.time()-t0, "iters", int(its), flush=True)
t0=time.time(); x, its, rn = prog(u, b); x.block_until_ready()
print("cg run", time.time()-t0, flush=True)

print("== gmg vcycle ==", flush=True)
from fourc_tpu.linalg.gmg import build_for_solid
M = build_for_solid(f)
vc = f.hoister.jit(lambda r: M(r))
t0=time.time(); z = vc(b); z.block_until_ready(); print("vcycle compile+run", time.time()-t0, flush=True)
t0=time.time(); z = vc(b); z.block_until_ready(); print("vcycle run", time.time()-t0, flush=True)

print("== cg + gmg ==", flush=True)
def cg_gmg(u, b):
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: f.internal_force(x)[0], (u,), (vm,))
        return jnp.where(mask, jv, v)
    res = ls.cg(A, b, M=M, tol=1e-6, maxiter=maxiter)
    return res.x, res.iters, res.resnorm
prog2 = f.hoister.jit(cg_gmg)
t0=time.time(); x, its, rn = prog2(u, b); x.block_until_ready()
print("cg gmg compile+run", time.time()-t0, "iters", int(its), flush=True)
t0=time.time(); x, its, rn = prog2(u, b); x.block_until_ready()
print("cg gmg run", time.time()-t0, "resnorm", float(rn), flush=True)
print("ALL OK", flush=True)
