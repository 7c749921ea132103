import sys, time
import jax, jax.numpy as jnp
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps

n = int(sys.argv[1]) if len(sys.argv) > 1 else 72
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="statics")
dbc = [DirichletBC(disc.node_sets["zmin"], [1,1,1],[0,0,0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc)
ndof = disc.n_nodes*3
u = jnp.zeros((ndof,), jnp.float32)
v = jnp.ones((ndof,), jnp.float32)

def res(u):
    return f.internal_force(u)[0]

def many_fwd(u, v):
    def body(i, acc):
        r = res(acc)
        return u + r / (jnp.linalg.norm(r) + 1.0)  # serialized, bounded
    return jax.lax.fori_loop(0, reps, body, u)

def many_jvp(u, v):
    def body(i, acc):
        jv = jax.jvp(res, (u,), (acc,))[1]
        return v + jv / (jnp.linalg.norm(jv) + 1.0)
    return jax.lax.fori_loop(0, reps, body, v)

for nm, fn in (("fwd", many_fwd), ("jvp", many_jvp)):
    p = f.hoister.jit(fn)
    t0=time.time(); y = p(u, v); _ = float(y[0])
    tc = time.time()-t0
    print(f"{nm}: compile+run {tc:.1f}s", flush=True)
    for it in range(3):
        u2 = u + 1e-6 * it
        t0=time.time(); y = p(u2, v); _ = float(y[0])
        tr = time.time()-t0
        print(f"{nm}[{it}]: {reps} reps in {tr:.3f}s -> {1e3*tr/reps:.1f} ms/call", flush=True)
