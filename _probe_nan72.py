import jax, jax.numpy as jnp
import numpy as np
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps

n = 72
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="genalpha",
                        genalpha=ps.GenAlphaParams(rho_inf=0.9), precond="gmg",
                        host_newton=True)
dbc = [DirichletBC(disc.node_sets["zmin"], [1,1,1],[0,0,0])]
neu = [NeumannBC(disc.face_sets["zmax"], [1,0,0],[50.0,0,0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu)
state = ps.init_state(f)

@f.hoister.jit
def parts(d):
    fi, _ = f.internal_force(d)
    fe = f.external_force(0.0, d)
    v = jnp.ones_like(d)
    _, jv = jax.jvp(lambda u: f.internal_force(u)[0], (d,), (v,))
    ml = f.lumped_mass()
    return (jnp.linalg.norm(fi), jnp.sum(~jnp.isfinite(fi)),
            jnp.linalg.norm(fe), jnp.sum(~jnp.isfinite(fe)),
            jnp.linalg.norm(jv), jnp.sum(~jnp.isfinite(jv)),
            jnp.min(ml))

out = parts(state["d"])
print("fint norm/nan:", float(out[0]), int(out[1]), flush=True)
print("fext norm/nan:", float(out[2]), int(out[3]), flush=True)
print("jvp norm/nan:", float(out[4]), int(out[5]), flush=True)
print("mlump min:", float(out[6]), flush=True)

state = ps.compute_initial_state(f, state)
a = np.asarray(state["a"])
print("a0 finite:", np.isfinite(a).all(), "norm:", np.linalg.norm(a), flush=True)
