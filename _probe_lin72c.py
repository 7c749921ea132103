"""Additivity/homogeneity probe of the residual-jvp operator A on TPU."""
import os
import jax
if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics.solid import _newmark_updates

n = int(os.environ.get("PROBE_N", "72"))
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="genalpha",
                        genalpha=ps.GenAlphaParams(rho_inf=0.9), precond="gmg",
                        host_newton=True)
dbc = [DirichletBC(disc.node_sets["zmin"], [1, 1, 1], [0, 0, 0])]
neu = [NeumannBC(disc.face_sets["zmax"], [1, 0, 0], [50.0, 0, 0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu)
state = ps.compute_initial_state(f, ps.init_state(f))
dt = 0.02
ga = params.genalpha
am, af, beta, gamma = ga.alpha_m, ga.alpha_f, ga.beta, ga.gamma
mask = f.dbc.free_mask
t1 = float(state["t"]) + dt
aux = (state["d"], state["v"], state["a"], state["fint"], state["fext"], t1)


def _residual(u, aux):
    d_n, v_n, a_n, fint_n, fext_n, t1 = aux
    v_new, a_new = _newmark_updates(f, dt, u, d_n, v_n, a_n, beta, gamma)
    a_mid = (1 - am) * a_new + am * a_n
    fi, _ = f.internal_force(u, dt=dt)
    fint_mid = (1 - af) * fi + af * fint_n
    r = f.mass_matvec(a_mid) + fint_mid - ((1 - af) * f.external_force(t1, u) + af * fext_n)
    return jnp.where(mask, r, 0.0)


u0 = f.dbc.apply(state["d"], t1)
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
v1 = jnp.where(mask, jax.random.normal(k1, mask.shape, jnp.float32), 0.0)
v2 = jnp.where(mask, jax.random.normal(k2, mask.shape, jnp.float32), 0.0)


@f.hoister.jit
def probe(u, aux, v1, v2):
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
        return jnp.where(mask, jv, v)

    a1 = A(v1)
    a2 = A(v2)
    a12 = A(v1 + v2)
    a2x = A(2.0 * v1)
    add = jnp.linalg.norm(a12 - a1 - a2) / jnp.linalg.norm(a1)
    hom = jnp.linalg.norm(a2x - 2.0 * a1) / jnp.linalg.norm(a1)
    return add, hom, jnp.linalg.norm(a1), jnp.linalg.norm(a2)


add, hom, n1, n2 = probe(u0, aux, v1, v2)
print("additivity rel err:", float(add), flush=True)
print("homogeneity rel err:", float(hom), flush=True)
print("|A v1|:", float(n1), "|A v2|:", float(n2), flush=True)


@f.hoister.jit
def probe_fi(u, v1, v2):
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: f.internal_force(x, dt=dt)[0], (u,), (vm,))
        return jnp.where(mask, jv, 0.0)

    a1 = A(v1)
    a2 = A(v2)
    a12 = A(v1 + v2)
    return (jnp.linalg.norm(a12 - a1 - a2) / jnp.linalg.norm(a1),
            jnp.linalg.norm(a1))


addf, nf = probe_fi(u0, v1, v2)
print("fint-jvp additivity rel err:", float(addf), "|Afi v1|:", float(nf),
      flush=True)
