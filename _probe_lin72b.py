"""Triangulate the TPU-only GMRES claimed-vs-true mismatch at n=72.

exp1: A = residual jvp (Pallas), M = Jacobi      -> isolates A
exp2: A = GMG fine-level stencil matvec, M = GMG -> isolates M/gmres
"""
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
from fourc_tpu.linalg.gmg import build_for_solid
from fourc_tpu.linalg import solvers as ls
from fourc_tpu.linalg import precond as pc

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
M = build_for_solid(f, mass_shift=(1 - am) / (beta * dt * dt))

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

# Jacobi diag from the GMG fine level
dinv = M.levels[0].dinv.reshape(-1)
Mj = lambda v: jnp.where(mask, dinv * v, v)


@f.hoister.jit
def exp1(u, aux):
    r = _residual(u, aux)

    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
        return jnp.where(mask, jv, v)

    res = ls.gmres(A, -r, M=Mj, tol=0.1, atol=0.0, restart=40, maxiter=400)
    x = jnp.where(mask, res.x, 0.0)
    return res.iters, res.resnorm, jnp.linalg.norm(A(x) + r), jnp.linalg.norm(r)


@f.hoister.jit
def exp2(u, aux):
    r = _residual(u, aux)
    lv = M.levels[0]

    def A(v):
        return lv.matvec(v.reshape(-1)).reshape(v.shape)

    res = ls.gmres(A, -r, M=M, tol=0.1, atol=0.0, restart=40, maxiter=400)
    x = res.x
    return res.iters, res.resnorm, jnp.linalg.norm(A(x) + r), jnp.linalg.norm(r)


it1, c1, t1_, b1 = exp1(u0, aux)
print("exp1 (A=jvp, M=jacobi): iters", int(it1), "claimed", float(c1),
      "TRUE", float(t1_), "b", float(b1), flush=True)
it2, c2, t2_, b2 = exp2(u0, aux)
print("exp2 (A=stencil, M=gmg): iters", int(it2), "claimed", float(c2),
      "TRUE", float(t2_), "b", float(b2), flush=True)
