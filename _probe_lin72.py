import os
import jax
if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
    if os.environ.get("PROBE_X64"):
        jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics.solid import _newmark_updates
from fourc_tpu.linalg.gmg import build_for_solid

n = int(os.environ.get("PROBE_N", "72"))
disc = gridgen.box(n, n, n, cell="hex8")
mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
params = ps.SolidParams(kinem="nonlinear", dyntype="genalpha",
                        genalpha=ps.GenAlphaParams(rho_inf=0.9), precond="gmg",
                        host_newton=True)
dbc = [DirichletBC(disc.node_sets["zmin"], [1,1,1],[0,0,0])]
neu = [NeumannBC(disc.face_sets["zmax"], [1,0,0],[50.0,0,0])]
f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu)
state = ps.compute_initial_state(f, ps.init_state(f))
dt = 0.02
ga = params.genalpha
am, af, beta, gamma = ga.alpha_m, ga.alpha_f, ga.beta, ga.gamma
mask = f.dbc.free_mask
if os.environ.get("PROBE_HOIST"):
    from fourc_tpu.physics.solid import _static_precond
    M = _static_precond(f, mass_shift=(1-am)/(beta*dt*dt))
else:
    M = build_for_solid(f, mass_shift=(1-am)/(beta*dt*dt))
print("gmg levels:", [lv.shape for lv in M.levels], "uniform:",
      [lv.uniform for lv in M.levels], flush=True)

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

@f.hoister.jit
def probe(u, aux):
    r = _residual(u, aux)
    b = -r
    z = M(b)
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
        return jnp.where(mask, jv, v)
    Az = A(z)
    return (jnp.linalg.norm(b), jnp.sum(~jnp.isfinite(b)),
            jnp.linalg.norm(z), jnp.sum(~jnp.isfinite(z)),
            jnp.linalg.norm(Az), jnp.sum(~jnp.isfinite(Az)))

u0 = f.dbc.apply(state["d"], t1)
out = probe(u0, aux)
print("b:", float(out[0]), int(out[1]), flush=True)
print("z=M(b):", float(out[2]), int(out[3]), flush=True)
print("A(z):", float(out[4]), int(out[5]), flush=True)

# full CG with the GMG preconditioner, as in the bench lin_solve
from fourc_tpu.linalg import solvers as ls

@f.hoister.jit
def full_cg(u, aux):
    r = _residual(u, aux)
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
        return jnp.where(mask, jv, v)
    res = ls.cg(A, -r, M=M, tol=float(os.environ.get("PROBE_TOL","0.1")), atol=0.0, maxiter=1000)
    return res.x, res.iters, res.resnorm

x, its, rn = full_cg(u0, aux)
print("cg iters:", int(its), "resnorm:", float(rn),
      "x finite:", bool(jnp.isfinite(x).all()),
      "dunorm:", float(jnp.linalg.norm(jnp.where(mask, x, 0.0))), flush=True)
u1 = u0 + jnp.where(mask, x, 0.0)
out2 = probe(u1, aux)
print("after update: b:", float(out2[0]), int(out2[1]), flush=True)

@f.hoister.jit
def full_gmres(u, aux):
    r = _residual(u, aux)
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
        return jnp.where(mask, jv, v)
    res = ls.gmres(A, -r, M=M, tol=0.1, atol=0.0, restart=40, maxiter=1000)
    x = jnp.where(mask, res.x, 0.0)
    true_lin = jnp.linalg.norm(A(x) + r)
    return x, res.iters, res.resnorm, true_lin

@f.hoister.jit
def true_linres_cg(u, aux):
    r = _residual(u, aux)
    def A(v):
        vm = jnp.where(mask, v, 0.0)
        _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
        return jnp.where(mask, jv, v)
    res = ls.cg(A, -r, M=M, tol=0.1, atol=0.0, maxiter=1000)
    x = jnp.where(mask, res.x, 0.0)
    return x, res.iters, res.resnorm, jnp.linalg.norm(A(x) + r)

xg, itg, rng_, tg = full_gmres(u0, aux)
print("gmres: iters", int(itg), "claimed", float(rng_), "TRUE", float(tg), flush=True)
xc, itc, rnc, tc = true_linres_cg(u0, aux)
print("cg:    iters", int(itc), "claimed", float(rnc), "TRUE", float(tc), flush=True)
