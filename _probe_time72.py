"""Time the n=72 step components on TPU: fine matvec, V-cycle, jvp, residual."""
import os, time
import jax
import jax.numpy as jnp
import numpy as np
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics.solid import _newmark_updates, _static_precond

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
M = _static_precond(f, mass_shift=(1 - am) / (beta * dt * dt))
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
REPS = 20


def timed(name, fn, *args):
    out = fn(*args)           # compile + warm
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    dtm = (time.perf_counter() - t0) * 1e3 / REPS
    print(f"{name}: {dtm:.2f} ms", flush=True)


@f.hoister.jit
def t_matvec(v):
    lv = M.levels[0]
    def body(i, x):
        return lv.matvec(x) / (1.0 + jnp.float32(i) * 0.0)
    return jax.lax.fori_loop(0, REPS, body, v)


@f.hoister.jit
def t_vcycle(v):
    def body(i, x):
        return M(x) / (1.0 + jnp.float32(i) * 0.0)
    return jax.lax.fori_loop(0, REPS, body, v)


@f.hoister.jit
def t_jvp(v, u, aux):
    def body(i, x):
        _, jv = jax.jvp(lambda y: _residual(y, aux), (u,), (x,))
        return jv / jnp.maximum(jnp.linalg.norm(jv), 1e-30)
    return jax.lax.fori_loop(0, REPS, body, v)


@f.hoister.jit
def t_res(u, aux):
    def body(i, x):
        r = _residual(x * 1e-9 + u, aux)
        return r / jnp.maximum(jnp.linalg.norm(r), 1e-30)
    return jax.lax.fori_loop(0, REPS, body, u * 0)


@f.hoister.jit
def t_cheb_fine(v):
    lv = M.levels[0]
    def body(i, x):
        return lv.chebyshev(x, jnp.zeros_like(x)) / (1.0 + jnp.float32(i) * 0.0)
    return jax.lax.fori_loop(0, REPS, body, v)


v = jnp.where(mask, 1.0, 0.0) / 1000.0
timed("fine matvec", t_matvec, v)
timed("fine chebyshev", t_cheb_fine, v)
timed("full V-cycle", t_vcycle, v)
timed("residual jvp (A)", t_jvp, v, u0, aux)
timed("residual", t_res, u0, aux)
