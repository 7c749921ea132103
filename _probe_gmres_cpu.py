"""CPU repro: our gmres claimed-vs-true residual at scale, f32."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fourc_tpu.linalg import solvers as ls

n = 64
N = n * n * n


def lap(v):
    u = v.reshape(n, n, n)
    out = 6.0 * u
    out = out - jnp.roll(u, 1, 0).at[0].set(0) * 0  # build via padding instead
    def sh(a, ax, d):
        z = jnp.zeros_like(a)
        if d == 1:
            return jnp.concatenate([z.take(jnp.array([0]), axis=ax) * 0,
                                    a.take(jnp.arange(a.shape[ax] - 1), axis=ax)], axis=ax)
        return jnp.concatenate([a.take(jnp.arange(1, a.shape[ax]), axis=ax),
                                z.take(jnp.array([0]), axis=ax) * 0], axis=ax)
    acc = 6.0 * u
    for ax in range(3):
        acc = acc - sh(u, ax, 1) - sh(u, ax, -1)
    return acc.reshape(-1)


key = jax.random.PRNGKey(0)
b = jax.random.normal(key, (N,), jnp.float32)
Mj = lambda v: v / 6.0

for tol in (0.1, 1e-3, 1e-6):
    res = jax.jit(lambda b: (lambda r: (r.x, r.iters, r.resnorm))(
        ls.gmres(lap, b, M=Mj, tol=tol, restart=40, maxiter=400)))(b)
    class R: pass
    res = type("R", (), {"x": res[0], "iters": res[1], "resnorm": res[2]})
    true = float(jnp.linalg.norm(b - lap(res.x)))
    print(f"tol={tol}: iters {int(res.iters)} claimed {float(res.resnorm):.6g} "
          f"TRUE {true:.6g}", flush=True)

# and CG for reference
res = jax.jit(lambda b: (lambda r: (r.x, r.iters, r.resnorm))(
    ls.cg(lap, b, M=Mj, tol=1e-6, maxiter=400)))(b)
res = type("R", (), {"x": res[0], "iters": res[1], "resnorm": res[2]})
true = float(jnp.linalg.norm(b - lap(res.x)))
print(f"cg: iters {int(res.iters)} claimed {float(res.resnorm):.6g} TRUE {true:.6g}")
