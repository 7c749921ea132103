import sys
import jax, jax.numpy as jnp
import numpy as np
from fourc_tpu.core import cells, gridgen
from fourc_tpu.materials import make_material
from fourc_tpu.ops import solid_pallas as spk

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
disc = gridgen.box(n, n, n)
conn = jnp.asarray(np.asarray(disc.blocks['hex8'].conn))
X = jnp.asarray(disc.coords, jnp.float32)
rng = np.random.default_rng(0)
u = jnp.asarray(0.02*rng.standard_normal((disc.n_nodes,3)), jnp.float32)
mat = make_material({'type':'neohooke','youngs':1e4,'nue':0.3})
Xe, ue = X[conn], u[conn]
f = spk.internal_force(Xe, ue, mat)
fn = np.asarray(f)
print('n', n, 'E', conn.shape[0], 'finite:', np.isfinite(fn).all(), 'norm', np.linalg.norm(fn), flush=True)
# compare vs einsum on device
from fourc_tpu.ops import solid as sops
cell = cells.get_cell('hex8')
fr, _ = sops.internal_force(Xe, ue, cell, mat, kinem='nonlinear', impl='unrolled')
print('ref norm', float(jnp.linalg.norm(fr)), 'max diff', float(jnp.abs(f-fr).max()), flush=True)
# jvp
v = jnp.asarray(0.01*rng.standard_normal((disc.n_nodes,3)), jnp.float32)
_, jv = jax.jvp(lambda uu: spk.internal_force(Xe, uu, mat), (ue,), (v[conn],))
print('jvp finite:', bool(jnp.isfinite(jv).all()), flush=True)
