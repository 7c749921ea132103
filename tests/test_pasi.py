"""PASI: partitioned particle-structure interaction (ref: src/pasi +
src/particle_wall).

Oracle: a heavy DEM ball dropped on a clamped elastic plate (a) bounces
back up off the deforming surface, (b) deflects the plate downward during
impact (momentum transfer through the wall reaction), and (c) never
tunnels through.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

DECK = """
problem: {type: pasi}
structural_dynamic: {dynamictype: genalpha, rho_inf: 0.8, kinem: nonlinear,
                     numstep: 45, timestep: 0.004, maxiter: 25,
                     tolres: 1e-7, toldisp: 1e-9, normcombi: or}
solver: {method: gmres, precond: block_jacobi, maxiter: 2000, gmres_restart: 80}
materials:
  1: {type: stvenantkirchhoff, youngs: 5.0e4, nue: 0.3, density: 100.0}
geometry:
  generator: {kind: box, nx: 4, ny: 4, nz: 1, cell: hex8, mat: 1,
              lo: [0, 0, 0], hi: [1, 1, 0.1], name: structure}
particles:
  positions: [[0.5, 0.5, 0.35]]
  radii: 0.08
  mass: 2.0
  velocities: [[0.0, 0.0, -1.5]]
  dem: {k_normal: 2.0e4, damp_normal: 5.0, gravity: [0, 0, -10.0]}
  substeps: 40
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,1,1], val: [0,0,0]}
    - {nodes: xmax, onoff: [1,1,1], val: [0,0,0]}
  particle_wall:
    - {faces: zmax}
"""


def test_ball_bounces_on_elastic_plate():
    res = driver.run(dm.load(DECK))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    pstate = res.fields["pasi"].pstate
    xp = np.asarray(pstate["x"])
    vp = np.asarray(pstate["v"])

    # ball above the (deformed) plate surface, no tunneling
    assert xp[0, 2] > 0.1 - 0.05
    # ball rebounded: at t=0.18 s it hit (contact at ~0.088 s, contact
    # time ~0.03 s) and must be moving up, well off free-fall (-3.3)
    assert vp[0, 2] > 0.2, vp
    # the plate got pushed down at its center at some point; final state
    # may have rebounded, so check the plate actually carries deformation
    assert np.abs(d[:, 2]).max() > 1e-5
    assert np.all(np.isfinite(d))


def test_pasi_wall_reaction_balances():
    """Static check: ball resting force on the plate equals the scattered
    wall reaction (Newton's third law through ParticleWall.forces)."""
    import jax.numpy as jnp

    from fourc_tpu.particles.wall import ParticleWall

    deck = dm.load(DECK)
    disc = deck.disc["structure"]
    fb = disc.face_sets["zmax"]
    X = np.asarray(disc.coords)
    xp = jnp.asarray([[0.5, 0.5, 0.15]])  # overlapping the z=0.1 surface
    wallm = ParticleWall(fb, X, np.asarray(xp))
    fp, fw = wallm.forces(xp, jnp.zeros((1, 3)), jnp.asarray([0.08]),
                          jnp.asarray(X), jnp.zeros_like(jnp.asarray(X)),
                          k_normal=1e4)
    fp, fw = np.asarray(fp), np.asarray(fw)
    assert fp[0, 2] > 0  # pushed up
    np.testing.assert_allclose(fw.sum(axis=0), -fp.sum(axis=0), atol=1e-9)
