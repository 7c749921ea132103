"""Regularized contact constitutive laws: pressure as a function of
penetration.

Counterpart of the reference's contact_constitutivelaw module (ref:
src/contact_constitutivelaw — `CONTACT::CONSTITUTIVELAW::ConstitutiveLaw`
with linear, power, cubic, broken-rational and MIRCO rough-surface laws;
4C_contact_constitutivelaw_*.cpp).  These regularizations model surface
micro-asperity compliance: instead of the ideal p = pen * penetration,
the pressure follows a measured/asymptotic law of the (positive)
penetration delta = -gap.

Each law is a smooth jax-differentiable map delta -> p with p(delta<=0)=0,
plugged into the node-to-segment penalty evaluation (contact/penalty.py)
in place of the plain linear term.

Laws (names and parameter meanings follow the reference's input):
  linear          p = coeff * (delta - offset)_+
  power           p = a * (delta - offset)_+ ** b
  cubic           p = a d^3 + b d^2 + c d   on d = (delta - offset)_+
  brokenrational  p = a / (delta - b) + c   (vertical asymptote at b > 0;
                  a < 0, approaches infinite pressure as delta -> b)
"""

from __future__ import annotations

import jax.numpy as jnp


def make_law(name: str, params: dict, default_penalty: float):
    """Returns a smooth penetration->pressure callable (vectorized)."""
    name = str(name or "linear").lower()
    p = dict(params or {})
    off = float(p.get("offset", 0.0))

    if name == "linear":
        coeff = float(p.get("coeff", default_penalty))

        def law(delta):
            # UNCLAMPED in the signed penetration: the caller's
            # max(0, lam + law(.)) supplies the contact activity clamp, and
            # an Uzawa multiplier must unload linearly across delta = 0
            # (lam - pen*g semantics) — clamping here would freeze a stale
            # multiplier on separated nodes
            return coeff * (delta - off)

    elif name == "power":
        a = float(p.get("a", default_penalty))
        b = float(p.get("b", 2.0))

        def law(delta):
            return a * jnp.maximum(0.0, delta - off) ** b

    elif name == "cubic":
        a = float(p.get("a", default_penalty))
        b = float(p.get("b", 0.0))
        c = float(p.get("c", 0.0))

        def law(delta):
            d = jnp.maximum(0.0, delta - off)
            return a * d**3 + b * d**2 + c * d

    elif name == "brokenrational":
        a = float(p.get("a", -1.0))
        bb = float(p.get("b", 1.0))
        c = float(p.get("c", 0.0))
        assert a < 0 and bb > 0, "brokenrational expects a < 0, b > 0"

        # C1 linear continuation beyond 0.95*b: the raw law's vertical
        # asymptote would otherwise give Newton a zero tangent once the
        # trial penetration overshoots the clamp (flat-capped pressure)
        dc = 0.95 * bb
        pc_ = a / (dc - bb) + c
        kc = -a / (dc - bb) ** 2  # slope at the cut (> 0 since a < 0)

        def law(delta):
            d = jnp.maximum(0.0, delta)
            pr = jnp.where(d < dc, a / (jnp.minimum(d, dc) - bb) + c,
                           pc_ + kc * (d - dc))
            return jnp.maximum(0.0, jnp.where(delta > 0, pr, 0.0))

    else:
        raise ValueError(f"unknown contact constitutive law {name!r}")

    return law
