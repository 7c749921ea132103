"""Symbolic space-time functions.

TPU-native counterpart of the reference's expression subsystem
(ref: src/core/utils/src/functions/4C_utils_symbolic_expression.hpp:56,
4C_utils_function.hpp:35, 4C_utils_function_manager.hpp): input decks define
functions of (x, y, z, t) as strings; the reference parses them into a
Sacado-AD'd expression tree.  Here we parse once at deck-read time into a
tiny AST and emit a pure jax function — derivatives come for free from
jax.grad, and the compiled function vectorises over whole node arrays
instead of being called per point.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>\*\*|<=|>=|[-+*/^(),<>]))"
)

_FUNCS = {
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "tanh": jnp.tanh,
    "exp": jnp.exp,
    "log": jnp.log,
    "log10": jnp.log10,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "fabs": jnp.abs,
    "heaviside": lambda x: jnp.where(x > 0, 1.0, 0.0),
    "atan2": jnp.arctan2,
    "pow": jnp.power,
    "min": jnp.minimum,
    "max": jnp.maximum,
}

_CONSTS = {"pi": math.pi, "e": math.e}


def _tokenize(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize expression at: {src[pos:]!r}")
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


class _Parser:
    """Recursive-descent parser: + - * / unary- ^ (right assoc) calls."""

    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, op):
        k, v = self.next()
        if k != "op" or v != op:
            raise ValueError(f"expected {op!r}, got {v!r}")

    def parse(self):
        e = self.compare()
        if self.peek()[0] != "end":
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def compare(self):
        """Comparisons (lowest precedence) -> 1.0/0.0, as in the reference's
        SymbolicExpression (ref: 4C_utils_symbolic_expression.hpp)."""
        node = self.expr()
        while self.peek() in (("op", "<"), ("op", ">"), ("op", "<="),
                              ("op", ">=")):
            op = self.next()[1]
            node = (op, node, self.expr())
        return node

    def expr(self):
        node = self.term()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            op = self.next()[1]
            node = (op, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            op = self.next()[1]
            node = (op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            return ("neg", self.unary())
        if self.peek() == ("op", "+"):
            self.next()
            return self.unary()
        return self.power()

    def power(self):
        base = self.atom()
        if self.peek() in (("op", "^"), ("op", "**")):
            self.next()
            return ("^", base, self.unary())  # right-assoc, binds unary minus in exponent
        return base

    def atom(self):
        kind, val = self.next()
        if kind == "num":
            return ("const", val)
        if kind == "name":
            if self.peek() == ("op", "("):
                self.next()
                args = [self.compare()]
                while self.peek() == ("op", ","):
                    self.next()
                    args.append(self.compare())
                self.expect(")")
                if val not in _FUNCS:
                    raise ValueError(f"unknown function {val!r}")
                return ("call", val, args)
            if val in _CONSTS:
                return ("const", _CONSTS[val])
            return ("var", val)
        if kind == "op" and val == "(":
            e = self.compare()
            self.expect(")")
            return e
        raise ValueError(f"unexpected token {val!r}")


def _eval(node, env):
    tag = node[0]
    if tag == "const":
        return node[1]
    if tag == "var":
        try:
            return env[node[1]]
        except KeyError:
            raise ValueError(f"unknown variable {node[1]!r} in expression") from None
    if tag == "neg":
        return -_eval(node[1], env)
    if tag == "call":
        return _FUNCS[node[1]](*[_eval(a, env) for a in node[2]])
    a, b = _eval(node[1], env), _eval(node[2], env)
    if tag == "+":
        return a + b
    if tag == "-":
        return a - b
    if tag == "*":
        return a * b
    if tag == "/":
        return a / b
    if tag == "^":
        return a**b
    if tag == "<":
        return jnp.where(a < b, 1.0, 0.0)
    if tag == ">":
        return jnp.where(a > b, 1.0, 0.0)
    if tag == "<=":
        return jnp.where(a <= b, 1.0, 0.0)
    if tag == ">=":
        return jnp.where(a >= b, 1.0, 0.0)
    raise AssertionError(tag)


@dataclass
class SymbolicExpression:
    """A parsed expression of space-time variables (and extra parameters).

    ``__call__(x, y, z, t, **params)`` evaluates with jnp, broadcasting over
    array arguments; usable inside jit and differentiable.
    """

    src: str
    ast: tuple = field(repr=False, default=None)

    def __post_init__(self):
        if self.ast is None:
            object.__setattr__(self, "ast", _Parser(_tokenize(self.src)).parse())

    def __call__(self, x=0.0, y=0.0, z=0.0, t=0.0, **params):
        env = {"x": x, "y": y, "z": z, "t": t}
        env.update(params)
        return _eval(self.ast, env)


@dataclass
class FunctionOfSpaceTime:
    """A deck-level FUNCT entry: one expression per component.

    Mirrors the reference's `FunctionOfSpaceTime` (4C_utils_function.hpp:118)
    — evaluated at nodal coordinates and time, broadcast over components.
    """

    components: list  # list[SymbolicExpression]

    @classmethod
    def from_spec(cls, spec) -> "FunctionOfSpaceTime":
        """spec: str | list[str] — one expression per vector component."""
        if isinstance(spec, str):
            spec = [spec]
        return cls([SymbolicExpression(s) for s in spec])

    def __call__(self, coords, t, component=None):
        """coords: (..., dim) array; returns (..., ncomp) or (...,)."""
        x = coords[..., 0]
        y = coords[..., 1] if coords.shape[-1] > 1 else 0.0 * x
        z = coords[..., 2] if coords.shape[-1] > 2 else 0.0 * x
        if component is not None:
            c = self.components[min(component, len(self.components) - 1)]
            return jnp.broadcast_to(jnp.asarray(c(x, y, z, t), dtype=jnp.result_type(float)), x.shape)
        vals = [jnp.broadcast_to(jnp.asarray(c(x, y, z, t), dtype=jnp.result_type(float)), x.shape) for c in self.components]
        return jnp.stack(vals, axis=-1)


class MultiFunctionOfTime:
    """Piecewise-in-time function (ref: the VARIABLE ... TYPE multifunction
    entries of FUNCT blocks, 4C_utils_function_library/ variable branch):
    NUMPOINTS knot times with one DESCRIPTION expression per interval.

    Interval convention matches the reference's segment lookup: knot t_i
    belongs to the interval ENDING at it (left-open, right-closed), so the
    time DERIVATIVE at an interior knot is the LEFT segment's — load-bearing
    for ramped Dirichlet rates in first-order gen-alpha (the thermo bar
    regression anchors resolve this convention at 1e-8).  Implemented as a
    0/1-indicator sum, so jax.jvp in t differentiates the active piece only.
    """

    def __init__(self, times, pieces):
        if len(pieces) != len(times) - 1:
            raise ValueError("multifunction needs len(times)-1 pieces")
        self.times = [float(v) for v in times]
        self.pieces = [SymbolicExpression(str(p)) for p in pieces]
        self.components = [self]  # FunctionOfSpaceTime duck-typing

    def __call__(self, coords, t, component=None):
        x = coords[..., 0]
        y = coords[..., 1] if coords.shape[-1] > 1 else 0.0 * x
        z = coords[..., 2] if coords.shape[-1] > 2 else 0.0 * x
        t = jnp.asarray(t, jnp.result_type(float))
        out = jnp.zeros(jnp.broadcast_shapes(x.shape, jnp.shape(t)),
                        jnp.result_type(float))
        for i, p in enumerate(self.pieces):
            lo, hi = self.times[i], self.times[i + 1]
            on = (t > lo) & (t <= hi) if i else (t >= lo) & (t <= hi)
            w = jax.lax.stop_gradient(on.astype(out.dtype))
            out = out + w * jnp.broadcast_to(
                jnp.asarray(p(x, y, z, t), out.dtype), out.shape)
        return out


class FunctionManager:
    """Input-driven function table (ref: 4C_utils_function_manager.hpp).

    Functions are referenced by positive integer ids from conditions;
    id 0 / None means "constant 1".
    """

    def __init__(self):
        self._funcs: dict[int, FunctionOfSpaceTime] = {}

    def add(self, fid: int, spec):
        if isinstance(spec, dict) and "multifunction" in spec:
            mf = spec["multifunction"]
            self._funcs[int(fid)] = MultiFunctionOfTime(mf["times"],
                                                        mf["pieces"])
            return
        self._funcs[int(fid)] = FunctionOfSpaceTime.from_spec(spec)

    def get(self, fid) -> FunctionOfSpaceTime:
        if fid in (None, 0, "none"):
            return FunctionOfSpaceTime([SymbolicExpression("1")])
        return self._funcs[int(fid)]

    def __contains__(self, fid):
        return int(fid) in self._funcs
