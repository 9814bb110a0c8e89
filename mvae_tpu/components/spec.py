"""Latent-space spec-string DSL (the reference's signature API).

Grammar parity with oskopek/mvae's ``parse_components`` [UNVERIFIED name,
``mt/mvae/utils.py``]: comma-separated factors, each

    [multiplier] kind dim [":" posterior]

* kind in {e, h, d, s, p, u} — Euclidean, hyperboloid (Lorentz), Poincare
  ball (disk), sphere, projected sphere, universal;
* an integer multiplier prefix repeats the factor: "2h2" == "h2,h2";
* the optional ":posterior" suffix (wrapped | normal | vmf | riemannian) is
  a build extension over the reference grammar, covering BASELINE.json
  config #3's "s6 with vMF AND wrapped posteriors" without a second flag.

Examples: "e6", "h2,s2,e2", "2h2", "u6", "s6:wrapped", "d6:riemannian".
"""
from __future__ import annotations

import re
from typing import Sequence

from ..ops import Manifold
from .component import DEFAULT_POSTERIOR, Component

_FACTOR_RE = re.compile(
    r"^(?P<mult>\d+)?(?P<kind>[ehdspu])(?P<dim>\d+)(?::(?P<post>[a-z]+))?$")


def parse_components(spec: str, fixed_curvature: bool = True,
                     scalar_sigma: bool = False,
                     wraps: int = 1,
                     sigma_cap: bool = True) -> tuple[Component, ...]:
    """Parse a latent spec string into a tuple of Components.

    ``wraps=0`` selects the reference's principal-branch-only wrapped-
    normal estimator (strict parity mode); the default 1 is the exact
    density (see distributions/wrapped_normal.py)."""
    spec = spec.strip().lower()
    if not spec:
        raise ValueError("empty latent spec")
    comps: list[Component] = []
    for factor in spec.split(","):
        factor = factor.strip()
        m = _FACTOR_RE.match(factor)
        if not m:
            raise ValueError(
                f"bad latent factor {factor!r}; expected "
                "[multiplier]kind dim[:posterior], e.g. 'h2', '2s2', 'd6:riemannian'")
        mult = int(m.group("mult") or 1)
        kind = m.group("kind")
        dim = int(m.group("dim"))
        posterior = m.group("post") or DEFAULT_POSTERIOR[kind]
        if mult < 1:
            raise ValueError(f"multiplier must be >= 1 in {factor!r}")
        for _ in range(mult):
            comps.append(Component(Manifold(kind, dim), posterior,
                                   fixed_curvature=fixed_curvature,
                                   scalar_sigma=scalar_sigma, wraps=wraps,
                                   sigma_cap=sigma_cap))
    return tuple(comps)


_PRETTY = {"e": "E", "h": "H", "d": "D", "s": "S", "p": "P", "u": "U"}


def canonical_name(components: Sequence[Component]) -> str:
    """Reference-style display name, e.g. '(H^2)x(S^2)x(E^2)'."""
    return "x".join(
        f"({_PRETTY[c.manifold.kind]}^{c.manifold.dim})" for c in components)


def total_ambient_dim(components: Sequence[Component]) -> int:
    """Decoder input width: concatenated ambient coordinates."""
    return sum(c.ambient_dim for c in components)


def total_true_dim(components: Sequence[Component]) -> int:
    return sum(c.dim for c in components)
