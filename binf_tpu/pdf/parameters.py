"""Derived variables: functional parameter binding.

The reference demonstrates CSB's computed-parameter machinery in
``binf/pdf/parameters.py:15-122``: a ``Scale`` parameter *bound to* a
``Precision`` parameter recomputes itself as ``precision ** -0.5``
(``:23-40``), so a Gaussian written in terms of (location, scale) can be
driven by a precision variable (``FancyGaussian``, ``:51-100``).

The functional equivalent is :class:`Reparameterized`: wrap any Density and
declare some of its variables as pure functions of NEW variables.  The
wrapper's free-variable set swaps the derived names for their inputs; values
flow through the derivation at call time.  No mutation, no binding graph --
and ``jax.grad`` differentiates through the derivation automatically (the
reference's bound parameters are opaque to its hand-written gradients).

Note this derives *parameters of the density*; it is NOT a change of
variables of the random variable itself (no Jacobian).  For transformed
SAMPLE spaces use :mod:`binf_tpu.pdf.transforms`.
"""

from __future__ import annotations

from typing import Callable

import jax

from binf_tpu.core.density import Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field

Array = jax.Array

__all__ = ["Derivation", "Reparameterized", "scale_from_precision", "precision_from_scale"]


@pytree_dataclass
class Derivation:
    """``target = fn(**{name: value for name in inputs})`` (all static)."""

    target: str = static_field()
    inputs: tuple[str, ...] = static_field()
    fn: Callable[..., Array] = static_field()
    input_specs: tuple[VariableSpec, ...] = static_field(default=())


def scale_from_precision(variable: str = "scale", source: str = "precision") -> Derivation:
    """scale = precision ** -0.5 (reference ``binf/pdf/parameters.py:23-40``)."""
    return Derivation(
        target=variable,
        inputs=(source,),
        fn=lambda precision: precision**-0.5,
        input_specs=(VariableSpec(source, shape=(), differentiable=True),),
    )


def precision_from_scale(variable: str = "precision", source: str = "scale") -> Derivation:
    return Derivation(
        target=variable,
        inputs=(source,),
        fn=lambda scale: scale**-2.0,
        input_specs=(VariableSpec(source, shape=(), differentiable=True),),
    )


@pytree_dataclass
class Reparameterized(Density):
    """A Density whose listed variables are computed from new variables."""

    base: Density
    fixed: ValueDict
    derivations: tuple[Derivation, ...] = static_field(default=())
    name: str = static_field(default="reparameterized")

    @classmethod
    def create(cls, base: Density, *derivations: Derivation, name: str | None = None):
        derived = {d.target for d in derivations}
        unknown = derived - set(base.variables)
        if unknown:
            raise ValueError(
                f"derived target(s) {sorted(unknown)} are not free variables "
                f"of {type(base).__name__}"
            )
        return cls(
            base=base,
            fixed={},
            derivations=tuple(derivations),
            name=name or f"reparam_{getattr(base, 'name', 'density')}",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        derived = {d.target for d in self.derivations}
        specs: dict[str, VariableSpec] = {}
        for s in self.base.variable_specs:
            if s.name not in derived and s.name in self.base.variables:
                specs[s.name] = s
        for d in self.derivations:
            for s in d.input_specs:
                specs.setdefault(s.name, s)
        return tuple(specs.values())

    def _log_prob(self, values: ValueDict) -> Array:
        vals = dict(values)
        for d in self.derivations:
            vals[d.target] = d.fn(**{k: vals[k] for k in d.inputs})
        base_vals = {k: vals[k] for k in self.base.variables}
        return self.base._log_prob({**self.base.fixed, **base_vals})
