"""Derived-variable (parameter binding) tests.

Mirrors the reference's parameter-taxonomy demo
(``binf/pdf/parameters.py``): a Gaussian over (location, scale) driven by a
precision variable via scale = precision**-0.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.core import ValueDict, VariableSpec, pytree_dataclass, static_field
from binf_tpu.core.density import Density
from binf_tpu.pdf import distributions as dist
from binf_tpu.pdf.parameters import (
    Reparameterized,
    scale_from_precision,
)


@pytree_dataclass
class FancyGaussian(Density):
    """N(location, scale^2) over one observation x (reference ``:51-100``)."""

    x: jax.Array
    fixed: ValueDict
    name: str = static_field(default="fancy_gaussian")

    @classmethod
    def create(cls, x):
        return cls(x=jnp.asarray(x, jnp.float32), fixed={})

    @property
    def variable_specs(self):
        return (VariableSpec("location"), VariableSpec("scale"))

    def _log_prob(self, values):
        return dist.normal_log_prob(self.x, values["location"], values["scale"])


def test_reparameterization_swaps_variables():
    g = FancyGaussian.create(1.0)
    rp = Reparameterized.create(g, scale_from_precision())
    assert rp.variables == ("location", "precision")
    assert "scale" not in rp.variables


def test_values_flow_through_derivation():
    g = FancyGaussian.create(1.0)
    rp = Reparameterized.create(g, scale_from_precision())
    prec = 4.0  # -> scale = 0.5
    lp1 = rp.log_prob(location=0.5, precision=prec)
    lp2 = g.log_prob(location=0.5, scale=0.5)
    assert float(lp1) == pytest.approx(float(lp2), rel=1e-6)


def test_gradient_through_derivation():
    """d logp / d precision via chain rule through scale -- the reference's
    bound parameters cannot do this (hand-written gradients only)."""
    g = FancyGaussian.create(1.0)
    rp = Reparameterized.create(g, scale_from_precision())
    # analytic: logp(prec) = -prec (x-loc)^2 / 2 + log(prec)/2 + const
    grads = rp.gradient(location=0.2, precision=4.0)
    expected = -0.5 * (1.0 - 0.2) ** 2 + 1.0 / (2 * 4.0)
    assert float(grads["precision"]) == pytest.approx(expected, abs=1e-5)


def test_conditioning_on_new_variable():
    g = FancyGaussian.create(1.0)
    rp = Reparameterized.create(g, scale_from_precision())
    cond = rp.conditional_factory(precision=4.0)
    assert cond.variables == ("location",)
    assert float(cond.log_prob(location=0.5)) == pytest.approx(
        float(g.log_prob(location=0.5, scale=0.5)), rel=1e-6
    )


def test_invalid_target_rejected():
    g = FancyGaussian.create(1.0)
    from binf_tpu.pdf.parameters import Derivation

    with pytest.raises(ValueError):
        Reparameterized.create(
            g, Derivation(target="nonexistent", inputs=("z",), fn=lambda z: z)
        )
