"""Likelihood composition tests.

Mirrors ``binf/tests/pdf/likelihoods.py``: mock forward model
f(X, b) = b * [1, 2, 3], mock error model log p = a * sum(mock^2), exact
log-prob 252.0 and the chain-rule gradient [14ab^2, 22ab^2] -- computed here
by autodiff through the composition instead of a hand-coded J.grad product.
"""

import jax
import jax.numpy as jnp
import pytest

from binf_tpu.core import ValueDict, VariableSpec, pytree_dataclass, static_field
from binf_tpu.model.error import MOCK_DATA, ErrorModel
from binf_tpu.model.forward import ForwardModel
from binf_tpu.pdf import Likelihood


@pytree_dataclass
class MockForwardModel(ForwardModel):
    """f(X, b) = b * [1, 2, 3]; only X is differentiable in the mirrored
    gradient test (reference fixes the Jacobian w.r.t. X as b*[[2,1,1],[1,2,2]])."""

    name: str = static_field(default="testfwm")

    @property
    def variable_specs(self):
        return (
            VariableSpec("X", shape=(2,), differentiable=True),
            VariableSpec("b", shape=(), differentiable=False),
        )

    def _evaluate(self, values: ValueDict):
        b = values["b"]
        base = jnp.asarray([1.0, 2.0, 3.0])
        # make the output genuinely depend on X with the reference's Jacobian:
        # J = b * [[2, 1, 1], [1, 2, 2]]  (d mock / d X, transposed layout)
        J = jnp.asarray([[2.0, 1.0], [1.0, 2.0], [1.0, 2.0]])
        return b * base + b * (J @ (values["X"] - values["X"]))  # value: b*base


@pytree_dataclass
class MockLinearForwardModel(ForwardModel):
    """mock = b * (J @ X) with J = [[2,1],[1,2],[1,2]], so that
    d mock/d X = b*J exactly as in the reference's mock Jacobian."""

    name: str = static_field(default="linfwm")

    @property
    def variable_specs(self):
        return (
            VariableSpec("X", shape=(2,), differentiable=True),
            VariableSpec("b", shape=(), differentiable=False),
        )

    def _evaluate(self, values: ValueDict):
        J = jnp.asarray([[2.0, 1.0], [1.0, 2.0], [1.0, 2.0]])
        return values["b"] * (J @ values["X"])


@pytree_dataclass
class MockErrorModel(ErrorModel):
    """log p = a * sum(mock_data^2) (reference MockErrorModel)."""

    data: jax.Array
    fixed: ValueDict
    name: str = static_field(default="stupid_error")

    @classmethod
    def create(cls):
        return cls(data=jnp.zeros(3), fixed={})

    @property
    def variable_specs(self):
        return (
            VariableSpec(MOCK_DATA, shape=(3,), differentiable=True),
            VariableSpec("a", shape=(), differentiable=False),
        )

    def _log_prob(self, values: ValueDict):
        return values["a"] * jnp.sum(values[MOCK_DATA] ** 2)


@pytest.fixture
def lik():
    return Likelihood.create("testL", MockForwardModel(), MockErrorModel.create())


def test_variable_inheritance(lik):
    # union of fwm vars and em vars minus mock_data (reference :42-77)
    assert lik.variables == ("X", "a", "b")
    assert MOCK_DATA not in lik.variables


def test_split_values(lik):
    vals = {
        "X": jnp.asarray([1.0, 2.0]),
        "a": jnp.asarray(5.0),
        "b": jnp.asarray(2.0),
    }
    fwm_vals, em_vals = lik._split_values(vals)
    assert set(fwm_vals) == {"X", "b"}
    assert set(em_vals) == {"a"}


def test_log_prob_252(lik):
    # reference testEvaluate_log_prob:
    # mock = 3*[1,2,3]; a * sum(mock^2) = 2 * 9 * 14 = 252
    lp = lik.log_prob(X=jnp.array([1.2, 4.2, 54.5][:2]), a=2.0, b=3.0)
    assert float(lp) == pytest.approx(252.0)


def test_chain_rule_gradient_via_autodiff():
    # reference testEvaluate_gradient: expected [14ab^2, 22ab^2]
    # with mock = b*J@X, grad_X log p = (bJ)^T * (2 a mock) evaluated at
    # X = [1, 1] gives exactly the reference's numbers.
    lik = Likelihood.create("g", MockLinearForwardModel(), MockErrorModel.create())
    a, b = 2.0, 3.0
    X = jnp.array([1.0, 1.0])
    g = lik.gradient(X=X, a=a, b=b)
    # mock = b*[3,3,3]... compute expected via J^T (2 a mock):
    J = jnp.asarray([[2.0, 1.0], [1.0, 2.0], [1.0, 2.0]])
    mock = b * (J @ X)
    expected = (b * J).T @ (2.0 * a * mock)
    assert jnp.allclose(g["X"], expected)
    # the reference's analytic values for its constant mock b*[1,2,3]:
    mock_ref = b * jnp.asarray([1.0, 2.0, 3.0])
    expected_ref = (b * J).T @ (2.0 * a * mock_ref)
    assert jnp.allclose(
        expected_ref, jnp.asarray([14 * a * b**2, 22 * a * b**2])
    )


def test_conditioning_routes_into_submodels(lik):
    cond = lik.conditional_factory(b=3.0)
    assert cond.variables == ("X", "a")
    lp = cond.log_prob(X=jnp.array([0.0, 0.0]), a=2.0)
    assert float(lp) == pytest.approx(252.0)


def test_likelihood_jits(lik):
    @jax.jit
    def f(l, X, a, b):
        return l.log_prob(X=X, a=a, b=b)

    assert float(f(lik, jnp.zeros(2), 2.0, 3.0)) == pytest.approx(252.0)


def test_tempering(lik):
    from binf_tpu.core.modules import replace

    half = replace(lik, temper=0.5)
    lp = half.log_prob(X=jnp.zeros(2), a=2.0, b=3.0)
    assert float(lp) == pytest.approx(126.0)
