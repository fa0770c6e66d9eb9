"""Modeling-protocol tests (parameter naming, freezing, bounds)."""

import numpy as np
import pytest

from celerite_tpu.modeling import ConstantModel, Model, ModelSet


class Linear(Model):
    parameter_names = ("m", "b")

    def get_value(self, x):
        return self.m * x + self.b

    def compute_gradient(self, x):
        return np.stack([x, np.ones_like(x)])


def test_init_args_and_kwargs():
    assert Linear(1.0, 2.0).get_parameter_dict() == {"m": 1.0, "b": 2.0}
    assert Linear(m=1.0, b=2.0).get_parameter_dict() == {"m": 1.0, "b": 2.0}
    with pytest.raises(ValueError):
        Linear(1.0)
    with pytest.raises(ValueError):
        Linear(1.0, b=2.0)
    with pytest.raises(ValueError):
        Linear(m=1.0)
    with pytest.raises(ValueError):
        Linear(m=1.0, b=2.0, c=3.0)


def test_attribute_access():
    m = Linear(1.0, 2.0)
    assert m.m == 1.0
    m.m = 4.0
    assert m.get_parameter("m") == 4.0
    assert m.dirty


def test_freeze_thaw_vector():
    m = Linear(1.0, 2.0)
    assert m.vector_size == 2
    m.freeze_parameter("m")
    assert m.vector_size == 1
    assert m.get_parameter_names() == ("b",)
    np.testing.assert_allclose(m.get_parameter_vector(), [2.0])
    m.set_parameter_vector([5.0])
    np.testing.assert_allclose(
        m.get_parameter_vector(include_frozen=True), [1.0, 5.0]
    )
    m.thaw_all_parameters()
    assert m.vector_size == 2
    m.freeze_all_parameters()
    assert m.vector_size == 0


def test_bounds_and_prior():
    m = Linear(1.0, 2.0, bounds={"m": (0.0, 2.0)})
    assert m.log_prior() == 0.0
    m.m = 3.0
    assert np.isinf(m.log_prior())
    m2 = Linear(1.0, 2.0, bounds=[(0.0, 2.0), (None, None)])
    assert m2.log_prior() == 0.0
    with pytest.raises(ValueError):
        Linear(1.0, 2.0, bounds=[(0.0, 2.0)])
    with pytest.raises(ValueError):
        Linear(3.0, 2.0, bounds={"m": (0.0, 2.0)})
    Linear(3.0, 2.0, bounds={"m": (0.0, 2.0)}, quiet=True)


def test_item_access():
    m = Linear(1.0, 2.0)
    assert m["m"] == 1.0
    assert m[0] == 1.0
    m["b"] = 7.0
    assert m.b == 7.0
    m.freeze_parameter("m")
    assert m[0] == 7.0  # active-index addressing skips frozen


def test_modelset_routing():
    ms = ModelSet([("f", Linear(1.0, 2.0)), ("g", Linear(3.0, 4.0))])
    assert ms.parameter_names == ("f:m", "f:b", "g:m", "g:b")
    assert ms.full_size == 4
    np.testing.assert_allclose(
        ms.get_parameter_vector(), [1.0, 2.0, 3.0, 4.0]
    )
    ms.set_parameter("g:m", 9.0)
    assert ms.models["g"].m == 9.0
    ms.freeze_parameter("f:b")
    assert ms.vector_size == 3
    with pytest.raises(ValueError):
        ms.set_parameter("h:m", 0.0)
    assert ms.g is ms.models["g"]


def test_gradient_hook():
    m = Linear(2.0, 1.0)
    x = np.linspace(0, 1, 5)
    g = m.get_gradient(x)
    assert g.shape == (2, 5)
    m.freeze_parameter("m")
    assert m.get_gradient(x).shape == (1, 5)


def test_constant_model():
    c = ConstantModel(3.0)
    np.testing.assert_allclose(c.get_value(np.zeros(4)), 3.0)
    assert c.compute_gradient(np.zeros(4)).shape == (1, 4)
