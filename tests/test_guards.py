"""NaN/-inf guard machinery (utils/guards.py, SURVEY.md §5.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.utils.guards import (assert_finite_tree, checked,
                                             guard_inputs)


def test_checked_passes_clean_function():
    fn = checked(lambda x: jnp.log(jnp.abs(x) + 1.0))
    out = fn(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out), np.log([2.0, 3.0]))


def test_checked_raises_on_nan_output():
    from jax.experimental.checkify import JaxRuntimeError

    fn = checked(lambda x: jnp.log(x))         # log(-1) -> NaN
    with pytest.raises(JaxRuntimeError, match="NaN in output"):
        fn(jnp.asarray([-1.0]))


def test_checked_allows_neg_inf():
    # log-space padding is -inf by design: not an error
    fn = checked(lambda x: jnp.log(x))         # log(0) -> -inf
    out = fn(jnp.asarray([0.0, 1.0]))
    assert np.asarray(out)[0] == -np.inf


def test_checked_guards_core_forward():
    from hmmspikesorter_tpu.core.emission import state_means
    from hmmspikesorter_tpu.core.forward_backward import forward
    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                                   create_spike_template)

    K = 10
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2)], axis=1)
    pp = np.array([0.01])
    y, _ = create_signal(200, 0.3, pp, temps,
                         rng=np.random.default_rng(0))
    ss = build_state_space(1, K, False)
    in_idx, in_w = ss.in_table(np.log(pp))
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    alpha = checked(forward)(jnp.asarray(y), jnp.asarray(in_idx),
                             jnp.asarray(in_w), smu, 0.3)
    assert np.isfinite(np.asarray(alpha)).all()


def test_assert_finite_tree():
    assert_finite_tree({"a": np.ones(3), "b": [np.full(2, -np.inf)]})
    with pytest.raises(ValueError, match="NaN in leaf"):
        assert_finite_tree({"a": np.array([1.0, np.nan])})


def test_guard_inputs():
    guard_inputs(np.ones(10), 0.3)
    with pytest.raises(ValueError, match="NaN"):
        guard_inputs(np.array([1.0, np.nan]), 0.3)
    with pytest.raises(ValueError, match="sigma"):
        guard_inputs(np.ones(10), 0.0)
    guard_inputs(np.ones((2, 5)), 0.3)         # (C, T) channel batch OK
    with pytest.raises(ValueError, match="1-D"):
        guard_inputs(np.ones((2, 2, 5)), 0.3)
    with pytest.raises(ValueError, match="non-empty"):
        guard_inputs(np.ones((0,)), 0.3)
