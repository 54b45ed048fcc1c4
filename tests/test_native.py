"""Native CPU engine == Python oracle == JAX engines."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu import native
from hmmspikesorter_tpu.core.emission import state_means
from hmmspikesorter_tpu.core.forward_backward import backward, forward
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from tests.oracle import reference_semantics as ref


def _setup(N=2, K=14, T=3000, overlaps=True, sigma=0.3, seed=3):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.004, 0.002][:N])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, overlaps)
    return y, temps, ss, np.log(pp), sigma


@pytest.mark.parametrize("overlaps", [False, True])
def test_native_viterbi_bitmatches_oracle_and_jax(overlaps):
    y, mu, ss, lp, sigma = _setup(overlaps=overlaps)
    x_n, ll_n = native.viterbi(y, ss, lp, mu, sigma)
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    x_o, ll_o = ref.viterbi(y, ss.states, edges, mu, sigma)
    np.testing.assert_array_equal(x_n, x_o)
    assert ll_n == pytest.approx(ll_o, rel=1e-12)

    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(mu))
    x_j, ll_j = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                               jnp.asarray(in_w), smu, sigma)
    np.testing.assert_array_equal(x_n, np.asarray(x_j))


def test_native_forward_backward_match_jax():
    y, mu, ss, lp, sigma = _setup(T=1200, overlaps=False)
    a_n = native.forward(y, ss, lp, mu, sigma)
    b_n = native.backward(y, ss, lp, mu, sigma)
    in_idx, in_w = ss.in_table(lp)
    out_idx, out_w = ss.out_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(mu))
    a_j = forward(jnp.asarray(y), jnp.asarray(in_idx), jnp.asarray(in_w),
                  smu, sigma)
    b_j = backward(jnp.asarray(y), jnp.asarray(out_idx), jnp.asarray(out_w),
                   smu, sigma)
    np.testing.assert_allclose(a_n, np.asarray(a_j), atol=1e-10)
    np.testing.assert_allclose(b_n, np.asarray(b_j), atol=1e-10)


def test_native_em_step_matches_jax_em():
    """The native BW baseline (hmmss_em_step) reproduces the jitted EM
    update (train/em.py, itself oracle-matched at 1e-8)."""
    from hmmspikesorter_tpu.train.em import EMTables, em_step

    y, mu, ss, lp, sigma = _setup(T=1500, overlaps=False)
    lp_n, mu_n, sg_n, ll_n = native.em_step(y, ss, lp, mu, sigma)

    tables = EMTables.build(ss)
    lp_j, _, mu_j, sg_j, ll_j = em_step(
        jnp.asarray(y), jnp.asarray(lp), jnp.asarray(mu),
        jnp.asarray(sigma), tables, K=mu.shape[0], fb_mode="gather")
    np.testing.assert_allclose(lp_n, np.asarray(lp_j), rtol=1e-8)
    np.testing.assert_allclose(mu_n, np.asarray(mu_j), rtol=0, atol=1e-8)
    assert sg_n == pytest.approx(float(sg_j), rel=1e-10)
    assert ll_n == pytest.approx(float(ll_j), rel=1e-10)
