"""General-N pairwise-overlap ring engine vs the gather engine (bit parity,
forced overlapping spikes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.emission import state_means
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.ops.ring_viterbi_ovn import ring_viterbi_ovn
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template

PARAMS = [(3.0, 0.8, 0.2), (4.0, 0.3, 0.2), (2.5, 0.6, 0.3), (2.0, 0.5, 0.25)]


@pytest.mark.parametrize("N,K,T,seed", [(2, 10, 2500, 1), (3, 8, 2500, 2),
                                        (4, 7, 2000, 3)])
def test_ovn_bitmatches_gather(N, K, T, seed):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, *PARAMS[i]) for i in range(N)],
                     axis=1)
    pp = np.array([0.03, 0.02, 0.025, 0.015][:N])
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    y[100:100 + K - 1] += temps[1:, 0]
    y[104:104 + K - 1] += temps[1:, min(1, N - 1)]
    ss = build_state_space(N, K, True)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x_g, ll_g = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                               jnp.asarray(in_w), smu, 0.3)
    x_r, ll_r = ring_viterbi_ovn(jnp.asarray(y), jnp.asarray(lp),
                                 jnp.asarray(temps), 0.3)
    pair_base = 1 + N * (K - 1)
    assert (np.asarray(x_g) >= pair_base).any()
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)


@pytest.mark.parametrize("seed", range(6))
def test_ovn_stress_random_n3(seed):
    # randomized templates/rates, frequent overlaps
    rng = np.random.default_rng(100 + seed)
    N, K, T = 3, 6 + seed, 1500
    temps = np.stack([create_spike_template(K, 1.0 + 2 * rng.random(),
                                            0.2 + 0.6 * rng.random(),
                                            0.1 + 0.3 * rng.random())
                      for _ in range(N)], axis=1)
    pp = rng.uniform(0.02, 0.06, N)
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    y += 0.2 * rng.standard_normal(T)  # extra noise -> more ambiguous paths
    ss = build_state_space(N, K, True)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x_g, ll_g = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                               jnp.asarray(in_w), smu, 0.3)
    x_r, ll_r = ring_viterbi_ovn(jnp.asarray(y), jnp.asarray(lp),
                                 jnp.asarray(temps), 0.3)
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)


def test_ovn_bitmatches_gather_n7_past_old_cap():
    """N=7 (the earlier trace-time-unrolled engine was capped at N<=6):
    the table-driven step must still bit-match the gather engine."""
    N, K, T = 7, 6, 1200
    rng = np.random.default_rng(7)
    temps = np.stack([create_spike_template(K, 1.0 + 2 * rng.random(),
                                            0.2 + 0.6 * rng.random(),
                                            0.1 + 0.3 * rng.random())
                      for _ in range(N)], axis=1)
    pp = rng.uniform(0.02, 0.05, N)
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    y[50:50 + K - 1] += temps[1:, 0]         # force an overlap
    y[53:53 + K - 1] += temps[1:, 3]
    ss = build_state_space(N, K, True)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x_g, ll_g = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                               jnp.asarray(in_w), smu, 0.3)
    x_r, ll_r = ring_viterbi_ovn(jnp.asarray(y), jnp.asarray(lp),
                                 jnp.asarray(temps), 0.3)
    pair_base = 1 + N * (K - 1)
    assert (np.asarray(x_g) >= pair_base).any()
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)
