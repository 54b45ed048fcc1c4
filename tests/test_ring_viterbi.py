"""Ring-structured engines bit-match the (oracle-bit-matched) gather engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.emission import state_means
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.ops.ring_viterbi import ring_viterbi_nov, ring_viterbi_ov2
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template


def _setup(N, K, T, overlaps, sigma=0.3, seed=21):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2),
                      create_spike_template(K, 2.5, 0.6, 0.3)][:N], axis=1)
    pp = np.array([0.004, 0.002, 0.003][:N])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, overlaps)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    return (jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
            jnp.asarray(in_idx), jnp.asarray(in_w), smu, sigma)


@pytest.mark.parametrize("N,K,T", [(1, 10, 2000), (2, 20, 5000), (3, 14, 4000)])
def test_ring_nov_bitmatches_gather(N, K, T):
    y, lp, mu, in_idx, in_w, smu, sigma = _setup(N, K, T, overlaps=False)
    x_g, ll_g = viterbi_decode(y, in_idx, in_w, smu, sigma)
    x_r, ll_r = ring_viterbi_nov(y, lp, mu, sigma)
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)


@pytest.mark.parametrize("K,T,seed", [(10, 3000, 21), (20, 6000, 4),
                                      (60, 8000, 9)])
def test_ring_ov2_bitmatches_gather(K, T, seed):
    y, lp, mu, in_idx, in_w, smu, sigma = _setup(2, K, T, overlaps=True,
                                                 seed=seed)
    x_g, ll_g = viterbi_decode(y, in_idx, in_w, smu, sigma)
    x_r, ll_r = ring_viterbi_ov2(y, lp, mu, sigma)
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)


def test_ring_ov2_dense_spikes():
    # high firing rates force overlap states to actually occur
    rng = np.random.default_rng(2)
    K, T, sigma = 12, 4000, 0.25
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.05, 0.04])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    # add explicit overlapping spikes
    y[100:100 + K - 1] += temps[1:, 0]
    y[105:105 + K - 1] += temps[1:, 1]
    ss = build_state_space(2, K, True)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x_g, ll_g = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                               jnp.asarray(in_w), smu, sigma)
    x_r, ll_r = ring_viterbi_ov2(jnp.asarray(y), jnp.asarray(lp),
                                 jnp.asarray(temps), sigma)
    pair_base = 1 + 2 * (K - 1)
    assert (np.asarray(x_g) >= pair_base).any()      # overlap states hit
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)


def test_ring_block_decoder_in_long_decode():
    from hmmspikesorter_tpu.parallel.overlap_save import overlap_save_decode_long
    from hmmspikesorter_tpu.ops.ring_viterbi import ring_block_decoder
    y, lp, mu, in_idx, in_w, smu, sigma = _setup(2, 20, 8192, overlaps=True)
    dec = ring_block_decoder(lp, mu, sigma, overlaps=True)
    x_ring, ok_r = overlap_save_decode_long(
        np.asarray(y), in_idx, in_w, smu, sigma, L=1024, H=128,
        blocks_per_call=4, block_decoder=dec)
    x_gather, ok_g = overlap_save_decode_long(
        np.asarray(y), in_idx, in_w, smu, sigma, L=1024, H=128,
        blocks_per_call=4)
    np.testing.assert_array_equal(x_ring, x_gather)
    np.testing.assert_array_equal(ok_r, ok_g)


def test_ring_nov_immediate_reonset():
    # back-to-back spikes force the (m,K-1)->(n,1) same-step exit+onset edge
    rng = np.random.default_rng(8)
    K, T, sigma = 12, 3000, 0.25
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.05, 0.04])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    # a spike of neuron 1 starting exactly when neuron 0's ring exits
    y[200:200 + K - 1] += temps[1:, 0]
    y[200 + K - 1:200 + 2 * (K - 1)] += temps[1:, 1]
    ss = build_state_space(2, K, False)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x_g, ll_g = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                               jnp.asarray(in_w), smu, sigma)
    x_r, ll_r = ring_viterbi_nov(jnp.asarray(y), jnp.asarray(lp),
                                 jnp.asarray(temps), sigma)
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_g))
    assert float(ll_r) == pytest.approx(float(ll_g), rel=1e-12)


def test_f32_decode_matches_f64_labels():
    # the production TPU decode runs f32; verify label fidelity vs f64
    y, lp, mu, in_idx, in_w, smu, sigma = _setup(2, 60, 20000, overlaps=True,
                                                 seed=3)
    x64, _ = ring_viterbi_ov2(y, lp, mu, sigma, with_ll=False)
    x32, _ = ring_viterbi_ov2(jnp.asarray(y, jnp.float32),
                              jnp.asarray(lp, jnp.float32),
                              jnp.asarray(mu, jnp.float32), sigma,
                              with_ll=False)
    agree = (np.asarray(x32) == np.asarray(x64)).mean()
    assert agree > 0.999
