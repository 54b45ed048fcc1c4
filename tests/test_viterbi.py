"""Viterbi decode parity: JAX scan engine vs literal reference oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.emission import state_means
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from tests.oracle import reference_semantics as ref


def _setup(N=2, K=20, T=4000, overlaps=True, sigma=0.3, seed=1234):
    rng = np.random.default_rng(seed)
    temps = np.stack(
        [create_spike_template(K, 3.0, 0.8, 0.2),
         create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.003, 0.001][:N])
    y, truth = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, overlaps)
    lp = np.log(pp)
    return y, truth, temps, pp, ss, lp, sigma


@pytest.mark.parametrize("overlaps", [False, True])
def test_viterbi_bitmatch_oracle(overlaps):
    y, truth, temps, pp, ss, lp, sigma = _setup(overlaps=overlaps)
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    x_ref, ll_ref = ref.viterbi(y, ss.states, edges, temps, sigma)

    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x, ll = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                           jnp.asarray(in_w), smu, sigma)
    np.testing.assert_array_equal(np.asarray(x), x_ref)
    assert float(ll) == pytest.approx(ll_ref, rel=1e-12)


def test_viterbi_recovers_spikes():
    # decode with true templates recovers most true onsets
    y, truth, temps, pp, ss, lp, sigma = _setup(K=60, T=20000)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x, _ = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                          jnp.asarray(in_w), smu, sigma)
    decoded = ref.unroll_mlseq(np.asarray(x), ss.states)
    # onset times (ring position 1) per neuron within +-2 samples
    for n in range(2):
        true_on = np.nonzero(truth[n] == 1)[0]
        dec_on = np.nonzero(decoded[n] == 1)[0]
        if len(true_on) == 0:
            continue
        hits = sum(1 for t in true_on if len(dec_on) and np.min(np.abs(dec_on - t)) <= 2)
        assert hits / len(true_on) > 0.8


def test_reconstruction_quality_interval():
    # mirrors reference test/runtests.jl:17-34: 2 templates K=60, 20k samples,
    # sigma=0.3, overlaps on, decode with true templates. RNG differs from the
    # reference's MersenneTwister, so we assert the same statistical band.
    y, truth, temps, pp, ss, lp, sigma = _setup(K=60, T=20000, overlaps=True)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    x, _ = viterbi_decode(jnp.asarray(y), jnp.asarray(in_idx),
                          jnp.asarray(in_w), smu, sigma)
    recon = ref.reconstruct_signal(np.asarray(x), ss.states, temps)
    q = 1 - np.std(recon - y) / np.std(y)
    assert 0.5 < q < 0.7
