"""path_cumulative_ll: the O(T) telescoped reference-ll (core/path_score.py).

Anchors: the literal oracle's ll (sum of T1[x_t,t] reads along the decoded
path, src/viterbi.jl:92-96) and the engines' own replay-based lls.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.path_score import path_cumulative_ll
from hmmspikesorter_tpu.core.state_space import build_state_space
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
    return y, temps, pp, ss, np.log(pp), sigma


@pytest.mark.parametrize("overlaps", [False, True])
def test_matches_oracle_ll_on_decoded_path(overlaps):
    y, temps, pp, ss, lp, sigma = _setup(overlaps=overlaps)
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    x_ref, ll_ref = ref.viterbi(y, ss.states, edges, temps, sigma)
    ll = path_cumulative_ll(y, x_ref, ss.states, temps, sigma, lp)
    assert ll == pytest.approx(ll_ref, rel=1e-12)


def test_matches_ring_engine_replay_ll_overlap():
    from hmmspikesorter_tpu.ops.ring_viterbi import ring_viterbi_ov2

    y, temps, pp, ss, lp, sigma = _setup(overlaps=True)
    x, ll_replay = ring_viterbi_ov2(jnp.asarray(y), jnp.asarray(lp),
                                    jnp.asarray(temps), sigma)
    ll = path_cumulative_ll(y, np.asarray(x), ss.states, temps, sigma, lp)
    assert ll == pytest.approx(float(ll_replay), rel=1e-12)


def test_invalid_path_is_neg_inf():
    y, temps, pp, ss, lp, sigma = _setup(overlaps=False, T=500)
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    x_ref, _ = ref.viterbi(y, ss.states, edges, temps, sigma)
    x_bad = np.array(x_ref)
    # jump from silence straight to ring position 5 of neuron 0: invalid
    sil = np.nonzero(x_bad[:-1] == 0)[0][0]
    x_bad[sil + 1] = 1 + 4
    assert path_cumulative_ll(y, x_bad, ss.states, temps, sigma, lp) == -np.inf


def test_nonsilent_start_uses_emission_prefix():
    # a path that starts mid-spike: prefix_0 is the emission, not 0
    y, temps, pp, ss, lp, sigma = _setup(overlaps=False, T=300)
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    x_ref, ll_ref = ref.viterbi(y, ss.states, edges, temps, sigma)
    # the oracle forces T1[0,0]=0 only for state 0; when the decoded path
    # starts non-silent its t=0 score is the emission — both conventions
    # are exercised by toggling silent_start on an all-silent prefix path
    ll_a = path_cumulative_ll(y, x_ref, ss.states, temps, sigma, lp,
                              silent_start=True)
    ll_b = path_cumulative_ll(y, x_ref, ss.states, temps, sigma, lp,
                              silent_start=False)
    if x_ref[0] == 0:
        # difference is (T-1) copies of the t=0 emission entering every
        # later prefix term
        smu0 = temps[ss.states[:, 0], np.arange(temps.shape[1])].sum()
        em0 = (-0.9189385332046727 - np.log(sigma)
               - (y[0] - smu0) ** 2 / (2 * sigma * sigma))
        assert ll_b - ll_a == pytest.approx((len(y) - 1) * em0, rel=1e-9)
    assert ll_a == pytest.approx(ll_ref, rel=1e-12)


def test_fast_decode_ll_finite_and_matches_sequential_overlap():
    """VERDICT #1a: --engine fast on the CLI's overlap topology now reports
    a finite ll that equals the sequential engine's whenever labels agree."""
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model,
                                               fit_spiking_model_fast)

    y, temps, pp, ss, lp, sigma = _setup(K=60, T=20000, overlaps=True)
    tm = HMMTemplateModel(mu=temps, sigma=sigma, lp=lp, allow_overlaps=True)
    seq = fit_spiking_model(tm, y)
    fast = fit_spiking_model_fast(tm, y, L=4096, H=512)
    assert np.isfinite(fast.ll)
    if np.array_equal(np.asarray(fast.ml_seq), np.asarray(seq.ml_seq)):
        assert fast.ll == pytest.approx(seq.ll, rel=1e-12)
    else:
        # protocol seams may differ from the whole-signal argmax path; the
        # fast ll is then the exact score of the returned path — still
        # finite and close
        assert fast.ll == pytest.approx(seq.ll, rel=1e-3)


@pytest.mark.parametrize("seed", range(8))
def test_matches_oracle_ll_randomized(seed):
    """Property check over random small topologies (N in {1,2,3}, K in
    [5, 16], overlaps on/off, random rates/noise): the telescoped path
    score always equals the oracle's ll on the decoded path."""
    rng = np.random.default_rng(1000 + seed)
    N = int(rng.integers(1, 4))
    K = int(rng.integers(5, 17))
    overlaps = bool(rng.integers(0, 2)) and N >= 2
    T = int(rng.integers(200, 800))
    temps = np.stack([create_spike_template(
        K, 1.0 + 2 * rng.random(), 0.2 + 0.6 * rng.random(),
        0.1 + 0.3 * rng.random()) for _ in range(N)], axis=1)
    pp = rng.uniform(0.005, 0.05, N)
    sigma = 0.2 + 0.4 * rng.random()
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, overlaps)
    lp = np.log(pp)
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    x_ref, ll_ref = ref.viterbi(y, ss.states, edges, temps, sigma)
    ll = path_cumulative_ll(y, x_ref, ss.states, temps, sigma, lp)
    assert ll == pytest.approx(ll_ref, rel=1e-11)
