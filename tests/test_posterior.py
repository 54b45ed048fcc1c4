"""Posterior/confidence API (core/posterior.py): the blocked two-pass
onset marginals must match the fully materialized gamma exactly, gammas
must normalize, and decoded spikes on a clean synthetic must carry high
posterior support."""

import numpy as np
import jax.numpy as jnp
import pytest

from hmmspikesorter_tpu.core import posterior
from hmmspikesorter_tpu.core.emission import state_means
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.models import api


def _case(T=3000, K=12, sigma=0.3, overlaps=True):
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3)], axis=1)
    pp = np.array([0.01, 0.006])
    y, truth = create_signal(T, sigma, pp, temps,
                             rng=np.random.default_rng(4))
    tm = api.HMMTemplateModel(temps, sigma, np.log(pp),
                              allow_overlaps=overlaps)
    return y, truth, tm


def test_gamma_normalizes():
    y, _, tm = _case(T=400, overlaps=False)
    ss = tm.state_space
    in_idx, in_w = ss.in_table(tm.lp)
    out_idx, out_w = ss.out_table(tm.lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(tm.mu))
    lg = posterior.state_log_posteriors(
        jnp.asarray(y), jnp.asarray(in_idx), jnp.asarray(in_w),
        jnp.asarray(out_idx), jnp.asarray(out_w), smu,
        jnp.asarray(tm.sigma))
    sums = np.exp(np.asarray(lg)).sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-9)


@pytest.mark.parametrize("overlaps", [False, True])
@pytest.mark.parametrize("block", [256, 1000])
def test_blocked_onset_posteriors_match_materialized(overlaps, block):
    y, _, tm = _case(T=1500, overlaps=overlaps)
    ss = tm.state_space
    in_idx, in_w = ss.in_table(tm.lp)
    out_idx, out_w = ss.out_table(tm.lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(tm.mu))
    lg = np.asarray(posterior.state_log_posteriors(
        jnp.asarray(y), jnp.asarray(in_idx), jnp.asarray(in_w),
        jnp.asarray(out_idx), jnp.asarray(out_w), smu,
        jnp.asarray(tm.sigma)))
    proj = posterior.onset_projection(ss.states)
    dense = np.exp(lg) @ proj
    blocked = posterior.onset_posteriors(tm, y, block=block)
    np.testing.assert_allclose(blocked, dense, rtol=1e-9, atol=1e-12)


def test_total_onset_mass_matches_spike_count():
    """Sum_t P(onset at t) is the posterior expected onset count — on a
    clean synthetic it must sit near the true count."""
    y, truth, tm = _case(T=6000)
    p = posterior.onset_posteriors(tm, y)
    for n in range(2):
        expected = p[:, n].sum()
        true_count = (truth[n] == 1).sum()
        assert abs(expected - true_count) <= max(2, 0.15 * true_count), \
            (n, expected, true_count)


def test_spike_confidence_high_on_clean_spikes():
    y, truth, tm = _case(T=6000)
    model = api.fit_spiking_model_fast(tm, y, L=1024, H=64,
                                       transfer="events")
    confs = posterior.spike_confidence(model)
    assert len(confs) == 2
    for n in range(2):
        assert len(confs[n]) == len(model.spike_onsets[n])
        if len(confs[n]):
            # clean high-SNR spikes: most decoded onsets carry strong
            # posterior support. Confidence is a windowed posterior MASS,
            # not a probability — stray onset mass inside the window can
            # push it slightly past 1.
            assert np.median(confs[n]) > 0.6, (n, np.median(confs[n]))
            assert confs[n].max() <= 1.05


def test_spike_confidence_from_dense_labels():
    """Without spike_onsets on the model (dense transfer), onsets are
    recovered from the labels; confidences must agree."""
    y, _, tm = _case(T=3000)
    m_ev = api.fit_spiking_model_fast(tm, y, L=1024, H=64,
                                      transfer="events")
    m_dn = api.fit_spiking_model_fast(tm, y, L=1024, H=64,
                                      transfer="dense")
    c_ev = posterior.spike_confidence(m_ev)
    c_dn = posterior.spike_confidence(m_dn)
    for n in range(2):
        np.testing.assert_allclose(c_ev[n], c_dn[n], rtol=1e-12)


def test_active_projection_variant():
    """proj override: actively-spiking marginals dominate onset marginals
    and stay in [0, 1]."""
    y, _, tm = _case(T=1200)
    ss = tm.state_space
    active = (np.asarray(ss.states) > 0).T.astype(np.float64)
    pa = posterior.onset_posteriors(tm, y, proj=active)
    po = posterior.onset_posteriors(tm, y)
    assert (pa >= po - 1e-9).all()
    assert pa.max() <= 1.0 + 1e-9


@pytest.mark.parametrize("overlaps,n", [(False, 1), (False, 2), (False, 3),
                                        (True, 2), (True, 3), (True, 4)])
def test_ring_fb_engines_match_gather(overlaps, n):
    """The structural log-plus engines (nov any-N, ov2, table-driven
    any-N overlap) must reproduce the gather-table FB marginals to
    float-roundoff on every covered topology."""
    K = 9
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3),
                      create_spike_template(K, 2.6, 0.6, 0.25),
                      create_spike_template(K, 1.8, 0.7, 0.2)][:n], axis=1)
    pp = np.array([0.012, 0.008, 0.01, 0.009][:n])
    y, _ = create_signal(1200, 0.3, pp, temps,
                         rng=np.random.default_rng(8))
    tm = api.HMMTemplateModel(temps, 0.3, np.log(pp),
                              allow_overlaps=overlaps)
    assert posterior._ring_fb_block_fn(tm) is not None
    p_ring = posterior.onset_posteriors(tm, y, block=500)
    p_gather = posterior.onset_posteriors(tm, y, block=500,
                                          _force_gather=True)
    np.testing.assert_allclose(p_ring, p_gather, rtol=1e-8, atol=1e-12)
