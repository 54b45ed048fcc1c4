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


# ---------------------------------------------------------------------------
# multi-channel posteriors
# ---------------------------------------------------------------------------


def _dense_mc_gamma_oracle(yc, tmc):
    """Materialized (T, S) gamma from the dense multi-channel emission —
    the oracle the factorized-stream engines must reproduce."""
    from scipy.special import logsumexp

    ss = tmc.state_space
    states = np.asarray(ss.states)                   # (N, S)
    mu = np.asarray(tmc.mu, np.float64)              # (K, N, C)
    sig = np.asarray(tmc.sigmas, np.float64)
    T, C = yc.shape
    S = ss.nstates
    means = np.zeros((S, C))
    for n in range(states.shape[0]):
        means += mu[states[n], n, :]
    const = np.sum(-0.5 * np.log(2 * np.pi) - np.log(sig))
    em = const - (((yc[:, None, :] - means[None, :, :]) ** 2)
                  / (2 * sig**2)).sum(axis=2)        # (T, S)
    in_idx, in_w = ss.in_table(tmc.lp)
    out_idx, out_w = ss.out_table(tmc.lp)
    alpha = np.empty((T, S))
    alpha[0] = em[0]
    for t in range(1, T):
        alpha[t] = em[t] + logsumexp(alpha[t - 1][in_idx] + in_w, axis=1)
    beta = np.zeros((T, S))
    for t in range(T - 2, -1, -1):
        beta[t] = logsumexp((beta[t + 1] + em[t + 1])[out_idx] + out_w,
                            axis=1)
    return alpha + beta - logsumexp(alpha[-1])


def _mc_case(T=800, K=9, n=2, overlaps=True, seed=5):
    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC

    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3),
                      create_spike_template(K, 2.6, 0.6, 0.25)][:n], axis=1)
    pp = np.array([0.012, 0.008, 0.01][:n])
    rng = np.random.default_rng(seed)
    y, truth = create_signal(T, 0.3, pp, temps, rng=rng)
    y2 = 0.6 * y + 0.2 * rng.standard_normal(T)
    yc = np.stack([y, y2], axis=1)                   # (T, 2)
    mu = np.stack([temps, 0.6 * temps], axis=2)      # (K, n, 2)
    tmc = HMMTemplateModelMC(mu=mu, sigmas=np.array([0.3, 0.2]),
                             lp=np.log(pp), allow_overlaps=overlaps)
    return yc, truth, tmc


@pytest.mark.parametrize("overlaps,n", [(False, 2), (True, 2), (True, 3)])
def test_mc_onset_posteriors_match_dense_oracle(overlaps, n):
    yc, _, tmc = _mc_case(n=n, overlaps=overlaps)
    lg = _dense_mc_gamma_oracle(yc, tmc)
    proj = posterior.onset_projection(tmc.state_space.states)
    dense = np.exp(lg) @ proj
    blocked = posterior.onset_posteriors_mc(tmc, yc, block=300)
    np.testing.assert_allclose(blocked, dense, rtol=1e-7, atol=1e-10)


def test_mc_posteriors_c1_reduce_to_sc():
    """A C=1 MC model must reproduce the single-channel marginals."""
    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC

    K = 9
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3)], axis=1)
    pp = np.array([0.012, 0.008])
    y, _ = create_signal(900, 0.3, pp, temps, rng=np.random.default_rng(2))
    tm = api.HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    tmc = HMMTemplateModelMC(mu=temps[:, :, None],
                             sigmas=np.array([0.3]),
                             lp=np.log(pp), allow_overlaps=True)
    p_sc = posterior.onset_posteriors(tm, y, block=400)
    p_mc = posterior.onset_posteriors_mc(tmc, y[:, None], block=400)
    np.testing.assert_allclose(p_mc, p_sc, rtol=1e-7, atol=1e-10)


def test_mc_spike_confidence():
    from hmmspikesorter_tpu.models.multichannel import fit_spiking_model_mc

    yc, truth, tmc = _mc_case(T=4000)
    model = fit_spiking_model_mc(tmc, yc)
    confs = posterior.spike_confidence(model)
    assert len(confs) == 2
    for n in range(2):
        if len(confs[n]):
            assert np.median(confs[n]) > 0.5, (n, np.median(confs[n]))


@pytest.mark.slow
def test_posterior_randomized_exactness_sweep():
    """Random (K, N, overlaps, T, block) draws: the structural log-plus
    engines must reproduce the gather-table FB marginals on every drawn
    topology, and gammas projected onto the all-states indicator must
    normalize to 1 (blocked two-pass included)."""
    rng = np.random.default_rng(77)
    for trial in range(6):
        K = int(rng.integers(6, 13))
        N = int(rng.integers(1, 4))
        overlaps = bool(rng.integers(0, 2))
        T = int(rng.integers(300, 1400))
        block = int(rng.integers(60, 500))
        sigma = float(0.15 + 0.3 * rng.random())
        pp = 10.0 ** (-rng.uniform(1.5, 2.3, N))
        temps = np.stack(
            [create_spike_template(K, 2.0 + rng.random() * 2,
                                   0.3 + 0.5 * rng.random(),
                                   0.15 + 0.15 * rng.random())
             for _ in range(N)], axis=1)
        y, _ = create_signal(T, sigma, pp, temps,
                             rng=np.random.default_rng(900 + trial))
        tm = api.HMMTemplateModel(temps, sigma, np.log(pp),
                                  allow_overlaps=overlaps)
        msg = (f"trial {trial}: T={T} K={K} N={N} overlaps={overlaps} "
               f"block={block}")
        p_ring = posterior.onset_posteriors(tm, y, block=block)
        p_gather = posterior.onset_posteriors(tm, y, block=block,
                                              _force_gather=True)
        np.testing.assert_allclose(p_ring, p_gather, rtol=1e-8,
                                   atol=1e-12, err_msg=msg)
        # normalization through the blocked machinery: project onto the
        # all-ones indicator -> every row must sum to 1
        ones = np.ones((tm.state_space.nstates, 1))
        tot = posterior.onset_posteriors(tm, y, block=block, proj=ones)
        np.testing.assert_allclose(tot[:, 0], 1.0, rtol=1e-8, err_msg=msg)


@pytest.mark.parametrize("overlaps,n", [(False, 2), (True, 2), (True, 3)])
def test_windowed_posteriors_match_exact(overlaps, n):
    """The halo-windowed parallel mode must match the exact two-pass to
    mixing-limited accuracy (H of a few K on silence-dominated signals),
    ragged tails included."""
    K = 9
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3),
                      create_spike_template(K, 2.6, 0.6, 0.25)][:n], axis=1)
    pp = np.array([0.012, 0.008, 0.01][:n])
    T = 3000 + 137                                   # ragged tail
    y, _ = create_signal(T, 0.3, pp, temps, rng=np.random.default_rng(3))
    tm = api.HMMTemplateModel(temps, 0.3, np.log(pp),
                              allow_overlaps=overlaps)
    exact = posterior.onset_posteriors(tm, y, block=700)
    win = posterior.onset_posteriors_windowed(tm, y, L=512, H=64,
                                              batch_windows=3)
    assert win.shape == exact.shape
    assert np.max(np.abs(win - exact)) < 1e-6, np.max(np.abs(win - exact))


def test_windowed_posteriors_short_signal_falls_back():
    y, _, tm = _case(T=900)
    exact = posterior.onset_posteriors(tm, y)
    win = posterior.onset_posteriors_windowed(tm, y, L=2048, H=128)
    np.testing.assert_allclose(win, exact, rtol=1e-12)


@pytest.mark.parametrize("overlaps,n", [(False, 2), (True, 2), (True, 3)])
def test_windowed_mc_posteriors_match_exact(overlaps, n):
    yc, _, tmc = _mc_case(T=3000 + 89, n=n, overlaps=overlaps)
    exact = posterior.onset_posteriors_mc(tmc, yc, block=700)
    win = posterior.onset_posteriors_windowed_mc(tmc, yc, L=512, H=64,
                                                 batch_windows=3)
    assert win.shape == exact.shape
    assert np.max(np.abs(win - exact)) < 1e-6, np.max(np.abs(win - exact))


def test_extract_units_with_confidence(tmp_path):
    """Unit files gain per-spike confidence aligned with the timestamps
    (onset-matched; NaN for a spike already in progress at sample 0)."""
    from hmmspikesorter_tpu.io import extraction

    y, truth, tm = _case(T=4000)
    model = api.fit_spiking_model_fast(tm, y, L=1024, H=64,
                                       transfer="events")
    units = extraction.extract_units(model, 1, with_confidence=True)
    confs = posterior.spike_confidence(model)
    for i, (name, payload) in enumerate(sorted(units.items())):
        ts = np.atleast_1d(payload["timestamps"])
        c = np.atleast_1d(payload["confidence"])
        assert len(c) == len(ts)
        finite = np.isfinite(c)
        # every matched confidence comes from the spike_confidence list
        assert set(np.round(c[finite], 12)).issubset(
            set(np.round(np.asarray(confs[i]), 12)))
        if finite.any():
            assert np.median(c[finite]) > 0.5
    # roundtrip through the MAT files
    extraction.save_units(units, str(tmp_path / "sorted"))
    back = extraction.load_unit(
        str(tmp_path / "sorted" / sorted(units)[0]))
    assert "confidence" in back


# ------------------------------------------------------------------
# chained exact parallel posteriors (onset_posteriors_chained[_mc])

def _sc_case_n(N, K, T, overlaps, seed=1):
    temps = np.stack([create_spike_template(K, 3.0 + n, 0.6 + 0.1 * n, 0.2)
                      for n in range(N)], axis=1)
    pp = np.full(N, 0.008)
    y, truth = create_signal(T, 0.3, pp, temps,
                             rng=np.random.default_rng(seed))
    tm = api.HMMTemplateModel(temps, 0.3, np.log(pp),
                              allow_overlaps=overlaps)
    return y, tm


@pytest.mark.parametrize("overlaps,N,K,T,L", [
    (False, 3, 12, 9000, 1024),     # nov, ragged tail
    (False, 2, 12, 8192, 1024),     # nov, exact multiple
    (True, 2, 12, 9000, 1024),      # ov2
    (True, 3, 9, 7000, 1024),       # any-N overlap
])
def test_chained_matches_exact_1e8(overlaps, N, K, T, L):
    """The chained parallel two-pass IS the exact computation: f64 anchor
    at 1e-8 vs the sequential exact path (itself oracle-anchored) on
    every topology (VERDICT r4 item 2)."""
    y, tm = _sc_case_n(N, K, T, overlaps)
    p_ex = posterior.onset_posteriors(tm, y)
    p_ch = posterior.onset_posteriors_chained(tm, y, L=L)
    assert np.abs(p_ex - p_ch).max() < 1e-8


def test_chained_refine_and_short_fallback():
    y, tm = _sc_case_n(2, 12, 2000, True)
    p_ex = posterior.onset_posteriors(tm, y)
    # B < 2 windows: falls back to the exact sequential path
    p_short = posterior.onset_posteriors_chained(tm, y, L=4096)
    np.testing.assert_allclose(p_short, p_ex, atol=1e-12)
    # refine > 1 changes nothing on a physiological signal
    p1 = posterior.onset_posteriors_chained(tm, y, L=512, refine=1)
    p2 = posterior.onset_posteriors_chained(tm, y, L=512, refine=2)
    assert np.abs(p1 - p_ex).max() < 1e-8
    assert np.abs(p2 - p1).max() < 1e-10


@pytest.mark.parametrize("overlaps,N,C", [(False, 2, 3), (True, 2, 2),
                                          (True, 3, 2)])
def test_chained_mc_matches_exact_1e8(overlaps, N, C):
    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC

    K, T, L = 10, 6000, 1024
    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(K, 3.0 + n, 0.6 + 0.1 * n, 0.2)
                      for n in range(N)], axis=1)
    gains = rng.uniform(0.3, 1.0, (N, C))
    mu = temps[:, :, None] * gains[None, :, :]
    pp = np.full(N, 0.008)
    sig = rng.uniform(0.25, 0.35, C)
    yc = sig[None, :] * rng.standard_normal((T, C))
    _, truth = create_signal(T, 0.3, pp, temps,
                             rng=np.random.default_rng(9))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    tmc = HMMTemplateModelMC(mu, sig, np.log(pp), allow_overlaps=overlaps)
    p_ex = posterior.onset_posteriors_mc(tmc, yc)
    p_ch = posterior.onset_posteriors_chained_mc(tmc, yc, L=L)
    assert np.abs(p_ex - p_ch).max() < 1e-8


def test_model_posteriors_long_routes_chained_and_is_exact():
    """model_posteriors (the QC/confidence entry) stays EXACT on long
    recordings — the chained route must match the sequential exact path,
    not the windowed approximation."""
    y, tm = _sc_case_n(2, 12, 10000, True)
    m = api.fit_spiking_model_fast(tm, y, L=2048, H=64, transfer="events")
    p = posterior.model_posteriors(m)
    p_ex = posterior.onset_posteriors(tm, y)
    assert np.abs(p - p_ex).max() < 1e-8
