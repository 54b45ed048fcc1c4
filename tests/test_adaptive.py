"""Drift-adaptive tracking (train/adaptive.py): statistic-interface
exactness anchors, the stationary reduction to the fast decode path, and
the functional drift-recovery property the feature exists for."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.data.synthetic import (
    create_drifting_signal, create_signal, create_spike_template)
from hmmspikesorter_tpu.models.api import (
    HMMTemplateModel, fit_spiking_model_fast)
from hmmspikesorter_tpu.train.adaptive import (
    DriftTrack, decode_tracked, track_drift)
from hmmspikesorter_tpu.train.em import (
    EMTables, _m_step_from_stats, em_chunk_stats, em_step)


def _onset_errors(onsets, truth, tol=2):
    """False + missed detections under a ONE-TO-ONE greedy matching of
    decoded to true onsets within +-tol (two-pointer over the sorted
    lists — maximal for interval matching, so a double-detection can
    never cancel a miss)."""
    tot = 0
    for n in range(truth.shape[0]):
        to = np.sort(np.nonzero(truth[n] == 1)[0])
        dec = np.sort(np.asarray(onsets[n], np.int64))
        i = j = hit = 0
        while i < len(dec) and j < len(to):
            if abs(int(dec[i]) - int(to[j])) <= tol:
                hit += 1
                i += 1
                j += 1
            elif dec[i] < to[j] - tol:
                i += 1
            else:
                j += 1
        tot += (len(dec) - hit) + (len(to) - hit)
    return tot


def _model_onsets(model, N, K, overlaps=True):
    ons = model.spike_onsets
    if ons is None:
        from hmmspikesorter_tpu.core.events import _onsets_dense

        ons = _onsets_dense(np.asarray(model.ml_seq), N=N, K=K,
                            overlaps=overlaps)
    return ons


def _case(N=2, K=8, T=600, sigma=0.35, seed=7):
    rng = np.random.default_rng(seed)
    temps = np.stack(
        [create_spike_template(K, 3.0, 0.8, 0.2),
         create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.01, 0.006][:N])
    y, truth = create_signal(T, sigma, pp, temps, rng=rng)
    return y, temps, np.log(pp), sigma, truth


@pytest.mark.parametrize("fb_mode", ["ring", "gather", "blocked"])
def test_chunk_stats_plus_m_step_equals_em_step(fb_mode):
    """em_step literally is _m_step_from_stats over one chunk's
    statistics — the identity the online blend relies on."""
    y, temps, lp, sigma, _ = _case()
    K, N = temps.shape
    tables = EMTables.build(build_state_space(N, K, False))
    y_d = jnp.asarray(y)
    args = (y_d, jnp.asarray(lp), jnp.asarray(temps), jnp.asarray(sigma),
            tables)
    lp1, _, mu1, sg1, ll1 = em_step(*args, K=K, fb_mode=fb_mode, block=64)
    G1, Gy, Gy2, X, Xd, ll2 = em_chunk_stats(*args, K=K, fb_mode=fb_mode,
                                             block=64)
    lp2, mu2, sg2 = _m_step_from_stats(G1, Gy, Gy2, jnp.log(X),
                                       jnp.log(Xd), tables.states,
                                       temps.dtype, K, N)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=0, atol=1e-12)
    assert float(sg1) == pytest.approx(float(sg2), abs=1e-13)
    assert float(ll1) == pytest.approx(float(ll2), abs=1e-9)


def test_single_chunk_full_forget_is_one_em_step():
    """One chunk covering the signal with forget=1 reproduces em_step
    (per-sample normalization cancels in the scale-invariant M-step)."""
    y, temps, lp, sigma, _ = _case()
    K, N = temps.shape
    tables = EMTables.build(build_state_space(N, K, False))
    lp1, _, mu1, sg1, _ = em_step(
        jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
        jnp.asarray(sigma), tables, K=K, fb_mode="ring")
    tm = HMMTemplateModel(temps, sigma, lp)
    tr = track_drift(tm, y, chunk=len(y), forget=1.0, fb_mode="ring")
    assert tr.n_chunks == 1
    np.testing.assert_allclose(tr.lp[0], np.asarray(lp1), rtol=0,
                               atol=1e-10)
    np.testing.assert_allclose(tr.mu[0], np.asarray(mu1), rtol=0,
                               atol=1e-10)
    assert tr.sigma[0] == pytest.approx(float(sg1), abs=1e-12)


def test_stationary_track_decode_matches_fast_path():
    """Constant parameters across chunks: decode_tracked is the ordinary
    overlap-save decode — labels bit-equal fit_spiking_model_fast with
    the same window geometry."""
    y, temps, lp, sigma, _ = _case(T=6000, K=8)
    K, N = temps.shape
    tm = HMMTemplateModel(temps, sigma, lp, allow_overlaps=True)
    chunk, H = 2000, 64
    B = -(-len(y) // chunk)
    tr = DriftTrack(lp=np.tile(lp, (B, 1)), mu=np.tile(temps, (B, 1, 1)),
                    sigma=np.full(B, sigma), lls=np.zeros(B),
                    bounds=[(s, min(s + chunk, len(y)))
                            for s in range(0, len(y), chunk)],
                    chunk=chunk, forget=1.0, allow_overlaps=True)
    mt = decode_tracked(tr, y, H=H)
    mf = fit_spiking_model_fast(tm, y, L=chunk, H=H)
    np.testing.assert_array_equal(np.asarray(mt.ml_seq),
                                  np.asarray(mf.ml_seq))
    assert mt.ll == pytest.approx(mf.ll, rel=1e-12)


def test_tracker_recovers_drift_static_decode_does_not():
    """The feature's reason to exist: on a 2x amplitude drift the static
    decode mis-detects (double-counts grown spikes) while the tracker
    follows the drift and decodes the exact truth."""
    K = 20
    rng = np.random.default_rng(3)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    T = 1 << 16
    y, truth, _ = create_drifting_signal(T, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=rng)
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)

    m_static = fit_spiking_model_fast(tm, y, L=4096, H=64,
                                      transfer="events")
    tr = track_drift(tm, y, chunk=8192, forget=0.4, fb_mode="ring")
    m_tracked = decode_tracked(tr, y)

    e_static = _onset_errors(m_static.spike_onsets, truth)
    e_tracked = _onset_errors(m_tracked.spike_onsets, truth)
    assert e_static >= 20          # the drift genuinely breaks static decode
    assert e_tracked == 0          # ...and tracking fully recovers it
    assert np.isfinite(m_tracked.ll)
    assert np.asarray(m_tracked.seam_ok).all()
    # the tracked amplitude follows the drift upward
    amp = np.abs(tr.mu[:, :, 0]).max(axis=1) / np.abs(temps[:, 0]).max()
    assert amp[-1] > 1.5
    assert np.all(np.diff(amp) > -0.05)


def test_track_tail_chunk_inherits_params():
    """A tail chunk too short for statistics carries the previous
    parameters and a NaN ll marker instead of updating on noise."""
    y, temps, lp, sigma, _ = _case(T=4096 + 100, K=8)
    tm = HMMTemplateModel(temps, sigma, lp)
    tr = track_drift(tm, y, chunk=4096, forget=0.5, fb_mode="ring")
    assert tr.n_chunks == 2
    np.testing.assert_array_equal(tr.lp[1], tr.lp[0])
    np.testing.assert_array_equal(tr.mu[1], tr.mu[0])
    assert np.isnan(tr.lls[1]) and np.isfinite(tr.lls[0])


def test_track_guards():
    y, temps, lp, sigma, _ = _case()
    tm = HMMTemplateModel(temps, sigma, lp)
    with pytest.raises(ValueError, match="forget"):
        track_drift(tm, y, forget=0.0)
    with pytest.raises(ValueError, match=r"\(T,\)"):
        track_drift(tm, np.zeros((10, 2)))
    tr = track_drift(tm, y, chunk=len(y), forget=1.0, fb_mode="ring")
    with pytest.raises(ValueError, match="does not cover"):
        decode_tracked(tr, y[:-10])


def test_tracked_posteriors_stationary_reduction():
    """A constant-parameter track: onset_posteriors_tracked is literally
    the stationary windowed posterior (broadcast vs gathered parameter
    rows feed the same compiled function)."""
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors_tracked, onset_posteriors_windowed)

    y, temps, lp, sigma, _ = _case(T=6000, K=8)
    tm = HMMTemplateModel(temps, sigma, lp, allow_overlaps=True)
    chunk = 2000
    B = -(-len(y) // chunk)
    tr = DriftTrack(lp=np.tile(lp, (B, 1)), mu=np.tile(temps, (B, 1, 1)),
                    sigma=np.full(B, sigma), lls=np.zeros(B),
                    bounds=[(s, min(s + chunk, len(y)))
                            for s in range(0, len(y), chunk)],
                    chunk=chunk, forget=1.0, allow_overlaps=True)
    p_tr = onset_posteriors_tracked(tr, y, L=500, H=100)
    p_st = onset_posteriors_windowed(tm, y, L=500, H=100)
    np.testing.assert_array_equal(p_tr, p_st)


def test_tracked_confidence_under_drift():
    """Per-spike confidence on a drift-decoded model scores each spike
    under the chunk parameters that decoded it: medians stay high across
    the drift and the posterior expected counts match the truth."""
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors_tracked, spike_confidence)

    K = 20
    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    T = 1 << 15
    y, truth, _ = create_drifting_signal(T, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=rng)
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    tr = track_drift(tm, y, chunk=4096, forget=0.5, fb_mode="ring")
    m = decode_tracked(tr, y)
    conf = spike_confidence(m)            # routed via model.track
    for n, c in enumerate(conf):
        assert len(c) == len(m.spike_onsets[n])
        if len(c):
            assert np.median(c) > 0.9
    p = onset_posteriors_tracked(tr, y, L=1024, H=128)
    for n in range(2):
        assert abs(p[:, n].sum() - (truth[n] == 1).sum()) < 2.0


def test_tracked_posteriors_guards():
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors_tracked, onset_posteriors_windowed)

    y, temps, lp, sigma, _ = _case(T=6000, K=8)
    tm = HMMTemplateModel(temps, sigma, lp)
    tr = track_drift(tm, y, chunk=3000, forget=0.5, fb_mode="ring")
    with pytest.raises(ValueError, match="does not cover"):
        onset_posteriors_tracked(tr, y[:-5])
    # a window length that does NOT divide the chunk is allowed: owner-
    # by-core-start, bounded < L-sample parameter offset at boundaries.
    # With a constant-parameter track it stays exactly the stationary
    # windowed posterior.
    B = tr.n_chunks
    tr_const = DriftTrack(lp=np.tile(lp, (B, 1)),
                          mu=np.tile(temps, (B, 1, 1)),
                          sigma=np.full(B, sigma), lls=tr.lls,
                          bounds=tr.bounds, chunk=tr.chunk, forget=0.5,
                          allow_overlaps=False)
    p = onset_posteriors_tracked(tr_const, y, L=999, H=100)
    p_st = onset_posteriors_windowed(tm, y, L=999, H=100)
    np.testing.assert_array_equal(p, p_st)


def test_cli_adaptive(tmp_path):
    """--adaptive end-to-end: drifted recording -> tracked decode with
    exact onset counts and per-chunk-parameter confidence scores."""
    import h5py

    from hmmspikesorter_tpu import cli

    K = 20
    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    T = 1 << 15
    y, truth, _ = create_drifting_signal(T, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=rng)
    tfile = str(tmp_path / "templates.h5")
    dfile = str(tmp_path / "data.h5")
    with h5py.File(tfile, "w") as f:
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([[1.0 / 0.3**2]])
        f["p"] = pp
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = y
    out = cli.sort_data(tfile, dfile, str(tmp_path / "o.mat"),
                        adaptive=True, adapt_chunk=4096, forget=0.5,
                        confidence=True)
    assert set(out) == {"mlseq", "ll", "waveforms", "lp", "sigma",
                        "confidence"}
    for n in range(2):
        dec = int((out["mlseq"][n] == 2).sum())     # 1-based: onset == 2
        tc = int((truth[n] == 1).sum())
        assert abs(dec - tc) <= 1, (n, dec, tc)
        assert len(out["confidence"][n]) == dec
    assert np.isfinite(out["ll"])




# ---- multi-channel mirror ------------------------------------------------

def _mc_case(K=8, C=3, T=6000, seed=9):
    rng = np.random.default_rng(seed)
    base = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                     create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    gains = np.array([[1.0, 0.5, 0.2], [0.3, 1.0, 0.6]])[:, :C]
    mu = base[:, :, None] * gains[None, :, :]            # (K, N, C)
    sigmas = np.array([0.3, 0.25, 0.35])[:C]
    pp = np.array([0.008, 0.004])
    _, truth, _ = create_drifting_signal(T, 1e-9, pp, base,
                                         scale_start=1.0, scale_end=1.0,
                                         rng=np.random.default_rng(seed))
    yc = np.zeros((T, C))
    for n in range(2):
        for t0 in np.nonzero(truth[n] == 1)[0]:
            nlen = min(K, T - t0)
            yc[t0:t0 + nlen] += mu[:nlen, n, :]
    yc += sigmas[None, :] * rng.standard_normal((T, C))
    return yc, mu, sigmas, np.log(pp), truth


def test_mc_chunk_stats_plus_m_step_equals_em_step_mc():
    from hmmspikesorter_tpu.train.em_mc import (
        _m_step_from_stats_mc, em_chunk_stats_mc, em_step_mc)

    yc, mu, sigmas, lp, _ = _mc_case(T=800)
    K, N, C = mu.shape
    tables = EMTables.build(build_state_space(N, K, False))
    args = (jnp.asarray(yc), jnp.asarray(lp), jnp.asarray(mu),
            jnp.asarray(sigmas), tables)
    lp1, _, mu1, sg1, ll1 = em_step_mc(*args, K=K, fb_mode="gather")
    G1, Gy, Gy2, X, Xd, ll2 = em_chunk_stats_mc(*args, K=K,
                                                fb_mode="gather")
    lp2, mu2, sg2 = _m_step_from_stats_mc(G1, Gy, Gy2, jnp.log(X),
                                          jnp.log(Xd), mu.dtype, K, N, C)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sg1), np.asarray(sg2),
                               rtol=0, atol=1e-13)
    assert float(ll1) == pytest.approx(float(ll2), abs=1e-9)


def test_mc_stationary_track_decode_matches_fast_path():
    from hmmspikesorter_tpu.models.multichannel import (
        HMMTemplateModelMC, fit_spiking_model_mc_fast)
    from hmmspikesorter_tpu.train.adaptive import decode_tracked_mc

    yc, mu, sigmas, lp, _ = _mc_case()
    tm = HMMTemplateModelMC(mu, sigmas, lp, allow_overlaps=True)
    chunk, H = 2000, 64
    B = -(-len(yc) // chunk)
    tr = DriftTrack(lp=np.tile(lp, (B, 1)), mu=np.tile(mu, (B, 1, 1, 1)),
                    sigma=np.tile(sigmas, (B, 1)), lls=np.zeros(B),
                    bounds=[(s, min(s + chunk, len(yc)))
                            for s in range(0, len(yc), chunk)],
                    chunk=chunk, forget=1.0, allow_overlaps=True)
    mt = decode_tracked_mc(tr, yc, H=H)
    mf = fit_spiking_model_mc_fast(tm, yc, L=chunk, H=H)
    np.testing.assert_array_equal(np.asarray(mt.ml_seq),
                                  np.asarray(mf.ml_seq))
    assert mt.ll == pytest.approx(mf.ll, rel=1e-12)


def test_mc_tracker_recovers_drift():
    """Joint MC tracking on a 2x amplitude drift: the tracker follows
    the per-channel templates and decodes the exact truth; confidence
    scores route through the MC tracked posterior."""
    from hmmspikesorter_tpu.core.events import _onsets_dense
    from hmmspikesorter_tpu.core.posterior import spike_confidence
    from hmmspikesorter_tpu.models.multichannel import (
        HMMTemplateModelMC, fit_spiking_model_mc_fast)
    from hmmspikesorter_tpu.train.adaptive import (
        decode_tracked_mc, track_drift_mc)

    K, C, T = 20, 3, 1 << 15
    rng = np.random.default_rng(4)
    base = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                     create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    gains = np.array([[1.0, 0.5, 0.2], [0.3, 1.0, 0.6]])
    mu = base[:, :, None] * gains[None, :, :]
    sigmas = np.array([0.3, 0.25, 0.35])
    pp = np.array([0.004, 0.002])
    _, truth, _ = create_drifting_signal(T, 1e-9, pp, base,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=np.random.default_rng(4))
    yc = np.zeros((T, C))
    for n in range(2):
        for t0 in np.nonzero(truth[n] == 1)[0]:
            nlen = min(K, T - t0)
            yc[t0:t0 + nlen] += (1.0 + t0 / T) * mu[:nlen, n, :]
    yc += sigmas[None, :] * rng.standard_normal((T, C))
    tm = HMMTemplateModelMC(mu, sigmas, lp=np.log(pp),
                            allow_overlaps=True)

    m_static = fit_spiking_model_mc_fast(tm, yc, L=4096, H=64)
    tr = track_drift_mc(tm, yc, chunk=4096, forget=0.5, fb_mode="gather")
    m = decode_tracked_mc(tr, yc)
    assert _onset_errors(_model_onsets(m_static, 2, K), truth) >= 5
    assert _onset_errors(_model_onsets(m, 2, K), truth) == 0
    assert np.isfinite(m.ll)
    amp = np.abs(tr.mu[:, :, 0, 0]).max(axis=1) / np.abs(mu[:, 0, 0]).max()
    assert amp[-1] > 1.5

    conf = spike_confidence(m)           # MC tracked-posterior routing
    for n, c in enumerate(conf):
        assert len(c) == len(m.spike_onsets[n])
        if len(c):
            assert np.median(c) > 0.9


def test_tracked_posteriors_mc_stationary_reduction():
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors_tracked_mc, onset_posteriors_windowed_mc)
    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC

    yc, mu, sigmas, lp, _ = _mc_case()
    tm = HMMTemplateModelMC(mu, sigmas, lp, allow_overlaps=True)
    chunk = 2000
    B = -(-len(yc) // chunk)
    tr = DriftTrack(lp=np.tile(lp, (B, 1)), mu=np.tile(mu, (B, 1, 1, 1)),
                    sigma=np.tile(sigmas, (B, 1)), lls=np.zeros(B),
                    bounds=[(s, min(s + chunk, len(yc)))
                            for s in range(0, len(yc), chunk)],
                    chunk=chunk, forget=1.0, allow_overlaps=True)
    p_tr = onset_posteriors_tracked_mc(tr, yc, L=500, H=100)
    p_st = onset_posteriors_windowed_mc(tm, yc, L=500, H=100)
    np.testing.assert_allclose(p_tr, p_st, rtol=0, atol=1e-10)


def test_cli_adaptive_multichannel(tmp_path):
    import h5py

    from hmmspikesorter_tpu import cli

    K, C, T = 20, 2, 1 << 14
    rng = np.random.default_rng(8)
    base = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                     create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    gains = np.array([[1.0, 0.5], [0.3, 1.0]])
    mu = base[:, :, None] * gains[None, :, :]
    sigmas = np.array([0.3, 0.25])
    pp = np.array([0.004, 0.002])
    _, truth, _ = create_drifting_signal(T, 1e-9, pp, base,
                                         scale_start=1.0, scale_end=1.8,
                                         rng=np.random.default_rng(8))
    yc = np.zeros((T, C))
    for n in range(2):
        for t0 in np.nonzero(truth[n] == 1)[0]:
            nlen = min(K, T - t0)
            yc[t0:t0 + nlen] += (1.0 + 0.8 * t0 / T) * mu[:nlen, n, :]
    yc += sigmas[None, :] * rng.standard_normal((T, C))

    tfile = str(tmp_path / "t.h5")
    dfile = str(tmp_path / "d.h5")
    with h5py.File(tfile, "w") as f:
        f["spikeForms"] = mu.T                  # (C?,)... Julia (K, C, N)
        f["cinv"] = np.diag(1.0 / sigmas ** 2)
        f["p"] = pp
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = yc.T          # (C, T)
    out = cli.sort_data(tfile, dfile, str(tmp_path / "o.mat"),
                        multichannel=True, adaptive=True,
                        adapt_chunk=4096, forget=0.5, confidence=True,
                        dosave=False)
    assert "confidence" in out
    for n in range(2):
        dec = int((out["mlseq"][n] == 2).sum())
        tc = int((truth[n] == 1).sum())
        assert abs(dec - tc) <= 1, (n, dec, tc)
    assert np.isfinite(out["ll"])


# ---- review-fix regressions ----------------------------------------------

def test_confidence_works_with_clamped_chunk():
    """Default adapt_chunk exceeding T clamps to a single whole-signal
    chunk; spike_confidence must still work (it used to demand
    chunk % 4096 == 0)."""
    from hmmspikesorter_tpu.core.posterior import spike_confidence
    from hmmspikesorter_tpu.models.api import fit_spiking_model_adaptive

    y, temps, lp, sigma, truth = _case(T=20_000, K=8)
    tm = HMMTemplateModel(temps, sigma, lp, allow_overlaps=True)
    m = fit_spiking_model_adaptive(tm, y, forget=1.0)   # chunk -> 20000
    conf = spike_confidence(m)
    for n, c in enumerate(conf):
        assert len(c) == len(m.spike_onsets[n])


def test_adaptive_zero_templates_null_model():
    """Training can prune every template: the adaptive fit keeps the
    stationary paths' degenerate all-silent contract."""
    from hmmspikesorter_tpu.models.api import fit_spiking_model_adaptive

    tm = HMMTemplateModel(np.zeros((8, 0)), 0.4, np.zeros(0),
                          allow_overlaps=True)
    y = 0.4 * np.random.default_rng(0).standard_normal(3000)
    m = fit_spiking_model_adaptive(tm, y)
    assert (np.asarray(m.ml_seq) == 0).all()
    assert np.isfinite(m.ll)
    assert m.spike_onsets == []


def test_short_signal_multichunk_protocol_decode():
    """T < chunk + 2H with a multi-chunk track: the decode must not fall
    back to chunk-0 parameters for the tail — with constant parameters
    the sequential protocol path reproduces the reference chunked decode
    exactly."""
    from hmmspikesorter_tpu.models.api import fit_spiking_model

    y, temps, lp, sigma, _ = _case(T=1100, K=8)
    tm = HMMTemplateModel(temps, sigma, lp, allow_overlaps=True)
    chunk, H = 1024, 48              # T=1100 < chunk + 2H = 1120, B=2
    B = 2
    tr = DriftTrack(lp=np.tile(lp, (B, 1)), mu=np.tile(temps, (B, 1, 1)),
                    sigma=np.full(B, sigma), lls=np.zeros(B),
                    bounds=[(0, 1024), (1024, 1100)], chunk=chunk,
                    forget=1.0, allow_overlaps=True)
    mt = decode_tracked(tr, y, H=H)
    mf = fit_spiking_model(tm, y, chunksize=chunk)
    np.testing.assert_array_equal(np.asarray(mt.ml_seq),
                                  np.asarray(mf.ml_seq))
    assert np.isfinite(mt.ll)


def test_tracked_posterior_short_signal_uses_chunk_params():
    """The too-short-to-window fallback evaluates each chunk under its
    own parameters (per-chunk haloed exact), not the last chunk's."""
    from hmmspikesorter_tpu.core.posterior import (
        onset_posteriors, onset_posteriors_tracked)

    y, temps, lp, sigma, _ = _case(T=1050, K=8)
    tm = HMMTemplateModel(temps, sigma, lp, allow_overlaps=True)
    B, chunk = 2, 1024
    tr = DriftTrack(lp=np.tile(lp, (B, 1)), mu=np.tile(temps, (B, 1, 1)),
                    sigma=np.full(B, sigma), lls=np.zeros(B),
                    bounds=[(0, 1024), (1024, 1050)], chunk=chunk,
                    forget=1.0, allow_overlaps=True)
    p_tr = onset_posteriors_tracked(tr, y)      # T=1050 < W -> fallback
    p_ex = onset_posteriors(tm, y)
    np.testing.assert_allclose(p_tr, p_ex, rtol=0, atol=1e-8)

    # and a perturbed last chunk must CHANGE the tail rows, proving the
    # fallback reads per-chunk parameters
    tr2 = DriftTrack(lp=tr.lp, mu=tr.mu * np.array([1.0, 1.5])[:, None, None],
                     sigma=tr.sigma, lls=tr.lls, bounds=tr.bounds,
                     chunk=chunk, forget=1.0, allow_overlaps=True)
    p2 = onset_posteriors_tracked(tr2, y)
    np.testing.assert_allclose(p2[:900], p_tr[:900], rtol=0, atol=1e-6)
    assert not np.allclose(p2[1024:], p_tr[1024:], atol=1e-12)


def test_device_loop_matches_host_loop():
    """The one-program lax.scan tracker (_track_scan) computes the same
    trajectory as the host-driven loop, SC and MC, tail included."""
    y, temps, lp, sigma, _ = _case(T=3000 + 500, K=8)
    tm = HMMTemplateModel(temps, sigma, lp)
    th = track_drift(tm, y, chunk=1000, forget=0.4, fb_mode="ring",
                     device_loop=False)
    td = track_drift(tm, y, chunk=1000, forget=0.4, fb_mode="ring",
                     device_loop=True)
    np.testing.assert_allclose(td.lp, th.lp, rtol=0, atol=1e-9)
    np.testing.assert_allclose(td.mu, th.mu, rtol=0, atol=1e-9)
    np.testing.assert_allclose(td.sigma, th.sigma, rtol=0, atol=1e-10)
    np.testing.assert_allclose(td.lls, th.lls, rtol=0, atol=1e-6)

    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC
    from hmmspikesorter_tpu.train.adaptive import track_drift_mc

    yc, mu, sigmas, lpm, _ = _mc_case(T=3500)
    tmc = HMMTemplateModelMC(mu, sigmas, lpm)
    th = track_drift_mc(tmc, yc, chunk=1000, forget=0.4,
                        fb_mode="gather", device_loop=False)
    td = track_drift_mc(tmc, yc, chunk=1000, forget=0.4,
                        fb_mode="gather", device_loop=True)
    np.testing.assert_allclose(td.lp, th.lp, rtol=0, atol=1e-9)
    np.testing.assert_allclose(td.mu, th.mu, rtol=0, atol=1e-9)
    np.testing.assert_allclose(td.sigma, th.sigma, rtol=0, atol=1e-10)
    np.testing.assert_allclose(td.lls, th.lls, rtol=0, atol=1e-6)


def test_cli_train_then_adaptive(tmp_path):
    """--train --adaptive: templates learned from the (stationary) start
    of the recording, then tracked through the drift; decoded counts
    match truth where they would drift apart stationarily."""
    import h5py

    from hmmspikesorter_tpu import cli

    K = 12
    rng = np.random.default_rng(21)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    T = 1 << 14
    y, truth, _ = create_drifting_signal(T, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=1.9,
                                         rng=rng)
    dfile = str(tmp_path / "d.h5")
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = y
    out = cli.sort_data(None, dfile, str(tmp_path / "o.mat"), train=True,
                        n_templates=3, K=K, nsteps=6, train_samples=4096,
                        adaptive=True, adapt_chunk=4096, forget=0.5,
                        confidence=True, qc=True,
                        rng=np.random.default_rng(0), dosave=False)
    assert np.isfinite(out["ll"])
    n_learned = out["waveforms"].shape[1]
    assert n_learned >= 1
    # total decoded onsets across learned units ~ total true onsets
    # (learned unit order/identity is training-dependent)
    dec_total = int((out["mlseq"] == 2).sum())
    true_total = int((truth == 1).sum())
    assert abs(dec_total - true_total) <= max(3, 0.05 * true_total)
    # the full composition also carries per-spike confidence and QC
    # (tracked posteriors under the learned, drift-tracked templates)
    assert len(out["confidence"]) == n_learned
    assert (out["qc"]["isi_invariant_violations"] == 0).all()
    assert np.isfinite(out["qc"]["amp_drift_ratio"]).all()


def test_predict_uses_tracked_templates():
    """Reconstruction of a drift decode uses each chunk's own templates:
    the tracked prediction fits the drifted signal better than the
    static-template reconstruction, SC and MC."""
    from hmmspikesorter_tpu.models.api import predict
    from hmmspikesorter_tpu.models.multichannel import predict_mc

    K = 20
    rng = np.random.default_rng(3)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    T = 1 << 15
    y, truth, _ = create_drifting_signal(T, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=rng)
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    tr = track_drift(tm, y, chunk=4096, forget=0.5, fb_mode="ring")
    m = decode_tracked(tr, y)
    rec_tracked = predict(m)
    # static reconstruction of the same labels with the start templates
    from hmmspikesorter_tpu.core.reconstruction import reconstruct_signal
    rec_static = np.asarray(reconstruct_signal(
        jnp.asarray(m.ml_seq), jnp.asarray(tm.state_space.states),
        jnp.asarray(temps)))
    err_tracked = float(np.std(y - rec_tracked))
    err_static = float(np.std(y - rec_static))
    assert err_tracked < err_static - 0.01

    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC
    from hmmspikesorter_tpu.train.adaptive import (decode_tracked_mc,
                                                   track_drift_mc)

    yc, mu, sigmas, lpm, _ = _mc_case(T=6000)
    tmc = HMMTemplateModelMC(mu, sigmas, lpm, allow_overlaps=True)
    trm = track_drift_mc(tmc, yc, chunk=2000, forget=0.5,
                         fb_mode="gather")
    mm = decode_tracked_mc(trm, yc)
    rec = predict_mc(mm)
    assert rec.shape == yc.shape
    assert float(np.std(yc - rec)) < float(np.std(yc))


def test_tracked_events_transfer_bit_matches_dense():
    """decode_tracked(transfer="events") reconstructs the dense labels
    exactly from the packed onset blob (the stationary fast path's
    lossless sparse transfer, now on the per-window-parameter decode)."""
    K = 20
    rng = np.random.default_rng(3)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    T = 1 << 16
    y, truth, _ = create_drifting_signal(T, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=rng)
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    tr = track_drift(tm, y, chunk=8192, forget=0.4, fb_mode="ring")
    m_dense = decode_tracked(tr, y)
    m_ev = decode_tracked(tr, y, transfer="events")
    np.testing.assert_array_equal(np.asarray(m_ev.ml_seq),
                                  np.asarray(m_dense.ml_seq))
    assert m_ev.ll == m_dense.ll
    for a, b in zip(m_ev.spike_onsets, m_dense.spike_onsets):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        decode_tracked(tr, y, transfer="nope")


def test_tracked_events_transfer_mc_bit_matches_dense():
    """decode_tracked_mc(transfer="events") == dense labels."""
    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC
    from hmmspikesorter_tpu.train.adaptive import (decode_tracked_mc,
                                                   track_drift_mc)

    K, C = 12, 3
    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    gains = np.array([[1.0, 0.3, 0.6], [0.2, 1.0, 0.5]])
    mu = temps[:, :, None] * gains[None, :, :]
    pp = np.array([0.01, 0.006])
    sig = np.array([0.3, 0.32, 0.28])
    T = 1 << 14
    yc = sig[None, :] * rng.standard_normal((T, C))
    _, truth = create_signal(T, 0.3, pp, temps,
                             rng=np.random.default_rng(9))
    for n in range(2):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    tmc = HMMTemplateModelMC(mu, sig, np.log(pp), allow_overlaps=True)
    tr = track_drift_mc(tmc, yc, chunk=4096, forget=0.4)
    m_dense = decode_tracked_mc(tr, yc)
    m_ev = decode_tracked_mc(tr, yc, transfer="events")
    np.testing.assert_array_equal(np.asarray(m_ev.ml_seq),
                                  np.asarray(m_dense.ml_seq))
    assert m_ev.ll == m_dense.ll


def test_track_drift_batched_matches_per_channel():
    """Per-channel track independence: the vmapped batched tracker
    equals track_drift run channel by channel (same device loop)."""
    from hmmspikesorter_tpu.train.adaptive import track_drift_batched

    K = 8
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    T, C = 5000, 3                      # ragged tail: 5000 % 2048 != 0
    rng = np.random.default_rng(8)
    ys = np.stack([create_signal(T, 0.3, pp, temps, rng=rng)[0]
                   for _ in range(C)])
    tracks = track_drift_batched(tm, ys, chunk=2048, forget=0.5,
                                 device_loop=True)
    assert len(tracks) == C
    for c in range(C):
        ref = track_drift(tm, ys[c], chunk=2048, forget=0.5,
                          device_loop=True)
        np.testing.assert_allclose(tracks[c].lp, ref.lp, atol=1e-9)
        np.testing.assert_allclose(tracks[c].mu, ref.mu, atol=1e-9)
        np.testing.assert_allclose(tracks[c].sigma, ref.sigma, atol=1e-9)
        nan = np.isnan(ref.lls)
        np.testing.assert_allclose(tracks[c].lls[~nan], ref.lls[~nan],
                                   atol=1e-6)
        assert tracks[c].bounds == ref.bounds


def test_cli_adaptive_channels_all(tmp_path):
    """--adaptive --channels all: independent per-channel drift tracks,
    each channel decoded under its own adapted templates."""
    import h5py

    from hmmspikesorter_tpu import cli

    K = 8
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    T, C = 6000, 2
    rng = np.random.default_rng(4)
    rows, truths = [], []
    for _ in range(C):
        y, tr = create_signal(T, 0.3, pp, temps, rng=rng)
        rows.append(y)
        truths.append(tr)
    data = np.stack(rows)
    tfile, dfile = str(tmp_path / "t.h5"), str(tmp_path / "d.h5")
    with h5py.File(tfile, "w") as f:
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([[1.0 / 0.09]])
        f["p"] = pp
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = data
    out = cli.sort_data(tfile, dfile, str(tmp_path / "o.mat"),
                        adaptive=True, channels="all", adapt_chunk=2048,
                        dosave=False)
    assert out["mlseq"].shape == (C, 2, T)
    for c in range(C):
        for n in range(2):
            dec = int((out["mlseq"][c, n] == 2).sum())
            tc = int((truths[c][n] == 1).sum())
            assert abs(dec - tc) <= 1, (c, n, dec, tc)
    assert np.isfinite(out["ll"]).all() and out["ll"].shape == (C,)
