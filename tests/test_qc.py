"""Per-unit QC metrics (core/qc.py): counts/rates/ISI/SNR/presence on
known synthetics, drift metrics from a tracked decode, CLI --qc."""

import numpy as np
import pytest

from hmmspikesorter_tpu.core.qc import UnitQC, qc_arrays, unit_qc
from hmmspikesorter_tpu.data.synthetic import (
    create_drifting_signal, create_signal, create_spike_template)
from hmmspikesorter_tpu.models.api import (
    HMMTemplateModel, fit_spiking_model_fast)


def _decoded(T=20_000, K=20, sigma=0.3, seed=11):
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.006, 0.003])
    y, truth = create_signal(T, sigma, pp, temps,
                             rng=np.random.default_rng(seed))
    tm = HMMTemplateModel(temps, sigma, np.log(pp), allow_overlaps=True)
    m = fit_spiking_model_fast(tm, y, L=4096, H=64, transfer="events")
    return m, truth, temps, sigma


def test_unit_qc_basic_metrics():
    m, truth, temps, sigma = _decoded()
    qcs = unit_qc(m, fs=40_000.0, refractory=temps.shape[0])
    assert len(qcs) == 2
    T = len(np.asarray(m.ml_seq))
    for n, q in enumerate(qcs):
        assert q.n_spikes == len(m.spike_onsets[n])
        assert q.rate == pytest.approx(q.n_spikes / T * 40_000.0)
        # structural invariant: the ring enforces ISI >= K
        assert q.isi_min >= temps.shape[0]
        assert q.isi_violations == 0 and q.isi_violation_frac == 0.0
        assert q.isi_invariant_violations == 0
        assert q.snr == pytest.approx(
            np.abs(temps[:, n]).max() / sigma)
        assert 0.0 < q.presence_ratio <= 1.0
        assert q.conf_median > 0.9
        assert q.conf_frac_low < 0.1
        # clean, well-separated decode: little posterior mass beyond
        # the decoded spikes
        assert 0.0 <= q.missing_mass < 0.2
        assert np.isnan(q.amp_drift_ratio)      # not a drift decode
        assert q.amp_trajectory is None


def test_unit_qc_refractory_counts():
    """A physiological refractory window longer than K counts real
    short-ISI events; the count matches a direct computation."""
    m, *_ = _decoded()
    K = m.template_model.K
    qcs = unit_qc(m, refractory=4 * K, confidence=False)
    for n, q in enumerate(qcs):
        isis = np.diff(np.sort(np.asarray(m.spike_onsets[n])))
        assert q.isi_violations == int((isis < 4 * K).sum())
        assert q.isi_invariant_violations == 0      # decode invariant
        assert np.isnan(q.conf_median)          # confidence skipped
        assert np.isnan(q.missing_mass)         # no posteriors either
    assert sum(q.isi_violations for q in qcs) > 0   # case chosen dense


def test_unit_qc_physiological_default_flags_contamination():
    """With fs given, the default refractory is 1.5 ms — longer than K
    on this dense synthetic — so a deliberately contaminated (fast-
    firing) unit shows real violations while the K-window decode
    invariant stays clean (VERDICT r4 item 4)."""
    # fs=40 kHz -> default refractory = 60 samples = 3*K for K=20
    m, *_ = _decoded()
    K = m.template_model.K
    assert K == 20
    qcs = unit_qc(m, fs=40_000.0, confidence=False)
    refractory = round(0.0015 * 40_000.0)
    assert refractory == 60 > K
    total_viol = 0
    for n, q in enumerate(qcs):
        isis = np.diff(np.sort(np.asarray(m.spike_onsets[n])))
        assert q.isi_violations == int((isis < refractory).sum())
        assert q.isi_invariant_violations == 0
        total_viol += q.isi_violations
    assert total_viol > 0      # the dense unit IS contaminated at 1.5ms


def test_unit_qc_missing_mass_counts_rejected_spikes():
    """A decode starved of some true spikes (high noise) leaves
    posterior onset mass the MAP rejected; missing_mass sees it."""
    from hmmspikesorter_tpu.core.posterior import model_posteriors

    m, *_ = _decoded(sigma=0.9, seed=5)      # noisy: MAP drops spikes
    p = model_posteriors(m)
    qcs = unit_qc(m, posteriors=p)
    for n, q in enumerate(qcs):
        expected = p[:, n].sum()
        want = max(0.0, expected - q.n_spikes) / expected
        assert q.missing_mass == pytest.approx(want)
    assert any(q.missing_mass > 0.01 for q in qcs)


def test_unit_qc_drift_metrics():
    from hmmspikesorter_tpu.train.adaptive import (decode_tracked,
                                                   track_drift)

    K = 20
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    y, truth, _ = create_drifting_signal(1 << 15, 0.3, pp, temps,
                                         scale_start=1.0, scale_end=2.0,
                                         rng=np.random.default_rng(3))
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    tr = track_drift(tm, y, chunk=4096, forget=0.5, fb_mode="ring")
    m = decode_tracked(tr, y)
    qcs = unit_qc(m)
    for q in qcs:
        assert q.amp_trajectory is not None
        assert len(q.amp_trajectory) == tr.n_chunks
        assert q.amp_drift_ratio > 1.3          # the 2x drift, lagged
        # pure amplitude drift: the SHAPE stays put
        assert q.shape_stability > 0.98
    arrs = qc_arrays(qcs)
    assert arrs["n_spikes"].shape == (2,)
    assert arrs["amp_trajectory"].shape == (2, tr.n_chunks)


def test_cli_qc(tmp_path):
    import h5py
    import scipy.io

    from hmmspikesorter_tpu import cli

    K = 20
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.006, 0.003])
    y, truth = create_signal(16_000, 0.3, pp, temps,
                             rng=np.random.default_rng(11))
    tfile, dfile = str(tmp_path / "t.h5"), str(tmp_path / "d.h5")
    with h5py.File(tfile, "w") as f:
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([[1.0 / 0.09]])
        f["p"] = pp
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = y
    ofile = str(tmp_path / "o.mat")
    out = cli.sort_data(tfile, dfile, ofile, engine="fast",
                        confidence=True, qc=True)
    assert "qc" in out
    assert (out["qc"]["n_spikes"]
            == [(out["mlseq"][n] == 2).sum() for n in range(2)]).all()
    back = scipy.io.loadmat(ofile, squeeze_me=True)
    assert "qc" in back                          # MAT struct roundtrip
