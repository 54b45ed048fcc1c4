"""Model API: decode, chunked decode protocol parity, predict, bic,
extraction, unit export round-trip."""

import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.io import extraction
from hmmspikesorter_tpu.models import api
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from tests.oracle import reference_semantics as ref


def _model_and_signal(N=2, K=20, T=6000, sigma=0.3, overlaps=True, seed=11):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.004, 0.002][:N])
    y, truth = create_signal(T, sigma, pp, temps, rng=rng)
    tm = api.HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                              allow_overlaps=overlaps)
    return tm, y, truth


def test_whole_signal_decode_matches_oracle():
    tm, y, _ = _model_and_signal()
    model = api.fit_spiking_model(tm, y)
    ss = tm.state_space
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(tm.lp).tolist()))
    x_ref, ll_ref = ref.viterbi(y, ss.states, edges, tm.mu, tm.sigma)
    np.testing.assert_array_equal(model.ml_seq, x_ref)
    assert model.ll == pytest.approx(ll_ref, rel=1e-12)


def _reference_chunked(y, ss, lp, mu, sigma, chunksize):
    """Literal transcription of the reference chunk loop (src/fit.jl:11-42),
    0-based, driving the oracle viterbi."""
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    n = len(y)
    ml_seq = np.zeros(n, dtype=np.int64)
    ll = 0.0
    i = 0
    while i < n - 1:
        j = min(i + chunksize, n)
        x, _ll = ref.viterbi(y[i:j], ss.states, edges, mu, sigma)
        l = 0
        if i > 0:
            while x[l] > 0:
                l += 1
        k = len(x)
        if j < n:
            while x[k - 1] > 0:
                k -= 1
                j -= 1
        ml_seq[i + l : j] = x[l:k]
        ll += _ll
        i = j
    return ml_seq, ll


def test_chunked_decode_protocol_parity():
    tm, y, _ = _model_and_signal(K=12, T=3000)
    model = api.fit_spiking_model(tm, y, chunksize=700)
    ml_ref, ll_ref = _reference_chunked(
        y, tm.state_space, tm.lp, tm.mu, tm.sigma, 700)
    np.testing.assert_array_equal(model.ml_seq, ml_ref)
    assert model.ll == pytest.approx(ll_ref, rel=1e-12)


def test_chunked_close_to_whole_signal():
    tm, y, _ = _model_and_signal(K=12, T=3000)
    whole = api.fit_spiking_model(tm, y)
    chunked = api.fit_spiking_model(tm, y, chunksize=700)
    agree = (whole.ml_seq == chunked.ml_seq).mean()
    assert agree > 0.98


def test_predict_matches_oracle_reconstruction():
    tm, y, _ = _model_and_signal(K=12, T=2000)
    model = api.fit_spiking_model(tm, y)
    got = api.predict(model)
    want = ref.reconstruct_signal(model.ml_seq, tm.state_space.states, tm.mu)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bic_definition():
    tm, y, _ = _model_and_signal(K=12, T=2000)
    model = api.fit_spiking_model(tm, y)
    k = tm.mu.size + 1 + tm.n_neurons
    want = np.log(len(y)) * k - 2 * model.ll
    assert api.bic(model) == pytest.approx(want)


def test_unroll_mlseq_reference_case():
    # reference test/runtests.jl:36-42 (translated to 0-based; the reference
    # StateMatrix ctor defaults to allow_overlaps=true, src/types.jl:135)
    ss = build_state_space(2, 5, True)
    mlseq = np.array([0, 0, 0, 1, 2, 3, 4, 0, 5, 6, 7, 8, 0, 9, 14, 19, 24, 0])
    rolled = extraction.unroll_mlseq(mlseq, ss.states)
    np.testing.assert_array_equal(
        rolled[0], [0, 0, 0, 1, 2, 3, 4, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 0])
    np.testing.assert_array_equal(
        rolled[1], [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0])


def test_extract_spiketimes_hits_true_onsets():
    tm, y, truth = _model_and_signal(K=20, T=6000)
    model = api.fit_spiking_model(tm, y)
    times = extraction.extract_spiketimes(model)
    assert len(times) == 2
    for n in range(2):
        qidx = int(np.argmin(tm.mu[:, n]))
        true_trough = np.nonzero(truth[n] == qidx)[0]
        if len(true_trough) == 0:
            continue
        hits = sum(1 for t in true_trough
                   if len(times[n]) and np.min(np.abs(times[n] - t)) <= 2)
        assert hits / len(true_trough) > 0.8


def test_unit_export_roundtrip(tmp_path):
    tm, y, _ = _model_and_signal(K=20, T=4000)
    model = api.fit_spiking_model(tm, y)
    units = extraction.extract_units(model, channel=3)
    assert set(units) == {"g003c01_spiketrain.mat", "g003c02_spiketrain.mat"}
    extraction.save_units(units, outdir=str(tmp_path))
    back = extraction.load_unit(str(tmp_path / "g003c01_spiketrain.mat"))
    assert back["sampling_rate"] == 40000.0
    np.testing.assert_allclose(back["waveform"], tm.mu[:, 0])
    np.testing.assert_array_equal(np.atleast_1d(back["timestamps"]),
                                  units["g003c01_spiketrain.mat"]["timestamps"])


def test_fast_decode_matches_sequential_labels():
    tm, y, _ = _model_and_signal(K=20, T=8192)
    seq = api.fit_spiking_model(tm, y)
    fast = api.fit_spiking_model_fast(tm, y, L=1024, H=128)
    assert fast.seam_ok.all()
    agree = (fast.ml_seq == seq.ml_seq).mean()
    assert agree > 0.999


def test_decoder_dispatch_ring_vs_gather_identical():
    # non-overlap: ring engine must be selected and bit-match
    tm, y, _ = _model_and_signal(K=20, T=4000, overlaps=False)
    assert tm.has_ring_engine
    model = api.fit_spiking_model(tm, y)
    from hmmspikesorter_tpu.core.viterbi import viterbi_decode
    import jax.numpy as jnp
    in_idx, in_w, smu = tm.decode_tables()
    x_g, ll_g = viterbi_decode(jnp.asarray(y), in_idx, in_w, smu, tm.sigma)
    np.testing.assert_array_equal(model.ml_seq, np.asarray(x_g))
    assert model.ll == pytest.approx(float(ll_g), rel=1e-12)


def test_fast_decode_exact_ll_non_overlap():
    tm, y, _ = _model_and_signal(K=20, T=8192, overlaps=False)
    seq = api.fit_spiking_model(tm, y)
    fast = api.fit_spiking_model_fast(tm, y, L=1024, H=128)
    # when labels agree, the parallel path-score replay reproduces the
    # reference cumulative-score ll
    if (fast.ml_seq == seq.ml_seq).all():
        assert fast.ll == pytest.approx(seq.ll, rel=1e-9)
    else:
        assert np.isfinite(fast.ll)


def test_fast_decode_events_transfer_identical():
    for overlaps in (True, False):
        tm, y, _ = _model_and_signal(K=20, T=8192, overlaps=overlaps)
        dense = api.fit_spiking_model_fast(tm, y, L=1024, H=128)
        ev = api.fit_spiking_model_fast(tm, y, L=1024, H=128,
                                        transfer="events")
        np.testing.assert_array_equal(ev.ml_seq, dense.ml_seq)
        assert ev.ll == pytest.approx(dense.ll, rel=1e-12)
        # the exposed onsets are exactly the dense decode's phase-1 hits
        from hmmspikesorter_tpu.core.events import phase_of
        t = np.arange(len(y))
        for n in range(tm.n_neurons):
            mask = np.asarray(phase_of(np.asarray(dense.ml_seq, np.int32),
                                       n, tm.n_neurons, tm.K,
                                       overlaps)) == 1
            np.testing.assert_array_equal(ev.spike_onsets[n], t[mask])


def test_fast_decode_int16_input_identical():
    """Integer recordings ship to the device raw and are cast in-graph;
    float(int16) is exact, so every fast path must match the float64 run
    bit-for-bit (labels AND ll)."""
    tm0, y, _ = _model_and_signal(K=20, T=8192, overlaps=True)
    yi = np.clip(np.round(y * 2000), -32768, 32767).astype(np.int16)
    yf = yi.astype(np.float64)
    # rescale templates/sigma into the integer units
    tm = api.HMMTemplateModel(mu=tm0.mu * 2000, sigma=tm0.sigma * 2000,
                              lp=tm0.lp, allow_overlaps=True)
    for kw in ({}, {"transfer": "events"},
               {"streaming": True, "blocks_per_call": 4},
               {"streaming": True, "blocks_per_call": 4,
                "transfer": "events"}):
        mf = api.fit_spiking_model_fast(tm, yf, L=1024, H=128, **kw)
        mi = api.fit_spiking_model_fast(tm, yi, L=1024, H=128, **kw)
        np.testing.assert_array_equal(mi.ml_seq, mf.ml_seq)
        assert mi.ll == pytest.approx(mf.ll, rel=1e-12), kw
    # channel-batched path
    for kw in ({}, {"transfer": "events"}):
        bf = api.fit_spiking_models_fast_batched(tm, np.stack([yf, yf]),
                                                 L=1024, H=128, **kw)
        bi = api.fit_spiking_models_fast_batched(tm, np.stack([yi, yi]),
                                                 L=1024, H=128, **kw)
        for mf2, mi2 in zip(bf, bi):
            np.testing.assert_array_equal(mi2.ml_seq, mf2.ml_seq)
            assert mi2.ll == pytest.approx(mf2.ll, rel=1e-12)


def test_fast_decode_streaming_matches_oneshot():
    tm, y, _ = _model_and_signal(K=20, T=8192, overlaps=True)
    one = api.fit_spiking_model_fast(tm, y, L=1024, H=128)
    stream = api.fit_spiking_model_fast(tm, y, L=1024, H=128,
                                        streaming=True, blocks_per_call=4)
    np.testing.assert_array_equal(stream.ml_seq, one.ml_seq)
    assert stream.seam_ok.all()


def test_fast_decode_auto_streams_past_block_cap(monkeypatch):
    """streaming=None (default) must route recordings longer than
    MAX_ONESHOT_BLOCKS*L through the fixed-shape streaming driver
    (compile-time scaling: 512+-block one-shot programs compile for
    minutes on remote-compile backends) with identical labels."""
    import hmmspikesorter_tpu.models.api as api_mod

    tm, y, _ = _model_and_signal(K=20, T=8192, overlaps=True)
    monkeypatch.setattr(api_mod, "MAX_ONESHOT_BLOCKS", 4)
    called = {}
    import hmmspikesorter_tpu.parallel.overlap_save as ovs
    orig = ovs.overlap_save_decode_long

    def spy(*a, **k):
        called["streamed"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ovs, "overlap_save_decode_long", spy)
    auto = api.fit_spiking_model_fast(tm, y, L=1024, H=128,
                                      blocks_per_call=4)   # B=8 > cap=4
    assert called.get("streamed")
    one = api.fit_spiking_model_fast(tm, y, L=1024, H=128, streaming=False)
    np.testing.assert_array_equal(auto.ml_seq, one.ml_seq)
    assert auto.ll == pytest.approx(one.ll, rel=1e-9)


def test_fit_spiking_models_fast_batched_matches_per_channel():
    """The batched decode API equals per-channel fit_spiking_model_fast
    (labels, ll, seam flags) on a (C, T) batch."""
    from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                                   create_spike_template)
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model_fast,
                                               fit_spiking_models_fast_batched)

    K, sigma, C, T = 20, 0.3, 3, 5000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    ys = np.stack([create_signal(T, sigma, pp, temps,
                                 rng=np.random.default_rng(30 + c))[0]
                   for c in range(C)])
    tm = HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                          allow_overlaps=True)
    batch = fit_spiking_models_fast_batched(tm, ys, L=1024, H=256)
    assert len(batch) == C
    for c in range(C):
        single = fit_spiking_model_fast(tm, ys[c], L=1024, H=256)
        np.testing.assert_array_equal(np.asarray(batch[c].ml_seq, np.int64),
                                      np.asarray(single.ml_seq, np.int64))
        assert batch[c].ll == pytest.approx(single.ll, rel=1e-12)
        np.testing.assert_array_equal(np.asarray(batch[c].seam_ok),
                                      np.asarray(single.seam_ok))


def test_decode_with_zero_templates_is_all_silent():
    """Training can prune every template (the reference CLI's no-spikeForms
    analog, hmmsort.jl:40-45): every decode path must return the pure-noise
    model — all-silent labels and the silent-emission ll — instead of a
    zero-size-reduction crash."""
    import numpy as np
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model,
                                               fit_spiking_model_fast)
    from hmmspikesorter_tpu.models.multichannel import (
        HMMTemplateModelMC, fit_spiking_model_mc, fit_spiking_model_mc_fast)
    from hmmspikesorter_tpu.core.path_score import (path_cumulative_ll,
                                                    path_cumulative_ll_mc)

    rng = np.random.default_rng(4)
    sigma, T = 0.3, 3000
    y = rng.normal(0.0, sigma, T)
    tm = HMMTemplateModel(mu=np.zeros((60, 0)), sigma=sigma,
                          lp=np.zeros(0), allow_overlaps=False)
    # ll keeps the reference cumulative-score contract (same scale as
    # every N >= 1 decode, so bic() comparisons stay meaningful)
    want = path_cumulative_ll(y, np.zeros(T, np.int64),
                              tm.state_space.states, tm.mu, sigma, tm.lp)
    for fn in (fit_spiking_model, fit_spiking_model_fast):
        m = fn(tm, y)
        assert not m.ml_seq.any()
        assert float(m.ll) == pytest.approx(want, rel=1e-12)
        assert m.seams_repaired == 0 and m.seam_ok.size == 0

    sg = np.array([0.3, 0.25])
    yc = sg * rng.standard_normal((T, 2))
    tmc = HMMTemplateModelMC(mu=np.zeros((60, 0, 2)), sigmas=sg,
                             lp=np.zeros(0), allow_overlaps=False)
    want_mc = path_cumulative_ll_mc(yc, np.zeros(T, np.int64),
                                    tmc.state_space.states, tmc.mu, sg,
                                    tmc.lp)
    for fn in (fit_spiking_model_mc, fit_spiking_model_mc_fast):
        m = fn(tmc, yc)
        assert not m.ml_seq.any()
        assert float(m.ll) == pytest.approx(want_mc, rel=1e-12)
        assert m.seams_repaired == 0 and m.seam_ok.size == 0
