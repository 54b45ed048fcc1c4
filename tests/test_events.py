"""Sparse spike-event transfer (core/events.py): device-side packed onset
extraction + exact host reconstruction of the label sequence."""

import numpy as np
import jax.numpy as jnp
import pytest

from hmmspikesorter_tpu.core.events import (
    decode_events_overlap_save, event_chunk, extract_onsets,
    extract_onsets_packed, labels_from_onsets, onsets_from_packed, phase_of)
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                               create_spike_template)
from hmmspikesorter_tpu.parallel.overlap_save import ring_overlap_save


def _random_valid_path(rng, T, N, K, overlaps, *, p_onset=0.02, x0_phase=None):
    """Simulate a valid path of the combined ring HMM directly: random
    onsets respecting the <= (2 if overlaps else 1) simultaneously-active
    constraint; optionally start mid-spike (neuron 0 at phase x0_phase)."""
    phases = np.zeros((N, T), np.int32)
    cur = np.zeros(N, np.int32)
    if x0_phase:
        cur[0] = x0_phase
    max_active = 2 if overlaps else 1
    for t in range(T):
        if t > 0:
            for n in range(N):
                c = cur[n]
                cur[n] = c + 1 if 0 < c < K - 1 else 0
            for n in range(N):
                if cur[n] == 0 and (cur > 0).sum() < max_active \
                        and rng.random() < p_onset:
                    cur[n] = 1
        phases[:, t] = cur
    # compose combined-state ids with the closed-form encoding
    x = np.zeros(T, np.int32)
    Km1 = K - 1
    act = (phases > 0).sum(axis=0)
    for n in range(N):
        sel = (phases[n] > 0) & (act == 1)
        x[sel] = 1 + n * Km1 + phases[n, sel] - 1
    if overlaps:
        base = 1 + N * Km1
        rank = 0
        for i in range(N - 1):
            for j in range(i + 1, N):
                sel = (phases[i] > 0) & (phases[j] > 0)
                x[sel] = (base + rank * Km1 * Km1
                          + (phases[i, sel] - 1) * Km1 + (phases[j, sel] - 1))
                rank += 1
    return x


@pytest.mark.parametrize("N,K,overlaps", [(2, 7, True), (3, 6, True),
                                          (2, 9, False), (4, 5, True)])
def test_roundtrip_random_valid_paths(N, K, overlaps):
    rng = np.random.default_rng(42 + N + K)
    for trial in range(4):
        T = int(rng.integers(200, 600))
        x = _random_valid_path(rng, T, N, K, overlaps,
                               x0_phase=(trial % 2) * min(3, K - 2))
        onsets = extract_onsets(jnp.asarray(x), N=N, K=K, overlaps=overlaps)
        xr = labels_from_onsets(onsets, x[0], T=T, N=N, K=K,
                                overlaps=overlaps)
        np.testing.assert_array_equal(xr, x)


def test_phase_of_matches_state_table():
    for N, K, ov in [(2, 8, True), (3, 5, True), (3, 7, False)]:
        ss = build_state_space(N, K, ov)
        x = np.arange(ss.nstates, dtype=np.int32)
        for n in range(N):
            np.testing.assert_array_equal(
                np.asarray(phase_of(x, n, N, K, ov)), ss.states[n])


def test_densest_firing_roundtrip():
    # densest possible firing of one neuron: onset every K samples —
    # exactly one onset per event chunk is the packing's worst case
    N, K, T = 2, 5, 103
    x = np.zeros(T, np.int32)
    t = 0
    n_onsets = 0
    expected = []
    while t < T:
        span = min(K - 1, T - t)
        x[t : t + span] = 1 + np.arange(span)   # neuron 0 ring
        expected.append(t)
        n_onsets += 1
        t += K
    onsets = extract_onsets(jnp.asarray(x), N=N, K=K, overlaps=True)
    np.testing.assert_array_equal(onsets[0], expected)
    assert len(onsets[1]) == 0
    xr = labels_from_onsets(onsets, x[0], T=T, N=N, K=K, overlaps=True)
    np.testing.assert_array_equal(xr, x)


def test_packed_cross_check_detects_invalid_spacing():
    # two onsets of one neuron closer than K (invalid spliced path):
    # the chunk grid loses one and the count cross-check must catch it
    N, K = 2, 9
    G = event_chunk(K)
    T = 6 * G
    x = np.zeros(T, np.int32)
    x[G] = 1                                    # onset at chunk boundary
    x[G + 2] = 1                                # second onset 2 < K later
    packed, counts = extract_onsets_packed(jnp.asarray(x), N=N, K=K,
                                           overlaps=True)
    with pytest.raises(ValueError, match="closer than K"):
        onsets_from_packed(packed, counts, K=K)


def _bench_problem(T=1 << 15, N=2, K=60, sigma=0.3, seed=7):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.003, 0.001][:N])
    y, _ = create_signal_fast(T, sigma, pp, temps, rng=rng)
    return y, np.log(pp), temps, sigma


def test_decode_events_matches_dense_decode():
    y, lp, mu, sigma = _bench_problem()
    L, H = 2048, 256
    x_dense, ok = ring_overlap_save(y, lp, mu, sigma, L=L, H=H,
                                    overlaps=True)
    onsets, x_ev, ok2 = decode_events_overlap_save(
        y, lp, mu, sigma, L=L, H=H, overlaps=True)
    assert np.asarray(ok2).all()
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok2))
    np.testing.assert_array_equal(x_ev, np.asarray(x_dense).astype(np.int32))
    # the events ARE the onsets of the dense decode
    N, K = mu.shape[1], mu.shape[0]
    t = np.arange(len(y))
    for n in range(N):
        mask = np.asarray(phase_of(np.asarray(x_dense).astype(np.int32),
                                   n, N, K, True)) == 1
        np.testing.assert_array_equal(onsets[n], t[mask])


def test_decode_events_batched_matches_dense():
    from hmmspikesorter_tpu.core.events import (
        decode_events_overlap_save_batched)
    from hmmspikesorter_tpu.parallel.overlap_save import (
        ring_overlap_save_batched)

    K, N, Ch, T = 20, 2, 3, 8192
    rng = np.random.default_rng(11)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    ys = np.stack([create_signal_fast(T, 0.3, pp, temps, rng=rng)[0]
                   for _ in range(Ch)])
    lp = np.log(pp)
    L, H = 1024, 128
    xs_d, ok_d = ring_overlap_save_batched(ys, lp, temps, 0.3, L=L, H=H,
                                           overlaps=True)
    onsets, xs_e, ok_e = decode_events_overlap_save_batched(
        ys, lp, temps, 0.3, L=L, H=H, overlaps=True)
    np.testing.assert_array_equal(np.asarray(ok_d), ok_e)
    np.testing.assert_array_equal(xs_e, np.asarray(xs_d).astype(np.int32))
    t = np.arange(T)
    for c in range(Ch):
        for n in range(N):
            mask = np.asarray(phase_of(xs_e[c], n, N, K, True)) == 1
            np.testing.assert_array_equal(onsets[c][n], t[mask])


def test_api_batched_events_transfer_identical():
    from hmmspikesorter_tpu.models import api

    K, Ch, T = 20, 2, 8192
    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    ys = np.stack([create_signal_fast(T, 0.3, pp, temps, rng=rng)[0]
                   for _ in range(Ch)])
    tm = api.HMMTemplateModel(mu=temps, sigma=0.3, lp=np.log(pp),
                              allow_overlaps=True)
    dense = api.fit_spiking_models_fast_batched(tm, ys, L=1024, H=128)
    ev = api.fit_spiking_models_fast_batched(tm, ys, L=1024, H=128,
                                             transfer="events")
    t = np.arange(T)
    for md, me in zip(dense, ev):
        np.testing.assert_array_equal(me.ml_seq, md.ml_seq)
        assert me.ll == pytest.approx(md.ll, rel=1e-12)
        # batched events expose per-channel onsets like the other paths
        for n in range(tm.n_neurons):
            mask = np.asarray(phase_of(np.asarray(md.ml_seq, np.int32),
                                       n, tm.n_neurons, K, True)) == 1
            np.testing.assert_array_equal(me.spike_onsets[n], t[mask])


def test_streaming_events_transfer_identical():
    from hmmspikesorter_tpu.models import api

    K = 20
    tmz = None
    rng = np.random.default_rng(17)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    y, _ = create_signal_fast(1 << 14, 0.3, pp, temps, rng=rng)
    tm = api.HMMTemplateModel(mu=temps, sigma=0.3, lp=np.log(pp),
                              allow_overlaps=True)
    dense = api.fit_spiking_model_fast(tm, y, L=1024, H=128, streaming=True,
                                       blocks_per_call=4)
    ev = api.fit_spiking_model_fast(tm, y, L=1024, H=128, streaming=True,
                                    blocks_per_call=4, transfer="events")
    np.testing.assert_array_equal(ev.ml_seq, dense.ml_seq)
    assert ev.ll == pytest.approx(dense.ll, rel=1e-12)


def test_spiketimes_from_onsets_match_label_extraction():
    from hmmspikesorter_tpu.io import extraction
    from hmmspikesorter_tpu.models import api

    y, lp, mu, sigma = _bench_problem(T=1 << 14)
    tm = api.HMMTemplateModel(mu=mu, sigma=sigma, lp=lp,
                              allow_overlaps=True)
    m = api.fit_spiking_model_fast(tm, y, L=1024, H=128, transfer="events")
    via_labels = extraction.extract_spiketimes(m)
    via_onsets = extraction.extract_spiketimes_from_onsets(
        m.spike_onsets, mu, x0=int(m.ml_seq[0]), T=len(y))
    for a, b in zip(via_labels, via_onsets):
        np.testing.assert_array_equal(a, b)
    # synthetic mid-spike start: phase p0 at t=0 must yield the clipped
    # trough timestamp without an in-range onset
    N, K = mu.shape[1], mu.shape[0]
    x = _random_valid_path(np.random.default_rng(1), 400, N, K, True,
                           x0_phase=3)
    onsets = extract_onsets(jnp.asarray(x), N=N, K=K, overlaps=True)
    via_on = extraction.extract_spiketimes_from_onsets(onsets, mu,
                                                       x0=int(x[0]), T=400)
    rolled = np.stack([np.asarray(phase_of(x, n, N, K, True))
                       for n in range(N)])
    for i in range(N):
        qidx = int(np.argmin(mu[:, i]))
        np.testing.assert_array_equal(via_on[i],
                                      np.nonzero(rolled[i] == qidx)[0])


def test_mc_events_transfer_identical():
    from hmmspikesorter_tpu.models.multichannel import (
        HMMTemplateModelMC, fit_spiking_model_mc_fast)

    K, N, C, T = 20, 2, 3, 1 << 13
    rng = np.random.default_rng(8)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    gains = 0.3 + rng.random((N, C))
    mu = temps[:, :, None] * gains[None]
    sigmas = 0.25 + 0.1 * rng.random(C)
    pp = np.array([0.004, 0.002])
    y, truth = create_signal_fast(T, 0.0, pp, temps, rng=rng)
    yc = sigmas[None, :] * rng.standard_normal((T, C))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    tmc = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=np.log(pp),
                             allow_overlaps=True)
    dense = fit_spiking_model_mc_fast(tmc, yc, L=1024, H=128)
    ev = fit_spiking_model_mc_fast(tmc, yc, L=1024, H=128,
                                   transfer="events")
    np.testing.assert_array_equal(ev.ml_seq, dense.ml_seq)
    assert ev.ll == pytest.approx(dense.ll, rel=1e-12)
    evs = fit_spiking_model_mc_fast(tmc, yc, L=1024, H=128, streaming=True,
                                    blocks_per_call=4, transfer="events")
    np.testing.assert_array_equal(evs.ml_seq, dense.ml_seq)


def test_decode_events_flagged_seam_falls_back_dense():
    # a signal with no common silence anywhere near one seam: back-to-back
    # spikes through the cut (same construction as test_seam_repair)
    K, N = 12, 2
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    T, L, H = 1 << 11, 512, 32
    sigma = 0.25
    rng = np.random.default_rng(3)
    y = sigma * rng.standard_normal(T)
    seam = L  # first seam
    t0 = seam - 40 * (K - 1)
    for i in range(80):                       # alternating dense spikes
        n = i % 2
        s = t0 + i * (K - 1)
        seg = temps[: K - 1, n]
        y[s : s + K - 1] += seg[: max(0, min(K - 1, T - s))]
    lp = np.log([0.01, 0.01])
    x_dense, ok = ring_overlap_save(y, lp, temps, sigma, L=L, H=H,
                                    overlaps=True)
    onsets, x_ev, ok2 = decode_events_overlap_save(
        y, lp, temps, sigma, L=L, H=H, overlaps=True)
    np.testing.assert_array_equal(np.asarray(ok), ok2)
    # whether or not the seam flagged, the events path must return the
    # dense decode's labels exactly
    np.testing.assert_array_equal(x_ev, np.asarray(x_dense).astype(np.int32))
    # and the onsets must be the dense decode's onsets even on the
    # fallback path
    t = np.arange(T)
    for n in range(N):
        mask = np.asarray(phase_of(np.asarray(x_dense).astype(np.int32),
                                   n, N, K, True)) == 1
        np.testing.assert_array_equal(onsets[n], t[mask])
