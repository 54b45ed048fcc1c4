"""Multi-channel model family (core/emission_mc, ops/ring_viterbi_mc,
models/multichannel) — a capability extension beyond the reference, which
discards all template channels but the first (src/hmmsort.jl:56).

Correctness anchors: the dense per-channel emission sum is checked against
an explicit loop; the structured ring MC engines are checked bit-for-bit
against the generic in-table engine decoding those dense emissions (itself
oracle-anchored); and with C = 1 every MC path must reproduce the
single-channel engines."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.emission_mc import (MCTables,
                                                 emission_logprob_mc,
                                                 mc_streams, state_means_mc)
from hmmspikesorter_tpu.core.path_score import path_cumulative_ll_mc
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode, viterbi_decode_em
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.models.multichannel import (HMMTemplateModelMC,
                                                    fit_spiking_model_mc,
                                                    fit_spiking_model_mc_fast,
                                                    predict_mc)
from hmmspikesorter_tpu.ops.ring_viterbi import (ring_viterbi_nov,
                                                 ring_viterbi_ov2)
from hmmspikesorter_tpu.ops.ring_viterbi_mc import (ring_viterbi_nov_mc,
                                                    ring_viterbi_ov2_mc,
                                                    ring_viterbi_ovn_mc)


def _mk_model(K, N, C, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    mu = rng.normal(0.0, 0.5, (K, N, C)) * scale
    mu[0] = rng.normal(0.0, 0.05, (N, C))     # nonzero silent rows
    sigmas = 0.2 + 0.2 * rng.random(C)
    lp = np.log(0.01 + 0.03 * rng.random(N))
    return mu, sigmas, lp


def _mk_signal(T, mu, sigmas, lp, seed=1):
    """(T, C) signal driven by one true spike train across all channels."""
    K, N, C = mu.shape
    rng = np.random.default_rng(seed)
    _, truth = create_signal(T, 0.0, np.exp(lp), mu[:, :, 0], rng=rng)
    yc = sigmas[None, :] * rng.standard_normal((T, C))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]               # generator plays rows k-1
    return yc, truth


@pytest.mark.parametrize("overlaps", [False, True])
def test_state_means_and_emission_match_loop(overlaps):
    K, N, C, T = 6, 2, 3, 50
    mu, sigmas, lp = _mk_model(K, N, C)
    ss = build_state_space(N, K, overlaps)
    S = ss.states.shape[1]
    smc = np.asarray(state_means_mc(jnp.asarray(ss.states), jnp.asarray(mu)))
    ref = np.zeros((S, C))
    for s in range(S):
        for n in range(N):
            ref[s] += mu[ss.states[n, s], n]
    np.testing.assert_allclose(smc, ref, atol=1e-12)

    yc, _ = _mk_signal(T, mu, sigmas, lp)
    em = np.asarray(emission_logprob_mc(jnp.asarray(yc), jnp.asarray(smc),
                                        jnp.asarray(sigmas)))
    t, s = 7, S // 2
    want = sum(-0.5 * np.log(2 * np.pi) - np.log(sigmas[c])
               - (yc[t, c] - ref[s, c]) ** 2 / (2 * sigmas[c] ** 2)
               for c in range(C))
    assert abs(em[t, s] - want) < 1e-10


@pytest.mark.parametrize("overlaps", [False, True])
def test_factorized_streams_match_dense_emission(overlaps):
    """es / d / c1 / x2 reconstruct the dense (T, S) emission exactly."""
    K, N, C, T = 6, 2, 2, 40
    mu, sigmas, lp = _mk_model(K, N, C, seed=3)
    yc, _ = _mk_signal(T, mu, sigmas, lp, seed=4)
    ss = build_state_space(N, K, overlaps)
    smc = state_means_mc(jnp.asarray(ss.states), jnp.asarray(mu))
    dense = np.asarray(emission_logprob_mc(jnp.asarray(yc), smc,
                                           jnp.asarray(sigmas)))
    tab = MCTables(mu, sigmas)
    es, d = mc_streams(yc, tab, dtype=jnp.float64)
    es, d = np.asarray(es), np.asarray(d)
    Km1 = K - 1
    # silent state
    np.testing.assert_allclose(es, dense[:, 0], atol=1e-9)
    # single-active states
    for n in range(N):
        for k in range(1, K):
            s = 1 + n * Km1 + (k - 1)
            np.testing.assert_allclose(es + d[:, n, k - 1] - tab.c1[n, k - 1],
                                       dense[:, s], atol=1e-9)
    if overlaps:
        base = 1 + N * Km1
        x2 = tab.x2[(0, 1)]
        for k1 in (1, 2, K - 1):
            for k2 in (1, 3, K - 1):
                s = base + (k1 - 1) * Km1 + (k2 - 1)
                eb0 = es + d[:, 0, k1 - 1] - tab.c1[0, k1 - 1]
                eb1 = es + d[:, 1, k2 - 1] - tab.c1[1, k2 - 1]
                np.testing.assert_allclose(
                    eb0 + eb1 - es + x2[k1 - 1, k2 - 1], dense[:, s],
                    atol=1e-9)


@pytest.mark.parametrize("overlaps,N,engine", [
    (False, 2, ring_viterbi_nov_mc),
    (False, 3, ring_viterbi_nov_mc),
    (True, 2, ring_viterbi_ov2_mc),
    (True, 2, ring_viterbi_ovn_mc),
    (True, 3, ring_viterbi_ovn_mc),
    (True, 4, ring_viterbi_ovn_mc),
])
def test_ring_mc_engines_match_generic(overlaps, N, engine):
    K, C, T = 7, 3, 300
    mu, sigmas, lp = _mk_model(K, N, C, seed=10 + N)
    yc, _ = _mk_signal(T, mu, sigmas, lp, seed=20 + N)
    ss = build_state_space(N, K, overlaps)
    smc = state_means_mc(jnp.asarray(ss.states), jnp.asarray(mu))
    em = emission_logprob_mc(jnp.asarray(yc), smc, jnp.asarray(sigmas))
    in_idx, in_w = ss.in_table(lp)
    xg, llg = viterbi_decode_em(em, jnp.asarray(in_idx), jnp.asarray(in_w))
    xr, llr = engine(yc, lp, mu, sigmas)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xg))
    assert abs(float(llr) - float(llg)) < 1e-6 * max(1.0, abs(float(llg)))


@pytest.mark.parametrize("overlaps", [False, True])
def test_c1_reduces_to_single_channel(overlaps):
    K, N, T = 8, 2, 400
    mu, sigmas, lp = _mk_model(K, N, 1, seed=5)
    yc, _ = _mk_signal(T, mu, sigmas, lp, seed=6)
    mc_engine = ring_viterbi_ov2_mc if overlaps else ring_viterbi_nov_mc
    sc_engine = ring_viterbi_ov2 if overlaps else ring_viterbi_nov
    xm, lm = mc_engine(yc, lp, mu, sigmas)
    xs, ls = sc_engine(jnp.asarray(yc[:, 0]), lp, jnp.asarray(mu[:, :, 0]),
                       float(sigmas[0]))
    np.testing.assert_array_equal(np.asarray(xm), np.asarray(xs))
    assert abs(float(lm) - float(ls)) < 1e-6 * max(1.0, abs(float(ls)))


def test_path_score_matches_engine_ll():
    K, N, C, T = 7, 2, 2, 500
    mu, sigmas, lp = _mk_model(K, N, C, seed=8)
    yc, _ = _mk_signal(T, mu, sigmas, lp, seed=9)
    for overlaps in (False, True):
        engine = ring_viterbi_ov2_mc if overlaps else ring_viterbi_nov_mc
        x, ll = engine(yc, lp, mu, sigmas)
        ss = build_state_space(N, K, overlaps)
        ll2 = path_cumulative_ll_mc(yc, np.asarray(x), ss.states, mu, sigmas,
                                    lp)
        assert abs(float(ll) - ll2) < 1e-6 * max(1.0, abs(ll2))


def _onset_counts(x, N, Km1):
    """Per-neuron onset counts from combined non-overlap state labels."""
    x = np.asarray(x)
    counts = []
    for n in range(N):
        onset = 1 + n * Km1
        counts.append(int(np.sum((x[1:] == onset) & (x[:-1] != onset))))
    return counts


def test_mc_disambiguates_templates_single_channel_cannot():
    """Two neurons with IDENTICAL channel-0 templates but distinct
    channel-1 templates: channel-0-only decode (what the reference's
    channel-1-only pipeline sees) must misattribute, the joint MC decode
    must recover the true per-neuron spike counts."""
    K, T = 9, 6000
    w = create_spike_template(K, 3.0, 0.8, 0.2)
    mu = np.zeros((K, 2, 2))
    mu[:, 0, 0] = w
    mu[:, 1, 0] = w                      # identical on channel 0
    mu[:, 0, 1] = w                      # distinct on channel 1:
    mu[:, 1, 1] = -w                     # opposite polarity
    sigmas = np.array([0.25, 0.25])
    lp = np.log([0.01, 0.01])
    yc, truth = _mk_signal(T, mu, sigmas, lp, seed=42)
    true_counts = [int(np.sum(truth[n] == 1)) for n in range(2)]
    assert min(true_counts) >= 5         # both neurons actually fired

    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    m_mc = fit_spiking_model_mc(tm, yc)
    mc_counts = _onset_counts(m_mc.ml_seq, 2, K - 1)

    x_sc, _ = ring_viterbi_nov(jnp.asarray(yc[:, 0]), lp,
                               jnp.asarray(mu[:, :, 0]), float(sigmas[0]))
    sc_counts = _onset_counts(x_sc, 2, K - 1)

    # channel 0 alone cannot tell the neurons apart: its tie-break dumps
    # (nearly) everything on neuron 0
    assert sc_counts[1] <= true_counts[1] // 5
    # the joint decode attributes both neurons correctly (within 10%)
    for n in range(2):
        assert abs(mc_counts[n] - true_counts[n]) <= max(
            1, true_counts[n] // 10)


@pytest.mark.parametrize("overlaps,N", [(False, 2), (True, 2), (True, 3)])
def test_mc_fast_matches_one_shot(overlaps, N):
    K, C = 7, 3
    mu, sigmas, lp = _mk_model(K, N, C, seed=13)
    yc, _ = _mk_signal(3000, mu, sigmas, lp, seed=14)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp,
                            allow_overlaps=overlaps)
    m = fit_spiking_model_mc(tm, yc)
    mf = fit_spiking_model_mc_fast(tm, yc, L=512, H=64)
    np.testing.assert_array_equal(np.asarray(mf.ml_seq), np.asarray(m.ml_seq))
    assert np.isfinite(mf.ll)
    assert abs(mf.ll - m.ll) < 1e-6 * max(1.0, abs(m.ll))


def test_mc_chunked_matches_whole():
    """Chunked decode follows the reference protocol (fit.jl:11-42), which
    is near- but not bit-identical to the whole-signal decode (each chunk
    restarts from forced silence — the reference's own chunker has the
    same property). Assert high agreement against the whole-signal decode,
    and C = 1 equality against the single-channel chunked path (same
    shared protocol loop, same engine semantics)."""
    K, N, C = 7, 2, 2
    mu, sigmas, lp = _mk_model(K, N, C, seed=15)
    yc, _ = _mk_signal(2500, mu, sigmas, lp, seed=16)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    m = fit_spiking_model_mc(tm, yc)
    mc = fit_spiking_model_mc(tm, yc, chunksize=700)
    assert float((np.asarray(mc.ml_seq) == np.asarray(m.ml_seq)).mean()) > 0.99

    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model)

    mu1, sigmas1, lp1 = _mk_model(K, N, 1, seed=25)
    yc1, _ = _mk_signal(2500, mu1, sigmas1, lp1, seed=26)
    tm1 = HMMTemplateModelMC(mu=mu1, sigmas=sigmas1, lp=lp1)
    sc = HMMTemplateModel(mu=mu1[:, :, 0], sigma=float(sigmas1[0]), lp=lp1)
    a = fit_spiking_model_mc(tm1, yc1, chunksize=700)
    b = fit_spiking_model(sc, yc1[:, 0], chunksize=700)
    np.testing.assert_array_equal(np.asarray(a.ml_seq), np.asarray(b.ml_seq))
    assert abs(a.ll - b.ll) < 1e-6 * max(1.0, abs(b.ll))


def test_mc_decode_n3_overlaps_end_to_end():
    """N >= 3 overlap topologies decode through the table-driven MC
    engine; labels land in range with a finite ll."""
    K, N, C = 5, 3, 2
    mu, sigmas, lp = _mk_model(K, N, C, seed=17, scale=2.0)
    yc, _ = _mk_signal(300, mu, sigmas, lp, seed=18)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp, allow_overlaps=True)
    m = fit_spiking_model_mc(tm, yc)
    S = tm.state_space.states.shape[1]
    assert np.asarray(m.ml_seq).shape == (300,)
    assert np.asarray(m.ml_seq).max() < S
    assert np.isfinite(m.ll)


def test_predict_mc_reconstruction():
    K, N, C = 9, 2, 3
    mu, sigmas, lp = _mk_model(K, N, C, seed=19, scale=3.0)
    yc, truth = _mk_signal(4000, mu, sigmas, lp, seed=20)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    m = fit_spiking_model_mc(tm, yc)
    Y = predict_mc(m)
    assert Y.shape == yc.shape
    # reconstruction must explain a substantial part of each channel's
    # spike variance (the signal is high-SNR by construction)
    for c in range(C):
        clean = yc[:, c] - sigmas[c] * 0  # noisy; compare residual stds
        q = 1 - np.std(yc[:, c] - Y[:, c]) / np.std(yc[:, c])
        assert q > 0.05


def test_channel_projection_model():
    K, N, C = 6, 2, 3
    mu, sigmas, lp = _mk_model(K, N, C, seed=21)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    one = tm.channel(1)
    np.testing.assert_array_equal(one.mu, mu[:, :, 1])
    assert one.sigma == sigmas[1]


def test_extract_spiketimes_mc():
    """Regression: extract_spiketimes must index the trough on ONE channel
    of a (K, N, C) template, not argmin over the flattened (K, C) block
    (which returned a bogus ring position -> zero spikes)."""
    from hmmspikesorter_tpu.io.extraction import extract_spiketimes

    K, T = 9, 6000
    w = create_spike_template(K, 3.0, 0.8, 0.2)
    mu = np.zeros((K, 2, 2))
    mu[:, 0, 0] = w
    mu[:, 1, 0] = 0.2 * w
    mu[:, 0, 1] = 0.2 * w
    mu[:, 1, 1] = -w
    sigmas = np.array([0.25, 0.25])
    lp = np.log([0.01, 0.01])
    yc, truth = _mk_signal(T, mu, sigmas, lp, seed=42)
    true_counts = [int(np.sum(truth[n] == 1)) for n in range(2)]
    assert min(true_counts) >= 5

    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    m = fit_spiking_model_mc(tm, yc)
    times = extract_spiketimes(m)
    # one alignment event per decoded spike (tail spikes may be truncated
    # before reaching the trough position, hence the <= with slack 1)
    for n in range(2):
        assert abs(len(times[n]) - true_counts[n]) <= max(
            1, true_counts[n] // 10), (n, len(times[n]), true_counts[n])


def test_mc_fast_streaming_matches_oneshot():
    """The fixed-shape streaming MC driver (raw (B, W, C) windows, on-device
    projection) must reproduce the one-shot mc_overlap_save labels exactly
    (the projection is pointwise in t, so windowing commutes with it)."""
    K, N, C = 7, 2, 3
    mu, sigmas, lp = _mk_model(K, N, C, seed=23)
    yc, _ = _mk_signal(4096, mu, sigmas, lp, seed=24)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp, allow_overlaps=True)
    one = fit_spiking_model_mc_fast(tm, yc, L=512, H=64, streaming=False)
    stream = fit_spiking_model_mc_fast(tm, yc, L=512, H=64, streaming=True,
                                       blocks_per_call=3)
    np.testing.assert_array_equal(np.asarray(stream.ml_seq),
                                  np.asarray(one.ml_seq))
    assert abs(stream.ll - one.ll) < 1e-6 * max(1.0, abs(one.ll))


def test_mc_fast_auto_streams_past_block_cap(monkeypatch):
    """streaming=None auto-routes long MC recordings through the
    fixed-shape driver, same contract as the single-channel path."""
    import hmmspikesorter_tpu.models.api as api_mod
    import hmmspikesorter_tpu.parallel.overlap_save as ovs

    K, N, C = 7, 2, 2
    mu, sigmas, lp = _mk_model(K, N, C, seed=25)
    yc, _ = _mk_signal(4096, mu, sigmas, lp, seed=26)
    tm = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    monkeypatch.setattr(api_mod, "MAX_ONESHOT_BLOCKS", 4)
    called = {}
    orig = ovs.overlap_save_decode_long

    def spy(*a, **k):
        called["streamed"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ovs, "overlap_save_decode_long", spy)
    auto = fit_spiking_model_mc_fast(tm, yc, L=512, H=64)   # B=8 > cap=4
    assert called.get("streamed")
    one = fit_spiking_model_mc_fast(tm, yc, L=512, H=64, streaming=False)
    np.testing.assert_array_equal(np.asarray(auto.ml_seq),
                                  np.asarray(one.ml_seq))


@pytest.mark.slow
def test_mc_engines_randomized_property_sweep():
    """Randomized topology sweep (the MC mirror of test_path_score's
    property check): random N/K/C/overlaps/rates/noise/gains — the
    structured MC engines must bit-match the generic dense decoder and
    agree on ll, on every draw."""
    rng = np.random.default_rng(1234)
    for trial in range(8):
        N = int(rng.integers(2, 5))
        K = int(rng.integers(5, 11))
        C = int(rng.integers(1, 5))
        overlaps = bool(rng.integers(0, 2))
        T = int(rng.integers(150, 400))
        mu, sigmas, lp = _mk_model(K, N, C, seed=1000 + trial,
                                   scale=float(0.5 + rng.random()))
        yc, _ = _mk_signal(T, mu, sigmas, lp, seed=2000 + trial)
        ss = build_state_space(N, K, overlaps)
        smc = state_means_mc(jnp.asarray(ss.states), jnp.asarray(mu))
        em = emission_logprob_mc(jnp.asarray(yc), smc, jnp.asarray(sigmas))
        in_idx, in_w = ss.in_table(lp)
        xg, llg = viterbi_decode_em(em, jnp.asarray(in_idx),
                                    jnp.asarray(in_w))
        if not overlaps:
            engines = [ring_viterbi_nov_mc]
        elif N == 2:
            engines = [ring_viterbi_ov2_mc, ring_viterbi_ovn_mc]
        else:
            engines = [ring_viterbi_ovn_mc]
        for engine in engines:
            xr, llr = engine(yc, lp, mu, sigmas)
            np.testing.assert_array_equal(
                np.asarray(xr), np.asarray(xg),
                err_msg=f"trial {trial}: N={N} K={K} C={C} "
                        f"overlaps={overlaps} {engine.__name__}")
            assert abs(float(llr) - float(llg)) < 1e-6 * max(
                1.0, abs(float(llg)))
