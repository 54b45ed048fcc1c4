"""EM parity vs the literal reference oracle, plus end-to-end training
convergence (mirrors reference test/runtests.jl:71-83 at reduced scale)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.train import template_ops
from hmmspikesorter_tpu.train.em import (
    EMTables, em_step, edge_weights_from_structure, train_model)
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from tests.oracle import reference_semantics as ref


def _small_case(N=2, K=8, T=600, sigma=0.35, seed=7):
    rng = np.random.default_rng(seed)
    temps = np.stack(
        [create_spike_template(K, 3.0, 0.8, 0.2),
         create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.01, 0.006][:N])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, False)
    lp = np.log(pp)
    return y, temps, ss, lp, sigma


def test_edge_weights_from_structure_matches_host():
    ss = build_state_space(3, 6, False)
    lp = np.log([0.01, 0.004, 0.002])
    in_idx, in_nsil, in_ons, in_valid = ss.in_table_structure()
    w = np.asarray(edge_weights_from_structure(
        jnp.asarray(lp), jnp.asarray(in_nsil), jnp.asarray(in_ons),
        jnp.asarray(in_valid)))
    _, w_host = ss.in_table(lp)
    np.testing.assert_allclose(w, w_host, rtol=0, atol=1e-12)


def test_em_step_matches_oracle():
    y, temps, ss, lp, sigma = _small_case()
    edges = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                     ss.edge_weights(lp).tolist()))
    alpha = ref.forward(y, ss.states, edges, temps, sigma).T
    beta = ref.backward(y, ss.states, edges, temps, sigma).T
    lp_ref, pi_ref, mu_ref, sig_ref = ref.em_update(
        alpha.T, beta.T, ss.states, edges, ss.K, temps, sigma, y)

    tables = EMTables.build(ss)
    lp_new, pi_new, mu_new, sig_new, ll = em_step(
        jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
        jnp.asarray(sigma), tables, K=ss.K)

    np.testing.assert_allclose(np.asarray(lp_new), lp_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(pi_new), pi_ref, rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_new), mu_ref, rtol=0, atol=1e-8)
    assert float(sig_new) == pytest.approx(sig_ref, rel=1e-8)
    # ll is logsumexp(alpha[-1])
    m = alpha[-1].max()
    ll_ref = m + np.log(np.exp(alpha[-1] - m).sum())
    assert float(ll) == pytest.approx(ll_ref, rel=1e-10)


def test_em_improves_loglikelihood():
    y, temps, ss, lp, sigma = _small_case(T=1200)
    tables = EMTables.build(ss)
    # start from perturbed templates
    rng = np.random.default_rng(3)
    mu = temps + 0.3 * rng.standard_normal(temps.shape)
    mu[0, :] = 0.0
    lls = []
    lp_d, mu_d, sig_d = jnp.asarray(lp), jnp.asarray(mu), jnp.asarray(sigma)
    yd = jnp.asarray(y)
    for _ in range(5):
        lp_d, _, mu_d, sig_d, ll = em_step(yd, lp_d, mu_d, sig_d, tables, K=ss.K)
        lls.append(float(ll))
    # The reference's update is approximate EM ("KIND OF WORKS",
    # baumwelch.jl:204): near convergence ll can wiggle by ~1e-4, so assert
    # near-monotonicity plus substantial net improvement.
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:]))
    assert lls[-1] > lls[0] + 1.0


def test_train_model_converges_to_two_templates():
    # reference test/runtests.jl:71-83, same config: 30k-sample synthetic
    # 2-cell signal, K=60, EM from 7 random templates; merge+prune must land
    # on exactly 2 templates matching the truth within 1% of their energy.
    # RNG-dependent like the reference (which pins a MersenneTwister seed);
    # seed pinned here the same way.
    rng = np.random.default_rng(1234)
    K, T, sigma = 60, 30000, 0.3
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    res = train_model(y, 7, K, nsteps=10, rng=np.random.default_rng(1))
    assert res.n_neurons == 2
    mm, cc = template_ops.match_templates(res.mu, temps)
    assert set(mm.tolist()) == {0, 1}
    energies = (temps ** 2).sum(axis=0)
    for i in range(2):
        assert cc[i] < 0.01 * energies[mm[i]]


def test_ring_fb_matches_gather_fb():
    from hmmspikesorter_tpu.core.forward_backward import backward, forward
    from hmmspikesorter_tpu.core.emission import state_means
    from hmmspikesorter_tpu.ops.ring_fb import ring_backward, ring_forward
    y, temps, ss, lp, sigma = _small_case(T=1500, K=10)
    in_idx, in_w = ss.in_table(lp)
    out_idx, out_w = ss.out_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    a_g = forward(jnp.asarray(y), jnp.asarray(in_idx), jnp.asarray(in_w),
                  smu, sigma)
    b_g = backward(jnp.asarray(y), jnp.asarray(out_idx), jnp.asarray(out_w),
                   smu, sigma)
    a_r = ring_forward(jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
                       jnp.asarray(sigma))
    b_r = ring_backward(jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
                        jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(a_r), np.asarray(a_g), atol=1e-11)
    np.testing.assert_allclose(np.asarray(b_r), np.asarray(b_g), atol=1e-11)


@pytest.mark.parametrize("mode", ["ring", "blocked"])
def test_em_step_fb_modes_match_gather(mode):
    y, temps, ss, lp, sigma = _small_case(T=1024)
    tables = EMTables.build(ss)
    args = (jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
            jnp.asarray(sigma), tables)
    out_m = em_step(*args, K=ss.K, fb_mode=mode, block=128)
    out_g = em_step(*args, K=ss.K, fb_mode="gather")
    for m, g in zip(out_m, out_g):
        np.testing.assert_allclose(np.asarray(m), np.asarray(g), atol=1e-9)


def test_streaming_em_matches_materialized():
    from hmmspikesorter_tpu.train.streaming_em import streaming_em_step
    y, temps, ss, lp, sigma = _small_case(T=1024)
    tables = EMTables.build(ss)
    args = (jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
            jnp.asarray(sigma), tables)
    out_m = em_step(*args, K=ss.K, fb_mode="gather")
    out_s = streaming_em_step(*args, K=ss.K, L=128)
    names = ["lp", "pi", "mu", "sigma", "ll"]
    for n, m, s in zip(names, out_m, out_s):
        np.testing.assert_allclose(np.asarray(s), np.asarray(m), atol=1e-9,
                                   err_msg=n)


def test_em_step_overlap_mode_matches_gather():
    """The halo-window EM engine (fb_mode='overlap'): per-window constants
    cancel in every statistic and the telescoped ll is exact, so one EM
    step matches the exact gather engine to float precision."""
    import jax.numpy as jnp

    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu.train.em import EMTables, em_step

    K, T, sigma = 14, 8192, 0.3
    rng = np.random.default_rng(4)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.004])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(2, K, False)
    tables = EMTables.build(ss)
    args = (jnp.asarray(y), jnp.asarray(np.log(pp)), jnp.asarray(temps),
            jnp.asarray(sigma))
    lp_g, pi_g, mu_g, sg_g, ll_g = em_step(*args, tables, K=K,
                                           fb_mode="gather")
    lp_o, pi_o, mu_o, sg_o, ll_o = em_step(*args, tables, K=K,
                                           fb_mode="overlap")
    np.testing.assert_allclose(np.asarray(lp_o), np.asarray(lp_g),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(mu_o), np.asarray(mu_g),
                               atol=1e-9)
    assert float(sg_o) == pytest.approx(float(sg_g), rel=1e-10)
    assert float(ll_o) == pytest.approx(float(ll_g), rel=1e-10)
    np.testing.assert_allclose(np.asarray(pi_o), np.asarray(pi_g),
                               atol=1e-7)


@pytest.mark.parametrize("T", [1288, 1290, 1280 + 63])
def test_em_step_overlap_mode_ragged_T(T):
    """Ragged T with 0 < T mod L < H: the second-to-last window's right
    halo must decode the real signal end, not the zero pad (whose fake
    silence biased beta/gamma near (B-1)*L — review finding r2)."""
    import jax.numpy as jnp

    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu.train.em import EMTables, em_step

    K, sigma = 14, 2.0                   # large sigma amplifies the bias
    rng = np.random.default_rng(4)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.004])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(2, K, False)
    tables = EMTables.build(ss)
    args = (jnp.asarray(y), jnp.asarray(np.log(pp)), jnp.asarray(temps),
            jnp.asarray(sigma))
    # block=256 -> Lov = max(256, 4*max(4K,64)) = 256, H = 64
    lp_g, _, mu_g, sg_g, ll_g = em_step(*args, tables, K=K,
                                        fb_mode="gather")
    lp_o, _, mu_o, sg_o, ll_o = em_step(*args, tables, K=K,
                                        fb_mode="overlap")
    np.testing.assert_allclose(np.asarray(lp_o), np.asarray(lp_g),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(mu_o), np.asarray(mu_g),
                               atol=1e-7)
    assert float(ll_o) == pytest.approx(float(ll_g), rel=1e-9)


def test_em_chain_matches_sequential_steps():
    """em_chain (n iterations in one program) == n chained em_step calls
    bit-for-bit on the same engine."""
    from hmmspikesorter_tpu.train.em import em_chain

    y, temps, ss, lp, sigma = _small_case(T=800)
    tables = EMTables.build(ss)
    args0 = (jnp.asarray(y), jnp.asarray(lp), jnp.asarray(temps),
             jnp.asarray(sigma))
    l, m, s = args0[1], args0[2], args0[3]
    lls = []
    for _ in range(3):
        l, pi, m, s, ll = em_step(args0[0], l, m, s, tables, K=8,
                                  fb_mode="ring")
        lls.append(float(ll))
    cl, cpi, cm, cs, clls = em_chain(args0[0], args0[1], args0[2], args0[3],
                                     tables, K=8, n_iters=3, fb_mode="ring")
    np.testing.assert_array_equal(np.asarray(cl), np.asarray(l))
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(m))
    np.testing.assert_array_equal(np.asarray(cpi), np.asarray(pi))
    assert float(cs) == float(s)
    np.testing.assert_allclose(np.asarray(clls), lls, rtol=0)


def test_f32_training_survives_dying_templates_single_channel():
    """Single-channel mirror of the MC f32 regression: over-provisioned
    init, dying templates' occupancies underflow to 0 in f32 — the
    occ_divide guard must keep every iteration finite."""
    import jax.numpy as jnp
    from hmmspikesorter_tpu.train.em import train_model

    K, T = 12, 12000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3)], axis=1)
    rng = np.random.default_rng(6)
    y, _ = create_signal(T, 0.3, np.array([0.01, 0.006]), temps, rng=rng)
    res = train_model(y.astype(np.float32), n_neurons=4, K=K, nsteps=8,
                      dtype=jnp.float32, fb_mode="gather",
                      rng=np.random.default_rng(3))
    assert np.all(np.isfinite(np.asarray(res.ll_history)))
    assert np.isfinite(res.sigma)
    assert 1 <= res.n_neurons <= 3
