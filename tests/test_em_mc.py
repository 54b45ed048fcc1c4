"""Multi-channel Baum-Welch (train/em_mc.py): C=1 reduction equality to the
single-channel EM, per-channel template/noise recovery, and the full
training protocol on a (T, C) recording."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.train.em import EMTables, em_step
from hmmspikesorter_tpu.train.em_mc import (condense_templates_mc,
                                            em_chain_mc, em_step_mc,
                                            remove_small_mc, train_model_mc)


def _mc_signal(T, mu, sigmas, lp, seed=0):
    """(T, C) recording from one true spike train (generator plays template
    rows k-1 at ring position k, data/synthetic.py)."""
    K, N, C = mu.shape
    rng = np.random.default_rng(seed)
    _, truth = create_signal(T, 0.0, np.exp(lp), mu[:, :, 0], rng=rng)
    yc = sigmas[None, :] * rng.standard_normal((T, C))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    return yc, truth


def test_em_step_mc_c1_matches_single_channel():
    """With one channel the MC EM step must reproduce the single-channel
    em_step (gather engine) to float reassociation tolerance."""
    K, N, T = 12, 2, 4000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.0, 0.5, 0.3)], axis=1)
    pp = np.array([0.01, 0.005])
    rng = np.random.default_rng(1)
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    lp = jnp.asarray(np.log(pp))
    tables = EMTables.build(build_state_space(N, K, False))

    r_lp, r_pi, r_mu, r_sg, r_ll = em_step(
        jnp.asarray(y), lp, jnp.asarray(temps), jnp.float64(0.3), tables,
        K=K, fb_mode="gather")
    o_lp, o_pi, o_mu, o_sg, o_ll = em_step_mc(
        jnp.asarray(y[:, None]), lp, jnp.asarray(temps[:, :, None]),
        jnp.asarray([0.3]), tables, K=K)

    np.testing.assert_allclose(np.asarray(o_lp), np.asarray(r_lp),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(o_mu)[:, :, 0], np.asarray(r_mu),
                               rtol=1e-8, atol=1e-10)
    assert float(o_sg[0]) == pytest.approx(float(r_sg), rel=1e-9)
    assert float(o_ll) == pytest.approx(float(r_ll), rel=1e-10)
    m = np.asarray(r_pi) > -50
    np.testing.assert_allclose(np.asarray(o_pi)[m], np.asarray(r_pi)[m],
                               rtol=1e-7, atol=1e-7)


def test_em_mc_recovers_per_channel_templates():
    """EM from a perturbed init must recover distinct per-channel template
    shapes and the per-channel noise levels."""
    K, N, C, T = 10, 2, 3, 20000
    w1 = create_spike_template(K, 3.0, 0.8, 0.2)
    w2 = create_spike_template(K, 2.5, 0.4, 0.3)
    gains = np.array([[1.0, 0.3, 0.7], [0.2, 1.0, 0.5]])   # (N, C)
    mu = np.zeros((K, N, C))
    mu[:, 0, :] = w1[:, None] * gains[0]
    mu[:, 1, :] = w2[:, None] * gains[1]
    sigmas = np.array([0.25, 0.3, 0.2])
    lp = np.log([0.01, 0.008])
    yc, _ = _mc_signal(T, mu, sigmas, lp, seed=7)

    rng = np.random.default_rng(3)
    mu0 = mu + 0.3 * rng.standard_normal(mu.shape)
    mu0[0] = 0.0
    tables = EMTables.build(build_state_space(N, K, False))
    lp_l, _, mu_l, sg_l, lls = em_chain_mc(
        jnp.asarray(yc), jnp.asarray(lp), jnp.asarray(mu0),
        jnp.asarray(sigmas * 1.3), tables, K=K, n_iters=20)
    mu_l, sg_l = np.asarray(mu_l), np.asarray(sg_l)
    lls = np.asarray(lls)

    assert np.isfinite(lls).all()
    assert lls[-1] >= lls[0]
    # the templates here start and end near zero, so the EM's preferred
    # alignment has learned row k ~ true row k on every channel (the ring
    # has K-1 body slots for the generator's K rows; the ~0 end row is
    # absorbed)
    err = np.abs(mu_l - mu).max()
    assert err < 0.1, err
    np.testing.assert_allclose(sg_l, sigmas, rtol=0.05)
    np.testing.assert_allclose(np.asarray(lp_l), lp, atol=0.15)


def test_condense_templates_mc_merges_duplicates():
    K, C = 9, 2
    w = create_spike_template(K, 3.0, 0.8, 0.2)
    g = np.array([1.0, 0.4])
    mu = np.zeros((K, 3, C))
    mu[:, 0] = w[:, None] * g
    mu[:, 1] = w[:, None] * g          # duplicate of 0
    mu[:, 2, 0] = -2.0 * w             # distinct
    lp = np.log([0.01, 0.01, 0.02])
    mu2, lp2 = condense_templates_mc(mu, lp, np.array([0.3, 0.3]))
    assert mu2.shape[1] == 2
    # merged pair keeps the mixture onset prob
    assert lp2[0] == pytest.approx(np.log(0.01))


def test_remove_small_mc():
    K, C = 9, 2
    w = create_spike_template(K, 3.0, 0.8, 0.2)
    mu = np.zeros((K, 2, C))
    mu[:, 0] = w[:, None]              # significant
    mu[:, 1] = 0.01 * w[:, None]       # noise-level
    keep = remove_small_mc(mu, np.array([0.3, 0.3]))
    np.testing.assert_array_equal(keep, [0])


def test_train_model_mc_end_to_end():
    """Full protocol: over-provisioned init (4 neurons) on a 2-neuron MC
    signal must converge to 2 surviving templates whose decoded counts
    match (the MC analog of the reference's 7->2 training test)."""
    K, C, T = 10, 2, 16000
    w1 = create_spike_template(K, 4.0, 0.8, 0.2)
    w2 = create_spike_template(K, 3.0, 0.4, 0.3)
    mu = np.zeros((K, 2, C))
    mu[:, 0, 0] = w1
    mu[:, 0, 1] = 0.3 * w1
    mu[:, 1, 0] = 0.3 * w2
    mu[:, 1, 1] = w2
    sigmas = np.array([0.2, 0.2])
    lp = np.log([0.01, 0.008])
    yc, truth = _mc_signal(T, mu, sigmas, lp, seed=11)

    model, pi, lls = train_model_mc(yc, n_neurons=4, K=K, nsteps=10,
                                    rng=np.random.default_rng(0))
    assert model.n_neurons == 2, model.n_neurons
    assert model.n_channels == C
    assert np.isfinite(lls).all()
    np.testing.assert_allclose(model.sigmas, sigmas, rtol=0.1)


def test_em_step_mc_overlap_matches_gather():
    """The halo-window MC engine (fb_mode="overlap", streams through
    ops/ring_fb.ring_overlap_forward_backward_mc) must reproduce the
    gather-engine MC EM step at f64: the per-window constants cancel in
    every statistic and the halo error is below float precision."""
    K, N, C, T = 12, 2, 3, 4000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.0, 0.5, 0.3)], axis=1)
    rng = np.random.default_rng(5)
    gains = 0.3 + rng.random((N, C))
    mu = temps[:, :, None] * gains[None, :, :]
    pp = np.array([0.01, 0.005])
    sigmas = 0.2 + 0.1 * rng.random(C)
    yc, _ = _mc_signal(T, mu, sigmas, np.log(pp), seed=3)
    lp = jnp.asarray(np.log(pp))
    tables = EMTables.build(build_state_space(N, K, False))

    args = (jnp.asarray(yc), lp, jnp.asarray(mu), jnp.asarray(sigmas),
            tables)
    r = em_step_mc(*args, K=K, fb_mode="gather")
    o = em_step_mc(*args, K=K, fb_mode="overlap", block=256)

    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(r[0]),
                               rtol=1e-9, atol=1e-9)          # lp
    np.testing.assert_allclose(np.asarray(o[2]), np.asarray(r[2]),
                               rtol=1e-8, atol=1e-10)         # mu
    np.testing.assert_allclose(np.asarray(o[3]), np.asarray(r[3]),
                               rtol=1e-9)                     # sigmas
    assert float(o[4]) == pytest.approx(float(r[4]), rel=1e-9)  # ll
    m = np.asarray(r[1]) > -50
    np.testing.assert_allclose(np.asarray(o[1])[m], np.asarray(r[1])[m],
                               rtol=1e-7, atol=1e-7)          # pi


def test_em_chain_mc_overlap_mode_runs():
    """em_chain_mc(fb_mode="overlap") chains and improves ll like the
    gather mode (values equal at f64 tolerance per-iteration)."""
    K, N, C, T = 10, 2, 2, 3000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.5, 0.4, 0.3)], axis=1)
    rng = np.random.default_rng(9)
    mu = temps[:, :, None] * (0.4 + rng.random((N, C)))[None]
    pp = np.array([0.012, 0.008])
    sigmas = np.array([0.25, 0.3])
    yc, _ = _mc_signal(T, mu, sigmas, np.log(pp), seed=11)
    tables = EMTables.build(build_state_space(N, K, False))
    args = (jnp.asarray(yc), jnp.asarray(np.log(pp)), jnp.asarray(mu),
            jnp.asarray(sigmas), tables)
    _, _, _, _, lls_g = em_chain_mc(*args, K=K, n_iters=3)
    _, _, _, _, lls_o = em_chain_mc(*args, K=K, n_iters=3,
                                    fb_mode="overlap", block=256)
    np.testing.assert_allclose(np.asarray(lls_o), np.asarray(lls_g),
                               rtol=1e-9)
    assert np.all(np.diff(np.asarray(lls_o)) > -1e-6)


def test_f32_training_survives_dying_templates():
    """Over-provisioned init (4 templates, 2 true cells): dying templates'
    occupancies underflow to exactly 0 in f32 long before the -70 pruning
    threshold; the occupancy-guarded M-step (train/em.occ_divide) must
    keep the iteration finite and converge, instead of 0/0 template means
    poisoning the chain (observed: nan/-inf from iteration 5 pre-guard)."""
    from hmmspikesorter_tpu.train.em_mc import train_model_mc

    K, N, C, T = 12, 2, 2, 12000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3)], axis=1)
    rng = np.random.default_rng(2)
    mu = temps[:, :, None] * (0.4 + rng.random((N, C)))
    sigmas = np.array([0.3, 0.26])
    yc, _ = _mc_signal(T, mu, sigmas, np.log([0.01, 0.006]), seed=8)
    model, pi, lls = train_model_mc(yc, n_neurons=4, K=K, nsteps=8,
                                    dtype=jnp.float32, fb_mode="gather",
                                    rng=np.random.default_rng(3))
    assert np.all(np.isfinite(np.asarray(lls)))
    assert np.all(np.isfinite(np.asarray(model.sigmas)))
    assert 1 <= model.mu.shape[1] <= 3


def test_train_model_mc_observability(tmp_path):
    """verbose/metrics/checkpoint/callback parity with the single-channel
    driver: per-iteration metrics rows, a resumable checkpoint with the
    (C,) sigmas array, and template callbacks."""
    from hmmspikesorter_tpu.train.em_mc import train_model_mc
    from hmmspikesorter_tpu.utils.checkpoint import load_checkpoint
    from hmmspikesorter_tpu.utils.metrics import MetricsLogger

    K, N, C, T = 10, 2, 2, 4000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.5, 0.4, 0.3)], axis=1)
    rng = np.random.default_rng(4)
    mu = temps[:, :, None] * (0.4 + rng.random((N, C)))
    sigmas = np.array([0.3, 0.25])
    yc, _ = _mc_signal(T, mu, sigmas, np.log([0.01, 0.006]), seed=5)

    seen = []
    logger = MetricsLogger(str(tmp_path / "m.jsonl"), echo=False)
    model, pi, lls = train_model_mc(
        yc, n_neurons=2, K=K, nsteps=3, rng=np.random.default_rng(1),
        metrics=logger, checkpoint_dir=str(tmp_path),
        callback=lambda m: seen.append(m.shape))
    logger.close()
    assert len(seen) >= 3                      # called before each iter
    rows = [l for l in open(tmp_path / "m.jsonl")]
    assert len(rows) >= 3
    state, meta = load_checkpoint(str(tmp_path / "em_mc_latest.npz"))
    assert state["mu"].ndim == 3               # (K, N, C)
    assert np.asarray(state["sigma"]).shape == (C,)
    assert meta["phase"] in ("em1", "em2")


def test_refit_template_model_mc_warm_start(tmp_path):
    """MC fit! analog: resume training from a checkpoint-reconstructed
    model; the warm-started chain must continue improving the same ll."""
    from hmmspikesorter_tpu.models.multichannel import (
        HMMTemplateModelMC, refit_template_model_mc)
    from hmmspikesorter_tpu.train.em_mc import train_model_mc
    from hmmspikesorter_tpu.utils.checkpoint import load_checkpoint

    K, N, C, T = 10, 2, 2, 4000
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.5, 0.4, 0.3)], axis=1)
    rng = np.random.default_rng(4)
    mu = temps[:, :, None] * (0.4 + rng.random((N, C)))
    sigmas = np.array([0.3, 0.25])
    yc, _ = _mc_signal(T, mu, sigmas, np.log([0.01, 0.006]), seed=5)
    train_model_mc(yc, n_neurons=2, K=K, nsteps=3,
                   rng=np.random.default_rng(1),
                   checkpoint_dir=str(tmp_path))
    state, meta = load_checkpoint(str(tmp_path / "em_mc_latest.npz"))
    resumed = HMMTemplateModelMC(mu=state["mu"], sigmas=state["sigma"],
                                 lp=state["lp"], allow_overlaps=False)
    ll_at_ckpt = meta["ll_history"][-1]
    refit = refit_template_model_mc(resumed, yc, nsteps=3)
    # one more f64 chain from the checkpoint improves (or holds) the ll
    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu.train.em import EMTables
    from hmmspikesorter_tpu.train.em_mc import em_step_mc

    tables = EMTables.build(build_state_space(2, K, False))
    ll_after = float(em_step_mc(
        jnp.asarray(yc), jnp.asarray(refit.lp), jnp.asarray(refit.mu),
        jnp.asarray(refit.sigmas), tables, K=K)[4])
    assert ll_after >= ll_at_ckpt - 1e-6
