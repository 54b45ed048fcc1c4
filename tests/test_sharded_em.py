"""Distributed EM step == single-device EM step on the fake CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.parallel.sharded_em import sharded_em_step
from hmmspikesorter_tpu.train.em import EMTables, em_step
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template


def _mk(N=2, K=12, T=4096, sigma=0.3, seed=9):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.004, 0.002][:N])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, False)
    return y, temps, np.log(pp), sigma, ss


@pytest.mark.parametrize("tdev,cdev", [(8, 1), (4, 2), (2, 1)])
def test_sharded_em_matches_single_device(tdev, cdev):
    y, mu, lp, sigma, ss = _mk()
    tables = EMTables.build(ss)
    C = cdev  # one channel per channel-shard for the parity check
    ys = np.stack([y] * C)
    lps = np.stack([lp] * C)
    mus = np.stack([mu] * C)
    sigmas = np.full(C, sigma)

    devs = np.array(jax.devices()[: tdev * cdev]).reshape(cdev, tdev)
    mesh = Mesh(devs, ("channel", "time"))
    out = sharded_em_step(ys, lps, mus, sigmas, tables, mesh, K=ss.K, L=256)
    lp_sh, pi_sh, mu_sh, sig_sh, ll_sh = map(np.asarray, out)

    lp_1, pi_1, mu_1, sig_1, ll_1 = em_step(
        jnp.asarray(y), jnp.asarray(lp), jnp.asarray(mu), jnp.asarray(sigma),
        tables, K=ss.K)
    for c in range(C):
        np.testing.assert_allclose(lp_sh[c], np.asarray(lp_1), rtol=1e-9)
        np.testing.assert_allclose(pi_sh[c], np.asarray(pi_1), atol=1e-9)
        np.testing.assert_allclose(mu_sh[c], np.asarray(mu_1), atol=1e-9)
        assert sig_sh[c] == pytest.approx(float(sig_1), rel=1e-10)
        assert ll_sh[c] == pytest.approx(float(ll_1), rel=1e-10)


def test_sharded_em_distinct_channels():
    # different channels get genuinely different models
    tables = None
    ys, lps, mus, sigmas = [], [], [], []
    for seed in (1, 2):
        y, mu, lp, sigma, ss = _mk(seed=seed)
        tables = EMTables.build(ss)
        ys.append(y); lps.append(lp); mus.append(mu); sigmas.append(sigma)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("channel", "time"))
    out = sharded_em_step(np.stack(ys), np.stack(lps), np.stack(mus),
                          np.asarray(sigmas), tables, mesh, K=ss.K, L=256)
    lp_sh, _, mu_sh, sig_sh, ll_sh = map(np.asarray, out)
    for c, seed in enumerate((1, 2)):
        y, mu, lp, sigma, ss = _mk(seed=seed)
        lp_1, _, mu_1, sig_1, ll_1 = em_step(
            jnp.asarray(y), jnp.asarray(lp), jnp.asarray(mu),
            jnp.asarray(sigma), tables, K=ss.K)
        np.testing.assert_allclose(lp_sh[c], np.asarray(lp_1), rtol=1e-9)
        np.testing.assert_allclose(mu_sh[c], np.asarray(mu_1), atol=1e-9)
        assert ll_sh[c] == pytest.approx(float(ll_1), rel=1e-10)


@pytest.mark.slow
def test_batched_training_recovers_templates():
    import jax
    from jax.sharding import Mesh
    from hmmspikesorter_tpu.models import api
    from hmmspikesorter_tpu.train import template_ops

    K, T, sigma = 20, 8192, 0.3
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    ys = np.stack([create_signal(T, sigma, pp, temps,
                                 rng=np.random.default_rng(s))[0]
                   for s in (1, 2)])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("channel", "time"))
    models = api.fit_template_models_batched(
        ys, n_neurons=3, K=K, nsteps=6, mesh=mesh,
        rng=np.random.default_rng(7), surgery=False)
    assert len(models) == 2
    for m in models:
        # at least one trained template matches a true one closely
        mm, cc = template_ops.match_templates(temps, m.mu)
        en = (temps ** 2).sum(axis=0)
        assert (cc / en < 0.2).any()


def test_runner_make_mesh_and_main_smoke(capsys):
    import json as _json

    from hmmspikesorter_tpu.parallel import runner

    mesh = runner.make_mesh(time_shards=4)
    assert dict(mesh.shape) == {"channel": 2, "time": 4}
    with pytest.raises(ValueError):
        runner.make_mesh(time_shards=3)
    rc = runner.main(["--channels", "2", "--samples", "8192",
                      "--time-shards", "4", "--em-iters", "1",
                      "--K", "8", "--block", "256"])
    assert rc == 0
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["phase"] == "sharded_em" and rec["em_iter_per_s"] > 0


@pytest.mark.parametrize("tdev,cdev", [(4, 1), (2, 2)])
def test_sharded_em_overlap_mode_matches_single_device(tdev, cdev):
    """Distributed overlap-save EM (fb_mode='overlap'): only 2H halo
    samples cross devices, yet one step matches the exact single-device EM
    to float precision (window constants cancel; ll telescopes)."""
    y, mu, lp, sigma, ss = _mk(K=12, T=8192)
    tables = EMTables.build(ss)
    C = cdev
    ys = np.stack([y] * C)
    lps = np.stack([lp] * C)
    mus = np.stack([mu] * C)
    sigmas = np.full(C, sigma)

    devs = np.array(jax.devices()[: tdev * cdev]).reshape(cdev, tdev)
    mesh = Mesh(devs, ("channel", "time"))
    out = sharded_em_step(ys, lps, mus, sigmas, tables, mesh, K=ss.K,
                          L=512, fb_mode="overlap", H=128)
    lp_sh, pi_sh, mu_sh, sig_sh, ll_sh = map(np.asarray, out)

    lp_1, pi_1, mu_1, sig_1, ll_1 = em_step(
        jnp.asarray(y), jnp.asarray(lp), jnp.asarray(mu),
        jnp.asarray(sigma), tables, K=ss.K, fb_mode="gather")
    for c in range(C):
        np.testing.assert_allclose(lp_sh[c], np.asarray(lp_1), rtol=1e-9)
        np.testing.assert_allclose(mu_sh[c], np.asarray(mu_1), atol=1e-9)
        assert sig_sh[c] == pytest.approx(float(sig_1), rel=1e-10)
        assert ll_sh[c] == pytest.approx(float(ll_1), rel=1e-10)
        np.testing.assert_allclose(pi_sh[c], np.asarray(pi_1), atol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("tdev,cdev", [(4, 1), (2, 2)])
def test_sharded_em_overlap_pallas_matches_single_device(tdev, cdev):
    """Distributed fused-kernel EM (fb_mode='overlap_pallas', ROADMAP #11):
    the Pallas EM kernels drop in per shard unchanged (interpret mode on
    the fake CPU mesh); the psum'd linear statistics must reproduce the
    single-device fused EM up to reduction reassociation, and the exact
    f64 gather EM at f32 tolerance."""
    y, mu, lp, sigma, ss = _mk(K=12, T=8192)
    tables = EMTables.build(ss)
    C = cdev
    ys = np.stack([y] * C).astype(np.float32)
    lps = np.stack([lp] * C).astype(np.float32)
    mus = np.stack([mu] * C).astype(np.float32)
    sigmas = np.full(C, sigma, np.float32)

    devs = np.array(jax.devices()[: tdev * cdev]).reshape(cdev, tdev)
    mesh = Mesh(devs, ("channel", "time"))
    out = sharded_em_step(ys, lps, mus, sigmas, tables, mesh, K=ss.K,
                          L=512, fb_mode="overlap_pallas", H=128)
    lp_sh, pi_sh, mu_sh, sig_sh, ll_sh = map(np.asarray, out)

    # single-device fused EM (same kernels, same window protocol)
    lp_p, pi_p, mu_p, sig_p, ll_p = map(np.asarray, em_step(
        jnp.asarray(y, jnp.float32), jnp.asarray(lp, jnp.float32),
        jnp.asarray(mu, jnp.float32), jnp.float32(sigma), tables, K=ss.K,
        fb_mode="overlap_pallas", block=512, fb_interpret=True))
    # exact reference-semantics EM at f64 (f32-tolerance anchor)
    lp_1, pi_1, mu_1, sig_1, ll_1 = em_step(
        jnp.asarray(y), jnp.asarray(lp), jnp.asarray(mu),
        jnp.asarray(sigma), tables, K=ss.K, fb_mode="gather")
    for c in range(C):
        np.testing.assert_allclose(lp_sh[c], lp_p, rtol=2e-5)
        np.testing.assert_allclose(mu_sh[c], mu_p, atol=2e-5)
        assert sig_sh[c] == pytest.approx(float(sig_p), rel=2e-6)
        assert ll_sh[c] == pytest.approx(float(ll_p), rel=2e-6)
        np.testing.assert_allclose(pi_sh[c], pi_p, atol=1e-4)
        np.testing.assert_allclose(lp_sh[c], np.asarray(lp_1), rtol=1e-3)
        np.testing.assert_allclose(mu_sh[c], np.asarray(mu_1), atol=1e-3)
        assert sig_sh[c] == pytest.approx(float(sig_1), rel=1e-4)
        assert ll_sh[c] == pytest.approx(float(ll_1), rel=1e-5)


def _mk_mc(N=2, K=12, C=3, T=4096, seed=13):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array([0.004, 0.002][:N])
    gains = 0.3 + rng.random((N, C))
    mu = temps[:, :, None] * gains[None]
    sigmas = 0.2 + 0.1 * rng.random(C)
    _, truth = create_signal(T, 0.0, pp, temps, rng=rng)
    yc = sigmas[None, :] * rng.standard_normal((T, C))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    ss = build_state_space(N, K, False)
    return yc, mu, sigmas, np.log(pp), ss


@pytest.mark.parametrize("tdev", [2, 4, 8])
def test_sharded_em_mc_matches_single_device(tdev):
    """Time-sharded joint MC EM == em_step_mc(fb_mode='overlap') at f64
    (identical window protocol; only the statistic reductions differ by
    psum reassociation)."""
    from hmmspikesorter_tpu.parallel.sharded_em import sharded_em_step_mc
    from hmmspikesorter_tpu.train.em_mc import em_step_mc

    yc, mu, sigmas, lp, ss = _mk_mc()
    tables = EMTables.build(ss)
    devs = np.array(jax.devices()[:tdev])
    mesh = Mesh(devs, ("time",))
    out = sharded_em_step_mc(jnp.asarray(yc), jnp.asarray(lp),
                             jnp.asarray(mu), jnp.asarray(sigmas), tables,
                             mesh, K=ss.K, L=256)
    lp_sh, pi_sh, mu_sh, sig_sh, ll_sh = map(np.asarray, out)

    ref = em_step_mc(jnp.asarray(yc), jnp.asarray(lp), jnp.asarray(mu),
                     jnp.asarray(sigmas), tables, K=ss.K,
                     fb_mode="overlap", block=256)
    lp_1, pi_1, mu_1, sig_1, ll_1 = map(np.asarray, ref)
    np.testing.assert_allclose(lp_sh, lp_1, rtol=1e-8, atol=1e-9)
    m = pi_1 > -50
    np.testing.assert_allclose(pi_sh[m], pi_1[m], atol=1e-8)
    np.testing.assert_allclose(mu_sh, mu_1, atol=1e-9)
    np.testing.assert_allclose(sig_sh, sig_1, rtol=1e-10)
    assert float(ll_sh) == pytest.approx(float(ll_1), rel=1e-10)
