"""Fused Pallas MC EM (ops/pallas_fb_mb stream_em front-end, consumed by
train/em_mc fb_mode="overlap_pallas") vs the XLA MC halo-window engine
(fb_mode="overlap"): identical EM updates to f32 round-off in interpret
mode, plus the C=1 reduction to the single-channel fused kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.train.em import EMTables, em_step, pallas_em_geometry
from hmmspikesorter_tpu.train.em_mc import em_step_mc


def _setup_mc(N, K, C, T, seed=0):
    params = [(3.0, 0.8, 0.2), (4.0, 0.3, 0.2), (2.5, 0.6, 0.3),
              (2.0, 0.5, 0.25)][:N]
    temps = np.stack([create_spike_template(K, *p) for p in params], axis=1)
    pp = np.array([0.004, 0.002, 0.003, 0.001][:N])
    rng = np.random.default_rng(seed)
    gains = 0.3 + rng.random((N, C))
    mu = temps[:, :, None] * gains[None, :, :]
    sigmas = 0.2 + 0.15 * rng.random(C)
    _, truth = create_signal(T, 0.0, pp, temps, rng=rng)
    yc = sigmas[None, :] * rng.standard_normal((T, C))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    tables = EMTables.build(build_state_space(N, K, False))
    return (jnp.asarray(yc, jnp.float32),
            jnp.asarray(np.log(pp), jnp.float32),
            jnp.asarray(mu, jnp.float32),
            jnp.asarray(sigmas, jnp.float32), tables)


def _compare(ref, out, ll_rel=1e-5):
    names = ["lp", "pi", "mu", "sigmas", "ll"]
    for name, r, o in zip(names, ref, out):
        r, o = np.asarray(r, np.float64), np.asarray(o, np.float64)
        if name == "ll":
            assert o == pytest.approx(r, rel=ll_rel), name
        elif name == "pi":
            m = r > -50
            np.testing.assert_allclose(o[m], r[m], rtol=1e-3, atol=1e-3)
        else:
            np.testing.assert_allclose(o, r, rtol=3e-4, atol=2e-5,
                                       err_msg=name)


@pytest.mark.parametrize("N,K,C,T", [(2, 16, 3, 6000), (3, 16, 2, 9000),
                                     (4, 12, 2, 9000)])   # N=4: ch=16 path
@pytest.mark.slow
def test_pallas_mc_em_matches_overlap_engine(N, K, C, T):
    block = 1024
    L, H = pallas_em_geometry(K, block)
    assert (L, H) == (1024, 64)
    yc, lp, mu, sigmas, tables = _setup_mc(N, K, C, T)
    ref = em_step_mc(yc, lp, mu, sigmas, tables, K=K, fb_mode="overlap",
                     block=block)
    out = em_step_mc(yc, lp, mu, sigmas, tables, K=K,
                     fb_mode="overlap_pallas", block=block,
                     fb_interpret=True)
    _compare(ref, out)


@pytest.mark.slow
def test_pallas_mc_em_ragged_tail():
    """0 < T mod L < H: the clamped B-2 row must keep statistics exact."""
    N, K, C = 2, 16, 2
    block = 1024
    T = 4 * 1024 + 32                       # T mod L = 32 < H = 64
    yc, lp, mu, sigmas, tables = _setup_mc(N, K, C, T, seed=3)
    ref = em_step_mc(yc, lp, mu, sigmas, tables, K=K, fb_mode="overlap",
                     block=block)
    out = em_step_mc(yc, lp, mu, sigmas, tables, K=K,
                     fb_mode="overlap_pallas", block=block,
                     fb_interpret=True)
    _compare(ref, out)


@pytest.mark.slow
def test_pallas_mc_em_c1_matches_single_channel_kernel():
    """With one channel the MC fused kernel reproduces the single-channel
    fused kernel (emission streams equal the fused Gaussian up to float
    reassociation; moments/statistics layouts coincide at C=1)."""
    N, K, T = 2, 16, 6000
    block = 1024
    yc, lp, mu, sigmas, tables = _setup_mc(N, K, 1, T, seed=5)
    out_mc = em_step_mc(yc, lp, mu, sigmas, tables, K=K,
                        fb_mode="overlap_pallas", block=block,
                        fb_interpret=True)
    out_sc = em_step(yc[:, 0], lp, mu[:, :, 0], sigmas[0], tables, K=K,
                     fb_mode="overlap_pallas", block=block,
                     fb_interpret=True)
    names = ["lp", "pi", "mu", "sigmas", "ll"]
    for name, o, r in zip(names, out_mc, out_sc):
        o = np.asarray(o, np.float64)
        r = np.asarray(r, np.float64)
        if name == "mu":
            o = o[:, :, 0]
        if name == "sigmas":
            o = o[0]
        if name == "ll":
            assert o == pytest.approx(r, rel=1e-5)
        elif name == "pi":
            m = r > -50
            np.testing.assert_allclose(o[m], r[m], rtol=1e-3, atol=1e-3)
        else:
            np.testing.assert_allclose(o, r, rtol=3e-4, atol=2e-5,
                                       err_msg=name)
