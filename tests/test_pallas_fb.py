"""Fused Pallas EM kernels (ops/pallas_fb_mb.py) vs the XLA halo-window
EM engine: identical EM updates to f32 round-off, in interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from hmmspikesorter_tpu.train.em import EMTables, em_step, pallas_em_geometry


def _setup(N, K, T, seed=0):
    params = [(3.0, 0.8, 0.2), (4.0, 0.3, 0.2), (2.5, 0.6, 0.3),
              (2.0, 0.5, 0.25)][:N]
    temps = np.stack([create_spike_template(K, *p) for p in params], axis=1)
    pp = np.array([0.004, 0.002, 0.003, 0.001][:N])
    rng = np.random.default_rng(seed)
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    ss = build_state_space(N, K, False)
    tables = EMTables.build(ss)
    return (jnp.asarray(y, jnp.float32), jnp.asarray(np.log(pp), jnp.float32),
            jnp.asarray(temps, jnp.float32), jnp.float32(0.3), tables)


def _run_both(N, K, T, block, seed=0):
    y, lp, mu, sigma, tables = _setup(N, K, T, seed)
    ref = em_step(y, lp, mu, sigma, tables, K=K, fb_mode="overlap",
                  block=block)
    out = em_step(y, lp, mu, sigma, tables, K=K, fb_mode="overlap_pallas",
                  block=block, fb_interpret=True)
    return ref, out


@pytest.mark.slow
@pytest.mark.parametrize("N,K,T", [(2, 16, 6000), (3, 16, 9000)])
def test_pallas_em_matches_overlap_engine(N, K, T):
    # H = 64, L = max(block, 256): same geometry in both engines so the
    # comparison is engine-only (pallas_em_geometry is identity here)
    block = 1024
    L, H = pallas_em_geometry(K, block)
    assert (L, H) == (1024, 64)
    ref, out = _run_both(N, K, T, block)
    names = ["lp", "pi", "mu", "sigma", "ll"]
    for name, r, o in zip(names, ref, out):
        r, o = np.asarray(r, np.float64), np.asarray(o, np.float64)
        if name == "ll":
            assert o == pytest.approx(r, rel=1e-5), name
        elif name == "pi":
            # log posteriors: compare where not astronomically unlikely
            m = r > -50
            np.testing.assert_allclose(o[m], r[m], rtol=1e-3, atol=1e-3)
        else:
            np.testing.assert_allclose(o, r, rtol=2e-4, atol=1e-5,
                                       err_msg=name)


@pytest.mark.slow
def test_pallas_em_ragged_tail():
    """0 < T mod L < H: the clamped B-2 row must keep statistics exact
    (the round-1 halo-bias regression, now for the fused kernel)."""
    block = 1024
    ref, out = _run_both(2, 16, 5 * 1024 + 32, block, seed=3)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o, np.float64),
                                   np.asarray(r, np.float64),
                                   rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_pallas_em_chain_improves_ll():
    """Three chained fused-kernel EM iterations: ll must be finite and
    non-decreasing (EM monotonicity, up to halo/f32 noise)."""
    y, lp, mu, sigma, tables = _setup(2, 16, 8000, seed=5)
    lls = []
    for _ in range(3):
        lp, _, mu, sigma, ll = em_step(y, lp, mu, sigma, tables, K=16,
                                       fb_mode="overlap_pallas", block=1024,
                                       fb_interpret=True)
        lls.append(float(ll))
    assert np.isfinite(lls).all()
    assert lls[2] >= lls[0] - abs(lls[0]) * 1e-6


def test_pallas_em_geometry_rounding():
    L, H = pallas_em_geometry(17, 2048)
    assert H % 16 == 0 and L % 32 == 0 and (L + 2 * H) % 32 == 0
    assert H >= 4 * 17
