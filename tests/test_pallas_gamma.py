"""Fused chained-posterior Pallas kernels (ops/pallas_gamma_mb.py) vs the
f64 exact oracle, interpret mode on CPU (hardware validation:
scripts/tpu_parity.py posterior lane + BENCHMARKS.md round 5)."""

import numpy as np
import pytest

from hmmspikesorter_tpu.core.posterior import onset_posteriors
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.models.api import HMMTemplateModel
from hmmspikesorter_tpu.ops.pallas_gamma_mb import onset_gammas_pallas


def _case(N, K, T, seed):
    temps = np.stack([create_spike_template(K, 3.0 + n, 0.6 + 0.1 * n, 0.2)
                      for n in range(N)], axis=1)
    pp = np.full(N, 0.01)
    y, _ = create_signal(T, 0.3, pp, temps,
                         rng=np.random.default_rng(seed))
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=False)
    return y, temps, pp, tm


@pytest.mark.slow
@pytest.mark.parametrize("N,K,T,L", [
    (2, 12, 800, 128),      # ragged tail (800 = 6.25 * 128)
    (2, 12, 777, 128),      # ragged tail, mid-chunk terminal
    (3, 9, 500, 96),        # N=3 (chunk 32 divides 96)
    (1, 8, 300, 64),        # single neuron
    (2, 12, 256, 128),      # exact multiple, minimum B
])
def test_gamma_kernel_matches_f64_oracle(N, K, T, L):
    """The f32 kernel's onset posteriors vs the f64 sequential exact
    path: only f32 round-off remains (the chaining is exact)."""
    y, temps, pp, tm = _case(N, K, T, seed=N + T)
    p_ex = onset_posteriors(tm, y)                         # f64 oracle
    p_k = onset_gammas_pallas(np.float32(y), np.log(pp), temps, 0.3,
                              L=L, interpret=True)
    assert np.abs(p_ex - p_k).max() < 1e-4


@pytest.mark.slow
def test_gamma_kernel_multi_lane_group():
    """B > G = 128 windows exercises the second lane group."""
    y, temps, pp, tm = _case(2, 8, 130 * 32, seed=3)
    p_ex = onset_posteriors(tm, y)
    p_k = onset_gammas_pallas(np.float32(y), np.log(pp), temps, 0.3,
                              L=32, interpret=True)
    assert np.abs(p_ex - p_k).max() < 1e-4


def test_gamma_kernel_guards():
    y, temps, pp, tm = _case(2, 12, 400, seed=1)
    with pytest.raises(ValueError):
        onset_gammas_pallas(y, np.log(pp), temps, 0.3, L=100)  # % chunk
    with pytest.raises(ValueError):
        onset_gammas_pallas(y[:100], np.log(pp), temps, 0.3, L=128)


@pytest.mark.slow
@pytest.mark.parametrize("N,K,C,T,L", [
    (2, 12, 3, 800, 128),
    (2, 12, 2, 777, 128),      # ragged tail
    (3, 9, 2, 500, 96),
])
def test_gamma_kernel_mc_matches_f64_oracle(N, K, C, T, L):
    """MC stream front-end: the f32 kernel vs the f64 sequential exact
    MC path (joint multi-channel model, non-overlap topology)."""
    from hmmspikesorter_tpu.core.posterior import onset_posteriors_mc
    from hmmspikesorter_tpu.models.multichannel import HMMTemplateModelMC
    from hmmspikesorter_tpu.ops.pallas_gamma_mb import (
        onset_gammas_pallas_mc)

    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(K, 3.0 + n, 0.6 + 0.1 * n, 0.2)
                      for n in range(N)], axis=1)
    gains = rng.uniform(0.3, 1.0, (N, C))
    mu = temps[:, :, None] * gains[None, :, :]
    pp = np.full(N, 0.01)
    sig = rng.uniform(0.25, 0.35, C)
    yc = sig[None, :] * rng.standard_normal((T, C))
    _, truth = create_signal(T, 0.3, pp, temps,
                             rng=np.random.default_rng(9))
    for n in range(N):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]
    tmc = HMMTemplateModelMC(mu, sig, np.log(pp), allow_overlaps=False)
    p_ex = onset_posteriors_mc(tmc, yc)                # f64 oracle
    p_k = onset_gammas_pallas_mc(np.float32(yc), np.log(pp), mu, sig,
                                 L=L, interpret=True)
    assert np.abs(p_ex - p_k).max() < 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("K,T,L", [(12, 400, 64), (12, 377, 64),
                                   (9, 300, 96)])
def test_gamma_kernel_ov2_matches_f64_oracle(K, T, L):
    """The pairwise-overlap (production confidence topology) gamma
    kernel vs the f64 sequential exact path."""
    from hmmspikesorter_tpu.ops.pallas_gamma_ov2 import (
        onset_gammas_pallas_ov2)

    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    y, _ = create_signal(T, 0.3, pp, temps,
                         rng=np.random.default_rng(K + T))
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=True)
    p_ex = onset_posteriors(tm, y)                     # f64 oracle
    p_k = onset_gammas_pallas_ov2(np.float32(y), np.log(pp), temps, 0.3,
                                  L=L, interpret=True)
    assert np.abs(p_ex - p_k).max() < 1e-4


def test_gamma_kernel_ov2_guards():
    from hmmspikesorter_tpu.ops.pallas_gamma_ov2 import (
        onset_gammas_pallas_ov2)

    temps = np.stack([create_spike_template(8, 3.0, 0.8, 0.2),
                      create_spike_template(8, 4.0, 0.3, 0.2),
                      create_spike_template(8, 2.5, 0.6, 0.2)], axis=1)
    pp = np.full(3, 0.01)
    y = np.zeros(400)
    with pytest.raises(ValueError):
        onset_gammas_pallas_ov2(y, np.log(pp), temps, 0.3, L=64)  # N=3
    with pytest.raises(ValueError):
        onset_gammas_pallas_ov2(y, np.log(pp[:2]), temps[:, :2], 0.3,
                                L=100)                 # L % CH2


@pytest.mark.slow
def test_gamma_kernel_ov2_per_lane():
    """Per-lane (drift-tracked) parameters: constant-parameter rows
    reduce BIT-exactly to the shared kernel; varying rows match a
    hand-chained piecewise XLA reference."""
    from hmmspikesorter_tpu.ops.pallas_gamma_ov2 import (
        onset_gammas_pallas_ov2, onset_gammas_pallas_ov2_tracked)

    K, T, L = 12, 400, 64
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    y, _ = create_signal(T, 0.3, pp, temps,
                         rng=np.random.default_rng(9))
    p_k = onset_gammas_pallas_ov2(np.float32(y), np.log(pp), temps, 0.3,
                                  L=L, interpret=True)
    B = -(-T // L)
    p_const = onset_gammas_pallas_ov2_tracked(
        np.float32(y), np.tile(np.log(pp), (B, 1)),
        np.tile(temps, (B, 1, 1)), np.full(B, 0.3), L=L, interpret=True)
    np.testing.assert_array_equal(p_const, p_k)

    rng = np.random.default_rng(3)
    scales = np.linspace(1.0, 1.8, B)
    mu_v = np.stack([temps * s for s in scales])
    lp_v = np.stack([np.log(pp) + rng.uniform(-0.3, 0.3, 2)
                     for _ in range(B)])
    sg_v = 0.3 + rng.uniform(-0.02, 0.05, B)
    p_tv = onset_gammas_pallas_ov2_tracked(np.float32(y), lp_v, mu_v,
                                           sg_v, L=L, interpret=True)
    # sanity: marginals are probabilities with finite mass
    assert np.isfinite(p_tv).all() and (p_tv >= -1e-6).all()
    assert p_tv.max() <= 1.0 + 1e-4
