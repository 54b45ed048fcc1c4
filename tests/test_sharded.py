"""Multi-device (8-way virtual CPU mesh) decode == single-device decode,
bit-for-bit (SURVEY.md §4: fake-mesh shard-equals-single-device checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.parallel.sharded import (
    batched_decode_sharded, sharded_blocked_viterbi)
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.models.api import HMMTemplateModel
from tests.test_parallel import _setup


def _mesh(n, axis):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_time_sharded_viterbi_exact(ndev):
    y, in_idx, in_w, smu, sigma = _setup(T=6000, K=16)
    x_seq, ll_seq = viterbi_decode(y, in_idx, in_w, smu, sigma)
    mesh = _mesh(ndev, "time")
    x_sh, ll_sh = sharded_blocked_viterbi(y, in_idx, in_w, smu, sigma, mesh,
                                          L=128)
    np.testing.assert_array_equal(np.asarray(x_sh), np.asarray(x_seq))
    assert float(ll_sh) == pytest.approx(float(ll_seq), rel=1e-9)


@pytest.mark.slow
def test_channel_sharded_batch_decode():
    ys = []
    for seed in range(8):
        y, in_idx, in_w, smu, sigma = _setup(T=2000, K=12, seed=seed)
        ys.append(np.asarray(y))
    y_batch = jnp.asarray(np.stack(ys))
    mesh = _mesh(8, "channel")
    xs, lls = batched_decode_sharded(y_batch, in_idx, in_w, smu, sigma, mesh)
    for c in range(8):
        x_one, ll_one = viterbi_decode(y_batch[c], in_idx, in_w, smu, sigma)
        np.testing.assert_array_equal(np.asarray(xs[c]), np.asarray(x_one))
        assert float(lls[c]) == pytest.approx(float(ll_one), rel=1e-12)


@pytest.mark.parametrize("overlaps", [False, True])
@pytest.mark.parametrize("D", [2, 8])
def test_time_sharded_posteriors_exact(overlaps, D):
    """Time-sharded chained posteriors == the sequential exact two-pass
    (cross-device state = one boundary alpha/beta vector per edge)."""
    from hmmspikesorter_tpu.core.posterior import onset_posteriors
    from hmmspikesorter_tpu.parallel.sharded_posterior import (
        sharded_onset_posteriors)

    K, L = 12, 256
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.008, 0.005])
    T = 8 * 2 * L                      # divisible by every mesh size
    y, _ = create_signal(T, 0.3, pp, temps, rng=np.random.default_rng(2))
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=overlaps)
    p_ex = onset_posteriors(tm, y)
    mesh = Mesh(np.array(jax.devices()[:D]), ("time",))
    p_sh = sharded_onset_posteriors(tm, y, mesh, L=L)
    assert np.abs(p_sh - p_ex).max() < 1e-10


def test_time_sharded_posteriors_guards():
    from hmmspikesorter_tpu.parallel.sharded_posterior import (
        sharded_onset_posteriors)

    K = 8
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    tm = HMMTemplateModel(temps, 0.3, np.log(pp), allow_overlaps=False)
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    y, _ = create_signal(1000, 0.3, pp, temps,
                         rng=np.random.default_rng(1))
    with pytest.raises(ValueError):
        sharded_onset_posteriors(tm, y, mesh, L=256)   # T % (Dv*L) != 0
