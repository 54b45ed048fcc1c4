"""N = 1 with allow_overlaps=True: the overlap state space has zero pair
columns (reference types.jl:65-92 enumerates none), so it IS the
non-overlap space. Every dispatch must route to the nov engines instead
of the pair engines (which have no pairs to build). Regression: these
paths crashed with "need at least one array to stack"."""

import numpy as np
import jax.numpy as jnp
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.models import api


def _case(T=4000, K=12, sigma=0.3):
    temps = create_spike_template(K, 3.0, 0.8, 0.2)[:, None]
    pp = np.array([0.01])
    y, _ = create_signal(T, sigma, pp, temps, rng=np.random.default_rng(2))
    return y, temps, pp, sigma


def test_n1_overlap_decode_matches_generic_and_nov():
    y, temps, pp, sigma = _case()
    tm_ov = api.HMMTemplateModel(temps, sigma, np.log(pp),
                                 allow_overlaps=True)
    tm_nov = api.HMMTemplateModel(temps, sigma, np.log(pp),
                                  allow_overlaps=False)
    x_ov = np.asarray(api.fit_spiking_model(tm_ov, y).ml_seq)
    x_nov = np.asarray(api.fit_spiking_model(tm_nov, y).ml_seq)
    np.testing.assert_array_equal(x_ov, x_nov)
    # generic in-table engine over the N=1 overlap space agrees too
    ss = build_state_space(1, tm_ov.K, True)
    assert ss.states.shape[1] == 1 + (tm_ov.K - 1)   # no pair columns
    in_idx, in_w, smu = tm_ov.decode_tables()
    x_gen, _ = viterbi_decode(jnp.asarray(y), in_idx, in_w, smu, sigma)
    np.testing.assert_array_equal(np.asarray(x_gen), x_nov)


def test_n1_overlap_fast_path_and_events():
    y, temps, pp, sigma = _case(T=6000)
    tm = api.HMMTemplateModel(temps, sigma, np.log(pp), allow_overlaps=True)
    m_ref = api.fit_spiking_model(tm, y)
    for transfer in ("dense", "events"):
        m = api.fit_spiking_model_fast(tm, y, L=1024, H=64,
                                       transfer=transfer)
        np.testing.assert_array_equal(np.asarray(m.ml_seq),
                                      np.asarray(m_ref.ml_seq))
        assert np.isfinite(m.ll)


def test_n1_overlap_multichannel():
    y, temps, pp, sigma = _case(T=4000)
    rng = np.random.default_rng(5)
    y2 = 0.6 * y + sigma * 0.5 * rng.standard_normal(len(y))
    yc = np.stack([y, y2], axis=1)                    # (T, 2)
    from hmmspikesorter_tpu.models.multichannel import (
        HMMTemplateModelMC, fit_spiking_model_mc, fit_spiking_model_mc_fast)

    mu = np.stack([temps[:, 0], 0.6 * temps[:, 0]], axis=1)[:, None, :]
    tmc = HMMTemplateModelMC(mu=mu, sigmas=np.array([sigma, sigma * 1.1]),
                             lp=np.log(pp), allow_overlaps=True)
    m = fit_spiking_model_mc(tmc, yc)
    tmc_nov = HMMTemplateModelMC(mu=mu,
                                 sigmas=np.array([sigma, sigma * 1.1]),
                                 lp=np.log(pp), allow_overlaps=False)
    m_nov = fit_spiking_model_mc(tmc_nov, yc)
    np.testing.assert_array_equal(np.asarray(m.ml_seq),
                                  np.asarray(m_nov.ml_seq))
    m_fast = fit_spiking_model_mc_fast(tmc, yc, L=1024, H=64)
    np.testing.assert_array_equal(np.asarray(m_fast.ml_seq),
                                  np.asarray(m.ml_seq))


def test_n1_forced_pair_kernels_raise():
    y, temps, pp, sigma = _case(T=4000)
    tm = api.HMMTemplateModel(temps, sigma, np.log(pp), allow_overlaps=True)
    with pytest.raises(ValueError):
        api.fit_spiking_model_fast(tm, y, L=1024, H=64,
                                   block_engine="pallas_ovn")
