"""Unified Config (config.py, SURVEY.md §5.6): one dataclass tree consumed
by train_model / fit_* / CLI / runner; explicit kwargs stay as sugar and
always win over the config."""

import numpy as np
import pytest

from hmmspikesorter_tpu.config import (Config, DecodeConfig, MeshConfig,
                                       ModelConfig, TrainConfig, UNSET, pick)
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template


def test_defaults_mirror_reference():
    cfg = Config()
    assert (cfg.model.n_neurons, cfg.model.K) == (3, 60)
    # None = "unset": train_model falls back to the reference's 8
    # (baumwelch.jl:311) and fit_template_model keeps its historical 10,
    # so a Config touching only other sections never changes the schedule
    assert cfg.train.nsteps is None
    assert cfg.train.p0 is None                   # -> 2^(-3K/2)
    assert cfg.train.sparse_lp0 == -70.0          # baumwelch.jl:344
    assert cfg.decode.chunksize == 100_000        # hmmsort.jl:90
    assert cfg.decode.max_templates == 4          # hmmsort.jl:50
    assert cfg.mesh.axes == ("channel", "time")


def test_pick_precedence():
    assert pick(5, 7, 9) == 5           # explicit wins
    assert pick(None, 7, 9) is None     # explicit None is still explicit
    assert pick(UNSET, 7, 9) == 7       # config next
    assert pick(UNSET, UNSET, 9) == 9   # default last
    assert pick(UNSET, None, 9) == 9    # config None falls through


@pytest.fixture(scope="module")
def signal():
    K = 20
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    rng = np.random.default_rng(5)
    y, _ = create_signal(6000, 0.3, pp, temps, rng=rng)
    return y, temps, pp, K


def test_train_model_consumes_config(signal):
    from hmmspikesorter_tpu.train.em import train_model

    y, temps, pp, K = signal
    cfg = Config(model=ModelConfig(n_neurons=2, K=K),
                 train=TrainConfig(nsteps=1))
    res = train_model(y, config=cfg, rng=np.random.default_rng(0))
    assert res.K == K
    assert len(res.ll_history) >= 1
    # explicit kwarg overrides the config
    res2 = train_model(y, 1, config=cfg, rng=np.random.default_rng(0))
    assert res2.mu.shape[1] <= 1


def test_fit_spiking_model_chunksize_resolution(signal):
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model)

    y, temps, pp, K = signal
    tm = HMMTemplateModel(mu=temps, sigma=0.3, lp=np.log(pp))
    cfg = Config(decode=DecodeConfig(chunksize=2000))
    whole = fit_spiking_model(tm, y)                       # no config: whole
    chunked = fit_spiking_model(tm, y, config=cfg)         # config chunks
    explicit = fit_spiking_model(tm, y, None, config=cfg)  # explicit None
    np.testing.assert_array_equal(np.asarray(whole.ml_seq),
                                  np.asarray(explicit.ml_seq))
    assert whole.ll == explicit.ll
    assert (np.asarray(chunked.ml_seq) == np.asarray(whole.ml_seq)).mean() \
        > 0.999


def test_fast_decode_consumes_config(signal):
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model_fast)

    y, temps, pp, K = signal
    tm = HMMTemplateModel(mu=temps, sigma=0.3, lp=np.log(pp),
                          allow_overlaps=True)
    cfg = Config(decode=DecodeConfig(L=2048, H=256))
    a = fit_spiking_model_fast(tm, y, config=cfg)
    b = fit_spiking_model_fast(tm, y, L=2048, H=256)
    np.testing.assert_array_equal(np.asarray(a.ml_seq), np.asarray(b.ml_seq))


def test_cli_accepts_config(tmp_path):
    import h5py

    from hmmspikesorter_tpu import cli

    K = 20
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    rng = np.random.default_rng(3)
    y, _ = create_signal(4000, 0.3, pp, temps, rng=rng)
    tfile, dfile = str(tmp_path / "t.h5"), str(tmp_path / "d.h5")
    with h5py.File(tfile, "w") as f:
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([[1.0 / 0.09]])
        f["p"] = pp
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = y
    cfg = Config(decode=DecodeConfig(engine="fast", L=2048, H=256))
    out = cli.sort_data(tfile, dfile, str(tmp_path / "o.mat"), config=cfg)
    assert np.isfinite(out["ll"])
    # config with max_templates=1 bails, same as the explicit kwarg
    cfg2 = Config(decode=DecodeConfig(max_templates=1))
    assert cli.sort_data(tfile, dfile, str(tmp_path / "o2.mat"),
                         config=cfg2) == {}


def test_runner_mesh_from_config():
    from hmmspikesorter_tpu.parallel.runner import make_mesh

    cfg = Config(mesh=MeshConfig(time_shards=4, channel_shards=2))
    mesh = make_mesh(config=cfg)
    assert dict(mesh.shape) == {"channel": 2, "time": 4}
    # explicit argument beats the config
    cfg3 = Config(mesh=MeshConfig(time_shards=2))
    mesh2 = make_mesh(8, config=cfg3)
    assert dict(mesh2.shape) == {"channel": 1, "time": 8}
