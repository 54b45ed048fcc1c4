"""Checkpoint/metrics auxiliary subsystems."""

import json

import numpy as np

from hmmspikesorter_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hmmspikesorter_tpu.utils.metrics import MetricsLogger


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck" / "em_latest.npz")
    lp = np.array([-5.0, -6.0])
    mu = np.ones((8, 2))
    save_checkpoint(path, lp=lp, mu=mu, sigma=0.33, em_iter=3, phase="em1",
                    ll_history=[-10.0, -9.0])
    state, meta = load_checkpoint(path)
    np.testing.assert_array_equal(state["lp"], lp)
    np.testing.assert_array_equal(state["mu"], mu)
    assert state["sigma"] == 0.33
    assert meta["em_iter"] == 3 and meta["phase"] == "em1"
    assert meta["ll_history"] == [-10.0, -9.0]
    assert meta["n_neurons"] == 2 and meta["K"] == 8


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as m:
        m.em_iter(0, -100.0, 0.3, np.array([-5.0]), 0.5, 10000)
        m.log("decode", chunks=4)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "em_iter"
    assert lines[0]["samples_per_s"] == 20000.0
    assert lines[1]["event"] == "decode" and lines[1]["chunks"] == 4


def test_train_model_writes_checkpoints_and_metrics(tmp_path):
    from hmmspikesorter_tpu.train.em import train_model
    from hmmspikesorter_tpu.data.synthetic import (
        create_signal, create_spike_template)

    rng = np.random.default_rng(0)
    K = 10
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2)], axis=1)
    y, _ = create_signal(2000, 0.3, [0.01], temps, rng=rng)
    mpath = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(mpath) as m:
        train_model(y, 2, K, nsteps=2, rng=np.random.default_rng(1),
                    metrics=m, checkpoint_dir=str(tmp_path))
    state, meta = load_checkpoint(str(tmp_path / "em_latest.npz"))
    assert meta["phase"] in ("em1", "em2")
    events = [json.loads(l)["event"] for l in open(mpath)]
    assert events.count("em_iter") >= 3
