"""CLI end-to-end: HDF5 template+data files in the reference's layout ->
MAT output with the reference's keys (src/hmmsort.jl contract)."""

import subprocess
import sys

import h5py
import numpy as np
import scipy.io

from hmmspikesorter_tpu import cli
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template


def _write_inputs(tmp_path, K=20, T=4000, sigma=0.3, n_templates=2):
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2),
                      create_spike_template(K, 2.0, 0.5, 0.25),
                      create_spike_template(K, 2.5, 0.6, 0.15),
                      create_spike_template(K, 1.5, 0.7, 0.2)][:n_templates],
                     axis=1)
    pp = np.array([0.004, 0.002, 0.003, 0.001, 0.002][:n_templates])
    rng = np.random.default_rng(3)
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)

    tfile, dfile = str(tmp_path / "templates.h5"), str(tmp_path / "data.h5")
    with h5py.File(tfile, "w") as f:
        # file holds the Julia (K, nchan, N) layout == h5py (N, nchan, K)
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([[1.0 / sigma**2]])
        f["p"] = pp
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = y
    return tfile, dfile, temps, pp, y


def test_sort_data_end_to_end(tmp_path):
    tfile, dfile, temps, pp, y = _write_inputs(tmp_path)
    ofile = str(tmp_path / "out.mat")
    out = cli.sort_data(tfile, dfile, ofile, chunksize=1500)
    assert set(out) == {"mlseq", "ll", "waveforms", "lp", "sigma"}
    assert out["mlseq"].shape == (2, len(y))
    assert out["mlseq"].min() >= 1          # reference 1-based convention
    np.testing.assert_allclose(out["waveforms"], temps)
    np.testing.assert_allclose(out["lp"], np.log(pp))
    back = scipy.io.loadmat(ofile, squeeze_me=True)
    np.testing.assert_array_equal(back["mlseq"], out["mlseq"])
    assert back["sigma"] == out["sigma"]


def test_sort_data_bails_on_too_many_templates(tmp_path):
    tfile, dfile, *_ = _write_inputs(tmp_path, n_templates=5)
    out = cli.sort_data(tfile, dfile, str(tmp_path / "o.mat"))
    assert out == {}


def test_sort_data_bails_without_spikeforms(tmp_path):
    tfile = str(tmp_path / "empty.h5")
    with h5py.File(tfile, "w") as f:
        f["nothing"] = [1]
    _, dfile, *_ = _write_inputs(tmp_path)
    out = cli.sort_data(tfile, dfile, str(tmp_path / "o.mat"))
    assert out == {}


def test_cli_missing_files_exit_code():
    assert cli.main(["--inputfile", "/nonexistent/a.h5",
                     "--datafile", "/nonexistent/b.h5",
                     "--outputfile", "/tmp/x.mat"]) == 23


def test_cli_highpassdata_path_and_2d(tmp_path):
    tfile, dfile, temps, pp, y = _write_inputs(tmp_path)
    d2 = str(tmp_path / "data2.h5")
    with h5py.File(d2, "w") as f:
        # 2-channel layout: Julia (T, 2) == h5py (2, T); channel 1 is y
        f["highpassdata/data/data"] = np.stack([y, np.zeros_like(y)])
    data = cli.load_data_file(d2)
    np.testing.assert_allclose(data, y)


def test_sort_data_fast_engine(tmp_path):
    tfile, dfile, temps, pp, y = _write_inputs(tmp_path, T=4096)
    out_ref = cli.sort_data(tfile, dfile, str(tmp_path / "r.mat"),
                            chunksize=1500)
    out_fast = cli.sort_data(tfile, dfile, str(tmp_path / "f.mat"),
                             engine="fast")
    agree = (out_ref["mlseq"] == out_fast["mlseq"]).mean()
    assert agree > 0.99
    # the fast engine fills the reference's numeric ll contract (the O(T)
    # telescoped path score), even on the CLI's overlap topology
    assert np.isfinite(out_fast["ll"])


def test_sort_data_fast_engine_events_transfer(tmp_path):
    """--transfer events must produce the identical MAT payload (labels
    reconstructed exactly from the packed onset grid)."""
    from hmmspikesorter_tpu.config import Config, DecodeConfig

    tfile, dfile, temps, pp, y = _write_inputs(tmp_path, T=4096)
    out_fast = cli.sort_data(tfile, dfile, str(tmp_path / "f.mat"),
                             engine="fast")
    cfg = Config(decode=DecodeConfig(engine="fast", transfer="events"))
    out_ev = cli.sort_data(tfile, dfile, str(tmp_path / "e.mat"),
                           config=cfg)
    np.testing.assert_array_equal(out_ev["mlseq"], out_fast["mlseq"])
    assert out_ev["ll"] == out_fast["ll"]


def test_sort_data_fast_engine_int16_data(tmp_path):
    """Integer HDF5 recordings must decode on the fast engine (raw int16
    upload, in-graph cast) with output identical to the float64 run."""
    tfile, _, temps, pp, y = _write_inputs(tmp_path, T=4096)
    yi = np.clip(np.round(y * 1000), -32768, 32767).astype(np.int16)
    # rescale the templates/noise into the integer units
    ti = str(tmp_path / "t_int.h5")
    with h5py.File(tfile, "r") as src, h5py.File(ti, "w") as dst:
        dst["spikeForms"] = np.asarray(src["spikeForms"]) * 1000.0
        dst["cinv"] = np.asarray(src["cinv"]) / 1000.0 ** 2
        dst["p"] = np.asarray(src["p"])
    di = str(tmp_path / "d_int.h5")
    df = str(tmp_path / "d_f64.h5")
    with h5py.File(di, "w") as f:
        f["rh/data/analogData"] = yi
    with h5py.File(df, "w") as f:
        f["rh/data/analogData"] = yi.astype(np.float64)
    out_i = cli.sort_data(ti, di, str(tmp_path / "i.mat"), engine="fast")
    out_f = cli.sort_data(ti, df, str(tmp_path / "f64.mat"), engine="fast")
    np.testing.assert_array_equal(out_i["mlseq"], out_f["mlseq"])
    assert out_i["ll"] == out_f["ll"]
    from hmmspikesorter_tpu.config import Config, DecodeConfig

    cfg = Config(decode=DecodeConfig(engine="fast", transfer="events"))
    out_e = cli.sort_data(ti, di, str(tmp_path / "ie.mat"), config=cfg)
    np.testing.assert_array_equal(out_e["mlseq"], out_i["mlseq"])


def test_sort_data_all_channels(tmp_path):
    """channels='all' decodes every channel of a 2-D recording; channel 1's
    row of the batched output matches the default single-channel run, and
    both engines agree per channel."""
    tfile, _, temps, pp, y = _write_inputs(tmp_path, T=4096)
    rng = np.random.default_rng(9)
    y2, _ = create_signal(4096, 0.3, pp, temps, rng=rng)
    d2 = str(tmp_path / "multi.h5")
    with h5py.File(d2, "w") as f:
        f["rh/data/analogData"] = np.stack([y, y2])  # Julia (T, 2) columns
    out_one = cli.sort_data(tfile, d2, str(tmp_path / "c1.mat"),
                            engine="fast")
    out_all = cli.sort_data(tfile, d2, str(tmp_path / "call.mat"),
                            engine="fast", channels="all")
    assert out_all["mlseq"].shape == (2,) + out_one["mlseq"].shape
    assert out_all["ll"].shape == (2,)
    np.testing.assert_array_equal(out_all["mlseq"][0], out_one["mlseq"])
    assert out_all["ll"][0] == out_one["ll"]
    out_ref = cli.sort_data(tfile, d2, str(tmp_path / "cref.mat"),
                            channels="all", chunksize=1500)
    assert out_ref["mlseq"].shape == out_all["mlseq"].shape
    for c in range(2):
        agree = (out_ref["mlseq"][c] == out_all["mlseq"][c]).mean()
        assert agree > 0.99


def test_sort_data_multichannel_joint_decode(tmp_path):
    """--multichannel keeps every spikeForms channel and decodes one spike
    train from the joint evidence. Two neurons identical on channel 1 but
    opposite on channel 2: the joint decode attributes both correctly; the
    reference's channel-1-only path cannot (it sees identical templates)."""
    K, T, sig = 12, 6000, 0.25
    w = create_spike_template(K, 3.0, 0.8, 0.2)
    mu = np.zeros((K, 2, 2))                       # (K, N, C)
    mu[:, 0, 0] = w
    mu[:, 1, 0] = w                                # same on channel 1
    mu[:, 0, 1] = w
    mu[:, 1, 1] = -w                               # opposite on channel 2
    pp = np.array([0.008, 0.008])
    rng = np.random.default_rng(11)
    _, truth = create_signal(T, 0.0, pp, mu[:, :, 0], rng=rng)
    yc = sig * rng.standard_normal((T, 2))
    for n in range(2):
        k = truth[n]
        m = k > 0
        yc[m] += mu[k[m] - 1, n]

    tfile = str(tmp_path / "mc_templates.h5")
    with h5py.File(tfile, "w") as f:
        # Julia (K, nchan, N) layout == h5py (N, nchan, K)
        f["spikeForms"] = mu.transpose(1, 2, 0)
        f["cinv"] = np.array([1.0 / sig**2, 1.0 / sig**2])
        f["p"] = pp
    dfile = str(tmp_path / "mc_data.h5")
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = yc.T             # Julia (T, C) columns

    ofile = str(tmp_path / "mc_out.mat")
    out = cli.sort_data(tfile, dfile, ofile, multichannel=True,
                        chunksize=1500)
    assert set(out) == {"mlseq", "ll", "waveforms", "lp", "sigma"}
    assert out["mlseq"].shape == (2, T)
    assert out["waveforms"].shape == (K, 2, 2)
    assert out["sigma"].shape == (2,)
    assert np.isfinite(out["ll"])
    # both neurons decoded with roughly their true onset counts (the
    # channel-1-only model could not separate them at all)
    for n in range(2):
        dec = int(np.sum((out["mlseq"][n][1:] == 2)
                         & (out["mlseq"][n][:-1] == 1)))
        tru = int(np.sum(truth[n] == 1))
        assert abs(dec - tru) <= max(1, tru // 5), (n, dec, tru)

    out_fast = cli.sort_data(tfile, dfile, str(tmp_path / "mcf.mat"),
                             multichannel=True, engine="fast")
    agree = (out_fast["mlseq"] == out["mlseq"]).mean()
    assert agree > 0.99
    assert np.isfinite(out_fast["ll"])

    import pytest

    with pytest.raises(ValueError):
        cli.sort_data(tfile, dfile, ofile, multichannel=True,
                      channels="all")


def test_load_data_all_channels_1d(tmp_path):
    """channels='all' on a 1-D dataset returns a (1, T) matrix."""
    _, dfile, *_rest, y = _write_inputs(tmp_path)
    data = cli.load_data_file(dfile, channels="all")
    assert data.shape == (1, len(y))
    np.testing.assert_allclose(data[0], y)


def test_load_data_2d_wide_short_convention(tmp_path):
    """A recording with more channels than samples: the Julia (T, ncols)
    column-major convention means h5py shape (ncols, T) and channel 1 ==
    row 0. The old long-axis heuristic picked the wrong orientation here."""
    rng = np.random.default_rng(0)
    T, ncols = 50, 100
    julia_cols = rng.normal(size=(ncols, T))      # h5py view of (T, ncols)
    dfile = str(tmp_path / "wide.h5")
    with h5py.File(dfile, "w") as f:
        f["rh/data/analogData"] = julia_cols
    data = cli.load_data_file(dfile)
    np.testing.assert_allclose(data, julia_cols[0])
    assert data.shape == (T,)


def test_load_data_matlab_v73_style_fixture(tmp_path):
    """A file laid out the way MATLAB -v7.3 / Julia-HDF5 write it: column-
    major dataset with MATLAB_class attrs. Channel 1 of the Julia (T, 3)
    matrix must come back."""
    rng = np.random.default_rng(1)
    T = 400
    chan1 = rng.normal(size=T)
    stacked = np.stack([chan1, np.zeros(T), np.ones(T)])  # h5py (3, T)
    dfile = str(tmp_path / "m73.h5")
    with h5py.File(dfile, "w", userblock_size=512) as f:
        g = f.create_group("highpassdata/data")
        d = g.create_dataset("data", data=stacked)
        d.attrs["MATLAB_class"] = np.bytes_("double")
    # MATLAB v7.3 files carry a 512-byte userblock header; h5py skips it
    with open(dfile, "r+b") as f:
        f.write(b"MATLAB 7.3 MAT-file" + b" " * 97 + bytes([0, 2]) + b"IM")
    data = cli.load_data_file(dfile)
    np.testing.assert_allclose(data, chan1)


def _write_train_inputs(tmp_path, K=12, T=12000, sigma=0.3, two_chan=False):
    """Synthetic recording rich enough for from-scratch EM (the sparser
    _write_inputs signal starves EM of spikes and everything prunes)."""
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 2.2, 0.5, 0.3)], axis=1)
    pp = np.array([0.01, 0.006])
    rng = np.random.default_rng(6)
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    dfile = str(tmp_path / "train_data.h5")
    with h5py.File(dfile, "w") as f:
        if two_chan:
            y2 = sigma * rng.standard_normal(T)        # pure-noise channel
            f["rh/data/analogData"] = np.stack([y, y2])
        else:
            f["rh/data/analogData"] = y
    tfile = str(tmp_path / "train_templates.h5")
    with h5py.File(tfile, "w") as f:
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([[1.0 / sigma**2]])
        f["p"] = pp
    return tfile, dfile, temps, pp, y


def test_sort_data_train_from_scratch(tmp_path):
    """--train: learn templates from the recording (no inputfile), decode,
    and export a reusable {spikeForms, cinv, p} template file."""
    _, dfile, temps, pp, y = _write_train_inputs(tmp_path)
    ofile = str(tmp_path / "trained.mat")
    sfile = str(tmp_path / "learned.h5")
    out = cli.sort_data(None, dfile, ofile, train=True, n_templates=4,
                        K=12, nsteps=4, chunksize=4000,
                        save_templates=sfile,
                        rng=np.random.default_rng(7))
    assert set(out) == {"mlseq", "ll", "waveforms", "lp", "sigma"}
    n_surv = out["waveforms"].shape[1]
    assert n_surv == 2                      # merge/prune lands on the truth
    assert out["mlseq"].shape == (n_surv, len(y))
    assert out["mlseq"].min() >= 1
    # the exported template file round-trips through the standard loader
    tm = cli.load_template_file(sfile)
    assert tm is not None
    assert tm.n_neurons == n_surv
    np.testing.assert_allclose(tm.mu, out["waveforms"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(tm.lp, out["lp"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(tm.sigma, out["sigma"], rtol=1e-12)
    # and decoding with the exported file reproduces the trained decode
    out2 = cli.sort_data(sfile, dfile, str(tmp_path / "redec.mat"),
                         chunksize=4000)
    np.testing.assert_array_equal(out2["mlseq"], out["mlseq"])


def test_sort_data_train_warm_start(tmp_path):
    """--train with an inputfile refits its templates (reference fit!)
    instead of random re-initialization."""
    tfile, dfile, temps, pp, y = _write_train_inputs(tmp_path)
    out = cli.sort_data(tfile, dfile, str(tmp_path / "warm.mat"),
                        train=True, nsteps=2, chunksize=4000)
    assert out["waveforms"].shape == temps.shape       # refit keeps N
    assert not np.allclose(out["waveforms"], temps)    # EM moved them
    assert out["mlseq"].shape == (temps.shape[1], len(y))


def test_sort_data_train_subset_and_fast_engine(tmp_path):
    """train_samples trains on a prefix; the fast engine then decodes the
    full recording with the learned templates."""
    _, dfile, temps, pp, y = _write_train_inputs(tmp_path)
    out = cli.sort_data(None, dfile, str(tmp_path / "sub.mat"),
                        train=True, n_templates=3, K=12, nsteps=4,
                        train_samples=8000, engine="fast",
                        rng=np.random.default_rng(3))
    n_surv = out["waveforms"].shape[1]
    assert 1 <= n_surv <= 3
    assert out["mlseq"].shape == (n_surv, len(y))
    assert np.isfinite(out["ll"])


def test_cli_train_flag_no_inputfile(tmp_path):
    """main() accepts --train without --inputfile (and still exits 23
    without either)."""
    _, dfile, *_ = _write_train_inputs(tmp_path, T=6000)
    ofile = str(tmp_path / "cli_train.mat")
    rc = cli.main(["--datafile", dfile, "--outputfile", ofile, "--train",
                   "--ntemplates", "2", "--K", "12", "--nsteps", "2",
                   "--chunksize", "3000"])
    assert rc == 0
    back = scipy.io.loadmat(ofile, squeeze_me=True)
    assert "mlseq" in back
    assert cli.main(["--datafile", dfile,
                     "--outputfile", str(tmp_path / "no.mat")]) == 23


def test_sort_data_train_multichannel(tmp_path):
    """--train --multichannel: joint MC training then joint decode."""
    _, dfile, temps, pp, y = _write_train_inputs(tmp_path, T=8000,
                                                 two_chan=True)
    out = cli.sort_data(None, dfile, str(tmp_path / "mc_train.mat"),
                        train=True, multichannel=True, n_templates=2,
                        K=12, nsteps=2, rng=np.random.default_rng(5))
    assert set(out) == {"mlseq", "ll", "waveforms", "lp", "sigma"}
    assert out["waveforms"].ndim == 3                   # (K, N, C)
    assert out["sigma"].shape == (2,)
    assert len(out["mlseq"]) == out["waveforms"].shape[1]


def test_sort_data_train_channels_all(tmp_path):
    """--train --channels all: independent per-channel models (possibly
    different template counts) -> per-channel cell output."""
    _, dfile, temps, pp, y = _write_train_inputs(tmp_path, two_chan=True)
    out = cli.sort_data(None, dfile, str(tmp_path / "all_train.mat"),
                        train=True, n_templates=2, K=12, nsteps=2,
                        chunksize=4000, channels="all",
                        rng=np.random.default_rng(13))
    assert len(out["mlseq"]) == 2
    assert out["ll"].shape == (2,)
    for c in range(2):
        n_c = out["waveforms"][c].shape[1]
        assert out["mlseq"][c].shape == (n_c, len(y))


def test_train_mc_warm_start_channel_mismatch(tmp_path):
    """MC --train warm start keeps the decode-only channel contract: too
    few recording channels raise; extra channels are dropped before
    training and decode."""
    import pytest

    _, dfile, temps, pp, y = _write_train_inputs(tmp_path, T=4000,
                                                 two_chan=True)
    # a 3-channel template file vs the 2-channel recording
    t3 = str(tmp_path / "t3.h5")
    with h5py.File(t3, "w") as f:
        f["spikeForms"] = np.stack([temps.T] * 3, axis=1)   # (N, 3, K)
        f["cinv"] = np.full(3, 1.0 / 0.09)
        f["p"] = pp
    with pytest.raises(ValueError, match="channels"):
        cli.sort_data(t3, dfile, str(tmp_path / "x.mat"), train=True,
                      multichannel=True, nsteps=1)
    # a 1-channel template file on the 2-channel recording: trains on the
    # truncated channel set and succeeds
    t1 = str(tmp_path / "t1.h5")
    with h5py.File(t1, "w") as f:
        f["spikeForms"] = temps.T[:, None, :]
        f["cinv"] = np.array([1.0 / 0.09])
        f["p"] = pp
    out = cli.sort_data(t1, dfile, str(tmp_path / "y.mat"), train=True,
                        multichannel=True, nsteps=1)
    assert out["waveforms"].shape[2] == 1


def test_save_templates_dotted_directory(tmp_path):
    """--channels all per-channel template export must split the BASENAME
    extension, not the last dot of the whole path."""
    d = tmp_path / "run.2026"
    d.mkdir()
    _, dfile, *_ = _write_train_inputs(tmp_path, T=4000, two_chan=True)
    sfile = str(d / "templates")                    # no extension at all
    cli.sort_data(None, dfile, str(tmp_path / "o.mat"), train=True,
                  n_templates=2, K=12, nsteps=1, chunksize=2000,
                  channels="all", save_templates=sfile,
                  rng=np.random.default_rng(1))
    import os
    assert os.path.exists(str(d / "templates_ch00"))
    assert os.path.exists(str(d / "templates_ch01"))


def test_sort_data_confidence_output(tmp_path):
    """--confidence: the MAT output gains per-neuron per-spike posterior
    scores aligned with the decoded onsets."""
    tfile, dfile, *_ = _write_train_inputs(tmp_path, T=6000)
    ofile = str(tmp_path / "conf.mat")
    out = cli.sort_data(tfile, dfile, ofile, engine="fast",
                        confidence=True)
    assert "confidence" in out
    # mlseq is the unrolled 1-based convention; onsets where ring hits 2
    for n in range(2):
        n_spikes = int(np.sum((out["mlseq"][n][1:] == 2)
                              & (out["mlseq"][n][:-1] == 1))
                       + (out["mlseq"][n][0] == 2))
        assert len(out["confidence"][n]) == n_spikes
        if n_spikes:
            assert np.median(out["confidence"][n]) > 0.5
    back = scipy.io.loadmat(ofile, squeeze_me=True)
    assert "confidence" in back


def test_sort_data_confidence_multichannel(tmp_path):
    _, dfile, temps, pp, y = _write_train_inputs(tmp_path, T=5000,
                                                 two_chan=True)
    import pytest

    out = cli.sort_data(None, dfile, str(tmp_path / "mcc.mat"),
                        train=True, multichannel=True, n_templates=2,
                        K=12, nsteps=2, confidence=True,
                        rng=np.random.default_rng(5))
    if out == {}:                      # training bailed (>max templates)
        pytest.skip("training bailed; nothing to assert")
    assert "confidence" in out
    assert len(out["confidence"]) == out["waveforms"].shape[1]
