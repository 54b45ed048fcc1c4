"""Synthetic data generator and noise-energy estimator — mirrors reference
test/runtests.jl:85-94 ("Noise energy") with our RNG stream."""

import numpy as np
import pytest

from hmmspikesorter_tpu.data.synthetic import (
    create_signal, create_spike_template, get_chunk, get_energy,
    get_noise_energy)


def test_noise_energy_band():
    # reference runtests.jl:85-94: 30k-sample 2-cell signal, sigma=0.3,
    # cinv = 1/0.09, K=60 windows. The estimator's expectation is
    # E[sum x^2]/sigma^2 ~ K (plus spike contamination); the reference's
    # seeded band is (66.0, 66.7) — realization-dependent, so we assert a
    # band around K wide enough for any stream but tight enough to catch a
    # broken normalization.
    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(60, 3.0, 0.8, 0.2),
                      create_spike_template(60, 4.0, 0.3, 0.2)], axis=1)
    y, _ = create_signal(30_000, 0.3, [0.003, 0.001], temps, rng=rng)
    ee = get_noise_energy(y, 1.0 / 0.09, 60, rng=np.random.default_rng(1))
    assert 58.0 < ee < 75.0


def test_get_energy():
    w = np.ones((10, 3)) * 2.0
    np.testing.assert_allclose(get_energy(w, 0.5), [20.0, 20.0, 20.0])


def test_get_chunk():
    data = np.arange(10)
    np.testing.assert_array_equal(get_chunk(data, 1, 4), [0, 1, 2, 3])
    np.testing.assert_array_equal(get_chunk(data, 3, 4), [8, 9])


def test_template_first_sample_zero():
    # reference create_spike_template: first sample sin(0) == 0 exactly
    t = create_spike_template(60, 3.0, 0.8, 0.2)
    assert t[0] == 0.0


def test_signal_one_active_cell_at_a_time():
    rng = np.random.default_rng(5)
    temps = np.stack([create_spike_template(20, 3.0, 0.8, 0.2),
                      create_spike_template(20, 4.0, 0.3, 0.2)], axis=1)
    y, truth = create_signal(20_000, 0.3, [0.05, 0.05], temps, rng=rng)
    active = (truth > 0).sum(axis=0)
    assert active.max() <= 1          # reference: one active cell at a time
    assert (truth > 0).any()
