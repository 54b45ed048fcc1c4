"""Synthetic spike-train generation and noise estimation — the framework's
test fixture and benchmark data source.

Reference: src/utils.jl:49-124 (`create_spike_template`, `create_signal`,
`get_noise_energy`, `get_energy`). Host-side NumPy: data generation is a
setup-time concern, not a device hot path. RNG streams are NumPy's (the
reference's MersenneTwister draw order is not reproducible from Python), so
tests assert statistical intervals rather than reference RNG golden values
(SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def create_spike_template(K: int, a: float = 1.0, b: float = 0.8, c: float = 0.2):
    """a*sin(2*pi*x)*exp(-(b-x)^2/c) on x in [0, 1.5] — reference
    src/utils.jl:49-55. Note the first sample is exactly 0 (sin(0))."""
    x = np.linspace(0.0, 1.5, K)
    return a * np.sin(2 * np.pi * x) * np.exp(-((b - x) ** 2) / c)


def create_signal(T: int, sigma: float, pp, templates, *, rng=None):
    """Additive superposition of at-most-one active template + N(0, sigma^2)
    noise — reference src/utils.jl:57-86 (per-sample Bernoulli onsets, one
    active cell at a time, sequential template playback).

    templates: (K, n_cells). Returns (signal, true_states) where true_states
    is the (n_cells, T) ring-position matrix (0 = silent) — the reference
    discards it; we keep it for label-accuracy metrics.
    """
    if rng is None:
        rng = np.random.default_rng()
    templates = np.asarray(templates)
    K, ncells = templates.shape
    pp = np.asarray(pp, dtype=np.float64)
    S = sigma * rng.standard_normal(T)
    states = np.zeros(ncells, dtype=np.int64)
    truth = np.zeros((ncells, T), dtype=np.int64)
    active = -1
    for i in range(T):
        if active < 0:
            for j in range(ncells):
                if pp[j] > rng.random():
                    states[j] = 1
                    active = j
                    break
                active = -1
                states[j] = 0
        if active >= 0:
            # reference plays template samples 1..K (1-based) i.e. rows 0..K-1
            S[i] += templates[states[active] - 1, active]
            truth[active, i] = states[active]
            states[active] += 1
            if states[active] > K:
                states[active] = 0
                active = -1
    return S, truth


def get_noise_energy(data, cinv: float, K: int, nsamples: int = 1000, *, rng=None):
    """Median normalized energy over random length-K windows — reference
    src/utils.jl:95-110."""
    if rng is None:
        rng = np.random.default_rng()
    data = np.asarray(data)
    N = len(data)
    idx = np.sort(rng.integers(0, N - K, size=nsamples))
    windows = data[idx[:, None] + np.arange(K)[None, :]]
    samples = (windows * cinv * windows).sum(axis=1)
    return float(np.median(samples))


def get_energy(waveforms, cinv: float):
    """Per-template normalized energy — reference src/utils.jl:112-124."""
    w = np.asarray(waveforms)
    return (w * cinv * w).sum(axis=0)


def get_chunk(data, i: int, chunksize: int):
    """i-th 1-based chunk view of `data` — reference src/utils.jl:88-90."""
    data = np.asarray(data)
    return data[(i - 1) * chunksize : min(i * chunksize, len(data))]


def _greedy_onsets(T: int, K: int, pp, rng):
    """Accepted (t, cell) onsets of the bulk generators: for each sample
    the first cell whose Bernoulli fires, accepted only if the previous
    spike has finished (reference semantics: onsets are only checked
    while silent). One home for the acceptance rule shared by
    create_signal_fast and create_drifting_signal."""
    u = rng.random((T, len(pp)))
    fired = u < np.asarray(pp)[None, :]
    any_fire = fired.any(axis=1)
    first_cell = np.argmax(fired, axis=1)
    cand_t = np.nonzero(any_fire)[0]
    cand_c = first_cell[cand_t]
    last_end = -1
    acc = []
    for t, c in zip(cand_t.tolist(), cand_c.tolist()):
        if t >= last_end:
            acc.append((t, c))
            last_end = t + K        # active for samples t..t+K-1
    return acc


def create_signal_fast(T: int, sigma: float, pp, templates, *, rng=None):
    """Vectorized synthetic signal for large benchmarks.

    Same generative model as `create_signal` (one active cell at a time,
    per-sample Bernoulli onsets, additive template + noise) implemented
    with NumPy bulk ops + a greedy pass over candidate onsets — O(T) numpy
    instead of an O(T) Python loop (~100x faster for multi-M samples).
    `create_signal` remains the reference-faithful fixture for tests.
    """
    if rng is None:
        rng = np.random.default_rng()
    templates = np.asarray(templates)
    K, ncells = templates.shape
    pp = np.asarray(pp, dtype=np.float64)
    S = sigma * rng.standard_normal(T)
    truth = np.zeros((ncells, T), dtype=np.int64)
    for t, c in _greedy_onsets(T, K, pp, rng):
        n = min(K, T - t)
        S[t : t + n] += templates[:n, c]
        truth[c, t : t + n] = np.arange(1, n + 1)
    return S, truth


def create_drifting_signal(T: int, sigma: float, pp, templates, *,
                           scale_start=1.0, scale_end=1.0, rng=None):
    """Synthetic signal with slowly drifting spike waveforms.

    Same generative model as `create_signal_fast` (one active cell at a
    time, per-sample Bernoulli onsets, additive playback + N(0, sigma^2)
    noise), except each accepted onset at time t plays its template
    scaled by the linear interpolation scale(t) = scale_start +
    (scale_end - scale_start) * t / T — the standard model of electrode
    drift (waveform amplitude changes slowly over a recording; e.g.
    probe micro-motion). scale_start/scale_end are scalars or (n_cells,)
    per-cell vectors.

    Returns (signal, true_states, scale_at) where true_states is the
    (n_cells, T) ring-position matrix (`create_signal` format) and
    scale_at maps t -> (n_cells,) applied scale (for assertions).
    No reference analog: the reference's generator (src/utils.jl:57-86)
    is stationary.
    """
    if rng is None:
        rng = np.random.default_rng()
    templates = np.asarray(templates)
    K, ncells = templates.shape
    pp = np.asarray(pp, dtype=np.float64)
    s0 = np.broadcast_to(np.asarray(scale_start, np.float64),
                         (ncells,)).copy()
    s1 = np.broadcast_to(np.asarray(scale_end, np.float64),
                         (ncells,)).copy()
    S = sigma * rng.standard_normal(T)
    truth = np.zeros((ncells, T), dtype=np.int64)
    for t, c in _greedy_onsets(T, K, pp, rng):
        scale = s0[c] + (s1[c] - s0[c]) * (t / T)
        n = min(K, T - t)
        S[t : t + n] += scale * templates[:n, c]
        truth[c, t : t + n] = np.arange(1, n + 1)

    def scale_at(t):
        return s0 + (s1 - s0) * (t / T)

    return S, truth, scale_at
