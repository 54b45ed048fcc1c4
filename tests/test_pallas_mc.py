"""Multi-channel multi-block Pallas kernel (ops/pallas_viterbi_ovn_mb's
MC front-end) vs the XLA MC scan engine (ops/ring_viterbi_mc._ovn_mc_scan):
bit-exact labels in interpret mode at f32 — both consume the identical
projected streams, and the dynamics/backtrace are shared with the
(hardware-validated) single-channel kernel. Plus the mc_overlap_save
wiring and the C=1 reduction to the single-channel kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.emission_mc import MCTables, mc_streams
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.ops.pallas_viterbi_ovn_mb import (
    CH, CHM, ovn_mc_decode_pallas_mb)
from hmmspikesorter_tpu.ops.ring_viterbi_mc import _ovn_mc_scan

PARAMS = [(3.0, 0.8, 0.2), (4.0, 0.3, 0.2), (2.5, 0.6, 0.3),
          (2.0, 0.5, 0.25)]
STEP = max(CH, CHM)


def _mk_mc(N, K, C, B, W, seed):
    """(B, W, C) signal windows with per-channel gains + overlapping
    spikes, plus (K, N, C) templates and (C,) noise levels."""
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, *PARAMS[i % 4])
                      for i in range(N)], axis=1)           # (K, N)
    gains = 0.3 + rng.random((N, C))                        # (N, C)
    mu = temps[:, :, None] * gains[None, :, :]              # (K, N, C)
    pp = np.array([0.03, 0.02, 0.025, 0.015][:N])
    sigmas = 0.2 + 0.15 * rng.random(C)
    y_win = np.zeros((B, W, C))
    for b in range(B):
        _, truth = create_signal(W, 0.0, pp, temps, rng=rng)
        for n in range(N):
            k = truth[n]
            m = k > 0
            y_win[b][m] += mu[k[m] - 1, n]
    # force overlapping spikes so pair states are exercised
    y_win[0, 5:5 + K - 1] += mu[1:, 0]
    y_win[0, 8:8 + K - 1] += mu[1:, min(1, N - 1)]
    y_win += sigmas * rng.standard_normal(y_win.shape)
    return y_win, mu, sigmas, np.log(pp)


def _streams_f32(y_win, mu, sigmas):
    tables = MCTables(mu, sigmas)
    es, d = mc_streams(jnp.asarray(y_win, jnp.float32), tables,
                       dtype=jnp.float32)
    c1 = jnp.asarray(tables.c1, jnp.float32)
    c2 = jnp.asarray(np.stack([tables.c2[p] for p in sorted(tables.c2)]),
                     jnp.float32)
    return es, d, c1, c2


def _scan_ref(es, d, lp, c1, c2, sil):
    one = jax.vmap(lambda e, dd, s0: _ovn_mc_scan(
        e, dd, jnp.asarray(lp, jnp.float32), c1, c2, silent_start=s0,
        with_ll=False)[0])
    return np.asarray(one(es, d, jnp.asarray(sil)))


@pytest.mark.parametrize("N,K,C,B,seed", [
    (2, 12, 3, 4, 3),
    (3, 9, 2, 3, 7),
    (4, 9, 2, 2, 11),   # N=4 x MC: reachable via the raised VMEM ceiling
])
@pytest.mark.slow
def test_mc_mb_bitmatches_scan_engine(N, K, C, B, seed):
    W = 4 * STEP
    y_win, mu, sigmas, lp = _mk_mc(N, K, C, B, W, seed)
    es, d, c1, c2 = _streams_f32(y_win, mu, sigmas)
    sil = np.arange(B) == 0
    x_ref = _scan_ref(es, d, lp, c1, c2, sil)
    x_mb = np.asarray(ovn_mc_decode_pallas_mb(
        es, d, lp, c1, c2, silent_mask=jnp.asarray(sil), interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)
    pair_base = 1 + N * (K - 1)
    assert (x_ref >= pair_base).any()        # pair states were exercised


@pytest.mark.slow
def test_mc_mb_c1_matches_single_channel_kernel():
    """With one channel the MC kernel and the single-channel general-N
    kernel decode the same signal identically (the streams reduce to the
    single-channel emission up to float reassociation — compare labels,
    which agree away from exact ties)."""
    from hmmspikesorter_tpu.ops.pallas_viterbi_ovn_mb import \
        ovn_decode_pallas_mb

    N, K, B, W = 2, 10, 3, 4 * STEP
    y_win, mu, sigmas, lp = _mk_mc(N, K, 1, B, W, 5)
    es, d, c1, c2 = _streams_f32(y_win, mu, sigmas)
    sil = np.arange(B) == 0
    x_mc = np.asarray(ovn_mc_decode_pallas_mb(
        es, d, lp, c1, c2, silent_mask=jnp.asarray(sil), interpret=True))
    x_sc = np.asarray(ovn_decode_pallas_mb(
        jnp.asarray(y_win[:, :, 0], jnp.float32), lp,
        jnp.asarray(mu[:, :, 0], jnp.float32), float(sigmas[0]),
        silent_mask=jnp.asarray(sil), interpret=True))
    agree = np.mean(x_mc == x_sc)
    assert agree > 0.999, agree


@pytest.mark.slow
def test_mc_overlap_save_pallas_engine_matches_ring():
    """mc_overlap_save with the forced pallas engine (interpret via the
    kernel's own test hook is not reachable through the jitted driver, so
    this runs the scan fallback comparison at the stream level instead):
    the pallas branch consumes the same windows the ring branch decodes —
    verify the driver's window/stitch plumbing by running the kernel
    standalone on the driver's own windows."""
    from hmmspikesorter_tpu.parallel.overlap_save import (
        _build_windows, _build_windows_arrays)
    from functools import partial

    N, K, C = 3, 9, 2
    L, H = 2 * STEP, STEP // 2
    T = 6 * L + 17
    rng = np.random.default_rng(2)
    y_win, mu, sigmas, lp = _mk_mc(N, K, C, 1, T, 9)
    yc = y_win[0]
    tables = MCTables(mu, sigmas)
    es, d = mc_streams(jnp.asarray(yc, jnp.float32), tables,
                       dtype=jnp.float32)
    c1 = jnp.asarray(tables.c1, jnp.float32)
    c2 = jnp.asarray(np.stack([tables.c2[p] for p in sorted(tables.c2)]),
                     jnp.float32)
    B = -(-T // L)
    W = L + 2 * H
    Km1 = K - 1
    feats = jnp.concatenate([es[:, None], d.reshape(T, N * Km1)], axis=1)
    build = jax.vmap(partial(_build_windows_arrays, T=T, L=L, H=H, B=B, W=W))
    f_win = build(feats.T)
    es_win = f_win[0]
    d_win = f_win[1:].transpose(1, 2, 0).reshape(B, W, N, Km1)
    sil0 = np.arange(B) == 0
    x_ref = _scan_ref(es_win, d_win, lp, c1, c2, sil0)
    x_mb = np.asarray(ovn_mc_decode_pallas_mb(
        es_win, d_win, lp, c1, c2, silent_mask=jnp.asarray(sil0),
        interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)
