"""General-N multi-block Pallas kernel (ops/pallas_viterbi_ovn_mb.py) vs
the table-driven XLA engine (ops/ring_viterbi_ovn.py): bit-exact labels in
interpret mode at f32, for N = 2, 3, 4, including forced overlapping
spikes, no-silent-start rows, and the multi-chunk grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from hmmspikesorter_tpu.ops.pallas_viterbi_ovn_mb import (
    CH, ovn_decode_pallas_mb, ovn_mb_vmem_ok)
from hmmspikesorter_tpu.ops.ring_viterbi_ovn import ring_viterbi_ovn

PARAMS = [(3.0, 0.8, 0.2), (4.0, 0.3, 0.2), (2.5, 0.6, 0.3),
          (2.0, 0.5, 0.25)]


def _mk(N, K, B, W, seed, extra_noise=0.0):
    temps = np.stack([create_spike_template(K, *PARAMS[i % 4])
                      for i in range(N)], axis=1)
    pp = np.array([0.03, 0.02, 0.025, 0.015][:N])
    rng = np.random.default_rng(seed)
    y_win = np.stack([create_signal(W, 0.3, pp, temps, rng=rng)[0]
                      for _ in range(B)])
    # force overlapping spikes so pair states are exercised
    y_win[0, 5:5 + K - 1] += temps[1:, 0]
    y_win[0, 8:8 + K - 1] += temps[1:, min(1, N - 1)]
    if extra_noise:
        y_win += extra_noise * rng.standard_normal(y_win.shape)
    return y_win, temps, np.log(pp)


def _ovn_ref(y_win, lp, temps, sil0=True):
    B = y_win.shape[0]
    one = jax.vmap(lambda yy, s0: ring_viterbi_ovn(
        yy, jnp.asarray(lp, jnp.float32), jnp.asarray(temps, jnp.float32),
        np.float32(0.3), silent_start=s0, with_ll=False)[0])
    sil = (jnp.arange(B) == 0) if sil0 else jnp.zeros(B, bool)
    return np.asarray(one(jnp.asarray(y_win, jnp.float32), sil))


@pytest.mark.parametrize("N,K,B,W,seed", [
    (3, 9, 3, 4 * CH, 5),
    (4, 7, 3, 4 * CH, 11),
    (2, 12, 4, 4 * CH, 12),
])
@pytest.mark.slow
def test_ovn_mb_bitmatches_xla_engine(N, K, B, W, seed):
    y_win, temps, lp = _mk(N, K, B, W, seed)
    x_ref = _ovn_ref(y_win, lp, temps)
    x_mb = np.asarray(ovn_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), lp, temps, 0.3, interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)
    pair_base = 1 + N * (K - 1)
    assert (x_ref >= pair_base).any()        # pair states were exercised


@pytest.mark.slow
def test_ovn_mb_no_silent_start_extra_noise():
    y_win, temps, lp = _mk(3, 8, 4, 4 * CH, 13, extra_noise=0.2)
    x_ref = _ovn_ref(y_win, lp, temps, sil0=False)
    x_mb = np.asarray(ovn_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), lp, temps, 0.3,
        silent_start0=False, interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)


@pytest.mark.slow
def test_ovn_mb_multi_chunk_n4():
    y_win, temps, lp = _mk(4, 9, 2, 8 * CH, 15, extra_noise=0.15)
    x_ref = _ovn_ref(y_win, lp, temps)
    x_mb = np.asarray(ovn_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), lp, temps, 0.3, interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)


def test_ovn_mb_vmem_gate():
    # production K=60 against the raised (v5e-validated) 64 MB ceiling:
    # N=3 and N=4 fit (both bit-exact on hardware); pathological pair
    # counts are refused. Against a conservative 16 MB core only N=3
    # single-channel fits (the pre-raise behavior).
    v5e = 64 * 2**20
    assert ovn_mb_vmem_ok(3, 60, ceiling=v5e)
    assert ovn_mb_vmem_ok(4, 60, ceiling=v5e)
    assert not ovn_mb_vmem_ok(8, 60, ceiling=v5e)
    assert ovn_mb_vmem_ok(3, 60, ceiling=16 * 2**20)
    assert not ovn_mb_vmem_ok(4, 60, ceiling=16 * 2**20)
