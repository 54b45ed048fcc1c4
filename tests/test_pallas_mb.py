"""Multi-block Pallas kernel (ops/pallas_viterbi_mb.py) vs the XLA ring
engine: bit-exact labels in interpret mode, including multi-lane-group and
multi-chunk grids and the padded-B path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template
from hmmspikesorter_tpu.ops.pallas_viterbi_mb import CH, ov2_decode_pallas_mb
from hmmspikesorter_tpu.ops.ring_viterbi import ring_viterbi_ov2


def _mk(K, B, W, seed=0, pp=(0.01, 0.006)):
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array(pp)
    rng = np.random.default_rng(seed)
    y_win = np.stack([create_signal(W, 0.3, pp, temps, rng=rng)[0]
                      for _ in range(B)])
    return y_win, temps, np.log(pp)


def _ring_ref(y_win, lp, temps, silent_start0=True):
    B = y_win.shape[0]
    one = jax.vmap(lambda yy, s0: ring_viterbi_ov2(
        yy, jnp.asarray(lp, jnp.float32), jnp.asarray(temps, jnp.float32),
        np.float32(0.3), silent_start=s0, with_ll=False)[0])
    sil = (jnp.arange(B) == 0) if silent_start0 else jnp.zeros(B, bool)
    return np.asarray(one(jnp.asarray(y_win, jnp.float32), sil))


@pytest.mark.slow
@pytest.mark.parametrize("K,B,W", [(12, 3, 4 * CH), (20, 5, 8 * CH)])
def test_mb_kernel_bitmatches_ring_engine(K, B, W):
    y_win, temps, lp = _mk(K, B, W)
    x_ref = _ring_ref(y_win, lp, temps)
    x_mb = np.asarray(ov2_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), lp, temps, 0.3, interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)


@pytest.mark.slow
def test_mb_kernel_no_silent_start():
    y_win, temps, lp = _mk(14, 4, 4 * CH, seed=3)
    x_ref = _ring_ref(y_win, lp, temps, silent_start0=False)
    x_mb = np.asarray(ov2_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), lp, temps, 0.3,
        silent_start0=False, interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)


@pytest.mark.slow
def test_mb_kernel_multi_group_multi_chunk():
    # B > G exercises the second lane group; W = 10*CH the chunked grid
    y_win, temps, lp = _mk(60, 130, 10 * CH, seed=1, pp=(0.003, 0.001))
    x_ref = _ring_ref(y_win, lp, temps)
    x_mb = np.asarray(ov2_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), lp, temps, 0.3, interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)


@pytest.mark.slow
@pytest.mark.parametrize("K,B,W", [(12, 3, 4 * CH), (20, 6, 8 * CH)])
def test_mb_kernel_per_window_params(K, B, W):
    """Per-lane (drift-tracked) parameters: each window decodes under its
    OWN (lp, mu, sigma) and bit-matches the vmapped ring engine given the
    same per-window parameters (the decode_tracked block engine)."""
    y_win, temps, lp = _mk(K, B, W, seed=7)
    rng = np.random.default_rng(11)
    # per-window drifts: scaled templates, perturbed lp and sigma
    scales = np.linspace(1.0, 2.0, B)
    mu_all = np.stack([temps * s for s in scales])             # (B, K, 2)
    lp_all = np.stack([lp + rng.uniform(-0.5, 0.5, 2) for _ in range(B)])
    sg_all = 0.3 + rng.uniform(-0.05, 0.1, B)

    one = jax.vmap(lambda yy, s0, lpb, mub, sgb: ring_viterbi_ov2(
        yy, lpb, mub, sgb, silent_start=s0, with_ll=False)[0])
    sil = jnp.arange(B) == 0
    x_ref = np.asarray(one(jnp.asarray(y_win, jnp.float32), sil,
                           jnp.asarray(lp_all, jnp.float32),
                           jnp.asarray(mu_all, jnp.float32),
                           jnp.asarray(sg_all, jnp.float32)))
    x_mb = np.asarray(ov2_decode_pallas_mb(
        jnp.asarray(y_win, jnp.float32), jnp.asarray(lp_all, jnp.float32),
        jnp.asarray(mu_all, jnp.float32), jnp.asarray(sg_all, jnp.float32),
        interpret=True))
    np.testing.assert_array_equal(x_mb, x_ref)
