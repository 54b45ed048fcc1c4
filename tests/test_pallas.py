"""Pallas fused-kernel parity (interpret mode on CPU; the same kernel is
verified on v5e hardware — see module docstring for measured status)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.ops.pallas_viterbi import ov2_decode_pallas
from hmmspikesorter_tpu.ops.ring_viterbi import ring_viterbi_ov2
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template


@pytest.mark.slow
def test_pallas_ov2_bitmatches_ring_interpret():
    K, sigma = 12, 0.3
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.01, 0.006])
    rng = np.random.default_rng(0)
    wins = [create_signal(512, sigma, pp, temps, rng=rng)[0]
            for _ in range(3)]
    y_win = jnp.asarray(np.stack(wins), jnp.float32)
    lp = jnp.asarray(np.log(pp), jnp.float32)
    mu = jnp.asarray(temps, jnp.float32)
    x_pal = np.asarray(ov2_decode_pallas(y_win, lp, mu, sigma,
                                         silent_start0=True, interpret=True))
    for b in range(3):
        x_ref, _ = ring_viterbi_ov2(y_win[b], lp, mu, jnp.float32(sigma),
                                    silent_start=(b == 0), with_ll=False)
        np.testing.assert_array_equal(x_pal[b], np.asarray(x_ref))
