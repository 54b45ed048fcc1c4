"""vmap batch-size consistency canaries.

XLA:CPU (jax 0.9.0) miscompiled `lax.scan(..., reverse=True)` over the
table-driven ovn engine's flag pytree under vmap at B=5: row 0's backtrace
read time-misaligned flag slices and produced an invalid path (forward
scores and flags were bit-correct; only the reverse-scan consumption was
wrong). ops/ring_viterbi_ovn.py now flips the flag streams and scans
forward. These canaries pin the invariant the production overlap-save
drivers rely on for EVERY engine they vmap: decoding B identical rows
must give B identical copies of the single-row decode, at every B.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.data.synthetic import (create_signal,
                                               create_spike_template)
from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                           fit_spiking_model,
                                           fit_spiking_model_fast)
from hmmspikesorter_tpu.ops.ring_viterbi import (ring_viterbi_nov,
                                                 ring_viterbi_ov2)
from hmmspikesorter_tpu.ops.ring_viterbi_ovn import ring_viterbi_ovn

K = 9
PARAMS = [(3.0, 0.8, 0.2), (4.0, 0.3, 0.2), (2.5, 0.6, 0.3)]


def _mk(N, T, seed):
    temps = np.stack([create_spike_template(K, *PARAMS[i % 3])
                      for i in range(N)], axis=1)
    pp = np.array([0.03, 0.02, 0.025][:N])
    rng = np.random.default_rng(seed)
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    return jnp.asarray(y), jnp.asarray(np.log(pp)), jnp.asarray(temps)


def _ring_case(engine, N, B):
    y, lp, mu = _mk(N, 96, 101 + N)
    one = jax.vmap(lambda yy: engine(yy, lp, mu, 0.3, silent_start=True,
                                     with_ll=False)[0])
    ref = np.asarray(one(y[None]))[0]
    out = np.asarray(one(jnp.stack([y] * B)))
    for i in range(B):
        np.testing.assert_array_equal(out[i], ref, err_msg=f"row {i} of B={B}")


@pytest.mark.parametrize("B", [3, 5, 7])
@pytest.mark.parametrize("engine,N", [
    (ring_viterbi_nov, 2),
    (ring_viterbi_ov2, 2),
    (ring_viterbi_ovn, 2),
    (ring_viterbi_ovn, 3),
])
def test_ring_engines_identical_rows(engine, N, B):
    _ring_case(engine, N, B)


@pytest.mark.parametrize("B", [5])
def test_generic_engine_identical_rows(B):
    y, lp, mu = _mk(2, 96, 113)
    tm = HMMTemplateModel(mu=np.asarray(mu), sigma=0.3, lp=np.asarray(lp),
                          allow_overlaps=True)
    in_idx, in_w, smu = tm.decode_tables()
    one = jax.vmap(lambda yy: viterbi_decode(yy, in_idx, in_w, smu, 0.3)[0])
    ref = np.asarray(one(y[None]))[0]
    out = np.asarray(one(jnp.stack([y] * B)))
    for i in range(B):
        np.testing.assert_array_equal(out[i], ref)


def test_n3_fast_decode_b5_matches_sequential():
    """The original failure: N=3 overlap fast decode with exactly 5
    overlap-save blocks silently lost spikes in block 0 and returned an
    invalid (-inf ll) path. Must bit-match the sequential decode and
    report a finite ll."""
    N, T, L, H = 3, 2360, 512, 64          # B = ceil(2360/512) = 5
    temps = np.stack([create_spike_template(K, *PARAMS[i]) for i in range(N)],
                     axis=1)
    pp = np.array([0.02, 0.015, 0.018])
    rng = np.random.default_rng(71)
    y, _ = create_signal(T, 0.3, pp, temps, rng=rng)
    tm = HMMTemplateModel(mu=temps, sigma=0.3, lp=np.log(pp),
                          allow_overlaps=True)
    m = fit_spiking_model(tm, y)
    mf = fit_spiking_model_fast(tm, y, L=L, H=H)
    np.testing.assert_array_equal(np.asarray(mf.ml_seq), np.asarray(m.ml_seq))
    assert np.isfinite(mf.ll)
    assert (np.asarray(m.ml_seq) >= 1 + N * (K - 1)).any() or \
           (np.asarray(m.ml_seq) >= 1).any()   # spikes were decoded
