"""Time-parallel decode engines vs the sequential scan engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from hmmspikesorter_tpu.core.emission import state_means
from hmmspikesorter_tpu.core.state_space import build_state_space
from hmmspikesorter_tpu.core.viterbi import viterbi_decode
from hmmspikesorter_tpu.parallel.block_viterbi import blocked_viterbi
from hmmspikesorter_tpu.parallel.overlap_save import overlap_save_viterbi
from hmmspikesorter_tpu.data.synthetic import create_signal, create_spike_template


def _setup(N=2, K=20, T=8192, overlaps=False, sigma=0.3, seed=5,
           pp=(0.004, 0.002)):
    rng = np.random.default_rng(seed)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)][:N], axis=1)
    pp = np.array(pp[:N])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    ss = build_state_space(N, K, overlaps)
    lp = np.log(pp)
    in_idx, in_w = ss.in_table(lp)
    smu = state_means(jnp.asarray(ss.states), jnp.asarray(temps))
    return (jnp.asarray(y), jnp.asarray(in_idx), jnp.asarray(in_w), smu,
            sigma)


@pytest.mark.parametrize("T,L", [(4000, 256), (8192, 512), (1000, 1024)])
def test_blocked_viterbi_exact(T, L):
    y, in_idx, in_w, smu, sigma = _setup(T=T)
    x_seq, ll_seq = viterbi_decode(y, in_idx, in_w, smu, sigma)
    x_blk, ll_blk = blocked_viterbi(y, in_idx, in_w, smu, sigma, L=L)
    np.testing.assert_array_equal(np.asarray(x_blk), np.asarray(x_seq))
    assert float(ll_blk) == pytest.approx(float(ll_seq), rel=1e-9)


def test_blocked_viterbi_exact_overlap_space():
    y, in_idx, in_w, smu, sigma = _setup(T=2000, K=10, overlaps=True)
    x_seq, ll_seq = viterbi_decode(y, in_idx, in_w, smu, sigma)
    x_blk, ll_blk = blocked_viterbi(y, in_idx, in_w, smu, sigma, L=128)
    np.testing.assert_array_equal(np.asarray(x_blk), np.asarray(x_seq))
    assert float(ll_blk) == pytest.approx(float(ll_seq), rel=1e-9)


def test_overlap_save_matches_sequential():
    y, in_idx, in_w, smu, sigma = _setup(T=8192, K=20)
    x_seq, _ = viterbi_decode(y, in_idx, in_w, smu, sigma)
    x_os, seam_ok = overlap_save_viterbi(y, in_idx, in_w, smu, sigma,
                                         L=1024, H=128)
    assert bool(seam_ok.all())
    agree = (np.asarray(x_os) == np.asarray(x_seq)).mean()
    # halo >> K and seams snapped to common silence: expect near-perfect
    # agreement (differences only from the first block's init handling)
    assert agree > 0.999


def test_overlap_save_silence_seams_are_silent():
    y, in_idx, in_w, smu, sigma = _setup(T=4096, K=12)
    x_os, seam_ok = overlap_save_viterbi(y, in_idx, in_w, smu, sigma,
                                         L=512, H=64)
    assert x_os.shape == y.shape
    assert bool(seam_ok.all())


def test_overlap_save_rejects_bad_shapes():
    y, in_idx, in_w, smu, sigma = _setup(T=1000)
    with pytest.raises(ValueError):
        overlap_save_viterbi(y, in_idx, in_w, smu, sigma, L=512, H=64)


def test_overlap_save_decode_long_matches_sequential():
    from hmmspikesorter_tpu.parallel.overlap_save import overlap_save_decode_long
    y, in_idx, in_w, smu, sigma = _setup(T=10000, K=20)
    x_seq, _ = viterbi_decode(y, in_idx, in_w, smu, sigma)
    x_long, seam_ok = overlap_save_decode_long(
        np.asarray(y), in_idx, in_w, smu, sigma, L=1024, H=128,
        blocks_per_call=4)
    assert seam_ok.all()
    agree = (x_long == np.asarray(x_seq)).mean()
    assert agree > 0.999


def test_overlap_save_decode_long_prefetch_invariant():
    """Double-buffering depth never changes the output: prefetch=1 (serial
    dispatch-then-fetch), 2 (default), and deeper all produce identical
    labels and seam flags — only scheduling differs."""
    from hmmspikesorter_tpu.parallel.overlap_save import overlap_save_decode_long
    y, in_idx, in_w, smu, sigma = _setup(T=10000, K=20)
    outs = [overlap_save_decode_long(
        np.asarray(y), in_idx, in_w, smu, sigma, L=1024, H=128,
        blocks_per_call=3, prefetch=p) for p in (1, 2, 4)]
    for x, ok in outs[1:]:
        np.testing.assert_array_equal(x, outs[0][0])
        np.testing.assert_array_equal(ok, outs[0][1])
    with pytest.raises(ValueError):
        overlap_save_decode_long(np.asarray(y), in_idx, in_w, smu, sigma,
                                 L=1024, H=128, prefetch=0)


def test_ring_overlap_save_matches_host_driver():
    from hmmspikesorter_tpu.parallel.overlap_save import (
        overlap_save_decode_long, ring_overlap_save)
    from hmmspikesorter_tpu.ops.ring_viterbi import ring_block_decoder
    y, in_idx, in_w, smu, sigma = _setup(T=8192, K=20, overlaps=True)
    # rebuild lp/mu for the ring engines
    temps = np.stack([__import__("hmmspikesorter_tpu.data.synthetic",
                                 fromlist=["create_spike_template"]
                                 ).create_spike_template(20, 3.0, 0.8, 0.2),
                      __import__("hmmspikesorter_tpu.data.synthetic",
                                 fromlist=["create_spike_template"]
                                 ).create_spike_template(20, 4.0, 0.3, 0.2)],
                     axis=1)
    lp = np.log([0.004, 0.002])
    x_dev, ok_dev = ring_overlap_save(np.asarray(y), lp, temps, sigma,
                                      L=1024, H=128, overlaps=True)
    x_seq, _ = viterbi_decode(y, in_idx, in_w, smu, sigma)
    assert np.asarray(ok_dev).all()
    agree = (np.asarray(x_dev) == np.asarray(x_seq)).mean()
    assert agree > 0.999


def test_overlap_save_seam_fallback_no_silence():
    # a decoder that never reports silence forces every seam onto the raw
    # block-boundary cut with seam_ok False — the documented fallback
    from hmmspikesorter_tpu.parallel.overlap_save import (
        overlap_save_decode_long)
    y, in_idx, in_w, smu, sigma = _setup(T=4096, K=12)

    def never_silent(y_win, sil):
        return jnp.ones(y_win.shape, jnp.int32)

    x, seam_ok = overlap_save_decode_long(
        np.asarray(y), in_idx, in_w, smu, sigma, L=1024, H=64,
        blocks_per_call=2, block_decoder=never_silent)
    assert x.shape == (4096,)
    assert not seam_ok.any()
    assert (x == 1).all()


def test_tail_edge_bitmatch_ragged_T():
    """A spike straddling the true signal end must decode identically to
    the sequential engine: the last overlap-save window ends at T, never at
    the zero-padded grid end (whose fake silence biased the backtrace —
    round-1 0.075% tail disagreement, VERDICT weakness #5)."""
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model,
                                               fit_spiking_model_fast)

    K, sigma = 20, 0.2
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    rng = np.random.default_rng(11)
    T = 5000                              # not a multiple of L
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    y = np.asarray(y, float)
    y[T - 10 :] += temps[1:11, 0]         # spike onset 10 samples before T
    tm = HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                          allow_overlaps=True)
    seq = fit_spiking_model(tm, y)
    assert np.asarray(seq.ml_seq)[-1] != 0    # it really ends mid-spike
    one = fit_spiking_model_fast(tm, y, L=2048, H=256)
    stream = fit_spiking_model_fast(tm, y, L=2048, H=256, streaming=True,
                                    blocks_per_call=2)
    np.testing.assert_array_equal(np.asarray(one.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))
    np.testing.assert_array_equal(np.asarray(stream.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))


def test_streaming_first_block_silent_start():
    """A recording that starts mid-spike: the streaming driver must apply
    the reference's forced silent start to the block containing sample 0
    (it used emission-only init there before, diverging from the
    sequential engine at the signal head)."""
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model,
                                               fit_spiking_model_fast)

    K, sigma = 20, 0.1
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    rng = np.random.default_rng(2)
    T = 6144
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    y = np.asarray(y, float)
    y[:K - 5] += temps[5:, 0]            # signal opens mid-spike
    tm = HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                          allow_overlaps=True)
    seq = fit_spiking_model(tm, y)
    stream = fit_spiking_model_fast(tm, y, L=2048, H=256, streaming=True,
                                    blocks_per_call=2)
    np.testing.assert_array_equal(np.asarray(stream.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))


def test_tail_edge_bitmatch_T_mod_L_less_than_H():
    """0 < T mod L < H: row B-2's right halo also overruns the true end
    and must decode the real signal, not the zero pad (review finding r2;
    the earlier tail test had T mod L > H and missed this band)."""
    from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                               fit_spiking_model,
                                               fit_spiking_model_fast)

    K, sigma = 20, 0.2
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    rng = np.random.default_rng(13)
    L, H = 1024, 256
    T = 5 * L + 100                       # T mod L = 100 < H
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)
    y = np.asarray(y, float)
    # spikes straddling the B-2/B-1 window boundary region near (B-1)*L
    for t0 in (5 * L - 30, 5 * L + 40):
        y[t0 : t0 + K - 1] += temps[1:, 0][: max(0, min(K - 1, T - t0))]
    tm = HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                          allow_overlaps=True)
    seq = fit_spiking_model(tm, y)
    fast = fit_spiking_model_fast(tm, y, L=L, H=H)
    np.testing.assert_array_equal(np.asarray(fast.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))


def test_batched_overlap_save_matches_per_channel():
    """ring_overlap_save_batched folds all channels' blocks into one
    program; per-channel results must equal the single-channel path."""
    from hmmspikesorter_tpu.parallel.overlap_save import (
        ring_overlap_save, ring_overlap_save_batched)

    K, sigma, C = 20, 0.3, 3
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.004, 0.002])
    lp = np.log(pp)
    T = 5000                              # ragged T exercises edge rows
    ys = np.stack([create_signal(T, sigma, pp, temps,
                                 rng=np.random.default_rng(100 + c))[0]
                   for c in range(C)])
    xs_b, ok_b = ring_overlap_save_batched(ys, lp, temps, sigma,
                                           L=1024, H=256, overlaps=True)
    for c in range(C):
        x1, ok1 = ring_overlap_save(ys[c], lp, temps, sigma,
                                    L=1024, H=256, overlaps=True)
        np.testing.assert_array_equal(np.asarray(xs_b)[c], np.asarray(x1))
        np.testing.assert_array_equal(np.asarray(ok_b)[c], np.asarray(ok1))
