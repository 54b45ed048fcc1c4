"""Seam repair (parallel/seam_repair.py): dense spiking across an
overlap-save seam must not break exactness vs the sequential engine.

Adversarial construction: two neurons fire back-to-back with staggered
phases around a block seam, so no all-silent sample exists anywhere near it
— the base protocol's +-H seam search must fail (seam_ok=False), and the
widening-window repair must restore exact agreement with the whole-signal
sequential decode (VERDICT round-1, item 1b)."""

import numpy as np
import pytest

from hmmspikesorter_tpu.data.synthetic import create_spike_template
from hmmspikesorter_tpu.models.api import (HMMTemplateModel,
                                           fit_spiking_model,
                                           fit_spiking_model_fast)


def _dense_signal(T, K, temps, seam, halfwidth, rng, noise=0.05):
    """Noise floor + back-to-back spikes of both neurons (phases staggered
    by K//2) covering [seam - halfwidth, seam + halfwidth): the combined
    state is never all-silent there."""
    y = rng.normal(0.0, noise, T)
    for n, phase in ((0, 0), (1, K // 2)):
        t = seam - halfwidth + phase
        while t < seam + halfwidth:
            end = min(t + K - 1, T)
            y[t:end] += temps[1 : 1 + (end - t), n]
            t += K                       # exit to silence, re-onset next step
    return y


@pytest.fixture(scope="module")
def setup():
    K = 20
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    lp = np.log(np.array([0.003, 0.001]))
    tm = HMMTemplateModel(mu=temps, sigma=0.05, lp=lp, allow_overlaps=True)
    return K, temps, tm


def test_dense_seam_flagged_without_repair(setup):
    K, temps, tm = setup
    rng = np.random.default_rng(7)
    T, L, H = 8192, 2048, 256
    y = _dense_signal(T, K, temps, seam=2048, halfwidth=800, rng=rng)
    m = fit_spiking_model_fast(tm, y, L=L, H=H, repair=False)
    assert not np.asarray(m.seam_ok).all()


def test_repair_restores_exact_sequential_labels(setup):
    K, temps, tm = setup
    rng = np.random.default_rng(7)
    T, L, H = 8192, 2048, 256
    y = _dense_signal(T, K, temps, seam=2048, halfwidth=800, rng=rng)
    seq = fit_spiking_model(tm, y)
    fast = fit_spiking_model_fast(tm, y, L=L, H=H, repair=True)
    assert np.asarray(fast.seam_ok).all()
    assert fast.seams_repaired >= 1
    np.testing.assert_array_equal(np.asarray(fast.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))
    assert np.isfinite(fast.ll)
    assert fast.ll == pytest.approx(seq.ll, rel=1e-12)


def test_repair_degenerates_to_whole_signal_decode(setup):
    # spiking dense over the whole recording: every widening round fails
    # and the repair falls back to the exact whole-signal decode
    K, temps, tm = setup
    rng = np.random.default_rng(9)
    T, L, H = 4096, 1024, 128
    y = _dense_signal(T, K, temps, seam=T // 2, halfwidth=T // 2, rng=rng)
    seq = fit_spiking_model(tm, y)
    fast = fit_spiking_model_fast(tm, y, L=L, H=H, repair=True)
    np.testing.assert_array_equal(np.asarray(fast.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))
    assert fast.ll == pytest.approx(seq.ll, rel=1e-12)


def test_streaming_path_repairs_too(setup):
    K, temps, tm = setup
    rng = np.random.default_rng(7)
    T, L, H = 16384, 2048, 256
    y = _dense_signal(T, K, temps, seam=4096, halfwidth=700, rng=rng)
    seq = fit_spiking_model(tm, y)
    fast = fit_spiking_model_fast(tm, y, L=L, H=H, streaming=True,
                                  blocks_per_call=4, repair=True)
    assert np.asarray(fast.seam_ok).all()
    np.testing.assert_array_equal(np.asarray(fast.ml_seq, np.int64),
                                  np.asarray(seq.ml_seq, np.int64))


def test_find_splice_excludes_the_raw_cut_sample():
    """The left splice point must be STRICTLY before the seam p: sample p
    is the right block's first sample, so t1 == p would leave the raw-cut
    junction x[p-1] -> x[p] (possibly an invalid mid-ring -> silent jump)
    outside the splice, breaking the repaired path's validity guarantee."""
    from hmmspikesorter_tpu.parallel.seam_repair import _find_splice

    p, T = 10, 40
    x_cur = np.ones(T, np.int32)          # mid-ring everywhere...
    x_cur[p] = 0                          # ...except the right block's
    x_cur[4] = 0                          # first sample and one earlier
    x_cur[p + 5] = 0                      # common-silent point each side
    x_new = np.ones(T, np.int32)
    x_new[4] = 0
    x_new[p] = 0                          # fresh decode also silent at p
    x_new[p + 5] = 0
    got = _find_splice(x_cur, x_new, 0, p, 0, T, T)
    assert got is not None
    t1, t2 = got
    assert t1 == 4 and t2 == p + 5        # NOT t1 == p
    # with no common silence strictly before p, the window must widen
    x_cur[4] = 1
    x_new[4] = 1
    assert _find_splice(x_cur, x_new, 0, p, 5, T, T) is None


def test_overlap_fb_guards_bad_geometry():
    import jax.numpy as jnp
    import pytest as _pytest

    from hmmspikesorter_tpu.ops.ring_fb import ring_overlap_forward_backward

    y = jnp.zeros(4096)
    lp = jnp.asarray(np.log([0.01, 0.01]))
    mu = jnp.asarray(np.zeros((12, 2)))
    with _pytest.raises(ValueError, match="1 <= H"):
        ring_overlap_forward_backward(y, lp, mu, 0.3, L=512, H=0)
    with _pytest.raises(ValueError, match="1 <= H"):
        ring_overlap_forward_backward(y, lp, mu, 0.3, L=512, H=300)


@pytest.mark.slow
def test_fast_path_randomized_exactness_sweep():
    """Randomized production fast-path property: across random (T, L, H,
    topology, rates, noise) draws — including spike-dense signals — the
    repaired overlap-save decode must exactly reproduce the sequential
    whole-signal decode, labels AND ll."""
    from hmmspikesorter_tpu.data.synthetic import create_signal

    rng = np.random.default_rng(99)
    for trial in range(6):
        K = int(rng.integers(8, 16))
        N = int(rng.integers(2, 4))
        overlaps = bool(rng.integers(0, 2))
        H = int(rng.integers(3, 6)) * 16
        L = 2 * H * int(rng.integers(1, 3))
        B = int(rng.integers(3, 7))
        T = B * L + int(rng.integers(0, L))
        sigma = float(0.1 + 0.3 * rng.random())
        pp = 10.0 ** (-rng.uniform(1.5, 2.5, N))
        temps = np.stack(
            [create_spike_template(K, 2.0 + rng.random() * 2,
                                   0.3 + 0.5 * rng.random(),
                                   0.15 + 0.15 * rng.random())
             for _ in range(N)], axis=1)
        y, _ = create_signal(T, sigma, pp, temps,
                             rng=np.random.default_rng(500 + trial))
        tm = HMMTemplateModel(mu=temps, sigma=sigma, lp=np.log(pp),
                              allow_overlaps=overlaps)
        seq = fit_spiking_model(tm, y)
        fast = fit_spiking_model_fast(tm, y, L=L, H=H)
        msg = (f"trial {trial}: T={T} L={L} H={H} N={N} K={K} "
               f"overlaps={overlaps} sigma={sigma:.2f}")
        np.testing.assert_array_equal(np.asarray(fast.ml_seq),
                                      np.asarray(seq.ml_seq), err_msg=msg)
        assert float(fast.ll) == pytest.approx(float(seq.ll),
                                               rel=1e-9), msg
        # the sparse-event transfer must survive the same random
        # geometries (incl. flagged-seam repairs, where it falls back to
        # the dense fetch before the repair pass rewrites labels)
        ev = fit_spiking_model_fast(tm, y, L=L, H=H, transfer="events")
        np.testing.assert_array_equal(np.asarray(ev.ml_seq),
                                      np.asarray(fast.ml_seq), err_msg=msg)
        assert float(ev.ll) == pytest.approx(float(fast.ll),
                                             rel=1e-12), msg
