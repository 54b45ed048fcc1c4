"""Template surgery parity — mirrors reference test/runtests.jl:44-68
("overlap and combine", "match templates") plus merge/prune unit tests."""

import numpy as np
import pytest

from hmmspikesorter_tpu.data.synthetic import create_spike_template
from hmmspikesorter_tpu.train import template_ops
from hmmspikesorter_tpu.utils.stats import chi2_cdf


def test_chi2_cdf_reference_values():
    # spot values cross-checked against Distributions.jl / scipy tables
    assert chi2_cdf(0.0, 5) == 0.0
    assert chi2_cdf(4.351, 5) == pytest.approx(0.5, abs=2e-4)
    assert chi2_cdf(11.07, 5) == pytest.approx(0.95, abs=2e-4)
    assert chi2_cdf(67.50, 50) == pytest.approx(0.95, abs=2e-4)
    assert chi2_cdf(30.14, 59) == pytest.approx(0.00068, abs=5e-5)


def test_find_best_overlap_identical_short():
    # reference runtests.jl:45-48: two identical [1,2,3] templates
    mu = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    (i1, i2), xm = template_ops.find_best_overlap(mu, 0, 1)
    np.testing.assert_array_equal(i1, np.arange(3))
    np.testing.assert_array_equal(i2, np.arange(3))
    assert xm == pytest.approx(14.0)


def test_find_best_overlap_shifted_golden():
    # reference runtests.jl:49-55: shifted duplicate, golden xcorr value
    t1 = create_spike_template(60, 3.0, 0.8, 0.2)
    t2 = np.zeros_like(t1)
    t2[4:] = t1[:56]
    mu = np.column_stack([t1, t2])
    (i1, i2), xm = template_ops.find_best_overlap(mu, 0, 1)
    np.testing.assert_array_equal(i1, np.arange(0, 56))
    np.testing.assert_array_equal(i2, np.arange(4, 60))
    assert xm == pytest.approx(100.66411692920131, rel=1e-12)


def test_condense_candidate_picks_shifted_duplicate():
    # reference runtests.jl:57-60 (sigma^2 = 0.1 there via the alpha arg
    # position; the candidate pair and alignment are the assertion)
    t1 = create_spike_template(60, 3.0, 0.8, 0.2)
    t2 = np.zeros_like(t1)
    t2[4:] = t1[:56]
    mu = np.column_stack([t1, t2])
    cand = template_ops.condense_candidate(mu, sigma2=0.1, alpha=0.05)
    assert cand is not None
    i1, i2, stat, (x1, x2) = cand
    assert (i1, i2) == (0, 1)
    np.testing.assert_array_equal(x1, np.arange(0, 56))
    np.testing.assert_array_equal(x2, np.arange(4, 60))


def test_condense_merges_duplicates_keeps_distinct():
    t1 = create_spike_template(40, 3.0, 0.8, 0.2)
    t2 = create_spike_template(40, 4.0, 0.3, 0.2)
    dup = t1 + 0.01 * np.random.default_rng(0).standard_normal(40)
    mu = np.column_stack([t1, t2, dup])
    lp = np.log([0.003, 0.001, 0.002])
    mu2, lp2 = template_ops.condense_templates(mu, lp, sigma=0.3)
    assert mu2.shape[1] == 2
    # distinct template survives untouched
    assert any(np.allclose(mu2[:, j], t2) for j in range(2))
    # merged onset prob is the pair mixture
    pm = 0.5 * 0.003 + 0.5 * 0.002
    assert np.exp(lp2).max() == pytest.approx(max(pm, 0.001), rel=1e-12)


def test_condense_never_merges_dissimilar():
    t1 = create_spike_template(40, 3.0, 0.8, 0.2)
    t2 = create_spike_template(40, 4.0, 0.3, 0.2)
    mu = np.column_stack([t1, t2])
    lp = np.log([0.003, 0.001])
    mu2, lp2 = template_ops.condense_templates(mu, lp, sigma=0.3)
    assert mu2.shape[1] == 2
    np.testing.assert_array_equal(mu2, mu)


def test_match_templates_scaled_identity():
    # reference runtests.jl:63-68: scaled copy still matches identically
    mu = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    mu[:, 0] *= 1.3
    mm, cc = template_ops.match_templates(mu, mu)
    np.testing.assert_array_equal(mm, [0, 1])
    np.testing.assert_allclose(cc, [0.0, 0.0], atol=1e-12)


def test_remove_sparse_threshold():
    lp = np.array([-5.0, -80.0, -69.9, -70.0])
    np.testing.assert_array_equal(template_ops.remove_sparse(lp), [0, 2])


def test_remove_small_drops_subnoise():
    K = 40
    big = create_spike_template(K, 3.0, 0.8, 0.2)
    tiny = 0.01 * create_spike_template(K, 1.0, 0.5, 0.2)
    mu = np.column_stack([big, tiny, np.zeros(K)])
    keep = template_ops.remove_small(mu, sigma=0.3)
    np.testing.assert_array_equal(keep, [0])


def test_chi2_cdf_large_df_accuracy():
    """The gamma series/CF need O(sqrt(df)) terms near x ~ df; a fixed
    500-term budget silently returned 0.342 for P(5e5 | df=5e5). The
    budget now scales with df (scipy.special.gammainc reference values)."""
    from scipy.special import gammainc

    from hmmspikesorter_tpu.utils.stats import chi2_cdf, chi2_sf

    for df in (30, 3000, 22656, 500000):
        ref = float(gammainc(df / 2, df / 2))
        assert abs(chi2_cdf(df, df) - ref) < 1e-9, df
    # sf is the tail complement used by the merge/small tests
    assert abs(chi2_sf(120.0, 59) - (1.0 - chi2_cdf(120.0, 59))) < 1e-15
