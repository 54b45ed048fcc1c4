"""State-space topology parity vs the literal reference oracle."""

import numpy as np
import pytest

from hmmspikesorter_tpu.core.state_space import build_state_space, n_states
from tests.oracle import reference_semantics as ref


@pytest.mark.parametrize(
    "N,K,ov",
    [(1, 4, False), (2, 5, False), (2, 5, True), (3, 4, True), (3, 6, False), (4, 3, True)],
)
def test_states_match_reference_enumeration(N, K, ov):
    ss = build_state_space(N, K, ov)
    expected = ref.generate_states(N, K, ov)
    assert ss.states.shape == expected.shape
    np.testing.assert_array_equal(ss.states, expected)
    assert ss.nstates == n_states(N, K, ov)


@pytest.mark.parametrize(
    "N,K,ov",
    [(1, 4, False), (2, 5, False), (2, 5, True), (3, 4, True), (3, 6, False), (4, 3, True)],
)
def test_edges_match_reference_o_s2_scan(N, K, ov):
    rng = np.random.default_rng(0)
    lp = np.log(rng.uniform(0.001, 0.01, size=N))
    ss = build_state_space(N, K, ov)
    expected = ref.get_valid_transitions(ss.states, K, lp)
    got = list(zip(ss.edges_from.tolist(), ss.edges_to.tolist(),
                   ss.edge_weights(lp).tolist()))
    assert len(got) == len(expected)
    for (gf, gt, gw), (ef, et, ew) in zip(got, expected):
        assert (gf, gt) == (ef, et)
        assert gw == pytest.approx(ew, rel=0, abs=1e-12)


def test_default_scale_counts():
    # SURVEY.md §2 #6: N=3,K=60 -> 178 states without overlaps, 10621 with.
    assert n_states(3, 60, False) == 178
    assert n_states(3, 60, True) == 10621
    assert n_states(2, 60, True) == 3600


def test_in_table_sources_ascending_and_padding():
    ss = build_state_space(3, 6, False)
    lp = np.log(np.full(3, 0.004))
    in_idx, in_w = ss.in_table(lp)
    finite = np.isfinite(in_w)
    # within each row, real entries first, sources ascending
    for j in range(ss.nstates):
        n = finite[j].sum()
        assert finite[j, :n].all() and not finite[j, n:].any()
        srcs = in_idx[j, :n]
        assert (np.diff(srcs) > 0).all()
    # every edge appears exactly once
    assert finite.sum() == ss.n_edges


def test_in_out_tables_consistent():
    ss = build_state_space(2, 5, True)
    lp = np.log([0.01, 0.004])
    in_idx, in_w = ss.in_table(lp)
    out_idx, out_w = ss.out_table(lp)
    edges_in = {(int(in_idx[j, d]), j, float(in_w[j, d]))
                for j in range(ss.nstates)
                for d in range(in_idx.shape[1]) if np.isfinite(in_w[j, d])}
    edges_out = {(i, int(out_idx[i, d]), float(out_w[i, d]))
                 for i in range(ss.nstates)
                 for d in range(out_idx.shape[1]) if np.isfinite(out_w[i, d])}
    assert edges_in == edges_out


def test_onset_edge_order():
    ss = build_state_space(3, 5, False)
    oe = ss.state_onset_edges()
    # first onset-ish edge is the silent self-loop, then onsets by target asc
    assert ss.edges_to[oe[0]] == 0
    targets = ss.edges_to[oe[1:]]
    assert (np.diff(targets) > 0).all()
    # onset targets are ring position 1 of each neuron
    K = ss.K
    np.testing.assert_array_equal(targets, 1 + np.arange(3) * (K - 1))
