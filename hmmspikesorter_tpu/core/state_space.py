"""Combined ring-HMM state space: topology, transitions, and edge weights.

Reproduces the semantics of the reference implementation's state-space layer
(reference: src/types.jl:65-151) with a TPU-first representation:

* The *topology* (which states exist, which transitions are structurally
  possible) depends only on ``(n_neurons, K, allow_overlaps)`` and is built
  once on the host in NumPy. All shapes downstream are static, so a given
  topology compiles exactly once.

* The *weights* (transition log-probabilities) are a pure function of the
  per-neuron onset log-probability vector ``lp`` — EM updates only ``lp``
  (reference: src/baumwelch.jl:265 rebuilds the whole edge list every
  iteration; here it is a cheap re-evaluation of a closed-form expression
  with no re-tracing).

State encoding (0-based everywhere; the reference is 1-based):

* state 0: all neurons silent (reference state 1).
* states ``1 + n*(K-1) + (k-1)`` for neuron ``n`` at ring position
  ``k ∈ 1..K-1`` (single active neuron).
* if ``allow_overlaps``: pairwise states for neurons ``i < j`` at positions
  ``(k1, k2)``, enumerated k1-major, exactly mirroring the reference's
  ``generate_states`` column order (src/types.jl:65-92).

Transition semantics (reference ``isvalid_transition``, src/types.jl:94-113):
per neuron, with ``lpz = log1p(-exp(sum(lp)))``:

* silent→silent contributes ``lpz`` *per silent neuron* (so the all-silent
  self-loop carries ``N·lpz`` — a deliberate reference quirk we reproduce),
* silent→onset(position 1) contributes ``lp[n]``,
* deterministic ring advance ``k→k+1`` and ring exit ``K-1→0`` contribute 0,
* everything else is impossible.

Hence every edge's weight is ``n_silent_pairs·lpz + Σ_{onsets} lp[n]`` where
``n_silent_pairs`` and the onset set are structural constants of the edge.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np


def _enumerate_states(n_neurons: int, K: int, allow_overlaps: bool) -> np.ndarray:
    """(n_neurons, nstates) int32 ring positions, 0 = silent.

    Column order matches the reference ``generate_states``
    (src/types.jl:65-92).
    """
    N = n_neurons
    cols = [np.zeros(N, np.int32)]
    for i in range(N):
        for k in range(1, K):
            c = np.zeros(N, np.int32)
            c[i] = k
            cols.append(c)
    if allow_overlaps:
        for i in range(N - 1):
            for j in range(i + 1, N):
                for k1 in range(1, K):
                    for k2 in range(1, K):
                        c = np.zeros(N, np.int32)
                        c[i] = k1
                        c[j] = k2
                        cols.append(c)
    return np.stack(cols, axis=1)


@dataclasses.dataclass(frozen=True)
class StateSpace:
    """Static topology of the combined state space.

    Attributes
    ----------
    states : (n_neurons, nstates) int32 — ring position per neuron per state.
    edges_from / edges_to : (n_edges,) int32 — edge list sorted by
        (from, to), matching the reference enumeration order
        (src/types.jl:115-127: outer loop over `from`, inner over `to`).
    edge_n_silent : (n_edges,) int32 — # neurons silent on both sides.
    edge_onsets : (n_edges, n_neurons) int8 — 1 where neuron onsets.
    in_idx / in_slot : padded in-edge gather table, see `in_table`.
    """

    n_neurons: int
    K: int
    allow_overlaps: bool
    states: np.ndarray
    edges_from: np.ndarray
    edges_to: np.ndarray
    edge_n_silent: np.ndarray
    edge_onsets: np.ndarray

    @property
    def nstates(self) -> int:
        return self.states.shape[1]

    @property
    def n_edges(self) -> int:
        return self.edges_from.shape[0]

    # ---------------------------------------------------------------- weights
    def log_silence_stay(self, lp: np.ndarray) -> float:
        """log P(a silent neuron stays silent) — reference src/types.jl:96."""
        lp = np.asarray(lp, dtype=np.float64)
        return float(np.log1p(-np.exp(np.sum(lp))))

    def edge_weights(self, lp) -> np.ndarray:
        """(n_edges,) float64 edge log-probabilities for onset log-probs lp.

        Equivalent to re-running the reference ``get_valid_transitions``
        (src/types.jl:115-127) with the same ``lp`` — verified in tests
        against a literal O(S^2) oracle.
        """
        lp = np.asarray(lp, dtype=np.float64)
        lpz = self.log_silence_stay(lp)
        return self.edge_n_silent.astype(np.float64) * lpz + self.edge_onsets.astype(np.float64) @ lp

    # ------------------------------------------------------------ gather form
    def in_table(self, lp):
        """Padded in-edge table for the gather DP engine.

        Returns ``(in_idx, in_w)`` with shape (nstates, max_in_degree):
        ``in_idx[j, d]`` is the source state of the d-th in-edge of state j
        (sources in ascending order — this preserves the reference's Viterbi
        tie-break of keeping the *first* maximal edge, src/viterbi.jl:74-84);
        padding entries have ``in_idx = 0`` and ``in_w = -inf``.
        """
        w = self.edge_weights(lp)
        S = self.nstates
        order = np.lexsort((self.edges_from, self.edges_to))
        to_sorted = self.edges_to[order]
        frm_sorted = self.edges_from[order]
        w_sorted = w[order]
        counts = np.bincount(to_sorted, minlength=S)
        D = int(counts.max())
        in_idx = np.zeros((S, D), dtype=np.int32)
        in_w = np.full((S, D), -np.inf, dtype=np.float64)
        slot = np.zeros(S, dtype=np.int64)
        # edges are sorted by (to, from): fill rows left-to-right.
        row_start = np.zeros(S + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        for j in range(S):
            a, b = row_start[j], row_start[j + 1]
            in_idx[j, : b - a] = frm_sorted[a:b]
            in_w[j, : b - a] = w_sorted[a:b]
        del slot
        return in_idx, in_w

    def in_table_structure(self):
        """Structural (lp-independent) in-edge table for jitted weight
        recomputation.

        Returns ``(in_idx, in_n_silent, in_onsets, in_valid)`` with shapes
        (S, D), (S, D), (S, D, n_neurons), (S, D): the same layout as
        `in_table` but carrying the structural constants of each edge, so
        the weights ``valid ? n_silent*lpz + onsets@lp : -inf`` can be
        evaluated inside a jitted EM step (the topology never changes during
        EM — only ``lp`` does; reference src/baumwelch.jl:265 rebuilds the
        whole edge list instead).
        """
        S, N = self.nstates, self.n_neurons
        order = np.lexsort((self.edges_from, self.edges_to))
        to_sorted = self.edges_to[order]
        frm_sorted = self.edges_from[order]
        nsil_sorted = self.edge_n_silent[order]
        ons_sorted = self.edge_onsets[order]
        counts = np.bincount(to_sorted, minlength=S)
        D = int(counts.max())
        in_idx = np.zeros((S, D), dtype=np.int32)
        in_nsil = np.zeros((S, D), dtype=np.int32)
        in_ons = np.zeros((S, D, N), dtype=np.int8)
        in_valid = np.zeros((S, D), dtype=bool)
        row_start = np.zeros(S + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        for j in range(S):
            a, b = row_start[j], row_start[j + 1]
            in_idx[j, : b - a] = frm_sorted[a:b]
            in_nsil[j, : b - a] = nsil_sorted[a:b]
            in_ons[j, : b - a] = ons_sorted[a:b]
            in_valid[j, : b - a] = True
        return in_idx, in_nsil, in_ons, in_valid

    def out_table_structure(self):
        """Structural out-edge table — mirror of `in_table_structure`."""
        S, N = self.nstates, self.n_neurons
        order = np.lexsort((self.edges_to, self.edges_from))
        frm_sorted = self.edges_from[order]
        to_sorted = self.edges_to[order]
        nsil_sorted = self.edge_n_silent[order]
        ons_sorted = self.edge_onsets[order]
        counts = np.bincount(frm_sorted, minlength=S)
        D = int(counts.max())
        out_idx = np.zeros((S, D), dtype=np.int32)
        out_nsil = np.zeros((S, D), dtype=np.int32)
        out_ons = np.zeros((S, D, N), dtype=np.int8)
        out_valid = np.zeros((S, D), dtype=bool)
        row_start = np.zeros(S + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        for j in range(S):
            a, b = row_start[j], row_start[j + 1]
            out_idx[j, : b - a] = to_sorted[a:b]
            out_nsil[j, : b - a] = nsil_sorted[a:b]
            out_ons[j, : b - a] = ons_sorted[a:b]
            out_valid[j, : b - a] = True
        return out_idx, out_nsil, out_ons, out_valid

    def out_table(self, lp):
        """Padded out-edge table (for the backward pass).

        Returns ``(out_idx, out_w)`` with shape (nstates, max_out_degree):
        targets of each state's out-edges in ascending target order, padded
        with ``idx=0, w=-inf``.
        """
        w = self.edge_weights(lp)
        S = self.nstates
        order = np.lexsort((self.edges_to, self.edges_from))
        frm_sorted = self.edges_from[order]
        to_sorted = self.edges_to[order]
        w_sorted = w[order]
        counts = np.bincount(frm_sorted, minlength=S)
        D = int(counts.max())
        out_idx = np.zeros((S, D), dtype=np.int32)
        out_w = np.full((S, D), -np.inf, dtype=np.float64)
        row_start = np.zeros(S + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        for j in range(S):
            a, b = row_start[j], row_start[j + 1]
            out_idx[j, : b - a] = to_sorted[a:b]
            out_w[j, : b - a] = w_sorted[a:b]
        return out_idx, out_w

    # ----------------------------------------------------------- conveniences
    def single_active_mask(self) -> np.ndarray:
        """(nstates,) bool — exactly one neuron active (EM μ update support,
        reference src/baumwelch.jl:269)."""
        return (self.states > 0).sum(axis=0) == 1

    def state_onset_edges(self):
        """Indices (into the (to,from)-unsorted edge list) of edges out of the
        all-silent state, in the reference's edge-list order (ascending target
        — reference src/baumwelch.jl:226 `findall(q->q[1]==1)`).
        """
        idx = np.nonzero(self.edges_from == 0)[0]
        return idx[np.argsort(self.edges_to[idx], kind="stable")]


def _state_index_map(states: np.ndarray):
    return {tuple(states[:, s]): s for s in range(states.shape[1])}


@lru_cache(maxsize=32)
def build_state_space(n_neurons: int, K: int, allow_overlaps: bool = True) -> StateSpace:
    """Construct the topology directly from the ring structure.

    O(n_edges) — never materializes the O(S^2) validity scan the reference
    performs (src/types.jl:115-127); equivalence is property-tested against
    a literal oracle on small spaces.
    """
    N, max_active = n_neurons, (2 if allow_overlaps else 1)
    states = _enumerate_states(N, K, allow_overlaps)
    index = _state_index_map(states)
    S = states.shape[1]

    e_from, e_to, e_nsil, e_ons = [], [], [], []
    for s in range(S):
        pos = states[:, s]
        silent = np.nonzero(pos == 0)[0]
        # deterministic advance of active neurons (k->k+1, K-1 -> silent)
        base = pos.copy()
        active = np.nonzero(pos > 0)[0]
        for n in active:
            base[n] = pos[n] + 1 if pos[n] < K - 1 else 0
        n_base_active = int((base > 0).sum())
        # choose onset subset O among neurons silent in the *source* state
        onset_sets = [()]
        if n_base_active < max_active:
            onset_sets += [(int(n),) for n in silent]
        if n_base_active + 2 <= max_active and len(silent) >= 2:
            onset_sets += [
                (int(silent[a]), int(silent[b]))
                for a in range(len(silent))
                for b in range(a + 1, len(silent))
            ]
        for O in onset_sets:
            tgt = base.copy()
            for n in O:
                tgt[n] = 1
            j = index.get(tuple(tgt))
            if j is None:  # target not representable in this space
                continue
            ons = np.zeros(N, np.int8)
            ons[list(O)] = 1
            # neurons silent on both sides: silent in source and not onsetting
            e_from.append(s)
            e_to.append(j)
            e_nsil.append(len(silent) - len(O))
            e_ons.append(ons)

    e_from = np.asarray(e_from, np.int32)
    e_to = np.asarray(e_to, np.int32)
    order = np.lexsort((e_to, e_from))  # reference order: from-major, to-minor
    return StateSpace(
        n_neurons=N,
        K=K,
        allow_overlaps=allow_overlaps,
        states=states,
        edges_from=e_from[order],
        edges_to=e_to[order],
        edge_n_silent=np.asarray(e_nsil, np.int32)[order],
        edge_onsets=np.stack(e_ons, axis=0)[order],
    )


def n_states(n_neurons: int, K: int, allow_overlaps: bool) -> int:
    """Closed-form state count (reference src/types.jl:67)."""
    n = 1 + n_neurons * (K - 1)
    if allow_overlaps:
        n += n_neurons * (n_neurons - 1) * (K - 1) * (K - 1) // 2
    return n
