"""Baum-Welch EM for the ring-HMM spike sorter, as a single jitted step.

Reproduces the reference's live EM semantics (src/baumwelch.jl:205-370):

* gamma[j,t] = alpha + beta - logZ_t (baumwelch.jl:216-224);
* xi is computed only for edges out of the all-silent state — the only
  stochastic transitions (baumwelch.jl:226-253); its per-t normalizer (the
  logsumexp over *all* edges, baumwelch.jl:242-249) equals logZ_{t+1}
  analytically, which is how we compute it;
* new onset log-probs xb = lse_t(xi) - lse_t(gamma_silent) with the silent
  self-loop entry dropped (baumwelch.jl:254-264 `xb[2:end]`) — this sizing
  assumes a non-overlap state space, which is what the reference trains on
  (resolve_overlaps=false default, baumwelch.jl:311); we enforce it;
* mu re-estimated as the gamma-weighted average of the signal over
  single-active states only (baumwelch.jl:266-287), row 0 pinned to 0;
* one global sigma from all states (baumwelch.jl:294-307);
* pi is re-estimated as gamma[:,0] (baumwelch.jl:254) but is dead in the
  forward/Viterbi inits (dead-pi quirk) — returned for completeness.

TPU-first design: the whole E+M step is one jitted function of
(y, lp, mu, sigma) with static edge-table structure. Edge weights are
recomputed from lp *in graph* (no host round-trip, no retrace — the
reference rebuilds its edge list on the host every iteration,
baumwelch.jl:265). The reductions over T are matmuls against the posterior
matrix, which XLA tiles onto the MXU.

Memory note: this materializes alpha/beta (T, S) like the reference
(baumwelch.jl:28,79). The streaming/checkpointed variant for long T lives in
`parallel/` (linear-memory sufficient statistics).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.emission import emission_logprob, state_means
from ..core.state_space import StateSpace, build_state_space
from ..data.synthetic import create_spike_template
from ..utils.logmath import HALF_LOG_2PI, logsumexp_rows
from . import template_ops


def occ_divide(num, den):
    """Occupancy-weighted mean num/den with zero-occupancy columns mapped
    to 0 instead of NaN.

    A dying template's per-state occupancies underflow to exactly 0 in
    f32 (exp cuts off near -87, vs -745 in the reference's f64 regime)
    long before its onset-lp reaches the -70 pruning threshold; the
    resulting 0/0 template means would poison every subsequent EM
    iteration (observed: f32 MC training nan at iter 5 while f64
    converges). Zero evidence -> zero mean: the dead template carries no
    energy and remove_small prunes it, which is where the reference's
    protocol retires dead templates anyway (src/baumwelch.jl:423-432).
    """
    safe = jnp.where(den > 0, den, jnp.ones_like(den))
    return jnp.where(den > 0, num / safe, jnp.zeros_like(num * safe))


def edge_weights_from_structure(lp, n_silent, onsets, valid):
    """Edge log-probs from structural tables, differentiably in lp.

    w = n_silent * log1p(-exp(sum(lp))) + onsets @ lp for valid entries,
    -inf for padding (reference src/types.jl:94-113 semantics).
    """
    lp = jnp.asarray(lp)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    w = n_silent.astype(lp.dtype) * lpz + onsets.astype(lp.dtype) @ lp
    return jnp.where(valid, w, -jnp.inf)


@dataclasses.dataclass(frozen=True)
class EMTables:
    """Device-resident static structure for one (N, K) non-overlap topology."""

    states: jax.Array        # (N, S) int32 ring positions
    in_idx: jax.Array        # (S, D_in) int32
    in_n_silent: jax.Array   # (S, D_in) int32
    in_onsets: jax.Array     # (S, D_in, N) int8
    in_valid: jax.Array      # (S, D_in) bool
    out_idx: jax.Array       # (S, D_out) int32
    out_n_silent: jax.Array
    out_onsets: jax.Array
    out_valid: jax.Array
    onset_targets: jax.Array  # (N+1,) int32: silent self-loop target 0, then
    #                           ring-position-1 state of each neuron (the
    #                           reference's tidx edge order, baumwelch.jl:226)
    onset_n_silent: jax.Array  # (N+1,) int32 — silent-pair count per edge
    onset_onsets: jax.Array    # (N+1, N) int8 — onset indicator per edge

    @staticmethod
    def build(ss: StateSpace) -> "EMTables":
        if ss.allow_overlaps:
            raise ValueError(
                "EM training requires a non-overlap state space (the "
                "reference trains with resolve_overlaps=false, "
                "src/baumwelch.jl:311; its update mis-sizes otherwise)"
            )
        in_idx, in_nsil, in_ons, in_valid = ss.in_table_structure()
        out_idx, out_nsil, out_ons, out_valid = ss.out_table_structure()
        oe = ss.state_onset_edges()
        onset_targets = ss.edges_to[oe]
        onset_n_silent = ss.edge_n_silent[oe]
        onset_onsets = ss.edge_onsets[oe]
        return EMTables(
            states=jnp.asarray(ss.states, jnp.int32),
            in_idx=jnp.asarray(in_idx),
            in_n_silent=jnp.asarray(in_nsil),
            in_onsets=jnp.asarray(in_ons),
            in_valid=jnp.asarray(in_valid),
            out_idx=jnp.asarray(out_idx),
            out_n_silent=jnp.asarray(out_nsil),
            out_onsets=jnp.asarray(out_ons),
            out_valid=jnp.asarray(out_valid),
            onset_targets=jnp.asarray(onset_targets, jnp.int32),
            onset_n_silent=jnp.asarray(onset_n_silent, jnp.int32),
            onset_onsets=jnp.asarray(onset_onsets, jnp.int8),
        )


jax.tree_util.register_dataclass(
    EMTables,
    data_fields=[
        "states", "in_idx", "in_n_silent", "in_onsets", "in_valid",
        "out_idx", "out_n_silent", "out_onsets", "out_valid", "onset_targets",
        "onset_n_silent", "onset_onsets",
    ],
    meta_fields=[],
)


def _forward_alpha(em, in_idx, in_w):
    """(T, S) forward log-scores, dead-pi init (baumwelch.jl:25-51)."""
    def step(a, em_t):
        a = em_t + logsumexp_rows(a[in_idx] + in_w, axis=1)
        return a, a

    _, rest = jax.lax.scan(step, em[0], em[1:])
    return jnp.concatenate([em[0][None], rest], axis=0)


def _backward_beta(em, out_idx, out_w):
    """(T, S) backward log-scores (baumwelch.jl:73-98)."""
    bT = jnp.zeros_like(em[0])

    def step(b, em_next):
        b = logsumexp_rows((b + em_next)[out_idx] + out_w, axis=1)
        return b, b

    _, rest = jax.lax.scan(step, bT, em[1:], reverse=True)
    return jnp.concatenate([rest, bT[None]], axis=0)


@partial(jax.jit, static_argnames=("K", "fb_mode", "block", "fb_interpret"))
def em_step(y, lp, mu, sigma, tables: EMTables, *, K: int,
            fb_mode: str = "ring", block: int = 256,
            fb_interpret: bool = False):
    """One full EM iteration: (lp, mu, sigma) -> (lp, pi, mu, sigma, ll).

    y: (T,) signal; lp: (N,) onset log-probs; mu: (K, N) templates;
    sigma: scalar noise std. Returns the sequence log-likelihood
    logsumexp(alpha[-1]) as a convergence metric (the reference prints
    nothing; SURVEY.md §5.5 upgrades observability).

    fb_mode selects the alpha/beta engine — identical statistics up to
    logsumexp reassociation (and, for "overlap", an O(exp(-H/mixing))
    halo term far below float precision):
      "ring"    gather-free sequential scans (ops/ring_fb.py) — lowest
                total FLOPs, but a T-step serial dependency (CPU-friendly);
      "overlap" halo-window block-parallel scans
                (ops/ring_fb.ring_overlap_forward_backward) — T*(1+2H/L)
                FLOPs, B-way parallel, no S^2 operators: the fastest TPU
                path at production T;
      "blocked" log-plus block operators — ~S x more FLOPs but B-way
                parallel with exact boundary vectors;
      "gather"  generic in-edge tables (reference-shaped fallback);
      "overlap_pallas"  the halo-window engine as two fused Pallas
                kernels (ops/pallas_fb_mb.py): forward streams log-alpha
                slabs, backward accumulates every EM sufficient statistic
                in VMEM — no (T, S) or (W, B, S) tensor exists, and the
                M-step below consumes the statistics directly. Requires
                K <= 65, N <= 8, TPU backend (or fb_interpret=True).
    """
    N = tables.states.shape[0]
    if fb_mode == "overlap_pallas":
        return _em_step_overlap_pallas(y, lp, mu, sigma, tables, K=K,
                                       block=block, interpret=fb_interpret)
    G1, Gy, Gy2, xx, bb, new_pi, ll = _em_stats_xla(
        y, lp, mu, sigma, tables, K=K, fb_mode=fb_mode, block=block)
    new_lp, new_mu, new_sigma = _m_step_from_stats(
        G1, Gy, Gy2, xx[1:], bb, tables.states, mu.dtype, K, N)
    return new_lp, new_pi, new_mu, new_sigma, ll


def _em_stats_xla(y, lp, mu, sigma, tables: EMTables, *, K: int,
                  fb_mode: str, block: int):
    """E-step sufficient statistics via the XLA alpha/beta engines.

    Returns (G1, Gy, Gy2, xx, bb, pi, ll): per-state occupancy and
    first/second signal moments (linear space), the (N+1,) log-space
    onset-edge xi sums xx (index 0 = the silent self-loop) with the
    log silent-occupancy denominator bb, the log posterior at t=0, and
    the sequence ll. em_step == _m_step_from_stats over these; the
    online trainer (train/adaptive.py) blends them across chunks.
    """
    N = tables.states.shape[0]
    T = y.shape[0]

    smu = state_means(tables.states, mu)
    beta_next = g_next = ll_override = None
    if fb_mode == "ring":
        from ..ops.ring_fb import ring_backward, ring_forward

        alpha = ring_forward(y, lp, mu, sigma)         # (T, S)
        beta = ring_backward(y, lp, mu, sigma)         # (T, S)
    elif fb_mode == "overlap":
        # halo-window block-parallel engine (ops/ring_fb.py): per-window
        # constants cancel in every per-t statistic as long as alpha,
        # beta, and the normalizer at a given t come from the same window
        # — which is why the t+1 terms of xi below are read from the
        # owner window's own beta/g, not the next window's
        from ..ops.ring_fb import ring_overlap_forward_backward

        H = max(4 * K, 64)
        Lov = max(block, 4 * H)
        alpha_w, beta_w, _, ll_override = ring_overlap_forward_backward(
            y, lp, mu, sigma, L=Lov, H=H)

        S = alpha_w.shape[-1]

        def core(win, j0):
            # (W, B, S) uniform window coords -> assembled (T, S)
            return (win[j0 : j0 + Lov].transpose(1, 0, 2)
                    .reshape(-1, S)[:T])

        alpha = core(alpha_w, H)
        beta = core(beta_w, H)
        beta_next = core(beta_w, H + 1)[: T - 1]
        alpha_next = core(alpha_w, H + 1)[: T - 1]
        g_next = logsumexp_rows(alpha_next + beta_next, axis=1)
    elif fb_mode == "blocked":
        from ..ops.ring_fb import ring_blocked_forward_backward

        alpha, beta = ring_blocked_forward_backward(y, lp, mu, sigma,
                                                    L=block)
    elif fb_mode == "gather":
        em = emission_logprob(y, smu, sigma)           # (T, S)
        in_w = edge_weights_from_structure(
            lp, tables.in_n_silent, tables.in_onsets, tables.in_valid)
        out_w = edge_weights_from_structure(
            lp, tables.out_n_silent, tables.out_onsets, tables.out_valid)
        alpha = _forward_alpha(em, tables.in_idx, in_w)
        beta = _backward_beta(em, tables.out_idx, out_w)
    else:
        raise ValueError(f"unknown fb_mode {fb_mode!r}")

    ab = alpha + beta
    g = logsumexp_rows(ab, axis=1)                     # (T,) logZ_t
    log_gamma = ab - g[:, None]
    # overlap mode: lse(alpha[-1]) carries the last window's constant; the
    # exact telescoped ll comes from the engine instead
    ll = (ll_override if ll_override is not None
          else logsumexp_rows(alpha[-1], axis=-1))

    # --- transition update (silent-state out-edges only, baumwelch.jl:226-264)
    # onset edges carry the full per-edge weight: each still-silent neuron
    # contributes lpz on top of the onsetting neuron's lp (types.jl:96-107).
    onset_w = edge_weights_from_structure(
        lp, tables.onset_n_silent, tables.onset_onsets,
        jnp.ones_like(tables.onset_n_silent, dtype=bool))
    tgt = tables.onset_targets                          # (N+1,)
    # xi_e(t) = alpha[t,0] + w_e + beta[t+1,tgt_e] + em[t+1,tgt_e] - logZ_{t+1}
    # — only the onset-target emission columns are ever needed, so the
    # (T, S) emission tensor is never materialized (saves a full HBM
    # round trip per iteration at production T)
    sigma_ = jnp.asarray(sigma, y.dtype)
    em_tgt = (-HALF_LOG_2PI - jnp.log(sigma_)
              - (y[1:, None] - smu[tgt][None, :]) ** 2
              / (2.0 * sigma_ * sigma_))               # (T-1, N+1)
    if beta_next is not None:                          # overlap mode: the
        xi = (alpha[:-1, 0][:, None] + onset_w[None, :]  # t+1 terms must
              + beta_next[:, tgt] + em_tgt             # come from the SAME
              - g_next[:, None])                       # window as alpha[t]
    else:
        xi = (alpha[:-1, 0][:, None] + onset_w[None, :]
              + beta[1:, tgt] + em_tgt - g[1:, None])  # (T-1, N+1)
    xx = logsumexp_rows(xi, axis=0)                     # (N+1,)
    bb = logsumexp_rows(log_gamma[:-1, 0], axis=0)

    # --- gamma statistics: one MXU matmul [1; y; y^2] @ gamma yields the
    # occupancies and first/second moments every update below consumes
    # (the reference makes three separate T-sweeps, baumwelch.jl:266-307)
    gamma = jnp.exp(log_gamma)                          # (T, S)
    P = jnp.stack([jnp.ones_like(y), y, y * y])         # (3, T)
    M = P @ gamma                                       # (3, S)
    G1, Gy, Gy2 = M[0], M[1], M[2]
    return G1, Gy, Gy2, xx, bb, log_gamma[0], ll


def _m_step_from_stats(G1, Gy, Gy2, logX, logXd, states, mu_dtype,
                       K: int, N: int):
    """M-step from EM sufficient statistics: (lp, mu, sigma).

    logX: (N,) log onset-edge xi sums (silent self-loop excluded);
    logXd: log silent occupancy over t < T-1. Shared by em_step (one
    chunk's exact statistics), the fused-kernel path, and the online
    drift tracker (blended multi-chunk statistics) — the formulas are
    scale-invariant, so per-sample-normalized statistics update
    identically (src/baumwelch.jl:226-307 semantics)."""
    new_lp = logX - logXd                               # (N,)

    # --- template update over single-active states (baumwelch.jl:266-287)
    # non-overlap layout: state 1 + n*(K-1) + (k-1) == neuron n at ring pos
    # k, so columns 1..1+N*(K-1) of the moment matrix map to (n, k).
    nbody = N * (K - 1)
    body = occ_divide(Gy[1 : 1 + nbody],
                      G1[1 : 1 + nbody]).reshape(N, K - 1).T
    new_mu = jnp.concatenate([jnp.zeros((1, N), mu_dtype), body], axis=0)

    # --- global sigma (baumwelch.jl:294-307) from the same moments:
    # x2 = sum_tj gamma_tj (y_t - smu2_j)^2
    smu2 = state_means(states, new_mu)
    x2 = jnp.sum(Gy2) - 2.0 * jnp.dot(smu2, Gy) + jnp.dot(smu2 * smu2, G1)
    qq = jnp.sum(G1)
    new_sigma = jnp.sqrt(x2 / qq)
    return new_lp, new_mu, new_sigma


@partial(jax.jit,
         static_argnames=("K", "n_iters", "fb_mode", "block", "fb_interpret"))
def em_chain(y, lp, mu, sigma, tables: EMTables, *, K: int, n_iters: int,
             fb_mode: str = "ring", block: int = 256,
             fb_interpret: bool = False):
    """`n_iters` EM iterations as ONE compiled program (lax.scan over the
    em_step body): a single dispatch covers the whole phase, so per-call
    host/link latency — which dwarfs the ~4 ms fused-kernel iteration on
    remote-attached devices — is paid once instead of per iteration.
    Returns (lp, pi, mu, sigma, lls) with lls the (n_iters,) per-iteration
    ll history; identical to n_iters chained em_step calls (tested)."""

    def body(carry, _):
        lp_c, mu_c, sg_c = carry
        nlp, pi, nmu, nsg, ll = em_step(y, lp_c, mu_c, sg_c, tables, K=K,
                                        fb_mode=fb_mode, block=block,
                                        fb_interpret=fb_interpret)
        return (nlp, nmu, nsg), (ll, pi)

    (lp, mu, sigma), (lls, pis) = jax.lax.scan(
        body, (jnp.asarray(lp), jnp.asarray(mu), jnp.asarray(sigma)),
        None, length=n_iters)
    return lp, pis[-1], mu, sigma, lls


def pallas_em_geometry(K: int, block: int) -> tuple[int, int]:
    """(L, H) for the fused-kernel halo windows: the usual overlap-mode
    sizes (H = max(4K, 64), L = max(block, 4H)) rounded up so the window
    W = L + 2H divides the kernel chunk (H to 16, L to 32). H only sets
    the mixing margin, so the rounding is statistics-neutral."""
    H = max(4 * K, 64)
    H = -(-H // 16) * 16
    L = max(block, 4 * H)
    L = -(-L // 32) * 32
    return L, H


def _em_step_overlap_pallas(y, lp, mu, sigma, tables: EMTables, *, K: int,
                            block: int, interpret: bool):
    """EM iteration from the fused-kernel sufficient statistics
    (ops/pallas_fb_mb.py) — the same M-step formulas as the materialized
    path (src/baumwelch.jl:226-307 semantics), fed by linear-space
    per-state statistics instead of (T, S) posteriors."""
    from ..ops.pallas_fb_mb import overlap_em_stats_pallas
    from ..ops.ring_fb import _emission_fns, _flat

    N = tables.states.shape[0]
    dtype = mu.dtype
    L, H = pallas_em_geometry(K, block)
    G1, Gy, Gy2, X, Xd, beta0, ll = overlap_em_stats_pallas(
        y, lp, mu, sigma, L=L, H=H, interpret=interpret)

    # pi = gamma[:, 0]: forward init is emission-only (dead-pi quirk), so
    # alpha_0 is one emission row; beta_0 comes from the kernel
    mu32 = mu.astype(jnp.float32)
    es0, eb0 = _emission_fns(mu32, jnp.asarray(sigma, jnp.float32))(
        jnp.asarray(y[0], jnp.float32))
    alpha0 = _flat(es0, eb0)
    g0 = jax.nn.logsumexp(alpha0 + beta0)
    new_pi = (alpha0 + beta0 - g0).astype(dtype)

    # shared M-step over the kernel's linear statistics (the onset update
    # log(X) - log(Xd) == lse_t(xi) - lse_t(log_gamma_silent) of the
    # materialized path)
    new_lp, new_mu, new_sigma = _m_step_from_stats(
        G1, Gy, Gy2, jnp.log(X), jnp.log(Xd), tables.states, jnp.float32,
        K, N)
    return (new_lp.astype(dtype), new_pi, new_mu.astype(dtype),
            new_sigma.astype(dtype), ll.astype(dtype))


@partial(jax.jit, static_argnames=("K", "fb_mode", "block", "fb_interpret"))
def em_chunk_stats(y, lp, mu, sigma, tables: EMTables, *, K: int,
                   fb_mode: str = "ring", block: int = 256,
                   fb_interpret: bool = False):
    """Linear-space EM sufficient statistics of one signal chunk.

    Returns (G1, Gy, Gy2, X, Xd, ll): per-state occupancy and
    first/second signal moments, the (N,) onset-edge expected counts X
    (silent self-loop excluded) with the silent-occupancy denominator
    Xd, and the chunk ll. All linear space, so statistics from
    different chunks ADD (and convex-combine) — the interface the online
    drift tracker (train/adaptive.py) blends with exponential
    forgetting. em_step == _m_step_from_stats over one chunk's
    statistics (tested). Same fb_mode ladder as em_step.
    """
    if fb_mode == "overlap_pallas":
        from ..ops.pallas_fb_mb import overlap_em_stats_pallas

        L, H = pallas_em_geometry(K, block)
        G1, Gy, Gy2, X, Xd, _beta0, ll = overlap_em_stats_pallas(
            y, lp, mu, sigma, L=L, H=H, interpret=fb_interpret)
        return G1, Gy, Gy2, X, Xd, ll
    G1, Gy, Gy2, xx, bb, _pi, ll = _em_stats_xla(
        y, lp, mu, sigma, tables, K=K, fb_mode=fb_mode, block=block)
    return G1, Gy, Gy2, jnp.exp(xx[1:]), jnp.exp(bb), ll


def init_templates(K: int, N: int, sigma: float, rng: np.random.Generator):
    """Random template init (reference src/baumwelch.jl:313-321):
    create_spike_template(K, 3*sigma*U, 0.5 + 0.1*randn, 1.5*U), row 0 = 0."""
    mu = np.ones((K, N))
    for i in range(N):
        mu[:, i] = create_spike_template(
            K,
            3.0 * sigma * rng.random(),
            0.5 + 0.1 * rng.standard_normal(),
            1.5 * rng.random(),
        )
    mu[0, :] = 0.0
    return mu


@dataclasses.dataclass
class TrainResult:
    """Outcome of `train_model`: the learned template model pieces."""

    lp: np.ndarray      # (N,) onset log-probs
    pi: np.ndarray      # (S,) initial log-distribution (dead in decode)
    mu: np.ndarray      # (K, N) templates
    sigma: float
    n_neurons: int
    K: int
    ll_history: list


def _em_phase(y, lp, mu, sigma, nsteps, K, *, dtype, verbose=0, callback=None,
              metrics=None, checkpoint_dir=None, phase="train",
              fb_mode=None):
    """Run `nsteps` EM iterations on a fixed topology."""
    import time as _time

    block = 256
    if fb_mode is None:
        # serial scans are latency-bound on accelerators; block-parallel
        # engines are wasted FLOPs on CPU. The fused Mosaic kernels
        # lower only on TPU (utils/platform.is_tpu_backend handles
        # plugin registrations like "axon"); other accelerators get the
        # XLA overlap engine.
        from ..utils.platform import is_tpu_backend

        if jax.default_backend() == "cpu":
            fb_mode = "ring"
        else:
            from ..ops.pallas_fb_mb import KP as _KP

            N_ = mu.shape[1]
            Lpk, _ = pallas_em_geometry(K, 2048)
            Hov = max(4 * K, 64)
            Lov = max(2048, 4 * Hov)
            if (K - 1 <= _KP and 0 < N_ <= 8 and len(y) >= 2 * Lpk
                    and is_tpu_backend()):
                fb_mode = "overlap_pallas"
            elif len(y) >= 2 * Lov:
                fb_mode = "overlap"
            else:
                fb_mode = "blocked"
    if fb_mode in ("overlap", "overlap_pallas"):
        block = 2048
    N = mu.shape[1]
    lls = []
    if N == 0:
        return lp, np.zeros(1), mu, sigma, lls
    ss = build_state_space(N, K, False)
    tables = EMTables.build(ss)
    y = jnp.asarray(y, dtype)
    lp_d = jnp.asarray(lp, dtype)
    mu_d = jnp.asarray(mu, dtype)
    sigma_d = jnp.asarray(sigma, dtype)
    pi_d = None
    # per-iteration host syncs (float(ll) etc.) cost a device round-trip
    # each — only pay them when the caller wants per-iteration output
    eager = verbose > 0 or metrics is not None or checkpoint_dir is not None
    if not eager and callback is None and nsteps > 0:
        # no per-iteration host output wanted: run the whole phase as one
        # compiled program (one dispatch instead of nsteps round trips)
        lp_d, pi_d, mu_d, sigma_d, lls_dev = em_chain(
            y, lp_d, mu_d, sigma_d, tables, K=K, n_iters=nsteps,
            fb_mode=fb_mode, block=block)
        lls = [float(v) for v in np.asarray(lls_dev)]
        return (np.asarray(lp_d), np.asarray(pi_d), np.asarray(mu_d),
                float(sigma_d), lls)
    ll_devs = []
    for i in range(nsteps):
        if callback is not None:
            callback(np.asarray(mu_d))
        t0 = _time.perf_counter()
        lp_d, pi_d, mu_d, sigma_d, ll = em_step(
            y, lp_d, mu_d, sigma_d, tables, K=K, fb_mode=fb_mode,
            block=block)
        if not eager:
            ll_devs.append(ll)
            continue
        lls.append(float(ll))
        elapsed = _time.perf_counter() - t0
        if verbose > 0:
            print(f"  EM iter {i}: ll={lls[-1]:.2f} sigma={float(sigma_d):.4f}")
        if metrics is not None:
            metrics.em_iter(i, lls[-1], float(sigma_d), np.asarray(lp_d),
                            elapsed, len(y))
        if checkpoint_dir is not None:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(
                f"{checkpoint_dir}/em_latest.npz", lp=np.asarray(lp_d),
                mu=np.asarray(mu_d), sigma=float(sigma_d), em_iter=i,
                phase=phase, ll_history=lls)
    if not eager:
        lls = [float(v) for v in ll_devs]
    if pi_d is None:
        # nsteps == 0 (e.g. train_model(nsteps=1)'s second phase of
        # nsteps//2): no E-step produced a posterior — keep the
        # reference's uniform init instead of an object-array None
        S = tables.states.shape[1]
        pi_d = jnp.full((S,), -np.log(S), dtype)
    return (np.asarray(lp_d), np.asarray(pi_d), np.asarray(mu_d),
            float(sigma_d), lls)


def train_model(
    y,
    n_neurons=None,
    K=None,
    nsteps=None,
    *,
    p0: float | None = None,
    rng: np.random.Generator | None = None,
    dtype=jnp.float64,
    verbose: int = 0,
    callback=None,
    condense_alpha=None,
    sparse_lp0=None,
    small_alpha=None,
    fb_mode: str | None = None,
    metrics=None,
    checkpoint_dir: str | None = None,
    config=None,
) -> TrainResult:
    """Full training driver (reference src/baumwelch.jl:311-354):

    nsteps EM iterations -> condense (merge duplicates, chi^2 alpha=0.05) ->
    remove_sparse (onset lp <= -70) -> remove_small (template energy vs
    chi^2(K-1) noise) -> nsteps//2 more EM iterations.

    `config` (a config.Config) supplies defaults for any kwarg not passed
    explicitly (SURVEY.md §5.6); None means "not passed" for every kwarg
    here (p0=None already meant "derive the reference default").
    """
    from ..config import UNSET, _section, pick

    mc, tc = _section(config, "model"), _section(config, "train")

    def arg(v, cfg_get, field, default):
        return pick(UNSET if v is None else v, cfg_get(field), default)

    n_neurons = arg(n_neurons, mc, "n_neurons", 3)
    K = arg(K, mc, "K", 60)
    nsteps = arg(nsteps, tc, "nsteps", 8)
    p0 = arg(p0, tc, "p0", None)
    condense_alpha = arg(condense_alpha, tc, "condense_alpha", 0.05)
    sparse_lp0 = arg(sparse_lp0, tc, "sparse_lp0", -70.0)
    small_alpha = arg(small_alpha, tc, "small_alpha", 0.05)
    fb_mode = arg(fb_mode, tc, "fb_mode", None)

    if rng is None:
        rng = np.random.default_rng()
    y = np.asarray(y, dtype=np.float64)
    if p0 is None:
        p0 = 2.0 ** (-3.0 * K / 2.0)  # reference default, baumwelch.jl:311
    sigma = float(np.std(y))
    lp = np.log(np.full(n_neurons, p0))
    mu = init_templates(K, n_neurons, sigma, rng)
    ll_hist = []

    lp, pi, mu, sigma, lls = _em_phase(
        y, lp, mu, sigma, nsteps, K, dtype=dtype, verbose=verbose,
        callback=callback, metrics=metrics, checkpoint_dir=checkpoint_dir,
        phase="em1", fb_mode=fb_mode)
    ll_hist += lls

    # --- template surgery (host-side, reference baumwelch.jl:338-348)
    mu, lp = template_ops.condense_templates(mu, lp, sigma, condense_alpha,
                                             verbose=verbose)
    if verbose > 0:
        print(f"{mu.shape[1]} templates remain after merging")
    keep = template_ops.remove_sparse(lp, sparse_lp0)
    mu, lp = mu[:, keep], lp[keep]
    if verbose > 0:
        print(f"{mu.shape[1]} templates remain after removing sparse")
    keep = template_ops.remove_small(mu, sigma, small_alpha)
    mu, lp = mu[:, keep], lp[keep]
    if verbose > 0:
        print(f"{mu.shape[1]} templates remain after removing small")

    lp, pi, mu, sigma, lls = _em_phase(
        y, lp, mu, sigma, nsteps // 2, K, dtype=dtype, verbose=verbose,
        metrics=metrics, checkpoint_dir=checkpoint_dir, phase="em2",
        fb_mode=fb_mode)
    ll_hist += lls

    return TrainResult(lp=lp, pi=pi, mu=mu, sigma=sigma,
                       n_neurons=mu.shape[1], K=K, ll_history=ll_hist)
