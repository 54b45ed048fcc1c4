"""Multi-channel Baum-Welch training — a capability extension beyond the
reference (whose training pipeline is channel-1-only, src/hmmsort.jl:56):
learn per-channel templates mu (K, N, C) and per-channel noise sigmas (C,)
from a (T, C) multi-electrode recording.

The combined-state topology is channel-independent, so every structural
piece is shared with the single-channel EM (train/em.py, reference
src/baumwelch.jl:205-309 semantics): the same EMTables, the same
transition M-step, the same dead-pi forward init. Only the emission and
the moment/M-step shapes change:

  * emission: the factorized MC streams (core/emission_mc.py) — state 0
    reads es(t), state (n, k) reads es(t) + d[t, n, k] - c1[n, k]; on the
    non-overlap training space that is a (T, S) stack of the streams, one
    (T, C) x (C, N*(K-1)) MXU matmul plus static tables, never a
    (T, S, C) tensor;
  * moments: one (1 + 2C, T) x (T, S) matmul [1; y_c...; y_c^2...] @ gamma
    gives the occupancies and per-channel first/second moments;
  * M-step: mu[k, n, c] = Gy[c, col] / G1[col] (the reference's
    occupancy-weighted mean, per channel), sigma_c^2 = per-channel
    quadratic residual over the same moments. Row 0 of mu stays 0 per
    channel (the reference's silent-mean convention,
    src/baumwelch.jl:266-287).

With C = 1 the update equals train/em.py's em_step exactly up to float
reassociation of the expanded emission square (tested at f64 ~1e-9).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state_space import build_state_space
from ..utils.logmath import HALF_LOG_2PI, logsumexp_rows
from .em import (EMTables, _backward_beta, _forward_alpha,
                 edge_weights_from_structure, init_templates,
                 occ_divide)


def _mc_streams_dense(yc, mu, sigmas):
    """Factorized MC emission streams: (es (T,), body (T, N*(K-1))).

    body column layout [(n, k) n-major] — the same layout as
    core/state_space.py's non-overlap enumeration, so the shared EMTables
    index tables apply unchanged. The table constants
    (core/emission_mc.MCTables semantics) are computed IN-GRAPH here —
    mu/sigmas are EM-loop carries (tracers under em_chain_mc's scan), not
    trace-time constants.
    """
    dtype = yc.dtype
    mu = mu.astype(dtype)
    sigmas = sigmas.astype(dtype)
    inv2 = 1.0 / (2.0 * sigmas * sigmas)                # (C,)
    zscale = 1.0 / (sigmas * sigmas)
    silent_sum = jnp.sum(mu[0], axis=0)                 # (C,)
    u_const = jnp.sum(-HALF_LOG_2PI - jnp.log(sigmas))
    b_sil = jnp.sum(silent_sum * silent_sum * inv2)
    other = silent_sum[None, :] - mu[0]                 # (N, C)
    sm = mu[1:].transpose(1, 0, 2) + other[:, None, :]  # (N, Km1, C)
    c1 = jnp.sum(sm * sm * inv2, axis=-1)               # (N, Km1)
    dmu = mu[1:] - mu[0][None]                          # (Km1, N, C)
    delta = dmu.transpose(2, 1, 0).reshape(mu.shape[2], -1)   # (C, N*Km1)

    z = yc * zscale                                     # (T, C)
    base = z @ silent_sum                               # (T,)
    u = u_const - 0.5 * jnp.sum(yc * z, axis=-1)
    es = u + base - b_sil
    d = jnp.matmul(z, delta, precision=jax.lax.Precision.HIGHEST)
    body = es[:, None] + d - c1.reshape(-1)[None, :]    # (T, N*Km1)
    return es, body


def _mc_emission_dense(yc, mu, sigmas):
    """(T, S) non-overlap-space MC emission (S = 1 + N*(K-1)), stacked
    from the factorized streams."""
    es, body = _mc_streams_dense(yc, mu, sigmas)
    return jnp.concatenate([es[:, None], body], axis=1)


def _em_step_overlap_pallas_mc(yc, lp, mu, sigmas, tables: EMTables, *,
                               K: int, block: int, interpret: bool):
    """MC EM iteration from the fused-kernel sufficient statistics
    (ops/pallas_fb_mb.overlap_em_stats_pallas_mc) — the same M-step
    formulas as em_step_mc's materialized path, fed by linear-space
    per-state/per-channel statistics. The emission streams are computed
    in-graph (mu/sigmas are loop carries)."""
    from ..ops.pallas_fb_mb import overlap_em_stats_pallas_mc
    from .em import pallas_em_geometry

    N = tables.states.shape[0]
    dtype = jnp.asarray(lp).dtype
    T, C = yc.shape
    L, H = pallas_em_geometry(K, block)
    yc32 = jnp.asarray(yc, jnp.float32)
    es_s, body_s = _mc_streams_dense(yc32, jnp.asarray(mu, jnp.float32),
                                     jnp.asarray(sigmas, jnp.float32))
    eb = body_s.reshape(T, N, K - 1)
    G1, Gy, Gy2, X, Xd, beta0, ll = overlap_em_stats_pallas_mc(
        es_s, eb, yc32, jnp.asarray(lp, jnp.float32), L=L, H=H,
        interpret=interpret)

    # pi = gamma[:, 0]: forward init is emission-only (dead-pi quirk)
    alpha0 = jnp.concatenate([es_s[0:1], body_s[0]])
    g0 = jax.nn.logsumexp(alpha0 + beta0)
    new_pi = (alpha0 + beta0 - g0).astype(dtype)

    # shared M-step over the kernel's linear statistics
    new_lp, new_mu, new_sigmas = _m_step_from_stats_mc(
        G1, Gy, Gy2, jnp.log(X), jnp.log(Xd), jnp.float32, K, N, C)
    return (new_lp.astype(dtype), new_pi, new_mu.astype(dtype),
            new_sigmas.astype(dtype), ll.astype(dtype))


def _m_step_from_stats_mc(G1, Gy, Gy2, logX, logXd, mu_dtype,
                          K: int, N: int, C: int):
    """MC M-step from EM sufficient statistics: (lp, mu (K, N, C),
    sigmas (C,)). The multi-channel mirror of train/em._m_step_from_stats
    (per-channel first/second moments Gy/Gy2 (C, S)); shared by
    em_step_mc, the fused-kernel path, and the online drift tracker
    (train/adaptive.track_drift_mc) — scale-invariant, so blended
    per-sample-normalized statistics update identically."""
    new_lp = logX - logXd

    # per-channel template update over single-active states
    nbody = N * (K - 1)
    body = occ_divide(Gy[:, 1 : 1 + nbody],
                      G1[None, 1 : 1 + nbody])  # (C, N*(K-1))
    body = body.reshape(C, N, K - 1).transpose(2, 1, 0)        # (K-1, N, C)
    new_mu = jnp.concatenate(
        [jnp.zeros((1, N, C), mu_dtype), body], axis=0)        # (K, N, C)

    # per-channel sigma from the same moments (silent mean = 0 per
    # channel, laid out exactly like the moment columns)
    smu_c = jnp.concatenate(
        [jnp.zeros((1, C), mu_dtype),
         new_mu[1:].transpose(1, 0, 2).reshape(nbody, C)], axis=0)  # (S, C)
    x2 = (jnp.sum(Gy2, axis=1) - 2.0 * jnp.sum(smu_c.T * Gy, axis=1)
          + (smu_c * smu_c).T @ G1)                     # (C,)
    new_sigmas = jnp.sqrt(x2 / jnp.sum(G1))
    return new_lp, new_mu, new_sigmas


@partial(jax.jit, static_argnames=("K", "fb_mode", "block", "fb_interpret"))
def em_step_mc(yc, lp, mu, sigmas, tables: EMTables, *, K: int,
               fb_mode: str = "gather", block: int = 2048,
               fb_interpret: bool = False):
    """One multi-channel EM iteration:
    (lp, pi, mu (K, N, C), sigmas (C,)) <- (lp, mu, sigmas) plus ll.

    yc: (T, C) recording. Same contracts as train/em.py's em_step.
    fb_mode selects the alpha/beta engine:
      "gather"  the generic in-edge scans over the dense (T, S) MC
                emission (S = 1 + N*(K-1) stays small) — the f64/CPU
                parity engine;
      "overlap" halo-window block-parallel scans over the factorized
                streams (ops/ring_fb.ring_overlap_forward_backward_mc)
                — B-way parallel, the TPU path at production T; same
                halo/constant-cancellation argument as the
                single-channel fb_mode="overlap" (train/em.em_step);
      "overlap_pallas"  the halo-window engine as the two fused Pallas
                kernels with stream emissions and per-channel moment
                accumulation (ops/pallas_fb_mb, stream_em=True) — the
                production TPU mode; requires K <= 65, N <= 8 (or
                fb_interpret=True off-TPU).
    """
    yc = jnp.asarray(yc)
    N = tables.states.shape[0]
    C = yc.shape[1]
    if fb_mode == "overlap_pallas":
        return _em_step_overlap_pallas_mc(yc, lp, mu, sigmas, tables, K=K,
                                          block=block,
                                          interpret=fb_interpret)
    G1, Gy, Gy2, xx, bb, new_pi, ll = _em_stats_xla_mc(
        yc, lp, mu, sigmas, tables, K=K, fb_mode=fb_mode, block=block)
    new_lp, new_mu, new_sigmas = _m_step_from_stats_mc(
        G1, Gy, Gy2, xx[1:], bb, jnp.asarray(lp).dtype, K, N, C)
    return new_lp, new_pi, new_mu, new_sigmas, ll


def _em_stats_xla_mc(yc, lp, mu, sigmas, tables: EMTables, *, K: int,
                     fb_mode: str, block: int):
    """MC E-step sufficient statistics via the XLA alpha/beta engines —
    the multi-channel mirror of train/em._em_stats_xla. Returns
    (G1 (S,), Gy (C, S), Gy2 (C, S), xx (N+1,), bb, pi, ll); xx/bb log
    space (xx index 0 = the silent self-loop)."""
    dtype = jnp.asarray(lp).dtype
    T, C = yc.shape
    N = tables.states.shape[0]

    es_s, body_s = _mc_streams_dense(yc.astype(dtype), jnp.asarray(mu),
                                     jnp.asarray(sigmas))
    em = jnp.concatenate([es_s[:, None], body_s], axis=1)     # (T, S)
    beta_next = g_next = ll_override = None
    if fb_mode == "overlap":
        from ..ops.ring_fb import ring_overlap_forward_backward_mc

        H = max(4 * K, 64)
        Lov = max(block, 4 * H)
        alpha_w, beta_w, ll_override = ring_overlap_forward_backward_mc(
            es_s, body_s.reshape(T, N, K - 1), lp, L=Lov, H=H)
        S = alpha_w.shape[-1]

        def core(win, j0):
            # (W, B, S) uniform window coords -> assembled (T, S); the
            # t and t+1 xi terms must come from the SAME window
            return (win[j0 : j0 + Lov].transpose(1, 0, 2)
                    .reshape(-1, S)[:T])

        alpha = core(alpha_w, H)
        beta = core(beta_w, H)
        beta_next = core(beta_w, H + 1)[: T - 1]
        alpha_next = core(alpha_w, H + 1)[: T - 1]
        g_next = logsumexp_rows(alpha_next + beta_next, axis=1)
    elif fb_mode == "gather":
        in_w = edge_weights_from_structure(
            lp, tables.in_n_silent, tables.in_onsets, tables.in_valid)
        out_w = edge_weights_from_structure(
            lp, tables.out_n_silent, tables.out_onsets, tables.out_valid)
        alpha = _forward_alpha(em, tables.in_idx, in_w)
        beta = _backward_beta(em, tables.out_idx, out_w)
    else:
        raise ValueError(f"unknown fb_mode {fb_mode!r}")

    ab = alpha + beta
    g = logsumexp_rows(ab, axis=1)                      # (T,)
    log_gamma = ab - g[:, None]
    # overlap mode: lse(alpha[-1]) carries the last window's constant;
    # the exact telescoped ll comes from the engine instead
    ll = (ll_override if ll_override is not None
          else logsumexp_rows(alpha[-1], axis=-1))

    # --- transition update (shared topology; baumwelch.jl:226-264)
    onset_w = edge_weights_from_structure(
        lp, tables.onset_n_silent, tables.onset_onsets,
        jnp.ones_like(tables.onset_n_silent, dtype=bool))
    tgt = tables.onset_targets                          # (N+1,)
    if beta_next is not None:                           # overlap mode: the
        xi = (alpha[:-1, 0][:, None] + onset_w[None, :]  # t+1 terms come
              + beta_next[:, tgt] + em[1:, tgt]          # from the owner
              - g_next[:, None])                         # window
    else:
        xi = (alpha[:-1, 0][:, None] + onset_w[None, :]
              + beta[1:, tgt] + em[1:, tgt] - g[1:, None])  # (T-1, N+1)
    xx = logsumexp_rows(xi, axis=0)
    bb = logsumexp_rows(log_gamma[:-1, 0], axis=0)

    # --- per-channel gamma moments: [1; y_c; y_c^2] rows in ONE matmul
    gamma = jnp.exp(log_gamma)                          # (T, S)
    P = jnp.concatenate([jnp.ones((1, T), dtype), yc.T.astype(dtype),
                         (yc * yc).T.astype(dtype)], axis=0)   # (1+2C, T)
    M = P @ gamma                                       # (1+2C, S)
    G1, Gy, Gy2 = M[0], M[1 : 1 + C], M[1 + C :]        # (S,), (C, S) x2
    return G1, Gy, Gy2, xx, bb, log_gamma[0], ll


@partial(jax.jit, static_argnames=("K", "fb_mode", "block", "fb_interpret"))
def em_chunk_stats_mc(yc, lp, mu, sigmas, tables: EMTables, *, K: int,
                      fb_mode: str = "gather", block: int = 2048,
                      fb_interpret: bool = False):
    """Linear-space MC EM sufficient statistics of one (T, C) chunk —
    the multi-channel mirror of train/em.em_chunk_stats (and the online
    drift tracker's blending interface). Returns (G1, Gy, Gy2, X, Xd,
    ll) with X (N,) the onset-edge expected counts (silent self-loop
    excluded); em_step_mc == _m_step_from_stats_mc over one chunk's
    statistics (tested)."""
    if fb_mode == "overlap_pallas":
        from ..ops.pallas_fb_mb import overlap_em_stats_pallas_mc
        from .em import pallas_em_geometry

        T, C = yc.shape
        N = tables.states.shape[0]
        L, H = pallas_em_geometry(K, block)
        yc32 = jnp.asarray(yc, jnp.float32)
        es_s, body_s = _mc_streams_dense(
            yc32, jnp.asarray(mu, jnp.float32),
            jnp.asarray(sigmas, jnp.float32))
        G1, Gy, Gy2, X, Xd, _beta0, ll = overlap_em_stats_pallas_mc(
            es_s, body_s.reshape(T, N, K - 1), yc32,
            jnp.asarray(lp, jnp.float32), L=L, H=H,
            interpret=fb_interpret)
        return G1, Gy, Gy2, X, Xd, ll
    G1, Gy, Gy2, xx, bb, _pi, ll = _em_stats_xla_mc(
        jnp.asarray(yc), lp, mu, sigmas, tables, K=K, fb_mode=fb_mode,
        block=block)
    return G1, Gy, Gy2, jnp.exp(xx[1:]), jnp.exp(bb), ll


@partial(jax.jit, static_argnames=("K", "n_iters", "fb_mode", "block",
                                   "fb_interpret"))
def em_chain_mc(yc, lp, mu, sigmas, tables: EMTables, *, K: int,
                n_iters: int, fb_mode: str = "gather", block: int = 2048,
                fb_interpret: bool = False):
    """n_iters multi-channel EM iterations as ONE compiled program (the MC
    mirror of train/em.em_chain). Returns (lp, pi, mu, sigmas, lls)."""

    def body(carry, _):
        lp_c, mu_c, sg_c = carry
        nlp, pi, nmu, nsg, ll = em_step_mc(yc, lp_c, mu_c, sg_c, tables,
                                           K=K, fb_mode=fb_mode,
                                           block=block,
                                           fb_interpret=fb_interpret)
        return (nlp, nmu, nsg), (ll, pi)

    (lp, mu, sigmas), (lls, pis) = jax.lax.scan(
        body, (jnp.asarray(lp), jnp.asarray(mu), jnp.asarray(sigmas)),
        None, length=n_iters)
    return lp, pis[-1], mu, sigmas, lls


# --- multi-channel template surgery: the reference's merge/prune protocol
# (src/baumwelch.jl:423-514) generalized by whitening each channel by its
# noise std — alignment shifts stay time-only, statistics sum over channels.


def _best_overlap_mc(w1, w2):
    """Best time alignment of two (K, C) whitened waveforms by summed
    cross-correlation (the C-channel generalization of
    template_ops.find_best_overlap)."""
    from .template_ops import _alignment_shifts

    K = w1.shape[0]
    best = (np.arange(K), np.arange(K))
    xm = -np.inf
    for idx1, idx2 in _alignment_shifts(K):
        x = float(np.sum(w1[idx1] * w2[idx2]))
        if x > xm:
            xm = x
            best = (idx1, idx2)
    return best, xm


def condense_templates_mc(mu, lp, sigmas, alpha: float = 0.05, *,
                          verbose: int = 0):
    """Greedy duplicate merge for (K, N, C) templates: a pair merges when
    the per-channel-whitened aligned difference is chi^2-compatible with
    noise (dof = overlap_len * C - 1); the merged waveform follows the
    reference fill rule per channel (src/baumwelch.jl:446-478)."""
    from ..utils.stats import chi2_sf

    mu = np.asarray(mu, np.float64)
    lp = np.asarray(lp, np.float64)
    sigmas = np.asarray(sigmas, np.float64)
    K, _, C = mu.shape
    while mu.shape[1] > 1:
        N = mu.shape[1]
        wh = mu / sigmas[None, None, :]
        best = None
        for i1 in range(N - 1):
            for i2 in range(i1 + 1, N):
                (idx1, idx2), _ = _best_overlap_mc(wh[:, i1], wh[:, i2])
                d = wh[idx1, i1] - wh[idx2, i2]
                x = float(np.sum(d * d))
                n = len(idx1) * C
                pval = 0.0 if len(idx1) < 5 else chi2_sf(x, n - 1)
                if pval > alpha and (best is None or x > best[2]):
                    best = (i1, i2, x, (idx1, idx2))
        if best is None:
            break
        i1, i2, stat, (idx1, idx2) = best
        if verbose > 1:
            print(f"Merging MC templates {i1} and {i2} (chi^2 {stat:.2f})")
        merged = np.zeros((K, C))
        merged[idx1] = 0.5 * mu[idx1, i1]
        merged[idx2] = 0.5 * mu[idx2, i2]
        keep = [j for j in range(N) if j not in (i1, i2)]
        mu = np.stack([merged] + [mu[:, j] for j in keep], axis=1)
        lp_m = np.logaddexp(np.log(0.5) + lp[i1], np.log(0.5) + lp[i2])
        lp = np.concatenate([[lp_m], lp[keep]])
    return mu, lp


def remove_small_mc(mu, sigmas, alpha: float = 0.05):
    """Indices of MC templates whose whitened energy is significant vs
    chi^2(C*(K-1)) noise (reference src/baumwelch.jl:423-432, summed over
    channels; dof excludes the zero row per channel)."""
    from ..utils.stats import chi2_sf

    mu = np.asarray(mu, np.float64)
    sigmas = np.asarray(sigmas, np.float64)
    K, _, C = mu.shape
    z = np.sum(mu * mu / (sigmas * sigmas)[None, None, :], axis=(0, 2))
    pvals = chi2_sf(z, C * (K - 1))
    return np.nonzero(pvals < alpha)[0]


def init_templates_mc(K: int, N: int, C: int, sigmas,
                      rng: np.random.Generator):
    """Random per-channel template init: one reference-style random
    waveform per (neuron, channel) (train/em.init_templates per channel),
    row 0 = 0 everywhere."""
    sigmas = np.asarray(sigmas, np.float64)
    mu = np.stack([init_templates(K, N, float(sigmas[c]), rng)
                   for c in range(C)], axis=2)
    return mu



def auto_fb_mode_mc(T: int, K: int, N: int, C: int, block: int = 2048):
    """The MC training engine auto-selection rule, shared by
    train_model_mc and models.multichannel.refit_template_model_mc (the
    checkpoint-recovery path) so the two cannot diverge: fused Mosaic
    kernels only on a TPU backend AND when the per-channel accumulators
    fit VMEM; XLA halo windows otherwise; the gather parity engine for
    CPU or signals too short for two halo windows."""
    from ..ops.pallas_fb_mb import overlap_em_mc_vmem_ok
    from ..utils.platform import is_tpu_backend

    H = max(4 * K, 64)
    Lov = max(block, 4 * H)
    long_enough = T >= 2 * (Lov + 2 * H)
    if long_enough and jax.default_backend() != "cpu":
        return ("overlap_pallas"
                if K <= 65 and N <= 8 and is_tpu_backend()
                and overlap_em_mc_vmem_ok(N, K, C)
                else "overlap")
    return "gather"

def train_model_mc(yc, n_neurons: int = 3, K: int = 60, nsteps: int = 8, *,
                   p0: float | None = None,
                   rng: np.random.Generator | None = None,
                   dtype=jnp.float64, verbose: int = 0,
                   condense_alpha: float = 0.05, sparse_lp0: float = -70.0,
                   small_alpha: float = 0.05, fb_mode: str | None = None,
                   block: int = 2048, callback=None, metrics=None,
                   checkpoint_dir: str | None = None):
    """Multi-channel training driver — the reference protocol
    (src/baumwelch.jl:311-354: EM -> condense -> remove_sparse ->
    remove_small -> EM/2) on a (T, C) recording, learning per-channel
    templates and noise.

    Returns an HMMTemplateModelMC plus the ll history, mirroring
    train/em.train_model's TrainResult fields (template model, pi, lls).

    fb_mode=None auto-selects the alpha/beta engine: "overlap" (the
    halo-window block-parallel engine over the factorized streams) on
    non-CPU backends when the recording spans enough windows, else
    "gather" (the f64 parity engine, right for CPU and short signals).
    """
    from ..models.multichannel import HMMTemplateModelMC
    from .template_ops import remove_sparse

    if rng is None:
        rng = np.random.default_rng()
    yc = np.asarray(yc, np.float64)
    T, C = yc.shape
    if fb_mode is None:
        fb_mode = auto_fb_mode_mc(T, K, n_neurons, C, block)
    if p0 is None:
        p0 = 2.0 ** (-3.0 * K / 2.0)          # reference baumwelch.jl:311
    sigmas = yc.std(axis=0)
    lp = np.log(np.full(n_neurons, p0))
    mu = init_templates_mc(K, n_neurons, C, sigmas, rng)
    ll_hist = []

    import time as _time

    eager = (verbose > 0 or metrics is not None or checkpoint_dir is not None
             or callback is not None)

    def phase(lp, mu, sigmas, steps, name="em"):
        if steps <= 0 or mu.shape[1] == 0:
            return lp, None, mu, sigmas, []
        ss = build_state_space(mu.shape[1], K, False)
        tables = EMTables.build(ss)
        lp_d = jnp.asarray(lp, dtype)
        mu_d = jnp.asarray(mu, dtype)
        sg_d = jnp.asarray(sigmas, dtype)
        yc_d = jnp.asarray(yc, dtype)
        if not eager:
            # one compiled program for the whole phase (one dispatch)
            lp_d, pi, mu_d, sg_d, lls = em_chain_mc(
                yc_d, lp_d, mu_d, sg_d, tables, K=K, n_iters=steps,
                fb_mode=fb_mode, block=block)
            return (np.asarray(lp_d), np.asarray(pi), np.asarray(mu_d),
                    np.asarray(sg_d), [float(v) for v in np.asarray(lls)])
        # per-iteration host loop with the single-channel driver's
        # observability contract (verbose/metrics/checkpoint/callback)
        lls, pi = [], None
        for i in range(steps):
            if callback is not None:
                callback(np.asarray(mu_d))
            t0 = _time.perf_counter()
            lp_d, pi, mu_d, sg_d, ll = em_step_mc(
                yc_d, lp_d, mu_d, sg_d, tables, K=K, fb_mode=fb_mode,
                block=block)
            lls.append(float(ll))
            elapsed = _time.perf_counter() - t0
            if verbose > 0:
                print(f"  MC EM iter {i}: ll={lls[-1]:.2f} "
                      f"sigmas={np.round(np.asarray(sg_d), 4)}")
            if metrics is not None:
                metrics.em_iter(i, lls[-1], np.asarray(sg_d),
                                np.asarray(lp_d), elapsed, len(yc))
            if checkpoint_dir is not None:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(
                    f"{checkpoint_dir}/em_mc_latest.npz",
                    lp=np.asarray(lp_d), mu=np.asarray(mu_d),
                    sigma=np.asarray(sg_d), em_iter=i, phase=name,
                    ll_history=lls)
        return (np.asarray(lp_d), np.asarray(pi), np.asarray(mu_d),
                np.asarray(sg_d), lls)

    lp, pi, mu, sigmas, lls = phase(lp, mu, sigmas, nsteps, "em1")
    ll_hist += lls

    mu, lp = condense_templates_mc(mu, lp, sigmas, condense_alpha,
                                   verbose=verbose)
    keep = remove_sparse(lp, sparse_lp0)
    mu, lp = mu[:, keep], lp[keep]
    keep = remove_small_mc(mu, sigmas, small_alpha)
    mu, lp = mu[:, keep], lp[keep]
    if verbose > 0:
        print(f"{mu.shape[1]} templates remain after surgery")

    lp, pi, mu, sigmas, lls = phase(lp, mu, sigmas, nsteps // 2,
                                    "em2")
    ll_hist += lls

    model = HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=lp)
    return model, pi, ll_hist
