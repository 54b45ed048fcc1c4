"""Distributed Baum-Welch: one EM step sharded over a (channel, time) mesh.

Parallelism map (SURVEY.md §2b — all new capability; the reference is
single-threaded with full (S, T) alpha/beta on one host,
src/baumwelch.jl:28,79):

* **dp = channel axis**: each channel trains an independent model; pure
  vmap, zero collectives.
* **sp = time axis**: the signal is sharded; each device computes log-plus
  block operators for its span (block_fb.py), device-level operators are
  `all_gather`ed (Dv * S^2 — KBs), boundary alpha (prefix) and beta
  (suffix) vectors are chained redundantly, and every device reconstructs
  alpha/beta only over its own span. EM sufficient statistics are linear
  `psum`s (mu/sigma moments) and distributed logsumexps (transition
  statistics) over ICI.

Step alignment trick: global "step" s is the transition into sample s
(s = 1..T-1); a dummy masked step 0 makes steps align 1:1 with samples, so
sharding samples shards steps with no halo exchange at all — the only
cross-device data are the (S,)/(S,S) boundary objects.

Semantics match train.em.em_step exactly (same per-t normalizers, same
silent-edge xi restriction, same single-active mu update and global sigma —
reference src/baumwelch.jl:205-309), up to logsumexp reassociation;
validated against em_step on the fake CPU mesh at ~1e-10.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.emission import emission_logprob, state_means
from ..train.em import EMTables, edge_weights_from_structure
from ..utils.logmath import logsumexp_rows
from .block_fb import _lse_matvec_left, _lse_matvec_right


def _dist_lse(local_lse, axis_name):
    """Combine per-device logsumexp partials along `axis_name`."""
    m = jax.lax.pmax(local_lse, axis_name)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.lax.psum(jnp.exp(local_lse - m_safe), axis_name)
    out = m_safe + jnp.log(s)
    return jnp.where(jnp.isfinite(m), out, -jnp.inf)


def _em_one_channel(y_loc, step_valid, lp, mu, sigma, tables: EMTables, *,
                    K: int, L: int, time_axis: str):
    """Per-device, per-channel EM body. y_loc: (Ts,) local span."""
    from ..ops.ring_fb import (_bwd_step, _emission_fns, _flat, _fwd_step,
                               _unflat, _weights)

    N = tables.states.shape[0]
    S = tables.states.shape[1]
    Km1 = K - 1
    dtype = y_loc.dtype
    didx = jax.lax.axis_index(time_axis)

    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em_fn = _emission_fns(jnp.asarray(mu, dtype), sigma)

    smu = state_means(tables.states, mu)
    em_loc = emission_logprob(y_loc, smu, sigma)          # (Ts, S) for stats
    Ts = y_loc.shape[0]
    B = Ts // L
    y_blocks = y_loc.reshape(B, L)
    mask_blocks = step_valid.reshape(B, L)

    # ---- block + device operators: gather-free ring step vmapped over
    # identity source rows (same scheme as ops/ring_fb's blocked path)
    eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, -jnp.inf).astype(dtype)

    def fwd_operator(y_blk, m_blk):
        VS, VB = _unflat(eye, N, Km1)

        def stp(c, inp):
            vs, vb = c
            y_t, valid = inp
            es, ebm = em_fn(y_t)
            nvs, nvb = _fwd_step(vs, vb, es, ebm, w)
            return (jnp.where(valid, nvs, vs), jnp.where(valid, nvb, vb)), None

        (VS, VB), _ = jax.lax.scan(stp, (VS, VB), (y_blk, m_blk))
        return _flat(VS, VB)

    ops = jax.vmap(fwd_operator)(y_blocks, mask_blocks)   # (B, S, S)

    def compose(M, Mb):
        return logsumexp_rows(M[:, :, None] + Mb[None, :, :], axis=1), None

    dev_op, _ = jax.lax.scan(compose, eye, ops)

    all_ops = jax.lax.all_gather(dev_op, time_axis)       # (Dv, S, S)
    Dv = jax.lax.axis_size(time_axis)

    # alpha at global sample 0 = emission-only init (dead-pi,
    # baumwelch.jl:31-36); computed on time-device 0, shared by psum.
    a0 = jax.lax.psum(jnp.where(didx == 0, em_loc[0], jnp.zeros(S, dtype)),
                      time_axis)

    # ---- boundary vectors (redundant chains over Dv device operators)
    def fwd_dev(v, inp):
        M, i = inp
        nxt = _lse_matvec_left(v, M)
        return jnp.where(i < didx, nxt, v), None

    alpha_dev, _ = jax.lax.scan(fwd_dev, a0, (all_ops, jnp.arange(Dv)))

    def bwd_dev(v, inp):
        M, i = inp
        nxt = _lse_matvec_right(M, v)
        return jnp.where(i > didx, nxt, v), None

    beta_dev, _ = jax.lax.scan(bwd_dev, jnp.zeros(S, dtype),
                               (all_ops, jnp.arange(Dv)), reverse=True)

    # ---- in-device block boundary chains + parallel block recompute
    def fwd_blk(v, M):
        return _lse_matvec_left(v, M), v

    _, alpha0s = jax.lax.scan(fwd_blk, alpha_dev, ops)    # (B, S)

    def bwd_blk(v, M):
        return _lse_matvec_right(M, v), v

    _, betaEs = jax.lax.scan(bwd_blk, beta_dev, ops, reverse=True)

    def alpha_block(a0_vec, y_blk, m_blk):
        vs, vb = _unflat(a0_vec, N, Km1)

        def stp(c, inp):
            cvs, cvb = c
            y_t, valid = inp
            es, ebm = em_fn(y_t)
            nvs, nvb = _fwd_step(cvs, cvb, es, ebm, w)
            cvs = jnp.where(valid, nvs, cvs)
            cvb = jnp.where(valid, nvb, cvb)
            return (cvs, cvb), _flat(cvs, cvb)

        _, outs = jax.lax.scan(stp, (vs, vb), (y_blk, m_blk))
        return outs

    def beta_block(bE_vec, y_blk, m_blk):
        bs, bb = _unflat(bE_vec, N, Km1)

        def stp(c, inp):
            cbs, cbb = c
            y_t, valid = inp
            es, ebm = em_fn(y_t)
            nbs, nbb = _bwd_step(cbs, cbb, es, ebm, w)
            cbs = jnp.where(valid, nbs, cbs)
            cbb = jnp.where(valid, nbb, cbb)
            return (cbs, cbb), _flat(cbs, cbb)

        _, outs = jax.lax.scan(stp, (bs, bb), (y_blk, m_blk), reverse=True)
        return outs

    alphas = jax.vmap(alpha_block)(alpha0s, y_blocks, mask_blocks)
    betas = jax.vmap(beta_block)(betaEs, y_blocks, mask_blocks)

    # alphas[b, l] = alpha at local sample b*L+l (masked step 0 passes the
    # carry, so device 0 sample 0 gets a0). betas[b, l] = beta at the sample
    # *before* step b*L+l; local beta needs a shift left by one, with this
    # device's last sample taking beta_dev.
    alpha_loc = alphas.reshape(Ts, S)
    beta_src = betas.reshape(Ts, S)
    beta_loc = jnp.concatenate([beta_src[1:], beta_dev[None]], axis=0)

    # ---- posteriors over local samples
    ab = alpha_loc + beta_loc
    g = logsumexp_rows(ab, axis=1)                        # (Ts,) logZ_t
    log_gamma = ab - g[:, None]

    # global ll = lse(alpha at last sample): last time-device owns it
    ll_loc = jnp.where(didx == Dv - 1, logsumexp_rows(alpha_loc[-1], axis=-1),
                       0.0)
    ll = jax.lax.psum(ll_loc, time_axis)

    # ---- transition statistics (silent-state out-edges, baumwelch.jl:226-264)
    onset_w = edge_weights_from_structure(
        lp, tables.onset_n_silent, tables.onset_onsets,
        jnp.ones_like(tables.onset_n_silent, dtype=bool))
    tgt = tables.onset_targets                            # (N+1,)
    # xi at local step s: alpha[s-1, 0] + w + beta[s, tgt] + em[s, tgt] - g[s]
    alpha_prev0 = jnp.concatenate([alpha_dev[0][None],
                                   alpha_loc[:-1, 0]])    # (Ts,)
    xi = (alpha_prev0[:, None] + onset_w[None, :]
          + beta_loc[:, tgt] + em_loc[:, tgt] - g[:, None])   # (Ts, N+1)
    xi = jnp.where(step_valid[:, None], xi, -jnp.inf)
    xx = _dist_lse(logsumexp_rows(xi, axis=0), time_axis)     # (N+1,)

    # bb: lse of gamma[t, 0] over t = 0..T-2 — exclude the global last sample
    is_last = (didx == Dv - 1) & (jnp.arange(Ts) == Ts - 1)
    g0 = jnp.where(is_last, -jnp.inf, log_gamma[:, 0])
    bb = _dist_lse(logsumexp_rows(g0, axis=0), time_axis)
    new_lp = (xx - bb)[1:]

    # pi = gamma at global sample 0 (device 0)
    new_pi = jax.lax.psum(
        jnp.where(didx == 0, log_gamma[0], jnp.zeros(S, dtype)), time_axis)

    # ---- template update (single-active states, baumwelch.jl:266-287)
    gw = jnp.exp(log_gamma[:, 1 : 1 + N * (K - 1)])       # (Ts, N*(K-1))
    num = jax.lax.psum(y_loc @ gw, time_axis)
    den = jax.lax.psum(jnp.sum(gw, axis=0), time_axis)
    body = (num / den).reshape(N, K - 1).T
    new_mu = jnp.concatenate([jnp.zeros((1, N), dtype), body], axis=0)

    # ---- global sigma (baumwelch.jl:294-307)
    smu2 = state_means(tables.states, new_mu)
    gamma = jnp.exp(log_gamma)
    G1 = jax.lax.psum(jnp.sum(gamma, axis=0), time_axis)
    Gy = jax.lax.psum(y_loc @ gamma, time_axis)
    Gy2 = jax.lax.psum((y_loc * y_loc) @ gamma, time_axis)
    x2 = jnp.sum(Gy2) - 2.0 * jnp.dot(smu2, Gy) + jnp.dot(smu2 * smu2, G1)
    new_sigma = jnp.sqrt(x2 / jnp.sum(G1))

    return new_lp, new_pi, new_mu, new_sigma, ll


def sharded_em_step(y, lp, mu, sigma, tables: EMTables, mesh: Mesh, *,
                    K: int, L: int = 256, time_axis: str = "time",
                    channel_axis: str | None = "channel"):
    """One EM step for a (C, T) channel batch on a (channel, time) mesh.

    Per-channel independent models: lp (C, N), mu (C, K, N), sigma (C,).
    T must be a multiple of mesh.shape[time_axis] * L. Returns
    (new_lp, new_pi, new_mu, new_sigma, ll), channel-sharded.

    Single-channel time-only use: pass C=1 arrays and a channel axis of
    size 1 (or channel_axis=None with a 1-axis mesh).
    """
    y = jnp.asarray(y)
    C, T = y.shape
    Dv = mesh.shape[time_axis]
    if T % (Dv * L) != 0:
        raise ValueError(f"T={T} must be a multiple of Dv*L={Dv * L}")

    # dummy masked step 0 aligns steps with samples (module docstring)
    step_valid = jnp.arange(T) > 0

    def body(y_loc, step_valid_loc, lp_loc, mu_loc, sigma_loc):
        fn = partial(_em_one_channel, tables=tables, K=K, L=L,
                     time_axis=time_axis)
        return jax.vmap(fn, in_axes=(0, None, 0, 0, 0))(
            y_loc, step_valid_loc, lp_loc, mu_loc, sigma_loc)

    cax = channel_axis
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(cax, time_axis), P(time_axis), P(cax, None),
                  P(cax, None, None), P(cax)),
        out_specs=(P(cax, None), P(cax, None), P(cax, None, None), P(cax),
                   P(cax)),
        check_vma=False,
    )
    return jax.jit(mapped)(y, step_valid, jnp.asarray(lp), jnp.asarray(mu),
                           jnp.asarray(sigma))
