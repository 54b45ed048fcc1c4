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
from ..train.em import (EMTables, edge_weights_from_structure,
                        occ_divide)
from ..utils.logmath import HALF_LOG_2PI, logsumexp_rows
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
    body = occ_divide(num, den).reshape(N, K - 1).T
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
                    channel_axis: str | None = "channel",
                    fb_mode: str = "blocked", H: int | None = None,
                    interpret: bool | None = None):
    """One EM step for a (C, T) channel batch on a (channel, time) mesh.

    Per-channel independent models: lp (C, N), mu (C, K, N), sigma (C,).
    T must be a multiple of mesh.shape[time_axis] * L. Returns
    (new_lp, new_pi, new_mu, new_sigma, ll), channel-sharded.

    fb_mode:
      "blocked" exact S x S block operators; cross-device state = the
                all_gathered device operators + boundary vectors.
      "overlap" halo-window engine: cross-device state = 2H neighbor
                samples per boundary (one ppermute) + the statistic psums
                — no operators at all. Needs >= 2 blocks per device and
                halo accuracy per ops/ring_fb.ring_overlap_forward_backward
                (below float precision at H = 4K).
      "overlap_pallas" the same halo/window/psum protocol, but each
                device's windows run through the fused Pallas EM kernels
                (ops/pallas_fb_mb.py) instead of the XLA scans — the
                production multi-chip TPU training mode (ROADMAP #11).
                Same constraints as "overlap" plus the kernel's: the
                non-overlap topology, K <= 65, W = L + 2H a multiple of
                its chunk. f32 statistics. `interpret` forces Pallas
                interpret mode (defaults to True off-TPU so the fake-mesh
                CPU tests exercise this path).

    Single-channel time-only use: pass C=1 arrays and a channel axis of
    size 1 (or channel_axis=None with a 1-axis mesh).
    """
    y = jnp.asarray(y)
    C, T = y.shape
    Dv = mesh.shape[time_axis]
    if T % (Dv * L) != 0:
        raise ValueError(f"T={T} must be a multiple of Dv*L={Dv * L}")
    if fb_mode not in ("blocked", "overlap", "overlap_pallas"):
        raise ValueError(f"fb_mode must be 'blocked', 'overlap' or "
                         f"'overlap_pallas', got {fb_mode!r}")
    if H is None:
        H = max(4 * K, 64)
    if fb_mode in ("overlap", "overlap_pallas"):
        Ts = T // Dv
        if H < 1 or Ts // L < 2 or L < 2 * H:
            raise ValueError(
                f"overlap mode needs 1 <= H <= L/2 and >= 2 blocks per "
                f"device (Ts={Ts}, L={L}, H={H})")
    if fb_mode == "overlap_pallas":
        from ..ops.pallas_fb_mb import CH as EMCH, KP as EMKP

        if K - 1 > EMKP:
            raise ValueError(f"pallas EM kernel supports K <= {EMKP + 1}")
        if (L + 2 * H) % EMCH != 0:
            raise ValueError(
                f"W = L + 2H = {L + 2 * H} must be a multiple of {EMCH}")
        if interpret is None:
            from ..utils.platform import is_tpu_backend

            interpret = not is_tpu_backend()

    # dummy masked step 0 aligns steps with samples (module docstring)
    step_valid = jnp.arange(T) > 0

    def body(y_loc, step_valid_loc, lp_loc, mu_loc, sigma_loc):
        if fb_mode in ("overlap", "overlap_pallas"):
            Dv_ = jax.lax.axis_size(time_axis)
            # halo exchange: my tail -> right neighbor's left halo,
            # my head -> left neighbor's right halo (zeros at mesh edges)
            halo_l = jax.lax.ppermute(
                y_loc[:, -H:], time_axis,
                [(i, i + 1) for i in range(Dv_ - 1)])
            halo_r = jax.lax.ppermute(
                y_loc[:, :H], time_axis,
                [(i + 1, i) for i in range(Dv_ - 1)])
            if fb_mode == "overlap_pallas":
                fn = partial(_em_one_channel_overlap_pallas, tables=tables,
                             K=K, L=L, H=H, time_axis=time_axis,
                             interpret=interpret)
            else:
                fn = partial(_em_one_channel_overlap, tables=tables, K=K,
                             L=L, H=H, time_axis=time_axis)
            return jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0))(
                y_loc, halo_l, halo_r, lp_loc, mu_loc, sigma_loc)
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


def _em_one_channel_overlap(y_loc, halo_l, halo_r, lp, mu, sigma,
                            tables: EMTables, *, K: int, L: int, H: int,
                            time_axis: str):
    """Per-device, per-channel overlap-save EM body (fb_mode='overlap').

    The halo-window engine (ops/ring_fb.ring_overlap_forward_backward
    semantics — that module is the twin of this window/realignment logic;
    any fix to one MUST be mirrored in the other, except that the ragged-T
    edge cases cannot arise here because sharded_em_step enforces
    T % (Dv*L) == 0) needs NO (S, S) operators and no boundary-vector
    chains:
    each device decodes its local windows using 2*H halo samples from its
    neighbors (exchanged once via ppermute — the entire cross-device state)
    and every EM statistic is a same-window per-t quantity whose window
    constants cancel; only the statistic reductions and the telescoped ll
    cross devices (psum). y_loc: (Ts,); halo_l/halo_r: (H,) neighbor
    samples (zeros at the mesh edges — edge windows use the real signal
    edges instead).
    """
    from ..ops.ring_fb import (_bwd_step, _emission_fns, _flat, _fwd_step,
                               _weights)

    N = tables.states.shape[0]
    S = tables.states.shape[1]
    dtype = y_loc.dtype
    didx = jax.lax.axis_index(time_axis)
    Dv = jax.lax.axis_size(time_axis)
    Ts = y_loc.shape[0]
    B = Ts // L
    W = L + 2 * H

    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em_fn = _emission_fns(jnp.asarray(mu, dtype), sigma)

    # local windows over [b*L - H, b*L + L + H) of the halo-extended span
    y_halo = jnp.concatenate([halo_l, y_loc, halo_r])      # (Ts + 2H,)
    y_ext = jnp.pad(y_halo, (0, (B + 1) * L - (Ts + 2 * H)))
    A = y_ext.reshape(B + 1, L)
    y_win = jnp.concatenate([A[:B], A[1:, : 2 * H]], axis=1)   # (B, W)
    # mesh-edge rows decode the real signal edges and are realigned
    first_real = jax.lax.dynamic_slice_in_dim(y_loc, 0, W)
    last_real = jax.lax.dynamic_slice_in_dim(y_loc, Ts - W, W)
    y_win = y_win.at[0].set(jnp.where(didx == 0, first_real, y_win[0]))
    y_win = y_win.at[B - 1].set(
        jnp.where(didx == Dv - 1, last_real, y_win[B - 1]))

    y_steps = y_win.T                                      # (W, B)

    def bem(y_t):
        es, ebm = em_fn(y_t[:, None, None])
        return es[:, 0, 0], ebm

    es0, eb0 = bem(y_steps[0])

    def fstep(c, y_t):
        vs, vb = c
        es, ebm = bem(y_t)
        vs, vb = _fwd_step(vs, vb, es, ebm, w)
        return (vs, vb), _flat(vs, vb)

    _, frest = jax.lax.scan(fstep, (es0, eb0), y_steps[1:])
    alpha_w = jnp.concatenate([_flat(es0, eb0)[None], frest], axis=0)

    bs0 = jnp.zeros((B,), dtype)
    bb0 = jnp.zeros((B, N, K - 1), dtype)

    def bstep(c, y_next):
        bs, bb = c
        es, ebm = bem(y_next)
        bs, bb = _bwd_step(bs, bb, es, ebm, w)
        return (bs, bb), _flat(bs, bb)

    _, brest = jax.lax.scan(bstep, (bs0, bb0), y_steps[1:], reverse=True)
    beta_w = jnp.concatenate([brest, _flat(bs0, bb0)[None]], axis=0)

    # realign mesh-edge rows to uniform coordinates (roll by +-H)
    def roll_row(win, b, shift, pred):
        return win.at[:, b].set(
            jnp.where(pred, jnp.roll(win[:, b], shift, axis=0), win[:, b]))

    alpha_w = roll_row(alpha_w, 0, H, didx == 0)
    beta_w = roll_row(beta_w, 0, H, didx == 0)
    alpha_w = roll_row(alpha_w, B - 1, -H, didx == Dv - 1)
    beta_w = roll_row(beta_w, B - 1, -H, didx == Dv - 1)
    y_win = y_win.at[0].set(
        jnp.where(didx == 0, jnp.roll(y_win[0], H), y_win[0]))
    y_win = y_win.at[B - 1].set(
        jnp.where(didx == Dv - 1, jnp.roll(y_win[B - 1], -H), y_win[B - 1]))

    # assembled same-window views over the local span
    def core(win, j0):
        return win[j0 : j0 + L].transpose(1, 0, 2).reshape(Ts, S)

    alpha_loc = core(alpha_w, H)
    beta_loc = core(beta_w, H)
    beta_next = core(beta_w, H + 1)
    alpha_next = core(alpha_w, H + 1)
    y_next = y_win[:, H + 1 : H + L + 1].reshape(Ts)

    ab = alpha_loc + beta_loc
    g = logsumexp_rows(ab, axis=1)
    log_gamma = ab - g[:, None]
    g_next = logsumexp_rows(alpha_next + beta_next, axis=1)

    # telescoped ll: device 0's first window is init-exact (absolute
    # term); every other window contributes a same-window difference
    lse_w = logsumexp_rows(alpha_w, axis=-1)               # (W, B)
    pre = lse_w[H - 1]
    endc = lse_w[H + L - 1]
    absolute = (didx == 0)
    terms = jnp.where((jnp.arange(B) == 0) & absolute, endc, endc - pre)
    ll = jax.lax.psum(jnp.sum(terms), time_axis)

    # ---- transition statistics (same-window t+1 terms)
    onset_w = edge_weights_from_structure(
        lp, tables.onset_n_silent, tables.onset_onsets,
        jnp.ones_like(tables.onset_n_silent, dtype=bool))
    tgt = tables.onset_targets
    smu = state_means(tables.states, mu)
    sigma_ = jnp.asarray(sigma, dtype)
    em_tgt = (-HALF_LOG_2PI - jnp.log(sigma_)
              - (y_next[:, None] - smu[tgt][None, :]) ** 2
              / (2.0 * sigma_ * sigma_))                   # (Ts, N+1)
    xi = (alpha_loc[:, 0][:, None] + onset_w[None, :]
          + beta_next[:, tgt] + em_tgt - g_next[:, None])
    # step t -> t+1 exists for global t <= T-2: mask the global last sample
    is_last = (didx == Dv - 1) & (jnp.arange(Ts) == Ts - 1)
    xi = jnp.where(is_last[:, None], -jnp.inf, xi)
    xx = _dist_lse(logsumexp_rows(xi, axis=0), time_axis)

    g0 = jnp.where(is_last, -jnp.inf, log_gamma[:, 0])
    bb_ = _dist_lse(logsumexp_rows(g0, axis=0), time_axis)
    new_lp = (xx - bb_)[1:]

    new_pi = jax.lax.psum(
        jnp.where(didx == 0, log_gamma[0], jnp.zeros(S, dtype)), time_axis)

    # ---- template update + global sigma (one MXU matmul of moments)
    gamma = jnp.exp(log_gamma)
    Pm = jnp.stack([jnp.ones_like(y_loc), y_loc, y_loc * y_loc])
    M = jax.lax.psum(Pm @ gamma, time_axis)                # (3, S)
    G1, Gy, Gy2 = M[0], M[1], M[2]
    nbody = N * (K - 1)
    body = occ_divide(Gy[1 : 1 + nbody],
                      G1[1 : 1 + nbody]).reshape(N, K - 1).T
    new_mu = jnp.concatenate([jnp.zeros((1, N), dtype), body], axis=0)
    smu2 = state_means(tables.states, new_mu)
    x2 = jnp.sum(Gy2) - 2.0 * jnp.dot(smu2, Gy) + jnp.dot(smu2 * smu2, G1)
    new_sigma = jnp.sqrt(x2 / jnp.sum(G1))

    return new_lp, new_pi, new_mu, new_sigma, ll


def _em_one_channel_overlap_pallas(y_loc, halo_l, halo_r, lp, mu, sigma,
                                   tables: EMTables, *, K: int, L: int,
                                   H: int, time_axis: str, interpret: bool):
    """Per-device, per-channel fused-kernel EM body
    (fb_mode='overlap_pallas'): the two Pallas EM kernels of
    ops/pallas_fb_mb.py drop in per shard unchanged (ROADMAP #11) — the
    cross-device state is identical to fb_mode='overlap' (one 2H-sample
    halo ppermute + the statistic psums), but each device's local windows
    run through the fused forward/backward kernels instead of the XLA
    scans, and the psum'd quantities are ~KBs of *linear-space*
    sufficient statistics (the same ones the single-device
    _em_step_overlap_pallas M-step consumes)."""
    from ..ops.pallas_fb_mb import _em_stats_from_windows
    from ..ops.ring_fb import _emission_fns, _flat

    N = tables.states.shape[0]
    dtype = y_loc.dtype
    didx = jax.lax.axis_index(time_axis)
    Dv = jax.lax.axis_size(time_axis)
    Ts = y_loc.shape[0]
    B = Ts // L
    W = L + 2 * H

    # local halo windows (uniform rows read straight from the halo-extended
    # span; only the MESH-edge rows clamp to the real signal edges — the
    # same scheme as _em_one_channel_overlap, expressed through the
    # kernels' per-window core bounds instead of rolls)
    y_halo = jnp.concatenate([halo_l, y_loc, halo_r])          # (Ts + 2H,)
    y_ext = jnp.pad(y_halo, (0, (B + 1) * L - (Ts + 2 * H)))
    A = y_ext.reshape(B + 1, L)
    y_win = jnp.concatenate([A[:B], A[1:, : 2 * H]], axis=1)   # (B, W)
    first_real = jax.lax.dynamic_slice_in_dim(y_loc, 0, W)
    last_real = jax.lax.dynamic_slice_in_dim(y_loc, Ts - W, W)
    y_win = y_win.at[0].set(jnp.where(didx == 0, first_real, y_win[0]))
    y_win = y_win.at[B - 1].set(
        jnp.where(didx == Dv - 1, last_real, y_win[B - 1]))

    idx = jnp.arange(B)
    core_lo = jnp.full((B,), H, jnp.int32)
    core_lo = jnp.where((idx == 0) & (didx == 0), 0, core_lo)
    core_lo = jnp.where((idx == B - 1) & (didx == Dv - 1), 2 * H, core_lo)
    core_hi = core_lo + L
    # xi (the t -> t+1 step) exists for global t <= T-2
    xi_hi = jnp.where((idx == B - 1) & (didx == Dv - 1), core_hi - 1,
                      core_hi)

    G1, Gy, Gy2, X, Xd, beta0, endc, pre = _em_stats_from_windows(
        y_win, core_lo, core_hi, xi_hi, lp, mu, sigma, interpret=interpret)

    # reductions: every statistic is a linear-space sum
    G1 = jax.lax.psum(G1, time_axis)
    Gy = jax.lax.psum(Gy, time_axis)
    Gy2 = jax.lax.psum(Gy2, time_axis)
    X = jax.lax.psum(X, time_axis)
    Xd = jax.lax.psum(Xd, time_axis)

    # telescoped ll: the global first window contributes its absolute endc
    # (its core_lo is 0 -> pre = 0 already), every other window endc - pre
    ll = jax.lax.psum(jnp.sum(endc - pre), time_axis)

    # pi needs alpha0 (emission at the global sample 0, dead-pi quirk) and
    # window 0's terminal beta — both live on time-device 0
    mu32 = jnp.asarray(mu, jnp.float32)
    es0, eb0 = _emission_fns(mu32, jnp.asarray(sigma, jnp.float32))(
        jnp.asarray(y_loc[0], jnp.float32))
    alpha0 = _flat(es0, eb0)
    zero = jnp.zeros_like(alpha0)
    alpha0 = jax.lax.psum(jnp.where(didx == 0, alpha0, zero), time_axis)
    beta0 = jax.lax.psum(jnp.where(didx == 0, beta0, zero), time_axis)
    g0 = jax.nn.logsumexp(alpha0 + beta0)
    new_pi = (alpha0 + beta0 - g0).astype(dtype)

    # M-step: identical formulas to train.em._em_step_overlap_pallas
    new_lp = (jnp.log(X) - jnp.log(Xd)).astype(dtype)
    body = occ_divide(Gy[1:], G1[1:]).reshape(N, K - 1).T
    new_mu = jnp.concatenate([jnp.zeros((1, N), jnp.float32), body], axis=0)
    smu2 = state_means(tables.states, new_mu)
    x2 = (jnp.sum(Gy2) - 2.0 * jnp.dot(smu2, Gy)
          + jnp.dot(smu2 * smu2, G1))
    new_sigma = jnp.sqrt(x2 / jnp.sum(G1)).astype(dtype)

    return new_lp, new_pi, new_mu.astype(dtype), new_sigma, ll.astype(dtype)


# --- multi-channel distributed EM: the joint (T, C) model time-sharded ---


def sharded_em_step_mc(yc, lp, mu, sigmas, tables: EMTables, mesh: Mesh, *,
                       K: int, L: int | None = None,
                       time_axis: str = "time", H: int | None = None):
    """One multi-channel EM step, time-sharded (beyond-reference: the
    reference is single-threaded AND channel-1-only).

    Unlike sharded_em_step's channel axis (independent per-channel
    models), this trains ONE joint model over all C electrodes: yc (T, C)
    is sharded along time, lp (N,) / mu (K, N, C) / sigmas (C,) are
    replicated. Cross-device state is one 2H-sample halo ppermute of the
    raw channel rows per boundary plus the statistic psums — the emission
    projection (train/em_mc._mc_streams_dense) is pointwise in t, so each
    device projects its halo-extended span locally and the halo-window
    argument of _em_one_channel_overlap applies unchanged. Statistics
    match em_step_mc(fb_mode="overlap") (fake-mesh tested at f64).

    T must be a multiple of Dv * L with >= 2 windows per device. Returns
    (new_lp, new_pi, new_mu, new_sigmas, ll), all replicated.
    """
    yc = jnp.asarray(yc)
    T, C = yc.shape
    Dv = mesh.shape[time_axis]
    if H is None:
        H = max(4 * K, 64)
    if L is None:
        # default window sized to the resolved halo so L >= 2H holds at
        # any K (L=256 would be unusable at the production K=60)
        L = max(256, 4 * H)
    Ts = T // Dv
    if T % (Dv * L) != 0:
        raise ValueError(f"T={T} must be a multiple of Dv*L={Dv * L}")
    if H < 1 or Ts // L < 2 or L < 2 * H:
        raise ValueError(
            f"need 1 <= H <= L/2 and >= 2 windows per device "
            f"(Ts={Ts}, L={L}, H={H})")

    body = partial(_em_mc_overlap_body, tables=tables, K=K, L=L, H=H,
                   time_axis=time_axis)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(time_axis, None), P(None), P(None, None, None),
                  P(None)),
        out_specs=(P(None), P(None), P(None, None, None), P(None), P()),
        check_vma=False,
    )
    return jax.jit(mapped)(yc, jnp.asarray(lp), jnp.asarray(mu),
                           jnp.asarray(sigmas))


def _em_mc_overlap_body(yc_loc, lp, mu, sigmas, *, tables: EMTables,
                        K: int, L: int, H: int, time_axis: str):
    """Per-device MC overlap-save EM body. yc_loc: (Ts, C) local span.
    Mirrors _em_one_channel_overlap with stream emissions (the twin note
    there applies: window/realignment fixes must be mirrored in
    ops/ring_fb.ring_overlap_forward_backward_mc)."""
    from ..ops.ring_fb import _bwd_step, _flat, _fwd_step, _weights
    from ..train.em_mc import _mc_streams_dense

    N = tables.states.shape[0]
    S = tables.states.shape[1]
    Km1 = K - 1
    dtype = yc_loc.dtype
    didx = jax.lax.axis_index(time_axis)
    Dv = jax.lax.axis_size(time_axis)
    Ts, C = yc_loc.shape
    B = Ts // L
    W = L + 2 * H
    F = 1 + N * Km1

    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)

    # halo exchange: my tail -> right neighbor's left halo, my head ->
    # left neighbor's right halo (zeros at the mesh edges)
    halo_l = jax.lax.ppermute(
        yc_loc[-H:, :], time_axis, [(i, i + 1) for i in range(Dv - 1)])
    halo_r = jax.lax.ppermute(
        yc_loc[:H, :], time_axis, [(i + 1, i) for i in range(Dv - 1)])
    yc_halo = jnp.concatenate([halo_l, yc_loc, halo_r], axis=0)

    # emission streams on the halo-extended span (pointwise in t, so
    # windowing commutes with the projection)
    es_h, body_h = _mc_streams_dense(yc_halo, jnp.asarray(mu),
                                     jnp.asarray(sigmas))
    feats = jnp.concatenate([es_h[:, None], body_h], axis=1)  # (Ts+2H, F)

    def win1(x):
        x_ext = jnp.pad(x, (0, (B + 1) * L - (Ts + 2 * H)))
        A = x_ext.reshape(B + 1, L)
        xw = jnp.concatenate([A[:B], A[1:, : 2 * H]], axis=1)  # (B, W)
        first_real = jax.lax.dynamic_slice_in_dim(x[H : H + Ts], 0, W)
        last_real = jax.lax.dynamic_slice_in_dim(x[H : H + Ts], Ts - W, W)
        xw = xw.at[0].set(jnp.where(didx == 0, first_real, xw[0]))
        xw = xw.at[B - 1].set(
            jnp.where(didx == Dv - 1, last_real, xw[B - 1]))
        return xw

    f_win = jax.vmap(win1)(feats.T)                        # (F, B, W)
    es_steps = f_win[0].T                                  # (W, B)
    eb_steps = f_win[1:].transpose(2, 1, 0).reshape(W, B, N, Km1)

    es0, eb0 = es_steps[0], eb_steps[0]

    def fstep(c, inp):
        es_t, eb_t = inp
        vs, vb = _fwd_step(*c, es_t, eb_t, w)
        return (vs, vb), _flat(vs, vb)

    _, frest = jax.lax.scan(fstep, (es0, eb0),
                            (es_steps[1:], eb_steps[1:]))
    alpha_w = jnp.concatenate([_flat(es0, eb0)[None], frest], axis=0)

    bs0 = jnp.zeros((B,), dtype)
    bb0 = jnp.zeros((B, N, Km1), dtype)

    def bstep(c, inp):
        es_t, eb_t = inp
        bs, bb = _bwd_step(*c, es_t, eb_t, w)
        return (bs, bb), _flat(bs, bb)

    _, brest = jax.lax.scan(bstep, (bs0, bb0),
                            (es_steps[1:], eb_steps[1:]), reverse=True)
    beta_w = jnp.concatenate([brest, _flat(bs0, bb0)[None]], axis=0)

    # realign mesh-edge rows to uniform coordinates (roll by +-H)
    def roll_row(win, b, shift, pred):
        return win.at[:, b].set(
            jnp.where(pred, jnp.roll(win[:, b], shift, axis=0), win[:, b]))

    alpha_w = roll_row(alpha_w, 0, H, didx == 0)
    beta_w = roll_row(beta_w, 0, H, didx == 0)
    alpha_w = roll_row(alpha_w, B - 1, -H, didx == Dv - 1)
    beta_w = roll_row(beta_w, B - 1, -H, didx == Dv - 1)
    fw_steps = jnp.concatenate(
        [es_steps[:, :, None],
         eb_steps.reshape(W, B, N * Km1)], axis=2)          # (W, B, F)
    fw_steps = roll_row(fw_steps, 0, H, didx == 0)
    fw_steps = roll_row(fw_steps, B - 1, -H, didx == Dv - 1)

    def core(win, j0):
        return win[j0 : j0 + L].transpose(1, 0, 2).reshape(Ts, -1)

    alpha_loc = core(alpha_w, H)
    beta_loc = core(beta_w, H)
    beta_next = core(beta_w, H + 1)
    alpha_next = core(alpha_w, H + 1)
    # feats columns are already the full (T, S) emission [silent | body]
    # (body rows of _mc_streams_dense include the es term)
    em_next = core(fw_steps, H + 1)                        # (Ts, S) at t+1

    ab = alpha_loc + beta_loc
    g = logsumexp_rows(ab, axis=1)
    log_gamma = ab - g[:, None]
    g_next = logsumexp_rows(alpha_next + beta_next, axis=1)

    # telescoped ll (device 0's first window is init-exact)
    lse_w = logsumexp_rows(alpha_w, axis=-1)               # (W, B)
    pre = lse_w[H - 1]
    endc = lse_w[H + L - 1]
    terms = jnp.where((jnp.arange(B) == 0) & (didx == 0), endc, endc - pre)
    ll = jax.lax.psum(jnp.sum(terms), time_axis)

    # ---- transition statistics (same-window t+1 terms)
    onset_w = edge_weights_from_structure(
        lp, tables.onset_n_silent, tables.onset_onsets,
        jnp.ones_like(tables.onset_n_silent, dtype=bool))
    tgt = tables.onset_targets
    xi = (alpha_loc[:, 0][:, None] + onset_w[None, :]
          + beta_next[:, tgt] + em_next[:, tgt] - g_next[:, None])
    is_last = (didx == Dv - 1) & (jnp.arange(Ts) == Ts - 1)
    xi = jnp.where(is_last[:, None], -jnp.inf, xi)
    xx = _dist_lse(logsumexp_rows(xi, axis=0), time_axis)

    g0 = jnp.where(is_last, -jnp.inf, log_gamma[:, 0])
    bb_ = _dist_lse(logsumexp_rows(g0, axis=0), time_axis)
    new_lp = (xx - bb_)[1:]

    new_pi = jax.lax.psum(
        jnp.where(didx == 0, log_gamma[0], jnp.zeros(S, dtype)), time_axis)

    # ---- per-channel moments in one MXU matmul, then the MC M-step
    gamma = jnp.exp(log_gamma)
    Pm = jnp.concatenate([jnp.ones((1, Ts), dtype), yc_loc.T,
                          (yc_loc * yc_loc).T], axis=0)     # (1+2C, Ts)
    M = jax.lax.psum(Pm @ gamma, time_axis)                 # (1+2C, S)
    G1, Gy, Gy2 = M[0], M[1 : 1 + C], M[1 + C :]
    nbody = N * Km1
    bodym = occ_divide(Gy[:, 1 : 1 + nbody],
                       G1[None, 1 : 1 + nbody])
    bodym = bodym.reshape(C, N, Km1).transpose(2, 1, 0)     # (Km1, N, C)
    new_mu = jnp.concatenate([jnp.zeros((1, N, C), dtype), bodym], axis=0)
    smu_c = jnp.concatenate(
        [jnp.zeros((1, C), dtype),
         new_mu[1:].transpose(1, 0, 2).reshape(nbody, C)], axis=0)  # (S, C)
    x2 = (jnp.sum(Gy2, axis=1) - 2.0 * jnp.sum(smu_c.T * Gy, axis=1)
          + (smu_c * smu_c).T @ G1)
    new_sigmas = jnp.sqrt(x2 / jnp.sum(G1))

    return new_lp, new_pi, new_mu, new_sigmas, ll
