"""Time-sharded EXACT onset posteriors (VERDICT r4 item 9).

The chained-window two-pass of core/posterior.onset_posteriors_chained
maps onto a device mesh with almost no communication: every window's
sweeps are local, and the chaining handoffs that cross a device boundary
are ONE (S,) alpha vector rightward and ONE (S,) beta vector leftward
per edge — a single ppermute each (the decode/EM paths' 2H-sample halo
exchange is not even needed: the posterior chain passes state vectors,
not raw samples). Exactness is the chained argument unchanged: entry
error contracts through a full L samples (decay^L), device 0's first
window keeps the reference cold init, and the global last sample's
beta = 0 lands via the validity mask.

Layout: y is sharded P(time) in contiguous T/D spans; each device runs
B_loc = T_loc/L windows; outputs are P(time)-sharded (T, N) marginals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.logmath import logsumexp_rows

__all__ = ["sharded_onset_posteriors"]


def sharded_onset_posteriors(templates, y, mesh: Mesh, *, L: int = 4096,
                             time_axis: str = "time", proj=None,
                             gamma_batch: int = 8) -> np.ndarray:
    """(T, N) exact onset marginals on a time mesh (see module
    docstring). T must be a multiple of mesh.shape[time_axis] * L;
    single-channel templates, any topology (the structural FB engines).
    gamma_batch bounds the per-device live (L, S) row planes."""
    from ..core.posterior import (_SC_FB, _recenter, _sc_engine_name,
                                  onset_projection)

    y = jnp.asarray(y)
    if y.ndim != 1:
        raise ValueError("sharded_onset_posteriors takes a (T,) trace")
    T = y.shape[0]
    Dv = mesh.shape[time_axis]
    if T % (Dv * L) != 0:
        raise ValueError(f"T={T} must be a multiple of Dv*L={Dv * L}")
    if T // Dv < 2 * L and Dv > 1:
        raise ValueError("need >= 2 windows per device")
    ss = templates.state_space
    S = ss.nstates
    dtype = jnp.zeros(0).dtype
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)
    M = proj_d.shape[1]
    engine = _sc_engine_name(templates)
    fb = _SC_FB[engine]
    lp_d = jnp.asarray(templates.lp, dtype)
    mu_d = jnp.asarray(templates.mu, dtype)
    sg_d = jnp.asarray(templates.sigma, dtype)

    fwd_edges = [(i, i + 1) for i in range(Dv - 1)]
    bwd_edges = [(i + 1, i) for i in range(Dv - 1)]

    def body(y_loc, lp, mu, sg):
        d = jax.lax.axis_index(time_axis)
        T_loc = y_loc.shape[0]
        B = T_loc // L
        y_win = y_loc.reshape(B, L)
        # next-step inputs: local shift by one; the last slot of the last
        # window is the RIGHT neighbor's first sample (zeros at the mesh
        # edge — masked there anyway)
        nxt0 = jax.lax.ppermute(y_loc[:1], time_axis, bwd_edges)
        y_next = jnp.concatenate([y_loc[1:], nxt0]).reshape(B, L)
        off = d * T_loc
        tpos = off + jnp.arange(T_loc)
        valid = (tpos < T - 1).reshape(B, L)

        zeros = jnp.zeros((B, S), dtype)

        # forward cold sweep (all windows; window 0 of device 0 is the
        # true cold init — first=True everywhere is what we want for the
        # SWEEP; the final pass below re-selects per device)
        def fcold(yw):
            c, _ = fb(jnp.zeros((S,), dtype), yw, lp, mu, sg,
                      first=True, reverse=False)
            return c

        finals = _recenter(jax.vmap(fcold)(y_win))
        ent0 = jax.lax.ppermute(finals[-1:], time_axis, fwd_edges)
        entries = jnp.concatenate([ent0, finals[:-1]])

        # backward cold sweep
        def bcold(ynw, v):
            c, _ = fb(jnp.zeros((S,), dtype), ynw, lp, mu, sg,
                      first=False, reverse=True, valid=v)
            return c

        bfirsts = _recenter(jax.vmap(bcold)(y_next, valid))
        ex_last = jax.lax.ppermute(bfirsts[:1], time_axis, bwd_edges)
        exits = jnp.concatenate([bfirsts[1:], ex_last])

        # final gamma pass, window-batched via lax.map
        def gamma_one(args, first):
            yw, ynw, v, en, ex = args
            _, a_all = fb(en, yw, lp, mu, sg, first=first, reverse=False)
            _, b_all = fb(ex, ynw, lp, mu, sg, first=False, reverse=True,
                          valid=v)
            g = a_all + b_all
            g = g - logsumexp_rows(g, axis=1)[:, None]
            return jnp.matmul(jnp.exp(g), proj_d,
                              precision=jax.lax.Precision.HIGHEST)

        rest_args = (y_win[1:], y_next[1:], valid[1:], entries[1:],
                     exits[1:])
        g_rest = jax.lax.map(partial(gamma_one, first=False), rest_args,
                             batch_size=min(gamma_batch, max(B - 1, 1)))
        head_args = (y_win[0], y_next[0], valid[0], entries[0], exits[0])
        # device 0's first window keeps the reference cold init; other
        # devices' first window chains from the left neighbor
        g_head = jax.lax.cond(
            d == 0,
            lambda a: gamma_one(a, first=True),
            lambda a: gamma_one(a, first=False),
            head_args)
        return jnp.concatenate([g_head[None], g_rest]).reshape(T_loc, M)

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(time_axis), P(None), P(None, None), P()),
        out_specs=P(time_axis, None),
        check_vma=False,
    )
    return np.asarray(jax.jit(mapped)(y.astype(dtype), lp_d, mu_d, sg_d))
