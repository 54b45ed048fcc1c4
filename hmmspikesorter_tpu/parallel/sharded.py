"""Multi-device decode: time-axis sharding over a mesh with XLA collectives.

The reference has no distributed story at all (SURVEY.md §5.8); this module
maps its one scale mechanism (chunked decode) onto a TPU device mesh:

* **time axis**: each device owns a contiguous span of the signal and runs
  the exact blocked Viterbi (parallel/block_viterbi.py) on its local blocks.
  Cross-device coupling is tiny and rides ICI:
    - boundary score vectors: each device composes its local block operators
      into one device-level max-plus operator (S x S), `all_gather`s the
      per-device operators (Dv * S^2 — KBs-MBs), and computes its prefix
      boundary vector redundantly;
    - path stitching: per-block entry maps (B, S int32) are `all_gather`ed
      and the B-step end-state chain is computed redundantly on every
      device; each device then emits its local label span.
  The result is bit-identical to the single-device blocked decode (the
  operator algebra is associative; only the grouping changes) and matches
  the sequential engine exactly on float64 in tests.

* **channel axis**: independent recordings are embarrassingly parallel —
  `vmap` + a sharded batch axis; no collectives (the reference CLI only
  ever processes channel 1, src/hmmsort.jl:56 — batching is new capability).

Mesh convention: `Mesh(devices, ("time", "channel"))` (either axis may have
size 1). tp/pp/ep have no analog here — the largest live tensor is
(nstates x block), KB-MB scale (SURVEY.md §2b: consciously out of scope).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.emission import emission_logprob
from .block_viterbi import _block_operator, _block_redecode, _pad_steps


def _maxplus_compose(M1, M2):
    """(M1 then M2) max-plus composition: out[i,j] = max_k M1[i,k]+M2[k,j]."""
    return jnp.max(M1[:, :, None] + M2[None, :, :], axis=1)


def _local_blocked_decode(v0_global, em_steps_local, mask_local, in_idx, in_w,
                          *, L, axis_name):
    """Per-device body for the time-sharded exact Viterbi.

    em_steps_local: (T_local, S) — this device's transition-step emissions
    (global steps t=1..T-1, evenly split). mask_local marks real steps.
    Returns local labels (T_local,), local ll contribution, and the global
    first-sample state (only meaningful on device 0).
    """
    S = v0_global.shape[0]
    Tl = em_steps_local.shape[0]
    B = Tl // L
    em_blocks = em_steps_local.reshape(B, L, S)
    mask_blocks = mask_local.reshape(B, L)

    # Phase 1: local block operators, then one device-level operator.
    ops = jax.vmap(_block_operator, in_axes=(0, 0, None, None))(
        em_blocks, mask_blocks, in_idx, in_w)            # (B, S, S)

    def compose(M, Mb):
        return _maxplus_compose(M, Mb), None

    eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, -jnp.inf).astype(ops.dtype)
    dev_op, _ = jax.lax.scan(compose, eye, ops)          # (S, S)

    # Device-prefix boundary vector (redundant compute, tiny data).
    all_ops = jax.lax.all_gather(dev_op, axis_name)      # (Dv, S, S)
    didx = jax.lax.axis_index(axis_name)
    Dv = jax.lax.axis_size(axis_name)

    def dev_matvec(v, inp):
        M, i = inp
        nxt = jnp.max(v[:, None] + M, axis=0)
        v = jnp.where(i < didx, nxt, v)                  # prefix: ops < didx
        return v, None

    v_dev, _ = jax.lax.scan(dev_matvec, v0_global,
                            (all_ops, jnp.arange(Dv)))   # (S,)

    # Phase 2: local boundary chain + parallel re-decode.
    def matvec(v, M):
        return jnp.max(v[:, None] + M, axis=0), v

    v_last, alpha0s = jax.lax.scan(matvec, v_dev, ops)   # (B, S)
    scores, paths, entries, finals = jax.vmap(
        _block_redecode, in_axes=(0, 0, 0, None, None))(
        alpha0s, em_blocks, mask_blocks, in_idx, in_w)

    # Phase 3: global stitch. entries: (B, S) per device -> (Dv*B, S).
    all_entries = jax.lax.all_gather(entries, axis_name).reshape(-1, S)
    all_final = jax.lax.all_gather(finals[-1], axis_name)  # (Dv, S)
    x_end = jnp.argmax(all_final[-1]).astype(jnp.int32)

    def chain(end, entry_b):
        return entry_b[end], end

    x0_global, all_ends = jax.lax.scan(chain, x_end, all_entries,
                                       reverse=True)     # (Dv*B,)
    ends = jax.lax.dynamic_slice_in_dim(all_ends, didx * B, B)

    x_blk = jnp.take_along_axis(paths, ends[:, None, None], axis=2)[:, :, 0]
    ll_steps = jnp.take_along_axis(
        scores, x_blk[:, :, None], axis=2)[:, :, 0].reshape(-1)
    ll_local = jnp.sum(jnp.where(mask_local, ll_steps, 0.0))
    ll = jax.lax.psum(ll_local, axis_name)
    return x_blk.reshape(-1), ll, x0_global


def sharded_blocked_viterbi(y, in_idx, in_w, state_mu, sigma, mesh: Mesh,
                            *, L: int = 256, axis: str = "time"):
    """Exact Viterbi decode of one sequence, time-sharded over `mesh[axis]`.

    Returns (x, ll) identical to blocked_viterbi / the sequential engine.
    T-1 transition steps are padded to Dv * ceil() * L; y itself may be any
    length.
    """
    dtype = state_mu.dtype
    y = jnp.asarray(y, dtype)
    T = y.shape[0]
    Dv = mesh.shape[axis]
    em = emission_logprob(y, state_mu, sigma)            # (T, S)
    v0 = em[0].at[0].set(jnp.asarray(0.0, dtype))        # forced silent start

    # pad steps to a multiple of Dv*L
    em_steps, mask, _, _ = _pad_steps(em[1:], Dv * L)
    em_steps = em_steps.reshape(-1, em.shape[1])
    mask = mask.reshape(-1)

    x_steps, ll, x0 = _sharded_decode_fn(mesh, L, axis)(
        v0, em_steps, mask, in_idx, in_w)
    x = jnp.concatenate([x0[None], x_steps[: T - 1]])
    return x, ll


@lru_cache(maxsize=32)
def _sharded_decode_fn(mesh: Mesh, L: int, axis: str):
    """One jitted shard_map program per (mesh, L, axis): jit caches key on
    the callable's identity, so rebuilding the closure per call (the old
    pattern) retraced AND recompiled the whole sharded program on every
    invocation — timed loops measured compilation, not throughput."""
    fn = partial(_local_blocked_decode, L=L, axis_name=axis)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(), P()),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def batched_decode_sharded(y_batch, in_idx, in_w, state_mu, sigma, mesh: Mesh,
                           *, axis: str = "channel"):
    """Channel-parallel decode: (C, T) batch sharded over `mesh[axis]`.

    Pure data parallelism — vmap under jit with a sharded batch axis; XLA
    inserts no collectives.
    """
    y_batch = jnp.asarray(y_batch, state_mu.dtype)
    spec = NamedSharding(mesh, P(axis, None))
    y_batch = jax.device_put(y_batch, spec)
    return _batched_decode_fn(mesh, axis)(y_batch, in_idx, in_w, state_mu,
                                          sigma)


@lru_cache(maxsize=32)
def _batched_decode_fn(mesh: Mesh, axis: str):
    """One jitted program per (mesh, axis) — see _sharded_decode_fn."""
    from ..core.viterbi import viterbi_decode

    spec = NamedSharding(mesh, P(axis, None))
    fn = jax.vmap(viterbi_decode, in_axes=(0, None, None, None, None))
    return jax.jit(fn, out_shardings=(spec, NamedSharding(mesh, P(axis))))
