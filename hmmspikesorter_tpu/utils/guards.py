"""NaN/-inf guard machinery for the log-space kernels (SURVEY.md §5.2).

The reference has no concurrency and no sanitizers; its failure mode is
silent NaN propagation through log-space recursions (e.g. sigma collapsing
to 0, or exp overflow in logsumexp). The framework's hot paths are pure
functions, so guarding is a wrapper concern:

* `checked(fn)` — wraps a jittable function with jax.experimental.checkify
  so that NaN in any float output raises a CheckifyError with the offending
  output's name, instead of propagating silently. Used in tests and debug
  runs; zero cost when not applied (the production path never wraps).
* `assert_finite_tree(tree)` — host-side eager validation of a pytree of
  arrays (checkpoint loads, CLI inputs): raises ValueError naming the leaf.
  -inf is permitted (log-space padding is -inf by design); NaN is not.
* `guard_inputs(y, sigma)` — the input-validation bail the CLI applies
  before decoding (mirrors the reference's input checks, hmmsort.jl:40-53,
  extended to data sanity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def checked(fn, *, check_inputs: bool = False):
    """Wrap `fn` so NaNs in its (float) outputs raise instead of propagate.

    Returns a callable with the same signature; the checkify error is
    raised eagerly on the host after each call. Composes with jit (the
    checkify transform runs under it)."""
    from jax.experimental import checkify

    def body(*args, **kwargs):
        if check_inputs:
            for i, a in enumerate(jax.tree_util.tree_leaves((args, kwargs))):
                if isinstance(a, jax.Array) and jnp.issubdtype(
                        a.dtype, jnp.floating):
                    checkify.check(~jnp.any(jnp.isnan(a)),
                                   f"NaN in input leaf {i}")
        out = fn(*args, **kwargs)
        for i, a in enumerate(jax.tree_util.tree_leaves(out)):
            if isinstance(a, jax.Array) and jnp.issubdtype(
                    a.dtype, jnp.floating):
                checkify.check(~jnp.any(jnp.isnan(a)),
                               f"NaN in output leaf {i}")
        return out

    checked_fn = checkify.checkify(body)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite_tree(tree, *, name: str = "tree") -> None:
    """Raise ValueError if any array leaf contains NaN (-inf is allowed:
    log-space padding uses it by design)."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and np.isnan(arr).any():
            raise ValueError(f"{name}: NaN in leaf {i} "
                             f"(shape {arr.shape}, dtype {arr.dtype})")


def guard_inputs(y, sigma) -> None:
    """Validate decode inputs before touching the device (CLI bail path).

    y: a (T,) trace or a (C, T) channel batch. sigma: a scalar or a (C,)
    per-channel vector (every entry is checked — a single bad channel
    NaN-poisons the joint MC decode as surely as a bad scalar)."""
    y = np.asarray(y)
    if y.ndim not in (1, 2) or y.size == 0:
        raise ValueError(f"signal must be a non-empty 1-D trace or 2-D "
                         f"channel batch, got {y.shape}")
    if (not np.issubdtype(y.dtype, np.integer)
            and not np.isfinite(y).all()):
        # inf is as fatal as NaN here: an inf sample makes the emission
        # -inf and 0 * -inf turns into NaN inside the one-hot selection
        # matmuls of the table-driven engines. (Integer data cannot hold
        # either — the check is skipped so raw int16 recordings don't pay
        # a full float materialization.)
        raise ValueError("signal contains NaN or infinite samples")
    sigma = np.asarray(sigma, np.float64)
    if not np.isfinite(sigma).all() or (sigma <= 0).any():
        raise ValueError(f"noise sigma must be finite and positive, "
                         f"got {sigma}")
