"""Log-domain forward/backward recursions as `jax.lax.scan`s.

Reference semantics (src/baumwelch.jl:25-51, 73-98):

* forward init is emission-only — the reference assigns pi and immediately
  overwrites it with the emission (baumwelch.jl:31 vs :36); we reproduce the
  live behavior;
* backward init is beta[:, T-1] = 0 (baumwelch.jl:80);
* both recursions run over the sparse edge structure; here that is the same
  static padded gather table the Viterbi engine uses, with logsumexp instead
  of max. Float results differ from the reference in the last ulps because
  the reference folds the (constant-per-target) emission term into every
  pairwise log-add (baumwelch.jl:46-47) while we reassociate; EM parity is
  therefore tolerance-based, not bitwise (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.logmath import logsumexp_rows
from .emission import emission_logprob


def forward(y, in_idx, in_w, state_mu, sigma):
    """alpha: (T, S) forward log-scores (reference baumwelch.jl:25-51)."""
    em = emission_logprob(y, state_mu, sigma)  # (T, S)
    a0 = em[0]

    def step(carry, em_t):
        a = em_t + logsumexp_rows(carry[in_idx] + in_w, axis=1)
        return a, a

    _, rest = jax.lax.scan(step, a0, em[1:])
    return jnp.concatenate([a0[None], rest], axis=0)


def backward(y, out_idx, out_w, state_mu, sigma):
    """beta: (T, S) backward log-scores (reference baumwelch.jl:73-98)."""
    em = emission_logprob(y, state_mu, sigma)  # (T, S)
    bT = jnp.zeros_like(em[0])

    def step(carry, em_next):
        # b_t[j] = LSE_k( b_{t+1}[k] + w[j->k] + em_{t+1}[k] )
        contrib = (carry + em_next)[out_idx] + out_w
        b = logsumexp_rows(contrib, axis=1)
        return b, b

    _, rest = jax.lax.scan(step, bT, em[1:], reverse=True)
    return jnp.concatenate([rest, bT[None]], axis=0)


def log_likelihood_from_alpha(alpha):
    """Sequence log-likelihood logsumexp(alpha[T-1])."""
    return logsumexp_rows(alpha[-1], axis=-1)
