"""Automatic repair of overlap-save seams that found no common silence.

The parallel overlap-save decode (parallel/overlap_save.py) snaps each seam
to a sample where the two adjacent block decodes agree on silence. When no
such sample exists within the +-H seam window (dense spiking), the seam is
cut raw and flagged seam_ok=False — the stitched labels may then deviate
from the sequential decode around the cut.

This module closes that hole, mirroring the reference chunker's
retract-*arbitrarily-far* semantics (src/fit.jl:24-35: the right edge walks
back to the last silent sample, however far): each flagged seam is
re-decoded over geometrically widening windows until the fresh decode and
the current stitched labels agree on silence on *both* sides of the seam;
the fresh labels are spliced between those two agreement points. The
agreement points carry the same certificate as ordinary seams (two decodes
with independent inits agreeing on silence), so the repaired stitch is
protocol-uniform. If the window grows to the whole signal, the repair
degenerates to the exact sequential whole-signal decode — guaranteed
termination with guaranteed exactness.

Splice validity: at the left splice point t1 both paths are silent, so the
spliced transition x[t1-1] -> 0 equals the current path's own (valid)
transition into silence; symmetrically at t2. The repaired path therefore
stays globally valid and its cumulative score (core/path_score.py) stays
finite.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_window_decoder(lp, mu, sigma, *, overlaps: bool):
    """Returns decode(y_win, silent_start) -> int labels, jit-cached per
    window length (silent_start is traced, so both variants share one
    compile)."""
    from ..ops.ring_viterbi import ring_viterbi_nov, ring_viterbi_ov2
    from ..ops.ring_viterbi_ovn import ring_viterbi_ovn

    lp = jnp.asarray(lp)
    mu = jnp.asarray(mu)
    N = mu.shape[1]
    if not overlaps or N < 2:          # N < 2: no pair columns, nov exact
        engine = ring_viterbi_nov
    elif N == 2:
        engine = ring_viterbi_ov2
    else:
        engine = ring_viterbi_ovn

    def decode(y_win, silent_start: bool):
        x, _ = engine(jnp.asarray(y_win, mu.dtype), lp, mu, sigma,
                      silent_start=silent_start, with_ll=False)
        return np.asarray(x)

    return decode


def _find_splice(x_cur, x_new, wstart, p, guard_lo, guard_hi, T):
    """Agreement points around seam p: t1 = last common-silent sample
    STRICTLY BEFORE p in [guard_lo, p), t2 = first common-silent sample
    > p in (p, guard_hi). Signal edges need no certificate (exact init /
    termination). Returns (t1, t2) absolute, or None.

    t1 must satisfy t1 < p: sample p is the right block's first sample,
    so the raw-cut junction is the transition x[p-1] -> x[p] — the splice
    [t1, t2) must contain it. With t1 == p the junction would survive the
    repair, and the docstring's validity argument ("the spliced
    transition x[t1-1] -> 0 equals the current path's own valid
    transition into silence") would be applied exactly at the one
    transition of the current path that is NOT known valid."""
    w = slice(guard_lo - wstart, guard_hi - wstart)
    both = (x_cur[guard_lo:guard_hi] == 0) & (x_new[w] == 0)
    offs = np.arange(guard_lo, guard_hi)
    left = offs[both & (offs < p)]
    right = offs[both & (offs > p)]
    if len(left):
        t1 = int(left[-1])
    elif wstart == 0 and guard_lo == 0:
        t1 = 0                       # window start is the true signal start
    else:
        return None
    if len(right):
        t2 = int(right[0])
    elif guard_hi == T:
        t2 = T                       # window end is the true signal end
    else:
        return None
    return t1, t2


def repair_seams(y, x, seam_positions, decode, *, H: int,
                 max_rounds: int = 30):
    """Repair flagged seams in-place on a copy of x.

    y: (T,) observations (host); x: (T,) stitched labels; seam_positions:
    absolute sample positions of the flagged seams; decode: from
    make_window_decoder; H: the overlap-save halo (guard margin).

    Returns (x_repaired, n_windows_decoded).
    """
    y = np.asarray(y)
    x = np.array(x)                  # copy; dtype preserved
    T = len(y)
    n_decodes = 0
    for p in sorted(int(p) for p in seam_positions):
        for r in range(1, max_rounds + 1):
            half = H * (1 << r)
            if 2 * half >= T:
                # degenerate: exact whole-signal sequential decode
                x[:] = decode(y, True)[: T].astype(x.dtype)
                n_decodes += 1
                return x, n_decodes
            wstart = p - half
            wend = p + half
            # keep the compiled shape a power-of-two multiple of H: slide
            # the window instead of shrinking it at the signal edges, so
            # edge windows decode the *real* signal boundary (exact init
            # at 0 / exact termination at T)
            if wstart < 0:
                wstart, wend = 0, 2 * half
            elif wend > T:
                wstart, wend = T - 2 * half, T
            x_new = decode(y[wstart:wend], wstart == 0)
            n_decodes += 1
            guard_lo = wstart + (0 if wstart == 0 else H)
            guard_hi = wend - (0 if wend == T else H)
            got = _find_splice(x, x_new, wstart, p, guard_lo, guard_hi, T)
            if got is not None:
                t1, t2 = got
                x[t1:t2] = x_new[t1 - wstart : t2 - wstart].astype(x.dtype)
                break
        else:
            raise RuntimeError(
                f"seam at {p} not repairable in {max_rounds} rounds")
    return x, n_decodes
