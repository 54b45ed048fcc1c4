"""Sparse spike-event representation of a decoded label sequence.

A decoded combined-state sequence ``x`` is hugely redundant: on a valid
path every neuron's ring phase advances deterministically after its onset
(reference transition semantics, src/types.jl:94-113), so ``x`` is fully
determined by (a) the initial state ``x[0]`` and (b) each neuron's onset
times (the samples where its phase equals 1). Those onsets are *also* the
product the pipeline ultimately wants — they are exactly the spike
timestamps ``extract_spiketimes`` aligns (reference src/extraction.jl:
15-24 reads the onset of each unrolled ring, shifted to the template
trough).

This module extracts the events **on the device** with pure arithmetic
(the state encoding is closed-form — see core/state_space.py's module
docstring — so no gathers or tables are needed) and reconstructs the full
label sequence **exactly** on the host. Production use: the decode and
the event extraction fuse into one device program, and only the packed
event grid crosses the wire instead of ``O(T)`` labels — on tunneled /
PCIe-attached hosts the label transfer dominates end-to-end decode wall
time (BENCHMARKS.md), so this is the fast transfer path.

The packing exploits the ring structure: consecutive onsets of one neuron
are at least K samples apart (after an onset the ring needs K-1 advances
plus one silent step before the next 0->1 edge), so a time chunk of
``G <= K`` samples holds **at most one** onset per neuron. Extraction is
then a single min-reduce — ``offset-in-chunk or G`` — onto a
``(N, T/G)`` uint8 grid: no sort, no scatter, no variable shapes (an XLA
sort over (N, T) keys measured ~160 ms device time at T=2^21 on v5e;
this reduce is ~1 ms). T/G bytes per neuron ≈ 16x smaller than the int16
dense labels at K=60.

Caveat: reconstruction assumes ``x`` is a *valid* path. Stitched
overlap-save decodes are valid by construction when every seam snapped to
common silence; a raw-cut seam (``seam_ok=False``) may splice mid-spike
and break phase continuity (including the >= K onset spacing the packing
relies on — detected by a count cross-check). Callers fall back to the
dense transfer when any seam is flagged — ``decode_events_overlap_save``
below does exactly that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pair_list(N: int):
    """Pair enumeration order of the overlap states (i-major, j-minor),
    matching core/state_space._enumerate_states."""
    return [(i, j) for i in range(N - 1) for j in range(i + 1, N)]


def phase_of(x, n: int, N: int, K: int, overlaps: bool):
    """Ring phase of neuron ``n`` at every sample of label sequence ``x``.

    Pure arithmetic on the closed-form state encoding (no tables):
    0 = silent, 1..K-1 = ring position. Works on jnp or np arrays.
    """
    xp = jnp if isinstance(x, jax.Array) else np
    Km1 = K - 1
    single_lo = 1 + n * Km1
    phase = xp.where((x >= single_lo) & (x < single_lo + Km1),
                     x - single_lo + 1, 0)
    if overlaps:
        base = 1 + N * Km1
        for rank, (i, j) in enumerate(_pair_list(N)):
            if n not in (i, j):
                continue
            lo = base + rank * Km1 * Km1
            r = x - lo
            inpair = (r >= 0) & (r < Km1 * Km1)
            p = (r // Km1 + 1) if n == i else (r % Km1 + 1)
            phase = xp.where(inpair, p, phase)
    return phase


def event_chunk(K: int) -> int:
    """Largest power-of-two chunk length G <= min(K, 128): guarantees at
    most one onset per neuron per chunk on a valid path, and offsets fit
    a uint8 with G as the no-onset sentinel."""
    g = 1
    while g * 2 <= min(K, 128):
        g *= 2
    return g


@partial(jax.jit, static_argnames=("N", "K", "overlaps"))
def extract_onsets_packed(x, *, N: int, K: int, overlaps: bool):
    """Device-side onset extraction onto the packed uint8 event grid.

    Args:
      x: (T,) integer labels (any int dtype).

    Returns:
      packed: (N, ceil(T/G)) uint8 — offset of the (unique) onset within
        each G-sample chunk, or G when the chunk has none (G = event_chunk(K)).
      counts: (N,) int32 — true onset totals (host cross-check: on a valid
        path ``(packed < G).sum(1) == counts``; a mismatch means onsets
        closer than K apart, i.e. an invalid spliced path).
    """
    T = x.shape[0]
    G = event_chunk(K)
    C = -(-T // G)
    x = x.astype(jnp.int32)
    offs = jnp.tile(jnp.arange(G, dtype=jnp.int32), C)[:T]
    rows, counts = [], []
    for n in range(N):
        mask = phase_of(x, n, N, K, overlaps) == 1
        key = jnp.where(mask, offs, G)
        key = jnp.pad(key, (0, C * G - T), constant_values=G)
        rows.append(key.reshape(C, G).min(axis=1))
        counts.append(mask.sum().astype(jnp.int32))
    return (jnp.stack(rows).astype(jnp.uint8),
            jnp.stack(counts))


def onsets_from_packed(packed, counts, *, K: int):
    """Host-side unpack: (N, C) uint8 grid -> list of N ascending onset
    index arrays. Raises if the packed grid lost an onset (invalid path —
    onsets closer than K apart)."""
    packed = np.asarray(packed)
    counts = np.asarray(counts)
    G = event_chunk(K)
    out = []
    for n in range(packed.shape[0]):
        c_idx = np.nonzero(packed[n] < G)[0]
        if len(c_idx) != counts[n]:
            raise ValueError(
                f"packed event grid lost {counts[n] - len(c_idx)} onsets of "
                f"neuron {n}: onsets closer than K={K} apart (invalid path)")
        out.append((c_idx * G + packed[n, c_idx]).astype(np.int64))
    return out


def extract_onsets(x, *, N: int, K: int, overlaps: bool):
    """Convenience wrapper: list of N onset-index arrays for labels ``x``
    (device extraction + host unpack)."""
    packed, counts = extract_onsets_packed(jnp.asarray(x), N=N, K=K,
                                           overlaps=overlaps)
    return onsets_from_packed(packed, counts, K=K)


def labels_from_onsets(onsets, x0, *, T: int, N: int, K: int,
                       overlaps: bool) -> np.ndarray:
    """Exact host-side reconstruction of the label sequence.

    Args:
      onsets: list of N ascending onset-index arrays.
      x0: the decoded initial state (seeds spikes already in progress at
        sample 0 — an active phase at t=0 has no onset inside [0, T)).

    Returns (T,) int32 labels, bit-equal to the dense decode for any valid
    path.
    """
    x0 = int(x0)
    Km1 = K - 1
    # per-neuron onset lists, with a virtual (negative) onset for a spike
    # already in progress at t=0: phase p0 at t=0 <=> onset 1-p0. p0 == 1
    # IS a real onset at t=0 — already in the extracted list, so adding
    # the virtual one would double-count it in the validity sweep.
    ons = []
    for n in range(N):
        pos = np.asarray(onsets[n], np.int64)
        p0 = int(phase_of(np.asarray([x0]), n, N, K, overlaps)[0])
        if p0 > 1:
            pos = np.concatenate([[1 - p0], pos])
        ons.append(pos)

    # validity sweep over the event endpoints (O(events log events)):
    # no sample may have more than max_active simultaneously active rings
    all_on = np.concatenate(ons) if N else np.zeros(0, np.int64)
    if all_on.size:
        pts = np.concatenate([all_on, all_on + Km1])
        delta = np.concatenate([np.ones(all_on.size, np.int64),
                                -np.ones(all_on.size, np.int64)])
        order = np.lexsort((delta, pts))         # ends before starts at ties
        peak = int(np.cumsum(delta[order]).max())
        if peak > (2 if overlaps else 1):
            raise ValueError(
                "more than the allowed number of simultaneously active "
                "neurons - not a valid path of this state space")

    # sparse writes only - everything is O(T zeros + n_events * K), never
    # full-array passes (the labels are ~97% silence in production)
    x = np.zeros(T, np.int32)
    ramp = np.arange(1, K, dtype=np.int32)
    moff = np.arange(Km1)
    for n in range(N):
        pos = ons[n]
        if len(pos):
            idx = pos[:, None] + moff[None, :]
            ok = (idx >= 0) & (idx < T)
            x[idx[ok]] = np.broadcast_to(n * Km1 + ramp, idx.shape)[ok]
    if overlaps:
        base = 1 + N * Km1
        for rank, (i, j) in enumerate(_pair_list(N)):
            oi, oj = ons[i], ons[j]
            if not len(oi) or not len(oj):
                continue
            # overlapping ring intervals: |oi - oj| < K-1. One neuron's
            # onsets are >= K apart, so each oi sees at most 2 candidate
            # oj in that window.
            jlo = np.searchsorted(oj, oi - Km1 + 1)
            jhi = np.searchsorted(oj, oi + Km1)
            for d in range(2):
                sel = jlo + d < jhi
                ii = np.nonzero(sel)[0]
                if not len(ii):
                    continue
                a, b = oi[ii], oj[jlo[ii] + d]
                s = np.maximum(a, b)[:, None] + moff[None, :]
                ok = ((s < np.minimum(a, b)[:, None] + Km1)
                      & (s >= 0) & (s < T))
                ids = (base + rank * Km1 * Km1
                       + (s - a[:, None]) * Km1 + (s - b[:, None]))
                x[s[ok]] = ids[ok]
    return x


def _u8(a):
    """Flat uint8 view of an integer/bool array (device-side)."""
    a = jnp.atleast_1d(a)
    if a.dtype == jnp.uint8:
        return a.reshape(-1)
    if a.dtype == jnp.bool_:
        return a.astype(jnp.uint8).reshape(-1)
    return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)


@partial(jax.jit, static_argnames=("L", "H", "overlaps", "block_engine"))
def _ring_overlap_save_events_impl(y, lp, mu, sigma, *, L, H, overlaps,
                                   block_engine):
    """Decode + event extraction as one program. Returns (blob, x): every
    small output is packed into ONE flat uint8 blob — on tunneled/remote
    backends each fetched output pays a host<->device round trip (~tens of
    ms), so the host fetches exactly one buffer; the dense labels x stay
    on the device unless the caller needs the fallback. Blob layout:
    [packed (N*C) | counts (N int32) | x0 (int32) | seam_ok (B-1 bool)]."""
    from ..parallel.overlap_save import _ring_overlap_save_impl

    x, seam_ok = _ring_overlap_save_impl(y, lp, mu, sigma, L=L, H=H,
                                         overlaps=overlaps,
                                         block_engine=block_engine)
    K, N = mu.shape
    packed, counts = extract_onsets_packed(x, N=N, K=K, overlaps=overlaps)
    blob = jnp.concatenate([_u8(packed), _u8(counts),
                            _u8(x[0].astype(jnp.int32)), _u8(seam_ok)])
    return blob, x


def _parse_event_blob(blob, *, T, N, K, B):
    """Host-side inverse of the blob layout above."""
    blob = np.asarray(blob)
    G = event_chunk(K)
    C = -(-T // G)
    o = N * C
    packed = blob[:o].reshape(N, C)
    counts = blob[o : o + 4 * N].view(np.int32)
    o += 4 * N
    x0 = int(blob[o : o + 4].view(np.int32)[0])
    o += 4
    seam_ok = blob[o : o + max(B - 1, 0)].astype(bool)
    return packed, counts, x0, seam_ok


def decode_events_overlap_save(y, lp, mu, sigma, *, L: int, H: int,
                               overlaps: bool, block_engine: str = "auto",
                               return_labels: bool = True):
    """Production decode with sparse event transfer.

    Runs the fully on-device overlap-save decode
    (parallel/overlap_save.ring_overlap_save) and the onset extraction as
    ONE device program, then transfers only the packed events. When every
    seam snapped to silence the labels are reconstructed exactly on the
    host; a flagged seam (or a packing cross-check failure) falls back to
    fetching the dense labels — they are already sitting on the device.

    Returns (onsets list of N int arrays, x (T,) int32 or None,
    seam_ok (B-1,) bool).
    """
    from ..parallel.overlap_save import resolve_block_engine

    lp = jnp.asarray(lp)
    mu = jnp.asarray(mu)
    K, N = mu.shape
    T = int(np.shape(y)[0])
    block_engine = resolve_block_engine(block_engine, overlaps, K, N,
                                        L + 2 * H)
    blob, x_dense = _ring_overlap_save_events_impl(
        jnp.asarray(y), lp, mu, jnp.asarray(sigma), L=L, H=H,
        overlaps=overlaps, block_engine=block_engine)
    B = -(-T // L) if T >= L + 2 * H else 1
    packed, counts, x0, seam_ok = _parse_event_blob(blob, T=T, N=N, K=K,
                                                    B=B)
    if seam_ok.all():
        try:
            onsets = onsets_from_packed(packed, counts, K=K)
            x = (labels_from_onsets(onsets, x0, T=T, N=N,
                                    K=K, overlaps=overlaps)
                 if return_labels else None)
            return onsets, x, seam_ok
        except ValueError:
            pass                                 # fall through to dense
    # raw-cut seams can splice mid-spike: phase continuity (and the >= K
    # onset spacing) is only guaranteed between silent cuts — fetch the
    # dense labels instead
    x = np.asarray(x_dense).astype(np.int32)
    onsets = _onsets_dense(x, N=N, K=K, overlaps=overlaps)
    return onsets, (x if return_labels else None), seam_ok


def _onsets_dense(x, *, N, K, overlaps):
    """Onset lists straight from dense labels (no spacing assumption)."""
    t = np.arange(len(x))
    return [t[np.asarray(phase_of(x, n, N, K, overlaps)) == 1]
            for n in range(N)]


@partial(jax.jit, static_argnames=("L", "H", "overlaps", "block_engine",
                                   "N", "K"))
def _mc_overlap_save_events_impl(es, d, lp, c1, cx, *, L, H, overlaps,
                                 block_engine, N, K):
    from ..parallel.overlap_save import _mc_overlap_save_impl

    x, seam_ok = _mc_overlap_save_impl(es, d, lp, c1, cx, L=L, H=H,
                                       overlaps=overlaps,
                                       block_engine=block_engine)
    packed, counts = extract_onsets_packed(x, N=N, K=K, overlaps=overlaps)
    blob = jnp.concatenate([_u8(packed), _u8(counts),
                            _u8(x[0].astype(jnp.int32)), _u8(seam_ok)])
    return blob, x


def decode_events_mc_overlap_save(yc, lp, mu, sigmas, *, L: int, H: int,
                                  overlaps: bool,
                                  block_engine: str = "auto",
                                  return_labels: bool = True):
    """Multi-channel production decode with sparse event transfer: same
    contract as decode_events_overlap_save, over the joint (T, C) model
    (parallel/overlap_save.mc_overlap_save)."""
    from ..parallel.overlap_save import _mc_prepare

    K, N, _ = np.shape(mu)
    T = int(np.shape(yc)[0])
    es, d, lp_d, c1, cx, block_engine = _mc_prepare(
        yc, lp, mu, sigmas, L=L, H=H, overlaps=overlaps,
        block_engine=block_engine)
    blob, x_dense = _mc_overlap_save_events_impl(
        es, d, lp_d, c1, cx, L=L, H=H, overlaps=overlaps,
        block_engine=block_engine, N=N, K=K)
    B = -(-T // L) if T >= L + 2 * H else 1
    packed, counts, x0, seam_ok = _parse_event_blob(blob, T=T, N=N, K=K,
                                                    B=B)
    if seam_ok.all():
        try:
            onsets = onsets_from_packed(packed, counts, K=K)
            x = (labels_from_onsets(onsets, x0, T=T, N=N, K=K,
                                    overlaps=overlaps)
                 if return_labels else None)
            return onsets, x, seam_ok
        except ValueError:
            pass
    x = np.asarray(x_dense).astype(np.int32)
    onsets = _onsets_dense(x, N=N, K=K, overlaps=overlaps)
    return onsets, (x if return_labels else None), seam_ok


def make_events_block_decoder(block_decoder, *, N: int, K: int,
                              overlaps: bool):
    """Wrap a streaming block decoder ((B, W) windows -> (B, W) labels)
    so each device call returns ONE packed event blob instead of the
    dense label batch (parallel/overlap_save.overlap_save_decode_long's
    D2H is all labels; events cut it ~16x at K=60). Each window's decode
    is a valid path by itself (no splicing happens on the device), so the
    host reconstruction below is unconditionally exact."""

    def dec(y_win, sil):
        # two module-level-cached jit dispatches per chunk (the decode and
        # the pack): a per-closure @jax.jit here would RECOMPILE on every
        # driver invocation (fresh closure identity), minutes apiece on
        # remote-compile backends, and eager packing ops would each pay a
        # dispatch round trip per chunk
        return _pack_label_windows(block_decoder(y_win, sil), N=N, K=K,
                                   overlaps=overlaps)

    return dec


@partial(jax.jit, static_argnames=("N", "K", "overlaps"))
def _pack_label_windows(xb, *, N, K, overlaps):
    packed, counts = jax.vmap(
        partial(extract_onsets_packed, N=N, K=K, overlaps=overlaps))(xb)
    return jnp.concatenate([_u8(packed), _u8(counts),
                            _u8(xb[:, 0].astype(jnp.int32))])


def unpack_window_blob(blob, *, B: int, W: int, N: int, K: int,
                       overlaps: bool) -> np.ndarray:
    """Host-side inverse of make_events_block_decoder: (B, W) int32
    labels, bit-equal to the dense block decode."""
    blob = np.asarray(blob)
    G = event_chunk(K)
    C = -(-W // G)
    o = B * N * C
    packed = blob[:o].reshape(B, N, C)
    counts = blob[o : o + 4 * B * N].view(np.int32).reshape(B, N)
    x0 = blob[o + 4 * B * N : o + 4 * B * N + 4 * B].view(np.int32)
    out = np.empty((B, W), np.int32)
    for b in range(B):
        onsets = onsets_from_packed(packed[b], counts[b], K=K)
        out[b] = labels_from_onsets(onsets, int(x0[b]), T=W, N=N, K=K,
                                    overlaps=overlaps)
    return out


@partial(jax.jit, static_argnames=("L", "H", "overlaps", "block_engine"))
def _ring_overlap_save_batched_events_impl(ys, lp, mu, sigma, *, L, H,
                                           overlaps, block_engine):
    """Channel-batched decode + event extraction as one program. Blob
    layout: [packed (Ch*N*C) | counts (Ch*N int32) | x0 (Ch int32) |
    seam_ok (Ch*(B-1) bool)]."""
    from ..parallel.overlap_save import _ring_overlap_save_batched_impl

    xs, seam_ok = _ring_overlap_save_batched_impl(
        ys, lp, mu, sigma, L=L, H=H, overlaps=overlaps,
        block_engine=block_engine)
    K, N = mu.shape
    packed, counts = jax.vmap(
        partial(extract_onsets_packed, N=N, K=K, overlaps=overlaps))(xs)
    blob = jnp.concatenate([_u8(packed), _u8(counts),
                            _u8(xs[:, 0].astype(jnp.int32)), _u8(seam_ok)])
    return blob, xs


def decode_events_overlap_save_batched(ys, lp, mu, sigma, *, L: int,
                                       H: int, overlaps: bool,
                                       block_engine: str = "auto",
                                       return_labels: bool = True):
    """Channel-batched production decode with sparse event transfer: the
    (Ch, T) recording batch decodes as ONE device program
    (parallel/overlap_save.ring_overlap_save_batched) and one event blob
    comes back — the dense (Ch, T) label transfer it replaces grows with
    the channel count and dominates wall time well before the device does.

    Returns (onsets: list of Ch lists of N int arrays, xs (Ch, T) int32
    or None, seam_ok (Ch, B-1) bool). Channels whose seams all snapped
    reconstruct from events; any flagged channel falls back to the dense
    fetch (one extra transfer for the whole batch).
    """
    from ..parallel.overlap_save import resolve_block_engine

    ys = jnp.asarray(ys)
    lp = jnp.asarray(lp)
    mu = jnp.asarray(mu)
    K, N = mu.shape
    Ch, T = ys.shape
    if T < L + 2 * H:
        raise ValueError("signal shorter than one window; decode directly")
    G = event_chunk(K)
    C = -(-T // G)
    B = -(-T // L)
    block_engine = resolve_block_engine(block_engine, overlaps, K, N,
                                        L + 2 * H)
    blob, xs_dense = _ring_overlap_save_batched_events_impl(
        ys, lp, mu, jnp.asarray(sigma), L=L, H=H, overlaps=overlaps,
        block_engine=block_engine)
    blob = np.asarray(blob)
    o = Ch * N * C
    packed = blob[:o].reshape(Ch, N, C)
    counts = blob[o : o + 4 * Ch * N].view(np.int32).reshape(Ch, N)
    o += 4 * Ch * N
    x0 = blob[o : o + 4 * Ch].view(np.int32)
    o += 4 * Ch
    seam_ok = blob[o : o + Ch * max(B - 1, 0)].astype(bool).reshape(
        Ch, max(B - 1, 0))

    xs_np = None
    onsets, xs = [], []
    for c in range(Ch):
        ok = bool(seam_ok[c].all())
        if ok:
            try:
                on = onsets_from_packed(packed[c], counts[c], K=K)
                onsets.append(on)
                if return_labels:
                    xs.append(labels_from_onsets(on, int(x0[c]), T=T, N=N,
                                                 K=K, overlaps=overlaps))
                continue
            except ValueError:
                pass
        if xs_np is None:
            xs_np = np.asarray(xs_dense).astype(np.int32)
        onsets.append(_onsets_dense(xs_np[c], N=N, K=K, overlaps=overlaps))
        if return_labels:
            xs.append(xs_np[c])
    return onsets, (np.stack(xs) if return_labels else None), seam_ok
