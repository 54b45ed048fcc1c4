"""Public model-fitting API: the framework's equivalent of the reference's
StatsBase verbs (src/fit.jl).

* `HMMTemplateModel` — learned templates + noise + onset probs (reference
  `HMMSpikeTemplateModel`, src/types.jl:15-19).
* `HMMSpikingModel` — a decoded spike train over a signal (reference
  `HMMSpikingModel`, src/types.jl:21-37).
* `fit_template_model` — EM training (reference fit.jl:44-47).
* `fit_spiking_model` — Viterbi decode, whole-signal or chunked
  (reference fit.jl:6-9 and the chunked variant fit.jl:11-42).
* `predict` — reconstruction (fit.jl:54-56), `bic` (fit.jl:68-72),
  `loglikelihood` (types.jl:32).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..config import UNSET, _section, pick
from ..core.emission import state_means
from ..core.reconstruction import reconstruct_signal
from ..core.state_space import StateSpace, build_state_space
from ..core.viterbi import viterbi_decode
from ..train.em import TrainResult, train_model

# One-shot overlap-save programs are compiled per (T, L, H) shape and XLA
# compile time grows superlinearly with the block count (512+-block
# programs take minutes on remote-compile backends); past this many blocks
# the fast path auto-switches to the fixed-shape streaming driver.
MAX_ONESHOT_BLOCKS = 256


@dataclasses.dataclass
class HMMTemplateModel:
    """Learned spike-template model (reference HMMSpikeTemplateModel).

    mu: (K, N) templates (row 0 = silence); sigma: noise std; lp: (N,) onset
    log-probs; allow_overlaps controls the *decode* state space (the
    reference decodes the CLI path with overlaps on, hmmsort.jl:57, while
    training is always non-overlap).
    """

    mu: np.ndarray
    sigma: float
    lp: np.ndarray
    allow_overlaps: bool = False
    pi: np.ndarray | None = None

    def __post_init__(self):
        self.mu = np.asarray(self.mu, dtype=np.float64)
        self.lp = np.asarray(self.lp, dtype=np.float64)

    @property
    def K(self) -> int:
        return self.mu.shape[0]

    @property
    def n_neurons(self) -> int:
        return self.mu.shape[1]

    @property
    def state_space(self) -> StateSpace:
        return build_state_space(self.n_neurons, self.K, self.allow_overlaps)

    def decode_tables(self, dtype=jnp.float64):
        """Device arrays for the Viterbi engine: (in_idx, in_w, state_mu)."""
        ss = self.state_space
        in_idx, in_w = ss.in_table(self.lp)
        smu = state_means(jnp.asarray(ss.states), jnp.asarray(self.mu, dtype))
        return jnp.asarray(in_idx), jnp.asarray(in_w, dtype), smu

    @property
    def has_ring_engine(self) -> bool:
        """True: a gather-free ring engine exists for every topology
        (non-overlap any N; pairwise overlap any N via the table-driven
        ops/ring_viterbi_ovn). Kept as a property for API stability."""
        return True


@dataclasses.dataclass
class HMMSpikingModel:
    """A decoded spike train (reference HMMSpikingModel, types.jl:21-37)."""

    template_model: HMMTemplateModel
    ml_seq: np.ndarray  # (T,) int decoded combined-state sequence (0-based)
    ll: float           # reference's cumulative-score sum (viterbi.jl:92-96)
    y: np.ndarray       # the decoded signal

    @property
    def loglikelihood(self) -> float:
        return self.ll


def fit_template_model(
    y,
    n_neurons: int | None = None,
    K: int | None = None,
    nsteps: int | None = None,
    *,
    rng: np.random.Generator | None = None,
    verbose: int = 0,
    config=None,
    **kwargs,
) -> HMMTemplateModel:
    """EM-train a template model (reference fit.jl:44-47 -> train_model).

    A config.Config supplies defaults for anything not passed explicitly
    (this entry point's historical nsteps default is 10, vs train_model's
    reference 8 — preserved when neither kwarg nor config specify it;
    TrainConfig.nsteps defaults to None, so a config that only touches
    other sections does not silently change the training schedule)."""
    if nsteps is None and (config is None or config.train is None
                          or config.train.nsteps is None):
        nsteps = 10
    res: TrainResult = train_model(
        y, n_neurons, K, nsteps, rng=rng, verbose=verbose, config=config,
        **kwargs)
    return HMMTemplateModel(mu=res.mu, sigma=res.sigma, lp=res.lp, pi=res.pi)


def refit_template_model(model: HMMTemplateModel, y, nsteps: int,
                         *, verbose: int = 0) -> HMMTemplateModel:
    """Warm-start EM from an existing model (reference fit! at fit.jl:49-52)."""
    from ..train.em import _em_phase

    lp, pi, mu, sigma, _ = _em_phase(
        np.asarray(y, np.float64), model.lp, model.mu, model.sigma, nsteps,
        model.K, dtype=jnp.float64, verbose=verbose)
    return HMMTemplateModel(mu=mu, sigma=sigma, lp=lp, pi=pi,
                            allow_overlaps=model.allow_overlaps)


def _all_silent_model(templates, y, sigmas,
                      transfer: str = "dense") -> HMMSpikingModel:
    """Degenerate pure-noise decode for n_neurons == 0 (training can prune
    every template; the reference CLI returns a null model on no
    spikeForms, hmmsort.jl:40-45). The decode is all-silent and ll keeps
    the reference cumulative-score contract (viterbi.jl:92-96) via the
    telescoped path score — the same formula every other decode path
    reports, so bic()/ll comparisons against N >= 1 models stay on one
    scale."""
    from ..core.path_score import path_cumulative_ll, path_cumulative_ll_mc

    y = np.asarray(y)
    x = np.zeros(len(y), np.int32)
    states = templates.state_space.states
    if y.ndim == 2:
        ll = path_cumulative_ll_mc(y, x, states, templates.mu, sigmas,
                                   templates.lp)
    else:
        ll = path_cumulative_ll(y, x, states, templates.mu, float(sigmas),
                                templates.lp)
    model = HMMSpikingModel(templates, x, float(ll), y)
    # the fast paths set these on every other return; keep the contract
    model.seam_ok = np.ones(0, bool)
    model.seams_repaired = 0
    model.spike_onsets = [] if transfer == "events" else None
    return model


def fit_spiking_model(
    templates: HMMTemplateModel,
    y,
    chunksize=UNSET,
    *,
    progress=None,
    config=None,
) -> HMMSpikingModel:
    """Viterbi MAP decode (reference fit.jl:6-9; chunked: fit.jl:11-42).

    chunksize resolution: explicit kwarg (None = whole-signal) > a
    config.Config's decode.chunksize > whole-signal.

    The chunked variant reproduces the reference's silence-snapping boundary
    protocol exactly: after decoding a chunk, the left edge skips any
    non-silent prefix (unless it is the signal start) and the right edge
    retracts to the last silent state, so chunk seams always cut at the
    all-silent state. `ll` accumulates whole-chunk scores (including
    retracted tails) — a reference quirk we reproduce (fit.jl:37).
    """
    dc = _section(config, "decode")
    chunksize = pick(chunksize, dc("chunksize"), None)
    y = np.asarray(y, dtype=np.float64)
    if templates.n_neurons == 0:
        return _all_silent_model(templates, y, templates.sigma)
    decode = _decoder_for(templates)
    if chunksize is None or chunksize >= len(y):
        x, ll = decode(y)
        return HMMSpikingModel(templates, np.asarray(x), float(ll), y)
    ml_seq, ll = _chunked_decode(y, decode, chunksize, progress)
    return HMMSpikingModel(templates, ml_seq, ll, y)


def _chunked_decode(y, decode, chunksize, progress=None):
    """The reference's silence-snapping chunk loop (fit.jl:11-42), shared by
    the single- and multi-channel chunked decodes. y's leading axis is
    time; decode maps a time slice to (labels, ll)."""
    n = len(y)
    ml_seq = np.zeros(n, dtype=np.int64)  # 0 == all-silent
    ll = 0.0
    i = 0
    while i < n - 1:
        j = min(i + chunksize, n)
        x, _ll = decode(y[i:j])
        x = np.asarray(x)
        l = 0
        if i > 0:  # skip a non-silent prefix: we must start from silence
            while l < len(x) and x[l] > 0:
                l += 1
        if j < n:  # retract the right edge back to the last silent state
            k = len(x)
            while k > l and x[k - 1] > 0:
                k -= 1
                j -= 1
        else:
            k = len(x)
        if j <= i:
            raise RuntimeError(
                f"chunk [{i}, {j + (len(x) - k)}) contains no silent state to "
                "snap to; increase chunksize")
        ml_seq[i + l : j] = x[l:k]
        ll += float(_ll)
        i = j
        if progress is not None:
            progress(i, n)
    return ml_seq, ll


def _decoder_for(templates: HMMTemplateModel):
    """Engine dispatch: ring engines (gather-free, bit-identical) when the
    topology supports them, else the generic in-edge-table scan."""
    sigma = templates.sigma
    if templates.has_ring_engine:
        from ..ops.ring_viterbi import ring_viterbi_nov, ring_viterbi_ov2
        from ..ops.ring_viterbi_ovn import ring_viterbi_ovn

        # N < 2 has no pairs: the overlap space IS the non-overlap space
        # (types.jl:65-92 enumerates zero pair columns), so the nov
        # engine is exact there and the pair engines need not handle it
        if not templates.allow_overlaps or templates.n_neurons < 2:
            engine = ring_viterbi_nov
        elif templates.n_neurons == 2:
            engine = ring_viterbi_ov2
        else:
            engine = ring_viterbi_ovn
        lp_d = jnp.asarray(templates.lp)
        mu_d = jnp.asarray(templates.mu)
        return lambda yy: engine(jnp.asarray(yy), lp_d, mu_d, sigma)
    in_idx, in_w, smu = templates.decode_tables()
    return lambda yy: viterbi_decode(jnp.asarray(yy), in_idx, in_w, smu,
                                     sigma)


def fit_spiking_model_fast(templates: HMMTemplateModel, y, *,
                           L: int | None = None,
                           H: int | None = None,
                           streaming: bool | None = None,
                           blocks_per_call: int | None = None,
                           prefetch: int | None = None,
                           repair: bool | None = None,
                           block_engine: str | None = None,
                           transfer: str | None = None,
                           config=None) -> HMMSpikingModel:
    """Production decode: fully on-device parallel overlap-save with the
    ring engines (parallel/overlap_save.ring_overlap_save) — orders of
    magnitude faster than the sequential chunked path at matching labels.

    streaming=True uses the host-driven block-batch driver instead
    (overlap_save_decode_long): slightly lower steady-state throughput, but
    the compiled program shape is (blocks_per_call, L+2H) — *independent of
    the recording length* — so one compile serves any T (the one-shot jit
    path compiles per T, which can take minutes for multi-M-sample programs
    on remote-compile backends). Also bounds device memory for recordings
    whose backpointers would not fit. `prefetch` chunk calls are kept in
    flight (double-buffering): the next chunk's host window build + H2D
    transfer and the previous chunk's label fetch overlap device compute.

    streaming=None (the default) auto-selects: recordings longer than
    256 overlap-save blocks (T > 256*L) stream through the fixed-shape
    driver — XLA compile time grows superlinearly with the one-shot
    program's block count (512+-block programs take minutes on
    remote-compile backends) while 256-block programs stay in the
    tens of seconds and the compile is amortized over every later call.
    Labels are identical either way (same windows, same seam protocol).

    The reference's cumulative-score ll (src/viterbi.jl:92-96) is computed
    for every topology via the O(T) telescoped path score
    (core/path_score.py) — along a backtrace path the T1 reads are prefix
    sums of local transition+emission increments, so no S^2 operators are
    needed even on overlap spaces. It equals the sequential engine's ll
    whenever the labels agree; an unrepaired raw seam can make it -inf
    (the path crosses an invalid transition — an honest signal).

    transfer="events" (one-shot path only) fetches the packed spike-onset
    grid instead of the dense labels and reconstructs them exactly on the
    host (core/events.py) — a lossless ~16x-smaller transfer that wins
    when the device->host label copy dominates wall time (tunneled or
    PCIe-remote backends). Labels, ll, and seam handling are identical;
    the decoded onsets are additionally exposed as `model.spike_onsets`.

    repair=True (default) re-decodes any seam that found no common silence
    over geometrically widening windows until a silence certificate exists
    on both sides (parallel/seam_repair.py) — the analog of the reference
    chunker's retract-arbitrarily-far protocol (src/fit.jl:24-35), so dense
    spiking regions keep the exactness guarantee. The returned model's
    `seam_ok` reflects the post-repair state; `seams_repaired` counts the
    flagged seams. Requires a ring-capable topology
    (templates.has_ring_engine).
    """
    from ..parallel.overlap_save import ring_overlap_save

    dc = _section(config, "decode")

    def arg(v, field, default):
        return pick(UNSET if v is None else v, dc(field), default)

    L = arg(L, "L", 8192)
    H = arg(H, "H", None)
    streaming = arg(streaming, "streaming", None)
    blocks_per_call = arg(blocks_per_call, "blocks_per_call", 256)
    prefetch = arg(prefetch, "prefetch", 2)
    repair = arg(repair, "repair", True)
    block_engine = arg(block_engine, "block_engine", "auto")
    transfer = arg(transfer, "transfer", "dense")
    if transfer not in ("dense", "events"):
        raise ValueError(f"unknown transfer mode {transfer!r}")

    # integer recordings (int16 ADC data is the common on-disk format)
    # ship to the device RAW and are cast in-graph: float32(int16) is
    # exact, so labels are identical to a host-side float cast while the
    # host->device transfer — the long-recording bottleneck — halves.
    # Host-side math (ll replay, seam repair) uses the float64 view.
    y_raw = np.asarray(y)
    int_input = np.issubdtype(y_raw.dtype, np.integer)
    y = y_raw.astype(np.float64)
    if templates.n_neurons == 0:
        return _all_silent_model(templates, y, templates.sigma,
                                 transfer=transfer)
    if H is None:
        H = max(4 * templates.K, 64)
    if streaming is None:
        # auto: one-shot programs cap at 256 blocks (compile time grows
        # superlinearly with block count on remote-compile backends);
        # longer recordings stream through the fixed-shape driver
        streaming = len(y) > MAX_ONESHOT_BLOCKS * L
    if streaming and len(y) < L + 2 * H:
        streaming = False          # shorter than one window: decode one-shot
    if streaming:
        from ..ops.ring_viterbi import ring_block_decoder
        from ..parallel.overlap_save import (overlap_save_decode_long,
                                             resolve_block_engine)

        if block_engine == "auto":
            block_engine = resolve_block_engine(
                "auto", templates.allow_overlaps, templates.K,
                templates.n_neurons, L + 2 * H)
        dec = ring_block_decoder(templates.lp, templates.mu, templates.sigma,
                                 overlaps=templates.allow_overlaps,
                                 block_engine=block_engine)
        # tables at the default dtype so the streaming window dtype matches
        # the one-shot path (f64 on CPU-x64, f32 on TPU) — a f32 window fed
        # to the f64 ring decoder could flip labels near score ties
        in_idx, in_w, smu = templates.decode_tables()
        espec = ((templates.n_neurons, templates.K,
                  templates.allow_overlaps)
                 if transfer == "events" and templates.has_ring_engine
                 else None)
        x, seam_ok = overlap_save_decode_long(
            y_raw if int_input else y, in_idx, in_w, smu, templates.sigma,
            L=L, H=H, blocks_per_call=blocks_per_call, block_decoder=dec,
            prefetch=prefetch, event_spec=espec,
            window_dtype=(y_raw.dtype if int_input else None))
        spike_onsets = None
    elif transfer == "events" and templates.has_ring_engine:
        from ..core.events import decode_events_overlap_save

        spike_onsets, x, seam_ok = decode_events_overlap_save(
            y_raw if int_input else y, templates.lp, templates.mu,
            templates.sigma, L=L, H=H,
            overlaps=templates.allow_overlaps, block_engine=block_engine)
    else:
        x, seam_ok = ring_overlap_save(y_raw if int_input else y,
                                       templates.lp, templates.mu,
                                       templates.sigma, L=L, H=H,
                                       overlaps=templates.allow_overlaps,
                                       block_engine=block_engine)
        spike_onsets = None
    from ..core.path_score import path_cumulative_ll

    x = np.asarray(x)
    seam_ok = np.asarray(seam_ok)
    n_repaired = 0
    if repair and not seam_ok.all():
        from ..parallel.seam_repair import make_window_decoder, repair_seams

        dec = make_window_decoder(templates.lp, templates.mu,
                                  templates.sigma,
                                  overlaps=templates.allow_overlaps)
        failed = (np.nonzero(~seam_ok)[0] + 1) * L
        x, _ = repair_seams(y, x, failed, dec, H=H)
        n_repaired = int((~seam_ok).sum())
        seam_ok = np.ones_like(seam_ok)
        spike_onsets = None          # repair rewrote labels; recompute below
    ll = path_cumulative_ll(y, x, templates.state_space.states,
                            templates.mu, templates.sigma, templates.lp)
    model = HMMSpikingModel(templates, x, ll, y)
    model.seam_ok = seam_ok
    model.seams_repaired = n_repaired
    if spike_onsets is None and transfer == "events":
        from ..core.events import _onsets_dense

        spike_onsets = _onsets_dense(x, N=templates.n_neurons,
                                     K=templates.K,
                                     overlaps=templates.allow_overlaps)
    model.spike_onsets = spike_onsets
    return model


def fit(y, n_neurons: int = 3, K: int = 60, nsteps: int = 10,
        **kwargs) -> HMMSpikingModel:
    """Train then decode (reference composite fit, fit.jl:1-4)."""
    templates = fit_template_model(y, n_neurons, K, nsteps, **kwargs)
    return fit_spiking_model(templates, y)


def fit_spiking_model_adaptive(templates: HMMTemplateModel, y, *,
                               chunk: int = 32768, forget: float = 0.3,
                               inner_steps: int = 1, H: int | None = None,
                               repair: bool = True,
                               fb_mode: str | None = None,
                               transfer: str = "dense"
                               ) -> HMMSpikingModel:
    """Drift-adaptive decode: track the templates through the recording
    with online EM (train/adaptive.track_drift — sufficient-statistic
    blending with exponential forgetting), then decode every chunk with
    ITS OWN adapted templates in one parallel overlap-save program
    (train/adaptive.decode_tracked).

    Use when waveforms drift over the recording (electrode micro-motion):
    a stationary decode double-counts or misses drifted spikes; the
    tracked decode follows them (tests/test_adaptive.py shows a 2x
    amplitude drift going from dozens of onset errors to zero). The
    returned model carries the fast-path extras (`seam_ok`,
    `seams_repaired`, `spike_onsets`) plus `track`, the per-chunk
    parameter trajectory (its `lls` are a drift monitor). No reference
    analog (the reference fits templates once and assumes stationarity).
    """
    from ..train.adaptive import decode_tracked, track_drift

    if templates.n_neurons == 0:
        # training can prune every template; keep the stationary paths'
        # degenerate-null contract (valid all-silent model, finite ll)
        return _all_silent_model(templates, np.asarray(y, np.float64),
                                 templates.sigma, transfer="events")
    tr = track_drift(templates, y, chunk=chunk, forget=forget,
                     inner_steps=inner_steps, fb_mode=fb_mode)
    return decode_tracked(tr, y, H=H, repair=repair, transfer=transfer)


def predict(model: HMMSpikingModel) -> np.ndarray:
    """Reconstructed (denoised) signal (reference fit.jl:54-56).

    A drift-decoded model (it carries `.track`) reconstructs each chunk
    span with ITS OWN tracked templates — the last chunk's set alone
    would mis-amplitude early spikes under drift."""
    ss = model.template_model.state_space
    states = jnp.asarray(ss.states)
    x = jnp.asarray(model.ml_seq)
    track = getattr(model, "track", None)
    if track is not None and not track.is_mc:
        out = np.empty(len(model.ml_seq))
        for c, (s, e) in enumerate(track.bounds):
            out[s:e] = np.asarray(reconstruct_signal(
                x[s:e], states, jnp.asarray(track.mu[c])))
        return out
    return np.asarray(reconstruct_signal(
        x, states, jnp.asarray(model.template_model.mu)))


def loglikelihood(model: HMMSpikingModel) -> float:
    return model.ll


def bic(model: HMMSpikingModel) -> float:
    """log(n)*k - 2*ll with k = |mu| + 1 + N (reference fit.jl:68-72)."""
    tm = model.template_model
    k = tm.mu.size + 1 + tm.n_neurons
    n = len(model.ml_seq)
    return math.log(n) * k - 2.0 * model.ll


def model_response(model: HMMSpikingModel) -> np.ndarray:
    """The raw decoded signal (reference model_response, src/types.jl:33)."""
    return model.y


def fit_spiking_models_fast_batched(templates: HMMTemplateModel, ys, *,
                                    L: int | None = None,
                                    H: int | None = None,
                                    repair: bool | None = None,
                                    block_engine: str | None = None,
                                    transfer: str | None = None,
                                    config=None) -> list[HMMSpikingModel]:
    """Channel-batched production decode: (C, T) recordings, one shared
    template model, ONE device program for every channel's blocks
    (parallel/overlap_save.ring_overlap_save_batched — the single-chip DP
    axis; the reference CLI only ever decodes channel 1, hmmsort.jl:56).

    Returns a list of C HMMSpikingModel with per-channel seam flags,
    repair, and the telescoped ll, identical to running
    fit_spiking_model_fast per channel."""
    dc = _section(config, "decode")

    def arg(v, field, default):
        return pick(UNSET if v is None else v, dc(field), default)

    L = arg(L, "L", 8192)
    H = arg(H, "H", None)
    repair = arg(repair, "repair", True)
    block_engine = arg(block_engine, "block_engine", "auto")
    transfer = arg(transfer, "transfer", "dense")
    if transfer not in ("dense", "events"):
        raise ValueError(f"unknown transfer mode {transfer!r}")
    if H is None:
        H = max(4 * templates.K, 64)

    from ..core.path_score import path_cumulative_ll
    from ..parallel.overlap_save import ring_overlap_save_batched

    ys_raw = np.asarray(ys)
    int_input = np.issubdtype(ys_raw.dtype, np.integer)
    ys = ys_raw.astype(np.float64)
    if ys.shape[1] < L + 2 * H:
        # shorter than one window: per-channel one-shot exact decode
        return [fit_spiking_model_fast(templates, row, L=L, H=H,
                                       repair=repair,
                                       block_engine=block_engine,
                                       transfer=transfer)
                for row in ys]
    ys_dev = ys_raw if int_input else ys    # raw ints: in-graph cast is exact
    all_onsets = None
    if transfer == "events" and templates.has_ring_engine:
        from ..core.events import decode_events_overlap_save_batched

        all_onsets, xs, oks = decode_events_overlap_save_batched(
            ys_dev, templates.lp, templates.mu, templates.sigma, L=L, H=H,
            overlaps=templates.allow_overlaps, block_engine=block_engine)
    else:
        xs, oks = ring_overlap_save_batched(
            ys_dev, templates.lp, templates.mu, templates.sigma, L=L, H=H,
            overlaps=templates.allow_overlaps, block_engine=block_engine)
    xs = np.asarray(xs)
    oks = np.asarray(oks)
    models = []
    for c in range(len(ys)):
        x, ok = xs[c], oks[c]
        n_rep = 0
        if repair and not ok.all():
            from ..parallel.seam_repair import (make_window_decoder,
                                                repair_seams)

            dec = make_window_decoder(templates.lp, templates.mu,
                                      templates.sigma,
                                      overlaps=templates.allow_overlaps)
            failed = (np.nonzero(~ok)[0] + 1) * L
            x, _ = repair_seams(ys[c], x, failed, dec, H=H)
            n_rep = int((~ok).sum())
            ok = np.ones_like(ok)
        ll = path_cumulative_ll(ys[c], x, templates.state_space.states,
                                templates.mu, templates.sigma, templates.lp)
        m = HMMSpikingModel(templates, x, ll, ys[c])
        m.seam_ok = ok
        m.seams_repaired = n_rep
        if transfer == "events":
            if n_rep or all_onsets is None:
                from ..core.events import _onsets_dense

                m.spike_onsets = _onsets_dense(
                    x, N=templates.n_neurons, K=templates.K,
                    overlaps=templates.allow_overlaps)
            else:
                m.spike_onsets = all_onsets[c]
        models.append(m)
    return models


def fit_template_models_batched(ys, n_neurons: int, K: int, nsteps: int,
                                mesh, *, rng=None, L: int = 256,
                                surgery: bool = True,
                                fb_mode: str = "blocked"):
    """Train independent template models for a channel batch on a
    (channel, time) mesh via the distributed EM step
    (parallel/sharded_em.py) — dp over channels, sp over time.

    ys: (C, T) with T a multiple of mesh.shape['time'] * L. Runs `nsteps`
    sharded EM iterations from per-channel random inits, then (optionally)
    the reference's host-side merge/prune per channel followed by per-
    channel refinement. Returns a list of C HMMTemplateModel.

    New capability — the reference CLI only ever processes channel 1
    (src/hmmsort.jl:56).
    """
    from ..core.state_space import build_state_space
    from ..parallel.sharded_em import sharded_em_step
    from ..train import template_ops
    from ..train.em import EMTables, init_templates

    if rng is None:
        rng = np.random.default_rng()
    ys = np.asarray(ys, dtype=np.float64)
    C, T = ys.shape
    p0 = 2.0 ** (-3.0 * K / 2.0)
    sigmas = ys.std(axis=1)
    lps = np.tile(np.log(p0), (C, n_neurons))
    mus = np.stack([init_templates(K, n_neurons, float(sigmas[c]), rng)
                    for c in range(C)])
    ss = build_state_space(n_neurons, K, False)
    tables = EMTables.build(ss)

    for _ in range(nsteps):
        out = sharded_em_step(ys, lps, mus, sigmas, tables, mesh, K=K, L=L,
                              fb_mode=fb_mode)
        lps, _, mus, sigmas = (np.asarray(out[0]), out[1],
                               np.asarray(out[2]), np.asarray(out[3]))

    models = []
    for c in range(C):
        mu_c, lp_c, sg_c = mus[c], lps[c], float(sigmas[c])
        if surgery:
            mu_c, lp_c = template_ops.condense_templates(mu_c, lp_c, sg_c)
            keep = template_ops.remove_sparse(lp_c)
            mu_c, lp_c = mu_c[:, keep], lp_c[keep]
            keep = template_ops.remove_small(mu_c, sg_c)
            mu_c, lp_c = mu_c[:, keep], lp_c[keep]
            if mu_c.shape[1] > 0:
                m = refit_template_model(
                    HMMTemplateModel(mu=mu_c, sigma=sg_c, lp=lp_c),
                    ys[c], max(nsteps // 2, 1))
                models.append(m)
                continue
        models.append(HMMTemplateModel(mu=mu_c, sigma=sg_c, lp=lp_c))
    return models
