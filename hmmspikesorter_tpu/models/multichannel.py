"""Multi-channel model API — a capability extension beyond the reference.

The reference's CLI receives multi-channel templates (`spikeForms` is
(K, nchan, N), src/hmmsort.jl:46-56) and discards every channel except the
first. This module keeps them all: each neuron has a per-channel template,
the observation is the (T, C) multi-electrode trace, and decoding uses the
joint per-channel Gaussian evidence (core/emission_mc.py) — strictly more
information, so templates that are ambiguous on one electrode but distinct
across the array decode correctly (tested: tests/test_multichannel.py).

API mirrors the single-channel verbs (models/api.py):

* `HMMTemplateModelMC` — (K, N, C) templates + (C,) noise + onset probs.
* `fit_spiking_model_mc` — whole-signal / chunked Viterbi decode (the
  reference chunk protocol, fit.jl:11-42, shared via _chunked_decode).
* `fit_spiking_model_mc_fast` — parallel overlap-save decode with the
  structured MC ring engines (ops/ring_viterbi_mc.py), same seam protocol
  and automatic repair as the single-channel fast path.
* `predict_mc` — per-channel reconstruction (the C-channel generalization
  of src/reconstruction.jl).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.emission_mc import state_means_mc
from ..core.path_score import path_cumulative_ll_mc
from ..core.state_space import StateSpace, build_state_space
from .api import HMMSpikingModel, _chunked_decode


@dataclasses.dataclass
class HMMTemplateModelMC:
    """Multi-channel spike-template model.

    mu: (K, N, C) per-channel templates (row 0 = per-channel silence
    contribution); sigmas: (C,) per-channel noise stds; lp: (N,) onset
    log-probs; allow_overlaps controls the decode state space (the
    combined-state topology is channel-independent).
    """

    mu: np.ndarray
    sigmas: np.ndarray
    lp: np.ndarray
    allow_overlaps: bool = False

    def __post_init__(self):
        self.mu = np.asarray(self.mu, dtype=np.float64)
        self.sigmas = np.atleast_1d(np.asarray(self.sigmas,
                                               dtype=np.float64))
        self.lp = np.asarray(self.lp, dtype=np.float64)
        if self.mu.ndim != 3:
            raise ValueError("mu must be (K, N, C)")
        if self.sigmas.shape != (self.mu.shape[2],):
            raise ValueError("sigmas must be (C,) matching mu's channels")

    @property
    def K(self) -> int:
        return self.mu.shape[0]

    @property
    def n_neurons(self) -> int:
        return self.mu.shape[1]

    @property
    def n_channels(self) -> int:
        return self.mu.shape[2]

    @property
    def state_space(self) -> StateSpace:
        return build_state_space(self.n_neurons, self.K, self.allow_overlaps)

    def channel(self, c: int):
        """Single-channel projection of this model (what the reference's
        channel-1-only pipeline would see for c = 0)."""
        from .api import HMMTemplateModel

        return HMMTemplateModel(mu=self.mu[:, :, c],
                                sigma=float(self.sigmas[c]), lp=self.lp,
                                allow_overlaps=self.allow_overlaps)


def _mc_engine_for(templates: HMMTemplateModelMC):
    """Structured ring MC engine for the model's topology (non-overlap any
    N; pairwise-overlap N=2 specialized, any N table-driven) — the single
    dispatch every MC decode/repair path shares."""
    from ..ops.ring_viterbi_mc import (ring_viterbi_nov_mc,
                                      ring_viterbi_ov2_mc,
                                      ring_viterbi_ovn_mc)

    # N < 2 has no pairs: overlap space == non-overlap space, nov is exact
    if not templates.allow_overlaps or templates.n_neurons < 2:
        return ring_viterbi_nov_mc
    if templates.n_neurons == 2:
        return ring_viterbi_ov2_mc
    return ring_viterbi_ovn_mc


def _mc_decoder_for(templates: HMMTemplateModelMC):
    """Whole-signal decode: the MC mirror of the single-channel dispatch."""
    engine = _mc_engine_for(templates)
    lp, mu, sigmas = templates.lp, templates.mu, templates.sigmas
    return lambda yy: engine(yy, lp, mu, sigmas)


def fit_spiking_model_mc(templates: HMMTemplateModelMC, yc,
                         chunksize: int | None = None,
                         *, progress=None) -> HMMSpikingModel:
    """Multi-channel Viterbi MAP decode; chunksize enables the reference's
    silence-snapping chunk protocol (fit.jl:11-42). yc: (T, C)."""
    yc = np.asarray(yc, dtype=np.float64)
    if yc.ndim != 2 or yc.shape[1] != templates.n_channels:
        raise ValueError(f"yc must be (T, {templates.n_channels})")
    if templates.n_neurons == 0:
        from .api import _all_silent_model

        return _all_silent_model(templates, yc, templates.sigmas)
    decode = _mc_decoder_for(templates)
    if chunksize is None or chunksize >= len(yc):
        x, ll = decode(yc)
        return HMMSpikingModel(templates, np.asarray(x), float(ll), yc)
    ml_seq, ll = _chunked_decode(yc, decode, chunksize, progress)
    return HMMSpikingModel(templates, ml_seq, ll, yc)


def fit_spiking_model_mc_fast(templates: HMMTemplateModelMC, yc, *,
                              L: int = 8192, H: int | None = None,
                              streaming: bool | None = None,
                              blocks_per_call: int = 256,
                              prefetch: int = 2,
                              repair: bool = True,
                              transfer: str = "dense") -> HMMSpikingModel:
    """Production multi-channel decode: parallel overlap-save with the
    structured MC ring engines (parallel/overlap_save.mc_overlap_save),
    automatic seam repair, and the telescoped reference ll
    (core/path_score.path_cumulative_ll_mc). Every topology is supported
    (non-overlap any N; pairwise-overlap N=2 specialized, any N
    table-driven).

    streaming mirrors the single-channel fast path: None (default)
    auto-routes recordings past MAX_ONESHOT_BLOCKS overlap-save blocks
    through the fixed-shape host driver (one compile serves any T —
    raw (B, W, C) windows stream to the device and the channel-collapsing
    projection runs per block, ops/ring_viterbi_mc.mc_block_decoder);
    True/False force either path. Labels are identical.

    transfer="events" fetches the packed spike-onset grid instead of the
    dense labels (core/events.py — exact host reconstruction, decoded
    onsets exposed as model.spike_onsets), on both the one-shot and the
    streaming path."""
    from ..parallel.overlap_save import mc_overlap_save

    if transfer not in ("dense", "events"):
        raise ValueError(f"unknown transfer mode {transfer!r}")
    yc = np.asarray(yc, dtype=np.float64)
    if yc.ndim != 2 or yc.shape[1] != templates.n_channels:
        raise ValueError(f"yc must be (T, {templates.n_channels})")
    if templates.n_neurons == 0:
        from .api import _all_silent_model

        return _all_silent_model(templates, yc, templates.sigmas,
                                 transfer=transfer)
    if H is None:
        H = max(4 * templates.K, 64)
    if len(yc) < L + 2 * H:
        # shorter than one window: exact whole-signal decode, but keep
        # the fast-path contract (seam_ok/seams_repaired/spike_onsets)
        m = fit_spiking_model_mc(templates, yc)
        m.seam_ok = np.ones(0, bool)
        m.seams_repaired = 0
        if transfer == "events":
            from ..core.events import _onsets_dense

            m.spike_onsets = _onsets_dense(
                np.asarray(m.ml_seq, np.int32), N=templates.n_neurons,
                K=templates.K, overlaps=templates.allow_overlaps)
        else:
            m.spike_onsets = None
        return m
    if streaming is None:
        from .api import MAX_ONESHOT_BLOCKS

        streaming = len(yc) > MAX_ONESHOT_BLOCKS * L
    if streaming:
        from ..ops.ring_viterbi_mc import mc_block_decoder
        from ..parallel.overlap_save import overlap_save_decode_long

        dec = mc_block_decoder(templates.lp, templates.mu, templates.sigmas,
                               overlaps=templates.allow_overlaps,
                               W=L + 2 * H)
        espec = ((templates.n_neurons, templates.K,
                  templates.allow_overlaps) if transfer == "events"
                 else None)
        x, seam_ok = overlap_save_decode_long(
            yc, None, None, None, None, L=L, H=H,
            blocks_per_call=blocks_per_call, block_decoder=dec,
            prefetch=prefetch, event_spec=espec)
        spike_onsets = None
    elif transfer == "events":
        from ..core.events import decode_events_mc_overlap_save

        spike_onsets, x, seam_ok = decode_events_mc_overlap_save(
            yc, templates.lp, templates.mu, templates.sigmas, L=L, H=H,
            overlaps=templates.allow_overlaps)
    else:
        x, seam_ok = mc_overlap_save(yc, templates.lp, templates.mu,
                                     templates.sigmas, L=L, H=H,
                                     overlaps=templates.allow_overlaps)
        spike_onsets = None
    x = np.asarray(x)
    seam_ok = np.asarray(seam_ok)
    n_repaired = 0
    if repair and not seam_ok.all():
        from ..parallel.seam_repair import repair_seams

        dec = _mc_repair_decoder(templates)
        failed = (np.nonzero(~seam_ok)[0] + 1) * L
        x, _ = repair_seams(yc, x, failed, dec, H=H)
        n_repaired = int((~seam_ok).sum())
        seam_ok = np.ones_like(seam_ok)
        spike_onsets = None          # repair rewrote labels; recompute below
    ll = path_cumulative_ll_mc(yc, x, templates.state_space.states,
                               templates.mu, templates.sigmas, templates.lp)
    model = HMMSpikingModel(templates, x, ll, yc)
    model.seam_ok = seam_ok
    model.seams_repaired = n_repaired
    if spike_onsets is None and transfer == "events":
        from ..core.events import _onsets_dense

        spike_onsets = _onsets_dense(x, N=templates.n_neurons,
                                     K=templates.K,
                                     overlaps=templates.allow_overlaps)
    model.spike_onsets = spike_onsets
    return model


def _mc_repair_decoder(templates: HMMTemplateModelMC):
    """Seam-repair window decoder (same contract as
    parallel/seam_repair.make_window_decoder): decode(y_win, silent_start)
    -> int labels, with emission-only init for interior repair windows."""
    lp, mu, sigmas = templates.lp, templates.mu, templates.sigmas
    engine = _mc_engine_for(templates)

    def decode(y_win, silent_start):
        x, _ = engine(y_win, lp, mu, sigmas, silent_start=silent_start,
                      with_ll=False)
        return np.asarray(x)

    return decode


def predict_mc(model: HMMSpikingModel) -> np.ndarray:
    """Per-channel reconstruction: (T, C) denoised signal — the C-channel
    generalization of reconstruct_signal (src/reconstruction.jl:1-9).
    Drift-decoded models reconstruct each chunk span with its own
    tracked templates (the api.predict rule)."""
    tm = model.template_model
    ss = tm.state_space
    x = np.asarray(model.ml_seq)
    track = getattr(model, "track", None)
    if track is not None and track.is_mc:
        out = np.empty((len(x), tm.n_channels))
        for c, (s, e) in enumerate(track.bounds):
            smu_c = np.asarray(state_means_mc(jnp.asarray(ss.states),
                                              jnp.asarray(track.mu[c])))
            out[s:e] = smu_c[x[s:e]]
        return out
    smu_c = np.asarray(state_means_mc(jnp.asarray(ss.states),
                                      jnp.asarray(tm.mu)))
    return smu_c[x]


def refit_template_model_mc(model: HMMTemplateModelMC, yc, nsteps: int,
                            *, verbose: int = 0,
                            fb_mode: str | None = None
                            ) -> HMMTemplateModelMC:
    """Warm-start MC EM from an existing model (the MC mirror of the
    reference fit!, fit.jl:49-52 / models.api.refit_template_model) —
    also the checkpoint-recovery path: load em_mc_latest.npz
    (utils/checkpoint.load_checkpoint), rebuild the HMMTemplateModelMC,
    and continue with this."""
    from ..train.em import EMTables
    from ..train.em_mc import auto_fb_mode_mc, em_chain_mc

    yc = np.asarray(yc, np.float64)
    K = model.K
    if fb_mode is None:
        fb_mode = auto_fb_mode_mc(len(yc), K, model.n_neurons,
                                  model.n_channels)
    tables = EMTables.build(build_state_space(model.n_neurons, K, False))
    lp, pi, mu, sg, lls = em_chain_mc(
        jnp.asarray(yc), jnp.asarray(model.lp), jnp.asarray(model.mu),
        jnp.asarray(model.sigmas), tables, K=K, n_iters=nsteps,
        fb_mode=fb_mode)
    if verbose > 0:
        print(f"refit_mc: ll {float(np.asarray(lls)[0]):.1f} -> "
              f"{float(np.asarray(lls)[-1]):.1f}")
    return HMMTemplateModelMC(mu=np.asarray(mu), sigmas=np.asarray(sg),
                              lp=np.asarray(lp),
                              allow_overlaps=model.allow_overlaps)


def fit_mc(yc, n_neurons: int = 3, K: int = 60, nsteps: int = 10,
           **kwargs) -> HMMSpikingModel:
    """Train (multi-channel Baum-Welch, train/em_mc.train_model_mc) then
    decode — the MC mirror of the reference composite fit (fit.jl:1-4)."""
    from ..train.em_mc import train_model_mc

    yc = np.asarray(yc, dtype=np.float64)
    model, _, _ = train_model_mc(yc, n_neurons=n_neurons, K=K,
                                 nsteps=nsteps, **kwargs)
    return fit_spiking_model_mc(model, yc)


def fit_spiking_model_adaptive_mc(templates: HMMTemplateModelMC, yc, *,
                                  chunk: int = 32768, forget: float = 0.3,
                                  inner_steps: int = 1,
                                  H: int | None = None,
                                  repair: bool = True,
                                  fb_mode: str | None = None,
                                  transfer: str = "dense"
                                  ) -> HMMSpikingModel:
    """Drift-adaptive joint multi-channel decode — the MC mirror of
    models/api.fit_spiking_model_adaptive: online-EM template tracking
    over (T, C) chunks (train/adaptive.track_drift_mc), then every chunk
    decoded with its own adapted templates in one parallel program
    (train/adaptive.decode_tracked_mc). The returned model carries
    `seam_ok`, `seams_repaired`, `spike_onsets`, and `track`."""
    from ..train.adaptive import decode_tracked_mc, track_drift_mc

    if templates.n_neurons == 0:
        from .api import _all_silent_model

        return _all_silent_model(templates, np.asarray(yc, np.float64),
                                 templates.sigmas, transfer="events")
    tr = track_drift_mc(templates, yc, chunk=chunk, forget=forget,
                        inner_steps=inner_steps, fb_mode=fb_mode)
    return decode_tracked_mc(tr, yc, H=H, repair=repair,
                             transfer=transfer)
