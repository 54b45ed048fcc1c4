"""Batch spike-sorting CLI — the framework's `hmmsort` entry point.

Contract matches the reference CLI (src/hmmsort.jl:36-118):

* input HDF5 template file with keys `spikeForms` (K x nchannels x
  ntemplates in the file's Julia/MATLAB layout), `cinv`, `p`; only
  channel 1 of spikeForms is used (hmmsort.jl:56);
* bail to an empty result if `spikeForms` is missing (hmmsort.jl:40-45) or
  more than `max_templates` (default 4) templates are present
  (hmmsort.jl:50-53);
* data HDF5 file read from `rh/data/analogData` else
  `highpassdata/data/data` (hmmsort.jl:66-78); 2-D data uses channel 1;
* decode-only (templates come from an upstream tool), overlaps ON,
  chunked at 100_000 samples (hmmsort.jl:90);
* `--channels all` (extension, default off) decodes every channel of a
  2-D recording instead of only channel 1 — with `--engine fast` as one
  batched device program (the single-chip DP axis);
* MAT output dict {mlseq, ll, waveforms, lp, sigma} (hmmsort.jl:94-101),
  where mlseq is the *unrolled* per-neuron state matrix with the
  reference's 1-based ring-position convention (state 1 = silent);
* exit code 23 when input files don't exist (hmmsort.jl:110-113);
* `--train` (extension, default off) learns the templates from the
  recording itself via the reference training protocol before decoding
  (the reference CLI is decode-only and requires an upstream template
  tool); `--save-templates` exports them in the reference's template-file
  format for reuse;
* `--confidence` (extension, default off) adds per-spike posterior
  confidence scores to the MAT output (key `confidence`, one array per
  neuron aligned with its decoded spikes — forward-backward onset mass,
  core/posterior.py).

Layout note: Julia/MATLAB read HDF5 datasets column-major; h5py reads the
same bytes row-major, so a Julia (K, nchan, N) dataset appears here as
(N, nchan, K) — we transpose back.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

MAX_TEMPLATES = 4          # reference hmmsort.jl:36
CHUNKSIZE = 100_000        # reference hmmsort.jl:90


def load_template_file(inputfile: str, max_templates: int = MAX_TEMPLATES):
    """Read {spikeForms, cinv, p} -> HMMTemplateModel or None (bail)."""
    import h5py

    from .models.api import HMMTemplateModel

    with h5py.File(inputfile, "r") as ff:
        if "spikeForms" not in ff:
            print("No spike forms found. Bailing...")
            return None
        wf = np.asarray(ff["spikeForms"])
        if wf.ndim == 2:                       # (N, K) single-channel file
            wf = wf[:, None, :]
        wf = wf.T                              # -> (K, nchan, N) Julia layout
        cinv = np.ravel(np.asarray(ff["cinv"]))
        pp = np.ravel(np.asarray(ff["p"]))
        if len(pp) > max_templates:
            print("The number of templates exceeds the maximum. Bailing out...")
            return None
        mu = wf[:, 0, :]                       # channel 1 only (hmmsort.jl:56)
        sigma = float(np.sqrt(1.0 / cinv[0]))
        return HMMTemplateModel(mu=mu, sigma=sigma, lp=np.log(pp),
                                allow_overlaps=True)


def load_template_file_mc(inputfile: str, max_templates: int = MAX_TEMPLATES):
    """Read {spikeForms, cinv, p} keeping EVERY template channel
    (beyond-reference: the reference drops all but channel 1,
    hmmsort.jl:56) -> HMMTemplateModelMC or None (bail).

    Per-channel noise comes from cinv: a (C,) vector is per-channel inverse
    variances; a (C, C) matrix contributes its diagonal; a scalar
    broadcasts (sigma_c = sqrt(1 / cinv_c), the C-channel reading of
    hmmsort.jl:56)."""
    import h5py

    from .models.multichannel import HMMTemplateModelMC

    with h5py.File(inputfile, "r") as ff:
        if "spikeForms" not in ff:
            print("No spike forms found. Bailing...")
            return None
        wf = np.asarray(ff["spikeForms"])
        if wf.ndim == 2:                       # (N, K) single-channel file
            wf = wf[:, None, :]
        wf = wf.T                              # -> (K, nchan, N) Julia layout
        cinv = np.asarray(ff["cinv"])
        pp = np.ravel(np.asarray(ff["p"]))
        if len(pp) > max_templates:
            print("The number of templates exceeds the maximum. Bailing out...")
            return None
        K, C, N = wf.shape
        mu = wf.transpose(0, 2, 1)             # (K, N, C)
        if cinv.ndim == 2 and cinv.shape == (C, C):
            cdiag = np.diag(cinv)
        elif np.ravel(cinv).size in (1, C):
            cdiag = np.broadcast_to(np.ravel(cinv), (C,))
        else:
            raise ValueError(
                f"cinv has {np.ravel(cinv).size} entries for {C} template "
                f"channels; expected a scalar, a ({C},) vector, or a "
                f"({C}, {C}) matrix")
        sigmas = np.sqrt(1.0 / np.asarray(cdiag, np.float64))
        return HMMTemplateModelMC(mu=mu, sigmas=sigmas, lp=np.log(pp),
                                  allow_overlaps=True)


def save_template_file(path: str, mu, sigma, lp) -> None:
    """Write learned templates as a {spikeForms, cinv, p} HDF5 file
    round-trippable through load_template_file / load_template_file_mc
    (and readable by Julia/MATLAB consumers of the reference's template
    format, src/hmmsort.jl:39-57).

    mu: (K, N) single-channel or (K, N, C) multi-channel templates;
    sigma: scalar or (C,) noise std; lp: (N,) onset log-probs.
    Julia reads a (K, C, N) column-major dataset; writing the h5py
    row-major transpose (N, C, K) produces exactly those bytes."""
    import h5py

    mu = np.asarray(mu, np.float64)
    wf = mu[:, None, :] if mu.ndim == 2 else mu.transpose(0, 2, 1)
    sig = np.ravel(np.asarray(sigma, np.float64))
    with h5py.File(path, "w") as ff:
        ff["spikeForms"] = np.ascontiguousarray(wf.T)   # (N, C, K)
        ff["cinv"] = 1.0 / (sig * sig)
        ff["p"] = np.exp(np.asarray(lp, np.float64))


def load_data_file(datafile: str, *, channels=1,
                   keep_int: bool = False) -> np.ndarray:
    """Read the voltage trace (reference hmmsort.jl:66-88).

    channels=1 (reference behavior) returns channel 1 as a (T,) trace;
    channels="all" returns every channel as a (C, T) matrix (a 1-D
    dataset becomes (1, T)).

    keep_int=True preserves an integer on-disk dtype (int16 ADC data is
    the common format) instead of the reference's Float64 conversion
    (hmmsort.jl:80-88): the fast decode paths ship integers to the device
    raw and cast in-graph — float(int16) is exact, so results are
    identical while the host->device transfer halves."""
    import h5py

    with h5py.File(datafile, "r") as ff:
        if "rh" in ff:
            ds = ff["rh/data/analogData"]
        else:
            ds = ff["highpassdata/data/data"]
        data = np.asarray(ds)
    if data.ndim == 2:
        # The reference reads a Julia/MATLAB (T, ncols) column-major matrix
        # and takes column 1 (hmmsort.jl:66-78). The same bytes appear
        # through h5py with the dims reversed, (ncols, T), so column 1 ==
        # row 0 — unconditionally: a long-axis guess would silently pick
        # the wrong orientation on a recording with more channels than
        # samples. With channels="all" the h5py rows are exactly the
        # Julia columns, already (C, T).
        if channels != "all":
            data = data[0]
    elif channels == "all":
        data = data[None]
    if keep_int and np.issubdtype(data.dtype, np.integer):
        return np.ascontiguousarray(data)
    return np.asarray(data, dtype=np.float64)


def _conf_and_qc(model, confidence: bool, qc: bool):
    """(--confidence MAT cell or None, --qc MAT struct or None) for one
    decoded model. The (T, N) onset-posterior grid — the expensive part
    — is computed ONCE and shared by both outputs (per-spike confidence
    AND QC's missing-spike-mass). Exact at any length: long recordings
    route to the chained parallel two-pass (core/posterior)."""
    if not (confidence or qc):
        return None, None
    from .core.events import _onsets_dense
    from .core.posterior import (confidence_from_posteriors,
                                 model_posteriors)
    from .core.qc import qc_arrays, unit_qc

    tm = model.template_model
    p = model_posteriors(model)
    cell = None
    if confidence:
        onsets = getattr(model, "spike_onsets", None)
        if onsets is None:
            onsets = _onsets_dense(np.asarray(model.ml_seq),
                                   N=tm.n_neurons, K=tm.K,
                                   overlaps=tm.allow_overlaps)
        confs = confidence_from_posteriors(p, onsets,
                                           half_width=(tm.K - 1) // 2)
        cell = np.empty(len(confs), dtype=object)
        for n, c in enumerate(confs):
            cell[n] = np.asarray(c, np.float64)
    qcs = None
    if qc:
        conf = list(cell) if cell is not None else None
        qcs = qc_arrays(unit_qc(model, confidence=conf, posteriors=p))
    return cell, qcs


def _conf_and_qc_cells(models, confidence: bool, qc: bool):
    """Per-channel cells of _conf_and_qc outputs."""
    if not (confidence or qc):
        return None, None
    conf_cells = np.empty(len(models), dtype=object)
    qc_cells = np.empty(len(models), dtype=object)
    for i, mod in enumerate(models):
        conf_cells[i], qc_cells[i] = _conf_and_qc(mod, confidence, qc)
    return (conf_cells if confidence else None,
            qc_cells if qc else None)


def _emit_output(output: dict, outputfile: str, dosave: bool) -> dict:
    """Shared result epilogue: optionally write the MAT file, return the
    reference output dict ({mlseq, ll, waveforms, lp, sigma},
    hmmsort.jl:94-101 contract) — one place for every sort_data branch."""
    if dosave:
        import scipy.io

        scipy.io.savemat(outputfile, output)
        print(f"Done! Results saved to {outputfile}")
    return output


def sort_data(inputfile: str | None, datafile: str, outputfile: str, *,
              dosave: bool = True, max_templates: int | None = None,
              chunksize: int | None = None, progress=None,
              engine: str | None = None, channels=None,
              multichannel: bool | None = None, config=None,
              train: bool = False, n_templates: int | None = None,
              K: int | None = None, nsteps: int | None = None,
              train_samples: int | None = None,
              save_templates: str | None = None, rng=None,
              confidence: bool | None = None,
              adaptive: bool | None = None,
              adapt_chunk: int | None = None,
              forget: float | None = None,
              qc: bool | None = None) -> dict:
    """End-to-end batch sort (reference sort_data, hmmsort.jl:36-104).

    engine="reference": the reference's sequential chunked decode (exact
    protocol parity, including the cumulative ll in the output).
    engine="fast": the on-device parallel overlap-save decode (orders of
    magnitude faster on TPU), with automatic seam repair and the same
    finite cumulative-score ll in the output (core/path_score.py).

    channels=1 (default) decodes channel 1 only — the reference contract
    (hmmsort.jl:66-78). channels="all" decodes every channel of a 2-D
    recording against the shared templates: with engine="fast" the whole
    (C, T) batch runs as ONE device program (the single-chip DP axis,
    models/api.fit_spiking_models_fast_batched); with engine="reference"
    channels are decoded sequentially. The output keeps the same keys with
    a leading channel axis: mlseq (C, N, T) and ll (C,).

    multichannel=True (beyond reference) decodes ONE spike train from ALL
    channels jointly: every channel of spikeForms is kept (the reference
    discards all but channel 1, hmmsort.jl:56) and the decode uses the
    joint per-channel Gaussian evidence (models/multichannel). The output
    keeps the reference keys; waveforms is (K, N, C) and sigma a (C,)
    vector. Mutually exclusive with channels="all" (which decodes each
    channel independently).

    train=True (beyond the reference CLI, which is decode-only and needs
    an upstream template tool) learns the templates from the recording
    itself via the reference training protocol (EM -> merge/prune ->
    EM/2, train/em.train_model) before decoding:

      * no inputfile -> train from scratch (`n_templates` random inits,
        `nsteps` EM steps — the package-API defaults when None);
      * inputfile given -> warm start: load its templates and refit them
        with `nsteps` EM steps (reference fit!, src/fit.jl:49-52);
      * `train_samples` > 0 trains on the first that many samples (EM cost
        is linear in T; the decode always covers the full recording);
      * `save_templates` writes the learned {spikeForms, cinv, p} HDF5,
        reusable as the inputfile of a plain decode run;
      * works with multichannel=True (joint MC training,
        train/em_mc.train_model_mc) and channels="all" (independent
        per-channel models; output arrays become per-channel cells since
        channels may keep different template counts).

    adaptive=True (beyond reference) replaces the stationary decode with
    the drift-adaptive one (models/api.fit_spiking_model_adaptive, or
    its MC mirror under multichannel=True): online-EM template tracking
    with forgetting `forget` over `adapt_chunk`-sample chunks, each
    chunk decoded with its own adapted templates. Composes with train
    (track from the learned templates), confidence (each spike is
    scored under the chunk parameters that decoded it, core/posterior.
    onset_posteriors_tracked / _tracked_mc), and channels="all"
    (independent per-channel drift tracks — one vmapped online-EM
    program for all channels, train/adaptive.track_drift_batched).

    If training prunes every template the decode degenerates to the
    all-silent null model (same contract as the reference's missing-
    spikeForms bail, hmmsort.jl:40-45, but with a valid output file).

    A config.Config supplies defaults for anything not passed explicitly.
    """
    from .config import UNSET, _section, pick
    from .io.extraction import unroll_mlseq
    from .models.api import (fit_spiking_model, fit_spiking_model_fast,
                             fit_spiking_models_fast_batched)

    dc = _section(config, "decode")
    engine = pick(UNSET if engine is None else engine, dc("engine"),
                  "reference")
    chunksize = pick(UNSET if chunksize is None else chunksize,
                     dc("chunksize"), CHUNKSIZE)
    max_templates = pick(UNSET if max_templates is None else max_templates,
                         dc("max_templates"), MAX_TEMPLATES)
    channels = pick(UNSET if channels is None else channels,
                    dc("channels"), 1)
    multichannel = bool(pick(UNSET if multichannel is None else multichannel,
                             dc("multichannel"), False))
    confidence = bool(pick(UNSET if confidence is None else confidence,
                           dc("confidence"), False))
    qc = bool(pick(UNSET if qc is None else qc, dc("qc"), False))
    adaptive = bool(pick(UNSET if adaptive is None else adaptive,
                         dc("adaptive"), False))
    adapt_chunk = pick(UNSET if adapt_chunk is None else adapt_chunk,
                       dc("adapt_chunk"), 32768)
    forget = pick(UNSET if forget is None else forget, dc("forget"), 0.3)
    if multichannel and channels == "all":
        raise ValueError("multichannel (joint decode) and channels='all' "
                         "(independent per-channel decode) are mutually "
                         "exclusive")

    from .utils.guards import guard_inputs

    if multichannel:
        from .models.multichannel import (fit_spiking_model_mc,
                                          fit_spiking_model_mc_fast,
                                          refit_template_model_mc)

        if train:
            print("Loading data...")
            data = load_data_file(datafile, channels="all")   # (C, T)
            guard_inputs(data, 1.0)    # fail fast on NaN before the EM run
            if inputfile is not None:
                tmc = load_template_file_mc(inputfile, max_templates)
                if tmc is None:
                    return {}
                # same channel contract as the decode-only path: the
                # recording must cover the template channels; extra
                # channels are dropped before training AND decode
                if data.shape[0] < tmc.n_channels:
                    raise ValueError(
                        f"recording has {data.shape[0]} channels but the "
                        f"templates have {tmc.n_channels}")
                data = data[: tmc.n_channels]
            yc_full = np.ascontiguousarray(data.T)            # (T, C)
            y_tr = (yc_full[:train_samples] if train_samples
                    else yc_full)
            if inputfile is not None:
                print("Refitting templates (warm start)...")
                tmc = refit_template_model_mc(
                    tmc, y_tr, nsteps if nsteps is not None else 10)
            else:
                from .train.em_mc import train_model_mc

                print("Training templates...")
                tmc, _, _ = train_model_mc(
                    y_tr,
                    n_templates if n_templates is not None else 3,
                    K if K is not None else
                    (60 if config is None else config.model.K),
                    nsteps if nsteps is not None else 10, rng=rng)
            tmc.allow_overlaps = True           # CLI decode convention
            if tmc.n_neurons > max_templates:
                print("The number of templates exceeds the maximum. "
                      "Bailing out...")
                return {}
            if save_templates:
                save_template_file(save_templates, tmc.mu, tmc.sigmas,
                                   tmc.lp)
                print(f"Templates saved to {save_templates}")
            yc = yc_full
        else:
            print("Loading templates...")
            tmc = load_template_file_mc(inputfile, max_templates)
            if tmc is None:
                return {}
            print("Creating template model...")
            print("Loading data...")
            data = load_data_file(datafile, channels="all")   # (C, T)
            if data.shape[0] < tmc.n_channels:
                raise ValueError(
                    f"recording has {data.shape[0]} channels but the "
                    f"templates have {tmc.n_channels}")
            yc = np.ascontiguousarray(data[: tmc.n_channels].T)  # (T, C)
        guard_inputs(yc.T, tmc.sigmas)
        print("Fitting model...")
        if adaptive:
            from .models.multichannel import fit_spiking_model_adaptive_mc

            model = fit_spiking_model_adaptive_mc(
                tmc, np.asarray(yc, np.float64), chunk=adapt_chunk,
                forget=forget,
                transfer=pick(UNSET, dc("transfer"), "dense"))
        elif engine == "fast":
            model = fit_spiking_model_mc_fast(
                tmc, yc,
                L=pick(UNSET, dc("L"), 8192),
                H=pick(UNSET, dc("H"), None),
                streaming=pick(UNSET, dc("streaming"), None),
                blocks_per_call=pick(UNSET, dc("blocks_per_call"), 256),
                prefetch=pick(UNSET, dc("prefetch"), 2),
                repair=pick(UNSET, dc("repair"), True),
                transfer=pick(UNSET, dc("transfer"), "dense"))
        else:
            model = fit_spiking_model_mc(tmc, yc, chunksize=chunksize,
                                         progress=progress)
        mlseq = unroll_mlseq(model.ml_seq, tmc.state_space.states) + 1
        output = {
            "mlseq": mlseq,
            "ll": model.ll,
            "waveforms": tmc.mu,
            "lp": tmc.lp,
            "sigma": tmc.sigmas,
        }
        conf_cell, qc_struct = _conf_and_qc(model, confidence, qc)
        if confidence:
            output["confidence"] = conf_cell
        if qc:
            output["qc"] = qc_struct
        return _emit_output(output, outputfile, dosave)

    if train:
        from .models.api import refit_template_model

        tm0 = None
        if inputfile is not None:
            tm0 = load_template_file(inputfile, max_templates)
            if tm0 is None:
                return {}
        print("Loading data...")
        data = load_data_file(datafile, channels=channels)
        rows = data if channels == "all" else data[None]
        guard_inputs(data, 1.0)        # NaN scan before training
        tms = []
        for c, row in enumerate(rows):
            y_tr = row[:train_samples] if train_samples else row
            if tm0 is not None:
                print(f"Refitting templates (warm start)"
                      f"{f' [channel {c}]' if channels == 'all' else ''}...")
                m = refit_template_model(
                    tm0, y_tr, nsteps if nsteps is not None else 10)
            else:
                from .models.api import fit_template_model

                print(f"Training templates"
                      f"{f' [channel {c}]' if channels == 'all' else ''}...")
                m = fit_template_model(y_tr, n_templates, K, nsteps,
                                       rng=rng, config=config)
            m.allow_overlaps = True     # CLI decode convention
            if m.n_neurons > max_templates:
                print("The number of templates exceeds the maximum. "
                      "Bailing out...")
                return {}
            tms.append(m)
        if save_templates:
            if channels == "all":
                import os.path

                root, ext = os.path.splitext(save_templates)
                for c, m in enumerate(tms):
                    save_template_file(f"{root}_ch{c:02d}{ext}",
                                       m.mu, m.sigma, m.lp)
                print(f"Per-channel templates saved next to "
                      f"{save_templates}")
            else:
                save_template_file(save_templates, tms[0].mu,
                                   tms[0].sigma, tms[0].lp)
                print(f"Templates saved to {save_templates}")
        if channels == "all":
            # per-channel models can keep different template counts, so
            # the output entries are per-channel cells (object arrays)
            models = [
                (fit_spiking_model_fast(m, row, streaming=True,
                                        config=config)
                 if engine == "fast" else
                 fit_spiking_model(m, row, chunksize=chunksize,
                                   progress=progress))
                for m, row in zip(tms, rows)]
            cell = np.empty(len(models), dtype=object)
            for c, (m, mod) in enumerate(zip(tms, models)):
                cell[c] = unroll_mlseq(mod.ml_seq,
                                       m.state_space.states) + 1
            wf_cell = np.empty(len(tms), dtype=object)
            lp_cell = np.empty(len(tms), dtype=object)
            for c, m in enumerate(tms):
                wf_cell[c] = m.mu
                lp_cell[c] = m.lp
            output = {
                "mlseq": cell,
                "ll": np.array([mod.ll for mod in models]),
                "waveforms": wf_cell,
                "lp": lp_cell,
                "sigma": np.array([m.sigma for m in tms]),
            }
            conf_cells, qc_cells = _conf_and_qc_cells(models,
                                                      confidence, qc)
            if confidence:
                output["confidence"] = conf_cells
            if qc:
                output["qc"] = qc_cells
            return _emit_output(output, outputfile, dosave)
        tm = tms[0]
        data = rows[0]
    else:
        print("Loading templates...")
        tm = load_template_file(inputfile, max_templates)
        if tm is None:
            return {}
        print("Creating template model...")
        print("Loading data...")
        # the fast engine casts integer recordings in-graph (exact) — keep
        # int16 data raw so the device upload is half the bytes
        data = load_data_file(datafile, channels=channels,
                              keep_int=(engine == "fast"
                                        and channels != "all"))

        guard_inputs(data, tm.sigma)   # fail fast on NaN data / bad sigma
        #                                (integer data skips the NaN scan)
    print("Fitting model...")
    if channels == "all":
        if adaptive:
            # independent per-channel drift tracks (one vmapped online-EM
            # device program for all channels), each channel decoded
            # under its own adapted templates
            from .train.adaptive import decode_tracked, track_drift_batched

            rows64 = np.asarray(data, np.float64)
            tracks = track_drift_batched(tm, rows64, chunk=adapt_chunk,
                                         forget=forget)
            tr_mode = pick(UNSET, dc("transfer"), "dense")
            models = [decode_tracked(trk, rows64[c], transfer=tr_mode)
                      for c, trk in enumerate(tracks)]
        elif engine == "fast":
            models = fit_spiking_models_fast_batched(tm, data, config=config)
        else:
            models = [fit_spiking_model(tm, row, chunksize=chunksize,
                                        progress=progress) for row in data]
        mlseq = np.stack([unroll_mlseq(m.ml_seq, tm.state_space.states) + 1
                          for m in models])
        ll = np.array([m.ll for m in models])
    else:
        if adaptive:
            # drift-adaptive: online-EM template tracking, then every
            # chunk decoded with its own adapted templates
            # (train/adaptive.py; overrides the stationary engines)
            from .models.api import fit_spiking_model_adaptive

            model = fit_spiking_model_adaptive(
                tm, np.asarray(data, np.float64), chunk=adapt_chunk,
                forget=forget,
                transfer=pick(UNSET, dc("transfer"), "dense"))
        elif engine == "fast":
            # streaming: one fixed-shape compiled program serves any
            # recording length (a per-T one-shot program can compile for
            # minutes)
            model = fit_spiking_model_fast(tm, data, streaming=True,
                                           config=config)
        else:
            model = fit_spiking_model(tm, data, chunksize=chunksize,
                                      progress=progress)
        # reference output convention: unrolled per-neuron ring positions,
        # 1-based with 1 == silent (StateMatrix stores positions + 1,
        # types.jl:150)
        mlseq = unroll_mlseq(model.ml_seq, tm.state_space.states) + 1
        ll = model.ll
    output = {
        "mlseq": mlseq,
        "ll": ll,
        "waveforms": tm.mu,
        "lp": tm.lp,
        "sigma": tm.sigma,
    }
    if channels == "all":
        conf_cells, qc_cells = _conf_and_qc_cells(models, confidence, qc)
    else:
        conf_cells, qc_cells = _conf_and_qc(model, confidence, qc)
    if confidence:
        output["confidence"] = conf_cells
    if qc:
        output["qc"] = qc_cells
    return _emit_output(output, outputfile, dosave)


def _enable_compilation_cache():
    """Persist compiled XLA programs across CLI invocations (first compile
    of the production decode program can take minutes; reruns with the same
    shapes can then skip it). Best-effort — backends that compile via a
    remote service, or that don't support executable serialization, bypass
    this cache."""
    import os

    try:
        import jax

        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "hmmspikesorter_tpu", "xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None) -> int:
    _enable_compilation_cache()
    p = argparse.ArgumentParser(
        prog="hmmsort",
        description="HMM spike sorting (TPU-native): decode a recording "
                    "with known templates, or learn them first "
                    "with --train")
    p.add_argument("--inputfile",
                   help="File containing templates to be used for sorting "
                        "(required unless --train; with --train it warm-"
                        "starts the refit instead)")
    p.add_argument("--datafile", required=True,
                   help="Data file containing data to be sorted")
    p.add_argument("--outputfile", required=True,
                   help="File to save the spiking model to")
    p.add_argument("--chunksize", type=int, default=CHUNKSIZE)
    p.add_argument("--engine", choices=["reference", "fast"],
                   default="reference",
                   help="'reference' = sequential chunked decode (exact "
                        "reference protocol); 'fast' = on-device parallel "
                        "overlap-save (TPU production path)")
    p.add_argument("--channels", choices=["1", "all"], default="1",
                   help="'1' = channel 1 only (reference contract); "
                        "'all' = decode every channel of a 2-D recording "
                        "(with --engine fast, one batched device program; "
                        "output mlseq/ll gain a leading channel axis)")
    p.add_argument("--transfer", choices=["dense", "events"],
                   default="dense",
                   help="'events' fetches the packed spike-onset grid "
                        "instead of dense labels and reconstructs them "
                        "exactly on the host (much less device->host "
                        "traffic; --engine fast only)")
    p.add_argument("--multichannel", action="store_true",
                   help="decode ONE spike train from ALL channels jointly, "
                        "using every channel of spikeForms (the reference "
                        "uses channel 1 only); mutually exclusive with "
                        "--channels all")
    p.add_argument("--train", action="store_true",
                   help="learn the templates from the recording itself "
                        "(reference training protocol: EM -> merge/prune "
                        "-> EM/2) before decoding — no upstream template "
                        "tool needed; with --inputfile, warm-starts from "
                        "its templates instead")
    p.add_argument("--ntemplates", type=int, default=None,
                   help="initial template count for --train from scratch "
                        "(default 3, the reference train_model default; "
                        "merge/prune decides the final count)")
    p.add_argument("--K", type=int, default=None,
                   help="template length in samples for --train from "
                        "scratch (default 60, the reference train_model "
                        "default; ignored with an --inputfile warm start)")
    p.add_argument("--nsteps", type=int, default=None,
                   help="EM iterations for --train (default 10)")
    p.add_argument("--train-samples", type=int, default=None,
                   help="train on only the first this-many samples "
                        "(default: the whole recording); the decode always "
                        "covers the full recording")
    p.add_argument("--confidence", action="store_true",
                   help="add per-spike posterior confidence scores to the "
                        "MAT output (key 'confidence': one array per "
                        "neuron, aligned with its decoded spikes; "
                        "forward-backward onset mass, core/posterior)")
    p.add_argument("--save-templates", default=None,
                   help="also write the learned templates as a "
                        "{spikeForms, cinv, p} HDF5 file reusable as "
                        "--inputfile of a plain decode run")
    p.add_argument("--qc", action="store_true",
                   help="add a per-unit quality-control struct to the "
                        "MAT output (key 'qc': spike counts/rates, ISI "
                        "violations, SNR, presence ratio, confidence "
                        "summary, drift metrics when --adaptive; "
                        "core/qc.py)")
    p.add_argument("--adaptive", action="store_true",
                   help="drift-adaptive decode: track the templates "
                        "through the recording with online EM and decode "
                        "every chunk with its own adapted templates "
                        "(electrode-drift robustness; single-channel or "
                        "joint --multichannel; overrides --engine; "
                        "composes with --train and --confidence)")
    p.add_argument("--adapt-chunk", type=int, default=None,
                   help="adaptive tracking chunk = decode window in "
                        "samples (default 32768)")
    p.add_argument("--forget", type=float, default=None,
                   help="adaptive forgetting factor in (0, 1]: memory "
                        "horizon ~ chunk/forget samples (default 0.3)")
    args = p.parse_args(argv)

    import os

    if args.inputfile is None and not args.train:
        print("Both inputfile and data file must exist")
        return 23                               # reference hmmsort.jl:113
    if not ((args.inputfile is None or os.path.isfile(args.inputfile))
            and os.path.isfile(args.datafile)):
        print("Both inputfile and data file must exist")
        return 23                               # reference hmmsort.jl:113
    from .config import Config, DecodeConfig

    cfg = Config(decode=DecodeConfig(engine=args.engine,
                                     chunksize=args.chunksize,
                                     channels=(1 if args.channels == "1"
                                               else "all"),
                                     multichannel=args.multichannel,
                                     transfer=args.transfer,
                                     confidence=args.confidence,
                                     qc=args.qc,
                                     adaptive=args.adaptive,
                                     adapt_chunk=(args.adapt_chunk
                                                  if args.adapt_chunk
                                                  is not None else 32768),
                                     forget=(args.forget
                                             if args.forget is not None
                                             else 0.3)))
    sort_data(args.inputfile, args.datafile, args.outputfile, config=cfg,
              train=args.train, n_templates=args.ntemplates, K=args.K,
              nsteps=args.nsteps, train_samples=args.train_samples,
              save_templates=args.save_templates)
    return 0


if __name__ == "__main__":
    sys.exit(main())
