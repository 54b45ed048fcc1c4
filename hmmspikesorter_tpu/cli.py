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
* exit code 23 when input files don't exist (hmmsort.jl:110-113).

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


def sort_data(inputfile: str, datafile: str, outputfile: str, *,
              dosave: bool = True, max_templates: int | None = None,
              chunksize: int | None = None, progress=None,
              engine: str | None = None, channels=None,
              multichannel: bool | None = None, config=None) -> dict:
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

    A config.Config supplies defaults for anything not passed explicitly.
    """
    import scipy.io

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
    if multichannel and channels == "all":
        raise ValueError("multichannel (joint decode) and channels='all' "
                         "(independent per-channel decode) are mutually "
                         "exclusive")

    from .utils.guards import guard_inputs

    if multichannel:
        from .models.multichannel import (fit_spiking_model_mc,
                                          fit_spiking_model_mc_fast)

        print("Loading templates...")
        tmc = load_template_file_mc(inputfile, max_templates)
        if tmc is None:
            return {}
        print("Creating template model...")
        print("Loading data...")
        data = load_data_file(datafile, channels="all")   # (C, T)
        if data.shape[0] < tmc.n_channels:
            raise ValueError(
                f"recording has {data.shape[0]} channels but the templates "
                f"have {tmc.n_channels}")
        yc = np.ascontiguousarray(data[: tmc.n_channels].T)  # (T, C)
        guard_inputs(yc.T, tmc.sigmas)
        print("Fitting model...")
        if engine == "fast":
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
        if dosave:
            scipy.io.savemat(outputfile, output)
            print(f"Done! Results saved to {outputfile}")
        return output

    print("Loading templates...")
    tm = load_template_file(inputfile, max_templates)
    if tm is None:
        return {}
    print("Creating template model...")
    print("Loading data...")
    # the fast engine casts integer recordings in-graph (exact) — keep
    # int16 data raw so the device upload is half the bytes
    data = load_data_file(datafile, channels=channels,
                          keep_int=(engine == "fast" and channels != "all"))

    guard_inputs(data, tm.sigma)       # fail fast on NaN data / bad sigma
    #                                    (integer data skips the NaN scan)
    print("Fitting model...")
    if channels == "all":
        if engine == "fast":
            models = fit_spiking_models_fast_batched(tm, data, config=config)
        else:
            models = [fit_spiking_model(tm, row, chunksize=chunksize,
                                        progress=progress) for row in data]
        mlseq = np.stack([unroll_mlseq(m.ml_seq, tm.state_space.states) + 1
                          for m in models])
        ll = np.array([m.ll for m in models])
    else:
        if engine == "fast":
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
    if dosave:
        scipy.io.savemat(outputfile, output)
        print(f"Done! Results saved to {outputfile}")
    return output


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
                    "with known templates")
    p.add_argument("--inputfile", required=True,
                   help="File containing templates to be used for sorting")
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
    args = p.parse_args(argv)

    import os

    if not (os.path.isfile(args.inputfile) and os.path.isfile(args.datafile)):
        print("Both inputfile and data file must exist")
        return 23                               # reference hmmsort.jl:113
    from .config import Config, DecodeConfig

    cfg = Config(decode=DecodeConfig(engine=args.engine,
                                     chunksize=args.chunksize,
                                     channels=(1 if args.channels == "1"
                                               else "all"),
                                     multichannel=args.multichannel,
                                     transfer=args.transfer))
    sort_data(args.inputfile, args.datafile, args.outputfile, config=cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
